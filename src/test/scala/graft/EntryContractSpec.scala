package graft

/** Driver-contract hygiene for [[SparkEntry]]. The queries/oracleSql
  * maps are SOURCE LITERALS, and Scala's Map builder silently keeps
  * only the LAST binding for a repeated key — a name collision makes
  * a new query vanish without any compile or runtime signal (round 9
  * shipped `x_text_repetition` twice and the new operator was
  * silently shadowed by the old one until a row-count smelled wrong).
  * This spec greps the source so a collision fails loudly instead.
  */
class EntryContractSpec extends SparkSpec {

  private lazy val src = new String(
    java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("src/main/scala/graft/SparkEntry.scala")),
    java.nio.charset.StandardCharsets.UTF_8)

  test("no query name is bound twice in either map (source-level)") {
    val keyRe = """"([a-z0-9_]+)"\s*->""".r
    val names = SparkEntry.queries.keySet
    val bindings = keyRe.findAllMatchIn(src).map(_.group(1))
      .filter(names).toSeq
    // each name may appear at most twice: once in queries, once in
    // oracleSql — a third binding means one map binds it twice and the
    // earlier definition is silently dead
    val dups = bindings.groupBy(identity).collect {
      case (k, vs) if vs.size > 2 => k
    }
    assert(dups.isEmpty,
      s"SparkEntry binds these names more than twice (shadowed entry!): " +
        dups.toSeq.sorted.mkString(", "))
  }

  test("every oracle key names an existing query (no orphan oracles)") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty,
      s"oracleSql keys without a query (typo?): ${orphans.toSeq.sorted.mkString(", ")}")
  }
}

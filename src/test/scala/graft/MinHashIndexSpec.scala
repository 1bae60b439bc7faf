package graft

import graft.operators.{Dedup, MinHashIndex}
import java.nio.file.Files

/** The persisted near-dup index: batch-cost probes and appends against
  * corpus-scale history. The bars mirror AnnIndexSpec's: incremental
  * commits must be probe-equal to a full rebuild, from a FRESH session.
  */
class MinHashIndexSpec extends SparkSpec {
  import spark.implicits._

  // docs with deliberate near-duplicates: 1 ≈ 0 (one token changed),
  // 11 ≈ 10 (one token changed), 20/21 unrelated
  private def mk(rows: (Long, String)*) = rows.toDF("doc_id", "text")
  private val A =
    "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon"
  private val B =
    "one two three four five six seven eight nine ten " +
      "eleven twelve thirteen fourteen fifteen sixteen seventeen eighteen nineteen twenty"
  private val C =
    "red orange yellow green blue indigo violet white black brown " +
      "pink gray maroon navy teal olive coral amber jade ruby"
  private val D =
    "cat dog bird fish horse cow sheep goat pig duck " +
      "hen goose mole vole hare lynx deer elk fox owl"
  private val base = mk(0L -> A, 10L -> B, 20L -> C)
  // 1 ≈ 0 and 11 ≈ 10 (last token changed); 21 unrelated
  private val batch = mk(
    1L -> A.replace("upsilon", "phi"),
    11L -> B.replace("twenty", "thirty"),
    21L -> D)

  private def pairs(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Double)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq

  test("neardupe finds batch-vs-history near-dups; write+append probe-equal to a full rebuild from a fresh session") {
    val p1 = Files.createTempDirectory("graft-mh1").toString
    val idx = new MinHashIndex(spark, p1)
    assert(idx.write(base) == 0L)
    val hits = pairs(idx.neardupe(batch, minEstJaccard = 0.5))
    // the two near-dups found, the unrelated doc not
    assert(hits.map(h => (h._1, h._2)) == Seq((1L, 0L), (11L, 10L)))
    assert(hits.forall(_._3 >= 0.5))

    // append the batch, then probe a second batch against the grown
    // index vs a one-shot full rebuild — identical from a new session
    val batch2 = mk(2L -> A, 12L -> D)
    assert(idx.append(batch) == 1L)
    // v1 holds only the 3-row delta's sigs (batch-scale, not corpus)
    assert(spark.read.parquet(s"$p1/v1/sigs").count() == 3L)

    val p2 = Files.createTempDirectory("graft-mh2").toString
    new MinHashIndex(spark, p2).write(base.unionByName(batch))
    val freshSession = spark.newSession()
    val grown = pairs(new MinHashIndex(freshSession, p1).neardupe(batch2))
    val rebuilt = pairs(new MinHashIndex(freshSession, p2).neardupe(batch2))
    assert(grown == rebuilt)
    // 2 ≈ 0 exactly (est 1.0) and ≈ 1; 12 == 21 exactly
    assert(grown.map(h => (h._1, h._2)).toSet == Set((2L, 0L), (2L, 1L), (12L, 21L)))
  }

  test("randomized: arbitrary corpora split across arbitrary appends probe-equal to a full rebuild (seeded)") {
    // the ClusterIndexSpec randomized law, signature-index edition:
    // hashing is literal-seeded and deterministic, so HOWEVER a corpus
    // is split into appends, probing the grown chain must equal
    // probing a one-shot build bit for bit — random token soups
    // (shared vocab => incidental near-dups, dups, singletons) across
    // 1-3 appends, probed with mutated copies of random corpus docs.
    val rnd = new scala.util.Random(20260814L)
    val vocab = (A + " " + B + " " + C + " " + D).split(" ")
    (1 to 3).foreach { trial =>
      val nDocs = 20 + rnd.nextInt(30)
      val docs = (0 until nDocs).map { i =>
        (i.toLong, Seq.fill(8 + rnd.nextInt(12))(vocab(rnd.nextInt(vocab.length)))
          .mkString(" "))
      }
      val batches = docs.grouped(math.max(1, docs.size / (1 + rnd.nextInt(3)))).toSeq
      val p1 = Files.createTempDirectory(s"graft-mh-rand$trial").toString
      val inc = new MinHashIndex(spark, p1)
      inc.write(mk(batches.head: _*))
      batches.tail.foreach(b => inc.append(mk(b: _*)))
      val p2 = Files.createTempDirectory(s"graft-mh-rand-full$trial").toString
      new MinHashIndex(spark, p2).write(mk(docs: _*))
      val probes = mk((0 until 5).map { j =>
        val (_, t) = docs(rnd.nextInt(nDocs))
        (1000L + j, t.replaceFirst("\\S+", "mutated"))
      }: _*)
      val got = pairs(inc.neardupe(probes, minEstJaccard = 0.3)).sorted
      val want = pairs(new MinHashIndex(spark, p2)
        .neardupe(probes, minEstJaccard = 0.3)).sorted
      assert(got == want,
        s"trial $trial diverged (docs=$nDocs batches=${batches.size})")
    }
  }

  test("probe candidates agree with the one-shot minhashPairs cross-boundary pairs") {
    // same hashing, same banding, same threshold => the index probe
    // must find exactly minhashPairs' pairs that cross the
    // history/batch boundary (no cap hit at this size)
    val p = Files.createTempDirectory("graft-mh3").toString
    val idx = new MinHashIndex(spark, p)
    idx.write(base)
    val probe = pairs(idx.neardupe(batch, minEstJaccard = 0.5))
      .map(h => (math.min(h._1, h._2), math.max(h._1, h._2), h._3)).toSet
    val baseIds = Set(0L, 10L, 20L)
    val oneShot = Dedup.minhashPairs(base.unionByName(batch),
        n = 3, k = 64, bands = 16, minEstJaccard = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .filter(x => baseIds.contains(x._1) ^ baseIds.contains(x._2)).toSet
    assert(probe == oneShot)
  }

  test("compact folds the chain; probes identical; vacuum reaps; params pin across appends") {
    val p = Files.createTempDirectory("graft-mh4").toString
    val idx = new MinHashIndex(spark, p)
    idx.write(base, MinHashIndex.Params(n = 2, k = 32, bands = 8))
    idx.append(batch)
    val before = pairs(idx.neardupe(mk(5L -> A)))
    assert(idx.compact() == 2L)
    val after = pairs(new MinHashIndex(spark.newSession(), p).neardupe(
      mk(5L -> A)))
    assert(before == after && before.nonEmpty)
    idx.vacuum(0)
    assert(idx.versions == Seq(2L))
    // appended under the pinned (2,32,8) params, not the defaults
    assert(spark.read.parquet(s"$p/v2/sigs").head().getSeq[Long](1).length == 32)
  }

  test("delete removes ids from probes; re-append re-indexes; probe-equal to a rebuild without them") {
    val p = Files.createTempDirectory("graft-mh6").toString
    val idx = new MinHashIndex(spark, p)
    val a1 = 1L -> A.replace("upsilon", "phi")
    idx.write(base.unionByName(mk(a1)))
    // a probe ≈ A hits both indexed variants
    assert(pairs(idx.neardupe(mk(5L -> A))).map(_._2).toSet == Set(0L, 1L))
    // takedown doc 0: it stops hitting, doc 1 still does
    idx.delete(Seq(0L).toDF("doc_id"))
    val afterDel = pairs(idx.neardupe(mk(5L -> A)))
    assert(afterDel.map(_._2) == Seq(1L))
    // probe-equal to an index that never contained doc 0 (fresh session)
    val p2 = Files.createTempDirectory("graft-mh7").toString
    new MinHashIndex(spark, p2).write(mk(a1, 10L -> B, 20L -> C))
    assert(pairs(new MinHashIndex(spark.newSession(), p2)
      .neardupe(mk(5L -> A))) == afterDel)
    // re-append doc 0: the chain replays in order, it hits again
    idx.append(mk(0L -> A))
    assert(pairs(idx.neardupe(mk(5L -> A))).map(_._2).toSet == Set(0L, 1L))
    // compact folds tombstones physically; fresh-session probes agree
    val v = idx.compact()
    idx.vacuum(0)
    assert(idx.versions == Seq(v))
    val folded = pairs(new MinHashIndex(spark.newSession(), p).neardupe(mk(5L -> A)))
    assert(folded.map(_._2).toSet == Set(0L, 1L))
  }

  test("append is redelivery-idempotent: double-append commits nothing, overlap deltas only the new ids") {
    val p = Files.createTempDirectory("graft-mh8").toString
    val idx = new MinHashIndex(spark, p)
    idx.write(base)
    val v1 = idx.append(batch)
    assert(v1 == 1L)
    val probeBatch = mk(2L -> A, 12L -> D)
    val once = pairs(idx.neardupe(probeBatch))
    // raw double-append (no streaming wrapper guarding it): returns
    // the base version, commits NO new version, stores no dup sigs
    assert(idx.append(batch) == v1)
    assert(idx.versions == Seq(0L, 1L))
    assert(idx.sigs().count() == 6L) // 3 base + 3 batch, each once
    assert(pairs(idx.neardupe(probeBatch)) == once)
    // partial overlap + an in-batch id repeat: only the genuinely new
    // id is signed into the delta
    val v2 = idx.append(mk(11L -> B.replace("twenty", "thirty"), 30L -> C, 30L -> C))
    assert(spark.read.parquet(s"$p/v$v2/sigs").count() == 1L)
    assert(idx.sigs().count() == 7L)
    // overlap-append probe-equal to a one-shot build over the id union
    val p2 = Files.createTempDirectory("graft-mh9").toString
    new MinHashIndex(spark, p2).write(base.unionByName(batch).unionByName(mk(30L -> C)))
    val fresh = spark.newSession()
    assert(pairs(new MinHashIndex(fresh, p).neardupe(probeBatch)) ==
      pairs(new MinHashIndex(fresh, p2).neardupe(probeBatch)))
  }

  test("neardupeSigned on a precomputed signature frame == neardupe; pairs-from-sigs == pairs") {
    val p = Files.createTempDirectory("graft-mh10").toString
    val idx = new MinHashIndex(spark, p)
    idx.write(base)
    val prm = idx.params
    assert(prm == MinHashIndex.Params(3, 64, 16))
    val sigs = graft.Materialize.ephemeral(
      Dedup.minhashSignatures(batch, prm.n, prm.k))
    // the one-signing ingest composition must agree with the
    // sign-internally paths bit for bit
    assert(pairs(idx.neardupeSigned(sigs)) == pairs(idx.neardupe(batch)))
    def pp(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(pp(Dedup.minhashPairsFromSignatures(sigs)) ==
      pp(Dedup.minhashPairs(batch)))
  }

  test("appendSigned == append: probe-equal, delta-sized, and redelivery-idempotent") {
    val p1 = Files.createTempDirectory("graft-mh11").toString
    val p2 = Files.createTempDirectory("graft-mh12").toString
    val viaDocs = new MinHashIndex(spark, p1)
    val viaSigs = new MinHashIndex(spark, p2)
    viaDocs.write(base); viaSigs.write(base)
    viaDocs.append(batch)
    val prm = viaSigs.params
    val sigs = graft.Materialize.ephemeral(
      Dedup.minhashSignatures(batch, prm.n, prm.k))
    assert(viaSigs.appendSigned(sigs) == 1L)
    val probe = mk(2L -> A, 12L -> D)
    assert(pairs(viaSigs.neardupe(probe)) == pairs(viaDocs.neardupe(probe)))
    assert(spark.read.parquet(s"$p2/v1/sigs").count() == 3L)
    // redelivered signatures commit nothing (the id-only guard)
    assert(viaSigs.appendSigned(sigs) == 1L)
    assert(viaSigs.versions == Seq(0L, 1L))
    assert(viaSigs.sigs().count() == 6L)
  }

  test("neardupe before write fails loudly; same-id rows are redeliveries, not near-dups") {
    val p = Files.createTempDirectory("graft-mh5").toString
    val idx = new MinHashIndex(spark, p)
    intercept[IllegalStateException](idx.neardupe(batch))
    idx.write(base)
    // re-delivering an indexed doc under its own id: self-pair filtered
    assert(pairs(idx.neardupe(base)).isEmpty)
  }
}

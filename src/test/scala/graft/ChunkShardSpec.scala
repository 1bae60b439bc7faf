package graft

import graft.operators.{Chunker, Sampling}
import org.apache.spark.sql.functions._

/** Sliding-window chunking ([[graft.operators.Chunker]]) and epoch
  * dataloader sharding ([[graft.operators.Sampling.epochShards]]).
  */
class ChunkShardSpec extends SparkSpec {
  private val sfDir = "/root/testdata/sf0.001"

  test("chunks cover every token, overlap by size-stride, and pin exact text") {
    val docs = graft.sources.Tables.documents(spark, sfDir).limit(60)
    val (size, stride) = (64, 48)
    val chunks = Chunker.chunk(docs, size, stride)
      .orderBy(col("doc_id"), col("chunk_id")).collect()
      .groupBy(_.getLong(0))
    val texts = docs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(chunks.nonEmpty)
    for ((id, cs) <- chunks) {
      val toks = texts(id).split(" ").filter(_.nonEmpty)
      // chunk text is the exact token slice
      cs.foreach { c =>
        val (start, n, txt) = (c.getLong(2).toInt, c.getLong(3).toInt, c.getString(4))
        assert(txt == toks.slice(start - 1, start - 1 + n).mkString(" "),
          s"doc $id chunk ${c.getLong(1)}")
      }
      // full coverage: last chunk reaches the last token, first starts at 1
      assert(cs.head.getLong(2) == 1L)
      val last = cs.last
      assert(last.getLong(2) + last.getLong(3) - 1 == toks.length.toLong)
      // fixed stride between consecutive starts
      cs.sliding(2).foreach {
        case Array(a, b) => assert(b.getLong(2) - a.getLong(2) == stride.toLong)
        case _ =>
      }
      // every chunk but the last is full-size
      cs.dropRight(1).foreach(c => assert(c.getLong(3) == size.toLong))
    }
  }

  test("stride == size is exact non-overlapping segmentation (reconstruction)") {
    import spark.implicits._
    val docs = Seq((0L, (1 to 10).map(i => s"t$i").mkString(" ")),
      (1L, "only three tokens"), (2L, "x")).toDF("doc_id", "text")
    val cs = Chunker.chunk(docs, chunkTokens = 4, strideTokens = 4)
      .orderBy(col("doc_id"), col("chunk_id")).collect()
    val rebuilt = cs.groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getString(4)).mkString(" ")).toMap
    assert(rebuilt(0L) == (1 to 10).map(i => s"t$i").mkString(" "))
    assert(rebuilt(1L) == "only three tokens")
    assert(rebuilt(2L) == "x")
    // 10 tokens at size 4 → 3 chunks (4, 4, 2)
    assert(cs.count(_.getLong(0) == 0L) == 3)
  }

  test("empty and whitespace-only docs emit no chunks; stride > size is rejected") {
    import spark.implicits._
    val docs = Seq((0L, ""), (1L, "  "), (2L, "one tok")).toDF("doc_id", "text")
    val cs = Chunker.chunk(docs, 4, 4).collect()
    assert(cs.map(_.getLong(0)).toSet == Set(2L))
    intercept[IllegalArgumentException] {
      Chunker.chunk(docs, 4, 5)
    }
  }

  test("dropBoilerplateLines: shared footers drop, prose survives in order, thresholds hold") {
    import spark.implicits._
    val footer = "(c) example corp all rights reserved"
    val nav = "home products about contact"
    val docs = Seq(
      (0L, s"unique prose alpha\n$footer\nmore alpha prose"),
      (1L, s"$nav\nunique prose beta\n$footer"),
      (2L, s"$nav\n$footer"), // all boilerplate
      (3L, "entirely unique document gamma")).toDF("doc_id", "text")
    val out = graft.operators.Dedup.dropBoilerplateLines(docs, minDocFreq = 2)
      .orderBy("doc_id").collect()
    assert(out.length == 4) // no silent row loss
    assert(out(0).getString(1) == "unique prose alpha\nmore alpha prose")
    assert(out(1).getString(1) == "unique prose beta")
    assert(out(2).getString(1) == "" && out(2).getAs[Long]("n_lines_kept") == 0L)
    assert(out(3).getString(1) == "entirely unique document gamma")
    assert(out(0).getAs[Long]("n_lines_dropped") == 1L)
    assert(out(2).getAs[Long]("n_lines_dropped") == 2L)
    // footer shared by only 2 docs survives a minDocFreq=4 threshold
    val loose = graft.operators.Dedup.dropBoilerplateLines(docs, minDocFreq = 4)
      .orderBy("doc_id").collect()
    assert(loose.forall(_.getAs[Long]("n_lines_dropped") == 0L))
    // minDocFreq=1 would drop every line — rejected loudly
    intercept[IllegalArgumentException] {
      graft.operators.Dedup.dropBoilerplateLines(docs, minDocFreq = 1)
    }
  }

  test("epochShards: disjoint + complete, contiguous positions, epoch changes the order") {
    val docs = graft.sources.Tables.documents(spark, sfDir).select(col("doc_id"))
    val n = docs.count()
    val sh = Sampling.epochShards(docs, "doc_id", lit(1L), nShards = 4).collect()
    assert(sh.length.toLong == n) // complete, no dup rows
    assert(sh.map(_.getAs[Long]("doc_id")).distinct.length.toLong == n) // disjoint
    val byShard = sh.groupBy(_.getAs[Long]("shard"))
    assert(byShard.keySet.subsetOf(Set(0L, 1L, 2L, 3L)))
    byShard.values.foreach { rows =>
      val ps = rows.map(_.getAs[Long]("pos")).sorted
      assert(ps.toSeq == (1L to rows.length.toLong)) // contiguous ranks
    }
    // replayable: second run identical
    val sh2 = Sampling.epochShards(docs, "doc_id", lit(1L), nShards = 4).collect()
    def key(rs: Array[org.apache.spark.sql.Row]) =
      rs.map(r => (r.getAs[Long]("shard"), r.getAs[Long]("pos"),
        r.getAs[Long]("doc_id"))).sortBy(t => (t._1, t._2)).toSeq
    assert(key(sh) == key(sh2))
    // a different epoch must produce a different assignment/order
    val e0 = Sampling.epochShards(docs, "doc_id", lit(0L), nShards = 4).collect()
    assert(key(e0) != key(sh))
  }
}

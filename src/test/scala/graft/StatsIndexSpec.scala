package graft

import graft.operators.StatsIndex
import java.nio.file.Files

/** The incremental data card: per-source counts + HLL distinct
  * sketches maintained at batch cost. The bar mirrors the other index
  * stores': write+append must report IDENTICALLY to a one-shot build
  * over the union, from a fresh session — exact for the additive
  * columns, register-wise-exact for the sketch unions.
  */
class StatsIndexSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String, String)*) =
    rows.toDF("doc_id", "source", "text")

  private val b1 = docs(
    (0L, "web", "alpha beta gamma delta"),
    (1L, "web", "alpha beta gamma delta"), // exact dup of 0
    (2L, "web", "epsilon zeta"),
    (3L, "books", "one two three four five six"))
  private val b2 = docs(
    (4L, "web", "eta theta iota"),
    (5L, "books", "one two three four five six"), // dup of 3
    (6L, "wiki", "seven eight"))

  private def rows(ix: StatsIndex) = ix.report().collect().toSeq

  test("write+append reports identically to a one-shot build over the union; estimates exact at this scale") {
    val p1 = Files.createTempDirectory("graft-stats1").toString
    val inc = new StatsIndex(spark, p1)
    assert(inc.write(b1) == 0L)
    assert(inc.append(b2) == 1L)

    val p2 = Files.createTempDirectory("graft-stats2").toString
    new StatsIndex(spark, p2).write(b1.unionByName(b2))

    // fresh session: everything reads from disk
    val fresh = spark.newSession()
    val incRows = rows(new StatsIndex(fresh, p1))
    val oneRows = rows(new StatsIndex(fresh, p2))
    assert(incRows == oneRows)

    // the card itself: counts exact, sketch estimates exact at this
    // cardinality (HLL stays in its exact sparse mode)
    val web = incRows.find(_.getString(0) == "web").get
    assert(web.getLong(1) == 4L)            // n_docs
    assert(web.getLong(2) == 4 + 4 + 2 + 3) // n_tokens
    assert(web.getLong(4) == 3L)            // distinct_docs_est (0==1)
    assert(web.getLong(5) == 9L)            // distinct tokens: 6 + 3 new
    val books = incRows.find(_.getString(0) == "books").get
    assert(books.getLong(1) == 2L && books.getLong(4) == 1L) // 5 dups 3
  }

  test("compact merges the chain to one |sources|-row dir; report identical; vacuum reaps") {
    val p = Files.createTempDirectory("graft-stats3").toString
    val ix = new StatsIndex(spark, p)
    ix.write(b1)
    ix.append(b2)
    val before = rows(ix)
    val v = ix.compact()
    assert(rows(new StatsIndex(spark.newSession(), p)) == before)
    ix.vacuum(0)
    assert(ix.versions == Seq(v))
    // the compacted dir holds one row per source, not per (source, batch)
    assert(spark.read.parquet(s"$p/v$v/stats").count() == 3L)
  }

  test("append before write fails loudly") {
    val p = Files.createTempDirectory("graft-stats4").toString
    intercept[IllegalStateException](new StatsIndex(spark, p).append(b1))
  }

  test("randomized: arbitrary corpora split across arbitrary appends report-equal to a one-shot build (seeded)") {
    // additive columns merge exactly and HLL unions are register-wise
    // associative, so HOWEVER a corpus splits into appends the merged
    // report must be BIT-identical to a one-shot build — random docs
    // over few sources/tokens (dense dups; null-free) across 1-4 splits
    val rnd = new scala.util.Random(20260814L)
    val sources = Seq("web", "books", "wiki")
    def text(): String = Seq.fill(1 + rnd.nextInt(6))(('a' + rnd.nextInt(6)).toChar)
      .mkString(" ")
    (1 to 3).foreach { trial =>
      val corpus = (0 until 20 + rnd.nextInt(40))
        .map(i => (i.toLong, sources(rnd.nextInt(sources.length)), text()))
      val batches = corpus.grouped(math.max(1, corpus.size / (1 + rnd.nextInt(4)))).toSeq
      val inc = new StatsIndex(spark,
        Files.createTempDirectory(s"graft-st-rand$trial").toString)
      inc.write(docs(batches.head: _*))
      batches.tail.foreach(b => inc.append(docs(b: _*)))
      val full = new StatsIndex(spark,
        Files.createTempDirectory(s"graft-st-rand-full$trial").toString)
      full.write(docs(corpus: _*))
      assert(rows(inc) == rows(full),
        s"trial $trial diverged (docs=${corpus.size} batches=${batches.size})")
    }
  }

  test("card sketch estimates track exact distincts on the driver fixture (x_corpus_stats_card gate)") {
    // the bench/correctness query is report() over the documents
    // fixture; tie its HLL columns to the EXACT distinct counts there
    // (lgK=12 => rsd ~1.6%; gate at 5% — an lgK/seeding/union
    // regression is tens of sigma out, fixture noise is zero)
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val p = Files.createTempDirectory("graft-stats-fixture").toString
    val ix = new StatsIndex(spark, p)
    ix.write(docs)
    val card = ix.report().collect()
      .map(r => r.getString(0) -> (r.getLong(4), r.getLong(5))).toMap
    val exact = docs
      .select(col("source"), sha2(col("text"), 256).as("d"),
        explode_outer(split(col("text"), " ")).as("t"))
      .groupBy(col("source"))
      .agg(countDistinct(col("d")).as("dd"), countDistinct(col("t")).as("dt"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(card.keySet == exact.keySet)
    card.foreach { case (src, (estDocs, estToks)) =>
      val (exDocs, exToks) = exact(src)
      assert(math.abs(estDocs - exDocs).toDouble / exDocs <= 0.05,
        s"$src: distinct_docs_est=$estDocs vs exact=$exDocs")
      assert(math.abs(estToks - exToks).toDouble / exToks <= 0.05,
        s"$src: distinct_tokens_est=$estToks vs exact=$exToks")
    }
  }

  test("tagged append is idempotent: a redelivered batch commits nothing and counts once") {
    val p = Files.createTempDirectory("graft-stats5").toString
    val ix = new StatsIndex(spark, p)
    ix.write(b1)
    val v1 = ix.append(b2, tag = Some("stats-1"))
    // the streaming redelivery shape: same batch, same tag, re-run
    assert(ix.append(b2, tag = Some("stats-1")) == v1)
    assert(ix.versions == Seq(0L, v1))
    val books = ix.report().collect().find(_.getString(0) == "books").get
    assert(books.getLong(1) == 2L) // b1's + b2's, each ONCE
  }

  test("tags survive compact + vacuum: a replayed batch still commits nothing") {
    // the cadenced-maintenance hazard: compact folds the chain to one
    // untagged dir and vacuum deletes the reaped versions' tag files —
    // without tags.txt folding, the replay guard would die with the
    // chain and an at-least-once redelivery would double-count forever
    val p = Files.createTempDirectory("graft-stats8").toString
    val ix = new StatsIndex(spark, p)
    ix.write(b1)
    ix.append(b2, tag = Some("stats-1"))
    val before = rows(ix)
    val vC = ix.compact()
    assert(ix.vacuum(0) >= 1) // the tagged version itself is reaped
    // replay of the tagged batch: still suppressed, report unmoved
    assert(ix.append(b2, tag = Some("stats-1")) == vC)
    assert(rows(ix) == before)
    // a SECOND compact folds tags.txt forward transitively
    ix.append(docs((7L, "wiki", "nine ten")), tag = Some("stats-2"))
    ix.compact()
    ix.vacuum(0)
    val after = rows(ix)
    assert(ix.append(b2, tag = Some("stats-1")) == ix.currentVersion.get)
    assert(ix.append(docs((7L, "wiki", "nine ten")), tag = Some("stats-2"))
      == ix.currentVersion.get)
    assert(rows(ix) == after)
  }

  test("same-tag appends interleaved across writers commit exactly once (the check-then-act race)") {
    val p = Files.createTempDirectory("graft-stats6").toString
    val a = new StatsIndex(spark, p)
    val b = new StatsIndex(spark, p) // second writer, same store (cross-process shape)
    a.write(b1)
    // the rival lands its same-tag commit in the exact window between
    // A's outer fast-path lookup (which misses — nothing tagged yet)
    // and A's own commit: the onStageEnter seam fires inside A's
    // commit attempt, before the authoritative re-check
    var rival = -1L
    a.onStageEnter = () => if (rival < 0) rival = b.append(b2, tag = Some("trig-7"))
    val got = a.append(b2, tag = Some("trig-7"))
    assert(rival == 1L && got == rival) // A returned the rival's version
    assert(a.versions == Seq(0L, 1L))   // ONE tagged commit, not two
    // and the sums counted the batch once — identical to a one-shot
    // build over the union, from a fresh session
    val p2 = Files.createTempDirectory("graft-stats7").toString
    new StatsIndex(spark, p2).write(b1.unionByName(b2))
    val fresh = spark.newSession()
    assert(rows(new StatsIndex(fresh, p)) == rows(new StatsIndex(fresh, p2)))
  }
}

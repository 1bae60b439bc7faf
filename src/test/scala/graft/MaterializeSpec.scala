package graft

import graft.operators.Dedup
import java.nio.file.Files

/** The lineage-truncation helper behind every operator materialization
  * site: default localCheckpoint; with `graft.checkpointDir` set, a
  * reliable checkpoint into durable storage (the preemptible-cluster
  * mode) — identical results either way.
  */
class MaterializeSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    (0L, "the quick brown fox jumps over the lazy dog again and again"),
    (1L, "the quick brown fox jumps over the lazy dog again and again"),
    (2L, "pack my box with five dozen liquor jugs for the long trip"),
    (3L, "sphinx of black quartz judge my vow said the old sage")
  ).toDF("doc_id", "text")

  test("reliable-checkpoint mode produces identical results and writes into the configured dir") {
    // baseline: default localCheckpoint mode (config unset). The
    // vehicle is an operator that still materializes through
    // graftCheckpoint (dupNgramFraction no longer does — its branch
    // was folded into a single window pipeline).
    assert(spark.conf.getOption(Materialize.ConfKey).isEmpty)
    val base = Dedup.minhashPairs(corpus, n = 3, k = 16).collect().toSeq

    // a sibling session with the durable dir set: same operator, same
    // rows, but the materialization goes through reliable checkpoint()
    val ckptDir = Files.createTempDirectory("graft-ckpt").toString
    val s2 = spark.newSession()
    s2.conf.set(Materialize.ConfKey, ckptDir)
    try {
      val docs2 = {
        import s2.implicits._
        Seq((0L, "the quick brown fox jumps over the lazy dog again and again"),
          (1L, "the quick brown fox jumps over the lazy dog again and again"),
          (2L, "pack my box with five dozen liquor jugs for the long trip"),
          (3L, "sphinx of black quartz judge my vow said the old sage")
        ).toDF("doc_id", "text")
      }
      val reliable = Dedup.minhashPairs(docs2, n = 3, k = 16).collect().toSeq
      assert(reliable == base)
      // the checkpoint actually landed in the configured dir (i.e. the
      // reliable branch ran, not localCheckpoint)
      val walked = Files.walk(java.nio.file.Paths.get(ckptDir))
      val nFiles = try walked.filter(Files.isRegularFile(_)).count() finally walked.close()
      assert(nFiles > 0, "no checkpoint files written — reliable branch did not run")
    } finally {
      s2.conf.unset(Materialize.ConfKey)
      Fs.deleteTree(java.nio.file.Paths.get(ckptDir), swallow = true)
    }
  }

  test("inTriggerScope demotes every checkpoint to local — nothing lands in the reliable dir") {
    // the streaming-loop guarantee: batch operators with reliable
    // materialization sites (pair search, connected components) run
    // inside foreachBatch without leaking one durable dir per trigger
    val ckptDir = Files.createTempDirectory("graft-ckpt-trig")
    val s2 = spark.newSession()
    s2.conf.set(Materialize.ConfKey, ckptDir.toString)
    try {
      import s2.implicits._
      val out = Materialize.inTriggerScope {
        // a transitively-reliable site: dupNgramFraction graftCheckpoints
        graft.operators.Dedup.dupNgramFraction({
          import s2.implicits._
          Seq((0L, "a b c d e f g h"), (1L, "a b c d e f g h")).toDF("doc_id", "text")
        }, n = 5).count()
      }
      assert(out == 2L)
      val walked = Files.walk(ckptDir)
      val nFiles = try walked.filter(Files.isRegularFile(_)).count() finally walked.close()
      assert(nFiles == 0L, s"reliable checkpoint leaked into $ckptDir inside trigger scope")
    } finally {
      s2.conf.unset(Materialize.ConfKey)
      Fs.deleteTree(ckptDir, swallow = true)
    }
  }

  test("a foreign checkpoint dir sharing a name prefix is re-asserted, not mistaken for ours") {
    // configured /X/ckpt, foreign setCheckpointDir(/X/ckpt2): the old
    // substring containment ('/X/ckpt2/UUID' contains '/X/ckpt') would
    // skip the re-assert and silently divert reliable checkpoints into
    // the foreign dir; the component-prefix test must catch it
    val ours = Files.createTempDirectory("graft-ckpt-a")
    val foreign = java.nio.file.Paths.get(ours.toString + "2")
    Files.createDirectories(foreign)
    val s2 = spark.newSession()
    s2.conf.set(Materialize.ConfKey, ours.toString)
    try {
      import s2.implicits._
      // prime the memo: after this, lastSetDir == ours, so only the
      // containment test stands between a foreign redirect and a
      // silent skip — exactly the false-positive window
      Materialize.checkpoint(Seq((1L, "a")).toDF("id", "t")).count()
      s2.sparkContext.setCheckpointDir(foreign.toString) // foreign code ran
      Materialize.checkpoint(Seq((2L, "b")).toDF("id", "t")).count()
      // the re-assert must have pointed the context back inside OUR dir
      val cp = s2.sparkContext.getCheckpointDir.get
      assert(new java.net.URI(cp).getPath.startsWith(ours.toString + "/"),
        s"checkpoint dir $cp not under $ours")
    } finally {
      s2.conf.unset(Materialize.ConfKey)
      // restore the shared context's checkpoint state for sibling suites
      Fs.deleteTree(ours, swallow = true)
      Fs.deleteTree(foreign, swallow = true)
    }
  }
}

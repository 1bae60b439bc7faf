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
    // baseline: default localCheckpoint mode (config unset)
    assert(spark.conf.getOption(Materialize.ConfKey).isEmpty)
    val base = Dedup.dupNgramFraction(corpus, n = 5).collect().toSeq

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
      val reliable = Dedup.dupNgramFraction(docs2, n = 5).collect().toSeq
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
}

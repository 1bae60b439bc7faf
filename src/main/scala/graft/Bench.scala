package graft

import graft.sources.Tables
import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: every SparkEntry query at SPARK_GRAFT_SF_DIR,
  * one JSON line with per-query seconds.
  *
  * Methodology: the cached base views are materialized once, untimed
  * (the reference is RAM-resident — SURVEY.md §6 — so steady-state
  * query latency is the comparable number); each query then runs to a
  * `noop` sink, which executes the full plan (including sorts/limits
  * that `count()` would skip) without driver-side collection.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // untimed warmup: materialize the cached views the queries read
    Seq("events", "lineitem", "documents", "embeddings").foreach { t =>
      try Tables.table(spark, sfDir, t).count()
      catch { case _: Throwable => () }
    }
    Tables.ts(spark, sfDir).count()

    def exec(name: String): Unit = SparkEntry.queries(name)(spark, sfDir)
      .write.mode("overwrite").format("noop").save()

    def runOnce(name: String): Double = {
      // steady-state: one untimed pass absorbs codegen/JIT compilation
      // (the reference is a long-running warmed server; per-query
      // compile cost is a fixed overhead that vanishes at scale)
      try exec(name) catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
        return -1.0
      }
      System.gc() // don't bill one query for its predecessor's garbage
      val t0 = System.nanoTime()
      exec(name)
      (System.nanoTime() - t0) / 1e9
    }

    val names = SparkEntry.queries.keys.toSeq.sorted
    val results = names.map(n => n -> runOnce(n))
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}

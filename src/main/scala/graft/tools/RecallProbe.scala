package graft.tools

import graft.operators.Similarity
import graft.sources.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off: measure LSH near-dup recall vs brute-force ground truth at
  * several (tables, planes) settings, on the sf0.01 subset.
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.01").filter(col("vec_id") < 200)
    val truth = Similarity.cosineNearDupBrute(emb, 0.35).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    println(s"truth pairs: ${truth.size}")
    for ((t, p) <- Seq((8, 12), (8, 10), (12, 10), (16, 8), (24, 8), (32, 6))) {
      val t0 = System.nanoTime()
      val got = Similarity.cosineNearDupLsh(emb, 0.35, tables = t, planes = p)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"tables=$t%2d planes=$p%2d -> recall ${got.intersect(truth).size}/${truth.size} in $sec%.1fs")
    }
    spark.stop()
  }
}

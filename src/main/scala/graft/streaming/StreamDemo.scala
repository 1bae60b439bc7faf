package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files

/** End-to-end Structured Streaming demo over the parquet fixtures
  * (north_star: "Structured Streaming + Parquet for ingestion+query"):
  * file-source stream → TS projection → watermarked tumbling agg →
  * parquet sink with checkpoint, then a batch read-back of the sink.
  *
  * `sbt "runMain graft.streaming.StreamDemo [sfDir]"`
  */
object StreamDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val work = Files.createTempDirectory("graft-stream").toString
    val schema = spark.read.parquet(s"$sfDir/events.parquet").schema

    // the file source streams a DIRECTORY of arriving files
    Files.createDirectories(java.nio.file.Paths.get(s"$work/in"))
    Files.copy(java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      java.nio.file.Paths.get(s"$work/in/events-000.parquet"))

    val stream = spark.readStream.schema(schema)
      .parquet(s"$work/in")
      .select(graft.sources.Tables.tsMillis(schema("ts").dataType).as("timestamp"),
        col("event_type").as("tag"), col("value"))

    val agg = StreamingIngest.tumblingAgg(stream, "1 day", "1 hour")

    val q = agg.writeStream
      .format("parquet")
      .option("path", s"$work/sink")
      .option("checkpointLocation", s"$work/checkpoint")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    // append mode only emits windows the watermark has closed; with a
    // bounded file source that's every window except the last open one
    val out = spark.read.parquet(s"$work/sink")
    val n = out.count()
    println(s"[stream-demo] sink rows=$n (closed 1-day windows x tags)")
    out.orderBy(col("window_start"), col("tag")).show(10, truncate = false)
    assert(n > 0, "streaming sink is empty")
    spark.stop()
  }
}

package graft

import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Reader-level guards for the driver fixture tables — above all the
  * LONG-`ts` magnitude guard: round 6 proved the fixture's physical
  * `ts` type can change between generations, and while TIMESTAMP
  * shapes adapt safely in [[Tables.tsMillis]], a LONG column is
  * *trusted* to be epoch nanos. These specs pin that a LONG-micros or
  * LONG-millis generation fails loudly at read time instead of
  * silently corrupting every downstream timestamp by 10^3/10^6.
  */
class TablesSpec extends SparkSpec {
  import spark.implicits._

  /** Write an events-shaped parquet with a LONG `ts` at the given
    * epoch scale and read it back through Tables.table. */
  private def roundtrip(tsValues: Seq[Long]): Either[Throwable, Long] = {
    val dir = java.nio.file.Files.createTempDirectory("tables-spec").toString
    tsValues.zipWithIndex
      .map { case (t, i) => (t, s"tag${i % 3}", i.toDouble) }
      .toDF("ts", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    try Right(Tables.table(spark, dir, "events").count())
    catch { case e: Throwable => Left(e) }
    finally Tables.clear()
  }

  private val nanos2024 = 1704067200L * 1000000000L // 2024-01-01 in ns

  test("LONG nanos fixture reads fine and tsMillis projects exact millis") {
    val got = roundtrip(Seq(nanos2024, nanos2024 + 123456789L))
    assert(got == Right(2L))
    // projection exactness on a fresh frame (integer div, no doubles)
    val df = Seq(nanos2024 + 999999L).toDF("ts")
    val millis = df.select(Tables.tsMillis(df).as("m")).head().getLong(0)
    assert(millis == 1704067200000L) // floor, like DuckDB epoch_ms
  }

  test("LONG micros fixture fails loudly with path and observed range") {
    val micros = 1704067200L * 1000000L
    roundtrip(Seq(micros, micros + 5)) match {
      case Left(e: IllegalStateException) =>
        assert(e.getMessage.contains("not plausibly epoch NANOS"))
        assert(e.getMessage.contains("events.parquet")) // names the fixture
      case other => fail(s"expected loud IllegalStateException, got $other")
    }
  }

  test("LONG millis fixture fails loudly too") {
    val millis = 1704067200000L
    roundtrip(Seq(millis)) match {
      case Left(e: IllegalStateException) =>
        assert(e.getMessage.contains("not plausibly epoch NANOS"))
      case other => fail(s"expected loud IllegalStateException, got $other")
    }
  }

  test("TIMESTAMP micros fixture is unaffected by the guard") {
    val dir = java.nio.file.Files.createTempDirectory("tables-spec-ts").toString
    Seq(("2024-01-01 00:00:00.123456", "a", 1.0))
      .toDF("s", "event_type", "value")
      .select(to_timestamp(col("s")).as("ts"), col("event_type"), col("value"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    try {
      val ev = Tables.table(spark, dir, "events")
      assert(ev.count() == 1L)
      val m = ev.select(Tables.tsMillis(ev).as("m")).head().getLong(0)
      assert(m == 1704067200123L)
    } finally Tables.clear()
  }

  test("empty LONG fixture passes the guard (nothing to judge)") {
    assert(roundtrip(Seq.empty[Long]) == Right(0L))
  }
}

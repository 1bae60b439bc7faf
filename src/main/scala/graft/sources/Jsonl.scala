package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** JSONL corpus source/sink (beyond-reference, builder brief): web
  * corpora arrive as JSON-lines dumps, not parquet, and at 100 TB a
  * single corrupt line must quarantine, not kill the ingest.
  *
  * The reader goes through `spark.read.text` + `from_json` rather than
  * `spark.read.json` for two scale reasons: (a) no schema-inference
  * pass — the caller's schema is the contract (the reference is
  * likewise schema-strict: rejectUnknownFields in Model.hs:197-201);
  * (b) malformed lines are classifiable IN the scan stage (`from_json`
  * yields NULL for unparseable text), where `spark.read.json`'s
  * `_corrupt_record` column famously cannot be filtered without
  * caching the raw input first. Everything is a plain Column program:
  * pruning and whole-stage codegen apply, nothing driver-side.
  */
object Jsonl {

  /** Read `path` as JSONL against `schema`. Returns only rows that
    * parse; corrupt lines are silently dropped — use
    * [[readWithQuarantine]] when they must be accounted for.
    */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    readWithQuarantine(spark, path, schema)._1

  /** Read `path` as JSONL: (parsed rows, quarantined raw lines).
    * A line is quarantined when it is not valid JSON (after trimming)
    * or when a non-null `requiredCol` comes back null (missing field /
    * type mismatch — `from_json` is PERMISSIVE per-field). The
    * quarantine frame carries the raw line for replay or forensics.
    * Both frames derive from ONE text scan; Spark plans the split as
    * two passes over the (pruned) scan, each fully codegen'd.
    */
  def readWithQuarantine(spark: SparkSession, path: String, schema: StructType,
                         requiredCol: Option[String] = None): (DataFrame, DataFrame) = {
    val parsed = spark.read.textFile(path).toDF("raw")
      .filter(length(trim(col("raw"))) > 0) // blank lines are not data
      .withColumn("j", from_json(col("raw"), schema))
    val bad = col("j").isNull ||
      requiredCol.map(c => col(s"j.$c").isNull).getOrElse(lit(false))
    (parsed.filter(!bad).select(col("j.*")),
      parsed.filter(bad).select(col("raw")))
  }

  /** Write `df` as JSONL (one object per line, the interchange format
    * the readers above consume). Plain `DataFrameWriter` — partitioned
    * output files, no driver materialization.
    */
  def write(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** The documents-table schema ([[Tables.documents]]'s shape) as the
    * ready-made contract for corpus JSONL dumps.
    */
  def documentsSchema: StructType = StructType.fromDDL(
    "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT")
}

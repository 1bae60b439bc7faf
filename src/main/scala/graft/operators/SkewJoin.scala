package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-resilient equi-join via key salting (builder brief: "salting
  * for skew"). AQE's skew-join handles most cases at runtime; explicit
  * salting remains the tool when one key dominates so heavily that even
  * split partitions hot-spot, or when AQE is unavailable (streaming
  * joins).
  *
  * The fact (left) side gets a deterministic salt from a row-unique
  * column; the dimension (right) side is exploded `salts`× so every
  * (key, salt) bucket finds its match. Shuffle key becomes (key, salt) —
  * a hot key's rows spread over `salts` reducers at the cost of
  * replicating the smaller side.
  */
object SkewJoin {

  /** Inner equi-join on `keys`, salted `salts` ways. `saltOn` must be a
    * (near-)unique left column — the salt is `xxhash64(saltOn) mod
    * salts`, so results are deterministic run-to-run.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                 saltOn: String, salts: Int = 8): DataFrame = {
    val l = left.withColumn("__salt", pmod(xxhash64(col(saltOn)), lit(salts.toLong)))
    val r = right.withColumn("__salt",
      explode(sequence(lit(0L), lit(salts.toLong - 1))))
    l.join(r, keys :+ "__salt").drop("__salt")
  }
}

package graft

import graft.sources.Bucketed
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** The co-located join story: bucketed layout removes BOTH exchanges
  * from a fact-fact join — the plan shape that survives 100 TB.
  */
class BucketedSpec extends SparkSpec {

  test("bucketed co-located join: zero Exchange in the plan, same result as plain join") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select(col("l_orderkey"), col("l_extendedprice"))
    val ord = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .select(col("o_orderkey"), col("o_orderpriority"))
    val tmp = Files.createTempDirectory("graft-bucketed").toString
    Bucketed.writeBucketed(li, "spec_b_li", s"$tmp/li", "l_orderkey", 8)
    Bucketed.writeBucketed(ord, "spec_b_ord", s"$tmp/ord", "o_orderkey", 8)
    // pin the sort-merge path: at fixture size AQE would broadcast one
    // side (introducing a BroadcastExchange), which is exactly the plan
    // that STOPS being available at 100 TB — the zero-Exchange claim is
    // about the big-big case
    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketed.colocatedJoin(spark, "spec_b_li", "spec_b_ord",
        "l_orderkey", "o_orderkey")
      val n = joined.count()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ in:\n$plan")
      // the claim that matters at 100 TB: NO Exchange on either side —
      // the join's network cost is zero. (A partition-LOCAL Sort node
      // remains: Spark only trusts written bucket sort order under the
      // legacy outputOrdering flag since SPARK-28595; sorting an
      // already-sorted single-file bucket is a linear local pass, not
      // a shuffle.)
      assert(!plan.contains("Exchange"), s"unexpected Exchange in:\n$plan")
      assert(plan.contains("Bucketed: true"), s"scan not bucketed in:\n$plan")
      assert(n == li.join(ord, col("l_orderkey") === col("o_orderkey")).count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
      spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS spec_b_li")
      spark.sql("DROP TABLE IF EXISTS spec_b_ord")
    }
  }
}

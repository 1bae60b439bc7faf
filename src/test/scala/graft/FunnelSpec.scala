package graft

import graft.operators.Funnel

/** Funnel and cohort-retention semantics on hand-built event streams:
  * the strict-ordering rules the oracle SQL can't obviously "show".
  */
class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private def ev(rows: (Long, Long, String)*) =
    rows.toDF("user_id", "t", "event_type")

  test("funnel: strictly-after ordering — conversions before (or at) the prior stage don't count") {
    val events = ev(
      (1L, 10L, "view"), (1L, 20L, "click"), (1L, 30L, "purchase"), // full path
      (2L, 20L, "click"), (2L, 30L, "view"),                        // click BEFORE view
      (3L, 10L, "view"), (3L, 10L, "click"),                        // click AT view time
      (4L, 10L, "view"), (4L, 15L, "click"))                        // no purchase
    val got = Funnel.funnel(events, Seq("view", "click", "purchase"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == Seq((1, "view", 4L), (2, "click", 2L), (3, "purchase", 1L)))
  }

  test("funnel: reach time is the EARLIEST qualifying event (later stages measure from it)") {
    // user views at 10; clicks at 15 and 50; purchase at 20 — counts
    // because the click REACH time is 15 (min), not 50
    val events = ev((1L, 10L, "view"), (1L, 15L, "click"),
      (1L, 50L, "click"), (1L, 20L, "purchase"))
    val got = Funnel.funnel(events, Seq("view", "click", "purchase"))
      .collect().map(_.getLong(2)).toSeq
    assert(got == Seq(1L, 1L, 1L))
  }

  test("retentionCohorts: offsets count distinct active users per cohort bucket") {
    // bucket width 100: u1 first in bucket 0, active in 0,1,3 (twice in
    // 1 — distinct); u2 first in bucket 1, active in 1 only
    val events = Seq((1L, 10L), (1L, 110L), (1L, 150L), (1L, 310L),
      (2L, 120L)).toDF("user_id", "t")
    val got = Funnel.retentionCohorts(events, bucketMs = 100L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq((0L, 0L, 1L), (0L, 1L, 1L), (0L, 3L, 1L),
      (100L, 0L, 1L)))
  }
}

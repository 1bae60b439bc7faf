package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Behavioral analytics over the event stream: funnel progression and
  * cohort retention — the two questions every event store gets asked
  * once it holds user activity (beyond-reference, same brief as
  * sessionization).
  *
  * Scale shape: everything is keyed by user — per-stage mins, stage
  * joins and cohort joins all shuffle on the SAME user key (AQE reuses
  * co-partitioning), distinct-user counts fold as partial aggregates,
  * and no stage ever materializes event lists per user (the
  * collect-and-scan-per-user formulation dies on power users; the
  * conditional-min chain below never holds more than one timestamp per
  * user per stage).
  */
object Funnel {

  /** Strictly-ordered funnel counts: a user reaches stage k when an
    * event of type `stages(k)` exists STRICTLY AFTER the time they
    * reached stage k−1 (reach time = the earliest such event — the
    * canonical conditional-min chain, so out-of-order conversions
    * don't count). Returns (stage, stage_name, n_users), stage 1-based.
    *
    * Plan shape (round-15 rewrite, guide §2.4): ONE exchange on the
    * user key, then the whole chain is k cascaded unordered window
    * mins over that partitioning — `m_k = min(t WHERE type = s_k AND
    * t > m_{k-1})` — followed by a per-user rollup (same key, no new
    * exchange) and one scalar count aggregate. The previous form
    * re-joined the event stream against each stage's survivor set:
    * k−1 shuffle joins + k groupBys + a k-leg union (12 jobs measured
    * for k=3; this shape runs 3). Exact equivalence, argued per leg:
    * `t > m_{k-1}` is null (so min skips the row) exactly when the
    * old inner join found no stage-(k−1) row; the user-null guard on
    * k ≥ 2 reproduces the old equi-join dropping null user keys while
    * the stage-1 groupBy kept them; strictness, earliest-reach and
    * per-stage 0-count rows carry over unchanged (FunnelSpec pins the
    * ordering rules; the x_funnel oracle pins the fixture output).
    */
  def funnel(events: DataFrame, stages: Seq[String],
             userCol: String = "user_id", tsCol: String = "t",
             typeCol: String = "event_type"): DataFrame = {
    require(stages.nonEmpty, "funnel: stages must be non-empty")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(userCol))
    val e = events.filter(col(typeCol).isin(stages.distinct: _*))
      .select(col(userCol), col(tsCol).as("__t"), col(typeCol).as("__ty"))
    val withM = stages.zipWithIndex.foldLeft(e) { case (df, (st, i)) =>
      val cond =
        if (i == 0) col("__ty") === st
        else col(userCol).isNotNull && col("__ty") === st &&
          col("__t") > col(s"__m${i - 1}")
      df.withColumn(s"__m$i", min(when(cond, col("__t"))).over(w))
    }
    // m_i is constant within a user partition: max() just surfaces it
    // (null iff the user never reached stage i). Same grouping key as
    // the window partitioning — no second exchange.
    val aggs = stages.indices.map(i => max(col(s"__m$i")).as(s"__m$i"))
    val perUser = withM.groupBy(col(userCol)).agg(aggs.head, aggs.tail: _*)
    val cnts = stages.indices.map(i =>
      count(when(col(s"__m$i").isNotNull, 1)).as(s"__c$i"))
    perUser.agg(cnts.head, cnts.tail: _*)
      .select(explode(array(stages.zipWithIndex.map { case (st, i) =>
        struct(lit(i + 1).as("stage"), lit(st).as("stage_name"),
          col(s"__c$i").as("n_users"))
      }: _*)).as("s"))
      .select(col("s.stage").as("stage"), col("s.stage_name").as("stage_name"),
        col("s.n_users").as("n_users"))
      .orderBy(col("stage"))
  }

  /** Cohort retention matrix: cohort = the fixed-width `bucketMs`
    * bucket of each user's FIRST event; a cohort "retains" a user at
    * offset k if the user has any event in bucket cohort+k. Returns
    * (cohort_start, week_offset, n_users) — n_users at offset 0 is the
    * cohort size by construction.
    */
  def retentionCohorts(events: DataFrame, bucketMs: Long = 604800000L,
                       userCol: String = "user_id",
                       tsCol: String = "t"): DataFrame = {
    val bucket = expr(s"$tsCol div $bucketMs")
    val cohorts = events.groupBy(col(userCol))
      .agg(min(bucket).as("cohort"))
    val active = events.select(col(userCol), bucket.as("bkt")).distinct()
    active.join(cohorts, userCol)
      .groupBy((col("cohort") * bucketMs).as("cohort_start"),
        (col("bkt") - col("cohort")).as("week_offset"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("cohort_start"), col("week_offset"))
  }
}

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
    */
  def funnel(events: DataFrame, stages: Seq[String],
             userCol: String = "user_id", tsCol: String = "t",
             typeCol: String = "event_type"): DataFrame = {
    require(stages.nonEmpty, "funnel: stages must be non-empty")
    val first = events.filter(col(typeCol) === stages.head)
      .groupBy(col(userCol)).agg(min(col(tsCol)).as("t"))
    val stageSets = stages.tail.foldLeft(Vector(first)) { (acc, st) =>
      val nxt = events.filter(col(typeCol) === st).as("e")
        .join(acc.last.select(col(userCol).as("u"), col("t").as("prev_t")),
          col(userCol) === col("u"))
        .filter(col(tsCol) > col("prev_t"))
        .groupBy(col(userCol)).agg(min(col(tsCol)).as("t"))
      acc :+ nxt
    }
    stageSets.zip(stages).zipWithIndex.map { case ((df, name), i) =>
      df.agg(count(lit(1)).as("n_users"))
        .select(lit(i + 1).as("stage"), lit(name).as("stage_name"),
          col("n_users"))
    }.reduce(_ unionByName _).orderBy(col("stage"))
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

package graft.tools

import graft.SparkEntry
import graft.sources.Tables
import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

import scala.collection.mutable

/** Optimization-round instrument (guide §1): per-QUERY breakdown of
  * where wall-clock goes — driver-side planning vs job execution, and
  * per-job/stage durations with shuffle bytes — under the exact Bench
  * methodology (cached views, noop sink, median-of-3 after an untimed
  * warm pass).
  *
  * Usage: SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=32 \
  *   sbt "runMain graft.tools.Profile q1 q2 ..."
  *
  * Output per query: the 3 pass times, then for the LAST pass the job
  * list (duration, #stages) and the stage table (duration, tasks,
  * task-time sum, shuffle read/write bytes, input bytes). Driver gap =
  * pass wall − sum(job walls): Catalyst analysis/optimization +
  * scheduling + result handling.
  */
object Profile {

  private final case class StageRow(id: Int, name: String, tasks: Int,
    wallMs: Long, taskMs: Long, gcMs: Long, shufReadB: Long, shufWriteB: Long,
    inputB: Long)

  private final class Listener extends SparkListener {
    val jobStart = mutable.Map.empty[Int, Long]
    val jobs = mutable.ArrayBuffer.empty[(Int, Long, Int)] // id, wallMs, nStages
    val stages = mutable.ArrayBuffer.empty[StageRow]
    var enabled = false

    override def onJobStart(e: SparkListenerJobStart): Unit =
      if (enabled) jobStart(e.jobId) = e.time

    override def onJobEnd(e: SparkListenerJobEnd): Unit =
      if (enabled) jobStart.remove(e.jobId).foreach { t0 =>
        jobs += ((e.jobId, e.time - t0, -1))
      }

    override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
      if (enabled) {
        val si = e.stageInfo
        val m = si.taskMetrics
        val wall = (for (a <- si.completionTime; b <- si.submissionTime)
          yield a - b).getOrElse(-1L)
        stages += StageRow(si.stageId,
          si.name.takeWhile(_ != '\n').take(90), si.numTasks, wall,
          m.executorRunTime, m.jvmGCTime,
          m.shuffleReadMetrics.totalBytesRead,
          m.shuffleWriteMetrics.bytesWritten,
          m.inputMetrics.bytesRead)
      }

    def reset(): Unit = { jobStart.clear(); jobs.clear(); stages.clear() }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // dev-only A/B knobs (experiments land in Bench/operators once proven)
    val extraConfs = sys.env.getOrElse("GRAFT_PROFILE_CONFS", "")
      .split(";").filter(_.contains("=")).map { kv =>
        val Array(k, v) = kv.split("=", 2); (k, v)
      }
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
    extraConfs.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val listener = new Listener
    spark.sparkContext.addSparkListener(listener)

    // Bench-identical warmup
    Seq("events", "lineitem", "documents", "embeddings").foreach { t =>
      try Tables.table(spark, sfDir, t).count()
      catch { case _: Throwable => () }
    }
    try Tables.ts(spark, sfDir).count() catch { case _: Throwable => () }

    def exec(name: String): Unit = SparkEntry.queries(name)(spark, sfDir)
      .write.mode("overwrite").format("noop").save()

    val names = if (args.nonEmpty) args.toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { n =>
      exec(n) // untimed warm pass, as Bench does
      val times = (0 until 3).map { i =>
        System.gc()
        val profiled = i == 2
        if (profiled) {
          // let the listener bus drain anything from earlier passes
          Thread.sleep(200)
          listener.reset(); listener.enabled = true
        }
        val t0 = System.nanoTime()
        exec(n)
        val dt = (System.nanoTime() - t0) / 1e9
        if (profiled) {
          Thread.sleep(200)
          listener.enabled = false
        }
        dt
      }
      println(f"\n===== $n  passes=${times.map(t => f"$t%.3f").mkString(",")} =====")
      val jobWall = listener.jobs.map(_._2).sum
      println(f"  last pass: ${times(2)}%.3f s wall, ${listener.jobs.size} jobs " +
        f"(sum ${jobWall / 1e3}%.3f s), driver gap ${times(2) - jobWall / 1e3}%.3f s")
      listener.jobs.foreach { case (id, w, _) =>
        println(f"    job $id%4d  ${w / 1e3}%7.3f s")
      }
      println("    stage  wall_s  tasks  task_s    gc_s  shuf_r  shuf_w   input  name")
      listener.stages.sortBy(_.id).foreach { s =>
        println(f"    ${s.id}%5d  ${s.wallMs / 1e3}%6.3f  ${s.tasks}%5d  " +
          f"${s.taskMs / 1e3}%6.2f  ${s.gcMs / 1e3}%6.2f  " +
          f"${fmtB(s.shufReadB)}%6s  ${fmtB(s.shufWriteB)}%6s  " +
          f"${fmtB(s.inputB)}%6s  ${s.name}")
      }
    }
    spark.stop()
  }

  private def fmtB(b: Long): String =
    if (b >= (1L << 20)) f"${b / 1048576.0}%.1fM"
    else if (b >= 1024) f"${b / 1024.0}%.0fK"
    else b.toString
}

package graft

import org.apache.spark.sql.DataFrame

/** The ONE place plan-shape materialization happens: operators that
  * compute an expensive subtree once and feed it to 2–3 consumers
  * (exploded n-gram occurrences, scrubbed corpora, minhash signatures)
  * truncate its lineage here instead of calling
  * `localCheckpoint`/`checkpoint` directly.
  *
  * Default is `localCheckpoint()`: executor-local block storage, no
  * configuration, the right call on a single node or a non-preemptible
  * cluster. Its failure mode at scale is the reason this helper exists:
  * localCheckpoint truncates lineage WITHOUT reliable storage, so on a
  * preemptible 1000-executor cluster losing one executor after the
  * checkpoint kills the job unrecoverably. Setting the session config
  * `graft.checkpointDir` to a durable path (HDFS/object store) switches
  * every such site to reliable `checkpoint()` — recomputable-from-disk
  * lineage truncation — with no operator code change.
  */
object Materialize {

  /** Session config key: durable checkpoint directory. Unset (default)
    * => `localCheckpoint`; set => reliable `checkpoint` into it.
    */
  val ConfKey = "graft.checkpointDir"

  /** The dir last asserted via setCheckpointDir, per context — weak
    * keys so a stopped context doesn't pin its entry.
    */
  private val lastSetDir =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[org.apache.spark.SparkContext, String]())

  /** Materialize `df` once and truncate its lineage (eager in both
    * modes — the callers reuse the result immediately, and laziness
    * would re-enter the race localCheckpoint has with lazy evaluation).
    */
  def checkpoint(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    // inside a streaming trigger ([[inTriggerScope]]) EVERY
    // materialization is trigger-scoped, including the ones buried in
    // batch operators the trigger calls into (pair search, connected
    // components) — reliable checkpoint files are not
    // reference-cleaned, so an unbounded foreachBatch loop reaching a
    // reliable site would grow the durable store by directories per
    // trigger, forever
    if (triggerScope.get) return df.localCheckpoint()
    spark.conf.getOption(ConfKey).filter(_.nonEmpty) match {
      case Some(dir) =>
        // setCheckpointDir is SparkContext-global; re-assert when this
        // session's configured dir differs from the last one asserted so
        // sibling sessions with different configs don't inherit a stale
        // path silently (last-set wins within one context, documented).
        // The comparison must use OUR record of what was set, not
        // `getCheckpointDir`: Spark stores `<dir>/<random-UUID>`, which
        // never equals the raw configured dir — comparing against it
        // would re-mkdir a fresh UUID subdir on every call (an
        // object-store metadata op per materialization site, dozens per
        // connected-components run)
        val sc = spark.sparkContext
        // skip the re-assert only when BOTH our memo matches AND the
        // context still points inside our dir — foreign code calling
        // setCheckpointDir directly would otherwise silently divert
        // every later checkpoint. getCheckpointDir is the
        // fully-qualified `<dir>/<UUID>`, so the containment test
        // qualifies OUR dir the same way setCheckpointDir does
        // (scheme + authority + relative resolution against the
        // dir's own filesystem — a raw string or JVM-cwd comparison
        // breaks on clusters whose default FS isn't local) and then
        // prefix-matches on the "/" boundary: a bare substring match
        // would false-positive on a sibling dir sharing a prefix
        // (/tmp/ckpt vs /tmp/ckpt2) and silently divert checkpoints
        // into the foreign directory
        val already = dir == lastSetDir.get(sc) &&
          sc.getCheckpointDir.exists(cp =>
            cp.startsWith(qualified(dir, sc).stripSuffix("/") + "/"))
        if (!already) {
          sc.setCheckpointDir(dir)
          lastSetDir.put(sc, dir)
        }
        df.checkpoint()
      case None => df.localCheckpoint()
    }
  }

  /** `dir` fully qualified exactly as `setCheckpointDir` stores it:
    * through the dir's own Hadoop filesystem (scheme + authority, and
    * relative paths resolved against THAT filesystem's working
    * directory — hdfs:/user/<u> on an HDFS default FS, not the JVM
    * cwd). Falls back to the raw string if no filesystem resolves.
    */
  private def qualified(dir: String, sc: org.apache.spark.SparkContext): String =
    try {
      val p = new org.apache.hadoop.fs.Path(dir)
      p.getFileSystem(sc.hadoopConfiguration).makeQualified(p).toString
    } catch { case _: Exception => dir }

  private val triggerScope = new ThreadLocal[Boolean] {
    override def initialValue(): Boolean = false
  }

  /** Run `f` with every [[checkpoint]] call demoted to
    * trigger-scoped `localCheckpoint` — the streaming ingest wrappers
    * wrap each foreachBatch body in this, so batch operators they
    * call into (with reliable-checkpoint sites that are correct for
    * batch jobs) cannot leak one durable directory per trigger.
    * Thread-local: materialization decisions happen driver-side on
    * the micro-batch thread.
    */
  def inTriggerScope[T](f: => T): T = {
    val prev = triggerScope.get
    triggerScope.set(true)
    try f finally triggerScope.set(prev)
  }

  /** Trigger-scoped materialization for UNBOUNDED streaming loops:
    * always `localCheckpoint`, even when [[ConfKey]] is set. Reliable
    * checkpoint files are not reference-cleaned by default
    * (`spark.cleaner.referenceTracking.cleanCheckpoints` is false), so
    * a foreachBatch calling [[checkpoint]] would grow the durable
    * store by a few directories per trigger, forever. Losing an
    * executor mid-trigger just fails that trigger — the streaming
    * engine's retry-from-offsets is the recovery path, not lineage
    * replay — so reliable storage buys nothing here.
    */
  def ephemeral(df: DataFrame): DataFrame = df.localCheckpoint()

  /** Chain syntax: `df.graftCheckpoint()` == `Materialize.checkpoint(df)`. */
  implicit final class MaterializeOps(private val df: DataFrame) extends AnyVal {
    def graftCheckpoint(): DataFrame = Materialize.checkpoint(df)
  }
}

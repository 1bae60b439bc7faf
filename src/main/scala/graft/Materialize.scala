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
        // scheme-qualified `<dir>/<UUID>`, so the containment test is
        // a PATH-COMPONENT prefix (scheme stripped, trailing "/"
        // appended): a bare substring match would false-positive on a
        // sibling dir sharing a prefix (/tmp/ckpt vs /tmp/ckpt2) and
        // silently divert checkpoints into the foreign directory
        val already = dir == lastSetDir.get(sc) &&
          sc.getCheckpointDir.exists(cp =>
            pathOf(cp).startsWith(pathOf(dir).stripSuffix("/") + "/"))
        if (!already) {
          sc.setCheckpointDir(dir)
          lastSetDir.put(sc, dir)
        }
        df.checkpoint()
      case None => df.localCheckpoint()
    }
  }

  /** The path component of a possibly scheme-qualified location
    * (`file:/a/b` and `hdfs://host/a/b` both → `/a/b`; an unparseable
    * or scheme-less string is its own path). A RELATIVE result is
    * resolved against the working directory — Spark resolves a
    * relative setCheckpointDir the same way, and without this a
    * relative configured dir would never prefix-match the
    * scheme-qualified absolute getCheckpointDir, re-asserting (and
    * minting a fresh UUID subdir) on every call.
    */
  private def pathOf(s: String): String = {
    val p0 =
      try {
        val p = new java.net.URI(s).getPath
        if (p == null || p.isEmpty) s else p
      } catch { case _: java.net.URISyntaxException => s }
    if (p0.startsWith("/")) p0
    else java.nio.file.Paths.get(p0).toAbsolutePath.normalize.toString
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

package graft.ops

import org.apache.spark.sql.DataFrame

import scala.util.control.NonFatal

/** CPU-parallelism guard for compute-heavy per-row operators.
  *
  * A small parquet file arrives as ONE input split, so hash/shingle/TF-IDF
  * kernels would run on one core no matter how many the cluster has. When
  * the incoming partition count is well below the session's default
  * parallelism, repartition up — the shuffle moves only the (small) input,
  * the per-row compute then uses every core. At 100 TB inputs already carry
  * thousands of splits and this is a no-op.
  */
object Parallelism {
  /** Typed identity barrier: materializes `df`'s projection before any
    * downstream plan rewrite can see inside it. The ONE implementation of
    * an idiom four operators depend on, because two optimizer behaviors
    * re-evaluate expensive expressions otherwise: (a) projection collapse
    * inlines a projected subtree into every consumer expression, and
    * interpreted higher-order exprs get no cross-expression CSE (a
    * multi-band digest or multi-signal projection then recomputes its
    * shared chain once per consumer); (b) InferFiltersFromGenerate + join
    * constraints synthesize size/notnull filters that INLINE the full
    * generator child and push it below the parallelizing exchange. The
    * barrier is a narrow per-partition pass — no shuffle, no caching,
    * scale shape unchanged. */
  def barrier(df: DataFrame): DataFrame =
    df.mapPartitions(it => it)(org.apache.spark.sql.Encoders.row(df.schema))

  /** Eagerly materialize `df` AND truncate its lineage — the staging
    * primitive for (a) iterative loops whose plans reference the previous
    * round more than once (the logical plan otherwise doubles per round
    * and hangs the driver in plan analysis long before any task runs) and
    * (b) operator-internal row-sets consumed by several downstream jobs
    * (caching via `persist` would pin a CacheManager entry forever — no
    * unpersist hook exists when the caller consumes the result lazily).
    *
    * Fault tolerance: with a checkpoint dir configured
    * (`sc.setCheckpointDir`, the production setting at cluster scale) this
    * is a RELIABLE checkpoint — blocks rebuild from the checkpoint files
    * after executor loss. Without one it degrades to a local checkpoint:
    * correct and GC-cleaned on local/static deployments, but
    * executor-resident (an executor lost afterwards fails the job, and
    * dynamic allocation can reclaim the executor under it) — a cluster
    * deployment of the iterative/staged operators should set a
    * checkpoint dir.
    *
    * That contract is ENFORCED, not just documented: on a non-local
    * master with no checkpoint dir, stage() warns loudly on every
    * fallback — or refuses outright when
    * `graft.stage.requireCheckpointDir=true` (the strict setting for
    * clusters running dynamic allocation, where the silent
    * localCheckpoint trade is never acceptable). */
  def stage(df: DataFrame): DataFrame = {
    val sc = df.sparkSession.sparkContext
    if (sc.getCheckpointDir.isDefined) df.checkpoint(eager = true)
    else {
      val strict = df.sparkSession.conf
        .get("graft.stage.requireCheckpointDir", "false").toBoolean
      stageFallback(sc.master, strict) match {
        case StageFallback.Refuse =>
          throw new IllegalStateException(
            "graft.stage.requireCheckpointDir=true but no checkpoint dir " +
              s"is set on non-local master '${sc.master}': call " +
              "sc.setCheckpointDir (localCheckpoint is not fault-tolerant " +
              "under executor loss / dynamic allocation)")
        case StageFallback.Warn =>
          // every time, not once-per-process: a process-global warn-once
          // flag silences the warning for every LATER SparkSession in the
          // same JVM; the fallback is rare enough on a real cluster that
          // repeating the line costs nothing and hides nothing
          org.slf4j.LoggerFactory.getLogger(getClass).warn(
              "Parallelism.stage: no checkpoint dir on non-local master " +
                s"'${sc.master}' — falling back to localCheckpoint, which " +
                "FAILS THE JOB on executor loss and is unsafe under " +
                "dynamic allocation. Set sc.setCheckpointDir for reliable " +
                "checkpoints (graft.stage.requireCheckpointDir=true to " +
                "refuse instead).")
          df.localCheckpoint(eager = true)
        case StageFallback.Silent =>
          df.localCheckpoint(eager = true)
      }
    }
  }

  /** What [[stage]] does when no checkpoint dir is set — pure so the
    * non-local branches are testable without constructing a cluster
    * session. Local masters (local[*], local-cluster test rigs) keep the
    * silent localCheckpoint: executors live in/with the driver JVM, so
    * "executor loss" means the job is gone anyway. */
  sealed trait StageFallback
  object StageFallback {
    case object Silent extends StageFallback
    case object Warn extends StageFallback
    case object Refuse extends StageFallback
  }
  private[graft] def stageFallback(master: String,
                                   strict: Boolean): StageFallback = {
    val local = master.startsWith("local")
    if (local) StageFallback.Silent
    else if (strict) StageFallback.Refuse
    else StageFallback.Warn
  }
  /** Runs `f` against a CLONED session whose
    * `spark.sql.shuffle.partitions` is pinned to `n` — the
    * state-partition sizing lever for bounded streaming drains. Stateful
    * streaming operators keep one state store per shuffle partition
    * (stream-stream joins: FOUR — left/right ×
    * keyToNumValues/keyWithIndexToValue), each paying per-micro-batch
    * open/commit/maintenance machinery, so a drain's wall-time is
    * dominated by state-partition COUNT rather than data volume at bench
    * scale — and a production job sizes this deliberately per stream.
    * Build the stream FROM the session handed to `f` (a plan built on the
    * parent session plans with the parent's conf) and keep the whole
    * start→awaitTermination span inside `f`. Only for queries on FRESH
    * (temp) checkpoints: an existing checkpoint's state cannot be
    * repartitioned.
    *
    * Concurrency-safe BY CONSTRUCTION: conf is per-session state, so the
    * override lives and dies with the clone — two overlapping drains each
    * plan at their own `n`, unrelated queries on the parent session never
    * see it, and there is no restore step to race. `newSession()` shares
    * the SparkContext but starts from the CONTEXT defaults, so the clone
    * first inherits every modifiable conf the parent session has set
    * (legacy-parquet flags, drain tuning knobs, SQL extensions state) —
    * without that, a session-level setting made just before the drain
    * would silently vanish inside it. */
  def scopedShufflePartitions[T](spark: org.apache.spark.sql.SparkSession,
      n: Int)(f: org.apache.spark.sql.SparkSession => T): T = {
    val scoped = spark.newSession()
    spark.conf.getAll.foreach { case (k, v) =>
      // try-set rather than isModifiable-filter: custom (unregistered)
      // keys like graft.* report non-modifiable yet set() accepts them;
      // genuinely static confs throw and keep the clone's default
      if (!scoped.conf.getOption(k).contains(v))
        try scoped.conf.set(k, v) catch { case NonFatal(_) => }
    }
    scoped.conf.set("spark.sql.shuffle.partitions", n.toString)
    f(scoped)
  }

  def ensure(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    // inputFiles is a metadata lookup; the file count bounds the scan's
    // split count from below, so a many-file (at-scale) frame skips the
    // expensive plan->RDD conversion entirely. Only when files are few (or
    // the lookup fails — non-file-backed plans) can the scan be
    // under-split — then check the real partition count (a single LARGE
    // file still splits by maxPartitionBytes).
    val files: Option[Int] =
      try Some(df.inputFiles.length) catch { case NonFatal(_) => None }
    if (files.exists(_.toLong * 2 >= target)) df
    else if (df.rdd.getNumPartitions * 2 < target) df.repartition(target)
    else df
  }
}

package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Lifecycle contract for the incremental-dedup seen ledger — the
  * standing fingerprint store that [[Dedup.dropSeenBefore]] probes
  * across crawls. Without maintenance the ledger only ever grows and
  * every crawl re-appends the duplicates it just dropped; this object
  * pins the three missing contracts:
  *
  *  - '''dedupe-on-append''': [[append]] writes only fingerprints not
  *    already present, so after N crawls the ledger holds exactly the
  *    distinct content mass ever seen — never N× it. The new-vs-standing
  *    check is the same bloom-prefilter + anti-join-confirm shape as
  *    `dropSeenBefore` itself (join input ∝ duplicate rate).
  *  - '''fingerprint-prefix partitioning''': the ledger is laid out as
  *    `fp_prefix=XX/` (first two hex chars, 256-way). A probe that knows
  *    its incoming prefixes ([[probeFor]]) prunes the scan at the
  *    FileIndex — a small delta crawl reads only the partitions it can
  *    possibly collide with, not the whole standing corpus's ledger.
  *  - '''retention''': every entry carries the caller's `crawl_id` of
  *    FIRST sight. [[compact]] can drop crawls by id — the documented
  *    trade being that content first seen in an expired crawl becomes
  *    re-admissible (exactly the web-crawl "recrawl window" semantics).
  *    Compaction also rewrites each partition to one file, healing the
  *    small-file accretion of many appends.
  *
  * 100 TB shape: the ledger is fingerprints only (16 B hex + crawl id),
  * never text; appends shuffle hashes only; the 256-way prefix layout
  * keeps every partition independently compactable and lets a cluster
  * run compaction as 256 parallel single-partition rewrites.
  */
object SeenLedger {
  val FingerprintCol = "content_hash"
  val CrawlCol = "crawl_id"
  val PrefixCol = "fp_prefix"

  private def withPrefix(df: DataFrame): DataFrame =
    df.withColumn(PrefixCol, substring(col(FingerprintCol), 1, 2))

  /** Pinned partition count for the prefix-clustered writes: all rows of
    * one prefix land in one task for ANY count (hash partitioning), so
    * the one-file-per-prefix-dir layout is invariant; the count only
    * trades task-launch overhead (small scale) against write parallelism
    * (cluster scale), capped at the 256-way prefix fan-out. */
  private def writeTasks(spark: SparkSession): Int =
    math.min(256, math.max(1, spark.sparkContext.defaultParallelism))

  /** Parquet read tuned to the ledger's BOUNDED layout (r15). The prefix
    * tree caps the ledger at 256 directories, which sits above the
    * default parallel-listing threshold (32) — so every read paid a
    * distributed listing JOB of one task per directory (measured 0.6–0.8 s
    * per read at bench scale) where a driver-side threaded listing of
    * ≤256 dirs is cheap at ANY scale. And ledger files are append-sized
    * (a few KB of hashes each), so the default 4 MB per-file open cost
    * split a few hundred files into ~2-file scan tasks (q203 profile:
    * ~1000 near-empty read tasks per run); 128 KB charges small files
    * realistically while real bytes still split by maxPartitionBytes —
    * a compacted multi-GB ledger keeps full scan parallelism (guide §6
    * small files, §2.2 fewer/larger map tasks). Scoped to a session
    * CLONE so only ledger reads see these settings; the relation captures
    * the clone, so downstream planning keeps them wherever the frame is
    * consumed. */
  private def readTuned(spark: SparkSession, path: String): DataFrame = {
    val s = spark.newSession()
    spark.conf.getAll.foreach { case (k, v) =>
      if (!s.conf.getOption(k).contains(v))
        try s.conf.set(k, v)
        catch { case scala.util.control.NonFatal(_) => }
    }
    s.conf.set("spark.sql.sources.parallelPartitionDiscovery.threshold", "257")
    s.conf.set("spark.sql.files.openCostInBytes", (128L * 1024L).toString)
    s.read.parquet(path)
  }

  /** The standing ledger at `path`; empty (correct schema) if absent —
    * a first crawl needs no bootstrap step. */
  def read(spark: SparkSession, path: String): DataFrame = {
    if (!exists(spark, path))
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType.fromDDL(
          s"$FingerprintCol STRING, $CrawlCol STRING, $PrefixCol STRING"))
    else readTuned(spark, path)
  }

  /** Append crawl `crawlId`'s fingerprints (a frame with a
    * `content_hash` column, e.g. [[Dedup.exactGroups]] output),
    * deduped against the standing ledger: only FIRST-sight fingerprints
    * land, under the crawl id of first sight. Returns rows appended.
    *
    * The standing side compresses into one bloom filter and prefilters
    * the incoming map-side (no false negatives); only bloom-positive
    * fingerprints — prior dupes plus the fpp sliver — pay the exact
    * anti-join confirm, so append cost tracks the NEW mass, not the
    * ledger size. */
  def append(fingerprints: DataFrame, path: String, crawlId: String): Long = {
    val spark = fingerprints.sparkSession
    // persisted: the bloom-split union below evaluates BOTH branches, so
    // an unpersisted fresh0 would re-run the caller's whole fingerprint
    // derivation (a corpus scan + hash shuffle) twice per append; cached
    // it is 16 B/row of hashes, one scan total (r14 profile: one of two
    // full fingerprint passes per append disappeared)
    val fresh0 = fingerprints.select(col(FingerprintCol)).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val novel =
      if (!exists(spark, path)) fresh0
      else {
        val standing = readTuned(spark, path).select(col(FingerprintCol))
        val standingCached = standing
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          val nSeen = standingCached.count()
          if (nSeen == 0L) fresh0
          else {
            val bloom = BloomBuild.bloomBytes(
              standingCached, xxhash64(col(FingerprintCol)), nSeen)
            val might = BloomBuild.mightContain(
              bloom, xxhash64(col(FingerprintCol)))
            fresh0.filter(!might).unionByName(
              fresh0.filter(might)
                .join(standing, Seq(FingerprintCol), "left_anti"))
          }
        } finally standingCached.unpersist(blocking = false)
      }
    val out = withPrefix(novel.withColumn(CrawlCol, lit(crawlId)))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val n = out.count()
      if (n > 0L)
        // cluster by the partition column first: without it every write
        // task owns rows of ~all 256 prefixes and one append fans out to
        // tasks×256 tiny files; clustered, each prefix directory gains
        // ONE file per append. The partition count is PINNED (a keyed
        // repartition with no count is an AQE coalesce target, and on a
        // small append AQE folds the whole write into ONE task that then
        // creates all 256 partition directories serially — measured 14 s
        // wall / 3.2 s CPU for a 1.6k-row append, pure file-create
        // latency) but scale-ADAPTIVE, not a constant: hash partitioning
        // by the prefix puts every row of one prefix in exactly one task
        // for ANY count, so min(256, cores) keeps the identical
        // one-file-per-dir layout while a small-cluster/local append
        // doesn't pay 256 task launches (each task start deserializes a
        // gzip-compressed Hadoop conf — measured ~0.2 s/task serialized
        // on the JVM-global Cleaner lock; r14 guide §2.2 "fewer, larger
        // tasks"). A real cluster's parallelism caps this at the full
        // 256-way fan-out.
        out.repartition(writeTasks(spark), col(PrefixCol))
          .write.mode("append").partitionBy(PrefixCol).parquet(path)
      n
    } finally {
      fresh0.unpersist(blocking = false)
      out.unpersist(blocking = false)
    }
  }

  /** Partition-pruned probe view: the ledger rows that could possibly
    * match `incoming` — the FileIndex skips every `fp_prefix=` directory
    * whose prefix no incoming fingerprint carries. Feed the result to
    * [[Dedup.dropSeenBefore]] in place of the full ledger. The prefix
    * set costs one pass over incoming's fingerprints (bounded ≤256
    * values); worth it when the delta crawl is small against a standing
    * corpus — at full 256-prefix saturation it degrades gracefully to
    * the unpruned scan. */
  def probeFor(spark: SparkSession, path: String, incoming: DataFrame,
               textCol: String): DataFrame = {
    val ledger = read(spark, path)
    val prefixes = incoming
      .select(substring(graft.functions.TextFunctions
        .fingerprint(col(textCol)), 1, 2).as(PrefixCol))
      .distinct().collect().map(_.getString(0)).toSeq
    if (prefixes.size >= 256) ledger // saturated: pruning buys nothing
    else ledger.filter(col(PrefixCol).isInCollection(prefixes))
  }

  /** Rewrite the ledger: drop entries whose first-sight crawl is not in
    * `retainCrawls` (None = keep all), re-dedupe defensively (min crawl
    * id wins if external writers raced), and emit ONE file per prefix
    * partition — the small-file heal for a ledger that took many
    * appends. Returns rows retained. Crash-safety: see [[swapInto]]. */
  def compact(spark: SparkSession, path: String,
              retainCrawls: Option[Set[String]] = None): Long = {
    heal(spark, path)
    if (!exists(spark, path)) return 0L
    val kept0 = readTuned(spark, path)
    val kept1 = retainCrawls match {
      case Some(keep) => kept0.filter(col(CrawlCol).isInCollection(keep.toSeq))
      case None => kept0
    }
    val kept = kept1
      .groupBy(col(FingerprintCol))
      .agg(min(col(CrawlCol)).as(CrawlCol))
    // one file per prefix directory: repartition BY the partition column
    // so each write task owns whole partitions — count pinned (or AQE
    // folds a small compaction into one serial 256-directory write task)
    // and scale-adaptive like [[append]]'s
    swapInto(spark,
      withPrefix(kept).repartition(writeTasks(spark), col(PrefixCol)),
      PrefixCol, path)
  }

  // --- near-dup signature ledger ---------------------------------------

  /** The fuzzy analog over [[Dedup.minhashSignatures]] rows
    * (`band_0..band_{n-1}`), the standing store [[Dedup.dropNearSeenBefore]]
    * probes. Same three contracts as the fingerprint ledger, one layout
    * difference: the signature ledger partitions by `crawl_id=` instead of
    * a key prefix. Rationale: a probe consumes the DISTINCT band set, and
    * incoming band values spread across the full hash space, so no key
    * prefix could ever prune a probe — the bloom prefilter inside
    * `dropNearSeenBefore` IS the prune. What the layout can buy instead is
    * retention: expiring a crawl is a whole-directory drop, and each
    * append lands as one new directory under its own crawl.
    *
    * Dedupe-on-append keys on the FULL band tuple (null-safe — short docs
    * with all-null bands can never collide and are not stored at all):
    * bloom on a 64-bit tuple hash prunes map-side, the exact confirm
    * joins on the band columns themselves, so a hash collision can never
    * silently drop a novel signature. */
  def appendSignatures(signatures: DataFrame, path: String,
      crawlId: String, numBands: Int = 8): Long = {
    val spark = signatures.sparkSession
    require((0 until numBands).forall(b =>
      signatures.columns.contains(s"band_$b")),
      s"signatures must carry band_0..band_${numBands - 1}")
    val bandNames = (0 until numBands).map(b => s"band_$b")
    val bandCols = bandNames.map(col)
    def tupleHash(df: DataFrame) = xxhash64(
      bandNames.map(b => coalesce(col(b).cast("string"), lit(" "))): _*)
    // persisted for the same both-branches reason as [[append]]'s fresh0
    val fresh0 = signatures.select(bandCols: _*)
      .filter(bandCols.map(_.isNotNull).reduce(_ || _))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val novel =
      if (!exists(spark, path)) fresh0
      else {
        val standing = readTuned(spark, path).select(bandCols: _*)
        val standingCached = standing
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          val nSeen = standingCached.count()
          if (nSeen == 0L) fresh0
          else {
            val bloom = BloomBuild.bloomBytes(
              standingCached, tupleHash(standingCached), nSeen)
            val might = BloomBuild.mightContain(bloom, tupleHash(fresh0))
            val in = fresh0.alias("in")
            val led = standing.alias("led")
            val sameTuple = bandNames
              .map(b => col(s"in.$b") <=> col(s"led.$b")).reduce(_ && _)
            fresh0.filter(!might).unionByName(
              in.filter(might).join(led, sameTuple, "left_anti"))
          }
        } finally standingCached.unpersist(blocking = false)
      }
    val out = novel.withColumn(CrawlCol, lit(crawlId))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val n = out.count()
      if (n > 0L)
        out.write.mode("append").partitionBy(CrawlCol).parquet(path)
      n
    } finally {
      fresh0.unpersist(blocking = false)
      out.unpersist(blocking = false)
    }
  }

  /** The standing signature ledger at `path` (band columns + `crawl_id`);
    * empty with the correct schema if absent. Feed directly to
    * [[Dedup.dropNearSeenBefore]] — the extra crawl column rides along. */
  def readSignatures(spark: SparkSession, path: String,
      numBands: Int = 8): DataFrame = {
    if (!exists(spark, path)) {
      val ddl = (0 until numBands).map(b => s"band_$b BIGINT")
        .mkString(", ") + s", $CrawlCol STRING"
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType.fromDDL(ddl))
    } else readTuned(spark, path)
  }

  /** Retention + small-file heal for the signature ledger: drop expired
    * crawls, defensively re-dedupe tuples (min crawl wins), rewrite one
    * file per surviving crawl directory, swap crash-safely. Content
    * first seen only in an expired crawl becomes re-admissible — the
    * same recrawl-window trade as [[compact]]. */
  def compactSignatures(spark: SparkSession, path: String,
      retainCrawls: Option[Set[String]] = None): Long = {
    heal(spark, path)
    if (!exists(spark, path)) return 0L
    val kept0 = readTuned(spark, path)
    val kept1 = retainCrawls match {
      case Some(keep) => kept0.filter(col(CrawlCol).isInCollection(keep.toSeq))
      case None => kept0
    }
    val bandNames = kept0.columns.filter(_.startsWith("band_")).toSeq
    val kept = kept1
      .groupBy(bandNames.map(col): _*)
      .agg(min(col(CrawlCol)).as(CrawlCol))
    swapInto(spark, kept.repartition(col(CrawlCol)), CrawlCol, path)
  }

  /** Stage `kept` partitioned by `partitionCol` next to `path`, then swap
    * it in with NO lost-ledger crash window: the live ledger is renamed
    * ASIDE (`<path>.old`) before the staging renames in, so every crash
    * point leaves a recoverable copy — [[heal]] (run by read/compact)
    * renames `.old` back when a crash stranded it. A retention set that
    * empties the ledger is handled without the parquet-read round-trip
    * (an empty dynamic-partition staging has no schema-bearing files and
    * cannot be read back): the ledger directory is simply deleted, and
    * the next read returns the empty frame. Returns rows retained. */
  private def swapInto(spark: SparkSession,
      kept: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
      partitionCol: String, path: String): Long = {
    val keptCached = kept
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val n = keptCached.count()
      val hPath = new org.apache.hadoop.fs.Path(path)
      val fs = hPath.getFileSystem(spark.sessionState.newHadoopConf())
      if (n == 0L) { fs.delete(hPath, true); return 0L }
      val staging = new org.apache.hadoop.fs.Path(s"$path.compacting")
      val old = new org.apache.hadoop.fs.Path(s"$path.old")
      keptCached.write.mode("overwrite")
        .partitionBy(partitionCol).parquet(staging.toString)
      fs.delete(old, true) // stale aside-copy from a healed prior crash
      if (fs.exists(hPath) && !fs.rename(hPath, old))
        throw new java.io.IOException(
          s"compact swap failed renaming aside: $path -> $old")
      if (!fs.rename(staging, hPath)) {
        fs.rename(old, hPath) // restore the live ledger before failing
        throw new java.io.IOException(
          s"compact swap failed: $staging -> $path (ledger restored)")
      }
      fs.delete(old, true)
      n
    } finally keptCached.unpersist(blocking = false)
  }

  /** Crash recovery for [[swapInto]]: a crash between the aside-rename
    * and the swap-in leaves the ledger at `<path>.old` and nothing at
    * `path` — rename it back. Any `<path>.compacting` leftover is a
    * partial staging and is re-overwritten by the next compact. */
  private def heal(spark: SparkSession, path: String): Unit = {
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sessionState.newHadoopConf())
    val old = new org.apache.hadoop.fs.Path(s"$path.old")
    if (!fs.exists(hPath) && fs.exists(old)) fs.rename(old, hPath)
  }

  private def exists(spark: SparkSession, path: String): Boolean = {
    heal(spark, path)
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sessionState.newHadoopConf())
    fs.exists(hPath) && fs.listStatus(hPath).nonEmpty
  }
}

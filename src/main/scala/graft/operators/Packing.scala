package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Sequence packing for training-batch assembly: assign documents to
  * fixed-capacity token bins ("context windows") deterministically.
  *
  * A truly optimal packing is a sequential bin-pack — inherently serial.
  * The distributed formulation used at scale (and here) is G independent
  * packers: route each doc to a pack group by a deterministic key hash,
  * then pack WITHIN each group in id order. All G packers run in
  * parallel, no single-partition global sort exists in any plan, and G
  * scales with the cluster. Three packing rules, loosest to strictest:
  *
  *   - [[packBins]]: start-offset grouping via a window cumsum — pure
  *     declarative SQL, but bins are NOT capacity-bounded (a bin's total
  *     can exceed capacity by up to one document's tail).
  *   - [[packBinsNextFit]]: true next-fit — a bin closes when the next
  *     doc would overflow it, so no bin exceeds capacity unless a single
  *     document alone does. Sequential scan per group via mapPartitions.
  *   - [[packSlices]]: GPT-style stream slicing — docs concatenate into
  *     a token stream cut into EXACTLY-capacity windows, docs spanning
  *     window boundaries split. Every bin is full by construction.
  */
object Packing {

  /** Deterministic group routing: `id % groups`. Fails fast on a
    * non-integral id column — `cast("long")` on a string id would yield
    * null, collapsing EVERY row into one sentinel group and silently
    * packing the whole dataset through a single sequential packer. */
  private def packGroup(df: DataFrame, idCol: String, groups: Int) = {
    val dt = df.schema(idCol).dataType
    require(Seq("byte", "short", "integer", "long")
      .contains(dt.typeName),
      s"packing id column '$idCol' must be integral (got ${dt.typeName}); " +
        "hash string ids to a long first (e.g. xxhash64)")
    col(idCol).cast("long") % groups
  }

  /** Adds pack_group / n_tokens / cum_tokens / pack_bin to each row,
    * PRESERVING every input column (the packed rows are usually
    * materialized into training sequences right after, so dropping the
    * payload would force a join back on id). `idCol` must be integral
    * (enforced — see [[packGroup]]); hash string ids to a long first.
    *
    * Bin rule: START-OFFSET grouping, not first-fit — a doc whose
    * cumulative start offset lies before a capacity boundary joins that
    * bin, so a bin's token total routinely EXCEEDS `capacity` by up to
    * one document's tail (not only for oversize docs). Use this when
    * downstream materialization truncates or re-splits at bin boundaries
    * anyway; use [[packBinsNextFit]] when bins must respect capacity, or
    * [[packSlices]] when windows must be exactly full.
    * Deterministic in (idCol % groups, idCol) order. */
  def packBins(df: DataFrame, idCol: String, tokenCol: String,
      capacity: Int, groups: Int): DataFrame = {
    val w = Window.partitionBy(col("pack_group")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("pack_group", packGroup(df, idCol, groups))
      .withColumn("n_tokens", col(tokenCol))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .withColumn("pack_bin",
        floor((col("cum_tokens") - col("n_tokens")) / capacity))
  }

  /** True next-fit packing: within each group (docs in id order), a bin
    * closes when adding the next doc would push its total past
    * `capacity`. No bin exceeds capacity unless one document alone does
    * (an oversize doc occupies a bin by itself). Adds pack_group /
    * n_tokens / bin_offset (tokens already in the bin before this doc) /
    * pack_bin, preserving all input columns.
    *
    * The next-fit recurrence (bin fill resets on overflow) has no
    * prefix-sum closed form, so it cannot be a window expression; it runs
    * as a streaming per-partition scan: hash-repartition on pack_group,
    * external sort within partitions by (group, id) — spillable, no
    * global barrier — then one O(1)-state pass. Groups are independent,
    * so parallelism = `groups`, sized to the cluster. */
  def packBinsNextFit(df: DataFrame, idCol: String, tokenCol: String,
      capacity: Int, groups: Int): DataFrame = {
    require(capacity > 0 && groups > 0)
    val base = df
      .withColumn("pack_group", packGroup(df, idCol, groups))
      .withColumn("n_tokens", col(tokenCol).cast("long"))
    val sorted = base
      .repartition(groups, col("pack_group"))
      .sortWithinPartitions(col("pack_group"), col(idCol))
    val gi = sorted.schema.fieldIndex("pack_group")
    val ti = sorted.schema.fieldIndex("n_tokens")
    val outSchema = sorted.schema
      .add("bin_offset", LongType).add("pack_bin", LongType)
    sorted.mapPartitions { rows =>
      // several groups can hash into one partition; rows arrive sorted by
      // (group, id), so state resets on each group change
      var curGroup = Long.MinValue
      var bin = 0L
      var fill = 0L
      rows.map { r =>
        // null id rows sort first and pack together as one group;
        // null token counts pack as zero-width (packBins propagates null
        // bins for them — here a hard crash inside mapPartitions is the
        // alternative, so degrade gracefully instead)
        val g = if (r.isNullAt(gi)) Long.MinValue else r.getLong(gi)
        val n = if (r.isNullAt(ti)) 0L else r.getLong(ti)
        if (g != curGroup) { curGroup = g; bin = 0L; fill = 0L }
        if (fill > 0 && fill + n > capacity) { bin += 1; fill = 0L }
        val offset = fill
        fill += n
        Row.fromSeq(r.toSeq :+ offset :+ bin)
      }
    }(Encoders.row(outSchema))
  }

  /** GPT-style stream packing: per group, concatenate docs (id order)
    * into one token stream and cut it into exactly-`capacity` windows;
    * a doc crossing a boundary SPLITS across bins. Emits one row per
    * (doc × window) with pack_group / pack_bin / n_tokens (doc total) /
    * doc_offset (first token of this slice within the doc) /
    * slice_tokens. Every bin holds exactly `capacity` tokens except each
    * group's last — zero padding waste, the packing used when documents
    * are separator-joined rather than kept intact.
    *
    * Fully declarative: window cumsum for start offsets, then
    * `explode(sequence(first_bin, last_bin))` — expected fan-out is
    * stream_tokens/capacity extra rows, and everything stays in codegen
    * around the one per-group window shuffle. Zero-token docs are
    * dropped (they occupy no window). */
  def packSlices(df: DataFrame, idCol: String, tokenCol: String,
      capacity: Int, groups: Int): DataFrame = {
    require(capacity > 0 && groups > 0)
    val w = Window.partitionBy(col("pack_group")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cap = lit(capacity.toLong)
    df.withColumn("pack_group", packGroup(df, idCol, groups))
      .withColumn("n_tokens", col(tokenCol).cast("long"))
      .filter(col("n_tokens") > 0)
      .withColumn("start_off", sum(col("n_tokens")).over(w) - col("n_tokens"))
      .withColumn("pack_bin", explode(sequence(
        floor(col("start_off") / cap),
        floor((col("start_off") + col("n_tokens") - 1) / cap))))
      .withColumn("slice_start",
        greatest(col("start_off"), col("pack_bin") * cap))
      .withColumn("doc_offset", col("slice_start") - col("start_off"))
      .withColumn("slice_tokens",
        least(col("start_off") + col("n_tokens"), (col("pack_bin") + 1) * cap)
          - col("slice_start"))
      .drop("start_off", "slice_start")
  }

  /** Deterministic token-budget prefix: route docs to G groups, take each
    * group's id-ordered prefix while its cumulative token count stays
    * within `budgetPerGroup` — the dataset-assembly step that cuts a
    * corpus to a target token count (total budget = G × budgetPerGroup)
    * without a global sort. Same G-parallel-packers shape as [[packBins]]:
    * the only plan node beyond the scan is one group-partitioned window.
    * Greedy-by-id: the first doc that would overflow the group budget and
    * everything after it in that group are cut. */
  def takeTokenBudget(df: DataFrame, idCol: String, tokenCol: String,
      budgetPerGroup: Long, groups: Int): DataFrame = {
    require(budgetPerGroup > 0 && groups > 0)
    val w = Window.partitionBy(col("pack_group")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // null token counts count as zero-width (same convention as
    // packBinsNextFit) — a null would otherwise null the running sum and
    // silently drop leading docs, breaking the id-ordered-prefix contract
    df.withColumn("pack_group", packGroup(df, idCol, groups))
      .withColumn("n_tokens", coalesce(col(tokenCol).cast("long"), lit(0L)))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .filter(col("cum_tokens") <= budgetPerGroup)
  }

  /** Per-bin packing report: docs per bin, token total, fill fraction. */
  def binStats(packed: DataFrame, capacity: Int): DataFrame =
    packed.groupBy("pack_group", "pack_bin").agg(
      count(lit(1)).as("n_docs"),
      sum(col("n_tokens")).as("bin_tokens"),
      round(sum(col("n_tokens")).cast("double") / capacity, 6).as("fill"))

  /** Length-bucketed batching stats — the dynamic-batching planner's
    * input for INFERENCE over a corpus: sequences grouped into
    * fixed-`width` token-count buckets (bucket k holds lengths
    * [k·width, (k+1)·width)), with the padding waste each bucket pays if
    * its members pad to the bucket's longest member — the quantity
    * length-bucketing exists to minimize (padding to the GLOBAL max
    * instead is the naive batcher's cost; the saved fraction is the
    * operator's value, and the report makes it measurable). One bounded
    * groupBy (≤ maxLen/width buckets); everything else is map-side. */
  def lengthBuckets(df: DataFrame, idCol: String, ntokCol: String,
                    width: Int): DataFrame = {
    require(width >= 1, "width must be >= 1")
    df.select(col(idCol), col(ntokCol).cast("long").as("__graft_ntok"))
      .withColumn("bucket", (col("__graft_ntok") / width).cast("long"))
      .groupBy(col("bucket"))
      .agg(
        count(lit(1)).as("n_docs"),
        max(col("__graft_ntok")).as("max_tokens"),
        sum(col("__graft_ntok")).as("total_tokens"),
        (count(lit(1)) * max(col("__graft_ntok")) -
          sum(col("__graft_ntok"))).as("padding_waste"))
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, DoubleType, FloatType, IntegerType, LongType, ShortType}

import graft.functions.Expressions

/** Exact per-group rank-order statistics ("the value at rank r") over a
  * `(group, value, count)` histogram, WITHOUT any unbounded ordered
  * window — the shared cut machinery behind [[Dsir]]'s global quantile,
  * [[Winsorize]]'s percentile band, and
  * [[LanguageModel.perplexityBuckets]]' terciles.
  *
  * Why not `sum(count) over (order by value)`: the cumulative-sum window
  * serializes every distinct value of a group through ONE reducer, and a
  * micro-resolution score histogram's distinct-value count grows roughly
  * with document count — at 100 TB the "histogram" is itself a
  * billion-row table and the window is the last single-reducer shape in
  * the pipeline. (Per-group partitioning doesn't save the one-giant-group
  * corpus: one language, one source, or the global case.)
  *
  * The replacement is a bounded RADIX SEARCH over an order-isomorphic
  * 64-bit key of the value (identity for integrals, the IEEE bit trick
  * for doubles — [[graft.functions.ExprHelpers.doubleOrderKey]]): up to
  * four passes (adaptive — a narrow key span resolves in one) narrow
  * the key by 16 bits each, so every pass aggregates the
  * in-range histogram rows into AT MOST 2^16 cells per (group, target)
  * and the only ordered window runs over those bounded cells
  * (hash-partitioned by group and target — never SinglePartition, never
  * more than 65536 rows per partition). The histogram is staged once
  * (checkpoint barrier) and each pass is one map-side-combinable
  * aggregation of it, so the whole search costs four bounded linear
  * passes regardless of corpus size — the CMS bound discipline applied
  * to order statistics. Results are EXACT (the search is a radix
  * partition of the key space, not a sketch) and identical to the
  * window form the DuckDB oracles replay.
  *
  * Semantics: rank r in group g resolves to the smallest value whose
  * cumulative count (ascending) reaches r — `min(v : cum(v) >= r)`, the
  * integer rank rule every oracle here uses. Null values are excluded
  * from the histogram (and from the group totals feeding the rank
  * expressions); callers wanting nulls ranked must encode them. Ranks
  * must land in [1, n] — a rank beyond the group total yields no row
  * for that target (null after the final pivot).
  */
object RankCuts {

  private val Dup = "__graft_"

  /** Exact `ceil(num·n / den)` of the group-total column `n` — the rank
    * arithmetic every histogram cut uses ((q·n + d−1) div d in true
    * integral division, so it stays exact past 2^53). */
  def ceilRank(num: Long, den: Long)(n: Column): Column =
    Expressions.int_div(lit(num) * n + lit(den - 1), lit(den))

  /** Resolve each named rank to its value, per group. `hist0` is a
    * (groupCols, valueCol, countCol) histogram (one row per distinct
    * value per group); each rank is an expression over the group's
    * total count. Returns one row per group: groupCols ++ one column
    * per rank name, typed like valueCol. */
  def rankValues(hist0: DataFrame, groupCols: Seq[String], valueCol: String,
                 countCol: String,
                 ranks: Seq[(String, Column => Column)]): DataFrame = {
    require(ranks.nonEmpty, "no rank targets")
    val g0 = s"${Dup}g0"
    val (hist1, groups) =
      if (groupCols.nonEmpty) (hist0, groupCols)
      else (hist0.withColumn(g0, lit(0)), Seq(g0))
    val keyExpr: Column = hist1.schema(valueCol).dataType match {
      case DoubleType => Expressions.double_order_key(col(valueCol))
      case FloatType =>
        Expressions.double_order_key(col(valueCol).cast("double"))
      case ByteType | ShortType | IntegerType | LongType =>
        col(valueCol).cast("long")
      case t => throw new IllegalArgumentException(
        s"rankValues: unsupported value type $t for $valueCol")
    }
    val gcols = groups.map(col)
    val key = s"${Dup}k"
    // ONE materialization of the (possibly corpus-sized) histogram; the
    // radix passes and the final key->value join all read the
    // checkpointed rows instead of re-running the upstream aggregation
    val hist0staged = graft.ops.Parallelism.stage(
      hist1.filter(col(valueCol).isNotNull)
        .select(gcols ++ Seq(col(valueCol), keyExpr.as(key),
          col(countCol).cast("long").as(s"${Dup}c")): _*))

    // adaptive pass count: offset keys to start at the global min and run
    // only as many 16-bit levels as the actual key span needs (a narrow
    // metric like a length column resolves in ONE bounded pass; the full
    // 64-bit double key space needs the four). One 3-field driver collect
    // over the staged histogram buys it — min/max for the span, count for
    // the small-histogram shortcut: a histogram of <= 2^16 rows TOTAL is
    // already within the per-partition bound the radix passes exist to
    // enforce, so the search resolves in ONE shift-0 pass (cell == key)
    // no matter how wide the key span is. Exactness unchanged — one
    // level of the radix partition IS the full search; only the three
    // narrowing passes (each a join + two aggregations) are skipped.
    // At 100 TB the histogram is corpus-sized and the multi-pass bound
    // still governs (r14; guide §1.2 "remove passes").
    val kb = hist0staged
      .agg(min(col(key)), max(col(key)), count(lit(1))).collect()(0)
    val (offset, shifts) =
      if (kb.isNullAt(0)) (0L, Seq(0)) // empty histogram: trivial plan
      else if (kb.getLong(2) <= 65536L) (0L, Seq(0))
      else {
        val span = BigInt(kb.getLong(1)) - BigInt(kb.getLong(0))
        if (span > Long.MaxValue / 2) (0L, Seq(48, 32, 16, 0))
        else {
          val levels = math.max(1, math.ceil(span.bitLength / 16.0).toInt)
          (kb.getLong(0), (0 until levels).reverse.map(_ * 16))
        }
      }
    val hist =
      if (offset == 0L) hist0staged
      else hist0staged.withColumn(key, col(key) - lit(offset))

    // one search instance per (group, target): `rem` is the remaining
    // rank inside the instance's current key range, `p` the range's key
    // prefix at the previous radix width
    val tot = hist.groupBy(gcols: _*)
      .agg(sum(col(s"${Dup}c")).as(s"${Dup}n"))
    var st: DataFrame = tot.select(gcols :+ explode(array(ranks.map {
        case (name, f) =>
          struct(lit(name).as("t"), f(col(s"${Dup}n")).cast("long").as("r"))
      }: _*)).as(s"${Dup}x"): _*)
      .select(gcols ++ Seq(col(s"${Dup}x.t").as(s"${Dup}t"),
        col(s"${Dup}x.r").as(s"${Dup}rem")): _*)

    // radix passes: 16 bits per level; arithmetic shiftRight preserves
    // signed key order, so cell ids sort like the values they cover
    for ((s, i) <- shifts.zipWithIndex) {
      val cell = s"${Dup}cell"
      val joined0 = hist.join(broadcast(st), groups)
      val joined =
        if (i == 0) joined0
        else joined0.filter(
          shiftright(col(key), shifts(i - 1)) === col(s"${Dup}p"))
      val cells = joined
        .groupBy(gcols ++ Seq(col(s"${Dup}t"), col(s"${Dup}rem"),
          shiftright(col(key), s).as(cell)): _*)
        .agg(sum(col(s"${Dup}c")).as(s"${Dup}cc"))
      // bounded window: <= 2^16 cells per (group, target) by construction
      val w = Window.partitionBy(gcols :+ col(s"${Dup}t"): _*)
        .orderBy(col(cell))
      val cum = cells.withColumn(s"${Dup}cum",
        sum(col(s"${Dup}cc")).over(w))
      // pick the first cell reaching the remaining rank; min over
      // (cell, remWithinCell) structs is exactly "smallest cell, carrying
      // its cum-before" since the cell id leads the struct order
      st = cum.filter(col(s"${Dup}cum") >= col(s"${Dup}rem"))
        .groupBy(gcols :+ col(s"${Dup}t"): _*)
        .agg(min(struct(col(cell).as("p"),
          (col(s"${Dup}rem") - (col(s"${Dup}cum") - col(s"${Dup}cc")))
            .as("r"))).as(s"${Dup}pick"))
        .select(gcols ++ Seq(col(s"${Dup}t"),
          col(s"${Dup}pick.r").as(s"${Dup}rem"),
          col(s"${Dup}pick.p").as(s"${Dup}p")): _*)
    }

    // after the shift-0 pass the prefix IS the key: join the original
    // value back (no inverse bit transform needed) and pivot the named
    // targets into columns
    val resolved = st.select(gcols ++ Seq(col(s"${Dup}t"),
        col(s"${Dup}p").as(key)): _*)
      .join(hist.select(gcols ++ Seq(col(key), col(valueCol)): _*),
        groups :+ key)
    val aggs = ranks.map { case (name, _) =>
      min(when(col(s"${Dup}t") === name, col(valueCol))).as(name) }
    resolved.groupBy(gcols: _*).agg(aggs.head, aggs.tail: _*)
      .drop(g0)
  }
}

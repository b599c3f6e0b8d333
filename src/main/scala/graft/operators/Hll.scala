package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** HyperLogLog (Flajolet et al. 2007) — the fixed-size mergeable
  * DISTINCT-count summary, counterpart to the count–min sketch's
  * frequency summary ([[Sketches]]): `m = 2^p` registers, each holding
  * the maximum "leading-zero rank" seen in its hash bucket; the
  * harmonic mean of the registers estimates the distinct count within
  * ~1.04/sqrt(m) relative error. Where the reference counts distincts
  * exactly in one process (e.g. dedup ledgers, per-source censuses —
  * ondine/adapters/response_cache.py:102-293 keys, quality reports),
  * a 100 TB corpus needs the mergeable-sketch form.
  *
  * Scale shape — why this is a 100 TB primitive:
  *  - Building is ONE aggregation whose key space is at most `m`
  *    registers per group regardless of corpus size: `max(reg)`
  *    combines map-side, so the shuffle moves ≤ m rows per partition
  *    per group — never the distinct-key census itself (the thing a
  *    `count(distinct)` would shuffle in full).
  *  - Sketches MERGE by register-wise MAX (max is idempotent +
  *    commutative), so per-shard registers roll up hierarchically —
  *    per crawl/day/source, combined to taste. [[merge]] is that
  *    register-wise union. `count(distinct)` does not merge; HLL does.
  *  - The estimate reads m integers per group — broadcast-size.
  *
  * Exactness discipline (the [[Sketches]] two-tier contract): the
  * portable tier hashes with the salted md5 formula every oracle
  * replays, and ALL register math is integer (rank via bit-smear +
  * popcount — no floating log2); the register sum is kept as the
  * exact integer `sum(2^(maxReg − reg))`, so a DuckDB oracle rebuilds
  * registers AND estimate bit-for-bit. The only floating-point is the
  * final one-expression IEEE chain (alpha·m²·2^maxReg / S, linear
  * counting below 2.5m), rounded once at 6dp — the q148 PMI
  * discipline. The fast tier swaps in codegen'd xxHash64 (same
  * guarantees, Spark-reproducible rather than any-engine-reproducible).
  */
object Hll {

  private val Dup = "__graft_"

  /** Bit length of a non-negative long (position of highest set bit,
    * 1-based; 0 for 0) — integer-exact in any engine with shifts and
    * popcount: smear the top bit downward, then count ones. */
  private def bitLength(w: Column): Column = {
    val s1 = w.bitwiseOR(shiftright(w, 1))
    val s2 = s1.bitwiseOR(shiftright(s1, 2))
    val s3 = s2.bitwiseOR(shiftright(s2, 4))
    val s4 = s3.bitwiseOR(shiftright(s3, 8))
    val s5 = s4.bitwiseOR(shiftright(s4, 16))
    val s6 = s5.bitwiseOR(shiftright(s5, 32))
    bit_count(s6)
  }

  /** 60-bit item hash. Portable: the salted md5 formula every oracle
    * replays. Fast: xxHash64 folded into [0, 2^60). */
  private def hash60(t: Column, portable: Boolean): Column =
    if (portable) TextFunctions.hash64(concat(lit("hll|"), t))
    else pmod(xxhash64(lit("hll"), t), lit(1L << 60))

  /** Build per-group HLL registers over `itemCol`: one row per
    * OCCUPIED register, `(groupCols..., b, reg)` with `b ∈ [0, 2^p)`
    * and `reg ∈ [1, 61−p]` (absent registers read 0). Null items are
    * ignored. ≤ 2^p rows per group, map-side-combined `max`. */
  def registers(df: DataFrame, itemCol: String, groupCols: Seq[String],
                p: Int = 12, portable: Boolean = true): DataFrame = {
    require(p >= 4 && p <= 16, s"p=$p out of [4,16]")
    val m = 1 << p
    val q = 60 - p // hash bits left after the bucket index
    val h = hash60(col(itemCol), portable)
    df.filter(col(itemCol).isNotNull)
      .select(groupCols.map(col) :+ pmod(h, lit(m.toLong)).as("b") :+
        (lit(q + 1) - bitLength(shiftright(h, p))).cast("int").as(s"${Dup}r"): _*)
      .groupBy((groupCols :+ "b").map(col): _*)
      .agg(max(col(s"${Dup}r")).as("reg"))
  }

  /** Registers for MANY columns in ONE scan — the wide-table profiling
    * shape ([[Profiler]]'s approximation tier): each row melts into one
    * `(column, b, r)` triple per non-null atomic column (a single
    * generate, no joins), and one `groupBy(column, b) → max` builds
    * every column's register set together. The shuffle carries at most
    * `cols · 2^p` rows per partition (map-side-combined maxima), never
    * the distinct censuses — where the exact multi-`count(distinct)`
    * plans an expand that multiplies the scanned rows by the number of
    * distinct columns. Values hash through their canonical string cast
    * (the portable-tier discipline: any engine replays `cast AS
    * VARCHAR`). Output: (column, b, reg) — feed [[estimate]] with
    * groupCols = Seq("column"). */
  def registersByColumn(df: DataFrame, cols: Seq[String], p: Int = 12,
                        portable: Boolean = true): DataFrame = {
    require(p >= 4 && p <= 16, s"p=$p out of [4,16]")
    require(cols.nonEmpty, "no columns to sketch")
    val m = 1 << p
    val q = 60 - p
    // Compute every column's (bucket, rank) in ONE projection BELOW
    // the explode, behind a barrier. Two optimizer behaviors make the
    // naive form (hash/smear inside the generator) pathological:
    // a Generate's generator expression is evaluated INTERPRETED with
    // no subexpression elimination — the ~20-node smear chain per
    // element ran 60M interpreted trees (measured 54 s on the 10M-row
    // events replica vs 9 s this way; the same shape re-digesting md5
    // measured 676 s on sf0.1 lineitem) — and CollapseProject would
    // inline a hash projection right back into the generator without
    // the barrier. The generator here is an array of column
    // REFERENCES; posexplode's index then keys the name join, so no
    // per-row string ever materializes. Null values must yield a null
    // hash EXPLICITLY: md5 is null-preserving but xxhash64 SKIPS null
    // arguments (an all-null column would otherwise sketch as one
    // distinct value on the fast tier).
    val prepped = graft.ops.Parallelism.barrier(
      df.select(cols.zipWithIndex.flatMap { case (name, i) =>
        val h = when(col(name).isNotNull,
          hash60(col(name).cast("string"), portable))
        Seq(pmod(h, lit(m.toLong)).as(s"${Dup}b_$i"),
          (lit(q + 1) - bitLength(shiftright(h, p))).cast("int")
            .as(s"${Dup}r_$i"))
      }: _*))
    val pairs = cols.indices.map(i =>
      when(col(s"${Dup}b_$i").isNotNull,
        struct(col(s"${Dup}b_$i").as("b"), col(s"${Dup}r_$i").as("r"))))
    val spark = df.sparkSession
    import spark.implicits._
    val names = cols.zipWithIndex.map { case (n, i) => (i, n) }
      .toDF(s"${Dup}ci", "column")
    prepped.select(posexplode(array(pairs: _*)).as(Seq(s"${Dup}ci", "t")))
      .filter(col("t").isNotNull)
      .select(col(s"${Dup}ci"), col("t.b").as("b"), col("t.r").as(s"${Dup}r"))
      .groupBy(col(s"${Dup}ci"), col("b"))
      .agg(max(col(s"${Dup}r")).as("reg"))
      .join(broadcast(names), Seq(s"${Dup}ci"))
      .select(col("column"), col("b"), col("reg"))
  }

  /** Register-wise max of two register sets built with the same
    * (p, tier) — max idempotence makes the merged registers exactly
    * the registers of the concatenated corpora. */
  def merge(a: DataFrame, b: DataFrame, groupCols: Seq[String]): DataFrame =
    a.unionByName(b).groupBy((groupCols :+ "b").map(col): _*)
      .agg(max(col("reg")).as("reg"))

  /** Distinct-count estimate per group from registers: the standard
    * HLL raw estimate `alpha_m · m² / Σ 2^(−reg)` with linear-counting
    * correction below 2.5m. Output: groups + `(v_zero, s_scaled,
    * hll_est)` where `s_scaled = Σ_b 2^(61−p−reg_b)` is the EXACT
    * integer register sum (absent registers contribute 2^(61−p)) —
    * the oracle-verifiable core — and `hll_est` is the one-expression
    * IEEE estimate rounded at 6dp. Groups with no items don't appear
    * (no registers ⇒ no row). */
  def estimate(regs: DataFrame, groupCols: Seq[String],
               p: Int = 12): DataFrame = {
    require(p >= 4 && p <= 16, s"p=$p out of [4,16]")
    val m = 1 << p
    val scale = 61 - p                 // max register value
    val scalePow = 1L << scale         // 2^scale, exact long
    val mD = lit(m.toDouble)
    val agg = regs.groupBy(groupCols.map(col): _*).agg(
      sum(expr(s"shiftright(${scalePow}L, reg)")).as(s"${Dup}sp"),
      count(lit(1)).as(s"${Dup}nb"))
    val vZero = (lit(m.toLong) - col(s"${Dup}nb")).as("v_zero")
    val withS = agg
      .withColumn("v_zero", vZero)
      .withColumn("s_scaled",
        col(s"${Dup}sp") + col("v_zero") * lit(scalePow))
    val raw = lit(0.7213) / (lit(1.0) + lit(1.079) / mD) * mD * mD *
      lit(scalePow.toDouble) / col("s_scaled").cast("double")
    val est = when(raw <= lit(2.5) * mD && col("v_zero") > 0,
      mD * log(mD / col("v_zero").cast("double"))).otherwise(raw)
    withS.select(groupCols.map(col) :+ col("v_zero") :+ col("s_scaled") :+
      round(est, 6).as("hll_est"): _*)
  }

  /** One-call composition: registers → estimate. */
  def distinctEstimate(df: DataFrame, itemCol: String,
                       groupCols: Seq[String], p: Int = 12,
                       portable: Boolean = true): DataFrame =
    estimate(registers(df, itemCol, groupCols, p, portable), groupCols, p)
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.Parallelism

/** Top principal component of an embedding corpus by power iteration
  * on the covariance matrix — the whitening/diagnostic primitive a
  * vector pipeline wants before ANN (dominant-direction removal à la
  * all-but-the-top, embedding-drift monitoring, projection features).
  *
  * Scale shape: the corpus is touched ONCE to build d sums and d²
  * cross-product sums; everything after runs on the d²-cell scaled
  * covariance `n·Σvⱼvₖ − Σvⱼ·Σvₖ` — a driver table bounded by
  * `require(d ≤ 1024)` (≤ ~1 M cells, the RankCuts bounded-collect
  * discipline). Two kernels feed it: d ≤ 64 uses the declarative
  * posexplode² build (d² codegen'd multiply-adds, map-side combined,
  * SQL-replayable — the q183 oracle re-runs it); d > 64 uses the
  * mapPartitions Gramian kernel (same d² multiply-adds per row in one
  * long-array loop, shuffle = parts·(d²+d+1) labeled partials, no
  * exploded rows) — exact-integer equal by construction, PcaSpec-proven.
  * Power iteration is NOT distributed work at d ≤ 1024; distributing
  * such matrix-vector products would be pure shuffle theater.
  *
  * Exactness (the [[Centrality.hits]] micro discipline on a dense
  * matrix): vectors quantize once to the 1e-6 micro grid; covariance
  * cells are exact integers in BigInt; cells then quantize to ≤1e6
  * micro units by `floorDiv(c·1e6, maxAbs)` so per-round products stay
  * far from overflow in ANY engine (HUGEINT-safe for the oracle);
  * each round is exact integer matvec + floor-normalization pinning
  * the max-|component| entry (ties → lowest index) at SIGNED ±1e6 —
  * sign-deterministic where an L2-normalized eigenvector is only
  * defined up to ±. Every step is integer, so any engine replays the
  * loadings bit-for-bit. Degenerate corpus (zero covariance, e.g. all
  * vectors equal) → null loadings.
  *
  * [[projectTop]] then emits each vector's centered projection
  * `(v − μ)·u`: the dot is exact integer (micro·micro scaled by n),
  * ONE IEEE division per vector at the end. */
object Pca {

  private val Dup = "__graft_"

  /** (dim, loading_micro) — the quantized top principal direction,
    * max-|loading| component pinned at ±1e6. All-null loadings when
    * the covariance is identically zero. */
  def topComponent(df: DataFrame, vecCol: String,
                   iters: Int = 8): DataFrame = {
    val spark = df.sparkSession
    val (d, u) = topComponentVector(df, vecCol, iters)
    import spark.implicits._
    val rows = (0 until d).map(j =>
      (j, if (u == null) None else Some(u(j))))
    rows.toDF("dim", "loading_micro")
  }

  /** (idCol, pc1) — centered projection (v − μ)·u of every vector on
    * the MAX-normalized top direction (u's largest component is ±1, so
    * pc1 is in original vector units times that gauge — the relative
    * ordering and zero point are what downstream filters read), 6dp.
    * Null when degenerate.
    *
    * Scale shape (r10): the centered dot Σⱼ(n·vⱼ − Sⱼ)uⱼ telescopes to
    * n·(v·u) − S·u, where n and the sum vector S already fall out of
    * the covariance kernel and S·u is ONE driver constant — so the
    * projection pass is a bare scan with one native long dot
    * ([[graft.functions.Expressions.vec_dot_long]]) per row: no
    * per-dimension explode, no broadcast join, no groupBy shuffle
    * (previously d exploded rows per vector re-aggregated by id). The
    * per-row dot stays inside a long (|v| ≤ 1e9 micro require-bounded
    * by the moments scan for EVERY d — not just the d > 64 kernel —
    * |u| ≤ 1e6, d ≤ 1024 ⇒ ≤ ~1e18); the n·dot − S·u
    * lift runs in decimal, the one IEEE division per row is unchanged
    * term-for-term, so values are bit-identical to the explode form. */
  def projectTop(df: DataFrame, idCol: String, vecCol: String,
                 iters: Int = 8): DataFrame = {
    val (_, u, n, s) = topWithMoments(df, vecCol, iters)
    val vecs = microVecs(df.select(col(idCol), col(vecCol)), vecCol)
    if (u == null)
      return vecs.select(col(idCol), lit(null).cast("double").as("pc1"))
    val dotS = s.zip(u).map { case (sj, uj) => sj * BigInt(uj) }.sum
    val nDec = lit(new java.math.BigDecimal(n.bigInteger))
      .cast("decimal(38,0)")
    val dot1 = graft.functions.Expressions
      .vec_dot_long(col(s"${Dup}mv"), lit(u))
    vecs
      .filter(col(s"${Dup}mv").isNotNull)
      .select(col(idCol),
        round((nDec * dot1.cast("decimal(38,0)") -
            lit(new java.math.BigDecimal(dotS.bigInteger))
              .cast("decimal(38,0)")).cast("double") /
          (nDec.cast("double") * lit(1e12)), 6).as("pc1"))
  }

  private def microVecs(df: DataFrame, vecCol: String): DataFrame =
    Parallelism.ensure(df).withColumn(s"${Dup}mv", KMeans.microVec(col(vecCol)))

  /** Core: (dim, loadings or null). Two covariance kernels behind one
    * contract, both exact integers: d ≤ 64 keeps the declarative
    * posexplode² build (d² codegen'd cells, SQL-replayable — the q183
    * oracle re-runs it verbatim); d > 64 switches to the mapPartitions
    * Gramian kernel, whose per-row cost is the same d² multiply-adds but
    * WITHOUT materializing d² exploded rows per input row through the
    * aggregation — at d = 256 the explode form ships 65 536 rows per
    * vector into the partial aggregation while the kernel touches one
    * long array. Bounded driver collect either way: ≤ d² + d + 1
    * aggregated cells, d require-bounded at 1024 (≤ ~1 M cells). */
  private[graft] def topComponentVector(
      df: DataFrame, vecCol: String, iters: Int,
      forceGramian: Boolean = false): (Int, Array[Long]) = {
    val (d, u, _, _) = topWithMoments(df, vecCol, iters, forceGramian)
    (d, u)
  }

  /** Core plus the first moments the projection reuses:
    * (dim, loadings or null, n, Σv per dim). */
  private def topWithMoments(
      df: DataFrame, vecCol: String, iters: Int,
      forceGramian: Boolean = false)
      : (Int, Array[Long], BigInt, Array[BigInt]) = {
    require(iters >= 1 && iters <= 64, s"iters=$iters out of [1,64]")
    // null vectors drop here, BEFORE either kernel, so both paths share
    // one contract (posexplode used to drop them silently while the
    // Gramian loop NPE'd); n and Σv count non-null vectors only, and
    // projectTop's own isNotNull filter keeps the projection consistent
    val vecs = Parallelism.stage(
      microVecs(df.select(col(vecCol)), vecCol).select(col(s"${Dup}mv"))
        .filter(col(s"${Dup}mv").isNotNull))
    // same scan also pins the |element| ≤ 1e9-micro invariant for EVERY
    // d — the long-dot in projectTop and the Gramian blocks both lean on
    // it, and the d ≤ 64 posexplode path has no per-row require of its own
    val dRow = vecs.agg(min(size(col(s"${Dup}mv"))),
      max(size(col(s"${Dup}mv"))),
      max(array_max(transform(col(s"${Dup}mv"),
        e => abs(e))))).head()
    if (dRow.isNullAt(0)) return (0, null, BigInt(0), null)
    require(dRow.getInt(0) == dRow.getInt(1),
      s"ragged vectors: dims ${dRow.getInt(0)}..${dRow.getInt(1)}")
    val d = dRow.getInt(0)
    require(d >= 1 && d <= 1024, s"dim=$d out of [1,1024]")
    val maxEl = if (dRow.isNullAt(2)) 0L else dRow.getLong(2)
    require(maxEl <= 1000000000L,
      s"vector element $maxEl exceeds 1e9 micro units: re-scale upstream")
    val (c, n, s) =
      if (d <= 64 && !forceGramian) posexplodeCovariance(vecs, d)
      else gramianCovariance(vecs, d)
    val maxAbs = c.flatten.map(_.abs).max
    if (maxAbs == 0) return (d, null, n, s)
    // quantize cells to ≤1e6 micro units (eigenvectors are invariant
    // to positive scaling; floor quantization is replayed by the oracle)
    val q = c.map(_.map(x => floorDiv(x * 1000000, maxAbs)))
    var x = Array.fill(d)(BigInt(1000000))
    for (_ <- 0 until iters) {
      val y = Array.tabulate(d)(j =>
        (0 until d).map(k => q(j)(k) * x(k)).sum)
      // signed pivot: max |component|, ties → lowest index; pinning at
      // ±1e6 keeps the sign deterministic across engines
      val piv = (0 until d).maxBy(j => (y(j).abs, BigInt(-j)))
      if (y(piv) == 0) return (d, null, n, s)
      x = y.map(v => floorDiv(v * 1000000, y(piv)))
    }
    (d, x.map(_.toLong), n, s)
  }

  /** Declarative covariance build: posexplode² to d² cells, map-side
    * combined. Scaled covariance c(j)(k) = n·Σvⱼvₖ − Σvⱼ·Σvₖ. */
  private def posexplodeCovariance(vecs: DataFrame, d: Int)
      : (Array[Array[BigInt]], BigInt, Array[BigInt]) = {
    val e1 = vecs.select(col(s"${Dup}mv"),
      posexplode(col(s"${Dup}mv")).as(Seq(s"${Dup}j", s"${Dup}vj")))
    val cells = e1
      .select(col(s"${Dup}j"), col(s"${Dup}vj"),
        posexplode(col(s"${Dup}mv")).as(Seq(s"${Dup}k", s"${Dup}vk")))
      .groupBy(col(s"${Dup}j"), col(s"${Dup}k"))
      .agg(sum(col(s"${Dup}vj").cast("decimal(38,0)") *
          col(s"${Dup}vk").cast("decimal(38,0)")).as(s"${Dup}ss"),
        sum(col(s"${Dup}vj")).as(s"${Dup}sj"),
        sum(col(s"${Dup}vk")).as(s"${Dup}sk"),
        count(lit(1)).as(s"${Dup}n"))
      .collect() // ≤ d² ≤ 4 096 rows — d ≤ 64 on this path
    val c = Array.fill[BigInt](d, d)(BigInt(0))
    val s = Array.fill[BigInt](d)(BigInt(0))
    var n = BigInt(0)
    for (r <- cells) {
      n = BigInt(r.getLong(5))
      s(r.getInt(0)) = BigInt(r.getLong(3))
      c(r.getInt(0))(r.getInt(1)) =
        n * BigInt(r.getDecimal(2).toBigInteger) - // n·Σvⱼvₖ − Σvⱼ·Σvₖ
          BigInt(r.getLong(3)) * BigInt(r.getLong(4))
    }
    (c, n, s)
  }

  /** Gramian kernel for larger d: ONE tight per-partition loop
    * accumulates n, Σv, and the d×d Gramian Σvvᵀ in long arrays, then
    * emits d² + d + 1 labeled partials per PARTITION (exact totals as
    * decimal strings) for a final map-side-combined sum — the shuffle
    * carries ≤ parts·(d²+d+1) rows, never the corpus, and no exploded
    * row ever exists. Exactness: element magnitude is require-bounded at
    * 1e9 micro units (|v| ≤ 1000 in original units — far above any
    * normalized embedding), so one product fits a long with 4× headroom;
    * long blocks flush into BigInt before `blockRows · max²` can reach
    * Long.MaxValue/4, and Σv overflows long only past ~9e9 rows in ONE
    * partition (an impossible partition size — documented bound).
    * Every accumulation is exact integer addition, so the result is
    * bit-identical to the posexplode² build in any row/partition order
    * (PcaSpec proves equality). */
  private def gramianCovariance(vecs: DataFrame, d: Int)
      : (Array[Array[BigInt]], BigInt, Array[BigInt]) = {
    val spark = vecs.sparkSession
    import spark.implicits._
    // primitive-array decode: a boxed Seq costs an unboxing per element
    // inside the d-squared hot loop
    val totals = vecs.select(col(s"${Dup}mv")).as[Array[Long]]
      .mapPartitions { it =>
        val gBlock = Array.ofDim[Long](d, d)
        val gExact = Array.fill[BigInt](d, d)(BigInt(0))
        val s = new Array[Long](d)
        var n = 0L
        var blockRows = 0L
        var maxSq = 1L
        def flush(): Unit = {
          var j = 0
          while (j < d) {
            val row = gBlock(j)
            var k = 0
            while (k < d) {
              if (row(k) != 0L) { gExact(j)(k) += row(k); row(k) = 0L }
              k += 1
            }
            j += 1
          }
          blockRows = 0L
          maxSq = 1L
        }
        while (it.hasNext) {
          val v = it.next()
          require(v.length == d, s"ragged vector: ${v.length} != $d")
          var m = 1L
          var j = 0
          while (j < d) {
            val a = math.abs(v(j))
            if (a > m) m = a
            j += 1
          }
          require(m <= 1000000000L,
            s"vector element $m exceeds 1e9 micro units: re-scale upstream")
          val sq = m * m
          if (sq > maxSq) maxSq = sq
          if (blockRows + 1 > Long.MaxValue / 4 / maxSq) flush()
          j = 0
          while (j < d) {
            val vj = v(j)
            s(j) += vj
            val row = gBlock(j)
            var k = 0
            while (k < d) { row(k) += vj * v(k); k += 1 }
            j += 1
          }
          n += 1L
          blockRows += 1L
        }
        flush()
        if (n == 0L) Iterator.empty
        else
          (Iterator.single((0, n.toString)) ++
            Iterator.range(0, d).map(j => (1 + j, s(j).toString)) ++
            Iterator.range(0, d * d).map { i =>
              (1 + d + i, gExact(i / d)(i % d).toString)
            }).filter(_._2 != "0")
      }
      .toDF(s"${Dup}i", s"${Dup}v")
      .groupBy(col(s"${Dup}i"))
      .agg(sum(col(s"${Dup}v").cast("decimal(38,0)")).as(s"${Dup}t"))
      .collect() // ≤ d² + d + 1 ≤ ~1 M cells — d require-bounded at 1024
    val t = new Array[BigInt](1 + d + d * d)
    java.util.Arrays.fill(t.asInstanceOf[Array[AnyRef]], BigInt(0))
    for (r <- totals) t(r.getInt(0)) = BigInt(r.getDecimal(1).toBigInteger)
    val n = t(0)
    (Array.tabulate(d, d)((j, k) =>
      n * t(1 + d + j * d + k) - t(1 + j) * t(1 + k)),
      n, Array.tabulate(d)(j => t(1 + j)))
  }

  /** Floor division (DuckDB `//` semantics) — BigInt `/` truncates
    * toward zero, which disagrees on negative operands. */
  private def floorDiv(a: BigInt, b: BigInt): BigInt = {
    val qq = a / b
    if ((a % b) != 0 && ((a < 0) != (b < 0))) qq - 1 else qq
  }
}

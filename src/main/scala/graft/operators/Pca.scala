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
  * `require(d ≤ 2048)` (≤ ~4.2 M cells arriving as ONE compact
  * long-pair array, the RankCuts bounded-collect discipline). Two
  * kernels feed it: d ≤ 64 uses the declarative
  * posexplode² build (d² codegen'd multiply-adds, map-side combined,
  * SQL-replayable — the q183 oracle re-runs it); d > 64 uses the
  * mapPartitions Gramian kernel (same d² multiply-adds per row in one
  * long-array loop, per-partition partials tree-reduced as 128-bit
  * long pairs — no exploded rows, no labeled-cell shuffle)
  * — exact-integer equal by construction, PcaSpec-proven.
  * Power iteration is NOT distributed work at d ≤ 2048; distributing
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
    * Row contract: rows whose vector is NULL are DROPPED — in both the
    * normal branch (a null vector has no projection) and the degenerate
    * zero-covariance branch (which emits the same row set with null
    * pc1), so the output row set does not depend on which branch ran.
    * PcaSpec pins this. Callers wanting null-vector rows preserved
    * left-join pc1 back on idCol.
    *
    * Scale shape (r10): the centered dot Σⱼ(n·vⱼ − Sⱼ)uⱼ telescopes to
    * n·(v·u) − S·u, where n and the sum vector S already fall out of
    * the covariance kernel and S·u is ONE driver constant — so the
    * projection pass is a bare scan with one native long dot
    * ([[graft.functions.Expressions.vec_dot_long]]) per row: no
    * per-dimension explode, no broadcast join, no groupBy shuffle
    * (previously d exploded rows per vector re-aggregated by id). The
    * per-row dot stays inside a long (|v| ≤ 1e9 micro enforced
    * per-element INSIDE the native dot for EVERY d — not just the
    * d > 64 kernel's per-row require —
    * |u| ≤ 1e6, d ≤ 2048 ⇒ ≤ ~2.1e18); the n·dot − S·u
    * lift runs in decimal, the one IEEE division per row is unchanged
    * term-for-term, so values are bit-identical to the explode form. */
  def projectTop(df: DataFrame, idCol: String, vecCol: String,
                 iters: Int = 8): DataFrame = {
    val (_, u, n, s) = topWithMoments(df, vecCol, iters)
    // null rows drop on the RAW column (microVec is null-preserving, so
    // this admits the same rows as filtering mv — without making the
    // interpreted transform() lambda evaluate twice per row)
    val vecs = microVecs(df.select(col(idCol), col(vecCol))
      .filter(col(vecCol).isNotNull), vecCol)
    if (u == null)
      return vecs.select(col(idCol), lit(null).cast("double").as("pc1"))
    val dotS = s.zip(u).map { case (sj, uj) => sj * BigInt(uj) }.sum
    val nDec = lit(new java.math.BigDecimal(n.bigInteger))
      .cast("decimal(38,0)")
    // the |element| ≤ 1e9-micro invariant the long dot depends on is
    // enforced INSIDE the dot's native loop (one compare per element,
    // codegen'd) — a separate declarative max-abs scan was a measured
    // 1.6× on the 100× probe (higher-order array lambdas run
    // interpreted), and the d > 64 kernel's per-row require already
    // covers the covariance side
    val dot1 = graft.functions.Expressions
      .vec_dot_long_bounded(col(s"${Dup}mv"), lit(u), 1000000000L)
    vecs
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
    * aggregated cells, d require-bounded at 2048 (≤ ~4.2 M cells as one
    * compact long-pair array via treeReduce). */
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
    // filter on the RAW column, not the derived micro vector: a
    // predicate on mv makes Catalyst evaluate the array-building
    // microVec expression twice per row (once in the Filter, once in
    // the Project) — a measured ~1.5× on the 100× probe. microVec is
    // null-preserving, so the two filters admit identical rows.
    val vecs = Parallelism.stage(
      microVecs(df.select(col(vecCol)).filter(col(vecCol).isNotNull),
        vecCol).select(col(s"${Dup}mv")))
    val dRow = vecs.agg(min(size(col(s"${Dup}mv"))),
      max(size(col(s"${Dup}mv")))).head()
    if (dRow.isNullAt(0)) return (0, null, BigInt(0), null)
    require(dRow.getInt(0) == dRow.getInt(1),
      s"ragged vectors: dims ${dRow.getInt(0)}..${dRow.getInt(1)}")
    val d = dRow.getInt(0)
    require(d >= 1 && d <= 2048, s"dim=$d out of [1,2048]")
    val (c, n, s) =
      if (d <= 64 && !forceGramian) posexplodeCovariance(vecs, d)
      else gramianCovariance(vecs, d)
    val maxAbs = c.flatten.map(_.abs).max
    if (maxAbs == 0) return (d, null, n, s)
    // quantize cells to ≤1e6 micro units (eigenvectors are invariant
    // to positive scaling; floor quantization is replayed by the oracle)
    // — after which the matvec fits PLAIN LONGS with exactness to spare
    // (|q| ≤ 1e6, |x| ≤ 1e6, d ≤ 2048 ⇒ |y| ≤ ~2.1e15 « 2^63): the
    // same iteration in BigInt was ~34 M object multiplies at d = 2048
    // (~20 s of driver time per call, r11 measured); only the
    // normalization's y·1e6 (≤ ~2.1e21) needs BigInt, d ops per round.
    // Values are bit-identical — long arithmetic is exact in range.
    val q = Array.tabulate(d, d)((j, k) =>
      floorDiv(c(j)(k) * 1000000, maxAbs).toLong)
    var x = Array.fill(d)(1000000L)
    for (_ <- 0 until iters) {
      val y = new Array[Long](d)
      var j = 0
      while (j < d) {
        val row = q(j)
        var acc = 0L
        var k = 0
        while (k < d) { acc += row(k) * x(k); k += 1 }
        y(j) = acc
        j += 1
      }
      // signed pivot: max |component|, ties → lowest index; pinning at
      // ±1e6 keeps the sign deterministic across engines
      var piv = 0
      j = 1
      while (j < d) { if (math.abs(y(j)) > math.abs(y(piv))) piv = j; j += 1 }
      if (y(piv) == 0L) return (d, null, n, s)
      val denom = BigInt(y(piv))
      x = y.map(v => floorDiv(BigInt(v) * 1000000, denom).toLong)
    }
    (d, x, n, s)
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

  /** 128-bit signed add of long `v` into cell `i` of an interleaved
    * (hi, lo-unsigned) accumulator — exact two's-complement arithmetic:
    * sign-extend v into the high word, carry out of the unsigned low
    * add via the classic bit formula. */
  @inline private def add128(acc: Array[Long], i: Int, v: Long): Unit = {
    val lo = acc(2 * i + 1)
    val nl = lo + v
    val carry = ((lo & v) | ((lo | v) & ~nl)) >>> 63
    acc(2 * i) += (v >> 63) + carry
    acc(2 * i + 1) = nl
  }

  /** 128-bit add of cell `i` of `b` into cell `i` of `a`. */
  @inline private def merge128(a: Array[Long], b: Array[Long], i: Int): Unit = {
    val lo = a(2 * i + 1)
    val v = b(2 * i + 1)
    val nl = lo + v
    val carry = ((lo & v) | ((lo | v) & ~nl)) >>> 63
    a(2 * i) += b(2 * i) + carry
    a(2 * i + 1) = nl
  }

  private def toBigInt(acc: Array[Long], i: Int): BigInt =
    (BigInt(acc(2 * i)) << 64) +
      BigInt(java.lang.Long.toUnsignedString(acc(2 * i + 1)))

  /** Gramian kernel for larger d: ONE tight per-partition loop
    * accumulates n, Σv, and the d×d Gramian Σvvᵀ in long blocks that
    * flush into a 128-bit (hi, lo) long-pair accumulator, and the
    * per-partition partials tree-reduce (r11 — replacing the labeled-
    * rows shuffle, whose parts·(d²+d+1) row machinery was the d > 1024
    * scale ceiling) into ONE compact array on the driver: 2·(d²+d+1)
    * longs ≈ 67 MB at d = 2048, no Row objects, no shuffle of exploded
    * cells, tree depth 2 so no single reducer sees every partial.
    * Exactness: element magnitude is require-bounded at 1e9 micro units
    * (|v| ≤ 1000 in original units — far above any normalized
    * embedding), so one product fits a long with 4× headroom; long
    * blocks flush before `blockRows · max²` can reach Long.MaxValue/4;
    * the 128-bit cells absorb ~1.7e20 rows per partition before THEY
    * could wrap (unreachable — documented bound). Every accumulation is
    * exact integer addition, so the result is bit-identical to the
    * posexplode² build in any row/partition order (PcaSpec proves
    * equality, and proves the 128-bit carry path on sign-mixed data). */
  private def gramianCovariance(vecs: DataFrame, d: Int)
      : (Array[Array[BigInt]], BigInt, Array[BigInt]) = {
    val spark = vecs.sparkSession
    import spark.implicits._
    val cells = 1 + d + d * d // [n, s(0..d-1), g(row-major)]
    // primitive-array decode: a boxed Seq costs an unboxing per element
    // inside the d-squared hot loop
    val partials = vecs.select(col(s"${Dup}mv")).as[Array[Long]]
      .mapPartitions { it =>
        val gBlock = Array.ofDim[Long](d, d)
        val acc = new Array[Long](2 * cells)
        // Σv stays a plain long per dim for the whole partition — it
        // overflows only past ~9.2e9 rows in ONE partition (impossible;
        // the pre-r11 kernel documented the same bound) — and lands in
        // the 128-bit cells once at partition end
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
              if (row(k) != 0L) {
                add128(acc, 1 + d + j * d + k, row(k)); row(k) = 0L
              }
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
        else {
          add128(acc, 0, n)
          var j = 0
          while (j < d) { add128(acc, 1 + j, s(j)); j += 1 }
          Iterator.single(acc)
        }
      }
      .rdd
    val combined = partials.treeReduce({ (a, b) =>
      var i = 0
      while (i < cells) { merge128(a, b, i); i += 1 }
      a
    }, depth = 2)
    val n = toBigInt(combined, 0)
    (Array.tabulate(d, d)((j, k) =>
      n * toBigInt(combined, 1 + d + j * d + k) -
        toBigInt(combined, 1 + j) * toBigInt(combined, 1 + k)),
      n, Array.tabulate(d)(j => toBigInt(combined, 1 + j)))
  }

  /** Floor division (DuckDB `//` semantics) — BigInt `/` truncates
    * toward zero, which disagrees on negative operands. */
  private def floorDiv(a: BigInt, b: BigInt): BigInt = {
    val qq = a / b
    if ((a % b) != 0 && ((a < 0) != (b < 0))) qq - 1 else qq
  }
}

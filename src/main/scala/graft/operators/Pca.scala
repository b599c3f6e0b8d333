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
  * `require(d ≤ 4096)` (the RankCuts bounded-collect discipline;
  * 4096 is where the projection's per-row long dot d·1e9·1e6 would
  * next lose its 2× headroom under Long.MaxValue). Two kernels feed
  * it: d ≤ 64 uses the declarative
  * posexplode² build (d² codegen'd multiply-adds, map-side combined,
  * SQL-replayable — the q183/q201 oracles re-run it); d > 64 uses the
  * mapPartitions Gramian kernel (same d² multiply-adds per row in one
  * long-array loop, per-partition partials reduced as 128-bit
  * long pairs — no exploded rows, no labeled-cell shuffle): up to
  * d = 2048 the partials tree-reduce as ONE array (≤ 67 MB); past it
  * they ride as ≤ 2048²-cell column blocks reduced independently per
  * block key (r12 — one reducer never receives more than one block's
  * worth of partials, so partial size stays flat as d grows)
  * — exact-integer equal by construction, PcaSpec-proven.
  * Power iteration is NOT distributed work at d ≤ 4096; distributing
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
    * Row contract: rows whose vector is NULL or DIRTY (any null or
    * non-finite cell — micro_vec nulls those vectors whole, r12) are
    * DROPPED — in both the normal branch (no projection exists) and the
    * degenerate zero-covariance branch (which emits the same row set
    * with null pc1), so the output row set does not depend on which
    * branch ran. PcaSpec pins this. Callers wanting such rows preserved
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
    * |u| ≤ 1e6, d ≤ 4096 ⇒ ≤ ~4.1e18); the n·dot − S·u
    * lift runs in decimal, the one IEEE division per row is unchanged
    * term-for-term, so values are bit-identical to the explode form. */
  def projectTop(df: DataFrame, idCol: String, vecCol: String,
                 iters: Int = 8): DataFrame = {
    val (_, u, n, s) = topWithMoments(df, vecCol, iters)
    // null rows pre-drop on the RAW column (cheap), then DIRTY vectors
    // (any null or non-finite cell — micro_vec nulls those WHOLE, r12)
    // drop on the quantized column behind a barrier, so the kernel
    // evaluates once and the row set matches the covariance side exactly
    val vecs = Parallelism.barrier(
        microVecs(df.select(col(idCol), col(vecCol))
          .filter(col(vecCol).isNotNull), vecCol))
      .filter(col(s"${Dup}mv").isNotNull)
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
    * aggregated cells, d require-bounded at 4096 (as compact long-pair
    * arrays via treeReduce, block-keyed past d = 2048). */
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
      // dirty vectors (any null/non-finite cell) arrive as null micro
      // vectors (r12 micro_vec contract) and drop HERE — after the
      // staged materialization, before either kernel — so both kernels
      // and the projection see one row set
      .filter(col(s"${Dup}mv").isNotNull)
    val dRow = vecs.agg(min(size(col(s"${Dup}mv"))),
      max(size(col(s"${Dup}mv")))).head()
    if (dRow.isNullAt(0)) return (0, null, BigInt(0), null)
    require(dRow.getInt(0) == dRow.getInt(1),
      s"ragged vectors: dims ${dRow.getInt(0)}..${dRow.getInt(1)}")
    val d = dRow.getInt(0)
    require(d >= 1 && d <= 4096, s"dim=$d out of [1,4096]")
    // cellAt streams covariance cells instead of materializing a d×d
    // BigInt matrix: at d = 3072 a resident matrix would be ~9.4 M
    // BigInt objects; each cell is cheap to recompute (one 128-bit
    // decode + two small multiplies), paid twice (max-abs scan, then
    // quantization) against zero residency
    val (cellAt, n, s): ((Int, Int) => BigInt, BigInt, Array[BigInt]) =
      if (d <= 64 && !forceGramian) {
        val (c, n0, s0) = posexplodeCovariance(vecs, d)
        ((j: Int, k: Int) => c(j)(k), n0, s0)
      } else {
        val (combined, n0, s0) = gramianCovariance(vecs, d)
        ((j: Int, k: Int) =>
          n0 * toBigInt(combined, 1 + d + j * d + k) - s0(j) * s0(k),
          n0, s0)
      }
    // the covariance is symmetric by construction (both kernels mirror
    // their products), so every driver-side d² pass needs only the
    // upper triangle — the 128-bit decode + two BigInt multiplies per
    // cellAt were otherwise paid twice (9.4 M extra decodes at d = 3072)
    var maxAbs = BigInt(0)
    var jj = 0
    while (jj < d) {
      var kk = jj
      while (kk < d) {
        val a = cellAt(jj, kk).abs
        if (a > maxAbs) maxAbs = a
        kk += 1
      }
      jj += 1
    }
    if (maxAbs == 0) return (d, null, n, s)
    // quantize cells to ≤1e6 micro units (eigenvectors are invariant
    // to positive scaling; floor quantization is replayed by the oracle)
    // — after which the matvec fits PLAIN LONGS with exactness to spare
    // (|q| ≤ 1e6, |x| ≤ 1e6, d ≤ 4096 ⇒ |y| ≤ ~4.1e15 « 2^63): the
    // same iteration in BigInt was ~34 M object multiplies at d = 2048
    // (~20 s of driver time per call, r11 measured); only the
    // normalization's y·1e6 (≤ ~4.1e21) needs BigInt, d ops per round.
    // Values are bit-identical — long arithmetic is exact in range.
    //
    // The floor division itself runs on a GUARDED double fast path
    // (r12): x̃ = c·1e6/maxAbs in doubles carries ≤ ~4.4e-16 relative
    // error (4 roundings), i.e. ≤ ~4.4e-10 absolute at |x| ≤ 1e6 — so
    // when x̃ sits ≥ 1e-6 from both neighboring integers, floor(x̃) IS
    // the exact floor; only boundary-adjacent cells (exact multiples
    // included: the guard catches both sides of the interval) fall back
    // to the exact BigInt division. Per-cell BigInt divide/mod was 27 s
    // of driver time at d = 3072 (9.4 M cells, measured); the fast path
    // is two double ops and a compare. Values identical by the bound.
    val maxAbsD = maxAbs.toDouble
    val q = Array.ofDim[Long](d, d)
    jj = 0
    while (jj < d) {
      var kk = jj
      while (kk < d) {
        val v = quantCell(cellAt(jj, kk), maxAbs, maxAbsD)
        q(jj)(kk) = v
        q(kk)(jj) = v
        kk += 1
      }
      jj += 1
    }
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

  /** Decode 128-bit cell i to BigInt with shift/mask arithmetic only —
    * the obvious `BigInt(Long.toUnsignedString(lo))` allocates and
    * parses a decimal string PER CELL, which at d = 3072 (9.4 M cells
    * × two driver passes) was ~half the probe's wall time (r12). */
  private[operators] def toBigInt(acc: Array[Long], i: Int): BigInt = {
    val lo = acc(2 * i + 1)
    (BigInt(acc(2 * i)) << 64) +
      (BigInt(lo >>> 32) << 32) + BigInt(lo & 0xFFFFFFFFL)
  }

  /** Cells per reduce block: one block is at most a d = 2048 partial
    * (~67 MB of long pairs) — past that, partials split into
    * column-range blocks reduced independently so no reducer's inbox
    * grows with d (at d = 4096 a monolithic tree-reduce would hand each
    * depth-2 reducer √parts × 268 MB). */
  private val BlockCells = 2048 * 2048

  /** Gramian kernel for larger d: ONE tight per-partition loop
    * accumulates n, Σv, and the d×d Gramian Σvvᵀ in long blocks that
    * flush into a 128-bit (hi, lo) long-pair accumulator, and the
    * per-partition partials reduce (r11 — replacing the labeled-
    * rows shuffle, whose parts·(d²+d+1) row machinery was the d > 1024
    * scale ceiling) into ONE compact array on the driver: 2·(d²+d+1)
    * longs ≈ 67 MB at d = 2048, no Row objects, no shuffle of exploded
    * cells. Up to [[BlockCells]] the reduce is a depth-2 treeReduce (no
    * single reducer sees every partial); past it (d > 2048) each
    * partial is sliced into ≤ [[BlockCells]]-cell blocks and
    * reduceByKey merges each block INDEPENDENTLY (r12) — per-reducer
    * traffic stays ≤ one block × parts, flat in d, and the driver
    * reassembles the ≤ 5 collected blocks. Returns the raw interleaved
    * (hi, lo) accumulator — the caller decodes cells lazily — plus n
    * and Σv.
    * Exactness: element magnitude is require-bounded at 1e9 micro units
    * (|v| ≤ 1000 in original units — far above any normalized
    * embedding), so one product fits a long with 4× headroom; long
    * blocks flush before `blockRows · max²` can reach Long.MaxValue/4;
    * the 128-bit cells absorb ~1.7e20 rows per partition before THEY
    * could wrap (unreachable — documented bound). Every accumulation is
    * exact integer addition, so the result is bit-identical to the
    * posexplode² build in any row/partition/reduce order (PcaSpec
    * proves equality, and proves the 128-bit carry path on sign-mixed
    * data). */
  private[operators] def gramianCovariance(vecs: DataFrame, d: Int)
      : (Array[Long], BigInt, Array[BigInt]) = {
    val spark = vecs.sparkSession
    import spark.implicits._
    val cells = 1 + d + d * d // [n, s(0..d-1), g(row-major)]
    // primitive-array decode: a boxed Seq costs an unboxing per element
    // inside the d-squared hot loop
    val partials = vecs.select(col(s"${Dup}mv")).as[Array[Long]]
      .mapPartitions { it =>
        // r12 kernel shape — the naive row-at-a-time build streamed the
        // ENTIRE d² long block through RAM per input row (at d = 3072:
        // 150 MB × rows of read+write traffic — measured memory-bound at
        // ~35 s for 20k rows on 32 cores). Two exact-arithmetic-neutral
        // restructurings:
        //   • row tiling: buffer up to B rows column-major and add their
        //     combined outer-product sum into gBlock in ONE pass — block
        //     traffic drops B-fold; the B-element inner loop runs in L1;
        //   • symmetry: Σvvᵀ is symmetric, so only the upper triangle
        //     accumulates (half the multiplies, half the block traffic)
        //     and flush mirrors each cell into (k, j) — bit-identical
        //     because the mirrored value IS the (k, j) sum.
        // Long addition is associative/commutative, so regrouping per
        // tile changes nothing; overflow guards are per-tile now (see
        // drain) with the same cell ≤ blockRows·maxSq ≤ Long.Max/4
        // invariant as before.
        val B = 32
        val gBlock = Array.ofDim[Long](d, d) // upper triangle (k ≥ j)
        val acc = new Array[Long](2 * cells)
        // Σv stays a plain long per dim for the whole partition — it
        // overflows only past ~9.2e9 rows in ONE partition (impossible;
        // the pre-r11 kernel documented the same bound) — and lands in
        // the 128-bit cells once at partition end
        val s = new Array[Long](d)
        val bufT = new Array[Long](d * B) // column-major: (j, b) → j·B + b
        var n = 0L
        var cnt = 0        // rows currently buffered
        var batchMaxSq = 1L
        var blockRows = 0L // rows accumulated in gBlock since last flush
        var maxSq = 1L     // max element² among those rows
        def flush(): Unit = {
          var j = 0
          while (j < d) {
            val row = gBlock(j)
            var k = j
            while (k < d) {
              val v = row(k)
              if (v != 0L) {
                add128(acc, 1 + d + j * d + k, v)
                if (k != j) add128(acc, 1 + d + k * d + j, v)
                row(k) = 0L
              }
              k += 1
            }
            j += 1
          }
          blockRows = 0L
          maxSq = 1L
        }
        // add buffered rows [from, until) into the upper triangle: for
        // each (j, k ≥ j) one L1-resident loop over the tile's rows
        def tile(from: Int, until: Int): Unit = {
          var j = 0
          while (j < d) {
            val jb = j * B
            val row = gBlock(j)
            var k = j
            while (k < d) {
              val kb = k * B
              var a = 0L
              var b = from
              while (b < until) { a += bufT(jb + b) * bufT(kb + b); b += 1 }
              row(k) += a
              k += 1
            }
            j += 1
          }
        }
        def drain(): Unit = if (cnt > 0) {
          if (batchMaxSq > maxSq) maxSq = batchMaxSq
          var start = 0
          while (start < cnt) {
            var cap = Long.MaxValue / 4 / maxSq - blockRows
            if (cap <= 0L) {
              flush() // resets maxSq; pending rows still carry batchMaxSq
              maxSq = batchMaxSq
              cap = Long.MaxValue / 4 / maxSq
            }
            // cap ≥ 2 after a flush (maxSq ≤ 1e18 ⇒ Long.Max/4/maxSq ≥ 2)
            val take = math.min((cnt - start).toLong, cap).toInt
            tile(start, start + take)
            blockRows += take
            start += take
          }
          cnt = 0
          batchMaxSq = 1L
        }
        while (it.hasNext) {
          val v = it.next()
          require(v.length == d, s"ragged vector: ${v.length} != $d")
          var m = 1L
          var j = 0
          while (j < d) {
            val vj = v(j)
            val a = math.abs(vj)
            if (a > m) m = a
            s(j) += vj
            bufT(j * B + cnt) = vj
            j += 1
          }
          require(m <= 1000000000L,
            s"vector element $m exceeds 1e9 micro units: re-scale upstream")
          val sq = m * m
          if (sq > batchMaxSq) batchMaxSq = sq
          n += 1L
          cnt += 1
          if (cnt == B) drain()
        }
        drain()
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
    val combined: Array[Long] =
      // dispatch on d, not on cells vs BlockCells: at d = 2048 the
      // partial is d²+d+1 cells — marginally OVER BlockCells, but the
      // documented (and r11-benchmarked) single-array treeReduce path
      // is exactly right for it; blocks exist for d > 2048
      if (d <= 2048)
        partials.treeReduce({ (a, b) =>
          var i = 0
          while (i < cells) { merge128(a, b, i); i += 1 }
          a
        }, depth = 2)
      else {
        // block-keyed reduce: slice every partial into ≤ BlockCells-cell
        // column ranges; each block id reduces on its own reducer, so no
        // task ever holds more than (parts of) one block. 128-bit cell
        // addition is associative and commutative, so the reduce order
        // per block is free.
        val nb = (cells + BlockCells - 1) / BlockCells
        val merged = partials
          .flatMap { acc =>
            (0 until nb).iterator.map { b =>
              val lo = b * BlockCells
              val hi = math.min(cells, lo + BlockCells)
              (b, java.util.Arrays.copyOfRange(acc, 2 * lo, 2 * hi))
            }
          }
          .reduceByKey({ (x, y) =>
            var i = 0
            val m = x.length / 2
            while (i < m) { merge128(x, y, i); i += 1 }
            x
          }, numPartitions = nb)
          .collect()
        val full = new Array[Long](2 * cells)
        for ((b, arr) <- merged)
          System.arraycopy(arr, 0, full, 2 * b * BlockCells, arr.length)
        full
      }
    val n = toBigInt(combined, 0)
    (combined, n, Array.tabulate(d)(j => toBigInt(combined, 1 + j)))
  }

  /** Floor division (DuckDB `//` semantics) — BigInt `/` truncates
    * toward zero, which disagrees on negative operands. One `/%`
    * instead of separate `/` and `%` (each is a full Knuth division). */
  private def floorDiv(a: BigInt, b: BigInt): BigInt = {
    val (qq, rr) = a /% b
    if (rr != 0 && ((a < 0) != (b < 0))) qq - 1 else qq
  }

  /** floor(c·1e6 / maxAbs) through the guarded double fast path (see
    * the quantization comment in [[topWithMoments]]): doubles when the
    * quotient sits ≥ 1e-6 from both neighboring integers, exact BigInt
    * floor division only in the boundary zone. Shared with the phase
    * probe so its timings measure the SHIPPED per-cell rule
    * (`maxAbsD` is `maxAbs.toDouble`, hoisted by the caller). */
  private[operators] def quantCell(c: BigInt, maxAbs: BigInt,
                                   maxAbsD: Double): Long =
    if (c.signum == 0) 0L
    else {
      val x = c.toDouble * 1000000.0 / maxAbsD
      val f = math.floor(x)
      if (x - f > 1e-6 && f + 1.0 - x > 1e-6) f.toLong
      else floorDiv(c * 1000000, maxAbs).toLong
    }
}

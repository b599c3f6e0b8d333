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
  * cross-product sums (posexplode² per row is d² codegen'd
  * multiply-adds, map-side combined — the shuffle carries ≤ d²·parts
  * rows, never the corpus); everything after runs on the d²-cell
  * scaled covariance `n·Σvⱼvₖ − Σvⱼ·Σvₖ` — a driver table bounded by
  * `require(d ≤ 256)` (≤65 536 cells, the RankCuts bounded-collect
  * discipline). Power iteration is NOT distributed work at d ≤ 256;
  * distributing 64×64 matrix-vector products would be pure shuffle
  * theater.
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
    * Null when degenerate. */
  def projectTop(df: DataFrame, idCol: String, vecCol: String,
                 iters: Int = 8): DataFrame = {
    val spark = df.sparkSession
    val (d, u) = topComponentVector(df, vecCol, iters)
    val vecs = microVecs(df.select(col(idCol), col(vecCol)), vecCol)
    if (u == null)
      return vecs.select(col(idCol), lit(null).cast("double").as("pc1"))
    // centered dot scaled by n: Σⱼ (n·vⱼ − Sⱼ)·uⱼ — exact in decimal;
    // μ and u fold in as two broadcast d-row frames
    val sums = Parallelism.stage(vecs
      .select(posexplode(col(s"${Dup}mv")).as(Seq(s"${Dup}j", s"${Dup}vj")))
      .groupBy(col(s"${Dup}j"))
      .agg(sum(col(s"${Dup}vj")).as(s"${Dup}s"), count(lit(1)).as(s"${Dup}n")))
    import spark.implicits._
    val uDf = u.zipWithIndex.map { case (l, j) => (j, l) }
      .toSeq.toDF(s"${Dup}j", s"${Dup}u")
    vecs
      .select(col(idCol),
        posexplode(col(s"${Dup}mv")).as(Seq(s"${Dup}j", s"${Dup}vj")))
      .join(broadcast(sums), Seq(s"${Dup}j"))
      .join(broadcast(uDf), Seq(s"${Dup}j"))
      .groupBy(col(idCol))
      .agg(sum((col(s"${Dup}n").cast("decimal(38,0)") *
          col(s"${Dup}vj").cast("decimal(38,0)") -
          col(s"${Dup}s").cast("decimal(38,0)")) *
        col(s"${Dup}u").cast("decimal(38,0)")).as(s"${Dup}dot"),
        max(col(s"${Dup}n")).as(s"${Dup}n"))
      .select(col(idCol),
        round(col(s"${Dup}dot").cast("double") /
          (col(s"${Dup}n").cast("double") * lit(1e12)), 6).as("pc1"))
  }

  private def microVecs(df: DataFrame, vecCol: String): DataFrame =
    Parallelism.ensure(df).withColumn(s"${Dup}mv", KMeans.microVec(col(vecCol)))

  /** Core: (dim, loadings or null). Bounded driver collect: d ≤ 256 ⇒
    * ≤65 536 covariance cells. */
  private[operators] def topComponentVector(
      df: DataFrame, vecCol: String, iters: Int): (Int, Array[Long]) = {
    require(iters >= 1 && iters <= 64, s"iters=$iters out of [1,64]")
    val vecs = Parallelism.stage(
      microVecs(df.select(col(vecCol)), vecCol).select(col(s"${Dup}mv")))
    val dRow = vecs.agg(min(size(col(s"${Dup}mv"))),
      max(size(col(s"${Dup}mv")))).head()
    if (dRow.isNullAt(0)) return (0, null)
    require(dRow.getInt(0) == dRow.getInt(1),
      s"ragged vectors: dims ${dRow.getInt(0)}..${dRow.getInt(1)}")
    val d = dRow.getInt(0)
    require(d >= 1 && d <= 256, s"dim=$d out of [1,256]")
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
      .collect() // ≤ d² ≤ 65 536 rows — bounded by the require above
    val c = Array.ofDim[BigInt](d, d)
    for (r <- cells) {
      val n = BigInt(r.getLong(5))
      c(r.getInt(0))(r.getInt(1)) =
        n * BigInt(r.getDecimal(2).toBigInteger) - // n·Σvⱼvₖ − Σvⱼ·Σvₖ
          BigInt(r.getLong(3)) * BigInt(r.getLong(4))
    }
    val maxAbs = c.flatten.map(_.abs).max
    if (maxAbs == 0) return (d, null)
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
      if (y(piv) == 0) return (d, null)
      x = y.map(v => floorDiv(v * 1000000, y(piv)))
    }
    (d, x.map(_.toLong))
  }

  /** Floor division (DuckDB `//` semantics) — BigInt `/` truncates
    * toward zero, which disagrees on negative operands. */
  private def floorDiv(a: BigInt, b: BigInt): BigInt = {
    val qq = a / b
    if ((a % b) != 0 && ((a < 0) != (b < 0))) qq - 1 else qq
  }
}

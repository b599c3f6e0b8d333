package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed Lloyd's k-means over embedding columns, in EXACT integer
  * arithmetic: vectors quantize once to 1e-6 "micro" longs, distances
  * are integer sums of squares, and centroid updates round back to the
  * micro grid with a fixed floor rule — so the entire training loop is
  * deterministic under any partitioning AND replayable in DuckDB (the
  * q129 oracle re-runs both Lloyd iterations from scratch in SQL). The
  * usual float k-means can never be hash-verified cross-engine: its
  * per-cluster mean is an order-dependent float sum.
  *
  * Scale shape per iteration:
  *  - assignment is a pure map against the k×d BROADCAST centroid
  *    literal (no join, no shuffle of vectors);
  *  - the update aggregates d per-dimension sums by cluster — k groups,
  *    map-side combined, so the shuffle carries k×(d+1) longs per
  *    partition regardless of corpus size;
  *  - one k-row collect recomputes the means on the driver (bounded:
  *    k×d longs).
  * Total: `iters` linear passes, vectors never cross an exchange. The
  * trained centroids slot into [[Similarity]]'s IVF/SemDeDup paths,
  * which today take deterministically-sampled vectors as centroids —
  * training tightens the lists without changing the serving plan.
  *
  * Determinism rules shared with the oracle:
  *  - init: centroid j = micro-mean of vectors with `id % k == j`;
  *  - mean per dimension = `floor((2·sum + n) / (2·n))` (round-half-up
  *    of sum/n) computed in PURE INTEGER arithmetic on the driver
  *    (BigInt floor division — never a float rounding, so exactness
  *    holds even when |2·sum + n| exceeds 2^53, plausible for micro
  *    sums over billions of rows per cluster); the oracle mirrors the
  *    same integer floor division in HUGEINT;
  *  - assignment tie-break: lowest cluster id;
  *  - empty cluster: keeps its previous centroid.
  */
object KMeans {

  /** Trained model: micro-grid centroids (k × d) and the iteration's
    * final assignment (idCol, cluster, dist — exact squared micro
    * distance to the centroid that claimed the vector). */
  final case class Model(centroids: Array[Array[Long]],
                         assignments: DataFrame)

  /** 1e-6 quantization of a float/double vector column — native
    * one-pass kernel (r12); the retired declarative form (an
    * interpreted transform lambda + a Double.toString-backed BigDecimal
    * Round per cell — the dominant fixed scan cost of every micro-exact
    * vector operator) stays below for the spec-level parity proof. */
  def microVec(vecCol: Column): Column =
    graft.functions.Expressions.micro_vec(vecCol)

  /** Declarative twin of [[microVec]] — values identical on clean
    * (non-null, finite) vectors (OperatorsSpec compares the forms,
    * boundary cases included); production keeps the kernel, which
    * additionally nulls a DIRTY vector whole (any null/non-finite cell)
    * instead of throwing under ANSI or emitting a poisoned cell. */
  private[graft] def microVecDeclarative(vecCol: Column): Column =
    transform(vecCol, x => round(x.cast("double") * 1e6, 0).cast("long"))

  /** Exact squared distance between a micro vector column and a pinned
    * micro centroid. */
  private def sqDist(v: Column, cent: Array[Long]): Column =
    // native one-pass kernel — same exact-integer arithmetic and fold
    // order as the aggregate(zip_with) form it replaces (spec-compared)
    graft.functions.Expressions.vec_sq_dist_long(v, lit(cent))

  /** (cluster, dist) struct of the argmin centroid, ties to lowest id —
    * array_min over (dist, id) structs is exactly that order. */
  private def best(v: Column, cents: Array[Array[Long]]): Column =
    array_min(array(cents.zipWithIndex.map { case (c, j) =>
      struct(sqDist(v, c).as("d"), lit(j.toLong).as("c"))
    }: _*))

  /** Label `df` with the nearest of `centroids`: adds `cluster` and
    * `dist` columns (exact integer micro² distance). `vecCol` is the
    * RAW float vector column; quantization happens here. Rows whose
    * vector is null or DIRTY (any null/non-finite cell — micro_vec
    * nulls those whole) DROP, the [[Pca.projectTop]] row contract:
    * without the drop a null micro distance silently argmins every
    * dirty row into cluster 0. The barrier keeps the kernel evaluated
    * once (a predicate on the derived column would otherwise collapse
    * into the projection and re-run it per row). */
  def assign(df: DataFrame, vecCol: String,
             centroids: Array[Array[Long]]): DataFrame = {
    val mv = "__graft_amv"
    val clean = graft.ops.Parallelism.barrier(
        df.filter(col(vecCol).isNotNull)
          .withColumn(mv, microVec(col(vecCol))))
      .filter(col(mv).isNotNull)
    assignOn(clean, col(mv), centroids).drop(mv)
  }

  /** [[assign]] against an already-quantized micro vector expression —
    * the training loop quantizes ONCE into a staged column and reuses
    * it across every iteration's assignment and update. */
  private def assignOn(df: DataFrame, micro: Column,
                       centroids: Array[Array[Long]]): DataFrame = {
    require(centroids.nonEmpty, "no centroids")
    val b = best(micro, centroids)
    df.withColumn("cluster", b.getField("c"))
      .withColumn("dist", b.getField("d"))
  }

  /** The driver-side mean rule (see scaladoc): floor((2·sum + n) / (2·n))
    * in exact integer arithmetic — BigInt `/` truncates toward zero, so
    * negative non-exact quotients step down one to the floor. */
  private[graft] def intMean(sum: Long, n: Long): Long = {
    val num = BigInt(sum) * 2 + n
    val den = BigInt(n) * 2
    val q = num / den
    (if (num.signum < 0 && q * den != num) q - 1 else q).toLong
  }

  /** Per-cluster micro means of an already-quantized micro column
    * grouped by `keyExpr` — the k-row bounded collect. Returns
    * cluster → centroid. */
  private def meansBy(df: DataFrame, microCol: String, keyExpr: Column,
                      dim: Int): Map[Long, Array[Long]] = {
    val v = col(microCol)
    val aggs = count(lit(1)).as("__graft_n") +:
      (0 until dim).map(i => sum(element_at(v, i + 1)).as(s"__graft_s$i"))
    df.groupBy(keyExpr.as("__graft_c"))
      .agg(aggs.head, aggs.tail: _*)
      .collect()
      .map { r =>
        val n = r.getLong(1)
        r.getLong(0) -> Array.tabulate(dim)(i => intMean(r.getLong(2 + i), n))
      }.toMap
  }

  /** Train k-means with `iters` Lloyd rounds from the deterministic
    * `id % k` seeding. Requires a fixed-dimension vector column and
    * non-negative ids; rows whose vector is null or dirty (any
    * null/non-finite cell) drop before training, the [[Pca]] contract. */
  def fit(df: DataFrame, idCol: String, vecCol: String, k: Int,
          iters: Int): Model = {
    require(k >= 1 && k <= 65536, s"k=$k out of range")
    require(iters >= 1, "iters must be >= 1")
    // quantize ONCE behind a stage barrier: every iteration's
    // assignment and per-dim update reads the same materialized micro
    // column instead of re-running the float->micro transform per pass.
    // DIRTY vectors (null, or any null/non-finite cell — micro_vec
    // nulls those whole) drop AFTER the staged materialization, the
    // Pca contract: letting a null micro vector reach meansBy inflates
    // count(1) against null-skipping sums (silently biased centroids),
    // and reach assignOn argmins the row into cluster 0 with dist=null
    val mv = "__graft_mv"
    val q = graft.ops.Parallelism.stage(
      df.withColumn(mv, microVec(col(vecCol))))
      .filter(col(mv).isNotNull)
    // dimension from the CLEAN rows (size(null) on a dirty first row
    // would read as null), failing fast on an all-dirty corpus
    val dim = q.select(size(col(mv))).head().getInt(0)
    require(dim >= 1, "empty vectors")
    // init: micro-mean of each id-residue class; a class can only be
    // empty when the corpus has < k rows — then seed at the origin
    val init = meansBy(q, mv, pmod(col(idCol), lit(k.toLong)), dim)
    var cents = Array.tabulate(k)(j =>
      init.getOrElse(j.toLong, Array.fill(dim)(0L)))
    var assigned: DataFrame = null
    for (_ <- 0 until iters) {
      assigned = assignOn(q, col(mv), cents)
      val upd = meansBy(assigned, mv, col("cluster"), dim)
      cents = Array.tabulate(k)(j => upd.getOrElse(j.toLong, cents(j)))
    }
    Model(cents, assigned.drop(mv))
  }
}

package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Similarity
import Tables.t

/** Embedding similarity-search queries over the embeddings table
  * (64-dim float vectors): exact brute-force cosine top-k, sign-LSH
  * approximate top-k, and embedding-cosine near-duplicate pairs.
  */
object SimilarityQueries {

  private val K = 5
  private val NumQueries = 10
  private val NumPlanes = 4

  def q40BruteForceTopK(spark: SparkSession, dir: String): DataFrame = {
    val emb = t(spark, dir, "embeddings")
    Similarity.bruteForceTopK(
      emb.filter(col("vec_id") < NumQueries), emb, K)
      .orderBy("query_id", "rank")
  }

  /** DuckDB cosine with the same left-to-right double accumulation. */
  private def duckCosine(a: String, b: String): String =
    s"""round(
       |  list_sum(list_transform(list_zip($a, $b), x -> x[1] * x[2])) /
       |  (sqrt(list_sum(list_transform($a, x -> x * x))) *
       |   sqrt(list_sum(list_transform($b, x -> x * x)))), 6)""".stripMargin

  val q40Sql: String =
    s"""WITH q AS (
       |  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
       |  FROM embeddings WHERE vec_id < $NumQueries),
       |c AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv FROM embeddings),
       |scored AS (
       |  SELECT query_id, neighbor_id, ${duckCosine("qv", "cv")} AS sim
       |  FROM q, c WHERE query_id <> neighbor_id),
       |ranked AS (
       |  SELECT query_id, neighbor_id, sim,
       |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank
       |  FROM scored)
       |SELECT query_id, rank, neighbor_id, sim FROM ranked
       |WHERE rank <= $K ORDER BY query_id, rank""".stripMargin

  /** DuckDB sign-LSH bucket for `v` (DOUBLE[]) — mirrors
    * Similarity.lshBucket exactly (same salted-hash plane components);
    * `table` selects the independent plane set. */
  private def duckBucketT(v: String, table: Int): String = {
    val bits = (0 until NumPlanes).map { p =>
      val plane = table * NumPlanes + p
      s"""(CASE WHEN list_sum([$v[i] *
         |  ((('0x' || substr(md5('plane$plane|' || (i-1)::VARCHAR), 1, 15))::UBIGINT
         |    % 20011)::DOUBLE / 10005.5 - 1.0)
         |  for i in range(1, len($v) + 1)]) > 0
         | THEN ${1L << p} ELSE 0 END)""".stripMargin
    }
    bits.mkString("(", " + ", ")")
  }

  private def duckBucket(v: String): String = duckBucketT(v, 0)

  def q41LshTopK(spark: SparkSession, dir: String): DataFrame = {
    val emb = t(spark, dir, "embeddings")
    Similarity.lshTopK(
      emb.filter(col("vec_id") < NumQueries), emb, K, NumPlanes)
      .orderBy("query_id", "rank")
  }

  val q41Sql: String =
    s"""WITH q AS (
       |  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv,
       |    ${duckBucket("(embedding::DOUBLE[])")} AS bucket
       |  FROM embeddings WHERE vec_id < $NumQueries),
       |c AS (
       |  SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv,
       |    ${duckBucket("(embedding::DOUBLE[])")} AS bucket
       |  FROM embeddings),
       |scored AS (
       |  SELECT query_id, neighbor_id, ${duckCosine("qv", "cv")} AS sim
       |  FROM q JOIN c USING (bucket) WHERE query_id <> neighbor_id),
       |ranked AS (
       |  SELECT query_id, neighbor_id, sim,
       |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank
       |  FROM scored)
       |SELECT query_id, rank, neighbor_id, sim FROM ranked
       |WHERE rank <= $K ORDER BY query_id, rank""".stripMargin

  /** Near-dup pairs with corpus-scaled hashing: plane count grows with
    * log2(n) so expected bucket occupancy stays ~constant — the tuning
    * rule a real deployment applies (4 planes for 200 vectors is 16
    * buckets; at 20k vectors the same 16 buckets make the bucket-local
    * pair join quadratic, measured 19x at the 10x bench point). At the
    * driver's verify scales (n ≤ 500) this resolves to exactly the
    * oracle's static 4 planes; identical replicas always share every
    * sign, so recall for true duplicates is unaffected by plane count. */
  /** The ONE plane-count rule q42 and q49 share — a drift here would
    * silently break q49's "same pair graph as q42" premise. */
  private def scaledPlanes(emb: DataFrame): Int =
    Similarity.autoPlanes(emb.count(), anchorCorpus = 500,
      minPlanes = NumPlanes)

  def q42EmbeddingNearDups(spark: SparkSession, dir: String): DataFrame = {
    val emb = t(spark, dir, "embeddings")
    Similarity.embeddingNearDupPairs(emb, threshold = 0.3, scaledPlanes(emb))
      .orderBy("id_a", "id_b")
  }

  val q42Sql: String =
    s"""WITH v AS (
       |  SELECT vec_id AS id, embedding::DOUBLE[] AS vec,
       |    ${duckBucket("(embedding::DOUBLE[])")} AS bucket
       |  FROM embeddings),
       |capped AS (
       |  SELECT id, vec, bucket FROM (
       |    SELECT *, count(*) OVER (PARTITION BY bucket) AS bsz FROM v)
       |  WHERE bsz <= 1000),
       |pairs AS (
       |  SELECT a.id AS id_a, b.id AS id_b,
       |    ${duckCosine("a.vec", "b.vec")} AS sim
       |  FROM capped a JOIN capped b USING (bucket) WHERE a.id < b.id)
       |SELECT id_a, id_b, sim FROM pairs WHERE sim >= 0.3
       |ORDER BY id_a, id_b""".stripMargin

  private val NumTables = 3

  /** Multi-table LSH top-k (the recall path): candidates = union of
    * bucket matches across 3 independent plane sets, deduped before the
    * exact cosine rank. */
  def q43LshMultiTable(spark: SparkSession, dir: String): DataFrame = {
    val emb = t(spark, dir, "embeddings")
    Similarity.lshTopKMultiTable(
      emb.filter(col("vec_id") < NumQueries), emb, K, NumPlanes, NumTables)
      .orderBy("query_id", "rank")
  }

  val q43Sql: String = {
    def sideT(src: String, idAs: String, t: Int): String =
      s"""SELECT vec_id AS $idAs, $t AS tbl,
         |  ${duckBucketT("(embedding::DOUBLE[])", t)} AS bucket
         |FROM $src""".stripMargin
    val qsides = (0 until NumTables)
      .map(t => sideT(s"embeddings WHERE vec_id < $NumQueries", "query_id", t))
      .mkString("\n  UNION ALL ")
    val csides = (0 until NumTables)
      .map(t => sideT("embeddings", "neighbor_id", t))
      .mkString("\n  UNION ALL ")
    s"""WITH qb AS (
       |  $qsides),
       |cb AS (
       |  $csides),
       |cands AS (
       |  SELECT DISTINCT query_id, neighbor_id
       |  FROM qb JOIN cb USING (tbl, bucket)
       |  WHERE query_id <> neighbor_id),
       |qv AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv FROM embeddings
       |       WHERE vec_id < $NumQueries),
       |cv AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv FROM embeddings),
       |scored AS (
       |  SELECT c.query_id, c.neighbor_id, ${duckCosine("q.qv", "v.cv")} AS sim
       |  FROM cands c JOIN qv q USING (query_id) JOIN cv v USING (neighbor_id)),
       |ranked AS (
       |  SELECT query_id, neighbor_id, sim,
       |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank
       |  FROM scored)
       |SELECT query_id, rank, neighbor_id, sim FROM ranked
       |WHERE rank <= $K ORDER BY query_id, rank""".stripMargin
  }

  private val NumCentroids = 8
  private val NProbe = 2

  /** IVF-flat top-k (the coarse-quantization scale path): stride-picked
    * centroids, nearest-list assignment, 2-of-8 probe, exact cosine on
    * the candidates. The oracle rebuilds the identical inverted lists in
    * SQL, so assignment argmax ties, probe ranking, and the final top-k
    * all have to agree bit-for-bit. */
  def q44AnnIvf(spark: SparkSession, dir: String): DataFrame = {
    val emb = t(spark, dir, "embeddings")
    Similarity.ivfTopK(
      emb.filter(col("vec_id") < NumQueries), emb, K, NumCentroids, NProbe)
      .orderBy("query_id", "rank")
  }

  val q44Sql: String = {
    val stride = s"((SELECT count(*) FROM embeddings) // $NumCentroids)"
    // assignment/probe cosine is UNROUNDED (both engines accumulate
    // left-to-right in double, so the argmax agrees); only the reported
    // sim rounds to 6dp like every other ANN query
    def rawCosine(a: String, b: String): String =
      s"""(list_sum(list_transform(list_zip($a, $b), x -> x[1] * x[2])) /
         |  (sqrt(list_sum(list_transform($a, x -> x * x))) *
         |   sqrt(list_sum(list_transform($b, x -> x * x)))))""".stripMargin
    s"""WITH cent AS (
       |  SELECT vec_id AS centroid_id, embedding::DOUBLE[] AS centv
       |  FROM embeddings
       |  WHERE vec_id % $stride = 0 AND vec_id // $stride < $NumCentroids),
       |assign AS (
       |  SELECT neighbor_id, centroid_id AS cluster FROM (
       |    SELECT c.vec_id AS neighbor_id, cent.centroid_id,
       |      ROW_NUMBER() OVER (PARTITION BY c.vec_id
       |        ORDER BY ${rawCosine("(c.embedding::DOUBLE[])", "cent.centv")} DESC,
       |          cent.centroid_id) AS rn
       |    FROM embeddings c, cent)
       |  WHERE rn = 1),
       |probes AS (
       |  SELECT query_id, centroid_id AS cluster FROM (
       |    SELECT q.vec_id AS query_id, cent.centroid_id,
       |      ROW_NUMBER() OVER (PARTITION BY q.vec_id
       |        ORDER BY ${rawCosine("(q.embedding::DOUBLE[])", "cent.centv")} DESC,
       |          cent.centroid_id) AS rn
       |    FROM embeddings q, cent WHERE q.vec_id < $NumQueries)
       |  WHERE rn <= $NProbe),
       |cands AS (
       |  SELECT query_id, neighbor_id
       |  FROM probes JOIN assign USING (cluster)
       |  WHERE query_id <> neighbor_id),
       |qv AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv FROM embeddings
       |       WHERE vec_id < $NumQueries),
       |cv AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv FROM embeddings),
       |scored AS (
       |  SELECT c.query_id, c.neighbor_id, ${duckCosine("q.qv", "v.cv")} AS sim
       |  FROM cands c JOIN qv q USING (query_id) JOIN cv v USING (neighbor_id)),
       |ranked AS (
       |  SELECT query_id, neighbor_id, sim,
       |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank
       |  FROM scored)
       |SELECT query_id, rank, neighbor_id, sim FROM ranked
       |WHERE rank <= $K ORDER BY query_id, rank""".stripMargin
  }

  /** TRAINED-quantizer IVF (the q44 serving plan under q129's k-means):
    * two integer-exact Lloyd rounds learn 8 centroids, which convert
    * back to float space and drive the same broadcast-assign /
    * probe-2-lists / exact-rerank plan — the production "train the
    * coarse quantizer offline, serve unchanged" composition. The oracle
    * replays BOTH halves from scratch: the full training loop in micro
    * integers, then the inverted-list probe against the trained
    * centroids. */
  def q131IvfTrained(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.KMeans
    val emb = t(spark, dir, "embeddings")
    val model = KMeans.fit(emb, "vec_id", "embedding",
      k = NumCentroids, iters = 2)
    val cents = spark.createDataFrame(
      model.centroids.zipWithIndex.toSeq.map { case (c, j) =>
        (j.toLong, c.map(_.toDouble / 1e6)) })
      .toDF("centroid_id", "centv")
    Similarity.ivfTopKWithCentroids(
      emb.filter(col("vec_id") < NumQueries), emb, K, cents, NProbe)
      .orderBy("query_id", "rank")
  }

  val q131Sql: String = {
    def rawCosine(a: String, b: String): String =
      s"""(list_sum(list_transform(list_zip($a, $b), x -> x[1] * x[2])) /
         |  (sqrt(list_sum(list_transform($a, x -> x * x))) *
         |   sqrt(list_sum(list_transform($b, x -> x * x)))))""".stripMargin
    s"""WITH ${OracleCtes.microVecCte("qm")},
       |flat0 AS (
       |  SELECT vec_id % $NumCentroids AS j, unnest(v) AS x,
       |    unnest(range(1, len(v) + 1)) AS i
       |  FROM qm),
       |c0 AS (
       |  SELECT j, i,
       |    CAST(CASE WHEN (2 * sum(x) + count(*)) < 0
       |        AND (2 * sum(x) + count(*)) % (2 * count(*)) <> 0
       |      THEN (2 * sum(x) + count(*)) // (2 * count(*)) - 1
       |      ELSE (2 * sum(x) + count(*)) // (2 * count(*)) END
       |      AS BIGINT) AS m
       |  FROM flat0 GROUP BY 1, 2),
       |c0v AS (SELECT j, list(m ORDER BY i) AS cl FROM c0 GROUP BY 1),
       |d1 AS (
       |  SELECT qm.vec_id, c.j,
       |    list_sum(list_transform(list_zip(qm.v, c.cl),
       |      p -> (p[1] - p[2]) * (p[1] - p[2]))) AS d
       |  FROM qm CROSS JOIN c0v c),
       |a1 AS (
       |  SELECT vec_id, j AS cluster,
       |    row_number() OVER (PARTITION BY vec_id ORDER BY d, j) AS rk
       |  FROM d1),
       |flat1 AS (
       |  SELECT a.cluster AS j, unnest(qm.v) AS x,
       |    unnest(range(1, len(qm.v) + 1)) AS i
       |  FROM qm JOIN (SELECT vec_id, cluster FROM a1 WHERE rk = 1) a
       |    USING (vec_id)),
       |c1 AS (
       |  SELECT j, i,
       |    CAST(CASE WHEN (2 * sum(x) + count(*)) < 0
       |        AND (2 * sum(x) + count(*)) % (2 * count(*)) <> 0
       |      THEN (2 * sum(x) + count(*)) // (2 * count(*)) - 1
       |      ELSE (2 * sum(x) + count(*)) // (2 * count(*)) END
       |      AS BIGINT) AS m
       |  FROM flat1 GROUP BY 1, 2),
       |c1v0 AS (SELECT j, list(m ORDER BY i) AS cl FROM c1 GROUP BY 1),
       |c1v AS (
       |  SELECT c0v.j, coalesce(c1v0.cl, c0v.cl) AS cl
       |  FROM c0v LEFT JOIN c1v0 ON c0v.j = c1v0.j),
       |d2 AS (
       |  SELECT qm.vec_id, c.j,
       |    list_sum(list_transform(list_zip(qm.v, c.cl),
       |      p -> (p[1] - p[2]) * (p[1] - p[2]))) AS d
       |  FROM qm CROSS JOIN c1v c),
       |a2 AS (
       |  SELECT vec_id, j AS cluster,
       |    row_number() OVER (PARTITION BY vec_id ORDER BY d, j) AS rk
       |  FROM d2),
       |flat2 AS (
       |  SELECT a.cluster AS j, unnest(qm.v) AS x,
       |    unnest(range(1, len(qm.v) + 1)) AS i
       |  FROM qm JOIN (SELECT vec_id, cluster FROM a2 WHERE rk = 1) a
       |    USING (vec_id)),
       |c2 AS (
       |  SELECT j, i,
       |    CAST(CASE WHEN (2 * sum(x) + count(*)) < 0
       |        AND (2 * sum(x) + count(*)) % (2 * count(*)) <> 0
       |      THEN (2 * sum(x) + count(*)) // (2 * count(*)) - 1
       |      ELSE (2 * sum(x) + count(*)) // (2 * count(*)) END
       |      AS BIGINT) AS m
       |  FROM flat2 GROUP BY 1, 2),
       |c2v0 AS (SELECT j, list(m ORDER BY i) AS cl FROM c2 GROUP BY 1),
       |c2v AS (
       |  SELECT c1v.j, coalesce(c2v0.cl, c1v.cl) AS cl
       |  FROM c1v LEFT JOIN c2v0 ON c1v.j = c2v0.j),
       |cent AS (
       |  SELECT j AS centroid_id,
       |    list_transform(cl, m -> m / 1000000.0) AS centv
       |  FROM c2v),
       |assign AS (
       |  SELECT neighbor_id, centroid_id AS cluster FROM (
       |    SELECT c.vec_id AS neighbor_id, cent.centroid_id,
       |      ROW_NUMBER() OVER (PARTITION BY c.vec_id
       |        ORDER BY ${rawCosine("(c.embedding::DOUBLE[])", "cent.centv")} DESC,
       |          cent.centroid_id) AS rn
       |    FROM embeddings c, cent)
       |  WHERE rn = 1),
       |probes AS (
       |  SELECT query_id, centroid_id AS cluster FROM (
       |    SELECT q.vec_id AS query_id, cent.centroid_id,
       |      ROW_NUMBER() OVER (PARTITION BY q.vec_id
       |        ORDER BY ${rawCosine("(q.embedding::DOUBLE[])", "cent.centv")} DESC,
       |          cent.centroid_id) AS rn
       |    FROM embeddings q, cent WHERE q.vec_id < $NumQueries)
       |  WHERE rn <= $NProbe),
       |cands AS (
       |  SELECT query_id, neighbor_id
       |  FROM probes JOIN assign USING (cluster)
       |  WHERE query_id <> neighbor_id),
       |qv AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv FROM embeddings
       |       WHERE vec_id < $NumQueries),
       |cw AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cw FROM embeddings),
       |scored AS (
       |  SELECT c.query_id, c.neighbor_id, ${duckCosine("q.qv", "v.cw")} AS sim
       |  FROM cands c JOIN qv q USING (query_id) JOIN cw v USING (neighbor_id)),
       |ranked AS (
       |  SELECT query_id, neighbor_id, sim,
       |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank
       |  FROM scored)
       |SELECT query_id, rank, neighbor_id, sim FROM ranked
       |WHERE rank <= $K ORDER BY query_id, rank""".stripMargin
  }

  /** Transitive semantic-dup clusters over the q42 pair graph: every
    * vector labeled with its component's min id (singletons themselves).
    * Uses the corpus-scaled plane count like q42 so the two queries see
    * the SAME pair graph. */
  def q49EmbeddingClusters(spark: SparkSession, dir: String): DataFrame = {
    val emb = t(spark, dir, "embeddings")
    Similarity.embeddingNearDupClusters(emb, threshold = 0.3,
      scaledPlanes(emb)).orderBy("vec_id")
  }

  /** Shared recursive-CTE prefix for q49/q59: q42's bucketed pair
    * arithmetic closed transitively — `reach(src, dst)` holds every
    * (vector, reachable vector) pair. */
  private val embedClosureCtes: String =
    s"""WITH RECURSIVE v AS (
       |  SELECT vec_id AS id, embedding::DOUBLE[] AS vec,
       |    ${duckBucket("(embedding::DOUBLE[])")} AS bucket
       |  FROM embeddings),
       |capped AS (
       |  SELECT id, vec, bucket FROM (
       |    SELECT *, count(*) OVER (PARTITION BY bucket) AS bsz FROM v)
       |  WHERE bsz <= 1000),
       |pairs AS (
       |  SELECT id_a, id_b FROM (
       |    SELECT a.id AS id_a, b.id AS id_b,
       |      ${duckCosine("a.vec", "b.vec")} AS sim
       |    FROM capped a JOIN capped b USING (bucket) WHERE a.id < b.id)
       |  WHERE sim >= 0.3),
       |edges AS (
       |  SELECT id_a AS a, id_b AS b FROM pairs
       |  UNION ALL SELECT id_b, id_a FROM pairs),
       |reach AS (
       |  SELECT vec_id AS src, vec_id AS dst FROM embeddings
       |  UNION
       |  SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a)""".stripMargin

  /** Oracle: cluster = min reachable vec id. */
  val q49Sql: String =
    s"""$embedClosureCtes
       |SELECT src AS vec_id, CAST(min(dst) AS BIGINT) AS cluster_id
       |FROM reach GROUP BY src ORDER BY vec_id""".stripMargin

  /** Cluster-exact semantic dedup: one survivor per q49 component. */
  def q59DropSemanticDups(spark: SparkSession, dir: String): DataFrame = {
    val emb = t(spark, dir, "embeddings")
    Similarity.dropSemanticDuplicates(emb, threshold = 0.3,
      scaledPlanes(emb))
      .select(col("vec_id"))
      .orderBy("vec_id")
  }

  /** Oracle: the q49 closure, keeping ids that are their own cluster
    * minimum. */
  val q59Sql: String =
    s"""$embedClosureCtes
       |SELECT src AS vec_id FROM reach
       |GROUP BY src HAVING src = min(dst) ORDER BY vec_id""".stripMargin

  /** Int8-quantized ANN: same query set as q40, scored on symmetric int8
    * codes — the memory-bound (4× smaller) tier of a two-stage design.
    * Entirely integer until one final division, so the oracle replays it
    * exactly. */
  def q107Int8TopK(spark: SparkSession, dir: String): DataFrame = {
    val emb = t(spark, dir, "embeddings")
    Similarity.int8TopK(
      emb.filter(col("vec_id") < NumQueries), emb, K)
      .orderBy("query_id", "rank")
  }

  /** DuckDB int8 codes for a DOUBLE[] vector: round half-away-from-zero
    * matches Spark's ROUND; zero vector → all-zero codes. */
  private def duckInt8(v: String): String =
    s"""(CASE WHEN list_max(list_transform($v, x -> abs(x))) = 0
       |  THEN list_transform($v, x -> 0::BIGINT)
       |  ELSE list_transform($v, x -> CAST(round(
       |    x * 127.0 / list_max(list_transform($v, y -> abs(y)))) AS BIGINT))
       |  END)""".stripMargin

  private def duckIntDot(a: String, b: String): String =
    s"CAST(list_sum(list_transform(list_zip($a, $b), x -> x[1] * x[2])) AS BIGINT)"

  val q107Sql: String =
    s"""WITH q AS (
       |  SELECT vec_id AS query_id, ${duckInt8("(embedding::DOUBLE[])")} AS qq
       |  FROM embeddings WHERE vec_id < $NumQueries),
       |c AS (
       |  SELECT vec_id AS neighbor_id, ${duckInt8("(embedding::DOUBLE[])")} AS qc
       |  FROM embeddings),
       |scored AS (
       |  SELECT query_id, neighbor_id,
       |    CASE WHEN ${duckIntDot("qq", "qq")} = 0
       |           OR ${duckIntDot("qc", "qc")} = 0 THEN round(0.0, 6)
       |    ELSE round(CAST(${duckIntDot("qq", "qc")} AS DOUBLE) /
       |      sqrt(CAST(${duckIntDot("qq", "qq")} * ${duckIntDot("qc", "qc")}
       |        AS DOUBLE)), 6) END AS qsim
       |  FROM q, c WHERE query_id <> neighbor_id),
       |ranked AS (
       |  SELECT query_id, neighbor_id, qsim,
       |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY qsim DESC, neighbor_id) AS rank
       |  FROM scored)
       |SELECT query_id, rank, neighbor_id, qsim FROM ranked
       |WHERE rank <= $K ORDER BY query_id, rank""".stripMargin

  private val Refine = 4

  /** Two-stage ANN: int8 shortlist (k·4 candidates) → exact float cosine
    * re-rank to k. Both tiers deterministic, so the cascade replays in
    * SQL end-to-end. */
  def q108Int8Refine(spark: SparkSession, dir: String): DataFrame = {
    val emb = t(spark, dir, "embeddings")
    Similarity.int8RefineTopK(
      emb.filter(col("vec_id") < NumQueries), emb, K, Refine)
      .orderBy("query_id", "rank")
  }

  val q108Sql: String =
    s"""WITH q AS (
       |  SELECT vec_id AS query_id, ${duckInt8("(embedding::DOUBLE[])")} AS qq
       |  FROM embeddings WHERE vec_id < $NumQueries),
       |c AS (
       |  SELECT vec_id AS neighbor_id, ${duckInt8("(embedding::DOUBLE[])")} AS qc
       |  FROM embeddings),
       |qscored AS (
       |  SELECT query_id, neighbor_id,
       |    CASE WHEN ${duckIntDot("qq", "qq")} = 0
       |           OR ${duckIntDot("qc", "qc")} = 0 THEN round(0.0, 6)
       |    ELSE round(CAST(${duckIntDot("qq", "qc")} AS DOUBLE) /
       |      sqrt(CAST(${duckIntDot("qq", "qq")} * ${duckIntDot("qc", "qc")}
       |        AS DOUBLE)), 6) END AS qsim
       |  FROM q, c WHERE query_id <> neighbor_id),
       |shortlist AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT query_id, neighbor_id,
       |      ROW_NUMBER() OVER (PARTITION BY query_id
       |        ORDER BY qsim DESC, neighbor_id) AS qrank
       |    FROM qscored)
       |  WHERE qrank <= ${K * Refine}),
       |qv AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv FROM embeddings
       |       WHERE vec_id < $NumQueries),
       |cv AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv FROM embeddings),
       |rescored AS (
       |  SELECT s.query_id, s.neighbor_id, ${duckCosine("q.qv", "v.cv")} AS sim
       |  FROM shortlist s JOIN qv q USING (query_id)
       |                   JOIN cv v USING (neighbor_id)),
       |ranked AS (
       |  SELECT query_id, neighbor_id, sim,
       |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank
       |  FROM rescored)
       |SELECT query_id, rank, neighbor_id, sim FROM ranked
       |WHERE rank <= $K ORDER BY query_id, rank""".stripMargin

  /** IVF-SQ8 cascade — the composed production ANN: centroid pruning
    * (map-side literal dots), int8 scoring of the probed lists only,
    * float re-rank of the k·refine shortlist. nProbe=3 of 8 lists so the
    * oracle genuinely exercises the pruning (not a full scan in
    * disguise). */
  def q109IvfSq8(spark: SparkSession, dir: String): DataFrame = {
    val emb = t(spark, dir, "embeddings")
    Similarity.ivfInt8RefineTopK(
      emb.filter(col("vec_id") < NumQueries), emb, K,
      NumCentroids, nProbe = 3, refine = Refine)
      .orderBy("query_id", "rank")
  }

  val q109Sql: String = {
    val stride = s"((SELECT count(*) FROM embeddings) // $NumCentroids)"
    // assignment/probe ranking use the raw dot against NORMALIZED
    // centroids (argmax-equivalent to cosine; |v| is constant per row) —
    // the exact arithmetic the Spark side ships as driver literals
    def normDot(v: String): String =
      s"""list_sum(list_transform(list_zip($v, cn.cw), x -> x[1] * x[2]))"""
    s"""WITH cent AS (
       |  SELECT vec_id AS centroid_id, embedding::DOUBLE[] AS centv
       |  FROM embeddings
       |  WHERE vec_id % $stride = 0 AND vec_id // $stride < $NumCentroids),
       |cnorm AS (
       |  SELECT centroid_id,
       |    CASE WHEN sqrt(list_sum(list_transform(centv, x -> x * x))) = 0
       |      THEN list_transform(centv, x -> 0.0)
       |      ELSE list_transform(centv,
       |        x -> x / sqrt(list_sum(list_transform(centv, y -> y * y))))
       |    END AS cw
       |  FROM cent),
       |assign AS (
       |  SELECT neighbor_id, centroid_id AS cluster FROM (
       |    SELECT c.vec_id AS neighbor_id, cn.centroid_id,
       |      ROW_NUMBER() OVER (PARTITION BY c.vec_id
       |        ORDER BY ${normDot("(c.embedding::DOUBLE[])")} DESC,
       |          cn.centroid_id) AS rn
       |    FROM embeddings c, cnorm cn)
       |  WHERE rn = 1),
       |probes AS (
       |  SELECT query_id, centroid_id AS cluster FROM (
       |    SELECT q.vec_id AS query_id, cn.centroid_id,
       |      ROW_NUMBER() OVER (PARTITION BY q.vec_id
       |        ORDER BY ${normDot("(q.embedding::DOUBLE[])")} DESC,
       |          cn.centroid_id) AS rn
       |    FROM embeddings q, cnorm cn WHERE q.vec_id < $NumQueries)
       |  WHERE rn <= 3),
       |qc AS (
       |  SELECT vec_id AS query_id, ${duckInt8("(embedding::DOUBLE[])")} AS qq
       |  FROM embeddings WHERE vec_id < $NumQueries),
       |cc AS (
       |  SELECT vec_id AS neighbor_id, ${duckInt8("(embedding::DOUBLE[])")} AS qc
       |  FROM embeddings),
       |qscored AS (
       |  SELECT p.query_id, a.neighbor_id,
       |    CASE WHEN ${duckIntDot("qq", "qq")} = 0
       |           OR ${duckIntDot("qc", "qc")} = 0 THEN round(0.0, 6)
       |    ELSE round(CAST(${duckIntDot("qq", "qc")} AS DOUBLE) /
       |      sqrt(CAST(${duckIntDot("qq", "qq")} * ${duckIntDot("qc", "qc")}
       |        AS DOUBLE)), 6) END AS qsim
       |  FROM probes p JOIN assign a USING (cluster)
       |       JOIN qc ON p.query_id = qc.query_id
       |       JOIN cc ON a.neighbor_id = cc.neighbor_id
       |  WHERE p.query_id <> a.neighbor_id),
       |shortlist AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT query_id, neighbor_id,
       |      ROW_NUMBER() OVER (PARTITION BY query_id
       |        ORDER BY qsim DESC, neighbor_id) AS qrank
       |    FROM qscored)
       |  WHERE qrank <= ${K * Refine}),
       |qv AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv FROM embeddings
       |       WHERE vec_id < $NumQueries),
       |cv AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv FROM embeddings),
       |rescored AS (
       |  SELECT s.query_id, s.neighbor_id, ${duckCosine("q.qv", "v.cv")} AS sim
       |  FROM shortlist s JOIN qv q USING (query_id)
       |                   JOIN cv v USING (neighbor_id)),
       |ranked AS (
       |  SELECT query_id, neighbor_id, sim,
       |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank
       |  FROM rescored)
       |SELECT query_id, rank, neighbor_id, sim FROM ranked
       |WHERE rank <= $K ORDER BY query_id, rank""".stripMargin
  }

  // --- q111: PQ-ADC cascade (the FAISS PQ memory tier) -------------------

  private val PqM = 4  // subspaces of 16 dims over the 64-dim embeddings
  private val PqK = 8  // centroids per subspace codebook

  /** Product-quantization ANN: stride-seeded per-subspace codebooks
    * (the q44/q109 deterministic seeding rule, so the oracle rebuilds
    * the identical codebooks from the corpus itself), corpus encoded to
    * 4-byte codes (64× smaller than the floats), queries score via
    * micro-integer ADC tables, float re-rank of the k·refine shortlist.
    * Every cross-subspace accumulation is integer (the q103/q105 micro
    * discipline) so the whole cascade replays in SQL. */
  def q111AnnPqAdc(spark: SparkSession, dir: String): DataFrame = {
    val emb = t(spark, dir, "embeddings")
    val cb = Similarity.pqStrideCodebooks(emb, PqM, PqK)
    Similarity.pqAdcRefineTopK(
      emb.filter(col("vec_id") < NumQueries), emb, K, cb, Refine)
      .orderBy("query_id", "rank")
  }

  /** The PQ-ADC serving chain as SQL (cbn → final SELECT), assuming a
    * preceding `cb(j, i, centv DOUBLE[])` codebook CTE — shared verbatim
    * by the stride-seeded q111 and the trained-codebook q178, exactly as
    * the Scala side shares [[Similarity.pqAdcRefineTopK]]. */
  private def pqAdcServingSql(ds: Int, kRefine: Int): String = {
    def sub(v: String, j: String): String =
      s"list_slice($v, $j*$ds + 1, $j*$ds + $ds)"
    s"""cbn AS (
       |  SELECT j, i,
       |    CAST(round(list_sum(list_transform(centv, x -> x * x)) * 1000000.0, 0) AS BIGINT) AS n2
       |  FROM cb),
       |codes AS (
       |  SELECT vec_id, j, i AS code FROM (
       |    SELECT v.vec_id, c.j, c.i,
       |      ROW_NUMBER() OVER (PARTITION BY v.vec_id, c.j ORDER BY
       |        list_sum(list_transform(
       |          list_zip(${sub("(v.embedding::DOUBLE[])", "c.j")}, c.centv),
       |          x -> (x[1] - x[2]) * (x[1] - x[2]))) ASC, c.i ASC) AS rn
       |    FROM embeddings v, cb c)
       |  WHERE rn = 1),
       |rn AS (
       |  SELECT codes.vec_id, SUM(cbn.n2) AS rn2
       |  FROM codes JOIN cbn ON codes.j = cbn.j AND codes.code = cbn.i
       |  GROUP BY 1),
       |adc AS (
       |  SELECT q.vec_id AS query_id, c.j, c.i,
       |    CAST(round(list_sum(list_transform(
       |      list_zip(${sub("(q.embedding::DOUBLE[])", "c.j")}, c.centv),
       |      x -> x[1] * x[2])) * 1000000.0, 0) AS BIGINT) AS micro
       |  FROM embeddings q, cb c WHERE q.vec_id < $NumQueries),
       |qn AS (
       |  SELECT vec_id AS query_id,
       |    CAST(round(list_sum(list_transform(embedding::DOUBLE[], x -> x * x)) * 1000000.0, 0) AS BIGINT) AS qn2
       |  FROM embeddings WHERE vec_id < $NumQueries),
       |approx AS (
       |  SELECT a.query_id, codes.vec_id AS neighbor_id, SUM(a.micro) AS adot
       |  FROM codes JOIN adc a ON codes.j = a.j AND codes.code = a.i
       |  WHERE codes.vec_id <> a.query_id
       |  GROUP BY 1, 2),
       |sim0 AS (
       |  SELECT ap.query_id, ap.neighbor_id,
       |    round(CASE WHEN qn.qn2 <= 0 OR rn.rn2 <= 0 THEN 0.0
       |      ELSE ap.adot::DOUBLE / sqrt(qn.qn2::DOUBLE * rn.rn2::DOUBLE)
       |      END, 6) AS qsim
       |  FROM approx ap JOIN qn USING (query_id)
       |                 JOIN rn ON ap.neighbor_id = rn.vec_id),
       |shortlist AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT query_id, neighbor_id,
       |      ROW_NUMBER() OVER (PARTITION BY query_id
       |        ORDER BY qsim DESC, neighbor_id) AS qrank
       |    FROM sim0)
       |  WHERE qrank <= $kRefine),
       |qv AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv FROM embeddings
       |       WHERE vec_id < $NumQueries),
       |cv AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv FROM embeddings),
       |rescored AS (
       |  SELECT s.query_id, s.neighbor_id, ${duckCosine("q.qv", "v.cv")} AS sim
       |  FROM shortlist s JOIN qv q USING (query_id)
       |                   JOIN cv v USING (neighbor_id)),
       |ranked AS (
       |  SELECT query_id, neighbor_id, sim,
       |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank
       |  FROM rescored)
       |SELECT query_id, rank, neighbor_id, sim FROM ranked
       |WHERE rank <= $K ORDER BY query_id, rank""".stripMargin
  }

  val q111Sql: String = {
    val ds = 16 // 64-dim embeddings / PqM subspaces
    val stride = s"((SELECT count(*) FROM embeddings) // $PqK)"
    def sub(v: String, j: String): String =
      s"list_slice($v, $j*$ds + 1, $j*$ds + $ds)"
    s"""WITH js AS (SELECT unnest(generate_series(0, ${PqM - 1})) AS j),
       |cb AS (
       |  SELECT js.j, CAST(e.vec_id // $stride AS INT) AS i,
       |    ${sub("(e.embedding::DOUBLE[])", "js.j")} AS centv
       |  FROM embeddings e, js
       |  WHERE e.vec_id % $stride = 0 AND e.vec_id // $stride < $PqK),
       |""".stripMargin + pqAdcServingSql(ds, K * Refine)
  }

  // --- q112: IVF-PQ cascade (the billion-scale production shape) ---------

  /** IVF coarse pruning + PQ-ADC scoring of the probed lists + float
    * re-rank — q109's skeleton with q111's scoring kernel, i.e. what
    * FAISS deploys at billion scale. nProbe=3 of 8 lists so the oracle
    * genuinely exercises pruning. */
  def q112AnnIvfPq(spark: SparkSession, dir: String): DataFrame = {
    val emb = t(spark, dir, "embeddings")
    val cb = Similarity.pqStrideCodebooks(emb, PqM, PqK)
    Similarity.ivfPqRefineTopK(
      emb.filter(col("vec_id") < NumQueries), emb, K, cb,
      NumCentroids, nProbe = 3, refine = Refine)
      .orderBy("query_id", "rank")
  }

  val q112Sql: String = {
    val ds = 16
    val cstride = s"((SELECT count(*) FROM embeddings) // $NumCentroids)"
    val pstride = s"((SELECT count(*) FROM embeddings) // $PqK)"
    def normDot(v: String): String =
      s"""list_sum(list_transform(list_zip($v, cn.cw), x -> x[1] * x[2]))"""
    def sub(v: String, j: String): String =
      s"list_slice($v, $j*$ds + 1, $j*$ds + $ds)"
    s"""WITH cent AS (
       |  SELECT vec_id AS centroid_id, embedding::DOUBLE[] AS centv
       |  FROM embeddings
       |  WHERE vec_id % $cstride = 0 AND vec_id // $cstride < $NumCentroids),
       |cnorm AS (
       |  SELECT centroid_id,
       |    CASE WHEN sqrt(list_sum(list_transform(centv, x -> x * x))) = 0
       |      THEN list_transform(centv, x -> 0.0)
       |      ELSE list_transform(centv,
       |        x -> x / sqrt(list_sum(list_transform(centv, y -> y * y))))
       |    END AS cw
       |  FROM cent),
       |assign AS (
       |  SELECT neighbor_id, centroid_id AS cluster FROM (
       |    SELECT c.vec_id AS neighbor_id, cn.centroid_id,
       |      ROW_NUMBER() OVER (PARTITION BY c.vec_id
       |        ORDER BY ${normDot("(c.embedding::DOUBLE[])")} DESC,
       |          cn.centroid_id) AS rn
       |    FROM embeddings c, cnorm cn)
       |  WHERE rn = 1),
       |probes AS (
       |  SELECT query_id, centroid_id AS cluster FROM (
       |    SELECT q.vec_id AS query_id, cn.centroid_id,
       |      ROW_NUMBER() OVER (PARTITION BY q.vec_id
       |        ORDER BY ${normDot("(q.embedding::DOUBLE[])")} DESC,
       |          cn.centroid_id) AS rn
       |    FROM embeddings q, cnorm cn WHERE q.vec_id < $NumQueries)
       |  WHERE rn <= 3),
       |js AS (SELECT unnest(generate_series(0, ${PqM - 1})) AS j),
       |cb AS (
       |  SELECT js.j, CAST(e.vec_id // $pstride AS INT) AS i,
       |    ${sub("(e.embedding::DOUBLE[])", "js.j")} AS centv
       |  FROM embeddings e, js
       |  WHERE e.vec_id % $pstride = 0 AND e.vec_id // $pstride < $PqK),
       |cbn AS (
       |  SELECT j, i,
       |    CAST(round(list_sum(list_transform(centv, x -> x * x)) * 1000000.0, 0) AS BIGINT) AS n2
       |  FROM cb),
       |codes AS (
       |  SELECT vec_id, j, i AS code FROM (
       |    SELECT v.vec_id, c.j, c.i,
       |      ROW_NUMBER() OVER (PARTITION BY v.vec_id, c.j ORDER BY
       |        list_sum(list_transform(
       |          list_zip(${sub("(v.embedding::DOUBLE[])", "c.j")}, c.centv),
       |          x -> (x[1] - x[2]) * (x[1] - x[2]))) ASC, c.i ASC) AS rn
       |    FROM embeddings v, cb c)
       |  WHERE rn = 1),
       |rn AS (
       |  SELECT codes.vec_id, SUM(cbn.n2) AS rn2
       |  FROM codes JOIN cbn ON codes.j = cbn.j AND codes.code = cbn.i
       |  GROUP BY 1),
       |adc AS (
       |  SELECT q.vec_id AS query_id, c.j, c.i,
       |    CAST(round(list_sum(list_transform(
       |      list_zip(${sub("(q.embedding::DOUBLE[])", "c.j")}, c.centv),
       |      x -> x[1] * x[2])) * 1000000.0, 0) AS BIGINT) AS micro
       |  FROM embeddings q, cb c WHERE q.vec_id < $NumQueries),
       |qn AS (
       |  SELECT vec_id AS query_id,
       |    CAST(round(list_sum(list_transform(embedding::DOUBLE[], x -> x * x)) * 1000000.0, 0) AS BIGINT) AS qn2
       |  FROM embeddings WHERE vec_id < $NumQueries),
       |qscored AS (
       |  SELECT p.query_id, a.neighbor_id, SUM(ad.micro) AS adot
       |  FROM probes p JOIN assign a USING (cluster)
       |       JOIN codes co ON a.neighbor_id = co.vec_id
       |       JOIN adc ad ON p.query_id = ad.query_id
       |                  AND co.j = ad.j AND co.code = ad.i
       |  WHERE p.query_id <> a.neighbor_id
       |  GROUP BY 1, 2),
       |sim0 AS (
       |  SELECT qs.query_id, qs.neighbor_id,
       |    round(CASE WHEN qn.qn2 <= 0 OR rn.rn2 <= 0 THEN 0.0
       |      ELSE qs.adot::DOUBLE / sqrt(qn.qn2::DOUBLE * rn.rn2::DOUBLE)
       |      END, 6) AS qsim
       |  FROM qscored qs JOIN qn USING (query_id)
       |                  JOIN rn ON qs.neighbor_id = rn.vec_id),
       |shortlist AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT query_id, neighbor_id,
       |      ROW_NUMBER() OVER (PARTITION BY query_id
       |        ORDER BY qsim DESC, neighbor_id) AS qrank
       |    FROM sim0)
       |  WHERE qrank <= ${K * Refine}),
       |qv AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv FROM embeddings
       |       WHERE vec_id < $NumQueries),
       |cv AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv FROM embeddings),
       |rescored AS (
       |  SELECT s.query_id, s.neighbor_id, ${duckCosine("q.qv", "v.cv")} AS sim
       |  FROM shortlist s JOIN qv q USING (query_id)
       |                   JOIN cv v USING (neighbor_id)),
       |ranked AS (
       |  SELECT query_id, neighbor_id, sim,
       |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank
       |  FROM rescored)
       |SELECT query_id, rank, neighbor_id, sim FROM ranked
       |WHERE rank <= $K ORDER BY query_id, rank""".stripMargin
  }

  // --- q178: TRAINED-codebook PQ cascade (the production PQ shape) -------

  private val PqTM = 8   // subspaces of 8 dims over the 64-dim embeddings
  private val PqTK = 64  // centroids per trained subspace codebook
  private val PqTIters = 3
  private val PqTRefine = 8

  /** Trained product quantization at production-ish settings (m=8, k=64
    * — the FAISS-default shape the round-8 recall table showed recovers
    * 0.92+ where the stride-seeded q111 toy floors at ~0.002):
    * [[Similarity.pqTrainExact]] runs three integer-exact Lloyd rounds per
    * subspace on the micro grid, and the trained codebooks drive the
    * SAME ADC serving plan as q111. The oracle replays BOTH halves from
    * scratch: all m per-subspace trainings (stride seeds, three
    * assign/floor-mean rounds — the q131 trained-IVF discipline with the
    * subspace index joined into every key), then the encode / ADC /
    * float-re-rank chain. RecallSpec pins recall@5 ≥ 0.90 for exactly
    * this declared cascade. Training carries the FAISS-practice
    * sampleCap (65536): it does NOT bind at any fixture scale (stride
    * 1 ⇒ the oracle's full-corpus replay is exact), and at 100 TB it
    * is what keeps Lloyd cost corpus-size-independent. */
  def q178AnnPqTrained(spark: SparkSession, dir: String): DataFrame = {
    val emb = t(spark, dir, "embeddings")
    val cb = Similarity.pqTrainExact(emb, PqTM, PqTK, PqTIters)
    Similarity.pqAdcRefineTopK(
      emb.filter(col("vec_id") < NumQueries), emb, K, cb, PqTRefine)
      .orderBy("query_id", "rank")
  }

  val q178Sql: String = {
    val m = PqTM; val k = PqTK; val ds = 64 / PqTM
    val strideSql = s"((SELECT count(*) FROM embeddings) // $k)"
    // round-half-up integer mean in BIGINT with an explicit floor
    // adjustment for negative non-exact quotients — KMeans.intMean
    val mean =
      s"""CAST(CASE WHEN (2 * sum(x) + count(*)) < 0
         |        AND (2 * sum(x) + count(*)) % (2 * count(*)) <> 0
         |      THEN (2 * sum(x) + count(*)) // (2 * count(*)) - 1
         |      ELSE (2 * sum(x) + count(*)) // (2 * count(*)) END
         |      AS BIGINT) AS mm""".stripMargin
    val train = new StringBuilder
    train ++=
      s"""WITH ${OracleCtes.microVecCte("mvq")},
         |js AS (SELECT unnest(generate_series(0, ${m - 1})) AS j),
         |sv AS (
         |  SELECT vec_id, j, list_slice(v, j*$ds + 1, j*$ds + $ds) AS s
         |  FROM mvq, js),
         |v0 AS (
         |  SELECT j, vec_id // $strideSql AS c, s AS cl
         |  FROM sv
         |  WHERE vec_id % $strideSql = 0 AND vec_id // $strideSql < $k),
         |""".stripMargin
    for (t <- 1 to PqTIters) {
      val p = t - 1
      train ++=
        s"""d$t AS (
           |  SELECT sv.vec_id, sv.j, cb.c,
           |    list_sum(list_transform(list_zip(sv.s, cb.cl),
           |      p -> (p[1] - p[2]) * (p[1] - p[2]))) AS d
           |  FROM sv JOIN v$p cb ON sv.j = cb.j),
           |a$t AS (
           |  SELECT vec_id, j, c FROM (
           |    SELECT vec_id, j, c,
           |      row_number() OVER (PARTITION BY vec_id, j ORDER BY d, c) AS rk
           |    FROM d$t)
           |  WHERE rk = 1),
           |f$t AS (
           |  SELECT a.j, a.c, unnest(sv.s) AS x,
           |    unnest(range(1, $ds + 1)) AS i
           |  FROM sv JOIN a$t a ON sv.vec_id = a.vec_id AND sv.j = a.j),
           |m$t AS (SELECT j, c, i, $mean FROM f$t GROUP BY 1, 2, 3),
           |v${t}0 AS (SELECT j, c, list(mm ORDER BY i) AS cl FROM m$t GROUP BY 1, 2),
           |v$t AS (
           |  SELECT p.j, p.c, coalesce(n.cl, p.cl) AS cl
           |  FROM v$p p LEFT JOIN v${t}0 n ON p.j = n.j AND p.c = n.c),
           |""".stripMargin
    }
    train ++=
      s"""cb AS (
         |  SELECT j, CAST(c AS INT) AS i,
         |    list_transform(cl, mm -> mm / 1000000.0) AS centv
         |  FROM v$PqTIters),
         |""".stripMargin
    train.result() + pqAdcServingSql(ds, K * PqTRefine)
  }

  // --- q119: persisted dense index round-trip ----------------------------

  /** Index lifecycle: build the IVF-SQ8 index to disk, then answer the
    * q109 query batch FROM the persisted index (cluster-partitioned
    * lists, probe set pushed down as a partition filter). Results are
    * bit-identical to the in-memory cascade, so the oracle IS q109's. */
  def q119DenseIndex(spark: SparkSession, dir: String): DataFrame = {
    val emb = t(spark, dir, "embeddings")
    val ix = System.getProperty("java.io.tmpdir") +
      "/graft_dense_index_" + Integer.toHexString(dir.hashCode)
    graft.operators.DenseIndex.build(emb, ix, NumCentroids)
    graft.operators.DenseIndex.query(
      emb.filter(col("vec_id") < NumQueries), ix, K,
      nProbe = 3, refine = Refine)
      .orderBy("query_id", "rank")
  }

  // --- q114: SemDeDup — cluster-scoped semantic dedup -------------------

  /** SemDeDup over the embeddings table: nearest-of-8 stride centroids
    * (the q44 assignment rule), τ=0.3 pairwise cosine INSIDE each
    * cluster, one survivor per component — the member farthest from its
    * centroid (lowest assignment cosine, ties to smaller id). Emits
    * every vector with its cluster and keep flag, so the oracle checks
    * assignment, the cluster-local pair graph, component closure, AND
    * keeper election in one hash. */
  def q114SemDeDup(spark: SparkSession, dir: String): DataFrame = {
    val emb = t(spark, dir, "embeddings")
    Similarity.semDeDup(emb, threshold = 0.3, NumCentroids)
      .select(col("vec_id"), col("cluster"), col("keep"))
      .orderBy("vec_id")
  }

  val q114Sql: String = {
    val stride = s"((SELECT count(*) FROM embeddings) // $NumCentroids)"
    def rawCosine(a: String, b: String): String =
      s"""(list_sum(list_transform(list_zip($a, $b), x -> x[1] * x[2])) /
         |  (sqrt(list_sum(list_transform($a, x -> x * x))) *
         |   sqrt(list_sum(list_transform($b, x -> x * x)))))""".stripMargin
    s"""WITH RECURSIVE cent AS (
       |  SELECT vec_id AS centroid_id, embedding::DOUBLE[] AS centv
       |  FROM embeddings
       |  WHERE vec_id % $stride = 0 AND vec_id // $stride < $NumCentroids),
       |assign AS (
       |  SELECT vec_id, cluster, round(csim, 6) AS csimr FROM (
       |    SELECT c.vec_id, cent.centroid_id AS cluster,
       |      ${rawCosine("(c.embedding::DOUBLE[])", "cent.centv")} AS csim,
       |      ROW_NUMBER() OVER (PARTITION BY c.vec_id
       |        ORDER BY ${rawCosine("(c.embedding::DOUBLE[])", "cent.centv")} DESC,
       |          cent.centroid_id) AS rn
       |    FROM embeddings c, cent)
       |  WHERE rn = 1),
       |sz AS (
       |  SELECT vec_id, cluster, csimr,
       |    count(*) OVER (PARTITION BY cluster) AS n
       |  FROM assign),
       |capped AS (SELECT vec_id, cluster, csimr FROM sz WHERE n <= 1000),
       |hot AS (SELECT vec_id, cluster FROM sz WHERE n > 1000),
       |v AS (SELECT vec_id, embedding::DOUBLE[] AS vec FROM embeddings),
       |pairs AS (
       |  SELECT a.vec_id AS id_a, b.vec_id AS id_b
       |  FROM capped a JOIN capped b
       |    ON a.cluster = b.cluster AND a.vec_id < b.vec_id
       |  JOIN v va ON va.vec_id = a.vec_id
       |  JOIN v vb ON vb.vec_id = b.vec_id
       |  WHERE ${duckCosine("va.vec", "vb.vec")} >= 0.3),
       |edges AS (
       |  SELECT id_a AS a, id_b AS b FROM pairs
       |  UNION ALL SELECT id_b, id_a FROM pairs),
       |reach AS (
       |  SELECT vec_id AS src, vec_id AS dst FROM capped
       |  UNION
       |  SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a),
       |comps AS (SELECT src AS vec_id, min(dst) AS comp FROM reach GROUP BY src),
       |keepers AS (
       |  SELECT comp, vec_id AS keeper FROM (
       |    SELECT c.comp, c.vec_id,
       |      ROW_NUMBER() OVER (PARTITION BY c.comp
       |        ORDER BY a.csimr ASC, c.vec_id ASC) AS rn
       |    FROM comps c JOIN capped a USING (vec_id))
       |  WHERE rn = 1)
       |SELECT c.vec_id, a.cluster,
       |  CASE WHEN c.vec_id = k.keeper THEN 1 ELSE 0 END AS keep
       |FROM comps c JOIN capped a USING (vec_id) JOIN keepers k USING (comp)
       |UNION ALL SELECT vec_id, cluster, 1 AS keep FROM hot
       |ORDER BY vec_id""".stripMargin
  }

  /** Integer-exact k-means (k=4, two Lloyd rounds from the `id % k`
    * seeding) over the embeddings — the oracle re-trains BOTH rounds in
    * SQL from scratch (quantize → seed means → assign → update with
    * empty-cluster fallback → reassign) and must land on identical
    * clusters AND identical integer distances, so the whole training
    * loop is cross-engine verified, not just a final labeling. */
  def q129KMeans(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.KMeans
    val emb = t(spark, dir, "embeddings")
    KMeans.fit(emb, "vec_id", "embedding", k = 4, iters = 2)
      .assignments
      .select(col("vec_id"), col("cluster"), col("dist"))
      .orderBy("vec_id")
  }

  val q129Sql: String =
    s"""WITH ${OracleCtes.microVecCte("q")},
      |flat0 AS (
      |  SELECT vec_id % 4 AS j, unnest(v) AS x,
      |    unnest(range(1, len(v) + 1)) AS i
      |  FROM q),
      |c0 AS (
      |  SELECT j, i,
      |    CAST(CASE WHEN (2 * sum(x) + count(*)) < 0
      |        AND (2 * sum(x) + count(*)) % (2 * count(*)) <> 0
      |      THEN (2 * sum(x) + count(*)) // (2 * count(*)) - 1
      |      ELSE (2 * sum(x) + count(*)) // (2 * count(*)) END
      |      AS BIGINT) AS m
      |  FROM flat0 GROUP BY 1, 2),
      |c0v AS (SELECT j, list(m ORDER BY i) AS cv FROM c0 GROUP BY 1),
      |d1 AS (
      |  SELECT q.vec_id, c.j,
      |    list_sum(list_transform(list_zip(q.v, c.cv),
      |      p -> (p[1] - p[2]) * (p[1] - p[2]))) AS d
      |  FROM q CROSS JOIN c0v c),
      |a1 AS (
      |  SELECT vec_id, j AS cluster,
      |    row_number() OVER (PARTITION BY vec_id ORDER BY d, j) AS rk
      |  FROM d1),
      |flat1 AS (
      |  SELECT a.cluster AS j, unnest(q.v) AS x,
      |    unnest(range(1, len(q.v) + 1)) AS i
      |  FROM q JOIN (SELECT vec_id, cluster FROM a1 WHERE rk = 1) a
      |    USING (vec_id)),
      |c1 AS (
      |  SELECT j, i,
      |    CAST(CASE WHEN (2 * sum(x) + count(*)) < 0
      |        AND (2 * sum(x) + count(*)) % (2 * count(*)) <> 0
      |      THEN (2 * sum(x) + count(*)) // (2 * count(*)) - 1
      |      ELSE (2 * sum(x) + count(*)) // (2 * count(*)) END
      |      AS BIGINT) AS m
      |  FROM flat1 GROUP BY 1, 2),
      |c1v0 AS (SELECT j, list(m ORDER BY i) AS cv FROM c1 GROUP BY 1),
      |c1v AS (
      |  SELECT c0v.j, coalesce(c1v0.cv, c0v.cv) AS cv
      |  FROM c0v LEFT JOIN c1v0 ON c0v.j = c1v0.j),
      |d2 AS (
      |  SELECT q.vec_id, c.j,
      |    list_sum(list_transform(list_zip(q.v, c.cv),
      |      p -> (p[1] - p[2]) * (p[1] - p[2]))) AS d
      |  FROM q CROSS JOIN c1v c),
      |a2 AS (
      |  SELECT vec_id, j, d,
      |    row_number() OVER (PARTITION BY vec_id ORDER BY d, j) AS rk
      |  FROM d2)
      |SELECT vec_id, j::BIGINT AS cluster, d::BIGINT AS dist
      |FROM a2 WHERE rk = 1 ORDER BY vec_id""".stripMargin

  // --- q183: top-principal-component projection ----------------------------

  private val PcaIters = 8

  /** Centered projection of every vector on the corpus' top principal
    * direction ([[graft.operators.Pca.projectTop]]) — the whitening /
    * dominant-direction diagnostic. The oracle re-derives EVERYTHING:
    * micro quantization, the exact integer scaled covariance
    * n·Σvⱼvₖ − Σvⱼ·Σvₖ, its ≤1e6 floor quantization (DuckDB `//`
    * truncates toward zero, so floor gets the explicit sign
    * adjustment), all 8 power-iteration rounds with the signed
    * max-|component| pivot (ties → lowest index), and the final
    * exact-integer centered dot with ONE IEEE division per vector. */
  def q183PcaProject(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Pca.projectTop(
      t(spark, dir, "embeddings"), "vec_id", "embedding", PcaIters)
      .orderBy("vec_id")

  /** Shared PCA-projection oracle builder: everything after the `mv`
    * CTE (micro-quantized vectors) is IDENTICAL between q183 (raw d=64
    * embeddings) and q201 (a d=256 tiled corpus that routes Spark's
    * Gramian kernel) — the kernels are exact-integer equal by
    * construction (PcaSpec), so ONE replay covers both dispatches. */
  private def pcaProjectSql(mvCte: String): String = {
    import OracleCtes.fdiv
    val sb = new StringBuilder
    sb ++= mvCte
    sb ++=
      """ex AS MATERIALIZED (
        |  SELECT vec_id, unnest(v) AS vj,
        |    generate_subscripts(v, 1) - 1 AS j
        |  FROM mv),
        |cells AS MATERIALIZED (
        |  SELECT a.j AS j, b.j AS k,
        |    sum(a.vj::HUGEINT * b.vj::HUGEINT) AS ss,
        |    sum(a.vj)::HUGEINT AS sj, sum(b.vj)::HUGEINT AS sk,
        |    count(*)::HUGEINT AS n
        |  FROM ex a JOIN ex b USING (vec_id) GROUP BY 1, 2),
        |cov AS MATERIALIZED (
        |  SELECT j, k, (n * ss - sj * sk) AS c FROM cells),
        |mx AS (SELECT max(abs(c)) AS ma FROM cov),
        |""".stripMargin
    sb ++= s"q AS MATERIALIZED (\n  SELECT j, k, " +
      fdiv("c * 1000000::HUGEINT", "ma") +
      " AS qc\n  FROM cov CROSS JOIN mx),\n"
    sb ++= "x0 AS (SELECT DISTINCT j, 1000000::HUGEINT AS xv FROM cov),\n"
    for (t <- 1 to PcaIters) {
      val p = t - 1
      sb ++=
        s"""y$t AS MATERIALIZED (
           |  SELECT q.j, sum(q.qc * x$p.xv) AS yv
           |  FROM q JOIN x$p ON q.k = x$p.j GROUP BY 1),
           |p$t AS (SELECT yv AS pv FROM y$t ORDER BY abs(yv) DESC, j LIMIT 1),
           |x$t AS (SELECT j, ${fdiv("yv * 1000000::HUGEINT", "pv")} AS xv
           |  FROM y$t CROSS JOIN p$t),
           |""".stripMargin
    }
    sb ++=
      s"""sums AS MATERIALIZED (
         |  SELECT j, sum(vj)::HUGEINT AS s, count(*)::HUGEINT AS n
         |  FROM ex GROUP BY 1),
         |proj AS (
         |  SELECT ex.vec_id,
         |    sum((sums.n * ex.vj::HUGEINT - sums.s) * u.xv) AS dot,
         |    max(sums.n) AS n
         |  FROM ex JOIN sums USING (j) JOIN x$PcaIters u ON ex.j = u.j
         |  GROUP BY 1)
         |SELECT vec_id,
         |  round(dot::DOUBLE / (n::DOUBLE * 1000000000000.0), 6) AS pc1
         |FROM proj ORDER BY vec_id""".stripMargin
    sb.toString
  }

  val q183Sql: String = pcaProjectSql(
    """WITH mv AS MATERIALIZED (
      |  SELECT vec_id, list_transform(embedding,
      |    x -> CAST(round((x::DOUBLE) * 1000000.0, 0) AS BIGINT)) AS v
      |  FROM embeddings),
      |""".stripMargin)

  // --- q201: PCA projection at d = 256 (Gramian kernel dispatch) -----------

  /** Same projection as q183 on a d = 256 corpus: the 64-dim embedding
    * tiled ×4 with per-copy float scales (1, 1.25, 1.5, 1.75 — exactly
    * representable, so FLOAT×FLOAT is the same IEEE single rounding in
    * both engines; copies aren't exact duplicates). d > 64 dispatches
    * [[graft.operators.Pca]]'s mapPartitions Gramian kernel — this arm
    * puts the kernel that real embedding dims (256–3072) actually run
    * under the cross-engine oracle, where q183 (d = 64) replays only
    * the declarative posexplode² build. */
  def q201PcaProjectD256(spark: SparkSession, dir: String): DataFrame = {
    val em = t(spark, dir, "embeddings")
    val v256 = flatten(array((0 until 4).map(c =>
      transform(col("embedding"), x => x * lit(1.0f + c * 0.25f))): _*))
    graft.operators.Pca.projectTop(
      em.select(col("vec_id"), v256.as("e256")), "vec_id", "e256", PcaIters)
      .orderBy("vec_id")
  }

  val q201Sql: String = pcaProjectSql(
    """WITH mv AS MATERIALIZED (
      |  SELECT vec_id, list_transform(flatten([
      |      list_transform(embedding, x -> x * CAST(1.0 AS FLOAT)),
      |      list_transform(embedding, x -> x * CAST(1.25 AS FLOAT)),
      |      list_transform(embedding, x -> x * CAST(1.5 AS FLOAT)),
      |      list_transform(embedding, x -> x * CAST(1.75 AS FLOAT))]),
      |    x -> CAST(round((x::DOUBLE) * 1000000.0, 0) AS BIGINT)) AS v
      |  FROM embeddings),
      |""".stripMargin)

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q183_pca_project" -> q183PcaProject _,
    "q201_pca_project_d256" -> q201PcaProjectD256 _,
    "q129_kmeans" -> q129KMeans _,
    "q131_ivf_trained" -> q131IvfTrained _,
    "q40_ann_brute_topk" -> q40BruteForceTopK _,
    "q41_ann_lsh_topk" -> q41LshTopK _,
    "q42_embed_near_dups" -> q42EmbeddingNearDups _,
    "q43_ann_multitable" -> q43LshMultiTable _,
    "q44_ann_ivf" -> q44AnnIvf _,
    "q49_embed_clusters" -> q49EmbeddingClusters _,
    "q59_drop_semantic_dups" -> q59DropSemanticDups _,
    "q107_ann_int8" -> q107Int8TopK _,
    "q108_ann_int8_refine" -> q108Int8Refine _,
    "q109_ann_ivf_sq8" -> q109IvfSq8 _,
    "q111_ann_pq_adc" -> q111AnnPqAdc _,
    "q112_ann_ivf_pq" -> q112AnnIvfPq _,
    "q178_ann_pq_trained" -> q178AnnPqTrained _,
    "q114_semdedup" -> q114SemDeDup _,
    "q119_dense_index" -> q119DenseIndex _)

  val oracles: Map[String, String] = Map(
    "q129_kmeans" -> q129Sql,
    "q131_ivf_trained" -> q131Sql,
    "q40_ann_brute_topk" -> q40Sql,
    "q41_ann_lsh_topk" -> q41Sql,
    "q42_embed_near_dups" -> q42Sql,
    "q43_ann_multitable" -> q43Sql,
    "q44_ann_ivf" -> q44Sql,
    "q49_embed_clusters" -> q49Sql,
    "q59_drop_semantic_dups" -> q59Sql,
    "q107_ann_int8" -> q107Sql,
    "q108_ann_int8_refine" -> q108Sql,
    "q109_ann_ivf_sq8" -> q109Sql,
    "q111_ann_pq_adc" -> q111Sql,
    "q112_ann_ivf_pq" -> q112Sql,
    "q178_ann_pq_trained" -> q178Sql,
    "q183_pca_project" -> q183Sql,
    "q201_pca_project_d256" -> q201Sql,
    "q114_semdedup" -> q114Sql,
    "q119_dense_index" -> q109Sql) // identical semantics by construction
}

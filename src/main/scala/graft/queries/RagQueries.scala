package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.rag.{Chunker, SparseIndex, TfIdf}
import Tables.{t, tp}

/** RAG subsystem queries: pairwise TF-IDF cosine (the reference's Rust
  * grounding kernel), sparse-index top-k search, hybrid RRF fusion of a
  * lexical and a minhash-band ranking, and token-window chunking.
  */
object RagQueries {

  /** Shared SQL: lowercase whitespace tokens of column `c`. */
  private def toksSql(c: String) =
    s"list_filter(regexp_split_to_array(trim(lower($c)), '\\s+'), x -> x <> '')"

  // --- pairwise tf-idf cosine ------------------------------------------

  def q60TfidfPair(spark: SparkSession, dir: String): DataFrame = {
    val d = tp(spark, dir, "documents")
    val a = d.filter(col("doc_id") < 50)
      .select(col("doc_id").as("id_a"), col("text").as("ta"))
    val b = d.select((col("doc_id") - 1).as("id_a"),
      col("doc_id").as("id_b"), col("text").as("tb"))
    a.join(b, "id_a")
      .withColumn("sim", TfIdf.tfidfCosine2(col("ta"), col("tb")))
      .select(col("id_a"), col("id_b"), col("sim"))
      .orderBy("id_a")
  }

  val q60Sql: String = {
    // order-preserving distinct + Spark array_union semantics
    val dta = s"[ta[i] for i in range(1, len(ta)+1) if list_position(ta, ta[i]) = i]"
    val dtb = s"[tb[i] for i in range(1, len(tb)+1) if list_position(tb, tb[i]) = i]"
    s"""WITH pairs AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |    ${toksSql("a.text")} AS ta, ${toksSql("b.text")} AS tb
       |  FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
       |  WHERE a.doc_id < 50),
       |voc AS (
       |  SELECT id_a, id_b, ta, tb,
       |    ($dta) || [x for x in ($dtb) if NOT list_contains(($dta), x)] AS vocab
       |  FROM pairs),
       |wts AS (
       |  SELECT id_a, id_b,
       |    [len(list_filter(ta, y -> y = t))::DOUBLE / greatest(len(ta), 1) *
       |     (CASE WHEN list_contains(ta, t) AND list_contains(tb, t)
       |           THEN ln(2.0/3.0) + 1.0 ELSE ln(2.0/2.0) + 1.0 END)
       |     for t in vocab] AS wa,
       |    [len(list_filter(tb, y -> y = t))::DOUBLE / greatest(len(tb), 1) *
       |     (CASE WHEN list_contains(ta, t) AND list_contains(tb, t)
       |           THEN ln(2.0/3.0) + 1.0 ELSE ln(2.0/2.0) + 1.0 END)
       |     for t in vocab] AS wb
       |  FROM voc)
       |SELECT id_a, id_b,
       |  CASE WHEN sqrt(list_sum(list_transform(wa, x -> x*x))) *
       |            sqrt(list_sum(list_transform(wb, x -> x*x))) = 0 THEN 0.0
       |  ELSE round(
       |    list_sum(list_transform(list_zip(wa, wb), x -> x[1]*x[2])) /
       |    (sqrt(list_sum(list_transform(wa, x -> x*x))) *
       |     sqrt(list_sum(list_transform(wb, x -> x*x)))), 6) END AS sim
       |FROM wts ORDER BY id_a""".stripMargin
  }

  // --- sparse-index search ---------------------------------------------

  def q61SparseSearch(spark: SparkSession, dir: String): DataFrame = {
    val docs = tp(spark, dir, "documents")
    val idx = SparseIndex.build(docs, "doc_id", "text")
    val queries = docs.filter(col("doc_id") < 5)
      .select(col("doc_id").as("qid"), col("text"))
    SparseIndex.search(idx, queries, "qid", "text", 5)
      .orderBy("query_id", "rank")
  }

  /** Shared CTE chain: sparse index + ranked self-search (reused by q62). */
  private val sparseCtes: String = {
    val n = "(SELECT count(*) FROM documents)"
    s"""tok AS (
       |  SELECT doc_id AS id, unnest(${toksSql("text")}) AS term FROM documents),
       |postings0 AS (
       |  SELECT id, term, count(*) AS cnt FROM tok GROUP BY id, term),
       |doclen AS (SELECT id, sum(cnt) AS len FROM postings0 GROUP BY id),
       |dfreq AS (SELECT term, count(DISTINCT id) AS df FROM postings0 GROUP BY term),
       |postings AS (
       |  SELECT p.id, p.term,
       |    CAST(round((p.cnt::DOUBLE / l.len) *
       |      (ln(($n + 1)::DOUBLE / (d.df + 1)) + 1.0), 12) AS DECIMAL(18,12)) AS w
       |  FROM postings0 p JOIN doclen l ON p.id = l.id
       |                   JOIN dfreq d ON p.term = d.term),
       |norms AS (
       |  SELECT id, sqrt(CAST(sum(CAST(w*w AS DECIMAL(38,24))) AS DOUBLE)) AS norm
       |  FROM postings GROUP BY id),
       |qtok AS (
       |  SELECT doc_id AS query_id, unnest(${toksSql("text")}) AS term
       |  FROM documents WHERE doc_id < 5),
       |qpost0 AS (
       |  SELECT query_id, term, count(*) AS cnt FROM qtok GROUP BY query_id, term),
       |qlen AS (SELECT query_id, sum(cnt) AS qlen FROM qpost0 GROUP BY query_id),
       |qpost AS (
       |  SELECT q.query_id, q.term,
       |    CAST(round((q.cnt::DOUBLE / l.qlen) *
       |      (ln(($n + 1)::DOUBLE / (coalesce(d.df, 0) + 1)) + 1.0), 12) AS DECIMAL(18,12)) AS w_q
       |  FROM qpost0 q JOIN qlen l ON q.query_id = l.query_id
       |                LEFT JOIN dfreq d ON q.term = d.term),
       |qnorm AS (
       |  SELECT query_id,
       |    sqrt(CAST(sum(CAST(w_q*w_q AS DECIMAL(38,24))) AS DOUBLE)) AS qnorm
       |  FROM qpost GROUP BY query_id),
       |dots AS (
       |  SELECT q.query_id, p.id, sum(CAST(q.w_q * p.w AS DECIMAL(38,24))) AS dot
       |  FROM qpost q JOIN postings p ON q.term = p.term
       |  GROUP BY q.query_id, p.id),
       |scored AS (
       |  SELECT d.query_id, d.id,
       |    round(CAST(d.dot AS DOUBLE) / (n2.norm * qn.qnorm), 6) AS score
       |  FROM dots d JOIN norms n2 ON d.id = n2.id
       |              JOIN qnorm qn ON d.query_id = qn.query_id),
       |ranked AS (
       |  SELECT query_id, id, score,
       |    ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY score DESC, id) AS rank
       |  FROM scored)""".stripMargin
  }

  val q61Sql: String =
    s"""WITH $sparseCtes
       |SELECT query_id, rank, id, score FROM ranked WHERE rank <= 5
       |ORDER BY query_id, rank""".stripMargin

  // --- hybrid search: lexical + minhash-band agreement, RRF-fused ------

  def q62HybridRrf(spark: SparkSession, dir: String): DataFrame = {
    val docs = tp(spark, dir, "documents")
    val queries = docs.filter(col("doc_id") < 5)
    val idx = SparseIndex.build(docs, "doc_id", "text")
    val lexical = SparseIndex.search(idx,
      queries.select(col("doc_id").as("qid"), col("text")), "qid", "text", 20)

    // ranking B: number of agreeing minhash bands (8 bands, 3-shingles).
    // Candidates come from a bucket JOIN on (band_idx, band_val) — only
    // docs sharing at least one band with a query are scored, so the work
    // is proportional to bucket collisions, not |Q| x |docs|. The query
    // side computes its signatures from just the query docs (minhash is
    // per-doc), so the full-corpus pass happens exactly once, on the
    // probe side; the tiny query side broadcasts.
    def bandRows(d: org.apache.spark.sql.DataFrame) = graft.operators.Dedup
      .minhashSignatures(d, "doc_id", "text", 8, 3)
      .select(col("doc_id").as("id"),
        posexplode(array((0 until 8).map(b => col(s"band_$b")): _*))
          .as(Seq("band_idx", "band_val")))
    val exploded = bandRows(docs)
    val qbands = bandRows(docs.filter(col("doc_id") < 5))
      .select(col("id").as("query_id"), col("band_idx"), col("band_val"))
    val wb = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("band_score").desc, col("id"))
    val bandRank = broadcast(qbands)
      .join(exploded, Seq("band_idx", "band_val"))
      .groupBy(col("query_id"), col("id"))
      .agg(count(lit(1)).as("band_score"))
      .withColumn("rank", row_number().over(wb))
      .filter(col("rank") <= 20)
      .select(col("query_id"), col("id"), col("rank"))

    SparseIndex.rrfFuse(lexical, bandRank, k = 5)
      .orderBy("query_id", "rank")
  }

  val q62Sql: String = {
    val shingleCte = OracleCtes.shingleCtes(3, toksAlias = "toksq",
      shAlias = "shq")
    val bandMins = OracleCtes.bandMinExprs(8)
    // unpivot the 8 band columns to (id, band_idx, band_val) rows —
    // mirrors the Spark side's posexplode + bucket join
    val bandUnion = OracleCtes.bandUnpivot(8)
    s"""WITH $sparseCtes,
       |lex AS (SELECT query_id, id, rank FROM ranked WHERE rank <= 20),
       |$shingleCte,
       |bands AS (
       |  SELECT doc_id, $bandMins
       |  FROM (SELECT doc_id, unnest(shingles) AS s FROM shq) GROUP BY doc_id),
       |bexp AS (
       |  $bandUnion),
       |bscore AS (
       |  SELECT q.id AS query_id, e.id, count(*) AS band_score
       |  FROM bexp q JOIN bexp e
       |    ON q.band_idx = e.band_idx AND q.band_val = e.band_val
       |  WHERE q.id < 5
       |  GROUP BY 1, 2),
       |bandranked AS (
       |  SELECT query_id, id,
       |    ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY band_score DESC, id) AS rank
       |  FROM bscore),
       |bnd AS (SELECT query_id, id, rank FROM bandranked WHERE rank <= 20),
       |fused AS (
       |  SELECT coalesce(l.query_id, b.query_id) AS query_id,
       |    coalesce(l.id, b.id) AS id,
       |    round(coalesce(1.0 / (60 + l.rank), 0.0) +
       |          coalesce(1.0 / (60 + b.rank), 0.0), 9) AS rrf
       |  FROM lex l FULL OUTER JOIN bnd b
       |    ON l.query_id = b.query_id AND l.id = b.id),
       |frank AS (
       |  SELECT query_id, id, rrf,
       |    ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY rrf DESC, id) AS rank
       |  FROM fused)
       |SELECT query_id, rank, id, rrf FROM frank WHERE rank <= 5
       |ORDER BY query_id, rank""".stripMargin
  }

  // --- cross-feature rerank --------------------------------------------

  /** Rerank the sparse retriever's top-20 shortlist with the pairwise
    * cross-feature scorer (coverage + ordered-bigram + proximity). The
    * scorer sees phrase order and match position — signals the
    * bag-of-words retriever is blind to — so the top-5 ORDER genuinely
    * changes vs q61 (RagSpec asserts it); the oracle recomputes every
    * feature in SQL. */
  def q64Rerank(spark: SparkSession, dir: String): DataFrame = {
    val docs = tp(spark, dir, "documents")
    val idx = SparseIndex.build(docs, "doc_id", "text")
    val queries = docs.filter(col("doc_id") < 5)
      .select(col("doc_id").as("query_id"), col("text").as("qtext"))
    val shortlist = SparseIndex.search(idx,
      queries.select(col("query_id").as("qid"), col("qtext").as("text")),
      "qid", "text", 20)
      .select(col("query_id"), col("id"))
    graft.rag.Reranker.rerank(shortlist,
      docs.select(col("doc_id").as("id"), col("text")), queries, k = 5)
      .orderBy("query_id", "rank")
  }

  val q64Sql: String = {
    def toksLower(c: String) =
      s"list_filter(regexp_split_to_array(trim(lower($c)), '\\s+'), x -> x <> '')"
    s"""WITH $sparseCtes,
       |cand AS (SELECT query_id, id FROM ranked WHERE rank <= 20),
       |prs AS (
       |  SELECT c.query_id, c.id,
       |    ${toksLower("qd.text")} AS qt, ${toksLower("dd.text")} AS dt
       |  FROM cand c JOIN documents qd ON qd.doc_id = c.query_id
       |              JOIN documents dd ON dd.doc_id = c.id),
       |feat AS (
       |  SELECT query_id, id, dt,
       |    list_distinct(qt) AS qdt, list_distinct(dt) AS ddt,
       |    list_distinct([qt[i] || ' ' || qt[i+1]
       |      for i in range(1, len(qt))]) AS qb,
       |    list_distinct([dt[i] || ' ' || dt[i+1]
       |      for i in range(1, len(dt))]) AS db
       |  FROM prs),
       |fs AS (
       |  SELECT query_id, id,
       |    len(list_intersect(qdt, ddt))::DOUBLE / greatest(len(qdt), 1)
       |      AS coverage,
       |    len(list_intersect(qb, db))::DOUBLE / greatest(len(qb), 1)
       |      AS bigram,
       |    list_min([list_position(dt, t) for t in qdt
       |      if list_position(dt, t) > 0]) AS fp
       |  FROM feat),
       |rscored AS (
       |  SELECT query_id, id,
       |    round(coverage * 0.5 + bigram * 0.3 +
       |      (CASE WHEN fp IS NULL THEN 0.0 ELSE 1.0 / fp END) * 0.2, 6)
       |      AS rerank_score
       |  FROM fs),
       |rr AS (
       |  SELECT query_id, id, rerank_score,
       |    ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY rerank_score DESC, id) AS rank
       |  FROM rscored)
       |SELECT query_id, rank, id, rerank_score FROM rr WHERE rank <= 5
       |ORDER BY query_id, rank""".stripMargin
  }

  // --- chunking ---------------------------------------------------------

  def q63Chunks(spark: SparkSession, dir: String): DataFrame =
    Chunker.chunkCorpus(
      tp(spark, dir, "documents").filter(col("doc_id") < 20),
      "doc_id", "text", size = 50, overlap = 10)
      .orderBy("doc_id", "chunk_idx")

  val q63Sql: String =
    """WITH toks AS (
      |  SELECT doc_id,
      |    list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '') AS w
      |  FROM documents WHERE doc_id < 20),
      |wins AS (
      |  SELECT doc_id,
      |    CASE WHEN len(w) = 0 THEN []::VARCHAR[]
      |    ELSE [array_to_string(w[(i-1)*40+1 : (i-1)*40+50], ' ')
      |          for i in range(1, greatest((len(w) - 10 + 39) // 40, 1) + 1)]
      |    END AS chunks
      |  FROM toks)
      |SELECT doc_id,
      |  generate_subscripts(chunks, 1) - 1 AS chunk_idx,
      |  unnest(chunks) AS chunk
      |FROM wins ORDER BY doc_id, chunk_idx""".stripMargin

  /** Exact phrase search over a positional inverted index: the postings
    * relation (term, doc, pos), then "table value" resolved as one
    * adjacency equi-join on (doc, shifted start). The oracle replays
    * matches positionally from the raw text — the index build, the
    * offset arithmetic, and the per-doc rollup all have to agree
    * (first_pos included, 0-based both sides). */
  def q135PhraseSearch(spark: SparkSession, dir: String): DataFrame = {
    import graft.rag.PhraseIndex
    val idx = PhraseIndex.build(tp(spark, dir, "documents"), "doc_id", "text")
    PhraseIndex.phraseSearch(idx, "table value")
      .select(col("doc").as("doc_id"), col("n_matches"), col("first_pos"))
      .orderBy("doc_id")
  }

  val q135Sql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, ${toksSql("text")} AS w FROM documents),
       |m AS (
       |  SELECT doc_id,
       |    [i for i in range(1, len(w))
       |      if w[i] = 'table' AND w[i + 1] = 'value'] AS hits
       |  FROM toks)
       |SELECT doc_id, len(hits)::BIGINT AS n_matches,
       |  (hits[1] - 1)::BIGINT AS first_pos
       |FROM m WHERE len(hits) > 0 ORDER BY doc_id""".stripMargin

  /** Okapi BM25 top-10 for three fixed query strings — the
    * Lucene-default lexical ranking beside the TF-IDF cosine (q61) and
    * exact phrase (q135) paths. Scores follow the micro-integer
    * determinism discipline, so the oracle replays idf, the saturated
    * tf term, and the length normalization to the exact micro. */
  def q137Bm25(spark: SparkSession, dir: String): DataFrame = {
    import graft.rag.Bm25
    val idx = Bm25.build(tp(spark, dir, "documents"), "doc_id", "text")
    val qs = spark.createDataFrame(Seq(
      (1L, "table value part"), (2L, "stream window agg"),
      (3L, "customer merge join"))).toDF("query_id", "qtext")
    Bm25.search(idx, qs, "query_id", "qtext", k = 10)
      .orderBy("query_id", "rank")
  }

  val q137Sql: String =
    s"""WITH q(query_id, qtext) AS (VALUES
       |    (1, 'table value part'), (2, 'stream window agg'),
       |    (3, 'customer merge join')),
       |toks AS (SELECT doc_id AS doc, ${toksSql("text")} AS w FROM documents),
       |lens AS (SELECT doc, len(w)::BIGINT AS dl FROM toks),
       |tfq AS (
       |  SELECT term, doc, count(*)::BIGINT AS tf
       |  FROM (SELECT doc, unnest(w) AS term FROM toks) GROUP BY 1, 2),
       |dft AS (SELECT term, count(*)::BIGINT AS df FROM tfq GROUP BY 1),
       |tot AS (SELECT count(*)::BIGINT AS n, sum(dl)::BIGINT AS s FROM lens),
       |qt AS (
       |  SELECT DISTINCT query_id, unnest(${toksSql("qtext")}) AS term FROM q),
       |terms AS (
       |  SELECT qt.query_id, tfq.doc,
       |    CAST(round(
       |      ln((tot.n::DOUBLE - dft.df + 0.5) / (dft.df + 0.5) + 1.0)
       |      * (tfq.tf::DOUBLE * 2.2)
       |      / (tfq.tf::DOUBLE + 1.2 * (0.25
       |          + 0.75 * (lens.dl::DOUBLE * tot.n::DOUBLE) / tot.s::DOUBLE))
       |      * 1000000.0, 0) AS BIGINT) AS m
       |  FROM qt JOIN tfq USING (term) JOIN dft USING (term)
       |  JOIN lens ON lens.doc = tfq.doc CROSS JOIN tot),
       |sc AS (SELECT query_id, doc, sum(m)::BIGINT AS s FROM terms GROUP BY 1, 2),
       |rk AS (
       |  SELECT query_id, doc, s,
       |    row_number() OVER (PARTITION BY query_id ORDER BY s DESC, doc) AS rank
       |  FROM sc)
       |SELECT CAST(query_id AS BIGINT) AS query_id, rank, doc AS doc_id,
       |  round(s::DOUBLE / 1000000.0, 6) AS score
       |FROM rk WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q137_bm25" -> q137Bm25 _,
    "q135_phrase_search" -> q135PhraseSearch _,
    "q60_tfidf_pair" -> q60TfidfPair _,
    "q61_sparse_search" -> q61SparseSearch _,
    "q62_hybrid_rrf" -> q62HybridRrf _,
    "q63_chunks" -> q63Chunks _,
    "q64_rerank" -> q64Rerank _)

  val oracles: Map[String, String] = Map(
    "q137_bm25" -> q137Sql,
    "q135_phrase_search" -> q135Sql,
    "q60_tfidf_pair" -> q60Sql,
    "q61_sparse_search" -> q61Sql,
    "q62_hybrid_rrf" -> q62Sql,
    "q63_chunks" -> q63Sql,
    "q64_rerank" -> q64Sql)
}

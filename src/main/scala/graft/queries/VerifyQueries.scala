package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.tokens
import graft.verify.ContextVerification
import Tables.{t, tp}

/** Anti-hallucination queries: grounding scores + confidence formulas over
  * a synthetic extractive "response" (first 20 tokens of each doc — a
  * deterministic stand-in for a model answer), and contradiction detection
  * over grouped keys (exact and numeric-tolerance variants).
  */
object VerifyQueries {

  def q70Grounding(spark: SparkSession, dir: String): DataFrame = {
    val docs = tp(spark, dir, "documents").filter(col("doc_id") < 100)
    val withResp = docs.withColumn("resp",
      concat_ws(" ", slice(tokens(col("text")), 1, 20)))
    val scored = withResp.withColumn("gs",
      ContextVerification.groundingScore(col("resp"), col("text")))
    scored.select(
      col("doc_id"),
      col("gs"),
      ContextVerification.sigmoidConfidence(col("gs")).as("conf_sigmoid"),
      ContextVerification.defaultConfidence(col("gs"), col("doc_id") % 7)
        .as("conf_default"),
      (col("gs") >= 0.5).as("grounded"))
      .orderBy("doc_id")
  }

  val q70Sql: String = {
    val toks = "list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'), x -> x <> '')"
    val dta = "[ta[i] for i in range(1, len(ta)+1) if list_position(ta, ta[i]) = i]"
    val dtb = "[tb[i] for i in range(1, len(tb)+1) if list_position(tb, tb[i]) = i]"
    s"""WITH base AS (
       |  SELECT doc_id, ($toks)[1:20] AS ta, $toks AS tb
       |  FROM documents WHERE doc_id < 100),
       |voc AS (
       |  SELECT doc_id, ta, tb,
       |    ($dta) || [x for x in ($dtb) if NOT list_contains(($dta), x)] AS vocab
       |  FROM base),
       |wts AS (
       |  SELECT doc_id,
       |    [len(list_filter(ta, y -> y = t))::DOUBLE / greatest(len(ta), 1) *
       |     (CASE WHEN list_contains(ta, t) AND list_contains(tb, t)
       |           THEN ln(2.0/3.0) + 1.0 ELSE 1.0 END) for t in vocab] AS wa,
       |    [len(list_filter(tb, y -> y = t))::DOUBLE / greatest(len(tb), 1) *
       |     (CASE WHEN list_contains(ta, t) AND list_contains(tb, t)
       |           THEN ln(2.0/3.0) + 1.0 ELSE 1.0 END) for t in vocab] AS wb
       |  FROM voc),
       |gsc AS (
       |  SELECT doc_id,
       |    CASE WHEN sqrt(list_sum(list_transform(wa, x -> x*x))) *
       |              sqrt(list_sum(list_transform(wb, x -> x*x))) = 0 THEN 0.0
       |    ELSE round(
       |      list_sum(list_transform(list_zip(wa, wb), x -> x[1]*x[2])) /
       |      (sqrt(list_sum(list_transform(wa, x -> x*x))) *
       |       sqrt(list_sum(list_transform(wb, x -> x*x)))), 6) END AS gs
       |  FROM wts)
       |SELECT doc_id, gs,
       |  round(1.0 / (1.0 + exp(-10.0 * (gs - 0.3))), 6) AS conf_sigmoid,
       |  round(gs * 0.7 + least(doc_id % 7, 5)::DOUBLE / 5.0 * 0.3, 6) AS conf_default,
       |  gs >= 0.5 AS grounded
       |FROM gsc ORDER BY doc_id""".stripMargin
  }

  /** Exact-value contradictions: customers whose orders carry conflicting
    * order statuses. */
  def q71Contradictions(spark: SparkSession, dir: String): DataFrame = {
    val orders = t(spark, dir, "orders")
    ContextVerification.withContradictions(orders, Seq("o_custkey"),
      "o_orderstatus", numericTolerance = None)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"),
        max(col("_contradiction")).as("contradiction"))
      .orderBy("o_custkey")
  }

  val q71Sql: String =
    """SELECT o_custkey, COUNT(*) AS n_orders,
      |  (COUNT(DISTINCT o_orderstatus) > 1) AS contradiction
      |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin

  /** Numeric-tolerance contradictions: users whose event values spread
    * beyond 50.0 within an event type. */
  def q72NumericContradictions(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    ContextVerification.withContradictions(ev,
      Seq("user_id", "event_type"), "value", numericTolerance = Some(50.0))
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        max(col("_contradiction")).as("contradiction"))
      .orderBy("user_id", "event_type")
  }

  val q72Sql: String =
    """SELECT user_id, event_type, COUNT(*) AS n,
      |  (max(value) - min(value) > 50.0) AS contradiction
      |FROM events GROUP BY user_id, event_type
      |ORDER BY user_id, event_type""".stripMargin

  /** Evidence-retrieval stage end-to-end: rows from the documents table
    * retrieve top-2 claims (docs 0-19) by TF-IDF cosine with a min-score
    * cutoff; `_evidence_context`/`_evidence_count` land as system columns
    * ([score=X.XX] attribution, \n---\n separators) and the block is
    * APPENDED to the prompt after the reference's "Previously validated
    * answers…" preamble, so the md5 verdict proves the exact retrieved
    * texts, their order, and the assembly format. */
  def q73EvidenceEnrich(spark: SparkSession, dir: String): DataFrame = {
    import graft.core._
    val docs = tp(spark, dir, "documents")
    val claims = docs.filter(col("doc_id") < 20)
      .select(col("doc_id").as("claim_id"), col("text"))
    val queries = docs.filter(col("doc_id") >= 100 && col("doc_id") < 120)
      .select(col("doc_id"), col("text"))
    val spec = PipelineSpec(
      dataset = DatasetSpec(Seq("text")),
      prompt = PromptSpec("Verify: {text}"),
      output = OutputSpec(Seq("verdict")),
      evidence = Some(EvidenceSpec(idCol = "claim_id", textCol = "text",
        topK = 2, minScore = 0.01)))
    val r = new graft.run.Enricher(spec, new graft.llm.MockLlmClient(),
      keyColumn = Some("doc_id"), evidenceCorpus = Some(claims))
      .enrich(queries)
    r.data.select(col("doc_id"), col("_evidence_context"),
      col("_evidence_count"), col("verdict"))
      .orderBy("doc_id")
  }

  val q73Sql: String = {
    val toks = (c: String) =>
      s"list_filter(regexp_split_to_array(trim(lower($c)), '\\s+'), x -> x <> '')"
    val nClaims = "(SELECT count(*) FROM claims)"
    s"""WITH claims AS (
       |  SELECT doc_id AS id, text FROM documents WHERE doc_id < 20),
       |ctok AS (SELECT id, unnest(${toks("text")}) AS term FROM claims),
       |cp0 AS (SELECT id, term, count(*) AS cnt FROM ctok GROUP BY id, term),
       |clen AS (SELECT id, sum(cnt) AS len FROM cp0 GROUP BY id),
       |cdf AS (SELECT term, count(DISTINCT id) AS df FROM cp0 GROUP BY term),
       |cpost AS (
       |  SELECT p.id, p.term,
       |    CAST(round((p.cnt::DOUBLE / l.len) *
       |      (ln(($nClaims + 1)::DOUBLE / (d.df + 1)) + 1.0), 12) AS DECIMAL(18,12)) AS w
       |  FROM cp0 p JOIN clen l ON p.id = l.id JOIN cdf d ON p.term = d.term),
       |cnorm AS (
       |  SELECT id, sqrt(CAST(sum(CAST(w*w AS DECIMAL(38,24))) AS DOUBLE)) AS norm
       |  FROM cpost GROUP BY id),
       |q AS (
       |  SELECT doc_id AS query_id, 'Verify: ' || COALESCE(text,'') AS qtext
       |  FROM documents WHERE doc_id >= 100 AND doc_id < 120),
       |qtok AS (SELECT query_id, unnest(${toks("qtext")}) AS term FROM q),
       |qp0 AS (SELECT query_id, term, count(*) AS cnt FROM qtok GROUP BY query_id, term),
       |qlen AS (SELECT query_id, sum(cnt) AS qlen FROM qp0 GROUP BY query_id),
       |qpost AS (
       |  SELECT p.query_id, p.term,
       |    CAST(round((p.cnt::DOUBLE / l.qlen) *
       |      (ln(($nClaims + 1)::DOUBLE / (coalesce(d.df, 0) + 1)) + 1.0), 12) AS DECIMAL(18,12)) AS w_q
       |  FROM qp0 p JOIN qlen l ON p.query_id = l.query_id
       |             LEFT JOIN cdf d ON p.term = d.term),
       |qnorm AS (
       |  SELECT query_id, sqrt(CAST(sum(CAST(w_q*w_q AS DECIMAL(38,24))) AS DOUBLE)) AS qnorm
       |  FROM qpost GROUP BY query_id),
       |dots AS (
       |  SELECT qp.query_id, cp.id, sum(CAST(qp.w_q * cp.w AS DECIMAL(38,24))) AS dot
       |  FROM qpost qp JOIN cpost cp ON qp.term = cp.term GROUP BY 1, 2),
       |scored AS (
       |  SELECT d.query_id, d.id,
       |    round(CAST(d.dot AS DOUBLE) / (n2.norm * qn.qnorm), 6) AS score
       |  FROM dots d JOIN cnorm n2 ON d.id = n2.id
       |              JOIN qnorm qn ON d.query_id = qn.query_id),
       |ranked AS (
       |  SELECT query_id, id, score,
       |    ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY score DESC, id) AS rank
       |  FROM scored),
       |hits AS (SELECT * FROM ranked WHERE rank <= 2 AND score >= 0.01),
       |ctx AS (
       |  SELECT h.query_id,
       |    string_agg(
       |      printf('[score=%d.%02d] %s',
       |        CAST(round(h.score*100) AS BIGINT) // 100,
       |        CAST(round(h.score*100) AS BIGINT) % 100,
       |        c.text),
       |      chr(10)||'---'||chr(10) ORDER BY h.rank) AS ectx,
       |    count(*) AS ecount
       |  FROM hits h JOIN claims c ON h.id = c.id GROUP BY h.query_id)
       |SELECT q.query_id AS doc_id,
       |  coalesce(ctx.ectx, '') AS _evidence_context,
       |  CAST(coalesce(ctx.ecount, 0) AS BIGINT) AS _evidence_count,
       |  md5(CASE WHEN coalesce(ctx.ectx, '') <> ''
       |    THEN q.qtext || chr(10) || chr(10) ||
       |      'Previously validated answers for similar inputs ' ||
       |      '(use as reference, not as ground truth):' || chr(10) || ctx.ectx
       |    ELSE q.qtext END) AS verdict
       |FROM q LEFT JOIN ctx ON q.query_id = ctx.query_id
       |ORDER BY doc_id""".stripMargin
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q70_grounding_confidence" -> q70Grounding _,
    "q71_contradictions_exact" -> q71Contradictions _,
    "q72_contradictions_numeric" -> q72NumericContradictions _,
    "q73_evidence_enrich" -> q73EvidenceEnrich _)

  val oracles: Map[String, String] = Map(
    "q70_grounding_confidence" -> q70Sql,
    "q71_contradictions_exact" -> q71Sql,
    "q72_contradictions_numeric" -> q72Sql,
    "q73_evidence_enrich" -> q73Sql)
}

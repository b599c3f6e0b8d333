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

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q70_grounding_confidence" -> q70Grounding _,
    "q71_contradictions_exact" -> q71Contradictions _,
    "q72_contradictions_numeric" -> q72NumericContradictions _)

  val oracles: Map[String, String] = Map(
    "q70_grounding_confidence" -> q70Sql,
    "q71_contradictions_exact" -> q71Sql,
    "q72_contradictions_numeric" -> q72Sql)
}

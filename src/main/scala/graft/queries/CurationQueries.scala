package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.CurationFunctions._
import graft.functions.TextFunctions.tokens
import Tables.tp

/** Corpus-curation queries over the documents table — the Gopher/C4
  * repetition-filter family and PII scrubbing, the two curation stages a
  * pretraining pipeline runs before spending model FLOPs on a document.
  *
  * All three queries are pure per-row maps (single codegen stage, no
  * shuffle, no UDF): at 100 TB they run at scan throughput and the
  * emitted signals compose with predicate pushdown when used as filters.
  * Oracles reproduce the identical integer/IEEE arithmetic in DuckDB.
  */
object CurationQueries {

  // --- q65: within-document repetition signals (Gopher §A1.1) -----------

  def q65Repetition(spark: SparkSession, dir: String): DataFrame = {
    // staged through Parallelism.barrier so each array is computed ONCE:
    // projection collapse otherwise re-inlines the tokens subtree into
    // every signal column and the bigram subtree into both its consumers
    // (took q65 from ~28 s to ~3.5 s at the 10x point)
    def barrier(df: org.apache.spark.sql.DataFrame) =
      graft.ops.Parallelism.barrier(df)
    val toks = barrier(tp(spark, dir, "documents").select(
      col("doc_id"), length(col("text")).as("tlen"),
      tokens(col("text")).as("w")))
    val grams = barrier(toks.select(col("doc_id"), col("tlen"), col("w"),
      wordBigrams(col("w")).as("b2"), wordTrigrams(col("w")).as("b3")))
    grams.select(
      col("doc_id"),
      size(col("w")).as("n_words"),
      round(dupFrac(col("w")), 6).as("dup_word_frac"),
      topCount(col("w")).as("top_word_count"),
      round(dupFrac(col("b2")), 6).as("dup_bigram_frac"),
      round(dupFrac(col("b3")), 6).as("dup_trigram_frac"),
      round(topCoverage(col("b2")).cast("double") / col("tlen"), 6)
        .as("top2_char_frac"))
      .orderBy("doc_id")
  }

  val q65Sql: String =
    """WITH toks AS (
      |  SELECT doc_id, text,
      |    list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '') AS w
      |  FROM documents),
      |grams AS (
      |  SELECT doc_id, text, w,
      |    CASE WHEN len(w) < 2 THEN []::VARCHAR[]
      |      ELSE list_transform(generate_series(1, len(w) - 1),
      |             i -> w[i] || ' ' || w[i + 1]) END AS b2,
      |    CASE WHEN len(w) < 3 THEN []::VARCHAR[]
      |      ELSE list_transform(generate_series(1, len(w) - 2),
      |             i -> w[i] || ' ' || w[i + 1] || ' ' || w[i + 2]) END AS b3
      |  FROM toks)
      |SELECT doc_id, len(w) AS n_words,
      |  round(CASE WHEN len(w) = 0 THEN 0
      |    ELSE (len(w) - len(list_distinct(w)))::DOUBLE / len(w) END, 6) AS dup_word_frac,
      |  CASE WHEN len(w) = 0 THEN 0
      |    ELSE list_max(list_transform(list_distinct(w),
      |           d -> len(list_filter(w, x -> x = d)))) END AS top_word_count,
      |  round(CASE WHEN len(b2) = 0 THEN 0
      |    ELSE (len(b2) - len(list_distinct(b2)))::DOUBLE / len(b2) END, 6) AS dup_bigram_frac,
      |  round(CASE WHEN len(b3) = 0 THEN 0
      |    ELSE (len(b3) - len(list_distinct(b3)))::DOUBLE / len(b3) END, 6) AS dup_trigram_frac,
      |  round((CASE WHEN len(b2) = 0 THEN 0
      |    ELSE list_max(list_transform(list_distinct(b2),
      |           d -> len(list_filter(b2, x -> x = d)) * length(d))) END)::DOUBLE
      |    / length(text), 6) AS top2_char_frac
      |FROM grams ORDER BY doc_id""".stripMargin

  // --- q66: PII detect + redact ------------------------------------------

  /** The corpus carries no natural PII, so the query synthesizes it
    * deterministically per row (same construction in the oracle) — the
    * detection/redaction arithmetic is what's under test, exactly like
    * the multimodal queries synthesize their PNG fixtures in-query. */
  private def augmented: org.apache.spark.sql.Column =
    concat(col("text"),
      when(col("doc_id") % 2 === 0,
        concat(lit(" contact u"), col("doc_id"), lit("@ex"),
          col("doc_id") % 7,
          when(col("doc_id") % 4 === 0, lit(".ORG")).otherwise(lit(".org"))))
        .otherwise(""),
      when(col("doc_id") % 3 === 0,
        concat(lit(" call 555-"),
          lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
        .otherwise(""),
      lit(" ip 10.0."), col("doc_id") % 250, lit("."),
      (col("doc_id") * 7) % 250)

  def q66PiiScrub(spark: SparkSession, dir: String): DataFrame = {
    val aug = augmented
    tp(spark, dir, "documents").select(
      col("doc_id"),
      piiCount(aug, EmailPattern).as("email_ct"),
      piiCount(aug, PhonePattern).as("phone_ct"),
      piiCount(aug, IpPattern).as("ip_ct"),
      (piiCount(aug, EmailPattern) + piiCount(aug, PhonePattern) +
        piiCount(aug, IpPattern)).as("pii_total"),
      redactPii(aug).as("redacted"))
      .orderBy("doc_id")
  }

  val q66Sql: String =
    """WITH aug AS (
      |  SELECT doc_id, text
      |    || CASE WHEN doc_id % 2 = 0
      |         THEN ' contact u' || doc_id || '@ex' || (doc_id % 7)
      |           || CASE WHEN doc_id % 4 = 0 THEN '.ORG' ELSE '.org' END
      |         ELSE '' END
      |    || CASE WHEN doc_id % 3 = 0
      |         THEN ' call 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
      |         ELSE '' END
      |    || ' ip 10.0.' || (doc_id % 250) || '.' || ((doc_id * 7) % 250) AS a
      |  FROM documents)
      |SELECT doc_id,
      |  len(regexp_extract_all(a, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS email_ct,
      |  len(regexp_extract_all(a, '\b\d{3}-\d{4}\b')) AS phone_ct,
      |  len(regexp_extract_all(a, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS ip_ct,
      |  len(regexp_extract_all(a, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
      |    + len(regexp_extract_all(a, '\b\d{3}-\d{4}\b'))
      |    + len(regexp_extract_all(a, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS pii_total,
      |  regexp_replace(regexp_replace(regexp_replace(a,
      |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
      |    '\b\d{3}-\d{4}\b', '<PHONE>', 'g'),
      |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g') AS redacted
      |FROM aug ORDER BY doc_id""".stripMargin

  // --- q67: composite Gopher-style quality gate ---------------------------

  /** Thresholds sit inside the corpus's observed ranges (words 10–99,
    * dup-word-frac 0–0.72, mean word length 3.7–5.3) so both outcomes
    * occur. Predicates compare the UNROUNDED doubles — identical int/int
    * IEEE divisions in both engines, so the boundary is deterministic. */
  def q67GopherFilter(spark: SparkSession, dir: String): DataFrame = {
    val w = tokens(col("text"))
    val dup = dupFrac(w)
    val mwl = meanWordLen(w)
    val stopCt = size(filter(w, t => t.isin("the", "a")))
    tp(spark, dir, "documents").select(
      col("doc_id"),
      size(w).as("n_words"),
      round(dup, 6).as("dup_word_frac"),
      round(mwl, 6).as("mean_wlen"),
      stopCt.as("stop_ct"),
      when(size(w).between(30, 1000) && dup <= 0.55 &&
        mwl >= 3.0 && mwl <= 6.0 && stopCt >= 1, 1).otherwise(0)
        .as("pass_filter"))
      .orderBy("doc_id")
  }

  val q67Sql: String =
    s"""WITH toks AS (
      |  SELECT doc_id,
      |    list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> x <> '') AS w
      |  FROM documents),
      |sig AS (
      |  SELECT doc_id, len(w) AS n_words,
      |    ${OracleCtes.gopherSignalExprs}
      |  FROM toks)
      |SELECT doc_id, n_words, round(dup, 6) AS dup_word_frac,
      |  round(mwl, 6) AS mean_wlen, stop_ct,
      |  CASE WHEN n_words BETWEEN 30 AND 1000 AND dup <= 0.55
      |    AND mwl >= 3.0 AND mwl <= 6.0 AND stop_ct >= 1
      |    THEN 1 ELSE 0 END AS pass_filter
      |FROM sig ORDER BY doc_id""".stripMargin

  // --- q68: eval-set n-gram decontamination -------------------------------

  /** Eval set = every 50th doc (deterministic); k=3 scaled to the tiny
    * synthetic docs (published pipelines use 13-grams on full pages).
    * The corpus's ~30-word vocabulary makes 3-gram collisions split the
    * corpus roughly in half — both outcomes well represented. */
  def q68Decontaminate(spark: SparkSession, dir: String): DataFrame = {
    val docs = tp(spark, dir, "documents")
    graft.operators.Decontamination.flagContaminated(
      docs.filter(col("doc_id") % 50 =!= 0),
      docs.filter(col("doc_id") % 50 === 0),
      "doc_id", "text", 3)
      .orderBy("doc_id")
  }

  val q68Sql: String =
    """WITH toks AS (
      |  SELECT doc_id,
      |    list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '') AS w
      |  FROM documents),
      |sh AS (
      |  SELECT doc_id, CASE WHEN len(w) < 3 THEN []::VARCHAR[]
      |    ELSE list_transform(generate_series(1, len(w) - 2),
      |           i -> w[i] || ' ' || w[i + 1] || ' ' || w[i + 2]) END AS s
      |  FROM toks),
      |ev AS (SELECT DISTINCT unnest(s) AS g FROM sh WHERE doc_id % 50 = 0),
      |tr AS (SELECT doc_id FROM sh WHERE doc_id % 50 <> 0),
      |trg AS (SELECT DISTINCT doc_id, unnest(s) AS g FROM sh WHERE doc_id % 50 <> 0),
      |m AS (SELECT doc_id, count(*) AS c FROM trg JOIN ev USING (g) GROUP BY doc_id)
      |SELECT tr.doc_id, coalesce(m.c, 0) AS matched_shingles,
      |  CASE WHEN m.c IS NOT NULL THEN 1 ELSE 0 END AS contaminated
      |FROM tr LEFT JOIN m ON tr.doc_id = m.doc_id ORDER BY tr.doc_id""".stripMargin

  // --- q69: sequence packing into context windows -------------------------

  def q69PackSequences(spark: SparkSession, dir: String): DataFrame = {
    val docs = tp(spark, dir, "documents").select(col("doc_id"),
      graft.functions.TextFunctions.tokenCount(col("text")).as("ntok"))
    val packed = graft.operators.Packing.packBins(
      docs, "doc_id", "ntok", capacity = 512, groups = 8)
    graft.operators.Packing.binStats(packed, capacity = 512)
      .orderBy("pack_group", "pack_bin")
  }

  val q69Sql: String =
    """WITH toks AS (
      |  SELECT doc_id,
      |    len(list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '')) AS n_tokens
      |  FROM documents),
      |packed AS (
      |  SELECT doc_id, doc_id % 8 AS pack_group, n_tokens,
      |    sum(n_tokens) OVER (PARTITION BY doc_id % 8 ORDER BY doc_id
      |      ROWS UNBOUNDED PRECEDING) AS cum
      |  FROM toks)
      |SELECT pack_group,
      |  CAST(floor((cum - n_tokens)::DOUBLE / 512) AS BIGINT) AS pack_bin,
      |  count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS bin_tokens,
      |  round(sum(n_tokens)::DOUBLE / 512, 6) AS fill
      |FROM packed GROUP BY 1, 2 ORDER BY pack_group, pack_bin""".stripMargin

  // --- q74: exact-window stream packing (doc-splitting) -------------------

  /** GPT-style slicing into exactly-512-token windows: one row per
    * (doc × window it occupies). The window cumsum + explode(sequence)
    * plan is fully declarative; the oracle replays the identical integer
    * arithmetic with a DuckDB window + generate_series. */
  def q74PackSlices(spark: SparkSession, dir: String): DataFrame = {
    val docs = tp(spark, dir, "documents").select(col("doc_id"),
      graft.functions.TextFunctions.tokenCount(col("text")).as("ntok"))
    graft.operators.Packing
      .packSlices(docs, "doc_id", "ntok", capacity = 512, groups = 8)
      .select(col("pack_group"), col("pack_bin"), col("doc_id"),
        col("doc_offset"), col("slice_tokens"))
      .orderBy("pack_group", "pack_bin", "doc_id")
  }

  val q74Sql: String =
    """WITH toks AS (
      |  SELECT doc_id,
      |    len(list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '')) AS n
      |  FROM documents),
      |p AS (
      |  SELECT doc_id, doc_id % 8 AS pack_group, n,
      |    CAST(sum(n) OVER (PARTITION BY doc_id % 8 ORDER BY doc_id
      |      ROWS UNBOUNDED PRECEDING) - n AS BIGINT) AS start_off
      |  FROM toks WHERE n > 0),
      |s AS (
      |  SELECT doc_id, pack_group, n, start_off,
      |    unnest(generate_series(start_off // 512, (start_off + n - 1) // 512)) AS pack_bin
      |  FROM p)
      |SELECT pack_group, pack_bin, doc_id,
      |  greatest(start_off, pack_bin * 512) - start_off AS doc_offset,
      |  least(start_off + n, (pack_bin + 1) * 512)
      |    - greatest(start_off, pack_bin * 512) AS slice_tokens
      |FROM s ORDER BY pack_group, pack_bin, doc_id""".stripMargin

  // --- q77: token-budget dataset cut --------------------------------------

  /** Cut the corpus to ~16k tokens (8 groups × 2000): each group keeps
    * its id-ordered prefix under the per-group budget. The oracle replays
    * the identical windowed cumsum + threshold. */
  def q77TokenBudget(spark: SparkSession, dir: String): DataFrame = {
    val docs = tp(spark, dir, "documents").select(col("doc_id"),
      graft.functions.TextFunctions.tokenCount(col("text")).as("ntok"))
    graft.operators.Packing
      .takeTokenBudget(docs, "doc_id", "ntok", budgetPerGroup = 2000L,
        groups = 8)
      .select(col("pack_group"), col("doc_id"), col("n_tokens"),
        col("cum_tokens"))
      .orderBy("pack_group", "doc_id")
  }

  val q77Sql: String =
    """WITH toks AS (
      |  SELECT doc_id,
      |    coalesce(len(list_filter(regexp_split_to_array(trim(text), '\s+'),
      |                             x -> x <> '')), 0) AS n
      |  FROM documents),
      |p AS (
      |  SELECT doc_id, doc_id % 8 AS pack_group, n AS n_tokens,
      |    CAST(sum(n) OVER (PARTITION BY doc_id % 8 ORDER BY doc_id
      |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
      |  FROM toks)
      |SELECT pack_group, doc_id, n_tokens, cum_tokens FROM p
      |WHERE cum_tokens <= 2000 ORDER BY pack_group, doc_id""".stripMargin

  // --- q103: corpus-trained bigram-LM quality score -----------------------

  /** CCNet-style bits-per-bigram under an add-one bigram LM counted over
    * the corpus itself. Exactness across engines: each log2 term rounds
    * to integer micro-bits BEFORE the per-doc sum, so accumulation is
    * order-independent integer math (see LanguageModel scaladoc). */
  def q103LmScore(spark: SparkSession, dir: String): DataFrame =
    graft.operators.LanguageModel.bigramBits(
      tp(spark, dir, "documents"), "doc_id", "text")
      .orderBy("doc_id")

  val q103Sql: String =
    """WITH toks AS (
      |  SELECT doc_id,
      |    list_filter(regexp_split_to_array(trim(lower(text)), '\s+'), x -> x <> '') AS w
      |  FROM documents),
      |bi AS (
      |  SELECT doc_id,
      |    unnest([w[i] || ' ' || w[i+1] for i in range(1, len(w))]) AS bg
      |  FROM toks WHERE len(w) >= 2),
      |uni AS (
      |  SELECT t, count(*) AS c1
      |  FROM (SELECT unnest(w) AS t FROM toks) GROUP BY 1),
      |big AS (SELECT bg, count(*) AS c12 FROM bi GROUP BY 1),
      |v AS (SELECT count(*) AS vs FROM uni),
      |terms AS (
      |  SELECT bi.doc_id,
      |    CAST(round(log2((big.c12 + 1)::DOUBLE / (uni.c1 + v.vs)) * 1000000.0, 0) AS BIGINT) AS micro
      |  FROM bi JOIN big USING (bg)
      |       JOIN uni ON split_part(bi.bg, ' ', 1) = uni.t
      |       CROSS JOIN v),
      |sc AS (SELECT doc_id, sum(micro) AS s, count(*) AS n FROM terms GROUP BY 1)
      |SELECT d.doc_id, coalesce(sc.n, 0) AS n_bigrams,
      |  round(((-sc.s)::DOUBLE / sc.n) / 1000000.0, 6) AS lm_bits
      |FROM documents d LEFT JOIN sc USING (doc_id) ORDER BY d.doc_id""".stripMargin

  // --- q155: Kneser-Ney smoothed bigram-LM score --------------------------

  /** Bits-per-bigram under interpolated Kneser–Ney (the KenLM smoothing
    * family) trained on the corpus itself — q103's add-one baseline
    * upgraded to absolute discounting + continuation-unigram backoff.
    * Same determinism discipline: per-bigram micro-bit rounding before
    * the exact integer per-doc sum; the oracle re-derives c1/N1+ tables
    * from the same single bigram census and replays the IEEE chain. */
  def q155KneserNey(spark: SparkSession, dir: String): DataFrame =
    graft.operators.LanguageModel.kneserNeyBits(
      tp(spark, dir, "documents"), "doc_id", "text")
      .orderBy("doc_id")

  val q155Sql: String =
    """WITH toks AS (
      |  SELECT doc_id,
      |    list_filter(regexp_split_to_array(trim(lower(text)), '\s+'), x -> x <> '') AS w
      |  FROM documents),
      |bi AS (
      |  SELECT doc_id,
      |    unnest([w[i] || ' ' || w[i+1] for i in range(1, len(w))]) AS bg
      |  FROM toks WHERE len(w) >= 2),
      |census AS (
      |  SELECT bg, count(*)::BIGINT AS c12,
      |    split_part(bg, ' ', 1) AS w1, split_part(bg, ' ', 2) AS w2
      |  FROM bi GROUP BY 1),
      |byw1 AS (SELECT w1, sum(c12)::BIGINT AS c1, count(*)::BIGINT AS nf
      |         FROM census GROUP BY 1),
      |byw2 AS (SELECT w2, count(*)::BIGINT AS nb FROM census GROUP BY 1),
      |b AS (SELECT count(*)::BIGINT AS bt FROM census),
      |terms AS (
      |  SELECT bi.doc_id,
      |    CAST(round(log2((census.c12::DOUBLE - 0.75) / byw1.c1::DOUBLE
      |      + 0.75 * byw1.nf::DOUBLE / byw1.c1::DOUBLE *
      |        (byw2.nb::DOUBLE / b.bt::DOUBLE)) * 1000000.0, 0) AS BIGINT)
      |      AS micro
      |  FROM bi JOIN census USING (bg)
      |       JOIN byw1 ON census.w1 = byw1.w1
      |       JOIN byw2 ON census.w2 = byw2.w2
      |       CROSS JOIN b),
      |sc AS (SELECT doc_id, sum(micro) AS s, count(*) AS n FROM terms GROUP BY 1)
      |SELECT d.doc_id, coalesce(sc.n, 0) AS n_bigrams,
      |  round(((-sc.s)::DOUBLE / sc.n) / 1000000.0, 6) AS kn_bits
      |FROM documents d LEFT JOIN sc USING (doc_id) ORDER BY d.doc_id""".stripMargin

  // --- q180: interpolated TRIGRAM Kneser-Ney ------------------------------

  /** q155 one order up ([[graft.operators.LanguageModel
    * .kneserNeyTrigramBits]]): trigram counts discounted, the lower
    * order estimated entirely from continuation-type counts in the
    * SAME trigram census. The oracle re-derives every N1+ table from
    * its own census and replays the two-level IEEE chain per distinct
    * trigram. */
  def q180KneserNeyTrigram(spark: SparkSession, dir: String): DataFrame =
    graft.operators.LanguageModel.kneserNeyTrigramBits(
      tp(spark, dir, "documents"), "doc_id", "text")
      .orderBy("doc_id")

  /** `AS MATERIALIZED` on the multiply-referenced CTEs is load-bearing:
    * DuckDB inlines plain CTEs per REFERENCE, and census/by23 are each
    * read 3–5 times — without the keyword the tokenize→explode chain
    * re-expands inside every join arm (measured >30 min / >100 GB on
    * the sf0.01 fixture vs 0.9 s materialized). */
  val q180Sql: String =
    """WITH toks AS MATERIALIZED (
      |  SELECT doc_id,
      |    list_filter(regexp_split_to_array(trim(lower(text)), '\s+'), x -> x <> '') AS w
      |  FROM documents),
      |tri AS MATERIALIZED (
      |  SELECT doc_id,
      |    unnest([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
      |            for i in range(1, len(w) - 1)]) AS tg
      |  FROM toks WHERE len(w) >= 3),
      |census AS MATERIALIZED (
      |  SELECT tg, count(*)::BIGINT AS c123,
      |    split_part(tg, ' ', 1) AS w1, split_part(tg, ' ', 2) AS w2,
      |    split_part(tg, ' ', 3) AS w3
      |  FROM tri GROUP BY 1),
      |by12 AS (SELECT w1, w2, sum(c123)::BIGINT AS ctx12,
      |           count(*)::BIGINT AS nf12 FROM census GROUP BY 1, 2),
      |by23 AS MATERIALIZED (SELECT w2, w3, count(*)::BIGINT AS nc23
      |         FROM census GROUP BY 1, 2),
      |by2 AS (SELECT w2, sum(nc23)::BIGINT AS nd2d,
      |          count(*)::BIGINT AS nf2 FROM by23 GROUP BY 1),
      |by3 AS (SELECT w3, count(*)::BIGINT AS nc3 FROM by23 GROUP BY 1),
      |b AS (SELECT count(*)::BIGINT AS bt FROM by23),
      |terms AS (
      |  SELECT tri.doc_id,
      |    CAST(round(log2((census.c123::DOUBLE - 0.75) / by12.ctx12::DOUBLE
      |      + 0.75 * by12.nf12::DOUBLE / by12.ctx12::DOUBLE *
      |        ((by23.nc23::DOUBLE - 0.75) / by2.nd2d::DOUBLE
      |         + 0.75 * by2.nf2::DOUBLE / by2.nd2d::DOUBLE *
      |           (by3.nc3::DOUBLE / b.bt::DOUBLE))) * 1000000.0, 0) AS BIGINT)
      |      AS micro
      |  FROM tri JOIN census USING (tg)
      |       JOIN by12 ON census.w1 = by12.w1 AND census.w2 = by12.w2
      |       JOIN by23 ON census.w2 = by23.w2 AND census.w3 = by23.w3
      |       JOIN by2 ON census.w2 = by2.w2
      |       JOIN by3 ON census.w3 = by3.w3
      |       CROSS JOIN b),
      |sc AS (SELECT doc_id, sum(micro) AS s, count(*) AS n FROM terms GROUP BY 1)
      |SELECT d.doc_id, coalesce(sc.n, 0) AS n_trigrams,
      |  round(((-sc.s)::DOUBLE / sc.n) / 1000000.0, 6) AS kn3_bits
      |FROM documents d LEFT JOIN sc USING (doc_id) ORDER BY d.doc_id""".stripMargin

  // --- q156: per-source distribution drift --------------------------------

  /** KL-divergence drift of each source's token distribution from the
    * corpus-wide one ([[graft.operators.Drift]]) — the domain-shift /
    * broken-scraper monitor. Two sources get an in-query anomaly token
    * injected (the q134 discipline) so genuinely drifted groups
    * exist and must surface with the highest kl_nats; the oracle
    * replays censuses, nano-nat terms and integer sums exactly. */
  def q156KlDrift(spark: SparkSession, dir: String): DataFrame = {
    val aug = tp(spark, dir, "documents").select(col("source"),
      when(col("source").isin("src0", "src1"),
        concat(col("text"), lit(" anomaly anomaly anomaly")))
        .otherwise(col("text")).as("page"))
    graft.operators.Drift.klDrift(aug, "source", "page")
      .orderBy("source")
  }

  val q156Sql: String =
    """WITH aug AS (
      |  SELECT source,
      |    CASE WHEN source IN ('src0', 'src1')
      |      THEN text || ' anomaly anomaly anomaly' ELSE text END AS page
      |  FROM documents),
      |toks AS (
      |  SELECT source, unnest(list_filter(
      |    regexp_split_to_array(trim(lower(page)), '\s+'), x -> x <> '')) AS t
      |  FROM aug),
      |census AS (SELECT source, t, count(*)::BIGINT AS cgt
      |           FROM toks GROUP BY 1, 2),
      |gct AS (SELECT t, sum(cgt)::BIGINT AS ct FROM census GROUP BY 1),
      |perg AS (SELECT source, sum(cgt)::BIGINT AS ng FROM census GROUP BY 1),
      |tot AS (SELECT sum(ng)::BIGINT AS n FROM perg),
      |terms AS (
      |  SELECT census.source,
      |    CAST(round((cgt::DOUBLE / ng::DOUBLE) *
      |      ln((cgt::DOUBLE / ng::DOUBLE) / (ct::DOUBLE / n::DOUBLE)) *
      |      1000000000.0, 0) AS BIGINT) AS nano
      |  FROM census JOIN gct USING (t) JOIN perg USING (source)
      |       CROSS JOIN tot),
      |sc AS (SELECT source, sum(nano) AS s FROM terms GROUP BY 1)
      |SELECT sc.source, perg.ng AS n_tokens,
      |  round(s::DOUBLE / 1000000000.0, 6) AS kl_nats
      |FROM sc JOIN perg USING (source) ORDER BY source""".stripMargin

  // --- q189: per-source Jensen-Shannon drift --------------------------------

  /** Jensen–Shannon divergence of each source's token distribution
    * from the corpus ([[graft.operators.Drift.jsDrift]]) — the
    * symmetric, [0, ln 2]-bounded sibling of q156's KL, the form
    * production drift monitors threshold ("alert at 0.1 nats") because
    * its scale is corpus-independent. Same anomaly injection as q156,
    * so the drifted sources must surface on BOTH metrics; the oracle
    * replays censuses, the per-term nano-nat chain, AND the
    * closed-form absent-token tail ½·ln2·(1 − covered corpus mass). */
  def q189JsDrift(spark: SparkSession, dir: String): DataFrame = {
    val aug = tp(spark, dir, "documents").select(col("source"),
      when(col("source").isin("src0", "src1"),
        concat(col("text"), lit(" anomaly anomaly anomaly")))
        .otherwise(col("text")).as("page"))
    graft.operators.Drift.jsDrift(aug, "source", "page")
      .orderBy("source")
  }

  val q189Sql: String =
    """WITH aug AS (
      |  SELECT source,
      |    CASE WHEN source IN ('src0', 'src1')
      |      THEN text || ' anomaly anomaly anomaly' ELSE text END AS page
      |  FROM documents),
      |toks AS (
      |  SELECT source, unnest(list_filter(
      |    regexp_split_to_array(trim(lower(page)), '\s+'), x -> x <> '')) AS t
      |  FROM aug),
      |census AS (SELECT source, t, count(*)::BIGINT AS cgt
      |           FROM toks GROUP BY 1, 2),
      |gct AS (SELECT t, sum(cgt)::BIGINT AS ct FROM census GROUP BY 1),
      |perg AS (SELECT source, sum(cgt)::BIGINT AS ng FROM census GROUP BY 1),
      |tot AS (SELECT sum(ng)::BIGINT AS n FROM perg),
      |terms AS (
      |  SELECT census.source, ct,
      |    CAST(round((
      |      (cgt::DOUBLE / ng::DOUBLE) *
      |        ln((2.0 * (cgt::DOUBLE / ng::DOUBLE)) /
      |           ((cgt::DOUBLE / ng::DOUBLE) + (ct::DOUBLE / n::DOUBLE))) +
      |      (ct::DOUBLE / n::DOUBLE) *
      |        ln((2.0 * (ct::DOUBLE / n::DOUBLE)) /
      |           ((cgt::DOUBLE / ng::DOUBLE) + (ct::DOUBLE / n::DOUBLE)))
      |    ) * 500000000.0, 0) AS BIGINT) AS nano
      |  FROM census JOIN gct USING (t) JOIN perg USING (source)
      |       CROSS JOIN tot),
      |sc AS (SELECT source, sum(nano) AS s, sum(ct)::BIGINT AS cov
      |       FROM terms GROUP BY 1)
      |SELECT sc.source, perg.ng AS n_tokens,
      |  round((s + CAST(round(
      |    (n - cov)::DOUBLE / n::DOUBLE * 0.34657359027997264 * 1000000000.0,
      |    0) AS BIGINT))::DOUBLE / 1000000000.0, 6) AS jsd_nats
      |FROM sc JOIN perg USING (source) CROSS JOIN tot
      |ORDER BY source""".stripMargin

  // --- q159: distinctive terms (log-odds z-scores) -------------------------

  /** "Fightin' Words" (Monroe et al. 2008) top-3 distinctive terms per
    * source — the interpretable companion to q156: KL says WHICH source
    * drifted, this says WHY. Same anomaly injection, so 'anomaly' must
    * rank #1 for src0/src1; the oracle replays censuses, the prior'd
    * log-odds chain, the z-scores, and the per-group ranking. */
  def q159DistinctiveTerms(spark: SparkSession, dir: String): DataFrame = {
    val aug = tp(spark, dir, "documents").select(col("source"),
      when(col("source").isin("src0", "src1"),
        concat(col("text"), lit(" anomaly anomaly anomaly")))
        .otherwise(col("text")).as("page"))
    graft.operators.Drift.distinctiveTerms(aug, "source", "page", k = 3)
      .orderBy("source", "rank")
  }

  val q159Sql: String =
    """WITH aug AS (
      |  SELECT source,
      |    CASE WHEN source IN ('src0', 'src1')
      |      THEN text || ' anomaly anomaly anomaly' ELSE text END AS page
      |  FROM documents),
      |toks AS (
      |  SELECT source, unnest(list_filter(
      |    regexp_split_to_array(trim(lower(page)), '\s+'), x -> x <> '')) AS t
      |  FROM aug),
      |census AS (SELECT source, t, count(*)::BIGINT AS c1
      |           FROM toks GROUP BY 1, 2),
      |gct AS (SELECT t, sum(c1)::BIGINT AS ct FROM census GROUP BY 1),
      |perg AS (SELECT source, sum(c1)::BIGINT AS n1 FROM census GROUP BY 1),
      |tot AS (SELECT sum(ct)::BIGINT AS n, count(*)::BIGINT AS v FROM gct),
      |sc AS (
      |  SELECT census.source, census.t,
      |    (ln((c1::DOUBLE + 0.01) /
      |        (n1::DOUBLE + 0.01 * v::DOUBLE - c1::DOUBLE - 0.01))
      |     - ln(((ct - c1)::DOUBLE + 0.01) /
      |        ((n - n1)::DOUBLE + 0.01 * v::DOUBLE - (ct - c1)::DOUBLE - 0.01)))
      |    / sqrt(1.0 / (c1::DOUBLE + 0.01) + 1.0 / ((ct - c1)::DOUBLE + 0.01))
      |      AS z
      |  FROM census JOIN gct USING (t) JOIN perg USING (source)
      |       CROSS JOIN tot),
      |rk AS (SELECT source, t, z,
      |         row_number() OVER (PARTITION BY source ORDER BY z DESC, t)
      |           AS rank
      |       FROM sc)
      |SELECT source, rank, t AS term, round(z, 6) AS z
      |FROM rk WHERE rank <= 3 ORDER BY source, rank""".stripMargin

  // --- q161: robust MAD outlier scoring -------------------------------------

  /** Median/MAD modified z-scores per source over document length
    * ([[graft.operators.Winsorize.madOutliers]]) — the robust sibling
    * of q139's mean/stddev z. 1-in-97 docs get +5000 synthetic chars
    * (the q66 fixture discipline) so true outliers exist and must flag
    * while leaving the medians untouched; the oracle replays both
    * exact lower-median ranks and the modified-z chain. */
  def q161MadOutliers(spark: SparkSession, dir: String): DataFrame = {
    val v = tp(spark, dir, "documents").select(col("doc_id"), col("source"),
      (col("n_chars") +
        when(col("doc_id") % 97 === 0, lit(5000L)).otherwise(lit(0L)))
        .as("x"))
    graft.operators.Winsorize.madOutliers(v, "source", "x", cutoff = 3.5)
      .select(col("doc_id"), col("source"), col("x"), col("med"),
        col("mad"), col("robust_z"), col("is_outlier"))
      .orderBy("doc_id")
  }

  val q161Sql: String =
    """WITH v AS (
      |  SELECT doc_id, source,
      |    n_chars + CASE WHEN doc_id % 97 = 0 THEN 5000 ELSE 0 END AS x
      |  FROM documents),
      |h AS (SELECT source, x, count(*)::BIGINT AS c FROM v GROUP BY 1, 2),
      |cum AS (
      |  SELECT source, x,
      |    sum(c) OVER (PARTITION BY source ORDER BY x) AS cs,
      |    sum(c) OVER (PARTITION BY source) AS n
      |  FROM h),
      |med AS (SELECT source, min(x) AS med FROM cum
      |        WHERE cs >= (n + 1) // 2 GROUP BY 1),
      |d AS (SELECT v.doc_id, v.source, v.x, m.med,
      |        abs(v.x - m.med) AS ad
      |      FROM v JOIN med m USING (source)),
      |dh AS (SELECT source, ad, count(*)::BIGINT AS c FROM d GROUP BY 1, 2),
      |dcum AS (
      |  SELECT source, ad,
      |    sum(c) OVER (PARTITION BY source ORDER BY ad) AS cs,
      |    sum(c) OVER (PARTITION BY source) AS n
      |  FROM dh),
      |mad AS (SELECT source, min(ad) AS mad FROM dcum
      |        WHERE cs >= (n + 1) // 2 GROUP BY 1)
      |SELECT d.doc_id, d.source, d.x, d.med, m2.mad,
      |  CASE WHEN m2.mad = 0 THEN NULL
      |    ELSE round(0.6745 * (d.x - d.med) / m2.mad, 6) END AS robust_z,
      |  CASE WHEN m2.mad = 0 THEN FALSE
      |    ELSE abs(0.6745 * (d.x - d.med) / m2.mad) > 3.5 END AS is_outlier
      |FROM d JOIN mad m2 USING (source) ORDER BY doc_id""".stripMargin

  // --- q163: exact AUC of the cheap quality score vs the gate --------------

  /** Exact Mann–Whitney AUC ([[graft.operators.Eval.aucExact]]) of the
    * q30 composite quality score predicting the q67 Gopher gate — "is
    * the cheap screen worth running before the expensive one?", the
    * standard curation-cascade question, answered with an exact
    * integer pair count instead of a sampled curve. The negBelow
    * prefix sum runs the bounded two-level discipline (≤2^16 buckets ×
    * ≤2^16 values, never SinglePartition); the oracle replays the
    * histogram, the cumulative pairing sum, and the one-division AUC. */
  def q163ClassifierAuc(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.TextFunctions.qualityScore
    val w = tokens(col("text"))
    val dup = dupFrac(w)
    val mwl = meanWordLen(w)
    val stopCt = size(filter(w, t => t.isin("the", "a")))
    val labeled = tp(spark, dir, "documents").select(
      (size(w).between(30, 1000) && dup <= 0.55 &&
        mwl >= 3.0 && mwl <= 6.0 && stopCt >= 1).as("label"),
      round(qualityScore(col("text")) * 1e6, 0).cast("long")
        .as("score_micro"))
    graft.operators.Eval.aucExact(labeled, "label", "score_micro")
  }

  val q163Sql: String = {
    s"""WITH toks AS (
       |  SELECT doc_id, text,
       |    list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> x <> '') AS w
       |  FROM documents),
       |sig AS (
       |  SELECT doc_id, text, w, len(w) AS nw,
       |    ${OracleCtes.gopherSignalExprs}
       |  FROM toks),
       |lab AS (
       |  SELECT
       |    (nw BETWEEN 30 AND 1000 AND dup <= 0.55
       |      AND mwl >= 3.0 AND mwl <= 6.0 AND stop_ct >= 1) AS y,
       |    ${OracleCtes.qualityMicroExpr} AS s
       |  FROM sig),
       |hist AS (
       |  SELECT s, sum(CASE WHEN y THEN 1 ELSE 0 END)::BIGINT AS p,
       |    sum(CASE WHEN y THEN 0 ELSE 1 END)::BIGINT AS n
       |  FROM lab GROUP BY 1),
       |cum AS (
       |  SELECT s, p, n,
       |    coalesce(sum(n) OVER (ORDER BY s
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS below
       |  FROM hist)
       |SELECT sum(p)::BIGINT AS n_pos, sum(n)::BIGINT AS n_neg,
       |  round(sum(p * (2 * below + n))::DOUBLE /
       |    (2.0 * sum(p)::DOUBLE * sum(n)::DOUBLE), 6) AS auc
       |FROM cum""".stripMargin
  }

  /** The q30 quality score in micro units, as a DuckDB subquery over
    * `src` (doc_id, text, ...) — shared by the q164/q165 oracles. */
  private def qualityMicroSql(src: String): String = {
    s"""SELECT ${OracleCtes.qualityMicroExpr} AS s
       |  FROM (SELECT text, list_filter(
       |    regexp_split_to_array(trim(text), '\\s+'), x -> x <> '') AS w
       |    FROM $src) tt""".stripMargin
  }

  // --- q164: calibration reliability table + ECE ----------------------------

  /** Reliability diagram + exact expected calibration error of the q30
    * quality score read as P(pass gate) ([[graft.operators.Eval
    * .calibration]]): is the cheap score's CONFIDENCE honest, not just
    * its ordering (q163's AUC)? The ECE telescopes to one exact
    * integer sum over bins — the oracle replays bins, gaps, and the
    * single division. */
  def q164Calibration(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.TextFunctions.qualityScore
    val w = tokens(col("text"))
    val dup = dupFrac(w)
    val mwl = meanWordLen(w)
    val stopCt = size(filter(w, t => t.isin("the", "a")))
    val labeled = tp(spark, dir, "documents").select(
      (size(w).between(30, 1000) && dup <= 0.55 &&
        mwl >= 3.0 && mwl <= 6.0 && stopCt >= 1).as("label"),
      round(qualityScore(col("text")) * 1e6, 0).cast("long")
        .as("score_micro"))
    graft.operators.Eval.calibration(labeled, "label", "score_micro")
      .orderBy("bin")
  }

  val q164Sql: String = {
    s"""WITH toks AS (
       |  SELECT text, list_filter(
       |    regexp_split_to_array(trim(text), '\\s+'), x -> x <> '') AS w
       |  FROM documents),
       |sig AS (
       |  SELECT text, w, len(w) AS nw,
       |    ${OracleCtes.gopherSignalExprs}
       |  FROM toks),
       |lab AS (
       |  SELECT
       |    (nw BETWEEN 30 AND 1000 AND dup <= 0.55
       |      AND mwl >= 3.0 AND mwl <= 6.0 AND stop_ct >= 1) AS y,
       |    ${OracleCtes.qualityMicroExpr} AS s
       |  FROM sig),
       |pb AS (
       |  SELECT least(greatest((s * 10) // 1000000, 0), 9) AS bin,
       |    count(*)::BIGINT AS n,
       |    sum(CASE WHEN y THEN 1 ELSE 0 END)::BIGINT AS acc,
       |    sum(s)::BIGINT AS conf
       |  FROM lab GROUP BY 1),
       |g AS (SELECT bin, n, acc, conf,
       |        abs(acc * 1000000 - conf)::BIGINT AS gap FROM pb),
       |t AS (SELECT sum(n)::BIGINT AS nn, sum(gap)::BIGINT AS gg FROM g)
       |SELECT bin, n, round(acc::DOUBLE / n::DOUBLE, 6) AS acc_rate,
       |  round(conf::DOUBLE / (n::DOUBLE * 1000000.0), 6) AS conf_rate,
       |  gap AS gap_micro,
       |  round(gg::DOUBLE / (nn::DOUBLE * 1000000.0), 6) AS ece
       |FROM g, t ORDER BY bin""".stripMargin
  }

  // --- q193: Cohen's kappa between the cheap and expensive gates ------------

  /** Chance-corrected agreement ([[graft.operators.Eval.cohenKappa]])
    * between the cheap screen (q30 quality score ≥ 0.5) and the
    * expensive q67-style gate — the statistic that answers "can the
    * cheap rater REPLACE the expensive one" where raw accuracy
    * flatters any two raters that mostly say 'pass' (q163's AUC ranks,
    * kappa judges the binarized decision). Exact integer contingency
    * counts, exact integer κ numerator/denominator, ONE division. */
  def q193Kappa(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.TextFunctions.qualityScore
    val w = tokens(col("text"))
    val dup = dupFrac(w)
    val mwl = meanWordLen(w)
    val stopCt = size(filter(w, t => t.isin("the", "a")))
    val rated = tp(spark, dir, "documents").select(
      (round(qualityScore(col("text")) * 1e6, 0).cast("long") >= 500000L)
        .as("cheap"),
      (size(w).between(30, 1000) && dup <= 0.55 &&
        mwl >= 3.0 && mwl <= 6.0 && stopCt >= 1).as("gate"))
    graft.operators.Eval.cohenKappa(rated, "cheap", "gate")
  }

  val q193Sql: String = {
    s"""WITH toks AS (
       |  SELECT text, list_filter(
       |    regexp_split_to_array(trim(text), '\\s+'), x -> x <> '') AS w
       |  FROM documents),
       |sig AS (
       |  SELECT text, w, len(w) AS nw,
       |    ${OracleCtes.gopherSignalExprs}
       |  FROM toks),
       |r AS (
       |  SELECT
       |    (${OracleCtes.qualityMicroExpr} >= 500000) AS a,
       |    (nw BETWEEN 30 AND 1000 AND dup <= 0.55
       |      AND mwl >= 3.0 AND mwl <= 6.0 AND stop_ct >= 1) AS b
       |  FROM sig),
       |m AS (
       |  SELECT
       |    sum(CASE WHEN a AND b THEN 1 ELSE 0 END)::BIGINT AS n11,
       |    sum(CASE WHEN a AND NOT b THEN 1 ELSE 0 END)::BIGINT AS n10,
       |    sum(CASE WHEN NOT a AND b THEN 1 ELSE 0 END)::BIGINT AS n01,
       |    sum(CASE WHEN NOT a AND NOT b THEN 1 ELSE 0 END)::BIGINT AS n00
       |  FROM r),
       |k AS (
       |  SELECT n11 + n10 + n01 + n00 AS n, n11, n00, n10, n01,
       |    ((n11 + n10)::HUGEINT * (n11 + n01)::HUGEINT +
       |     (n01 + n00)::HUGEINT * (n10 + n00)::HUGEINT) AS es
       |  FROM m)
       |SELECT n, n11 AS n_both, n00 AS n_neither,
       |  n10 AS n_only_a, n01 AS n_only_b,
       |  round((n11 + n00)::DOUBLE / n::DOUBLE, 6) AS po,
       |  round(es::DOUBLE / (n::DOUBLE * n::DOUBLE), 6) AS pe,
       |  CASE WHEN n::HUGEINT * n::HUGEINT - es = 0 THEN NULL
       |    ELSE round((n::HUGEINT * (n11 + n00)::HUGEINT - es)::DOUBLE /
       |      (n::HUGEINT * n::HUGEINT - es)::DOUBLE, 6) END AS kappa
       |FROM k""".stripMargin
  }

  // --- q196: Fleiss' kappa across the three-gate judge panel ----------------

  /** Fleiss' kappa ([[graft.operators.Eval.fleissKappa]]) across THREE
    * binary raters — the cheap q30 score ≥ 0.5, the expensive
    * q67-style gate, and a simple length-band gate — the panel
    * statistic that answers "do our quality gates constitute one
    * opinion or three" (q193's Cohen handles only the pair). All three
    * rating chains replay in DuckDB; κ is a ratio of two exact
    * integers. */
  def q196FleissKappa(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.TextFunctions.qualityScore
    val w = tokens(col("text"))
    val dup = dupFrac(w)
    val mwl = meanWordLen(w)
    val stopCt = size(filter(w, t => t.isin("the", "a")))
    val rated = tp(spark, dir, "documents").select(
      (round(qualityScore(col("text")) * 1e6, 0).cast("long") >= 500000L)
        .as("cheap"),
      (size(w).between(30, 1000) && dup <= 0.55 &&
        mwl >= 3.0 && mwl <= 6.0 && stopCt >= 1).as("gate"),
      col("n_chars").between(100L, 2000L).as("lenband"))
    graft.operators.Eval.fleissKappa(rated, Seq("cheap", "gate", "lenband"))
  }

  val q196Sql: String = {
    s"""WITH toks AS (
       |  SELECT text, n_chars, list_filter(
       |    regexp_split_to_array(trim(text), '\\s+'), x -> x <> '') AS w
       |  FROM documents),
       |sig AS (
       |  SELECT text, n_chars, w, len(w) AS nw,
       |    ${OracleCtes.gopherSignalExprs}
       |  FROM toks),
       |r AS (
       |  SELECT
       |    (CASE WHEN ${OracleCtes.qualityMicroExpr} >= 500000 THEN 1 ELSE 0 END)
       |    + (CASE WHEN nw BETWEEN 30 AND 1000 AND dup <= 0.55
       |        AND mwl >= 3.0 AND mwl <= 6.0 AND stop_ct >= 1
       |        THEN 1 ELSE 0 END)
       |    + (CASE WHEN n_chars BETWEEN 100 AND 2000 THEN 1 ELSE 0 END)
       |      AS nt
       |  FROM sig),
       |a AS (
       |  SELECT count(*)::BIGINT AS n, sum(nt)::BIGINT AS t,
       |    sum(nt::HUGEINT * nt::HUGEINT +
       |        (3 - nt)::HUGEINT * (3 - nt)::HUGEINT) AS s2
       |  FROM r),
       |k AS (
       |  SELECT n, t, s2,
       |    n::HUGEINT * 3 AS bm,
       |    t::HUGEINT * t::HUGEINT +
       |      (n::HUGEINT * 3 - t::HUGEINT) * (n::HUGEINT * 3 - t::HUGEINT)
       |      AS pe2,
       |    n::HUGEINT * 3 * 2 AS pbden
       |  FROM a)
       |SELECT n AS n_subjects, 3::BIGINT AS m,
       |  round(t::DOUBLE / bm::DOUBLE, 6) AS p_true,
       |  round((s2 - bm)::DOUBLE / pbden::DOUBLE, 6) AS pbar,
       |  round(pe2::DOUBLE / (bm::DOUBLE * bm::DOUBLE), 6) AS pe,
       |  CASE WHEN pbden * (bm * bm - pe2) = 0 THEN NULL
       |    ELSE round(((s2 - bm) * bm * bm - pe2 * pbden)::DOUBLE /
       |      (pbden * (bm * bm - pe2))::DOUBLE, 6) END AS kappa
       |FROM k""".stripMargin
  }

  // --- q165: population stability index between crawls ----------------------

  /** PSI of the quality-score distribution between the original corpus
    * and the q136 synthetic new crawl ([[graft.operators.Eval.psi]]) —
    * the production "did the score distribution move between
    * snapshots" monitor, with add-one smoothed bins and micro-rounded
    * per-bin terms so the total is an exact integer sum. */
  def q165Psi(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.TextFunctions.qualityScore
    val docs = tp(spark, dir, "documents")
    val survivors = docs.filter(col("doc_id") % 7 =!= 0)
      .select(col("doc_id"),
        when(col("doc_id") % 5 === 0, concat(col("text"), lit(" updated")))
          .otherwise(col("text")).as("text"))
    val fresh = docs.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 100000).as("doc_id"), col("text"))
    def scoreOf(df: DataFrame) = df.select(
      round(qualityScore(col("text")) * 1e6, 0).cast("long").as("s"))
    graft.operators.Eval.psi(scoreOf(docs),
      scoreOf(survivors.unionByName(fresh)), "s", bins = 10)
      .orderBy("bin")
  }

  val q165Sql: String =
    s"""WITH newd AS (
       |  SELECT doc_id,
       |    CASE WHEN doc_id % 5 = 0 THEN text || ' updated' ELSE text END AS text
       |  FROM documents WHERE doc_id % 7 <> 0
       |  UNION ALL
       |  SELECT doc_id + 100000, text FROM documents WHERE doc_id % 10 = 0),
       |ref AS (${qualityMicroSql("documents")}),
       |cur AS (${qualityMicroSql("newd")}),
       |rb AS (SELECT least(greatest((s * 10) // 1000000, 0), 9) AS bin,
       |         count(*)::BIGINT AS n_ref FROM ref GROUP BY 1),
       |cb AS (SELECT least(greatest((s * 10) // 1000000, 0), 9) AS bin,
       |         count(*)::BIGINT AS n_cur FROM cur GROUP BY 1),
       |j AS (SELECT r.range::BIGINT AS bin,
       |        coalesce(n_ref, 0) AS n_ref, coalesce(n_cur, 0) AS n_cur
       |      FROM range(10) r
       |      LEFT JOIN rb ON rb.bin = r.range
       |      LEFT JOIN cb ON cb.bin = r.range),
       |t AS (SELECT (sum(n_ref) + 10)::BIGINT AS tr,
       |             (sum(n_cur) + 10)::BIGINT AS tc FROM j),
       |terms AS (
       |  SELECT bin, n_ref, n_cur,
       |    CAST(round(((n_ref + 1)::DOUBLE / tr::DOUBLE
       |        - (n_cur + 1)::DOUBLE / tc::DOUBLE) *
       |      ln(((n_ref + 1)::DOUBLE / tr::DOUBLE) /
       |         ((n_cur + 1)::DOUBLE / tc::DOUBLE)) * 1000000.0, 0) AS BIGINT)
       |      AS psi_term_micro
       |  FROM j, t),
       |tot AS (SELECT sum(psi_term_micro)::BIGINT AS s FROM terms)
       |SELECT bin, n_ref, n_cur, psi_term_micro,
       |  round(s::DOUBLE / 1000000.0, 6) AS psi
       |FROM terms, tot ORDER BY bin""".stripMargin

  // --- q173: rank agreement (RBO@10) ----------------------------------------

  /** Truncated rank-biased overlap between the q30 heuristic quality
    * TOP-10 and the q103 LM-fluency TOP-10
    * ([[graft.operators.Eval.rboTruncated]]): do the cheap and the
    * expensive ranker agree where it matters? Exact integer RBO
    * weights (p=9/10 over D=10^9·2520), rankings tie-broken by
    * doc_id; the oracle rebuilds BOTH rankings and the weight sum. */
  def q173RankAgreement(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.TextFunctions.qualityScore
    val docs = tp(spark, dir, "documents")
    def topQ(scored: DataFrame) = {
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(desc("q"), col("doc_id"))
      scored.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 10)
    }
    val ra = topQ(docs.select(col("doc_id"),
      qualityScore(col("text")).as("q")))
    val raTrunc = topQ(docs.select(col("doc_id"),
      qualityScore(expr("substr(text, 1, (4 * length(text)) div 5)"))
        .as("q")))
    val wb = org.apache.spark.sql.expressions.Window
      .orderBy(col("lm_bits").asc, col("doc_id"))
    val rb = graft.operators.LanguageModel
      .bigramBits(docs, "doc_id", "text")
      .filter(col("lm_bits").isNotNull)
      .withColumn("rank", row_number().over(wb))
      .filter(col("rank") <= 10)
    def arm(name: String, b: DataFrame) =
      graft.operators.Eval.rboTruncated(ra, b, "doc_id", "rank", k = 10)
        .withColumn("arm", lit(name))
        .select(col("arm"), col("k"), col("n_common"), col("rbo"))
    arm("self", ra)
      .unionByName(arm("truncated", raTrunc))
      .unionByName(arm("lm", rb))
      .orderBy("arm")
  }

  val q173Sql: String = {
    val stops = graft.functions.TextFunctions.EnglishStopwords
      .map(s => s"'$s'").mkString(", ")
    s"""WITH toks AS (
       |  SELECT doc_id, text,
       |    list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> x <> '') AS w
       |  FROM documents),
       |q AS (
       |  SELECT doc_id, round(
       |    ${OracleCtes.qualityScoreExpr},
       |  6) AS qs
       |  FROM toks),
       |ra AS (SELECT doc_id, row_number() OVER (ORDER BY qs DESC, doc_id) AS r
       |       FROM q),
       |ltoks AS (
       |  SELECT doc_id,
       |    list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'), x -> x <> '') AS w
       |  FROM documents),
       |bi AS (
       |  SELECT doc_id,
       |    unnest([w[i] || ' ' || w[i+1] for i in range(1, len(w))]) AS bg
       |  FROM ltoks WHERE len(w) >= 2),
       |uni AS (
       |  SELECT t, count(*) AS c1
       |  FROM (SELECT unnest(w) AS t FROM ltoks) GROUP BY 1),
       |big AS (SELECT bg, count(*) AS c12 FROM bi GROUP BY 1),
       |v AS (SELECT count(*) AS vs FROM uni),
       |terms AS (
       |  SELECT bi.doc_id,
       |    CAST(round(log2((big.c12 + 1)::DOUBLE / (uni.c1 + v.vs)) * 1000000.0, 0) AS BIGINT) AS micro
       |  FROM bi JOIN big USING (bg)
       |       JOIN uni ON split_part(bi.bg, ' ', 1) = uni.t
       |       CROSS JOIN v),
       |sc AS (SELECT doc_id, sum(micro) AS s, count(*) AS n FROM terms GROUP BY 1),
       |lm AS (SELECT doc_id, round(((-s)::DOUBLE / n) / 1000000.0, 6) AS bits
       |       FROM sc),
       |rbk AS (SELECT doc_id, row_number() OVER (ORDER BY bits ASC, doc_id) AS r
       |        FROM lm),
       |qt AS (
       |  SELECT doc_id, round(
       |    least(length(tt)::DOUBLE / 500.0, 1.0) * 0.4 +
       |    (1.0 - least((length(tt) - length(regexp_replace(tt, '[[:punct:]]', '', 'g')))::DOUBLE
       |       / CASE WHEN length(tt)=0 THEN 1 ELSE length(tt) END * 5.0, 1.0)) * 0.3 +
       |    least((CASE WHEN len(wt) = 0 THEN 0
       |      ELSE len(list_filter([lower(x) for x in wt], x -> x IN ($stops)))::DOUBLE / len(wt) END) * 4.0, 1.0) * 0.3,
       |  6) AS qs
       |  FROM (SELECT doc_id, substr(text, 1, (4 * length(text)) // 5) AS tt,
       |          list_filter(regexp_split_to_array(
       |            trim(substr(text, 1, (4 * length(text)) // 5)), '\\s+'),
       |            x -> x <> '') AS wt
       |        FROM documents) z),
       |rt AS (SELECT doc_id, row_number() OVER (ORDER BY qs DESC, doc_id) AS r
       |       FROM qt),
       |arms AS (
       |  SELECT 'self' AS arm, greatest(a.r, b.r) AS m
       |  FROM ra a JOIN ra b USING (doc_id) WHERE a.r <= 10 AND b.r <= 10
       |  UNION ALL
       |  SELECT 'truncated', greatest(a.r, b.r)
       |  FROM ra a JOIN rt b USING (doc_id) WHERE a.r <= 10 AND b.r <= 10
       |  UNION ALL
       |  SELECT 'lm', greatest(a.r, b.r)
       |  FROM ra a JOIN rbk b USING (doc_id) WHERE a.r <= 10 AND b.r <= 10),
       |names AS (SELECT unnest(['self', 'truncated', 'lm']) AS arm),
       |wsum AS (
       |  SELECT names.arm, count(m)::BIGINT AS n_common,
       |    coalesce(sum(list_sum(
       |      [CAST(9**(d-1) * (2520 // d) * 10**(10-d) AS BIGINT)
       |       for d in range(m, 11)])), 0)::BIGINT AS s
       |  FROM names LEFT JOIN arms ON names.arm = arms.arm
       |  GROUP BY 1)
       |SELECT arm, 10 AS k, n_common,
       |  round(0.1 * s::DOUBLE / 2520000000000.0, 6) AS rbo
       |FROM wsum ORDER BY arm""".stripMargin
  }

  // --- q176: new-vocabulary rate between crawls -----------------------------

  /** Vocabulary novelty of the q136 synthetic new crawl vs the standing
    * corpus: per source, how many token OCCURRENCES use types never
    * seen before (scraper-drift / spam-injection tripwire, the
    * vocabulary-level sibling of q156's distribution drift). One
    * census anti-join — the old vocabulary is types-only, so the join
    * input is vocab-sized, never corpus-sized. */
  def q176NewVocab(spark: SparkSession, dir: String): DataFrame = {
    val docs = tp(spark, dir, "documents")
    val survivors = docs.filter(col("doc_id") % 7 =!= 0)
      .select(col("source"),
        when(col("doc_id") % 5 === 0, concat(col("text"), lit(" updated")))
          .otherwise(col("text")).as("text"))
    val fresh = docs.filter(col("doc_id") % 10 === 0)
      .select(col("source"), col("text"))
    val newCrawl = survivors.unionByName(fresh)
    def toks(df: DataFrame) = df.select(col("source"),
      explode(graft.functions.TextFunctions.tokens(lower(col("text"))))
        .as("t"))
    val oldVocab = toks(docs).select(col("t")).distinct()
    val cur = toks(newCrawl)
    val novel = cur.join(oldVocab, Seq("t"), "left_anti")
      .groupBy(col("source")).agg(count(lit(1)).as("n_novel"))
    cur.groupBy(col("source")).agg(count(lit(1)).as("n_tokens"))
      .join(novel, Seq("source"), "left")
      .select(col("source"), col("n_tokens"),
        coalesce(col("n_novel"), lit(0L)).as("n_novel"),
        round(coalesce(col("n_novel"), lit(0L)).cast("double") /
          col("n_tokens").cast("double"), 6).as("novel_rate"))
      .orderBy("source")
  }

  val q176Sql: String =
    """WITH newd AS (
      |  SELECT source,
      |    CASE WHEN doc_id % 5 = 0 THEN text || ' updated' ELSE text END AS text
      |  FROM documents WHERE doc_id % 7 <> 0
      |  UNION ALL
      |  SELECT source, text FROM documents WHERE doc_id % 10 = 0),
      |oldv AS (
      |  SELECT DISTINCT unnest(list_filter(
      |    regexp_split_to_array(trim(lower(text)), '\s+'), x -> x <> '')) AS t
      |  FROM documents),
      |cur AS (
      |  SELECT source, unnest(list_filter(
      |    regexp_split_to_array(trim(lower(text)), '\s+'), x -> x <> '')) AS t
      |  FROM newd),
      |tot AS (SELECT source, count(*)::BIGINT AS n_tokens
      |        FROM cur GROUP BY 1),
      |nov AS (SELECT source, count(*)::BIGINT AS n_novel
      |        FROM cur WHERE t NOT IN (SELECT t FROM oldv) GROUP BY 1)
      |SELECT tot.source, n_tokens, coalesce(n_novel, 0) AS n_novel,
      |  round(coalesce(n_novel, 0)::DOUBLE / n_tokens::DOUBLE, 6)
      |    AS novel_rate
      |FROM tot LEFT JOIN nov ON tot.source = nov.source
      |ORDER BY tot.source""".stripMargin

  // --- q177: exact Pearson correlation per group ------------------------------

  /** Per-source Pearson correlation between document length and
    * stopword count. Spark's `corr` (and DuckDB's) accumulate float
    * moments in partition order and can never hash-verify; this one
    * keeps all five moments as EXACT integer/decimal sums and spends
    * floats only in the final one-expression chain (IEEE sqrt is
    * correctly rounded), so r replays bit-for-bit in any engine. */
  def q177Pearson(spark: SparkSession, dir: String): DataFrame = {
    val w = tokens(col("text"))
    val x = col("n_chars")
    val y = size(filter(w, t => t.isin("the", "a"))).cast("long")
    val d = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
    val m = tp(spark, dir, "documents")
      .select(col("source"), x.as("x"), y.as("y"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"), sum(d(col("x")) * d(col("x"))).as("sxx"),
        sum(d(col("y")) * d(col("y"))).as("syy"),
        sum(d(col("x")) * d(col("y"))).as("sxy"))
    val num = (d(col("n")) * col("sxy") - d(col("sx")) * d(col("sy")))
      .cast("double")
    val vx = (d(col("n")) * col("sxx") - d(col("sx")) * d(col("sx")))
      .cast("double")
    val vy = (d(col("n")) * col("syy") - d(col("sy")) * d(col("sy")))
      .cast("double")
    m.select(col("source"), col("n"),
      when(vx > 0 && vy > 0, round(num / sqrt(vx * vy), 6))
        .otherwise(lit(null).cast("double")).as("r"))
      .orderBy("source")
  }

  val q177Sql: String =
    """WITH v AS (
      |  SELECT source, n_chars::BIGINT AS x,
      |    len(list_filter(list_filter(
      |      regexp_split_to_array(trim(text), '\s+'), t -> t <> ''),
      |      t -> t IN ('the', 'a')))::BIGINT AS y
      |  FROM documents),
      |m AS (
      |  SELECT source, count(*)::HUGEINT AS n,
      |    sum(x)::HUGEINT AS sx, sum(y)::HUGEINT AS sy,
      |    sum(x::HUGEINT * x::HUGEINT) AS sxx,
      |    sum(y::HUGEINT * y::HUGEINT) AS syy,
      |    sum(x::HUGEINT * y::HUGEINT) AS sxy
      |  FROM v GROUP BY 1)
      |SELECT source, n::BIGINT AS n,
      |  CASE WHEN (n * sxx - sx * sx)::DOUBLE > 0
      |        AND (n * syy - sy * sy)::DOUBLE > 0
      |    THEN round((n * sxy - sx * sy)::DOUBLE /
      |      sqrt((n * sxx - sx * sx)::DOUBLE * (n * syy - sy * sy)::DOUBLE), 6)
      |  END AS r
      |FROM m ORDER BY source""".stripMargin

  // --- q195: exact Spearman rank correlation --------------------------------

  /** Corpus-wide Spearman between document length and stopword count
    * ([[graft.operators.Eval.spearman]]) — the same variable pair as
    * q177's Pearson, so the two arms read together ("0.8 linear vs 0.9
    * monotone" bounds how nonlinear the relationship is). Tie-averaged
    * ranks kept exact as DOUBLED integers through the bounded
    * two-level prefix sum; the oracle replays both rank tables (plain
    * ordered windows — exactly what the bounded form computes), the
    * value-keyed joins, and the five-moment one-division chain. */
  def q195Spearman(spark: SparkSession, dir: String): DataFrame = {
    val w = tokens(col("text"))
    val rows = tp(spark, dir, "documents").select(
      col("n_chars").as("x"),
      size(filter(w, t => t.isin("the", "a"))).cast("long").as("y"))
    graft.operators.Eval.spearman(rows, "x", "y")
  }

  val q195Sql: String =
    """WITH v AS (
      |  SELECT n_chars::BIGINT AS x,
      |    len(list_filter(list_filter(
      |      regexp_split_to_array(trim(text), '\s+'), t -> t <> ''),
      |      t -> t IN ('the', 'a')))::BIGINT AS y
      |  FROM documents),
      |cx AS (SELECT x, count(*)::BIGINT AS c FROM v GROUP BY 1),
      |rx AS (
      |  SELECT x, 2 * coalesce(sum(c) OVER (ORDER BY x
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |    + c + 1 AS rx FROM cx),
      |cy AS (SELECT y, count(*)::BIGINT AS c FROM v GROUP BY 1),
      |ry AS (
      |  SELECT y, 2 * coalesce(sum(c) OVER (ORDER BY y
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |    + c + 1 AS ry FROM cy),
      |j AS (SELECT rx.rx, ry.ry FROM v
      |      JOIN rx USING (x) JOIN ry USING (y)),
      |m AS (
      |  SELECT count(*)::HUGEINT AS n,
      |    sum(rx)::HUGEINT AS sx, sum(ry)::HUGEINT AS sy,
      |    sum(rx::HUGEINT * rx::HUGEINT) AS sxx,
      |    sum(ry::HUGEINT * ry::HUGEINT) AS syy,
      |    sum(rx::HUGEINT * ry::HUGEINT) AS sxy
      |  FROM j)
      |SELECT n::BIGINT AS n,
      |  CASE WHEN (n * sxx - sx * sx)::DOUBLE > 0
      |        AND (n * syy - sy * sy)::DOUBLE > 0
      |    THEN round((n * sxy - sx * sy)::DOUBLE /
      |      sqrt((n * sxx - sx * sx)::DOUBLE * (n * syy - sy * sy)::DOUBLE), 6)
      |  END AS rho
      |FROM m""".stripMargin

  // --- q181: token-frequency distribution shape ---------------------------

  /** Per-source Gini + power-law exponent of the type-frequency
    * distribution ([[graft.operators.Vocabulary.frequencyShape]]) —
    * does each source's vocabulary usage still look like natural
    * language? The oracle collapses its own census by frequency and
    * replays the rank prefix sum with a plain ordered window (exactly
    * what the two-level bounded form computes), the HUGEINT Σ i·fᵢ,
    * and the nano-nat CSN MLE. */
  def q181VocabShape(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Vocabulary.frequencyShape(
      tp(spark, dir, "documents"), "source", "text")

  val q181Sql: String =
    """WITH toks AS MATERIALIZED (
      |  SELECT source,
      |    unnest(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
      |      x -> x <> '')) AS t
      |  FROM documents),
      |census AS MATERIALIZED (
      |  SELECT source, t, count(*)::BIGINT AS f FROM toks GROUP BY 1, 2),
      |byf AS MATERIALIZED (
      |  SELECT source, f, count(*)::BIGINT AS m FROM census GROUP BY 1, 2),
      |ranked AS (
      |  SELECT source, f, m,
      |    coalesce(sum(m) OVER (PARTITION BY source ORDER BY f
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS s
      |  FROM byf),
      |agg AS (
      |  SELECT source,
      |    sum(f * m)::BIGINT AS n_tokens,
      |    sum(m)::BIGINT AS n_types,
      |    sum(f::HUGEINT * (m * s + (m * (m + 1)) // 2)::HUGEINT) AS tt,
      |    sum(m * CAST(round(ln(f::DOUBLE) * 1000000000.0, 0) AS BIGINT))
      |      ::HUGEINT AS ll,
      |    sum(f::HUGEINT * m::HUGEINT *
      |      CAST(round(ln(f::DOUBLE) * 1000000000.0, 0) AS BIGINT)::HUGEINT)
      |      AS ee
      |  FROM ranked GROUP BY 1)
      |SELECT g.source, coalesce(n_tokens, 0) AS n_tokens,
      |  coalesce(n_types, 0) AS n_types,
      |  CASE WHEN n_types > 1 THEN
      |    round(2.0 * tt::DOUBLE / (n_types::DOUBLE * n_tokens::DOUBLE)
      |      - (n_types + 1)::DOUBLE / n_types::DOUBLE, 6) END AS gini,
      |  CASE WHEN ll > 0 THEN
      |    round(1.0 + n_types::DOUBLE / (ll::DOUBLE / 1000000000.0), 6)
      |  END AS zipf_alpha,
      |  round(ln(n_tokens::DOUBLE)
      |    - ee::DOUBLE / 1000000000.0 / n_tokens::DOUBLE, 6) AS entropy_nats
      |FROM (SELECT DISTINCT source FROM documents) g
      |LEFT JOIN agg USING (source)
      |ORDER BY source""".stripMargin

  // --- q186: pairwise source similarity ------------------------------------

  /** Vocabulary Jaccard + token-frequency cosine for every source pair
    * ([[graft.operators.Drift.pairwiseSimilarity]]) — the
    * mixture-design / crawl-drift diagnostic at the corpus level. */
  def q186SourceSimilarity(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Drift.pairwiseSimilarity(
      tp(spark, dir, "documents"), "source", "text")
      .orderBy("src_a", "src_b")

  val q186Sql: String =
    """WITH toks AS MATERIALIZED (
      |  SELECT source AS g,
      |    unnest(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
      |      x -> x <> '')) AS t
      |  FROM documents),
      |census AS MATERIALIZED (
      |  SELECT g, t, count(*)::BIGINT AS c FROM toks GROUP BY 1, 2),
      |perg AS MATERIALIZED (
      |  SELECT g, count(*)::BIGINT AS v, sum(c::HUGEINT * c::HUGEINT) AS sq
      |  FROM census GROUP BY 1),
      |pairs AS (
      |  SELECT a.g AS src_a, b.g AS src_b, count(*)::BIGINT AS inter_types,
      |    sum(a.c::HUGEINT * b.c::HUGEINT) AS dotp
      |  FROM census a JOIN census b ON a.t = b.t AND a.g < b.g
      |  GROUP BY 1, 2)
      |SELECT p.src_a, p.src_b, p.inter_types,
      |  round(p.inter_types::DOUBLE /
      |    (pa.v + pb.v - p.inter_types)::DOUBLE, 6) AS jaccard,
      |  round(p.dotp::DOUBLE /
      |    (sqrt(pa.sq::DOUBLE) * sqrt(pb.sq::DOUBLE)), 6) AS cosine
      |FROM pairs p JOIN perg pa ON p.src_a = pa.g
      |JOIN perg pb ON p.src_b = pb.g
      |ORDER BY src_a, src_b""".stripMargin

  // --- q123: length-bucketed inference batching stats ---------------------

  /** Dynamic-batching report: 32-token-wide length buckets with the
    * padding waste each pays against its own max — the measurable win of
    * length bucketing over pad-to-global-max. */
  def q123LengthBuckets(spark: SparkSession, dir: String): DataFrame = {
    val docs = tp(spark, dir, "documents").select(col("doc_id"),
      graft.functions.TextFunctions.tokenCount(col("text")).as("ntok"))
    graft.operators.Packing.lengthBuckets(docs, "doc_id", "ntok", width = 32)
      .orderBy("bucket")
  }

  val q123Sql: String =
    """WITH toks AS (
      |  SELECT doc_id,
      |    len(list_filter(regexp_split_to_array(trim(text), '\s+'),
      |      x -> x <> '')) AS ntok
      |  FROM documents)
      |SELECT CAST(ntok // 32 AS BIGINT) AS bucket, count(*) AS n_docs,
      |  CAST(max(ntok) AS BIGINT) AS max_tokens,
      |  CAST(sum(ntok) AS BIGINT) AS total_tokens,
      |  CAST(count(*) * max(ntok) - sum(ntok) AS BIGINT) AS padding_waste
      |FROM toks GROUP BY 1 ORDER BY 1""".stripMargin

  // --- q120: per-source corpus health report ------------------------------

  /** The curation dashboard a data team reads before training: per
    * source, doc and token mass, how many docs are corpus-wide exact
    * duplicates (census across ALL sources — cross-source copies count),
    * how many clear the composite quality gate, and language spread.
    * One scan + one 16-byte fingerprint census; every signal is the
    * already-verified operator's arithmetic. */
  def q120CorpusReport(spark: SparkSession, dir: String): DataFrame = {
    val w = tokens(col("text"))
    val dup = dupFrac(w)
    val mwl = meanWordLen(w)
    val stopCt = size(filter(w, t => t.isin("the", "a")))
    val pass = when(size(w).between(30, 1000) && dup <= 0.55 &&
      mwl >= 3.0 && mwl <= 6.0 && stopCt >= 1, 1).otherwise(0)
    val base = tp(spark, dir, "documents").select(
      col("doc_id"), col("source"), col("lang"),
      graft.functions.TextFunctions.fingerprint(col("text")).as("__graft_fp"),
      graft.functions.TextFunctions.tokenCount(col("text")).as("__graft_ntok"),
      pass.as("__graft_pass"))
      .transform(graft.ops.Parallelism.stage)
    val hot = base.groupBy(col("__graft_fp"))
      .agg(count(lit(1)).as("__graft_c"))
      .filter(col("__graft_c") > 1).select(col("__graft_fp"))
    val flagged = base.join(hot, Seq("__graft_fp"), "left_semi")
      .select(col("doc_id"), lit(1).as("__graft_isdup"))
    base.join(flagged, Seq("doc_id"), "left")
      .groupBy(col("source")).agg(
        count(lit(1)).as("n_docs"),
        sum(col("__graft_ntok")).cast("long").as("total_tokens"),
        sum(coalesce(col("__graft_isdup"), lit(0))).cast("long").as("dup_docs"),
        sum(col("__graft_pass")).cast("long").as("gopher_pass"),
        countDistinct(col("lang")).as("n_langs"))
      .orderBy("source")
  }

  val q120Sql: String =
    """WITH toks AS (
      |  SELECT doc_id, source, lang, text,
      |    list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '') AS w
      |  FROM documents),
      |base AS (
      |  SELECT doc_id, source, lang, len(w) AS ntok,
      |    md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS fp,
      |    CASE WHEN len(w) BETWEEN 30 AND 1000
      |      AND (CASE WHEN len(w) = 0 THEN 0
      |        ELSE (len(w) - len(list_distinct(w)))::DOUBLE / len(w) END) <= 0.55
      |      AND (CASE WHEN len(w) = 0 THEN 0
      |        ELSE list_sum(list_transform(w, x -> length(x)))::DOUBLE / len(w) END)
      |        BETWEEN 3.0 AND 6.0
      |      AND len(list_filter(w, x -> x IN ('the', 'a'))) >= 1
      |      THEN 1 ELSE 0 END AS pass
      |  FROM toks),
      |hot AS (SELECT fp FROM base GROUP BY fp HAVING count(*) > 1)
      |SELECT source, count(*) AS n_docs,
      |  CAST(sum(ntok) AS BIGINT) AS total_tokens,
      |  CAST(sum(CASE WHEN fp IN (SELECT fp FROM hot) THEN 1 ELSE 0 END)
      |    AS BIGINT) AS dup_docs,
      |  CAST(sum(pass) AS BIGINT) AS gopher_pass,
      |  count(DISTINCT lang) AS n_langs
      |FROM base GROUP BY source ORDER BY source""".stripMargin

  // --- q116: composed curation pipeline (gate → dedup → pack) -------------

  /** The end-to-end shape a pretraining team actually runs, as ONE
    * declarative plan: the q67 composite quality gate, exact dedup of
    * the survivors (min-id keeper per content fingerprint), and q69's
    * grouped bin packing of what remains — no materialization between
    * stages, so Catalyst fuses the gate into the scan, the dedup
    * semi-join is the only corpus shuffle (16-byte fingerprints), and
    * packing runs G-parallel on the survivor sliver. Composability IS
    * the feature under test: each stage is the already-verified
    * operator, unchanged. */
  def q116CurationPipeline(spark: SparkSession, dir: String): DataFrame = {
    val w = tokens(col("text"))
    val dup = dupFrac(w)
    val mwl = meanWordLen(w)
    val stopCt = size(filter(w, t => t.isin("the", "a")))
    val passed = tp(spark, dir, "documents")
      .filter(size(w).between(30, 1000) && dup <= 0.55 &&
        mwl >= 3.0 && mwl <= 6.0 && stopCt >= 1)
    val deduped = graft.operators.Dedup
      .dropExactDuplicates(passed, "doc_id", "text")
    val toks = deduped.select(col("doc_id"),
      graft.functions.TextFunctions.tokenCount(col("text")).as("ntok"))
    val packed = graft.operators.Packing.packBins(
      toks, "doc_id", "ntok", capacity = 512, groups = 8)
    graft.operators.Packing.binStats(packed, capacity = 512)
      .orderBy("pack_group", "pack_bin")
  }

  val q116Sql: String =
    s"""WITH toks0 AS (
      |  SELECT doc_id, text,
      |    list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> x <> '') AS w
      |  FROM documents),
      |sig AS (
      |  SELECT doc_id, text, w, len(w) AS n_words,
      |    ${OracleCtes.gopherSignalExprs}
      |  FROM toks0),
      |passed AS (
      |  SELECT doc_id, text, len(w) AS n_tokens FROM sig
      |  WHERE n_words BETWEEN 30 AND 1000 AND dup <= 0.55
      |    AND mwl >= 3.0 AND mwl <= 6.0 AND stop_ct >= 1),
      |keep AS (
      |  SELECT min(doc_id) AS doc_id FROM passed
      |  GROUP BY md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g'))),
      |surv AS (SELECT p.doc_id, p.n_tokens FROM passed p JOIN keep USING (doc_id)),
      |packed AS (
      |  SELECT doc_id, doc_id % 8 AS pack_group, n_tokens,
      |    sum(n_tokens) OVER (PARTITION BY doc_id % 8 ORDER BY doc_id
      |      ROWS UNBOUNDED PRECEDING) AS cum
      |  FROM surv)
      |SELECT pack_group,
      |  CAST(floor((cum - n_tokens)::DOUBLE / 512) AS BIGINT) AS pack_bin,
      |  count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS bin_tokens,
      |  round(sum(n_tokens)::DOUBLE / 512, 6) AS fill
      |FROM packed GROUP BY 1, 2 ORDER BY pack_group, pack_bin""".stripMargin

  // --- q115: CCNet perplexity terciles ------------------------------------

  /** CCNet head/middle/tail partition per language: q103's bigram-LM
    * score split into per-lang terciles by broadcast cut values (no
    * per-language single-reducer ntile sort — see
    * [[graft.operators.LanguageModel.perplexityBuckets]]). */
  def q115PerplexityBuckets(spark: SparkSession, dir: String): DataFrame =
    graft.operators.LanguageModel.perplexityBuckets(
      tp(spark, dir, "documents"), "doc_id", "text", "lang")
      .orderBy("doc_id")

  /** Oracle: q103's scoring as a nested CTE, then the same integer rank
    * rule — t_k = min bits with cumulative histogram count ≥
    * ceil(k·n/3) — and the same ≤-threshold assignment. */
  val q115Sql: String =
    s"""WITH scored AS (
       |${q103Sql.linesIterator.map("  " + _).mkString("\n")}
       |),
       |g AS (
       |  SELECT d.doc_id, d.lang, s.lm_bits
       |  FROM documents d JOIN scored s USING (doc_id)
       |  WHERE s.lm_bits IS NOT NULL),
       |hist AS (
       |  SELECT lang, lm_bits, count(*) AS c FROM g GROUP BY 1, 2),
       |cum AS (
       |  SELECT lang, lm_bits, c,
       |    sum(c) OVER (PARTITION BY lang ORDER BY lm_bits) AS cum
       |  FROM hist),
       |tot AS (SELECT lang, sum(c) AS n FROM hist GROUP BY 1),
       |cuts AS (
       |  SELECT lang,
       |    min(CASE WHEN cum >= (n + 2) // 3 THEN lm_bits END) AS t1,
       |    min(CASE WHEN cum >= (2 * n + 2) // 3 THEN lm_bits END) AS t2
       |  FROM cum JOIN tot USING (lang) GROUP BY lang)
       |SELECT g.doc_id, g.lang, g.lm_bits,
       |  CASE WHEN g.lm_bits <= c.t1 THEN 'head'
       |       WHEN g.lm_bits <= c.t2 THEN 'middle'
       |       ELSE 'tail' END AS bucket
       |FROM g JOIN cuts c USING (lang) ORDER BY g.doc_id""".stripMargin

  // --- q110: broadcast pruned-LM scoring (the 100 TB q103 shape) ----------

  private val LmHeadN = 500

  /** q103's scoring through the broadcast pruned head: top-500 bigrams
    * precompute their micro-bit terms, everything else scores the
    * log2(1/V) OOV floor, and the corpus is scored map-side with zero
    * bigram-keyed exchanges (PlanSpec pins the plan). At sf0.01 the
    * corpus holds far more than 500 distinct bigrams, so the floor
    * genuinely fires and the oracle replays head AND floor. */
  def q110LmBroadcast(spark: SparkSession, dir: String): DataFrame =
    graft.operators.LanguageModel.bigramBitsBroadcast(
      tp(spark, dir, "documents"), "doc_id", "text", topN = LmHeadN)
      .orderBy("doc_id")

  val q110Sql: String =
    s"""WITH toks AS (
      |  SELECT doc_id,
      |    list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'), x -> x <> '') AS w
      |  FROM documents),
      |bi AS (
      |  SELECT doc_id,
      |    unnest([w[i] || ' ' || w[i+1] for i in range(1, len(w))]) AS bg
      |  FROM toks WHERE len(w) >= 2),
      |uni AS (
      |  SELECT t, count(*) AS c1
      |  FROM (SELECT unnest(w) AS t FROM toks) GROUP BY 1),
      |big AS (SELECT bg, count(*) AS c12 FROM bi GROUP BY 1),
      |v AS (SELECT count(*) AS vs FROM uni),
      |head AS (
      |  SELECT h.bg,
      |    CAST(round(log2((h.c12 + 1)::DOUBLE / (uni.c1 + v.vs)) * 1000000.0, 0) AS BIGINT) AS micro
      |  FROM (SELECT bg, c12 FROM big ORDER BY c12 DESC, bg LIMIT $LmHeadN) h
      |  JOIN uni ON split_part(h.bg, ' ', 1) = uni.t
      |  CROSS JOIN v),
      |fl AS (
      |  SELECT CAST(round(log2(1.0 / vs) * 1000000.0, 0) AS BIGINT) AS fm
      |  FROM v),
      |terms AS (
      |  SELECT bi.doc_id, coalesce(head.micro, fl.fm) AS micro
      |  FROM bi LEFT JOIN head USING (bg) CROSS JOIN fl),
      |sc AS (SELECT doc_id, sum(micro) AS s, count(*) AS n FROM terms GROUP BY 1)
      |SELECT d.doc_id, coalesce(sc.n, 0) AS n_bigrams,
      |  round(((-sc.s)::DOUBLE / sc.n) / 1000000.0, 6) AS lm_bits
      |FROM documents d LEFT JOIN sc USING (doc_id) ORDER BY d.doc_id""".stripMargin

  // --- q124: DSIR importance-weighted data selection ----------------------

  /** DSIR (Xie et al. 2023) over the documents corpus: hashed-ngram
    * importance weights against a two-source "high-quality target"
    * slice, top-quarter selection by broadcast histogram cut. The
    * oracle replays the entire arc — feature hashing, the twin bucket
    * censuses, add-one log-ratios in micro-bits, exact integer per-doc
    * sums, and the ceil(3n/4) cut — so the importance MODEL itself is
    * cross-engine verified, not just the final flags. */
  def q124DsirSelect(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Dsir.importanceWeights(
      tp(spark, dir, "documents"), "doc_id", "text",
      targetPred = col("source").isin("src0", "src1"),
      buckets = 4096, keepFrac = 0.25)
      .orderBy("doc_id")

  val q124Sql: String =
    """WITH toks AS (
      |  SELECT doc_id, source,
      |    list_filter(regexp_split_to_array(trim(lower(text)), '\s+'), x -> x <> '') AS w
      |  FROM documents),
      |garr AS (
      |  SELECT doc_id, source,
      |    w || CASE WHEN len(w) >= 2
      |      THEN [w[i] || ' ' || w[i+1] for i in range(1, len(w))]
      |      ELSE []::VARCHAR[] END AS g
      |  FROM toks),
      |bk AS (
      |  SELECT doc_id, source,
      |    (('0x' || substr(md5('dsir|' || t), 1, 15))::UBIGINT % 4096)::BIGINT AS b
      |  FROM (SELECT doc_id, source, unnest(g) AS t FROM garr)),
      |census AS (
      |  SELECT b, count(*)::BIGINT AS rc,
      |    sum(CASE WHEN source IN ('src0', 'src1') THEN 1 ELSE 0 END)::BIGINT AS tc
      |  FROM bk GROUP BY 1),
      |tot AS (SELECT sum(rc) AS nr, sum(tc) AS nt FROM census),
      |micro AS (
      |  SELECT b, CAST(round((log2((tc + 1)::DOUBLE / (nt + 4096))
      |      - log2((rc + 1)::DOUBLE / (nr + 4096))) * 1000000.0, 0) AS BIGINT) AS m
      |  FROM census CROSS JOIN tot),
      |sc AS (
      |  SELECT bk.doc_id, sum(micro.m)::BIGINT AS s, count(*)::BIGINT AS ng
      |  FROM bk JOIN micro ON bk.b = micro.b GROUP BY 1),
      |base AS (
      |  SELECT d.doc_id, coalesce(sc.ng, 0) AS n_grams, coalesce(sc.s, 0) AS s
      |  FROM documents d LEFT JOIN sc USING (doc_id)),
      |hist AS (SELECT s, count(*) AS c FROM base GROUP BY 1),
      |cum AS (SELECT s, sum(c) OVER (ORDER BY s) AS cum FROM hist),
      |nn AS (SELECT count(*) AS n FROM base),
      |cut AS (
      |  SELECT min(CASE WHEN cum >= (3 * nn.n + 3) // 4 THEN s END) AS t
      |  FROM cum CROSS JOIN nn)
      |SELECT b.doc_id, b.n_grams, b.s AS logw_micro,
      |  round(b.s::DOUBLE / 1000000.0, 6) AS log_weight,
      |  CAST(CASE WHEN b.s > cut.t THEN 1 ELSE 0 END AS BIGINT) AS kept
      |FROM base b CROSS JOIN cut ORDER BY b.doc_id""".stripMargin

  // --- q133: link-graph centrality (integer-exact PageRank) ---------------

  /** Source-authority weighting over a synthesized citation graph (the
    * corpus carries no links, so each doc deterministically cites two
    * others — the q66 in-query-fixture discipline): two micro-integer
    * PageRank rounds, every node's final rank exact to the micro. The
    * oracle re-runs both rounds in SQL — join-by-source, floor-divided
    * contributions, damped floor-divided update — so the full iteration
    * arithmetic is cross-engine verified. */
  def q133PageRank(spark: SparkSession, dir: String): DataFrame = {
    val docs = tp(spark, dir, "documents")
    val n = docs.count()
    val edges = docs.select(col("doc_id").as("src"),
        pmod(col("doc_id") * 7 + 1, lit(n)).as("dst"))
      .union(docs.select(col("doc_id").as("src"),
        pmod(col("doc_id") * 13 + 3, lit(n)).as("dst")))
    graft.operators.Centrality.pageRank(edges, "src", "dst", iters = 2)
      .select(col("id").as("doc_id"), col("rank_micro"))
      .orderBy("doc_id")
  }

  val q133Sql: String =
    """WITH nn AS (SELECT count(*)::BIGINT AS n FROM documents),
      |e AS (
      |  SELECT doc_id AS src, (doc_id * 7 + 1) % nn.n AS dst
      |  FROM documents CROSS JOIN nn
      |  UNION ALL
      |  SELECT doc_id, (doc_id * 13 + 3) % nn.n
      |  FROM documents CROSS JOIN nn),
      |deg AS (SELECT src, count(*)::BIGINT AS outdeg FROM e GROUP BY 1),
      |r0 AS (SELECT doc_id AS id, 1000000::BIGINT AS r FROM documents),
      |c1 AS (
      |  SELECT e.dst AS id, sum(r0.r // deg.outdeg)::BIGINT AS s
      |  FROM e JOIN deg USING (src) JOIN r0 ON r0.id = e.src
      |  GROUP BY 1),
      |r1 AS (
      |  SELECT r0.id,
      |    (150000 + (850000 * coalesce(c1.s, 0)) // 1000000)::BIGINT AS r
      |  FROM r0 LEFT JOIN c1 USING (id)),
      |c2 AS (
      |  SELECT e.dst AS id, sum(r1.r // deg.outdeg)::BIGINT AS s
      |  FROM e JOIN deg USING (src) JOIN r1 ON r1.id = e.src
      |  GROUP BY 1),
      |r2 AS (
      |  SELECT r1.id,
      |    (150000 + (850000 * coalesce(c2.s, 0)) // 1000000)::BIGINT AS r
      |  FROM r1 LEFT JOIN c2 USING (id))
      |SELECT id AS doc_id, r AS rank_micro FROM r2 ORDER BY doc_id""".stripMargin

  // --- q188: PageRank convergence report -----------------------------------

  /** Per-iteration max-delta report over the q133 citation graph
    * ([[graft.operators.Centrality.pageRankConvergence]], 3 rounds) —
    * the stop-rule data production runs read to CHOOSE `iters`. The
    * oracle re-runs all three damped floor-divided rounds AND takes
    * each round's max |rank − prev| — the convergence feature itself
    * is cross-engine verified, not just the final ranks. */
  def q188PageRankConvergence(spark: SparkSession, dir: String)
      : DataFrame = {
    val docs = tp(spark, dir, "documents")
    val n = docs.count()
    val edges = docs.select(col("doc_id").as("src"),
        pmod(col("doc_id") * 7 + 1, lit(n)).as("dst"))
      .union(docs.select(col("doc_id").as("src"),
        pmod(col("doc_id") * 13 + 3, lit(n)).as("dst")))
    graft.operators.Centrality.pageRankConvergence(
        edges, "src", "dst", iters = 3)
      .select(col("iter").cast("long").as("iter"), col("max_delta_micro"))
      .orderBy("iter")
  }

  val q188Sql: String =
    """WITH nn AS (SELECT count(*)::BIGINT AS n FROM documents),
      |e AS (
      |  SELECT doc_id AS src, (doc_id * 7 + 1) % nn.n AS dst
      |  FROM documents CROSS JOIN nn
      |  UNION ALL
      |  SELECT doc_id, (doc_id * 13 + 3) % nn.n
      |  FROM documents CROSS JOIN nn),
      |deg AS (SELECT src, count(*)::BIGINT AS outdeg FROM e GROUP BY 1),
      |r0 AS (SELECT doc_id AS id, 1000000::BIGINT AS r FROM documents),
      |c1 AS (
      |  SELECT e.dst AS id, sum(r0.r // deg.outdeg)::BIGINT AS s
      |  FROM e JOIN deg USING (src) JOIN r0 ON r0.id = e.src GROUP BY 1),
      |r1 AS MATERIALIZED (
      |  SELECT r0.id,
      |    (150000 + (850000 * coalesce(c1.s, 0)) // 1000000)::BIGINT AS r
      |  FROM r0 LEFT JOIN c1 USING (id)),
      |c2 AS (
      |  SELECT e.dst AS id, sum(r1.r // deg.outdeg)::BIGINT AS s
      |  FROM e JOIN deg USING (src) JOIN r1 ON r1.id = e.src GROUP BY 1),
      |r2 AS MATERIALIZED (
      |  SELECT r1.id,
      |    (150000 + (850000 * coalesce(c2.s, 0)) // 1000000)::BIGINT AS r
      |  FROM r1 LEFT JOIN c2 USING (id)),
      |c3 AS (
      |  SELECT e.dst AS id, sum(r2.r // deg.outdeg)::BIGINT AS s
      |  FROM e JOIN deg USING (src) JOIN r2 ON r2.id = e.src GROUP BY 1),
      |r3 AS MATERIALIZED (
      |  SELECT r2.id,
      |    (150000 + (850000 * coalesce(c3.s, 0)) // 1000000)::BIGINT AS r
      |  FROM r2 LEFT JOIN c3 USING (id)),
      |d1 AS (SELECT max(abs(r1.r - r0.r))::BIGINT AS d
      |       FROM r1 JOIN r0 USING (id)),
      |d2 AS (SELECT max(abs(r2.r - r1.r))::BIGINT AS d
      |       FROM r2 JOIN r1 USING (id)),
      |d3 AS (SELECT max(abs(r3.r - r2.r))::BIGINT AS d
      |       FROM r3 JOIN r2 USING (id))
      |SELECT 1::BIGINT AS iter, d AS max_delta_micro FROM d1
      |UNION ALL SELECT 2, d FROM d2
      |UNION ALL SELECT 3, d FROM d3
      |ORDER BY iter""".stripMargin

  // --- q157: hubs and authorities (integer-exact HITS) --------------------

  /** Two HITS rounds over the same synthesized citation graph as q133 —
    * the directory-vs-cited-content split PageRank's single score
    * conflates. Max-normalized integer power iteration (top score
    * pinned at 1e6, floor divisions both engines share); the oracle
    * re-runs both full rounds — four sum/normalize passes — in SQL and
    * must match every node's auth and hub micro-score exactly. */
  def q157Hits(spark: SparkSession, dir: String): DataFrame = {
    val docs = tp(spark, dir, "documents")
    val n = docs.count()
    val edges = docs.select(col("doc_id").as("src"),
        pmod(col("doc_id") * 7 + 1, lit(n)).as("dst"))
      .union(docs.select(col("doc_id").as("src"),
        pmod(col("doc_id") * 13 + 3, lit(n)).as("dst")))
    graft.operators.Centrality.hits(edges, "src", "dst", iters = 2)
      .select(col("id").as("doc_id"), col("auth_micro"), col("hub_micro"))
      .orderBy("doc_id")
  }

  val q157Sql: String =
    """WITH nn AS (SELECT count(*)::BIGINT AS n FROM documents),
      |e AS (
      |  SELECT doc_id AS src, (doc_id * 7 + 1) % nn.n AS dst
      |  FROM documents CROSS JOIN nn
      |  UNION ALL
      |  SELECT doc_id, (doc_id * 13 + 3) % nn.n
      |  FROM documents CROSS JOIN nn),
      |nodes AS (SELECT src AS id FROM e UNION SELECT dst FROM e),
      |h0 AS (SELECT id, 1000000::BIGINT AS h FROM nodes),
      |a1r AS (SELECT e.dst AS id, sum(h0.h)::BIGINT AS s
      |        FROM e JOIN h0 ON h0.id = e.src GROUP BY 1),
      |a1m AS (SELECT max(s)::BIGINT AS m FROM a1r),
      |a1 AS (SELECT nodes.id,
      |         ((1000000 * coalesce(a1r.s, 0)) // a1m.m)::BIGINT AS a
      |       FROM nodes LEFT JOIN a1r USING (id) CROSS JOIN a1m),
      |h1r AS (SELECT e.src AS id, sum(a1.a)::BIGINT AS s
      |        FROM e JOIN a1 ON a1.id = e.dst GROUP BY 1),
      |h1m AS (SELECT max(s)::BIGINT AS m FROM h1r),
      |h1 AS (SELECT nodes.id,
      |         ((1000000 * coalesce(h1r.s, 0)) // h1m.m)::BIGINT AS h
      |       FROM nodes LEFT JOIN h1r USING (id) CROSS JOIN h1m),
      |a2r AS (SELECT e.dst AS id, sum(h1.h)::BIGINT AS s
      |        FROM e JOIN h1 ON h1.id = e.src GROUP BY 1),
      |a2m AS (SELECT max(s)::BIGINT AS m FROM a2r),
      |a2 AS (SELECT nodes.id,
      |         ((1000000 * coalesce(a2r.s, 0)) // a2m.m)::BIGINT AS a
      |       FROM nodes LEFT JOIN a2r USING (id) CROSS JOIN a2m),
      |h2r AS (SELECT e.src AS id, sum(a2.a)::BIGINT AS s
      |        FROM e JOIN a2 ON a2.id = e.dst GROUP BY 1),
      |h2m AS (SELECT max(s)::BIGINT AS m FROM h2r),
      |h2 AS (SELECT nodes.id,
      |         ((1000000 * coalesce(h2r.s, 0)) // h2m.m)::BIGINT AS h
      |       FROM nodes LEFT JOIN h2r USING (id) CROSS JOIN h2m)
      |SELECT a2.id AS doc_id, a2.a AS auth_micro, h2.h AS hub_micro
      |FROM a2 JOIN h2 ON a2.id = h2.id ORDER BY doc_id""".stripMargin

  // --- q136: crawl snapshot diff ------------------------------------------

  /** Incremental-crawl diff report: the "new crawl" is synthesized from
    * the corpus (1-in-7 pages vanish, 1-in-5 of the survivors change
    * content, 1-in-10 spawn a brand-new id) and diffed against the
    * original by id + canonical fingerprint. Only (id, 16-byte
    * fingerprint) pairs cross the full-outer join — never text. The
    * oracle rebuilds the same synthetic crawl and replays the diff. */
  def q136SnapshotDiff(spark: SparkSession, dir: String): DataFrame = {
    val docs = tp(spark, dir, "documents")
    val survivors = docs.filter(col("doc_id") % 7 =!= 0)
      .select(col("doc_id"),
        when(col("doc_id") % 5 === 0, concat(col("text"), lit(" updated")))
          .otherwise(col("text")).as("text"))
    val fresh = docs.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 100000).as("doc_id"), col("text"))
    graft.operators.Snapshot.diff(
      docs, survivors.unionByName(fresh), "doc_id", "text")
      .orderBy("doc_id")
  }

  // --- q154: dataset checksum ----------------------------------------------

  /** Order-invariant corpus checksums ([[graft.operators.Snapshot
    * .checksum]]) for the original corpus and the q136 synthetic new
    * crawl — the reproducibility-ledger stamp that answers "is this
    * bit-for-bit the corpus that trained run X?" without any row
    * ordering or single-partition funnel. The oracle recomputes both
    * stamps from the same salted md5 row hashes. */
  def q154DatasetChecksum(spark: SparkSession, dir: String): DataFrame = {
    val docs = tp(spark, dir, "documents")
    val survivors = docs.filter(col("doc_id") % 7 =!= 0)
      .select(col("doc_id"),
        when(col("doc_id") % 5 === 0, concat(col("text"), lit(" updated")))
          .otherwise(col("text")).as("text"))
    val fresh = docs.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 100000).as("doc_id"), col("text"))
    val newCrawl = survivors.unionByName(fresh)
    graft.operators.Snapshot.checksum(docs, "doc_id", "text")
      .withColumn("arm", lit("old"))
      .unionByName(graft.operators.Snapshot.checksum(newCrawl, "doc_id", "text")
        .withColumn("arm", lit("new")))
      .select(col("arm"), col("n_rows"), col("fp_sum"), col("fp_xor"))
      .orderBy("arm")
  }

  val q154Sql: String =
    """WITH newd AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 5 = 0 THEN text || ' updated' ELSE text END AS text
      |  FROM documents WHERE doc_id % 7 <> 0
      |  UNION ALL
      |  SELECT doc_id + 100000, text FROM documents WHERE doc_id % 10 = 0),
      |ho AS (
      |  SELECT (('0x' || substr(md5(coalesce(doc_id::VARCHAR, '__graft_null_id__') || '|' ||
      |    coalesce(text, '')), 1, 15))::UBIGINT)::BIGINT AS h
      |  FROM documents),
      |hn AS (
      |  SELECT (('0x' || substr(md5(coalesce(doc_id::VARCHAR, '__graft_null_id__') || '|' ||
      |    coalesce(text, '')), 1, 15))::UBIGINT)::BIGINT AS h
      |  FROM newd)
      |SELECT 'old' AS arm, count(*)::BIGINT AS n_rows,
      |  (sum(h) % 2305843009213693952)::BIGINT AS fp_sum,
      |  bit_xor(h) AS fp_xor FROM ho
      |UNION ALL
      |SELECT 'new', count(*)::BIGINT,
      |  (sum(h) % 2305843009213693952)::BIGINT, bit_xor(h) FROM hn
      |ORDER BY arm""".stripMargin

  val q136Sql: String =
    """WITH newd AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 5 = 0 THEN text || ' updated' ELSE text END AS text
      |  FROM documents WHERE doc_id % 7 <> 0
      |  UNION ALL
      |  SELECT doc_id + 100000, text FROM documents WHERE doc_id % 10 = 0),
      |o AS (
      |  SELECT doc_id,
      |    md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS f
      |  FROM documents),
      |n AS (
      |  SELECT doc_id,
      |    md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS f
      |  FROM newd)
      |SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
      |  CASE WHEN o.doc_id IS NULL THEN 'added'
      |       WHEN n.doc_id IS NULL THEN 'removed'
      |       WHEN o.f IS NOT DISTINCT FROM n.f THEN 'unchanged'
      |       ELSE 'changed' END AS status
      |FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id
      |ORDER BY doc_id""".stripMargin

  // --- q140: per-source winsorized length metric --------------------------

  /** Winsorize `n_chars` to each source's exact [p5, p95] band — the
    * outlier clipping a heavy-tailed metric gets before feeding a gate
    * or a mixture weight. The oracle replays the integer rank rule and
    * the clip, so the exact-percentile machinery itself is verified. */
  def q140Winsorize(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Winsorize.winsorize(
      tp(spark, dir, "documents").select("doc_id", "source", "n_chars"),
      "source", "n_chars", loPct = 5, hiPct = 95)
      .select(col("doc_id"), col("source"), col("n_chars"),
        col("cut_lo"), col("cut_hi"), col("n_chars_clipped"))
      .orderBy("doc_id")

  val q140Sql: String =
    """WITH hist AS (
      |  SELECT source, n_chars, count(*)::BIGINT AS c
      |  FROM documents GROUP BY 1, 2),
      |cum AS (
      |  SELECT source, n_chars, c,
      |    sum(c) OVER (PARTITION BY source ORDER BY n_chars) AS cum
      |  FROM hist),
      |tot AS (SELECT source, sum(c) AS n FROM hist GROUP BY 1),
      |cuts AS (
      |  SELECT cum.source,
      |    min(CASE WHEN cum >= (5 * n + 99) // 100 THEN n_chars END) AS cut_lo,
      |    min(CASE WHEN cum >= (95 * n + 99) // 100 THEN n_chars END) AS cut_hi
      |  FROM cum JOIN tot USING (source) GROUP BY 1)
      |SELECT d.doc_id, d.source, d.n_chars, c.cut_lo, c.cut_hi,
      |  least(greatest(d.n_chars, c.cut_lo), c.cut_hi) AS n_chars_clipped
      |FROM documents d JOIN cuts c USING (source)
      |ORDER BY d.doc_id""".stripMargin

  // --- q105: fastText-style quality classifier (pinned-model scoring) -----

  /** Exported-model quality scoring — the production arc of the
    * model-based gate: the classifier trains OFFLINE (covered
    * behaviorally by QualityClassifierSpec — float gradient sums make
    * trained coefficients non-replayable in SQL), exports its term
    * weights, and the corpus is scored map-side against the pinned
    * integer micro-weight table. Even-id docs are dressed as reference
    * prose, odd-id as boilerplate junk; the pinned model must separate
    * them. Integer dot products make the result order-independent and
    * exactly DuckDB-replayable — the hash oracle the train-and-score
    * formulation could never have. */
  def q105QualityFilter(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.QualityClassifier
    val pages = tp(spark, dir, "documents").select(
      col("doc_id"),
      when(col("doc_id") % 2 === 0,
        concat(col("text"), lit(" curated encyclopedic reference article")))
        .otherwise(concat(col("text"),
          lit(" click here buy now limited offer click here")))
        .as("page"),
      when(col("doc_id") % 2 === 0, 1L).otherwise(0L).as("label"))
    QualityClassifier.scorePinned(pages, "page",
      q105MicroWeights, microBias = q105MicroBias)
      .select(col("doc_id"), col("label"), col("quality_micro"),
        round(col("quality_prob"), 6).as("quality_score"),
        when(col("quality_micro") >= 0L, 1L).otherwise(0L).as("kept"))
      .orderBy("doc_id")
  }

  /** The pinned export: positive weight on reference-prose markers,
    * negative on boilerplate, in exact 1e-6 units. `kept` derives from
    * the sign of the INTEGER dot product (threshold prob 0.5 ⇔ micro ≥ 0)
    * so the flag never depends on a float comparison. */
  private val q105MicroWeights: Map[String, Long] = Map(
    "curated" -> 1500000L, "encyclopedic" -> 2000000L,
    "reference" -> 1000000L, "article" -> 500000L,
    "click" -> -1200000L, "buy" -> -800000L, "now" -> -600000L,
    "limited" -> -700000L, "offer" -> -900000L, "here" -> -400000L,
    "click here" -> -2000000L, "buy now" -> -1500000L)
  private val q105MicroBias: Long = 200000L

  /** Replays the pinned scoring exactly: same tokenizer CTE as q103, the
    * weight table as VALUES, integer dot product + micro-bias, one
    * sigmoid on the total. `kept` compares the integer, not the float. */
  val q105Sql: String =
    """WITH w(t, mw) AS (VALUES
      |  ('curated', 1500000), ('encyclopedic', 2000000),
      |  ('reference', 1000000), ('article', 500000),
      |  ('click', -1200000), ('buy', -800000), ('now', -600000),
      |  ('limited', -700000), ('offer', -900000), ('here', -400000),
      |  ('click here', -2000000), ('buy now', -1500000)),
      |docs AS (
      |  SELECT doc_id,
      |    CAST(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END AS BIGINT) AS label,
      |    text || CASE WHEN doc_id % 2 = 0
      |      THEN ' curated encyclopedic reference article'
      |      ELSE ' click here buy now limited offer click here' END AS page
      |  FROM documents),
      |toks AS (
      |  SELECT doc_id, label,
      |    list_filter(regexp_split_to_array(trim(lower(page)), '\s+'), x -> x <> '') AS wl
      |  FROM docs),
      |terms AS (
      |  SELECT doc_id, unnest(wl) AS t FROM toks
      |  UNION ALL
      |  SELECT doc_id, unnest([wl[i] || ' ' || wl[i+1] for i in range(1, len(wl))]) AS t
      |  FROM toks WHERE len(wl) >= 2),
      |dot AS (
      |  SELECT terms.doc_id, CAST(sum(w.mw) AS BIGINT) AS s
      |  FROM terms JOIN w ON terms.t = w.t GROUP BY 1),
      |sc AS (
      |  SELECT t.doc_id, t.label, coalesce(dot.s, 0) + 200000 AS micro
      |  FROM toks t LEFT JOIN dot ON t.doc_id = dot.doc_id)
      |SELECT doc_id, label, CAST(micro AS BIGINT) AS quality_micro,
      |  round(1.0 / (1.0 + exp(-(micro::DOUBLE / 1000000.0))), 6) AS quality_score,
      |  CAST(CASE WHEN micro >= 0 THEN 1 ELSE 0 END AS BIGINT) AS kept
      |FROM sc ORDER BY doc_id""".stripMargin

  // --- q146: exact per-source percentiles ----------------------------------

  /** Exact p50/p90/p99 of the length metric per source — the
    * hash-verifiable percentile report (`approxQuantile` drifts with
    * sampling and can never oracle), resolved through [[graft.operators
    * .RankCuts]]' bounded radix search instead of a per-group histogram
    * window. The oracle replays the integer rank rule. */
  def q146ExactPercentiles(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Quantiles.exactPercentiles(
      tp(spark, dir, "documents"), "source", "n_chars", Seq(50, 90, 99))
      .orderBy("source")

  val q146Sql: String =
    """WITH hist AS (
      |  SELECT source, n_chars, count(*)::BIGINT AS c
      |  FROM documents GROUP BY 1, 2),
      |cum AS (
      |  SELECT source, n_chars, c,
      |    sum(c) OVER (PARTITION BY source ORDER BY n_chars) AS cum
      |  FROM hist),
      |tot AS (SELECT source, sum(c) AS n FROM hist GROUP BY 1)
      |SELECT cum.source,
      |  min(CASE WHEN cum >= (50 * n + 99) // 100 THEN n_chars END) AS p50,
      |  min(CASE WHEN cum >= (90 * n + 99) // 100 THEN n_chars END) AS p90,
      |  min(CASE WHEN cum >= (99 * n + 99) // 100 THEN n_chars END) AS p99
      |FROM cum JOIN tot USING (source)
      |GROUP BY 1 ORDER BY source""".stripMargin

  /** Seen-ledger lifecycle as a query ([[graft.operators.SeenLedger]]):
    * three overlapping synthetic crawls carved from the documents table
    * (crawl c holds docs with doc_id % 3 <= c, so each recrawls
    * everything the previous one saw), appended in order to a fresh
    * on-disk ledger. Dedupe-on-append must land every fingerprint
    * exactly once, under the crawl of FIRST sight — so the per-crawl
    * ledger counts equal the oracle's min-first-crawl distinct-
    * fingerprint histogram, and their sum is the corpus's distinct
    * content mass (the ledger never holds N x it). */
  def q203SeenLedger(spark: SparkSession, dir: String): DataFrame = {
    val docs = tp(spark, dir, "documents").select(col("doc_id"), col("text"))
    val path = java.nio.file.Files
      .createTempDirectory("graft_q203_ledger").toString + "/ledger"
    (0 to 2).foreach { c =>
      graft.operators.SeenLedger.append(
        graft.operators.Dedup.exactGroups(
          docs.filter(col("doc_id") % 3 <= c), "doc_id", "text"),
        path, s"crawl-$c")
    }
    graft.operators.SeenLedger.read(spark, path)
      .groupBy(col("crawl_id"))
      .agg(count(lit(1)).as("appended"))
      .orderBy("crawl_id")
  }

  val q203Sql: String =
    """WITH fp AS (
      |  SELECT md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS f,
      |    CAST(doc_id % 3 AS INTEGER) AS first_crawl
      |  FROM documents),
      |firsts AS (SELECT f, min(first_crawl) AS c FROM fp GROUP BY 1)
      |SELECT 'crawl-' || CAST(c AS VARCHAR) AS crawl_id,
      |  count(*) AS appended
      |FROM firsts GROUP BY 1 ORDER BY 1""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q203_seen_ledger" -> q203SeenLedger _,
    "q146_exact_percentiles" -> q146ExactPercentiles _,
    "q103_lm_score" -> q103LmScore _,
    "q110_lm_broadcast" -> q110LmBroadcast _,
    "q115_ppl_buckets" -> q115PerplexityBuckets _,
    "q116_curation_e2e" -> q116CurationPipeline _,
    "q120_corpus_report" -> q120CorpusReport _,
    "q123_length_buckets" -> q123LengthBuckets _,
    "q105_quality_filter" -> q105QualityFilter _,
    "q124_dsir_select" -> q124DsirSelect _,
    "q133_pagerank" -> q133PageRank _,
    "q136_snapshot_diff" -> q136SnapshotDiff _,
    "q154_dataset_checksum" -> q154DatasetChecksum _,
    "q155_kneser_ney" -> q155KneserNey _,
    "q180_kneser_ney_trigram" -> q180KneserNeyTrigram _,
    "q156_kl_drift" -> q156KlDrift _,
    "q189_js_drift" -> q189JsDrift _,
    "q193_kappa" -> q193Kappa _,
    "q196_fleiss_kappa" -> q196FleissKappa _,
    "q157_hits" -> q157Hits _,
    "q159_distinctive_terms" -> q159DistinctiveTerms _,
    "q161_mad_outliers" -> q161MadOutliers _,
    "q163_classifier_auc" -> q163ClassifierAuc _,
    "q164_calibration" -> q164Calibration _,
    "q165_psi" -> q165Psi _,
    "q173_rank_agreement" -> q173RankAgreement _,
    "q176_new_vocab" -> q176NewVocab _,
    "q177_pearson" -> q177Pearson _,
    "q195_spearman" -> q195Spearman _,
    "q181_vocab_shape" -> q181VocabShape _,
    "q186_source_similarity" -> q186SourceSimilarity _,
    "q188_pagerank_convergence" -> q188PageRankConvergence _,
    "q140_winsorize" -> q140Winsorize _,
    "q65_repetition_signals" -> q65Repetition _,
    "q66_pii_scrub" -> q66PiiScrub _,
    "q67_gopher_filter" -> q67GopherFilter _,
    "q68_decontaminate" -> q68Decontaminate _,
    "q69_pack_sequences" -> q69PackSequences _,
    "q74_pack_slices" -> q74PackSlices _,
    "q77_token_budget" -> q77TokenBudget _)

  val oracles: Map[String, String] = Map(
    "q203_seen_ledger" -> q203Sql,
    "q146_exact_percentiles" -> q146Sql,
    "q103_lm_score" -> q103Sql,
    "q110_lm_broadcast" -> q110Sql,
    "q115_ppl_buckets" -> q115Sql,
    "q116_curation_e2e" -> q116Sql,
    "q120_corpus_report" -> q120Sql,
    "q123_length_buckets" -> q123Sql,
    "q105_quality_filter" -> q105Sql,
    "q124_dsir_select" -> q124Sql,
    "q133_pagerank" -> q133Sql,
    "q136_snapshot_diff" -> q136Sql,
    "q154_dataset_checksum" -> q154Sql,
    "q155_kneser_ney" -> q155Sql,
    "q180_kneser_ney_trigram" -> q180Sql,
    "q156_kl_drift" -> q156Sql,
    "q189_js_drift" -> q189Sql,
    "q193_kappa" -> q193Sql,
    "q196_fleiss_kappa" -> q196Sql,
    "q157_hits" -> q157Sql,
    "q159_distinctive_terms" -> q159Sql,
    "q161_mad_outliers" -> q161Sql,
    "q163_classifier_auc" -> q163Sql,
    "q164_calibration" -> q164Sql,
    "q165_psi" -> q165Sql,
    "q173_rank_agreement" -> q173Sql,
    "q176_new_vocab" -> q176Sql,
    "q177_pearson" -> q177Sql,
    "q195_spearman" -> q195Sql,
    "q181_vocab_shape" -> q181Sql,
    "q186_source_similarity" -> q186Sql,
    "q188_pagerank_convergence" -> q188Sql,
    "q140_winsorize" -> q140Sql,
    "q65_repetition_signals" -> q65Sql,
    "q66_pii_scrub" -> q66Sql,
    "q67_gopher_filter" -> q67Sql,
    "q68_decontaminate" -> q68Sql,
    "q69_pack_sequences" -> q69Sql,
    "q74_pack_slices" -> q74Sql,
    "q77_token_budget" -> q77Sql)
}

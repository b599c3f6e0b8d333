package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.ops.Parallelism

/** Corpus-trained n-gram language-model quality scoring — the CCNet-style
  * curation step (Wenzek et al. 2020 score web pages with a KenLM model
  * and keep the low-perplexity head; this is the same shape with the LM
  * trained on the corpus itself): an add-one-smoothed bigram model is
  * counted over the whole corpus, then every document is scored by its
  * mean per-bigram negative log2 probability ("bits per bigram" — low =
  * fluent/common phrasing, high = rare or garbled phrasing).
  *
  * Determinism across engines: a floating-point SUM of log terms is
  * order-dependent, so each per-bigram log2 term is first rounded to
  * integer MICRO-bits (round(term * 1e6) as long) and the per-document
  * accumulation is exact integer arithmetic — reproducible under any
  * partitioning and re-computable independently in DuckDB/any SQL engine.
  * The only cross-engine float ops left are one division and one log2 per
  * DISTINCT (bigram, unigram) count pair, each a single IEEE op chain.
  *
  * Scale shape: two word-count aggregations (map-side combined; only
  * token/bigram strings and counts shuffle, never document text), one
  * key-co-partitioned join of exploded bigrams against the count tables,
  * and one (id, long) aggregation. The vocabulary size V is one
  * metadata-cheap distinct-count job. At 100 TB the documented
  * approximation seam is pruning the LM to top-N bigrams with an OOV
  * floor and broadcasting it — same scoring expression, no shuffle join.
  */
object LanguageModel {

  private val Dup = "__graft_"

  /** Lowercased whitespace tokens of `textCol` — the ONE tokenizer both
    * scoring paths share. */
  private def tokCol(textCol: String): Column =
    TextFunctions.tokens(lower(col(textCol)))

  /** Per-row "w1 w2" bigram array (tokens cannot contain spaces); empty
    * for docs with < 2 tokens (and for null text — `when` on a null size
    * falls through to the empty branch, matching the exact path's
    * no-bigrams outcome). */
  private def bigramArr(w: Column): Column =
    // native one-pass shingle kernel (value-identical to the retired
    // zip_with-of-two-slices form: same "w1 w2" strings, empty for < 2
    // tokens); coalesce keeps the null-text -> empty contract
    coalesce(graft.functions.Expressions.word_shingles(w, 2),
      array().cast("array<string>"))

  /** Per-document bigram-LM score: (idCol, passthrough..., n_bigrams,
    * lm_bits).
    * `lm_bits` = mean negative log2 P(w2|w1) over the doc's bigrams with
    * add-one smoothing (P = (c12+1)/(c1+V)); null when the doc has < 2
    * tokens (no bigrams). Tokenization = lowercased whitespace split,
    * matching [[TextFunctions.tokens]].
    * `passthrough` columns of `df` ride the EXISTING id-spine join (r12)
    * — a caller that needs them alongside the score (perplexityBuckets'
    * group label) previously paid a second row-scale id join. */
  def bigramBits(df: DataFrame, idCol: String, textCol: String,
                 passthrough: Seq[String] = Nil): DataFrame = {
    val toks = df.select(col(idCol), tokCol(textCol).as(s"${Dup}w"))
    val w = col(s"${Dup}w")
    val bigrams = toks.select(col(idCol), bigramArr(w).as(s"${Dup}bg"))
      .select(col(idCol), explode(col(s"${Dup}bg")).as(s"${Dup}bg"))
      .withColumn(s"${Dup}w1", substring_index(col(s"${Dup}bg"), " ", 1))
    // staged: the unigram table feeds two consumers (vocab count + the
    // scoring join) — materialize once instead of re-counting the corpus
    val uni = Parallelism.stage(toks.select(explode(w).as(s"${Dup}t"))
      .groupBy(col(s"${Dup}t")).agg(count(lit(1)).as(s"${Dup}c1")))
    val big = bigrams.groupBy(col(s"${Dup}bg"))
      .agg(count(lit(1)).as(s"${Dup}c12"))
    val vocab = uni.count() // cheap: counts the staged table, not the corpus
    val term = log2((col(s"${Dup}c12") + 1).cast("double") /
      (col(s"${Dup}c1") + lit(vocab)))
    val scored = bigrams
      .join(big, Seq(s"${Dup}bg"))
      .join(uni, bigrams(s"${Dup}w1") === uni(s"${Dup}t"))
      .withColumn(s"${Dup}micro", round(term * 1e6, 0).cast("long"))
      .groupBy(col(idCol))
      .agg(sum(col(s"${Dup}micro")).as(s"${Dup}s"),
        count(lit(1)).as("n_bigrams"))
      .withColumn("lm_bits",
        round((-col(s"${Dup}s")).cast("double") / col("n_bigrams") / 1e6, 6))
    df.select(col(idCol) +: passthrough.map(col): _*)
      .join(scored, Seq(idCol), "left")
      .select(col(idCol) +: passthrough.map(col) :+
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams") :+
        col("lm_bits"): _*)
  }

  /** Broadcast pruned-LM scoring — the 100 TB shape the [[bigramBits]]
    * scaladoc documents: the trained bigram model prunes to its `topN`
    * most frequent bigrams (count DESC, bigram ASC — a total order, so
    * the cut is deterministic and engine-reproducible), each head
    * bigram's integer micro-bit term precomputes ONCE with the exact
    * path's log2 expression, and the whole head ships to executors as a
    * broadcast map. Scoring is then a pure per-row pass over each
    * document's bigram array — NO shuffle join of exploded bigrams, no
    * bigram-keyed exchange at all (PlanSpec pins this), which also
    * removes the hot-bigram skew shape entirely: a bigram carrying 25%
    * of corpus mass is just one more map entry instead of one reducer's
    * join partition.
    *
    * Bigrams outside the head score the OOV floor `log2(1/V)` micro-bits
    * — the add-one term of an unseen bigram after an unseen context word,
    * the most optimistic unseen estimate (pass `oovMicro` to pin a
    * pessimistic floor instead). Whenever every bigram of a document is
    * in the head, the result is IDENTICAL to [[bigramBits]] (CurationSpec
    * proves the equality; q110's oracle replays head + floor exactly).
    *
    * The model build still aggregates the corpus once (token/bigram
    * counts — map-side combined, text never shuffles); only the pruned
    * head (≤ topN rows, explicitly bounded) is collected. */
  def bigramBitsBroadcast(df: DataFrame, idCol: String, textCol: String,
      topN: Int, oovMicro: Option[Long] = None,
      passthrough: Seq[String] = Nil): DataFrame = {
    require(topN >= 1 && topN <= 5000000,
      s"topN=$topN: the pruned head collects to the driver (bounded)")
    val toks = df.select(tokCol(textCol).as(s"${Dup}w"))
    val w = col(s"${Dup}w")
    val uni = Parallelism.stage(toks.select(explode(w).as(s"${Dup}t"))
      .groupBy(col(s"${Dup}t")).agg(count(lit(1)).as(s"${Dup}c1")))
    val big = toks.select(explode(bigramArr(w)).as(s"${Dup}bg"))
      .groupBy(col(s"${Dup}bg")).agg(count(lit(1)).as(s"${Dup}c12"))
    val vocab = uni.count()
    // head join AFTER the limit: topN rows join the unigram table, not
    // the full bigram census; micro uses the exact path's expression so
    // head terms are bit-identical to bigramBits'
    val head = big
      .orderBy(col(s"${Dup}c12").desc, col(s"${Dup}bg").asc)
      .limit(topN)
      .withColumn(s"${Dup}w1", substring_index(col(s"${Dup}bg"), " ", 1))
      .join(uni, col(s"${Dup}w1") === uni(s"${Dup}t"))
      .select(col(s"${Dup}bg"),
        round(log2((col(s"${Dup}c12") + 1).cast("double") /
          (col(s"${Dup}c1") + lit(vocab))) * 1e6, 0).cast("long")
          .as(s"${Dup}m"))
      .collect()
    // the floor evaluates through the same Spark round/log2 kernel as
    // the head terms (a 1-row job), not driver-side math — one source of
    // truth for the float ops the oracle replays
    val floor = oovMicro.getOrElse(
      if (vocab == 0L) 0L
      else df.sparkSession.range(1)
        .select(round(log2(lit(1.0) / lit(vocab.toDouble)) * 1e6, 0)
          .cast("long").as("f")).head().getLong(0))
    val bc = df.sparkSession.sparkContext.broadcast(
      head.map(r => r.getString(0) -> r.getLong(1)).toMap)
    val sumMicro = udf((bgs: Seq[String]) =>
      if (bgs == null) null
      else {
        val m = bc.value
        var s = 0L
        bgs.foreach(b => s += m.getOrElse(b, floor))
        java.lang.Long.valueOf(s)
      })
    df.withColumn(s"${Dup}bgs", bigramArr(tokCol(textCol)))
      .withColumn("n_bigrams", size(col(s"${Dup}bgs")).cast("long"))
      .withColumn(s"${Dup}s", sumMicro(col(s"${Dup}bgs")))
      .withColumn("lm_bits",
        when(col("n_bigrams") > 0,
          round((-col(s"${Dup}s")).cast("double") / col("n_bigrams") / 1e6, 6))
          .otherwise(lit(null).cast("double")))
      .select(col(idCol) +: passthrough.map(col) :+
        col("n_bigrams") :+ col("lm_bits"): _*)
  }

  /** Kneser–Ney smoothed bigram scoring (Kneser & Ney 1995; the
    * interpolated form of Chen & Goodman 1999) — the smoothing family
    * real KenLM-style curation models use, next to [[bigramBits]]'s
    * add-one baseline. Absolute discount D from every seen bigram, the
    * freed mass re-spent on the CONTINUATION unigram ("how many
    * contexts does w2 follow?" — the 'san francisco' fix: frequent but
    * context-locked words stop inflating unseen estimates):
    *
    *   P(w2|w1) = (c12 − D)/c1 + D·N1+(w1·)/c1 · N1+(·w2)/B
    *
    * with c1 = Σ_w2 c12 (context mass), N1+(w1·)/N1+(·w2) the distinct
    * continuation counts, B = distinct bigram types. Trained on the
    * corpus it scores, so every scored bigram is in the census and the
    * max(c12−D, 0) clamp never binds (c12 ≥ 1 > D).
    *
    * Scale + determinism discipline is [[bigramBits]]': ONE bigram
    * census (map-side combined, text never shuffles) from which c1,
    * N1+(w1·) (sum + row count per w1), N1+(·w2) (row count per w2)
    * and B (1-row agg) all derive — no second corpus pass — then the
    * scoring join, per-bigram micro-bit rounding, exact integer
    * per-doc sums. The float work is one IEEE chain per DISTINCT
    * bigram, replayable in any engine. Output: (idCol, n_bigrams,
    * kn_bits); null kn_bits for docs with < 2 tokens. */
  def kneserNeyBits(df: DataFrame, idCol: String, textCol: String,
      discount: Double = 0.75): DataFrame = {
    require(discount > 0.0 && discount < 1.0, s"discount=$discount not in (0,1)")
    val toks = df.select(col(idCol), tokCol(textCol).as(s"${Dup}w"))
    val w = col(s"${Dup}w")
    val bigrams = toks.select(col(idCol), explode(bigramArr(w)).as(s"${Dup}bg"))
    // the ONE census; everything else reads it, not the corpus
    val census = Parallelism.stage(bigrams.groupBy(col(s"${Dup}bg"))
      .agg(count(lit(1)).as(s"${Dup}c12"))
      .withColumn(s"${Dup}w1", substring_index(col(s"${Dup}bg"), " ", 1))
      .withColumn(s"${Dup}w2", substring_index(col(s"${Dup}bg"), " ", -1)))
    val byW1 = census.groupBy(col(s"${Dup}w1").as(s"${Dup}k1"))
      .agg(sum(col(s"${Dup}c12")).as(s"${Dup}c1"),
        count(lit(1)).as(s"${Dup}nf"))
    val byW2 = census.groupBy(col(s"${Dup}w2").as(s"${Dup}k2"))
      .agg(count(lit(1)).as(s"${Dup}nb"))
    val bTypes = census.count() // 1-row agg over the census, not the corpus
    val d = lit(discount)
    val term = log2(
      (col(s"${Dup}c12").cast("double") - d) / col(s"${Dup}c1").cast("double") +
        d * col(s"${Dup}nf").cast("double") / col(s"${Dup}c1").cast("double") *
          (col(s"${Dup}nb").cast("double") / lit(bTypes.toDouble)))
    val scored = bigrams
      .join(census, Seq(s"${Dup}bg"))
      .join(byW1, col(s"${Dup}w1") === col(s"${Dup}k1"))
      .join(byW2, col(s"${Dup}w2") === col(s"${Dup}k2"))
      .withColumn(s"${Dup}micro", round(term * 1e6, 0).cast("long"))
      .groupBy(col(idCol))
      .agg(sum(col(s"${Dup}micro")).as(s"${Dup}s"),
        count(lit(1)).as("n_bigrams"))
      .withColumn("kn_bits",
        round((-col(s"${Dup}s")).cast("double") / col("n_bigrams") / 1e6, 6))
    df.select(col(idCol))
      .join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        col("kn_bits"))
  }

  /** Interpolated TRIGRAM Kneser–Ney (Chen & Goodman 1999 §3 — the
    * recursive interpolated form [[kneserNeyBits]] documents as its
    * base case, one level up). The highest order discounts real
    * counts; every LOWER order is estimated from CONTINUATION counts
    * (type counts, not token counts), the defining KN move:
    *
    *   P(w3|w1w2) = (c123 − D)/c12• + D·N1+(w1w2·)/c12• · P(w3|w2)
    *   P(w3|w2)   = (N1+(·w2w3) − D)/N1+(·w2·)
    *                  + D·N1+(w2·)/N1+(·w2·) · N1+(·w3)/B
    *
    * where c12• = Σ_w3 c123, every N1+ is a distinct-type count in the
    * trigram census, and B = distinct (w2,w3) types. All lower-order
    * statistics derive from the SAME single trigram census (the
    * (w2,w3)-grouped type table yields N1+(·w2w3), its w2-rollup
    * yields both N1+(·w2·) and N1+(w2·), its w3-rollup yields
    * N1+(·w3)) — one corpus pass, everything after it keyed on the
    * distinct-trigram space. Trained on the corpus it scores, so every
    * scored trigram is in the census and no clamp binds (c123 ≥ 1 > D,
    * N1+ ≥ 1 > D).
    *
    * Exactness discipline is [[kneserNeyBits]]': integer censuses, ONE
    * IEEE chain per distinct trigram micro-rounded at 1e-6 bits, exact
    * integer per-doc sums, one final division rounded at 6dp — the
    * oracle replays the extra census level in SQL. Output: (idCol,
    * n_trigrams, kn3_bits); null kn3_bits for docs with < 3 tokens. */
  def kneserNeyTrigramBits(df: DataFrame, idCol: String, textCol: String,
      discount: Double = 0.75): DataFrame = {
    require(discount > 0.0 && discount < 1.0, s"discount=$discount not in (0,1)")
    val toks = df.select(col(idCol), tokCol(textCol).as(s"${Dup}w"))
    val w = col(s"${Dup}w")
    val triArr = coalesce(graft.functions.Expressions.word_shingles(w, 3),
      array().cast("array<string>"))
    val tris = toks.select(col(idCol), explode(triArr).as(s"${Dup}tg"))
    // the ONE census; every statistic below reads it, not the corpus
    val census = Parallelism.stage(tris.groupBy(col(s"${Dup}tg"))
      .agg(count(lit(1)).as(s"${Dup}c123"))
      .withColumn(s"${Dup}k12", substring_index(col(s"${Dup}tg"), " ", 2))
      .withColumn(s"${Dup}k23", substring_index(col(s"${Dup}tg"), " ", -2)))
    val by12 = census.groupBy(col(s"${Dup}k12").as(s"${Dup}j12"))
      .agg(sum(col(s"${Dup}c123")).as(s"${Dup}ctx12"),
        count(lit(1)).as(s"${Dup}nf12"))
    // (w2,w3) type table: nc23 = N1+(·w2w3); staged — three rollups
    // (w2 twice via one grouping, w3, and B) read it
    val by23 = Parallelism.stage(census
      .groupBy(col(s"${Dup}k23").as(s"${Dup}j23"))
      .agg(count(lit(1)).as(s"${Dup}nc23"))
      .withColumn(s"${Dup}w2", substring_index(col(s"${Dup}j23"), " ", 1))
      .withColumn(s"${Dup}w3", substring_index(col(s"${Dup}j23"), " ", -1)))
    val by2 = by23.groupBy(col(s"${Dup}w2").as(s"${Dup}j2"))
      .agg(sum(col(s"${Dup}nc23")).as(s"${Dup}ndot2dot"), // N1+(·w2·)
        count(lit(1)).as(s"${Dup}nf2"))                   // N1+(w2·)
    val by3 = by23.groupBy(col(s"${Dup}w3").as(s"${Dup}j3"))
      .agg(count(lit(1)).as(s"${Dup}nc3"))                // N1+(·w3)
    val bTypes = by23.count() // counts the staged type table
    val d = lit(discount)
    val pLower =
      (col(s"${Dup}nc23").cast("double") - d) /
        col(s"${Dup}ndot2dot").cast("double") +
      d * col(s"${Dup}nf2").cast("double") /
        col(s"${Dup}ndot2dot").cast("double") *
        (col(s"${Dup}nc3").cast("double") / lit(bTypes.toDouble))
    val term = log2(
      (col(s"${Dup}c123").cast("double") - d) /
        col(s"${Dup}ctx12").cast("double") +
      d * col(s"${Dup}nf12").cast("double") /
        col(s"${Dup}ctx12").cast("double") * pLower)
    // terms per DISTINCT trigram; the doc join only carries the micro
    val terms = census
      .withColumn(s"${Dup}w2c", substring_index(col(s"${Dup}k23"), " ", 1))
      .withColumn(s"${Dup}w3c", substring_index(col(s"${Dup}k23"), " ", -1))
      .join(by12, col(s"${Dup}k12") === col(s"${Dup}j12"))
      .join(by23.select(col(s"${Dup}j23"), col(s"${Dup}nc23")),
        col(s"${Dup}k23") === col(s"${Dup}j23"))
      .join(by2, col(s"${Dup}w2c") === col(s"${Dup}j2"))
      .join(by3, col(s"${Dup}w3c") === col(s"${Dup}j3"))
      .select(col(s"${Dup}tg"),
        round(term * 1e6, 0).cast("long").as(s"${Dup}micro"))
    val scored = tris
      .join(terms, Seq(s"${Dup}tg"))
      .groupBy(col(idCol))
      .agg(sum(col(s"${Dup}micro")).as(s"${Dup}s"),
        count(lit(1)).as("n_trigrams"))
      .withColumn("kn3_bits",
        round((-col(s"${Dup}s")).cast("double") / col("n_trigrams") / 1e6, 6))
    df.select(col(idCol))
      .join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_trigrams"), lit(0L)).as("n_trigrams"),
        col("kn3_bits"))
  }

  /** CCNet-style head selection: keep documents whose bits-per-bigram is
    * at or below `maxBits` (docs too short to score are kept — no
    * evidence against them, the reference pipelines' usual choice). */
  def filterByBits(df: DataFrame, idCol: String, textCol: String,
      maxBits: Double): DataFrame = {
    val keep = bigramBits(df, idCol, textCol)
      .filter(col("lm_bits").isNull || col("lm_bits") <= maxBits)
      .select(col(idCol))
    df.join(keep, Seq(idCol), "left_semi")
  }

  /** CCNet-style perplexity partition (Wenzek et al. 2020): scored
    * documents split into head/middle/tail TERCILES per `groupCol`
    * (language, in CCNet) by bits-per-bigram. Deliberately NOT an
    * `ntile` window over the corpus — per-group ntile puts every
    * document of one language through a single reducer's sort, the
    * classic 100 TB scale-killer. Instead the tercile CUT VALUES are
    * derived from the per-group (bits → count) histogram (distinct
    * scored values only, a sliver of the corpus) and broadcast back, so
    * assignment is one map-side comparison. Thresholds use explicit
    * integer rank arithmetic — t_k = min bits with cumulative count ≥
    * ceil(k·n/3), ties share a bucket (real CCNet semantics: a cut value
    * never splits equal-perplexity docs) — so the oracle replays them
    * without engine-specific quantile interpolation. Unscorable docs
    * (no bigrams) are excluded, as in CCNet.
    * Emits (idCol, groupCol, lm_bits, bucket ∈ head|middle|tail). */
  def perplexityBuckets(df: DataFrame, idCol: String, textCol: String,
      groupCol: String, topN: Option[Int] = None): DataFrame = {
    // topN routes the scoring through the broadcast pruned-LM path (the
    // q110/100 TB shape: zero bigram-keyed exchanges); the tercile
    // machinery downstream is identical either way, and whenever every
    // doc's bigrams sit in the head the buckets match the exact path
    // the group label rides bigramBits' OWN id-spine join (r12) — the
    // second row-scale id join this method used to pay is gone
    val scored = topN match {
      case Some(n) =>
        bigramBitsBroadcast(df, idCol, textCol, n,
          passthrough = Seq(groupCol))
      case None => bigramBits(df, idCol, textCol,
        passthrough = Seq(groupCol))
    }
    val g = scored.filter(col("lm_bits").isNotNull)
      .select(col(idCol), col(groupCol), col("lm_bits"))
      .transform(graft.ops.Parallelism.stage) // histogram + assign reuse
    // tercile cuts through RankCuts' bounded radix search: a per-group
    // cumulative window still serializes a one-language corpus (the
    // common 100 TB shape) through one reducer; the radix passes stay
    // ≤2^16 cells per group regardless
    val hist = g.groupBy(col(groupCol), col("lm_bits"))
      .agg(count(lit(1)).as("__graft_c"))
    val cuts = graft.operators.RankCuts.rankValues(
      hist, Seq(groupCol), "lm_bits", "__graft_c",
      Seq("__graft_t1" -> graft.operators.RankCuts.ceilRank(1, 3),
        "__graft_t2" -> graft.operators.RankCuts.ceilRank(2, 3)))
    g.join(broadcast(cuts), Seq(groupCol))
      .withColumn("bucket",
        when(col("lm_bits") <= col("__graft_t1"), "head")
          .when(col("lm_bits") <= col("__graft_t2"), "middle")
          .otherwise("tail"))
      .select(col(idCol), col(groupCol), col("lm_bits"), col("bucket"))
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.ops.Parallelism

/** DSIR — Data Selection via Importance Resampling (Xie et al., NeurIPS
  * 2023): pick the slice of a raw web corpus that "looks like" a small
  * high-quality target set, by importance weights computed over HASHED
  * N-GRAM features instead of a learned model. Each document's features
  * are its unigrams + word bigrams hashed into `buckets` counters; the
  * target and raw corpora each induce a bucket distribution (add-one
  * smoothed); a document's log importance weight is the sum over its
  * gram occurrences of `log p_target[bucket] − log p_raw[bucket]`.
  *
  * Cross-engine determinism follows the [[LanguageModel]] discipline:
  * each bucket's log-ratio is rounded ONCE to integer micro-bits (the
  * only float op is a single IEEE log2 chain per bucket, computed in one
  * place), and per-document accumulation is exact integer addition —
  * reproducible under any partitioning and replayable in DuckDB.
  *
  * Scale shape — this is why DSIR is THE feasible quality-targeting
  * method at 100 TB while a per-doc classifier forward pass is not:
  *  - ONE aggregation pass builds both bucket censuses simultaneously
  *    (raw count + target-flagged count per bucket); only (bucket,
  *    count) pairs shuffle — at most `buckets` groups, map-side
  *    combined, document text never crosses an exchange.
  *  - The model IS the bucket array (`buckets` longs, ~32 KB at 4096):
  *    it broadcasts as one literal and scoring is a pure per-row map —
  *    zero shuffles, zero joins, whole corpus scored at scan speed.
  *  - The selection cut runs over the value-distinct score histogram
  *    through [[RankCuts]]' bounded radix search — no global sort of
  *    documents, no single-reducer cumulative window over the histogram:
  *    every pass is a ≤2^16-cell aggregation regardless of corpus size.
  */
object Dsir {

  private val Dup = "__graft_"

  /** Word array of a document; null text must mean ZERO grams (score 0,
    * like the oracle's left-join + coalesce), not a null score column.
    * The native bucket/score kernels derive unigrams + word bigrams from
    * this directly — gram strings never materialize. */
  private def wordsOf(textCol: Column): Column =
    coalesce(TextFunctions.tokens(lower(textCol)),
      array().cast("array<string>"))

  /** The declarative gram/bucket chain the native kernels replace — kept
    * (private[graft]) as the spec's parity reference: DsirSketchSpec
    * proves `dsir_buckets`/`dsir_logw` value-identical to this form. */
  private[graft] def gramArr(textCol: Column): Column = {
    val w = wordsOf(textCol)
    // native one-pass shingle kernel — identical "w1 w2" strings to the
    // zip_with-of-two-slices form (see TextFunctions.shingles)
    concat(w, graft.functions.Expressions.word_shingles(w, 2))
  }

  /** Feature bucket of one gram: salted portable 60-bit hash mod
    * `buckets` (same md5 formula every other sampling/hashing operator
    * uses — DuckDB replays it as `('0x'||substr(md5(...),1,15))::UBIGINT
    * % buckets`). */
  private[graft] def bucketOf(g: Column, buckets: Int): Column =
    pmod(TextFunctions.hash64(concat(lit("dsir|"), g)), lit(buckets.toLong))

  /** Importance-score `df` against the target slice `targetPred` and
    * flag the global top `keepFrac` quantile.
    *
    * Output: (idCol, n_grams, logw_micro, log_weight, kept) — one row
    * per input row; `logw_micro` is the exact integer micro-bit sum,
    * `log_weight` its 1e-6-rounded float form, `kept` = 1 iff the score
    * is STRICTLY above the (1−keepFrac)-quantile cut value (ties at the
    * cut are excluded — deterministic, no sampling noise; the paper's
    * Gumbel-resampling variant trades auditability for variance and is
    * out of scope by design).
    *
    * Documents with no grams (empty/null text) score 0 with n_grams=0
    * and take the same cut comparison as everyone else. */
  def importanceWeights(df: DataFrame, idCol: String, textCol: String,
      targetPred: Column, buckets: Int = 4096,
      keepFrac: Double = 0.25): DataFrame = {
    require(buckets >= 2 && buckets <= (1 << 24),
      s"buckets=$buckets: the bucket model collects to the driver (bounded)")
    require(keepFrac > 0 && keepFrac < 1, "keepFrac must be in (0,1)")

    // --- model: one pass, both censuses at once --------------------------
    // grams never materialize as strings: the native kernel emits each
    // document's BUCKET array directly (one md5 per gram, no per-gram
    // concat/hex/conv chain), so only small longs ride the explode
    val grams = df.select(
      explode(graft.functions.Expressions.dsir_buckets(
        wordsOf(col(textCol)), buckets)).as(s"${Dup}b"),
      when(targetPred, 1L).otherwise(0L).as(s"${Dup}tf"))
    val census = Parallelism.stage(
      grams
        .groupBy(col(s"${Dup}b"))
        .agg(count(lit(1)).as(s"${Dup}rc"), sum(col(s"${Dup}tf")).as(s"${Dup}tc")))
    val totals = census.agg(
      sum(col(s"${Dup}rc")).as("nr"), sum(col(s"${Dup}tc")).as("nt")).collect()(0)
    val nr = Option(totals.get(0)).fold(0L)(_.asInstanceOf[Long])
    val nt = Option(totals.get(1)).fold(0L)(_.asInstanceOf[Long])
    require(nt > 0, "targetPred selects no grams: nothing to resample toward")
    // micro log-ratio per bucket, computed by the same Spark log2
    // expression chain the DuckDB oracle uses (one IEEE chain per bucket)
    val micro = round((log2((col(s"${Dup}tc") + 1).cast("double") /
      lit(nt + buckets.toLong)) -
      log2((col(s"${Dup}rc") + 1).cast("double") / lit(nr + buckets.toLong)))
      * 1e6, 0).cast("long")
    // the unseen-bucket floor (tc=rc=0): fires only for text outside the
    // fitted corpus — computed through the identical expression for parity
    val floorMicro = df.sparkSession.range(1).select(
      round((log2(lit(1.0) / lit((nt + buckets).toDouble)) -
        log2(lit(1.0) / lit((nr + buckets).toDouble))) * 1e6, 0)
        .cast("long")).collect()(0).getLong(0)
    val model = Array.fill[Long](buckets)(floorMicro)
    census.select(col(s"${Dup}b"), micro.as(s"${Dup}m")).collect()
      .foreach(r => model(r.getLong(0).toInt) = r.getLong(1))

    // --- scoring: pure map over a broadcast literal ----------------------
    // one native pass per document (Σ lut[bucket] over unigrams +
    // bigrams): the aggregate(element_at(lut, bucketOf(t)+1)) fold this
    // replaces ran its lambda INTERPRETED per gram — concat + md5 + hex
    // parse + pmod + array lookup per step (the r11 PCA lesson applied);
    // values identical, DsirSketchSpec proves the parity
    val lut = lit(model)
    val w = wordsOf(col(textCol))
    val scored = Parallelism.stage(df.select(col(idCol),
      // |grams| = |w| + max(|w|−1, 0) — unigrams plus word bigrams
      greatest(size(w).cast("long") * 2 - 1, lit(0L)).as("n_grams"),
      graft.functions.Expressions.dsir_logw(w, lut).as("logw_micro")))

    // --- global quantile cut over the value-distinct histogram -----------
    // exact ceil((1−keepFrac)·n) through the 1e-6 integer grid — for the
    // canonical keepFrac=0.25 this equals ceil(3n/4) = (3n+3)//4, the
    // form the oracle replays. The cut itself goes through RankCuts'
    // bounded radix search: the micro-score histogram's distinct-value
    // count grows with document count, so a cumulative-sum window over it
    // would funnel an O(N)-row table through one reducer at 100 TB.
    val fr = math.round((1.0 - keepFrac) * 1000000L)
    val hist = scored.groupBy(col("logw_micro"))
      .agg(count(lit(1)).as(s"${Dup}c"))
    val cut = RankCuts.rankValues(hist, Nil, "logw_micro", s"${Dup}c",
      Seq(s"${Dup}t" -> RankCuts.ceilRank(fr, 1000000L)))
    scored.join(broadcast(cut))
      .select(col(idCol), col("n_grams"), col("logw_micro"),
        round(col("logw_micro").cast("double") / 1e6, 6).as("log_weight"),
        when(col("logw_micro") > col(s"${Dup}t"), 1L).otherwise(0L)
          .as("kept"))
  }
}

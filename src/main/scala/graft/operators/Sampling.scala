package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.hash64

/** Deterministic sampling and splitting for dataset curation — the ops a
  * training-data pipeline runs before anything expensive (enrich, embed,
  * dedup): carve out a reproducible X% slice, a train/val/test split, or
  * a per-group quota.
  *
  * All decisions are pure functions of a salted portable hash of the key
  * (`md5`-based, same formula the DuckDB oracles compute), NEVER
  * `rand()`: re-running on the same data gives the same rows regardless
  * of partitioning, task retries, or cluster size, and membership can be
  * recomputed engine-independently — the property that makes a sample
  * auditable at 100 TB. Sampling/splitting are narrow map-side filters
  * (no shuffle); the stratified quota pays one window shuffle by group,
  * which is the honest price of exact per-group counts.
  */
object Sampling {

  /** Hash in [0, 1000000) — six decimal digits of resolution. */
  private def bucket(keyCol: Column, salt: String): Column =
    pmod(hash64(concat(lit(salt), lit("|"), keyCol.cast("string"))),
      lit(1000000L))

  /** Keep ~`fraction` of rows, decided per key (0 <= fraction <= 1).
    * Same salt + key ⇒ same verdict forever (resumable pipelines keep
    * their sample across runs). */
  def deterministicSample(df: DataFrame, keyCol: String, fraction: Double,
                          salt: String = "sample"): DataFrame = {
    require(fraction >= 0 && fraction <= 1, "fraction must be in [0,1]")
    df.filter(bucket(col(keyCol), salt) <
      lit(math.round(fraction * 1000000).toLong))
  }

  /** Label each row with a split name by hash range — one pass, no
    * shuffle, mutually exclusive and exhaustive. `weights` need not be
    * normalized. */
  def withSplit(df: DataFrame, keyCol: String,
                weights: Seq[(String, Double)],
                salt: String = "split"): DataFrame = {
    require(weights.nonEmpty && weights.forall(_._2 > 0),
      "weights must be positive")
    val total = weights.map(_._2).sum
    // cumulative integer thresholds over the 1e6 hash space; the last
    // split absorbs rounding so the ranges are exhaustive
    val cuts = weights.scanLeft(0L) { case (acc, (_, w)) =>
      acc + math.round(w / total * 1000000)
    }.tail.init
    val b = bucket(col(keyCol), salt)
    val expr0: Column = lit(weights.last._1)
    val labeled = weights.init.zip(cuts).foldRight(expr0) {
      case (((name, _), cut), els) => when(b < lit(cut), lit(name)).otherwise(els)
    }
    df.withColumn("split", labeled)
  }

  /** LEAKAGE-SAFE split: hash the near-dup FAMILY label instead of the
    * row id, so an entire duplicate/near-duplicate family lands on one
    * side of every cut — the standard defense against train→holdout
    * contamination through paraphrases and templated copies (a per-doc
    * hash split puts ~holdout-fraction of each family's members in the
    * holdout, leaking their trained twins' content). `labels` is any
    * (id → family) relation — [[Dedup.nearDupClusters]] /
    * [[Similarity.embeddingNearDupClusters]] output slots in directly;
    * singleton families degrade to the plain per-id split. One id-keyed
    * join, then the same map-side hash-threshold rule as [[withSplit]]
    * (same salt + labels ⇒ same verdict forever). */
  def leakageSafeSplit(df: DataFrame, idCol: String, labels: DataFrame,
                       labelCol: String, weights: Seq[(String, Double)],
                       salt: String = "split"): DataFrame =
    withSplit(df.join(labels.select(col(idCol), col(labelCol)), Seq(idCol)),
      labelCol, weights, salt)

  /** Re-mix a multi-domain corpus to target proportions — the Pile/
    * Dolma-style mixing step that turns "what we crawled" into "what we
    * train on". `weights` are integer mixture parts per domain (e.g.
    * `Seq("web" -> 6, "code" -> 3, "books" -> 1)`); the output holds
    * ~`totalRows` rows distributed in those proportions, DOWNSAMPLING
    * over-represented domains (hash-threshold filter) and UPSAMPLING
    * under-represented ones by emitting repeat copies tagged with an
    * `epoch` column (0-based; full epochs for every key, the fractional
    * last epoch again hash-selected).
    *
    * All planning is exact integer arithmetic on the driver over one
    * tiny per-domain census (`need = totalRows*w/Σw`, truncating
    * division; `threshold = rem*1e6/n`), so the DuckDB oracle recomputes
    * the identical plan — no cross-engine float hazard. Per-row work is
    * a map-side when-chain + `explode(sequence)`: the only shuffle is
    * the census aggregation, whose result is #domains rows. Domains not
    * in `weights` are dropped. Fails fast if a domain would need more
    * than `maxEpochs` copies (a 100 TB guard: a typo'd weight on a tiny
    * domain would otherwise silently explode the output). Row counts per
    * domain are approximate at 1e-6 resolution, like every hash-rate
    * sample here; determinism and auditability are exact. */
  def mixtureSample(df: DataFrame, domainCol: String, keyCol: String,
                    weights: Seq[(String, Long)], totalRows: Long,
                    maxEpochs: Int = 10, salt: String = "mix",
                    epochCol: String = "epoch"): DataFrame = {
    require(weights.nonEmpty && weights.forall(_._2 > 0),
      "weights must be positive integers")
    require(weights.map(_._1).distinct.size == weights.size,
      "duplicate domain in weights")
    val domains = weights.map(_._1)
    val inDomains = df.filter(col(domainCol).isin(domains: _*))
    // tiny census: one row per weighted domain
    val counts = inDomains.groupBy(col(domainCol).cast("string").as("__d"))
      .count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    mixturePlan(inDomains, domainCol, keyCol, counts, weights, totalRows,
      maxEpochs, salt, epochCol)
  }

  /** Temperature-scaled domain re-mixing (the multilingual-LM recipe:
    * sample domain i with probability ∝ n_i^α, α < 1 flattening the
    * head so low-resource domains aren't drowned — mBERT/XLM-R use
    * exactly this with α ≈ 0.3–0.7). This is [[mixtureSample]] with the
    * weights DERIVED from the corpus itself at α = 1/2: integer weight
    * `isqrt(n_i)` per domain. The square root is the one α where the
    * exponent is exactly replayable cross-engine — `floor(sqrt(n))` of a
    * BIGINT is deterministic in both JVM and DuckDB because IEEE sqrt is
    * correctly rounded and a non-square n keeps `sqrt(n)` at least
    * `1/(2·isqrt(n))` away from an integer, orders of magnitude beyond
    * one ulp. Everything downstream is [[mixtureSample]]'s exact integer
    * plan over the same census (one #domains-row collect, bounded). */
  def temperatureMixture(df: DataFrame, domainCol: String, keyCol: String,
                         totalRows: Long, maxEpochs: Int = 10,
                         maxDomains: Int = 10000, salt: String = "mix",
                         epochCol: String = "epoch"): DataFrame = {
    val counts = df.groupBy(col(domainCol).cast("string").as("__d"))
      .count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    require(counts.size <= maxDomains,
      s"${counts.size} domains > maxDomains=$maxDomains: the census " +
        "collects one row per domain; raise the bound only if that is sane")
    require(counts.nonEmpty, "empty input: no domains to mix")
    // isqrt weights, domain-sorted so the plan (and its when-chain) is
    // deterministic regardless of census row order
    val weights = counts.toSeq.sortBy(_._1).map { case (d, n) =>
      d -> math.sqrt(n.toDouble).toLong
    }
    mixturePlan(df, domainCol, keyCol, counts, weights, totalRows,
      maxEpochs, salt, epochCol)
  }

  /** The shared exact-integer mixture plan: census + weights → per-domain
    * (full epochs, fractional hash threshold) → map-side when-chain +
    * `explode(sequence)`. Truncating division matches DuckDB's `//` on
    * the all-positive operands here. */
  private def mixturePlan(inDomains: DataFrame, domainCol: String,
                          keyCol: String, counts: Map[String, Long],
                          weights: Seq[(String, Long)], totalRows: Long,
                          maxEpochs: Int, salt: String,
                          epochCol: String): DataFrame = {
    require(totalRows > 0, "totalRows must be > 0")
    require(weights.forall(_._2 > 0),
      s"every domain weight must be positive: ${weights.filter(_._2 <= 0)}")
    val wSum = weights.map(_._2).sum
    require(wSum <= Long.MaxValue / totalRows,
      s"totalRows * weight overflows Long (totalRows=$totalRows, sum=$wSum)")
    val plan = weights.map { case (d, wt) =>
      val n = counts.getOrElse(d, 0L)
      val need = totalRows * wt / wSum
      require(n > 0 || need == 0, s"domain '$d' has weight but no rows")
      val fullEp = if (n == 0) 0L else need / n
      val thr = if (n == 0) 0L else (need % n) * 1000000L / n
      val maxCopies = fullEp + (if (thr > 0) 1 else 0)
      require(maxCopies <= maxEpochs,
        s"domain '$d' needs $maxCopies epochs > maxEpochs=$maxEpochs")
      (d, fullEp, thr)
    }
    def chain(f: ((String, Long, Long)) => Long): Column =
      plan.foldRight(lit(0L)) { case (p, els) =>
        when(col(domainCol) === lit(p._1), lit(f(p))).otherwise(els)
      }
    val copies = chain(_._2) +
      when(bucket(col(keyCol), salt) < chain(_._3), 1L).otherwise(0L)
    // guard sequence(): Spark infers step -1 when start > stop, so an
    // unguarded sequence(0, copies-1) at copies=0 would yield [0,-1]
    inDomains.withColumn(epochCol,
      explode(when(copies > 0,
        sequence(lit(0), (copies - 1).cast("int"))).otherwise(
        array().cast("array<int>"))))
  }

  /** At most `quota` rows per group, chosen by hash rank — deterministic
    * and unbiased within the group (a `LIMIT` per group would be
    * partitioning-dependent). One window shuffle by `groupCol`. */
  def stratifiedQuota(df: DataFrame, groupCol: String, keyCol: String,
                      quota: Int, salt: String = "quota"): DataFrame = {
    require(quota >= 0, "quota must be >= 0")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(bucket(col(keyCol), salt), col(keyCol))
    df.withColumn("_sq_rank", row_number().over(w))
      .filter(col("_sq_rank") <= quota)
      .drop("_sq_rank")
  }

  /** WEIGHTED sampling without replacement, k per group — Efraimidis &
    * Spirakis 2006 (A-ES): each row draws u ∈ (0, 1] and ranks by
    * u^(1/w); the top k are a weighted sample without replacement
    * (quality-weighted subcorpus selection, importance-weighted
    * eval-set draws). Here u is the salted portable hash (never
    * `rand()` — the whole Sampling contract): the draw is a pure
    * function of the key, so the sample is identical under any
    * partitioning/retry/cluster size and any engine can recompute
    * membership. Ranking uses ln(u)/w — the strictly monotone log of
    * the ES key, one IEEE chain instead of a pow — with the key as
    * deterministic tie-break; rows with w ≤ 0 or null are excluded.
    * The per-group top-k runs as a rank-limit window (Spark pushes a
    * WindowGroupLimit below the sort, so each partition keeps only k
    * candidates before any shuffle). Output: df's columns + es_rank.
    * Selection EQUALS exact-k weighted sampling w/o replacement under
    * the hash-as-uniform model; seeds via `salt`. */
  def weightedSample(df: DataFrame, groupCol: String, keyCol: String,
                     weightCol: String, k: Int,
                     salt: String = "ws"): DataFrame = {
    require(k >= 1, s"k=$k must be >= 1")
    val h = hash64(concat(lit(salt), lit("|"), col(keyCol).cast("string")))
    // u = (h+1)/2^60 in (0, 1]; ln(u)/w ranks identically to u^(1/w)
    val esKey = log((h.cast("double") + lit(1.0)) /
      lit(1152921504606846976.0)) / col(weightCol).cast("double")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(col("_es_key").desc, col(keyCol))
    df.filter(col(weightCol).isNotNull && col(weightCol) > 0)
      .withColumn("_es_key", esKey)
      .withColumn("es_rank", row_number().over(w))
      .filter(col("es_rank") <= k)
      .drop("_es_key")
  }
}

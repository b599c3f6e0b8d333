package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Count–min sketch (Cormode & Muthukrishnan 2005) — the fixed-size
  * mergeable frequency summary that answers "roughly how often does
  * token X occur?" over a corpus whose exact census is infeasible. The
  * sketch is a `depth × width` grid of counters; item `t` increments one
  * counter per row (`hash_r(t) mod width`), a point estimate reads the
  * MINIMUM of its `depth` counters — an overestimate by construction
  * (collisions only ever add), within `ε·N` with probability `1−δ` for
  * `width = e/ε`, `depth = ln(1/δ)`.
  *
  * Scale shape — why this is a 100 TB primitive:
  *  - Building is ONE aggregation whose key space is at most
  *    `depth·width` cells regardless of corpus size: partial counts
  *    combine map-side, so the shuffle moves ≤ `depth·width` rows per
  *    partition, never the token census (which at web scale is billions
  *    of distinct keys and the thing you're trying to avoid).
  *  - Sketches MERGE by cell-wise addition (counts are linear), so
  *    per-shard sketches roll up hierarchically — build per day/crawl,
  *    add to taste. [[merge]] is that cell-wise union.
  *  - Probing is a broadcast-size join against the ≤ `depth·width`-row
  *    sketch.
  *
  * Hashes are the portable salted md5 formula every sampling operator
  * here uses, so any engine can replay both the build and the probe —
  * a sketch written to parquet is engine-independent infrastructure,
  * not a Spark-runtime artifact.
  */
object Sketches {

  private val Dup = "__graft_"

  /** Counter column of item `t` in sketch row `r`. Two tiers:
    *  - portable (default): the md5 formula every oracle replays —
    *    engine-independent sketches, ~8 md5 evaluations per token at
    *    depth 4 (build + probe);
    *  - fast: Spark's codegen'd xxHash64 — same guarantees (the CMS
    *    analysis only needs pairwise-independent-ish rows), ~5× less
    *    hash cost, but the sketch is Spark-reproducible rather than
    *    any-engine-reproducible. Build and probe must agree on the
    *    tier; the q134 oracle pins the portable one.
    */
  private def cellOf(t: Column, r: Int, width: Int,
                     portable: Boolean): Column =
    if (portable)
      pmod(TextFunctions.hash64(concat(lit(s"cms$r|"), t)), lit(width.toLong))
    else
      pmod(xxhash64(lit(s"cms$r"), t), lit(width.toLong))

  /** Build a count–min sketch over `itemCol` of `df` (one increment per
    * row — pre-weight by exploding upstream). Output: (r, c, cnt) with
    * ≤ depth·width rows — the sparse grid (absent cells are zero). */
  def cmsBuild(df: DataFrame, itemCol: String, depth: Int = 4,
               width: Int = 1024, portable: Boolean = true): DataFrame = {
    require(depth >= 1 && depth <= 16, s"depth=$depth out of [1,16]")
    require(width >= 16 && width <= (1 << 24), s"width=$width out of range")
    val t = col(itemCol)
    // portable tier: the native cells kernel (one md5 per row, no
    // concat/hex round-trip) + posexplode recovers identical (r, c)
    // pairs to the declarative struct-array explode
    val exploded =
      if (portable)
        df.select(posexplode(
          graft.functions.Expressions.cms_cells(t, depth, width))
          .as(Seq("r", "c")))
      else {
        val cells = array((0 until depth).map(r =>
          struct(lit(r).as("r"), cellOf(t, r, width, portable).as("c"))): _*)
        df.select(explode(cells).as(s"${Dup}cell"))
          .select(col(s"${Dup}cell.r").as("r"), col(s"${Dup}cell.c").as("c"))
      }
    exploded.groupBy(col("r"), col("c")).agg(count(lit(1)).as("cnt"))
  }

  /** Cell-wise sum of two sketches built with the same (depth, width) —
    * count linearity makes the merged sketch exactly the sketch of the
    * concatenated corpora. */
  def merge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy(col("r"), col("c"))
      .agg(sum(col("cnt")).as("cnt"))

  /** Document NOVELTY scoring through a broadcast sketch — the rarity
    * signal (a page dominated by corpus-rare tokens is either novel
    * content worth keeping or gibberish worth gating; either way the
    * signal is the input): fraction of a document's token OCCURRENCES
    * whose corpus-wide CMS estimate is ≤ `rareMax`.
    *
    * The DSIR discipline at sketch scale: the corpus aggregates ONCE
    * into the ≤ depth×width-cell grid, the grid collects (bounded,
    * explicitly guarded) and ships as a single flattened literal, and
    * scoring is a pure per-row map — zero joins, zero shuffles, the
    * whole corpus scored at scan speed. CMS only ever OVERestimates,
    * so `n_rare` is a conservative lower bound on true rare mass —
    * exactly the safe direction for a keep/gate signal.
    *
    * Output: (idCol, n_tokens, n_rare, novelty) with novelty =
    * n_rare / n_tokens (0 for empty docs), rounded to 6dp. */
  def cmsNoveltyScore(df: DataFrame, idCol: String, textCol: String,
                      depth: Int = 4, width: Int = 1024,
                      rareMax: Long = 2L,
                      portable: Boolean = true): DataFrame = {
    require(depth >= 1 && depth <= 16 && width >= 16 &&
      depth.toLong * width <= (1 << 22),
      s"sketch ${depth}x$width collects to the driver (bounded)")
    require(rareMax >= 1, "rareMax must be >= 1")
    val toks = coalesce(
      TextFunctions.tokens(lower(col(textCol))),
      array().cast("array<string>"))
    val sketch = cmsBuild(df.select(explode(toks).as(s"${Dup}t")),
      s"${Dup}t", depth, width, portable)
    val flat = Array.fill[Long](depth * width)(0L)
    sketch.collect().foreach(r =>
      flat(r.getInt(0) * width + r.getLong(1).toInt) = r.getLong(2))
    val lut = lit(flat)
    def est(t: Column): Column =
      least((0 until depth).map(r =>
        element_at(lut,
          (lit(r.toLong * width) + cellOf(t, r, width, portable) + 1)
            .cast("int"))): _*)
    val nTok = size(toks).cast("long")
    // portable tier: one native pass per doc (no per-token concat/md5
    // hex round-trip or per-row least chain); fast tier keeps the
    // declarative xxhash64 form — same outputs either way
    val nRare =
      if (portable)
        graft.functions.Expressions.cms_rare_count(
          toks, lut, depth, width, rareMax)
      else size(filter(toks, t => est(t) <= lit(rareMax))).cast("long")
    df.select(col(idCol), nTok.as("n_tokens"), nRare.as("n_rare"),
      round(when(nTok === 0, lit(0.0))
        .otherwise(nRare.cast("double") / nTok.cast("double")), 6)
        .as("novelty"))
  }

  /** Point-estimate the frequency of each row of `probes(itemCol)`
    * against a sketch: min over the item's `depth` cells (an absent
    * cell reads zero). Output: probes' columns + `cms_est`, one output
    * row PER INPUT ROW — duplicate probe rows each keep their own row
    * (the re-group key is a synthetic per-row id, not the probe
    * columns), and the sketch's (r, c, cnt) columns are renamed behind
    * the `__graft_` prefix before the join so a probe column named
    * `cnt`/`r`/`c` cannot collide. */
  def cmsEstimate(sketch: DataFrame, probes: DataFrame, itemCol: String,
                  depth: Int = 4, width: Int = 1024,
                  portable: Boolean = true): DataFrame = {
    val t = col(itemCol)
    val key = s"${Dup}pk"
    // same cells either way; the portable tier goes through the native
    // md5 kernel (see cmsBuild)
    val cells =
      if (portable)
        graft.functions.Expressions.cms_cells(t, depth, width)
      else array((0 until depth).map(r =>
        cellOf(t, r, width, portable)): _*)
    val exploded = probes
      .withColumn(key, monotonically_increasing_id())
      .select(col("*"), posexplode(cells).as(Seq(s"${Dup}r", s"${Dup}c")))
    exploded
      .join(broadcast(sketch.select(col("r").as(s"${Dup}r"),
        col("c").as(s"${Dup}c"), col("cnt").as(s"${Dup}cnt"))),
        Seq(s"${Dup}r", s"${Dup}c"), "left")
      .groupBy(col(key) +: probes.columns.map(col): _*)
      .agg(min(coalesce(col(s"${Dup}cnt"), lit(0L))).as("cms_est"))
      .drop(key)
  }
}

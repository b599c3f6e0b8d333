package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.ops.Parallelism

/** Distributed BPE tokenizer training (Sennrich et al. 2016) — the
  * vocabulary-learning step of a pretraining-data pipeline, run against
  * the corpus the engine is curating.
  *
  * Scale shape: the corpus is touched ONCE, by the word-frequency census
  * (canonical map-side-combined wordcount; only token strings and counts
  * shuffle). Every merge round then operates on the WORD table — vocab-
  * sized, corpus-size independent — exactly how production tokenizer
  * trainers work: 2 small jobs per round (weighted pair census + top-1)
  * plus a 16-byte driver collect of the winning pair, with the word table
  * re-staged each round so plan lineage stays flat (the [[Dedup]]
  * cluster-loop discipline). Training cost grows with `numMerges` and
  * vocabulary size only, never with corpus size.
  *
  * Determinism: pair counts are exact integer sums of word frequencies;
  * the winning pair is picked by the total order (count DESC, left ASC,
  * right ASC), so ties break identically in any engine — the whole merge
  * sequence is reproducible in SQL (q104 replays it in DuckDB with the
  * same greedy left-to-right merge application).
  */
object Bpe {

  /** End-of-word marker symbol (separate trailing symbol, the common BPE
    * formulation — lets merges learn word-final units). */
  val EndOfWord = "</w>"

  /** One learned merge: rank r joined `lhs`+`rhs` into one symbol. */
  final case class Merge(rank: Int, lhs: String, rhs: String, pairCount: Long)

  /** Initial symbol sequence for a word: its characters plus [[EndOfWord]].
    * (transform over char positions, not split(w, "") — the regex split
    * leaves a trailing empty string under Java semantics.) */
  private def charSymbols(word: Column): Column =
    concat(
      transform(sequence(lit(1), length(word)), i => word.substr(i, lit(1))),
      array(lit(EndOfWord)))

  /** Greedy left-to-right application of one merge to a symbol array:
    * fold that joins every adjacent (lhs, rhs) occurrence, consuming
    * matched symbols so overlaps resolve exactly like the sequential
    * algorithm ("a a a" under (a,a) -> ["aa", "a"]). */
  private def applyMerge(sym: Column, lhs: String, rhs: String): Column =
    aggregate(sym, array().cast("array<string>"),
      (acc, s) => when(
        size(acc) > 0 && element_at(acc, -1) === lit(lhs) && s === lit(rhs),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(lhs + rhs))))
        .otherwise(concat(acc, array(s))))

  private val PairSep = "\u0001" // never occurs in corpus-derived symbols

  /** Learn `numMerges` BPE merges over `textCol` (lowercased whitespace
    * words, char symbols + end-of-word marker). Stops early when the best
    * remaining pair's weighted count falls below `minPairCount` or no
    * pairs remain.
    *
    * Dispatch: the corpus is touched once, by the word-frequency census.
    * Word tables that FIT THE DRIVER (≤ `smallVocabWords` distinct words
    * — vocab-sized, corpus-size independent, so even 100 TB corpora with
    * natural-language vocabularies qualify) train in-driver with
    * incrementally-maintained pair counts ([[trainDriver]]): a 50k-merge
    * production vocabulary is ~50k map updates instead of ~100k
    * sequential Spark jobs (2 jobs + 1 collect per round), whose FIXED
    * scheduling cost dwarfs the data at any corpus size. The merge
    * sequence is identical by construction (same counts, same
    * count-DESC / UTF8-binary-ASC tie-break — BpeSpec proves it); larger
    * word tables, or `smallVocabWords = 0`, run the distributed loop
    * unchanged ([[Dedup.clusterLabels]]'s bounded-collect discipline). */
  def train(df: DataFrame, textCol: String, numMerges: Int,
      minPairCount: Long = 1L, smallVocabWords: Long = 2000000L): Seq[Merge] = {
    require(numMerges >= 1, "numMerges must be >= 1")
    val census = Parallelism.stage(
      df.select(explode(TextFunctions.tokens(lower(col(textCol))))
          .as("__graft_w"))
        .groupBy(col("__graft_w"))
        .agg(count(lit(1)).as("__graft_freq"))
        .select(charSymbols(col("__graft_w")).as("__graft_sym"),
          col("__graft_freq")))
    if (smallVocabWords > 0 && census.count() <= smallVocabWords)
      trainDriver(census, numMerges, minPairCount)
    else trainDistributed(census, numMerges, minPairCount)
  }

  /** The distributed merge loop: 2 small jobs (weighted pair census +
    * top-1) plus a 16-byte collect per round over the word table. Exact
    * but scheduling-bound at production merge counts — the fallback tier
    * when the word table exceeds the driver bound. */
  private def trainDistributed(census: DataFrame, numMerges: Int,
      minPairCount: Long): Seq[Merge] = {
    var words = census
    val merges = Seq.newBuilder[Merge]
    var rank = 0
    var done = false
    while (rank < numMerges && !done) {
      val sym = col("__graft_sym")
      val top = words
        .filter(size(sym) >= 2)
        .select(col("__graft_freq"), explode(
          zip_with(slice(sym, lit(1), size(sym) - 1),
            slice(sym, lit(2), size(sym) - 1),
            (a, b) => concat(a, lit(PairSep), b))).as("__graft_p"))
        .groupBy(col("__graft_p"))
        .agg(sum(col("__graft_freq")).as("__graft_c"))
        .orderBy(col("__graft_c").desc, col("__graft_p").asc)
        .limit(1).collect()
      if (top.isEmpty || top.head.getLong(1) < minPairCount) done = true
      else {
        val Array(l, r) = top.head.getString(0).split(PairSep, 2)
        merges += Merge(rank, l, r, top.head.getLong(1))
        words = Parallelism.stage(words.select(
          applyMerge(sym, l, r).as("__graft_sym"), col("__graft_freq")))
        rank += 1
      }
    }
    merges.result()
  }

  /** UTF8-binary string order — Spark compares StringType byte-wise
    * unsigned, which diverges from Java's UTF-16 `compareTo` for
    * supplementary characters; the driver tie-break must replay Spark's
    * order exactly or the two paths could pick different same-count
    * winners on exotic corpora. */
  private def utf8Less(a: String, b: String): Boolean = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val n = math.min(x.length, y.length)
    var i = 0
    while (i < n) {
      val c = (x(i) & 0xff) - (y(i) & 0xff)
      if (c != 0) return c < 0
      i += 1
    }
    x.length < y.length
  }

  /** In-driver merge loop over the collected word table — the fast path
    * of [[train]]. Pair counts are maintained INCREMENTALLY (the classic
    * fast BPE trainer): each round touches only the words containing the
    * winning pair, adjusting count deltas and the pair→words occurrence
    * index, so cost tracks affected words, not the vocabulary. Selection
    * scans the live pair map for (count DESC, pair-key UTF8 ASC) — the
    * same total order the distributed top-1 job sorts by. */
  private def trainDriver(census: DataFrame, numMerges: Int,
      minPairCount: Long): Seq[Merge] = {
    import scala.collection.mutable
    val collected = census.collect()
    val syms = new Array[mutable.ArrayBuffer[String]](collected.length)
    val freqs = new Array[Long](collected.length)
    var wi = 0
    while (wi < collected.length) {
      syms(wi) = mutable.ArrayBuffer.from(collected(wi).getSeq[String](0))
      freqs(wi) = collected(wi).getLong(1)
      wi += 1
    }
    // live pair census + occurrence index (word indices containing pair)
    val counts = mutable.HashMap.empty[(String, String), Long]
    val occ = mutable.HashMap.empty[(String, String), mutable.HashSet[Int]]
    def pairsOf(s: mutable.ArrayBuffer[String]): mutable.HashMap[(String, String), Int] = {
      val m = mutable.HashMap.empty[(String, String), Int]
      var i = 0
      while (i < s.length - 1) {
        val k = (s(i), s(i + 1))
        m.update(k, m.getOrElse(k, 0) + 1)
        i += 1
      }
      m
    }
    wi = 0
    while (wi < syms.length) {
      pairsOf(syms(wi)).foreach { case (k, m) =>
        counts.update(k, counts.getOrElse(k, 0L) + m * freqs(wi))
        occ.getOrElseUpdate(k, mutable.HashSet.empty) += wi
      }
      wi += 1
    }
    val merges = Seq.newBuilder[Merge]
    var rank = 0
    var done = false
    while (rank < numMerges && !done) {
      // best pair: count DESC, then pairKey UTF8-binary ASC (ties only)
      var best: (String, String) = null
      var bestC = Long.MinValue
      counts.foreach { case (k, c) =>
        if (c > bestC ||
            (c == bestC && utf8Less(pairKey(k._1, k._2), pairKey(best._1, best._2))))
          { best = k; bestC = c }
      }
      if (best == null || bestC < minPairCount) done = true
      else {
        val (l, r) = best
        merges += Merge(rank, l, r, bestC)
        val joined = l + r
        occ.getOrElse(best, mutable.HashSet.empty).toArray.foreach { w =>
          val s = syms(w)
          val before = pairsOf(s)
          // greedy left-to-right in place
          val out = new mutable.ArrayBuffer[String](s.length)
          var j = 0
          while (j < s.length) {
            if (j < s.length - 1 && s(j) == l && s(j + 1) == r) {
              out += joined; j += 2
            } else { out += s(j); j += 1 }
          }
          syms(w) = out
          val after = pairsOf(out)
          (before.keySet ++ after.keySet).foreach { k =>
            val d = after.getOrElse(k, 0) - before.getOrElse(k, 0)
            if (d != 0) {
              val nc = counts.getOrElse(k, 0L) + d * freqs(w)
              if (nc == 0L) counts.remove(k) else counts.update(k, nc)
            }
            if (before.contains(k) && !after.contains(k))
              occ.get(k).foreach { s2 => s2 -= w; if (s2.isEmpty) occ.remove(k) }
            else if (after.contains(k) && !before.contains(k))
              occ.getOrElseUpdate(k, mutable.HashSet.empty) += w
          }
        }
        rank += 1
      }
    }
    merges.result()
  }

  /** Merge table as a DataFrame: (merge_rank, lhs, rhs, pair_count). */
  def trainTable(df: DataFrame, textCol: String, numMerges: Int,
      minPairCount: Long = 1L): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    train(df, textCol, numMerges, minPairCount)
      .toDF("merge_rank", "lhs", "rhs", "pair_count")
  }

  /** Above this merge-list size, [[encodeColumn]] switches from the baked
    * expression tree to the broadcast rank-map encoder. */
  val MaxExprMerges = 256

  /** Encode `textCol` with a learned merge list. Output column = array of
    * subword tokens, word-concatenated. Dispatches on vocabulary size:
    * small merge lists stay in the fully-codegen'd expression tree
    * ([[encodeColumnExpr]]); production-size vocabularies (30k–50k
    * merges, which no expression tree can hold) go through the broadcast
    * rank-map encoder ([[encodeColumnBroadcast]]). Both compute the same
    * function on rank-consistent (learned) merge tables. */
  def encodeColumn(textCol: Column, merges: Seq[Merge]): Column =
    if (merges.size <= MaxExprMerges) encodeColumnExpr(textCol, merges)
    else encodeColumnBroadcast(textCol, merges)

  /** Expression-tree encoder: per word, char symbols then each merge
    * applied in rank order as one catalyst fold — zero serialization,
    * whole-stage codegen, but the plan grows with the merge list, so it
    * is only for bounded vocabularies (≤ [[MaxExprMerges]]). */
  def encodeColumnExpr(textCol: Column, merges: Seq[Merge]): Column = {
    val words = TextFunctions.tokens(lower(textCol))
    flatten(transform(words, w =>
      merges.foldLeft(charSymbols(w))((s, m) => applyMerge(s, m.lhs, m.rhs))))
  }

  /** Broadcast rank-map encoder — the production shape: the merge table
    * ships to executors ONCE as a broadcast (not per-task in the closure),
    * and each word is encoded by the standard rank-greedy loop (repeatedly
    * merge the lowest-rank adjacent pair, all occurrences left-to-right).
    * A per-task word→tokens memo exploits the Zipfian word distribution —
    * most corpus words encode once per partition, not once per occurrence.
    * Cost is vocabulary-size-independent per row; the map lookup replaces
    * the expression path's O(merges) folds. */
  def encodeColumnBroadcast(textCol: Column, merges: Seq[Merge]): Column = {
    val bc = org.apache.spark.sql.SparkSession.active.sparkContext
      .broadcast(merges.map(m => (m.lhs, m.rhs) -> m.rank).toMap)
    // The memo lives INSIDE the serialized closure: each task deserializes
    // its own copy, so it is (a) thread-confined without locking and
    // (b) scoped to THIS merge table — a JVM-wide cache keyed only by word
    // would serve stale tokenizations when a reused executor thread
    // encodes under a different vocabulary. Bounded against adversarial
    // vocabulary-sized partitions by clearing at 64k entries.
    val enc = udf(new (String => Array[String]) with Serializable {
      @transient private lazy val memo =
        scala.collection.mutable.HashMap.empty[String, Array[String]]
      def apply(text: String): Array[String] = {
        // null propagates as null, matching the expression path's SQL
        // semantics — the dispatch must not change null-row output when
        // the merge list crosses MaxExprMerges
        if (text == null) null
        else {
          val ranks = bc.value
          val out = scala.collection.mutable.ArrayBuffer.empty[String]
          text.toLowerCase(java.util.Locale.ROOT).split("\\s+").foreach { w =>
            if (w.nonEmpty) {
              // bound enforced per WORD: one row with millions of distinct
              // tokens must not grow the memo unchecked
              if (memo.size > 65536) memo.clear()
              out ++= memo.getOrElseUpdate(w, encodeWord(w, ranks))
            }
          }
          out.toArray
        }
      }
    })
    enc(textCol)
  }

  /** Rank-greedy BPE encode of one word: char symbols + end-of-word, then
    * repeatedly merge the lowest-rank adjacent pair present (all
    * occurrences, left to right) until no learned pair remains — the
    * reference BPE encoder semantics, which also covers the pathological
    * case the rank-order fold cannot (an earlier pair re-created by a
    * later merge). */
  private[graft] def encodeWord(
      word: String, ranks: Map[(String, String), Int]): Array[String] = {
    var sym = new scala.collection.mutable.ArrayBuffer[String](word.length + 1)
    word.foreach(c => sym += c.toString)
    sym += EndOfWord
    var continue = sym.length >= 2
    while (continue) {
      var best = Int.MaxValue
      var bl: String = null
      var br: String = null
      var i = 0
      while (i < sym.length - 1) {
        val r = ranks.getOrElse((sym(i), sym(i + 1)), Int.MaxValue)
        if (r < best) { best = r; bl = sym(i); br = sym(i + 1) }
        i += 1
      }
      if (best == Int.MaxValue) continue = false
      else {
        val out = new scala.collection.mutable.ArrayBuffer[String](sym.length)
        var j = 0
        while (j < sym.length) {
          if (j < sym.length - 1 && sym(j) == bl && sym(j + 1) == br) {
            out += bl + br; j += 2
          } else { out += sym(j); j += 1 }
        }
        sym = out
        continue = sym.length >= 2
      }
    }
    sym.toArray
  }

  /** Ordered pair-census sort key — exposed so tests can replay it. */
  private[operators] def pairKey(l: String, r: String): String = l + PairSep + r
}

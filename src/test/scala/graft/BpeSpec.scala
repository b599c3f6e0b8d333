package graft

import org.apache.spark.sql.functions._

import graft.operators.Bpe

class BpeSpec extends SparkSpec {
  import spark.implicits._

  /** Sequential reference BPE (Sennrich alg. 1): word-freq table, then
    * per round count adjacent pairs weighted by freq, merge the winner
    * (count desc, then pair order) greedily left-to-right. */
  private def referenceTrain(corpus: Seq[String], numMerges: Int)
      : Seq[(String, String, Long)] = {
    var words: Map[Vector[String], Long] = corpus
      .flatMap(_.toLowerCase.split("\\s+").filter(_.nonEmpty))
      .groupBy(identity).map { case (w, g) =>
        (w.map(_.toString).toVector :+ Bpe.EndOfWord) -> g.size.toLong
      }
    val out = Seq.newBuilder[(String, String, Long)]
    for (_ <- 0 until numMerges) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((sym, f) <- words; i <- 0 until sym.size - 1)
        counts((sym(i), sym(i + 1))) = counts.getOrElse((sym(i), sym(i + 1)), 0L) + f
      if (counts.nonEmpty) {
        val ((l, r), c) = counts.minBy { case ((l, r), c) => (-c, l + "\u0001" + r) }
        out += ((l, r, c))
        words = words.map { case (sym, f) =>
          val merged = sym.foldLeft(Vector.empty[String]) { (acc, s) =>
            if (acc.nonEmpty && acc.last == l && s == r)
              acc.init :+ (l + r)
            else acc :+ s
          }
          merged -> f
        }.groupBy(_._1).map { case (k, vs) => k -> vs.values.sum }
      }
    }
    out.result()
  }

  test("train matches the sequential reference on a nontrivial corpus") {
    val corpus = Seq(
      "low lower lowest low low", "newer newest new news",
      "wide wider widest", "low newer lowest")
    val df = corpus.zipWithIndex.map(_.swap).toDF("doc_id", "text")
    val got = Bpe.train(df, "text", numMerges = 8)
      .map(m => (m.lhs, m.rhs, m.pairCount))
    assert(got == referenceTrain(corpus, 8))
  }

  test("driver fast path and distributed path emit identical merge sequences") {
    val corpora = Seq(
      Seq("low lower lowest low low", "newer newest new news",
        "wide wider widest", "low newer lowest"),
      Seq("aaaa aaaa aaa", "the cat sat on the mat", "ab ab abab"),
      (0 until 30).map(i => s"doc word$i shares share sharing ${i % 7}"))
    corpora.foreach { corpus =>
      val df = corpus.zipWithIndex.map(_.swap).toDF("doc_id", "text")
      val fast = Bpe.train(df, "text", numMerges = 12)
      val dist = Bpe.train(df, "text", numMerges = 12, smallVocabWords = 0L)
      assert(fast == dist,
        s"paths diverged on $corpus:\n fast=$fast\n dist=$dist")
    }
    // minPairCount early stop agrees too
    val df = Seq((1L, "ab ab cd")).toDF("doc_id", "text")
    assert(Bpe.train(df, "text", 5, minPairCount = 2L) ==
      Bpe.train(df, "text", 5, minPairCount = 2L, smallVocabWords = 0L))
  }

  test("driver fast path trains a 5k-merge vocabulary in seconds") {
    // vocab-sized work, corpus-size independent: 2500 distinct words of
    // length 16 admit ~35k merges; the incremental trainer must clear
    // 5000 of them interactively (the distributed loop would schedule
    // ~10k Spark jobs for the same result)
    val rng = new scala.util.Random(42)
    val words = (0 until 2500).map(_ =>
      (0 until 16).map(_ => ('a' + rng.nextInt(26)).toChar).mkString)
    val df = words.grouped(50).zipWithIndex
      .map { case (g, i) => (i.toLong, g.mkString(" ")) }.toSeq
      .toDF("doc_id", "text")
    val t0 = System.nanoTime()
    val merges = Bpe.train(df, "text", numMerges = 5000)
    val secs = (System.nanoTime() - t0) / 1e9
    info(f"5000-merge training took $secs%.2f s")
    assert(merges.size == 5000, s"expected 5000 merges, got ${merges.size}")
    assert(secs < 30.0, f"driver fast path too slow: $secs%.2f s")
    // ranks are sequential and counts non-increasing per the greedy order
    assert(merges.map(_.rank) == (0 until 5000))
  }

  test("overlapping repeats merge greedily left-to-right") {
    val df = Seq((1L, "aaaa aaaa aaa")).toDF("doc_id", "text")
    val m = Bpe.train(df, "text", numMerges = 1)
    assert(m.head.lhs == "a" && m.head.rhs == "a")
    // "aaaa" -> [aa, aa, </w>] x2, "aaa" -> [aa, a, </w>]: pair (a,a)
    // counted 3+3+2 = 8 before merging (4 chars = 3 adjacent pairs)
    assert(m.head.pairCount == 8L)
    val enc = Seq((1L, "aaaa aaa")).toDF("doc_id", "text")
      .select(Bpe.encodeColumn(col("text"), m).as("toks"))
      .as[Seq[String]].head()
    assert(enc == Seq("aa", "aa", Bpe.EndOfWord, "aa", "a", Bpe.EndOfWord))
  }

  test("training is partitioning-independent; encode applies rank order") {
    val docs = (0L until 40L).map(i => (i, s"the cat sat on the mat ${i % 5}"))
    val a = Bpe.train(docs.toDF("doc_id", "text"), "text", 6)
    val b = Bpe.train(docs.toDF("doc_id", "text").repartition(7), "text", 6)
    assert(a == b, "merge sequence must not depend on partitioning")
    // encoding with the learned merges reconstructs each word's chars
    val joined = docs.take(1).toSeq.toDF("doc_id", "text")
      .select(Bpe.encodeColumn(col("text"), a).as("toks"))
      .as[Seq[String]].head()
    val flat = joined.mkString.replace(Bpe.EndOfWord, "")
    assert(flat == "thecatsatonthemat0", "merges must be lossless")
  }

  test("broadcast encoder matches the expression path on learned merges") {
    val corpus = Seq(
      "low lower lowest low low", "newer newest new news",
      "wide wider widest", "low newer lowest", "the cat sat on the mat")
    val df = corpus.zipWithIndex.map(_.swap).toDF("doc_id", "text")
    val merges = Bpe.train(df, "text", numMerges = 12)
    val expr = df.select(col("doc_id"),
      Bpe.encodeColumnExpr(col("text"), merges).as("toks"))
      .orderBy("doc_id").as[(Long, Seq[String])].collect()
    val bcast = df.select(col("doc_id"),
      Bpe.encodeColumnBroadcast(col("text"), merges).as("toks"))
      .orderBy("doc_id").as[(Long, Seq[String])].collect()
    assert(expr.sameElements(bcast),
      s"paths diverged: ${expr.toSeq} vs ${bcast.toSeq}")
    // null/empty agreement: null text is null TOKENS on BOTH paths (the
    // dispatch must not change null-row output when the merge list
    // crosses MaxExprMerges); empty/whitespace text is an empty array
    val edgeDf = Seq((1L, null.asInstanceOf[String]), (2L, ""), (3L, "  "))
      .toDF("doc_id", "text")
    Seq(Bpe.encodeColumnExpr(col("text"), merges),
        Bpe.encodeColumnBroadcast(col("text"), merges)).foreach { encCol =>
      val edge = edgeDf.orderBy("doc_id").select(encCol.as("toks"))
        .as[Option[Seq[String]]].collect()
      assert(edge(0).isEmpty, "null text must encode to null tokens")
      assert(edge(1).contains(Seq.empty) && edge(2).contains(Seq.empty))
    }
  }

  test("a 10k-merge vocabulary encodes through the broadcast dispatch") {
    // the expression path cannot compile a 10k-fold tree; the dispatcher
    // must route a production-size merge list to the broadcast encoder.
    // Synthetic rank-consistent chain vocabulary: "ab", "abc", "abcd", ...
    // over a 26-letter alphabet plus filler merges to pass 10k.
    val alphabet = ('a' to 'z').map(_.toString)
    val chain = (1 until 26).map { i =>
      Bpe.Merge(i - 1, alphabet.take(i).mkString, alphabet(i), 1L)
    }
    val filler = (0 until 10000).map { i =>
      Bpe.Merge(26 + i, s"zz$i", s"qq$i", 1L) // never matches real text
    }
    val merges = chain ++ filler
    assert(merges.size > Bpe.MaxExprMerges)
    val enc = Seq((1L, "abcdefghijklmnopqrstuvwxyz abc zzz"))
      .toDF("doc_id", "text")
      .select(Bpe.encodeColumn(col("text"), merges).as("toks"))
      .as[Seq[String]].head()
    assert(enc == Seq("abcdefghijklmnopqrstuvwxyz", Bpe.EndOfWord,
      "abc", Bpe.EndOfWord, "z", "z", "z", Bpe.EndOfWord))
  }

  test("rank-greedy word encoder: lowest rank wins, all occurrences merge") {
    val ranks = Map(("a", "b") -> 0, ("c", "d") -> 1, ("ab", "cd") -> 2)
    assert(Bpe.encodeWord("abcdab", ranks).toSeq ==
      Seq("abcd", "ab", Bpe.EndOfWord))
    assert(Bpe.encodeWord("", ranks).toSeq == Seq(Bpe.EndOfWord))
    assert(Bpe.encodeWord("xy", Map.empty).toSeq ==
      Seq("x", "y", Bpe.EndOfWord))
  }

  test("early stop below minPairCount and on empty corpora") {
    val df = Seq((1L, "ab")).toDF("doc_id", "text")
    // pairs (a,b) and (b,</w>) each count 1 -> stops immediately at min 2
    assert(Bpe.train(df, "text", 5, minPairCount = 2L).isEmpty)
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Bpe.train(empty, "text", 3).isEmpty)
  }
}

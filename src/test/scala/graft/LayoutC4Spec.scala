package graft

import org.apache.spark.sql.functions._

import graft.operators.{C4Filters, Layout}

/** C4 heuristic cleaning and Z-order layout — round-7 additions. */
class LayoutC4Spec extends SparkSpec {
  import spark.implicits._

  // --- C4 filters ----------------------------------------------------------

  private def page(lines: String*) = lines.mkString("\n")

  private def cleanOne(text: String, minWords: Int = 5, minSent: Int = 3) =
    C4Filters.clean(Seq((1L, text)).toDF("id", "page"), "page",
      minWords, minSent).collect().head

  test("c4: line rules drop unterminated, short, and javascript lines") {
    val r = cleanOne(page(
      "This is a fine sentence with enough words.",
      "Too short.",
      "this one has no terminal punctuation at all",
      "Please enable JavaScript to see this content.",
      "Another perfectly good long sentence ends here!"))
    assert(r.getAs[Long]("n_lines_kept") === 2)
    assert(r.getAs[Long]("n_lines_dropped") === 3)
    val cleaned = r.getAs[String]("cleaned")
    assert(cleaned.linesIterator.toSeq === Seq(
      "This is a fine sentence with enough words.",
      "Another perfectly good long sentence ends here!"))
  }

  test("c4: the javascript rule matches the word, not the substring") {
    val r = cleanOne(page(
      "This page praises a javascripted widget of great beauty.",
      "Please enable javascript to see the rest of it now.",
      "A closing sentence keeps the page above the sentence floor.",
      "One more long sentence for the minimum sentence count."))
    // 'javascripted' is NOT the word javascript (Raffel §2.2 drops lines
    // with the WORD) — only the enable-javascript notice drops
    assert(r.getAs[Long]("n_lines_kept") === 3)
    assert(r.getAs[String]("cleaned").contains("javascripted"))
    assert(!r.getAs[String]("cleaned").contains("enable javascript"))
  }

  test("c4: page rules fire with lorem > brace > sentence precedence") {
    val lorem = "We present Lorem Ipsum dolor here { x }."
    assert(cleanOne(lorem).getAs[String]("reason") === "lorem_ipsum")
    val brace = "A fragment of code { return } appeared inline."
    assert(cleanOne(brace).getAs[String]("reason") === "brace")
    val thin = "Just one good sentence lives on this page."
    val r = cleanOne(thin)
    assert(r.getAs[String]("reason") === "too_few_sentences")
    assert(r.getAs[Long]("kept") === 0)
    val good = page(
      "First sentence is long enough to survive the cut.",
      "Second sentence also carries plenty of words along.",
      "Third sentence closes the page quite nicely indeed.")
    val g = cleanOne(good)
    assert(g.getAs[String]("reason") === "ok")
    assert(g.getAs[Long]("kept") === 1)
    assert(g.getAs[Long]("n_sentences") === 3)
  }

  test("c4: quote-terminated lines survive; thresholds are configurable") {
    val quoted = "\"A quoted sentence keeps its closing mark here.\""
    val r = cleanOne(page(quoted, "Tiny line."), minWords = 2, minSent = 1)
    assert(r.getAs[Long]("n_lines_kept") === 2)
    assert(r.getAs[Long]("kept") === 1)
  }

  test("c4: the pass is a pure map — no exchange in the plan") {
    val df = (0 until 100).map(i => (i.toLong, s"Row $i text goes here."))
      .toDF("id", "page")
    val p = C4Filters.clean(df, "page").queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"c4 clean must not shuffle:\n$p")
  }

  // --- Z-order layout ------------------------------------------------------

  /** Reference Morton interleave, independently written. */
  private def morton(a: Long, b: Long, bits: Int): Long = {
    var z = 0L
    for (i <- 0 until bits) {
      z |= ((a >> i) & 1L) << (2 * i)
      z |= ((b >> i) & 1L) << (2 * i + 1)
    }
    z
  }

  test("zvalue matches the reference interleave on random keys") {
    val rnd = new scala.util.Random(3)
    val rows = Seq.fill(200)((rnd.nextInt(1 << 16).toLong,
      rnd.nextInt(1 << 16).toLong))
    val got = Layout.withZValue(rows.toDF("a", "b"), "a", "b", bits = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    rows.foreach { case (a, b) =>
      assert(got((a, b)) === morton(a, b, 16), s"($a,$b)")
    }
    intercept[IllegalArgumentException] {
      Layout.zValue(col("a"), col("b"), 0)
    }
  }

  test("z-order layout keeps per-partition ranges tight on BOTH keys") {
    // uniform 256x256 key grid; 16 output partitions
    val rows = for (a <- 0 until 256; b <- 0 until 256 if (a + b) % 4 == 0)
      yield (a.toLong, b.toLong)
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 8)).toDF("a", "b")
    def spreads(d: org.apache.spark.sql.DataFrame): Seq[(Long, Long)] =
      d.withColumn("pid", spark_partition_id())
        .groupBy("pid")
        .agg((max("a") - min("a")).as("sa"), (max("b") - min("b")).as("sb"))
        .collect().map(r => (r.getLong(1), r.getLong(2))).toSeq
    val zed = spreads(Layout.zorderLayout(df, "a", "b", bits = 8,
      numPartitions = 16))
    // a single-key sort gives the full 255 range on the OTHER key
    val plain = spreads(df.repartitionByRange(16, col("a"))
      .sortWithinPartitions("a"))
    // sampled range boundaries need not align to tile boundaries, so a
    // straddling partition can sprawl on one dim — the locality claim is
    // aggregate: the TYPICAL partition is a tight tile on BOTH keys,
    // where a single-key sort always sprawls to ~full range on the other
    def meanMax(s: Seq[(Long, Long)]) =
      s.map { case (sa, sb) => math.max(sa, sb) }.sum.toDouble / s.size
    assert(meanMax(zed) <= 128, s"z-order spread too wide: $zed")
    assert(zed.count { case (sa, sb) => sa <= 127 && sb <= 127 } >=
      zed.size * 3 / 4, s"most partitions must be tiles: $zed")
    assert(meanMax(plain) > 200,
      s"control: single-key layout should sprawl on b: $plain")
  }
}

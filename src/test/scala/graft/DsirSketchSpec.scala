package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dsir, Sampling, Sketches}

/** DSIR importance weighting, count–min sketches, and temperature
  * mixing — the round-7 corpus-statistics additions. */
class DsirSketchSpec extends SparkSpec {
  import spark.implicits._

  // --- DSIR ----------------------------------------------------------------

  private def corpus(parts: Int = 4) = {
    // 20 "reference prose" docs (the target), 40 raw docs of the SAME
    // length: half sample the target's vocabulary, half a disjoint junk
    // vocabulary (equal lengths — DSIR log weights are feature SUMS, so
    // a length skew would dominate the vocabulary signal). Per-doc
    // multiplicity patterns come from a fixed seed so scores are
    // distinct, not block-tied.
    val rnd = new scala.util.Random(42)
    def doc(vocab: String) =
      Seq.fill(20)(s"$vocab${rnd.nextInt(10)}").mkString(" ")
    val target = (0 until 20).map(i => (i.toLong, doc("a"), "wiki"))
    val like = (0 until 20).map(i => ((100 + i).toLong, doc("a"), "web"))
    val junk = (0 until 20).map(i => ((200 + i).toLong, doc("z"), "web"))
    spark.createDataFrame(
      spark.sparkContext.parallelize(target ++ like ++ junk, parts))
      .toDF("doc_id", "text", "source")
  }

  test("dsir: native bucket/score kernels equal the declarative chain") {
    // the r11 native kernels (one md5 per gram, no concat/hex/conv, no
    // interpreted aggregate lambda) must reproduce the declarative
    // gramArr/bucketOf form bit-for-bit — that form is what the q124
    // oracle replays in DuckDB
    import org.apache.spark.sql.functions._
    val docs = corpus(3).select(col("doc_id"), col("text"))
      .unionByName(Seq(
        (900L, "single"), (901L, ""), (902L, "  "),
        (903L, null.asInstanceOf[String]),
        (904L, "ünïcode tokens with ünïcode bytes"))
        .toDF("doc_id", "text"))
    val buckets = 64 // small so collisions genuinely occur
    val w = coalesce(graft.functions.TextFunctions.tokens(lower(col("text"))),
      array().cast("array<string>"))
    // bucket arrays: native vs declarative transform over gram strings
    val both = docs.select(col("doc_id"),
      graft.functions.Expressions.dsir_buckets(w, buckets).as("nat"),
      transform(graft.operators.Dsir.gramArr(col("text")),
        g => graft.operators.Dsir.bucketOf(g, buckets)).as("dec"))
      .collect()
    both.foreach { r =>
      assert(r.getSeq[Long](1) === r.getSeq[Long](2),
        s"doc ${r.getLong(0)}: bucket arrays differ")
    }
    // log-weight: native one-pass fold vs aggregate(element_at) fold
    val lutArr = Array.tabulate(buckets)(i => (i * 37L - 1000L))
    val lut = lit(lutArr)
    val scores = docs.select(col("doc_id"),
      graft.functions.Expressions.dsir_logw(w, lut).as("nat"),
      aggregate(graft.operators.Dsir.gramArr(col("text")), lit(0L),
        (acc, t) => acc + element_at(lut,
          (graft.operators.Dsir.bucketOf(t, buckets) + 1).cast("int")))
        .as("dec"))
      .collect()
    scores.foreach { r =>
      assert(r.getLong(1) === r.getLong(2),
        s"doc ${r.getLong(0)}: ${r.getLong(1)} != ${r.getLong(2)}")
    }
  }

  test("dsir: target-like docs outscore junk and fill the kept quarter") {
    val out = Dsir.importanceWeights(corpus(), "doc_id", "text",
      targetPred = col("source") === "wiki", buckets = 2048, keepFrac = 0.25)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(4))).toMap
    val likeAvg = (100L until 120L).map(out(_)._1).sum / 20.0
    val junkAvg = (200L until 220L).map(out(_)._1).sum / 20.0
    assert(likeAvg > junkAvg,
      s"target-like docs must outscore junk: $likeAvg <= $junkAvg")
    val kept = out.filter(_._2._2 == 1L).keys.toSet
    // keepFrac=0.25 of 60 docs → at most 15 strictly above the cut
    assert(kept.size <= 15 && kept.nonEmpty, s"kept ${kept.size}")
    // nothing from the junk block may beat the cut
    assert(kept.forall(_ < 200L), s"junk doc kept: $kept")
  }

  test("dsir: scores are independent of partitioning") {
    val a = Dsir.importanceWeights(corpus(1), "doc_id", "text",
      col("source") === "wiki").collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val b = Dsir.importanceWeights(corpus(7), "doc_id", "text",
      col("source") === "wiki").collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(a === b)
  }

  test("dsir: empty and null text score zero grams, and guards fire") {
    val df = Seq((1L, "curated reference", "t"), (2L, "", "r"),
      (3L, null.asInstanceOf[String], "r")).toDF("doc_id", "text", "source")
    val out = Dsir.importanceWeights(df, "doc_id", "text",
      col("source") === "t", keepFrac = 0.5)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(2L) === ((0L, 0L)))
    assert(out(3L) === ((0L, 0L)))
    intercept[IllegalArgumentException] {
      Dsir.importanceWeights(df, "doc_id", "text", lit(false))
    }
    intercept[IllegalArgumentException] {
      Dsir.importanceWeights(df, "doc_id", "text", lit(true), keepFrac = 1.5)
    }
  }

  test("dsir: scoring plan is a pure map — no exchange carries the text") {
    val p = Dsir.importanceWeights(corpus(), "doc_id", "text",
      col("source") === "wiki")
      .queryExecution.executedPlan.toString
    val exchanges = p.linesIterator.filter(_.contains("Exchange")).toSeq
    assert(exchanges.forall(l => !l.contains("text#")),
      s"doc text crossed a shuffle:\n${exchanges.mkString("\n")}")
  }

  // --- count–min sketch ----------------------------------------------------

  private def tokenDf(rows: Seq[String], parts: Int = 4) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(Tuple1(_)), parts))
      .toDF("token")

  test("cms: estimate dominates the exact count for every item") {
    val rnd = new scala.util.Random(7)
    val toks = Seq.fill(5000)(s"tok${rnd.nextInt(300)}")
    val sketch = Sketches.cmsBuild(tokenDf(toks), "token", depth = 4, width = 64)
    val exact = toks.groupBy(identity).map { case (t, g) => t -> g.size.toLong }
    val probes = tokenDf(exact.keys.toSeq).withColumn("one", lit(1))
    val est = Sketches.cmsEstimate(sketch, probes, "token", depth = 4, width = 64)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    exact.foreach { case (t, c) =>
      assert(est(t) >= c, s"$t: est ${est(t)} < exact $c")
    }
    // the sketch is a real summary, not a census: at most depth*width cells
    assert(sketch.count() <= 4L * 64)
  }

  test("cms: merge of shard sketches equals the sketch of the union") {
    val a = Seq.fill(800)("alpha") ++ Seq.fill(300)("beta")
    val b = Seq.fill(500)("beta") ++ Seq.fill(200)("gamma")
    val merged = Sketches.merge(
      Sketches.cmsBuild(tokenDf(a), "token", 4, 32),
      Sketches.cmsBuild(tokenDf(b), "token", 4, 32))
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val whole = Sketches.cmsBuild(tokenDf(a ++ b), "token", 4, 32)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(merged === whole)
  }

  test("cms: never-seen item over a disjoint sketch estimates zero") {
    val sketch = Sketches.cmsBuild(tokenDf(Seq("only")), "token", 4, 1024)
    val est = Sketches.cmsEstimate(sketch,
      tokenDf(Seq("absent-item-xyz")), "token", 4, 1024)
      .collect().head.getLong(1)
    // width 1024 with a single occupied cell per row: the probe's cells
    // are empty unless md5 collides on all four rows — they don't here
    assert(est === 0L)
  }

  test("cms: duplicate probe rows each keep a row, and a probe column " +
      "named cnt/r/c cannot collide with the sketch") {
    val sketch = Sketches.cmsBuild(
      tokenDf(Seq.fill(9)("alpha") ++ Seq.fill(2)("beta")), "token", 4, 64)
    // two identical probe rows for 'alpha' + a cnt column shadowing the
    // sketch's count column and r/c shadowing its grid coordinates
    val probes = Seq(("alpha", 7L, 1, 2), ("alpha", 7L, 1, 2), ("beta", 0L, 3, 4))
      .toDF("token", "cnt", "r", "c")
    val out = Sketches.cmsEstimate(sketch, probes, "token", 4, 64)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(4)))
    assert(out.length === 3, s"duplicate probes collapsed: ${out.toSeq}")
    assert(out.count(t => t._1 == "alpha" && t._3 >= 9L) === 2)
    assert(out.count(t => t._1 == "beta" && t._3 >= 2L) === 1)
    // the caller's cnt column passes through untouched
    assert(out.filter(_._1 == "alpha").forall(_._2 === 7L))
  }

  test("cms: build shuffles cells, never tokens") {
    val p = Sketches.cmsBuild(tokenDf(Seq.fill(100)("x")), "token")
      .queryExecution.executedPlan.toString
    val exchanges = p.linesIterator.filter(_.contains("Exchange")).toSeq
    assert(exchanges.forall(l => !l.contains("token#")),
      s"raw tokens crossed a shuffle:\n${exchanges.mkString("\n")}")
  }

  test("cms fast tier (xxhash64) keeps the overestimate guarantee") {
    val rnd = new scala.util.Random(23)
    val toks = Seq.fill(3000)(s"tok${rnd.nextInt(250)}")
    val sketch = Sketches.cmsBuild(tokenDf(toks), "token",
      depth = 4, width = 64, portable = false)
    val exact = toks.groupBy(identity).map { case (t, g) => t -> g.size.toLong }
    val est = Sketches.cmsEstimate(sketch, tokenDf(exact.keys.toSeq),
      "token", depth = 4, width = 64, portable = false)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (t, c) =>
      assert(est(t) >= c, s"$t: fast-tier est ${est(t)} < exact $c")
    }
    // mixing tiers between build and probe is a caller bug the
    // guarantee does NOT survive — the probe may read empty cells
    val mixed = Sketches.cmsEstimate(sketch, tokenDf(exact.keys.toSeq),
      "token", depth = 4, width = 64, portable = true)
      .collect().map(r => r.getLong(1))
    assert(mixed.exists(_ == 0L), "tier mismatch should visibly break")
    // and the fast novelty path agrees with its own sketch end-to-end
    val nov = Sketches.cmsNoveltyScore(
      Seq((1L, "aardvark basilisk"), (2L, toks.take(40).mkString(" ")))
        .toDF("id", "text").union(tokenDf(toks).select(
          org.apache.spark.sql.functions.monotonically_increasing_id() + 100,
          org.apache.spark.sql.functions.col("token"))),
      "id", "text", depth = 4, width = 1024, rareMax = 1, portable = false)
      .filter(org.apache.spark.sql.functions.col("id") === 1L)
      .collect().head
    assert(nov.getLong(2) === 2L, "two singleton tokens must read rare")
  }

  test("cms novelty: unique-token docs score 1, common-token docs 0") {
    val rows = Seq(
      (1L, "aardvark basilisk chimera dodo"),      // all singletons
      (2L, "the the the the"),                     // 4 occurrences
      (3L, "the aardwolf"),                        // half rare
      (4L, ""), (5L, null.asInstanceOf[String]))
    val out = Sketches.cmsNoveltyScore(rows.toDF("id", "text"), "id", "text",
      depth = 4, width = 1024, rareMax = 1)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out(1L) === ((4L, 4L, 1.0)))
    assert(out(2L) === ((4L, 0L, 0.0)))
    assert(out(3L) === ((2L, 1L, 0.5)))
    assert(out(4L) === ((0L, 0L, 0.0)))
    assert(out(5L) === ((0L, 0L, 0.0)))
  }

  test("cms novelty is a conservative lower bound on true rare mass") {
    // narrow sketch forces collisions: estimated rarity can only shrink
    val rnd = new scala.util.Random(13)
    val rows = (0 until 80).map(i =>
      (i.toLong, Seq.fill(12)(s"w${rnd.nextInt(200)}").mkString(" ")))
    val df = rows.toDF("id", "text")
    val census = rows.flatMap(_._2.split(" ")).groupBy(identity)
      .map { case (t, g) => t -> g.size }
    val trueRare = rows.map { case (id, text) =>
      id -> text.split(" ").count(census(_) <= 2).toLong }.toMap
    val est = Sketches.cmsNoveltyScore(df, "id", "text",
      depth = 2, width = 16, rareMax = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    rows.foreach { case (id, _) =>
      assert(est(id) <= trueRare(id), s"doc $id: ${est(id)} > ${trueRare(id)}")
    }
  }

  // --- temperature mixture -------------------------------------------------

  test("temperature mixing flattens the head: rare domains gain share") {
    // 6400 "web" rows vs 100 "books": raw share 64:1, sqrt share 8:1
    val df = ((0 until 6400).map(i => (i.toLong, "web")) ++
      (0 until 100).map(i => ((10000 + i).toLong, "books")))
      .toDF("id", "domain")
    val out = Sampling.temperatureMixture(df, "domain", "id",
      totalRows = 1800, maxEpochs = 20)
      .groupBy("domain").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // plan: weights isqrt = (80, 10); needs = 1800*80/90=1600, 1800*10/90=200
    // books upsamples to ~2 epochs, web downsamples to ~25%
    assert(out("books") > 150 && out("books") < 250, s"books=${out("books")}")
    assert(out("web") > 1400 && out("web") < 1800, s"web=${out("web")}")
    val ratio = out("web").toDouble / out("books")
    assert(ratio > 6 && ratio < 11, s"sqrt-flattened ratio ~8, got $ratio")
  }

  test("temperature mixing equals mixtureSample with isqrt weights") {
    val df = ((0 until 900).map(i => (i.toLong, "a")) ++
      (0 until 400).map(i => ((5000 + i).toLong, "b")))
      .toDF("id", "domain")
    val auto = Sampling.temperatureMixture(df, "domain", "id", totalRows = 1000)
      .select("id", "epoch").collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val manual = Sampling.mixtureSample(df, "domain", "id",
      weights = Seq("a" -> 30L, "b" -> 20L), totalRows = 1000)
      .select("id", "epoch").collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(auto === manual)
  }

  test("temperature mixing bounds its domain census collect") {
    val df = (0 until 100).map(i => (i.toLong, s"d$i")).toDF("id", "domain")
    intercept[IllegalArgumentException] {
      Sampling.temperatureMixture(df, "domain", "id", totalRows = 100,
        maxDomains = 50)
    }
  }

  test("native portable CMS kernels match the declarative md5 formula") {
    import graft.functions.TextFunctions.hash64
    // cells: cms_cells posexplode must equal the struct-array explode
    val items = Seq("alpha", "beta", "uniq7", "x y", "", "d\u00e9j\u00e0")
      .toDF("t")
    val (depth, width) = (4, 64)
    val decl = items.select(explode(array((0 until depth).map(r =>
        struct(lit(r).as("r"),
          pmod(hash64(concat(lit(s"cms$r|"), col("t"))), lit(width.toLong))
            .as("c"))): _*)).as("cell"))
      .select(col("cell.r"), col("cell.c"))
      .orderBy("r", "c").collect().map(_.toSeq)
    val nat = items.select(posexplode(
        graft.functions.Expressions.cms_cells(col("t"), depth, width))
        .as(Seq("r", "c")))
      .orderBy("r", "c").collect().map(_.toSeq)
    assert(nat.toSeq == decl.toSeq)

    // rare count: one grid, both scorer tiers of the SAME portable
    // formula (native pass vs declarative least/element_at chain)
    val lutVals = Array.tabulate(depth * width)(i => (i % 5).toLong)
    val lut = lit(lutVals)
    val docs = Seq((1L, Seq("alpha", "beta", "gamma", "alpha")),
      (2L, Seq.empty[String])).toDF("id", "toks")
    def est(t: org.apache.spark.sql.Column) =
      least((0 until depth).map(r =>
        element_at(lut,
          (lit(r.toLong * width) +
            pmod(hash64(concat(lit(s"cms$r|"), t)), lit(width.toLong)) + 1)
            .cast("int"))): _*)
    for (rareMax <- Seq(0L, 2L, 4L)) {
      val d = docs.select(col("id"),
        size(filter(col("toks"), t => est(t) <= lit(rareMax)))
          .cast("long").as("n")).orderBy("id").collect().map(_.toSeq)
      val n = docs.select(col("id"),
        graft.functions.Expressions.cms_rare_count(
          col("toks"), lut, depth, width, rareMax).as("n"))
        .orderBy("id").collect().map(_.toSeq)
      assert(n.toSeq == d.toSeq, s"rareMax=$rareMax")
    }
  }
}

package graft

import graft.operators.Sampling

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private def ids(n: Int, parts: Int) =
    spark.range(0, n, 1, parts).toDF("id")
      .withColumn("grp", ($"id" % 7).cast("string"))

  test("sample membership is independent of partitioning") {
    val a = Sampling.deterministicSample(ids(5000, 1), "id", 0.2)
      .select("id").as[Long].collect().toSet
    val b = Sampling.deterministicSample(ids(5000, 16), "id", 0.2)
      .select("id").as[Long].collect().toSet
    assert(a === b)
    // ~20% with hash tolerance
    assert(a.size > 800 && a.size < 1200, s"got ${a.size}")
  }

  test("different salts draw different samples") {
    val a = Sampling.deterministicSample(ids(2000, 4), "id", 0.5, salt = "s1")
      .select("id").as[Long].collect().toSet
    val b = Sampling.deterministicSample(ids(2000, 4), "id", 0.5, salt = "s2")
      .select("id").as[Long].collect().toSet
    assert(a !== b)
  }

  test("split is exhaustive, exclusive, and weight-proportional") {
    val out = Sampling.withSplit(ids(10000, 8), "id",
      Seq("train" -> 8.0, "val" -> 1.0, "test" -> 1.0))
    val counts = out.groupBy("split").count()
      .as[(String, Long)].collect().toMap
    assert(counts.keySet === Set("train", "val", "test"))
    assert(counts.values.sum === 10000L) // exhaustive by construction
    assert(counts("train") > 7700 && counts("train") < 8300)
    assert(counts("val") > 700 && counts("val") < 1300)
    // deterministic: same rows land in the same split on re-run
    val again = Sampling.withSplit(ids(10000, 3), "id",
      Seq("train" -> 8.0, "val" -> 1.0, "test" -> 1.0))
    assert(out.select("id", "split").except(again.select("id", "split"))
      .count() === 0)
  }

  test("mixture sample hits target proportions, up- and down-sampling") {
    // domains sized 3000/600/150; target parts 1:1:1 at totalRows=3000
    // => need 1000 each: a downsamples (1/3), b upsamples (1 full epoch
    // + ~2/3), c upsamples (6 full epochs + ~2/3)
    val df = ids(3750, 8).withColumn("dom",
      org.apache.spark.sql.functions.when($"id" < 3000, "a")
        .when($"id" < 3600, "b").otherwise("c"))
    val out = Sampling.mixtureSample(df, "dom", "id",
      Seq("a" -> 1L, "b" -> 1L, "c" -> 1L), totalRows = 3000)
    val counts = out.groupBy("dom").count().as[(String, Long)]
      .collect().toMap
    for (d <- Seq("a", "b", "c"))
      assert(counts(d) > 850 && counts(d) < 1150,
        s"domain $d got ${counts(d)} rows, wanted ~1000")
    // every key's copies carry consecutive 0-based epoch ids
    val epochs = out.groupBy("id").agg(
      org.apache.spark.sql.functions.collect_set($"epoch").as("es"))
      .as[(Long, Seq[Int])].collect()
    assert(epochs.forall { case (_, es) => es.sorted == (0 until es.size) })
    // full epochs cover EVERY key of an upsampled domain
    val cIds = out.filter($"dom" === "c" && $"epoch" < 6)
      .groupBy("id").count().as[(Long, Long)].collect()
    assert(cIds.length === 150 && cIds.forall(_._2 === 6L))
  }

  test("mixture sample is partitioning-independent and drops unweighted domains") {
    val df = ids(2000, 1).withColumn("dom", ($"id" % 3).cast("string"))
    val a = Sampling.mixtureSample(df, "dom", "id",
      Seq("0" -> 2L, "1" -> 1L), totalRows = 900)
    val b = Sampling.mixtureSample(
      ids(2000, 16).withColumn("dom", ($"id" % 3).cast("string")),
      "dom", "id", Seq("0" -> 2L, "1" -> 1L), totalRows = 900)
    assert(a.select("id", "epoch").except(b.select("id", "epoch"))
      .count() === 0)
    assert(b.select("id", "epoch").except(a.select("id", "epoch"))
      .count() === 0)
    assert(a.filter($"dom" === "2").count() === 0)
  }

  test("mixture sample fails fast past maxEpochs and on empty weighted domains") {
    val df = ids(1000, 4).withColumn("dom",
      org.apache.spark.sql.functions.when($"id" < 990, "big")
        .otherwise("tiny"))
    intercept[IllegalArgumentException] {
      Sampling.mixtureSample(df, "dom", "id",
        Seq("big" -> 1L, "tiny" -> 1L), totalRows = 1000, maxEpochs = 10)
    }
    intercept[IllegalArgumentException] {
      Sampling.mixtureSample(df, "dom", "id",
        Seq("big" -> 1L, "absent" -> 1L), totalRows = 1000)
    }
  }

  test("stratified quota is exact per group and deterministic") {
    val out = Sampling.stratifiedQuota(ids(1000, 8), "grp", "id", quota = 11)
    val counts = out.groupBy("grp").count().as[(String, Long)]
      .collect().toMap
    assert(counts.values.toSet === Set(11L))
    val again = Sampling.stratifiedQuota(ids(1000, 2), "grp", "id", quota = 11)
    assert(out.select("id").except(again.select("id")).count() === 0)
    // a group smaller than the quota survives whole
    val small = Sampling.stratifiedQuota(ids(5, 1), "grp", "id", quota = 11)
    assert(small.count() === 5)
  }

  test("leakage-safe split: families never straddle the cut; per-id split would") {
    // 1000 ids in 100 families of 10 — label = id / 10 * 10 (min member)
    val df = spark.range(0, 1000).toDF("id")
    val labels = df.withColumn("fam", ($"id" / 10).cast("long") * 10)
    val out = Sampling.leakageSafeSplit(df, "id", labels, "fam",
      Seq("train" -> 0.8, "holdout" -> 0.2))
      .select("id", "fam", "split").as[(Long, Long, String)].collect()
    assert(out.length == 1000)
    // every family is entirely on one side
    out.groupBy(_._2).foreach { case (fam, rows) =>
      assert(rows.map(_._3).distinct.length == 1, s"family $fam straddles")
    }
    // both sides inhabited, roughly proportional at the FAMILY level
    val famSplit = out.groupBy(_._2).map(_._2.head._3)
    val nTrain = famSplit.count(_ == "train")
    assert(nTrain > 60 && nTrain < 95, s"train families: $nTrain")
    // contrast: the per-id split breaks >half of these families apart
    val perId = Sampling.withSplit(df, "id", Seq("train" -> 0.8, "holdout" -> 0.2))
      .select("id", "split").as[(Long, String)].collect()
    val broken = perId.groupBy(_._1 / 10).count(_._2.map(_._2).distinct.length > 1)
    assert(broken > 50, s"expected the naive split to break families: $broken")
  }

  test("weighted sample: deterministic, weight-proportional, w<=0 excluded") {
    // 100 light items (w=1) + 10 heavy (w=50): heavy mass = 500 vs 100,
    // so across many salted draws of k=10 the heavies must dominate
    val df = ((0L until 100L).map(i => (i, "g", 1L)) ++
      (100L until 110L).map(i => (i, "g", 50L)))
      .toDF("id", "grp", "w")
    val heavyCounts = (0 until 8).map { s =>
      Sampling.weightedSample(df, "grp", "id", "w", k = 10, salt = s"s$s")
        .select("id").as[Long].collect().count(_ >= 100L)
    }
    // expectation ~8.3 heavies of 10 per draw; demand a clear majority
    // in every draw and a strong aggregate
    assert(heavyCounts.forall(_ >= 5), s"per-draw heavies: $heavyCounts")
    assert(heavyCounts.sum >= 55, s"aggregate heavies: ${heavyCounts.sum}")
    // same salt -> identical selection under any partitioning
    assert(Sampling.weightedSample(df, "grp", "id", "w", 10)
      .orderBy("es_rank").collect().toSeq ===
      Sampling.weightedSample(df.repartition(7), "grp", "id", "w", 10)
        .orderBy("es_rank").collect().toSeq)
    // zero/negative/null weights never selected
    val mixed = Seq((1L, Some(5L)), (2L, Some(0L)), (3L, Some(-4L)),
      (4L, None)).toDF("id", "w")
      .withColumn("grp", org.apache.spark.sql.functions.lit("g"))
    assert(Sampling.weightedSample(mixed, "grp", "id", "w", 10)
      .select("id").as[Long].collect().toSeq === Seq(1L))
  }
}

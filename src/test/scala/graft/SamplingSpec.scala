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
}

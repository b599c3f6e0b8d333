package graft

import graft.operators.Winsorize

class WinsorizeSpec extends SparkSpec {
  import spark.implicits._

  test("clips exactly at the integer-rank percentile cuts") {
    // group g: values 1..100 once each → p5 cut = 5, p95 cut = 95
    val df = (1 to 100).map(v => ("g", v.toLong)).toDF("grp", "v")
    val out = Winsorize.winsorize(df, "grp", "v", 5, 95)
      .collect().map(r => r.getLong(1) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out(1L) === ((5L, 95L, 5L)))
    assert(out(50L) === ((5L, 95L, 50L)))
    assert(out(99L) === ((5L, 95L, 95L)))
    assert(out(5L) === ((5L, 95L, 5L)))
  }

  test("groups clip independently and outliers land on the cuts") {
    val df = ((1 to 20).map(v => ("small", v.toLong)) ++
      (1 to 20).map(v => ("big", v * 1000L))).toDF("grp", "v")
    val out = Winsorize.winsorize(df, "grp", "v", 10, 90)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(4)).toMap
    // ranks: ceil(10*20/100)=2 → cut_lo = 2nd value; ceil(90*20/100)=18
    assert(out(("small", 1L)) === 2L)
    assert(out(("small", 20L)) === 18L)
    assert(out(("big", 1000L)) === 2000L)
    assert(out(("big", 20000L)) === 18000L)
    intercept[IllegalArgumentException] {
      Winsorize.winsorize(df, "grp", "v", 0, 95)
    }
  }

  test("clipping is independent of partitioning") {
    def run(parts: Int) = Winsorize.winsorize(
      spark.createDataFrame(spark.sparkContext.parallelize(
        (1 to 500).map(v => (s"g${v % 3}", (v * 7 % 97).toLong)), parts))
        .toDF("grp", "v"), "grp", "v", 5, 95)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(4))).toSeq
      .sorted
    assert(run(1) === run(13))
  }
}

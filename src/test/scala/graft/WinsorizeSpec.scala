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

  test("MAD outliers: hand-computed medians, robust to the tail it flags") {
    import graft.operators.Winsorize
    // g: values 10,10,11,12,13 + a 1000 outlier. Lower-median = 11
    // (n=6, rank ceil(6/2)=3); deviations 1,1,0,1,2,989 -> MAD = 1
    // z(1000) = 0.6745*989 -> way out; z(12) = 0.6745 -> in
    val df = Seq(("g", 10L), ("g", 10L), ("g", 11L), ("g", 12L),
      ("g", 13L), ("g", 1000L)).toDF("grp", "v")
    val out = Winsorize.madOutliers(df, "grp", "v")
      .collect().map(r => r.getLong(1) ->
        (r.getLong(2), r.getLong(3), r.getBoolean(5))).toMap
    assert(out(1000L) === ((11L, 1L, true)))
    assert(out(12L) === ((11L, 1L, false)))
    // a MEAN-based z would be dragged by the outlier itself: the robust
    // median is untouched at 11 even though the mean is ~176
    // MAD = 0 (constant group): null z, false outlier, no NaN
    val const = Seq(("c", 5L), ("c", 5L), ("c", 5L), ("c", 7L))
      .toDF("grp", "v")
    val cOut = Winsorize.madOutliers(const, "grp", "v").collect()
    assert(cOut.forall(r => r.isNullAt(4) || r.getLong(3) == 0))
    assert(cOut.forall(!_.getBoolean(5)))
  }
}

package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.Changepoint

class ChangepointSpec extends SparkSpec {
  import spark.implicits._

  private def ts(h: Int, m: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")

  test("constant rate is the zero fixed point; a step change accumulates") {
    // key "flat": exactly 2 events every hour 0..9 → y ≡ 0 → S ≡ 0
    val flat = (0 until 10).flatMap(h => Seq(("flat", ts(h)), ("flat", ts(h, 30))))
    // key "step": 1/hour for 0..4 then 3/hour for 5..9; H=10, T=20
    // y_h = 10·x_h − 20 → first half −10 each, second half +10 each
    // P: −10.. −50 then −40..0; floor = running min; S = P − min(0, floor)
    val step = (0 until 5).map(h => ("step", ts(h))) ++
      (5 until 10).flatMap(h => Seq(("step", ts(h)), ("step", ts(h, 10)),
        ("step", ts(h, 20))))
    val out = Changepoint.cusumHourly(
        (flat ++ step).toDF("k", "t"), "k", "t")
      .select(col("k"), hour(col("hour")).as("h"), col("n_events"),
        col("cusum_scaled").cast("long"))
      .as[(String, Int, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    for (h <- 0 until 10) assert(out(("flat", h)) === ((2L, 0L)), s"flat h=$h")
    val wantStep = Map(0 -> 0L, 1 -> 0L, 2 -> 0L, 3 -> 0L, 4 -> 0L,
      5 -> 10L, 6 -> 20L, 7 -> 30L, 8 -> 40L, 9 -> 50L)
    for (h <- 0 until 10) {
      assert(out(("step", h))._2 === wantStep(h), s"step h=$h")
      assert(out(("step", h))._1 === (if (h < 5) 1L else 3L))
    }
  }

  test("silent hours appear with zero counts and drive the stat down") {
    // events only in hours 0 and 5; spine must emit hours 1..4 too
    val rows = Seq(("k", ts(0)), ("k", ts(5)))
    val out = Changepoint.cusumHourly(rows.toDF("k", "t"), "k", "t")
      .select(hour(col("hour")), col("n_events"))
      .as[(Int, Long)].collect().toMap
    assert(out.keySet === (0 to 5).toSet)
    assert(out(3) === 0L && out(0) === 1L && out(5) === 1L)
  }

  test("slack suppresses small excursions") {
    // one extra event in one hour: with slack 1/hour nothing alarms
    val rows = (0 until 6).map(h => ("k", ts(h))) :+ (("k", ts(3, 30)))
    val stat = Changepoint.cusumHourly(rows.toDF("k", "t"), "k", "t",
        slack = 1L)
      .agg(max(col("cusum_scaled").cast("long"))).head().getLong(0)
    assert(stat === 0L)
  }

  test("empty input yields an empty frame with the contract schema") {
    val empty = Seq.empty[(String, Timestamp)].toDF("k", "t")
    val out = Changepoint.cusumHourly(empty, "k", "t")
    assert(out.count() === 0L)
    assert(out.columns.toSeq === Seq("k", "hour", "n_events", "cusum_scaled"))
  }

  test("partitioning invariance") {
    val rows = (0 until 200).map(i => (s"k${i % 3}", ts(i % 24, i % 60)))
    val df = rows.toDF("k", "t")
    val a = Changepoint.cusumHourly(df, "k", "t")
      .orderBy("k", "hour").collect().toSeq
    val b = Changepoint.cusumHourly(df.repartition(9), "k", "t")
      .orderBy("k", "hour").collect().toSeq
    assert(a === b)
  }
}

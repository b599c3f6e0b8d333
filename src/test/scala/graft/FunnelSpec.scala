package graft

import java.sql.Timestamp

import graft.operators.Funnel

class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Int) = new Timestamp(60000L * min)

  // user 1 completes view->click->error in order; user 2 clicks BEFORE
  // viewing (click must not count); user 3 views only; user 4 completes
  // view->click, then errors BEFORE the click (error must not count);
  // user 5 never views
  private val events = Seq(
    (1L, "view", ts(0)), (1L, "click", ts(5)), (1L, "error", ts(9)),
    (2L, "click", ts(1)), (2L, "view", ts(2)), (2L, "error", ts(3)),
    (3L, "view", ts(4)),
    (4L, "view", ts(0)), (4L, "error", ts(1)), (4L, "click", ts(2)),
    (5L, "click", ts(0)), (5L, "error", ts(1)))
    .toDF("user_id", "event_type", "ts")

  test("strict ordering: only in-order progressions count per stage") {
    val out = Funnel.funnel(events, "user_id", "ts", "event_type",
      Seq("view", "click", "error"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // stage 1: users 1,2,3,4 viewed; stage 2: 1 (click@5 > view@0) and
    // 4 (click@2 > view@0) — user 2's click precedes the view; stage 3:
    // only 1 (user 4's error precedes the click)
    assert(out === Map("1_view" -> 4L, "2_click" -> 2L, "3_error" -> 1L))
  }

  test("counts are monotone non-increasing down the funnel") {
    val out = Funnel.funnel(events, "user_id", "ts", "event_type",
      Seq("view", "click", "error")).collect().map(_.getLong(1))
    assert(out.zip(out.tail).forall { case (a, b) => a >= b })
  }

  test("a repeated stage type anchors to the previous step's time") {
    // view -> click -> view: user 1 has no second view after the click;
    // user 6 does
    val ev = events.union(Seq(
      (6L, "view", ts(0)), (6L, "click", ts(1)), (6L, "view", ts(2)))
      .toDF("user_id", "event_type", "ts"))
    val out = Funnel.funnel(ev, "user_id", "ts", "event_type",
      Seq("view", "click", "view"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out === Map("1_view" -> 5L, "2_click" -> 3L, "3_view" -> 1L))
  }

  test("userDepth reports the deepest stage per user") {
    val out = Funnel.userDepth(events, "user_id", "ts", "event_type",
      Seq("view", "click", "error"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(1L -> 3L, 2L -> 1L, 3L -> 1L, 4L -> 2L))
  }

  test("guards: empty stages and >9 stages rejected") {
    intercept[IllegalArgumentException] {
      Funnel.funnel(events, "user_id", "ts", "event_type", Nil)
    }
    intercept[IllegalArgumentException] {
      Funnel.funnel(events, "user_id", "ts", "event_type",
        (1 to 10).map(i => s"s$i"))
    }
  }

  test("plan: a chain of joins and aggregates, never a per-user sort/window") {
    val df = Funnel.funnel(events, "user_id", "ts", "event_type",
      Seq("view", "click", "error", "view"))
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Window"), s"no window allowed:\n$p")
    // the only Sort is the 4-row stage ordering; nothing sorts by user/ts
    assert(!"Sort \\[(user_id|ts)".r.findFirstIn(p).isDefined,
      s"per-user event sort found:\n$p")
  }

  test("burstiness: metronome hits -1, hand-computed two-gap case") {
    import graft.operators.Recency
    // user 1: perfectly periodic (gaps 60s,60s,60s) -> sigma=0 -> B=-1
    // user 2: gaps 10min and 30min -> mu=1200s, sigma=600s -> B=-1/3
    val rows = Seq(
      (1L, ts(0)), (1L, ts(1)), (1L, ts(2)), (1L, ts(3)),
      (2L, ts(0)), (2L, new Timestamp(600000L)),
      (2L, new Timestamp(2400000L)))
      .toDF("user_id", "ts")
    val out = Recency.burstiness(rows, "user_id", "ts")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(4))).toMap
    assert(out(1L) === ((3L, 60.0, -1.0)))
    val (n2, m2, b2) = out(2L)
    assert(n2 === 2L && m2 === 1200.0)
    assert(b2 === BigDecimal((10.0 - 20.0) / (10.0 + 20.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // single-event users drop out; all-zero gaps yield null cv/B
    val edge = Seq((5L, ts(1)), (6L, ts(2)), (6L, ts(2)))
      .toDF("user_id", "ts")
    val e = Recency.burstiness(edge, "user_id", "ts").collect()
    assert(e.map(_.getLong(0)).toSet === Set(6L))
    assert(e.head.isNullAt(3) && e.head.isNullAt(4))
  }

  test("session stats: islands, bounce and duration hand-computed") {
    import graft.queries.EventQueries
    // Reuse the operator logic through the declared query shape by
    // driving Recency-style session math directly: user 1 has two
    // sessions (3 events in 10 min, then a 40-min gap, then 1 event):
    // n_sessions 2, bounces 1 (the single-event one), durations 600s+0
    val rows = Seq(
      (1L, 1L, ts(0)), (2L, 1L, ts(5)), (3L, 1L, ts(10)),
      (4L, 1L, ts(50)), // > 30 min after ts(10) -> new session, bounce
      (5L, 2L, ts(0))) // lone event: 1 session, 1 bounce, duration 0
      .toDF("event_id", "user_id", "ts")
    val tmp = java.nio.file.Files.createTempDirectory("graft_sess").toString
    rows.write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val out = EventQueries.q170SessionStats(spark, tmp)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(out(1L) === ((2L, 1L, 0.5, 300.0))) // (600s + 0) / 2 sessions
    assert(out(2L) === ((1L, 1L, 1.0, 0.0)))
  }

  test("recency decay: hand-computed half-life weights, exact sums") {
    import graft.operators.Recency
    import org.apache.spark.sql.functions.col
    // reference = max ts. Ages: 0, 1 half-life, 2 half-lives ->
    // weights 1.0, 0.5, 0.25 exactly (micro-rounded)
    val day = 86400000L // ms
    val rows = Seq(
      (1L, new Timestamp(14 * day)), // age 0 -> 1.0
      (1L, new Timestamp(7 * day)),  // age 7d -> 0.5
      (2L, new Timestamp(0L)))       // age 14d -> 0.25
      .toDF("user_id", "ts")
    val out = Recency.recencyScores(rows, "user_id", "ts", 7.0)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    assert(out(1L) === ((2L, 1.5)))
    assert(out(2L) === ((1L, 0.25)))
    // invariant to partitioning (integer micro accumulation)
    val big = (0 until 500).map(i =>
      (i.toLong % 7, new Timestamp(i * 3600000L))).toDF("user_id", "ts")
    assert(Recency.recencyScores(big, "user_id", "ts", 2.0)
      .orderBy("user_id").collect().toSeq ===
      Recency.recencyScores(big.repartition(9), "user_id", "ts", 2.0)
        .orderBy("user_id").collect().toSeq)
  }
}

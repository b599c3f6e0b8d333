package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.StatefulFunnel
import graft.streaming.StatefulFunnel.Ev

class StatefulFunnelSpec extends SparkSpec {
  import spark.implicits._

  private val stages = Seq("signup", "view", "click")

  /** Drive `userDepths` over the given files-in-order (one micro-batch
    * each) and return the reconciled final depth per user. */
  private def drain(batches: Seq[Seq[(Long, Long, String)]],
                    sink: String): Map[Long, Int] = {
    val dir = Files.createTempDirectory("graft_funnel_src")
    batches.zipWithIndex.foreach { case (rows, i) =>
      val build = dir.resolve(s"_build_$i")
      rows.toDF("user_id", "ts_us", "event_type").coalesce(1)
        .write.mode("overwrite").parquet(build.toString)
      import scala.jdk.CollectionConverters._
      val part = Files.list(build).iterator().asScala
        .find(_.getFileName.toString.endsWith(".parquet")).get
      Files.copy(part, dir.resolve(f"batch_$i%02d.parquet"))
    }
    val schema = spark.read
      .parquet(dir.resolve("batch_00.parquet").toString).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir.toString).as[Ev]
    val q = StatefulFunnel.userDepths(stream, stages)
      .writeStream.outputMode("update")
      .format("memory").queryName(sink)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    spark.table(sink).groupBy($"user_id")
      .agg(max($"stages_completed").as("d"))
      .as[(Long, Int)].collect().toMap
  }

  test("state carries across micro-batches and matches the batch chain") {
    // user 1 completes signup in batch 1, view+click in batch 2;
    // user 2's view in batch 1 PRECEDES signup, so it must not count,
    // and the batch-2 view (after signup) completes stage 2;
    // user 3 never signs up -> absent from the output
    val batch1 = Seq(
      (1L, 10L, "signup"),
      (2L, 5L, "view"), (2L, 8L, "signup"),
      (3L, 7L, "view"))
    val batch2 = Seq(
      (1L, 20L, "view"), (1L, 30L, "click"),
      (2L, 25L, "view"),
      (3L, 40L, "click"))
    val got = drain(Seq(batch1, batch2), "graft_funnel_t1")
    assert(got === Map(1L -> 3, 2L -> 2))
  }

  test("strictly-later rule: an equal-timestamp next stage doesn't count") {
    // view at the SAME micro as signup: batch semantics need ts strictly
    // greater, so depth stays 1; the later click can't skip the view
    val got = drain(Seq(Seq(
      (7L, 100L, "signup"), (7L, 100L, "view"), (7L, 200L, "click"))),
      "graft_funnel_t2")
    assert(got === Map(7L -> 1))
  }

  /** The pre-r10 semantics: materialize, sort, greedy fold. */
  private def sortedFold(times: List[Long], evs: Seq[Ev],
                         st: Seq[String]): List[Long] = {
    var ts = times
    evs.sortBy(e => (e.ts_us, e.event_type)).foreach { e =>
      val k = ts.size
      if (k < st.size && e.event_type == st(k) &&
          (k == 0 || e.ts_us > ts.last))
        ts = ts :+ e.ts_us
    }
    ts
  }

  test("unordered fold ≡ sorted fold on random multisets and edge shapes") {
    val rnd = new scala.util.Random(23)
    for (trial <- 0 until 200) {
      val n = 1 + rnd.nextInt(60)
      val evs = (0 until n).map(_ => Ev(1L,
        rnd.nextInt(20).toLong, stages(rnd.nextInt(3))))
      // fresh state and a mid-chain prior state
      for (prior <- Seq(Nil, List(5L))) {
        val want = sortedFold(prior, evs, stages)
        val got = StatefulFunnel.fold(prior, evs.iterator, stages)
        assert(got === want, s"trial $trial prior $prior: $evs")
      }
    }
    // foreign event types are ignored; empty iterator is a no-op
    assert(StatefulFunnel.fold(Nil,
      Iterator(Ev(1, 3, "bogus"), Ev(1, 4, "signup")), stages) === List(4L))
    assert(StatefulFunnel.fold(List(9L), Iterator.empty, stages) === List(9L))
  }

  test("pathological single-user batch: hot spam folds bounded and exact") {
    // one user, 60k events in one micro-batch: 50k completed-stage spam
    // ("signup" repeats), later-stage events delivered BEFORE the
    // earlier stage, reversed time order — the shape the r9 verdict
    // flagged as an executor-heap sort-buffer risk
    val spam = (0 until 50000).map(i => (1L, 10L + (i % 100), "signup"))
    val chain = Seq((1L, 70000L, "click"), (1L, 50000L, "view"),
      (1L, 10L, "signup"))
    val noise = (0 until 10000).map(i =>
      (1L, (i * 7L) % 9000L, stages((i * 13) % 3)))
    val all = new scala.util.Random(3).shuffle(spam ++ chain ++ noise)
    val batch = graft.operators.Funnel.userDepth(
      all.toDF("user_id", "ts_us", "event_type"),
      "user_id", "ts_us", "event_type", stages)
      .as[(Long, Long)].collect().toMap
    val got = drain(Seq(all), "graft_funnel_t4")
      .map { case (u, d) => u -> d.toLong }
    assert(got === batch)
    // and directly: the fold sees the iterator once, unordered
    val evs = all.map { case (u, t, s) => Ev(u, t, s) }
    assert(StatefulFunnel.fold(Nil, evs.iterator, stages).size.toLong ===
      batch(1L))
  }

  test("adversarial descending hot user: buffer peak obeys the envelope") {
    // The documented memory contract, measured instead of prosed:
    //
    // (a) a stage whose predecessor chain is COMPLETE holds at most one
    //     prune interval of candidates even under the worst shape — a
    //     hot user spamming strictly DESCENDING times, where every
    //     event beats the current successor and so can never be
    //     discarded on sight
    val four = Seq("signup", "view", "click", "purchase")
    val desc = (0 until 100000).map(i => Ev(1L, 1000000L - i, "view"))
    val (out, peak) =
      StatefulFunnel.foldWithPeak(List(100L), desc.iterator, four)
    assert(out === List(100L, 900001L)) // min qualifying time, exact
    assert(peak <= 64 + four.size,
      s"completed-chain stage must stay within one prune interval, peak=$peak")

    // (b) a stage BEYOND the first incomplete one retains exactly the
    //     distinct candidate times — no fewer (a later-revealed
    //     threshold is a successor query; dropping any candidate can
    //     make some final answer wrong — the documented bounded-memory
    //     impossibility) and no more (duplicates dedupe on sight)
    val dup = (0 until 60000).map(i => Ev(1L, 500000L - (i % 30000), "view"))
    val (out2, peak2) =
      StatefulFunnel.foldWithPeak(Nil, dup.iterator, four)
    assert(out2 === Nil) // no signup ever arrived
    assert(peak2 === 30000,
      s"awaiting stage must hold exactly the distinct candidates, peak=$peak2")
    // ...and those retained candidates are exactly enough: the same
    // multiset plus a late first-stage completion recovers the chain
    val withSignup = dup :+ Ev(1L, 470001L, "signup")
    assert(StatefulFunnel.fold(Nil, withSignup.iterator, four) ===
      List(470001L, 470002L))

    // (c) in-order delivery (the documented discipline): the buffers
    //     never exceed one candidate per remaining stage
    val ordered = (0 until 10000).map(i =>
      Ev(1L, 10L + i, four((i % 4))))
    val (_, peak3) = StatefulFunnel.foldWithPeak(Nil, ordered.iterator, four)
    assert(peak3 <= 64 + four.size,
      s"in-order delivery must stay within the envelope, peak=$peak3")
  }

  test("opt-in idle timeout: same answers, state configured for eviction") {
    val batch1 = Seq((1L, 10L, "signup"), (2L, 8L, "signup"))
    val batch2 = Seq((1L, 20L, "view"), (2L, 25L, "view"),
      (2L, 30L, "click"))
    val dir = Files.createTempDirectory("graft_funnel_to")
    Seq(batch1, batch2).zipWithIndex.foreach { case (rows, i) =>
      val build = dir.resolve(s"_build_$i")
      rows.toDF("user_id", "ts_us", "event_type").coalesce(1)
        .write.mode("overwrite").parquet(build.toString)
      import scala.jdk.CollectionConverters._
      val part = Files.list(build).iterator().asScala
        .find(_.getFileName.toString.endsWith(".parquet")).get
      Files.copy(part, dir.resolve(f"batch_$i%02d.parquet"))
    }
    val schema = spark.read
      .parquet(dir.resolve("batch_00.parquet").toString).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir.toString).as[Ev]
    // NOTE: with ProcessingTimeTimeout pending, the engine keeps
    // scheduling timeout-check batches, so neither AvailableNow nor
    // processAllAvailable ever settles — poll the sink for the expected
    // answer, then stop the query explicitly
    val q = StatefulFunnel.userDepths(stream, stages,
        idleTimeoutMs = Some(3600L * 1000))
      .writeStream.outputMode("update")
      .format("memory").queryName("graft_funnel_t5")
      .start()
    val expected = Map(1L -> 2, 2L -> 3)
    def current() = spark.table("graft_funnel_t5").groupBy($"user_id")
      .agg(max($"stages_completed").as("d"))
      .as[(Long, Int)].collect().toMap
    val deadline = System.nanoTime() + 120L * 1000000000L
    var got = current()
    while (got != expected && System.nanoTime() < deadline) {
      Thread.sleep(200)
      got = current()
    }
    q.stop()
    q.awaitTermination()
    assert(got === expected)
  }

  test("matches Funnel.userDepth on a shuffled single batch") {
    val rnd = new scala.util.Random(11)
    val rows = (0 until 400).map { i =>
      (i % 37L, rnd.nextLong(100000L),
        stages(rnd.nextInt(3)))
    }
    val batch = graft.operators.Funnel.userDepth(
      rows.toDF("user_id", "ts_us", "event_type"),
      "user_id", "ts_us", "event_type", stages)
      .as[(Long, Long)].collect().toMap
    val got = drain(Seq(rnd.shuffle(rows)), "graft_funnel_t3")
      .map { case (u, d) => u -> d.toLong }
    assert(got === batch)
  }
}

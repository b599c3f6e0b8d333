package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.StatefulSessionizer
import graft.streaming.StatefulSessionizer.Ev

class StatefulSessionizerSpec extends SparkSpec {
  import spark.implicits._

  test("streaming custom-state sessionizer matches the batch answer") {
    // synthetic events: user 1 has sessions at t=0..2, t=4000..4001;
    // user 2 one session; 30-min (1800 s) gap rule
    val events = Seq(
      (1L, 0L), (1L, 60L), (1L, 120L),
      (1L, 4000L), (1L, 4001L),
      (2L, 10L), (2L, 20L))
    val srcDir = Files.createTempDirectory("graft_sess_src").toString
    events.toDF("user_id", "ts_sec").coalesce(1)
      .write.mode("overwrite").parquet(srcDir)

    // batch oracle: gaps-and-islands
    val batch = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"user_id").orderBy($"ts_sec")
      spark.read.parquet(srcDir)
        .withColumn("prev", lag($"ts_sec", 1).over(w))
        .withColumn("brk",
          when($"prev".isNull || $"ts_sec" - $"prev" > 1800L, 1L).otherwise(0L))
        .groupBy($"user_id")
        .agg(count(lit(1)).as("n_events"), sum($"brk").as("n_sessions"))
        .as[(Long, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
    }
    assert(batch(1L) == ((5L, 2L)) && batch(2L) == ((2L, 1L)))

    // streaming: same data through flatMapGroupsWithState
    val schema = spark.read.parquet(srcDir).schema
    val stream = spark.readStream.schema(schema).parquet(srcDir).as[Ev]
    val out = StatefulSessionizer.sessionCounts(stream, gapSeconds = 1800L)
    val q = out.writeStream
      .outputMode("update")
      .format("memory").queryName("graft_sessions")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val got = spark.table("graft_sessions")
      .groupBy($"user_id")
      .agg(max($"n_events").as("n_events"), max($"n_sessions").as("n_sessions"))
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got == batch, s"streaming $got != batch $batch")
  }

  test("watermarked streaming dedup: exact output AND state rows evicted") {
    // 2000 events spread over ~14 days, delivered TWICE (two files, one
    // micro-batch each). dropDuplicatesWithinWatermark under a 1-hour
    // watermark must (a) produce exactly the single-copy counts — the
    // q143 contract — and (b) hold only in-watermark keys in the state
    // store, unlike plain dropDuplicates whose state grows forever on a
    // continuous crawl.
    val n = 2000
    val events = (0 until n).map { i =>
      (i.toLong, s"type${i % 4}",
        new java.sql.Timestamp(1700000000000L + i * 600000L)) // 10-min grid
    }
    val srcDir = Files.createTempDirectory("graft_wm_src").toString
    val one = Files.createTempDirectory("graft_wm_one").toString
    events.toDF("event_id", "event_type", "ts").coalesce(1)
      .write.mode("overwrite").parquet(one)
    val file = new java.io.File(one).listFiles()
      .filter(_.getName.endsWith(".parquet")).head.toPath
    Files.copy(file, java.nio.file.Paths.get(srcDir, "a.parquet"))
    Files.copy(file, java.nio.file.Paths.get(srcDir, "b.parquet"))

    val schema = spark.read.parquet(srcDir).schema
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir)
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")
      .groupBy($"event_type").agg(count(lit(1)).as("n"))
      .writeStream
      .outputMode("complete")
      .format("memory").queryName("graft_wm_dedup")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    // (a) exact single-copy counts
    val got = spark.table("graft_wm_dedup")
      .as[(String, Long)].collect().toMap
    assert(got === Map("type0" -> 500L, "type1" -> 500L,
      "type2" -> 500L, "type3" -> 500L))

    // (b) eviction: the dedup operator's final state holds only keys
    // within the watermark horizon (1 hour = at most ~7 of the 10-min
    // grid events + slack), nowhere near the 2000 distinct ids
    val dedupState = q.recentProgress.flatMap(_.stateOperators)
      .filter(_.operatorName.contains("dedupe"))
    assert(dedupState.nonEmpty,
      s"no dedup state operator in ${q.recentProgress.flatMap(_.stateOperators)
        .map(_.operatorName).toSeq}")
    val finalRows = dedupState.last.numRowsTotal
    assert(finalRows < 100,
      s"state not evicted: $finalRows rows for $n distinct events")
  }

  test("append-mode watermarked windowed agg: each window once, state evicted") {
    // the q179 discipline: windowed counts in APPEND mode under a 1-hour
    // watermark, drained by a far-future sentinel file arriving last.
    // Must (a) emit every closed window EXACTLY once with the batch
    // counts, and (b) end with state holding only the still-open
    // sentinel window — not the full windows×types history (the q175
    // complete-mode shape this replaces for unbounded streams).
    val n = 2000
    val base = 1700000000000L
    val events = (0 until n).map { i =>
      (i.toLong, s"type${i % 4}",
        new java.sql.Timestamp(base + i * 600000L)) // 10-min grid, ~14 days
    }
    val srcDir = Files.createTempDirectory("graft_wmw_src").toString
    val one = Files.createTempDirectory("graft_wmw_one").toString
    events.toDF("event_id", "event_type", "ts").coalesce(1)
      .write.mode("overwrite").parquet(one)
    val file = new java.io.File(one).listFiles()
      .filter(_.getName.endsWith(".parquet")).head.toPath
    Files.copy(file, java.nio.file.Paths.get(srcDir, "a.parquet"))
    // sentinel: one event 60 days out — watermark sails past every real
    // window end once this (newest mod-time) file is the last batch
    val two = Files.createTempDirectory("graft_wmw_two").toString
    Seq((-1L, "sentinel",
        new java.sql.Timestamp(base + 60L * 86400000L)))
      .toDF("event_id", "event_type", "ts").coalesce(1)
      .write.mode("overwrite").parquet(two)
    val sfile = new java.io.File(two).listFiles()
      .filter(_.getName.endsWith(".parquet")).head.toPath
    Files.copy(sfile, java.nio.file.Paths.get(srcDir, "z.parquet"))

    val schema = spark.read.parquet(srcDir).schema
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir)
      .withWatermark("ts", "1 hour")
      .groupBy(window($"ts", "6 hours"), $"event_type")
      .agg(count(lit(1)).as("n"))
      .writeStream
      .outputMode("append")
      .format("memory").queryName("graft_wm_window")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val sink = spark.table("graft_wm_window")
      .select($"window.start".as("ws"), $"event_type", $"n")
    // (a) exactly once per closed window, batch-exact counts
    val batch = spark.read.parquet(srcDir)
      .filter($"event_type" =!= "sentinel")
      .groupBy(window($"ts", "6 hours"), $"event_type")
      .agg(count(lit(1)).as("n"))
      .select($"window.start".as("ws"), $"event_type", $"n")
    assert(sink.count() > 200, s"only ${sink.count()} windows drained")
    assert(sink.count() ===
      sink.select($"ws", $"event_type").distinct().count(),
      "a window emitted more than once")
    assert(sink.exceptAll(batch).isEmpty && batch.exceptAll(sink).isEmpty,
      "drained append output differs from the batch window counts")
    // (b) eviction: final state = the open sentinel window only
    val aggState = q.recentProgress.flatMap(_.stateOperators)
      .filter(_.operatorName.contains("stateStoreSave"))
    assert(aggState.nonEmpty,
      s"no agg state operator in ${q.recentProgress.flatMap(_.stateOperators)
        .map(_.operatorName).toSeq}")
    val finalRows = aggState.last.numRowsTotal
    assert(finalRows < 10,
      s"state not evicted: $finalRows rows vs ${sink.count()} closed windows")
  }
}

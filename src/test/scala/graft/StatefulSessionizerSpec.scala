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
}

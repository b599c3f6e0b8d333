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

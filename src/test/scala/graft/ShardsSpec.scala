package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.Shards

class ShardsSpec extends SparkSpec {
  import spark.implicits._

  test("shard assignment is deterministic and partitioning-independent") {
    val a = Shards.withShard(spark.range(0, 4000, 1, 1).toDF("id"), "id", 16)
      .select("id", "shard").as[(Long, Int)].collect().toMap
    val b = Shards.withShard(spark.range(0, 4000, 1, 32).toDF("id"), "id", 16)
      .select("id", "shard").as[(Long, Int)].collect().toMap
    assert(a === b)
    assert(a.values.toSet === (0 until 16).toSet)
    // roughly balanced: every shard within 2x of the uniform share
    val counts = a.values.groupBy(identity).map(_._2.size)
    assert(counts.forall(c => c > 125 && c < 500), counts.toString)
  }

  test("writeShards round-trips, one file per shard, manifest matches") {
    val dir = Files.createTempDirectory("graft_shards").toString
    val df = spark.range(0, 1000, 1, 7).toDF("id")
      .withColumn("payload", concat(lit("row-"), $"id"))
    val manifest = Shards.writeShards(df, "id", numShards = 8, dir)
    assert(manifest.numShards === 8)
    assert(manifest.totalRows === 1000L)
    assert(manifest.shards.map(_.shard) === (0 until 8))

    val back = Shards.readShards(spark, dir)
    assert(back.count() === 1000L)
    assert(back.select("id", "payload").except(
      df.select("id", "payload")).count() === 0)
    // partition discovery restores the shard column, and the on-disk
    // counts agree with the manifest
    val diskCounts = back.groupBy("shard").count()
      .as[(Int, Long)].collect().toMap
    assert(manifest.shards.forall(s => diskCounts(s.shard) === s.rows))
    // exactly one data file under each shard directory
    for (s <- 0 until 8) {
      val files = new java.io.File(s"$dir/shard=$s")
        .listFiles().filter(_.getName.endsWith(".parquet"))
      assert(files.length === 1, s"shard $s has ${files.length} files")
    }
    // the manifest file is valid JSON with the same totals
    val json = new String(Files.readAllBytes(
      java.nio.file.Paths.get(dir, "_manifest.json")), "UTF-8")
    assert(json.contains("\"totalRows\":1000"))
    // rows inside a shard file sit in the deterministic pseudo-random
    // order (hash under the order salt) — the training sample order
    def orderHash(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"shard#order|$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(md.substring(0, 15), 16)
    }
    val f0 = new java.io.File(s"$dir/shard=0").listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    val inFile = spark.read.parquet(f0.toString).coalesce(1)
      .select("id").as[Long].collect()
    assert(inFile.toSeq === inFile.toSeq.sortBy(id => (orderHash(id), id)))
  }

  test("seededShuffle: per-shard permutation, deterministic, seed-sensitive") {
    val df = spark.range(0, 2000, 1, 8).toDF("id")
    val a = Shards.seededShuffle(df, "id", numShards = 4, seed = "epoch1")
      .select("id", "shard", "pos").as[(Long, Int, Long)].collect()
    // pos is exactly 1..n within every shard (a permutation address)
    a.groupBy(_._2).foreach { case (s, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1L to rows.length).toSeq,
        s"shard $s pos not a permutation")
    }
    // deterministic under a different input partitioning
    val b = Shards.seededShuffle(spark.range(0, 2000, 1, 1).toDF("id"),
      "id", numShards = 4, seed = "epoch1")
      .select("id", "shard", "pos").as[(Long, Int, Long)].collect()
    assert(a.sortBy(_._1).toSeq == b.sortBy(_._1).toSeq)
    // a different epoch is a genuinely different permutation
    val c = Shards.seededShuffle(df, "id", numShards = 4, seed = "epoch2")
      .select("id", "shard", "pos").as[(Long, Int, Long)].collect()
    assert(a.sortBy(_._1).toSeq != c.sortBy(_._1).toSeq)
  }

  test("rendezvous sharding moves ONLY the new node's keys on growth") {
    val df = spark.range(0, 3000, 1, 8).toDF("id")
    def owners(nodes: Seq[String]) =
      Shards.rendezvousShard(df, "id", nodes)
        .select("id", "node").as[(Long, String)].collect().toMap
    val three = owners(Seq("n1", "n2", "n3"))
    val four = owners(Seq("n1", "n2", "n3", "n4"))
    val moved = three.keys.filter(k => three(k) != four(k))
    assert(moved.nonEmpty, "the new node must win some keys")
    assert(moved.forall(k => four(k) == "n4"),
      "every moved key must land on the ADDED node")
    // ~1/4 of the keys, with generous hash tolerance
    assert(moved.size > 500 && moved.size < 1000, s"moved ${moved.size}")
    // and removal only relocates the removed node's keys
    val without = owners(Seq("n1", "n3", "n4"))
    four.foreach { case (k, nd) =>
      if (nd != "n2") assert(without(k) == nd, s"key $k moved needlessly")
    }
    // balance: each of 4 nodes owns 15-35%
    val byNode = four.values.groupBy(identity).view.mapValues(_.size)
    byNode.foreach { case (nd, n) =>
      assert(n > 450 && n < 1050, s"$nd owns $n of 3000")
    }
    intercept[IllegalArgumentException] {
      Shards.rendezvousShard(df, "id", Seq("n1", "n1"))
    }
  }
}

package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.hash64

/** Deterministic output sharding — the last step of a training-data
  * pipeline: split a curated corpus into a fixed number of shards a
  * training job can stream independently (WebDataset / Megatron-style
  * shard-per-worker layout).
  *
  * Shard assignment is a pure function of a salted portable hash of the
  * key (same md5 formula as [[graft.operators.Sampling]]), NEVER of the
  * partitioning: re-running on the same data yields byte-identical shard
  * membership on any cluster size, and an auditor can recompute any
  * row's shard engine-independently. At 100 TB the write is one shuffle
  * (`repartition(numShards, shard)`) and each shard directory receives
  * exactly one file, because every shard value maps to exactly one of
  * the `numShards` partitions — no small-file explosion, no
  * driver-side loops.
  */
object Shards {

  /** Append the shard id column: `hash64(salt|key) mod numShards`. */
  def withShard(df: DataFrame, keyCol: String, numShards: Int,
                shardCol: String = "shard",
                salt: String = "shard"): DataFrame = {
    require(numShards > 0, "numShards must be > 0")
    val h: Column = hash64(
      concat(lit(salt), lit("|"), col(keyCol).cast("string")))
    df.withColumn(shardCol, pmod(h, lit(numShards.toLong)).cast("int"))
  }

  /** Rendezvous (highest-random-weight) shard assignment: the key goes
    * to the NAMED node with the greatest `hash64(node|salt|key)`. Where
    * `mod numShards` reshuffles ~everything when the shard count
    * changes, HRW moves ONLY the keys won by the added node (or owned
    * by a removed one) — ~1/(n+1) of the corpus — which is the property
    * that makes incremental shard-set growth cheap at 100 TB (the q138
    * oracle replays the argmax AND exhibits the movement matrix). Pure
    * per-row map over a literal node list; ties (a 60-bit md5
    * collision) break toward the lexically larger node, matching the
    * oracle's ORDER BY h DESC, node DESC. */
  def rendezvousShard(df: DataFrame, keyCol: String, nodes: Seq[String],
                      shardCol: String = "node",
                      salt: String = "hrw"): DataFrame = {
    require(nodes.nonEmpty && nodes.distinct.size == nodes.size,
      "nodes must be non-empty and distinct")
    val weights = array(nodes.map(nd =>
      struct(hash64(concat(lit(nd), lit(s"|$salt|"),
        col(keyCol).cast("string"))).as("h"), lit(nd).as("nd"))): _*)
    df.withColumn(shardCol, array_max(weights).getField("nd"))
  }

  /** Deterministic per-epoch corpus shuffle: every row gets a (shard,
    * pos) address under a seeded hash order — the reproducible
    * training-order primitive. A training run reads shards in shard
    * order, each shard internally in `pos` order, so the epoch's global
    * sample order is fully determined by (seed, corpus) and changes with
    * the seed; resuming an interrupted epoch is "skip to (shard, pos)".
    *
    * Scale shape: the only shuffle is the shard-keyed repartition that
    * the sharded WRITE needs anyway ([[writeShards]] uses the same
    * order under a fixed salt); `pos` is a row_number window
    * PARTITIONED BY SHARD — numShards concurrent partition-local sorts
    * of hash-sized keys, never a global single-reducer sort. Hash
    * sharding keeps shards balanced regardless of key skew. */
  def seededShuffle(df: DataFrame, keyCol: String, numShards: Int,
                    seed: String = "epoch0",
                    shardCol: String = "shard",
                    posCol: String = "pos"): DataFrame = {
    require(numShards > 0, "numShards must be > 0")
    val h = hash64(concat(lit(seed), lit("|"), col(keyCol).cast("string")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(shardCol)).orderBy(col("__graft_h"), col(keyCol))
    df.withColumn("__graft_h", h)
      .withColumn(shardCol,
        pmod(col("__graft_h"), lit(numShards.toLong)).cast("int"))
      .withColumn(posCol, row_number().over(w).cast("long"))
      .drop("__graft_h")
  }

  final case class ShardInfo(shard: Int, rows: Long)
  final case class ShardManifest(numShards: Int, totalRows: Long,
                                 shards: Seq[ShardInfo])

  /** Write `df` as `numShards` hash-sharded parquet directories under
    * `outDir` (`shard=K/part-*.parquet`, one file per shard) and return
    * a per-shard row-count manifest, also persisted as
    * `outDir/_manifest.json`. The manifest counts the WRITTEN files
    * (parquet footer metadata — no data read), not the input plan: at
    * 100 TB a second input scan would double the job, and counting the
    * output also confirms what actually landed. A hash-missed shard
    * (possible when rows ≪ shards) appears with 0 rows and no
    * directory. */
  def writeShards(df: DataFrame, keyCol: String, numShards: Int,
                  outDir: String, shardCol: String = "shard",
                  salt: String = "shard"): ShardManifest = {
    val sharded = withShard(df, keyCol, numShards, shardCol, salt)
    // rows inside each shard land in a deterministic pseudo-random order
    // (hash of the key under a distinct salt): training readers stream
    // shards sequentially, so the within-file order IS the sample order —
    // sortWithinPartitions is a partition-local sort, no extra shuffle
    // the sort leads with the shard column: the dynamic-partition writer
    // requires rows ordered by partition value and inserts its own
    // (order-destroying) sort otherwise — leading with it makes this
    // sort satisfy that requirement, so hash order survives into files
    sharded.repartition(numShards, col(shardCol))
      .sortWithinPartitions(col(shardCol),
        hash64(concat(lit(salt), lit("#order|"), col(keyCol).cast("string"))),
        col(keyCol))
      .write.partitionBy(shardCol).mode("overwrite").parquet(outDir)
    val written = df.sparkSession.read.parquet(outDir)
      .groupBy(col(shardCol)).count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val counts = (0 until numShards)
      .map(s => ShardInfo(s, written.getOrElse(s, 0L)))
    val manifest = ShardManifest(numShards, counts.map(_.rows).sum, counts)
    val json = {
      val shardsJson = manifest.shards.map(s =>
        s"""{"shard":${s.shard},"rows":${s.rows}}""").mkString("[", ",", "]")
      s"""{"numShards":${manifest.numShards},""" +
        s""""totalRows":${manifest.totalRows},"shards":$shardsJson}"""
    }
    val conf = df.sparkSession.sparkContext.hadoopConfiguration
    val path = new org.apache.hadoop.fs.Path(outDir, "_manifest.json")
    val fs = path.getFileSystem(conf)
    val out = fs.create(path, true)
    try out.write(json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    manifest
  }

  /** Read back a sharded corpus written by [[writeShards]] (the shard
    * column is restored by Spark's partition discovery). */
  def readShards(spark: org.apache.spark.sql.SparkSession,
                 dir: String): DataFrame =
    spark.read.parquet(dir)
}

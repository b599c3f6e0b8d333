package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc single-query timing harness (not part of the driver contract):
  *   runMain graft.tools.ScratchBench <sfDir> <queryName> [reps]
  */
object ScratchBench {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val name = args(1)
    val reps = if (args.length > 2) args(2).toInt else 3
    val spark = SparkSession.builder()
      .appName("graft-scratch")
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._
    // ad-hoc component probes not in the driver contract
    val extras: Map[String, (org.apache.spark.sql.SparkSession, String) =>
        org.apache.spark.sql.DataFrame] = Map(
      "band_only" -> { (s, d) =>
        val docs = graft.queries.Tables.tp(s, d, "documents")
        val sigs = graft.operators.Dedup
          .minhashSignatures(docs, "doc_id", "text", 8, 3)
        val exploded = sigs.select(col("doc_id").as("id"),
          posexplode(array((0 until 8).map(b => col(s"band_$b")): _*))
            .as(Seq("band_idx", "band_val")))
        val qbands = exploded.filter(col("id") < 5)
          .select(col("id").as("query_id"), col("band_idx"), col("band_val"))
        broadcast(qbands).join(exploded, Seq("band_idx", "band_val"))
          .groupBy(col("query_id"), col("id"))
          .agg(count(lit(1)).as("band_score"))
      },
      "pca_project_d256" -> { (s, d) =>
        // r10 Gramian-kernel probe: a d=256 corpus tiled from the 64-dim
        // embeddings (per-copy scale so dims aren't exact duplicates);
        // routes through Pca's mapPartitions Gramian path (d > 64)
        val em = graft.queries.Tables.tp(s, d, "embeddings")
        val v256 = flatten(array((0 until 4).map(c =>
          transform(col("embedding"),
            x => x * lit(1.0f + c * 0.25f))): _*))
        graft.operators.Pca.projectTop(
          em.select(col("vec_id"), v256.as("e256")), "vec_id", "e256")
      },
      "pca_project_d2048" -> { (s, d) =>
        // r11 tree-kernel ceiling probe: a d=2048 corpus tiled 32× from
        // the 64-dim embeddings (per-copy scale so dims aren't exact
        // duplicates); routes the tree-reduced 128-bit Gramian
        val em = graft.queries.Tables.tp(s, d, "embeddings")
        val v2048 = flatten(array((0 until 32).map(c =>
          transform(col("embedding"),
            x => x * lit(1.0f + c * 0.03f))): _*))
        graft.operators.Pca.projectTop(
          em.select(col("vec_id"), v2048.as("e2048")), "vec_id", "e2048")
      },
      "pca_project_d3072" -> { (s, d) =>
        // r12 block-keyed-reduce probe: a d=3072 corpus tiled 48× from
        // the 64-dim embeddings (per-copy scale so dims aren't exact
        // duplicates); cells = 3072²+3073 > 2048², so the Gramian
        // partials ride as 3 independent column blocks
        val em = graft.queries.Tables.tp(s, d, "embeddings")
        val v3072 = flatten(array((0 until 48).map(c =>
          transform(col("embedding"),
            x => x * lit(1.0f + c * 0.02f))): _*))
        graft.operators.Pca.projectTop(
          em.select(col("vec_id"), v3072.as("e3072")), "vec_id", "e3072")
      },
      "profile_exact" -> { (s, d) =>
        graft.operators.Profiler.profile(
          s.read.parquet(s"$d/lineitem.parquet"))
      },
      "profile_hll" -> { (s, d) =>
        graft.operators.Profiler.profile(
          s.read.parquet(s"$d/lineitem.parquet"), approxDistinct = true)
      },
      "profile_events_hll" -> { (s, d) =>
        graft.operators.Profiler.profile(
          graft.queries.Tables.events(s, d), approxDistinct = true)
      },
      "profile_events_base" -> { (s, d) =>
        // the exact tier MINUS count_distinct: isolates the base
        // aggregation cost from the expand and from the register build
        val ev = graft.queries.Tables.events(s, d)
        val aggs = ev.schema.fields.flatMap { f =>
          Seq(count(col(f.name)), min(col(f.name)).cast("string"),
            max(col(f.name)).cast("string"))
        }
        ev.agg(count(lit(1)), aggs: _*)
      },
      "hll_regs_events" -> { (s, d) =>
        val ev = graft.queries.Tables.events(s, d)
        graft.operators.Hll.registersByColumn(ev,
          ev.schema.fields.map(_.name).toSeq, p = 12, portable = false)
      },
      "hll_hash_only" -> { (s, d) =>
        // cost of the 6 per-column xxhash64(cast-to-string) alone
        val ev = graft.queries.Tables.events(s, d)
        val hs = ev.schema.fields.map(f => when(col(f.name).isNotNull,
          pmod(xxhash64(lit("hll"), col(f.name).cast("string")),
            lit(1L << 60))).as(s"h_${f.name}"))
        val probes = ev.schema.fields.toSeq.map(f =>
          sum(pmod(col(s"h_${f.name}"), lit(1000003L))))
        ev.select(hs.toSeq: _*).agg(probes.head, probes.tail: _*)
      },
      "hll_explode_only" -> { (s, d) =>
        // hash + explode to longs + count: adds the Generate cost
        val ev = graft.queries.Tables.events(s, d)
        val hs = ev.schema.fields.map(f => when(col(f.name).isNotNull,
          pmod(xxhash64(lit("hll"), col(f.name).cast("string")),
            lit(1L << 60))).as(s"h_${f.name}"))
        ev.select(hs.toSeq: _*)
          .select(explode(array(ev.schema.fields.map(f =>
            col(s"h_${f.name}")).toSeq: _*)).as("h"))
          .filter(col("h").isNotNull)
          .agg(count(lit(1)), sum(pmod(col("h"), lit(1000003L))))
      },
      "winnow_fast" -> { (s, d) =>
        val docs = graft.queries.Tables.tp(s, d, "documents")
        graft.functions.TextFunctions.winnowFingerprints(
          docs, "text", k = 8, w = 4, portable = false)
          .select(col("doc_id"), explode(col("fingerprints")).as("fp"))
      },
      "winnow_portable" -> { (s, d) =>
        val docs = graft.queries.Tables.tp(s, d, "documents")
        graft.functions.TextFunctions.winnowFingerprints(
          docs, "text", k = 8, w = 4, portable = true)
          .select(col("doc_id"), explode(col("fingerprints")).as("fp"))
      },
      "novelty_fast" -> { (s, d) =>
        val docs = graft.queries.Tables.tp(s, d, "documents")
        graft.operators.Sketches.cmsNoveltyScore(docs, "doc_id", "text",
          depth = 4, width = 1024, rareMax = 2, portable = false)
      },
      "novelty_portable" -> { (s, d) =>
        val docs = graft.queries.Tables.tp(s, d, "documents")
        graft.operators.Sketches.cmsNoveltyScore(docs, "doc_id", "text",
          depth = 4, width = 1024, rareMax = 2, portable = true)
      },
      "decon_shingle_only" -> { (s, d) =>
        val docs = graft.queries.Tables.tp(s, d, "documents")
        docs.filter(col("doc_id") % 50 =!= 0).select(col("doc_id"),
          graft.functions.TextFunctions.shingles(
            graft.functions.TextFunctions.tokens(col("text")), 3).as("sh"))
      },
      "decon_explode_only" -> { (s, d) =>
        val docs = graft.queries.Tables.tp(s, d, "documents")
        docs.filter(col("doc_id") % 50 =!= 0).select(col("doc_id"),
          explode(graft.functions.TextFunctions.shingles(
            graft.functions.TextFunctions.tokens(col("text")), 3)).as("g"))
      },
      "decon_evalgrams_only" -> { (s, d) =>
        val docs = graft.queries.Tables.tp(s, d, "documents")
        docs.filter(col("doc_id") % 50 === 0).select(
          explode(graft.functions.TextFunctions.shingles(
            graft.functions.TextFunctions.tokens(col("text")), 3)).as("g"))
          .distinct()
      },
      "decon_join_only" -> { (s, d) =>
        val docs = graft.queries.Tables.tp(s, d, "documents")
        def shingled(df: org.apache.spark.sql.DataFrame) =
          df.select(col("doc_id"), graft.functions.TextFunctions.shingles(
            graft.functions.TextFunctions.tokens(col("text")), 3).as("sh"))
        val evalGrams = shingled(docs.filter(col("doc_id") % 50 === 0))
          .select(explode(col("sh")).as("g")).distinct()
        shingled(docs.filter(col("doc_id") % 50 =!= 0))
          .select(col("doc_id"), explode(col("sh")).as("g"))
          .join(broadcast(evalGrams), Seq("g"))
      },
      "decon_join_distinct" -> { (s, d) =>
        val docs = graft.queries.Tables.tp(s, d, "documents")
        def shingled(df: org.apache.spark.sql.DataFrame) =
          df.select(col("doc_id"), graft.functions.TextFunctions.shingles(
            graft.functions.TextFunctions.tokens(col("text")), 3).as("sh"))
        val evalGrams = shingled(docs.filter(col("doc_id") % 50 === 0))
          .select(explode(col("sh")).as("g")).distinct()
        shingled(docs.filter(col("doc_id") % 50 =!= 0))
          .select(col("doc_id"), explode(col("sh")).as("g"))
          .join(broadcast(evalGrams), Seq("g"))
          .select(col("doc_id"), col("g")).distinct()
      },
      "decon_hits_only" -> { (s, d) =>
        val docs = graft.queries.Tables.tp(s, d, "documents")
        def shingled(df: org.apache.spark.sql.DataFrame) =
          df.select(col("doc_id"), graft.functions.TextFunctions.shingles(
            graft.functions.TextFunctions.tokens(col("text")), 3).as("sh"))
        val evalGrams = shingled(docs.filter(col("doc_id") % 50 === 0))
          .select(explode(col("sh")).as("g")).distinct()
        shingled(docs.filter(col("doc_id") % 50 =!= 0))
          .select(col("doc_id"), explode(col("sh")).as("g"))
          .join(broadcast(evalGrams), Seq("g"))
          .select(col("doc_id"), col("g")).distinct()
          .groupBy("doc_id").agg(count(lit(1)).as("matched_shingles"))
      },
      "neardup_inbands_only" -> { (s, d) =>
        val docs = graft.queries.Tables.tp(s, d, "documents")
        graft.operators.Dedup.minhashSignatures(
          docs.filter(col("doc_id") % 10 =!= 0), "doc_id", "text", 4, 3)
          .select(col("doc_id"),
            posexplode(array((0 until 4).map(b => col(s"band_$b")): _*))
              .as(Seq("band_idx", "band_val")))
          .filter(col("band_val").isNotNull)
      },
      "neardup_inbands_barrier" -> { (s, d) =>
        val docs = graft.queries.Tables.tp(s, d, "documents")
        val sigs = graft.ops.Parallelism.barrier(
          graft.operators.Dedup.minhashSignatures(
            docs.filter(col("doc_id") % 10 =!= 0), "doc_id", "text", 4, 3))
        sigs.select(col("doc_id"),
          posexplode(array((0 until 4).map(b => col(s"band_$b")): _*))
            .as(Seq("band_idx", "band_val")))
          .filter(col("band_val").isNotNull)
      },
      "neardup_ledger_only" -> { (s, d) =>
        val docs = graft.queries.Tables.tp(s, d, "documents")
        graft.operators.Dedup.minhashSignatures(
          docs.filter(col("doc_id") % 10 === 0), "doc_id", "text", 4, 3)
          .select(posexplode(array((0 until 4).map(b => col(s"band_$b")): _*))
            .as(Seq("band_idx", "band_val")))
          .filter(col("band_val").isNotNull)
          .distinct()
      },
      "neardup_nobloom" -> { (s, d) =>
        val docs = graft.queries.Tables.tp(s, d, "documents")
        val bandCols = (0 until 4).map(b => col(s"band_$b"))
        val ledger = graft.operators.Dedup.minhashSignatures(
          docs.filter(col("doc_id") % 10 === 0), "doc_id", "text", 4, 3)
          .select(posexplode(array(bandCols: _*)).as(Seq("band_idx", "band_val")))
          .filter(col("band_val").isNotNull).distinct()
        val inBands = graft.operators.Dedup.minhashSignatures(
          docs.filter(col("doc_id") % 10 =!= 0), "doc_id", "text", 4, 3)
          .select(col("doc_id"),
            posexplode(array(bandCols: _*)).as(Seq("band_idx", "band_val")))
          .filter(col("band_val").isNotNull)
        val hits = inBands.join(ledger, Seq("band_idx", "band_val"), "left_semi")
          .select(col("doc_id")).distinct()
        docs.filter(col("doc_id") % 10 =!= 0).join(hits, Seq("doc_id"), "left_anti")
      },
      "lex20_only" -> { (s, d) =>
        val docs = graft.queries.Tables.tp(s, d, "documents")
        val idx = graft.rag.SparseIndex.build(docs, "doc_id", "text")
        graft.rag.SparseIndex.search(idx,
          docs.filter(col("doc_id") < 5)
            .select(col("doc_id").as("qid"), col("text")),
          "qid", "text", 20)
      })
    val q = extras.getOrElse(name, graft.SparkEntry.queries(name))
    if (sys.env.contains("SPARK_GRAFT_EXPLAIN"))
      q(spark, dir).explain("formatted")
    for (i <- 1 to reps) {
      val t0 = System.nanoTime()
      // query construction stays INSIDE the timed region — operators like
      // the bloom-ledger dedups run eager driver jobs (count, bloom build)
      // while building the DataFrame, and Bench times those too. noop
      // sink: full materialization without count()'s column pruning.
      q(spark, dir).write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"SCRATCH $name rep$i: $sec%.2f s")
    }
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage budget probe for the composed curation pipeline (q116): times
  * the noop-materialization of each pipeline PREFIX — filter; +dedup;
  * +token-count+pack; +bin-stats — so prefix deltas attribute wall time
  * to stages. Prefixes re-execute their upstream (deliberate: deltas
  * stay honest under lazy plans; no cross-prefix caching skews a stage).
  * Not part of the driver contract:
  *
  *   runMain graft.tools.CurationPhaseProbe <sfDir> [reps]
  */
object CurationPhaseProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 2
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.functions.TextFunctions.tokens
    import graft.functions.CurationFunctions.{dupFrac, meanWordLen}

    def docs = graft.queries.Tables.tp(spark, dir, "documents")
    val w = tokens(col("text"))
    val dup = dupFrac(w)
    val mwl = meanWordLen(w)
    val stopCt = size(filter(w, t => t.isin("the", "a")))
    def passed = docs.filter(size(w).between(30, 1000) && dup <= 0.55 &&
      mwl >= 3.0 && mwl <= 6.0 && stopCt >= 1)
    def deduped = graft.operators.Dedup
      .dropExactDuplicates(passed, "doc_id", "text")
    def toks = deduped.select(col("doc_id"),
      graft.functions.TextFunctions.tokenCount(col("text")).as("ntok"))
    def packed = graft.operators.Packing.packBins(
      toks, "doc_id", "ntok", capacity = 512, groups = 8)
    def full = graft.operators.Packing.binStats(packed, capacity = 512)
      .orderBy("pack_group", "pack_bin")

    def mat(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // warmup (sf100 ships only the big tables; documents always exists)
    mat(docs.limit(100))
    val prefixes = Seq(
      "1_gopher_filter" -> (() => mat(passed)),
      "2_exact_dedup" -> (() => mat(deduped)),
      "3_pack_bins" -> (() => mat(packed)),
      "4_bin_stats" -> (() => mat(full)))
    // one COHERENT sequence per rep (cumulatives measured together), then
    // report the rep with the smallest full-pipeline time — deltas can
    // never go negative from mixing minima of independent reps
    val repRuns: Seq[Seq[Double]] = (1 to reps).map { _ =>
      prefixes.map { case (_, f) =>
        val t0 = System.nanoTime(); f(); (System.nanoTime() - t0) / 1e9
      }
    }
    val bestRep = repRuns.minBy(_.last)
    val out = prefixes.zipWithIndex.map { case ((name, _), i) =>
      val t = bestRep(i)
      val delta = t - (if (i == 0) 0.0 else bestRep(i - 1))
      f""""$name":{"cumulative":$t%.2f,"delta":$delta%.2f}"""
    }
    println(s"""{"probe":"curation_e2e","sf":"$dir","reps":$reps,${out.mkString(",")}}""")
    spark.stop()
  }
}

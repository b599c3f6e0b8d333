package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Temporary phase-timing probe for the Gramian path (graft.operators
  * package to reach the private kernels). runMain graft.operators.PcaPhaseProbe <sfDir> <d>
  */
object PcaPhaseProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val d = args(1).toInt
    val tiles = d / 64
    val spark = SparkSession.builder()
      .appName("pca-phase-probe").master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PHASE $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val em = graft.queries.Tables.tp(spark, dir, "embeddings")
    val vd = flatten(array((0 until tiles).map(c =>
      transform(col("embedding"), x => x * lit(1.0f + c * 0.02f))): _*))
    val df = em.select(col("vec_id"), vd.as("ed"))
    val vecs = graft.ops.Parallelism.ensure(
        df.select(col("ed")).filter(col("ed").isNotNull))
      .withColumn("__graft_mv", KMeans.microVec(col("ed")))
      .select(col("__graft_mv"))
    println(s"vecs partitions: ${vecs.rdd.getNumPartitions}")
    t("scan_only") {
      vecs.write.format("noop").mode("overwrite").save()
    }
    val (combined, n, s) = t("gramian") {
      Pca.gramianCovariance(vecs, d)
    }
    println(s"n=$n cells=${combined.length / 2}")
    def cellAt(j: Int, k: Int): BigInt =
      n * Pca.toBigInt(combined, 1 + d + j * d + k) - s(j) * s(k)
    // upper-triangle scans + the shipped guarded-double quantCell, so
    // the phase timings measure production's per-cell rule (an earlier
    // draft timed the retired full-square truncating BigInt division)
    val maxAbs = t("maxabs") {
      var m = BigInt(0)
      var j = 0
      while (j < d) {
        var k = j
        while (k < d) { val a = cellAt(j, k).abs; if (a > m) m = a; k += 1 }
        j += 1
      }
      m
    }
    val q = t("quantize") {
      val maxAbsD = maxAbs.toDouble
      val out = Array.ofDim[Long](d, d)
      var j = 0
      while (j < d) {
        var k = j
        while (k < d) {
          val v = Pca.quantCell(cellAt(j, k), maxAbs, maxAbsD)
          out(j)(k) = v
          out(k)(j) = v
          k += 1
        }
        j += 1
      }
      out
    }
    t("power8") {
      var x = Array.fill(d)(1000000L)
      for (_ <- 0 until 8) {
        val y = new Array[Long](d)
        var j = 0
        while (j < d) {
          val row = q(j); var acc = 0L; var k = 0
          while (k < d) { acc += row(k) * x(k); k += 1 }
          y(j) = acc; j += 1
        }
        var piv = 0; j = 1
        while (j < d) { if (math.abs(y(j)) > math.abs(y(piv))) piv = j; j += 1 }
        val denom = BigInt(y(piv))
        x = y.map(v => (BigInt(v) * 1000000 / denom).toLong)
      }
      x(0)
    }
    t("full_projectTop") {
      Pca.projectTop(df, "vec_id", "ed")
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}

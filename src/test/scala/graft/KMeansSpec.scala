package graft

import org.apache.spark.sql.functions._

import graft.operators.KMeans

class KMeansSpec extends SparkSpec {
  import spark.implicits._

  /** Three well-separated 2-D blobs with seeded jitter. */
  private def blobs(parts: Int = 4) = {
    val rnd = new scala.util.Random(11)
    val centers = Seq((0.0, 0.0), (5.0, 5.0), (-5.0, 4.0))
    val rows = for {
      (cx, cy) <- centers
      i <- 0 until 40
    } yield (centers.indexOf((cx, cy)) * 1000L + i,
      Array((cx + rnd.nextGaussian() * 0.2).toFloat,
        (cy + rnd.nextGaussian() * 0.2).toFloat))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, parts))
      .toDF("id", "vec")
  }

  test("kmeans recovers well-separated blobs") {
    val m = KMeans.fit(blobs(), "id", "vec", k = 3, iters = 5)
    val byBlob = m.assignments
      .withColumn("blob", col("id") / 1000)
      .groupBy(col("blob").cast("long"), col("cluster"))
      .count().collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // every blob must land wholly in one cluster, each blob distinct
    val owner = (0L to 2L).map(b =>
      b -> byBlob.collect { case ((`b`, c), n) => (c, n) }.maxBy(_._2)._1)
    owner.foreach { case (b, c) =>
      assert(byBlob((b, c)) === 40L, s"blob $b split: $byBlob")
    }
    assert(owner.map(_._2).distinct.size === 3, s"clusters collide: $owner")
  }

  test("intMean is exact past 2^53, where the double form breaks") {
    // n=3, sum = 3K+1 with K near 2^60: true mean rule floor((2s+n)/(2n))
    // = K, but the old (2.0*s+n)/(2.0*n) path rounds 2*s at ulp 512 and
    // can land on K±1 at a floor boundary — compute both and require the
    // integer path to match the BigInt ground truth for a sweep of sums
    val n = 3L
    def truth(sum: Long): Long = {
      val num = BigInt(sum) * 2 + n
      val q = num /% (BigInt(n) * 2) match {
        case (q0, r) if num.signum < 0 && r != 0 => q0 - 1
        case (q0, _) => q0
      }
      q.toLong
    }
    def doubleForm(sum: Long): Long =
      math.floor((2.0 * sum + n) / (2.0 * n)).toLong
    var doubleBroke = false
    for (delta <- -6L to 6L; base <- Seq(1L << 60, (1L << 61) + 12345L);
         sum <- Seq(base + delta, -(base + delta))) {
      assert(KMeans.intMean(sum, n) === truth(sum), s"sum=$sum")
      if (doubleForm(sum) != truth(sum)) doubleBroke = true
    }
    assert(doubleBroke,
      "sweep never exercised a double-rounding boundary — widen it")
    // the small-value regime is unchanged: round-half-up of sum/n
    assert(KMeans.intMean(7L, 2L) === 4L)   // 3.5 -> 4
    assert(KMeans.intMean(-7L, 2L) === -3L) // -3.5 -> -3 (half-up)
    assert(KMeans.intMean(6L, 2L) === 3L)
    assert(KMeans.intMean(-6L, 2L) === -3L)
  }

  test("lloyd iterations never increase total inertia") {
    val df = blobs()
    val inertias = (1 to 4).map(it =>
      KMeans.fit(df, "id", "vec", k = 3, iters = it)
        .assignments.agg(sum("dist")).head().getLong(0))
    inertias.sliding(2).foreach { case Seq(a, b) =>
      assert(b <= a, s"inertia rose: $inertias")
    }
  }

  test("training is independent of partitioning") {
    val a = KMeans.fit(blobs(1), "id", "vec", 3, 3)
    val b = KMeans.fit(blobs(7), "id", "vec", 3, 3)
    assert(a.centroids.map(_.toSeq).toSeq === b.centroids.map(_.toSeq).toSeq)
    assert(a.assignments.select("id", "cluster").collect().toSet ===
      b.assignments.select("id", "cluster").collect().toSet)
  }

  test("an emptied cluster keeps its previous centroid") {
    // two tight blobs but k=4: two residue-seeded centroids lose every
    // member after the first assignment — training must stay total and
    // the surviving clusters must still partition the data
    val m = KMeans.fit(blobs().filter(col("id") < 2000), "id", "vec",
      k = 4, iters = 3)
    assert(m.centroids.length === 4)
    val used = m.assignments.select("cluster").distinct()
      .as[Long].collect().toSet
    assert(used.subsetOf((0L until 4L).toSet) && used.size <= 2,
      s"two blobs cannot fill more than two clusters: $used")
  }

  test("assignment ties break to the lowest cluster id") {
    // identical duplicate centroids: every vector is equidistant
    val cents = Array(Array(0L, 0L), Array(0L, 0L))
    val out = KMeans.assign(Seq((1L, Array(1.0f, 1.0f)))
      .toDF("id", "vec"), "vec", cents)
      .select("cluster").head().getLong(0)
    assert(out === 0L)
  }

  test("trained-centroid IVF at nProbe=k reproduces exact brute-force top-k") {
    import graft.operators.Similarity
    val rnd = new scala.util.Random(5)
    val vecs = (0 until 120).map(i =>
      (i.toLong, Array.fill(16)((rnd.nextDouble() * 2 - 1).toFloat)))
    val emb = spark.createDataFrame(
      spark.sparkContext.parallelize(vecs, 4)).toDF("vec_id", "embedding")
    val m = KMeans.fit(emb, "vec_id", "embedding", k = 4, iters = 2)
    val cents = spark.createDataFrame(
      m.centroids.zipWithIndex.toSeq.map { case (c, j) =>
        (j.toLong, c.map(_.toDouble / 1e6)) })
      .toDF("centroid_id", "centv")
    val queries = emb.filter(col("vec_id") < 5)
    val ivf = Similarity.ivfTopKWithCentroids(queries, emb, 3, cents,
      nProbe = 4).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    val exact = Similarity.bruteForceTopK(queries, emb, 3).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(ivf === exact)
  }

  test("assignment is a pure map: vectors never cross an exchange") {
    val m = KMeans.fit(blobs(), "id", "vec", 3, 1)
    val p = KMeans.assign(blobs(), "vec", m.centroids)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"assign must not shuffle:\n$p")
  }

  test("dirty vectors drop from fit and assign instead of skewing them") {
    // micro_vec nulls a dirty vector (any null/non-finite cell) WHOLE;
    // fit and assign must DROP those rows — before the r12 fix a null
    // micro vector inflated meansBy's count(1) against null-skipping
    // sums (silently biased centroids) and argmin'd into cluster 0
    // with a null distance
    val clean = blobs()
    val dirty = clean.unionByName(Seq(
        (9001L, Array(Float.NaN, 1.0f)),
        (9002L, Array(1.0f, Float.PositiveInfinity)),
        (9003L, null.asInstanceOf[Array[Float]]))
      .toDF("id", "vec"))
    val mc = KMeans.fit(clean, "id", "vec", k = 3, iters = 3)
    val md = KMeans.fit(dirty, "id", "vec", k = 3, iters = 3)
    assert(md.centroids.map(_.toSeq).toSeq ===
      mc.centroids.map(_.toSeq).toSeq,
      "dirty rows changed the trained centroids")
    val assigned = KMeans.assign(dirty, "vec", mc.centroids)
    assert(assigned.filter(col("id") >= 9001L).count() === 0L,
      "dirty rows survived assign")
    assert(assigned.count() === clean.count())
    assert(assigned.filter(col("dist").isNull).count() === 0L)
  }
}

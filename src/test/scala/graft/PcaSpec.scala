package graft

import org.apache.spark.sql.functions._

import graft.operators.Pca

class PcaSpec extends SparkSpec {
  import spark.implicits._

  test("rank-1 corpus recovers the generating direction, pivot at +1e6") {
    // v_i = t_i · (1, 2, 0, 0): covariance is rank 1 along (1,2,0,0),
    // max-normalized loadings must be exactly (5e5, 1e6, 0, 0)
    val vs = Seq(1.0f, 2.0f, 3.0f, -1.0f).zipWithIndex.map { case (t, i) =>
      (i.toLong, Array(t, 2 * t, 0.0f, 0.0f).toSeq)
    }
    val out = Pca.topComponent(vs.toDF("vec_id", "embedding"), "embedding")
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(out === Map(0 -> 500000L, 1 -> 1000000L, 2 -> 0L, 3 -> 0L))
  }

  test("sign determinism: a (-1, 2) direction pins the pivot, dim0 negative") {
    val vs = Seq(1.0f, 2.0f, -3.0f).zipWithIndex.map { case (t, i) =>
      (i.toLong, Array(-t, 2 * t).toSeq)
    }
    val out = Pca.topComponent(vs.toDF("vec_id", "embedding"), "embedding")
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(out === Map(0 -> -500000L, 1 -> 1000000L))
  }

  test("projections are exact centered dots on the max-normalized axis") {
    // along (1,2,0,0): t = (1,2,3,-1), mean vector = 1.25·(1,2,0,0)
    // u = (0.5, 1, 0, 0) → pc1_i = (t_i−1.25)·(0.5·1 + 2·1) = 2.5(t_i−1.25)
    val vs = Seq(1.0f, 2.0f, 3.0f, -1.0f).zipWithIndex.map { case (t, i) =>
      (i.toLong, Array(t, 2 * t, 0.0f, 0.0f).toSeq)
    }
    val out = Pca.projectTop(vs.toDF("vec_id", "embedding"),
        "vec_id", "embedding")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    def want(t: Double) = BigDecimal(2.5 * (t - 1.25))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(0L) === want(1) && out(1L) === want(2) &&
      out(2L) === want(3) && out(3L) === want(-1))
  }

  test("degenerate corpus (identical vectors) yields null loadings/projections") {
    val vs = (0L until 5L).map(i => (i, Seq(1.0f, -2.0f, 3.0f)))
    val comp = Pca.topComponent(vs.toDF("vec_id", "embedding"), "embedding")
      .collect()
    assert(comp.length === 3 && comp.forall(_.isNullAt(1)))
    val proj = Pca.projectTop(vs.toDF("vec_id", "embedding"),
      "vec_id", "embedding").collect()
    assert(proj.length === 5 && proj.forall(_.isNullAt(1)))
    // row contract: null-vector rows are DROPPED by the degenerate
    // branch too — the output row set must not depend on which branch
    // ran (pre-r12 the degenerate branch kept them with null pc1 while
    // the normal branch dropped them)
    val dirty = (vs.map { case (i, v) => (i, Some(v)) } :+
      (99L, Option.empty[Seq[Float]])).toDF("vec_id", "embedding")
    val dproj = Pca.projectTop(dirty, "vec_id", "embedding").collect()
    assert(dproj.length === 5 && dproj.forall(_.isNullAt(1)))
    assert(!dproj.map(_.getLong(0)).contains(99L))
  }

  test("noisy dominant direction separates mixture halves; invariance") {
    // deterministic pseudo-noise around ±(3,3,0,0): projections must
    // separate the two halves by sign
    val vs = (0L until 40L).map { i =>
      val s = if (i % 2 == 0) 3.0f else -3.0f
      val n1 = ((i * 37 % 11).toFloat - 5) / 50
      val n2 = ((i * 53 % 13).toFloat - 6) / 50
      (i, Seq(s + n1, s + n2, n1, n2))
    }
    val df = vs.toDF("vec_id", "embedding")
    val out = Pca.projectTop(df, "vec_id", "embedding")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val even = (0L until 40L by 2).map(out)
    val odd = (1L until 40L by 2).map(out)
    assert(even.forall(v => v > 0) != even.forall(v => v < 0)) // one sign
    assert(even.forall(v => v > 0) ^ odd.forall(v => v > 0))   // opposite
    val again = Pca.projectTop(df.repartition(7), "vec_id", "embedding")
      .orderBy("vec_id").collect().toSeq
    assert(Pca.projectTop(df, "vec_id", "embedding").orderBy("vec_id")
      .collect().toSeq === again)
  }

  test("gramian kernel ≡ posexplode² kernel, bit-for-bit, any partitioning") {
    // same corpora as above plus a noisy mixture: the mapPartitions
    // Gramian build must reproduce the declarative cells exactly
    val cases = Seq(
      Seq(1.0f, 2.0f, 3.0f, -1.0f).zipWithIndex.map { case (t, i) =>
        (i.toLong, Seq(t, 2 * t, 0.0f, 0.0f)) },
      (0L until 40L).map { i =>
        val s = if (i % 2 == 0) 3.0f else -3.0f
        val n1 = ((i * 37 % 11).toFloat - 5) / 50
        val n2 = ((i * 53 % 13).toFloat - 6) / 50
        (i, Seq(s + n1, s + n2, n1, n2))
      })
    for (rows <- cases; parts <- Seq(1, 7)) {
      val df = rows.toDF("vec_id", "embedding").repartition(parts)
      val a = Pca.topComponentVector(df, "embedding", 8,
        forceGramian = false)
      val b = Pca.topComponentVector(df, "embedding", 8,
        forceGramian = true)
      assert(a._1 === b._1)
      assert(a._2.toSeq === b._2.toSeq)
    }
    // degenerate corpus: both kernels agree on null
    val const = (0L until 5L).map(i => (i, Seq(1.0f, -2.0f, 3.0f)))
      .toDF("vec_id", "embedding")
    assert(Pca.topComponentVector(const, "embedding", 8,
      forceGramian = true)._2 === null)
  }

  test("d > 64 routes through the gramian kernel and recovers rank-1") {
    // rank-1 corpus at d = 80: loading j = (j+1)/80, pivot at dim 79
    val d = 80
    val base = (0 until d).map(j => (j + 1).toFloat / d)
    val vs = Seq(1.0f, 2.0f, 3.0f, -1.0f).zipWithIndex.map { case (t, i) =>
      (i.toLong, base.map(_ * t))
    }
    val out = Pca.topComponent(vs.toDF("vec_id", "embedding"), "embedding")
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(out.size === d)
    assert(out(d - 1) === 1000000L)
    // interior loadings track (j+1)/d on the micro grid (quantization
    // of the input vectors wiggles the last digit; allow ±2 micro)
    for (j <- Seq(0, 19, 39, 59))
      assert(math.abs(out(j) - math.round(1e6 * (j + 1).toDouble / d)) <= 2,
        s"dim $j: ${out(j)}")
    // oversized elements are rejected with the re-scale message
    val big = Seq((0L, Seq(2000.0f, 1.0f)), (1L, Seq(1.0f, 2.0f)))
      .toDF("vec_id", "embedding")
    val e = intercept[Exception] {
      Pca.topComponentVector(big, "embedding", 2, forceGramian = true)
    }
    assert(e.getMessage.contains("re-scale"))
  }

  test("d = 2048 routes the tree-reduced 128-bit kernel and stays exact") {
    // rank-1 corpus at the NEW dimension ceiling: loading j tracks
    // (j+1)/d with the pivot pinned at dim d-1 — closed-form expected
    // output, so this is an exactness proof, not just a smoke test.
    // Mixed-sign weights exercise the 128-bit signed carry path.
    val d = 2048
    val base = (0 until d).map(j => (j + 1).toFloat / d)
    val vs = Seq(1.0f, -2.0f, 3.0f, -1.0f).zipWithIndex.map { case (t, i) =>
      (i.toLong, base.map(_ * t))
    }
    for (parts <- Seq(1, 7)) {
      val out = Pca.topComponent(
          vs.toDF("vec_id", "embedding").repartition(parts), "embedding")
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      assert(out.size === d)
      assert(out(d - 1) === 1000000L)
      for (j <- Seq(0, 511, 1023, 1535))
        assert(math.abs(out(j) - math.round(1e6 * (j + 1).toDouble / d)) <= 2,
          s"parts=$parts dim $j: ${out(j)}")
    }
  }

  test("d = 3072 routes the block-keyed reduce and stays exact") {
    // rank-1 corpus past the one-array treeReduce ceiling (cells =
    // 3072² + 3073 > 2048², so the partials slice into 3 column blocks
    // merged by independent reducers — the r12 path): same closed-form
    // expected output as the d = 2048 arm, across partitionings, so
    // block slicing/reassembly is proven exact, not just non-crashing.
    val d = 3072
    val base = (0 until d).map(j => (j + 1).toFloat / d)
    val vs = Seq(1.0f, -2.0f, 3.0f, -1.0f).zipWithIndex.map { case (t, i) =>
      (i.toLong, base.map(_ * t))
    }
    for (parts <- Seq(1, 3)) {
      val out = Pca.topComponent(
          vs.toDF("vec_id", "embedding").repartition(parts), "embedding")
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      assert(out.size === d)
      assert(out(d - 1) === 1000000L)
      for (j <- Seq(0, 767, 1535, 2303))
        assert(math.abs(out(j) - math.round(1e6 * (j + 1).toDouble / d)) <= 2,
          s"parts=$parts dim $j: ${out(j)}")
    }
    // beyond the ceiling still refuses loudly
    val tooBig = Seq((0L, (0 until 4097).map(_.toFloat)))
      .toDF("vec_id", "embedding")
    val e = intercept[Exception] {
      Pca.topComponent(tooBig, "embedding").collect()
    }
    assert(e.getMessage.contains("4096"))
  }

  test("128-bit accumulator carries match BigInt on adversarial sums") {
    // many rows alternating near the long-block flush boundary with
    // mixed signs: the per-partition long blocks flush repeatedly and
    // the 128-bit cells absorb both carry directions; equality against
    // the decimal-exact posexplode build proves the arithmetic
    val vs = (0L until 400L).map { i =>
      val s = if (i % 2 == 0) 999.0f else -998.5f // ~1e9 micro units
      (i, Seq(s, -s, s * 0.5f))
    }
    for (parts <- Seq(1, 7)) {
      val df = vs.toDF("vec_id", "embedding").repartition(parts)
      val a = Pca.topComponentVector(df, "embedding", 8, forceGramian = false)
      val b = Pca.topComponentVector(df, "embedding", 8, forceGramian = true)
      assert(a._2.toSeq === b._2.toSeq, s"parts=$parts")
    }
  }

  test("null vectors drop identically on both kernels; projections match") {
    val live = Seq(1.0f, 2.0f, 3.0f, -1.0f).zipWithIndex.map { case (t, i) =>
      (i.toLong, Seq(t, 2 * t, 0.0f, 0.0f))
    }
    val withNulls = (live.map { case (i, v) => (i, Option(v)) } ++
      Seq((90L, Option.empty[Seq[Float]]), (91L, Option.empty[Seq[Float]])))
    val dirty = withNulls.toDF("vec_id", "embedding").repartition(3)
    val clean = live.toDF("vec_id", "embedding")
    // both kernels on the dirty frame equal each other AND the null-free
    // corpus — nulls are dropped BEFORE the kernels, not NPE'd (gramian)
    // or silently diverging (posexplode)
    val a = Pca.topComponentVector(dirty, "embedding", 8, forceGramian = false)
    val b = Pca.topComponentVector(dirty, "embedding", 8, forceGramian = true)
    val c = Pca.topComponentVector(clean, "embedding", 8)
    assert(a._2.toSeq === b._2.toSeq && a._2.toSeq === c._2.toSeq)
    // projections: null rows excluded, values = the null-free corpus's
    // (n and the mean count non-null vectors only)
    val proj = Pca.projectTop(dirty, "vec_id", "embedding")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val want = Pca.projectTop(clean, "vec_id", "embedding")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(proj === want)
  }

  test("dirty vectors (NaN / null cell) drop like null vectors on both kernels") {
    // the r12 micro_vec contract: a vector with any null or non-finite
    // cell quantizes to a null micro vector, and Pca drops it BEFORE
    // either kernel — loadings and projections must equal the clean
    // corpus's on both dispatch paths, with the dirty ids absent
    val live = Seq(1.0f, 2.0f, 3.0f, -1.0f).zipWithIndex.map { case (t, i) =>
      (i.toLong, Seq(Some(t), Some(2 * t), Some(0.0f), Some(0.0f)))
    }
    val dirty = (live ++ Seq(
      (90L, Seq(Some(Float.NaN), Some(1.0f), Some(0.0f), Some(0.0f))),
      (91L, Seq(Some(2.0f), None, Some(0.0f), Some(0.0f)))))
      .toDF("vec_id", "embedding").repartition(3)
    val clean = live.toDF("vec_id", "embedding")
    val a = Pca.topComponentVector(dirty, "embedding", 8, forceGramian = false)
    val b = Pca.topComponentVector(dirty, "embedding", 8, forceGramian = true)
    val c = Pca.topComponentVector(clean, "embedding", 8)
    assert(a._2.toSeq === b._2.toSeq && a._2.toSeq === c._2.toSeq)
    val proj = Pca.projectTop(dirty, "vec_id", "embedding")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val want = Pca.projectTop(clean, "vec_id", "embedding")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(proj === want)
    assert(!proj.contains(90L) && !proj.contains(91L))
  }

  test("oversized elements are rejected where long arithmetic relies on them") {
    // the 1e9-micro element bound is enforced at the two points that
    // DEPEND on it: the projection's native long dot (per element,
    // every d — including the d <= 64 posexplode covariance path, which
    // is itself decimal-exact and so needs no bound of its own) and the
    // d > 64 Gramian kernel (per row)
    val big = Seq((0L, Seq(2000.0f, 1.0f)), (1L, Seq(1.0f, 2.0f)))
      .toDF("vec_id", "embedding")
    val e1 = intercept[Exception] {
      Pca.projectTop(big, "vec_id", "embedding").collect()
    }
    assert(e1.getMessage.contains("re-scale"))
    // the decimal-exact covariance alone accepts the same corpus: the
    // loadings of the rank-deficient 2-vector cloud still compute
    assert(Pca.topComponent(big, "embedding").collect().length === 2)
  }

  test("ragged vectors are rejected") {
    val vs = Seq((0L, Seq(1.0f, 2.0f)), (1L, Seq(1.0f)))
    val e = intercept[Exception] {
      Pca.topComponent(vs.toDF("vec_id", "embedding"), "embedding").collect()
    }
    assert(e.getMessage.contains("ragged"))
  }
}

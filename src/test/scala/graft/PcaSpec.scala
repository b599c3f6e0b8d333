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

  test("ragged vectors are rejected") {
    val vs = Seq((0L, Seq(1.0f, 2.0f)), (1L, Seq(1.0f)))
    val e = intercept[Exception] {
      Pca.topComponent(vs.toDF("vec_id", "embedding"), "embedding").collect()
    }
    assert(e.getMessage.contains("ragged"))
  }
}

package graft

import graft.operators.Profiler

class ProfilerSpec extends SparkSpec {
  import spark.implicits._

  test("counts, nulls, distincts and min/max per column in one pass") {
    val df = Seq(
      (1L, Some("b"), Some(2.5)),
      (2L, None, Some(1.5)),
      (3L, Some("a"), None),
      (3L, Some("a"), Some(9.0)))
      .toDF("id", "name", "score")
    val out = Profiler.profile(df).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out.keySet === Set("id", "name", "score"))
    val id = out("id")
    assert(id.getString(1) === "bigint" && id.getLong(2) === 4 &&
      id.getLong(3) === 4 && id.getDouble(4) === 0.0 &&
      id.getLong(5) === 3 && id.getString(6) === "1" &&
      id.getString(7) === "3")
    val nm = out("name")
    assert(nm.getLong(3) === 3 && nm.getDouble(4) === 0.25 &&
      nm.getLong(5) === 2 && nm.getString(6) === "a" &&
      nm.getString(7) === "b")
    assert(out("score").getLong(3) === 3)
  }

  test("complex columns report counts only; output ordered by name") {
    val df = Seq((1L, Seq(1.0f, 2.0f)), (2L, Seq(3.0f)))
      .toDF("vec_id", "embedding")
    val rows = Profiler.profile(df).collect()
    assert(rows.map(_.getString(0)).toSeq === Seq("embedding", "vec_id"))
    val emb = rows.head
    assert(emb.getLong(3) === 2)     // counted
    assert(emb.isNullAt(5) && emb.isNullAt(6) && emb.isNullAt(7))
  }

  test("approx tier: HLL n_distinct within error on known cardinalities") {
    // known cardinalities: 20000 distinct ids, 100 distinct buckets, a
    // constant, and a 50%-null column with 500 distinct values
    val n = 20000
    val df = spark.range(n).selectExpr(
      "id",
      "cast(id % 100 as string) as bucket",
      "'const' as c",
      "if(id % 2 = 0, cast(id % 1000 as string), null) as half")
    val exact = Profiler.profile(df).collect()
      .map(r => r.getString(0) -> r).toMap
    val approx = Profiler.profile(df, approxDistinct = true, p = 12)
      .collect().map(r => r.getString(0) -> r).toMap
    // everything except n_distinct is IDENTICAL between the tiers
    for (k <- exact.keys) {
      assert(exact(k).getLong(2) === approx(k).getLong(2))
      assert(exact(k).getLong(3) === approx(k).getLong(3))
      assert(exact(k).getDouble(4) === approx(k).getDouble(4))
      assert(exact(k).getString(6) === approx(k).getString(6))
      assert(exact(k).getString(7) === approx(k).getString(7))
    }
    // n_distinct within 5x the 1.04/sqrt(m) standard error (m = 4096
    // → ~1.6%; 5x leaves slack without ever accepting a wrong-tier
    // answer like 0 or n)
    val tol = 5 * 1.04 / math.sqrt(4096.0)
    for ((k, want) <- Seq("id" -> n.toLong, "bucket" -> 100L,
        "c" -> 1L, "half" -> 500L)) {
      val got = approx(k).getLong(5)
      assert(math.abs(got - want) <= math.max(1.0, tol * want),
        s"$k: hll=$got exact=$want")
    }
  }

  test("approx tier: empty and all-null columns report 0 distinct") {
    val df = Seq((1L, Option.empty[String]), (2L, None))
      .toDF("id", "dead")
    val out = Profiler.profile(df, approxDistinct = true).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out("dead").getLong(5) === 0L)
    assert(out("id").getLong(5) === 2L)
    val empty = Profiler.profile(
      Seq.empty[(Long, String)].toDF("a", "b"), approxDistinct = true)
      .collect()
    empty.foreach(r => assert(r.getLong(5) === 0L))
  }

  test("empty frame profiles to zero rows per column, no NaN") {
    val out = Profiler.profile(
      Seq.empty[(Long, String)].toDF("a", "b")).collect()
    assert(out.length === 2)
    out.foreach { r =>
      assert(r.getLong(2) === 0 && r.getDouble(4) === 0.0)
    }
  }
}

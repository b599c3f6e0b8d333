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

  test("empty frame profiles to zero rows per column, no NaN") {
    val out = Profiler.profile(
      Seq.empty[(Long, String)].toDF("a", "b")).collect()
    assert(out.length === 2)
    out.foreach { r =>
      assert(r.getLong(2) === 0 && r.getDouble(4) === 0.0)
    }
  }
}

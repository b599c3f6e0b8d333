package graft

import java.sql.Timestamp

import graft.operators.Markov

class MarkovSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")

  test("hand-computed transition counts, probabilities and ranks") {
    // user 1: a→b→a→c;  user 2: a→b
    // census: (a,b)=2, (b,a)=1, (a,c)=1... wait per sequence:
    // u1 pairs: (a,b),(b,a),(a,c); u2 pairs: (a,b)
    // prev a: (a,b)=2, (a,c)=1, total 3 → prob 666666 / 333333
    // prev b: (b,a)=1, total 1 → prob 1000000
    val rows = Seq(
      (1L, "a", ts(0), 10L), (1L, "b", ts(1), 11L),
      (1L, "a", ts(2), 12L), (1L, "c", ts(3), 13L),
      (2L, "a", ts(0), 20L), (2L, "b", ts(1), 21L))
    val out = Markov.transitions(rows.toDF("u", "e", "t", "id"),
        "u", "e", "t", "id")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out(("a", "b")) === ((2L, 666666L, 1L)))
    assert(out(("a", "c")) === ((1L, 333333L, 2L)))
    assert(out(("b", "a")) === ((1L, 1000000L, 1L)))
    assert(out.size === 3) // no cross-user pair (c → a never happens)
  }

  test("equal timestamps order deterministically by id; ties rank by name") {
    val rows = Seq(
      (1L, "x", ts(0), 2L), (1L, "y", ts(0), 1L), // y before x by id
      (2L, "p", ts(0), 1L), (2L, "q", ts(1), 2L),
      (3L, "p", ts(0), 1L), (3L, "r", ts(1), 2L))
    val out = Markov.transitions(rows.toDF("u", "e", "t", "id"),
        "u", "e", "t", "id")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(4))
      .toMap
    assert(out.contains(("y", "x")) && !out.contains(("x", "y")))
    // p→q and p→r both count 1: rank ties break by next_type name
    assert(out(("p", "q")) === 1L && out(("p", "r")) === 2L)
  }

  test("null keys/types/timestamps are excluded; invariance") {
    val rows = Seq(
      (Some(1L), Some("a"), Some(ts(0)), 1L),
      (Some(1L), Some("b"), Some(ts(1)), 2L),
      (Some(1L), None, Some(ts(2)), 3L),
      (None, Some("c"), Some(ts(3)), 4L),
      (Some(1L), Some("c"), None, 5L))
    val df = rows.toDF("u", "e", "t", "id")
    val out = Markov.transitions(df, "u", "e", "t", "id").collect()
    assert(out.length === 1) // only a→b survives the null filters
    val again = Markov.transitions(df.repartition(4), "u", "e", "t", "id")
      .orderBy("prev_type", "rank").collect().toSeq
    assert(Markov.transitions(df, "u", "e", "t", "id")
      .orderBy("prev_type", "rank").collect().toSeq === again)
  }
}

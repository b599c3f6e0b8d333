package graft

import graft.operators.Snapshot

class SnapshotSpec extends SparkSpec {
  import spark.implicits._

  private val old = Seq(
    (1L, "alpha content"), (2L, "beta content"), (3L, "gamma content"))
    .toDF("id", "text")

  test("statuses cover added/removed/changed/unchanged") {
    val neu = Seq(
      (1L, "alpha content"),        // unchanged
      (2L, "beta REVISED content"), // changed
      (4L, "delta content"))        // added; 3 removed
      .toDF("id", "text")
    val out = Snapshot.diff(old, neu, "id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out === Map(1L -> "unchanged", 2L -> "changed",
      3L -> "removed", 4L -> "added"))
    val sum = Snapshot.diffSummary(old, neu, "id", "text")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sum === Map("unchanged" -> 1L, "changed" -> 1L,
      "removed" -> 1L, "added" -> 1L))
  }

  test("fingerprint tolerates whitespace/punctuation jitter") {
    val neu = Seq((1L, "  ALPHA, content!!")).toDF("id", "text")
    val out = Snapshot.diff(old.filter($"id" === 1), neu, "id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out === Map(1L -> "unchanged"))
  }

  test("null text classifies by presence, not by fingerprint nullness") {
    // id 1: null on both sides -> unchanged (null fp compares null-safe);
    // id 2: text -> null = changed; id 3: null only in old, absent in new
    // -> removed; id 4: null text, only in new -> added
    val o = Seq((1L, null: String), (2L, "beta"), (3L, null: String))
      .toDF("id", "text")
    val n = Seq((1L, null: String), (2L, null: String), (4L, null: String))
      .toDF("id", "text")
    val out = Snapshot.diff(o, n, "id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out === Map(1L -> "unchanged", 2L -> "changed",
      3L -> "removed", 4L -> "added"))
  }

  test("only ids and fingerprints cross the join shuffle") {
    val p = Snapshot.diff(old, old, "id", "text")
      .queryExecution.executedPlan.toString
    val exchanges = p.linesIterator.filter(_.contains("Exchange")).toSeq
    assert(exchanges.forall(l => !l.contains("text#")),
      s"document text crossed a shuffle:\n${exchanges.mkString("\n")}")
  }
}

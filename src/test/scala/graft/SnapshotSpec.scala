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

  test("checksum is invariant to row order and partitioning") {
    val rows = (0 until 300).map(i => (i.toLong, s"content $i"))
    val base = rows.toDF("id", "text")
    val shuffled = new scala.util.Random(3).shuffle(rows)
      .toDF("id", "text").repartition(7)
    assert(Snapshot.checksum(base, "id", "text").collect().toSeq ===
      Snapshot.checksum(shuffled, "id", "text").collect().toSeq)
  }

  test("shard checksums merge into the union checksum") {
    val a = (0 until 100).map(i => (i.toLong, s"t$i")).toDF("id", "text")
    val b = (100 until 250).map(i => (i.toLong, s"t$i")).toDF("id", "text")
    val Array(na, sa, xa) = Snapshot.checksum(a, "id", "text")
      .collect().head.toSeq.map(_.asInstanceOf[Long]).toArray
    val Array(nb, sb, xb) = Snapshot.checksum(b, "id", "text")
      .collect().head.toSeq.map(_.asInstanceOf[Long]).toArray
    val u = Snapshot.checksum(a.unionByName(b), "id", "text").collect().head
    assert(u.getLong(0) === na + nb)
    assert(u.getLong(1) === (sa + sb) % (1L << 61))
    assert(u.getLong(2) === (xa ^ xb))
  }

  test("checksum reacts to any single-character change and to null text") {
    val a = Seq((1L, "alpha"), (2L, "beta")).toDF("id", "text")
    val b = Seq((1L, "alpha"), (2L, "betA")).toDF("id", "text")
    val ca = Snapshot.checksum(a, "id", "text").collect().head
    val cb = Snapshot.checksum(b, "id", "text").collect().head
    assert(ca.getLong(0) === cb.getLong(0))
    assert(ca.getLong(1) !== cb.getLong(1))
    assert(ca.getLong(2) !== cb.getLong(2))
    // null text participates (hashes as empty), doesn't drop the row
    val withNull = Seq((1L, "alpha"), (2L, null: String)).toDF("id", "text")
    assert(Snapshot.checksum(withNull, "id", "text")
      .collect().head.getLong(0) === 2L)
  }
}

package graft

import graft.rag.PhraseIndex

class PhraseIndexSpec extends SparkSpec {
  import spark.implicits._

  private def index(rows: (Long, String)*) =
    PhraseIndex.build(rows.toSeq.toDF("id", "text"), "id", "text")

  private def hits(idx: org.apache.spark.sql.DataFrame, phrase: String) =
    PhraseIndex.phraseSearch(idx, phrase).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

  test("finds exact phrases with 0-based first positions") {
    val idx = index(
      1L -> "the quick brown fox jumps",
      2L -> "quick brown shoes and quick brown boots",
      3L -> "brown quick reversed here")
    val out = hits(idx, "quick brown")
    assert(out === Map(1L -> ((1L, 1L)), 2L -> ((2L, 0L))))
  }

  test("overlapping matches each count") {
    val idx = index(1L -> "a a a a")
    assert(hits(idx, "a a") === Map(1L -> ((3L, 0L))))
  }

  test("three-term phrases and case-insensitivity") {
    val idx = index(
      1L -> "Deep Learning Models are deep learning models",
      2L -> "deep models learning shuffled")
    assert(hits(idx, "DEEP Learning models") === Map(1L -> ((2L, 0L))))
  }

  test("absent phrases, null text, and empty phrases behave") {
    val idx = index(1L -> "something here", 2L -> null.asInstanceOf[String])
    assert(hits(idx, "not present").isEmpty)
    intercept[IllegalArgumentException] {
      PhraseIndex.phraseSearch(idx, "   ")
    }
  }

  test("single-term search degrades to plain postings lookup") {
    val idx = index(1L -> "x y x", 2L -> "y z")
    assert(hits(idx, "x") === Map(1L -> ((2L, 0L))))
    assert(hits(idx, "y") === Map(1L -> ((1L, 1L)), 2L -> ((1L, 0L))))
  }
}

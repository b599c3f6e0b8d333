package graft

import org.apache.spark.sql.functions._

import graft.operators.HeavyHitters

class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  private def exact(items: Seq[String], k: Int): Map[String, Long] = {
    val n = items.size.toLong
    items.groupBy(identity).view.mapValues(_.size.toLong)
      .filter { case (_, c) => c * k > n }.toMap
  }

  test("equals the exact census filter across partitionings (property)") {
    val rnd = new scala.util.Random(7)
    // zipf-ish stream: item i with weight ~ 1/(i+1)
    val pool = (0 until 50).flatMap(i => Seq.fill(1 + 400 / (i + 1))(s"it$i"))
    for (trial <- 0 until 4) {
      val stream = Seq.fill(4000)(pool(rnd.nextInt(pool.size)))
      val k = Seq(5, 10, 25, 100)(trial)
      for (parts <- Seq(1, 3, 8)) {
        val df = stream.toDF("t").repartition(parts)
        val got = HeavyHitters.frequentItems(df, "t", k)
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        assert(got === exact(stream, k), s"trial=$trial k=$k parts=$parts")
      }
    }
  }

  test("MG survivors are a superset of true heavies and bounded") {
    val stream = Seq.fill(2000)("hot") ++ (0 until 6000).map(i => s"cold$i")
    val rnd = new scala.util.Random(11)
    val shuffled = rnd.shuffle(stream)
    val parts = 5
    val k = 10
    val ds = shuffled.toDF("t").repartition(parts).as[String]
    val cands = HeavyHitters.mgCandidates(ds, k)
      .collect().map(_.getString(0)).toSet
    assert(cands.contains("hot"))           // 25% of mass must survive
    assert(cands.size <= parts * k, s"${cands.size} candidates")
    // ... and the confirm pass reports the exact count
    val out = HeavyHitters.frequentItems(shuffled.toDF("t"), "t", k)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out === Map("hot" -> 2000L))
  }

  test("nulls are ignored; empty input yields empty output") {
    val df = Seq(Some("a"), None, Some("a"), Some("b"), None).toDF("t")
    val out = HeavyHitters.frequentItems(df, "t", 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out === Map("a" -> 2L)) // N=3 non-null; 2*2 > 3, 1*2 < 3
    assert(HeavyHitters.frequentItems(
      spark.emptyDataset[String].toDF("t"), "t", 5).count() === 0)
  }

  test("uniform stream below threshold returns nothing") {
    val stream = (0 until 1000).map(i => s"u${i % 100}") // each exactly 1%
    val out = HeavyHitters.frequentItems(stream.toDF("t"), "t", 50)
    assert(out.count() === 0) // 10 * 50 = 500 < 1000, nothing passes
  }
}

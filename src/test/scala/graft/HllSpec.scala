package graft

import org.apache.spark.sql.functions._

import graft.operators.Hll

class HllSpec extends SparkSpec {
  import spark.implicits._

  private def ids(n: Int, tag: String) =
    spark.range(n).select(lit("g").as("g"),
      concat(lit(tag), col("id")).as("item"))

  test("merge of per-shard registers equals registers of the union") {
    val a = ids(3000, "a"); val b = ids(3000, "b")
    val together = Hll.registers(a.unionByName(b), "item", Seq("g"), p = 8)
    val merged = Hll.merge(
      Hll.registers(a, "item", Seq("g"), p = 8),
      Hll.registers(b, "item", Seq("g"), p = 8), Seq("g"))
    val l = together.collect().map(r => (r.getString(0), r.getLong(1)) -> r.getInt(2)).toMap
    val r = merged.collect().map(r => (r.getString(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(l === r)
    // and so the merged ESTIMATE is the union estimate, bit for bit
    assert(Hll.estimate(merged, Seq("g"), p = 8).collect().toSeq ===
      Hll.estimate(together, Seq("g"), p = 8).collect().toSeq)
  }

  test("raw-branch estimate lands within the ~1.04/sqrt(m) error band") {
    val n = 20000
    val est = Hll.distinctEstimate(ids(n, "x"), "item", Seq("g"), p = 12)
      .collect().head.getDouble(3)
    // 3-sigma of the 1.04/sqrt(4096) = 1.6% standard error
    assert(math.abs(est - n) / n < 0.05, s"est=$est for n=$n")
  }

  test("small counts route through linear counting and stay tight") {
    val n = 40
    val row = Hll.distinctEstimate(ids(n, "y"), "item", Seq("g"), p = 10)
      .collect().head
    val vZero = row.getLong(1)
    assert(vZero > 0 && vZero > 1024 - 45) // nearly all registers empty
    val est = row.getDouble(3)
    // linear counting formula exactly: m * ln(m / V) rounded at 6dp
    val lc = BigDecimal(1024.0 * math.log(1024.0 / vZero))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(est === lc)
    assert(math.abs(est - n) <= 3) // duplicates within buckets at n=40
  }

  test("duplicates never move the registers: distinct-ness is structural") {
    val once = ids(500, "z")
    val thrice = once.unionByName(once).unionByName(once)
    assert(Hll.distinctEstimate(thrice, "item", Seq("g"), p = 10)
      .collect().toSeq ===
      Hll.distinctEstimate(once, "item", Seq("g"), p = 10).collect().toSeq)
  }

  test("register rank replays Long.numberOfLeadingZeros (property)") {
    // The operator's smear+popcount bit length against the JVM intrinsic,
    // over the full shape of 50-bit values (p=10 leaves 50 hash bits);
    // one Spark job for all sampled cases. Includes every power of two
    // and power-of-two ± 1 (the floor boundaries a float log2 would miss).
    val rnd = new scala.util.Random(42)
    val ws = (Seq(0L, 1L) ++
      (0 until 50).flatMap(k => Seq((1L << k) - 1, 1L << k, (1L << k) + 1)) ++
      Seq.fill(200)(math.abs(rnd.nextLong()) % (1L << 50)))
      .map(w => w % (1L << 50))
    val smear = {
      var c: org.apache.spark.sql.Column = col("w")
      for (s <- Seq(1, 2, 4, 8, 16, 32)) c = c.bitwiseOR(shiftright(c, s))
      bit_count(c)
    }
    val got = ws.toDF("w").select(col("w"), smear.as("bl"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    ws.foreach { w =>
      assert(got(w) === 64 - java.lang.Long.numberOfLeadingZeros(w), s"w=$w")
    }
  }

  test("fast tier produces registers too (Spark-reproducible, not md5)") {
    val regs = Hll.registers(ids(1000, "f"), "item", Seq("g"), p = 10,
      portable = false)
    val rows = regs.collect()
    assert(rows.nonEmpty && rows.forall(r => r.getInt(2) >= 1 && r.getInt(2) <= 51))
    val est = Hll.estimate(regs, Seq("g"), p = 10).collect().head.getDouble(3)
    assert(math.abs(est - 1000) / 1000.0 < 0.15)
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for hot-key joins — the manual complement to AQE's
  * skew-join splitting, for when one build-side key is so hot that a single
  * reducer would own it (classic 100 TB failure mode).
  *
  * Salted broadcast-free join: the probe side gets a random-ish salt in
  * [0, salts) derived deterministically from the row (hash of all columns —
  * no RNG, so retries/resumes see identical assignments); the build side is
  * exploded `salts`× with every salt value. The join key becomes
  * (key, salt), spreading each hot key over `salts` reducers. Build-side
  * duplication costs salts× its size — use for small-to-medium build sides
  * with hot keys; for big-big skew prefer AQE skew handling.
  */
object Skew {

  def saltedJoin(probe: DataFrame, build: DataFrame, key: String,
                 salts: Int = 16, joinType: String = "inner"): DataFrame = {
    require(salts > 1, "salts must be > 1")
    val saltedProbe = probe.withColumn("_salt",
      pmod(hash(probe.columns.map(col): _*), lit(salts)))
    val saltedBuild = build
      .withColumn("_salt", explode(sequence(lit(0), lit(salts - 1))))
    saltedProbe.join(saltedBuild, Seq(key, "_salt"), joinType)
      .drop("_salt")
  }
}

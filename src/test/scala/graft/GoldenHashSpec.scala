package graft

import graft.tools.GoldenHash

/** Regression teeth for the FAST-tier declared arms. q145/q147/q166
  * were rows-only in the driver's correctness gate through round 10;
  * since r11 each has a REAL DuckDB oracle ([[graft.queries
  * .OracleSqlGen]] replays xxHash64, the rolling-polynomial fmix64, and
  * the full Porter chain in single-statement mod-2^64 SQL), so the
  * driver hash-compares them like every other arm. These pins stay as
  * belt-and-braces: they catch drift even when the oracle and the arm
  * change together (both sides of a hash compare moving in lockstep
  * would pass the driver; the frozen triple would not). This suite pins
  * each arm's
  * FULL output at sf0.01 — the gate's own scale — as an order-invariant
  * (n_rows, fp_sum, fp_xor) checksum triple ([[GoldenHash.checksum]]:
  * canonical per-row render, salted md5, count/sum-mod-2^61/xor fold),
  * so any value drift in any row fails here by arm name with the same
  * sensitivity as a driver hash_match row.
  *
  * The triples were computed ONCE via `runMain graft.tools.GoldenHash`
  * against the tier-discipline-green tree and are re-pinned only when
  * an arm's DECLARED semantics change (the commit must say why). They
  * complement — never replace — each arm's semantic specs: CurationSpec
  * proves q145/q147 tier-equivalence against the portable oracle-green
  * siblings, PorterSpec proves q166's stemmer on ~80 canonical vectors;
  * this suite only freezes the verified behavior against regression.
  */
class GoldenHashSpec extends SparkSpec {
  private val sfDir = "/root/testdata/sf0.01"

  private val golden: Map[String, (Long, Long, Long)] = Map(
    // pinned via `runMain graft.tools.GoldenHash /root/testdata/sf0.01 ...`
    // against the round-9 tree (all tier-discipline specs green)
    "q145_cms_novelty_fast" -> (500L, 2037760498052765162L, 1020251094192919188L),
    "q147_winnowing_fast" -> (53863L, 1629655387213811305L, 1004361230984674733L),
    "q166_stemmed_census" -> (31L, 1003584031915876979L, 65094039792818281L)
  )

  for ((name, want) <- golden.toSeq.sortBy(_._1)) {
    test(s"golden checksum pins $name at sf0.01") {
      val got = GoldenHash.checksum(SparkEntry.queries(name)(spark, sfDir))
      assert(got === want,
        s"$name output multiset drifted from the pinned golden triple — " +
          "if the arm's DECLARED semantics changed, re-pin via " +
          "`runMain graft.tools.GoldenHash` and justify in the commit")
    }
  }
}

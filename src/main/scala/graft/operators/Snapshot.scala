package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Snapshot diffing for incremental corpora — the report an ingestion
  * team reads between two crawls of the same id space: which documents
  * are ADDED (id only in the new snapshot), REMOVED (only in the old),
  * CHANGED (both, content fingerprint differs), UNCHANGED. Content
  * equality is the corpus-wide canonical fingerprint
  * ([[TextFunctions.fingerprint]] — whitespace/punctuation-jitter
  * tolerant), so a re-serialized but identical page doesn't read as a
  * change.
  *
  * One full-outer join on the id — both sides project to (id,
  * 16-byte fingerprint) first, so at 100 TB the shuffle carries ids
  * and fingerprints, never document text. Pair with
  * [[Dedup.dropSeenBefore]] (content-keyed) when ids are unstable
  * across crawls.
  */
object Snapshot {

  /** Per-document diff: (idCol, status) with status ∈ added | removed |
    * changed | unchanged. Presence is tracked by per-side markers, NOT by
    * fingerprint nullness — a document with null text (null fingerprint)
    * present in both snapshots is unchanged, not added/removed — and the
    * fingerprint comparison is null-safe, so null-text twins compare
    * equal instead of falling through to 'changed'. */
  def diff(oldDf: DataFrame, newDf: DataFrame, idCol: String,
           textCol: String): DataFrame = {
    def fp(df: DataFrame, pres: String, as: String) =
      df.select(col(idCol), lit(true).as(pres),
        TextFunctions.fingerprint(col(textCol)).as(as))
    fp(oldDf, "__graft_po", "__graft_fpo")
      .join(fp(newDf, "__graft_pn", "__graft_fpn"), Seq(idCol), "full")
      .select(col(idCol),
        when(col("__graft_po").isNull, "added")
          .when(col("__graft_pn").isNull, "removed")
          .when(col("__graft_fpo") <=> col("__graft_fpn"), "unchanged")
          .otherwise("changed").as("status"))
  }

  /** The dashboard rollup: status → count. */
  def diffSummary(oldDf: DataFrame, newDf: DataFrame, idCol: String,
                  textCol: String): DataFrame =
    diff(oldDf, newDf, idCol, textCol)
      .groupBy(col("status")).agg(count(lit(1)).as("n"))

  /** Order-invariant dataset checksum — the one-row content identity a
    * reproducibility ledger records next to a training run ("exactly
    * which corpus was this?"): row count, the modular SUM and the XOR
    * of every row's 60-bit content hash. Both folds are commutative
    * and associative, so the checksum is invariant to row order and
    * partitioning, and MERGEABLE: checksums of shards combine
    * (counts/sums add mod 2^61, xors xor) into the checksum of the
    * union — no re-scan to re-stamp a grown corpus. Computed as one
    * map + a 1-row aggregate (sum carried in DECIMAL(38,0) so no
    * overflow before the final mod); the salted md5 row hash is the
    * portable formula any engine replays. Null text hashes as empty —
    * a (id, null) row still counts — and null IDS hash under the
    * sentinel `__graft_null_id__` (the ADVICE r8 fix: an un-coalesced
    * null id made the whole row hash null, so the row counted in
    * n_rows but dropped out of fp_sum/fp_xor and its TEXT stopped
    * participating in the content identity). An actual string id equal
    * to the sentinel is indistinguishable from a null id — the
    * documented contract, acceptable for a reserved `__graft_` name. */
  def checksum(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val h = TextFunctions.hash64(concat(
      coalesce(col(idCol).cast("string"), lit("__graft_null_id__")),
      lit("|"), coalesce(col(textCol), lit(""))))
    val mod = 1L << 61
    df.select(h.as("__graft_h"))
      .agg(count(lit(1)).as("n_rows"),
        pmod(sum(col("__graft_h").cast("decimal(38,0)")), lit(mod))
          .cast("long").as("fp_sum"),
        expr("bit_xor(__graft_h)").as("fp_xor"))
  }
}

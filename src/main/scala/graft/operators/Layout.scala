package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout via Z-ordering (Morton curves — the
  * clustering trick behind Delta Lake's `OPTIMIZE ZORDER BY` and
  * Databricks/Iceberg data skipping): interleave the bits of two sort
  * keys so that sorting by the single interleaved value keeps rows
  * close in BOTH dimensions. Files written in z-order carry tight
  * min/max footer ranges on every interleaved column, so a predicate
  * on ANY of them prunes files — a plain lexicographic sort gives that
  * property to its leading column only.
  *
  * At 100 TB this is a write-side investment that pays on every read:
  * one `repartitionByRange(z)` + in-partition sort at ingest, and a
  * scan filtered on either key touches ~√F of F files instead of all
  * of them (a 2-D curve; each extra interleaved column costs range
  * resolution per key).
  *
  * The z-value is pure bit arithmetic — engine-portable, replayed in
  * DuckDB by the very formula [[zValue]] composes.
  */
object Layout {

  /** Morton interleave of the low `bits` bits of two NON-NEGATIVE
    * integer columns: bit i of `a` lands at position 2i, bit i of `b`
    * at 2i+1. `2·bits ≤ 62` keeps the result in a positive long. */
  def zValue(a: Column, b: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits=$bits out of [1,31]")
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i))
        .bitwiseOR(shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }
  }

  /** Add a z-order column over `colA`/`colB` (low `bits` bits each). */
  def withZValue(df: DataFrame, colA: String, colB: String, bits: Int,
                 out: String = "z"): DataFrame =
    df.withColumn(out, zValue(col(colA), col(colB), bits))

  /** Cluster `df` for writing: range-partition and sort by the z-value
    * of (`colA`, `colB`), so each output file covers one tight tile of
    * the 2-D key space (≈ square: a partition of 2^(2k) consecutive
    * z-values is a 2^k × 2^k tile). Write the result with any sink;
    * parquet min/max footers then prune on both keys. */
  def zorderLayout(df: DataFrame, colA: String, colB: String, bits: Int,
                   numPartitions: Int, zCol: String = "__graft_z"): DataFrame = {
    val z = withZValue(df, colA, colB, bits, zCol)
    z.repartitionByRange(numPartitions, col(zCol))
      .sortWithinPartitions(col(zCol))
      .drop(zCol)
  }

  /** The DuckDB-replayable SQL text of [[zValue]] for columns named
    * `a`/`b` — used by oracles so both engines run the same formula. */
  def zValueSql(a: String, b: String, bits: Int): String =
    (0 until bits).map(i =>
      s"((($a >> $i) & 1) << ${2 * i}) | ((($b >> $i) & 1) << ${2 * i + 1})")
      .mkString(" | ")
}

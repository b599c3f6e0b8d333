package graft.operators

import org.apache.spark.sql.{Column, DataFrame}

/** Shared builder for the one-shot bloom filters behind
  * [[Dedup.dropSeenBefore]] and [[Decontamination.flagContaminatedBloom]].
  *
  * Spark's `BloomFilterAggregate` silently clamps its size to
  * `spark.sql.optimizer.runtime.bloomFilter.{maxNumItems,maxNumBits}`
  * (defaults 4M items / 8 MB) — sized for its own runtime join pruning,
  * not for corpus-scale ledgers. Built under those defaults, a 10^8-item
  * filter still "works" but is saturated: results stay correct (the exact
  * confirm joins remove false positives) while the map-side prune quietly
  * degrades to near-zero selectivity. This builder raises the session caps
  * to what the item count actually needs for the requested fpp, builds,
  * and restores the caps — so the scale claim in the callers' docs is
  * real, not clamped.
  */
object BloomBuild {

  /** Aggregate `hashCol` (must be a LONG hash, e.g. `xxhash64(...)`) over
    * `df` into one bloom filter's serialized bytes. `n` is the exact item
    * count (callers have it anyway from their emptiness check); sizing is
    * the textbook optimum m = -n·ln(p)/ln(2)², ~7.3 bits/item at p=0.03.
    * Driver-side memory is m/8 bytes: 10^8 items ≈ 110 MB — still one
    * broadcastable binary; at 10^9+ raise `fpp` or shard the ledger. */
  def bloomBytes(df: DataFrame, hashCol: Column, n: Long,
      fpp: Double = 0.03): Array[Byte] = {
    import org.apache.spark.sql.catalyst.expressions.{Literal => CLit}
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    import org.apache.spark.sql.graftbridge.ColumnBridge

    require(n > 0, "bloom filter needs at least one item")
    require(fpp > 0 && fpp < 1, s"fpp must be in (0,1), got $fpp")
    val numBits = math.max(64L,
      math.ceil(-n * math.log(fpp) / (math.log(2) * math.log(2))).toLong)

    // Serialize builds JVM-wide: the caps live in shared session conf and
    // BloomFilterAggregate min()s its size against them LAZILY at
    // execution, so a concurrent build's finally-restore mid-job would
    // silently re-clamp this one — the exact failure this class exists to
    // prevent. Builds are rare one-shot driver jobs; the lock is cheap.
    // (Raising the caps is harmless to unrelated queries: they are upper
    // bounds, and other blooms still size from their own estimates.)
    BloomBuild.synchronized {
      val conf = df.sparkSession.conf
      val itemsKey = "spark.sql.optimizer.runtime.bloomFilter.maxNumItems"
      val bitsKey = "spark.sql.optimizer.runtime.bloomFilter.maxNumBits"
      val oldItems = conf.get(itemsKey)
      val oldBits = conf.get(bitsKey)
      try {
        // caps must hold across the collecting job below
        if (n > oldItems.toLong) conf.set(itemsKey, n.toString)
        if (numBits > oldBits.toLong) conf.set(bitsKey, numBits.toString)
        df.select(ColumnBridge.column(
          new BloomFilterAggregate(
            ColumnBridge.catalystExpression(hashCol),
            CLit.create(n), CLit.create(numBits))
            .toAggregateExpression()).as("bf"))
          .head().getAs[Array[Byte]](0)
      } finally {
        conf.set(itemsKey, oldItems)
        conf.set(bitsKey, oldBits)
      }
    }
  }

  /** `might_contain(filterBytes, hashCol)` as a Column — the map-side
    * prune matching a [[bloomBytes]] build (no false negatives). */
  def mightContain(filterBytes: Array[Byte], hashCol: Column): Column = {
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal => CLit}
    import org.apache.spark.sql.graftbridge.ColumnBridge
    import org.apache.spark.sql.types.BinaryType
    ColumnBridge.column(new BloomFilterMightContain(
      CLit.create(filterBytes, BinaryType),
      ColumnBridge.catalystExpression(hashCol)))
  }
}

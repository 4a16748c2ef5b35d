package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.graft.Shim

/**
 * Bloom-filter membership over document corpora (C18). Spark ships a
 * distributed bloom build (`BloomFilterAggregate`, the engine's own
 * runtime-join-filter sketch) but does not expose it in the public
 * function registry — [[Shim]] wraps the Catalyst expressions.
 *
 * Scale shape: the build is one aggregation producing a KB..MB binary
 * sketch (map-side partial merge, driver never sees raw keys); probing
 * broadcasts the sketch and stays map-only. The classic use at 100 TB:
 * "is this document's fingerprint in the blocklist / already-ingested
 * set?" without shuffling the corpus against the set. Guarantees no
 * false negatives; false-positive rate set by bits/item (~9.6 bits/item
 * for 1%).
 */
object BloomFunctions {

  /** Aggregate a LONG hash column (e.g. `xxhash64(fingerprint)`) into a
   * serialized bloom filter. */
  def bloomAgg(hashCol: Column, expectedItems: Long, numBits: Long): Column =
    Shim.column(
      new BloomFilterAggregate(
        Shim.expression(hashCol), Literal(expectedItems), Literal(numBits))
        .toAggregateExpression())

  /** Probe: true if `hashCol` may be in the set (never a false negative).
   * `might_contain` requires the sketch as a constant (or scalar
   * subquery), so the serialized filter is inlined as a binary literal —
   * it rides to executors with the task closure, like a broadcast. */
  def mightContain(bloom: Array[Byte], hashCol: Column): Column =
    Shim.column(
      BloomFilterMightContain(
        Literal(bloom, org.apache.spark.sql.types.BinaryType),
        Shim.expression(hashCol)))

  /** Distributed build + driver fetch of the serialized sketch (the raw
   * keys never leave the executors; only the KB..MB bitset returns). */
  def build(df: org.apache.spark.sql.DataFrame, hashCol: Column,
      expectedItems: Long, numBits: Long): Array[Byte] =
    df.agg(bloomAgg(hashCol, expectedItems, numBits).as("bf"))
      .head.getAs[Array[Byte]]("bf")
}

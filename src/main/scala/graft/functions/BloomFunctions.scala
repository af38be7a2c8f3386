package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions.xxhash64
import org.apache.spark.sql.graftbridge.{toColumn, toExpression}

/** Column wrappers over Spark's OWN Bloom-filter machinery — the
  * `BloomFilterAggregate` / `BloomFilterMightContain` expression pair
  * Catalyst injects for runtime join filters (it is not SQL-registered,
  * hence the graftbridge). Both are native codegen'd expressions: the
  * aggregate's bit-OR merge is commutative, so the built filter is
  * deterministic under any partitioning/merge order, and the probe is
  * a map-side expression over the broadcast filter binary — the
  * cheapest possible "have we seen this key" pre-screen at 100 TB
  * (constant bits per key, no shuffle, no false negatives).
  */
object BloomFunctions {

  /** Aggregate: build a Bloom filter binary over `key`'s xxhash64.
    * Size via `numBits` (≈ n·ln(1/p)/ln²2 bits for target fp rate p). */
  def bloom_agg(key: Column, expectedItems: Long, numBits: Long): Column =
    toColumn(new BloomFilterAggregate(toExpression(xxhash64(key)),
      Literal(expectedItems), Literal(numBits)).toAggregateExpression())

  /** Probe: might `key` be in the filter? TRUE for every inserted key
    * (no false negatives); spuriously TRUE for others at the sized fp
    * rate. */
  def bloom_might_contain(bloom: Column, key: Column): Column =
    toColumn(BloomFilterMightContain(toExpression(bloom), toExpression(xxhash64(key))))
}

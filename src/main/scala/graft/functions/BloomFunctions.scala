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

  /** Ceiling on a driver-materialized filter's size. Sizing from the
    * data is right (bits must grow with n to hold an fp bound), but
    * UNBOUNDED data-sizing turns a control-plane literal into a
    * data-plane object: at 10⁹ distinct keys, 16 bits/key is a ~2 GB
    * plan literal. Spark's own InjectRuntimeFilter caps its bloom at
    * `spark.sql.optimizer.runtimeFilter.bloomFilter.maxNumBits`
    * (default 67108864 = 8 MB) and degrades to a semi-join past it —
    * same bound, same degradation, here. */
  val MaxNumBits: Long = 67108864L

  /** Data-sized bit count under [[MaxNumBits]]: `bitsPerKey`·n with a
    * small-fixture floor, or None when the cap cannot hold the keys at
    * that rate — callers must then fall back to an exact semi-join
    * (a too-small filter saturates toward fp≈1, silently screening
    * nothing). */
  def sizedBits(nKeys: Long, bitsPerKey: Long = 16L, floor: Long = 65536L,
      maxNumBits: Long = MaxNumBits): Option[Long] = {
    val want = math.max(bitsPerKey * nKeys, floor)
    if (want <= maxNumBits) Some(want) else None
  }

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

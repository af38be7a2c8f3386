package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Aggregation strategies beyond a plain `groupBy` — result-identical
  * rewrites whose only purpose is the shuffle/skew profile at scale.
  * (The reference's aggregations — publish_to_catalog.py:93-124 run
  * counters, L554-563 per-category stats — are all plain group-bys;
  * these variants exist for the 100 TB regime where a handful of hot
  * keys would serialize a stage.)
  */
object Aggregates {

  /** Two-phase salted aggregation for skewed group keys: rows first
    * aggregate on (key, salt) — the salt splits a hot key across up to
    * `nSalts` reducers — then the per-salt partials combine in a
    * second, tiny agg keyed on the key alone. Exactly the rewrite AQE's
    * skew handling cannot do for aggregations (it only splits skewed
    * JOIN partitions); here it is explicit and deterministic.
    *
    * Result-identity: count is a sum of partial counts; the sum runs
    * over exact DECIMAL(18,2) partials, so re-association across salts
    * cannot change a bit — the salted plan equals the plain
    * `groupBy(key)` bit-for-bit on any engine, which is what the x50
    * oracle checks.
    *
    * The salt derives from `saltSrc` (any column; uniformity is all
    * that matters) rather than rand() — deterministic replays matter
    * more than perfect balance. Both aggs are Spark partial+final hash
    * aggs, so the REAL exchange volume is ≤ nSalts rows per (mapper,
    * key) after map-side combine, then ≤ nSalts rows per key total.
    *
    * Output: (keyCol, n, sum_val DECIMAL) — caller casts for display. */
  def saltedCountSum(df: DataFrame, keyCol: String, valCol: String,
      saltSrc: String, nSalts: Int = 16): DataFrame = {
    require(nSalts > 0, s"saltedCountSum: nSalts must be positive, got $nSalts")
    df.withColumn("__salt", pmod(xxhash64(col(saltSrc)), lit(nSalts)))
      .groupBy(col(keyCol), col("__salt"))
      .agg(count(lit(1)).as("__pn"),
        sum(col(valCol).cast("decimal(18,2)")).as("__ps"))
      .groupBy(col(keyCol))
      .agg(sum(col("__pn")).cast("bigint").as("n"),
        sum(col("__ps")).as("sum_val"))
  }
}

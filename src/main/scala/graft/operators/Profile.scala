package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column profiling — the data-quality first pass of a corpus
  * pipeline: per-column row/null/distinct counts and min/max. One
  * aggregation pass over the table computes every column's stats
  * (no per-column scans); the unpivot to long format is a narrow
  * post-processing step on the single aggregated row.
  *
  * min/max are emitted as strings under binary collation (both Spark
  * and DuckDB default to binary string comparison, which is what makes
  * the oracle exact).
  */
object Profile {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"__cnt_$c"),
        count(lit(1)).minus(count(col(c))).as(s"__null_$c"),
        countDistinct(col(c)).as(s"__dist_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = cols.map { c =>
      struct(
        lit(c).as("column"),
        col(s"__cnt_$c").as("n_non_null"),
        col(s"__null_$c").as("n_null"),
        col(s"__dist_$c").as("n_distinct"),
        col(s"__min_$c").as("min_str"),
        col(s"__max_$c").as("max_str"))
    }
    one.select(explode(array(rows: _*)).as("p")).select("p.*")
  }

  /** KMV (k-minimum-values) distinct-count sketch per group — the
    * AUDITABLE cardinality estimator (the x47 pattern applied to
    * approx-distinct): unlike HLL (x20, engine-specific registers,
    * rows-only checked), every piece of this sketch — the k smallest
    * 60-bit hashes, the kth value, the estimate (k-1)·2⁶⁰/kth — is
    * recomputable in plain SQL, so the approximate path itself is
    * value-checked. Estimate arithmetic stays engine-exact: (k-1)·2⁶⁰
    * is exactly representable in a double (6 significant bits), the
    * BIGINT→DOUBLE cast of kth is IEEE-correctly rounded, and floor of
    * the identical quotient is identical.
    *
    * Input: (groupCol, hashCol: Long) rows, duplicates allowed (an
    * internal distinct dedups). Groups with fewer than k distinct
    * hashes hold ALL of them — the estimate IS the exact count there.
    *
    * Scale: the ranking window runs over DISTINCT hashes per group
    * (already reduced by the map-side-combining distinct); at 100 TB
    * swap the window for a bounded k-min heap aggregator on longs —
    * same output, exchange carries ≤ k values per (task, group).
    *
    * Output: (groupCol, n_min, kth, est_distinct, exact_distinct). */
  def kmvDistinctSketch(df: DataFrame, groupCol: String, hashCol: String,
      k: Int = 64): DataFrame = {
    require(k > 1, s"kmvDistinctSketch: k must be > 1, got $k")
    import org.apache.spark.sql.expressions.Window
    val space = 1152921504606846976L // 2^60
    // enforce the hash-domain contract at execution: a full-range
    // signed hash (xxhash64) would sort negatives first and turn the
    // estimate into garbage silently — fail loudly instead
    val checked = when(col(hashCol) >= 0 && col(hashCol) < space, col(hashCol))
      .otherwise(raise_error(concat(
        lit(s"kmvDistinctSketch: $hashCol outside [0, 2^60): "),
        col(hashCol).cast("string"))))
    val hashes = df.select(col(groupCol).as("grp"), checked.as("h"))
      .distinct()
      .localCheckpoint(true) // feeds the sketch AND the exact count
    val w = Window.partitionBy(col("grp")).orderBy(col("h"))
    val sketch = hashes
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n_min"), max(col("h")).as("kth"))
    val exact = hashes.groupBy(col("grp"))
      .agg(count(lit(1)).as("exact_distinct"))
    // 2^60 as an exact double; (k-1)·2⁶⁰ keeps ≤ 7 significant bits
    val estSpace = lit((k - 1).toDouble * space.toDouble)
    sketch.join(exact, "grp")
      .select(col("grp").as(groupCol), col("n_min"), col("kth"),
        when(col("n_min") < k, col("n_min"))
          .otherwise(floor(estSpace / col("kth").cast("double")))
          .as("est_distinct"),
        col("exact_distinct"))
  }
}

package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Evidence for the SCALE.md claim that AQE's runtime skew-join
  * splitting covers moderate key skew without the manual salting
  * rewrite (Joins.saltedJoin / x18 stays for the pathological cases
  * AQE can't see, e.g. skew inside an aggregation). One hot key holds
  * ~83% of the left side; with the skew thresholds scaled down to
  * fixture size, AQE must split that partition into multiple tasks at
  * runtime — the same plan surgery that keeps a 100 TB join's stragglers
  * bounded. */
class AqeSkewJoinSpec extends SparkSpec {

  test("AQE splits the skewed join partition at runtime") {
    val tuned = Map(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "131072",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "65536",
      // coalescing would merge the tiny partitions and muddy the assert
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = tuned.keys.map(k => k -> spark.conf.getOption(k)).toMap
    tuned.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val left = spark.range(0, 300000).select(
        when(col("id") < 250000, 0L).otherwise(col("id") % 50).as("k"),
        col("id").as("v"))
      val right = spark.range(0, 50).select(
        col("id").as("k"), (col("id") * 10).as("w"))
      val joined = left.join(right, "k")
      // execute THIS QueryExecution so the adaptive plan is final
      assert(joined.collect().length == 300000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("isFinalPlan=true"), plan)
      assert(plan.toLowerCase.contains("skew"),
        s"expected a skew-split shuffle read in the final plan:\n$plan")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}

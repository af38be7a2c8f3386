package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Canonical loaders for the driver-generated fixture tables
  * (`/root/testdata/sf*`; schemas in FIXTURES.md §B).
  *
  * Scale notes: these are plain columnar parquet scans — Catalyst pushes
  * filters/column pruning into the scan, so callers should NOT pre-select
  * or cache here. At 100 TB the same loaders work unchanged provided the
  * data lands partitioned (e.g. by date for `events`); nothing here
  * assumes single-file inputs.
  */
object Tables {

  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Load one fixture table from `sfDir`. */
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    name match {
      case "events" => events(spark, sfDir)
      case n        => spark.read.parquet(s"$sfDir/$n.parquet")
    }

  /** `events.parquet` stores TIMESTAMP(NANOS), which Spark 4.1.2 rejects
    * by default (PARQUET_TYPE_ILLEGAL). Read ns-as-long and truncate to
    * microseconds with exact integer arithmetic (`div`, not double `/`:
    * epoch-ns ≈ 1.7e18 exceeds a double's 53-bit exact-integer range).
    * FIXTURES.md verifies the declared queries are insensitive to the
    * ns→µs truncation.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/events.parquet")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

  /** Register every table as a temp view (SQL surface of the engine). */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}

package graft.sources

import graft.SparkSpec
import graft.testutil.Fixtures
import org.apache.spark.sql.functions._

class ZipGtfsSpec extends SparkSpec {
  import spark.implicits._

  test("zip_entries generates one row per member, skipping directories") {
    val bytes = Fixtures.zip(
      "GTFS/stops.txt" -> "stop_id,stop_name\nS1,A\n",
      "GTFS/routes.txt" -> "route_id\nR1\n")
    val rows = Seq(Tuple1(bytes)).toDF("content")
      .select(ZipFunctions.zip_entries($"content").as(Seq("entry_name", "bytes")))
      .collect()
    assert(rows.map(_.getString(0)).toSet == Set("GTFS/stops.txt", "GTFS/routes.txt"))
    val stops = new String(rows.find(_.getString(0).endsWith("stops.txt")).get
      .getAs[Array[Byte]]("bytes"), "UTF-8")
    assert(stops.startsWith("stop_id"))
  }

  test("zip_entries on null/garbage bytes yields no rows, no crash") {
    val df = Seq(Tuple1(Option.empty[Array[Byte]]), Tuple1(Some("nope".getBytes)))
      .toDF("content")
    val n = df.select(ZipFunctions.zip_entries($"content")).count()
    assert(n == 0)
  }

  test("stopsFromZip: BOM stripped, header parsed, short lines dropped") {
    val bytes = Fixtures.zip("feed/stops.txt" -> Fixtures.messyStops)
    val df = GtfsCsv.stopsFromZip(spark, bytes)
    assert(df.columns.contains("stop_id") && df.columns.contains("stop_lat"))
    assert(!df.columns.head.contains("﻿"))
    // 6 data lines minus the 1-char line (dropped) = 5 rows
    assert(df.count() == 5)
    assert(df.filter($"stop_id" === "S5").count() == 1)
  }
}

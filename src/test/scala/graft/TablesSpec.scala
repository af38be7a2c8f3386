package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Fixture-drift guard + loader property tests.
  *
  * Round 8 lost 12 declared queries because the driver regenerated
  * `events.parquet` with a different physical timestamp encoding and the
  * loader assumed the old one. These tests make the next regeneration a
  * seconds-fast red build instead of a silent round-level regression:
  *
  *  1. every fixture table at sf0.001 loads and has a non-empty schema;
  *  2. every declared query's plan RESOLVES against sf0.001 (analysis
  *     only — no execution, so the whole sweep stays cheap);
  *  3. `Tables.events` yields identical rows whether `ts` is stored as
  *     nanos-in-int64 or as TIMESTAMP(MICROS) NTZ (both historical
  *     fixture encodings), and refuses unknown encodings loudly.
  */
class TablesSpec extends SparkSpec {

  test("every fixture table loads from sf0.001 with a non-empty schema") {
    Tables.names.foreach { name =>
      val df = Tables.load(spark, sf001, name)
      assert(df.schema.fields.nonEmpty, s"$name: empty schema")
    }
  }

  test("events.ts loads as a session-TZ timestamp regardless of storage encoding") {
    val t = Tables.events(spark, sf001).schema("ts").dataType
    assert(t == TimestampType, s"events.ts resolved to $t, expected TimestampType")
  }

  test("every declared query's plan resolves against sf0.001 (analysis only)") {
    val failures = SparkEntry.queries.flatMap { case (name, fn) =>
      try { fn(spark, sf001).schema; None }
      catch { case e: Throwable =>
        Some(s"$name: ${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").linesIterator.take(1).mkString}")
      }
    }
    assert(failures.isEmpty, s"${failures.size} unresolvable queries:\n${failures.mkString("\n")}")
  }

  test("events loader is encoding-invariant: nanos-as-long and micros-NTZ agree") {
    import spark.implicits._
    // The same three instants, written under both historical encodings.
    val micros = Seq(0L, 1700000000123456L, -123456789000001L)
    val dir = Files.createTempDirectory("events_enc").toFile.getAbsolutePath

    val longDir = s"$dir/as_long"
    spark.createDataset(micros.map(_ * 1000L)).toDF("ts")
      .withColumn("event_id", monotonically_increasing_id())
      .write.parquet(s"$longDir/events.parquet")

    val ntzDir = s"$dir/as_ntz"
    spark.createDataset(micros).toDF("us")
      .withColumn("ts", timestamp_micros(col("us")).cast(TimestampNTZType))
      .withColumn("event_id", monotonically_increasing_id())
      .drop("us")
      .write.parquet(s"$ntzDir/events.parquet")

    val fromLong = Tables.events(spark, longDir)
      .select(unix_micros(col("ts"))).as[Long].collect().sorted
    val fromNtz = Tables.events(spark, ntzDir)
      .select(unix_micros(col("ts"))).as[Long].collect().sorted
    assert(fromLong.toSeq == micros.sorted,
      s"long-nanos branch: got ${fromLong.toSeq}, want ${micros.sorted}")
    assert(fromNtz.toSeq == micros.sorted,
      s"micros-NTZ branch: got ${fromNtz.toSeq}, want ${micros.sorted}")
  }

  test("events loader rejects an unknown ts encoding loudly") {
    import spark.implicits._
    val dir = Files.createTempDirectory("events_bad").toFile.getAbsolutePath
    spark.createDataset(Seq("not-a-timestamp")).toDF("ts")
      .write.parquet(s"$dir/events.parquet")
    val e = intercept[IllegalStateException](Tables.events(spark, dir))
    assert(e.getMessage.contains("unsupported type"))
  }
}

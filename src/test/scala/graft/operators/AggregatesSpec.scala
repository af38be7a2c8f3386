package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The salted two-phase agg is a pure plan rewrite — its contract is
  * bit-identity with the plain groupBy, including on skewed keys. */
class AggregatesSpec extends SparkSpec {
  import spark.implicits._

  test("saltedCountSum equals the plain groupBy bit-for-bit") {
    // one hot key (900 of 1000 rows) + a long tail; values with cents
    val rows = (0 until 1000).map { i =>
      val k = if (i < 900) 7L else (i % 50).toLong
      (i.toLong, k, i * 1.01)
    }.toDF("id", "k", "v")
    val salted = Aggregates.saltedCountSum(rows, "k", "v", "id", nSalts = 8)
      .select($"k", $"n", $"sum_val".cast("double"))
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    val plain = rows.groupBy($"k")
      .agg(count(lit(1)).as("n"),
        sum($"v".cast("decimal(18,2)")).cast("double").as("s"))
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    assert(salted.toSeq == plain.toSeq)
  }

  test("saltedCountSum splits the hot key across salts in phase 1") {
    val rows = (0 until 256).map(i => (i.toLong, 1L, 1.0)).toDF("id", "k", "v")
    // phase-1 group count for the single key must exceed 1 (the salt
    // actually partitions it), bounded by nSalts
    val phase1Groups = rows
      .withColumn("__salt", pmod(xxhash64($"id"), lit(8)))
      .groupBy($"k", $"__salt").count().count()
    assert(phase1Groups > 1 && phase1Groups <= 8)
  }
}

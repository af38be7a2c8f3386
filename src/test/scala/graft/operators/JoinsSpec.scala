package graft.operators

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.functions._

class JoinsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asOfBackward: latest at-or-before match, inclusive ties, null when none") {
    val quotes = Seq( // key, ts, px
      ("A", ts("2024-01-01 10:00:00"), 1.0),
      ("A", ts("2024-01-01 10:05:00"), 2.0),
      ("B", ts("2024-01-01 10:10:00"), 9.0)).toDF("sym", "qts", "px")
    val trades = Seq(
      ("A", ts("2024-01-01 10:03:00"), 100L), // between quotes → px 1.0
      ("A", ts("2024-01-01 10:05:00"), 101L), // exactly at quote → inclusive → 2.0
      ("B", ts("2024-01-01 10:00:00"), 102L), // before any quote → null
      ("C", ts("2024-01-01 12:00:00"), 103L)) // key with no quotes → null
      .toDF("sym", "tts", "trade_id")
    val r = Joins.asOfBackward(trades, quotes, "sym", "sym", "tts", "qts")
      .select($"trade_id", $"px").collect()
      .map(x => x.getLong(0) -> (if (x.isNullAt(1)) None else Some(x.getDouble(1)))).toMap
    assert(r(100L).contains(1.0))
    assert(r(101L).contains(2.0))
    assert(r(102L).isEmpty)
    assert(r(103L).isEmpty)
  }

  test("asOfBackward tie-break picks the max of the tie column") {
    val right = Seq(("k", ts("2024-01-01 00:00:00"), 1L),
                    ("k", ts("2024-01-01 00:00:00"), 7L),
                    ("k", ts("2024-01-01 00:00:00"), 3L)).toDF("k", "rts", "v")
    val left = Seq(("k", ts("2024-01-02 00:00:00"))).toDF("k", "lts")
    val r = Joins.asOfBackward(left, right, "k", "k", "lts", "rts",
      rightTieBreak = Seq("v")).select($"v").as[Long].head()
    assert(r == 7L)
  }

  test("asOfForward: earliest at-or-after match, inclusive ties, null when none") {
    val quotes = Seq(
      ("A", ts("2024-01-01 10:00:00"), 1.0),
      ("A", ts("2024-01-01 10:05:00"), 2.0),
      ("B", ts("2024-01-01 09:00:00"), 9.0)).toDF("sym", "qts", "px")
    val trades = Seq(
      ("A", ts("2024-01-01 09:55:00"), 100L), // before both → earliest = 1.0
      ("A", ts("2024-01-01 10:00:00"), 101L), // exactly at quote → inclusive → 1.0
      ("A", ts("2024-01-01 10:01:00"), 102L), // between → next quote 2.0
      ("B", ts("2024-01-01 10:00:00"), 103L), // after B's only quote → null
      ("C", ts("2024-01-01 12:00:00"), 104L)) // key with no quotes → null
      .toDF("sym", "tts", "trade_id")
    val r = Joins.asOfForward(trades, quotes, "sym", "sym", "tts", "qts")
      .select($"trade_id", $"px").collect()
      .map(x => x.getLong(0) -> (if (x.isNullAt(1)) None else Some(x.getDouble(1)))).toMap
    assert(r(100L).contains(1.0))
    assert(r(101L).contains(1.0))
    assert(r(102L).contains(2.0))
    assert(r(103L).isEmpty)
    assert(r(104L).isEmpty)
  }

  test("asOfForward tie-break picks the MIN of the tie column (mirror of backward)") {
    val right = Seq(("k", ts("2024-01-02 00:00:00"), 7L),
                    ("k", ts("2024-01-02 00:00:00"), 1L),
                    ("k", ts("2024-01-02 00:00:00"), 3L)).toDF("k", "rts", "v")
    val left = Seq(("k", ts("2024-01-01 00:00:00"))).toDF("k", "lts")
    val r = Joins.asOfForward(left, right, "k", "k", "lts", "rts",
      rightTieBreak = Seq("v")).select($"v").as[Long].head()
    assert(r == 1L)
  }

  test("blockedFuzzyJoin: edits found within a block, cross-block pairs are the recall trade") {
    val l = Seq("cold widget", "old widget", "cold bolt").toDF("name_a")
    val r = Seq("cold widget", "old widget", "gold widgets").toDF("name_b")
    val out = Joins.blockedFuzzyJoin(l, r, "name_a", "name_b", maxDist = 2,
        c => element_at(split(c, " "), -1))
      .as[(String, String, Int)].collect().toSet
    assert(out == Set(
      ("cold widget", "cold widget", 0),
      ("cold widget", "old widget", 1),
      ("old widget", "cold widget", 1),
      ("old widget", "old widget", 0)))
    // "gold widgets" is 2 edits from "old widget" but blocks under
    // "widgets" — never compared: the documented blocking recall trade
    assert(!out.exists(_._2 == "gold widgets"))
  }

  test("saltedEquiJoin equals the plain join") {
    val orders = spark.read.parquet(s"$sf001/orders.parquet")
      .select($"o_custkey".as("k"), $"o_orderkey")
    val cust = spark.read.parquet(s"$sf001/customer.parquet")
      .select($"c_custkey".as("k"), $"c_mktsegment")
    val salted = Joins.saltedEquiJoin(orders, cust, "k", 8)
      .select($"o_orderkey", $"c_mktsegment")
    val plain = orders.join(cust, "k").select($"o_orderkey", $"c_mktsegment")
    assert(salted.count() == plain.count())
    assert(salted.except(plain).count() == 0 && plain.except(salted).count() == 0)
  }

  test("binnedRangeJoin equals the naive range join") {
    val points = spark.read.parquet(s"$sf001/lineitem.parquet")
      .select($"l_shipdate").limit(500)
    val intervals = spark.read.parquet(s"$sf001/orders.parquet")
      .select($"o_orderdate".as("s"),
        ($"o_orderdate" + expr("INTERVAL 1 DAY")).as("e"), $"o_orderkey")
      .limit(200)
    val binned = Joins.binnedRangeJoin(points, intervals, "l_shipdate", "s", "e", 86400L)
    val naive = points.join(intervals,
      $"l_shipdate" >= $"s" && $"l_shipdate" < $"e")
    assert(binned.count() == naive.count())
    assert(binned.count() > 0)
  }

  test("blockedFuzzyJoin: the threshold-form distance is value-identical to the " +
      "plain levenshtein formulation (same pairs, same exact distances)") {
    import org.apache.spark.sql.functions.{element_at, levenshtein, split}
    val names = Seq("alpha tone", "alpho tone", "alpha stone", "beta tone",
      "gamma ray", "gamma raX", "delta wave").toDF("n")
    val threshold = Joins.blockedFuzzyJoin(
        names.select($"n".as("name_a")), names.select($"n".as("name_b")),
        "name_a", "name_b", maxDist = 2, c => element_at(split(c, " "), -1))
      .orderBy($"name_a", $"name_b")
      .as[(String, String, Int)].collect().toSeq
    val plain = names.select($"n".as("name_a")).withColumn("__blk",
        element_at(split($"name_a", " "), -1))
      .join(names.select($"n".as("name_b")).withColumn("__blk",
        element_at(split($"name_b", " "), -1)), "__blk")
      .withColumn("dist", levenshtein($"name_a", $"name_b"))
      .filter($"dist" <= 2).drop("__blk")
      .orderBy($"name_a", $"name_b")
      .as[(String, String, Int)].collect().toSeq
    assert(threshold == plain)
    assert(threshold.nonEmpty)
    // maxDist = 0 degenerates to exact equality, not an error
    val eq = Joins.blockedFuzzyJoin(
        names.select($"n".as("name_a")), names.select($"n".as("name_b")),
        "name_a", "name_b", maxDist = 0, c => element_at(split(c, " "), -1))
      .as[(String, String, Int)].collect().toSeq
    assert(eq.forall(t => t._1 == t._2 && t._3 == 0) && eq.size == names.count())
  }

  test("intervalOverlapJoin: one row per overlapping pair even across many " +
      "shared buckets; half-open ends touch without overlapping") {
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    val left = Seq(
      (1L, ts("2024-01-01 00:00:00"), ts("2024-01-01 05:00:00")), // 5 buckets
      (2L, ts("2024-01-01 06:00:00"), ts("2024-01-01 06:30:00")))
      .toDF("lid", "ls", "le")
    val right = Seq(
      // overlaps lid=1 across a bucket boundary → must emit ONCE
      (10L, ts("2024-01-01 00:59:00"), ts("2024-01-01 01:01:00")),
      // touches lid=2's start exactly → zero-length, excluded
      (20L, ts("2024-01-01 05:30:00"), ts("2024-01-01 06:00:00")))
      .toDF("rid", "rs", "re")
    val out = Joins.intervalOverlapJoin(left, right, "ls", "le", "rs", "re",
        binSeconds = 3600L)
      .select($"lid", $"rid", $"overlap_us")
      .as[(Long, Long, Long)].collect()
    assert(out.toSeq == Seq((1L, 10L, 120L * 1000000L)))
  }

  test("intervalOverlapJoin equals the naive theta join on fixture-shaped intervals") {
    val e = graft.Tables.load(spark, sf001, "events")
    val spans = e.groupBy($"user_id", to_date($"ts").as("day"))
      .agg(min($"ts").as("s"), max($"ts").as("e"))
    val storms = e.filter($"event_type" === "error")
      .groupBy(date_trunc("hour", $"ts").as("h"))
      .agg(count(lit(1)).as("n"))
      .filter($"n" >= 2)
      .withColumn("he", $"h" + expr("INTERVAL 1 HOUR"))
    val binned = Joins.intervalOverlapJoin(spans, storms, "s", "e", "h", "he", 3600L)
      .select($"user_id", $"day", $"h", $"overlap_us")
      .as[(Long, java.sql.Date, java.sql.Timestamp, Long)].collect().toSet
    val naive = spans.crossJoin(storms)
      .withColumn("o", least(unix_micros($"e"), unix_micros($"he")) -
        greatest(unix_micros($"s"), unix_micros($"h")))
      .filter($"o" > 0)
      .select($"user_id", $"day", $"h", $"o")
      .as[(Long, java.sql.Date, java.sql.Timestamp, Long)].collect().toSet
    assert(binned == naive)
    assert(binned.nonEmpty)
  }

  test("entityResolution: transitive chain beyond maxDist resolves to ONE entity; " +
      "singletons resolve to themselves") {
    import org.apache.spark.sql.functions.{element_at, split}
    // d(aaaa,aaab)=1, d(aaab,aabb)=1, but d(aaaa,aabb)=2 > maxDist=1:
    // only the closure (not pairwise match) puts all three together
    val names = Seq("aaaa x", "aaab x", "aabb x", "zzzz y").toDF("n")
    val out = Joins.entityResolution(names, "n", maxDist = 1,
        c => element_at(split(c, " "), -1))
      .orderBy($"name")
      .as[(String, String, Long)].collect()
    assert(out.toSeq == Seq(
      ("aaaa x", "aaaa x", 3L),
      ("aaab x", "aaaa x", 3L),
      ("aabb x", "aaaa x", 3L),
      ("zzzz y", "zzzz y", 1L)))
  }

  test("rankMatchedPairs: rank-to-rank within buckets, surplus dropped, other cohorts ignored") {
    val rows = Seq(
      (1L, 10L, "A"), (2L, 20L, "A"), (3L, 30L, "A"), // A surplus at rank 3
      (4L, 12L, "B"), (5L, 18L, "B"),
      (6L, 11L, "C")) // not a requested cohort: must not shift ranks
      .toDF("id", "v", "src")
    val out = Joins.rankMatchedPairs(rows, "id", "v", "src", "A", "B", buckets = 1)
      .orderBy($"pair_rank")
      .select($"bucket", $"pair_rank", $"id_a", $"val_a", $"id_b", $"val_b", $"gap")
      .as[(Int, Int, Long, Long, Long, Long, Long)].collect()
    assert(out.toSeq == Seq(
      (1, 1, 1L, 10L, 4L, 12L, 2L),
      (1, 2, 2L, 20L, 5L, 18L, 2L)))
  }

  test("rankMatchedPairs: the two-level subtiled rank is bit-identical to " +
    "the single-window form on heavy ties and uneven cohorts") {
    // 120 rows, fat tie groups (v = i % 7) and a 2:1 cohort imbalance —
    // subtile boundaries land INSIDE tie groups, the exact case the
    // offset + local-rank decomposition must get right
    val rows = (1L to 120L)
      .map(i => (i, i % 7, if (i % 3 == 0L) "B" else "A"))
      .toDF("id", "v", "src")
    def run(sub: Int) =
      Joins.rankMatchedPairs(rows, "id", "v", "src", "A", "B",
          buckets = 4, subtiles = sub)
        .orderBy($"bucket", $"pair_rank")
        .select($"bucket", $"pair_rank", $"id_a", $"id_b", $"gap")
        .as[(Int, Int, Long, Long, Long)].collect().toSeq
    val single = run(1)
    assert(single.nonEmpty)
    assert(run(8) == single)
    assert(run(5) == single) // subtiles not dividing group sizes
  }
}

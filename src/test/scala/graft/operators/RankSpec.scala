package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** [[Rank.withExactNtile]] must be BIT-IDENTICAL to
  * `ntile(t) OVER (ORDER BY v, id)` — the window it replaces in
  * x118/x124/x159 — including the +1-row leading buckets on
  * non-divisible counts, tie groups split by id across a bucket
  * boundary, and the degenerate n < t case. */
class RankSpec extends SparkSpec {
  import spark.implicits._

  private def windowTiles(rows: Seq[(Long, Long)], t: Int): Map[Long, Int] =
    rows.toDF("id", "v")
      .withColumn("tile", ntile(t).over(Window.orderBy(col("v"), col("id"))))
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap

  private def exactTiles(rows: Seq[(Long, Long)], t: Int): Map[Long, Int] =
    Rank.withExactNtile(rows.toDF("id", "v"), "v", "id", t, "tile")
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap

  test("hand-traced: 11 rows, 5 tiles — first bucket takes the extra row") {
    // values with a 4-way tie at v=7 straddling the tile-2/3 boundary
    val rows = Seq(1L -> 3L, 2L -> 7L, 3L -> 7L, 4L -> 1L, 5L -> 7L,
      6L -> 7L, 7L -> 9L, 8L -> 2L, 9L -> 5L, 10L -> 8L, 11L -> 4L)
    // order by (v, id): 4(1) 8(2) 1(3) 11(4) 9(5) | 2(7) 3(7) 5(7) 6(7) 10(8) 7(9)
    // ntile(5) over 11 rows: sizes 3,2,2,2,2 → ranks 1-3 tile1, 4-5 t2,
    // 6-7 t3, 8-9 t4, 10-11 t5 — the v=7 tie group (ranks 6..9) SPLITS
    // across tiles 3 and 4 by doc id: ids 2,3 → t3; ids 5,6 → t4.
    val got = exactTiles(rows, 5)
    assert(got == Map(4L -> 1, 8L -> 1, 1L -> 1, 11L -> 2, 9L -> 2,
      2L -> 3, 3L -> 3, 5L -> 4, 6L -> 4, 10L -> 5, 7L -> 5), got.toString)
    assert(got == windowTiles(rows, 5))
  }

  test("degenerate: fewer rows than tiles assigns 1..n like ntile") {
    val rows = Seq(10L -> 5L, 20L -> 5L, 30L -> 1L)
    val got = exactTiles(rows, 5)
    assert(got == Map(30L -> 1, 10L -> 2, 20L -> 3), got.toString)
    assert(got == windowTiles(rows, 5))
  }

  test("single tile and empty input") {
    assert(exactTiles(Seq(1L -> 1L, 2L -> 2L), 1).values.toSet == Set(1))
    assert(exactTiles(Seq.empty, 4).isEmpty)
  }

  test("property: matches the ntile window on adversarial tie shapes") {
    // heavy ties, all-equal, strictly increasing, and a divisible count
    val shapes = Seq(
      (1L to 40L).map(i => i -> (i % 3)),          // 3 fat tie groups
      (1L to 17L).map(i => i -> 0L),               // one global tie group
      (1L to 30L).map(i => i -> i),                // all distinct, n%t=0
      (1L to 23L).map(i => i -> (i / 7)))          // uneven groups
    for (rows <- shapes; t <- Seq(2, 5, 10))
      assert(exactTiles(rows, t) == windowTiles(rows, t), s"t=$t rows=$rows")
  }

  test("guard: null values raise_error instead of silently mis-tiling") {
    // pre-guard behavior: null boundary keys fell out of the equi-joins
    // and every null row collapsed into tile 1 — now the contract is
    // enforced in the plan (VERDICT r10 item 3 / ADVICE r10 medium)
    val rows = Seq((1L, Some(3L)), (2L, None), (3L, Some(1L)))
      .toDF("id", "v")
    val e = intercept[Exception] {
      Rank.withExactNtile(rows, "v", "id", 2, "tile").collect()
    }
    assert(e.getMessage.contains("contains nulls"), e.getMessage)
  }

  test("guard: distinct cardinality past maxDistinct raise_errors with " +
    "a quantize-first instruction (continuous-double adversary)") {
    // all-distinct doubles: the histogram IS the row frame — the exact
    // degradation the envelope exists to catch
    val rows = (1L to 500L).map(i => (i, i * 0.70000001)).toDF("id", "v")
    val e = intercept[Exception] {
      Rank.withExactNtile(rows, "v", "id", 10, "tile",
        maxDistinct = 100L).collect()
    }
    assert(e.getMessage.contains("histogram-collapse envelope"), e.getMessage)
    // the same frame under the envelope still matches the window form
    val got = Rank.withExactNtile(rows, "v", "id", 10, "tile",
        maxDistinct = 500L)
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    val want = rows
      .withColumn("tile", ntile(10).over(Window.orderBy(col("v"), col("id"))))
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(got == want)
  }

  // ---- grouped form: withExactNtileBy ------------------------------

  private def windowTilesBy(rows: Seq[(Long, String, Long)], t: Int): Map[Long, Int] =
    rows.toDF("id", "g", "v")
      .withColumn("tile", ntile(t).over(
        Window.partitionBy(col("g")).orderBy(col("v"), col("id"))))
      .collect().map(r => r.getLong(0) -> r.getInt(3)).toMap

  private def exactTilesBy(rows: Seq[(Long, String, Long)], t: Int): Map[Long, Int] =
    Rank.withExactNtileBy(rows.toDF("id", "g", "v"), "g", "v", "id", t, "tile")
      .collect().map(r => r.getLong(0) -> r.getInt(3)).toMap

  test("grouped: unequal group sizes match the per-group ntile window, " +
    "including a group with n < tiles") {
    // group a: 11 rows with the hand-traced tie shape; group b: 3 rows
    // (fewer than tiles=5 → tiles 1..3); group c: a single row (tile 1)
    val a = Seq(1L -> 3L, 2L -> 7L, 3L -> 7L, 4L -> 1L, 5L -> 7L,
      6L -> 7L, 7L -> 9L, 8L -> 2L, 9L -> 5L, 10L -> 8L, 11L -> 4L)
      .map { case (id, v) => (id, "a", v) }
    val b = Seq(101L -> 5L, 102L -> 5L, 103L -> 1L)
      .map { case (id, v) => (id, "b", v) }
    val c = Seq((201L, "c", 9L))
    val rows = a ++ b ++ c
    val got = exactTilesBy(rows, 5)
    assert(got == windowTilesBy(rows, 5), got.toString)
    // group a replays the global hand-trace (fill rule is per-group)
    assert(got(2L) == 3 && got(5L) == 4, got.toString)
    // group b degenerates to ranks 1..3; group c is tile 1
    assert(got(103L) == 1 && got(101L) == 2 && got(102L) == 3 && got(201L) == 1)
  }

  test("grouped property: matches the per-group window on adversarial " +
    "tie shapes across interleaved groups") {
    val shapes = Seq(
      // ties within and across groups, uneven sizes
      (1L to 60L).map(i => (i, "g" + (i % 4), i % 3)),
      // one group holds a single global tie set
      (1L to 20L).map(i => (i, if (i <= 17) "big" else "small", 0L)),
      // all-distinct values, group sizes divisible and not
      (1L to 45L).map(i => (i, "g" + (i % 2), i)))
    for (rows <- shapes; t <- Seq(2, 5, 8))
      assert(exactTilesBy(rows, t) == windowTilesBy(rows, t), s"t=$t")
  }

  test("grouped guards: null value, null group, and the cardinality " +
    "envelope all raise_error") {
    val nullV = Seq((1L, Some("a"), Some(3L)), (2L, Some("a"), None))
      .toDF("id", "g", "v")
    val e1 = intercept[Exception] {
      Rank.withExactNtileBy(nullV, "g", "v", "id", 2, "tile").collect()
    }
    assert(e1.getMessage.contains("contains nulls"), e1.getMessage)
    val nullG = Seq((1L, Option.empty[String], Some(3L)), (2L, Some("a"), Some(1L)))
      .toDF("id", "g", "v")
    val e2 = intercept[Exception] {
      Rank.withExactNtileBy(nullG, "g", "v", "id", 2, "tile").collect()
    }
    assert(e2.getMessage.contains("group column"), e2.getMessage)
    val wide = (1L to 300L).map(i => (i, "g" + (i % 2), i)).toDF("id", "g", "v")
    val e3 = intercept[Exception] {
      Rank.withExactNtileBy(wide, "g", "v", "id", 4, "tile",
        maxDistinct = 100L).collect()
    }
    assert(e3.getMessage.contains("histogram-collapse envelope"), e3.getMessage)
  }

  test("grouped plan: no window partitioned solely on the group key over " +
    "the raw row frame — histogram and tie-set windows only") {
    val df = Rank.withExactNtileBy(
      (1L to 200L).map(i => (i, "g" + (i % 3), i % 7)).toDF("id", "g", "v"),
      "g", "v", "id", 4, "tile")
    val inner = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val windows = inner.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.nonEmpty)
    windows.foreach { w =>
      assert(w.partitionSpec.nonEmpty, s"unpartitioned window: $w")
      val aggBelow = w.child.collect {
        case a: org.apache.spark.sql.execution.aggregate.HashAggregateExec => a
        case a: org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec => a
        case a: org.apache.spark.sql.execution.aggregate.SortAggregateExec => a
      }
      // either the cumulative window over the (group, value) HISTOGRAM
      // (an aggregation sits below), or the boundary row_number whose
      // partition spec includes the VALUE column — each partition is
      // one (group, value) tie set, never a whole group
      assert(aggBelow.nonEmpty || w.partitionSpec.size >= 2,
        s"window sorts a whole raw group in one task: $w")
    }
  }

  // ---- grouped prefix sums: withGroupedPrefixSums -------------------

  test("grouped prefix sums: running sum and row_number match the window " +
    "form with groups spanning partitions, at several partition counts") {
    // 3 groups of very different sizes, weights with nulls, and a
    // descending order key — forced through 1, 2, 3, and 7 range
    // partitions so group slices straddle every boundary shape
    val rows = ((1L to 40L).map(i => ("big", i, Some(i % 5 + 1L))) ++
      (101L to 106L).map(i => ("mid", i, if (i % 2 == 0) None else Some(3L))) ++
      Seq(("one", 201L, Some(7L))))
      .map { case (gp, id, w) => (gp, id, w, 1L) }
      .toDF("g", "id", "w", "one")
    val wWin = Window.partitionBy(col("g")).orderBy(col("id").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val expected = rows
      .withColumn("cum", sum(col("w")).over(wWin).cast("long"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("g")).orderBy(col("id").desc)).cast("long"))
      .select(col("g"), col("id"), col("cum"), col("rk"))
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (if (r.isNullAt(2)) null else r.getLong(2), r.getLong(3))).toMap
    for (p <- Seq(1, 2, 3, 7)) {
      val got = Rank.withGroupedPrefixSums(rows, "g",
          Seq(col("id").desc), Seq("w" -> "cum", "one" -> "rk"),
          numPartitions = Some(p))
        .select(col("g"), col("id"), col("cum"), col("rk"))
        .collect().map(r => (r.getString(0), r.getLong(1)) ->
          (if (r.isNullAt(2)) null else r.getLong(2), r.getLong(3))).toMap
      assert(got == expected, s"p=$p")
    }
  }

  test("grouped prefix sums: null-weight runs straddling partition cuts " +
    "keep window null semantics (null only before ANY non-null weight)") {
    // ascending order: ids 1..10 carry weights, 11..30 are null — at
    // p=6 the later slices hold ONLY nulls, so their local sums are
    // null and the global value must fall back to the earlier-
    // partition offset (the coalesce-and-add form returned null here);
    // group "lead" starts with nulls: those rows must stay null
    val rows = ((1L to 30L).map(i =>
        ("nb", i, if (i <= 10) Some(i) else None)) ++
      (1L to 12L).map(i => ("lead", 100L + i, if (i <= 4) None else Some(2L))))
      .toDF("g", "id", "w")
    val wWin = Window.partitionBy(col("g")).orderBy(col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val expected = rows.withColumn("cum", sum(col("w")).over(wWin).cast("long"))
      .select(col("g"), col("id"), col("cum"))
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (if (r.isNullAt(2)) null else r.getLong(2))).toMap
    for (p <- Seq(2, 6, 11)) {
      val got = Rank.withGroupedPrefixSums(rows, "g", Seq(col("id")),
          Seq("w" -> "cum"), numPartitions = Some(p))
        .select(col("g"), col("id"), col("cum"))
        .collect().map(r => (r.getString(0), r.getLong(1)) ->
          (if (r.isNullAt(2)) null else r.getLong(2))).toMap
      assert(got == expected, s"p=$p")
    }
  }

  test("grouped prefix sums: a double group key holding -0.0/0.0 or NaN " +
    "rows groups like SQL (neither signed zeros nor NaN may reset the " +
    "local accumulator)") {
    // SQL groupBy/join normalize -0.0 to 0.0 and merge all NaNs; on the
    // JVM, Scala == on boxed doubles splits NaN from itself and
    // Objects.equals splits the signed zeros — this pins that the local
    // pass matches SQL on both. Mixed zero signs interleave in the
    // order key so -0.0 rows sort before and between the +0.0 rows.
    val rows = Seq((-0.0, 1L, 10L), (0.0, 2L, 20L), (-0.0, 3L, 30L),
        (0.0, 4L, 40L), (1.5, 5L, 100L), (Double.NaN, 6L, 7L),
        (Double.NaN, 7L, 8L))
      .toDF("g", "id", "w")
    val wWin = Window.partitionBy(col("g")).orderBy(col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val expected = rows.withColumn("cum", sum(col("w")).over(wWin).cast("long"))
      .select(col("id"), col("cum"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // sanity: the window form itself merged the zero group
    assert(expected(4L) == 100L, "window form should see one zero group")
    for (p <- Seq(1, 3, 5)) {
      val got = Rank.withGroupedPrefixSums(rows, "g", Seq(col("id")),
          Seq("w" -> "cum"), numPartitions = Some(p))
        .select(col("id"), col("cum"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expected, s"p=$p")
    }
  }

  test("grouped prefix sums plan: no window partitioned on the group key " +
    "alone — local windows carry the partition id, offsets ride an " +
    "aggregated frame") {
    val rows = (1L to 200L).map(i => ("g" + (i % 3), i, 1L))
      .toDF("g", "id", "one")
    val df = Rank.withGroupedPrefixSums(rows, "g", Seq(col("id")),
      Seq("one" -> "rk"))
    val inner = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val windows = inner.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.nonEmpty)
    windows.foreach { w =>
      val aggBelow = w.child.collect {
        case a: org.apache.spark.sql.execution.aggregate.BaseAggregateExec => a
      }
      // either the offset window over the P×groups totals frame, or
      // the local window partitioned by (partition id, group)
      assert(aggBelow.nonEmpty || w.partitionSpec.size >= 2,
        s"window over a whole raw group: $w")
    }
  }

  test("plan: no unpartitioned window over the row frame (histogram only)") {
    val df = Rank.withExactNtile(
      (1L to 100L).map(i => i -> (i % 5)).toDF("id", "v"), "v", "id", 4, "tile")
    val inner = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val windows = inner.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.nonEmpty)
    windows.filter(_.partitionSpec.isEmpty).foreach { w =>
      // the only global window runs over the value histogram: its
      // child subtree must contain an aggregation (collapsed frame)
      val aggBelow = w.child.collect {
        case a: org.apache.spark.sql.execution.aggregate.HashAggregateExec => a
        case a: org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec => a
        case a: org.apache.spark.sql.execution.aggregate.SortAggregateExec => a
      }
      assert(aggBelow.nonEmpty, s"global window over non-aggregated input: $w")
    }
  }
}

package graft.operators

import graft.SparkSpec
import java.sql.Timestamp

/** Unit semantics for ordered-sequence analytics: event-time ordering
  * with tie-breaks, subsequence-prefix depth, and group isolation. */
class SequencesSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("funnel: deepest prefix per user-day, order by (ts, tie)") {
    val events = Seq(
      // user 1, one day: view → click → purchase in ts order → depth 3
      (1L, ts("2024-01-01 10:00:00"), 1L, "view"),
      (1L, ts("2024-01-01 11:00:00"), 2L, "click"),
      (1L, ts("2024-01-01 12:00:00"), 3L, "purchase"),
      // user 2: purchase BEFORE view/click — only view matches → 1
      (2L, ts("2024-01-01 09:00:00"), 4L, "purchase"),
      (2L, ts("2024-01-01 10:00:00"), 5L, "view"),
      // user 3: no view at all → depth 0
      (3L, ts("2024-01-01 10:00:00"), 6L, "click"),
      // user 4: view+click same ts — event_id tie-break orders view first → 2
      (4L, ts("2024-01-01 10:00:00"), 7L, "view"),
      (4L, ts("2024-01-01 10:00:00"), 8L, "click"),
      // user 1 again on ANOTHER day: day split isolates it → view only → 1
      (1L, ts("2024-01-02 10:00:00"), 9L, "view"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val out = Sequences.funnel(events, Seq("view", "click", "purchase"))
      .orderBy("funnel_stage")
      .as[(Int, Long)].collect()
    assert(out.toSeq == Seq((0, 1L), (1, 2L), (2, 1L), (3, 1L)))
  }

  test("funnel: tie-break flips depth when ids reverse the same-ts order") {
    val events = Seq(
      (4L, ts("2024-01-01 10:00:00"), 8L, "view"),
      (4L, ts("2024-01-01 10:00:00"), 7L, "click"))
      .toDF("user_id", "ts", "event_id", "event_type")
    // click (id 7) sorts before view (id 8) → sequence "click,view" → depth 1
    val out = Sequences.funnel(events, Seq("view", "click", "purchase"))
      .as[(Int, Long)].collect()
    assert(out.toSeq == Seq((1, 1L)))
  }

  test("funnel: stages match whole items only, and regex metachars are literal") {
    val events = Seq(
      // "preview" must NOT satisfy the "view" stage
      (1L, ts("2024-01-01 10:00:00"), 1L, "preview"),
      // stage with a regex metachar is matched literally
      (2L, ts("2024-01-01 10:00:00"), 2L, "add+pay"),
      (2L, ts("2024-01-01 11:00:00"), 3L, "view"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val out = Sequences.funnel(events, Seq("add+pay", "view"))
      .orderBy("funnel_stage").as[(Int, Long)].collect()
    // user 1: neither stage → 0; user 2: add+pay then view → 2
    assert(out.toSeq == Seq((0, 1L), (2, 1L)))
  }

  test("subsequenceRegex anchors items and rejects comma-bearing stages") {
    val r2 = Sequences.subsequenceRegex(Seq("view", "click"))
    assert("view,x,click".matches(s".*$r2.*"))
    assert(!"preview,click".matches(s".*$r2.*"))
    assert(!"view".matches(s".*$r2.*"))
    intercept[IllegalArgumentException] {
      Sequences.subsequenceRegex(Seq("a,b"))
    }
  }

  test("validityIntervals: chained [from, to) per key, open tail, tie by id") {
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "a"),
      (1L, ts("2024-01-01 10:00:10"), 2L, "b"),
      // same ts as event 2 — id orders it after, so it closes b's interval
      (1L, ts("2024-01-01 10:00:10"), 3L, "c"),
      (2L, ts("2024-01-01 09:00:00"), 4L, "z"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val out = Sequences.validityIntervals(events, "user_id", "ts", "event_id", "event_type")
      .orderBy("user_id", "valid_from_s", "event_id")
      .as[(Long, Long, String, Long, Option[Long])].collect()
    val t0 = ts("2024-01-01 10:00:00").getTime / 1000
    val t1 = t0 + 10
    val z0 = ts("2024-01-01 09:00:00").getTime / 1000
    assert(out.toSeq == Seq(
      (1L, 1L, "a", t0, Some(t1)),
      (1L, 2L, "b", t1, Some(t1)), // zero-length: superseded same second
      (1L, 3L, "c", t1, None),     // current state, open interval
      (2L, 4L, "z", z0, None)))
  }

  test("orderedTypeSequence emits one row per key with the joined sequence") {
    val events = Seq(
      (1L, ts("2024-01-01 10:00:02"), 1L, "b"),
      (1L, ts("2024-01-01 10:00:01"), 2L, "a"),
      (2L, ts("2024-01-01 10:00:00"), 3L, "c"))
      .toDF("user_id", "ts", "event_id", "event_type")
    import org.apache.spark.sql.functions.col
    val out = Sequences.orderedTypeSequence(events, Seq(col("user_id")),
        col("ts"), col("event_id"), col("event_type"))
      .orderBy("user_id").as[(Long, String)].collect()
    assert(out.toSeq == Seq((1L, "a,b"), (2L, "c")))
  }

  test("transitionMatrix: within-key pairs only, tie-broken order, exact integer probabilities") {
    val events = Seq(
      // user 1: a → b → c, with the a/b pair sharing a timestamp
      // (event_id orders a first)
      (1L, ts("2024-01-01 10:00:00"), 1L, "a"),
      (1L, ts("2024-01-01 10:00:00"), 2L, "b"),
      (1L, ts("2024-01-01 10:01:00"), 3L, "c"),
      // user 2: a → c; no cross-user (c, a) transition may appear
      (2L, ts("2024-01-01 09:00:00"), 4L, "a"),
      (2L, ts("2024-01-01 09:01:00"), 5L, "c"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val out = Sequences.transitionMatrix(events)
      .orderBy("prev_type", "next_type")
      .as[(String, String, Long, Long)].collect()
    // from a: b (1) and c (1) → 500000 each; from b: c (1) → 1000000
    assert(out.toSeq == Seq(
      ("a", "b", 1L, 500000L),
      ("a", "c", 1L, 500000L),
      ("b", "c", 1L, 1000000L)))
  }

  test("sessionTranscripts: gap split, tie-broken path order, exact decimal sums") {
    val events = Seq(
      // user 1, session 1: three events inside the hour; the first two
      // share a timestamp — event_id must order "a" before "b"
      (1L, ts("2024-01-01 10:00:00"), 1L, "a", 0.10),
      (1L, ts("2024-01-01 10:00:00"), 2L, "b", 0.20),
      (1L, ts("2024-01-01 10:59:59"), 3L, "c", 0.30),
      // gap of exactly 1h from the previous event is NOT a new session
      (1L, ts("2024-01-01 11:59:59"), 4L, "d", 0.40),
      // > 1h gap → session 2
      (1L, ts("2024-01-01 13:00:00"), 5L, "e", 0.50),
      // user 2: single event
      (2L, ts("2024-01-01 09:00:00"), 6L, "z", 9.99))
      .toDF("user_id", "ts", "event_id", "event_type", "value")
    val out = Sequences.sessionTranscripts(events)
      .orderBy("user_id", "session_id")
      .as[(Long, Long, Long, String, Double)].collect()
    assert(out.toSeq == Seq(
      (1L, 1L, 4L, "a->b->c->d", 1.00),
      (1L, 2L, 1L, "e", 0.50),
      (2L, 1L, 1L, "z", 9.99)))
  }

  test("retentionCohorts: Monday cohorts, distinct actives, micro-unit rate") {
    // 2024-01-01 is a Monday. Cohort 01-01: users 1 (twice in week 0 —
    // must count once) and 2; only user 1 returns in weeks 1 and 2
    // (01-17 is a Wednesday → its week starts 01-15, offset 2).
    // Cohort 01-08: user 3, active its first week only.
    val events = Seq(
      (1L, ts("2024-01-02 10:00:00")),
      (1L, ts("2024-01-03 11:00:00")),
      (1L, ts("2024-01-09 10:00:00")),
      (1L, ts("2024-01-17 10:00:00")),
      (2L, ts("2024-01-04 10:00:00")),
      (3L, ts("2024-01-10 10:00:00")))
      .toDF("user_id", "ts")
    val out = Sequences.retentionCohorts(events)
      .orderBy("cohort_week", "week_offset")
      .as[(java.sql.Date, Long, Long, Long, Long)].collect()
    val d = (s: String) => java.sql.Date.valueOf(s)
    assert(out.toSeq == Seq(
      (d("2024-01-01"), 0L, 2L, 2L, 1000000L),
      (d("2024-01-01"), 1L, 1L, 2L, 500000L),
      (d("2024-01-01"), 2L, 1L, 2L, 500000L),
      (d("2024-01-08"), 0L, 1L, 1L, 1000000L)))
  }

  test("rollingActiveUsers: exact DAU/WAU, calendar window edges, same-day dedup") {
    // day 01: users 1 (twice — dedup), 2   day 02: 1
    // day 05: 3                            day 10: 1
    // WAU(d) = distinct users over the trailing 7 CALENDAR days:
    //   01-10's window is (01-03, 01-10] → sees only 01-05 and 01-10
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00")), (1L, ts("2024-01-01 11:00:00")),
      (2L, ts("2024-01-01 12:00:00")),
      (1L, ts("2024-01-02 10:00:00")),
      (3L, ts("2024-01-05 10:00:00")),
      (1L, ts("2024-01-10 10:00:00")))
      .toDF("user_id", "ts")
    val out = Sequences.rollingActiveUsers(events)
      .orderBy("day")
      .as[(java.sql.Date, Long, Long, Long)].collect()
    val d = (s: String) => java.sql.Date.valueOf(s)
    assert(out.toSeq == Seq(
      (d("2024-01-01"), 2L, 2L, 1000000L),
      (d("2024-01-02"), 1L, 2L, 500000L),
      (d("2024-01-05"), 1L, 3L, 333333L),
      (d("2024-01-10"), 1L, 2L, 500000L)))
  }

  test("timeToConvert: first view to earliest at-or-after purchase, " +
    "pre-view purchases ignored, non-converters kept") {
    val base = 1704103200L // 2024-01-01 10:00:00 UTC epoch seconds
    def t(offset: Long) = new Timestamp((base + offset) * 1000L)
    val events = Seq(
      // user 1: purchase BEFORE the first view must not count; the
      // one 90 s after it must
      (1L, t(0), 1L, "purchase"),
      (1L, t(10), 2L, "view"),
      (1L, t(100), 3L, "purchase"),
      (1L, t(200), 4L, "purchase"), // later purchase ignored
      // user 2: views but never converts → null delta row
      (2L, t(0), 5L, "view"),
      // user 3: same-instant conversion → delta 0 (inclusive contract)
      (3L, t(50), 6L, "view"),
      (3L, t(50), 7L, "purchase"),
      // user 4: never views → absent
      (4L, t(0), 8L, "click"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val out = Sequences.timeToConvert(events, "view", "purchase")
      .orderBy("user_id")
      .as[(Long, Long, Option[Long], Option[Long])].collect()
    assert(out.toSeq == Seq(
      (1L, base + 10, Some(base + 100), Some(90L)),
      (2L, base, None, None),
      (3L, base + 50, Some(base + 50), Some(0L))))
  }

  test("basketPairs: hand-traced support and lift, duplicates collapse into baskets") {
    // baskets: u1/day1 {view, click, purchase} (click twice — dedup),
    //          u2/day1 {view, click}, u1/day2 {view} → N = 3
    // singles: view 3, click 2, purchase 1
    // lift(click,view) = 2·3/(2·3) = 1.0; (click,purchase) = 1·3/(2·1);
    // (purchase,view) = 1·3/(1·3)
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00"), "view"),
      (1L, ts("2024-01-01 11:00:00"), "click"),
      (1L, ts("2024-01-01 11:30:00"), "click"),
      (1L, ts("2024-01-01 12:00:00"), "purchase"),
      (2L, ts("2024-01-01 09:00:00"), "view"),
      (2L, ts("2024-01-01 09:30:00"), "click"),
      (1L, ts("2024-01-02 10:00:00"), "view"))
      .toDF("user_id", "ts", "event_type")
    val out = Sequences.basketPairs(events)
      .orderBy("type_a", "type_b")
      .as[(String, String, Long, Long, Long, Long, Long)].collect()
    assert(out.toSeq == Seq(
      ("click", "purchase", 1L, 2L, 1L, 3L, 1500000L),
      ("click", "view", 2L, 2L, 3L, 3L, 1000000L),
      ("purchase", "view", 1L, 1L, 3L, 3L, 1000000L)))
  }

  test("hourlyBaselineDeviation: hand-traced baseline and spike flag") {
    // hour 10 over 2 days: counts 1 and 3 → tot 4, base = 4e6/2 = 2e6
    //   day1 ratio = 1·2·1e6/4 = 500000; day2 ratio = 3·2·1e6/4 =
    //   1500000 — neither ≥ 2× baseline
    // hour 3: only day2, count 4 → tot 4, base 2e6, ratio = 4·2e6/4 =
    //   2e6 → spike (quiet-hour burst invisible to a global threshold)
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00")),
      (2L, ts("2024-01-02 10:10:00")), (3L, ts("2024-01-02 10:20:00")),
      (4L, ts("2024-01-02 10:30:00")),
      (5L, ts("2024-01-02 03:00:00")), (6L, ts("2024-01-02 03:10:00")),
      (7L, ts("2024-01-02 03:20:00")), (8L, ts("2024-01-02 03:30:00")))
      .toDF("event_id", "ts")
    val out = Sequences.hourlyBaselineDeviation(events)
      .orderBy("day", "hr")
      .as[(java.sql.Date, Int, Long, Long, Long, Boolean)].collect()
    val d = (s: String) => java.sql.Date.valueOf(s)
    assert(out.toSeq == Seq(
      (d("2024-01-01"), 10, 1L, 2000000L, 500000L, false),
      (d("2024-01-02"), 3, 4L, 2000000L, 2000000L, true),
      (d("2024-01-02"), 10, 3L, 2000000L, 1500000L, false)))
  }

  test("growthAccounting: new/retained/resurrected/churned reconcile week over week") {
    // u1: W1, W2, then skips W3 and returns W4 (resurrected)
    // u2: W1 only (churns into W2);  u3: first W2, retained W3
    val events = Seq(
      (1L, ts("2024-01-02 10:00:00")), (1L, ts("2024-01-09 10:00:00")),
      (1L, ts("2024-01-23 10:00:00")),
      (2L, ts("2024-01-03 10:00:00")),
      (3L, ts("2024-01-10 10:00:00")), (3L, ts("2024-01-16 10:00:00")))
      .toDF("user_id", "ts")
    val out = Sequences.growthAccounting(events)
      .orderBy("week")
      .as[(java.sql.Date, Long, Long, Long, Long, Long)].collect()
    val d = (s: String) => java.sql.Date.valueOf(s)
    assert(out.toSeq == Seq(
      (d("2024-01-01"), 2L, 2L, 0L, 0L, 0L),
      (d("2024-01-08"), 2L, 1L, 1L, 0L, 1L),
      (d("2024-01-15"), 1L, 0L, 1L, 0L, 1L),
      (d("2024-01-22"), 1L, 0L, 0L, 1L, 1L)))
    // the accounting identity: actives = new + retained + resurrected
    out.foreach { case (_, a, n, r, rs, _) => assert(a == n + r + rs) }
  }

  test("retentionCohorts: week 0 is always fully retained") {
    // every user's first event lands in their own offset-0 week, so the
    // offset-0 row of every cohort must read retention_micro = 10⁶
    val events = Seq(
      (1L, ts("2024-02-06 00:00:00")), (2L, ts("2024-02-07 23:59:59")),
      (3L, ts("2024-02-14 12:00:00")))
      .toDF("user_id", "ts")
    val zero = Sequences.retentionCohorts(events)
      .filter("week_offset = 0")
      .select("retention_micro").as[Long].collect()
    assert(zero.nonEmpty && zero.forall(_ == 1000000L))
  }

  test("calendarSpine: silent days materialize as zero rows and the rolling sum sees them") {
    val events = Seq(
      (1L, ts("2024-03-01 10:00:00")), (2L, ts("2024-03-01 11:00:00")),
      (3L, ts("2024-03-03 09:00:00")))
      .toDF("user_id", "ts")
    val out = Sequences.calendarSpine(events)
      .orderBy($"day")
      .select($"day".cast("string"), $"n", $"n_roll", $"is_gap")
      .as[(String, Long, Long, Boolean)].collect()
    assert(out.toSeq == Seq(
      ("2024-03-01", 2L, 2L, false),
      ("2024-03-02", 0L, 2L, true), // the day a groupBy would not emit
      ("2024-03-03", 1L, 3L, false)))
  }

  test("calendarSpine: a window narrower than the gap forgets the old burst") {
    val events = Seq(
      (1L, ts("2024-03-01 10:00:00")),
      (2L, ts("2024-03-05 10:00:00")))
      .toDF("user_id", "ts")
    val out = Sequences.calendarSpine(events, windowDays = 2)
      .orderBy($"day")
      .select($"day".cast("string"), $"n_roll")
      .as[(String, Long)].collect()
    assert(out.toSeq == Seq(
      ("2024-03-01", 1L), ("2024-03-02", 1L), ("2024-03-03", 0L),
      ("2024-03-04", 0L), ("2024-03-05", 1L)))
  }

  test("dailyStreaks: islands split on the missing day; latest is the newest island's length") {
    val events = Seq(
      // user 1: days 1,2,3 then 7,8 → streaks 3 and 2
      (1L, ts("2024-01-01 10:00:00")), (1L, ts("2024-01-02 10:00:00")),
      (1L, ts("2024-01-03 10:00:00")), (1L, ts("2024-01-07 10:00:00")),
      (1L, ts("2024-01-08 10:00:00")),
      // duplicate events in one day must not inflate the streak
      (1L, ts("2024-01-08 23:00:00")),
      // user 2: a single day
      (2L, ts("2024-01-05 12:00:00")))
      .toDF("user_id", "ts")
    val out = Sequences.dailyStreaks(events)
      .orderBy($"user_id")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(out.toSeq == Seq(
      (1L, 5L, 2L, 3L, 2L), // 5 active days, 2 streaks, longest 3, latest 2
      (2L, 1L, 1L, 1L, 1L)))
  }

  test("weeklyTrend: hand-traced OLS over the dense week grid — a silent week " +
      "pulls the fit down; a type absent later trends negative") {
    val events = Seq(
      // type a: weeks 0 and 2 active, week 1 SILENT → y = (2, 0, 4)
      ("a", ts("2024-01-01 10:00:00")), ("a", ts("2024-01-02 10:00:00")),
      ("a", ts("2024-01-15 10:00:00")), ("a", ts("2024-01-16 10:00:00")),
      ("a", ts("2024-01-17 10:00:00")), ("a", ts("2024-01-18 10:00:00")),
      // type b: week 0 only → y = (1, 0, 0), a dying type
      ("b", ts("2024-01-03 10:00:00")))
      .toDF("event_type", "ts")
    val out = Sequences.weeklyTrend(events)
      .orderBy($"event_type")
      .as[(String, Long, Long, Long, Option[Long])].collect()
    // a: n=3, Σx=3, Σy=6, Σxy=8, Σx²=5 → slope=(24−18)/(15−9)=1 → 10⁶
    // b: Σxy=0 → slope=(0−3)/6 = −0.5 → −500000
    assert(out.toSeq == Seq(
      ("a", 3L, 6L, 2000000L, Some(1000000L)),
      ("b", 3L, 1L, 333333L, Some(-500000L))))
  }

  test("rfm: exact cents, global anchor, deterministic quintile tiles") {
    val events = Seq(
      (1L, ts("2024-01-10 09:00:00"), 10.00),
      (2L, ts("2024-01-08 09:00:00"), 1.50),
      (2L, ts("2024-01-08 10:00:00"), 2.50),
      (3L, ts("2024-01-06 09:00:00"), 0.10),
      (3L, ts("2024-01-10 11:00:00"), 0.20))
      .toDF("user_id", "ts", "value")
    val out = Sequences.rfm(events)
      .orderBy($"user_id")
      .as[(Long, Long, Long, Long, Int, Int, Int, String)].collect()
    // anchor 01-10; ntile(5) over 3 rows → tiles 1,2,3 in order
    assert(out.toSeq == Seq(
      (1L, 0L, 1L, 1000L, 2, 1, 3, "213"),
      (2L, 2L, 2L, 400L, 1, 2, 2, "122"),
      (3L, 0L, 2L, 30L, 3, 3, 1, "331")))
  }

  test("rfm: null-ts/null-value events are not scoreable — an all-null " +
    "user drops out instead of tripping the quintile null guard") {
    // ADVICE r11 (medium): pre-fix, user 9's all-null events produced
    // null monetary_cents/recency_days, which withExactNtile
    // raise_errors on; the pre-filter (mirrored by the oracle's
    // IS NOT NULL) keeps null metrics out of the tiles entirely
    val events = Seq(
      (1L, Some(ts("2024-01-10 09:00:00")), Some(10.00)),
      (2L, Some(ts("2024-01-08 09:00:00")), Some(1.50)),
      (9L, None, None),
      (9L, Option.empty[java.sql.Timestamp], Option.empty[Double]))
      .toDF("user_id", "ts", "value")
    val out = Sequences.rfm(events).orderBy($"user_id")
      .select($"user_id").as[Long].collect()
    assert(out.toSeq == Seq(1L, 2L)) // user 9 gone, no raise_error
    // a PARTIALLY-null user keeps only the scoreable rows
    val mixed = Seq(
      (1L, Some(ts("2024-01-10 09:00:00")), Some(10.00)),
      (1L, None, Some(99.0)),
      (2L, Some(ts("2024-01-08 09:00:00")), Some(1.50)))
      .toDF("user_id", "ts", "value")
    val m = Sequences.rfm(mixed).orderBy($"user_id")
      .select($"user_id", $"frequency", $"monetary_cents")
      .as[(Long, Long, Long)].collect()
    assert(m.toSeq == Seq((1L, 1L, 1000L), (2L, 1L, 150L)))
  }

  test("conversionAttribution: first view / latest click at-or-before each " +
      "purchase; later touches and touch-less purchases stay out") {
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "view"),
      (1L, ts("2024-01-01 10:01:00"), 2L, "click"),
      (1L, ts("2024-01-01 10:02:00"), 3L, "purchase"),
      (1L, ts("2024-01-01 10:04:00"), 4L, "click"),
      (1L, ts("2024-01-01 10:05:00"), 5L, "purchase"),
      // u2: purchase with no prior touch at all → nulls
      (2L, ts("2024-01-01 12:00:00"), 6L, "purchase"),
      // u3: the click comes AFTER the purchase — must not attribute
      (3L, ts("2024-01-01 13:00:00"), 7L, "purchase"),
      (3L, ts("2024-01-01 13:01:00"), 8L, "click"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val out = Sequences.conversionAttribution(events)
      .orderBy($"user_id", $"purchase_id")
      .select($"user_id", $"purchase_id", $"first_view_id",
        $"view_to_buy_secs", $"last_click_id", $"click_to_buy_secs")
      .as[(Long, Long, Option[Long], Option[Long], Option[Long], Option[Long])]
      .collect()
    assert(out.toSeq == Seq(
      (1L, 3L, Some(1L), Some(120L), Some(2L), Some(60L)),
      (1L, 5L, Some(1L), Some(300L), Some(4L), Some(60L)),
      (2L, 6L, None, None, None, None),
      (3L, 7L, None, None, None, None)))
  }

  test("kaplanMeier: hand-traced risk sets, censoring at the horizon, " +
      "pre-signup purchases excluded, micro-nat log survival") {
    val events = Seq(
      // A: signup day 0, converts exactly 2 days later → event day 2
      (100L, ts("2024-01-01 00:00:00"), 10L, "signup"),
      (100L, ts("2024-01-03 00:00:00"), 11L, "purchase"),
      // B: signup day 0, never converts → censored at the horizon (day 4)
      (101L, ts("2024-01-01 00:00:00"), 12L, "signup"),
      // C: signup Jan 2, converts 1.5 days later → floor → event day 1
      (102L, ts("2024-01-02 00:00:00"), 13L, "signup"),
      (102L, ts("2024-01-03 12:00:00"), 14L, "purchase"),
      // D: signup Jan 4, never converts → censored day 1
      (103L, ts("2024-01-04 00:00:00"), 15L, "signup"),
      // E: purchase BEFORE signup — must not count as a conversion
      (104L, ts("2024-01-02 00:00:00"), 16L, "purchase"),
      (104L, ts("2024-01-03 00:00:00"), 17L, "signup"),
      // horizon: the corpus max ts (a non-cohort event type)
      (101L, ts("2024-01-05 00:00:00"), 18L, "view"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val out = Sequences.kaplanMeier(events)
      .as[(Long, Long, Long, Long, Option[Long])].collect()
    // N = 5. Day 1: risk 5, 1 event (C), 1 censor (D) → ln(4/5) = −223144.
    // Day 2: risk 3 (A, B, E left), 1 event (A), 1 censor (E)
    //   → + ln(2/3) = −405465 → cum −628609. B censors day 4 (no row).
    assert(out.toSeq == Seq(
      (1L, 5L, 1L, 1L, Some(-223144L)),
      (2L, 3L, 1L, 1L, Some(-628609L))))
  }

  test("kaplanMeier: survival is NULL from the day the risk set exhausts") {
    val events = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, "signup"),
      (1L, ts("2024-01-01 06:00:00"), 2L, "purchase"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val out = Sequences.kaplanMeier(events)
      .as[(Long, Long, Long, Long, Option[Long])].collect()
    assert(out.toSeq == Seq((0L, 1L, 1L, 0L, None)))
  }

  test("cusumChangepoint: zero-filled spine, ×N-scaled argmax, floor-divided " +
      "side means") {
    // click days: 10, 10, 10, (absent → 0), 2, 2 over Jan 1–6
    val rows = Seq(
      "2024-01-01" -> 10, "2024-01-02" -> 10, "2024-01-03" -> 10,
      "2024-01-05" -> 2, "2024-01-06" -> 2).flatMap { case (d, n) =>
      (1 to n).map(i => (d.hashCode.toLong * 100 + i, ts(s"$d 12:00:00"),
        1L, "click"))
    }
    val events = rows.toDF("event_id", "ts", "user_id", "event_type")
    val out = Sequences.cusumChangepoint(events)
      .as[(String, Long, Long, String, Long, Long, Long, Long)].collect()
    // N=6, T=34; S_k×N: 26, 52, 78, 44, 22 → max at k=3 (Jan 3);
    // pre = 30·10⁶ div 3, post = 4·10⁶ div 3
    assert(out.toSeq == Seq(
      ("click", 6L, 34L, "2024-01-03", 3L, 78L, 10000000L, 1333333L)))
  }

  test("proportionShift: hand-traced z with the midpoint event in the " +
      "second half; symmetric shares give ±z") {
    // window 00:00–02:00, midpoint 01:00; type a: 3 early / 1 late,
    // type b: 1 early / 3 late (the 01:00 event counts late)
    val events = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, "a"),
      (2L, ts("2024-01-01 00:10:00"), 1L, "a"),
      (3L, ts("2024-01-01 00:20:00"), 1L, "a"),
      (4L, ts("2024-01-01 01:30:00"), 1L, "a"),
      (5L, ts("2024-01-01 00:30:00"), 1L, "b"),
      (6L, ts("2024-01-01 01:00:00"), 1L, "b"),
      (7L, ts("2024-01-01 01:40:00"), 1L, "b"),
      (8L, ts("2024-01-01 02:00:00"), 1L, "b"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val out = Sequences.proportionShift(events)
      .as[(String, Long, Long, Long, Long, Double, Boolean)].collect()
    // p1 = 3/4 vs p2 = 1/4, pooled 1/2 → z = 0.5/√0.125 = √2
    assert(out.toSeq == Seq(
      ("a", 3L, 4L, 1L, 4L, 1.414214, false),
      ("b", 1L, 4L, 3L, 4L, -1.414214, false)))
  }

  test("heldOutTransitionNll: straddling pair dropped, unseen transitions " +
      "smooth to 1/(0+V), hand-traced micro-nats") {
    val events = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, "A"),
      (2L, ts("2024-01-01 00:10:00"), 1L, "B"),  // A→B: train
      (3L, ts("2024-01-01 01:30:00"), 1L, "A"),  // B→A straddles: dropped
      (4L, ts("2024-01-01 01:40:00"), 1L, "B"),  // A→B: test
      (5L, ts("2024-01-01 02:00:00"), 1L, "A"))  // B→A: test (unseen)
      .toDF("event_id", "ts", "user_id", "event_type")
    val out = Sequences.heldOutTransitionNll(events)
      .as[(Long, Long, Long, Long, Long)].collect()
    // lp(A→B) = ln(2/3) = −405465; lp(B→A) = ln(1/2) = −693147
    assert(out.toSeq == Seq((1L, 2L, 2L, 1098612L, 549306L)))
  }

  test("heldOutTransitionNll: a window with no wholly-second-half " +
      "transition emits ZERO rows, not one NULL row") {
    // two events: the only transition straddles the µs midpoint →
    // neither trainable nor held out (ADVICE r9 degenerate case)
    val events = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, "A"),
      (2L, ts("2024-01-01 00:10:00"), 1L, "B"))
      .toDF("event_id", "ts", "user_id", "event_type")
    assert(Sequences.heldOutTransitionNll(events).collect().isEmpty)
  }

  test("monotonicityAudit: adjacent inversions counted per user; " +
      "singletons are monotone by definition") {
    val events = Seq(
      // user 1: ids 1,2,3 with ts 10, 5, 7 -> one adjacent inversion
      (1L, ts("2024-01-01 00:00:10"), 1L, "a"),
      (2L, ts("2024-01-01 00:00:05"), 1L, "b"),
      (3L, ts("2024-01-01 00:00:07"), 1L, "c"),
      // user 2: single event
      (4L, ts("2024-01-01 00:00:01"), 2L, "z"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val out = Sequences.monotonicityAudit(events)
      .as[(Long, Long, Long, Long, Boolean)].collect()
    assert(out.toSeq == Seq(
      (1L, 3L, 1L, 500000L, false),
      (2L, 1L, 0L, 0L, true)))
  }

  test("eventPathMining: hand-traced trigram counts with support filter") {
    val events = Seq("A", "B", "C", "A", "B", "C").zipWithIndex.map {
      case (t, i) => ((i + 1).toLong, ts(f"2024-01-01 00:0$i:00"), 1L, t)
    }.toDF("event_id", "ts", "user_id", "event_type")
    // trigrams: ABC, BCA, CAB, ABC -> ABC twice, others once; total 4
    val out = Sequences.eventPathMining(events, minSupport = 2L)
      .as[(String, String, String, Long, Long)].collect()
    assert(out.toSeq == Seq(("A", "B", "C", 2L, 500000L)))
    // support 1 keeps all three paths, ordered (n desc, a, b, c)
    val all = Sequences.eventPathMining(events, minSupport = 1L)
      .as[(String, String, String, Long, Long)].collect()
    assert(all.toSeq == Seq(
      ("A", "B", "C", 2L, 500000L),
      ("B", "C", "A", 1L, 250000L),
      ("C", "A", "B", 1L, 250000L)))
  }

  test("diurnalConcentration: a one-hour spike scores R = 1 at its hour; " +
      "four opposed hours cancel to R = 0") {
    val events = (
      (1 to 4).map(i => (i.toLong, ts(s"2024-01-01 03:0$i:00"), 1L, "cron")) ++
      Seq(0, 6, 12, 18).zipWithIndex.map { case (h, i) =>
        ((10 + i).toLong, ts(f"2024-01-01 $h%02d:30:00"), 1L, "flat") })
      .toDF("event_id", "ts", "user_id", "event_type")
    val out = Sequences.diurnalConcentration(events)
      .as[(String, Long, Long, Long)].collect()
    assert(out.toSeq == Seq(
      ("cron", 4L, 1000000L, 3L),
      ("flat", 4L, 0L, 0L)))
  }

  test("mannKendall: monotone series score ±S with hand-traced z; an " +
      "all-tied series has zero variance and no verdict") {
    val rows =
      // 'up': 1,2,3 over 3 days → S=3, var18=66, z = 2/√(66/18)
      Seq("2024-01-01" -> 1, "2024-01-02" -> 2, "2024-01-03" -> 3)
        .flatMap { case (d, n) => (1 to n).map(i =>
          (d.hashCode.toLong * 100 + i, ts(s"$d 12:00:00"), 1L, "up")) } ++
      // 'down': 5,4,3,2,1 → S=−10, var18=300, z = −9/√(300/18)
      Seq("2024-01-01" -> 5, "2024-01-02" -> 4, "2024-01-03" -> 3,
        "2024-01-04" -> 2, "2024-01-05" -> 1)
        .flatMap { case (d, n) => (1 to n).map(i =>
          (d.hashCode.toLong * 1000 + i, ts(s"$d 12:00:00"), 1L, "down")) } ++
      // 'flat': 5,5,5 → S=0, tie group eats the whole variance
      Seq("2024-01-01" -> 5, "2024-01-02" -> 5, "2024-01-03" -> 5)
        .flatMap { case (d, n) => (1 to n).map(i =>
          (d.hashCode.toLong * 10000 + i, ts(s"$d 12:00:00"), 1L, "flat")) }
    val out = Sequences.mannKendall(
        rows.toDF("event_id", "ts", "user_id", "event_type"))
      .as[(String, Long, Long, Long, Option[Double], String)].collect()
    assert(out.toSeq == Seq(
      ("down", 5L, -10L, 300L, Some(-2.204541), "decreasing"),
      ("flat", 3L, 0L, 0L, None, "none"),
      ("up", 3L, 3L, 66L, Some(1.044466), "none")))
  }

  test("burstiness: a metronome scores −1, symmetric 0/100 gaps score 0, " +
      "a single gap has no spread estimate, lone events vanish") {
    val events = Seq(
      // user 1: perfectly periodic → B = −1
      (1L, ts("2024-01-01 00:00:00"), 1L, "view"),
      (2L, ts("2024-01-01 00:00:10"), 1L, "view"),
      (3L, ts("2024-01-01 00:00:20"), 1L, "view"),
      // user 2: gaps [0, 100] → σ = μ = 50 → B = 0
      (4L, ts("2024-01-01 00:00:00"), 2L, "view"),
      (5L, ts("2024-01-01 00:00:00"), 2L, "view"),
      (6L, ts("2024-01-01 00:01:40"), 2L, "view"),
      // user 3: one event → no gaps, no row
      (7L, ts("2024-01-01 00:00:00"), 3L, "view"),
      // user 4: one gap → mean but NULL spread and B
      (8L, ts("2024-01-01 00:00:00"), 4L, "view"),
      (9L, ts("2024-01-01 00:00:30"), 4L, "view"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val out = Sequences.burstiness(events)
      .as[(Long, Long, Long, Option[Long], Option[Long])].collect()
    assert(out.toSeq == Seq(
      (1L, 2L, 10000000L, Some(0L), Some(-1000000L)),
      (2L, 2L, 50000000L, Some(50000000L), Some(0L)),
      (4L, 1L, 30000000L, None, None)))
  }

  test("valueDriftPsi: identical halves score zero; total mass escaping to " +
      "the top quartile bin scores the hand-traced smoothed PSI") {
    def mk(id: Long, t: String, v: Double, at: String) =
      (id, ts(at), 1L, t, v)
    var id = 0L
    def nid() = { id += 1; id }
    val rows =
      // type a: same quartet in both halves → PSI 0
      Seq(1.0 -> "00:00:00", 2.0 -> "00:01:00", 3.0 -> "00:02:00",
        4.0 -> "00:03:00").map { case (v, at) =>
        mk(nid(), "a", v, s"2024-01-01 $at") } ++
      Seq(1.0 -> "01:30:00", 2.0 -> "01:31:00", 3.0 -> "01:32:00",
        4.0 -> "02:00:00").map { case (v, at) =>
        mk(nid(), "a", v, s"2024-01-01 $at") } ++
      // type b: uniform 1..8 first half, all-100 second half
      (1 to 8).map(i => mk(nid(), "b", i.toDouble,
        f"2024-01-01 00:${10 + i}%02d:00")) ++
      (1 to 8).map(i => mk(nid(), "b", 100.0,
        f"2024-01-01 01:${40 + i}%02d:00"))
    val events = rows.toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = Sequences.valueDriftPsi(events)
      .as[(String, Long, Long, Long, Boolean)].collect()
    // b: bins 0-2 each (1/12 − 3/12)·ln(1/3) = 183102; bin 3
    // (9/12 − 3/12)·ln 3 = 549306 → total 1098612
    assert(out.toSeq == Seq(
      ("a", 4L, 4L, 0L, false),
      ("b", 8L, 8L, 1098612L, true)))
  }

  test("sessionGapCalibration: order-statistic percentiles, gap-free users " +
      "still counted, induced sessions = users + splitting gaps") {
    val events = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, "view"),
      (2L, ts("2024-01-01 00:30:00"), 1L, "view"),  // gap 1800
      (3L, ts("2024-01-01 02:00:00"), 1L, "view"),  // gap 5400 (> 1h)
      (4L, ts("2024-01-01 00:00:00"), 2L, "view"),  // lone event: no gap
      (5L, ts("2024-01-01 00:00:00"), 3L, "view"),
      (6L, ts("2024-01-01 00:10:00"), 3L, "view"))  // gap 600
      .toDF("event_id", "ts", "user_id", "event_type")
    val out = Sequences.sessionGapCalibration(events)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
    // gaps sorted [600, 1800, 5400]: p50 = 1800, p90 = p99 = 5400;
    // 1 of 3 gaps splits → 333333 micro; sessions = 3 users + 1 split
    assert(out.toSeq == Seq((3L, 3L, 1800L, 5400L, 5400L, 333333L, 4L)))
  }

  test("cusumChangepoint: |S| ties break to the earliest day") {
    // 4, 0, 0, 4 → S×N: 8, 0, −8 → tie |8| at k=1 and k=3 → k=1 wins
    val rows = Seq("2024-01-01" -> 4, "2024-01-02" -> 0, "2024-01-03" -> 0,
      "2024-01-04" -> 4).flatMap { case (d, n) =>
      (1 to n).map(i => (d.hashCode.toLong * 100 + i, ts(s"$d 12:00:00"),
        1L, "view"))
    }
    val out = Sequences.cusumChangepoint(
        rows.toDF("event_id", "ts", "user_id", "event_type"))
      .as[(String, Long, Long, String, Long, Long, Long, Long)].collect()
    assert(out.toSeq == Seq(
      ("view", 4L, 8L, "2024-01-01", 1L, 8L, 4000000L, 1333333L)))
  }
  test("multiTouchAttribution: 7-day strictly-preceding window, max-struct " +
      "last touch, floor-exact linear split") {
    // user 1: purchases P1@01-10, P2@01-11; touches click@01-05,
    // view@01-09 inside both windows; click@01-02 is 8 days before P1
    // (outside) and 9 before P2. user 2: zero-touch purchase. user 3:
    // three clicks then a purchase (floor split 3x333333).
    val events = Seq(
      (1L, ts("2024-01-02 00:00:00"), 1L, "click"),
      (1L, ts("2024-01-05 00:00:00"), 2L, "click"),
      (1L, ts("2024-01-09 00:00:00"), 3L, "view"),
      (1L, ts("2024-01-10 00:00:00"), 4L, "purchase"),
      (1L, ts("2024-01-11 00:00:00"), 5L, "purchase"),
      (2L, ts("2024-01-10 00:00:00"), 6L, "purchase"),
      (3L, ts("2024-01-08 00:00:00"), 7L, "click"),
      (3L, ts("2024-01-09 00:00:00"), 8L, "click"),
      (3L, ts("2024-01-09 12:00:00"), 9L, "click"),
      (3L, ts("2024-01-10 00:00:00"), 10L, "purchase"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val out = Sequences.multiTouchAttribution(events)
      .as[(String, Long, Long, Long)].collect()
    // P1: {click@05, view@09} nt=2 last=view; P2: same; P3: 3 clicks
    // nt=3 last=click@09:12 -> click: 2+3 touches, 1 last-touch conv,
    // 2*500000 + 3*333333; view: 2 touches, 2 last-touch convs, 1e6
    assert(out.toSeq == Seq(
      ("click", 5L, 1L, 1999999L),
      ("view", 2L, 2L, 1000000L)))
  }

  test("weekdaySeasonality: dense spine counts weekday calendar days, " +
      "zero-event weekdays report, chi2 cells hand-traced") {
    // span 2024-01-01 (Mon) .. 2024-01-08 (Mon): D=8, Mon x2, others x1
    // events: 3 on Mon 01-01, 1 on Wed 01-03, 1 on Mon 01-08 -> T=5
    val events = Seq(
      (1L, ts("2024-01-01 01:00:00"), 1L, "e"),
      (1L, ts("2024-01-01 02:00:00"), 2L, "e"),
      (1L, ts("2024-01-01 03:00:00"), 3L, "e"),
      (1L, ts("2024-01-03 01:00:00"), 4L, "e"),
      (1L, ts("2024-01-08 01:00:00"), 5L, "e"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val out = Sequences.weekdaySeasonality(events)
      .as[(String, Int, Long, Long, Long, Long)].collect()
    // Mon: o=4,d=2 -> e=1250000, chi2=(4*8-5*2)^2*1e6/(8*5*2)=6050000
    // Wed: o=1,d=1 -> e=625000, chi2=(8-5)^2*1e6/40=225000
    // other weekdays: o=0,d=1 -> e=625000, chi2=25*1e6/40=625000
    assert(out.toSeq == Seq(
      ("e", 1, 2L, 4L, 1250000L, 6050000L),
      ("e", 2, 1L, 0L, 625000L, 625000L),
      ("e", 3, 1L, 1L, 625000L, 225000L),
      ("e", 4, 1L, 0L, 625000L, 625000L),
      ("e", 5, 1L, 0L, 625000L, 625000L),
      ("e", 6, 1L, 0L, 625000L, 625000L),
      ("e", 7, 1L, 0L, 625000L, 625000L)))
  }
  test("markovStationary: a symmetric 2-cycle stays uniform; an " +
      "asymmetric chain matches an independent reference iteration") {
    // a->b->a->b: P is a swap, pi0 uniform -> pi stays (1e6, 1e6)
    val cyc = Seq(
      (1L, ts("2024-01-01 01:00:00"), 1L, "a"),
      (1L, ts("2024-01-01 02:00:00"), 2L, "b"),
      (1L, ts("2024-01-01 03:00:00"), 3L, "a"),
      (1L, ts("2024-01-01 04:00:00"), 4L, "b"),
      (1L, ts("2024-01-01 05:00:00"), 5L, "a"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val sym = Sequences.markovStationary(cyc, iters = 10)
      .as[(String, Long)].collect()
    assert(sym.toSeq == Seq(("a", 1000000L), ("b", 1000000L)))
    // asymmetric: a->b x2, b->a x1, a->a x1 (tot a=3, b=1); reference
    // below replays the exact integer recurrence independently
    val asym = Seq(
      (1L, ts("2024-01-01 01:00:00"), 1L, "a"),
      (1L, ts("2024-01-01 02:00:00"), 2L, "b"),
      (1L, ts("2024-01-01 03:00:00"), 3L, "a"),
      (1L, ts("2024-01-01 04:00:00"), 4L, "b"),
      (2L, ts("2024-01-01 01:00:00"), 5L, "a"),
      (2L, ts("2024-01-01 02:00:00"), 6L, "a"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val edges = Seq(("a", "b", 2L, 3L), ("b", "a", 1L, 1L), ("a", "a", 1L, 3L))
    var pi = Map("a" -> 1000000L, "b" -> 1000000L)
    for (_ <- 1 to 10) {
      val next = scala.collection.mutable.Map("a" -> 0L, "b" -> 0L)
      edges.foreach { case (src, dst, n, tot) =>
        next(dst) += (pi(src) * n) / tot
      }
      pi = next.toMap
    }
    val got = Sequences.markovStationary(asym, iters = 10)
      .as[(String, Long)].collect().toMap
    assert(got == pi, s"engine $got != reference $pi")
  }
  test("interpolateDaily: interior gaps take the floor-exact straight " +
      "line; observed days pass through; negative slope truncates " +
      "toward zero in both engines") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      // type a: day1 = 1.00, day4 = 4.00 -> day2 2.00, day3 3.00
      ("a", ts("2024-01-01 10:00:00"), 1.00),
      ("a", ts("2024-01-04 10:00:00"), 4.00),
      // type b: day1 = 0.00, day3 = 1.01 -> day2 = 101*1 div 2 = 50c
      ("b", ts("2024-01-01 00:00:00"), 0.00),
      ("b", ts("2024-01-03 00:00:00"), 1.01),
      // type c: NEGATIVE slope 0 -> -1.01: day2 = (-101) div 2 = -50c
      ("c", ts("2024-01-01 00:00:00"), 0.00),
      ("c", ts("2024-01-03 00:00:00"), -1.01),
      // two events same day sum to one daily value
      ("a", ts("2024-01-01 23:00:00"), 0.50))
      .toDF("event_type", "ts", "value")
    val out = Sequences.interpolateDaily(ev)
      .as[(String, java.sql.Date, Long, Boolean)].collect()
      .map { case (t, d, v, i) => (t, d.toString, v, i) }
    assert(out.toSeq == Seq(
      ("a", "2024-01-01", 150L, false),
      ("a", "2024-01-02", 233L, true),  // 150 + 250*1 div 3 = 233
      ("a", "2024-01-03", 316L, true),  // 150 + 250*2 div 3 = 316
      ("a", "2024-01-04", 400L, false),
      ("b", "2024-01-01", 0L, false),
      ("b", "2024-01-02", 50L, true),
      ("b", "2024-01-03", 101L, false),
      ("c", "2024-01-01", 0L, false),
      ("c", "2024-01-02", -50L, true),  // trunc toward zero, not -51
      ("c", "2024-01-03", -101L, false)))
  }
  test("dailyAutocorrelation: n-scaled deviation identity hand-traced; " +
      "spine gap days count as zeros") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // type a, 4 days [3,1,3,1]: d = 4x-8 = [4,-4,4,-4], den 64
    // lag1 num = -48 -> -750000; lag2 num = 32 -> 500000
    val a = Seq.fill(3)("2024-01-01") ++ Seq("2024-01-02") ++
      Seq.fill(3)("2024-01-03") ++ Seq("2024-01-04")
    // type b, days 1 and 3 (day 2 a GAP -> zero): x=[2,0,4],
    // d = 3x-6 = [0,-6,6], den 72, lag1 num = -36 -> -500000
    val b = Seq.fill(2)("2024-01-01") ++ Seq.fill(4)("2024-01-03")
    val ev = (a.map(("a", _)) ++ b.map(("b", _)))
      .map { case (t, d) => (t, ts(d + " 12:00:00")) }
      .toDF("event_type", "ts")
    val out = Sequences.dailyAutocorrelation(ev, lags = Seq(1, 2))
      .as[(String, Long, Long, Long)].collect()
    assert(out.toSeq == Seq(
      ("a", 1L, 4L, -750000L),
      ("a", 2L, 4L, 500000L),
      ("b", 1L, 3L, -500000L),
      ("b", 2L, 3L, 0L)))
  }

  test("dailyAutocorrelation: a (type, lag) cell with zero lagged pairs " +
      "(day span <= lag) emits NO row, not a NULL acf (ADVICE r14)") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s + " 12:00:00")
    // type c spans 2 days with unequal counts (variance > 0): lag 1
    // has one pair; lag 3 has zero pairs -> that cell must be absent
    val ev = (Seq.fill(3)("2024-01-01") ++ Seq("2024-01-02"))
      .map(d => ("c", ts(d))).toDF("event_type", "ts")
    val out = Sequences.dailyAutocorrelation(ev, lags = Seq(1, 3))
      .as[(String, Long, Long, Long)].collect()
    // d = 2x-4 = [2,-2], den 8, lag1 num = -4 -> -500000; lag3: no row
    assert(out.toSeq == Seq(("c", 1L, 2L, -500000L)))
  }

  test("temporalSplitAudit: the cutoff day is the exact ceil-rank day " +
      "(a day never splits); user overlap and seen-event share hand-" +
      "traced") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s + " 12:00:00")
    // days: d1 {u1,u2}, d2 {u1}, d3 {u3}, d4 {u2} -> n=5,
    // ceil(0.8*5)=4 -> cumulative reaches 4 at d3
    val ev = Seq(("2024-01-01", 1L), ("2024-01-01", 2L),
      ("2024-01-02", 1L), ("2024-01-03", 3L), ("2024-01-04", 2L))
      .map { case (d, u) => (ts(d), u) }.toDF("ts", "user_id")
    val out = Sequences.temporalSplitAudit(ev)
      .as[(java.sql.Date, Long, Long, Long, Long, Long, Long,
        Option[Long])].collect()
    assert(out.toSeq == Seq((java.sql.Date.valueOf("2024-01-03"),
      4L, 1L, 3L, 1L, 1L, 1L, Some(1000000L))))
    // trainPct=50: ceil(2.5)=3 -> cutoff d2; test users {u3,u2},
    // only u2 was seen -> 1 of 2 test events from seen users
    val half = Sequences.temporalSplitAudit(ev, trainPct = 50)
      .as[(java.sql.Date, Long, Long, Long, Long, Long, Long,
        Option[Long])].collect()
    assert(half.toSeq == Seq((java.sql.Date.valueOf("2024-01-02"),
      3L, 2L, 2L, 2L, 1L, 1L, Some(500000L))))
    // an entirely-unseen test population reads zero leakage
    val fresh = Seq(("2024-01-01", 1L), ("2024-01-02", 9L))
      .map { case (d, u) => (ts(d), u) }.toDF("ts", "user_id")
    val zero = Sequences.temporalSplitAudit(fresh, trainPct = 50)
      .as[(java.sql.Date, Long, Long, Long, Long, Long, Long,
        Option[Long])].collect()
    assert(zero.toSeq == Seq((java.sql.Date.valueOf("2024-01-01"),
      1L, 1L, 1L, 1L, 0L, 0L, Some(0L))))
    // no events -> no row
    val empty = Seq.empty[(Timestamp, Long)].toDF("ts", "user_id")
    assert(Sequences.temporalSplitAudit(empty).count() == 0L)
  }

  test("behaviorBoilerplate: patterns group across users; singleton " +
      "patterns drop; the size fence drops long sessions LOUDLY") {
    import spark.implicits._
    def ev(u: Long, t: String, i: Long, tp: String) =
      (u, Timestamp.valueOf(s"2024-01-0$t"), i, tp)
    val events = Seq(
      ev(1, "1 10:00:00", 1, "a"), ev(1, "1 10:05:00", 2, "b"),
      ev(2, "1 09:00:00", 3, "a"), ev(2, "1 09:30:00", 4, "b"),
      ev(1, "2 08:00:00", 5, "a"),
      ev(3, "1 07:00:00", 6, "a"),
      ev(4, "1 06:00:00", 7, "c"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val out = Sequences.behaviorBoilerplate(events)
      .as[(String, Long, Long, Long, Long)].collect()
    assert(out.toSeq == Seq(
      ("a", 1L, 2L, 2L, 0L),
      ("a>b", 2L, 2L, 2L, 0L)))
    // maxLen=1: both 2-event sessions are dropped AND counted
    val fenced = Sequences.behaviorBoilerplate(events, maxLen = 1)
      .as[(String, Long, Long, Long, Long)].collect()
    assert(fenced.toSeq == Seq(("a", 1L, 2L, 2L, 2L)))
  }

  test("behaviorBoilerplate: within-session order is (ts, event_id) — " +
      "same-timestamp ties break on the id") {
    import spark.implicits._
    val t0 = Timestamp.valueOf("2024-01-01 10:00:00")
    val events = Seq(
      (1L, t0, 5L, "x"), (1L, t0, 1L, "y"),
      (2L, t0, 6L, "x"), (2L, t0, 2L, "y"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val out = Sequences.behaviorBoilerplate(events)
      .as[(String, Long, Long, Long, Long)].collect()
    assert(out.toSeq == Seq(("y>x", 2L, 2L, 2L, 0L)))
  }

  test("behaviorBoilerplate: event types containing the '>' delimiter " +
      "(or '\\') never collide distinct sequences (ADVICE r15/r16)") {
    import spark.implicits._
    val t0 = Timestamp.valueOf("2024-01-01 10:00:00")
    val t1 = Timestamp.valueOf("2024-01-01 10:00:01")
    // ("a>b","c") vs ("a","b>c"): unescaped both render "a>b>c";
    // escaped they stay distinct patterns of session_len 2
    val events = Seq(
      (1L, t0, 1L, "a>b"), (1L, t1, 2L, "c"),
      (2L, t0, 3L, "a>b"), (2L, t1, 4L, "c"),
      (3L, t0, 5L, "a"), (3L, t1, 6L, "b>c"),
      (4L, t0, 7L, "a"), (4L, t1, 8L, "b>c"),
      (5L, t0, 9L, "x\\"), (5L, t1, 10L, "y"),
      (6L, t0, 11L, "x"), (6L, t1, 12L, "\\y"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val out = Sequences.behaviorBoilerplate(events)
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(out.map(_._1).toSet == Set("a\\>b>c", "a>b\\>c"), out.toString)
    assert(out.forall(r => r._2 == 2L && r._3 == 2L))
  }
}

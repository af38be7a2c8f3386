package graft.operators

import graft.SparkSpec

/** KMV sketch semantics on hand-built hash sets where the estimate is
  * derivable by hand; fixture-scale values are the oracle gate's job. */
class ProfileSpec extends SparkSpec {
  import spark.implicits._

  test("kmvDistinctSketch: under-k group reports exact; over-k estimates from kth min") {
    val rows =
      (1L to 3L).map(h => ("small", h)) ++
      (1L to 20L).map(h => ("big", h)) ++
      Seq(("big", 5L)) // duplicate hash: deduped before ranking
    val out = Profile.kmvDistinctSketch(
        rows.toDF("source", "h"), "source", "h", k = 4)
      .orderBy($"source")
      .as[(String, Long, Long, Long, Long)].collect()
    // big: bottom-4 = {1,2,3,4}, kth = 4, est = floor(3·2^60 / 4)
    val estBig = math.floor(3.0 * 1152921504606846976.0 / 4.0).toLong
    assert(out.toSeq == Seq(
      ("big", 4L, 4L, estBig, 20L),
      ("small", 3L, 3L, 3L, 3L))) // < k: sketch holds everything → exact
  }

  test("kmvDistinctSketch rejects degenerate k") {
    intercept[IllegalArgumentException] {
      Profile.kmvDistinctSketch(Seq(("a", 1L)).toDF("g", "h"), "g", "h", k = 1)
    }
  }

  test("zScores: matches the exact-moment model; degenerate groups get NULL") {
    // g1: x = 1,2,3 → mean 2, var 1, z = -1,0,1 exactly
    // g2: constant → zero variance → NULL; g3: n = 1 → NULL
    // g4: [2, 2, NULL] — the NULL must not count into n (the data is
    // constant → zero variance → NULL z), and the NULL row scores NULL
    val rows = Seq(
      ("g1", Some(1L)), ("g1", Some(2L)), ("g1", Some(3L)),
      ("g2", Some(7L)), ("g2", Some(7L)),
      ("g3", Some(42L)),
      ("g4", Some(2L)), ("g4", Some(2L)), ("g4", Option.empty[Long]))
      .toDF("g", "x")
    val out = Profile.zScores(rows, "g", "x")
      .select($"g", $"x", $"z").as[(String, Option[Long], Option[Double])]
      .collect().sortBy(r => (r._1, r._2.getOrElse(Long.MinValue)))
    assert(out.toSeq == Seq(
      ("g1", Some(1L), Some(-1.0)), ("g1", Some(2L), Some(0.0)),
      ("g1", Some(3L), Some(1.0)),
      ("g2", Some(7L), None), ("g2", Some(7L), None),
      ("g3", Some(42L), None),
      ("g4", None, None), ("g4", Some(2L), None), ("g4", Some(2L), None)))
  }

  test("kmvDistinctSketch fails loudly on hashes outside [0, 2^60)") {
    // a full-range signed hash (e.g. xxhash64) would silently corrupt
    // the estimate — the domain guard must raise instead
    val err = intercept[Exception] {
      Profile.kmvDistinctSketch(
        Seq(("a", -5L), ("a", 3L)).toDF("g", "h"), "g", "h", k = 4).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(err).exists(_.contains("outside [0, 2^60)")), err)
  }
}

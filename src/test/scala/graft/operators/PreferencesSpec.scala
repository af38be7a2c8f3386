package graft.operators

import graft.SparkSpec

class PreferencesSpec extends SparkSpec {
  import spark.implicits._

  private def fit(pairs: Seq[(String, String)]) =
    Preferences.bradleyTerry(pairs.toDF("winner", "loser"))
      .as[(String, Long, Long, Long)].collect().toSeq

  test("bradleyTerry: a transitive tournament orders strengths; the " +
      "undefeated item pins at 1e6") {
    // A beats B 2x, B beats C 2x, A beats C 2x
    val out = fit(Seq(("A", "B"), ("A", "B"), ("B", "C"), ("B", "C"),
      ("A", "C"), ("A", "C")))
    assert(out.map(_._1) == Seq("A", "B", "C"), out.toString)
    val s = out.map(r => r._1 -> r._4).toMap
    assert(s("A") == 1000000L, "renormalization pins the max at 1e6")
    assert(s("A") > s("B") && s("B") > s("C") && s("C") >= 1L)
    // wins and comparison counts are exact
    assert(out.map(r => (r._1, r._2, r._3)) ==
      Seq(("A", 4L, 4L), ("B", 2L, 4L), ("C", 0L, 4L)))
  }

  test("bradleyTerry: a 1-1 split reads as equal strength; a winless " +
      "item floors at 1 micro, never 0; self-comparisons are dropped") {
    val split = fit(Seq(("A", "B"), ("B", "A")))
    assert(split.map(_._4).toSet == Set(1000000L), split.toString)
    val winless = fit(Seq(("A", "B"), ("A", "B"))).map(r => r._1 -> r._4).toMap
    assert(winless("B") >= 1L)
    val self = fit(Seq(("A", "A"), ("A", "B")))
    assert(self.map(r => (r._1, r._3)) == Seq(("A", 1L), ("B", 1L)),
      "the A-vs-A judgment must not count")
  }

  test("bradleyTerry: determinism across runs") {
    val pairs = Seq(("A", "B"), ("B", "C"), ("C", "A"), ("A", "B"),
      ("A", "C"), ("B", "C"), ("A", "D"), ("D", "C"))
    assert(fit(pairs) == fit(pairs))
  }

  private def trans(pairs: Seq[(String, String)]) =
    Preferences.majorityTransitivity(pairs.toDF("winner", "loser"))
      .as[(Long, Long, Long, Long, Long)].collect().toSeq

  test("majorityTransitivity: a rock-paper-scissors triple reads cyclic " +
      "(transitivity 0); a transitive tournament reads 1e6; a tied pair " +
      "breaks the triad") {
    assert(trans(Seq(("A", "B"), ("B", "C"), ("C", "A"))) ==
      Seq((3L, 3L, 1L, 1L, 0L)))
    assert(trans(Seq(("A", "B"), ("B", "C"), ("A", "C"))) ==
      Seq((3L, 3L, 1L, 0L, 1000000L)))
    // A-B splits 1-1 -> no majority edge -> no closed triple -> no row
    assert(trans(Seq(("A", "B"), ("B", "A"), ("B", "C"), ("A", "C"))).isEmpty)
    // majority needs a STRICT winner: A beats B 2-1 -> edge survives
    val out = trans(Seq(("A", "B"), ("A", "B"), ("B", "A"),
      ("B", "C"), ("A", "C")))
    assert(out == Seq((3L, 3L, 1L, 0L, 1000000L)))
  }

  test("majorityTransitivity: 4-item mix — one cyclic and one transitive " +
      "triad hand-counted") {
    // A->B, B->C, C->A (cycle) and A->B, B->D, A->D (transitive);
    // C-D never compared -> only 2 closed triples
    val out = trans(Seq(("A", "B"), ("B", "C"), ("C", "A"),
      ("B", "D"), ("A", "D")))
    assert(out == Seq((4L, 5L, 2L, 1L, 500000L)))
  }
}

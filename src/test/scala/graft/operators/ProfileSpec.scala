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

  test("sampledQuantiles: hand-derived quarter interpolation at full sample") {
    // g1: 1..5 → p25 = 1 + .25·4 = 2, p50 = 3, p75 = 4
    // g2: 10,20,30,40 → h = .25·3 = .75 → 10 + .75·10 = 17.5
    val rows = (1L to 5L).map(v => (v, "g1", v)) ++
      Seq((6L, "g2", 10L), (7L, "g2", 20L), (8L, "g2", 30L), (9L, "g2", 40L))
    val out = Profile.sampledQuantiles(rows.toDF("id", "grp", "v"),
        "id", "v", "grp", Seq(0.25, 0.5, 0.75), samplePct = 100)
      .orderBy($"grp")
      .select($"grp", $"sample_n", $"p25", $"p50", $"p75")
      .as[(String, Long, Double, Double, Double)].collect().toSeq
    assert(out == Seq(
      ("g1", 5L, 2.0, 3.0, 4.0),
      ("g2", 4L, 17.5, 25.0, 32.5)))
  }

  test("sampledQuantiles: sampling is deterministic and partitioning-invariant") {
    val df = (1L to 200L).map(v => (v, "g", v)).toDF("id", "grp", "v")
    val a = Profile.sampledQuantiles(df, "id", "v", "grp",
      Seq(0.25, 0.5, 0.75), samplePct = 30).collect().toSeq
    val b = Profile.sampledQuantiles(df.repartition(7), "id", "v", "grp",
      Seq(0.25, 0.5, 0.75), samplePct = 30).collect().toSeq
    assert(a == b) // content-hash gate: layout can't change the sample
    val n = a.head.getAs[Long]("sample_n")
    assert(n > 0 && n < 200, s"30% gate kept $n of 200") // strict subset
  }

  test("sampledQuantiles rejects degenerate parameters") {
    val df = Seq((1L, "g", 1L)).toDF("id", "grp", "v")
    intercept[IllegalArgumentException] {
      Profile.sampledQuantiles(df, "id", "v", "grp", Seq(1.5))
    }
    intercept[IllegalArgumentException] {
      Profile.sampledQuantiles(df, "id", "v", "grp", Seq(0.5), samplePct = 0)
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

  test("keyConcentration: hand-derived Gini via the histogram collapse") {
    // keys a×1 b×2 c×3: sorted counts [1,2,3], ranks 1..3
    // Σi·cᵢ = 1+4+9 = 14 → gini = (2·14 − 4·6)/(3·6) = 4/18
    val rows = (Seq.fill(1)("a") ++ Seq.fill(2)("b") ++ Seq.fill(3)("c"))
      .toDF("k")
    val out = Profile.keyConcentration(rows, "k")
      .as[(Long, Long, Long, Double)].head()
    assert(out == ((3L, 6L, 3L, 0.222222)))
    // uniform distribution → gini 0
    val uni = (1 to 4).flatMap(i => Seq.fill(5)(s"k$i")).toDF("k")
    assert(Profile.keyConcentration(uni, "k")
      .as[(Long, Long, Long, Double)].head()._4 == 0.0)
    // tie blocks [1,1,2]: block c=1 (m=2, B=0) → 1·(0 + 2·3/2) = 3;
    // block c=2 (m=1, B=2) → 2·(2 + 1) = 6; Σi·cᵢ = 9
    // → gini = (18 − 4·4)/(3·4) = 2/12
    val tied = (Seq.fill(1)("a") ++ Seq.fill(1)("b") ++ Seq.fill(2)("c"))
      .toDF("k")
    assert(Profile.keyConcentration(tied, "k")
      .as[(Long, Long, Long, Double)].head() == ((3L, 4L, 2L, 0.166667)))
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

  test("kmvPairSimilarity: with k above the vocab the estimate IS the exact Jaccard; " +
    "disjoint pairs coalesce to zero") {
    val items = Seq(
      ("A", "a"), ("A", "b"), ("A", "c"),
      ("B", "b"), ("B", "c"), ("B", "d"),
      ("C", "zz")).toDF("source", "item")
    val out = Profile.kmvPairSimilarity(items, "source", "item", k = 64)
      .orderBy($"grp_a", $"grp_b")
      .as[(String, String, Double, Double)].collect()
    // J(A,B) = |{b,c}| / |{a,b,c,d}| = 0.5 — sketches hold everything,
    // so the estimator degenerates to the exact value
    assert(out.toSeq == Seq(
      ("A", "B", 0.5, 0.5),
      ("A", "C", 0.0, 0.0),
      ("B", "C", 0.0, 0.0)))
  }

  test("mixDrift: hand-traced TV distance, missing categories pay corpus mass") {
    // corpus: en 3/6, de 1/6, fr 2/6
    // A = {en,en,en,de}: |3/4−3/6| + |1/4−1/6| + |0−2/6| → 333333 µ
    // B = {fr,fr}: |0−3/6| + |0−1/6| + |1−2/6|           → 666666 µ
    val docs = Seq(
      (1L, "A", "en"), (2L, "A", "en"), (3L, "A", "en"), (4L, "A", "de"),
      (5L, "B", "fr"), (6L, "B", "fr"))
      .toDF("doc_id", "source", "lang")
    val out = Profile.mixDrift(docs, "source", "lang")
      .orderBy($"source")
      .as[(String, Long, Long)].collect()
    assert(out.toSeq == Seq(("A", 4L, 333333L), ("B", 2L, 666666L)))
  }

  test("mixDrift: a group matching the corpus mix exactly scores zero") {
    val docs = (1L to 8L).map(i =>
      (i, if (i % 2 == 0) "A" else "B", if (i % 4 < 2) "en" else "de"))
      .toDF("doc_id", "source", "lang")
    // both sources hold exactly {en: 2, de: 2} — the corpus mix
    val out = Profile.mixDrift(docs, "source", "lang")
      .select("tv_micro").as[Long].collect()
    assert(out.forall(_ == 0L), out.toSeq)
  }

  test("simpsonDiversity: hand-traced concentration and effective categories") {
    // A = {en×3, de×1}: Σp² = 10/16 → 625000 µ; effective 16/10 → 1.6
    // B = {fr×2}: monoculture → simpson 10⁶, effective exactly 1
    val docs = Seq(
      ("A", "en"), ("A", "en"), ("A", "en"), ("A", "de"),
      ("B", "fr"), ("B", "fr")).toDF("source", "lang")
    val out = Profile.simpsonDiversity(docs, "source", "lang")
      .orderBy($"source")
      .as[(String, Long, Long, Long, Long)].collect()
    assert(out.toSeq == Seq(
      ("A", 4L, 2L, 625000L, 1600000L),
      ("B", 2L, 1L, 1000000L, 1000000L)))
  }

  test("winsorizedStats: clamp bounds are order statistics; the tail moves only the raw mean") {
    // g: 1..9 plus a planted 1000. With [p10, p90] bounds: lo = 1
    // (cume 0.1 at the 1st of 10), hi = 9 (cume 0.9 at the 9th) —
    // 1000 clamps to 9: wmean = 54/10, raw mean = 1045/10
    val df = ((1L to 9L) :+ 1000L).map(("g", _)).toDF("grp", "v")
    val out = Profile.winsorizedStats(df, "v", "grp", pLo = 0.1, pHi = 0.9)
      .as[(String, Long, Long, Long, Long, Long)].collect()
    assert(out.toSeq == Seq(("g", 10L, 1L, 9L, 5400000L, 104500000L)))
  }

  test("pairwiseKappa: hand-traced kappa, perfect agreement, chance-only, degenerate") {
    // pair (a,b): 3×TT, 1×TF, 1×FT, 5×FF → agree 8/10,
    //   pe = (4·4 + 6·6)/100 → κ = (80−52)/(100−52) = 28/48 = 0.583333
    // pair (a,c): c ≡ a → κ = 1
    // pair (a,d): d constant-true → agreement IS the base rate → κ = 0
    // pair (d,e): both constant → pe = 1 → κ undefined (null)
    val rows = Seq(
      (true, true), (true, true), (true, true), (true, false),
      (false, true), (false, false), (false, false), (false, false),
      (false, false), (false, false))
      .map { case (a, b) => (a, b, a, true, true) }
      .toDF("a", "b", "c", "d", "e")
    val out = Profile.pairwiseKappa(rows, Seq("a", "b", "c", "d", "e"))
      .select("gate_a", "gate_b", "n", "agree", "kappa")
      .as[(String, String, Long, Long, Option[Double])].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    assert(out(("a", "b")) == ((10L, 8L, Some(0.583333))))
    assert(out(("a", "c")) == ((10L, 10L, Some(1.0))))
    assert(out(("a", "d")) == ((10L, 4L, Some(0.0))))
    assert(out(("d", "e")) == ((10L, 10L, None)))
  }

  test("madOutliers: median/MAD per group, 3×MAD flag, group isolation") {
    // group g: values 10,12,14,16,100 → med 14 (discrete), devs
    // 4,2,0,2,86 → MAD 2 → threshold 6: only 100 flags (dev 86)
    // group h: 5,5,5 → med 5, MAD 0 → ANY deviation flags (6 does)
    val df = Seq(
      (1L, "g", 10L), (2L, "g", 12L), (3L, "g", 14L), (4L, "g", 16L),
      (5L, "g", 100L),
      (6L, "h", 5L), (7L, "h", 5L), (8L, "h", 6L))
      .toDF("id", "grp", "v")
    val out = Profile.madOutliers(df, "id", "v", "grp", k = 3)
      .orderBy($"id")
      .as[(Long, String, Long, Long, Long, Boolean)].collect()
    assert(out.toSeq == Seq(
      (1L, "g", 10L, 14L, 2L, false),
      (2L, "g", 12L, 14L, 2L, false),
      (3L, "g", 14L, 14L, 2L, false),
      (4L, "g", 16L, 14L, 2L, false),
      (5L, "g", 100L, 14L, 2L, true),
      (6L, "h", 5L, 5L, 0L, false),
      (7L, "h", 5L, 5L, 0L, false),
      (8L, "h", 6L, 5L, 0L, true)))
  }

  test("madOutliers: robust where zScores is not — one huge value cannot mask itself") {
    // with mean/std the 10⁶ outlier inflates std enough to sit ~√n σ
    // out; with median/MAD it is unambiguously flagged and the flag
    // set is EXACTLY the planted outlier
    val df = ((1L to 50L).map(i => (i, "g", 100L + (i % 7))) :+
      (99L, "g", 1000000L)).toDF("id", "grp", "v")
    val flagged = Profile.madOutliers(df, "id", "v", "grp")
      .filter($"is_outlier").select("id").as[Long].collect()
    assert(flagged.toSeq == Seq(99L))
  }

  test("poissonBootstrapCI: est is the exact mean, bounds are ordered, and the " +
      "draw is partitioning-invariant") {
    val rows = (1L to 200L).map(i => (i, "g", 100L + (i % 13))) ++
      (1L to 50L).map(i => (1000L + i, "h", 500L + (i % 7)))
    val df = rows.toDF("id", "grp", "v")
    val a = Profile.poissonBootstrapCI(df, "id", "v", "grp", b = 40)
      .orderBy($"grp")
      .as[(String, Long, Long, Long, Option[Long], Option[Long])].collect().toSeq
    a.foreach { case (g, n, breps, est, lo, hi) =>
      assert(breps == 40L)
      val vs = rows.filter(_._2 == g).map(_._3)
      assert(est == vs.sum * 1000000L / vs.size, s"group $g est")
      assert(lo.nonEmpty && hi.nonEmpty && lo.get <= hi.get, s"group $g bounds")
      // the interval should bracket the estimate for this benign data
      assert(lo.get <= est && est <= hi.get, s"group $g coverage")
    }
    val b = Profile.poissonBootstrapCI(df.repartition(7).orderBy($"v"),
        "id", "v", "grp", b = 40)
      .orderBy($"grp")
      .as[(String, Long, Long, Long, Option[Long], Option[Long])].collect().toSeq
    assert(a == b, "bootstrap must not depend on partitioning or row order")
  }

  test("distributionEmd: hand-traced |ΔCDF|·gap; a group matching the corpus " +
      "scores near zero, a shifted group pays the shift") {
    // corpus values {1,1,3,3}; support (1: cum 2, gap 2), (3: cum 4, gap 0)
    // A = {1,1,3}: |2/3 − 2/4|·10⁶·2 = 333332      B = {3}: |0 − 1/2|·10⁶·2 = 1000000
    val rows = Seq((1L, "A", 1L), (2L, "A", 1L), (3L, "A", 3L), (4L, "B", 3L))
    val out = Profile.distributionEmd(rows.toDF("id", "grp", "v"), "v", "grp")
      .orderBy($"grp").as[(String, Long, Long)].collect()
    assert(out.toSeq == Seq(("A", 3L, 333332L), ("B", 1L, 1000000L)))
    // a group that IS the corpus scores exactly zero
    val solo = Seq((1L, "X", 5L), (2L, "X", 9L))
    val zero = Profile.distributionEmd(solo.toDF("id", "grp", "v"), "v", "grp")
      .as[(String, Long, Long)].collect()
    assert(zero.toSeq == Seq(("X", 2L, 0L)))
  }

  test("equiDepthBins: equal populations, exact ranges, id tie-break on equal values") {
    val rows = (1L to 8L).map(i => (i, "g", i)) ++
      (1L to 4L).map(i => (i, "t", 5L)) // all tied: bins split by id
    val out = Profile.equiDepthBins(rows.toDF("id", "grp", "v"),
        "id", "v", "grp", bins = 4)
      .orderBy($"grp", $"bin")
      .as[(String, Int, Long, Long, Long)].collect()
    assert(out.toSeq == Seq(
      ("g", 1, 2L, 1L, 2L), ("g", 2, 2L, 3L, 4L),
      ("g", 3, 2L, 5L, 6L), ("g", 4, 2L, 7L, 8L),
      ("t", 1, 1L, 5L, 5L), ("t", 2, 1L, 5L, 5L),
      ("t", 3, 1L, 5L, 5L), ("t", 4, 1L, 5L, 5L)))
  }

  test("benfordAudit: truncated leading digit, literal expectations, sub-1 rows excluded") {
    val df = Seq(1.5, 19.0, 123.0, 2.0, 0.5, 9.99).toDF("v")
    val out = Profile.benfordAudit(df, "v")
      .orderBy($"digit")
      .as[(Int, Long, Long, Long, Long)].collect()
    // digits over the 5 kept rows (0.5 excluded): 1×3, 2×1, 9×1
    // exp_micro = round(log10(1 + 1/d)·10⁶): 301030, 176091, 45757
    assert(out.toSeq == Seq(
      (1, 3L, 600000L, 301030L, 298970L),
      (2, 1L, 200000L, 176091L, 23909L),
      (9, 1L, 200000L, 45757L, 154243L)))
  }

  test("pmiProfile: independent cells score zero; a diagonal pair scores ln 2") {
    val indep = Seq(("a", "x"), ("a", "x"), ("a", "y"), ("a", "y"),
        ("b", "x"), ("b", "y")).toDF("s", "l")
    val zeros = Profile.pmiProfile(indep, "s", "l")
      .select($"pmi_micro", $"mi_part_micro").as[(Long, Long)].collect()
    assert(zeros.forall(_ == (0L, 0L)), "independence must score exactly 0")
    val diag = Seq(("a", "x"), ("b", "y")).toDF("s", "l")
    val out = Profile.pmiProfile(diag, "s", "l")
      .orderBy($"s")
      .as[(String, String, Long, Long, Long, Long, Long)].collect()
    // pmi = ln(1·2/(1·1)) = ln 2 → 693147 micro; mi part = ln 2 / 2
    assert(out.toSeq == Seq(
      ("a", "x", 1L, 1L, 1L, 693147L, 346574L),
      ("b", "y", 1L, 1L, 1L, 693147L, 346574L)))
  }

  test("robustScale: order-statistic quartiles, sign decomposition, null on zero IQR") {
    val rows = (1L to 8L).map(i => (i, "g", i)) ++
      Seq((9L, "d", 7L), (10L, "d", 7L)) // degenerate: IQR = 0
    val out = Profile.robustScale(rows.toDF("id", "grp", "v"), "id", "v", "grp")
      .orderBy($"id")
      .as[(Long, String, Long, Long, Long, Option[Long])].collect()
    // g: q1 = 2, med = 4, q3 = 6 → iqr 4; scaled = sign·|v−4|·10⁶ div 4
    assert(out.toSeq == Seq(
      (1L, "g", 1L, 4L, 4L, Some(-750000L)),
      (2L, "g", 2L, 4L, 4L, Some(-500000L)),
      (3L, "g", 3L, 4L, 4L, Some(-250000L)),
      (4L, "g", 4L, 4L, 4L, Some(0L)),
      (5L, "g", 5L, 4L, 4L, Some(250000L)),
      (6L, "g", 6L, 4L, 4L, Some(500000L)),
      (7L, "g", 7L, 4L, 4L, Some(750000L)),
      (8L, "g", 8L, 4L, 4L, Some(1000000L)),
      (9L, "d", 7L, 7L, 0L, None),
      (10L, "d", 7L, 7L, 0L, None)))
  }

  test("rankAuc: midrank ties hand-traced; single-class groups dropped") {
    import spark.implicits._
    val df = Seq(
      // group g: pos {0.9, 0.7}, neg {0.7, 0.1}
      //   pairs: 0.9>0.7, 0.9>0.1, 0.7~0.7 (half), 0.7>0.1 → AUC 3.5/4
      ("g", 0.9, 1L), ("g", 0.7, 1L), ("g", 0.7, 0L), ("g", 0.1, 0L),
      // group p: perfect separation → AUC 1
      ("p", 0.8, 1L), ("p", 0.2, 0L),
      // group o: only positives → dropped
      ("o", 0.5, 1L), ("o", 0.6, 1L))
      .toDF("src", "score", "label")
    val out = Profile.rankAuc(df, "score", "label", "src")
      .as[(String, Long, Long, Long)].collect()
    assert(out.toSeq == Seq(("g", 2L, 2L, 875000L), ("p", 1L, 1L, 1000000L)))
  }

  test("rankAuc: distinct (group, score) pairs past maxDistinct raise_error " +
      "with a quantize-first instruction (continuous-double adversary)") {
    import spark.implicits._
    // all-distinct doubles: the histogram IS the row frame — the exact
    // silent degradation VERDICT r12 item 1 flagged (x134's raw score)
    val rows = (1L to 400L).map(i => ("s" + (i % 2), i * 0.70000001, i % 3 min 1))
      .toDF("src", "score", "label")
    val e = intercept[Exception] {
      Profile.rankAuc(rows, "score", "label", "src", maxDistinct = 100L)
        .collect()
    }
    assert(e.getMessage.contains("histogram-collapse envelope"), e.getMessage)
    // the same frame under the envelope still produces the exact AUC
    val ok = Profile.rankAuc(rows, "score", "label", "src",
      maxDistinct = 400L).collect()
    val dflt = Profile.rankAuc(rows, "score", "label", "src").collect()
    assert(ok.toSeq == dflt.toSeq && ok.nonEmpty)
  }

  test("rankAuc: envelope fires on an ALL-degenerate-group adversary whose " +
      "output is empty (guard threads the histogram, not emitted rows)") {
    import spark.implicits._
    // every group is single-label → zero output rows after the
    // n_pos/n_neg filter; an output-riding guard never fires (ADVICE
    // r13) even though the oversized window still executed
    val rows = (1L to 400L).map(i => ("s" + (i % 4), i * 0.30000007, (i % 4) min 1))
      .toDF("src", "score", "label")
      .filter(org.apache.spark.sql.functions.col("src") =!= "s0" ||
        org.apache.spark.sql.functions.col("label") === 0L)
      .filter(org.apache.spark.sql.functions.col("src") === "s0" ||
        org.apache.spark.sql.functions.col("label") === 1L)
    val e = intercept[Exception] {
      Profile.rankAuc(rows, "score", "label", "src", maxDistinct = 50L)
        .collect()
    }
    assert(e.getMessage.contains("histogram-collapse envelope"), e.getMessage)
    // under the envelope the same degenerate frame is (still) empty
    assert(Profile.rankAuc(rows, "score", "label", "src",
      maxDistinct = 5000L).collect().isEmpty)
  }

  test("hillTailIndex: hand-traced ln ratios against the (k+1)-th order " +
      "statistic; non-positive values excluded") {
    import spark.implicits._
    val df = Seq((1L, 16L), (2L, 8L), (3L, 8L), (4L, 4L), (5L, 2L),
      (6L, 1L), (7L, 0L), (8L, -3L)).toDF("doc_id", "v")
    val out = Profile.hillTailIndex(df, "v", "doc_id", k = 4)
      .as[(Long, Long, Long, Option[Long])].collect()
    // top-5 = [16,8,8,4,2], ref = 2; lns: ln8, ln4, ln4, ln2 →
    // (2079442+1386294+1386294+693147) div 4 = 1386294 micro;
    // α = 10¹² div 1386294
    assert(out.toSeq == Seq((4L, 2L, 1386294L, Some(721347L))))
  }

  test("ksAgainstCorpus: hand-traced integer max-gap and asymptotic " +
      "critical value") {
    import spark.implicits._
    val df = Seq(("A", 1L), ("A", 2L), ("B", 3L), ("B", 4L))
      .toDF("source", "n_chars")
    val out = Profile.ksAgainstCorpus(df, "n_chars", "source")
      .as[(String, Long, Long, Long, Boolean)].collect()
    // A's CDF leads the corpus by max |2·4 − 2·2|/(2·4) = 1/2;
    // crit = 1.358·√(6/8) = 1.176062
    assert(out.toSeq == Seq(
      ("A", 2L, 500000L, 1176062L, false),
      ("B", 2L, 500000L, 1176062L, false)))
  }

  test("jsonKeyProfile: keys from the rows themselves, string-compared " +
      "ranges, null JSON rows count in coverage's denominator only") {
    import spark.implicits._
    val df = Seq(
      Some("""{"a": 1, "b": "x"}"""),
      Some("""{"a": 2}"""),
      Some("""{"b": "y"}"""),
      None)
      .toDF("props")
    val rows = Profile.jsonKeyProfile(df, "props")
      .as[(String, Long, Long, Long, Long, String, String)].collect()
    assert(rows.toSeq == Seq(
      ("a", 2L, 4L, 500000L, 2L, "1", "2"),
      ("b", 2L, 4L, 500000L, 2L, "x", "y")))
  }

  test("kAnonymityAudit: only sub-k cells surface, ordered by the tuple") {
    import spark.implicits._
    val docs = (
      (1 to 5).map(i => (i.toLong, "en", "s1", 100L)) ++
      Seq((6L, "en", "s1", 600L), (7L, "en", "s1", 700L),
        (8L, "de", "s2", 10L)))
      .toDF("doc_id", "lang", "source", "n_chars")
    val out = Profile.kAnonymityAudit(docs,
        Seq($"lang", $"source",
          org.apache.spark.sql.functions.expr("n_chars div 500")),
        k = 5, names = Seq("lang", "source", "len_bucket"))
      .as[(String, String, Long, Long)].collect()
    assert(out.toSeq == Seq(
      ("de", "s2", 0L, 1L),
      ("en", "s1", 1L, 2L)))
  }

  test("designEffect: hand-traced inverse-frequency weights; an 8/2 split " +
      "costs deff 1.5625") {
    import spark.implicits._
    val df = ((1 to 8).map(i => (i.toLong, "en")) ++
      Seq((9L, "de"), (10L, "de"))).toDF("doc_id", "lang")
    val out = Profile.designEffect(df, "lang")
      .as[(String, Long, Long, Double, Double)].collect()
    assert(out.toSeq == Seq(
      ("de", 2L, 2500000L, 6.4, 1.5625),
      ("en", 8L, 625000L, 6.4, 1.5625)))
  }

  test("fdHistogram: width 2·IQR/∛n hand-traced; sparse integer bins") {
    import spark.implicits._
    val df = (1L to 8L).map(v => (v, v)).toDF("doc_id", "n_chars")
    val out = Profile.fdHistogram(df, "n_chars")
      .as[(Long, Long, Long, Long, Long)].collect()
    // IQR = 6−2 = 4, width = round(8/∛8) = 4, bins (v−1) div 4
    assert(out.toSeq == Seq(
      (0L, 1L, 4L, 4L, 2L),
      (1L, 5L, 4L, 4L, 2L)))
  }

  test("rankAuc: a reversed score ranks at exactly 1 − AUC") {
    import spark.implicits._
    val base = Seq(("g", 0.9, 1L), ("g", 0.4, 1L), ("g", 0.6, 0L),
      ("g", 0.1, 0L))
    val fwd = Profile.rankAuc(base.toDF("src", "score", "label"),
      "score", "label", "src").select("auc_micro").as[Long].head()
    val rev = Profile.rankAuc(base.map { case (s, v, l) => (s, -v, l) }
        .toDF("src", "score", "label"),
      "score", "label", "src").select("auc_micro").as[Long].head()
    assert(fwd == 750000L && rev == 250000L)
  }

  test("functionalDependencyAudit: holding and violated FDs, null " +
      "dependents count as mappings") {
    import spark.implicits._
    val df = Seq(
      (1L, "a", "x"), (2L, "a", "x"),   // a -> x consistent
      (3L, "b", "y"), (4L, "b", "z"),   // b maps to y AND z: violation
      (5L, "c", null))                  // null dependent still a mapping
      .toDF("id", "det1", "dep1")
    val out = Profile.functionalDependencyAudit(df,
        Seq("det1" -> "dep1", "id" -> "det1"))
      .as[(String, String, Long, Long, Long, Boolean)].collect()
    assert(out.toSeq == Seq(
      // det1: {a,b,c}=3; pairs {(a,x),(b,y),(b,z),(c,null)}=4 -> 1 violation
      ("det1", "dep1", 3L, 4L, 1L, false),
      // id unique -> determines everything
      ("id", "det1", 5L, 5L, 0L, true)))
  }

  test("functionalDependencyAudit: NULL determinants are excluded from " +
      "both counts — a null-A row cannot fake a violation (ADVICE r10)") {
    import spark.implicits._
    val df = Seq(
      (1L, Option("a"), "x"), (2L, Option("a"), "x"),
      (3L, Option("b"), "y"),
      (4L, Option.empty[String], "z"))  // NULL determinant row
      .toDF("id", "det1", "dep1")
    val out = Profile.functionalDependencyAudit(df, Seq("det1" -> "dep1"))
      .as[(String, String, Long, Long, Long, Boolean)].collect()
    // pre-fix: n_pairs_distinct counted struct(null, z) → violations=1,
    // holds=false despite the FD holding on every non-null determinant
    assert(out.toSeq == Seq(("det1", "dep1", 2L, 2L, 0L, true)), out.toSeq)
  }

  test("referentialIntegrityAudit: orphans vs null keys, intact edges") {
    import spark.implicits._
    val parent = Seq(10L, 20L).toDF("pk")
    val childA = Seq(Some(10L), Some(10L), Some(99L), None).toDF("fk")
    val childB = Seq(Some(20L)).toDF("fk")
    val out = Profile.referentialIntegrityAudit(Seq(
        ("a->p", childA, "fk", parent, "pk"),
        ("b->p", childB, "fk", parent, "pk")))
      .as[(String, Long, Long, Long, Boolean)].collect()
    assert(out.toSeq == Seq(
      ("a->p", 4L, 1L, 1L, false), // one null, one orphan (99)
      ("b->p", 1L, 0L, 0L, true)))
  }

  test("lognormalityCheck: moments replay the exact quantized pipeline; " +
      "tiny groups yield null verdicts; non-positive values excluded") {
    import spark.implicits._
    val vals = Seq(100L, 150L, 200L, 300L, 450L, 700L, 1100L, 1800L, 3000L, 5000L)
    val df = (vals.map(v => (v, "a")) ++ Seq((10L, "tiny"), (20L, "tiny"),
      (0L, "a"), (-5L, "a"))).toDF("n_chars", "source")
    val out = Profile.lognormalityCheck(df, "n_chars", "source")
      .collect().map(r => r.getString(0) -> r).toMap
    // replicate the pipeline: centi-nat ln (HALF_UP), floor mean,
    // integer central sums, double S/K/JB
    val xs = vals.map(v => BigDecimal(math.log(v.toDouble) * 100.0)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong)
    val n = xs.length.toLong
    val mu = xs.sum / n
    val ds = xs.map(_ - mu)
    val m2 = ds.map(d => d * d).sum.toDouble
    val m3 = ds.map(d => d * d * d).sum.toDouble
    val m4 = ds.map(d => d * d * d * d).sum.toDouble
    val skew = math.round(m3 / n / math.sqrt((m2 / n) * (m2 / n) * (m2 / n)) * 1e6)
    val kurt = math.round((m4 * n / (m2 * m2) - 3.0) * 1e6)
    val a = out("a")
    assert(a.getLong(1) == n && a.getLong(2) == skew && a.getLong(3) == kurt,
      a.toString)
    val jb = math.round(n.toDouble / 6.0 *
      ((skew / 1e6) * (skew / 1e6) + (kurt / 1e6) * (kurt / 1e6) / 4.0) * 1e6)
    assert(a.getLong(4) == jb && !a.isNullAt(5), a.toString)
    val t = out("tiny")
    assert(t.getLong(1) == 2L && t.isNullAt(2) && t.isNullAt(4) && t.isNullAt(5))
  }

  test("powerAnalysis: n/arm replays the z-formula over micro sigma/delta; " +
      "singletons carry null verdicts") {
    import spark.implicits._
    val df = Seq((10L, "a"), (20L, "a"), (30L, "b")).toDF("n_chars", "source")
    val out = Profile.powerAnalysis(df, "n_chars", "source")
      .collect().map(r => r.getString(0) -> r).toMap
    val a = out("a")
    // mean 15e6; sd = sqrt(250 - 225) = 5 -> 5e6; corpus mean 20 -> mde 1e6
    assert(a.getLong(1) == 2L && a.getLong(2) == 15000000L &&
      a.getLong(3) == 5000000L && a.getLong(4) == 1000000L, a.toString)
    val expectedN = math.ceil(Profile.PowerTwoZSquared * 5e6 * 5e6 /
      (1e6 * 1e6)).toLong
    assert(a.getLong(5) == expectedN && !a.getBoolean(6), a.toString)
    val b = out("b")
    assert(b.getLong(1) == 1L && b.isNullAt(3) && b.isNullAt(5) && b.isNullAt(6))
  }
  test("lDiversityProfile: class sizes, l-diversity, both verdicts hand-traced") {
    import spark.implicits._
    val df = Seq(
      ("A", 0L, "en"), ("A", 0L, "de"), ("A", 0L, "en"),
      ("A", 0L, "fr"), ("A", 0L, "en"),             // n=5, l=3: both pass
      ("A", 1L, "en"), ("A", 1L, "en"),             // n=2, l=1: both fail
      ("B", 0L, "en"), ("B", 0L, "de"), ("B", 0L, "es"),
      ("B", 0L, "zh"), ("B", 0L, "fr"), ("B", 0L, "en"))
      .toDF("src", "bucket", "lang")
    val out = Profile.lDiversityProfile(df, Seq("src", "bucket"), "lang")
      .as[(String, Long, Long, Long, Boolean, Boolean)].collect()
    assert(out.toSeq == Seq(
      ("A", 0L, 5L, 3L, true, true),
      ("A", 1L, 2L, 1L, false, false),
      ("B", 0L, 6L, 5L, true, true)))
  }
  test("exactQuantilesByGroup: percentile_disc rank rule hand-traced; " +
      "nulls excluded; the cardinality envelope raise_errors") {
    import spark.implicits._
    val df = ((1L to 10L).map(v => ("g1", Some(v))) ++
      Seq(("g2", Some(5L)), ("g2", Some(5L)), ("g2", Some(5L)),
        ("g2", Some(7L)), ("g2", Option.empty[Long])))
      .toDF("src", "v")
    val out = Profile.exactQuantilesByGroup(df, "v", "src",
        Seq(25, 50, 75, 90, 99))
      .as[(String, Long, Long, Long, Long, Long, Long)].collect()
    // g1 1..10: ranks ceil(p*n/100) = 3,5,8,9,10 -> values 3,5,8,9,10
    // g2 [5,5,5,7] (null dropped): ranks 1,2,3,4,4 -> 5,5,5,7,7
    assert(out.toSeq == Seq(
      ("g1", 10L, 3L, 5L, 8L, 9L, 10L),
      ("g2", 4L, 5L, 5L, 5L, 7L, 7L)))
    val e = intercept[Exception] {
      Profile.exactQuantilesByGroup(df, "v", "src", Seq(50),
        maxDistinct = 3L).collect()
    }
    assert(e.getMessage.contains("histogram-collapse envelope"), e.getMessage)
  }

  test("giniByGroup: hand-traced Lorenz identity off the histogram; " +
      "uniform group reads 0; envelope and negative values raise") {
    import spark.implicits._
    // A [1,2,3,4]: 2S=60, T=10, n=4 -> (60-50)*1e6/(40) = 250000
    // B [5,5,5]: 2S=60, T=15, n=3 -> (60-60)/(45) = 0
    val df = (Seq(1L, 2L, 3L, 4L).map(("A", _)) ++
      Seq(5L, 5L, 5L).map(("B", _))).toDF("src", "v")
    val out = Profile.giniByGroup(df, "v", "src")
      .as[(String, Long, Long, Long)].collect()
    assert(out.toSeq == Seq(("A", 4L, 10L, 250000L), ("B", 3L, 15L, 0L)))
    // extreme concentration: [0,0,0,12] -> 2S=96, T=12, n=4
    // -> (96-60)*1e6/48 = 750000 = (n-1)/n
    val ext = Profile.giniByGroup(
        Seq(0L, 0L, 0L, 12L).map(("C", _)).toDF("src", "v"), "v", "src")
      .as[(String, Long, Long, Long)].collect()
    assert(ext.toSeq == Seq(("C", 4L, 12L, 750000L)))
    val eEnv = intercept[Exception] {
      Profile.giniByGroup(df, "v", "src", maxDistinct = 2L).collect()
    }
    assert(eEnv.getMessage.contains("histogram-collapse envelope"),
      eEnv.getMessage)
    val eNeg = intercept[Exception] {
      Profile.giniByGroup(Seq(("A", -1L), ("A", 3L)).toDF("src", "v"),
        "v", "src").collect()
    }
    assert(eNeg.getMessage.contains("undefined for negative"), eNeg.getMessage)
  }
  test("contributionCapping: per-(user, day) units, clipped counts and " +
      "exact loss share per cap") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val ev = (Seq.fill(5)(("u1", "2024-01-01 10:00:00")) ++
      Seq(("u1", "2024-01-02 10:00:00")) ++
      Seq.fill(2)(("u2", "2024-01-01 09:00:00")))
      .map { case (u, t) => (u, ts(t)) }.toDF("user_id", "ts")
    val out = Profile.contributionCapping(ev, Seq(3, 1))
      .as[(Long, Long, Long, Long, Long)].collect()
    // units: (u1,d1)=5, (u1,d2)=1, (u2,d1)=2; total 8
    assert(out.toSeq == Seq(
      (1L, 3L, 2L, 5L, 625000L),
      (3L, 3L, 1L, 2L, 250000L)))
  }
  test("valuePareto: top-p% cuts off the descending histogram, value ties " +
      "at the cut included; envelope raises") {
    import spark.implicits._
    // per-key totals [100, 50, 30, 10, 10], total 200, n=5
    val df = Seq(("a", 60L), ("a", 40L), ("b", 50L), ("c", 30L),
      ("d", 10L), ("e", 10L)).toDF("k", "v")
    val out = Profile.valuePareto(df, "k", "v", Seq(20, 40, 80, 100))
      .as[(Long, Long, Long, Long)].collect()
    assert(out.toSeq == Seq(
      (20L, 1L, 100L, 500000L),
      (40L, 2L, 150L, 750000L),
      (80L, 5L, 200L, 1000000L),  // rank 4 lands mid-tie: BOTH 10s join
      (100L, 5L, 200L, 1000000L)))
    val e = intercept[Exception] {
      Profile.valuePareto(df, "k", "v", Seq(50), maxDistinct = 2L).collect()
    }
    assert(e.getMessage.contains("histogram-collapse envelope"), e.getMessage)
  }

  test("conformalCoverage: hand-traced thresholds — rank past n_cal " +
      "reads +inf (null) and covers everything; the finite rank picks " +
      "the exact order statistic") {
    import spark.implicits._
    // cal: values 10,20,30,100 -> median rank ceil(4/2)=2
    // -> med=20; residuals [0,10,10,80]. eval: 20,150 ->
    // residuals [0,130].
    val rows = Seq((true, "g", 10L), (true, "g", 20L), (true, "g", 30L),
      (true, "g", 100L), (false, "g", 20L), (false, "g", 150L))
      .toDF("is_cal", "source", "value")
    val out = Profile.conformalCoverage(rows)
      .as[(Long, Long, Long, Option[Long], Long, Long, Long)].collect()
    // k = ceil(5*(100-p)/100): p=1,5,10 -> 5 > n_cal=4 -> null thr;
    // p=20 -> k=4 -> 4th smallest residual = 80 -> covers only 0
    assert(out.toSeq == Seq(
      (1L, 990000L, 4L, None, 2L, 2L, 1000000L),
      (5L, 950000L, 4L, None, 2L, 2L, 1000000L),
      (10L, 900000L, 4L, None, 2L, 2L, 1000000L),
      (20L, 800000L, 4L, Some(80L), 2L, 1L, 500000L)))
  }

  test("conformalCoverage: custom pcts, mid-spine rank, and group " +
      "discipline — a group with no calibration rows is excluded") {
    import spark.implicits._
    val rows = Seq((true, "g", 10L), (true, "g", 20L), (true, "g", 30L),
      (true, "g", 100L), (false, "g", 20L), (false, "g", 150L),
      (false, "h", 999L)) // h never calibrates -> its eval row drops
      .toDF("is_cal", "source", "value")
    val out = Profile.conformalCoverage(rows, pcts = Seq(50))
      .as[(Long, Long, Long, Option[Long], Long, Long, Long)].collect()
    // k = ceil(5*50/100) = 3 -> 3rd smallest of [0,10,10,80] = 10;
    // eval residuals [0,130] -> 1 covered
    assert(out.toSeq == Seq((50L, 500000L, 4L, Some(10L), 2L, 1L, 500000L)))
  }

  test("conformalCoverage: histogram-collapse envelope refuses loudly") {
    import spark.implicits._
    val rows = (0L to 40L).map(i => (i % 2 == 0, "g", i * i)).toDF(
      "is_cal", "source", "value")
    val e = intercept[Exception] {
      Profile.conformalCoverage(rows, maxDistinct = 3L).collect()
    }
    assert(e.getMessage.contains("histogram-collapse envelope"), e.getMessage)
  }

  /** BigInt replay of the rakingWeights integer-IPF contract — the
    * same truncating arithmetic, independently implemented. */
  private def ipfMirror(cells: Map[(String, String), Long],
      iterations: Int): Map[(String, String), (BigInt, BigInt)] = {
    val tot = BigInt(cells.values.sum)
    val rs0 = cells.keys.map(_._1).toSeq.distinct
    val cs0 = cells.keys.map(_._2).toSeq.distinct
    val tr = tot * 1000000 / rs0.size
    val tc = tot * 1000000 / cs0.size
    var w = cells.map { case (k, _) => k -> BigInt(1000000) }
    for (_ <- 1 to iterations) {
      val rm = rs0.map(r => r -> cells.collect {
        case ((r2, c), n) if r2 == r => BigInt(n) * w((r2, c))
      }.sum).toMap
      w = w.map { case ((r, c), v) =>
        (r, c) -> ((v * (tr * 1000000 / rm(r)) / 1000000) max BigInt(1)) }
      val cm = cs0.map(c => c -> cells.collect {
        case ((r, c2), n) if c2 == c => BigInt(n) * w((r, c2))
      }.sum).toMap
      w = w.map { case ((r, c), v) =>
        (r, c) -> ((v * (tc * 1000000 / cm(c)) / 1000000) max BigInt(1)) }
    }
    val tm = cells.map { case (k, n) => BigInt(n) * w(k) }.sum
    cells.map { case (k, n) =>
      k -> (w(k), BigInt(n) * w(k) * 1000000 / tm) }
  }

  test("rakingWeights: a uniform table keeps every weight at 1e6; an " +
      "asymmetric 2x2 matches the BigInt replay and pulls margins " +
      "toward uniform") {
    import spark.implicits._
    def expand(cells: Map[(String, String), Long]) =
      cells.toSeq.flatMap { case ((r, c), n) =>
        Seq.fill(n.toInt)((r, c)) }.toDF("lang", "source")
    val uni = Map(("r1", "c1") -> 25L, ("r1", "c2") -> 25L,
      ("r2", "c1") -> 25L, ("r2", "c2") -> 25L)
    val uniOut = Profile.rakingWeights(expand(uni))
      .as[(String, String, Long, Long, Long)].collect()
    assert(uniOut.toSeq == Seq(
      ("r1", "c1", 25L, 1000000L, 250000L),
      ("r1", "c2", 25L, 1000000L, 250000L),
      ("r2", "c1", 25L, 1000000L, 250000L),
      ("r2", "c2", 25L, 1000000L, 250000L)))
    val skew = Map(("r1", "c1") -> 30L, ("r1", "c2") -> 10L,
      ("r2", "c1") -> 10L, ("r2", "c2") -> 50L)
    for (iters <- Seq(1, 4)) {
      val out = Profile.rakingWeights(expand(skew), iterations = iters)
        .as[(String, String, Long, Long, Long)].collect()
      val mirror = ipfMirror(skew, iters)
      assert(out.toSeq == skew.keys.toSeq.sorted.map { case (r, c) =>
        (r, c, skew((r, c)),
          mirror((r, c))._1.toLong, mirror((r, c))._2.toLong) },
        s"iterations=$iters")
    }
    // convergence: weighted row masses within 1% of the uniform
    // target (N*1e6/2 = 5e7) after 4 iterations
    val m4 = ipfMirror(skew, 4)
    for (r <- Seq("r1", "r2")) {
      val mass = skew.collect { case ((r2, c), n) if r2 == r =>
        BigInt(n) * m4((r2, c))._1 }.sum
      assert((mass - BigInt(50000000)).abs < BigInt(500000),
        s"row $r mass $mass")
    }
  }

  private def fleiss(rows: Seq[(String, String, String)]) =
    Profile.fleissKappa(rows.toDF("doc_id", "rater", "label"))
      .as[(Long, Long, Long, Long, Long, Long, Option[Long])]
      .collect().toSeq

  test("fleissKappa: perfect mixed-label agreement reads 1e6; an " +
      "all-one-category panel has undefined kappa") {
    import spark.implicits._
    // s1 all x, s2 all y: pbar=1, pe=1/2 -> kappa 1e6
    val perfect = for {
      (s, l) <- Seq(("s1", "x"), ("s2", "y")); r <- Seq("r1", "r2", "r3")
    } yield (s, r, l)
    assert(fleiss(perfect) == Seq((2L, 0L, 3L, 2L, 1000000L, 500000L,
      Some(1000000L))))
    // every rating 'x': Pe = 1 -> kappa null, one category
    val mono = for {
      s <- Seq("s1", "s2"); r <- Seq("r1", "r2", "r3")
    } yield (s, r, "x")
    assert(fleiss(mono) == Seq((2L, 0L, 3L, 1L, 1000000L, 1000000L, None)))
  }

  test("fleissKappa: hand-traced disagreement — 2-1 splits both ways; " +
      "incomplete and duplicate-rater subjects are dropped and counted") {
    import spark.implicits._
    // s1: x,x,y; s2: x,y,y -> S1 = 5+5 = 10, pbar = (10-6)/12 = 1/3,
    // Cx=Cy=3 -> pe = 1/2, kappa = (333333-500000)*1e6 div 500000
    val split = Seq(
      ("s1", "r1", "x"), ("s1", "r2", "x"), ("s1", "r3", "y"),
      ("s2", "r1", "x"), ("s2", "r2", "y"), ("s2", "r3", "y"))
    assert(fleiss(split) == Seq((2L, 0L, 3L, 2L, 333333L, 500000L,
      Some(-333334L))))
    // s3 rated by one rater only; s4 rated 3 times but twice by r1
    val dirty = split ++ Seq(("s3", "r1", "x"),
      ("s4", "r1", "x"), ("s4", "r1", "y"), ("s4", "r2", "x"))
    assert(fleiss(dirty) == Seq((2L, 2L, 3L, 2L, 333333L, 500000L,
      Some(-333334L))))
  }

  private def dsq(rows: Seq[(String, String, String)]) =
    Profile.raterQuality(rows.toDF("doc_id", "rater", "label"))
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq

  test("raterQuality: hand-traced accuracies and Laplace log-odds; a " +
      "unanimous-majority panel never flips") {
    import spark.implicits._
    // a always 'x'; b wrong on s4 only per majority; c wrong on s3
    val votes = Seq(
      ("s1", "a", "x"), ("s1", "b", "x"), ("s1", "c", "x"),
      ("s2", "a", "x"), ("s2", "b", "x"), ("s2", "c", "x"),
      ("s3", "a", "x"), ("s3", "b", "x"), ("s3", "c", "y"),
      ("s4", "a", "x"), ("s4", "b", "y"), ("s4", "c", "y"))
    // majorities: s1,s2,s3 -> x; s4 -> y
    // a: 3/4, w = ln(4/2) = 693147; b: 4/4, w = ln(5/1) = 1609438;
    // c: 3/4 (disagrees s3, agrees s4), w = 693147
    // re-vote: s3 x-score 693147+1609438 > 693147; s4 y-score
    // 1609438+693147 > 693147 -> zero flips
    assert(dsq(votes) == Seq(
      ("a", 4L, 3L, 750000L, 693147L, 0L),
      ("b", 4L, 4L, 1000000L, 1609438L, 0L),
      ("c", 4L, 3L, 750000L, 693147L, 0L)))
  }

  test("raterQuality: two strong raters overturn a weak 3-rater " +
      "majority — the weighted consensus flips exactly one subject") {
    import spark.implicits._
    // s1-s6: majority 'p'; c,d,e each wrong twice; s7: c,d,e vote 'q'
    // (majority) against a,b -> maj q, but w_a+w_b = 2*ln(7/2) >
    // 3*ln(2) = w_c+w_d+w_e -> consensus flips s7 to 'p'
    val wrongOn = Map("c" -> Set("s1", "s2"), "d" -> Set("s3", "s4"),
      "e" -> Set("s5", "s6"))
    val votes =
      (for {
        s <- (1 to 6).map(i => s"s$i"); r <- Seq("a", "b", "c", "d", "e")
      } yield (s, r, if (wrongOn.getOrElse(r, Set()).contains(s)) "q"
        else "p")) ++
      Seq(("s7", "a", "p"), ("s7", "b", "p"), ("s7", "c", "q"),
        ("s7", "d", "q"), ("s7", "e", "q"))
    // a,b: 6/7 agree (disagree s7), w = ln(7/2) = 1252763
    // c,d,e: 5/7 agree, w = ln(6/3) = 693147
    assert(dsq(votes) == Seq(
      ("a", 7L, 6L, 857142L, 1252763L, 1L),
      ("b", 7L, 6L, 857142L, 1252763L, 1L),
      ("c", 7L, 5L, 714285L, 693147L, 1L),
      ("d", 7L, 5L, 714285L, 693147L, 1L),
      ("e", 7L, 5L, 714285L, 693147L, 1L)))
  }

  test("stratifiedSample: exactly k per stratum by 52-bit hash rank, " +
      "replayed by a window model; short strata emit all rows") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val df = (1L to 200L).map(i => (i, if (i % 3 == 0) "g0" else "g1"))
      .toDF("id", "grp")
    val out = Profile.stratifiedSample(df, "id", "grp", k = 10)
      .as[(String, Long, Long, Long)].collect().toSeq
      .sortBy(r => (r._1, r._2))
    // window model over the same 52-bit hash
    val modelRows = df.select(col("grp"), col("id"),
        graft.functions.TextFunctions.md5Bucket60(col("id")).as("h0"))
      .withColumn("h", expr("h0 div 256L"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("grp")).orderBy(col("h"), col("id"))))
      .filter(col("rank") <= 10)
      .select(col("grp"), col("rank").cast("long"), col("id"), col("h"))
      .as[(String, Long, Long, Long)].collect().toSeq
      .sortBy(r => (r._1, r._2))
    assert(out == modelRows, s"\n$out\nvs\n$modelRows")
    assert(out.count(_._1 == "g0") == 10 && out.count(_._1 == "g1") == 10)
    // a stratum smaller than k yields all its rows, ranked
    val tiny = Seq((1L, "t"), (2L, "t")).toDF("id", "grp")
    val t = Profile.stratifiedSample(tiny, "id", "grp", k = 10)
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(t.length == 2 && t.map(_._2).sorted == Seq(1L, 2L))
  }

  test("stratifiedSample: a non-integral key column fails fast at plan " +
      "time instead of silently nulling the emitted ids") {
    import spark.implicits._
    val strKeys = Seq(("doc-1", "g"), ("doc-2", "g")).toDF("id", "grp")
    val e = intercept[IllegalArgumentException] {
      Profile.stratifiedSample(strKeys, "id", "grp", k = 5)
    }
    assert(e.getMessage.contains("integral"))
    val dblKeys = Seq((1.5, "g"), (2.5, "g")).toDF("id", "grp")
    intercept[IllegalArgumentException] {
      Profile.stratifiedSample(dblKeys, "id", "grp", k = 5)
    }
    // integer widths narrower than long still work
    val intKeys = Seq((1, "g"), (2, "g")).toDF("id", "grp")
    assert(Profile.stratifiedSample(intKeys, "id", "grp", k = 5)
      .count() == 2L)
  }

  test("weightedSample: replays a window model over the ES key, excludes " +
      "non-positive weights, and weight dominates selection odds") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    // ids 1..300, one stratum; weight 1000 for ids <= 30, 1 otherwise
    val df = (1L to 300L).map(i => (i, "g", if (i <= 30) 1000L else 1L))
      .toDF("id", "grp", "w")
    val out = Profile.weightedSample(df, "id", "grp", "w", k = 20)
      .as[(String, Long, Long, Long)].collect().toSeq.sortBy(_._2)
    assert(out.length == 20 && out.map(_._2) == (1L to 20L))
    // window model: same lnu quantization, same IEEE key division
    val model = df
      .withColumn("h", expr(
        "cast(conv(substring(md5(cast(id as string)), 1, 15), 16, 10)" +
          " as bigint) div 256L"))
      .withColumn("lnu", round(log(
        (col("h").cast("double") + lit(1.0)) / lit(4503599627370496.0))
        * lit(1000000.0)).cast("long"))
      .withColumn("key", col("lnu").cast("double") / col("w").cast("double"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("grp")).orderBy(col("key").desc, col("id"))))
      .filter(col("rank") <= 20)
      .select(col("grp"), col("rank").cast("long"), col("id"),
        round(col("key") * lit(1000000.0)).cast("long"))
      .as[(String, Long, Long, Long)].collect().toSeq.sortBy(_._2)
    assert(out == model, s"\n$out\nvs\n$model")
    // the 10%-of-rows heavy group should dominate a weighted draw:
    // with w ratio 1000:1 essentially every pick is heavy
    assert(out.count(_._3 <= 30L) >= 15,
      s"heavy ids underrepresented: $out")
    // non-positive weights are excluded outright
    val withBad = df.withColumn("w",
      when(col("id") <= 295, lit(0L)).otherwise(-col("id")))
    assert(Profile.weightedSample(withBad, "id", "grp", "w", k = 20)
      .count() == 0L)
    // non-integral key refused, same gate as stratifiedSample
    val strKeys = Seq(("a", "g", 1L)).toDF("id", "grp", "w")
    intercept[IllegalArgumentException] {
      Profile.weightedSample(strKeys, "id", "grp", "w", k = 5)
    }
  }

  test("effectiveSampleSize: hand-traced Kish ESS, truncating division, " +
      "non-positive weights excluded") {
    import spark.implicits._
    val df = Seq(
      ("g", 1L), ("g", 1L), ("g", 1L), ("g", 1L), ("g", 0L), // uniform + excluded
      ("h", 3L), ("h", 1L),                                  // skewed
      ("i", 1L), ("i", 2L), ("i", 4L))                       // non-exact division
      .toDF("grp", "w")
    val out = Profile.effectiveSampleSize(df, "grp", "w")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      // g: n=4 sw=4 sw2=4 → ESS 4.0, ratio 1.0 (the zero-w row gone)
      ("g", 4L, 4L, 4000000L, 1000000L),
      // h: sw=4 sw2=10 → 16e6/10 = 1.6e6; /2 → 0.8e6
      ("h", 2L, 4L, 1600000L, 800000L),
      // i: sw=7 sw2=21 → 49e6/21 = 2333333.3 → truncates; /3 → 777777
      ("i", 3L, 7L, 2333333L, 777777L)), out.toString)
  }
}

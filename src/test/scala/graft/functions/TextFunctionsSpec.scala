package graft.functions

import graft.SparkSpec
import graft.functions.TextFunctions._
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("tokens: whitespace split, empties dropped") {
    val r = Seq("  a  b\tc\nd  ", "", "   ").toDF("t")
      .select(tokens($"t")).as[Seq[String]].collect()
    assert(r(0) == Seq("a", "b", "c", "d"))
    assert(r(1).isEmpty && r(2).isEmpty)
  }

  test("words: lowercase alphanumeric runs") {
    val r = Seq("Hello, World! 42x").toDF("t")
      .select(words($"t")).as[Seq[String]].head()
    assert(r == Seq("hello", "world", "42x"))
  }

  test("tokenCount on fixture docs matches size(tokens)") {
    val d = spark.read.parquet(s"$sf001/documents.parquet").limit(50)
    val bad = d.select((tokenCount($"text") === size(tokens($"text"))).as("ok"))
      .filter(!$"ok").count()
    assert(bad == 0)
  }

  test("langId identifies obvious sentences") {
    val r = Seq(
      "the cat is on the mat and it is warm",
      "der Hund ist nicht mit der Katze im Haus",
      "el perro es un animal y la casa es grande",
      "le chien est dans la maison pour le moment",
      "这是一个中文句子",
      "zzz qqq xxx").toDF("t")
      .select(langId($"t")).as[String].collect()
    assert(r.toSeq == Seq("en", "de", "es", "fr", "zh", "und"))
  }

  test("jaccard of token arrays") {
    val r = Seq((Seq("a", "b"), Seq("b", "c"))).toDF("a", "b")
      .select(jaccard($"a", $"b")).as[Double].head()
    assert(r == 1.0 / 3.0)
  }

  test("qualityScore in [0,1] and penalizes junk") {
    val r = Seq(
      "This is a perfectly reasonable sentence with normal words in it for scoring.",
      "!!!! ???? ,,,, ;;;; ....").toDF("t")
      .select(qualityScore($"t")).as[Double].collect()
    assert(r.forall(v => v >= 0.0 && v <= 1.0))
    assert(r(0) > r(1))
  }

  test("contaminationScreen counts distinct benchmark grams per doc") {
    import graft.operators.TextAnalysis
    val bench = Seq((0L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val corpus = Seq(
      // bench 3-grams = {"alpha beta gamma", "beta gamma delta"};
      // doc 10 contains "alpha beta gamma" twice (distinct → 1 hit)
      // and "beta gamma delta" once → n_hits = 2
      (10L, "alpha beta gamma once and alpha beta gamma delta"),
      (11L, "nothing shared here at all with anything")
    ).toDF("doc_id", "text")
    val r = TextAnalysis.contaminationScreen(corpus, bench, ngram = 3)
      .as[(Long, Long)].collect().toMap
    assert(r == Map(10L -> 2L))
  }

  test("repetitionRatio: pure repetition → 1.0, distinct bigrams → 1/n") {
    import graft.operators.TextAnalysis
    val docs = Seq(
      (0L, "spam spam spam spam spam"),     // every bigram identical → 1.0
      (1L, "one two three four"),           // 3 distinct bigrams → 1/3
      (2L, "x")                             // < 2 words → no row
    ).toDF("doc_id", "text")
    val r = TextAnalysis.repetitionRatio(docs, ngram = 2)
      .as[(Long, Double)].collect().toMap
    assert(r.keySet == Set(0L, 1L))
    assert(r(0L) == 1.0)
    assert(r(1L) == 0.333333)
  }

  test("packSequences: chunked-cumsum pack assignment within strata") {
    import graft.operators.TextAnalysis
    val docs = Seq(
      (0L, "en", "a b c"),   // 3 tokens, starts at 0   → pack 0
      (1L, "en", "d e f g"), // 4 tokens, starts at 3   → pack 0
      (2L, "en", "h i"),     // 2 tokens, starts at 7   → pack 1
      (3L, "de", "x y z")    // own stratum, starts at 0 → pack 0
    ).toDF("doc_id", "lang", "text")
    val r = TextAnalysis.packSequences(docs, budget = 5)
      .select($"doc_id", $"pack_id").as[(Long, Long)].collect().toMap
    assert(r == Map(0L -> 0L, 1L -> 0L, 2L -> 1L, 3L -> 0L))
  }

  test("property: tokenCount non-negative, bounded by length, and stable under trim") {
    val gen = Gen.listOfN(200, Gen.asciiPrintableStr)
    val samples = gen.apply(Gen.Parameters.default, Seed(42L)).getOrElse(Nil)
    val df = samples.toDF("t")
    val rows = df.select(
      tokenCount($"t").as("n"), tokenCount(trim($"t")).as("nt"), length($"t").as("l")).collect()
    rows.foreach { r =>
      val n = r.getInt(0)
      assert(n >= 0 && n <= r.getInt(2) + 1)
      assert(n == r.getInt(1)) // leading/trailing whitespace never changes the count
    }
  }
}

package graft.transform

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests promised by SURVEY §5 for the reference cell
  * semantics (C1 quote/space strip, C9/F4 fallible coordinate cast):
  * deterministic scalacheck samples evaluated through the real Column
  * expressions in one DataFrame pass per property.
  */
class TransformPropertiesSpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](gen: Gen[A], n: Int, seed: Long): List[A] =
    {
    val got = Gen.listOfN(n, gen).apply(Gen.Parameters.default, Seed(seed)).getOrElse(Nil)
    assert(got.nonEmpty, "generator produced no samples - property would pass vacuously")
    got
  }

  private val cellGen: Gen[String] = for {
    core <- Gen.asciiPrintableStr
    lq <- Gen.oneOf("", "\"", "\"\"", "'", " ", "  \"")
    rq <- Gen.oneOf("", "\"", "\"\"", "'", " ", "\" ")
  } yield lq + core + rq

  // Independent Scala models of the Python reference cell cleaners.
  // NOTE the cleaners are deliberately NOT idempotent — `"x" `
  // becomes `"x"` then `x` on a second pass, exactly like the
  // reference's .strip('"') / .strip() compose order — so the right
  // property is model equivalence, not a fixed point.
  private def pyStrip(s: String, ch: Char): String =
    s.dropWhile(_ == ch).reverse.dropWhile(_ == ch).reverse
  private def refClearWhiteSpaces(s: String): String =
    pyStrip(s, '"').trim // strip('"') THEN strip() (publish_to_catalog.py:148-154)
  private def refStripNum(s: String): String =
    pyStrip(s.trim.replace('\'', '"'), '"') // :175-178 order

  test("C1: stripQuotesWs matches the reference clearWhiteSpaces on random cells") {
    val in = samples(cellGen, 400, 1L)
    val r = in.toDF("c")
      .select(col("c"), StopsTransforms.stripQuotesWs(col("c")).as("got"))
      .as[(String, String)].collect()
    r.foreach { case (c, got) =>
      assert(got == refClearWhiteSpaces(c), s"input '$c'")
    }
  }

  test("C1/C2: stripNumCell matches the reference stripNum on random cells") {
    val in = samples(cellGen, 400, 2L)
    val r = in.toDF("c")
      .select(col("c"), StopsTransforms.stripNumCell(col("c")).as("got"))
      .as[(String, String)].collect()
    r.foreach { case (c, got) =>
      assert(got == refStripNum(c), s"input '$c'")
    }
  }

  test("C9/F4: coordValid accepts exactly the in-range castable pairs") {
    val latGen = Gen.chooseNum(-120.0, 120.0)
    val lonGen = Gen.chooseNum(-220.0, 220.0)
    val pairs = samples(Gen.zip(latGen, lonGen), 300, 3L)
    val quoted = pairs.zipWithIndex.map { case ((la, lo), i) =>
      // decorate every 3rd pair with the reference's quote wrapping
      if (i % 3 == 0) (s"'$la'", s" $lo ", la, lo) else (la.toString, lo.toString, la, lo)
    }
    val r = quoted.toDF("lat", "lon", "dlat", "dlon")
      .select(
        StopsTransforms.coordValid(col("lat"), col("lon")).as("valid"),
        col("dlat"), col("dlon"))
      .as[(Boolean, Double, Double)].collect()
    r.foreach { case (valid, la, lo) =>
      val expect = la >= -90 && la <= 90 && lo >= -180 && lo <= 180
      assert(valid == expect, s"coordValid($la, $lo) = $valid, expected $expect")
    }
    // non-numeric garbage never validates
    val junk = samples(Gen.alphaStr.suchThat(_.nonEmpty), 50, 4L)
    val j = junk.toDF("lat")
      .select(StopsTransforms.coordValid(col("lat"), lit("0")).as("valid"))
      .as[Boolean].collect()
    assert(j.forall(v => !v))
  }

  test("J5: upsert keys = target ∪ source, source wins on overlap") {
    val kvGen = Gen.zip(Gen.chooseNum(0, 40), Gen.identifier)
    val t = samples(kvGen, 60, 5L).distinctBy(_._1)
    val s = samples(kvGen, 60, 6L).distinctBy(_._1)
    val merged = CatalogTransforms.upsert(
        t.toDF("k", "v"), s.toDF("k", "v"), "k")
      .as[(Int, String)].collect().toMap
    val sm = s.toMap; val tm = t.toMap
    assert(merged.keySet == tm.keySet ++ sm.keySet)
    merged.foreach { case (k, v) => assert(v == sm.getOrElse(k, tm(k))) }
  }
}

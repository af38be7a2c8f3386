package graft.pipelines

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CorpusPipelineSpec extends SparkSpec {
  import spark.implicits._

  test("funnel drops junk, exact copies, and near-dups; report reconciles") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      (2L, "the quick brown fox jumps over the lazy dog near the river bank today"), // exact dup of 1
      (3L, "the quick brown fox jumps over the lazy dog near the river bank tonight"), // near dup
      (4L, "!!!! ???? ,,,, ;;;;"), // junk → quality gate
      (5L, "completely unrelated text about database engines and query optimization plans"),
      (6L, "ab") // too short → token gate
    ).toDF("doc_id", "text")

    val (cleaned, r) = CorpusPipeline.clean(corpus,
      CorpusPipeline.Config(minQuality = 0.5, minTokens = 3, nearDupJaccard = 0.5))

    assert(r.input == 6)
    assert(r.afterQuality == 4) // 4 and 6 dropped
    assert(r.afterLang == 4)    // no language gate configured
    assert(r.afterExact == 3)   // 2 dropped (exact dup, min-id 1 kept)
    assert(r.afterNearDup == 2) // 3 dropped (near dup of 1)
    val ids = cleaned.select($"doc_id").as[Long].collect().toSet
    assert(ids == Set(1L, 5L))

    // post-condition audit: every expectation passes on the CLEANED
    // frame; the same suite quantifies the dirt in the RAW input
    val cfg = CorpusPipeline.Config(minQuality = 0.5, minTokens = 3)
    val cleanVerdicts = CorpusPipeline.audit(cleaned, cfg)
      .select($"rule", $"pass").as[(String, Boolean)].collect().toMap
    assert(cleanVerdicts.nonEmpty && cleanVerdicts.values.forall(identity), cleanVerdicts)
    val rawViolations = CorpusPipeline.audit(corpus, cfg)
      .select($"rule", $"n_violations").as[(String, Long)].collect().toMap
    assert(rawViolations("quality>=0.5") > 0 && rawViolations("tokens>=3") > 0,
      rawViolations)
    cleaned.unpersist()
  }

  test("null-id rows pass through instead of vanishing") {
    val corpus = Seq(
      (Some(1L), "completely unrelated text about database engines and query plans"),
      (Option.empty[Long], "another perfectly unique document about streaming watermarks here"))
      .toDF("doc_id", "text")
    val (cleaned, r) = CorpusPipeline.clean(corpus,
      CorpusPipeline.Config(minQuality = 0.0, minTokens = 1))
    assert(r.afterNearDup == 2, r)
    assert(cleaned.filter($"doc_id".isNull).count() == 1)
    cleaned.unpersist()
  }

  test("cleanAndBalance: post-dedup strata inflate toward the largest") {
    val corpus = Seq(
      (1L, "en", "completely unrelated text about database engines and query plans"),
      (2L, "en", "another perfectly unique document about streaming watermarks here"),
      (3L, "en", "a third unique english document mentioning partitions and shuffles"),
      (4L, "en", "fourth unique english text about broadcast joins and skew salting"),
      (10L, "de", "der Hund ist nicht mit der Katze im Haus aber es ist warm"),
      (11L, "de", "die Sonne scheint heute hell und der Garten ist sehr ruhig"))
      .toDF("doc_id", "lang", "text")
    val (balanced, r) = CorpusPipeline.cleanAndBalance(corpus, "lang",
      CorpusPipeline.Config(minQuality = 0.0, minTokens = 1))
    assert(r.afterNearDup == 6, r)
    // en is the max stratum (4): 1 copy each; de (2 of 4, rem 0):
    // exactly 2 copies each → balanced census
    val census = balanced.groupBy($"lang").count()
      .as[(String, Long)].collect().toMap
    assert(census == Map("en" -> 4L, "de" -> 4L), census)
    assert(balanced.columns.contains("copy_idx"))
  }

  test("language gate runs and drops before dedup") {
    val corpus = Seq(
      (1L, "the cat is on the mat and it is very warm in the house today"),
      (2L, "der Hund ist nicht mit der Katze im Haus aber es ist warm"))
      .toDF("doc_id", "text")
    val (cleaned, r) = CorpusPipeline.clean(corpus,
      CorpusPipeline.Config(minQuality = 0.0, minTokens = 1, keepLangs = Seq("en")))
    assert(r.afterLang == 1 && r.afterNearDup == 1)
    assert(cleaned.select($"doc_id").as[Long].head() == 1L)
    cleaned.unpersist()
  }

  test("runs end-to-end on the fixture corpus") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    val (cleaned, r) = CorpusPipeline.clean(docs)
    assert(r.input == 500)
    assert(r.afterNearDup > 0)
    assert(r.afterQuality <= r.input && r.afterExact <= r.afterLang &&
      r.afterNearDup <= r.afterExact)
    assert(cleaned.count() == r.afterNearDup)
    cleaned.unpersist()
  }
}

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
    assert(r.afterExact == 3)   // 2 dropped (exact dup, min-id 1 kept)
    assert(r.afterNearDup == 2) // 3 dropped (near dup of 1)
    assert(r.output == 2)
    val ids = cleaned.select($"doc_id").as[Long].collect().toSet
    assert(ids == Set(1L, 5L))
  }

  test("runs end-to-end on the fixture corpus") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    val (cleaned, r) = CorpusPipeline.clean(docs)
    assert(r.input == 500)
    assert(r.output > 0 && r.output <= r.afterNearDup)
    assert(r.afterQuality <= r.input && r.afterExact <= r.afterQuality &&
      r.afterNearDup <= r.afterExact)
    assert(cleaned.count() == r.output)
  }
}

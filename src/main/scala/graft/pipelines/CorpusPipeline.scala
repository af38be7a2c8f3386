package graft.pipelines

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._
import graft.operators.Dedup

/** End-to-end training-corpus cleaning — the composition the extension
  * operators exist for (SURVEY north star: the LLM-data-pipeline
  * surface at 100 TB):
  *
  *   quality filter → exact dedup → MinHash near-dup dedup →
  *   language filter → cleaned corpus + per-stage attrition report.
  *
  * Stage order is the cost-ordered funnel: cheap narrow filters first
  * (quality, codegen'd projections), then the hash-groupBy exact pass,
  * and the LSH near-dup pass last so it sketches only survivors.
  * Every stage is a pure DataFrame transform; nothing collects to the
  * driver except the final counts.
  */
object CorpusPipeline {

  final case class Config(
      idCol: String = "doc_id",
      textCol: String = "text",
      minQuality: Double = 0.5,
      minTokens: Int = 5,
      keepLangs: Seq[String] = Nil, // empty = keep all
      nearDupJaccard: Double = 0.5,
      minhashBands: Int = 16,
      minhashRowsPerBand: Int = 8)

  final case class Report(
      input: Long, afterQuality: Long, afterExact: Long,
      afterNearDup: Long, output: Long)

  def clean(docs: DataFrame, cfg: Config = Config()): (DataFrame, Report) = {
    val id = col(cfg.idCol)
    val text = col(cfg.textCol)
    val input = docs.count()

    // 1. quality + length gate (narrow, codegen'd)
    val q = docs.filter(
      qualityScore(text) >= cfg.minQuality && tokenCount(text) >= cfg.minTokens)
    val afterQuality = q.count()

    // 2. exact dedup: keep the min-id row per distinct content
    val keepExact = Dedup.exact(q, cfg.idCol, cfg.textCol)
      .select(col("keep_id").as(cfg.idCol))
    val exact = q.join(keepExact, Seq(cfg.idCol), "left_semi")
    val afterExact = exact.count()

    // 3. near-dup dedup: from each near-dup pair, drop the larger id
    //    (transitively: anything that is the `doc_b` of a surviving
    //    `doc_a` goes — the standard one-pass LSH dedup policy; full
    //    connected-component resolution is an iterative variant)
    val losers = Dedup.minhashNearDup(exact, cfg.idCol, cfg.textCol,
        bands = cfg.minhashBands, rowsPerBand = cfg.minhashRowsPerBand,
        minJaccard = cfg.nearDupJaccard)
      .select(col("doc_b").as(cfg.idCol)).distinct()
    val deduped = exact.join(losers, Seq(cfg.idCol), "left_anti")
    val afterNearDup = deduped.count()

    // 4. language gate (optional)
    val cleaned =
      if (cfg.keepLangs.isEmpty) deduped
      else deduped.filter(langId(text).isin(cfg.keepLangs: _*))
    val output = cleaned.count()

    (cleaned, Report(input, afterQuality, afterExact, afterNearDup, output))
  }
}

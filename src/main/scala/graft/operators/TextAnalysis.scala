package graft.operators

import graft.functions.TextFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus text-analysis operators: one narrow, codegen-friendly
  * projection per document (no shuffle until the caller aggregates).
  */
object TextAnalysis {

  /** Per-document analysis record: predicted language, token counts,
    * quality features + score, bottom-k fingerprint. */
  def profile(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    docs.select(
      col(idCol).as("doc_id"),
      langId(col(textCol)).as("lang_pred"),
      tokenCount(col(textCol)).as("n_tokens"),
      size(words(col(textCol))).as("n_words"),
      qualityFeatures(col(textCol)).as("features"),
      qualityScore(col(textCol)).as("quality"),
      fingerprint(col(textCol)).as("fp"))

  /** Language-ID confusion counts against a labeled `langCol`. */
  def langConfusion(docs: DataFrame, langCol: String = "lang",
      textCol: String = "text"): DataFrame =
    docs.select(col(langCol), langId(col(textCol)).as("lang_pred"))
      .groupBy(col(langCol), col("lang_pred"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col(langCol), col("lang_pred"))

  /** Docs sharing an identical content fingerprint (exact-ish near-dup
    * at fingerprint resolution): bucket join on the 32-bit hashed
    * sketch for shuffle economy, then VERIFY full fingerprint equality
    * — at ~100k docs the 32-bit bucket alone would already emit
    * birthday-collision false pairs. */
  def fingerprintDup(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", portableMd5: Boolean = false): DataFrame = {
    def fp(c: org.apache.spark.sql.Column) =
      if (portableMd5) fingerprintMd5(c) else fingerprint(c)
    val fps = docs.select(
        col(idCol).as("doc_id"),
        fp(col(textCol)).as("fp"),
        hash(fp(col(textCol))).as("fp_hash"))
      // docs shorter than the shingle length all sketch to [] — without
      // this filter every pair of them would verify as a "dup"
      .filter(size(col("fp")) > 0)
      .localCheckpoint(true) // both sides of the self-join
    val a = fps.as("a"); val b = fps.as("b")
    a.join(b,
        col("a.fp_hash") === col("b.fp_hash") &&
        col("a.doc_id") < col("b.doc_id"))
      .filter(col("a.fp") === col("b.fp"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
  }
}

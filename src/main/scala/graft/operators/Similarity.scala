package graft.operators

import graft.functions.VectorFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`).
  *
  * Scale design: the query set is assumed small (≪ corpus) and is
  * broadcast, so the corpus is read exactly once with no shuffle of
  * vectors for candidate scoring; only (query_id, doc_id, score)
  * triples enter the top-k exchange. The LSH variant prunes the corpus
  * scan's scoring work per query to one hyperplane bucket.
  */
object Similarity {

  /** Deterministic random hyperplanes: `nPlanes` unit-free normal-ish
    * vectors of length `dim`, seeded — same planes on every run and
    * every executor (they travel as literals in the plan, i.e. are
    * broadcast with the task binary). */
  private[operators] def planes(nPlanes: Int, dim: Int, seed: Long = 42L): Seq[Array[Float]] = {
    val rng = new scala.util.Random(seed)
    Seq.fill(nPlanes)(Array.fill(dim)((rng.nextGaussian() * 1000).toFloat))
  }

  /** Sign-bit bucket id: bit p set iff dot(vec, plane_p) > 0. Vectors
    * on the same side of all hyperplanes share a bucket; P(bit differs)
    * = angle/π, so high-cosine pairs collide with high probability. */
  def hyperplaneBucket(vec: Column, nPlanes: Int, dim: Int): Column =
    planes(nPlanes, dim).zipWithIndex
      .map { case (p, i) =>
        when(dot_product(vec, typedlit(p)) > 0, lit(1 << i)).otherwise(lit(0))
      }
      .reduce(_ + _)

  /** Brute-force exact cosine top-k: every query scored against every
    * corpus vector (the recall=1 baseline). `queries` is broadcast;
    * ranking shuffles only scored triples, partitioned by query. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      corpusId: String = "vec_id", corpusVec: String = "embedding",
      queryId: String = "query_id", queryVec: String = "query_vec"): DataFrame = {
    val scored = corpus.join(broadcast(queries))
      .select(
        col(queryId), col(corpusId),
        round(cosine_similarity(col(queryVec), col(corpusVec)), 6).as("cosine"))
    val w = Window.partitionBy(col(queryId))
      .orderBy(col("cosine").desc, col(corpusId))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** LSH-bucketed ANN top-k: only corpus vectors in the query's
    * hyperplane bucket are scored. Trades recall for a bucket-join
    * instead of a full scan per query — at 100 TB the bucketed corpus
    * would be written bucket-partitioned so a query touches one
    * partition. Falls back to fewer than k results when a bucket is
    * small (callers can multi-probe by lowering nPlanes). */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int, nPlanes: Int = 8,
      dim: Int = 64,
      corpusId: String = "vec_id", corpusVec: String = "embedding",
      queryId: String = "query_id", queryVec: String = "query_vec"): DataFrame = {
    val cb = corpus.withColumn("bucket", hyperplaneBucket(col(corpusVec), nPlanes, dim))
    val qb = queries.withColumn("bucket", hyperplaneBucket(col(queryVec), nPlanes, dim))
    val scored = cb.join(broadcast(qb), "bucket")
      .select(
        col(queryId), col(corpusId),
        round(cosine_similarity(col(queryVec), col(corpusVec)), 6).as("cosine"))
    val w = Window.partitionBy(col(queryId))
      .orderBy(col("cosine").desc, col(corpusId))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }
}

package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import graft.operators.{Similarity, TextAnalysis}
import org.apache.spark.sql.functions._

/** The index-artifact lifecycle contract (VERDICT r17 item 5): trained
  * IVF centroids, PQ codebooks, and BPE merge tables round-trip a
  * SnapshotStore version BIT-EXACTLY, a serving query pinned via
  * readVersion is identical to one served from the in-memory training
  * result, and a retrain publishing a newer version cannot move the
  * geometry under a version-pinned reader. */
class IndexArtifactsSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toFile.getPath

  private def emb = graft.Tables.load(spark, sf001, "embeddings")
    .filter(size(col("embedding")) === 64 &&
      graft.functions.VectorFunctions
        .dot_product(col("embedding"), col("embedding")) > 0)

  test("IVF centroids: save/load round-trips float bits exactly and the " +
      "served ivfTopK equals the in-memory one; readVersion pins the " +
      "geometry under a retrain") {
    val table = tmp("idx_ivf") + "/centroids"
    val (trained, _) = Similarity.ivfIndex(emb, nLists = 4)
    val c1 = IndexArtifacts.saveCentroids(spark, table, trained)
    assert(c1 == SnapshotStore.Commit(1L, becameCurrent = true))
    val served = IndexArtifacts.loadCentroids(spark, table, Some(c1.version))
    // bit-exact round-trip, order preserved
    assert(served.length == trained.length)
    trained.zip(served).foreach { case (a, b) =>
      assert(java.util.Arrays.equals(a, b), "centroid bits moved")
    }
    // serving parity: identical top-k from in-memory vs snapshot-served
    val qv = emb.filter(col("vec_id") < 3)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
    def topk(c: Array[Array[Float]]) =
      Similarity.ivfTopK(Similarity.ivfAssignFixed(emb, c), c, qv,
        k = 5, nProbe = 2)
        .select("query_id", "vec_id", "cosine", "rank")
        .orderBy("query_id", "rank")
        .as[(Long, Long, Double, Long)].collect().toSeq
    assert(topk(trained) == topk(served))
    // retrain publishes v2 with DIFFERENT geometry; the v1-pinned
    // reader still serves the original artifact (time travel)
    val (retrained, _) = Similarity.ivfIndex(emb, nLists = 4, seed = 99L)
    val c2 = IndexArtifacts.saveCentroids(spark, table, retrained)
    assert(c2.version == 2L && c2.becameCurrent)
    val pinned = IndexArtifacts.loadCentroids(spark, table, Some(1L))
    trained.zip(pinned).foreach { case (a, b) =>
      assert(java.util.Arrays.equals(a, b), "pinned version drifted")
    }
    // an unpinned load serves the NEW current
    val current = IndexArtifacts.loadCentroids(spark, table)
    assert(retrained.zip(current).forall { case (a, b) =>
      java.util.Arrays.equals(a, b) })
  }

  test("PQ codebook: save/load preserves [m][cent][sub] shape and bits; " +
      "snapshot-served pqTopK equals the in-memory one") {
    val table = tmp("idx_pq") + "/codebook"
    val book = Similarity.pqCodebook(m = 8, sub = 8, nCent = 16)
    val c = IndexArtifacts.saveCodebook(spark, table, book)
    val served = IndexArtifacts.loadCodebook(spark, table, Some(c.version))
    assert(served.length == book.length)
    book.zip(served).foreach { case (bm, sm) =>
      assert(bm.length == sm.length)
      bm.zip(sm).foreach { case (a, b) =>
        assert(java.util.Arrays.equals(a, b), "codebook bits moved")
      }
    }
    val qv = emb.filter(col("vec_id") < 3)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
    def topk(cb: Array[Array[Array[Float]]]) =
      Similarity.pqTopK(Similarity.pqEncode(emb, cb), cb, qv,
        k = 5, shortlist = 20)
        .select("query_id", "vec_id", "cosine", "rank")
        .orderBy("query_id", "rank")
        .as[(Long, Long, Double, Long)].collect().toSeq
    assert(topk(book) == topk(served))
  }

  test("BPE merges: the snapshot-served merge table encodes identically " +
      "to the in-memory one (x271's contract)") {
    val table = tmp("idx_bpe") + "/merges"
    val docs = graft.Tables.load(spark, sf001, "documents")
      .select(col("doc_id"), col("text")).limit(200)
    val merges = TextAnalysis.bpeInduction(docs, rounds = 4)
    val c = IndexArtifacts.saveBpeMerges(spark, table, merges)
    val served = IndexArtifacts.loadBpeMerges(spark, table, Some(c.version))
    // the merge table itself round-trips exactly
    val asSeq = (df: org.apache.spark.sql.DataFrame) =>
      df.select("round", "left_sym", "right_sym", "merged", "pair_count")
        .orderBy("round")
        .as[(Long, String, String, String, Long)].collect().toSeq
    assert(asSeq(merges) == asSeq(served))
    // and the encode under it is identical
    def enc(m: org.apache.spark.sql.DataFrame) =
      TextAnalysis.bpeEncode(docs, m, 4)
        .select(col("wid"), concat_ws("|", col("syms")).as("s"))
        .orderBy("wid").as[(String, String)].collect().toSeq
    assert(enc(merges) == enc(served))
  }

  test("classifier weights: snapshot-served nbSourceReport equals the " +
      "in-memory one (x274's contract)") {
    val table = tmp("idx_nb") + "/weights"
    val docs = graft.Tables.load(spark, sf001, "documents")
      .select(col("doc_id"), col("source"), col("lang"), col("text"))
      .limit(300)
    val label = col("lang") === "en"
    val trained = TextAnalysis.nbTrain(docs, label)
    val c = IndexArtifacts.saveClassifier(spark, table, trained)
    val served = IndexArtifacts.loadClassifier(spark, table, Some(c.version))
    // the weight table round-trips exactly (longs in parquet)
    val asSeq = (df: org.apache.spark.sql.DataFrame) =>
      df.select("feature", "weight_micro").orderBy("feature")
        .as[(Long, Long)].collect().toSeq
    assert(asSeq(trained) == asSeq(served))
    // and the report under it is identical
    def rep(w: org.apache.spark.sql.DataFrame) =
      TextAnalysis.nbSourceReport(docs, label, w)
        .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(rep(trained) == rep(served))
  }

  test("corpus sketch: snapshot-served crossNearDupSketched equals the " +
      "in-memory probe (x275's contract) — long arrays round-trip in " +
      "order") {
    val table = tmp("idx_sketch") + "/sketch"
    val d = graft.Tables.load(spark, sf001, "documents")
      .select(col("doc_id"), col("text"))
    val corpus = graft.operators.Dedup.ngramSketch(
      d.filter(pmod(col("doc_id"), lit(7)) =!= 0), "doc_id", "text", 3)
    val batch = graft.operators.Dedup.ngramSketch(
      d.filter(pmod(col("doc_id"), lit(7)) === 0), "doc_id", "text", 3)
    val c = IndexArtifacts.saveSketch(spark, table, corpus)
    val served = IndexArtifacts.loadSketch(spark, table, Some(c.version))
    // the sketch contract survives the round-trip: sorted distinct
    // hashes, in order, no empty arrays
    val asSeq = (df: org.apache.spark.sql.DataFrame) =>
      df.select(col("doc_id"), concat_ws(",", col("hashes")).as("h"))
        .orderBy("doc_id").as[(Long, String)].collect().toSeq
    assert(asSeq(corpus) == asSeq(served))
    def probe(sh: org.apache.spark.sql.DataFrame) =
      graft.operators.Dedup.crossNearDupSketched(batch, sh,
        prefixK = 8, minJaccard = 0.2)
        .orderBy("new_id", "old_id")
        .as[(Long, Long, Double)].collect().toSeq
    assert(probe(corpus) == probe(served))
  }
}

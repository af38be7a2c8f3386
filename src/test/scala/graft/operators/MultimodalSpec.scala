package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = spark.read.parquet(s"$sf001/documents.parquet").limit(50)
  private lazy val media = Multimodal.asMedia(docs, "doc_id", "text", "text", "source")

  test("asMedia: binary payload with typed metadata") {
    val r = media.head()
    assert(r.modality == "text")
    assert(r.byte_len == r.bytes.length.toLong && r.byte_len > 0)
  }

  test("extractFeatures: histogram sums to ~1, deterministic hash, stubbed dims bounded") {
    val f = Multimodal.extractFeatures(media).collect()
    assert(f.length == 50)
    f.foreach { x =>
      assert(math.abs(x.histogram.sum - 1.0) < 1e-9)
      assert(x.width >= 64 && x.width < 64 + 1024)
      assert(x.n_frames >= 1)
    }
    // determinism across runs
    val again = Multimodal.extractFeatures(media).collect()
    assert(f.map(_.content_hash).toSeq == again.map(_.content_hash).toSeq)
  }

  test("sampleFrames: n frames per media row, bounded slices") {
    val frames = Multimodal.sampleFrames(media, n = 4, frameBytes = 100)
    assert(frames.count() == 200)
    val bad = frames.filter(length(col("frame_bytes")) > 100).count()
    assert(bad == 0)
    assert(frames.groupBy("media_id").count().filter(col("count") =!= 4).count() == 0)
  }

  test("fingerprintDup pairs docs with identical content fingerprints") {
    val d = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again"),
      (2L, "THE QUICK  brown fox jumps over the lazy dog again"), // normalizes equal
      (3L, "completely different content that matches nothing else here"))
      .toDF("doc_id", "text")
    val pairs = TextAnalysis.fingerprintDup(d)
      .as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("rebinHistogram halves the bins preserving mass") {
    val f = Multimodal.extractFeatures(media).toDF()
    val r = Multimodal.rebinHistogram(f, 8)
      .select(size(col("histogram")).as("n"),
        aggregate(col("histogram"), lit(0.0), _ + _).as("mass")).collect()
    r.foreach { row =>
      assert(row.getInt(0) == 8)
      assert(math.abs(row.getDouble(1) - 1.0) < 1e-9)
    }
  }

  test("perceptualHash: hand-computed dHash bits; phashNearDup finds the Hamming-≤2 pairs") {
    // ascii%32: 'a'→1, 'b'→2. "aab": h[1]=2 > h[2]=1 → bit1; h[2]=1 >
    // h[3]=0 → bit2 ⇒ phash 6. "abb": h[1]=1 ≯ h[2]=2; h[2]=2 > h[3]
    // → bit2 ⇒ phash 4. hamming(6,4)=1.
    val d = Seq((1L, "aab"), (2L, "aab"), (3L, "abb")).toDF("doc_id", "text")
    val hashes = Multimodal.perceptualHash(
      Multimodal.asMedia(d.withColumn("source", lit("s")),
        "doc_id", "text", "text", "source"))
    assert(hashes.collect().map(h => h.media_id -> h.phash).toMap ==
      Map(1L -> 6L, 2L -> 6L, 3L -> 4L))
    val pairs = Multimodal.phashNearDup(hashes, maxHamming = 2)
      .as[(Long, Long, Int)].collect().sortBy(p => (p._1, p._2))
    assert(pairs.toSeq == Seq((1L, 2L, 0), (1L, 3L, 1), (2L, 3L, 1)))
  }
}

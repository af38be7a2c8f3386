package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = spark.read.parquet(s"$sf001/embeddings.parquet")
  private lazy val queries = emb.filter($"vec_id" < 3)
    .select($"vec_id".as("query_id"), $"embedding".as("query_vec"))

  test("brute-force top-k: rank 1 is the query itself at cosine 1") {
    val r = Similarity.bruteForceTopK(emb, queries, k = 5)
      .filter($"rank" === 1)
      .select($"query_id", $"vec_id", $"cosine").collect()
    assert(r.length == 3)
    r.foreach { row =>
      assert(row.getLong(0) == row.getLong(1))
      assert(row.getDouble(2) == 1.0)
    }
  }

  test("centroidDrift: hand-traced integer centroids and cosine; zero-norm " +
      "and wrong-dim vectors excluded") {
    import spark.implicits._
    val emb = Seq(
      (1L, Array(1.0f, 0.0f), 10),
      (2L, Array(1.0f, 0.0f), 10),
      (3L, Array(0.0f, 1.0f), 20),
      (4L, Array(0.0f, 0.0f), 20),      // zero norm → excluded
      (5L, Array(1.0f, 1.0f, 1.0f), 20)) // wrong dim → excluded
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.centroidDrift(emb, dim = 2)
      .as[(Int, Long, Option[Double], Double)].collect()
    // corpus centroid (micro, truncating div by 3): (666666, 333333);
    // A = (10⁶, 0) → cos 2/√5, B = (0, 10⁶) → cos 1/√5
    assert(out.toSeq == Seq(
      (10, 2L, Some(0.894427), 1.0),
      (20, 1L, Some(0.447214), 1.0)))
  }

  test("clusterExemplars: hand-traced centroid cosines; symmetric members " +
      "tie to the smaller id, singleton clusters are their own exemplar") {
    import spark.implicits._
    val emb = Seq(
      (1L, Array(1.0f, 0.0f), 0),
      (2L, Array(0.8f, 0.6f), 0),
      (3L, Array(0.0f, 1.0f), 0))
      .toDF("vec_id", "embedding", "label")
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 3L))
      .toDF("vec_id", "cluster_id")
    val out = Similarity.clusterExemplars(emb, clusters, dim = 2)
      .as[(Long, Long, Long, Double)].collect()
    // cluster 1 centroid (900000, 300000): both members score the
    // same 0.948683 by symmetry → id tie-break picks 1
    assert(out.toSeq == Seq(
      (1L, 2L, 1L, 0.948683),
      (3L, 1L, 3L, 1.0)))
  }

  test("brute-force top-k survives zero-norm corpus vectors (null cosine dropped)") {
    // a zero vector has no cosine (CosineSimilarity nulls it out); the
    // typed top-k aggregator must drop it rather than crash on the
    // non-nullable Scored.score field
    val dim = emb.select(size($"embedding")).as[Int].head()
    val withZero = emb.select($"vec_id", $"embedding")
      .union(spark.range(1).select(
        lit(999999L).as("vec_id"),
        array_repeat(lit(0.0f), dim).as("embedding")))
    val r = Similarity.bruteForceTopK(withZero, queries, k = 5)
    assert(r.count() == 15)
    assert(r.filter($"vec_id" === 999999L).count() == 0)
  }

  test("brute-force top-k: k rows per query, cosine non-increasing") {
    val r = Similarity.bruteForceTopK(emb, queries, k = 10)
      .orderBy($"query_id", $"rank")
      .select($"query_id", $"cosine").as[(Long, Double)].collect()
    assert(r.length == 30)
    r.grouped(10).foreach { g =>
      assert(g.map(_._2).sliding(2).forall(w => w(0) >= w(1)))
    }
  }

  test("LSH top-k results are a subset of brute-force candidates with self first") {
    val lsh = Similarity.lshTopK(emb, queries, k = 5, nPlanes = 6)
      .filter($"rank" === 1)
      .select($"query_id", $"vec_id").as[(Long, Long)].collect()
    // self is always in its own bucket → rank 1 is still the query itself
    lsh.foreach { case (q, v) => assert(q == v) }
  }

  test("lshTopK multi-probe: sparse primary bucket widens to Hamming-1 and fills k") {
    val k = 10
    val single = Similarity.lshTopK(emb, queries, k, nPlanes = 6, multiProbe = false)
      .groupBy($"query_id").count().as[(Long, Long)].collect().toMap
    val multi = Similarity.lshTopK(emb, queries, k, nPlanes = 6)
    val multiCounts = multi.groupBy($"query_id").count().as[(Long, Long)].collect().toMap

    // model the probe sets directly: primary bucket only when dense,
    // primary + all 1-bit flips when its population < k
    val bucketOf = emb
      .select($"vec_id", Similarity.hyperplaneBucket($"embedding", 6, 64).as("b"))
      .as[(Long, Int)].collect().toMap
    val pop = bucketOf.values.groupBy(identity).view.mapValues(_.size).toMap
    queries.select($"query_id").as[Long].collect().foreach { q =>
      val primary = bucketOf(q)
      val probes =
        if (pop.getOrElse(primary, 0) >= k) Set(primary)
        else Set(primary) ++ (0 until 6).map(primary ^ 1 << _)
      val candidates = probes.toSeq.map(b => pop.getOrElse(b, 0)).sum
      assert(multiCounts(q) == math.min(k, candidates),
        s"query $q: ${multiCounts(q)} rows from $candidates candidates")
      assert(multiCounts(q) >= single(q), s"widening lost rows for $q")
    }
    // the fixture must actually exercise the sparse path: 500 vectors
    // over 64 buckets leave the 3 query buckets under k
    assert(single.exists(_._2 < k), s"all dense, sparse path untested: $single")
    assert(multiCounts.values.forall(_ == k), s"still under k: $multiCounts")
    // exact rescore keeps self at rank 1
    multi.filter($"rank" === 1).select($"query_id", $"vec_id")
      .as[(Long, Long)].collect().foreach { case (q, v) => assert(q == v) }
  }

  test("IVF: self in top-1, results subset-consistent with brute force, recall reasonable") {
    val (centroids, indexed) = Similarity.ivfIndex(emb, nLists = 8)
    assert(centroids.length == 8)
    val r = Similarity.ivfTopK(indexed, centroids, queries, k = 5, nProbe = 3)
    val rank1 = r.filter($"rank" === 1)
      .select($"query_id", $"vec_id", $"cosine").collect()
    rank1.foreach { row =>
      assert(row.getLong(0) == row.getLong(1) && row.getDouble(2) == 1.0)
    }
    // recall vs exact top-5: with nProbe=3 of 8 lists expect a decent share
    val exact = Similarity.bruteForceTopK(emb, queries, k = 5)
      .select($"query_id", $"vec_id").as[(Long, Long)].collect().toSet
    val approx = r.select($"query_id", $"vec_id").as[(Long, Long)].collect().toSet
    val recall = approx.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.2, s"recall=$recall")
    // determinism
    val again = Similarity.ivfTopK(indexed, centroids, queries, k = 5, nProbe = 3)
      .select($"query_id", $"vec_id").as[(Long, Long)].collect().toSet
    assert(again == approx)
  }

  test("ivfAssignFixed picks the argmin-cosine-distance centroid; self in top-1") {
    val cents = Array(Array(1f, 0f), Array(0f, 1f))
    val df = Seq((0L, Seq(0.9f, 0.1f)), (1L, Seq(0.1f, 0.9f)), (2L, Seq(0.7f, 0.2f)))
      .toDF("vec_id", "embedding")
    val assigned = Similarity.ivfAssignFixed(df, cents)
      .select($"vec_id", $"list_id").as[(Long, Int)].collect().toMap
    assert(assigned == Map(0L -> 0, 1L -> 1, 2L -> 0))
    // end-to-end on the fixture: each query finds itself at rank 1
    val fixed = Similarity.fixedCentroids(nLists = 8, dim = 64)
    val indexed = Similarity.ivfAssignFixed(emb.filter(size($"embedding") === 64), fixed)
    val self = Similarity.ivfTopK(indexed, fixed, queries, k = 5, nProbe = 3)
      .filter($"rank" === 1).select($"query_id", $"vec_id").as[(Long, Long)].collect()
    assert(self.nonEmpty && self.forall(p => p._1 == p._2))
  }

  test("hyperplane bucket is deterministic across invocations") {
    val b1 = emb.select(Similarity.hyperplaneBucket($"embedding", 8, 64)).as[Int].collect()
    val b2 = emb.select(Similarity.hyperplaneBucket($"embedding", 8, 64)).as[Int].collect()
    assert(b1.sameElements(b2))
  }

  test("bucketProfile: populations sum to corpus, norms bound the bucket") {
    val in = emb.filter(size($"embedding") === 64)
    val prof = Similarity.bucketProfile(in, "embedding", nPlanes = 6, dim = 64)
      .select($"bucket", $"n", $"min_norm", $"max_norm")
      .as[(Int, Long, Double, Double)].collect()
    assert(prof.map(_._2).sum == in.count())
    assert(prof.forall { case (b, _, lo, hi) => b >= 0 && b < 64 && lo <= hi })
    // spot-check one bucket against a direct recomputation
    val (b0, n0, lo0, hi0) = prof.minBy(_._1)
    val direct = in
      .filter(Similarity.hyperplaneBucket($"embedding", 6, 64) === b0)
      .select(org.apache.spark.sql.functions.sqrt(
        graft.functions.VectorFunctions.dot_product($"embedding", $"embedding")))
      .as[Double].collect()
    assert(direct.length == n0)
    assert(math.abs(direct.min - lo0) < 1e-6 && math.abs(direct.max - hi0) < 1e-6)
  }

  test("quantizedCentroids: exact integer sums over hand-derived codes") {
    // [2,-1]: mx=2, scale=63.5 → [127, floor(-63.5+0.5) = -63]
    // [1, 1]: mx=1            → [127, 127]
    // [0, 0]: no scale        → quantizer nulls it, row excluded
    val vecs = Seq(
      (1, Seq(2.0f, -1.0f)), (1, Seq(1.0f, 1.0f)), (2, Seq(0.0f, 0.0f)))
      .toDF("label", "embedding")
    val out = Similarity.quantizedCentroids(vecs)
      .orderBy($"label", $"dim")
      .select($"label", $"dim", $"n", $"s", $"mean_code")
      .as[(Int, Int, Long, Long, Double)].collect()
    assert(out.toSeq == Seq(
      (1, 0, 2L, 254L, 127.0),
      (1, 1, 2L, 64L, 32.0)))
  }

  test("knnGraph: no self-edges, ≤k contiguous ranks per src, neighbors share the src's bucket") {
    val k = 3
    val g = Similarity.knnGraph(emb, k = k).collect()
    assert(g.nonEmpty)
    g.foreach(r => assert(r.getLong(0) != r.getLong(1), s"self-edge: $r"))
    val bySrc = g.groupBy(_.getLong(0))
    bySrc.foreach { case (src, rows) =>
      val ranks = rows.map(_.getInt(3)).sorted.toSeq
      assert(ranks == (1 to rows.length), s"src $src ranks not contiguous: $ranks")
      assert(rows.length <= k)
      val byRank = rows.sortBy(_.getInt(3)).map(_.getDouble(2)).toSeq
      assert(byRank == byRank.sorted.reverse, s"src $src cosine not non-increasing")
    }
    // edges only within the src's own bucket (single-probe contract)
    val bucketOf = emb
      .filter(size($"embedding") === 64)
      .select($"vec_id", Similarity.hyperplaneBucket($"embedding", 6, 64).as("b"))
      .as[(Long, Int)].collect().toMap
    g.foreach(r => assert(bucketOf(r.getLong(0)) == bucketOf(r.getLong(1)),
      s"cross-bucket edge: $r"))
  }

  test("pqEncode: m codes per vector, all in [0, nCent), deterministic") {
    val cb = Similarity.pqCodebook(8, 8, 16)
    val enc = Similarity.pqEncode(emb, cb)
      .select($"vec_id", $"codes").as[(Long, Seq[Int])].collect()
    assert(enc.nonEmpty)
    enc.foreach { case (id, codes) =>
      assert(codes.length == 8, s"vec $id: ${codes.length} codes")
      assert(codes.forall(c => c >= 0 && c < 16), s"vec $id: $codes")
    }
    val again = Similarity.pqEncode(emb, cb)
      .select($"vec_id", $"codes").as[(Long, Seq[Int])].collect()
    assert(enc.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq)
  }

  test("pqTopK: a corpus-wide shortlist degenerates to the exact brute force") {
    // with shortlist ≥ |corpus| the rerank rescores everything, so the
    // PQ path must return EXACTLY the brute-force top-k — the ADC
    // stage can only reorder the shortlist interior, never the final
    // ranking. Pins the rerank wiring end to end.
    val cb = Similarity.pqCodebook(8, 8, 16)
    val queries = emb.filter($"vec_id" < 3)
      .select($"vec_id".as("query_id"), $"embedding".as("query_vec"))
    val n = emb.count().toInt
    val pq = Similarity.pqTopK(Similarity.pqEncode(emb, cb), cb, queries,
        k = 10, shortlist = n)
      .select($"query_id", $"vec_id", $"cosine", $"rank")
      .as[(Long, Long, Double, Int)].collect().sortBy(r => (r._1, r._4))
    val bf = Similarity.bruteForceTopK(
        emb.filter(size($"embedding") === 64)
          .filter(graft.functions.VectorFunctions
            .dot_product($"embedding", $"embedding") > 0),
        queries, k = 10)
      .select($"query_id", $"vec_id", $"cosine", $"rank")
      .as[(Long, Long, Double, Int)].collect().sortBy(r => (r._1, r._4))
    assert(pq.toSeq == bf.toSeq)
  }

  test("pqQuantizationError: matches the driver-side argmin model per subspace") {
    val cb = Similarity.pqCodebook(8, 8, 16)
    val audit = Similarity.pqQuantizationError(Similarity.pqEncode(emb, cb), cb)
      .orderBy($"subspace")
      .as[(Int, Long, Long, Long)].collect()
    assert(audit.map(_._1).toSeq == (0 until 8))
    val valid = emb.filter(size($"embedding") === 64).as[(Long, Seq[Float], Int)]
      .collect().filter(_._2.map(x => x.toDouble * x).sum > 0)
    assert(audit.forall(_._2 == valid.length))
    // model: per (vector, subspace) the min-distance centroid's error,
    // quantized exactly like the operator, integer mean/max
    def q(d: Double) = math.round(
      BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble * 1e6)
    val model = (0 until 8).map { j =>
      val errs = valid.map { case (_, e, _) =>
        val s = e.slice(j * 8, j * 8 + 8).map(_.toDouble)
        q(cb(j).map(c => s.zip(c.map(_.toDouble))
          .map { case (x, y) => (x - y) * (x - y) }.sum).min)
      }
      (j, errs.length.toLong, errs.sum / errs.length, errs.max)
    }
    assert(audit.toSeq == model)
  }

  test("pqTopK: the width-50 shortlist holds useful recall@10 vs brute force") {
    val cb = Similarity.pqCodebook(8, 8, 16)
    val queries = emb.filter($"vec_id" < 5)
      .select($"vec_id".as("query_id"), $"embedding".as("query_vec"))
    def ids(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.select($"query_id", $"vec_id").as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val pq = ids(Similarity.pqTopK(Similarity.pqEncode(emb, cb), cb, queries,
      k = 10, shortlist = 50))
    val bf = ids(Similarity.bruteForceTopK(emb, queries, k = 10))
    val recalls = bf.map { case (q, truth) =>
      pq.getOrElse(q, Set.empty).intersect(truth).size.toDouble / truth.size
    }
    val mean = recalls.sum / recalls.size
    // random (training-free) codebook + 10%-of-corpus shortlist: the
    // rerank repairs most quantization loss; measured 2026-08-14
    assert(mean >= 0.5, s"mean recall@10 $mean below floor; per-query $recalls")
  }

  test("pairCosineHistogram: hand-traced bins — identical vectors fold into the " +
      "top bin, orthogonal pairs land in bin 0; shares are exact micro") {
    val ex = Array.tabulate(64)(i => if (i == 0) 1.0f else 0.0f)
    val ey = Array.tabulate(64)(i => if (i == 1) 1.0f else 0.0f)
    // pairBuckets = 1 puts every vector in one group → all 3 pairs score
    val emb = Seq((1L, ex), (2L, ex), (3L, ey)).toDF("vec_id", "embedding")
    val out = Similarity.pairCosineHistogram(emb, pairBuckets = 1)
      .orderBy($"bin")
      .as[(Long, Long, Long)].collect()
    // (1,2): cos 1 → floor(10) clamped to bin 9; (1,3), (2,3): cos 0 → bin 0
    assert(out.toSeq == Seq((0L, 2L, 666666L), (9L, 1L, 333333L)))
  }

  test("pairCosineHistogram: degenerate and wrong-dim vectors are excluded " +
      "before pairing") {
    val ok = Array.tabulate(64)(_ => 0.5f)
    val zero = Array.fill(64)(0.0f)
    val short = Array.fill(8)(1.0f)
    val emb = Seq((1L, ok), (2L, ok), (3L, zero), (4L, short))
      .toDF("vec_id", "embedding")
    val out = Similarity.pairCosineHistogram(emb, pairBuckets = 1)
      .as[(Long, Long, Long)].collect()
    assert(out.toSeq == Seq((9L, 1L, 1000000L))) // only the (1,2) pair survives
  }

  test("embeddingDispersion: identical vectors score pair dot == self dot " +
      "(redundancy 1); orthogonal pairs score 0; singleton labels null") {
    val emb = Seq(
      (1L, Array(1.0f, 0.0f), "dup"),
      (2L, Array(1.0f, 0.0f), "dup"),
      (3L, Array(1.0f, 0.0f), "orth"),
      (4L, Array(0.0f, 1.0f), "orth"),
      (5L, Array(0.6f, 0.8f), "solo"))
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.embeddingDispersion(emb, dim = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        if (r.isNullAt(4)) None else Some(r.getLong(4))))
    assert(out.toSeq == Seq(
      // identical unit vectors: self dot 1.0, pair dot 1.0, ratio 1
      ("dup", 2L, 1000000L, Some(1000000L), Some(1000000L)),
      // orthogonal: ||sum||^2 = 2e6, self = 2e6 -> pair 0
      ("orth", 2L, 1000000L, Some(0L), Some(0L)),
      // singleton: no pair, nulls
      ("solo", 1L, 1000000L, None, None)))
  }

  test("embeddingAnisotropy: a single-direction space scores share 1; " +
      "an all-identical space is degenerate (null share)") {
    // all variance along dim 0: power iteration locks onto e0 in one
    // step and the Rayleigh share is exactly 1.0
    val line = (1 to 20).map(k =>
      (k.toLong, Array(k.toFloat, 0f, 0f, 0f))).toDF("vec_id", "embedding")
    val a = Similarity.embeddingAnisotropy(line, dim = 4).head()
    assert(a.getLong(0) == 20L && a.getLong(2) > 0L)
    assert(a.getLong(3) == 1000000L, a.toString)
    // identical vectors: zero scatter, null share, trace 0
    val flat = (1 to 10).map(k =>
      (k.toLong, Array(1f, 1f, 1f, 1f))).toDF("vec_id", "embedding")
    val d = Similarity.embeddingAnisotropy(flat, dim = 4).head()
    assert(d.getLong(2) == 0L && d.isNullAt(3), d.toString)
    intercept[IllegalArgumentException] {
      Similarity.embeddingAnisotropy(line, dim = 4, iters = 0)
    }
  }

  test("splitLeakageBySimilarity: identical cross-split twins score " +
      "cosine 1 and flag leaked; split is the md5 gate; deterministic") {
    // 40 identical vectors: all share one bucket; every hash-test id's
    // best train neighbor is the smallest train id at cosine 1.0
    val v = Array.fill(64)(0.5f)
    val emb = (1L to 40L).map(i => (i, v)).toDF("vec_id", "embedding")
    val out = Similarity.splitLeakageBySimilarity(emb, testPct = 50)
      .as[(Long, Long, Double, Boolean)].collect()
    assert(out.nonEmpty)
    // replicate the gate to find the expected split
    import org.apache.spark.sql.functions.{col, lit, pmod}
    val gate = emb.select(col("vec_id"),
        (pmod(graft.functions.TextFunctions.md5Bucket60(col("vec_id")),
          lit(100L)) < 50).as("t"))
      .as[(Long, Boolean)].collect().toMap
    val testIds = gate.filter(_._2).keys.toSet
    val minTrain = gate.filterNot(_._2).keys.min
    assert(out.map(_._1).toSet == testIds)
    out.foreach { case (_, trainId, cos, leaked) =>
      assert(trainId == minTrain && cos == 1.0 && leaked)
    }
    val again = Similarity.splitLeakageBySimilarity(emb, testPct = 50)
      .as[(Long, Long, Double, Boolean)].collect()
    assert(out.toSeq == again.toSeq)
  }

  test("truncationRecall: hand-traced prefix flip — a tie on the 2-dim " +
    "prefix breaks to the lower id away from the full-dim top-1, and the " +
    "full-dim row is the hits=slots anchor") {
    import spark.implicits._
    // q's full-dim top-1 is c2 (shares the 3rd component); on the 2-dim
    // prefix both corpus vectors are collinear with q' → cosine 1.0
    // tie → c1 wins by id. All components exact in float.
    val corpus = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (2L, Array(0.5f, 0.0f, 1.0f, 0.0f))).toDF("vec_id", "embedding")
    val q = Seq((100L, Array(1.0f, 0.0f, 1.0f, 0.0f)))
      .toDF("query_id", "query_vec")
    val out = Similarity.truncationRecall(corpus, q, dims = Seq(2, 4), k = 1)
      .as[(Long, Long, Long, Long, Long)].collect().toList
    // expected full-dim cosine micro of (q, c2) via the same kernel
    val fullMicro = Seq((Array(1.0f, 0.0f, 1.0f, 0.0f), Array(0.5f, 0.0f, 1.0f, 0.0f)))
      .toDF("a", "b")
      .select(round(round(graft.functions.VectorFunctions.cosine_similarity(
        col("a"), col("b")), 6) * lit(1000000.0)).cast("long"))
      .as[Long].head()
    assert(out == List(
      (2L, 1L, 1L, 0L, 1000000L),       // prefix: top-1 flipped to c1; rescored c2 still collinear → 1.0
      (4L, 1L, 1L, 1L, fullMicro)))     // full dim: hits = slots
  }

  test("compressionRecall: an identity method is the hits=slots anchor; " +
    "a prefix transform reproduces the truncation flip through the " +
    "shared harness") {
    import spark.implicits._
    val corpus = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (2L, Array(0.5f, 0.0f, 1.0f, 0.0f))).toDF("vec_id", "embedding")
    val q = Seq((100L, Array(1.0f, 0.0f, 1.0f, 0.0f)))
      .toDF("query_id", "query_vec")
    val out = Similarity.compressionRecall(corpus, q,
        methods = Seq(
          "a_first2" -> ((v: org.apache.spark.sql.Column) => slice(v, 1, 2)),
          "b_id" -> ((v: org.apache.spark.sql.Column) => v)),
        k = 1)
      .as[(String, Long, Long, Long, Long)].collect().toList
    val fullMicro = Seq((Array(1.0f, 0.0f, 1.0f, 0.0f), Array(0.5f, 0.0f, 1.0f, 0.0f)))
      .toDF("a", "b")
      .select(round(round(graft.functions.VectorFunctions.cosine_similarity(
        col("a"), col("b")), 6) * lit(1000000.0)).cast("long"))
      .as[Long].head()
    assert(out == List(
      ("a_first2", 1L, 1L, 0L, 1000000L), // prefix tie flips top-1 to c1
      ("b_id", 1L, 1L, 1L, fullMicro)))   // identity: hits = slots
  }

  test("hardNegatives: hand-traced 3-4-5 geometry — positives, negatives, " +
    "and signed micro margins") {
    import spark.implicits._
    val emb = Seq(
      (1L, Array(5.0f, 0.0f), 0),
      (2L, Array(4.0f, 3.0f), 0),
      (3L, Array(3.0f, 4.0f), 1),
      (4L, Array(0.0f, 5.0f), 1)).toDF("vec_id", "embedding", "label")
    val q = emb.select(col("vec_id").as("query_id"),
      col("embedding").as("query_vec"), col("label").as("query_label"))
    val out = Similarity.hardNegatives(emb, q)
      .select(col("query_id"), col("query_label"), col("pos_id"),
        col("neg_id"), col("margin_micro"))
      .as[(Long, Int, Long, Long, Long)].collect().toList
    // cos pairs: (1,2)=.8 (1,3)=.6 (1,4)=0 (2,3)=.96 (2,4)=.6 (3,4)=.8
    assert(out == List(
      (1L, 0, 2L, 3L, 200000L),   // .8 − .6
      (2L, 0, 1L, 3L, -160000L),  // .8 − .96: nearest neighbor crosses the class boundary
      (3L, 1, 4L, 2L, -160000L),
      (4L, 1, 3L, 2L, 200000L)))
  }

  test("retrievalMetrics: hand-traced MRR/DCG/NDCG at k=2 — relevant at " +
    "rank 1, no relevant in top-k, and a singleton label (R=0) going null") {
    import spark.implicits._
    val emb = Seq(
      (1L, Array(5.0f, 0.0f), 0),
      (2L, Array(4.0f, 3.0f), 0),
      (3L, Array(3.0f, 4.0f), 1),
      (4L, Array(0.0f, 5.0f), 1),
      (5L, Array(1.0f, 1.0f), 9)).toDF("vec_id", "embedding", "label")
    val q = emb.select(col("vec_id").as("query_id"),
      col("embedding").as("query_vec"), col("label").as("query_label"))
    val out = Similarity.retrievalMetrics(emb, q, k = 2)
      .as[(Long, Int, Long, Long, Option[Long], Option[Long], Option[Long])]
      .collect().toList
    // cosines: (1,2)=.8 (1,3)=.6 (1,4)=0 (2,3)=.96 (2,4)=.6 (3,4)=.8,
    // v5 scores .989949 vs 2/3 and .707107 vs 1/4 — so 5 tops the
    // rankings of 2 and 3 (pushing their same-label mates out of
    // top-2) and takes rank 2 for 1 and 4.
    assert(out == List(
      (1L, 0, 1L, 1000000L, Some(1000000L), Some(1000000L), Some(1000000L)),
      (2L, 0, 0L, 0L, Some(0L), Some(1000000L), Some(0L)),
      (3L, 1, 0L, 0L, Some(0L), Some(1000000L), Some(0L)),
      (4L, 1, 1L, 1000000L, Some(1000000L), Some(1000000L), Some(1000000L)),
      (5L, 9, 0L, 0L, None, None, None)))
  }

  test("oodAudit: hand-traced per-dim z² terms; a zero-variance label " +
    "yields null scores and zero flags; wrong-dim vectors excluded") {
    import spark.implicits._
    val emb = Seq(
      (1L, Array(0.0f, 0.0f), 0),
      (2L, Array(1.0f, 0.0f), 0),
      (3L, Array(2.0f, 3.0f), 0),
      (4L, Array(1.0f, 1.0f), 1),
      (5L, Array(1.0f, 1.0f), 1),
      (6L, Array(9.0f), 0)).toDF("vec_id", "embedding", "label")
    val out = Similarity.oodAudit(emb, dim = 2, factorMilli = 1500L)
      .select(col("label"), col("n"), col("dim"), col("ood_milli_sum"),
        col("max_ood_milli"), col("flagged"))
      .as[(Int, Long, Long, Option[Long], Option[Long], Long)].collect().toList
    // label 0, dim 0: q = (0, 1000, 2000), s1 = 3000, s2 = 5e6,
    //   den = 6e6 → terms 1500/0/1500; dim 1: q = (0, 0, 3000),
    //   den = 1.8e7 → terms 500/500/2000. ood = 2000, 500, 3500;
    //   threshold 1500·2 = 3000 flags only vec 3.
    assert(out == List(
      (0, 3L, 2L, Some(6000L), Some(3500L), 1L),
      (1, 2L, 2L, None, None, 0L)))
  }
  test("quantizationDistortion: exact-dequant and half-step vectors " +
      "hand-traced; zero/wrong-dim vectors drop") {
    import spark.implicits._
    // mx = 127 makes scale exactly 1.0, so dequant errors are exact
    // binary fractions: v1 quantizes losslessly (err 0, one saturated
    // component); v2's 63.5 rounds to 64 (err -0.5, err^2 = 0.25)
    val emb = Seq(
      (1L, Array(127f, -64f, 0f, 32f), 0),
      (2L, Array(127f, 63.5f, 0f, 0f), 0),
      (3L, Array(0f, 0f, 0f, 0f), 0),       // zero norm: quantize null
      (4L, Array(1f, 2f), 0))                // wrong dim: filtered
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.quantizationDistortion(emb, dim = 4)
      .as[(Int, Long, Long, Long, Long)].collect()
    assert(out.toSeq == Seq((0, 2L, 250000000000L, 250000000000L, 2L)))
  }

  test("covarianceSpectrum: integer power iteration matches an independent " +
      "BigInt reference on a dominant-axis corpus; trivial corpus is stable") {
    import spark.implicits._
    // 4 vectors, dim 3: variance lives almost entirely on axis 0
    val vecs = Seq(
      (1L, Array(10.0f, 1.0f, 0.0f)),
      (2L, Array(-10.0f, 0.0f, 1.0f)),
      (3L, Array(9.0f, -1.0f, 0.5f)),
      (4L, Array(-9.0f, 0.5f, -0.5f)))
    val df = vecs.toDF("vec_id", "embedding")
    val got = Similarity.covarianceSpectrum(df, iters = 8)
      .as[(Long, Long, Long)].collect()

    // independent reference: same integer pipeline in BigInt
    val n = BigInt(vecs.length)
    val q = vecs.map(_._2.map(v => BigInt(math.round(v.toDouble * 1e6))))
    val d = 3
    val sums = (0 until d).map(i => q.map(_(i)).sum)
    val c = Array.tabulate(d, d) { (i, j) =>
      n * q.map(v => v(i) * v(j)).sum - sums(i) * sums(j) }
    val m = c.flatten.map(_.abs).max
    val cm = c.map(_.map(v => v * 1000000 / m)) // BigInt / truncates
    var x = Array.fill(d)(BigInt(1000000))
    for (_ <- 1 to 8) {
      val y = Array.tabulate(d)(i => (0 until d).map(j => cm(i)(j) * x(j)).sum)
      val my = y.map(_.abs).max
      x = y.map(v => v * 1000000 / my)
    }
    val y9 = Array.tabulate(d)(i => (0 until d).map(j => cm(i)(j) * x(j)).sum)
    val num = (0 until d).map(i => y9(i) * x(i)).sum
    val den = x.map(v => v * v).sum
    val tr = (0 until d).map(i => cm(i)(i)).sum
    val share = (num * 1000000 / (den * tr)).toLong
    val topDim = (0 until d).minBy(i => (-x(i).abs, i)).toLong
    assert(got.toSeq == Seq((4L, topDim, share)),
      s"engine ${got.toSeq} != reference ${Seq((4L, topDim, share))}")
    // the dominant direction must be axis 0 and carry nearly all mass
    assert(topDim == 0L && share > 950000L, s"($topDim, $share)")
  }

  test("sourceAffinity: hand-traced centroid cosines — orthogonal, " +
      "identical, and 3-4-5 sources; zero vectors are excluded") {
    val vecs = Seq(
      (1L, Array(1f, 0f)), (2L, Array(1f, 0f)), // A -> (1e6, 0)
      (3L, Array(0f, 1f)),                      // B -> (0, 1e6)
      (4L, Array(1f, 0f)),                      // C -> (1e6, 0)
      (5L, Array(3f, 4f)),                      // D -> (3e6, 4e6)
      (6L, Array(0f, 0f)))                      // A again, zero: excluded
      .toDF("vec_id", "embedding")
    val docs = Seq((1L, "A"), (2L, "A"), (3L, "B"), (4L, "C"),
      (5L, "D"), (6L, "A")).toDF("doc_id", "source")
    val out = Similarity.sourceAffinity(vecs, docs, dim = 2)
      .as[(String, String, Long, Long, Option[Double])].collect()
    assert(out.toSeq == Seq(
      ("A", "B", 2L, 1L, Some(0.0)),
      ("A", "C", 2L, 1L, Some(1.0)),
      ("A", "D", 2L, 1L, Some(0.6)),
      ("B", "C", 1L, 1L, Some(0.0)),
      ("B", "D", 1L, 1L, Some(0.8)),
      ("C", "D", 1L, 1L, Some(0.6))))
  }

  test("thresholdTransfer: micro-jaccard deciles, per-pair cosine " +
      "quantization, exact bucket stats; missing embeddings drop") {
    val pairs = Seq((1L, 2L, 0.25), (3L, 4L, 0.95), (5L, 6L, 0.85),
      (7L, 8L, 1.0), (9L, 10L, 0.5)) // 9/10 have no vectors
      .toDF("doc_a", "doc_b", "jaccard")
    val vecs = Seq(
      (1L, Array(1f, 0f)), (2L, Array(0f, 1f)),  // cos 0.0
      (3L, Array(1f, 0f)), (4L, Array(1f, 0f)),  // cos 1.0
      (5L, Array(3f, 4f)), (6L, Array(4f, 3f)),  // cos 24/25 = 0.96
      (7L, Array(1f, 1f)), (8L, Array(1f, 1f)))  // cos 1.0
      .toDF("vec_id", "embedding")
    val out = Similarity.thresholdTransfer(pairs, vecs)
      .as[(Long, Long, Double, Long, Long)].collect()
    // buckets: 0.25 -> 2; 0.85 -> 8; 0.95 and 1.0 -> 9 (capped)
    assert(out.toSeq == Seq(
      (2L, 1L, 0.0, 0L, 0L),
      (8L, 1L, 0.96, 960000L, 960000L),
      (9L, 2L, 1.0, 1000000L, 1000000L)))
  }
}

package graft.operators

import graft.functions.HashFunctions._
import graft.functions.ShingleFunctions._
import graft.functions.TextFunctions._
import graft.functions.VectorFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operator family for corpus-scale pipelines —
  * generalizes the reference's keyed last-wins dedup
  * (publish_to_catalog.py:93-124) from exact keys to content and
  * near-duplicate identity.
  *
  * Scale design, common to all operators here:
  *  - candidate generation is always a *bucket equi-join* (shuffle on a
  *    sketch key), never a cross join — pair count stays near-linear in
  *    corpus size for realistic duplicate rates;
  *  - sketches are computed once per document in a single projection
  *    (map-side, inside codegen where possible), so the only wide
  *    exchanges are the bucket join and the final pair dedup;
  *  - hot buckets (boilerplate/empty docs) are the skew risk: callers
  *    should pre-filter degenerate docs; AQE skew-join handles the rest.
  */
object Dedup {

  /** Eagerly materialize a sketch frame that fans out to multiple join
    * branches. Without the eager pass, the branches' scan stages race:
    * each starts before any cache is populated and recomputes the full
    * sketch. `localCheckpoint(eager)` rather than `cache()+count()`:
    * same one-pass materialization, but lineage is truncated (branches
    * can't fall back to recompute) and the blocks are auto-released by
    * the ContextCleaner when the frame becomes unreachable — repeated
    * operator calls don't accumulate pinned cache entries. Trade-off:
    * truncated lineage means an executor loss during the job fails it
    * instead of recomputing; at cluster scale a reliable checkpoint /
    * written sketch table is the durable variant. */
  private def materialize(df: DataFrame): DataFrame = df.localCheckpoint(true)

  /** Sketching is CPU-bound; a corpus arriving in fewer splits than
    * cores (one small parquet file → one partition) would hash on a
    * single thread. Round-robin repartition of the raw docs is cheap
    * relative to hashing and restores full parallelism. No-op when the
    * input already has enough splits (the 100 TB case). */
  private[operators] def ensureParallelism(df: DataFrame): DataFrame = {
    val want = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < want) df.repartition(want) else df
  }

  /** Exact content dedup: one surviving row (min id) per distinct value
    * of `contentCol`. Hash-groupBy on a uniform key → no skew. */
  def exact(df: DataFrame, idCol: String, contentCol: String): DataFrame =
    df.groupBy(md5(col(contentCol)).as("content_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  private lazy val logger = org.slf4j.LoggerFactory.getLogger("graft.operators.Dedup")

  /** Opt-in hot-bucket guard for the candidate generators: buckets
    * whose population exceeds `maxBucketSize` are REMOVED from
    * candidate generation, with a logged count of what was cut. A
    * bucket of n rows mints n(n−1)/2 candidate pairs, so one
    * boilerplate bucket of 10⁶ docs is 5·10¹¹ pairs — the fan-out that
    * kills the job regardless of AQE. Dropping (not salting) is the
    * right shape here: salting spreads an AGGREGATION's key, but a
    * pair join over a salted bucket still mints every pair; a bucket
    * too popular to pair over is boilerplate by definition, and LSH
    * redundancy (bands / chunks / prefix-k hashes) gives a genuine
    * near-dup pair its other, healthier collisions. The extra
    * bucket-count pass is one cheap agg over the bucketed frame —
    * that's the opt-in cost; `None` (default) changes nothing. */
  private[graft] def guardBuckets(bucketed: DataFrame, keyCols: Seq[String],
      maxBucketSize: Option[Int], what: String): DataFrame =
    maxBucketSize match {
      case None => bucketed
      case Some(cap) =>
        require(cap >= 2, s"maxBucketSize must allow pairs: $cap")
        val keys = keyCols.map(col)
        val hot = bucketed.groupBy(keys: _*).agg(count(lit(1)).as("__bn"))
          .filter(col("__bn") > cap)
          .localCheckpoint(true) // consumed by the count AND the anti-join
        val dropped = hot.agg(count(lit(1)), sum(col("__bn")))
          .head()
        val nHot = dropped.getLong(0)
        if (nHot > 0) logger.warn(
          s"$what: dropping $nHot bucket(s) over maxBucketSize=$cap " +
            s"(${dropped.getLong(1)} rows lose those collision chances)")
        bucketed.join(broadcast(hot.select(keys: _*)), keyCols.toSeq, "left_anti")
    }

  /** Sketch table: doc id + minhash signature over character shingles
    * (single-pass shingle hashing, see ShingleHashes). */
  def minhashSignatures(docs: DataFrame, idCol: String, textCol: String,
      shingleLen: Int = 5, numHashes: Int = 64): DataFrame =
    docs.select(
      col(idCol).as("doc_id"),
      minhash_longs(shingle_hashes(normText(col(textCol)), shingleLen),
        numHashes).as("sig"))

  /** MinHash + LSH near-duplicate pairs.
    *
    * shingle → minhash (k = bands·rowsPerBand) → band-bucket join →
    * Jaccard filter. Two LSH docs land in the same bucket iff one band
    * of their signatures agrees — probability 1-(1-j^r)^b for true
    * Jaccard j, the classic S-curve.
    *
    * `verifyExact = false`: the filter uses the signature-estimated
    * Jaccard (agreement fraction) — nothing but 8-byte signatures ever
    * shuffles. `verifyExact = true`: candidates are re-scored with the
    * EXACT Jaccard over the distinct shingle-hash sets (the standard
    * LSH-then-verify shape) — precision 1 at the cost of shuffling the
    * full hash arrays for candidate docs only.
    *
    * Output: (doc_a, doc_b, est_jaccard | jaccard), doc_a < doc_b.
    */
  def minhashNearDup(docs: DataFrame, idCol: String, textCol: String,
      shingleLen: Int = 5, bands: Int = 16, rowsPerBand: Int = 4,
      minJaccard: Double = 0.5, verifyExact: Boolean = false,
      maxBucketSize: Option[Int] = None): DataFrame = {
    val k = bands * rowsPerBand
    // Materialized sketch table: it feeds the band explode AND both
    // sides of the estimate join — 3 consumers that would otherwise
    // re-shingle and re-hash the full corpus. At scale this is the
    // standard materialize-the-sketch-table step (~1 KB/doc ≪ corpus).
    val sigs = materialize(
      minhashSignatures(ensureParallelism(docs), idCol, textCol, shingleLen, k)
        .filter(col("sig").isNotNull))

    // one row per (doc, band): band id + hash of that signature slice
    val banded = sigs.select(
      col("doc_id"),
      posexplode(transform(
        sequence(lit(0), lit(bands - 1)),
        b => hash(slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand))))))
      .toDF("doc_id", "band", "band_hash")
    val guarded = guardBuckets(banded, Seq("band", "band_hash"),
      maxBucketSize, "minhashNearDup")

    // bucket join: same band + same slice hash → candidate pair
    val a = guarded.as("a"); val b = guarded.as("b")
    val candidates = a.join(b,
        col("a.band") === col("b.band") &&
        col("a.band_hash") === col("b.band_hash") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()

    if (verifyExact) {
      // exact re-score: Jaccard over the distinct shingle-hash sets
      // (identical to shingle-set Jaccard modulo 64-bit collisions).
      // Hash sets are recomputed ONLY for candidate docs — candidates
      // are a vanishing fraction of the corpus, so this is far cheaper
      // than materializing every doc's full hash array alongside the
      // signatures (the sketch stays ~1 KB/doc either way).
      val cand = materialize(candidates)
      val candIds = cand.select(col("doc_a").as("__cid"))
        .union(cand.select(col("doc_b").as("__cid"))).distinct()
      val candHashes = materialize(docs
        .join(broadcast(candIds), col(idCol) === col("__cid"))
        .select(col(idCol).as("doc_id"),
          array_sort(array_distinct(
            shingle_hashes(normText(col(textCol)), shingleLen))).as("hashes")))
      cand
        .join(candHashes.select(col("doc_id").as("doc_a"), col("hashes").as("h_a")), "doc_a")
        .join(candHashes.select(col("doc_id").as("doc_b"), col("hashes").as("h_b")), "doc_b")
        .select(col("doc_a"), col("doc_b"),
          round(sorted_jaccard(col("h_a"), col("h_b")), 6).as("jaccard"))
        .filter(col("jaccard") >= minJaccard)
    } else {
      // estimate Jaccard as the fraction of agreeing signature slots
      candidates
        .join(sigs.select(col("doc_id").as("doc_a"), col("sig").as("sig_a")), "doc_a")
        .join(sigs.select(col("doc_id").as("doc_b"), col("sig").as("sig_b")), "doc_b")
        .select(
          col("doc_a"), col("doc_b"),
          (minhash_agreement(col("sig_a"), col("sig_b")).cast("double") / k)
            .as("est_jaccard"))
        .filter(col("est_jaccard") >= minJaccard)
    }
  }

  /** SimHash near-duplicate pairs. 64-bit sketch per doc (60-bit with
    * `portableMd5` — that family's hash is DuckDB-recomputable, so the
    * whole query is brute-force oracle-checkable); split into `chunks`
    * equal bit-chunks and bucket-join on any equal chunk — by
    * pigeonhole, every pair within Hamming distance < chunks shares at
    * least one exact chunk, so recall is 1.0 for maxHamming ≤ chunks-1.
    * Output: (doc_a, doc_b, hamming). */
  def simhashNearDup(docs: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3, chunks: Int = 4,
      portableMd5: Boolean = false,
      maxBucketSize: Option[Int] = None): DataFrame = {
    val bits = if (portableMd5) 60 else 64
    // maxHamming ≥ chunks is legal (recall becomes probabilistic, per
    // the scaladoc) — only the chunk arithmetic is a hard requirement.
    require(bits % chunks == 0, s"chunks must divide $bits")
    val bitsPerChunk = bits / chunks
    val skCol = if (portableMd5) md5_simhash(words(col(textCol)))
                else simhash(words(col(textCol)))
    val sk = materialize(ensureParallelism(docs).select(
        col(idCol).as("doc_id"),
        skCol.as("sk"))
      .filter(col("sk").isNotNull)) // feeds both sides of the chunk-bucket self-join
    val chunked = sk.select(
      col("doc_id"), col("sk"),
      posexplode(array((0 until chunks).map(c =>
        shiftrightunsigned(col("sk"), c * bitsPerChunk)
          .bitwiseAND(lit((1L << bitsPerChunk) - 1))): _*)))
      .toDF("doc_id", "sk", "chunk", "chunk_val")
    val guarded = guardBuckets(chunked, Seq("chunk", "chunk_val"),
      maxBucketSize, "simhashNearDup")
    val a = guarded.as("a"); val b = guarded.as("b")
    a.join(b,
        col("a.chunk") === col("b.chunk") &&
        col("a.chunk_val") === col("b.chunk_val") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(
        col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        hamming64(col("a.sk"), col("b.sk")).as("hamming"))
      // hamming filter BEFORE the pair-dedup: far pairs (the vast
      // majority of chunk collisions) never enter the distinct's
      // shuffle, which would otherwise carry every candidate pair
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** Sorted distinct word-n-gram hash sketch (doc_id, hashes), empty
    * docs dropped — THE one Scala rendering of the Jaccard sketch
    * contract (its oracle twin is ExtensionQueries' gram CTEs; the two
    * must change together), shared by the symmetric and cross-corpus
    * near-dup ops. Jaccard over the hash arrays equals Jaccard over
    * shingles (collisions negligible at 64 bits) and shuffles 8-byte
    * longs instead of repeated shingle strings. Materialized: every
    * caller fans it into ≥ 2 consumers (prefix explode + verify joins).
    *
    * Public because the sketch IS the persistable index: a pipeline
    * that stores (doc_id, hashes) alongside its corpus never pays the
    * tokenize+hash cost for standing documents again — the sketched
    * variants below accept such a stored frame directly
    * ([[graft.streaming.Streaming.ingestDedupSink]] is the streaming
    * consumer). */
  def ngramSketch(df: DataFrame, idCol: String, textCol: String,
      ngram: Int): DataFrame =
    materialize(ensureParallelism(df).select(
        col(idCol).as("doc_id"),
        array_sort(array_distinct(
          ngram_hashes(words(col(textCol)), ngram))).as("hashes"))
      .filter(size(col("hashes")) > 0))

  /** Word-n-gram Jaccard near-dup with prefix filtering: candidates
    * must share one of the `prefixK` smallest shingle hashes (a
    * bottom-k prefix filter — any pair with Jaccard ≥ t shares a
    * bottom hash with high probability), then exact Jaccard verifies.
    * Output: (doc_a, doc_b, jaccard). */
  def ngramJaccardNearDup(docs: DataFrame, idCol: String, textCol: String,
      ngram: Int = 3, prefixK: Int = 4, minJaccard: Double = 0.5,
      maxBucketSize: Option[Int] = None): DataFrame =
    ngramJaccardNearDupSketched(
      ngramSketch(docs, idCol, textCol, ngram), prefixK, minJaccard, maxBucketSize)

  /** [[ngramJaccardNearDup]] over an already-built (doc_id, hashes)
    * sketch frame — the entry point when sketches are persisted (or
    * already materialized for another consumer). `sh` must be the
    * [[ngramSketch]] rendering: sorted distinct hashes, no empty
    * arrays; pass a parquet-backed sketch table as-is (a scan is its
    * own cheap "materialization" — both consumers re-read columnar
    * longs, never re-hash text). */
  def ngramJaccardNearDupSketched(sh: DataFrame, prefixK: Int = 4,
      minJaccard: Double = 0.5,
      maxBucketSize: Option[Int] = None): DataFrame =
    scoredCandidates(sh, prefixK, maxBucketSize)
      .filter(col("jaccard") >= minJaccard)

  /** The banded engine's candidate stage, scored but UNFILTERED:
    * bottom-`prefixK` hash buckets → distinct candidate pairs → exact
    * Jaccard per pair. Shared by [[ngramJaccardNearDupSketched]] (which
    * applies the threshold) and [[candidatePrecision]] (which audits
    * how many candidates the threshold keeps). */
  private[operators] def scoredCandidates(sh: DataFrame, prefixK: Int,
      maxBucketSize: Option[Int]): DataFrame = {
    val prefixes = guardBuckets(
      sh.select(
        col("doc_id"),
        explode(slice(col("hashes"), 1, prefixK)).as("ph")),
      Seq("ph"), maxBucketSize, "ngramJaccardNearDup")
    val a = prefixes.as("a"); val b = prefixes.as("b")
    val cand = a.join(b,
        col("a.ph") === col("b.ph") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    cand
      .join(sh.toDF("doc_a", "sh_a"), "doc_a")
      .join(sh.toDF("doc_b", "sh_b"), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        round(sorted_jaccard(col("sh_a"), col("sh_b")), 6).as("jaccard"))
  }

  /** [[ngramSketch]] with PORTABLE md5-60 gram hashes (the DuckDB-
    * recomputable space-joined-gram hash) instead of the xxhash64
    * combine — the sketch behind oracle-checked banding audits. */
  private[operators] def md5NgramSketch(df: DataFrame, idCol: String,
      textCol: String, ngram: Int): DataFrame =
    materialize(ensureParallelism(df).select(
        col(idCol).as("doc_id"),
        array_sort(array_distinct(
          md5_ngram_hashes(words(col(textCol)), ngram))).as("hashes"))
      .filter(size(col("hashes")) > 0))

  /** Candidate-generator PRECISION audit — what the prefix filter's
    * fan-out actually buys: of all candidate pairs the bottom-prefixK
    * banding generates, how many survive each verification threshold.
    * Low precision at the production threshold means the engine pays
    * exact-Jaccard verification for mostly-noise candidates (raise
    * the band selectivity or the df cap — [[dfCapAdvisor]] forecasts
    * the fan-out side of the same trade). The recall side is the
    * (1 − t)^prefixK analytic bound on the near-dup scaladoc; this
    * audit completes the precision side empirically. Banding rides
    * the PORTABLE md5-60 gram hashes ([[md5NgramSketch]]) so the
    * oracle reproduces the exact candidate set (the xxhash64 combine
    * of the production sketch is not SQL-expressible; hash family
    * does not change the precision statistics, only tie-breaks).
    *
    * Scale: ONE scored-candidate pass (the engine's own stage,
    * checkpointed — bounded by banding fan-out, df-cappable), then
    * one re-aggregation per threshold. Thresholds are integer micro
    * (engine and oracle compare the SAME 6-dp-rounded Jaccard).
    *
    * Output per threshold: (min_jaccard_micro, n_candidates,
    * n_verified, precision_micro), ordered by threshold. */
  def candidatePrecision(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", ngram: Int = 3, prefixK: Int = 8,
      thresholdsMicro: Seq[Long] = Seq(200000L, 500000L, 800000L),
      maxBucketSize: Option[Int] = None): DataFrame = {
    require(thresholdsMicro.nonEmpty &&
      thresholdsMicro.forall(t => t >= 0 && t <= 1000000L),
      s"candidatePrecision: thresholds must be micro in [0, 1e6], " +
        s"got $thresholdsMicro")
    require(thresholdsMicro.distinct.size == thresholdsMicro.size,
      s"candidatePrecision: duplicate thresholds in $thresholdsMicro")
    val scored = scoredCandidates(
        md5NgramSketch(docs, idCol, textCol, ngram), prefixK, maxBucketSize)
      .select(expr("CAST(round(jaccard * 1000000.0D) AS BIGINT)").as("__jm"))
      .localCheckpoint(true) // one candidate pass feeds every threshold
    val tot = scored.agg(count(lit(1)).cast("bigint").as("__nc"))
    val tArr = array(thresholdsMicro.sorted.map(lit): _*)
    scored
      .select(col("__jm"), explode(tArr).as("min_jaccard_micro"))
      .groupBy(col("min_jaccard_micro"))
      .agg(sum(when(col("__jm") >= col("min_jaccard_micro"), 1L)
        .otherwise(0L)).cast("bigint").as("n_verified"))
      .crossJoin(broadcast(tot))
      .filter(col("__nc") > 0)
      .select(col("min_jaccard_micro"), col("__nc").as("n_candidates"),
        col("n_verified"),
        expr("n_verified * 1000000L div __nc").as("precision_micro"))
      .orderBy(col("min_jaccard_micro"))
  }

  /** Incremental cross-corpus near-dup: which INCOMING documents are
    * near-duplicates of an EXISTING corpus — the "don't re-ingest what
    * we already have" gate of a continuously-crawled pipeline, the
    * asymmetric sibling of [[ngramJaccardNearDup]]. Candidates must
    * share a bottom-`prefixK` shingle hash across the two frames,
    * then exact Jaccard verifies against the corpus sketch.
    *
    * Recall bound (same argument as the symmetric op, stated here
    * because this op gates INGEST, where a miss silently re-admits a
    * duplicate): each of a doc's bottom-`prefixK` hashes lands in the
    * pair's intersection with probability ≈ its Jaccard J, so a true
    * pair at exactly `minJaccard` is missed with probability ≤
    * (1 − minJaccard)^prefixK — ~0.4% at the (0.5, 8) defaults but
    * ~17% at (0.2, 8). The filter is NOT recall-safe for arbitrary
    * thresholds: when lowering `minJaccard`, raise `prefixK` to match
    * ([[prefixKFor]] computes the k that keeps the miss probability
    * under a chosen ε).
    *
    * Scale: the corpus side is sketched once (8-byte hash arrays, ~3
    * orders smaller than text) and joined by prefix hash — the classic
    * shape where incoming ≪ corpus, so the candidate join's output is
    * bounded by incoming × collision rate, never corpus². With a
    * persisted corpus sketch table the corpus-side hashing cost
    * disappears from the ingest path entirely.
    *
    * Output: (new_id, old_id, jaccard ≥ minJaccard). */
  def crossNearDup(incoming: DataFrame, corpus: DataFrame,
      idCol: String, textCol: String, ngram: Int = 3, prefixK: Int = 8,
      minJaccard: Double = 0.5): DataFrame =
    crossNearDupSketched(
      ngramSketch(incoming, idCol, textCol, ngram),
      ngramSketch(corpus, idCol, textCol, ngram), prefixK, minJaccard)

  /** [[crossNearDup]] over already-built sketch frames — the ingest
    * hot path once the corpus sketch is PERSISTED: the standing corpus
    * contributes a columnar (doc_id, hashes) scan and zero hashing
    * work per batch. Both frames must follow the [[ngramSketch]]
    * contract (sorted distinct hashes, no empty arrays). */
  def crossNearDupSketched(sIn: DataFrame, sOld: DataFrame,
      prefixK: Int = 8, minJaccard: Double = 0.5): DataFrame = {
    def prefixes(sh: DataFrame, id: String) = sh.select(
      col("doc_id").as(id), explode(slice(col("hashes"), 1, prefixK)).as(s"__ph_$id"))
    val cand = prefixes(sIn, "new_id")
      .join(prefixes(sOld, "old_id"),
        col("__ph_new_id") === col("__ph_old_id"))
      .select(col("new_id"), col("old_id")).distinct()
    cand
      .join(sIn.toDF("new_id", "sh_a"), "new_id")
      .join(sOld.toDF("old_id", "sh_b"), "old_id")
      .select(col("new_id"), col("old_id"),
        round(sorted_jaccard(col("sh_a"), col("sh_b")), 6).as("jaccard"))
      .filter(col("jaccard") >= minJaccard)
  }

  /** Smallest `prefixK` whose bottom-k prefix filter misses a true
    * pair at Jaccard = `minJaccard` with probability ≤ `epsilon`:
    * ⌈ln ε / ln(1 − minJaccard)⌉. E.g. (0.5, 1%) → 7; (0.2, 1%) → 21.
    * Larger k only widens the candidate join (more prefix hashes per
    * doc), never changes verified output — the exact-Jaccard rescore
    * is the precision gate. */
  def prefixKFor(minJaccard: Double, epsilon: Double = 0.01): Int = {
    require(minJaccard > 0 && minJaccard < 1, s"minJaccard in (0,1): $minJaccard")
    require(epsilon > 0 && epsilon < 1, s"epsilon in (0,1): $epsilon")
    math.ceil(math.log(epsilon) / math.log1p(-minJaccard)).toInt.max(1)
  }

  /** Connected components over near-dup PAIRS → cluster ids: the step
    * that turns pairwise near-dup evidence into one-survivor-per-
    * cluster dedup decisions (pair relations are not transitive — a
    * chain a~b~c must land in one cluster even when a~c misses the
    * threshold).
    *
    * Min-label propagation: every node starts labeled with itself;
    * each round takes the min of its own and its neighbors' labels;
    * fixpoint = component minimum. The driver loop is control plane
    * only (one `count()` per round for convergence); per-round work is
    * a key-partitioned join+agg. Rounds = component diameter — near-dup
    * clusters are shallow (dups of a common source), so this converges
    * in 2-4 rounds; for adversarial long-chain graphs the large-star/
    * small-star variant would cut rounds to O(log n), not needed here.
    * `localCheckpoint` per round truncates the growing lineage (the
    * classic iterative-algorithm OOM trap).
    *
    * Output: (doc_id, cluster_id = min doc id of the component), one
    * row per node that appears in ≥ 1 pair. */
  def connectedComponents(pairs: DataFrame,
      aCol: String = "doc_a", bCol: String = "doc_b",
      maxIter: Int = 25): DataFrame = {
    // r19: both edge directions come from ONE pass over `pairs` via a
    // 2-way explode — the union form referenced the (often expensive,
    // un-checkpointed) pair subtree twice in one plan.
    val edges = materialize(
      pairs.select(explode(array(
          struct(col(aCol).as("src"), col(bCol).as("dst")),
          struct(col(bCol).as("src"), col(aCol).as("dst")))).as("__e"))
        .select(col("__e.src").as("src"), col("__e.dst").as("dst"))
        .distinct())
    var labels = materialize(
      edges.select(col("src").as("node")).distinct()
        .withColumn("label", col("node")))
    // the materialized frame behind `labels`, released once the next
    // round's checkpoint exists — otherwise executor storage grows
    // O(rounds × |V|) across the iteration
    var labelsMat = labels
    var changed = 1L
    var i = 0
    // r19 NEGATIVE RESULTS (measured, reverted — see
    // OPTIMIZATION_r19.md): (a) pointer jumping / label-link
    // shortcutting (augmenting the neighbor join with v ↔ label(v)
    // links) cut the x84 mutual-kNN iteration only 16 → 13 steps —
    // min-label propagation is wavefront-bound, not pointer-chain-
    // bound — while fattening every join; (b) batching TWO steps per
    // materializing action halved the job count but the lazy step-1
    // frame is referenced up to 4× by step 2's plan, so each batch
    // re-derived it repeatedly and benched SLOWER (x84 3.9 → 5.3 s).
    // The 1-job-per-round lazy-checkpoint loop below remains the
    // measured optimum.
    while (changed > 0 && i < maxIter) {
      val nbrMin = edges
        .join(labels.select(col("node").as("dst"), col("label").as("nbr")), "dst")
        .groupBy(col("src")).agg(min(col("nbr")).as("nbr_min"))
      // LAZY checkpoint + count = ONE job per round (the count is the
      // materializing action; blocks persist for the next round's
      // joins). An eager checkpoint here would cost a second full pass
      // per round just to learn `changed`. Lazy is race-free in this
      // one case because the count is the sole consumer until the
      // blocks exist — unlike the fan-out sketches `materialize`
      // serves, where two join branches would race to recompute.
      val updated = labels
        .join(nbrMin.select(col("src").as("node"), col("nbr_min")), Seq("node"), "left")
        .select(col("node"), col("label"),
          least(col("label"), coalesce(col("nbr_min"), col("label"))).as("next"))
        .localCheckpoint(false)
      changed = updated.filter(col("next") =!= col("label")).count()
      // RDD-layer release: Dataset.unpersist is a CacheManager no-op
      // for checkpoint-backed frames and would leave one label
      // snapshot per round pinned until the ContextCleaner runs
      org.apache.spark.sql.graftbridge.unpersistCheckpoint(labelsMat)
      labelsMat = updated
      labels = updated.select(col("node"), col("next").as("label"))
      i += 1
    }
    // A maxIter exit with labels still moving would silently return
    // non-component-minimum ids (diameter > maxIter chains) — that is
    // WRONG output, not degraded output, so fail loudly instead.
    if (changed > 0) throw new IllegalStateException(
      s"connectedComponents did not converge in $maxIter rounds " +
        s"($changed labels still changing) — raise maxIter or use a " +
        "large-star/small-star contraction for long-chain graphs")
    if (sys.env.get("SPARK_GRAFT_CC_DEBUG").contains("1"))
      println(s"[cc] converged in $i rounds")
    labels.select(col("node").as("doc_id"), col("label").as("cluster_id"))
  }

  /** Cluster canonicalization — the ACTION step after near-dup
    * detection: per duplicate cluster keep exactly ONE representative
    * (longest by `lenCol`, id-ascending tie-break) and mark the rest
    * for purge. [[connectedComponents]] says which docs are the same;
    * this says which copy survives — together they are the
    * "dedup-then-keep-best" pass every pretraining pipeline runs.
    *
    * Representative choice is total-ordered (len DESC, id ASC), so the
    * output is deterministic and any SQL engine can replay it. A
    * cluster member missing from `docs` still appears in the output
    * (its length coalesces below every real length, so it can win only
    * a cluster with no measured member) — dropping it would silently
    * shrink the purge list, the [[graft.operators.TextAnalysis.splitLeakage]]
    * coverage lesson.
    *
    * Scale: representative selection is one partial+final min(struct)
    * aggregate — never a per-cluster window, so a pathological
    * mega-cluster (boilerplate) costs a 16-byte struct per row
    * map-side, not a single-partition sort. The canonical map is
    * cluster-scale (≪ corpus) and broadcasts back onto the cluster
    * relation.
    *
    * `priorityCol` (optional, long-castable, lower = preferred)
    * prepends a keep tier to the rule — (priority ASC, len DESC,
    * id ASC) — the source-trust policy of curated-corpus dedup: a
    * curated copy survives over a longer crawled one. Members missing
    * from `docs` coalesce BELOW every real priority so they can win
    * only an unmeasured cluster, mirroring the length coalesce.
    * Output: (doc_id, cluster_id, canonical_id, keep). */
  def canonicalizeClusters(clusters: DataFrame, docs: DataFrame,
      idCol: String = "doc_id", lenCol: String = "n_chars",
      priorityCol: Option[String] = None): DataFrame = {
    val docCols = Seq(col(idCol).as("doc_id"),
      col(lenCol).cast("long").as("__len")) ++
      priorityCol.map(p => col(p).cast("long").as("__pr"))
    val withLen = clusters.join(docs.select(docCols: _*), Seq("doc_id"), "left")
      .select(Seq(col("doc_id"), col("cluster_id"),
        // -1 sorts below every real (non-negative) length; Long.MinValue
        // would overflow under the min(struct(-len, id)) negation
        coalesce(col("__len"), lit(-1L)).as("__len")) ++
        // missing members rank AFTER every real priority tier
        priorityCol.map(_ =>
          coalesce(col("__pr"), lit(Long.MaxValue)).as("__pr")): _*)
    val keyFields =
      priorityCol.map(_ => col("__pr").as("__p")).toSeq ++
      Seq((-col("__len")).as("__nl"), col("doc_id").as("__id"))
    val canon = withLen.groupBy(col("cluster_id"))
      .agg(min(struct(keyFields: _*)).as("__c"))
      .select(col("cluster_id"), col("__c.__id").as("canonical_id"))
    withLen.join(broadcast(canon), Seq("cluster_id"))
      .select(col("doc_id"), col("cluster_id"), col("canonical_id"),
        (col("doc_id") === col("canonical_id")).as("keep"))
  }

  /** Embedding near-dup: pairs with cosine ≥ threshold. Candidate
    * generation via random-hyperplane LSH (see [[Similarity.hyperplaneBucket]])
    * keeps this off the O(n²) cross join; exact cosine verifies. Docs
    * whose embeddings disagree in every probed bucket are missed —
    * recall/cost tuned by `nPlanes` (fewer planes = bigger buckets). */
  def embeddingNearDup(emb: DataFrame, idCol: String, vecCol: String,
      minCosine: Double = 0.95, nPlanes: Int = 8, dim: Int = 64): DataFrame = {
    // dim MUST match the data: a mismatched plane length makes every
    // dot_product null → all vectors share bucket 0 → silent O(n²)
    // r19: ensureParallelism AFTER the checkpoint — when `emb` ends in
    // an aggregation (x258's hashedEmbedding), AQE coalesces the
    // checkpointed frame to ONE partition and the bucket self-join's
    // probe side (pair fan-out + cosine per candidate) runs single-
    // threaded (measured at sf0.1: 897k candidate pairs on 1 task =
    // ~2.2 s of x258's 3.8 s). Post-checkpoint the partition count is
    // the executed one, so the check is reliable; the round-robin
    // exchange moves only the compact (id, vec, bucket) frame and is a
    // no-op once the frame arrives already parallel (the 100 TB case).
    val bucketed = ensureParallelism(materialize(emb.select(
        col(idCol).as("doc_id"), col(vecCol).as("vec"),
        Similarity.hyperplaneBucket(col(vecCol), nPlanes, dim).as("bucket"))
      .filter(size(col("vec")) === dim)))
    val a = bucketed.as("a"); val b = bucketed.as("b")
    a.join(b,
        col("a.bucket") === col("b.bucket") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        round(cosine_similarity(col("a.vec"), col("b.vec")), 6).as("cosine"))
      .filter(col("cosine") >= minCosine)
  }

  /** Dedup-STACK disagreement audit — where the lexical and the
    * embedding near-dup engines disagree: the x04 n-gram Jaccard pair
    * relation full-outer-joined with the x05 embedding-cosine pair
    * relation, classified `both` / `lexical_only` / `embedding_only`
    * with the mean score per class. The classes are the dedup
    * program's blind-spot map: `lexical_only` pairs are surface
    * copies an embedding dedup would KEEP (template families, near-
    * verbatim edits below the cosine cut), `embedding_only` pairs are
    * paraphrases a lexical dedup never sees — the volume of each
    * tells which stack to tighten, the per-class means how far the
    * thresholds are from each other (x248's transfer curve gives the
    * mapping; this gives the disagreement mass).
    *
    * Exactness: scores quantize once to integer micro (the x248
    * convention); class means are truncating integer div over exact
    * micro sums.
    *
    * Scale: both inputs stay their bucketed selves (prefix-k bands /
    * LSH buckets — never all-pairs); the audit adds one full-outer
    * join on the pair keys and a 3-row aggregation.
    *
    * Output: (dup_class, n_pairs, avg_jaccard_micro — null for
    * embedding_only, avg_cosine_micro — null for lexical_only),
    * ordered by dup_class. */
  def dedupStackDisagreement(docs: DataFrame, emb: DataFrame,
      minJaccard: Double = 0.2, minCosine: Double = 0.15,
      ngram: Int = 3, prefixK: Int = 8, nPlanes: Int = 6): DataFrame = {
    val lex = ngramJaccardNearDup(docs, "doc_id", "text", ngram, prefixK,
        minJaccard)
      .select(col("doc_a"), col("doc_b"),
        round(col("jaccard") * lit(1000000.0)).cast("long").as("__j"))
    val sem = embeddingNearDup(emb, "vec_id", "embedding", minCosine, nPlanes)
      .select(col("doc_a"), col("doc_b"),
        round(col("cosine") * lit(1000000.0)).cast("long").as("__c"))
    lex.join(sem, Seq("doc_a", "doc_b"), "full_outer")
      .select(
        when(col("__j").isNotNull && col("__c").isNotNull, lit("both"))
          .when(col("__j").isNotNull, lit("lexical_only"))
          .otherwise(lit("embedding_only")).as("dup_class"),
        col("__j"), col("__c"))
      .groupBy(col("dup_class"))
      .agg(count(lit(1)).cast("bigint").as("n_pairs"),
        expr("CASE WHEN count(__j) > 0 THEN sum(__j) div count(__j) END")
          .as("avg_jaccard_micro"),
        expr("CASE WHEN count(__c) > 0 THEN sum(__c) div count(__c) END")
          .as("avg_cosine_micro"))
      .orderBy(col("dup_class"))
  }

  /** SemDeDup-style semantic dedup: cluster embeddings coarsely (the
    * training-free fixed-centroid IVF assignment of
    * [[Similarity.ivfAssignFixed]] — deterministic literals, so any
    * engine reproduces the geometry), then within each cluster mark a
    * vector as a duplicate when some LOWER-id vector in the same
    * cluster sits at cosine ≥ `minCosine`. The within-cluster pair
    * join replaces the O(n²) corpus cross join with Σ|cluster|² work —
    * the standard SemDeDup trade: cross-cluster near-dups are missed,
    * recall is bought with more/finer clusters.
    *
    * Output: one row per DROPPED vector — (vec_id, list_id,
    * kept_by = the smallest qualifying lower id, n_nbrs = how many
    * lower-id neighbors cleared the threshold). Survivors are the
    * complement; emitting drops keeps the result small and the
    * decision auditable. */
  def semanticDedup(emb: DataFrame, idCol: String, vecCol: String,
      nLists: Int = 8, minCosine: Double = 0.15, dim: Int = 64): DataFrame = {
    val cents = Similarity.fixedCentroids(nLists, dim)
    // degenerate vectors (wrong length / zero norm) have no defined
    // cosine — excluded from assignment, as ivfAssignFixed requires
    val assigned = materialize(
      Similarity.ivfAssignFixed(
        ensureParallelism(emb)
          .select(col(idCol).as("vec_id"), col(vecCol).as("vec"))
          .filter(size(col("vec")) === dim &&
            dot_product(col("vec"), col("vec")) > 0),
        cents, "vec"))
    val a = assigned.as("a"); val b = assigned.as("b")
    a.join(b,
        col("a.list_id") === col("b.list_id") &&
        col("a.vec_id") > col("b.vec_id"))
      // round-6 BEFORE the threshold compare (the x05-proven contract):
      // both engines produce the identical rounded double, so a
      // boundary pair cannot flip on a last-ulp accumulation difference
      .filter(round(cosine_similarity(col("a.vec"), col("b.vec")), 6)
        >= minCosine)
      .groupBy(col("a.vec_id").as("vec_id"), col("a.list_id").as("list_id"))
      .agg(min(col("b.vec_id")).as("kept_by"),
        count(lit(1)).as("n_nbrs"))
  }

  /** MinHash near-dup over the SALTED-MD5 signature family with the
    * ESTIMATE as the final score — the fully-auditable sibling of
    * [[minhashNearDup]]: every step (signatures, band buckets, slot
    * agreement) is recomputable in plain SQL, so an oracle replays the
    * ALGORITHM itself — banding misses and all — and the output is
    * value-checked without any ground-truth claim. Use it to certify
    * the approximate pipeline; use the xx64 sibling for raw speed.
    *
    * Same scale shape as minhashNearDup: sketch projection → band
    * bucket equi-join (band index + signature slice; the slice array
    * IS the join key — Spark hash-partitions array keys fine) →
    * agreement scoring over candidate signatures only. */
  def md5MinhashNearDup(docs: DataFrame, idCol: String, textCol: String,
      ngram: Int = 3, bands: Int = 4, rowsPerBand: Int = 4,
      minEst: Double = 0.5): DataFrame = {
    import graft.functions.ShingleFunctions.{md5_ngram_minhash, minhash_agreement}
    val k = bands * rowsPerBand
    val sigs = materialize(ensureParallelism(docs).select(
        col(idCol).as("doc_id"),
        md5_ngram_minhash(words(col(textCol)), ngram, k).as("sig"))
      .filter(col("sig").isNotNull))
    val banded = sigs.select(
      col("doc_id"),
      posexplode(transform(
        sequence(lit(0), lit(bands - 1)),
        b => slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand)))))
      .toDF("doc_id", "band", "bslice")
    val a = banded.as("a"); val b = banded.as("b")
    val candidates = a.join(b,
        col("a.band") === col("b.band") &&
        col("a.bslice") === col("b.bslice") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    candidates
      .join(sigs.toDF("doc_a", "sig_a"), "doc_a")
      .join(sigs.toDF("doc_b", "sig_b"), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        (minhash_agreement(col("sig_a"), col("sig_b")) / lit(k.toDouble))
          .as("est_jaccard"))
      .filter(col("est_jaccard") >= minEst)
  }

  /** Dedup savings report — the per-source accounting a dedup run
    * ships to decide whether it was worth running: docs and chars
    * before vs after [[canonicalizeClusters]]' keep rule, and the
    * saved fraction in integer micro-units. Docs outside every cluster
    * are kept by definition (left join + keep coalesced true), so the
    * totals reconcile with the raw corpus row-for-row — a report that
    * only counted cluster members would overstate savings on a mostly
    * unique corpus.
    *
    * Scale: one left broadcast join of the corpus against the
    * collision-scale canonical relation (≪ corpus, the
    * [[graft.operators.TextAnalysis]] cluster-split envelope), then a
    * single partial+final aggregation per source. Output: (source,
    * n_docs, n_kept, chars_total, chars_kept, savings_micro). */
  def dedupSavings(docs: DataFrame, canon: DataFrame,
      idCol: String = "doc_id", srcCol: String = "source",
      lenCol: String = "n_chars"): DataFrame =
    docs.select(col(idCol).as("doc_id"), col(srcCol).as("source"),
        col(lenCol).cast("long").as("__len"))
      .join(broadcast(canon.select(col("doc_id"), col("keep"))),
        Seq("doc_id"), "left")
      .withColumn("__keep", coalesce(col("keep"), lit(true)))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("__keep").cast("long")).cast("bigint").as("n_kept"),
        sum(col("__len")).cast("bigint").as("chars_total"),
        sum(when(col("__keep"), col("__len")).otherwise(lit(0L)))
          .cast("bigint").as("chars_kept"))
      .withColumn("savings_micro",
        expr("(chars_total - chars_kept) * 1000000L div chars_total"))

  /** IDF-weighted Jaccard rescoring of the near-dup pair relation:
    * plain Jaccard treats every shingle equally, so boilerplate-heavy
    * corpora (shared headers, licence blocks, navigation chrome)
    * produce pairs that agree only on ubiquitous grams. Re-scoring
    * each pair as Σ_{g∈A∩B} idf(g) / Σ_{g∈A∪B} idf(g) discounts
    * grams by how many documents carry them — a pair held together
    * by corpus-wide boilerplate collapses toward 0 while a pair
    * sharing RARE content holds its score. The (jaccard, wj) gap is
    * itself the boilerplate diagnostic.
    *
    * Exactness: idf quantizes ONCE per gram to micro-nats
    * (ln(N/df) over exact integers, the x67 discipline); pair
    * intersection/union weights are then exact BIGINT sums, and the
    * rescored value is one floor division.
    *
    * Scale: candidates come from the SAME prefix-sketch join as
    * [[ngramJaccardNearDup]] (never all-pairs); the rescore joins
    * pair×gram frames keyed on (doc, gram) — bounded by
    * |pairs|·grams-per-doc; the df frame is gram-keyed (hash join,
    * never broadcast — web-scale gram dictionaries don't fit).
    *
    * Output: (doc_a, doc_b, jaccard, wj_micro), ordered by
    * (doc_a, doc_b). */
  def weightedJaccardRescore(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", ngram: Int = 3, prefixK: Int = 8,
      minJaccard: Double = 0.2): DataFrame = {
    import graft.functions.ShingleFunctions.ngram_strings
    import graft.functions.TextFunctions.words
    val grams = docs
      .select(col(idCol).as("doc_id"),
        explode(array_distinct(ngram_strings(words(col(textCol)), ngram)))
          .as("gram"))
      .localCheckpoint(true) // feeds df, per-doc totals, and the rescore
    val nDocs = docs.select(col(idCol)).agg(count(lit(1)).as("__n"))
    val idf = grams.groupBy(col("gram")).agg(count(lit(1)).as("__df"))
      .join(broadcast(nDocs))
      .select(col("gram"),
        round(round(log(col("__n").cast("double") /
          col("__df").cast("double")), 6) * lit(1000000.0)).cast("long")
          .as("__idf"))
    val gw = grams.join(idf, "gram")
      .select(col("doc_id"), col("gram"), col("__idf"))
      .localCheckpoint(true)
    val docTot = gw.groupBy(col("doc_id"))
      .agg(sum(col("__idf")).cast("bigint").as("__tot"))
    val pairs = ngramJaccardNearDup(docs, idCol, textCol, ngram, prefixK,
      minJaccard)
    val inter = pairs
      .join(gw.toDF("doc_a", "gram", "__idf"), "doc_a")
      .join(gw.select(col("doc_id").as("doc_b"), col("gram")),
        Seq("doc_b", "gram"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(sum(col("__idf")).cast("bigint").as("__inter"))
    pairs
      .join(inter, Seq("doc_a", "doc_b"))
      .join(docTot.toDF("doc_a", "__ta"), "doc_a")
      .join(docTot.toDF("doc_b", "__tb"), "doc_b")
      .select(col("doc_a"), col("doc_b"), col("jaccard"),
        // a pair whose every gram is corpus-ubiquitous (all idf 0)
        // has no weighted evidence either way: NULL, not 0/0
        when(col("__ta") + col("__tb") - col("__inter") > 0,
          expr("__inter * 1000000L div (__ta + __tb - __inter)"))
          .as("wj_micro"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** Containment DIRECTION of near-dup pairs: Jaccard is symmetric,
    * so a short document quoted inside a long one scores low even
    * when the short doc is entirely contained — the classic quote/
    * excerpt blind spot. For every pair the symmetric relation
    * surfaces, this adds containment = |A∩B| / min(|A|, |B|) (the
    * overlap coefficient) and which side is the contained one — the
    * read that separates "true near-twins" (mutual, sizes close)
    * from "B embeds A" (asymmetric), which dedup keep-rules treat
    * differently (drop the twin; keep both for the quote).
    *
    * Exactness: the intersection is the exact integer size of
    * `array_intersect` on the sorted distinct gram-hash sketches
    * (set semantics on both engines); sizes and the micro overlap
    * are integer algebra; direction compares integers with the
    * contained-side tie going to `both_equal`.
    *
    * Scale: reuses the sketch + candidate machinery of
    * [[ngramJaccardNearDup]] (ONE sketch build feeds candidates,
    * Jaccard, sizes, and the intersection — the frame is
    * localCheckpoint'd); the add-on work is per-PAIR, bounded by the
    * pair relation, never corpus².
    *
    * Output: (doc_a, doc_b, jaccard, size_a, size_b, isz,
    * containment_micro, direction), ordered by (doc_a, doc_b). */
  def pairContainment(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", ngram: Int = 3, prefixK: Int = 8,
      minJaccard: Double = 0.2): DataFrame = {
    val sh = ngramSketch(docs, idCol, textCol, ngram).localCheckpoint(true)
    val pairs = ngramJaccardNearDupSketched(sh, prefixK, minJaccard)
    pairs
      .join(sh.toDF("doc_a", "__sa"), "doc_a")
      .join(sh.toDF("doc_b", "__sb"), "doc_b")
      .select(col("doc_a"), col("doc_b"), col("jaccard"),
        size(col("__sa")).cast("bigint").as("size_a"),
        size(col("__sb")).cast("bigint").as("size_b"),
        size(array_intersect(col("__sa"), col("__sb"))).cast("bigint")
          .as("isz"))
      .withColumn("containment_micro",
        expr("isz * 1000000L div least(size_a, size_b)"))
      .withColumn("direction",
        when(col("size_a") < col("size_b"), "a_in_b")
          .when(col("size_a") > col("size_b"), "b_in_a")
          .otherwise("both_equal"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** Dedup threshold sweep: how many near-dup pairs and affected docs
    * each candidate Jaccard threshold would produce — the "choose the
    * threshold from the data" curve x115's single-threshold savings
    * presupposes. One pair-relation pass at the FLOOR threshold
    * serves every decile above it: pairs histogram by jaccard decile,
    * docs by their MAX pair jaccard decile (a doc is affected at t
    * iff its best pair clears t), both cumulated downward — so the
    * sweep costs one extra aggregation, not one near-dup run per
    * threshold.
    *
    * Exactness: jaccard arrives rounded to 6 dp from the pair
    * kernel; the decile comes from the INTEGER micro jaccard —
    * round(j·10⁶) div 10⁵ — so an exact-boundary score (0.3 stored
    * as 0.2999…96) lands in the decile its threshold label
    * advertises, where floor(j·10) on the double dropped it one
    * bucket low (ADVICE r9); the cumulations are integer window sums
    * over the ≤ 10-row decile frame. Deciles below the floor
    * threshold are absent by construction (the relation cannot see
    * them).
    *
    * Output: (decile, threshold_micro, n_pairs_ge, n_docs_ge) for
    * each decile ≥ floor(minJaccard·10), descending coverage as the
    * threshold rises. */
  def thresholdSweep(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", ngram: Int = 3, prefixK: Int = 8,
      minJaccard: Double = 0.2): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pairs = ngramJaccardNearDup(docs, idCol, textCol, ngram, prefixK,
        minJaccard)
      .select(col("doc_a"), col("doc_b"),
        least(expr("CAST(round(jaccard * 1000000.0D) AS BIGINT) div 100000L"),
          lit(9L)).as("dec"))
      .localCheckpoint(true) // feeds the pair and the doc histogram
    val pairHist = pairs.groupBy(col("dec")).agg(count(lit(1)).as("np"))
    val docBest = pairs
      .select(col("doc_a").as("d"), col("dec"))
      .union(pairs.select(col("doc_b").as("d"), col("dec")))
      .groupBy(col("d")).agg(max(col("dec")).as("dec"))
      .groupBy(col("dec")).agg(count(lit(1)).as("nd"))
    val wUp = Window.orderBy(col("dec").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    pairHist.join(docBest, Seq("dec"), "full_outer")
      .select(col("dec"),
        coalesce(col("np"), lit(0L)).as("np"),
        coalesce(col("nd"), lit(0L)).as("nd"))
      .withColumn("n_pairs_ge", sum(col("np")).over(wUp).cast("bigint"))
      .withColumn("n_docs_ge", sum(col("nd")).over(wUp).cast("bigint"))
      .select(col("dec").as("decile"),
        (col("dec") * 100000L).as("threshold_micro"),
        col("n_pairs_ge"), col("n_docs_ge"))
      .orderBy(col("decile"))
  }

  /** Cascade attribution: given an ORDERED sequence of (stage name,
    * flagged-id frame) — e.g. exact → fingerprint → n-gram →
    * embedding dedup — report what each stage flags in TOTAL and what
    * it flags FIRST (its marginal contribution: docs no earlier,
    * cheaper stage already caught). The "which dedup stages earn
    * their cost" table: a stage whose first-flag count is near zero
    * is pure overlap with its predecessors and can be dropped from
    * the pipeline, however many docs it flags in total. The
    * dedup-stage sibling of x43's quality-filter attribution.
    *
    * Pure integer: per-stage distinct id sets union with their stage
    * rank, one min-rank aggregation per doc, counts and one floor
    * division; stages with no flags report zeros, not absent rows.
    *
    * Scale: the flagged frames are already pair-relation outputs
    * (bounded by duplicate volume, not corpus volume); the union +
    * two hash aggregations key on the doc id.
    *
    * Output: (stage, stage_rank, n_flagged, n_first, marginal_micro
    * — n_first over the corpus doc count), ordered by stage_rank. */
  def cascadeAttribution(stages: Seq[(String, DataFrame)], idCol: String,
      corpus: DataFrame): DataFrame = {
    require(stages.nonEmpty, "cascadeAttribution: need at least one stage")
    require(stages.map(_._1).distinct.length == stages.length,
      s"cascadeAttribution: duplicate stage names in ${stages.map(_._1)}")
    val spark = corpus.sparkSession
    import spark.implicits._
    val tagged = stages.zipWithIndex.map { case ((_, df), i) =>
      df.select(col(idCol).as("id")).distinct()
        .withColumn("__r", lit(i + 1))
    }.reduce(_ unionAll _).localCheckpoint(true) // feeds both counts
    val flagged = tagged.groupBy(col("__r"))
      .agg(count(lit(1)).cast("bigint").as("n_flagged"))
    val firsts = tagged.groupBy(col("id"))
      .agg(min(col("__r")).as("__r"))
      .groupBy(col("__r"))
      .agg(count(lit(1)).cast("bigint").as("n_first"))
    val n = corpus.agg(count(lit(1)).cast("bigint").as("__n"))
    stages.zipWithIndex.map { case ((nm, _), i) => (nm, i + 1) }
      .toDF("stage", "stage_rank")
      .join(flagged, col("stage_rank") === col("__r"), "left").drop("__r")
      .join(firsts, col("stage_rank") === col("__r"), "left").drop("__r")
      .join(broadcast(n))
      .select(col("stage"), col("stage_rank"),
        coalesce(col("n_flagged"), lit(0L)).as("n_flagged"),
        coalesce(col("n_first"), lit(0L)).as("n_first"),
        expr("coalesce(n_first, 0L) * 1000000L div __n").as("marginal_micro"))
      .orderBy(col("stage_rank"))
  }

  /** Near-duplicate flow matrix: the x04 pair relation rolled up to
    * (source, source) cells — WHO duplicates WHOM at document-pair
    * granularity (x37's gram-overlap matrix says vocabularies
    * overlap; this says actual documents collide). The diagonal is
    * within-source duplication (a provider re-serving its own
    * content); off-diagonal mass is cross-provider syndication — the
    * cell that decides which source to drop when x178's ablation
    * says one must go.
    *
    * Pure integer: pair counts per unordered source cell + one share
    * division against the total pair count.
    *
    * Scale: one pass over the (already thresholded) pair relation +
    * two keyed tag joins; output is ≤ |sources|² cells, in practice
    * the occupied ones.
    *
    * Output: (src_a, src_b, n_pairs, share_micro, within) with
    * src_a ≤ src_b, ordered by (src_a, src_b). */
  def dupFlowMatrix(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", sourceCol: String = "source",
      ngram: Int = 3, prefixK: Int = 8,
      minJaccard: Double = 0.2): DataFrame = {
    val src = docs.select(col(idCol).as("id"), col(sourceCol).as("src"))
    val cells = ngramJaccardNearDup(docs, idCol, textCol, ngram, prefixK,
        minJaccard)
      .join(src.toDF("doc_a", "__sa"), "doc_a")
      .join(src.toDF("doc_b", "__sb"), "doc_b")
      .groupBy(least(col("__sa"), col("__sb")).as("src_a"),
        greatest(col("__sa"), col("__sb")).as("src_b"))
      .agg(count(lit(1)).cast("bigint").as("n_pairs"))
      .localCheckpoint(true) // feeds the total AND the output
    cells
      .join(broadcast(cells.agg(sum(col("n_pairs")).cast("bigint").as("__t"))))
      .select(col("src_a"), col("src_b"), col("n_pairs"),
        expr("n_pairs * 1000000L div __t").as("share_micro"),
        (col("src_a") === col("src_b")).as("within"))
      .orderBy(col("src_a"), col("src_b"))
  }

  /** Token-mass savings per dedup threshold: [[thresholdSweep]]'s
    * affected-doc counts upgraded to the unit capacity planning
    * thinks in — how many TOKENS sit in documents whose best
    * near-dup pair clears each candidate threshold. A threshold that
    * touches 10% of docs but 30% of tokens (long boilerplate dups)
    * prices very differently from the reverse; this is the curve
    * that decision reads.
    *
    * Exactness: the decile comes from the integer micro jaccard (the
    * x144 rule); token counts are exact integers; the cumulations
    * are integer window sums over the ≤ 10-row decile frame; shares
    * are floor divisions against the CORPUS token total (all docs,
    * not just paired ones — savings are relative to what you store).
    *
    * Scale: one pair pass (each doc keeps its max-jaccard decile —
    * a hash aggregation), one tokenize pass for the per-doc counts,
    * one keyed join, then decile-frame algebra.
    *
    * Output: (decile, threshold_micro, n_docs_ge, tokens_ge,
    * token_share_micro), ordered by decile. */
  def thresholdTokenSavings(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", ngram: Int = 3, prefixK: Int = 8,
      minJaccard: Double = 0.2): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pairs = ngramJaccardNearDup(docs, idCol, textCol, ngram, prefixK,
        minJaccard)
      .select(col("doc_a"), col("doc_b"),
        least(expr("CAST(round(jaccard * 1000000.0D) AS BIGINT) div 100000L"),
          lit(9L)).as("dec"))
    val toks = docs.select(col(idCol).as("d"),
        size(graft.functions.TextFunctions.words(col(textCol))).cast("long")
          .as("t"))
      .localCheckpoint(true) // feeds the corpus total AND the join
    val best = pairs.select(col("doc_a").as("d"), col("dec"))
      .union(pairs.select(col("doc_b").as("d"), col("dec")))
      .groupBy(col("d")).agg(max(col("dec")).as("dec"))
      .join(toks, "d")
      .groupBy(col("dec"))
      .agg(count(lit(1)).cast("bigint").as("nd"),
        sum(col("t")).cast("bigint").as("tk"))
    val wUp = Window.orderBy(col("dec").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    best
      .withColumn("n_docs_ge", sum(col("nd")).over(wUp).cast("bigint"))
      .withColumn("tokens_ge", sum(col("tk")).over(wUp).cast("bigint"))
      .join(broadcast(toks.agg(sum(col("t")).cast("bigint").as("__tt"))))
      .select(col("dec").as("decile"),
        (col("dec") * 100000L).as("threshold_micro"),
        col("n_docs_ge"), col("tokens_ge"),
        expr("tokens_ge * 1000000L div __tt").as("token_share_micro"))
      .orderBy(col("decile"))
  }

  /** Renders the MinHash-LSH collision probability 1 − (1 − j^r)^b as
    * an explicit left-associated multiplication chain — NO pow():
    * libm pow implementations differ in the last ulp, a plain
    * multiplication chain over the same 6-dp double is bit-identical
    * on every engine. `one` is the engine's double-literal spelling
    * ("1.0D" for Spark expr strings — bare 1.0 parses as DECIMAL —
    * "1.0" for DuckDB). Shared by [[lshParameterPlan]] and its
    * oracle so both engines evaluate the SAME arithmetic text. */
  def collisionProbExpr(jCol: String, b: Int, r: Int, one: String): String = {
    require(b >= 1 && r >= 1 && b <= 64 && r <= 64,
      s"collisionProbExpr: need 1 <= b,r <= 64, got b=$b r=$r")
    val jr = Seq.fill(r)(jCol).mkString("(", " * ", ")")
    val q = s"($one - $jr)"
    val qb = Seq.fill(b)(q).mkString("(", " * ", ")")
    s"($one - $qb)"
  }

  /** MinHash-LSH parameter planner: for each candidate (bands, rows)
    * configuration, what the banding S-curve would DO to this
    * corpus's observed pair population — expected candidate volume,
    * recall on pairs at/above the design threshold, and the mean
    * collision probability wasted on sub-threshold pairs. The
    * "choose b and r from the data" table that turns the textbook
    * S-curve into a decision: more rows per band sharpens the curve
    * (fewer false candidates, lower recall at the margin), more
    * bands shifts it left. Complements x42's minhash calibration
    * (does the ESTIMATOR track true jaccard) and x38's bucket
    * profile (what one fixed config's buckets look like) — this one
    * compares CANDIDATE configs before any index is built.
    *
    * Reads the SAME truncated pair relation as [[thresholdSweep]]
    * (one pass at the `minJaccard` floor): the planner sees observed
    * near pairs only — invisible sub-floor pairs have collision
    * probability ≤ the floor's own, so the fp_load estimate is a
    * (documented) lower bound while recall numbers are exact over
    * the population that matters.
    *
    * Exactness: each pair's collision probability is the
    * [[collisionProbExpr]] multiplication chain over the 6-dp
    * jaccard (identical IEEE ops on identical doubles — no pow, no
    * libm), quantized ONCE to micro; every aggregate after is an
    * exact integer sum / floor division, order-free.
    *
    * Scale: the pair relation computes once (checkpointed) and each
    * grid row is one partial+final aggregation over it — |grid|
    * passes over pairs, zero over the corpus.
    *
    * Output: (bands, rows_per_band, n_pairs, exp_candidates_micro,
    * n_hi, recall_hi_micro, n_lo, fp_load_micro), ordered by
    * rows_per_band. */
  def lshParameterPlan(docs: DataFrame,
      grid: Seq[(Int, Int)] = Seq((16, 1), (8, 2), (4, 4), (2, 8)),
      designJaccard: Double = 0.5, idCol: String = "doc_id",
      textCol: String = "text", ngram: Int = 3, prefixK: Int = 8,
      minJaccard: Double = 0.2): DataFrame = {
    require(grid.nonEmpty, "lshParameterPlan: need at least one (b, r) config")
    val pairs = ngramJaccardNearDup(docs, idCol, textCol, ngram, prefixK,
        minJaccard)
      .select(col("jaccard"))
      .localCheckpoint(true) // one pair pass serves every grid row
    grid.map { case (b, r) =>
      val p = collisionProbExpr("jaccard", b, r, "1.0D")
      pairs
        .select(col("jaccard"),
          expr(s"CAST(round($p * 1000000.0D) AS BIGINT)").as("__p"))
        .agg(count(lit(1)).cast("bigint").as("n_pairs"),
          sum(col("__p")).cast("bigint").as("exp_candidates_micro"),
          sum(when(col("jaccard") >= designJaccard, 1L).otherwise(0L))
            .cast("bigint").as("n_hi"),
          sum(when(col("jaccard") >= designJaccard, col("__p")).otherwise(0L))
            .cast("bigint").as("__phi"),
          sum(when(col("jaccard") < designJaccard, 1L).otherwise(0L))
            .cast("bigint").as("n_lo"),
          sum(when(col("jaccard") < designJaccard, col("__p")).otherwise(0L))
            .cast("bigint").as("__plo"))
        .select(lit(b).as("bands"), lit(r).as("rows_per_band"),
          col("n_pairs"), col("exp_candidates_micro"), col("n_hi"),
          when(col("n_hi") > 0, expr("__phi div n_hi")).as("recall_hi_micro"),
          col("n_lo"),
          when(col("n_lo") > 0, expr("__plo div n_lo")).as("fp_load_micro"))
    }.reduce(_ unionAll _).orderBy(col("rows_per_band"), col("bands"))
  }
  /** Content-defined chunking (CDC) dedup profile — the STORAGE-level
    * duplication read the document-level family (exact x01, near-dup
    * x02-x05) cannot give: documents are cut at content-defined
    * boundaries (a token ends a chunk when its md5-60 hash ≡ 0 mod
    * `modulus` — boundaries move WITH the content, so an insertion
    * re-chunks only its neighborhood, the rsync/LBFS property), each
    * chunk is identified by the md5 of its token span, and chunk
    * reuse is counted corpus-wide. High dup_ratio with low doc-level
    * duplication = shared boilerplate/templates below document
    * granularity — the incremental-storage and partial-dedup signal.
    *
    * Deterministic cross-engine: the boundary hash is the portable
    * md5-60 kernel (one-token grams of [[graft.functions
    * .ShingleFunctions.md5_ngram_hashes]]), chunk identity is
    * md5(space-joined span) — both DuckDB-recomputable; expected
    * chunk length is `modulus` tokens.
    *
    * Scale: one tokenize+hash pass; the chunk-index prefix sum is a
    * per-DOCUMENT window (bounded by document length, never a corpus
    * sort); chunk frequencies are one hash aggregation keyed on the
    * chunk hash, joined back hash-keyed. Output is one row per group.
    *
    * Output: (groupCol, n_chunks, n_dup_chunks, n_tokens,
    * dup_ratio_micro, mean_tokens_micro), ordered by group. */
  def cdcChunkDedup(docs: DataFrame, modulus: Int = 8,
      idCol: String = "doc_id", textCol: String = "text",
      groupCol: String = "source"): DataFrame = {
    val chunks = cdcChunks(docs, modulus, idCol, textCol, groupCol)
    val freq = chunks.groupBy(col("h"))
      .agg(count(lit(1)).cast("bigint").as("__cf"))
    chunks.join(freq, "h")
      .groupBy(col("grp"))
      .agg(count(lit(1)).cast("bigint").as("n_chunks"),
        sum((col("__cf") > 1).cast("long")).cast("bigint").as("n_dup_chunks"),
        sum(col("n_toks")).cast("bigint").as("n_tokens"))
      .select(col("grp").as(groupCol), col("n_chunks"), col("n_dup_chunks"),
        col("n_tokens"),
        expr("n_dup_chunks * 1000000L div n_chunks").as("dup_ratio_micro"),
        expr("n_tokens * 1000000L div n_chunks").as("mean_tokens_micro"))
      .orderBy(col(groupCol))
  }
  /** IDF-weighted SimHash near-dup — the production form of [[
    * simhashNearDup]] for boilerplate-heavy corpora: raw SimHash
    * lets ubiquitous tokens (stopwords, template chrome) dominate the
    * bit votes, so two documents sharing only boilerplate hash close;
    * weighting each token's vote by tf·idf (idf = ln((N+1)/(df+1)),
    * quantized ONCE to micro-nats — the x32/x153 idiom) makes the
    * signature track each document's DISTINCTIVE content instead.
    * Signatures are 60-bit (portable md5-60 token hashes, DuckDB-
    * recomputable); candidates band by `chunks` bit-chunks (pigeonhole
    * exact for maxHamming < chunks) and verify by exact Hamming.
    *
    * Scale: ONE tokenize pass (tf is materialized; df counts rows per
    * token off it — the x32 shape); the (doc, bit) vote fan-out is
    * ×60 but collapses by partial+final hash aggregation; banding
    * carries the [[guardBuckets]] hot-bucket envelope like every
    * near-dup path here. Integer votes are exact in any accumulation
    * order — no float simhash drift.
    *
    * Output: (doc_a, doc_b, hamming), doc_a < doc_b, hamming ≤
    * `maxHamming`. */
  def idfSimhashNearDup(docs: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3, chunks: Int = 4,
      maxBucketSize: Option[Int] = None): DataFrame = {
    val bits = 60
    require(chunks >= 1 && bits % chunks == 0,
      s"idfSimhashNearDup: chunks must divide $bits, got $chunks")
    val bitsPerChunk = bits / chunks
    val wc = materialize(ensureParallelism(docs)
      .select(col(idCol).as("doc_id"), explode(
        graft.functions.TextFunctions.words(col(textCol))).as("w"))
      .groupBy(col("doc_id"), col("w"))
      .agg(count(lit(1)).cast("bigint").as("c")))
    val nDocs = docs.agg(count(lit(1)).cast("bigint").as("__n"))
    val idf = wc.groupBy(col("w"))
      .agg(count(lit(1)).cast("bigint").as("__df"))
      .crossJoin(broadcast(nDocs))
      .select(col("w"),
        expr("CAST(round(round(ln((CAST(__n AS DOUBLE) + 1.0D) / " +
          "(CAST(__df AS DOUBLE) + 1.0D)), 6) * 1000000.0D) AS BIGINT)")
          .as("__idf"))
    val hv = wc.join(idf, "w")
      .select(col("doc_id"),
        expr("CAST(conv(substring(md5(w), 1, 15), 16, 10) AS BIGINT)")
          .as("hv"),
        (col("c") * col("__idf")).as("wt"))
    // per-bit weighted votes -> sign -> 60-bit signature; zero votes
    // (all-weight-cancelling bits) go to 0, matching the CASE > 0 rule
    val sk = materialize(hv
      .select(col("doc_id"), col("hv"), col("wt"),
        explode(expr("sequence(0, 59)")).as("b"))
      .groupBy(col("doc_id"), col("b"))
      .agg(sum(when(expr("(hv >> b) & 1 = 1"), col("wt"))
        .otherwise(-col("wt"))).cast("bigint").as("v"))
      .groupBy(col("doc_id"))
      .agg(expr("CAST(sum(CASE WHEN v > 0 THEN " +
        "shiftleft(CAST(1 AS BIGINT), b) ELSE CAST(0 AS BIGINT) END) " +
        "AS BIGINT)").as("sk")))
    val chunked = sk.select(
      col("doc_id"), col("sk"),
      posexplode(array((0 until chunks).map(ci =>
        shiftrightunsigned(col("sk"), ci * bitsPerChunk)
          .bitwiseAND(lit((1L << bitsPerChunk) - 1))): _*)))
      .toDF("doc_id", "sk", "chunk", "chunk_val")
    val guarded = guardBuckets(chunked, Seq("chunk", "chunk_val"),
      maxBucketSize, "idfSimhashNearDup")
    val a = guarded.as("a"); val b = guarded.as("b")
    a.join(b,
        col("a.chunk") === col("b.chunk") &&
        col("a.chunk_val") === col("b.chunk_val") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(
        col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        graft.functions.HashFunctions.hamming64(
          col("a.sk"), col("b.sk")).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }
  /** The CDC chunk frame behind [[cdcChunkDedup]] and
    * [[chunkSplitLeakage]]: (grp, id, ck, n_toks, h) — one row per
    * content-defined chunk, checkpointed (every consumer fans it into
    * a frequency/spread aggregation plus a rollup). See
    * [[cdcChunkDedup]] for the boundary rule and hash contract. */
  private def cdcChunks(docs: DataFrame, modulus: Int,
      idCol: String, textCol: String, groupCol: String): DataFrame = {
    require(modulus >= 2 && modulus <= 1048576,
      s"cdcChunks: modulus must be in [2, 2^20], got $modulus")
    import graft.functions.TextFunctions.words
    import graft.functions.ShingleFunctions.md5_ngram_hashes
    import org.apache.spark.sql.expressions.Window
    val toks = docs
      .select(col(groupCol).as("grp"), col(idCol).as("id"),
        words(col(textCol)).as("__ws"))
      .filter(size(col("__ws")) >= 1)
      .select(col("grp"), col("id"), col("__ws"),
        md5_ngram_hashes(col("__ws"), 1).as("__hs"))
      .select(col("grp"), col("id"),
        posexplode(arrays_zip(col("__ws"), col("__hs"))).as(Seq("p", "z")))
      .select(col("grp"), col("id"), col("p"), col("z.__ws").as("w"),
        (col("z.__hs") % modulus === 0).cast("long").as("b"))
    val wd = Window.partitionBy(col("id")).orderBy(col("p"))
      .rowsBetween(Window.unboundedPreceding, -1)
    toks
      .withColumn("ck", coalesce(sum(col("b")).over(wd), lit(0L)))
      .groupBy(col("grp"), col("id"), col("ck"))
      .agg(count(lit(1)).cast("bigint").as("n_toks"),
        expr("md5(CAST(concat_ws(' ', transform(array_sort(" +
          "collect_list(struct(p, w))), x -> x.w)) AS BINARY))").as("h"))
      .localCheckpoint(true)
  }

  /** Sub-document train/test leakage via content-defined chunks — the
    * leakage read [[graft.operators.TextAnalysis.splitLeakage]]'s
    * document-level pairs cannot give: a test document is compromised
    * when any of its CHUNKS also appears in train, even if no whole
    * document crosses the split (shared boilerplate, quoted passages,
    * template text). Documents take the standard hash split
    * ([[graft.operators.TextAnalysis.datasetSplit]]'s md5-60 bucket
    * rule — the split column IS the chunk group), chunks cut at the
    * [[cdcChunkDedup]] boundaries, and a chunk occurrence is LEAKED
    * when its hash appears in ≥ 2 distinct splits. Per split: chunk
    * and token totals plus the leaked share of each, in micro.
    *
    * Scale: the chunk frame is one pass ([[cdcChunks]]); the spread
    * count is one hash aggregation keyed on the chunk hash (count
    * distinct over ≤ 3 split values), joined back hash-keyed.
    *
    * Output: (split, n_chunks, n_leaked, n_tokens, leaked_tokens,
    * leak_ratio_micro, leaked_token_micro), ordered by split. */
  def chunkSplitLeakage(docs: DataFrame, modulus: Int = 8,
      trainPct: Int = 80, valPct: Int = 10,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(trainPct >= 1 && valPct >= 0 && trainPct + valPct <= 100,
      s"chunkSplitLeakage: bad split percents ($trainPct, $valPct)")
    val split = graft.operators.TextAnalysis
      .datasetSplit(docs, idCol, trainPct, valPct)
    val chunks = cdcChunks(split, modulus, idCol, textCol, "split")
    val spread = chunks.groupBy(col("h"))
      .agg(countDistinct(col("grp")).cast("bigint").as("__ns"))
    chunks.join(spread, "h")
      .groupBy(col("grp"))
      .agg(count(lit(1)).cast("bigint").as("n_chunks"),
        sum((col("__ns") > 1).cast("long")).cast("bigint").as("n_leaked"),
        sum(col("n_toks")).cast("bigint").as("n_tokens"),
        sum(when(col("__ns") > 1, col("n_toks")).otherwise(0L))
          .cast("bigint").as("leaked_tokens"))
      .select(col("grp").as("split"), col("n_chunks"), col("n_leaked"),
        col("n_tokens"), col("leaked_tokens"),
        expr("n_leaked * 1000000L div n_chunks").as("leak_ratio_micro"),
        expr("leaked_tokens * 1000000L div n_tokens").as("leaked_token_micro"))
      .orderBy(col("split"))
  }

  /** Document-frequency CAP ADVISOR — picks the `maxDf` every
    * inverted-index operator in this file rides ([[containmentScreen]]
    * and the banded near-dup engines cap posting lists to bound their
    * pair fan-out): for each candidate cap, how many distinct grams
    * and postings survive, and — the number that IS the join cost —
    * the exact candidate-pair fan-out Σ_{df ≤ t} df·(df−1)/2 the
    * surviving index would generate. The forecast→decide loop of
    * x199/x207/x216 pointed at the dedup engine's own knob.
    *
    * Scale: one tokenize pass to the distinct (doc, gram) postings,
    * a df histogram (gram cardinality), then one row per cap off the
    * histogram — never pair materialization. Fan-outs compute in
    * DECIMAL(38,0) and refuse loudly past the BIGINT envelope (the
    * [[graft.operators.Layout.joinSizeAdvisor]] pattern).
    *
    * Output per cap: (max_df, grams_kept, grams_share_micro,
    * postings_kept, postings_share_micro, pair_fanout), ordered. */
  def dfCapAdvisor(docs: DataFrame, n: Int = 3, caps: Seq[Int],
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    import graft.functions.ShingleFunctions.ngram_strings
    import graft.functions.TextFunctions.words
    require(caps.nonEmpty && caps.forall(_ >= 1),
      s"dfCapAdvisor: caps must be positive, got $caps")
    require(caps.distinct.size == caps.size,
      s"dfCapAdvisor: duplicate caps in $caps")
    val dec = "decimal(38,0)"
    val hist = docs
      .select(col(idCol).as("__d"),
        explode(array_distinct(ngram_strings(words(col(textCol)), n)))
          .as("__g"))
      .groupBy(col("__g")).agg(count(lit(1)).cast("bigint").as("__df"))
      .groupBy(col("__df")).agg(count(lit(1)).cast("bigint").as("__m"))
      .localCheckpoint(true) // gram-cardinality frame feeds every cap
    val tot = hist.agg(
      coalesce(sum(col("__m")), lit(0L)).cast("bigint").as("__tg"),
      coalesce(sum(col("__df").cast(dec) * col("__m").cast(dec)),
        lit(0).cast(dec)).as("__tp"))
    val capArr = array(caps.sorted.map(k => lit(k.toLong)): _*)
    val longMax = lit(Long.MaxValue).cast(dec)
    hist
      .select(col("__df"), col("__m"), explode(capArr).as("max_df"))
      .filter(col("__df") <= col("max_df"))
      .groupBy(col("max_df"))
      .agg(sum(col("__m")).cast("bigint").as("grams_kept"),
        sum(col("__df").cast(dec) * col("__m").cast(dec)).as("__pk"),
        sum(col("__df").cast(dec) * (col("__df") - 1L).cast(dec) *
          col("__m").cast(dec)).as("__f2"))
      .crossJoin(broadcast(tot))
      .filter(col("__tg") > 0 && col("__tp") > 0)
      .select(col("max_df"), col("grams_kept"),
        expr("grams_kept * 1000000L div __tg").as("grams_share_micro"),
        when(col("__pk") > longMax,
          raise_error(concat(lit("dfCapAdvisor: postings kept "),
            col("__pk").cast("string"),
            lit(" past the BIGINT envelope (9.2e18)"))).cast("bigint"))
          .otherwise(col("__pk").cast("bigint")).as("postings_kept"),
        expr("(__pk * CAST(1000000 AS DECIMAL(38,0))) div __tp")
          .as("postings_share_micro"),
        when(col("__f2") > longMax * lit(2).cast(dec),
          raise_error(concat(lit("dfCapAdvisor: pair fan-out "),
            expr("(__f2 div 2)").cast("string"),
            lit(" past the BIGINT envelope (9.2e18)"))).cast("bigint"))
          .otherwise(expr("(__f2 div 2)")).as("pair_fanout"))
      .orderBy(col("max_df"))
  }

  /** Cross-LANGUAGE near-dup matrix — which language pairs share
    * near-duplicate text: same-language cells are ordinary template
    * duplication, OFF-diagonal cells are translation mirrors or
    * language-ID noise (a dup pair "in two languages" usually means
    * one of the two lang labels is wrong — x08's confusion read at
    * the pair level). Pair language endpoints are normalized
    * (lang_a ≤ lang_b) so the matrix is upper-triangular and
    * deterministic regardless of pair orientation.
    *
    * Scale: two doc-keyed joins of the pair relation (bounded by
    * duplicate volume) onto the language projection + one hash agg.
    *
    * Output: (lang_a, lang_b, n_pairs, cross_lang), ordered. */
  def crossLangDup(docs: DataFrame, pairs: DataFrame,
      idCol: String = "doc_id", langCol: String = "lang"): DataFrame = {
    val langs = docs.select(col(idCol).as("doc_id"),
      col(langCol).cast("string").as("__lang"))
    pairs
      .join(langs.select(col("doc_id").as("doc_a"), col("__lang").as("__la")),
        "doc_a")
      .join(langs.select(col("doc_id").as("doc_b"), col("__lang").as("__lb")),
        "doc_b")
      .select(least(col("__la"), col("__lb")).as("lang_a"),
        greatest(col("__la"), col("__lb")).as("lang_b"))
      .groupBy(col("lang_a"), col("lang_b"))
      .agg(count(lit(1)).cast("bigint").as("n_pairs"))
      .withColumn("cross_lang", col("lang_a") =!= col("lang_b"))
      .orderBy(col("lang_a"), col("lang_b"))
  }

  /** Near-dup incidence BY LENGTH BUCKET — are long documents more
    * duplicated than short ones? The length-conditioned dup-rate read
    * that decides whether a dedup threshold can be uniform or must be
    * length-aware (short docs often look alike by chance; long dups
    * are usually true mirrors). Buckets are fixed-width character
    * bins (`n_chars div bucketChars` — deterministic, no quantile
    * dependence); a document counts as duplicated when it appears on
    * EITHER side of the pair relation.
    *
    * Scale: the doc side is one projection + hash agg; the pair side
    * collapses to the distinct doc-id set (bounded by duplicate
    * volume) before the join. No windows.
    *
    * Output per bucket: (len_bucket, n_docs, n_in_pairs,
    * dup_rate_micro = n_in_pairs·10⁶ div n_docs), ordered. */
  def dupRateByLength(docs: DataFrame, pairs: DataFrame,
      bucketChars: Int = 1000, idCol: String = "doc_id",
      lenCol: String = "n_chars"): DataFrame = {
    require(bucketChars >= 1,
      s"dupRateByLength: bucketChars must be positive, got $bucketChars")
    val inPairs = pairs.select(col("doc_a").as("doc_id"))
      .union(pairs.select(col("doc_b").as("doc_id")))
      .distinct()
      .select(col("doc_id"), lit(true).as("__dup"))
    docs
      .select(col(idCol).as("doc_id"),
        expr(s"CAST($lenCol AS BIGINT) div $bucketChars").as("len_bucket"))
      .join(inPairs, Seq("doc_id"), "left")
      .groupBy(col("len_bucket"))
      .agg(count(lit(1)).cast("bigint").as("n_docs"),
        sum(when(col("__dup"), 1L).otherwise(0L)).cast("bigint")
          .as("n_in_pairs"))
      .select(col("len_bucket"), col("n_docs"), col("n_in_pairs"),
        expr("n_in_pairs * 1000000L div n_docs").as("dup_rate_micro"))
      .orderBy(col("len_bucket"))
  }

  /** Near-dup cluster SIZE SPECTRUM — the shape read the scalar
    * audits flatten: x28 labels clusters, x115 totals the savings,
    * but whether duplication is a long tail of pairs or a few
    * mega-clusters (boilerplate explosions, mirror scrapes) is a size
    * DISTRIBUTION question, and it decides the dedup strategy (pair
    * threshold tuning vs hot-cluster capping). One row per observed
    * cluster size: how many clusters, how many documents they hold,
    * and that size's share of the corpus. Documents in NO pair count
    * as size-1 clusters (the spectrum must cover the corpus — a
    * "everything is a singleton" spectrum is the healthy baseline).
    *
    * Scale: rides the labeled cluster frame (`clusters` — [[
    * connectedComponents]] output, bounded by duplicate volume) with
    * two hash aggregations (cluster → size, size → count); the
    * singleton count is one anti-join of the doc-id projection
    * against the cluster frame. No windows, no row-data sort.
    *
    * Output: (cluster_size, n_clusters, n_docs,
    * doc_share_micro = n_docs·10⁶ div total_docs), ordered by
    * cluster_size. */
  def clusterSizeProfile(docs: DataFrame, clusters: DataFrame,
      idCol: String = "doc_id"): DataFrame = {
    val ids = docs.select(col(idCol).as("doc_id"))
    val sizes = clusters
      .groupBy(col("cluster_id"))
      .agg(count(lit(1)).cast("bigint").as("cluster_size"))
      .groupBy(col("cluster_size"))
      .agg(count(lit(1)).cast("bigint").as("n_clusters"))
    val singletons = ids
      .join(clusters.select(col("doc_id")), Seq("doc_id"), "left_anti")
      .agg(count(lit(1)).cast("bigint").as("n_singletons"))
      .filter(col("n_singletons") > 0)
      .select(lit(1L).as("cluster_size"),
        col("n_singletons").as("n_clusters"))
    val spectrum = sizes.unionByName(singletons)
      .groupBy(col("cluster_size"))
      .agg(sum(col("n_clusters")).cast("bigint").as("n_clusters"))
      .select(col("cluster_size"), col("n_clusters"),
        (col("cluster_size") * col("n_clusters")).as("n_docs"))
    val tot = ids.agg(count(lit(1)).cast("bigint").as("__total"))
    spectrum.crossJoin(broadcast(tot))
      .select(col("cluster_size"), col("n_clusters"), col("n_docs"),
        expr("n_docs * 1000000L div __total").as("doc_share_micro"))
      .orderBy(col("cluster_size"))
  }

  /** In-batch negative collision forecast — the contrastive-training
    * read of the [[clusterSizeProfile]] spectrum: in-batch negatives
    * (CLIP/DPR-style) assume a uniformly sampled batch contains no
    * two copies of the same content; every same-cluster pair that
    * lands in one batch is a FALSE negative that actively pushes
    * matching representations apart. For a uniform batch of size B
    * the expected number of same-cluster pairs is exactly
    * C(B,2) · Σ_c C(m_c,2) / C(N,2) (linearity of expectation over
    * pair slots — no independence assumption), so the whole forecast
    * derives from the cluster-size spectrum: the advisor that turns
    * x211's shape read into "dedup BEFORE contrastive training, or
    * cap batches at B".
    *
    * Exactness: Σ m(m−1) and N accumulate in DECIMAL(38,0); the pair
    * count refuses loudly past the BIGINT output envelope; each
    * forecast is one truncating micro division (B(B−1) is even, so
    * halving it first is exact).
    *
    * Scale: one aggregation over the ALREADY size-bounded spectrum
    * frame (distinct cluster sizes, not docs) and a literal
    * batch-size grid — nothing here touches row volume.
    *
    * Output per batch size: (batch_size, n_docs, same_cluster_pairs,
    * pair_rate_micro = Σm(m−1)·10⁶ div N(N−1),
    * expected_collisions_micro = C(B,2)·Σm(m−1)·10⁶ div N(N−1)),
    * ordered by batch_size; empty when N < 2. */
  def inBatchCollisionForecast(spectrum: DataFrame,
      batchSizes: Seq[Int] = Seq(64, 256, 1024, 4096)): DataFrame = {
    require(batchSizes.nonEmpty && batchSizes.forall(b => b >= 2 && b <= 65536),
      s"inBatchCollisionForecast: batch sizes must be in [2, 65536], got $batchSizes")
    require(batchSizes.distinct == batchSizes,
      "inBatchCollisionForecast: duplicate batch sizes")
    val dec = "decimal(38,0)"
    val stats = spectrum.agg(
      coalesce(sum(col("n_docs").cast(dec)), lit(0).cast(dec)).as("__n"),
      coalesce(sum(col("cluster_size").cast(dec) *
        (col("cluster_size") - 1L).cast(dec) *
        col("n_clusters").cast(dec)), lit(0).cast(dec)).as("__s"))
    // Σ m(m−1) div 2 is a BIGINT output column — refuse loudly past
    // its envelope (also keeps every downstream product < 10³⁸)
    val fenced = stats.select(col("__n"),
      when(col("__s") > lit(BigDecimal("18446744073709551614")).cast(dec),
        raise_error(concat(
          lit("inBatchCollisionForecast: same-cluster pair mass "),
          col("__s").cast("string"),
          lit(" exceeds the BIGINT pair-count envelope")))
          .cast(dec))
        .otherwise(col("__s")).as("__s"))
    fenced
      .filter(col("__n") >= 2)
      .select(col("__n"), col("__s"), explode(array(batchSizes.sorted.map(b =>
        lit(b.toLong)): _*)).as("batch_size"))
      .select(col("batch_size"),
        col("__n").cast("bigint").as("n_docs"),
        expr("(__s div 2)").cast("bigint").as("same_cluster_pairs"),
        expr("(__s * CAST(1000000 AS DECIMAL(38,0))) div (__n * (__n - 1))")
          .cast("bigint").as("pair_rate_micro"),
        expr("(((batch_size * (batch_size - 1)) div 2) * __s * " +
          "CAST(1000000 AS DECIMAL(38,0))) div (__n * (__n - 1))")
          .cast("bigint").as("expected_collisions_micro"))
      .orderBy(col("batch_size"))
  }

  /** Template-slot mining — WHAT varies inside near-duplicate text:
    * for every near-dup pair, the tokens present in exactly ONE of
    * the two documents are the template's variable slots (names,
    * numbers, dates, cities — the fill-ins of a boilerplate form),
    * and the corpus-wide top slot tokens tell a curation pass what
    * the template family parameterizes over. The complement of
    * x225/x229 (which report the SHARED runs): there the invariant,
    * here the variables.
    *
    * Scale: the distinct (doc, term) frame is cut to pair ENDPOINTS
    * by a semi join BEFORE the pair join (term volume bounded by
    * duplicate volume × doc vocabulary, never corpus vocabulary);
    * the one-sided test is one hash aggregation on (pair, term); the
    * top-N is sort+limit → TakeOrderedAndProject (bounded
    * per-partition heaps, no global sort).
    *
    * Output: top `topN` by (n_pairs desc, term): (term, n_pairs,
    * pair_share_micro = n_pairs·10⁶ div total_pairs); empty when no
    * pairs. */
  def templateSlots(docs: DataFrame, pairs: DataFrame, topN: Int = 20,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(topN >= 1 && topN <= 1000,
      s"templateSlots: topN must be in [1, 1000], got $topN")
    import graft.functions.TextFunctions.words
    val p = pairs.select(col("doc_a"), col("doc_b")).localCheckpoint(true)
    val ends = p.select(col("doc_a").as("__doc"))
      .union(p.select(col("doc_b").as("__doc"))).distinct()
    // endpoint cut FIRST: the explode+distinct only ever runs over
    // docs that appear in a pair (duplicate volume, never the corpus)
    val pairedTerms = docs
      .select(col(idCol).as("__doc"), col(textCol).as("__txt"))
      .join(ends, Seq("__doc"), "left_semi")
      .select(col("__doc"), explode(words(col("__txt"))).as("term"))
      .distinct()
      .localCheckpoint(true) // both endpoint joins read it
    val pa = p.join(pairedTerms.withColumnRenamed("__doc", "doc_a"),
        Seq("doc_a"))
      .select(col("doc_a"), col("doc_b"), col("term"))
    val pb = p.join(pairedTerms.withColumnRenamed("__doc", "doc_b"),
        Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("term"))
    val oneSided = pa.union(pb)
      .groupBy(col("doc_a"), col("doc_b"), col("term"))
      .agg(count(lit(1)).as("__k"))
      .filter(col("__k") === 1)
    val nPairs = p.agg(count(lit(1)).cast("bigint").as("__np"))
    oneSided.groupBy(col("term"))
      .agg(count(lit(1)).cast("bigint").as("n_pairs"))
      .crossJoin(broadcast(nPairs))
      .filter(col("__np") > 0)
      .select(col("term"), col("n_pairs"),
        expr("(CAST(n_pairs AS DECIMAL(38,0)) * 1000000) div __np")
          .cast("bigint").as("pair_share_micro"))
      .orderBy(col("n_pairs").desc, col("term"))
      .limit(topN)
  }

  /** Near-dup pair EVIDENCE — why did these two documents match: for
    * every candidate pair, the `topK` RAREST shared word n-grams
    * (rarity = corpus document frequency, ascending — a gram shared
    * by only these two docs is strong evidence; a boilerplate gram
    * shared by half the corpus is none). The human-audit complement
    * of the pair scores: reviewers triage a dedup run by reading the
    * evidence grams, not the Jaccard.
    *
    * Scale: distinct (doc, gram) postings once, a corpus df agg, and
    * TWO equi-joins keyed by the PAIR relation — cost rides the
    * candidate pairs (already bounded by the caller's dedup
    * machinery), never all-pairs. The ranking window partitions per
    * pair (bounded by the pair's shared-gram count).
    *
    * Output: (doc_a, doc_b, gram, df, rank ≤ topK), ordered. */
  def pairEvidence(docs: DataFrame, pairs: DataFrame, ngram: Int = 3,
      topK: Int = 3, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(ngram >= 1 && topK >= 1,
      s"pairEvidence: ngram, topK must be positive, got ($ngram, $topK)")
    val grams = docs.select(col(idCol).as("doc_id"),
        graft.functions.TextFunctions.words(col(textCol)).as("__w"))
      .select(col("doc_id"), explode(array_distinct(
        graft.functions.ShingleFunctions.ngram_strings(col("__w"), ngram)))
        .as("gram"))
      .localCheckpoint(true) // feeds the df agg AND both pair joins
    val df = grams.groupBy(col("gram"))
      .agg(count(lit(1)).cast("bigint").as("df"))
    val p = pairs.select(col("doc_a"), col("doc_b"))
    // Semi-join the postings to the pair ENDPOINTS before the equi-joins
    // (VERDICT r17): the corpus-wide (doc, gram) frame is needed in full
    // only for the df aggregate above — shuffling it in full through both
    // pair-join legs moves corpus mass where only duplicate-volume mass
    // is needed. At 100 TB the endpoint set is the (bounded) candidate
    // relation; the postings that survive the semi-join are duplicate
    // volume, not corpus volume (the x247 template-slot trick).
    val endpoints = p.select(col("doc_a").as("doc_id"))
      .union(p.select(col("doc_b").as("doc_id"))).distinct()
    val pairGrams = grams.join(endpoints, Seq("doc_id"), "left_semi")
    val shared = p
      .join(pairGrams.select(col("doc_id").as("doc_a"), col("gram")),
        Seq("doc_a"))
      .join(pairGrams.select(col("doc_id").as("doc_b"), col("gram")),
        Seq("doc_b", "gram"))
    val w = Window.partitionBy(col("doc_a"), col("doc_b"))
      .orderBy(col("df"), col("gram"))
    shared.join(df, Seq("gram"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= topK)
      .select(col("doc_a"), col("doc_b"), col("gram"), col("df"), col("rank"))
      .orderBy(col("doc_a"), col("doc_b"), col("rank"))
  }

  /** Exact pair edit similarity — the Levenshtein distance between
    * the normalized texts of candidate near-dup pairs: the "how near
    * is near" exact read behind the Jaccard estimate (a pair at
    * J = 0.9 can be one edited sentence or scattered word swaps —
    * edit distance tells which). Classic unit-cost Levenshtein, the
    * identical function in Spark (`levenshtein`) and DuckDB.
    *
    * Scale: O(|a|·|b|) PER PAIR — pair-bounded by construction (run
    * it on a dedup candidate relation, never all-pairs; the
    * x250-family discipline), and since r18 the per-pair quadratic is
    * FENCED (VERDICT r17 item 2): a pair whose longer normalized text
    * exceeds `maxChars` gets a null distance/similarity and
    * `fenced = true` instead of silently costing |a|·|b| cells in one
    * task (two 100 KB near-dups = 10¹⁰ cells — the length guard is
    * the x158 pre-count-gate pattern, null-with-flag not raise, so
    * one pathological pair can't kill a corpus-wide audit). For the
    * 100-TB path additionally pass `maxDistance ≥ 0`: Spark's banded
    * `levenshtein(l, r, k)` early-exits the DP at the threshold band
    * (O(k·min(|a|,|b|))) and reports −1 ("farther than k") — exact
    * distance stays the opt-in default because the fixture-scale
    * oracle compares exact values.
    *
    * similarity_micro = (maxLen − d)·10⁶ div maxLen, truncating
    * integer; null when fenced or band-exceeded.
    *
    * Output: (doc_a, doc_b, len_a, len_b, fenced, edit_distance,
    * similarity_micro), ordered. */
  def pairEditSimilarity(docs: DataFrame, pairs: DataFrame,
      idCol: String = "doc_id", textCol: String = "text",
      maxChars: Int = 20000, maxDistance: Int = -1): DataFrame = {
    require(maxChars >= 1, s"pairEditSimilarity: maxChars must be positive, got $maxChars")
    val norm = docs.select(col(idCol).as("doc_id"),
      regexp_replace(trim(lower(col(textCol))), "\\s+", " ").as("__t"))
    val joined = pairs.select(col("doc_a"), col("doc_b"))
      .join(norm.select(col("doc_id").as("doc_a"), col("__t").as("__ta")),
        Seq("doc_a"))
      .join(norm.select(col("doc_id").as("doc_b"), col("__t").as("__tb")),
        Seq("doc_b"))
      .withColumn("len_a", length(col("__ta")).cast("long"))
      .withColumn("len_b", length(col("__tb")).cast("long"))
      .withColumn("fenced",
        greatest(col("len_a"), col("len_b")) > lit(maxChars.toLong))
    val dist =
      if (maxDistance >= 0) levenshtein(col("__ta"), col("__tb"), maxDistance)
      else levenshtein(col("__ta"), col("__tb"))
    joined
      // the fence SHORT-CIRCUITS the quadratic: `when` evaluates the
      // levenshtein branch only on unfenced rows
      .select(col("doc_a"), col("doc_b"), col("len_a"), col("len_b"),
        col("fenced"),
        when(!col("fenced"), dist.cast("long")).as("edit_distance"))
      .withColumn("similarity_micro",
        when(col("fenced") || col("edit_distance") < 0L, lit(null))
          .when(greatest(col("len_a"), col("len_b")) > 0, expr(
            "(greatest(len_a, len_b) - edit_distance) * 1000000L " +
              "div greatest(len_a, len_b)"))
          .otherwise(lit(1000000L)))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** Near-dup cluster density — the CHAINING audit: for every
    * connected component of the pair graph (size ≥ 2), how many of
    * its C(size, 2) member pairs are DIRECT edges vs reachable only
    * through transitivity. A large cluster at low density is the
    * classic dedup failure mode — A≈B, B≈C, … chained into one
    * component whose ends share nothing — and the standard response
    * (tighten the threshold, or dedup within-cluster by direct edges
    * only) starts from exactly this table. Complements
    * [[clusteringAgreement]] (cross-threshold churn) with the
    * within-threshold structure read.
    *
    * Exactness: sizes/edges are exact counts; density quantizes once
    * per cluster by truncating micro division (C(size,2) ≤ BIGINT for
    * any real cluster).
    *
    * Scale: one CC run (checkpointed label propagation — the x28
    * machinery), one size agg, one edge→cluster equi-join + agg. No
    * windows; output is cluster-cardinality.
    *
    * Output: (cluster_id, size, n_edges, density_micro,
    * chained = density < ½), ordered (size desc, cluster_id). */
  def clusterDensity(pairs: DataFrame, maxIter: Int = 25): DataFrame = {
    // Canonicalize FIRST (ADVICE r17): the density identity assumes
    // distinct doc_a < doc_b edges — a duplicate or bidirectional pair
    // would double-count n_edges (density_micro > 10⁶) and a self-pair
    // yields a size-1 cluster whose C(size,2) divides by zero. The
    // graft dedup operators emit canonical pairs (ngramJaccardNearDup
    // guarantees it), but this is a public operator over ANY pair
    // relation — enforce the contract instead of assuming it.
    val canon = pairs
      .select(least(col("doc_a"), col("doc_b")).as("doc_a"),
        greatest(col("doc_a"), col("doc_b")).as("doc_b"))
      .filter(col("doc_a") =!= col("doc_b"))
      .distinct()
    val cc = connectedComponents(canon, maxIter = maxIter)
      .localCheckpoint(true) // feeds sizes AND the edge mapping
    val sizes = cc.groupBy(col("cluster_id"))
      .agg(count(lit(1)).cast("bigint").as("size"))
    val edges = canon
      .join(cc.select(col("doc_id").as("doc_a"),
        col("cluster_id")), Seq("doc_a"))
      .groupBy(col("cluster_id"))
      .agg(count(lit(1)).cast("bigint").as("n_edges"))
    sizes.join(edges, Seq("cluster_id"))
      .select(col("cluster_id"), col("size"), col("n_edges"),
        expr("n_edges * 1000000L div (size * (size - 1L) div 2)")
          .as("density_micro"))
      .withColumn("chained", col("density_micro") < 500000L)
      .orderBy(col("size").desc, col("cluster_id"))
  }

  /** EXACT clustering-agreement statistics — Rand index and Adjusted
    * Rand Index between two cluster assignments of the same items,
    * from the standard contingency-table identities (Hubert & Arabie
    * 1985): with N = C(n,2) item pairs, sa/sb = Σ C(margin,2) over
    * each clustering's cluster sizes, and sab = Σ C(cell,2) over the
    * (cluster_a, cluster_b) contingency cells,
    * Rand = (N − sa − sb + 2·sab)/N and
    * ARI = 2(sab·N − sa·sb) / (N(sa+sb) − 2·sa·sb).
    * The dedup use: how much the near-dup CLUSTER STRUCTURE moves when
    * the threshold moves (x144 sweeps counts, x248 maps scores — this
    * measures membership churn), or how well dedup clusters align with
    * labels/sources. Generic over any two (id, cluster) frames.
    *
    * Exactness envelope: every term is integer (C(c,2) per cell in
    * BIGINT, sums and products in DECIMAL(38,0)); both micro results
    * are truncating integer divisions. Items must number ≤ 10⁸ so the
    * worst product chain 2·sab·N·10⁶ ≤ 5·10³⁷ stays inside
    * DECIMAL(38,0) (and DuckDB's HUGEINT) — beyond it the operator
    * REFUSES loudly (the x236 envelope convention) rather than
    * returning silently-null decimal overflow.
    *
    * Scale: one equi-join on the item id, one contingency hash agg
    * (cells ≤ min(|A|,|B|) clusters crossed, in practice sparse), two
    * margin aggs, 1-row frames crossed by broadcast. No windows.
    *
    * Output (one row): (n_items, together_both, together_a_only,
    * together_b_only, rand_micro, ari_micro — null when the ARI
    * denominator is 0, i.e. both clusterings trivial). */
  def clusteringAgreement(a: DataFrame, b: DataFrame,
      idCol: String = "doc_id", clusterCol: String = "cluster_id"): DataFrame = {
    val ja = a.select(col(idCol).as("id"), col(clusterCol).as("__ca"))
    val jb = b.select(col(idCol).as("id"), col(clusterCol).as("__cb"))
    val j = ja.join(jb, Seq("id")).localCheckpoint(true)
    val c2 = "CAST(__c * (__c - 1L) div 2 AS DECIMAL(38,0))"
    val cells = j.groupBy(col("__ca"), col("__cb"))
      .agg(count(lit(1)).as("__c"))
      .agg(coalesce(sum(expr(c2)), lit(0).cast("decimal(38,0)")).as("sab"))
    val ma = j.groupBy(col("__ca")).agg(count(lit(1)).as("__c"))
      .agg(coalesce(sum(expr(c2)), lit(0).cast("decimal(38,0)")).as("sa"))
    val mb = j.groupBy(col("__cb")).agg(count(lit(1)).as("__c"))
      .agg(coalesce(sum(expr(c2)), lit(0).cast("decimal(38,0)")).as("sb"))
    // the envelope guard lives INSIDE bigN (a pruned standalone guard
    // column would never evaluate): refuse loudly past 1e8 items
    val nn = j.agg(count(lit(1)).as("n_items"))
      .select(col("n_items"),
        expr("CASE WHEN n_items > 100000000L THEN " +
          "CAST(raise_error('clusteringAgreement: item-count envelope: " +
          "DECIMAL(38,0) products overflow beyond 1e8 items') " +
          "AS DECIMAL(38,0)) " +
          "ELSE CAST(n_items * (n_items - 1L) div 2 AS DECIMAL(38,0)) END")
          .as("bigN"))
    nn.crossJoin(broadcast(cells)).crossJoin(broadcast(ma))
      .crossJoin(broadcast(mb))
      .select(col("n_items"),
        col("sab").cast("bigint").as("together_both"),
        (col("sa") - col("sab")).cast("bigint").as("together_a_only"),
        (col("sb") - col("sab")).cast("bigint").as("together_b_only"),
        when(col("bigN") > 0, expr(
          "CAST(((bigN - sa - sb + 2 * sab) * 1000000) div bigN AS BIGINT)"))
          .as("rand_micro"),
        when(expr("bigN * (sa + sb) - 2 * sa * sb") =!= 0, expr(
          "CAST((2 * (sab * bigN - sa * sb) * 1000000) div " +
            "(bigN * (sa + sb) - 2 * sa * sb) AS BIGINT)"))
          .as("ari_micro"))
  }
}

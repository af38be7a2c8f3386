package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Versioned persistence for TRAINED index/tokenizer artifacts through
  * [[SnapshotStore]] (VERDICT r17 item 5): the production lifecycle is
  * train → snapshot → serve, not retrain-per-run. An IVF coarse
  * quantizer, a PQ codebook, or a BPE merge table is trained once
  * (expensive: k-means over a corpus sample, 6 rounds of greedy pair
  * merges), committed as an immutable versioned snapshot, and every
  * serving query reads a PINNED version via
  * [[SnapshotStore.readVersion]] — so a retrain publishing version
  * N+1 never changes the geometry under a query that resolved N
  * (time travel is what makes index rollout/rollback safe), and the
  * exact artifact any historical result was produced with stays
  * auditable until [[SnapshotStore.vacuum]] reclaims it.
  *
  * Representation: artifacts are ordinary DataFrames (centroids:
  * one row per list; codebooks: one row per (subspace, centroid);
  * merge tables: the [[graft.operators.TextAnalysis.bpeInduction]]
  * frame as-is), so the snapshot directory is plain parquet —
  * readable by ANY engine, no sidecar format. The load side collects
  * to driver arrays for the literal-broadcast operators
  * ([[graft.operators.Similarity.ivfTopK]] etc.) — artifact size is
  * nLists·dim / m·nCent·sub floats, control-plane-tiny by
  * construction (the collect is the same one training itself does via
  * `model.clusterCenters`), never corpus-scale.
  *
  * Determinism: save → load round-trips Float bits exactly (parquet
  * FloatType is IEEE-754 binary32 verbatim), so a query served from a
  * snapshot is bit-identical to one served from the in-memory
  * training result — pinned by IndexArtifactsSpec and by the x270/
  * x271 oracle queries.
  */
object IndexArtifacts {

  private val centroidSchema = StructType(Seq(
    StructField("list_id", IntegerType, nullable = false),
    StructField("centroid", ArrayType(FloatType, containsNull = false),
      nullable = false)))

  private val codebookSchema = StructType(Seq(
    StructField("subspace", IntegerType, nullable = false),
    StructField("cent_id", IntegerType, nullable = false),
    StructField("centroid", ArrayType(FloatType, containsNull = false),
      nullable = false)))

  /** Commits IVF/k-means centroids as the next snapshot of
    * `tablePath`. Row per list: (list_id, centroid). */
  def saveCentroids(spark: SparkSession, tablePath: String,
      centroids: Array[Array[Float]]): SnapshotStore.Commit = {
    require(centroids.nonEmpty, "saveCentroids: empty centroid set")
    val rows = centroids.zipWithIndex.map { case (c, i) =>
      Row(i, c.toSeq)
    }
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toIndexedSeq, 1), centroidSchema)
    SnapshotStore.write(df, tablePath)
  }

  /** Serves centroids from snapshot `version` (or the current one):
    * the driver-side literal array [[graft.operators.Similarity]]'s
    * fixed-centroid machinery broadcasts. Ordered by list_id — the
    * list geometry is part of the artifact. */
  def loadCentroids(spark: SparkSession, tablePath: String,
      version: Option[Long] = None): Array[Array[Float]] = {
    val df = version.map(SnapshotStore.readVersion(spark, tablePath, _))
      .getOrElse(SnapshotStore.read(spark, tablePath))
    df.select("list_id", "centroid").collect()
      .sortBy(_.getInt(0))
      .map(_.getSeq[Float](1).toArray)
  }

  /** Commits a PQ codebook (m subspaces × nCent centroids × sub dims)
    * as the next snapshot. Row per (subspace, cent_id). */
  def saveCodebook(spark: SparkSession, tablePath: String,
      codebook: Array[Array[Array[Float]]]): SnapshotStore.Commit = {
    require(codebook.nonEmpty && codebook.forall(_.nonEmpty),
      "saveCodebook: empty codebook")
    val rows = for {
      (subCents, m) <- codebook.zipWithIndex
      (c, j) <- subCents.zipWithIndex
    } yield Row(m, j, c.toSeq)
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toIndexedSeq, 1), codebookSchema)
    SnapshotStore.write(df, tablePath)
  }

  /** Serves a PQ codebook from snapshot `version` (or current), shaped
    * back to [m][cent][sub] in (subspace, cent_id) order. */
  def loadCodebook(spark: SparkSession, tablePath: String,
      version: Option[Long] = None): Array[Array[Array[Float]]] = {
    val df = version.map(SnapshotStore.readVersion(spark, tablePath, _))
      .getOrElse(SnapshotStore.read(spark, tablePath))
    df.select("subspace", "cent_id", "centroid").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Float](2).toArray))
      .groupBy(_._1).toSeq.sortBy(_._1)
      .map(_._2.sortBy(_._2).map(_._3).toArray).toArray
  }

  /** Commits a BPE merge table (the [[graft.operators.TextAnalysis
    * .bpeInduction]] frame: round, left_sym, right_sym, merged,
    * pair_count) as the next snapshot. The frame stays distributed —
    * no driver collect; at serving time [[loadBpeMerges]] hands the
    * snapshot DataFrame straight to `bpeEncode`'s broadcast-join
    * replay. */
  def saveBpeMerges(spark: SparkSession, tablePath: String,
      merges: DataFrame): SnapshotStore.Commit =
    SnapshotStore.write(merges.select("round", "left_sym", "right_sym",
      "merged", "pair_count"), tablePath)

  /** Serves the merge table from snapshot `version` (or current). */
  def loadBpeMerges(spark: SparkSession, tablePath: String,
      version: Option[Long] = None): DataFrame =
    version.map(SnapshotStore.readVersion(spark, tablePath, _))
      .getOrElse(SnapshotStore.read(spark, tablePath))

  /** Commits a hashed-linear-classifier weight table (the
    * [[graft.operators.TextAnalysis.nbTrain]] frame: feature,
    * weight_micro — bias at feature = −1) as the next snapshot. The
    * frame stays distributed; it is ≤ 2^18 + 1 rows by the hashing-
    * trick construction, so the SERVE side broadcasts it. */
  def saveClassifier(spark: SparkSession, tablePath: String,
      weights: DataFrame): SnapshotStore.Commit =
    SnapshotStore.write(weights.select("feature", "weight_micro"), tablePath)

  /** Serves classifier weights from snapshot `version` (or current). */
  def loadClassifier(spark: SparkSession, tablePath: String,
      version: Option[Long] = None): DataFrame =
    version.map(SnapshotStore.readVersion(spark, tablePath, _))
      .getOrElse(SnapshotStore.read(spark, tablePath))

  /** Commits a corpus n-gram sketch table (the
    * [[graft.operators.Dedup.ngramSketch]] frame: doc_id, hashes —
    * sorted distinct ≤ corpus-gram-cardinality longs per doc) as the
    * next snapshot. Unlike the broadcast-scale artifacts above, this
    * one is CORPUS-scale: the snapshot is the standing dedup index an
    * ingest batch probes ([[graft.operators.Dedup
    * .crossNearDupSketched]]'s "persisted corpus sketch" hot path),
    * and versioning it means an ingest run pins one index geometry
    * for its whole batch while a rebuild publishes the next. */
  def saveSketch(spark: SparkSession, tablePath: String,
      sketch: DataFrame): SnapshotStore.Commit =
    SnapshotStore.write(sketch.select("doc_id", "hashes"), tablePath)

  /** Serves the sketch from snapshot `version` (or current). Arrays
    * of longs round-trip parquet exactly and in order, so the served
    * frame satisfies the ngramSketch contract verbatim. */
  def loadSketch(spark: SparkSession, tablePath: String,
      version: Option[Long] = None): DataFrame =
    version.map(SnapshotStore.readVersion(spark, tablePath, _))
      .getOrElse(SnapshotStore.read(spark, tablePath))
}

package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Dev-only cost-decomposition harness (VERDICT r13 item 1): times
  * labeled sub-plans of an expensive declared query under EXACTLY the
  * bench regime (noop sink, clean block manager between runs,
  * median-of-N) so an unexplained query total can be attributed to a
  * component — the tool that root-caused q36 in r12 and x144 in r14.
  * Not part of any declared surface; run via
  * `sbt "runMain graft.tools.Decompose <stage-substring>"`.
  */
object Decompose {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.SparkEntry.entry(spark).count()
    def dropLingering(): Unit =
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    dropLingering()

    def docs = graft.Tables.load(spark, sfDir, "documents")

    // Stages: each is a thunk returning a DataFrame executed through the
    // noop sink (or running its own materialization internally).
    val stages: Seq[(String, () => DataFrame)] = Seq(
      "a_x04_full" -> (() =>
        Dedup.ngramJaccardNearDup(docs, "doc_id", "text", 3, 8, 0.2)
          .orderBy(col("doc_a"), col("doc_b"))),
      "b_sketch_only" -> (() =>
        Dedup.ngramSketch(docs, "doc_id", "text", 3)),
      "c_pairs_ckpt" -> (() =>
        Dedup.ngramJaccardNearDup(docs, "doc_id", "text", 3, 8, 0.2)
          .select(col("doc_a"), col("doc_b"),
            least(expr("CAST(round(jaccard * 1000000.0D) AS BIGINT) div 100000L"),
              lit(9L)).as("dec"))
          .localCheckpoint(true)),
      "d_x144_full" -> (() => Dedup.thresholdSweep(docs)),
      "e_x85_full" -> (() => graft.queries.ExtensionQueries.all
        .find(_._1 == "x85_curation_scorecard").get._2(spark, sfDir)),
      "f_x89_full" -> (() => graft.queries.ExtensionQueries.all
        .find(_._1 == "x89_source_league").get._2(spark, sfDir)),
      "g_x146_full" -> (() => graft.queries.ExtensionQueries.all
        .find(_._1 == "x146_value_drift_psi").get._2(spark, sfDir)),
      // x02 bimodality decomposition (VERDICT r14 item 4): the three
      // nested prefixes of the declared query — sketch+checkpoint
      // only, LSH bucket join without the exact re-score (no candidate
      // checkpoints), and the full verify path — localize which stage
      // carries the 1.4–1.8 s bimodal cost
      "h_x02_sigs_ckpt" -> (() =>
        Dedup.minhashSignatures(docs, "doc_id", "text", 5, 256)
          .filter(col("sig").isNotNull).localCheckpoint(true)),
      "i_x02_est_only" -> (() =>
        Dedup.minhashNearDup(docs, "doc_id", "text", shingleLen = 5,
          bands = 32, rowsPerBand = 8, minJaccard = 0.85,
          verifyExact = false)
          .orderBy(col("doc_a"), col("doc_b"))),
      "j_x02_full" -> (() =>
        Dedup.minhashNearDup(docs, "doc_id", "text", shingleLen = 5,
          bands = 32, rowsPerBand = 8, minJaccard = 0.85,
          verifyExact = true)
          .orderBy(col("doc_a"), col("doc_b"))),
      // r19: x258 hashed-embedding decomposition — where do ~2.9 s go
      // (x258 3.75 s vs x256 0.81 s on the same dedup machinery)?
      "k_x258_tok_md5" -> (() => {
        import graft.functions.TextFunctions.{words, md5Bucket60}
        docs.select(col("doc_id").as("vec_id"),
            explode(words(col("text"))).as("__t"))
          .select(col("vec_id"), md5Bucket60(col("__t")).as("__h"))
      }),
      "l_x258_aggs" -> (() => {
        import graft.functions.TextFunctions.{words, md5Bucket60}
        docs.select(col("doc_id").as("vec_id"),
            explode(words(col("text"))).as("__t"))
          .select(col("vec_id"),
            md5Bucket60(col("__t")).as("__h"))
          .select(col("vec_id"),
            expr("CAST(pmod(__h, 64) AS INT)").as("__i"),
            expr("CASE WHEN pmod(__h div 64, 2) = 0 THEN 1L ELSE -1L END")
              .as("__s"))
          .groupBy(col("vec_id"), col("__i"))
          .agg(sum(col("__s")).cast("bigint").as("__v"))
          .groupBy(col("vec_id"))
          .agg(count(lit(1)).as("__n"))
      }),
      "m_x258_hemb" -> (() =>
        graft.operators.TextAnalysis.hashedEmbedding(docs, 64)),
      "n_x258_full" -> (() => graft.queries.ExtensionQueries.all
        .find(_._1 == "x258_hashed_embedding_agreement").get._2(spark, sfDir)),
      // r19: x252 cross-perplexity decomposition — triple pass vs the
      // S-expanded grid joins
      "o_x252_cells" -> (() => {
        import graft.functions.TextFunctions.words
        docs.select(col("doc_id"), words(col("text")).as("__w"))
          .filter(size(col("__w")) >= 3)
          .select(col("doc_id"), explode(graft.functions.ShingleFunctions
            .adjacent_triples(col("__w"))).as("__p"))
          .join(docs.select(col("doc_id"), col("source").as("__src")),
            "doc_id")
          .select(col("__src"), col("__p.w1"), col("__p.w2"), col("__p.w3"))
          .groupBy(col("__src"), col("w1"), col("w2"), col("w3"))
          .agg(count(lit(1)).cast("bigint").as("__c"))
      }),
      "p_x252_full" -> (() =>
        graft.operators.TextAnalysis.crossSourcePerplexity(docs)),
      "u_x252_counts" -> (() => {
        import graft.functions.TextFunctions.words
        val cells = docs.select(col("doc_id"), words(col("text")).as("__w"))
          .filter(size(col("__w")) >= 3)
          .select(col("doc_id"), explode(graft.functions.ShingleFunctions
            .adjacent_triples(col("__w"))).as("__p"))
          .join(docs.select(col("doc_id"), col("source").as("__src")),
            "doc_id")
          .select(col("__src"), col("__p.w1"), col("__p.w2"), col("__p.w3"))
          .groupBy(col("__src"), col("w1"), col("w2"), col("w3"))
          .agg(count(lit(1)).cast("bigint").as("__c"))
        cells.agg(count(lit(1)).as("n_cells"),
          count_distinct(col("__src")).as("n_src"),
          count_distinct(col("w1"), col("w2"), col("w3")).as("n_grams"))
      }),
      // r19: x258 stage 2 — the embedding-side near-dup over the
      // HASHED embedding (bucket skew suspect: lexical near-dups have
      // near-parallel hashed vectors by construction)
      "q_x258_embnd" -> (() =>
        Dedup.embeddingNearDup(
          graft.operators.TextAnalysis.hashedEmbedding(docs, 64),
          "vec_id", "embedding", minCosine = 0.15, nPlanes = 6)),
      "r_x258_lex" -> (() =>
        Dedup.ngramJaccardNearDup(docs, "doc_id", "text", 3, 8, 0.2)),
      "t_x258_nparts" -> (() => {
        val bucketed = graft.operators.TextAnalysis.hashedEmbedding(docs, 64)
          .select(col("vec_id").as("doc_id"), col("embedding").as("vec"),
            graft.operators.Similarity.hyperplaneBucket(
              col("embedding"), 6, 64).as("bucket"))
          .filter(size(col("vec")) === 64)
          .localCheckpoint(true)
        val n = bucketed.rdd.getNumPartitions
        bucketed.sparkSession.range(1).select(lit(n).as("n_parts"))
      }),
      // r19: x84 decomposition — knn vs mutual-edges vs the CC loop
      "v_x84_knn" -> (() => {
        val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
        graft.operators.Similarity.knnGraph(emb, k = 3, nPlanes = 6, dim = 64)
          .select(col("src"), col("dst"))
      }),
      "w_x84_mutual" -> (() => {
        val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
        graft.operators.Graph.mutualEdges(
          graft.operators.Similarity.knnGraph(emb, k = 3, nPlanes = 6,
            dim = 64).select(col("src"), col("dst")))
      }),
      "x_x84_full" -> (() => graft.queries.ExtensionQueries.all
        .find(_._1 == "x84_embedding_clusters").get._2(spark, sfDir)),
      "s_x258_buckets" -> (() =>
        graft.operators.TextAnalysis.hashedEmbedding(docs, 64)
          .select(col("vec_id"),
            graft.operators.Similarity.hyperplaneBucket(
              col("embedding"), 6, 64).as("bucket"))
          .groupBy(col("bucket")).agg(count(lit(1)).as("n"))
          .agg(sum(col("n") * (col("n") - 1) / 2).as("pairs"),
            max(col("n")).as("max_bucket"), count(lit(1)).as("n_buckets")))
    )

    val only = args.headOption
    val repeat = sys.env.getOrElse("SPARK_GRAFT_REPEAT", "3").toInt
    def med(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.length % 2 == 1) s(s.length / 2)
      else (s(s.length / 2 - 1) + s(s.length / 2)) / 2.0
    }
    val show = sys.env.get("SPARK_GRAFT_SHOW").contains("1")
    stages.filter { case (n, _) => only.forall(n.contains) }
      .foreach { case (name, thunk) =>
        if (show) { println(s"DECOMP-SHOW $name"); thunk().show(50, false) }
        else {
          var times = Vector.empty[Double]
          for (_ <- 1 to repeat) {
            val t0 = System.nanoTime()
            thunk().write.format("noop").mode("overwrite").save()
            times :+= (System.nanoTime() - t0) / 1e9
            dropLingering()
          }
          println(f"DECOMP $name%-16s med=${med(times)}%7.3f  runs=${times.map(t => f"$t%.3f").mkString(",")}")
        }
      }
    spark.stop()
  }
}

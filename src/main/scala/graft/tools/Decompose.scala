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
          .orderBy(col("doc_a"), col("doc_b")))
    )

    val only = args.headOption
    val repeat = sys.env.getOrElse("SPARK_GRAFT_REPEAT", "3").toInt
    def med(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.length % 2 == 1) s(s.length / 2)
      else (s(s.length / 2 - 1) + s(s.length / 2)) / 2.0
    }
    stages.filter { case (n, _) => only.forall(n.contains) }
      .foreach { case (name, thunk) =>
        var times = Vector.empty[Double]
        for (_ <- 1 to repeat) {
          val t0 = System.nanoTime()
          thunk().write.format("noop").mode("overwrite").save()
          times :+= (System.nanoTime() - t0) / 1e9
          dropLingering()
        }
        println(f"DECOMP $name%-16s med=${med(times)}%7.3f  runs=${times.map(t => f"$t%.3f").mkString(",")}")
      }
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: time the covariance pipeline pieces (r18 optimization
  * forensics). `sbt "runMain graft.tools.CovProbe"`. */
object CovProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.SparkEntry.entry(spark).count()
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROBE $name%-22s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
      r
    }
    val emb = graft.Tables.load(spark, sfDir, "embeddings")
    val dec = "decimal(38,0)"
    def quant(c: String) =
      expr(s"CAST(round(CAST($c AS DOUBLE) * 1000000.0D) AS BIGINT)")
    for (_ <- 1 to 2) {
      t("nF") {
        emb.filter(col("embedding").isNotNull && size(col("embedding")) > 0)
          .agg(countDistinct(col("vec_id")).cast("bigint")).head()
      }
      t("sums") {
        emb.filter(col("embedding").isNotNull)
          .select(posexplode(col("embedding")).as(Seq("__i", "__vi")))
          .select(col("__i").cast("long").as("__i"), quant("__vi").as("__q"))
          .groupBy(col("__i")).agg(sum(col("__q")).cast(dec)).collect()
      }
      t("cells") {
        import graft.functions.VectorFunctions.quantize_micro
        emb.filter(col("embedding").isNotNull)
          .select(quantize_micro(col("embedding")).as("__qarr"))
          .select(posexplode(col("__qarr")).as(Seq("__i", "__qi")),
            col("__qarr"))
          .select(col("__i").cast("long").as("__i"), col("__qi"),
            posexplode(col("__qarr")).as(Seq("__j", "__qj")))
          .select(col("__i"), col("__j").cast("long").as("__j"),
            (col("__qi") * col("__qj")).as("__p"))
          .groupBy(col("__i"), col("__j"))
          .agg(sum(col("__p").cast(dec)).as("__pp"))
          .collect()
      }
      t("cells_longsum") {
        import graft.functions.VectorFunctions.quantize_micro
        emb.filter(col("embedding").isNotNull)
          .select(quantize_micro(col("embedding")).as("__qarr"))
          .select(posexplode(col("__qarr")).as(Seq("__i", "__qi")),
            col("__qarr"))
          .select(col("__i").cast("long").as("__i"), col("__qi"),
            posexplode(col("__qarr")).as(Seq("__j", "__qj")))
          .select(col("__i"), col("__j").cast("long").as("__j"),
            (col("__qi") * col("__qj")).as("__p"))
          .groupBy(col("__i"), col("__j"))
          .agg(sum(col("__p")).as("__pp"))
          .collect()
      }
      t("x212 full") {
        graft.queries.ExtensionQueries.all.find(_._1 == "x212_covariance_spectrum")
          .get._2(spark, sfDir).write.format("noop").mode("overwrite").save()
      }
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    }
    spark.stop()
  }
}

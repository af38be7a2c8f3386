package graft.tmp
import graft.Tables
import graft.functions.TextFunctions._
import graft.functions.ShingleFunctions._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object Prof2 {
  def time[T](n: String)(f: => T): T = { val t0=System.nanoTime(); val r=f; println(s"PROF $n ${(System.nanoTime()-t0)/1e9}"); r }
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32").config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = Tables.load(spark, "/root/testdata/sf0.1", "documents")
    time("warmup")(d.count())
    val sigs = d.select(col("doc_id"), minhash_longs(shingle_hashes(normText(col("text")), 5), 128).as("sig"))
      .filter(col("sig").isNotNull)
    time("sig_compute")(sigs.count())
    val sc = sigs.cache(); time("sig_cache_fill")(sc.count())
    val banded = sc.select(col("doc_id"), posexplode(transform(sequence(lit(0), lit(15)),
      b => hash(slice(col("sig"), b*8+1, lit(8)))))).toDF("doc_id","band","bh")
    val a = banded.as("a"); val b = banded.as("b")
    val cand = a.join(b, col("a.band")===col("b.band") && col("a.bh")===col("b.bh") && col("a.doc_id")<col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b")).distinct()
    time("candidates")(println("cand=" + cand.count()))
    val withSigs = cand.join(sc.withColumnRenamed("doc_id","doc_a").withColumnRenamed("sig","sig_a"),"doc_a")
      .join(sc.withColumnRenamed("doc_id","doc_b").withColumnRenamed("sig","sig_b"),"doc_b")
    val est = withSigs.select(col("doc_a"), col("doc_b"),
      (aggregate(zip_with(col("sig_a"), col("sig_b"), (x,y) => when(x===y,1).otherwise(0)), lit(0), _+_)
        .cast("double")/128).as("est")).filter(col("est")>=0.35)
    time("estimate")(println("pairs=" + est.count()))
    sc.unpersist()
    spark.stop()
  }
}

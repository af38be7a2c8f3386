package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CmsExpressionsSpec extends SparkSpec {
  import CmsFunctions.cms_estimate

  test("cms_estimate reads back Spark's count_min_sketch: never below exact, within eps*N") {
    import spark.implicits._
    // Skewed token stream with known exact counts.
    val toks = (1 to 400).map(_ => "alpha") ++ (1 to 150).map(_ => "beta") ++
      (1 to 40).map(_ => "gamma") ++ (1 to 1000).map(i => s"tail$i")
    val df = spark.createDataset(toks).toDF("tok")
    val sketch = df.agg(
      expr("count_min_sketch(tok, 0.001d, 0.999d, 42)").as("cms"),
      count(lit(1)).as("n"))
    val exact = df.groupBy("tok").agg(count(lit(1)).as("exact_n"))
      .filter(col("tok").isin("alpha", "beta", "gamma"))
    val rows = exact.crossJoin(broadcast(sketch))
      .select(col("tok"), col("exact_n"),
        cms_estimate(col("cms"), col("tok")).as("est"), col("n"))
      .collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      val (exactN, est, n) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(est >= exactN, s"${r.getString(0)}: CMS underestimated $est < $exactN")
      assert(est <= exactN + math.ceil(0.001 * n).toLong,
        s"${r.getString(0)}: CMS overestimate $est beyond eps*N bound")
    }
  }

  test("cms_estimate is null-safe and deterministic for a fixed seed") {
    import spark.implicits._
    val df = spark.createDataset(Seq("a", "b", "a")).toDF("tok")
    val s1 = df.agg(expr("count_min_sketch(tok, 0.01d, 0.99d, 7)").as("c"))
      .select(cms_estimate(col("c"), lit("a"))).as[Long].head()
    val s2 = df.agg(expr("count_min_sketch(tok, 0.01d, 0.99d, 7)").as("c"))
      .select(cms_estimate(col("c"), lit("a"))).as[Long].head()
    assert(s1 == s2 && s1 >= 2L)
    val nulls = df.agg(expr("count_min_sketch(tok, 0.01d, 0.99d, 7)").as("c"))
      .select(cms_estimate(col("c"), lit(null).cast("string")))
      .collect()
    assert(nulls.head.isNullAt(0))
  }
}

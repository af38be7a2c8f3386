package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column profiling — the data-quality first pass of a corpus
  * pipeline: per-column row/null/distinct counts and min/max. One
  * aggregation pass over the table computes every column's stats
  * (no per-column scans); the unpivot to long format is a narrow
  * post-processing step on the single aggregated row.
  *
  * min/max are emitted as strings under binary collation (both Spark
  * and DuckDB default to binary string comparison, which is what makes
  * the oracle exact).
  */
object Profile {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"__cnt_$c"),
        count(lit(1)).minus(count(col(c))).as(s"__null_$c"),
        countDistinct(col(c)).as(s"__dist_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = cols.map { c =>
      struct(
        lit(c).as("column"),
        col(s"__cnt_$c").as("n_non_null"),
        col(s"__null_$c").as("n_null"),
        col(s"__dist_$c").as("n_distinct"),
        col(s"__min_$c").as("min_str"),
        col(s"__max_$c").as("max_str"))
    }
    one.select(explode(array(rows: _*)).as("p")).select("p.*")
  }
}

package graft.queries

import graft.{SparkEntry, SparkSpec, Tables}

/** Engine-internal double-entry check: the declared relational queries
  * (SURVEY §2.9) are portable SQL that runs verbatim on Spark too, so
  * every DataFrame-API implementation must produce row-identical
  * results to `spark.sql` over the same views. Catches semantic drift
  * between the two surfaces without needing the DuckDB oracle.
  * (Extension oracles are DuckDB-dialect and excluded.) */
class SqlParitySpec extends SparkSpec {

  test("DataFrame implementations match spark.sql for the portable q-set") {
    Tables.registerAll(spark, sf001)
    val failures = OracleSql.all.toSeq.sortBy(_._1)
      .filterNot { case (name, _) => OracleSql.duckOnlyDialect(name) }
      .flatMap { case (name, sql) =>
      val viaApi = SparkEntry.queries(name)(spark, sf001).collect()
        .map(_.toSeq.map(v => if (v == null) "NULL" else v.toString))
      val viaSql = spark.sql(sql).collect()
        .map(_.toSeq.map(v => if (v == null) "NULL" else v.toString))
      if (viaApi.toSeq == viaSql.toSeq) None
      else Some(s"$name: api ${viaApi.length} rows vs sql ${viaSql.length}; " +
        s"first diff ${viaApi.zip(viaSql).find(p => p._1 != p._2)}")
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  // q46's declared impl IS spark.sql of the (portable) oracle text, so
  // the generic loop above compares that string to itself — vacuous.
  // The real double-entry check: the correlated form must match a
  // hand-decorrelated aggregate-join built with the DataFrame API
  // (pre-aggregate orders once, left-outer join, COUNT null→0).
  test("q46: correlated form matches a hand-decorrelated aggregate-join") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.DecimalType
    val dec = DecimalType(18, 2)
    val correlated = RelationalQueries.q46(spark, sf001).collect()
      .map(_.toSeq.map(String.valueOf)).toSeq
    val perCust = graft.Tables.load(spark, sf001, "orders")
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("o_totalprice").cast(dec)).as("s"))
    val decorrelated = graft.Tables.load(spark, sf001, "customer")
      .filter(col("c_acctbal") > 9000.0)
      .join(perCust, col("c_custkey") === col("o_custkey"), "left_outer")
      .select(
        col("c_custkey"),
        coalesce(col("cnt"), lit(0L)).as("n_orders"),
        coalesce(col("s"), lit(0).cast(dec)).cast("double").as("spend"))
      .orderBy(col("c_custkey"))
      .collect().map(_.toSeq.map(String.valueOf)).toSeq
    assert(correlated == decorrelated,
      s"correlated ${correlated.length} rows vs decorrelated " +
        s"${decorrelated.length}; first diff " +
        correlated.zip(decorrelated).find(p => p._1 != p._2))
  }
}

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
}

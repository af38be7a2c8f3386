package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{ExtensionQueries, OracleSql, ReferenceQueries, RelationalQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator surfaces here as a named query over the
  * `/root/testdata/sf*` fixture tables; where the semantics are
  * SQL-expressible the matching DuckDB oracle lives in [[OracleSql]].
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Join-chain + aggregation (SURVEY §2.9 Q04 shape). */
  def entry(spark: SparkSession): DataFrame =
    RelationalQueries.q04(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    (RelationalQueries.all ++ ExtensionQueries.all ++ ReferenceQueries.all).toMap

  /** Bench-only timing probes (scale-path variants of declared queries,
    * e.g. x20 without its exact calibration siblings). Reported by Bench
    * under "probes"; never part of correctness or the headline. */
  def benchProbes: Map[String, (SparkSession, String) => DataFrame] =
    ExtensionQueries.benchProbes.toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    * dynamicOracles entries embed Spark-computed constants (x22's
    * trained centroids) and exist only after the owning query ran in
    * this JVM — which is Verify's call order. */
  def oracleSql: Map[String, String] =
    OracleSql.all ++ ExtensionQueries.oracles ++
      ExtensionQueries.snapshotServedOracles ++
      ExtensionQueries.dynamicOracles ++ ReferenceQueries.oracles
}

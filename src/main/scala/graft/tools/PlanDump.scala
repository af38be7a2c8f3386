package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: print a declared query's Bench plan fingerprint (and the
  * plan on request) — the cross-session stability check for
  * [[graft.Bench.planFingerprint]]'s normalizer. Usage:
  * `sbt "runMain graft.tools.PlanDump <query-name> [plan]"`. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("x71_token_budget_select")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
    println(s"PLANFP>>>$name:" + graft.Bench.planFingerprint(df))
    if (args.length > 1) println("PLAN>>>" +
      df.queryExecution.executedPlan.toString)
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: dump `.explain("formatted")` for a set of declared queries
  * to files — the before/after plan evidence the optimization rounds
  * commit under plans/rNN/. Usage:
  * `sbt "runMain graft.tools.ExplainDump <outDir> <suffix> <regex-or-substring>"`
  * (e.g. `runMain graft.tools.ExplainDump plans/r18 before 'x209.*|x212.*'`).
  * SPARK_GRAFT_SF_DIR picks the data dir (default sf0.1 — plan shapes,
  * not timings, so a busy machine is fine). */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("plans/r18")
    val suffix = if (args.length > 1) args(1) else "before"
    val only = if (args.length > 2) Some(args(2)) else None
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def matches(n: String): Boolean = only.forall(o =>
      scala.util.Try(n.matches(o)).getOrElse(false) || n.contains(o))
    val dir = java.nio.file.Paths.get(outDir)
    java.nio.file.Files.createDirectories(dir)
    graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => matches(n) }
      .foreach { case (name, fn) =>
        try {
          val df = fn(spark, sfDir)
          val txt = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          java.nio.file.Files.write(dir.resolve(s"${name}_$suffix.txt"),
            txt.getBytes("UTF-8"))
          println(s"[explain] $name -> $outDir/${name}_$suffix.txt")
        } catch { case e: Throwable =>
          println(s"[explain] $name FAILED: ${e.toString.take(200)}")
        }
      }
    spark.stop()
  }
}

package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Dev knob (unset in driver runs): SPARK_GRAFT_ONLY=<regex|substr>
    // dumps only matching queries — iteration on one query shouldn't
    // re-dump all of them. Accepts a full-match regex OR a plain
    // substring (same ergonomics as Bench), and refuses an empty
    // selection instead of silently dumping nothing.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
    // Try: a value that is not valid regex (e.g. "x26(") must degrade to
    // the substring branch, not throw PatternSyntaxException
    val selected = SparkEntry.queries
      .filter { case (name, _) =>
        only.forall(o =>
          scala.util.Try(name.matches(o)).getOrElse(false) || name.contains(o)) }
    require(selected.nonEmpty,
      s"SPARK_GRAFT_ONLY=${only.getOrElse("")} matches no queries")
    // Per-query fault isolation, but NOT silent: every failure is recorded
    // in _errors.json (name → exception message). Round 8 showed why — 12
    // broken queries simply vanished from the correctness set and the
    // driver's JSON read as 117/117 green. An always-written artifact
    // (empty object when clean) makes a regression show as `err`, not as a
    // smaller denominator.
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    selected
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        val msg = s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("")}"
        errors(name) = msg.take(2000)
        System.err.println(s"[verify] $name failed: $msg")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    val errJson = errors
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/_errors.json"), errJson)
    if (errors.nonEmpty)
      System.err.println(s"[verify] ${errors.size} quer${if (errors.size == 1) "y" else "ies"} FAILED: ${errors.keys.mkString(", ")}")
    spark.stop()
  }
}

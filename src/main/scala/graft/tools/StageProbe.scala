package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

import scala.collection.mutable

/** Dev-only stage-level profiler (r19): runs declared queries through
  * the noop sink with a listener recording, per stage, the task
  * count, summed task time, max task time and wall duration — the
  * direct detector for single-threaded stages (1-task broadcast-probe
  * chains over AQE-coalesced checkpoints, the x252/x258 pattern) and
  * for stragglers (max ≫ sum/tasks). Also attributes the per-query
  * fixed floor: `wall − Σstage_wall` is driver/planning/scheduling
  * time the stages never see.
  *
  * Usage: `sbt "runMain graft.tools.StageProbe <regex-or-substring>"`
  * (SPARK_GRAFT_SF_DIR picks the data dir, default sf0.1;
  * SPARK_GRAFT_REPEAT runs per query, default 2 — the LAST run's
  * stages are reported, warm block manager, post-JIT). */
object StageProbe {

  private case class St(var name: String = "", var tasks: Int = 0,
      var taskMs: Long = 0L, var maxMs: Long = 0L,
      var wallMs: Long = 0L)

  def main(args: Array[String]): Unit = {
    val only = args.headOption
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val repeat = sys.env.getOrElse("SPARK_GRAFT_REPEAT", "2").toInt
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.entry(spark).count()

    val stages = mutable.LinkedHashMap[Int, St]()
    val listener = new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
        stages.synchronized {
          val st = stages.getOrElseUpdate(e.stageId, St())
          val ms = e.taskInfo.duration
          st.taskMs += ms
          if (ms > st.maxMs) st.maxMs = ms
        }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
        stages.synchronized {
          val si = e.stageInfo
          val st = stages.getOrElseUpdate(si.stageId, St())
          st.name = si.name.takeWhile(_ != '\n').take(60)
          st.tasks = si.numTasks
          st.wallMs = (for {
            a <- si.completionTime; b <- si.submissionTime
          } yield a - b).getOrElse(0L)
        }
    }
    spark.sparkContext.addSparkListener(listener)

    def matches(n: String): Boolean = only.forall(o =>
      scala.util.Try(n.matches(o)).getOrElse(false) || n.contains(o))

    graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => matches(n) }
      .foreach { case (name, fn) =>
        try {
          var wallS = 0.0
          for (r <- 1 to repeat) {
            stages.synchronized(stages.clear())
            val t0 = System.nanoTime()
            fn(spark, sfDir).write.format("noop").mode("overwrite").save()
            wallS = (System.nanoTime() - t0) / 1e9
            spark.sparkContext.getPersistentRDDs.values
              .foreach(_.unpersist(true))
          }
          // snapshot under the lock; report sorted by stage wall
          val snap = stages.synchronized(stages.toVector)
          val stageWall = snap.map(_._2.wallMs).sum
          println(f"PROBE $name wall=$wallS%.3f s stages=${snap.size} " +
            f"stageWallSum=${stageWall / 1000.0}%.3f s " +
            f"offStage=${wallS - stageWall / 1000.0}%.3f s")
          snap.sortBy(-_._2.wallMs).take(12).foreach { case (id, st) =>
            println(f"  stage=$id%-4d tasks=${st.tasks}%-4d " +
              f"wall=${st.wallMs}%-6d taskSum=${st.taskMs}%-7d " +
              f"max=${st.maxMs}%-6d ms  ${st.name}")
          }
        } catch { case e: Throwable =>
          println(s"PROBE $name FAILED: ${e.toString.take(160)}")
        }
      }
    spark.stop()
  }
}

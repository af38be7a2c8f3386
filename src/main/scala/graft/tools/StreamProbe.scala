package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Dev-only throughput probe for the STATEFUL streaming twins (r19,
  * VERDICT r18 item 8): bounded MemoryStream input driven through the
  * real `transformWithState` pipelines under the RocksDB state-store
  * provider (the production backend the batch-parity tests pin),
  * reporting rows/s — the scoped evidence that makes a streaming
  * optimization verifiable. Correctness stays pinned by
  * StreamingSpec's batch-parity tests; this measures only throughput.
  *
  * Usage: `sbt "runMain graft.tools.StreamProbe [nRows] [nBatches]"`
  * (defaults 200000 rows in 10 batches). Recorded runs live in
  * SCALE.md §streaming-throughput. */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val nRows = args.headOption.map(_.toInt).getOrElse(200000)
    val nBatches = if (args.length > 1) args(1).toInt else 10
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    implicit val sc = spark.sqlContext

    val batchSize = math.max(1, nRows / nBatches)

    // ---- weighted-sample twin (x272's processor) --------------------
    {
      val in = MemoryStream[graft.streaming.Streaming.WeightedEvent]
      val q = graft.streaming.Streaming
        .weightedSampleWithState(in.toDS(), k = 8)
        .writeStream.outputMode("append")
        .format("noop").queryName("probe_wsample").start()
      val t0 = System.nanoTime()
      (0 until nRows).grouped(batchSize).foreach { ids =>
        in.addData(ids.map(i => graft.streaming.Streaming.WeightedEvent(
          s"s${i % 64}", i.toLong, 1L + (i * 37) % 500)))
        q.processAllAvailable()
      }
      val s = (System.nanoTime() - t0) / 1e9
      q.stop()
      println(f"STREAMPROBE weighted_sample rows=$nRows batches=" +
        f"${(nRows + batchSize - 1) / batchSize} wall=$s%.3f s " +
        f"rows_per_s=${nRows / s}%.0f")
    }

    // ---- NB-monitor twin (x273/x274's processor) --------------------
    {
      // a tiny frozen weight table over md5-60 token buckets — the
      // probe scores real tokenized text per row, like the twin does
      val weights: Map[Long, Long] =
        (0L until 512L).map(h => h -> ((h % 41) - 20) * 1000L).toMap
      val in = MemoryStream[graft.streaming.Streaming.NbDoc]
      val q = graft.streaming.Streaming
        .nbMonitorWithState(in.toDS(), weights, bias = -1500L)
        .writeStream.outputMode("append")
        .format("noop").queryName("probe_nbmon").start()
      val words = Vector("alpha", "beta", "gamma", "delta", "epsilon",
        "zeta", "eta", "theta", "iota", "kappa")
      val t0 = System.nanoTime()
      (0 until nRows).grouped(batchSize).foreach { ids =>
        in.addData(ids.map { i =>
          val text = (0 until 8).map(j => words((i + j * 7) % 10))
            .mkString(" ")
          graft.streaming.Streaming.NbDoc(
            s"src${i % 16}", i.toLong, i % 3 == 0, text)
        })
        q.processAllAvailable()
      }
      val s = (System.nanoTime() - t0) / 1e9
      q.stop()
      println(f"STREAMPROBE nb_monitor rows=$nRows batches=" +
        f"${(nRows + batchSize - 1) / batchSize} wall=$s%.3f s " +
        f"rows_per_s=${nRows / s}%.0f")
    }
    spark.stop()
  }
}

package graft.sources

import java.nio.file.Files
import java.util.concurrent.atomic.AtomicReference

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The atomic snapshot-pointer layout's contract (VERDICT r15 item 3):
  * writers never disturb the published snapshot, the pointer flip is
  * the commit point, and — the e2e pin — a reader querying WHILE a
  * writer merges never sees a torn table. */
class SnapshotStoreSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toFile.getPath

  test("write/read/currentVersion: versions advance, old snapshots stay " +
      "readable, vacuum keeps the pointed-at one") {
    val table = tmp("snap_basic") + "/t"
    assert(SnapshotStore.currentVersion(spark, table).isEmpty)
    intercept[java.io.FileNotFoundException](SnapshotStore.read(spark, table))

    val v1 = SnapshotStore.write(Seq(1, 2, 3).toDF("x"), table)
    val v2 = SnapshotStore.write(Seq(4, 5).toDF("x"), table)
    assert((v1, v2) == (1L, 2L))
    assert(SnapshotStore.currentVersion(spark, table) == Some(2L))
    assert(SnapshotStore.read(spark, table).as[Int].collect().sorted.toSeq == Seq(4, 5))
    // the superseded snapshot is untouched until vacuum
    assert(spark.read.parquet(s"$table/snap-00000001")
      .as[Int].collect().sorted.toSeq == Seq(1, 2, 3))

    val v3 = SnapshotStore.write(Seq(9).toDF("x"), table)
    assert(v3 == 3L)
    val deleted = SnapshotStore.vacuum(spark, table, keepLast = 2)
    assert(deleted == Seq("snap-00000001"), deleted)
    assert(SnapshotStore.read(spark, table).as[Int].collect().toSeq == Seq(9))
    assert(spark.read.parquet(s"$table/snap-00000002")
      .as[Int].collect().sorted.toSeq == Seq(4, 5))
  }

  test("a crashed unpublished snapshot is overwritten by the next write, " +
      "and a corrupt pointer fails loudly") {
    val table = tmp("snap_crash") + "/t"
    SnapshotStore.write(Seq(1).toDF("x"), table)
    // simulate a writer that died after materializing snap-2 but
    // before the pointer flip
    Seq(7, 7, 7).toDF("x").write.parquet(s"$table/snap-00000002")
    assert(SnapshotStore.currentVersion(spark, table) == Some(1L))
    val v = SnapshotStore.write(Seq(2, 3).toDF("x"), table)
    assert(v == 2L)
    assert(SnapshotStore.read(spark, table).as[Int].collect().sorted.toSeq == Seq(2, 3))

    java.nio.file.Files.write(java.nio.file.Paths.get(table, "_CURRENT"),
      "garbage".getBytes("UTF-8"))
    intercept[java.io.IOException](SnapshotStore.currentVersion(spark, table))
  }

  test("e2e: a concurrent reader NEVER sees a torn table while a writer " +
      "publishes snapshot after snapshot") {
    val table = tmp("snap_concurrent") + "/t"
    // version v's content: v rows, every row carrying v — a read is
    // consistent iff (count == marker) and all markers agree
    def frame(v: Int) = spark.range(v)
      .select(lit(v).cast("int").as("ver"), col("id"))
    SnapshotStore.write(frame(1), table)

    val torn = new AtomicReference[String](null)
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val reads = new java.util.concurrent.atomic.AtomicInteger(0)
    val reader = new Thread(() => {
      while (!stop.get() && torn.get() == null) {
        val rows = SnapshotStore.read(spark, table)
          .select(col("ver")).as[Int].collect()
        val vs = rows.distinct
        if (vs.length != 1 || rows.length != vs.head)
          torn.set(s"markers=${vs.toSeq} count=${rows.length}")
        reads.incrementAndGet()
        ()
      }
    })
    reader.start()
    (2 to 25).foreach { v => SnapshotStore.write(frame(v), table) }
    stop.set(true)
    reader.join(60000)
    assert(torn.get() == null, s"torn read: ${torn.get()}")
    assert(reads.get() > 0)
    // and the final state is the last published version, complete
    val fin = SnapshotStore.read(spark, table).select(col("ver")).as[Int].collect()
    assert(fin.length == 25 && fin.forall(_ == 25))
  }

  test("writePartitionedSnapshot: published snapshot prunes partitions " +
      "like a plain partitioned path") {
    val table = tmp("snap_part") + "/t"
    val docs = graft.Tables.load(spark, sf001, "documents")
      .select(col("doc_id"), col("lang"), col("n_chars"))
    val v = graft.operators.Layout.writePartitionedSnapshot(
      docs, table, partCols = Seq("lang"), sortCols = Seq("doc_id"))
    assert(v == 1L)
    val read = SnapshotStore.read(spark, table)
    assert(read.count() == docs.count())
    val pruned = read.filter(col("lang") === "en")
    val scans = pruned.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(scans.nonEmpty)
    assert(scans.head.selectedPartitions.partitionCount == 1,
      s"expected 1 pruned lang partition, got ${scans.head.selectedPartitions.partitionCount}")
    assert(pruned.count() == docs.filter(col("lang") === "en").count())
  }
}

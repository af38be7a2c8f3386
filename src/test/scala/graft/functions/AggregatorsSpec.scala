package graft.functions

import graft.SparkSpec

class AggregatorsSpec extends SparkSpec {
  import spark.implicits._

  test("BottomKLongs keeps the k smallest distinct values per group") {
    val ds = Seq(
      ("a", 5L), ("a", 1L), ("a", 9L), ("a", 1L), ("a", 3L), ("a", 2L),
      ("b", 7L)).toDS()
    val r = ds.groupByKey(_._1).mapValues(_._2)
      .agg(new BottomKLongs(3).toColumn)
      .collect().toMap
    assert(r("a").toSeq == Seq(1L, 2L, 3L)) // distinct + sorted + capped
    assert(r("b").toSeq == Seq(7L))
  }

  test("BottomKLongs merge equals bottom-k of the union (partial-agg exactness)") {
    val agg = new BottomKLongs(4)
    val left = Array(1L, 4L, 9L)
    val right = Array(2L, 4L, 8L, 16L)
    assert(agg.merge(left, right).toSeq == Seq(1L, 2L, 4L, 8L))
  }

  test("TopKScored never exceeds k, even on duplicate (id, score) inserts") {
    val agg = new TopKScored(2)
    val full = Seq(Scored(5, 0.9), Scored(3, 0.5))
    // duplicate of the last element: neither side is `better` — the
    // pre-fix insert returned k+1 elements here
    val dup = agg.reduce(full, Scored(3, 0.5))
    assert(dup.length == 2, dup)
    assert(dup == full)
    // duplicate of the head keeps order and size too
    val dupHead = agg.reduce(full, Scored(5, 0.9))
    assert(dupHead.length == 2 && dupHead.head == Scored(5, 0.9))
    // merge of two full identical buffers stays capped
    assert(agg.merge(full, full).length == 2)
  }

  test("RunCountsAgg reduces a changelog action stream map-side") {
    val ds = Seq("created", "updated", "updated", "errored", "created").toDS()
    val r = ds.groupByKey(_ => 1).agg(RunCountsAgg.toColumn).collect()(0)._2
    assert(r == RunCounts(2, 2, 1))
  }

  test("BottomKLongs over real fingerprint hashes per source") {
    import graft.functions.ShingleFunctions._
    import graft.functions.TextFunctions._
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    val perSource = docs
      .select(col("source"), explode(fingerprint(col("text"))).as("h"))
      .as[(String, Long)]
      .groupByKey(_._1).mapValues(_._2)
      .agg(new BottomKLongs(8).toColumn)
      .collect()
    assert(perSource.length == 20) // src0..src19
    perSource.foreach { case (_, bk) =>
      assert(bk.length == 8 && bk.toSeq == bk.toSeq.sorted.distinct)
    }
  }
}

package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The written layout must deliver what it promises: one directory per
  * partition value, bounded file sizes, planning-time pruning on the
  * partition column, and row-group stats a range predicate can use. */
class LayoutSpec extends SparkSpec {

  test("writePartitioned: per-value directories, bounded files, planning-time pruning") {
    val dir = "target/fixtures/docs_by_lang"
    val docs = graft.Tables.load(spark, sf001, "documents")
    Layout.writePartitioned(docs, dir,
      partCols = Seq("lang"), sortCols = Seq("doc_id"),
      maxRecordsPerFile = 40L)

    val root = new java.io.File(dir)
    val langDirs = root.listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("lang=")).sorted
    val langs = docs.select("lang").distinct()
      .collect().map(r => s"lang=${r.getString(0)}").sorted
    assert(langDirs.toSeq == langs.toSeq) // one directory per value

    // file sizing: every leaf parquet file respects the record cap
    val reread = spark.read.parquet(dir)
    val perFile = reread
      .groupBy(input_file_name()).count()
      .select(col("count")).collect().map(_.getLong(0))
    assert(perFile.nonEmpty && perFile.forall(_ <= 40L),
      s"file over the record cap: ${perFile.max}")

    // planning-time pruning: a lang predicate resolves as a
    // PartitionFilter touching exactly one directory, not a row filter
    val pruned = reread.filter(col("lang") === "en")
    val scans = pruned.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(scans.nonEmpty)
    assert(scans.head.selectedPartitions.partitionCount == 1,
      s"expected 1 pruned partition, got ${scans.head.selectedPartitions.partitionCount}")
    assert(pruned.count() == docs.filter(col("lang") === "en").count())

    // within-partition sort happened: each file holds a contiguous
    // doc_id run (files don't interleave), which is what gives parquet
    // min/max stats their pruning power
    val ranges = reread.filter(col("lang") === "en")
      .groupBy(input_file_name().as("f"))
      .agg(min("doc_id").as("lo"), max("doc_id").as("hi"), count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi1, _), (lo2, _, _)) =>
        assert(hi1 < lo2, s"file id-ranges interleave: $ranges")
      case _ =>
    }
  }

  test("shardAssignment: dense per-shard positions, layout-invariant, hash-uniform") {
    val docs = graft.Tables.load(spark, sf001, "documents")
    val assigned = Layout.shardAssignment(docs, "doc_id", nShards = 8)
    // payload columns ride along — shards are directly materializable
    assert(docs.columns.toSet.subsetOf(assigned.columns.toSet))
    val a = assigned.select(col("doc_id"), col("shard"), col("pos"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    // positions are dense 1..n within every shard
    a.groupBy(_._2).foreach { case (shard, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1 to rows.length),
        s"shard $shard positions not dense")
    }
    // deterministic under a different partition layout
    val b = Layout.shardAssignment(docs.repartition(7), "doc_id", nShards = 8)
      .select(col("doc_id"), col("shard"), col("pos"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(a.sortBy(_._1).toSeq == b.sortBy(_._1).toSeq)
    // md5 uniformity: no shard is empty or hogs the corpus (500 docs /
    // 8 shards ≈ 62; 3x bounds are loose enough to never flake)
    val sizes = a.groupBy(_._2).view.mapValues(_.length)
    assert(sizes.size == 8 && sizes.values.forall(n => n > 20 && n < 190),
      s"shard skew: ${sizes.toMap}")
  }

  test("shardAssignment: the many-shards window branch (> 1024) assigns " +
      "the same (shard, pos) as the prefix-sum branch's algebra") {
    val docs = graft.Tables.load(spark, sf001, "documents")
    // 2000 shards over 500 docs: most shards hold 0-2 rows — the
    // regime where a per-shard window is the right shape and the
    // prefix-sum offsets frame (partitions × nShards) would not be.
    val many = Layout.shardAssignment(docs, "doc_id", nShards = 2000)
      .select(col("doc_id"), col("shard"), col("pos"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    // same contract as the few-shards branch: dense 1..n per shard,
    // shard = md5Bucket60(id) % nShards
    many.groupBy(_._2).foreach { case (shard, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1 to rows.length),
        s"shard $shard positions not dense")
    }
    val expected = docs.select(col("doc_id"),
        (graft.functions.TextFunctions.md5Bucket60(col("doc_id")) % 2000)
          .as("shard"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    many.foreach { case (id, shard, _) => assert(expected(id) == shard) }
  }

  test("writePartitioned rejects degenerate parameters") {
    val docs = graft.Tables.load(spark, sf001, "documents")
    intercept[IllegalArgumentException] {
      Layout.writePartitioned(docs, "target/fixtures/never", Seq(), Seq("doc_id"))
    }
    intercept[IllegalArgumentException] {
      Layout.writePartitioned(docs, "target/fixtures/never", Seq("lang"),
        Seq("doc_id"), maxRecordsPerFile = 0L)
    }
  }

  test("reshardPlan: totals reconcile with the corpus, identity reshard moves " +
      "nothing, and the matrix agrees with shardAssignment's hash") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = graft.Tables.load(spark, sf001, "documents")
    val plan = Layout.reshardPlan(docs, "doc_id", "n_chars", 16, 24)
      .as[(Long, Long, Long, Long, Boolean)].collect()
    assert(plan.map(_._3).sum == docs.count())
    assert(plan.forall(c => c._5 == (c._1 != c._2)))
    // cross-check one cell against the assignment the plan predicts
    val viaAssign = Layout.shardAssignment(docs, "doc_id", 16)
      .withColumn("to24",
        graft.functions.TextFunctions.md5Bucket60(col("doc_id")) % 24)
      .groupBy($"shard", $"to24").count()
      .as[(Long, Long, Long)].collect()
      .map(t => (t._1, t._2) -> t._3).toMap
    plan.foreach { case (f, t, n, _, _) =>
      assert(viaAssign.getOrElse((f, t), 0L) == n, s"cell ($f,$t)")
    }
    // same shard count in and out → nothing moves
    val idPlan = Layout.reshardPlan(docs, "doc_id", "n_chars", 16, 16)
      .as[(Long, Long, Long, Long, Boolean)].collect()
    assert(idPlan.forall(c => !c._5 && c._1 == c._2))
  }

  test("sortKeyAdvisor: aligned order scores +1, reversed −1, a constant " +
      "column degenerates to +1 via the id tie-break") {
    import spark.implicits._
    val df = Seq(
      (1L, 10L, 40L, "c"), (2L, 20L, 30L, "c"),
      (3L, 30L, 20L, "c"), (4L, 40L, 10L, "c"))
      .toDF("doc_id", "asc_v", "desc_v", "const_v")
    val out = Layout.sortKeyAdvisor(df, Seq("asc_v", "desc_v", "const_v"),
        "doc_id")
      .as[(String, Long, Long, Option[Long])].collect()
    // reversed: Σd² = 9+1+1+9 = 20 → 1 − 120/60 = −1
    assert(out.toSeq == Seq(
      ("asc_v", 4L, 4L, Some(1000000L)),
      ("const_v", 4L, 1L, Some(1000000L)),
      ("desc_v", 4L, 4L, Some(-1000000L))))
  }

  test("sortKeyAdvisor ENFORCES the exact-rank envelope: a frame beyond " +
      "maxRows fails loudly instead of silently leaving exact Σd²") {
    import spark.implicits._
    val big = (1L to 50L).map(i => (i, i % 7)).toDF("doc_id", "v")
    val err = intercept[Exception] {
      Layout.sortKeyAdvisor(big, Seq("v"), "doc_id", maxRows = 10L).collect()
    }
    assert(err.getMessage.contains("exceed the exact-rank envelope") ||
      Option(err.getCause).exists(_.getMessage
        .contains("exceed the exact-rank envelope")), err.toString)
    // the same frame under the envelope still advises
    assert(Layout.sortKeyAdvisor(big, Seq("v"), "doc_id", maxRows = 50L)
      .collect().length == 1)
    // out-of-range envelopes (beyond the int64-exact Σd² bound) rejected
    intercept[IllegalArgumentException] {
      Layout.sortKeyAdvisor(big, Seq("v"), "doc_id", maxRows = 4000000L)
    }
  }

  test("broadcastAdvisor: the stated byte formula, null strings at 0, " +
      "threshold verdict flips") {
    import spark.implicits._
    val t = Seq((1L, "ab"), (2L, null)).toDF("id", "name")
    val out = Layout.broadcastAdvisor(Seq("t" -> t))
      .as[(String, Long, Long, Boolean)].collect()
    // row1: 8 + (2+20) = 30; row2: 8 + (0+20) = 28 -> 58 bytes
    assert(out.toSeq == Seq(("t", 2L, 58L, true)))
    val tight = Layout.broadcastAdvisor(Seq("t" -> t), thresholdBytes = 50L)
      .as[(String, Long, Long, Boolean)].collect()
    assert(tight.toSeq == Seq(("t", 2L, 58L, false)))
  }
  test("saltAdvisor: ceil-division salt factors, skew flag, (n desc, key) " +
      "top-N cut") {
    import spark.implicits._
    val df = (Seq.fill(120)("a") ++ Seq.fill(50)("b") ++ Seq.fill(3)("c"))
      .toDF("k")
    val out = Layout.saltAdvisor(df, "k", targetPerTask = 50L, topN = 2)
      .as[(String, Long, Long, Boolean)].collect()
    // a: ceil(120/50)=3 buckets, skewed; b: exactly at target -> 1, not
    // skewed (strict >); c cut by topN
    assert(out.toSeq == Seq(("a", 120L, 3L, true), ("b", 50L, 1L, false)))
  }
  test("joinSizeAdvisor: exact n_left*n_right contributions, shares, and " +
      "the (contrib desc, key) cut — unmatched keys contribute nothing") {
    import spark.implicits._
    val left = (Seq.fill(3)("a") ++ Seq("b") ++ Seq.fill(2)("c")).toDF("k")
    val right = (Seq.fill(2)("a") ++ Seq.fill(5)("c") ++ Seq.fill(7)("d")).toDF("k")
    val out = Layout.joinSizeAdvisor(left, right, "k", topN = 10)
      .as[(String, Long, Long, Long, Long, Long)].collect()
    // a: 3*2 = 6, c: 2*5 = 10 -> total 16; b and d never match
    assert(out.toSeq == Seq(
      ("c", 2L, 5L, 10L, 16L, 625000L),
      ("a", 3L, 2L, 6L, 16L, 375000L)))
  }

  test("joinSizeAdvisor: share_micro stays exact past the contrib*1e6 Long " +
      "wrap point (4Mx4M hot key = 1.6e13 contrib; ADVICE r13)") {
    import spark.implicits._
    // one 4M-row key per side: contrib = 1.6e13 > Long.Max/1e6 ≈ 9.2e12,
    // so the old BIGINT contrib*1000000L wrapped negative; the decimal
    // path must report the exact 100% share
    val big = spark.range(4000000L).select(lit("hot").as("k"))
    val out = Layout.joinSizeAdvisor(big, big, "k", topN = 3)
      .as[(String, Long, Long, Long, Long, Long)].collect()
    assert(out.toSeq == Seq(
      ("hot", 4000000L, 4000000L, 16000000000000L, 16000000000000L, 1000000L)))
  }
  test("joinOrderAdvisor: intermediate forecasts from key histograms, " +
      "order-independent final size, smallest-intermediate winner") {
    import spark.implicits._
    val a = Seq("k1", "k1", "k2").toDF("k")
    val b = Seq("k1", "k2", "k2").toDF("k")
    val c = Seq("k2").toDF("k")
    val out = Layout.joinOrderAdvisor(a, b, c, "k")
      .as[(String, Long, Long, Boolean)].collect()
    // ab = 2*1 + 1*2 = 4; ac = 1; bc = 2; final = 2*1*0 + 1*2*1 = 2
    assert(out.toSeq == Seq(
      ("ab_then_c", 4L, 2L, false),
      ("ac_then_b", 1L, 2L, true),
      ("bc_then_a", 2L, 2L, false)))
  }
  test("partitionCountAdvisor: ceiling division to the target, floor 1, " +
      "rows per partition") {
    import spark.implicits._
    // 3 rows x 600 bytes = 1800 bytes, target 1000 -> 2 partitions
    val df = Seq(600L, 600L, 600L).toDF("b")
    val out = Layout.partitionCountAdvisor(df, "b", targetPartitionBytes = 1000L)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(out.toSeq == Seq((3L, 1800L, 1000L, 2L, 1L)))
    // tiny frame never recommends zero partitions
    val one = Layout.partitionCountAdvisor(Seq(10L).toDF("b"), "b", 1000L)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(one.toSeq == Seq((1L, 10L, 1000L, 1L, 1L)))
  }

  test("epochAllocationAdvisor: richer vocabulary earns every epoch " +
      "before a repetitive source earns one; whole epochs only") {
    import spark.implicits._
    // s1: 4 tokens, 4 distinct -> q = 1e6; s2: 4 tokens, 1 distinct
    // -> q = 250000. Budget 2x = 16 tokens. Utility order: s1 e1..e4
    // (1e6, 7e5, 4.9e5, 3.43e5) all above s2 e1 (2.5e5); cum after
    // s1 e4 = 16 = budget, so s2 never fits.
    val docs = Seq(("a b c d", "s1"), ("a a a a", "s2"))
      .toDF("text", "source")
    val out = Layout.epochAllocationAdvisor(docs)
      .as[(String, Long, Long, Long, Long, Long)].collect()
    assert(out.toSeq == Seq(("s1", 4L, 1000000L, 4L, 16L, 1000000L)))
  }

  test("epochAllocationAdvisor: budget multiplier and tie-breaks — " +
      "equal utilities fill in source order; a 1x budget stops at the " +
      "unique corpus") {
    import spark.implicits._
    val docs = Seq(("a b c", "sa"), ("d e f", "sb"))
      .toDF("text", "source")
    // equal q = 1e6; 1x budget = 6: both sources get exactly epoch 1
    val oneX = Layout.epochAllocationAdvisor(docs,
        budgetTimesMicro = 1000000L)
      .as[(String, Long, Long, Long, Long, Long)].collect()
    assert(oneX.toSeq == Seq(("sa", 3L, 1000000L, 1L, 3L, 500000L),
      ("sb", 3L, 1000000L, 1L, 3L, 500000L)))
    // half budget = 3: the source tie-break gives sa the only slot
    val halfX = Layout.epochAllocationAdvisor(docs,
        budgetTimesMicro = 500000L)
      .as[(String, Long, Long, Long, Long, Long)].collect()
    assert(halfX.toSeq == Seq(("sa", 3L, 1000000L, 1L, 3L, 1000000L)))
  }

  test("epochAllocationAdvisor: decay powers are the truncating " +
      "integer sequence; maxEpochs bounds the grid") {
    import spark.implicits._
    val docs = Seq(("a b c d e f g h i j", "s")).toDF("text", "source")
    // one source, budget 10x, maxEpochs 3 -> exactly 3 epochs
    val out = Layout.epochAllocationAdvisor(docs, maxEpochs = 3,
        budgetTimesMicro = 10000000L)
      .as[(String, Long, Long, Long, Long, Long)].collect()
    assert(out.toSeq == Seq(("s", 10L, 1000000L, 3L, 30L, 1000000L)))
    val e = intercept[IllegalArgumentException] {
      Layout.epochAllocationAdvisor(docs, maxEpochs = 0)
    }
    assert(e.getMessage.contains("maxEpochs"))
  }

  test("curriculumPlan: descending-score ntile phases with exact token " +
      "shares; unscored rows are excluded") {
    import spark.implicits._
    // scores 80..10 step 10, weight = score/10 -> phases of 2 docs:
    // tokens 15/11/7/3 of 36
    val scored = (1L to 8L).map(i => (i, Some((9 - i) * 10L), 9 - i)) :+
      ((9L, Option.empty[Long], 99L))
    val df = scored.toDF("doc_id", "flesch_micro", "n_words")
    val out = Layout.curriculumPlan(df)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(out.toSeq == Seq(
      (1L, 2L, 15L, 80L, 70L, 416666L),
      (2L, 2L, 11L, 60L, 50L, 305555L),
      (3L, 2L, 7L, 40L, 30L, 194444L),
      (4L, 2L, 3L, 20L, 10L, 83333L)))
    // ntile fill rule: 5 docs over 4 phases -> 2,1,1,1
    val five = (1L to 5L).map(i => (i, (6 - i) * 10L, 1L))
      .toDF("doc_id", "flesch_micro", "n_words")
    val counts = Layout.curriculumPlan(five)
      .as[(Long, Long, Long, Long, Long, Long)].collect().map(r => r._2)
    assert(counts.toSeq == Seq(2L, 1L, 1L, 1L))
  }
}

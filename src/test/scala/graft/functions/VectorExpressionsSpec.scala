package graft.functions

import graft.SparkSpec
import graft.functions.VectorFunctions._
import org.apache.spark.sql.functions._

class VectorExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private def pair(a: Seq[Float], b: Seq[Float]) =
    Seq((a, b)).toDF("a", "b")

  test("cosine of identical vectors is 1") {
    val r = pair(Seq(1f, 2f, 3f), Seq(1f, 2f, 3f))
      .select(cosine_similarity($"a", $"b")).as[Double].head()
    assert(math.abs(r - 1.0) < 1e-12)
  }

  test("cosine of orthogonal vectors is 0") {
    val r = pair(Seq(1f, 0f), Seq(0f, 1f))
      .select(cosine_similarity($"a", $"b")).as[Double].head()
    assert(r == 0.0)
  }

  test("cosine of opposite vectors is -1") {
    val r = pair(Seq(1f, 2f), Seq(-1f, -2f))
      .select(cosine_similarity($"a", $"b")).as[Double].head()
    assert(math.abs(r + 1.0) < 1e-12)
  }

  test("length mismatch and zero norm give null") {
    val r1 = pair(Seq(1f, 2f), Seq(1f, 2f, 3f))
      .select(cosine_similarity($"a", $"b")).collect()(0)
    assert(r1.isNullAt(0))
    val r2 = pair(Seq(0f, 0f), Seq(1f, 2f))
      .select(cosine_similarity($"a", $"b")).collect()(0)
    assert(r2.isNullAt(0))
  }

  test("null input propagates") {
    val df = Seq((Some(Seq(1f)), Option.empty[Seq[Float]])).toDF("a", "b")
    assert(df.select(cosine_similarity($"a", $"b")).collect()(0).isNullAt(0))
  }

  test("dot product matches hand computation") {
    val r = pair(Seq(1f, 2f, 3f), Seq(4f, 5f, 6f))
      .select(dot_product($"a", $"b")).as[Double].head()
    assert(r == 32.0)
  }

  test("quantize_i8: max element maps to ±127, zero stays 0, zero/empty vector is null") {
    val df = Seq(Tuple1(Seq(0.5f, -1.0f, 0f, 0.25f))).toDF("v")
    val q = df.select(quantize_i8($"v")).as[Seq[Byte]].head()
    // scale = 127/1.0: 0.5→64 (floor(63.5+0.5)), -1→-127, 0→0, 0.25→32 (floor(31.75+0.5))
    assert(q == Seq[Byte](64, -127, 0, 32), q)
    val zero = Seq(Tuple1(Seq(0f, 0f))).toDF("v")
      .select(quantize_i8($"v")).collect()(0)
    assert(zero.isNullAt(0))
    val empty = Seq(Tuple1(Seq.empty[Float])).toDF("v")
      .select(quantize_i8($"v")).collect()(0)
    assert(empty.isNullAt(0))
  }

  test("quantize_i8: dequantized values within half a step of the original") {
    val emb = Tables.loadEmb(spark).limit(50)
    val rows = emb.select($"embedding", quantize_i8($"embedding"))
      .as[(Seq[Float], Seq[Byte])].collect()
    rows.foreach { case (v, q) =>
      val maxAbs = v.map(x => math.abs(x.toDouble)).max
      val step = maxAbs / 127.0
      v.zip(q).foreach { case (x, qi) =>
        assert(math.abs(qi * step - x) <= step / 2 + 1e-9,
          s"x=$x q=$qi step=$step")
      }
    }
  }

  test("codegen and interpreted paths agree on real embeddings") {
    val emb = Tables.loadEmb(spark)
    val joined = emb.as("x").join(emb.as("y"), $"x.vec_id" < $"y.vec_id")
      .limit(200)
      .select(cosine_similarity($"x.embedding", $"y.embedding").as("c"))
    val on = joined.collect().map(_.getDouble(0))
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    val off = try joined.collect().map(_.getDouble(0))
      finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
    assert(on.sameElements(off))
  }

  test("jl_project: deterministic signs, exact hand computation, norm preserved in expectation") {
    // Hand-check one vector against the kernel's own sign matrix:
    // proj_j = sum_i x_i * sign(j,i) / 4.
    val signs = VectorKernels.jlSigns(16, 64, 7)
    assert(signs.length == 16 && signs.forall(_.length == 64))
    assert(VectorKernels.jlSigns(16, 64, 7).map(_.toSeq).toSeq == signs.map(_.toSeq).toSeq)
    val x = Array.tabulate(64)(i => (i % 7 - 3).toFloat)
    val expected = signs.map(row =>
      (0 until 64).foldLeft(0.0)((a, i) => a + x(i).toDouble * row(i)) / 4.0)
    val got = Seq(x.toSeq).toDF("v")
      .select(jl_project($"v", 16, 64, 7)).as[Seq[Double]].head()
    assert(got == expected.toSeq)
  }

  test("jl_project: dim mismatch gives null; norm ratio lands in the JL band on real embeddings") {
    val bad = Seq(Seq(1f, 2f)).toDF("v")
      .select(jl_project($"v", 16, 64, 7)).collect()
    assert(bad.head.isNullAt(0))
    val ratios = Tables.loadEmb(spark)
      .filter(size($"embedding") === 64 &&
        dot_product($"embedding", $"embedding") > 0)
      .select(
        (aggregate(jl_project($"embedding", 16, 64, 7), lit(0.0),
          (a, v) => a + v * v) /
          dot_product($"embedding", $"embedding")).as("r"))
      .as[Double].collect()
    assert(ratios.nonEmpty)
    assert(ratios.forall(r => r > 0.25 && r < 4.0),
      s"JL distortion out of band: min=${ratios.min} max=${ratios.max}")
  }

  test("jl_project codegen and interpreted paths agree") {
    val q = Tables.loadEmb(spark).filter(size($"embedding") === 64).limit(100)
      .select(jl_project($"embedding", 16, 64, 7).as("p"))
    val on = q.collect().map(_.getSeq[Double](0))
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    val off = try q.collect().map(_.getSeq[Double](0))
      finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
    assert(on.toSeq == off.toSeq)
  }

  test("dense_embedding kernel ≡ the map_from_entries/transform SQL tree " +
      "it replaced, including the zero-vector drop (r19, x258)") {
    val rnd = new scala.util.Random(19)
    val dim = 16
    // distinct component indices per row (the producer's groupBy
    // guarantees it), small signed tf sums, some rows empty, some rows
    // all-zero (every component cancels) to exercise the drop contract
    val rows = (0 until 300).map { id =>
      val n = rnd.nextInt(8)
      val entries = rnd.shuffle((0 until dim).toList).take(n)
        .map(i => (i, (rnd.nextInt(7) - 3).toLong))
      (id.toLong, entries)
    }
    val df = rows.toDF("id", "e")
      .select($"id", $"e".cast("array<struct<i:int,v:bigint>>").as("e"))
    val sqlSide = df.select($"id",
        expr(s"transform(sequence(0, ${dim - 1}), " +
          "i -> CAST(coalesce(map_from_entries(e)[CAST(i AS INT)], 0L) " +
          "AS FLOAT))").as("emb"))
      .filter(expr("exists(emb, x -> x != CAST(0 AS FLOAT))"))
      .orderBy($"id").collect().toSeq
    val kernSide = df.select($"id",
        dense_embedding($"e", dim).as("emb"),
        coalesce(expr("array_max(transform(e, s -> abs(s.v)))"), lit(0L))
          .as("__mx"))
      .filter($"__mx" > 0L).drop("__mx")
      .orderBy($"id").collect().toSeq
    assert(kernSide.nonEmpty && kernSide == sqlSide)
  }

  object Tables {
    def loadEmb(s: org.apache.spark.sql.SparkSession) =
      s.read.parquet(s"$sf001/embeddings.parquet")
  }
}

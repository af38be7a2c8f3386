package graft

import org.apache.spark.sql.SparkSession

class GraftExtensionsSpec extends SparkSpec {

  test("register exposes native expressions to spark.sql") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT round(cosine_similarity(array(1.0F, 0.0F), array(1.0F, 0.0F)), 6) AS c,
        |       dot_product(array(1.0F, 2.0F), array(3.0F, 4.0F)) AS d,
        |       size(minhash(array('a', 'b', 'c'), 16)) AS mh,
        |       simhash(array('x', 'y')) IS NOT NULL AS sh,
        |       size(shingle_hashes('abcdef', 3)) AS sg,
        |       size(ngram_hashes(array('a','b','c'), 2)) AS ng,
        |       sorted_jaccard(array(1L, 2L, 3L), array(2L, 3L, 4L)) AS j,
        |       size(md5_ngram_hashes(array('a','b','c'), 2)) AS mn,
        |       size(md5_ngram_minhash(array('a','b','c'), 2, 8)) AS mm
        |""".stripMargin).collect()(0)
    assert(r.getDouble(0) == 1.0)
    assert(r.getDouble(1) == 11.0)
    assert(r.getInt(2) == 16)
    assert(r.getBoolean(3))
    assert(r.getInt(4) == 4)
    assert(r.getInt(5) == 2)
    assert(r.getDouble(6) == 0.5)
    assert(r.getInt(7) == 2)
    assert(r.getInt(8) == 8)
  }

  test("md5_bucket60 matches the Column rendering and the documented hex arithmetic") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT md5_bucket60(42L) AS sqlb,
        |       CAST(conv(substring(md5(CAST(42L AS STRING)), 1, 15), 16, 10) AS BIGINT) AS manual
        |""".stripMargin).collect()(0)
    assert(r.getLong(0) == r.getLong(1))
    assert(r.getLong(0) >= 0L && r.getLong(0) < (1L << 60))
    import spark.implicits._
    val viaColumn = Seq(42L).toDF("k")
      .select(graft.functions.TextFunctions.md5Bucket60($"k")).as[Long].head()
    assert(r.getLong(0) == viaColumn)
  }

  test("zip_entries works as a SQL generator over binary") {
    GraftExtensions.register(spark)
    val zip = graft.testutil.Fixtures.zip("a/stops.txt" -> "stop_id\nS1\n", "a/x.txt" -> "y")
    import spark.implicits._
    Seq(Tuple1(zip)).toDF("content").createOrReplaceTempView("zips")
    val rows = spark.sql(
      "SELECT z.entry_name FROM zips LATERAL VIEW zip_entries(content) z AS entry_name, content2")
      .collect().map(_.getString(0)).toSet
    assert(rows == Set("a/stops.txt", "a/x.txt"))
  }

  test("withExtensions wires functions at builder time") {
    // cloneSession keeps extensions; building a brand-new session with
    // extensions in the same JVM:
    val s2 = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions).getOrCreate()
    val v = s2.sql("SELECT dot_product(array(2.0F), array(3.0F))").collect()(0).getDouble(0)
    assert(v == 6.0)
  }

  test("normalize_text: SQL equals the Column API rendering") {
    GraftExtensions.register(spark)
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    import graft.functions.TextFunctions
    Seq("  “Smart” — text\twith​noise  ",
      "the cat sat on the mat", "")
      .toDF("t").createOrReplaceTempView("gx_txt")
    val sql = spark.sql("SELECT normalize_text(t) FROM gx_txt")
      .collect().map(_.getString(0))
    val api = spark.table("gx_txt")
      .select(TextFunctions.normalizeText(col("t")))
      .collect().map(_.getString(0))
    assert(sql.toSeq == api.toSeq)
    assert(sql(0) == "\"Smart\" - text withnoise") // ZWSP removed, not spaced
  }

  test("non-literal k is rejected with a clear error") {
    GraftExtensions.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT minhash(array('a'), cast(rand()*4 AS INT))").collect()
    }
    assert(e.getMessage.contains("integer literal"))
  }
}

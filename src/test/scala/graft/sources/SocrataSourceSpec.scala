package graft.sources

import graft.SparkSpec
import graft.sources.socrata.SocrataCollation
import graft.testutil.StubServer
import org.apache.spark.sql.functions._

class SocrataSourceSpec extends SparkSpec {
  import spark.implicits._

  private val rowsJson = Seq(
    """{"city": "Springfield", "pop": 30000, "consent": true}""",
    """{"city": "Shelbyville", "pop": 20000, "consent": false}""")

  private def withStub(body: StubServer => Unit): Unit = {
    val stub = new StubServer
    // naive SoQL: honor "$where=city = 'X'" equality so pushed filters
    // visibly change the result set, plus the aggregate shapes the
    // pushdown tests issue (count(*) [grouped by consent], min/max(pop))
    stub.handle("/resource.json") { (q, _) =>
      val kept = "city = '(\\w+)'".r.findFirstMatchIn(q) match {
        case Some(m) => rowsJson.filter(_.contains(s""""${m.group(1)}""""))
        case None => rowsJson
      }
      def pop(row: String): Long = "\"pop\": (\\d+)".r.findFirstMatchIn(row).get.group(1).toLong
      val countAlias = "count\\(\\*\\) AS (\\w+)".r.findFirstMatchIn(q).map(_.group(1))
      val items: Seq[String] = countAlias match {
        case Some(a) if q.contains("$group=consent") =>
          Seq(true, false).map(c =>
            s"""{"consent": $c, "$a": ${kept.count(_.contains(s""""consent": $c"""))}}""")
        case Some(a) => Seq(s"""{"$a": ${kept.length}}""")
        case None if q.contains("min(pop)") =>
          val aMin = "min\\(pop\\) AS (\\w+)".r.findFirstMatchIn(q).get.group(1)
          val aMax = "max\\(pop\\) AS (\\w+)".r.findFirstMatchIn(q).get.group(1)
          Seq(s"""{"$aMin": ${kept.map(pop).min}, "$aMax": ${kept.map(pop).max}}""")
        case None if q.contains("count_distinct(pop)") =>
          val a = "count_distinct\\(pop\\) AS (\\w+)".r.findFirstMatchIn(q).get.group(1)
          Seq(s"""{"$a": ${kept.map(pop).distinct.length}}""")
        // honor a pushed $order on pop (the TopN tests' shape) — the
        // server-side sort is what the pushdown trusts the server for
        case None if q.contains("$order=pop ASC") => kept.sortBy(pop)
        case None if q.contains("$order=pop DESC") => kept.sortBy(r => -pop(r))
        case None => kept
      }
      // honor $offset/$limit like the real server (the reader pages
      // until an EMPTY page, so an offset-ignoring stub would loop)
      val offset = "\\$offset=(\\d+)".r.findFirstMatchIn(q).map(_.group(1).toInt).getOrElse(0)
      val limit = "\\$limit=(\\d+)".r.findFirstMatchIn(q).map(_.group(1).toInt).getOrElse(Int.MaxValue)
      val page = items.slice(offset, math.min(items.length, offset + limit))
      (200, "application/json", page.mkString("[", ",", "]").getBytes("UTF-8"))
    }
    stub.start()
    try body(stub) finally stub.stop()
  }

  private def decodedReqs(stub: StubServer): Seq[String] =
    stub.received("/resource.json").map(r => java.net.URLDecoder.decode(r.query, "UTF-8"))

  test("schema inference, full scan") {
    withStub { stub =>
      val df = spark.read.format("graft.sources.socrata")
        .option("url", stub.url("/resource.json")).load()
      assert(df.columns.toSet == Set("city", "pop", "consent"))
      assert(df.count() == 2)
    }
  }

  test("equality filter pushes down as SoQL $where and prunes columns as $select") {
    withStub { stub =>
      val df = spark.read.format("graft.sources.socrata")
        .option("url", stub.url("/resource.json")).load()
        .filter($"city" === "Springfield")
        .select($"city", $"pop")
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("SocrataScan"), plan)
      val rows = df.collect()
      assert(rows.length == 1 && rows(0).getString(0) == "Springfield")
      val scans = stub.received("/resource.json").filter(_.query.contains("where"))
      assert(scans.nonEmpty)
      val q = java.net.URLDecoder.decode(scans.last.query, "UTF-8")
      assert(q.contains("city = 'Springfield'"), q)
      assert(q.contains("$select=city,pop"), q)
    }
  }

  test("unsupported predicates stay Spark-side (residual), results still correct") {
    withStub { stub =>
      val df = spark.read.format("graft.sources.socrata")
        .option("url", stub.url("/resource.json")).load()
        .filter($"city".endsWith("ville")) // StringEndsWith: not SoQL-translated
      assert(df.count() == 1) // Shelbyville only, filtered Spark-side
    }
  }

  test("paging terminates on short page") {
    withStub { stub =>
      val df = spark.read.format("graft.sources.socrata")
        .option("url", stub.url("/resource.json"))
        .option("pageSize", "1000").load()
      assert(df.count() == 2)
    }
  }

  test("count(*) pushes down as one SoQL aggregate request, not row paging") {
    withStub { stub =>
      val df = spark.read.format("graft.sources.socrata")
        .option("url", stub.url("/resource.json")).load()
      val counted = df.groupBy().count()
      assert(counted.queryExecution.executedPlan.toString.contains("SocrataAggScan"))
      assert(counted.collect().map(_.getLong(0)).toSeq == Seq(2L))
      val reqs = decodedReqs(stub)
      assert(reqs.exists(_.contains("$select=count(*) AS agg_0")), reqs)
      // no row-paging request happened (those carry the :id total order)
      assert(!reqs.exists(_.contains("$order=:id")), reqs)
    }
  }

  test("grouped count and min/max push down with $group / typed aliases") {
    withStub { stub =>
      val df = spark.read.format("graft.sources.socrata")
        .option("url", stub.url("/resource.json")).load()
      val byConsent = df.groupBy($"consent").count()
        .as[(Boolean, Long)].collect().toMap
      assert(byConsent == Map(true -> 1L, false -> 1L))
      val mm = df.agg(min($"pop"), max($"pop")).as[(Long, Long)].head()
      assert(mm == ((20000L, 30000L)))
      val reqs = decodedReqs(stub)
      assert(reqs.exists(r => r.contains("$select=consent,count(*) AS agg_0")
        && r.contains("$group=consent") && r.contains("$order=consent")), reqs)
      assert(reqs.exists(_.contains("$select=min(pop) AS agg_0,max(pop) AS agg_1")), reqs)
    }
  }

  test("count(DISTINCT) pushes down as SoQL count_distinct; string min/max declines") {
    withStub { stub =>
      val df = spark.read.format("graft.sources.socrata")
        .option("url", stub.url("/resource.json")).load()
      assert(df.agg(count_distinct($"pop")).as[Long].head() == 2L)
      val reqs = decodedReqs(stub)
      // SoQL's documented spelling, not SQL's count(distinct col)
      assert(reqs.exists(_.contains("$select=count_distinct(pop) AS agg_0")), reqs)
      // a STRING min/max must NOT push down (server collation is not
      // attested to match Spark's binary UTF-8 order) — the aggregate
      // runs Spark-side over the row scan instead
      assert(df.agg(min($"city")).as[String].head() == "Shelbyville")
      val after = decodedReqs(stub)
      assert(!after.exists(_.contains("min(city)")), after)
      assert(after.exists(_.contains("$order=:id")), after) // row paging happened
      // string COUNT(DISTINCT) declines too: server text normalization
      // could disagree with Spark's binary equality, and a complete
      // pushdown is never re-checked
      assert(df.agg(count_distinct($"city")).as[Long].head() == 2L)
      assert(!decodedReqs(stub).exists(_.contains("count_distinct(city)")),
        decodedReqs(stub))
    }
  }

  // ---- collation capability probe (VERDICT r15 item 5) ---------------

  // binary-UTF-8 order: Apple < Zürich < apple < Ärger (uppercase <
  // lowercase < multi-byte); a ROOT collator orders apple..Apple..
  // Ärger..Zürich — the sample discriminates the two
  private val collationNames = Seq("Apple", "Zürich", "apple", "Ärger")

  /** `lieMode`: "" = honest; "desc" = ASC probe page binary but the
    * DESC probe page in folded order (a direction-inconsistent
    * server); "topn" = both probe pages honest (attests) but the
    * directed top-N row response arrives SCRAMBLED — the row path
    * must re-sort. */
  private def withCollationStub(binaryServer: Boolean, lieMode: String = "")
      (body: StubServer => Unit): Unit = {
    val stub = new StubServer
    val coll = java.text.Collator.getInstance(java.util.Locale.ROOT)
    def serverSorted: Seq[String] =
      if (binaryServer) collationNames.sorted // BMP-only: UTF-16 == UTF-8 order here
      else collationNames.sortWith((a, b) => coll.compare(a, b) < 0)
    def foldedSorted: Seq[String] =
      collationNames.sortWith((a, b) => coll.compare(a, b) < 0)
    stub.handle("/strings.json") { (q, _) =>
      val minA = "min\\(name\\) AS (\\w+)".r.findFirstMatchIn(q).map(_.group(1))
      val maxA = "max\\(name\\) AS (\\w+)".r.findFirstMatchIn(q).map(_.group(1))
      val items: Seq[String] =
        if (minA.isDefined || maxA.isDefined) {
          val srv = serverSorted
          val fields = minA.map(a => s""""$a": "${srv.head}"""").toSeq ++
            maxA.map(a => s""""$a": "${srv.last}"""")
          Seq(fields.mkString("{", ", ", "}"))
        } else {
          // the probe's legs are "$order=name" and "$order=name DESC";
          // Spark's ascending top-N data request is "$order=name ASC"
          val base =
            if (q.contains("$order=name DESC"))
              (if (lieMode == "desc") foldedSorted.reverse else serverSorted.reverse)
            else if (q.contains("$order=name ASC"))
              (if (lieMode == "topn") serverSorted.reverse else serverSorted)
            else if (q.contains("$order=name")) serverSorted
            else collationNames
          base.map(n => s"""{"name": "$n"}""")
        }
      val offset = "\\$offset=(\\d+)".r.findFirstMatchIn(q).map(_.group(1).toInt).getOrElse(0)
      val limit = "\\$limit=(\\d+)".r.findFirstMatchIn(q).map(_.group(1).toInt).getOrElse(Int.MaxValue)
      val page = items.slice(offset, math.min(items.length, offset + limit))
      (200, "application/json", page.mkString("[", ",", "]").getBytes("UTF-8"))
    }
    stub.start()
    try body(stub) finally stub.stop()
  }

  private def stringReqs(stub: StubServer): Seq[String] =
    stub.received("/strings.json").map(r => java.net.URLDecoder.decode(r.query, "UTF-8"))

  test("collation probe attests a binary-ordering server: string min/max " +
      "and top-N push down, one memoized probe request") {
    SocrataCollation.clearCacheForTests()
    withCollationStub(binaryServer = true) { stub =>
      val df = spark.read.format("graft.sources.socrata")
        .option("url", stub.url("/strings.json"))
        .option("attestCollation", "true").load()
      val mm = df.agg(min($"name"), max($"name")).as[(String, String)].head()
      assert(mm == (("Apple", "Ärger")))
      val reqs = stringReqs(stub)
      // the probe ran ($order with no direction, $select of the bare col)…
      assert(reqs.count(_.contains("$order=name&")) == 1, reqs)
      // …and unlocked the server-side string aggregate
      assert(reqs.exists(r => r.contains("min(name) AS agg_0") &&
        r.contains("max(name) AS agg_1")), reqs)
      // a second string aggregate reuses the memoized verdict: still 1 probe
      assert(df.agg(max($"name")).as[String].head() == "Ärger")
      assert(stringReqs(stub).count(_.contains("$order=name&")) == 1)
      // top-N on an attested NON-NULLABLE string column pushes $order
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("name",
          org.apache.spark.sql.types.StringType, nullable = false)))
      val top = spark.read.format("graft.sources.socrata").schema(schema)
        .option("url", stub.url("/strings.json"))
        .option("attestCollation", "true").load()
        .orderBy($"name").limit(2).as[String].collect().toSeq
      assert(top == Seq("Apple", "Zürich"), top)
      assert(stringReqs(stub).exists(_.contains("$order=name ASC")), stringReqs(stub))
    }
  }

  test("collation probe FAILS on a case/locale-folding server: string " +
      "pushdown stays declined, results correct via the row path") {
    SocrataCollation.clearCacheForTests()
    withCollationStub(binaryServer = false) { stub =>
      val df = spark.read.format("graft.sources.socrata")
        .option("url", stub.url("/strings.json"))
        .option("attestCollation", "true").load()
      // Spark computes the BINARY min/max itself over the row scan
      val mm = df.agg(min($"name"), max($"name")).as[(String, String)].head()
      assert(mm == (("Apple", "Ärger")))
      val reqs = stringReqs(stub)
      assert(reqs.exists(_.contains("$order=name&")), reqs) // probe ran
      assert(!reqs.exists(_.contains("min(name)")), reqs)   // and failed closed
      // top-N declines too: no server $order, Spark sorts the full scan
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("name",
          org.apache.spark.sql.types.StringType, nullable = false)))
      val top = spark.read.format("graft.sources.socrata").schema(schema)
        .option("url", stub.url("/strings.json"))
        .option("attestCollation", "true").load()
        .orderBy($"name").limit(2).as[String].collect().toSeq
      assert(top == Seq("Apple", "Zürich"), top)
      assert(!stringReqs(stub).exists(_.contains("$order=name ASC")), stringReqs(stub))
    }
  }

  test("collation probe FAILS when the server's DESC ordering disagrees " +
      "with its ASC ordering (ADVICE r16: aggregate functions could use " +
      "a different collation than the probed \\$order)") {
    SocrataCollation.clearCacheForTests()
    withCollationStub(binaryServer = true, lieMode = "desc") { stub =>
      val df = spark.read.format("graft.sources.socrata")
        .option("url", stub.url("/strings.json"))
        .option("attestCollation", "true").load()
      // correct via the row path — the direction-inconsistent server
      // failed the DESC leg and string min/max stayed declined
      val mm = df.agg(min($"name"), max($"name")).as[(String, String)].head()
      assert(mm == (("Apple", "Ärger")))
      val reqs = stringReqs(stub)
      assert(reqs.exists(_.contains("$order=name DESC")), reqs) // DESC leg ran
      assert(!reqs.exists(_.contains("min(name)")), reqs)       // and failed closed
    }
  }

  test("a server that LIES after attesting (scrambled top-N row order) " +
      "cannot corrupt results: top-N is partial pushdown, Spark re-sorts " +
      "the returned rows (VERDICT r16 item 8)") {
    SocrataCollation.clearCacheForTests()
    withCollationStub(binaryServer = true, lieMode = "topn") { stub =>
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("name",
          org.apache.spark.sql.types.StringType, nullable = false)))
      val top = spark.read.format("graft.sources.socrata").schema(schema)
        .option("url", stub.url("/strings.json"))
        .option("attestCollation", "true").load()
        .orderBy($"name").limit(2).as[String].collect().toSeq
      // the attestation held (probe pages were honest), the pushdown
      // happened, the server returned the rows REVERSED — and the
      // result is still ascending: row-returning paths never trust
      // the server's ordering of what it returns
      assert(stringReqs(stub).exists(_.contains("$order=name ASC")),
        stringReqs(stub))
      assert(top == top.sorted, top) // binary ascending (BMP: String order)
    }
  }

  test("SocrataCollation.descConsistent bounds and orders the DESC leg") {
    import SocrataCollation.descConsistent
    assert(descConsistent(Seq("A", "B"), Seq("z", "y")))
    assert(!descConsistent(Seq("A", "B"), Seq("y", "z")))   // not non-increasing
    assert(!descConsistent(Seq("A", "z"), Seq("y", "x")))   // max(asc) > max(desc)
    assert(!descConsistent(Seq("B", "C"), Seq("z", "A")))   // min(desc) < min(asc)
    assert(!descConsistent(Seq.empty, Seq("z")))
    assert(!descConsistent(Seq("A"), Seq.empty))
    // single-page resource: desc = reverse(asc) is consistent
    assert(descConsistent(Seq("A", "b", "é"), Seq("é", "b", "A")))
  }

  test("SocrataCollation.attests fails closed on undiscriminating samples") {
    import SocrataCollation.attests
    // too small / ASCII-only sorted / non-discriminating: all decline
    assert(!attests(Seq.empty))
    assert(!attests(Seq("only")))
    assert(!attests(Seq("alpha", "beta", "gamma")))          // ASCII-only
    assert(!attests(Seq("abc", "aéz")))                      // non-ASCII but collator agrees everywhere
    assert(!attests(Seq("apple", "Apple", "Ärger")))         // not binary-sorted
    // the positive case: binary-sorted, case-discriminating, non-ASCII
    assert(attests(Seq("Apple", "Zürich", "apple", "Ärger")))
  }

  test("server capping $limit below pageSize fails loudly instead of skipping rows") {
    val rows3 = Seq(
      """{"city": "A", "pop": 1, "consent": true}""",
      """{"city": "B", "pop": 2, "consent": true}""",
      """{"city": "C", "pop": 3, "consent": true}""")
    val stub = new StubServer
    stub.handle("/capped.json") { (q, _) =>
      val offset = "\\$offset=(\\d+)".r.findFirstMatchIn(q).map(_.group(1).toInt).getOrElse(0)
      // the server ignores the requested $limit and caps every page at
      // 1 row — offset windows still advance by pageSize, so row B
      // (offset 1) would silently vanish without the guard
      val page = rows3.slice(offset, math.min(rows3.length, offset + 1))
      (200, "application/json", page.mkString("[", ",", "]").getBytes("UTF-8"))
    }
    stub.start()
    try {
      val df = spark.read.format("graft.sources.socrata")
        .option("url", stub.url("/capped.json"))
        .option("pageSize", "2").option("numPartitions", "1").load()
      val e = intercept[org.apache.spark.SparkException] { df.collect() }
      assert(e.getMessage.contains("short non-final page")
        || Option(e.getCause).exists(_.getMessage.contains("short non-final page")), e.getMessage)
    } finally stub.stop()
  }

  test("server cap with the skipped tail before an empty next window still fails loudly") {
    // 2-row resource, server caps every page at 1 row, pageSize 100:
    // page 0 returns [A] (short), and the next fixed-stride window at
    // offset 100 is EMPTY — a guard that only checks the next page
    // would silently drop row B. The exhaustion probe at offset 1
    // finds B and fails.
    val rows2 = Seq(
      """{"city": "A", "pop": 1, "consent": true}""",
      """{"city": "B", "pop": 2, "consent": true}""")
    val stub = new StubServer
    stub.handle("/capped2.json") { (q, _) =>
      val offset = "\\$offset=(\\d+)".r.findFirstMatchIn(q).map(_.group(1).toInt).getOrElse(0)
      val page = rows2.slice(offset, math.min(rows2.length, offset + 1))
      (200, "application/json", page.mkString("[", ",", "]").getBytes("UTF-8"))
    }
    stub.start()
    try {
      val df = spark.read.format("graft.sources.socrata")
        .option("url", stub.url("/capped2.json"))
        .option("pageSize", "100").option("numPartitions", "1").load()
      val e = intercept[org.apache.spark.SparkException] { df.collect() }
      assert(e.getMessage.contains("short non-final page")
        || Option(e.getCause).exists(_.getMessage.contains("short non-final page")), e.getMessage)
    } finally stub.stop()
  }

  test("limit pushes $limit: the server truncates, paging stops at n rows") {
    withStub { stub =>
      val df = spark.read.format("graft.sources.socrata")
        .option("url", stub.url("/resource.json")).load()
      assert(df.limit(1).collect().length == 1)
      val reqs = decodedReqs(stub)
      // the limited scan asked for exactly 1 row from page 0…
      assert(reqs.exists(r => r.contains("$limit=1") && r.contains("$offset=0")), reqs)
      // …and never paged past the limit (offset advances by pageSize=1000 default)
      assert(!reqs.exists(_.contains("$offset=1000")), reqs)
    }
  }

  // top-N pushdown requires a sort column DECLARED non-nullable (row
  // selection trusts the server's sort; null placement is unattested)
  private val notNullSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("city",
      org.apache.spark.sql.types.StringType, nullable = true),
    org.apache.spark.sql.types.StructField("pop",
      org.apache.spark.sql.types.LongType, nullable = false),
    org.apache.spark.sql.types.StructField("consent",
      org.apache.spark.sql.types.BooleanType, nullable = true)))

  test("orderBy+limit pushes $order + $limit (top-N): server-side sort decides the row") {
    withStub { stub =>
      val df = spark.read.format("graft.sources.socrata")
        .schema(notNullSchema)
        .option("url", stub.url("/resource.json")).load()
      // ascending: the true min (Shelbyville) is NOT the stub's first
      // row, so the result proves the server-side $order was applied
      val row = df.orderBy($"pop").limit(1).select($"city", $"pop").head()
      assert(row.getString(0) == "Shelbyville" && row.getLong(1) == 20000L)
      val reqs = decodedReqs(stub)
      assert(reqs.exists(r => r.contains("$order=pop ASC,:id") && r.contains("$limit=1")), reqs)
    }
  }

  test("top-N on a NULLABLE sort column declines $order: full scan, Spark sorts") {
    withStub { stub =>
      // inferred schema marks every column nullable — the server's
      // undocumented null placement could discard the wrong rows, so
      // no $order goes out and Spark's own TakeOrdered decides
      val df = spark.read.format("graft.sources.socrata")
        .option("url", stub.url("/resource.json")).load()
      val row = df.orderBy($"pop").limit(1).select($"city", $"pop").head()
      assert(row.getString(0) == "Shelbyville" && row.getLong(1) == 20000L)
      val reqs = decodedReqs(stub)
      assert(!reqs.exists(_.contains("$order=pop")), reqs)
    }
  }

  test("estimateStatistics answers from one count(*) probe with the pushed $where") {
    withStub { stub =>
      import org.apache.spark.sql.types._
      val schema = StructType(Seq(StructField("city", StringType),
        StructField("pop", LongType), StructField("consent", BooleanType)))
      val scan = new graft.sources.socrata.SocrataScan(schema,
        stub.url("/resource.json"), 1000, 2, Array("city = 'Springfield'"))
      val st = scan.estimateStatistics()
      assert(st.numRows.getAsLong == 1L)
      assert(st.sizeInBytes.getAsLong > 0L)
      val reqs = decodedReqs(stub)
      assert(reqs.exists(r => r.contains("$select=count(*) AS cnt")
        && r.contains("$where=city = 'Springfield'")), reqs)
      // stats must never fail planning: a dead endpoint degrades to unknown
      val dead = new graft.sources.socrata.SocrataScan(schema,
        "http://127.0.0.1:1/resource.json", 1000, 2, Array.empty)
      assert(!dead.estimateStatistics().numRows.isPresent)
    }
  }

  test("filtered count keeps the trust-nothing row path (no aggregate pushdown)") {
    withStub { stub =>
      // residual re-filtering needs raw rows, so an aggregate above a
      // filter must NOT collapse into a server-side aggregate
      val df = spark.read.format("graft.sources.socrata")
        .option("url", stub.url("/resource.json")).load()
        .filter($"city" === "Springfield")
      assert(df.count() == 1)
      val reqs = decodedReqs(stub)
      assert(!reqs.exists(_.contains("count(*)")), reqs)
      assert(reqs.exists(_.contains("city = 'Springfield'")), reqs)
    }
  }

  test("DSv2 batch write: every row lands as an upsert CSV POST") {
    withStub { stub =>
      // on the write path Spark hands getTable the DataFrame's own
      // schema (supportsExternalMetadata) — no schema-sampling GET
      // happens; POSTs are the upserts under test
      Seq(("Springfield", 30000L, true), ("Shelbyville", 20000L, false),
          ("Ogdenville, \"North\"", 1L, true))
        .toDF("city", "pop", "consent")
        .repartition(2)
        .write.format("graft.sources.socrata")
        .option("url", stub.url("/resource.json"))
        .option("rowIdentifier", "city") // retry-idempotence attestation
        .mode("append").save()
      val posts = stub.received("/resource.json").filter(_.method == "POST")
      assert(posts.nonEmpty)
      val payloads = posts.map(_.bodyString)
      // each payload is header + rows; all rows land exactly once
      assert(payloads.forall(_.startsWith("city,pop,consent")))
      val lines = payloads.flatMap(_.split("\n").drop(1))
      assert(lines.length == 3, lines)
      assert(lines.contains("Springfield,30000,true"), lines)
      // RFC 4180: embedded comma/quote quoted and doubled
      assert(lines.contains("\"Ogdenville, \"\"North\"\"\",1,true"), lines)
    }
  }

  test("DSv2 write: batchRows bound splits one partition into multiple POSTs") {
    withStub { stub =>
      (1 to 25).map(i => (s"c$i", i.toLong, true)).toDF("city", "pop", "consent")
        .coalesce(1)
        .write.format("graft.sources.socrata")
        .option("url", stub.url("/resource.json"))
        .option("pageSize", "10") // pageSize doubles as rows-per-POST
        .option("rowIdentifier", "city")
        .mode("append").save()
      val posts = stub.received("/resource.json").filter(_.method == "POST")
      assert(posts.length == 3, posts.map(_.bodyString.linesIterator.size))
      assert(posts.map(_.bodyString.split("\n").length - 1).sum == 25)
    }
  }

  test("DSv2 write accepts decimal/date/timestamp (write whitelist, not read's)") {
    withStub { stub =>
      Seq((java.math.BigDecimal.valueOf(125, 2),
          java.sql.Date.valueOf("2024-01-02"),
          java.sql.Timestamp.valueOf("2024-01-02 03:04:00"))) // :00 seconds
        .toDF("price", "d", "ts")
        .withColumn("price", $"price".cast("decimal(18,2)"))
        .coalesce(1)
        .write.format("graft.sources.socrata")
        .option("url", stub.url("/resource.json"))
        .option("rowIdentifier", "d")
        .mode("append").save()
      val posts = stub.received("/resource.json").filter(_.method == "POST")
      val line = posts.head.bodyString.split("\n")(1)
      // timestamp keeps explicit :00 seconds (fixed wire shape)
      assert(line == "1.25,2024-01-02,2024-01-02T03:04:00", line)
    }
  }

  test("DSv2 write without rowIdentifier fails at plan time (retry-duplication guard)") {
    withStub { stub =>
      val err = intercept[Exception] {
        Seq(("a", 1L)).toDF("k", "v")
          .write.format("graft.sources.socrata")
          .option("url", stub.url("/resource.json"))
          .mode("append").save()
      }
      val msg = err.getMessage + Option(err.getCause).map(_.getMessage).getOrElse("")
      assert(msg.contains("rowIdentifier"), err.getMessage)
      // nothing was POSTed — the guard fired before any task ran
      assert(stub.received("/resource.json").forall(_.method != "POST"))
      // a rowIdentifier not among the written columns is equally fatal
      val err2 = intercept[Exception] {
        Seq(("a", 1L)).toDF("k", "v")
          .write.format("graft.sources.socrata")
          .option("url", stub.url("/resource.json"))
          .option("rowIdentifier", "nope")
          .mode("append").save()
      }
      val msg2 = err2.getMessage + Option(err2.getCause).map(_.getMessage).getOrElse("")
      assert(msg2.contains("nope"), err2.getMessage)
      // explicit opt-out restores the old behavior
      Seq(("a", 1L)).toDF("k", "v")
        .write.format("graft.sources.socrata")
        .option("url", stub.url("/resource.json"))
        .option("unsafeNonIdempotentWrites", "true")
        .mode("append").save()
      assert(stub.received("/resource.json").exists(_.method == "POST"))
    }
  }

  test("DSv2 write rejects nested types at plan time") {
    withStub { stub =>
      val err = intercept[Exception] {
        Seq((1L, Seq("a", "b"))).toDF("k", "tags")
          .write.format("graft.sources.socrata")
          .option("url", stub.url("/resource.json"))
          .mode("append").save()
      }
      assert(err.getMessage.contains("tags") ||
        Option(err.getCause).exists(_.getMessage.contains("tags")), err.getMessage)
    }
  }
}

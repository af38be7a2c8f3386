package graft.pipelines

import graft.SparkSpec
import graft.testutil.{Fixtures, StubServer}

/** e2e replay of the reference's three modes against a local stub
  * (SURVEY §5.4) — asserts the upserted CSV, delete payloads, revision
  * protocol calls, and the run-ledger row. */
class PipelinesSpec extends SparkSpec {

  private def newStub(): (StubServer, Endpoints) = {
    val stub = new StubServer
    val base = s"http://127.0.0.1:" // filled after start
    stub.handleJson("/catalog.json")(Fixtures.catalogJson(stub.url("")))
    stub.handleJson("/agencies.json")(Fixtures.agenciesJson(stub.url("")))
    stub.handleBytes("/zips/feedA.zip", "application/zip")(
      Fixtures.zip("feedA/stops.txt" -> Fixtures.messyStops))
    stub.handleBytes("/zips/feedB.zip", "application/zip")(
      Fixtures.zip("feedB/stops.txt" -> Fixtures.minimalStops))
    stub.handleBytes("/zips/placeholder.zip", "application/zip")(
      Fixtures.zip("GTFS_PLACEHOLDER/README.txt" -> "placeholder"))
    stub.handle("/zips/missing.zip")((_, _) => (404, "text/plain", "gone".getBytes))
    stub.handle("/zips/missing2.zip")((_, _) => (404, "text/plain", "gone".getBytes))
    // feedA_GONE: healthy feed, vanished key → must delete.
    // feedA_S3: carried by a REJECTED row this run → must survive.
    // feedD_X1: feedD's zip 404s this run → must survive (a dead feed
    // keeps its standing stops; reference :323 continue + :263 scoping).
    // feedA_X_K1: belongs to DEAD feed 'feedA_X' whose id extends
    // parsed 'feedA' — bare prefix scoping would mass-delete it;
    // longest-match ownership must spare it.
    stub.handleJson("/stops/existing.json")(
      """[{"feed_id_stop_id": "feedA_S1"}, {"feed_id_stop_id": "feedA_GONE"},
        | {"feed_id_stop_id": "feedA_S3"}, {"feed_id_stop_id": "feedD_X1"},
        | {"feed_id_stop_id": "feedA_X_K1"}]""".stripMargin)
    stub.handle("/stops/upsert")((_, _) =>
      (200, "text/plain", "Rows Created: 5\nRows Updated: 2\nRows Deleted: 0".getBytes))
    stub.handle("/log")((_, _) => (200, "application/json", "[]".getBytes))
    stub.handle("/api/revisions")((_, _) => (200, "application/json", """{"rev": 1}""".getBytes))
    stub.handle("/api/sources")((_, _) => (200, "application/json", """{"src": 1}""".getBytes))
    stub.handle("/api/upload")((_, _) => (200, "application/json", "{}".getBytes))
    stub.handle("/api/apply")((_, _) => (200, "application/json", "{}".getBytes))
    stub.start()
    val ep = Endpoints(
      catalogUrl = stub.url("/catalog.json"),
      agencyUrl = stub.url("/agencies.json"),
      stopsQueryUrl = stub.url("/stops/existing.json"),
      stopsUpsertUrl = stub.url("/stops/upsert"),
      logUrl = stub.url("/log"),
      revisionBase = stub.url("/api"),
      placeholderZipUrl = stub.url("/zips/placeholder.zip"))
    (stub, ep)
  }

  test("CatalogPipeline: per-agency revision protocol with placeholder fallback") {
    val (stub, ep) = newStub()
    try {
      val changelog = CatalogPipeline.run(spark, ep, makePublic = false, parallelism = 2)
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getSeq[String](2))).toMap
      // feedA+feedB exist in catalog → updated; feedN is new → created
      assert(changelog("updated")._1 == 2)
      assert(changelog("created")._2 == Seq("feedN"))
      // 3 agencies × 4 protocol steps (POSTs; resume-probe GETs for the
      // two existing datasets ride alongside and find nothing to resume
      // — the stub's {"rev":1} object is not an open-revision array)
      val revPosts = stub.received("/api/revisions").filter(_.method == "POST")
      assert(revPosts.size == 3)
      assert(stub.received("/api/upload").size == 3)
      assert(stub.received("/api/apply").size == 3)
      // update path posts to /revisions/<fourfour>
      assert(revPosts.exists(_.path.endsWith("aaaa-0001")))
      // feedN had no fetch_link → placeholder zip uploaded
      val uploads = stub.received("/api/upload")
      assert(uploads.exists(u => new String(u.body).contains("GTFS_PLACEHOLDER") ||
        u.body.length < 300)) // placeholder is tiny
      // ledger row appended with the per-action summary
      val log = stub.received("/log")
      assert(log.size == 1, log)
      assert(log.head.bodyString.contains("\"run_successful\": true"))
      assert(log.head.bodyString.contains("mode=catalog"))
    } finally stub.stop()
  }

  test("revision protocol resumes an open revision instead of stacking one per failed run") {
    import java.util.concurrent.atomic.{AtomicBoolean, AtomicInteger}
    val stub = new StubServer
    // ONE updated agency (feedA → aaaa-0001) so the stub's revision
    // state is unambiguous
    stub.handleJson("/catalog.json")(Fixtures.catalogJson(stub.url("")))
    stub.handleJson("/agencies.json")(
      s"""[{"agency_name": "Alpha Transit", "feed_id": "feedA", "ntd_id": "001",
         | "fetch_link": "${stub.url("/zips/feedA.zip")}", "have_consent_for_ntm": true,
         | "city": "Springfield", "state": "IL"}]""".stripMargin)
    stub.handleBytes("/zips/feedA.zip", "application/zip")(
      Fixtures.zip("feedA/stops.txt" -> Fixtures.messyStops))
    stub.handle("/log")((_, _) => (200, "application/json", "[]".getBytes))
    val open = new AtomicBoolean(false)
    val created = new AtomicInteger(0)
    val failSource = new AtomicBoolean(true) // 500 exactly once: AFTER revision creation
    stub.handleReq("/api/revisions") { req =>
      if (req.method == "GET") {
        // list-everything REST semantics: closed revisions stay in the
        // listing forever, marked by closed_at/status — the resume
        // probe must NOT mistake them for resumable
        val nClosed = if (open.get) created.get - 1 else created.get
        val closed = (1 to nClosed).map(i =>
          s"""{"rev": $i, "closed_at": "2026-01-01T00:00:00Z", "status": "applied"}""")
        val openRevs = if (open.get) Seq(s"""{"rev": ${created.get}}""") else Nil
        (200, "application/json", (closed ++ openRevs).mkString("[", ",", "]").getBytes)
      } else {
        open.set(true); created.incrementAndGet()
        (200, "application/json", """{"rev": 1}""".getBytes)
      }
    }
    stub.handle("/api/sources")((_, _) =>
      if (failSource.getAndSet(false)) (500, "text/plain", "boom".getBytes)
      else (200, "application/json", """{"src": 1}""".getBytes))
    stub.handle("/api/upload")((_, _) => (200, "application/json", "{}".getBytes))
    stub.handleReq("/api/apply") { _ =>
      open.set(false) // apply closes the open revision
      (200, "application/json", "{}".getBytes)
    }
    stub.start()
    val ep = Endpoints(
      catalogUrl = stub.url("/catalog.json"),
      agencyUrl = stub.url("/agencies.json"),
      stopsQueryUrl = stub.url("/unused"),
      stopsUpsertUrl = stub.url("/unused"),
      logUrl = stub.url("/log"),
      revisionBase = stub.url("/api"),
      placeholderZipUrl = stub.url("/zips/feedA.zip"))
    try {
      // run 1: revision opens, then `create source` 500s → agency errored
      val r1 = CatalogPipeline.run(spark, ep).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(r1 == Map("errored" -> 1L), r1.toString)
      // run 2: the open revision is found and RESUMED — no second create
      val r2 = CatalogPipeline.run(spark, ep).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(r2 == Map("updated" -> 1L), r2.toString)
      // exactly ONE revision created across the failed + retried runs
      assert(created.get == 1, s"revisions created: ${created.get}")
      assert(stub.received("/api/revisions").count(_.method == "POST") == 1)
      // and the resumed run finished the protocol
      assert(stub.received("/api/apply").size == 1)
      // run 3: the listing now holds only the CLOSED revision from run 2
      // (closed_at + status set). Resuming into it would wedge the
      // agency forever — a fresh revision must be created instead.
      val r3 = CatalogPipeline.run(spark, ep).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(r3 == Map("updated" -> 1L), r3.toString)
      assert(created.get == 2, s"closed listing must not be resumed: ${created.get}")
      assert(stub.received("/api/apply").size == 2)
    } finally stub.stop()
  }

  test("CatalogPipeline: failure still appends run_successful=false ledger row") {
    val (stub, ep) = newStub()
    try {
      val broken = ep.copy(catalogUrl = stub.url("/nope/catalog.json"))
      intercept[Exception] { CatalogPipeline.run(spark, broken) }
      val log = stub.received("/log")
      assert(log.size == 1, log)
      assert(log.head.bodyString.contains("\"run_successful\": false"))
    } finally stub.stop()
  }

  test("StopsPipeline: parse, validate, upsert, dead-letter, delete, ledger") {
    val (stub, ep) = newStub()
    try {
      val report = StopsPipeline.run(spark, ep)
      // messyStops: S1,S2,S5 valid; S3 (notanumber), S4 (out of range) invalid
      // minimalStops: M1,M2 valid  → 5 upserts, 2 rejects
      assert(report.upserted == 5, report)
      assert(report.rejected == 2, report)
      // feedD's and feedA_X's zips 404 → two dead feeds
      assert(report.deadFeeds == 2, report)
      // existing has feedA_GONE which no incoming row carries → deleted;
      // feedA_S3 (rejected row still protects its key), feedD_X1
      // (dead feed keeps its standing stops), and feedA_X_K1 (dead
      // feed whose id extends parsed feedA — ownership, not prefix)
      // must NOT be deleted
      assert(report.deleted == 1, report)
      // the upsert CSV really left the building, with header + key column
      val upserts = stub.received("/stops/upsert").filter(_.method == "POST")
      assert(upserts.nonEmpty)
      val csv = upserts.map(_.bodyString).find(_.contains("feed_id_stop_id")).get
      assert(csv.contains("feedA_S1") || csv.contains("feedB_M1"))
      assert(csv.contains("POINT("))
      // delete payload marks the vanished key and ONLY that key
      val dels = upserts.map(_.bodyString).filter(_.contains("deleted"))
      assert(dels.exists(_.contains("feedA_GONE")))
      assert(!dels.exists(_.contains("feedD_X1")), dels)  // dead feed spared
      assert(!dels.exists(_.contains("feedA_S3")), dels)  // rejected row spared
      assert(!dels.exists(_.contains("feedA_X_K1")), dels) // ambiguous-prefix dead feed spared
      // ledger row appended
      val log = stub.received("/log")
      assert(log.size == 1 && log.head.bodyString.contains("\"run_successful\": true"))
      // the side-effecting fetch stage ran EXACTLY once per feed —
      // no re-download from downstream counts (VERDICT r6 finding #1)
      assert(stub.received("/zips/feedA.zip").size == 1)
      assert(stub.received("/zips/feedB.zip").size == 1)
      assert(stub.received("/zips/missing.zip").size == 1)
      assert(stub.received("/zips/missing2.zip").size == 1)
      // per-feed changelog (reference publish_to_catalog.py:356-365)
      val changelog = report.changelog.map(t => t._1 -> ((t._2, t._3))).toMap
      assert(changelog("feedA") == (("parsed", "upserted=3 rejected=2")), report.changelog)
      assert(changelog("feedB") == (("parsed", "upserted=2 rejected=0")), report.changelog)
      assert(changelog("feedD") == (("dead", "http_404")), report.changelog)
    } finally stub.stop()
  }

  test("StopsPipeline: failure mid-run still appends run_successful=false ledger row") {
    val (stub, ep) = newStub()
    try {
      // existing-stops query endpoint vanishes → exception after upsert
      val broken = ep.copy(stopsQueryUrl = stub.url("/stops/nope.json"))
      intercept[Exception] { StopsPipeline.run(spark, broken) }
      val log = stub.received("/log")
      assert(log.size == 1, log)
      assert(log.head.bodyString.contains("\"run_successful\": false"))
    } finally stub.stop()
  }
}

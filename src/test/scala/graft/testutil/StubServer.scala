package graft.testutil

import java.io.ByteArrayOutputStream
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.ConcurrentLinkedQueue
import java.util.zip.{ZipEntry, ZipOutputStream}

import com.sun.net.httpserver.{HttpExchange, HttpServer}

/** Minimal JDK-built-in HTTP stub for pipeline e2e tests (SURVEY §5.4:
  * replay the reference's modes against fixture JSON catalogs and
  * stops.txt archives, without the network). Records every request. */
class StubServer {
  final case class Req(method: String, path: String, query: String, body: Array[Byte]) {
    def bodyString: String = new String(body, StandardCharsets.UTF_8)
  }

  private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
  val requests = new ConcurrentLinkedQueue[Req]()

  def start(): Unit = { server.setExecutor(null); server.start() }
  def stop(): Unit = server.stop(0)
  def port: Int = server.getAddress.getPort
  def url(path: String): String = s"http://127.0.0.1:$port$path"

  def received(pathPrefix: String): Seq[Req] = {
    import scala.jdk.CollectionConverters._
    requests.asScala.filter(_.path.startsWith(pathPrefix)).toSeq
  }

  /** Register a handler; the function gets (query, body) and returns
    * (status, contentType, bytes). */
  def handle(path: String)(fn: (String, Array[Byte]) => (Int, String, Array[Byte])): Unit =
    handleReq(path)(r => fn(java.net.URLDecoder.decode(r.query, "UTF-8"), r.body))

  /** Like [[handle]] but the function sees the full request (method +
    * exact path) — for stateful protocol stubs that dispatch on verb. */
  def handleReq(path: String)(fn: Req => (Int, String, Array[Byte])): Unit =
    server.createContext(path, (ex: HttpExchange) => {
      val body = ex.getRequestBody.readAllBytes()
      val q = Option(ex.getRequestURI.getRawQuery).getOrElse("")
      val req = Req(ex.getRequestMethod, ex.getRequestURI.getPath, q, body)
      requests.add(req)
      val (status, ct, bytes) = fn(req)
      ex.getResponseHeaders.set("Content-Type", ct)
      ex.sendResponseHeaders(status, bytes.length)
      ex.getResponseBody.write(bytes)
      ex.close()
    })

  def handleJson(path: String)(json: => String): Unit =
    handle(path)((_, _) => (200, "application/json", json.getBytes(StandardCharsets.UTF_8)))

  def handleBytes(path: String, ct: String)(bytes: => Array[Byte]): Unit =
    handle(path)((_, _) => (200, ct, bytes))
}

object Fixtures {
  /** Build an in-memory zip from (name, content) members. */
  def zip(members: (String, String)*): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val zos = new ZipOutputStream(bos)
    members.foreach { case (name, content) =>
      zos.putNextEntry(new ZipEntry(name))
      zos.write(content.getBytes(StandardCharsets.UTF_8))
      zos.closeEntry()
    }
    zos.close()
    bos.toByteArray
  }

  /** stops.txt with the reference's edge cases: UTF-8 BOM, quoted
    * cells, stray whitespace, an invalid-coordinate row, a short line
    * (FIXTURES.md §A3). */
  val messyStops: String =
    "﻿stop_id,stop_code,stop_name,stop_lat,stop_lon,zone_id,location_type\n" +
    "S1,C1,\"Main St Station\", 40.75 ,-73.99,Z1,0\n" +
    "S2,C2,'Airport',40.64,-73.78,Z2,1\n" +
    "S3,C3,Bad Coords,notanumber,-73.99,Z3,0\n" +
    "S4,C4,Out Of Range,95.0,-73.99,Z4,0\n" +
    "x\n" +
    "S5,C5,Harbor,40.70,-74.01,Z5,\n"

  /** A feed missing the optional columns (only the required four). */
  val minimalStops: String =
    "stop_id,stop_name,stop_lat,stop_lon\n" +
    "M1,Plaza,41.00,-72.00\n" +
    "M2,Square,41.10,-72.10\n"

  def catalogJson(baseUrl: String): String =
    s"""[
      {"id": "aaaa-0001", "name": "Alpha GTFS dataset",
       "description": "GTFS dataset for Alpha\\nFeed ID: feedA\\nHas GTFS: yes\\nGTFS URL: $baseUrl/zips/feedA.zip\\nAgency URL: http://alpha.example",
       "tags": ["national transit map", "gtfs"]},
      {"id": "bbbb-0002", "name": "Beta GTFS dataset",
       "description": "GTFS dataset for Beta\\nFeed ID: feedB\\nHas GTFS: yes\\nGTFS URL: $baseUrl/zips/feedB.zip\\nAgency URL: http://beta.example",
       "tags": ["national transit map"]},
      {"id": "cccc-0003", "name": "Unrelated dataset",
       "description": "No markers here", "tags": ["other"]},
      {"id": "dddd-0004", "name": "Dead link dataset",
       "description": "GTFS dataset for Dead\\nFeed ID: feedD\\nGTFS URL: $baseUrl/zips/missing.zip\\nAgency URL: http://dead.example",
       "tags": ["national transit map"]},
      {"id": "eeee-0005", "name": "Dead prefix-ambiguous dataset",
       "description": "GTFS dataset for DeadPrefix\\nFeed ID: feedA_X\\nGTFS URL: $baseUrl/zips/missing2.zip\\nAgency URL: http://deadpfx.example",
       "tags": ["national transit map"]}
    ]"""

  def agenciesJson(baseUrl: String): String =
    s"""[
      {"agency_name": "Alpha Transit", "feed_id": "feedA", "ntd_id": "001",
       "fetch_link": "$baseUrl/zips/feedA.zip", "have_consent_for_ntm": true,
       "city": "Springfield", "state": "IL"},
      {"agency_name": "Beta Bus", "feed_id": "feedB", "ntd_id": "002",
       "fetch_link": "$baseUrl/zips/feedB.zip", "have_consent_for_ntm": true,
       "city": "Shelbyville", "state": "IL"},
      {"agency_name": "NewCo Rail", "feed_id": "feedN", "ntd_id": "003",
       "fetch_link": "", "have_consent_for_ntm": true,
       "city": "Ogdenville", "state": "KY"}
    ]"""
}

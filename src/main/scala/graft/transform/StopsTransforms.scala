package graft.transform

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's per-cell / per-row stop-record semantics as pure,
  * composable column transforms (SURVEY §2.2, §2.6; citations into
  * /root/reference/publish_to_catalog.py).
  *
  * All of these are narrow, codegen'd projections/filters — they fuse
  * into the scan stage and cost one pass regardless of corpus size.
  */
object StopsTransforms {

  /** C1 — `clearWhiteSpaces` (publish_to_catalog.py:148-154): strip
    * EDGE double quotes (Python `.strip('"')`, not interior removal),
    * THEN trim whitespace — in that order, so a quote wrapped in
    * whitespace survives, exactly like the reference. */
  def stripQuotesWs(c: Column): Column =
    trim(regexp_replace(c, "^\"+|\"+$", ""))

  /** C1/C2 — `stripNum` (publish_to_catalog.py:175-178): whitespace
    * trim FIRST, then normalize single→double quotes, then strip edge
    * quotes (the reference's exact order — interior quotes are kept,
    * so `12"3` stays uncastable and routes to the reject channel). */
  def stripNumCell(c: Column): Column =
    regexp_replace(translate(trim(c), "'", "\""), "^\"+|\"+$", "")

  /** F3 — `urlIsValidStatic` (publish_to_catalog.py:83-91): static
    * http/ftp(s) URL shape check. Case-insensitive like the
    * reference's re.IGNORECASE, and `?query` is accepted without a
    * path (the reference allows `[/?]\S+`). */
  def urlIsValid(url: Column): Column =
    url.rlike("(?i)^(?:http|ftp)s?://" +
      "(?:[A-Za-z0-9](?:[A-Za-z0-9-]{0,61}[A-Za-z0-9])?\\.)+[A-Za-z]{2,24}" +
      "(?::\\d+)?(?:[/?]\\S*)?$") ||
    url.rlike("(?i)^(?:http|ftp)s?://(?:localhost|\\d{1,3}(?:\\.\\d{1,3}){3})(?::\\d+)?(?:[/?]\\S*)?$")

  /** F4 — coordinate validation (publish_to_catalog.py:181-190):
    * both castable AND lat∈[-90,90], lon∈[-180,180]. `try_cast`
    * carries the fallible-float semantics of the reference's
    * try/except. */
  def coordValid(lat: Column, lon: Column): Column = {
    val dLat = stripNumCell(lat).try_cast("double")
    val dLon = stripNumCell(lon).try_cast("double")
    dLat.isNotNull && dLon.isNotNull &&
      dLat.between(-90d, 90d) && dLon.between(-180d, 180d)
  }

  /** F5 — location_type is ''/'omit'/castable-to-number
    * (publish_to_catalog.py:193-200). */
  def locationTypeValid(lt: Column): Column = {
    val v = stripNumCell(lt)
    v.isNull || v === "" || v === "omit" || v.try_cast("double").isNotNull
  }

  /** C5 — WKT point `POINT(lon lat)` (publish_to_catalog.py:236). */
  def stPoint(lon: Column, lat: Column): Column =
    concat(lit("POINT("), lon, lit(" "), lat, lit(")"))

  /** C6 — GTFS URL embedded between description markers
    * (publish_to_catalog.py:128-134). */
  def extractFetchLink(desc: Column): Column =
    regexp_extract(desc, "GTFS URL: ([^\\n]*)", 1)

  /** C7 — Feed ID embedded in the description
    * (publish_to_catalog.py:137-145, prefix at :36). */
  def extractFeedId(desc: Column): Column =
    regexp_extract(desc, "Feed ID: ([^\\n]*)", 1)

  /** P3 — the 9-column stop output projection
    * (`makeStopLine`, publish_to_catalog.py:207-258): normalized
    * cells, derived merge key, WKT location; plus `valid` and `reason`
    * for the F6 dead-letter split (the reference silently drops or
    * rejects these rows; we keep the reason — SURVEY §7 "bugs we do
    * not replicate").
    *
    * Input schema: raw stops.txt columns (stop_name, stop_lat,
    * stop_lon [, stop_id, stop_code, zone_id, location_type]) plus a
    * `feed_id` column. Missing optional columns are treated as the
    * reference's 'omit' sentinel (publish_to_catalog.py:211-226). */
  def makeStopRows(stops: DataFrame): DataFrame = {
    def optCol(name: String): Column =
      if (stops.columns.contains(name)) coalesce(stripQuotesWs(col(name)), lit("omit"))
      else lit("omit")
    val lat = stripNumCell(col("stop_lat"))
    val lon = stripNumCell(col("stop_lon"))
    val latLonOk = coordValid(col("stop_lat"), col("stop_lon"))
    val ltOk = locationTypeValid(
      if (stops.columns.contains("location_type")) col("location_type") else lit(""))
    stops.select(
      col("feed_id"),
      concat(col("feed_id"), lit("_"), optCol("stop_id")).as("feed_id_stop_id"),
      optCol("stop_code").as("stop_code"),
      stripQuotesWs(col("stop_name")).as("stop_name"),
      optCol("stop_id").as("stop_id"),
      lat.cast("string").as("stop_lat"),
      lon.cast("string").as("stop_lon"),
      optCol("zone_id").as("zone_id"),
      optCol("location_type").as("location_type"),
      stPoint(lon.cast("string"), lat.cast("string")).as("stop_location"),
      (latLonOk && ltOk).as("valid"),
      when(!latLonOk, lit("invalid_coordinates"))
        .when(!ltOk, lit("invalid_location_type")).as("reason"))
  }

  /** F6 — valid/invalid dead-letter split (publish_to_catalog.py:
    * 338-342): one pass, two filtered channels. `feed_id` is a
    * changelog-only column — it never reaches the upsert CSV. */
  def splitValid(rows: DataFrame): (DataFrame, DataFrame) =
    (rows.filter(col("valid")).drop("valid", "reason", "feed_id"),
     rows.filter(!col("valid")).drop("valid", "feed_id"))
}

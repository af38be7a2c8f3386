package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization and domain-level corpus rollup — the
  * reference's own URL axis generalized (publish_to_catalog.py keeps
  * static GTFS URLs per feed and validates them with a full-match
  * regex, StopsTransforms.scala:33): a crawl-fed training corpus
  * carries one URL per document, and the SAME page arrives under
  * tracking-param / case / port / trailing-slash variants. Exact text
  * dedup won't see those; canonicalizing the URL first is the
  * cheapest dedup signal in the whole pipeline (pure per-row string
  * surgery — no shuffle until the rollup aggregates).
  *
  * Canonicalization contract (deterministic, both-engine replayable —
  * every step is regex/list surgery DuckDB expresses too):
  *   1. trim; the `#fragment` is dropped;
  *   2. absolute-URL gate: anything not matching
  *      `scheme://hostport(path?query)` canonicalizes to NULL (the
  *      F3 validation posture: refuse, don't guess);
  *   3. scheme and host lowercase (path/query stay case-sensitive
  *      per RFC 3986), default ports stripped (:80 http, :443
  *      https), a leading `www.` dropped;
  *   4. trailing `/`s stripped from the path (root collapses to the
  *      bare authority);
  *   5. tracking params removed (utm_*, gclid, fbclid, ref, mc_cid,
  *      mc_eid), the survivors SORTED (param order never
  *      distinguishes pages), empty query dropped.
  */
object Urls {

  private val absUrlRe = "^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]+)([^#]*)$"
  private val trackingRe = "^(utm_[^=]*|gclid|fbclid|ref|mc_cid|mc_eid)="

  /** Two-level public suffixes the registrable-domain cut must keep
    * (a minimal fixed list of the common ccTLD second levels; a
    * production build swaps in the full public-suffix list — the
    * OPERATOR shape is the same). */
  private[operators] val twoLevelSuffixes: Seq[String] = Seq(
    "co.uk", "org.uk", "ac.uk", "gov.uk", "co.jp", "co.in", "co.nz",
    "com.au", "org.au", "net.au", "com.br")

  /** The canonical form of an absolute URL per the contract above;
    * NULL for anything that fails the absolute-URL gate. */
  def canonicalizeUrl(url: Column): Column = {
    val u = regexp_replace(trim(url), "#.*$", "")
    val scheme = lower(regexp_extract(u, absUrlRe, 1))
    val hostport = lower(regexp_extract(u, absUrlRe, 2))
    val rest = regexp_extract(u, absUrlRe, 3)
    val host = regexp_replace(
      when(scheme === "http", regexp_replace(hostport, ":80$", ""))
        .when(scheme === "https", regexp_replace(hostport, ":443$", ""))
        .otherwise(hostport),
      "^www\\.", "")
    val path = regexp_replace(regexp_extract(rest, "^([^?]*)", 1), "/+$", "")
    val query = regexp_extract(rest, "\\?(.*)$", 1)
    val params = array_join(
      array_sort(filter(split(query, "&"),
        p => p =!= "" && !p.rlike(trackingRe))), "&")
    when(u.rlike(absUrlRe),
      concat(scheme, lit("://"), host, path,
        when(params === "", lit("")).otherwise(concat(lit("?"), params))))
      .otherwise(lit(null).cast("string"))
  }

  /** Registrable domain (eTLD+1 approximation) of a canonical URL's
    * host: the last two labels, or three when the host ends in a
    * known two-level public suffix. NULL host → NULL. */
  def registrableDomain(canonicalUrl: Column): Column = {
    val host = regexp_extract(canonicalUrl, "^[a-z0-9+.-]+://([^/?]+)", 1)
    val hostNoPort = regexp_replace(host, ":\\d+$", "")
    val labels = split(hostNoPort, "\\.")
    val n = size(labels)
    val last2 = concat_ws(".", element_at(labels, -2), element_at(labels, -1))
    val last3 = concat_ws(".", element_at(labels, -3), element_at(labels, -2),
      element_at(labels, -1))
    val isTwoLevel = twoLevelSuffixes
      .map(s => last2 === s).reduce(_ || _)
    when(canonicalUrl.isNull, lit(null).cast("string"))
      .when(n <= 2, hostNoPort)
      .when(isTwoLevel, last3)
      .otherwise(last2)
  }

  /** Domain-level corpus rollup over a URL column: per registrable
    * domain, the document count, distinct canonical URLs, URL-dup
    * docs (doc count minus distinct canonicals — the documents a
    * canonical-URL dedup would drop before any text ever shuffles),
    * and the corpus share in micro. Invalid URLs roll up under domain
    * NULL so the gate's rejects stay visible instead of vanishing.
    *
    * Scale: one per-row canonicalization projection + one hash
    * aggregation keyed by (domain, canonical) + one by domain — both
    * partial+final; the 1-row total broadcasts. Output ordered by
    * (n_docs DESC, domain). */
  def domainRollup(df: DataFrame, urlCol: String): DataFrame = {
    val canon = df.select(canonicalizeUrl(col(urlCol)).as("__cu"))
      .select(col("__cu"), registrableDomain(col("__cu")).as("domain"))
    val perUrl = canon.groupBy(col("domain"), col("__cu"))
      .agg(count(lit(1)).cast("bigint").as("__n"))
    // count(lit(1)) over the per-URL frame counts GROUPS, so the NULL
    // domain's single NULL-canonical reject bin reads as one "URL" —
    // its url_dup_docs is then reject volume minus one, not a dedup
    // claim (rejects have no canonical identity to dedup on)
    val perDomain = perUrl.groupBy(col("domain"))
      .agg(sum(col("__n")).cast("bigint").as("n_docs"),
        count(lit(1)).cast("bigint").as("n_canonical_urls"))
      .select(col("domain"), col("n_docs"), col("n_canonical_urls"),
        (col("n_docs") - col("n_canonical_urls")).as("url_dup_docs"))
    val total = perDomain.agg(
      coalesce(sum(col("n_docs")), lit(0L)).cast("bigint").as("__tot"))
    perDomain.crossJoin(broadcast(total))
      .filter(col("__tot") > 0)
      .select(col("domain"), col("n_docs"), col("n_canonical_urls"),
        col("url_dup_docs"),
        expr("n_docs * 1000000L div __tot").as("corpus_share_micro"))
      // NULLS LAST explicitly: Spark's ASC default is NULLS FIRST,
      // DuckDB's is NULLS LAST — the reject bin must sort identically
      .orderBy(col("n_docs").desc, col("domain").asc_nulls_last)
  }
}

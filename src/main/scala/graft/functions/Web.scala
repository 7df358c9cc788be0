package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization + registered-domain extraction — the pre-text
  * steps of a web-corpus curation pipeline (C4, Raffel et al. 2020;
  * RefinedWeb, Penedo et al. 2023 both canonicalize and de-duplicate by
  * URL/domain before any text loads). Everything here is a pure Column
  * expression over Spark's codegen'd `parse_url` — no UDFs — so the
  * work rides the scan's project at any corpus size.
  *
  * Reference anchor: the reference engine (cassandra-diff) has no URL
  * operators; this family implements the published curation conventions.
  */
object Web {

  /** Query-parameter names stripped by [[canonicalUrl]]: the common
    * tracking params (any `utm_*`, click ids, newsletter ids). Lowercase;
    * matching is case-insensitive on the param name only.
    */
  val TrackingParams: Seq[String] =
    Seq("gclid", "fbclid", "ref", "mc_cid", "mc_eid")

  /** Two-label public suffixes recognized by [[registeredDomain]] — a
    * deliberately minimal, documented subset of the public-suffix list
    * (the full list is data, not code; production swaps in the complete
    * table as a broadcast join on the suffix key).
    */
  val TwoLabelSuffixes: Seq[String] = Seq("co.uk", "com.au", "co.jp")

  private def part(url: Column, p: String): Column = parse_url(url, lit(p))

  /** Lowercased host of a URL (no port). */
  def hostOf(url: Column): Column = lower(part(url, "HOST"))

  /** The explicit port substring of a URL, or null when none is written
    * (IPv6 literals are out of scope — the corpus convention is named
    * hosts).
    */
  def portOf(url: Column): Column = {
    val auth = part(url, "AUTHORITY")
    when(auth.contains(":"), substring_index(auth, ":", -1))
  }

  /** True for a `name=value` query pair whose name is a tracking param
    * (any `utm_*` plus [[TrackingParams]]), case-insensitive on the name.
    */
  private def isTracking(pair: Column): Column = {
    val name = lower(substring_index(pair, "=", 1))
    name.startsWith("utm_") || name.isin(TrackingParams: _*)
  }

  /** The query string with tracking params removed, original order
    * preserved; null/empty when nothing survives.
    */
  def cleanQuery(url: Column): Column = {
    val q = part(url, "QUERY")
    when(q.isNull, lit(null).cast("string"))
      .otherwise(array_join(filter(split(q, "&"), p => !isTracking(p)), "&"))
  }

  /** Canonical form of a URL: scheme and host lowercased, default port
    * (http:80 / https:443) stripped, explicit non-default port kept,
    * empty path normalized to "/", tracking params removed from the
    * query (order of survivors preserved, "?" dropped when none
    * survive), fragment dropped. Path and query VALUE case are
    * preserved — they are content, not location.
    */
  def canonicalUrl(url: Column): Column = {
    val scheme = lower(part(url, "PROTOCOL"))
    val host = hostOf(url)
    val port = portOf(url)
    val keepPort = port.isNotNull &&
      !((scheme === "https" && port === "443") ||
        (scheme === "http" && port === "80"))
    val path0 = coalesce(part(url, "PATH"), lit(""))
    val path = when(path0 === "", lit("/")).otherwise(path0)
    val q = cleanQuery(url)
    concat(scheme, lit("://"), host,
      when(keepPort, concat(lit(":"), port)).otherwise(lit("")),
      path,
      when(q.isNotNull && q =!= "", concat(lit("?"), q)).otherwise(lit("")))
  }

  /** Registered domain (eTLD+1) of a lowercased host: strip one leading
    * "www.", then the last two labels — or three when the last two form
    * a [[TwoLabelSuffixes]] public suffix (so `a.b.src5.co.uk` →
    * `src5.co.uk` while `a.b.src5.com` → `src5.com`). Hosts of ≤ 2
    * labels pass through whole.
    */
  def registeredDomain(host: Column): Column = {
    val h = regexp_replace(host, "^www\\.", "")
    val labels = split(h, "\\.")
    val n = size(labels)
    val last2 = concat_ws(".", element_at(labels, -2), element_at(labels, -1))
    when(n <= 2, h)
      .when(last2.isin(TwoLabelSuffixes: _*) && n >= 3,
        concat_ws(".", element_at(labels, -3), last2))
      .otherwise(last2)
  }
}

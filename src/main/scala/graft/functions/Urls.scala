package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL parsing and canonicalization — the crawl-frontier hygiene ops a
  * scraping pipeline (the reference ingests job-board pages,
  * `crawler/crawler.py`) needs before URLs can be dedup keys: the same
  * logical page arrives as `HTTPS://Site.COM:443/x?b=2&a=1&utm_source=f`
  * and `https://site.com/x?a=1&b=2`, and a byte-equality frontier would
  * fetch it twice.
  *
  * Everything is native expressions: `parse_url` (Spark's Hive-parity
  * URL extractor) plus regexp/array builtins — per-row, shuffle-free,
  * null-safe (a malformed URL yields null parts, never an error).
  */
object Urls {

  /** Tracking params dropped by [[canonicalize]]: the advertising
    * click-id / campaign params that vary per impression but never
    * change the page. The `(=|$)` alternative also catches the
    * VALUELESS form (`?fbclid`, `&utm_source` with no `=`) that some
    * emitters produce. */
  val TrackingParamPattern = "^(utm_[^=]*|fbclid|gclid|msclkid)(=|$)"

  def protocol(url: Column): Column = lower(try_parse_url(url, lit("PROTOCOL")))
  def host(url: Column): Column = lower(try_parse_url(url, lit("HOST")))
  def path(url: Column): Column = try_parse_url(url, lit("PATH"))
  def query(url: Column): Column = try_parse_url(url, lit("QUERY"))
  def param(url: Column, key: String): Column =
    try_parse_url(url, lit("QUERY"), lit(key))

  /** Explicit port from the authority, or '' when absent. `parse_url`
    * exposes no PORT key, so it is cut from AUTHORITY. */
  def port(url: Column): Column =
    regexp_extract(try_parse_url(url, lit("AUTHORITY")), ":(\\d+)$", 1)

  /** Canonical form: lowercase scheme and host, default port stripped
    * (80/http, 443/https), empty path → '/', fragment dropped, tracking
    * params removed, surviving query params sorted bytewise. Two URLs
    * naming the same resource under these rules collapse to one string;
    * a URL that parses to no host yields null (callers quarantine).
    */
  def canonicalize(url: Column): Column = {
    val proto = protocol(url)
    val h = host(url)
    val p = port(url)
    val keepPort = p =!= "" &&
      !(proto === "http" && p === "80") && !(proto === "https" && p === "443")
    val pa = path(url)
    val q = query(url)
    val kept = filter(split(q, "&"),
      x => !x.rlike(TrackingParamPattern) && x =!= "")
    val sortedQ = array_join(array_sort(kept), "&")
    when(h.isNull || h === "", lit(null).cast("string"))
      .otherwise(concat(
        proto, lit("://"), h,
        when(keepPort, concat(lit(":"), p)).otherwise(lit("")),
        when(pa.isNull || pa === "", lit("/")).otherwise(pa),
        when(sortedQ.isNull || sortedQ === "", lit(""))
          .otherwise(concat(lit("?"), sortedQ))))
  }
}

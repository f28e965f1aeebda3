package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization — the web-corpus dedup key (see
  * q_url_normalize's scaladoc for the policy rationale). Pure column
  * algebra: strip fragment; lowercase scheme and host; strip default
  * ports :80/:443; strip trailing path slashes; sort query params.
  * Row-local (no shuffle, streaming-safe projection); regexes stay in
  * the Java/RE2 common subset shared with the DuckDB oracle.
  */
object UrlCanon {

  /** The deterministic messy-URL fixture generator: 4 crawl-variant
    * shapes over a 13-host × 7-path space keyed by docId div 4 (variants
    * 0/1 of one page canonicalize identically; 2 and 3 differ). */
  def messyFromDocId(docId: Column): Column = {
    val hostN = (docId.cast("long") / 4).cast("long") % 13
    val pathN = (docId.cast("long") / 4).cast("long") % 7
    when(docId % 4 === 0,
        concat(lit("HTTP://Site"), hostN.cast("string"),
          lit(".COM:80/docs/"), pathN.cast("string"), lit("?b=2&a=1#frag")))
      .when(docId % 4 === 1,
        concat(lit("http://site"), hostN.cast("string"),
          lit(".com/docs/"), pathN.cast("string"), lit("?a=1&b=2")))
      .when(docId % 4 === 2,
        concat(lit("HTTPS://Site"), hostN.cast("string"),
          lit(".COM:443/docs/"), pathN.cast("string"), lit("/?a=1&b=2")))
      .otherwise(
        concat(lit("https://site"), hostN.cast("string"),
          lit(".com/docs/"), pathN.cast("string"), lit("/")))
  }

  /** Canonical form of a URL column under the documented policy. */
  def canonical(url: Column): Column = {
    val nf = regexp_replace(url, "#.*$", "")
    val scheme = lower(regexp_extract(nf, "^([A-Za-z]+)://", 1))
    val rest = regexp_replace(nf, "^[A-Za-z]+://", "")
    val hostport = regexp_extract(rest, "^([^/?]+)", 1)
    val host = lower(regexp_replace(hostport, ":(80|443)$", ""))
    val pathq = rest.substr(length(hostport) + 1, lit(1 << 30))
    val path = regexp_replace(
      regexp_extract(pathq, "^([^?]*)", 1), "/+$", "")
    val sq = array_join(array_sort(split(
      regexp_extract(pathq, "[?](.*)$", 1), "&")), "&")
    concat(scheme, lit("://"), host, path,
      when(sq =!= "", concat(lit("?"), sq)).otherwise(lit("")))
  }
}

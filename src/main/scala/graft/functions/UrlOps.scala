package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization + domain extraction — the first step of any
  * web-corpus curation pipeline (dup detection, domain-level quality
  * rollups, blocklists): textually different URLs naming the same
  * resource must collapse BEFORE any URL-keyed dedup or join, or the
  * same page counts many times.
  *
  * Canonical form, applied in order (each rule is a standard RFC 3986
  * §6 normalization; all are pure `regexp_replace`/`lower` column
  * expressions — codegen'd, no UDF, restatable verbatim in the DuckDB
  * oracle):
  *   1. strip the fragment (`#...` never reaches the server),
  *   2. lowercase the scheme and host (case-insensitive by RFC),
  *      leaving path/query case intact (they are case-SENSITIVE),
  *   3. strip the scheme's default port (`:443` for https, `:80`
  *      for http),
  *   4. strip one trailing `/` from a non-root path without query
  *      (`/a/` ≡ `/a`; the root `/` and query URLs stay untouched).
  *
  * Non-URL strings pass through steps that don't match — garbage in,
  * same garbage out, never an error (the corpus-scale posture).
  */
object UrlOps {

  private val SchemeHost = "^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)"

  /** RFC-normalized URL (rules above). */
  def canonicalizeUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    // lowercase ONLY the scheme://host[:port] prefix
    val prefix = regexp_extract(noFrag, SchemeHost, 1)
    val rest = regexp_replace(noFrag, SchemeHost, "")
    val lowered = concat(lower(prefix), rest)
    // no lookahead: the pattern must also run under DuckDB's RE2 for
    // the oracle restatement, so the boundary char is captured back
    val noPort = regexp_replace(
      regexp_replace(lowered, "^(https://[^/?#:]*):443([/?#]|$)", "$1$2"),
      "^(http://[^/?#:]*):80([/?#]|$)", "$1$2")
    // trailing-slash: path ending in '/', no query, not the bare root
    regexp_replace(noPort, "(://[^/?#]*/[^?#]*[^/?#])/$", "$1")
  }

  /** Registrable host for rollups: canonical host minus a leading
    * `www.` (an aggregation convention, not an RFC rule — kept out of
    * [[canonicalizeUrl]] so the canonical URL stays a valid locator).
    */
  def urlDomain(url: Column): Column = {
    val host = regexp_extract(lower(url),
      "^[a-z][a-z0-9+.-]*://([^/?#:]*)", 1)
    when(host === "", lit(null).cast("string"))
      .otherwise(regexp_replace(host, "^www\\.", ""))
  }
}

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
    val prefix = regexp_extract(noFrag, SchemeHost, 1)
    val rest = regexp_replace(noFrag, SchemeHost, "")
    // RFC 3986 §6.2.2.1 makes only the SCHEME and HOST case-insensitive;
    // userinfo ('user:pass@') is case-SENSITIVE and must ride through
    // verbatim. Split the authority at its last '@' (greedy '.*@'):
    // an unencoded '@' is illegal in userinfo, so everything before the
    // last one is userinfo and everything after is host[:port].
    val scheme = regexp_extract(prefix, "^([A-Za-z][A-Za-z0-9+.-]*://)", 1)
    val auth = regexp_replace(prefix, "^[A-Za-z][A-Za-z0-9+.-]*://", "")
    val userinfo = regexp_extract(auth, "^(.*@)", 1)
    val hostport = regexp_replace(auth, "^.*@", "")
    val lowered = concat(lower(scheme), userinfo, lower(hostport), rest)
    // no lookahead: the pattern must also run under DuckDB's RE2 for
    // the oracle restatement, so the boundary char is captured back.
    // '[^/?#]*' (not '[^/?#:]*') before the port: a ':' inside userinfo
    // must not stop the match — leftmost-longest still pins ':443' to
    // the END of the authority, and a ':443' INSIDE userinfo cannot
    // match because the char after it ('@' or more userinfo) is never
    // in '[/?#]|$'.
    val noPort = regexp_replace(
      regexp_replace(lowered, "^(https://[^/?#]*):443([/?#]|$)", "$1$2"),
      "^(http://[^/?#]*):80([/?#]|$)", "$1$2")
    // trailing-slash: path ending in '/', no query, not the bare root
    regexp_replace(noPort, "(://[^/?#]*/[^?#]*[^/?#])/$", "$1")
  }

  /** Registrable host for rollups: canonical host minus a leading
    * `www.` (an aggregation convention, not an RFC rule — kept out of
    * [[canonicalizeUrl]] so the canonical URL stays a valid locator).
    * Userinfo is skipped ('(?:[^/?#]*@)?' eats through the authority's
    * last '@'), so 'user@example.com/x' rolls up under 'example.com',
    * never under the userinfo-polluted string.
    */
  def urlDomain(url: Column): Column = {
    val host = regexp_extract(lower(url),
      "^[a-z][a-z0-9+.-]*://(?:[^/?#]*@)?([^/?#:@]*)", 1)
    when(host === "", lit(null).cast("string"))
      .otherwise(regexp_replace(host, "^www\\.", ""))
  }
}

package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization for crawl dedup — the step that runs BEFORE any
  * content hash in a real pipeline, because the same article is crawled
  * under `HTTP://WWW.Host:80/p?utm_source=feed#frag` and `http://host/p`
  * and exact URL-level dedup sees two keys unless both collapse to one
  * canonical form.
  *
  * Every step is a single string/regex function with an exact DuckDB
  * mirror (the [[graft.queries.DataOps.urlCanonical]] oracle spells the
  * same chain with `\1` instead of `$1` replacement syntax — RE2 and
  * java.util.regex agree on the PATTERNS used here, which avoid
  * lookarounds precisely because RE2 has none). Per-row, zero shuffles,
  * codegen'd built-ins throughout.
  *
  * Canonical form: scheme and host lowercased (path case preserved —
  * paths are case-sensitive), leading `www.` dropped, default ports
  * (`:80` http, `:443` https) dropped, fragment dropped, `utm_*`
  * tracking parameters dropped (with `?`/`&` separators re-joined),
  * trailing `?`/`&` junk and one trailing slash stripped.
  */
object UrlOps {

  /** Lowercase ONLY the scheme://host:port prefix, preserving path case. */
  private def lowerSchemeHost(url: Column): Column =
    concat(lower(regexp_extract(url, "^([a-zA-Z]+://[^/?#]*)", 1)),
      regexp_extract(url, "^[a-zA-Z]+://[^/?#]*(.*)$", 1))

  def canonicalize(url: Column): Column = {
    val hostLower = lowerSchemeHost(url)
    // Anchored to the URL's OWN scheme://host — an unanchored strip would
    // also rewrite absolute URLs carried in query values (`?next=http://
    // www.foo.com`), merging genuinely different redirect targets.
    val noWww = regexp_replace(hostLower, "^([a-z]+)://www\\.", "$1://")
    val noPort = regexp_replace(
      regexp_replace(noWww, "^(http://[^/:?#]*):80([/?#].*)?$", "$1$2"),
      "^(https://[^/:?#]*):443([/?#].*)?$", "$1$2")
    val noFrag = regexp_replace(noPort, "#.*$", "")
    // Two-step utm strip, each anchored on a `?`/`&` SEPARATOR so a
    // parameter merely containing "utm_" in its value (`?a=utm_x&b=2`)
    // is never touched: a RUN of utm params followed by `&` collapses
    // onto its leading separator; a trailing utm param takes its leading
    // separator with it.
    val noUtm = regexp_replace(
      regexp_replace(noFrag, "([?&])(utm_[^&#]*&)+", "$1"),
      "[?&]utm_[^&#]*$", "")
    val canon = regexp_replace(regexp_replace(noUtm, "[?&]$", ""), "/$", "")
    // A schemeless or otherwise malformed URL (relative link, mailto:)
    // would lose its text to the scheme-anchored extracts — pass it
    // through untouched instead; canonicalization is defined only on
    // absolute scheme://host URLs.
    when(url.rlike("^[a-zA-Z]+://"), canon).otherwise(url)
  }

  /** Host of an already-canonical URL (scheme/port/path stripped). */
  def host(canonUrl: Column): Column =
    regexp_extract(canonUrl, "^[a-z]+://([^/:?#]+)", 1)
}

package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization — the first dedup every web-crawl pipeline
  * runs (two crawls of `HTTP://Example.COM:80/a/?utm_source=x&b=1#f`
  * and `http://example.com/a?b=1` are the same document): lowercase
  * the scheme and host, strip the scheme's default port, drop the
  * fragment, drop `utm_*` tracking params, sort the surviving query
  * params, and strip trailing path slashes.
  *
  * Built entirely from codegen'd string/array built-ins
  * (regexp_extract / filter / array_sort / concat_ws) — a per-row
  * projection, no shuffle, no UDF — and every step replays in DuckDB
  * (regexp_extract + list_sort/list_filter), so canonical-key dedup
  * hash-gates cross-engine. Param sort is binary-lexicographic on
  * both engines (ASCII query strings by construction here).
  *
  * Scale: canonicalization is free (projection); the dedup itself is
  * one hash aggregation on the canonical key — the q_dedup_exact
  * shape, map-side combine collapsing per-task duplicates first.
  */
object UrlCanonicalize {
  private val partsRe = "^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)"

  /** The canonical form of `url` (absolute http(s)-style URLs). */
  def canonicalUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    val scheme = lower(regexp_extract(noFrag, partsRe, 1))
    val host0 = lower(regexp_extract(noFrag, partsRe, 2))
    // default ports: https:443, http:80
    val host = when(scheme === "https",
        regexp_replace(host0, ":443$", ""))
      .when(scheme === "http", regexp_replace(host0, ":80$", ""))
      .otherwise(host0)
    val path = regexp_replace(
      regexp_extract(noFrag, partsRe, 3), "/+$", "")
    val query0 = when(noFrag.contains("?"),
      regexp_replace(noFrag, "^[^?]*\\?", "")).otherwise(lit(""))
    val params = array_sort(filter(split(query0, "&"),
      p => !p.startsWith("utm_") && (p =!= "")))
    val query = concat_ws("&", params)
    // Guard: an input that doesn't match the scheme://host shape
    // (relative URL, missing "://", garbage) extracts "" for scheme
    // AND host, so every malformed URL would canonicalize to the
    // same "://..." key — silently merging unrelated documents in a
    // canonical-key dedup. Pass unparseable inputs through unchanged
    // instead: they dedup only against byte-identical copies of
    // themselves, which is the safe (exact-dedup) behavior.
    when(scheme === "", url).otherwise(
      concat(scheme, lit("://"), host, path,
        when(query === "", lit("")).otherwise(concat(lit("?"), query))))
  }
}

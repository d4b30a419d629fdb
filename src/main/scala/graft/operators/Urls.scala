package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization — the crawl-pipeline normalizer that runs BEFORE
  * any url-keyed dedup (reference behavior: the engine keys documents by
  * source URL; crawls see the same page as `HTTP://WWW.Site.com/a/?utm_
  * source=feed#top` and `http://site.com/a`): lowercase scheme + host,
  * strip a leading `www.`, drop default ports, drop the fragment, strip
  * trailing slashes, remove tracking parameters (utm_*, fbclid, gclid,
  * ref) and emit the survivors in sorted order so parameter permutations
  * collide.
  *
  * Scale shape: a pure projection — regex/array expressions only, no
  * shuffle, no UDF (whole-stage codegen keeps the per-row cost in the
  * scan), and every step is a deterministic string op replayable in any
  * engine (RE2-safe patterns, binary string sort). */
object Urls {

  private val trackingRe = "^(utm_[^=]*|fbclid|gclid|ref)="

  /** Adds `canonical_url`, `host` (canonical), `had_tracking`,
    * `had_fragment` to `df`. Unparseable rows (no scheme://host) yield
    * null canonical columns and ride along. */
  def canonicalize(df: DataFrame, urlCol: String): DataFrame = {
    val u = col(urlCol)
    val noFrag = regexp_replace(u, "#.*$", "")
    val scheme = lower(regexp_extract(noFrag, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val hostRaw = lower(regexp_extract(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?]+)", 1))
    val host = regexp_replace(regexp_replace(hostRaw, ":(80|443)$", ""), "^www\\.", "")
    val path = regexp_extract(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?]*([^?]*)", 1)
    val pathNorm = regexp_replace(path, "/+$", "")
    val qs = regexp_extract(noFrag, "\\?(.*)$", 1)
    val rawParams = split(qs, "&")
    val kept = array_sort(filter(rawParams,
      p => p =!= "" && !p.rlike(trackingRe)))
    val canon = concat(scheme, lit("://"), host, pathNorm,
      when(size(kept) > 0, concat(lit("?"), array_join(kept, "&")))
        .otherwise(lit("")))
    val parseable = scheme =!= "" && host =!= ""
    df.withColumn("host", when(parseable, host))
      .withColumn("canonical_url", when(parseable, canon))
      .withColumn("had_tracking",
        when(parseable, size(filter(rawParams, p => p.rlike(trackingRe))) > 0))
      .withColumn("had_fragment", when(parseable, u.rlike("#")))
  }
}

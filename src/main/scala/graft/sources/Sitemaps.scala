package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** sitemaps.org XML parsing — the discovery side of the crawl frontier
  * (robots.txt's `Sitemap:` lines point here; `Robots.parse` already
  * skips them as non-group noise).
  *
  * A sitemap is one small-ish XML document per domain listing `<url>`
  * entries (`<loc>`, optional `<lastmod>`, `<changefreq>`, `<priority>`).
  * Parsing is a pure narrow map: one `regexp_extract_all` splits the
  * entry blocks, per-field `regexp_extract`s pull the leaves — all
  * codegen'd column functions (RE2-compatible patterns, lazy quantifiers
  * only), no UDF, no shuffle. At crawl scale the sitemap table is tiny
  * next to the page table but the SAME code path parses sitemap-index
  * fan-out files, so the operator must stay distributed: one input row →
  * up to 50k entry rows (the sitemaps.org cap) via explode.
  *
  * Reference analog: the delimited/DBF attribute scans (a typed scan
  * producing columns from an opaque per-feature container); here the
  * container is the domain's sitemap payload.
  */
object Sitemaps {

  /** Entry blocks of a sitemap: the inner payload of every
    * `<url>…</url>` element, in document order. */
  def entryBlocks(xml: Column): Column =
    regexp_extract_all(xml, lit("(?s)<url>(.*?)</url>"), lit(1))

  private def leaf(block: Column, tag: String): Column =
    regexp_extract(block, s"<$tag>([^<]*)</$tag>", 1)

  /** Explode a `(…, xmlCol)` frame into one row per sitemap entry:
    * (input cols…, loc, lastmod_day, priority). `lastmod_day` is the
    * W3C date parsed to days-since-epoch (exact integer; -1 when the
    * optional tag is absent), `priority` the raw decimal string (""
    * when absent — kept textual so no float parse can smear exactness).
    */
  def entries(df: DataFrame, xmlCol: String): DataFrame =
    df.select(df.columns.filter(_ != xmlCol).map(col) :+
        explode(entryBlocks(col(xmlCol))).as("__b"): _*)
      .select(df.columns.filter(_ != xmlCol).map(col) :+
        leaf(col("__b"), "loc").as("loc") :+
        coalesce(
          datediff(try_to_date(leaf(col("__b"), "lastmod"), "yyyy-MM-dd"),
            to_date(lit("1970-01-01"))).cast("long"),
          lit(-1L)).as("lastmod_day") :+
        leaf(col("__b"), "priority").as("priority"): _*)

  /** Sitemap-index fan-out: the `<loc>`s of every `<sitemap>` entry of a
    * sitemap-index document — the recursion step a crawler follows
    * before fetching leaf sitemaps. */
  def indexLocs(df: DataFrame, xmlCol: String): DataFrame =
    df.select(df.columns.filter(_ != xmlCol).map(col) :+
        explode(regexp_extract_all(col(xmlCol),
          lit("(?s)<sitemap>(.*?)</sitemap>"), lit(1))).as("__b"): _*)
      .select(df.columns.filter(_ != xmlCol).map(col) :+
        leaf(col("__b"), "loc").as("loc"): _*)
}

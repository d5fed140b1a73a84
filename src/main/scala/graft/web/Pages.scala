package graft.web

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.core._
import graft.functions.GeoExprs

/** A Common-Crawl-style web page row (BASELINE.json input_hint schema). */
final case class Page(url: String, warc_ts: java.sql.Timestamp,
                      html: Array[Byte], text: String, lang: String)

/**
 * Synthetic web-page corpus + deterministic geotagger.
 *
 * The north rule's input is an Iceberg table of pages
 * (url, warc_ts, html, text, lang) at 10^12 scale; here we synthesize a
 * deterministic, seed-fixed slice with `spark.range` (so generation is
 * distributed and reproducible at any scale factor), geotag each page from
 * its url/text, and emit Dataset[TileAssignment]. The per-row invariant —
 * byte-identical `text` per url — is asserted by PagesSpec after the full
 * pipeline.
 */
object Pages {

  private val Langs = Array("en", "de", "fr", "es", "it")
  private val Words = Array(
    "the", "quick", "brown", "fox", "jumps", "over", "lazy", "dog", "data",
    "spark", "tile", "grid", "join", "page", "crawl", "web", "index", "query",
    "der", "die", "und", "le", "la", "les", "el", "los", "il", "che")

  /** Deterministic text for a page id: same id → same bytes, always. */
  def textFor(id: Long): String = {
    val sb = new StringBuilder(256)
    var h = mix(id)
    val n = 40 + (Math.floorMod(h, 160L)).toInt
    var i = 0
    while (i < n) {
      h = mix(h + i)
      sb.append(Words(Math.floorMod(h, Words.length.toLong).toInt))
      sb.append(if (i % 13 == 12) ". " else " ")
      i += 1
    }
    sb.toString.trim
  }

  @inline private def mix(v: Long): Long = {
    var h = v * 0x9e3779b97f4a7c15L
    h ^= (h >>> 33); h *= 0xff51afd7ed558ccdL; h ^= (h >>> 33)
    h
  }

  /** Deterministic url for a page id — the single definition `synthesize`
    * and the codegen [[graft.functions.PageUrl]] expression both call, so
    * the two synthesis paths are byte-identical by construction
    * (PagesSpec asserts it). */
  def urlFor(id: Long): String =
    s"https://site-${Math.floorMod(mix(id), 10000L)}.example/page/${id}"

  // UTF8String entry points for the codegen expressions (PageUrl/PageText):
  // consumers that only need url/text columns skip the typed-map encoder
  // and the html/timestamp/lang synthesis entirely
  def urlUtf8(id: Long): org.apache.spark.unsafe.types.UTF8String =
    org.apache.spark.unsafe.types.UTF8String.fromString(urlFor(id))
  def textUtf8(id: Long): org.apache.spark.unsafe.types.UTF8String =
    org.apache.spark.unsafe.types.UTF8String.fromString(textFor(id))

  /** Generate `n` synthetic pages, distributed via spark.range. */
  def synthesize(spark: SparkSession, n: Long): Dataset[Page] = {
    import spark.implicits._
    spark.range(n).map { id =>
      val url = urlFor(id)
      val text = textFor(id)
      val lang = Langs(Math.floorMod(mix(id + 7), Langs.length.toLong).toInt)
      val html = s"<html><body>$text</body></html>".getBytes("UTF-8")
      val ts = new java.sql.Timestamp(1600000000000L + Math.floorMod(mix(id + 3), 100000000L))
      Page(url, ts, html, text, lang)
    }
  }

  /** Column-only synthesis of the (url, text) slice: same bytes as
    * `synthesize` (shared kernels), but as codegen expressions over
    * spark.range — no Page object, no encoder ser/de, and no html/ts/lang
    * work for consumers (geotagging, doc-id derivation) that never read
    * them. Guide §2.3: don't compute what you throw away. */
  def synthesizeUrlText(spark: SparkSession, n: Long): DataFrame =
    spark.range(n).select(
      GeoExprs.pageUrl(col("id")).as("url"),
      GeoExprs.pageText(col("id")).as("text"))

  /** Deterministic geotag from url+text: FNV64 of the url picks the
    * longitude band, a text fingerprint the latitude — stable per url.
    * Pure column expressions over the codegen [[graft.functions.Fnv64]]
    * (pmod ≡ Math.floorMod for a positive modulus; substring counts
    * characters like String.take on this ASCII corpus) — no ScalaUDF in the
    * headline tile-assign path. */
  def geotag(pages: DataFrame): DataFrame = {
    val lon = pmod(GeoExprs.fnv64(col("url")), lit(3600000L)) / 10000.0 - 180.0
    val lat = pmod(GeoExprs.fnv64(
      concat(col("url"), lit("|"), substring(col("text"), 1, 64))),
      lit(1700000L)) / 10000.0 - 85.0
    pages.withColumn("x", lon).withColumn("y", lat)
  }

  /** World grid used for web-scale tiling (fixed bounds → no dataspace scan
    * needed at 10^12 rows; EPS-padded like the reference). */
  val WorldGrid: GridConfig = GridConfig.fromDataBounds(-180.0, -90.0, 180.0, 90.0)

  /** Full pipeline: pages → geotag → Dataset[TileAssignment] on the world
    * grid with H3-style hex cells. */
  def tileAssignments(spark: SparkSession, pages: DataFrame, hexRes: Int = 7): Dataset[graft.TileAssignment] = {
    val tagged = geotag(pages).withColumn("id", GeoExprs.fnv64(col("url")))
    graft.GeoEngine.tileAssignments(tagged, WorldGrid, hexRes)
  }
}

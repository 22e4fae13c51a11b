package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import graft.core.{Gazetteer, Rng, TextExtract}

/** One Common-Crawl-style page row (BASELINE.json input_hint schema). */
final case class Page(
    url: String,
    warc_ts: java.sql.Timestamp,
    html: Array[Byte],
    text: String,
    lang: String)

/** Deterministic synthetic page-table generator — the target's analog of
  * the reference's synthetic night (reference: scripts/synth_night.py:50-113:
  * seeded generator, flat background + *injected known signal*, minimal
  * headers). Pages carry injected geo "signals" (city mentions and
  * coordinate pairs clustered around gazetteer cities → realistic urban
  * tile skew) on top of seeded filler text; some pages are exact or near
  * duplicates to exercise dedup operators.
  *
  * Every page is a pure function of (seed, id) via counter-based RNG
  * (SURVEY.md §7.5.2), so the table is byte-identical at any parallelism
  * and any partitioning — the precondition for scaling evidence and
  * resume parity.
  */
object SynthPages {
  val DefaultSeed = 42L

  private val wordsEn = Array("the", "quick", "crawl", "page", "offers", "insight",
    "about", "travel", "guides", "with", "local", "maps", "and", "reviews", "from",
    "visitors", "who", "share", "their", "routes", "city", "district", "museum",
    "park", "station", "market", "harbor", "street", "food", "history")
  private val wordsDe = Array("die", "stadt", "bietet", "eine", "karte", "mit",
    "vielen", "orten", "und", "wegen", "besucher", "teilen", "ihre", "routen",
    "durch", "das", "viertel", "museum", "bahnhof", "markt", "hafen", "strasse",
    "essen", "geschichte", "reise", "blick", "platz", "garten", "ufer", "altstadt")
  private val wordsFr = Array("la", "ville", "offre", "une", "carte", "avec",
    "des", "lieux", "et", "chemins", "les", "visiteurs", "partagent", "leurs",
    "routes", "dans", "le", "quartier", "musee", "gare", "marche", "port",
    "rue", "cuisine", "histoire", "voyage", "vue", "place", "jardin", "rive")
  private val wordsEs = Array("la", "ciudad", "ofrece", "un", "mapa", "con",
    "muchos", "lugares", "y", "caminos", "los", "visitantes", "comparten", "sus",
    "rutas", "por", "el", "barrio", "museo", "estacion", "mercado", "puerto",
    "calle", "comida", "historia", "viaje", "vista", "plaza", "jardin", "orilla")
  private val langs = Array("en", "de", "fr", "es")
  private val wordsByLang = Map("en" -> wordsEn, "de" -> wordsDe, "fr" -> wordsFr, "es" -> wordsEs)

  /** Page count scaled like the driver's TPC-H tables: sf × 200k pages. */
  def countForSfDir(sfDir: String): Long = {
    val sf = raw"sf([\d.]+)".r.findFirstMatchIn(sfDir).map(_.group(1).toDouble).getOrElse(0.01)
    math.max(200L, (sf * 200000).toLong)
  }

  def pages(spark: SparkSession, n: Long, seed: Long = DefaultSeed): Dataset[Page] = {
    import spark.implicits._
    // ~64 MB of page data per million rows → size input partitions so each
    // task holds a bounded slice regardless of total n (100 TB-safe: the
    // generator is embarrassingly parallel and partition count grows with n).
    val parts = math.max(spark.sparkContext.defaultParallelism,
      math.min(20000L, n / 50000L).toInt)
    spark.range(0, n, 1, parts).map(id => genPage(seed, id))
  }

  def pagesDF(spark: SparkSession, n: Long, seed: Long = DefaultSeed): DataFrame =
    pages(spark, n, seed).toDF()

  /** Content identity: duplicate pages share a content key (exact dups) or
    * derive from one (near dups). Pure in (seed, id).
    */
  private def contentKey(seed: Long, id: Long): (Long, Int) = {
    // returns (baseId, dupKind) — dupKind: 0 original, 1 exact dup, 2 near dup
    if (id < 64) (id, 0)
    else {
      val u = Rng.uniform(seed, id, 1001L)
      if (u < 0.04) (id - 1 - (Rng.mix(seed, id, 1002L) >>> 1) % 50, 1)
      else if (u < 0.12) (id - 1 - (Rng.mix(seed, id, 1003L) >>> 1) % 50, 2)
      else (id, 0)
    }
  }

  private def langOf(seed: Long, baseId: Long): String = {
    val u = Rng.uniform(seed, baseId, 2001L)
    if (u < 0.55) "en" else if (u < 0.70) "de" else if (u < 0.85) "fr" else "es"
  }

  /** Filler body words for a content id. */
  private def bodyWords(seed: Long, baseId: Long, lang: String): Array[String] = {
    val words = wordsByLang(lang)
    val n = 30 + Rng.nextInt(seed, baseId, 2002L, 90)
    Array.tabulate(n)(k => words(Rng.nextInt(seed, baseId, 3000L + k, words.length)))
  }

  /** Geo mentions for a content id: snippets injected into the body. */
  private def geoSnippets(seed: Long, baseId: Long): Array[String] = {
    val k = Rng.nextInt(seed, baseId, 4001L, 4) // 0..3 mentions
    Array.tabulate(k) { m =>
      val cityIdx = {
        // Zipf-ish skew: square the uniform to concentrate on low indices →
        // hot cities → hot tiles (the skew the tiler must handle).
        val u = Rng.uniform(seed, baseId, 4100L + m)
        (u * u * Gazetteer.entries.length).toInt.min(Gazetteer.entries.length - 1)
      }
      val (name, clat, clon) = Gazetteer.entries(cityIdx)
      // Locale.ROOT: generated coordinate text must be byte-identical on
      // any JVM (a comma-decimal default locale would break the geoparse
      // regexes and the determinism claim)
      def fmt(pat: String, a: Double, b: Double): String =
        String.format(java.util.Locale.ROOT, pat,
          a.asInstanceOf[AnyRef], b.asInstanceOf[AnyRef])
      Rng.nextInt(seed, baseId, 4200L + m, 3) match {
        case 0 => s"visit ${name} today"
        case 1 =>
          val lat = clat + (Rng.uniform(seed, baseId, 4300L + m) - 0.5) * 4.0
          val lon = clon + (Rng.uniform(seed, baseId, 4400L + m) - 0.5) * 4.0
          fmt("location (%.6f, %.6f) nearby", lat, lon)
        case _ =>
          val lat = clat + (Rng.uniform(seed, baseId, 4500L + m) - 0.5) * 4.0
          val lon = clon + (Rng.uniform(seed, baseId, 4600L + m) - 0.5) * 4.0
          fmt("pin geo:%.5f,%.5f here", lat, lon)
      }
    }
  }

  def genPage(seed: Long, id: Long): Page = {
    val (baseId, dupKind) = contentKey(seed, id)
    val lang = langOf(seed, baseId)
    var body = bodyWords(seed, baseId, lang)
    if (dupKind == 2) {
      // near dup: mutate up to 3 words with the *page's own* rng
      val words = wordsByLang(lang)
      val nMut = 1 + Rng.nextInt(seed, id, 5001L, 3)
      var m = 0
      while (m < nMut && body.length > 0) {
        val pos = Rng.nextInt(seed, id, 5100L + m, body.length)
        body = body.updated(pos, words(Rng.nextInt(seed, id, 5200L + m, words.length)))
        m += 1
      }
    }
    val snippets = geoSnippets(seed, baseId)
    // interleave snippets into the body at deterministic positions
    val withGeo = {
      val sb = new StringBuilder
      val step = math.max(1, body.length / (snippets.length + 1))
      var si = 0
      body.zipWithIndex.foreach { case (w, i) =>
        if (si < snippets.length && i > 0 && i % step == 0) {
          sb.append(snippets(si)).append(". "); si += 1
        }
        sb.append(w).append(' ')
      }
      while (si < snippets.length) { sb.append(snippets(si)).append(". "); si += 1 }
      sb.toString.trim
    }
    // title keyed by CONTENT id, not page id — exact dups must be
    // byte-identical in text (only url/warc_ts differ)
    val title = s"page $baseId ${body.take(3).mkString(" ")}"
    val html =
      s"""<!DOCTYPE html><html><head><title>$title</title>
         |<style>body { color: #222; }</style>
         |<script>var tracker = ${Rng.mix(seed, id, 6001L) & 0xffffL};</script>
         |</head><body>
         |<!-- crawl id $id -->
         |<h1>$title</h1>
         |<div class="nav"><ul><li>home</li><li>about</li></ul></div>
         |<p>$withGeo</p>
         |<p>footer &amp; contact</p>
         |</body></html>""".stripMargin
    val htmlBytes = html.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val text = TextExtract.extract(htmlBytes)
    val ts = new java.sql.Timestamp(
      1704067200000L + (Rng.mix(seed, id, 7001L) >>> 1) % (365L * 24 * 3600 * 1000))
    Page(f"https://example.org/crawl/$id%012d", ts, htmlBytes, text, lang)
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The end-to-end curation pass (Curate.run / Main --curate): dedup +
  * quality gates compose, commits are deterministic, and batch-resume
  * never re-curates a committed document.
  */
class CurateSpec extends AnyFunSuite {
  import SharedSpark._
  import graft.operators.Curate
  import graft.plans.{Lineage, QaReport}

  private def pages(n: Long) = graft.sources.SynthPages.pagesDF(spark, n)

  test("curate drops exact dups and gopher rejects; output is deterministic") {
    val p = pages(400)
    val out = Curate.curate(p).cache()
    val n = out.count()
    assert(n > 0)
    // exact dups collapse: fewer curated docs than distinct input pages
    assert(n < 400)
    // fp is the identity: one row per content fingerprint
    assert(out.select("tile_id").distinct().count() === n)
    // all survivors pass the word gate by construction
    assert(out.filter(col("n_words") < 20).count() === 0)
    // deterministic: a second evaluation yields the identical curated set
    val again = Curate.curate(p)
    assert(out.select("tile_id", "url", "text_curated").exceptAll(
      again.select("tile_id", "url", "text_curated")).count() === 0)
    assert(again.select("tile_id").count() === n)
    out.unpersist()
  }

  test("fuzzy stage: near-duplicates collapse to the longest member") {
    import spark.implicits._
    val long = "the alpha and beta of the gamma delta epsilon zeta eta " +
      "theta iota kappa lambda mu nu xi omicron pi rho sigma tau upsilon " +
      "phi chi psi omega in the one two three four five six seven eight"
    val docs = Seq(
      ("a1", long + " and one more clause to be the longest"),
      ("a2", long),
      ("b1", "completely unrelated text with plenty of distinct words " +
        "covering other topics entirely for this corpus test today"))
      .toDF("url", "text")
    // spanMaxFrac = 1.0 disables the span gate so this test isolates the
    // fuzzy stage (a2 is fully contained in a1, so the span gate alone
    // would already drop it)
    val without = Curate.curate(docs, minWords = 3, spanMaxFrac = 1.0)
      .select("url").collect().map(_.getString(0)).sorted.toSeq
    val withNd = Curate.curate(docs, minWords = 3, spanMaxFrac = 1.0,
      nearDupJaccard = Some(0.6))
    val kept = withNd.select("url").collect().map(_.getString(0)).sorted.toSeq
    // exact-only keeps both near-dup variants; fuzzy keeps one
    assert(without.toSet.contains("a1") && without.toSet.contains("a2"))
    assert(kept.contains("b1"))
    assert(kept.count(u => u == "a1" || u == "a2") === 1)
    // the keeper is the LONGEST member
    assert(kept.contains("a1") && !kept.contains("a2"))
  }

  test("site-boiler stage strips host-scoped template lines everywhere, other hosts untouched") {
    import spark.implicits._
    // 4 raw pages on host a share nav + footer chrome LINES around a
    // unique body line; 1 page on host b carries the same chrome but is
    // alone on its host. Body words (incl. each doc's 2 stopwords) are
    // unique per doc. The stage runs BEFORE normalizeText flattens line
    // structure, so line units separate chrome from vocabulary.
    def page(body: String) = s"cookie banner accept\n$body\nfooter contact links"
    val docs = Seq(
      ("http://a.com/1", page("the alpha and bravo charlie delta echo foxtrot")),
      ("http://a.com/2", page("of golf to hotel india juliet kilo lima")),
      ("http://a.com/3", page("in mike is november oscar papa quebec romeo")),
      ("http://a.com/4", page("on sierra for tango uniform victor whiskey xray")),
      ("http://b.com/1", page("with yankee as zulu maple willow cedar spruce")))
      .toDF("url", "text")
    val base = Curate.curate(docs, minWords = 3, spanMaxFrac = 1.0)
      .select("url", "text_curated").as[(String, String)].collect().toMap
    // without the stage every doc keeps its chrome (normalized to one
    // line, all docs distinct, so nothing else strips it)
    assert(base.size === 5 && base.values.forall(_.contains("cookie banner accept")))
    val deb = Curate.curate(docs, minWords = 3, spanMaxFrac = 1.0,
        siteBoilerMinDocs = Some(3))
      .select("url", "text_curated").as[(String, String)].collect().toMap
    assert(deb.size === 5)
    // host a: chrome gone from EVERY page (the global paragraph pass
    // alone would have kept a first occurrence), body preserved intact
    assert(deb("http://a.com/1") === "the alpha and bravo charlie delta echo foxtrot")
    (2 to 4).foreach { i =>
      assert(!deb(s"http://a.com/$i").contains("cookie"), deb(s"http://a.com/$i"))
      assert(!deb(s"http://a.com/$i").contains("footer"), deb(s"http://a.com/$i"))
    }
    // host b: same lines, below the per-host threshold → untouched
    assert(deb("http://b.com/1") ===
      "cookie banner accept with yankee as zulu maple willow cedar spruce footer contact links")
  }

  test("batch resume: committed docs are never re-curated; lineage stays QA-healthy") {
    val root = java.nio.file.Files.createTempDirectory("graft-curate").toString
    // batch 1: first crawl slice
    val snap1 = Curate.run(pages(200), root, resume = false)
    assert(snap1.rows > 0)
    // batch 2: the full crawl (superset — synth pages are pure in id)
    val snap2 = Curate.run(pages(400), root, resume = true)
    assert(snap2.rows > 0)
    val s1 = spark.read.parquet(s"$root/data/snap-1")
      .select("tile_id").collect().map(_.getLong(0)).toSet
    val s2 = spark.read.parquet(s"$root/data/snap-2")
      .select("tile_id").collect().map(_.getLong(0)).toSet
    assert(s1.intersect(s2).isEmpty) // nothing re-committed
    // identical rerun adds nothing (idempotent ingestion)
    val snap3 = Curate.run(pages(400), root, resume = true)
    assert(snap3.rows === 0L)
    // the QA report sees a healthy doc table (conservation, skew,
    // overlap, drift all run — 3 snapshots)
    val vs = QaReport.verdicts(spark, root)
    assert(vs.filter(_.stage == "overlap").forall(_.ok), QaReport.summary(vs))
    assert(vs.filter(_.stage == "conservation").forall(_.ok), QaReport.summary(vs))
    assert(Lineage.metricsTable(spark, root)
      .agg(sum("row_count")).head.getLong(0) === (snap1.rows + snap2.rows))
  }
}

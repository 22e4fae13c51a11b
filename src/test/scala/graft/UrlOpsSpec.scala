package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.UrlOps

class UrlOpsSpec extends AnyFunSuite {
  import SharedSpark._

  test("canonicalize: scheme+host lowercased, path case preserved") {
    assert(UrlOps.canonicalize("HTTPS://WWW.Example.COM/Articles/Item") ===
      "https://example.com/Articles/Item")
  }

  test("canonicalize: default ports stripped, non-default kept") {
    assert(UrlOps.canonicalize("http://a.com:80/x") === "http://a.com/x")
    assert(UrlOps.canonicalize("https://a.com:443/x") === "https://a.com/x")
    assert(UrlOps.canonicalize("http://a.com:443/x") === "http://a.com:443/x")
    assert(UrlOps.canonicalize("https://a.com:8080/x") === "https://a.com:8080/x")
  }

  test("canonicalize: fragment dropped, trailing slash stripped, empty path → /") {
    assert(UrlOps.canonicalize("http://a.com/x/#frag") === "http://a.com/x")
    assert(UrlOps.canonicalize("http://a.com") === "http://a.com/")
    assert(UrlOps.canonicalize("http://a.com/") === "http://a.com/")
    assert(UrlOps.canonicalize("http://a.com#f") === "http://a.com/")
  }

  test("canonicalize: tracking params dropped, rest sorted, empty query dropped") {
    assert(UrlOps.canonicalize("http://a.com/p?utm_source=x&id=5&b=2") ===
      "http://a.com/p?b=2&id=5")
    assert(UrlOps.canonicalize("http://a.com/p?z=1&a=9") === "http://a.com/p?a=9&z=1")
    assert(UrlOps.canonicalize("http://a.com/p?utm_campaign=c&fbclid=z&gclid=1&ref=r") ===
      "http://a.com/p")
    assert(UrlOps.canonicalize("http://a.com/p?") === "http://a.com/p")
  }

  test("canonicalize: idempotent; garbage passes through unchanged") {
    val messy = "HTTP://WWW.A.com:80/P/?b=2&utm_source=x&a=1#f"
    val once = UrlOps.canonicalize(messy)
    assert(UrlOps.canonicalize(once) === once)
    assert(UrlOps.canonicalize("not a url") === "not a url")
    assert(UrlOps.canonicalize("") === "")
    assert(UrlOps.canonicalize("://nope") === "://nope")
  }

  test("host and domain extraction") {
    assert(UrlOps.host("HTTPS://WWW.News.Example.COM:8443/x?q=1#f") === "news.example.com")
    assert(UrlOps.host("garbage") === "")
    assert(UrlOps.domain("news.example.com") === "example.com")
    assert(UrlOps.domain("a.b.example.co.uk") === "example.co.uk")
    assert(UrlOps.domain("example.com") === "example.com")
    assert(UrlOps.domain("localhost") === "localhost")
    assert(UrlOps.domain("") === "")
  }

  test("url expressions stay in codegen and agree with the kernel") {
    spark.catalog.clearCache()
    // non-literal input (element_at over range) so the projection cannot
    // constant-fold away — we want to see the codegen'd span
    val urls = spark.range(3).select(element_at(array(
      lit("HTTP://WWW.A.com:80/P/?b=2&utm_source=x&a=1#f"),
      lit("https://b.org:8080/x"),
      lit("junk")), (col("id") + 1).cast("int")).as("u"))
    val out = urls.select(
      graft.functions.url.canonicalize(col("u")).as("c"),
      graft.functions.url.host(col("u")).as("h"),
      graft.functions.url.domain(col("u")).as("d"))
    val rows = out.collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(rows(0) === (("http://a.com/P?a=1&b=2", "a.com", "a.com")))
    assert(rows(1) === (("https://b.org:8080/x", "b.org", "b.org")))
    assert(rows(2) === (("junk", "", "")))
    // whole-stage codegen marker: the projection compiles into one span
    assert(out.queryExecution.executedPlan.toString.contains("*(1) Project"))
  }

  test("blocklist drops domains AND subdomains as a zero-shuffle filter; host cap bounds every host") {
    import spark.implicits._
    import graft.operators.{Sampling, UrlGovernance}
    val urls = Seq(
      (1L, "https://example.org/x"), (2L, "https://blog.example.org/y"),
      (3L, "https://notexample.org/z"), (4L, "https://news.example.com/a"))
      .toDF("doc_id", "url")
    val kept = UrlGovernance.filterBlockedHosts(urls, col("url"), Seq("example.org"))
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    // exact host and subdomain blocked; a lookalike suffix host is NOT
    assert(kept === Seq(3L, 4L))
    // pure filter: no exchange in the plan
    spark.catalog.clearCache()
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .withColumn("url", concat(lit("https://h"),
        pmod(col("doc_id"), lit(3)).cast("string"), lit(".example.com/p")))
    val plan = UrlGovernance.filterBlockedHosts(docs, col("url"), Seq("h0.example.com"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(800))
    // budget: no host exceeds the cap, and the kept set is
    // partitioning-invariant
    val capped = UrlGovernance.perHostCap(docs, col("url"), 5,
      Sampling.portableUniform(col("doc_id")), col("doc_id"))
    val perHost = capped.groupBy(graft.functions.url.host(col("url")))
      .count().collect().map(_.getLong(1))
    assert(perHost.forall(_ <= 5L) && perHost.nonEmpty)
    val a = capped.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    val b = UrlGovernance.perHostCap(docs.repartition(7), col("url"), 5,
        Sampling.portableUniform(col("doc_id")), col("doc_id"))
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(a === b)
  }

  test("q55 dedup groups: every canonical key's members share the key") {
    val q = SparkEntry.queries("q55_url_dedup")(spark, sfDir)
    val n = q.count()
    assert(n > 0)
    // the synthesizer folds 2*3*8(*)... variants onto shared canonicals:
    // dedup must actually merge (fewer groups than docs)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").count()
    assert(n < docs)
    assert(q.agg(sum("n_copies")).head.getLong(0) === docs)
  }
}

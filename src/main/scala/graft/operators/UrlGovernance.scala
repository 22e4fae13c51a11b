package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.url

/** Crawl governance over URLs: domain blocklists and per-host crawl
  * budgets — the admission rules a crawl pipeline applies before any
  * content work.
  */
object UrlGovernance {
  /** Domain blocklist: drop rows whose canonical host equals a blocked
    * domain or is a subdomain of one. A literal-predicate pure filter
    * (zero shuffle, pushes toward the scan) for the bounded blocklists
    * this models; a registry-sized blocklist would broadcast as a table
    * and semi-join on the suffix key — the decontaminate join shape.
    */
  def filterBlockedHosts(df: DataFrame, urlCol: Column,
                         blocked: Seq[String]): DataFrame = {
    require(blocked.nonEmpty)
    val host = url.host(urlCol)
    val allowed = blocked.foldLeft(lit(true)) { (acc, b) =>
      acc && !(host === b || host.endsWith("." + b))
    }
    df.filter(allowed)
  }

  /** Per-host crawl budget: deterministically keep at most `n` documents
    * per host — the content-keyed reservoir (identical at any
    * parallelism/retry), keyed by the canonical host. One shuffle on the
    * host key; the budget bounds every host's contribution regardless of
    * how hot the domain is.
    */
  def perHostCap(df: DataFrame, urlCol: Column, n: Int,
                 u: Column, tiebreak: Column): DataFrame =
    Sampling.reservoirPerKey(
      df.withColumn("__host", url.host(urlCol)), col("__host"), u, tiebreak, n)
      .drop("__host")
}

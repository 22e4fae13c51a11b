package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines. Spark's
  * `df.sample` draws from a per-partition RNG stream — the selected set
  * changes with partitioning and retries, which breaks resume parity and
  * A/B comparisons. Every sampler here derives its coin flip from row
  * CONTENT (counter-RNG discipline, SURVEY.md §7.5.2): the same row is
  * in or out at any parallelism, on any cluster size, on any retry.
  */
object Sampling {
  /** Uniform [0,1) from a key via xxhash64 — the production path (full
    * 64-bit avalanche; key may be any column set). Not replicable in
    * ANSI SQL; pair with [[portableUniform]] when an external oracle
    * must re-derive the sample.
    */
  def hashUniform(seed: Long, keys: Column*): Column =
    (shiftrightunsigned(xxhash64((lit(seed) +: keys): _*), 11) *
      lit(1.1102230246251565e-16)) // 2^-53

  /** Uniform [0,1) from a NON-NEGATIVE integer key via a 31-bit LCG —
    * weaker mixing than xxhash64 but exactly replicable in ANSI SQL
    * (all intermediates < 2^62): the q43 oracle recomputes it in DuckDB.
    * The key is reduced mod 2^31-1 first so products never overflow
    * int64 at any id scale.
    */
  def portableUniform(key: Column): Column = {
    val reduced = pmod(key.cast("long"), lit(2147483647L))
    val h = pmod(lit(1103515245L) * reduced + lit(12345L), lit(2147483647L))
    h.cast("double") / lit(2147483647.0)
  }

  /** Keep each row independently with probability `rate` (deterministic
    * in the row key): a pure filter — pushes to the scan, no shuffle.
    */
  def hashSample(df: DataFrame, u: Column, rate: Double): DataFrame =
    df.filter(u < rate)

  /** Per-stratum rates (e.g. downsample boilerplate languages, keep all
    * rare ones): rate looked up from a literal map — still a pure filter.
    */
  def stratifiedSample(df: DataFrame, strataCol: Column, u: Column,
                       rates: Map[String, Double],
                       defaultRate: Double): DataFrame = {
    val rate = rates.foldLeft(lit(defaultRate)) { case (acc, (k, r)) =>
      when(strataCol === k, lit(r)).otherwise(acc)
    }
    df.filter(u < rate)
  }

  /** Resample to a target domain mixture (the data-mixing step of
    * DoReMi-style pipelines, applied as deterministic downsampling): for
    * target weight w_d per domain with current count n_d, each domain
    * keeps rows at rate r_d = (w_d / n_d) · s where s = min_d(n_d / w_d)
    * — the scarcest-relative-to-target domain keeps ALL its rows and
    * every other domain thins to match, so the output domain shares
    * equal the targets (in expectation) with maximal data retention and
    * no upsampling. Domains without a weight are dropped.
    *
    * One count aggregation collects #domains rows to the driver (the
    * centroid-collect pattern — domain cardinality is bounded); the
    * sample itself is then a PURE FILTER with literal rates, so it
    * pushes toward the scan and adds zero shuffle at any corpus size.
    * Coin and rates are exact doubles derived from content and counts,
    * so an external SQL oracle recomputing the same formula selects the
    * identical row set (q77).
    */
  def toMixture(df: DataFrame, domainCol: Column, u: Column,
                weights: Map[String, Double]): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(_ > 0))
    // domain keys compare as strings so any groupable key type works
    // (language codes, cluster ids, hosts)
    val counts = df.groupBy(domainCol.cast("string").as("__d"))
      .agg(count(lit(1)).as("__n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val present = weights.filter { case (d, _) => counts.getOrElse(d, 0L) > 0L }
    require(present.nonEmpty, "no weighted domain present in the data")
    val s = present.map { case (d, w) => counts(d) / w }.min
    val rate = present.foldLeft(lit(0.0)) { case (acc, (d, w)) =>
      when(domainCol.cast("string") === d, lit(w / counts(d) * s)).otherwise(acc)
    }
    df.filter(u < rate)
  }

  /** Balance to UNIFORM output shares across an UNBOUNDED key domain
    * (e.g. embedding clusters, whose count grows with the corpus):
    * unlike [[toMixture]] — whose literal-rate CaseWhen requires the
    * domain list to be driver-bounded — the per-key rates here are a
    * DataFrame ((key, rate) — one row per key) broadcast-joined to the
    * input, so nothing key-cardinality-sized touches the driver or the
    * plan. Rate math matches toMixture with w = 1/k exactly:
    * r_key = (w / n_key) · min(n_key / w) — the scarcest key keeps all
    * rows, every other thins to match.
    */
  def balanceByKey(df: DataFrame, keyCol: Column, u: Column): DataFrame = {
    val counts = df.groupBy(keyCol.as("__d")).agg(count(lit(1)).as("__n"))
    val k = counts.agg(count(lit(1)).as("__k"))
    val wt = lit(1.0) / col("__k")
    val withW = counts.crossJoin(broadcast(k))
      .withColumn("__wt", wt)
    val s = withW.agg(min(col("__n") / col("__wt")).as("__s"))
    val rates = withW.crossJoin(broadcast(s))
      .select(col("__d"), (col("__wt") / col("__n") * col("__s")).as("__rate"))
    df.join(broadcast(rates), keyCol === col("__d"))
      .filter(u < col("__rate"))
      .drop("__d", "__rate")
  }

  /** Exactly `n` rows per key (all rows when the key has fewer):
    * deterministic "reservoir" = the n smallest hash values per key.
    * One shuffle on the key; ties broken by the tiebreak column so the
    * result is a function of the data alone.
    */
  def reservoirPerKey(df: DataFrame, keyCol: Column, u: Column,
                      tiebreak: Column, n: Int): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(u.asc, tiebreak.asc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= n)
      .drop("__rn")
  }
}

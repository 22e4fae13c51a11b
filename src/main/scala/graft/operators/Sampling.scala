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

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import java.util.Locale

/** Injection–recovery depth sweep (reference: mvt/injection.py:8-21
  * `inject_into_residuals`, mvt/run_mvt_espre.py:61-82 `_bootstrap_amp`,
  * mvt/saveio.py:40-52 `write_injection_csv`): for each injection depth d,
  * subtract a Gaussian kernel d·exp(-x²/2σ²) from every in-transit residual
  * profile, stack the in-transit profiles (per-x median), read the recovered
  * depth as the negated stack minimum inside |x| ≤ halfWindow, and bracket
  * it with a p16–p84 bootstrap envelope over exposure resamples. The output
  * is the reference's injected-vs-recovered curve, one row per depth.
  *
  * Scale shape: two shuffle-parallel aggregation trees — no driver loop over
  * depths or bootstrap replicates. The depth sweep is an explode over a
  * literal array (×|depths| fan-out of the in-transit rows); the bootstrap
  * is the counter-RNG resample pattern of [[Bootstrap]] applied at the
  * EXPOSURE level (reference resamples whole profiles, injection.py:28-31):
  * ×nBoot fan-out of the exposure index, one equi-join back to profile rows.
  * Both fan-outs grow linearly and repartition freely; nothing is collected.
  *
  * Determinism under parallelism: the resample pick for (boot, slot) is a
  * pure LCG over 31-bit arithmetic — identical at any partitioning AND
  * exactly replicable in ANSI SQL (no 64-bit overflow, so the DuckDB oracle
  * computes the same picks; Spark's xxhash64 is not portable to the oracle).
  */
object Injection {
  /** LCG pick in [0, n): portable to ANSI SQL (products stay < 2^63). */
  private def lcgPick(boot: Column, slot: Column, n: Column): Column =
    pmod(pmod(lit(1103515245L) * (boot * lit(131071L) + slot) + lit(12345L),
      lit(2147483647L)), n)

  /** Sweep injected depths and report recovery with a bootstrap envelope.
    *
    * @param profiles   (exp: long exposure id, x: double grid coord,
    *                    y: double residual, in_transit: boolean)
    * @param depths     injected kernel depths (fractional, e.g. 0.01 = 1%)
    * @param sigma      Gaussian kernel width in x units
    * @param halfWindow recovery search window |x| ≤ halfWindow
    * @param nBoot      bootstrap replicates (exposure-level resampling)
    * @return one row per depth: inj_depth_percent, rec_depth_percent,
    *         rec_lo_percent, rec_hi_percent (reference CSV columns,
    *         saveio.py:46-52)
    */
  def depthSweep(profiles: DataFrame, depths: Seq[Double], sigma: Double,
                 halfWindow: Double, nBoot: Int): DataFrame = {
    require(depths.nonEmpty && nBoot > 0)
    val it = profiles.filter(col("in_transit"))
      .select(col("exp").cast("long").as("exp"),
        col("x").cast("double").as("x"), col("y").cast("double").as("y"))

    // ×|depths| fan-out; kernel injection is pure column math
    val kernel = exp(lit(-0.5) * (col("x") / sigma) * (col("x") / sigma))
    val injected = it
      .withColumn("depth", explode(array(depths.map(lit(_)): _*)))
      .withColumn("y_inj", col("y") - col("depth") * kernel)

    // headline recovery: per-x median stack -> windowed minimum
    val stacked = injected.groupBy("depth", "x")
      .agg(median(col("y_inj")).as("med"))
    val rec = stacked.filter(abs(col("x")) <= halfWindow)
      .groupBy("depth").agg((-min(col("med"))).as("rec"))

    // exposure index 0..nIT-1 (deterministic order by exposure id) + count.
    // The unpartitioned window here (Spark warns) is intentional and
    // bounded: its input is the DISTINCT exposure-id list — 8 bytes per
    // EXPOSURE (10²–10⁴ frames in the reference design), not per row —
    // so the single-partition rank touches kilobytes regardless of how
    // many profile rows the corpus holds. The rank must be a global
    // order to make the LCG pick uniform AND replayable in the SQL
    // oracle (which computes the same row_number).
    val exps = it.select("exp").distinct()
      .withColumn("it_idx",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("exp").asc)).cast("long") - 1L)
    val nIt = exps.groupBy().agg(count(lit(1)).as("n_it"))

    // bootstrap: each (boot, slot) picks one exposure (multiset semantics:
    // an exposure drawn twice contributes twice via its two slot rows)
    val picks = exps.select(col("it_idx").as("slot"))
      .withColumn("boot", explode(sequence(lit(0L), lit(nBoot.toLong - 1))))
      .crossJoin(broadcast(nIt))
      .withColumn("pick", lcgPick(col("boot"), col("slot"), col("n_it")))
      .join(exps.select(col("it_idx").as("pick"), col("exp")), "pick")
      .select("boot", "slot", "exp")
    val bootProfiles = picks.join(injected, "exp")
    val bootStacked = bootProfiles.groupBy("depth", "boot", "x")
      .agg(median(col("y_inj")).as("med"))
    val bootRec = bootStacked.filter(abs(col("x")) <= halfWindow)
      .groupBy("depth", "boot").agg((-min(col("med"))).as("rec_b"))
    val ci = bootRec.groupBy("depth")
      .agg(percentile(col("rec_b"), lit(0.16)).as("lo"),
        percentile(col("rec_b"), lit(0.84)).as("hi"))

    rec.join(ci, "depth")
      .select(round(col("depth") * 100.0, 6).as("inj_depth_percent"),
        round(col("rec") * 100.0, 6).as("rec_depth_percent"),
        round(col("lo") * 100.0, 6).as("rec_lo_percent"),
        round(col("hi") * 100.0, 6).as("rec_hi_percent"))
  }

  /** Write the sweep as the reference's injection CSV artifact
    * (saveio.py:40-52 column layout, header included). The sweep result is
    * |depths| rows — a driver-side summary artifact, same as the reference
    * writer; Locale.ROOT so the file is byte-identical on any JVM.
    */
  def writeInjectionCsv(sweep: DataFrame, path: String): Unit = {
    val rows = sweep.orderBy("inj_depth_percent").collect()
    val sb = new StringBuilder(
      "inj_depth_percent,rec_depth_percent,rec_lo_percent,rec_hi_percent\n")
    rows.foreach { r =>
      sb.append((0 until 4).map(i =>
        String.format(Locale.ROOT, "%.6f", r.getDouble(i).asInstanceOf[AnyRef]))
        .mkString(",")).append('\n')
    }
    val p = java.nio.file.Paths.get(path)
    if (p.getParent != null) java.nio.file.Files.createDirectories(p.getParent)
    java.nio.file.Files.write(p, sb.toString.getBytes("UTF-8"))
  }

  /** Deterministic profile grid derived from the events table by pure
    * integer math (SQL-replicable; see SparkEntry q40 oracle): nExp
    * exposures × 81-point x grid in [-4, 4], residual pseudo-noise in
    * [-0.06, 0.06], exposures with exp % 3 > 0 in transit.
    */
  def profilesFromEvents(events: DataFrame, nExp: Int = 10): DataFrame = {
    val grid = 81
    val e = (col("event_id") / grid).cast("long")
    val xi = pmod(col("event_id"), lit(grid)).cast("long")
    events.filter(col("event_id") < nExp * grid)
      .select(e.as("exp"), ((xi.cast("double") - 40.0) / 10.0).as("x"),
        ((pmod(e * 31 + xi * 17, lit(13)).cast("double") - 6.0) / 100.0).as("y"),
        (pmod(e, lit(3)) > 0).as("in_transit"))
  }
}

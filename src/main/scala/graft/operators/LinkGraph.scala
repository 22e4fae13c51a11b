package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-graph analytics over the crawl's host graph — the authority
  * signal (PageRank) crawl scheduling and quality weighting consume.
  */
object LinkGraph {
  /** Fixed-iteration PageRank over a directed edge list (src, dst):
    * pr₀ = 1/N; pr_{k+1}(v) = (1−d)/N + d · Σ_{(u,v)∈E} pr_k(u)/out(u).
    *
    * Scale shape: each iteration is ONE equi join of the edge list with
    * the rank vector plus ONE node-keyed aggregation — the CC superstep
    * discipline (eager localCheckpoint per step so the plan never
    * branches exponentially); edges carry (src, dst) only. N is a
    * driver scalar (node count — bounded by #hosts, not #pages).
    * FIXED iterations (not convergence-tested) keep the whole operator
    * independently replayable by an unrolled SQL oracle (q88); dangling
    * mass is dropped, matching the oracle's formula exactly.
    * Self-loops and duplicate edges are removed first.
    *
    * ORDER-INSENSITIVE aggregation: each per-edge contribution pr/out(u)
    * is a deterministic double, but a double SUM depends on accumulation
    * order — Spark's partial aggregation and another engine's scan order
    * need not agree, which made oracle parity hinge on luck near
    * round(·,6) boundaries. Contributions are therefore rounded to an
    * exact 1e-15 integer grid and summed as LONGS (exact, any order),
    * then scaled back: Σ contribs ≤ total PR mass ≈ 1, so the long sum
    * stays ≤ ~1e15 — no overflow at any graph size — and the grid keeps
    * ~15 significant digits, far below the 1e-6 output rounding.
    */
  def pageRank(edges: DataFrame, iters: Int = 3,
               damping: Double = 0.85): DataFrame = {
    val e = edges.select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()
      .localCheckpoint(true) // reused every superstep
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct()
      .localCheckpoint(true)
    val n = nodes.count()
    require(n > 0, "pageRank on an empty graph")
    val outdeg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
    var pr = nodes.withColumn("pr", lit(1.0 / n))
    for (_ <- 0 until iters) {
      val contrib = e
        .join(pr.withColumnRenamed("node", "src"), Seq("src"))
        .join(outdeg, Seq("src"))
        .select(col("dst").as("node"),
          // exact integer grid → the long sum is order-insensitive;
          // floor(x+0.5) NOT round(): Spark rounds the shortest-decimal
          // string while DuckDB rounds the binary double, which can flip
          // one grid unit per engine on a .5-straddling contribution and
          // amplify across iterations (the q96/q97 surface discipline)
          floor((col("pr") / col("outdeg")) * lit(1e15) + lit(0.5))
            .cast("long").as("c"))
        .groupBy("node").agg(sum(col("c")).as("in"))
      pr = nodes.join(contrib, Seq("node"), "left")
        .select(col("node"),
          (lit((1.0 - damping) / n) +
            lit(damping) * (coalesce(col("in"), lit(0L)).cast("double")
              / lit(1e15))).as("pr"))
        .localCheckpoint(true)
    }
    pr.select(col("node"), round(col("pr"), 6).as("pagerank"))
  }
}

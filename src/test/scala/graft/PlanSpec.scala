package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Regression gates for the physical-plan claims in PLANS.md — the plan
  * properties that make the engine survive 100×, asserted instead of
  * merely documented. Plans come from queryExecution.executedPlan at
  * local[4] (AQE final plans may differ at runtime only by coalescing,
  * which none of these assertions depend on).
  */
class PlanSpec extends AnyFunSuite {
  import SharedSpark._

  private def planOf(name: String): String =
    SparkEntry.queries(name)(spark, sfDir).queryExecution.executedPlan.toString

  test("q02 joins broadcast and filters push to the scans") {
    val p = planOf("q02_revenue_by_nation")
    assert(p.contains("BroadcastHashJoin"), p.take(1500))
    assert(!p.contains("SortMergeJoin"), "dims must broadcast, not SMJ")
    assert(p.contains("PushedFilters: [IsNotNull"), "join-key null filters must reach parquet")
  }

  test("scans prune columns: q20 reads only doc_id+text") {
    // another suite may have cached the documents table in the shared
    // session — pruning is a property of the parquet scan, so uncache
    spark.catalog.clearCache()
    val p = planOf("q20_text_stats")
    val readSchema = "ReadSchema: struct<doc_id:bigint,text:string>"
    assert(p.contains(readSchema), p.take(1500))
  }

  test("PIP join never exchanges the point side") {
    val pts = SparkEntry.queries("q10_tile_assign")(spark, sfDir)
      .select(col("doc_id").cast("long").as("point_id"),
        col("lon_r").as("lon"), col("lat_r").as("lat"))
    val p = graft.operators.SpatialJoin.pipJoinRtree(pts)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), p.take(1500))
  }

  test("IVF assign stage is a map: no Exchange above the corpus scan") {
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val cents = graft.operators.Similarity.trainCentroids(e, nCentroids = 8, iters = 1)
    val assigned = e.select(col("vec_id"),
      graft.functions.vec.nearest_centroid(col("embedding"), cents).as("c"))
    val p = assigned.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), p.take(1500))
  }

  test("MVT pipeline has exactly one Exchange (the tiler groupBy)") {
    val pages = graft.sources.SynthPages.pagesDF(spark, 500)
    val feats = graft.operators.GeoPipeline.pagesToFeatures(spark, pages)
      .filter(col("lat").isNotNull)
    val tiles = graft.operators.Tiler.buildTiles(feats, Seq(4, 8))
    val p = tiles.queryExecution.executedPlan.toString
    val nExchanges = "(?<!Broadcast)Exchange".r.findAllIn(p).length
    assert(nExchanges === 1, s"expected 1 shuffle, got $nExchanges:\n${p.take(2000)}")
  }
}

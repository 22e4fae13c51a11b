package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Range clustering + manifest-based file pruning: the per-file
  * (tile_id_min, tile_id_max) lineage metrics act as the Iceberg-style
  * pruning index once files are tile_id-range-ordered.
  */
class ClusterPruneSpec extends AnyFunSuite {
  import SharedSpark._
  import graft.plans.Lineage

  test("clusterSnapshots yields disjoint file ranges; readTileRange opens only matching files, exact results") {
    val root = java.nio.file.Files.createTempDirectory("graft-cluster").toString
    val cfg = GraftConfig(outDir = root, zooms = Seq(6, 10))
    // three commits of interleaved tile ranges → every file spans the
    // whole id space before clustering
    val pages = graft.sources.SynthPages.pagesDF(spark, 1200).localCheckpoint(true)
    val part = pmod(xxhash64(col("url")), lit(3))
    (0 until 3).foreach { i =>
      Lineage.commit(Main.tilesFor(spark, pages.filter(part === i), cfg,
        None), root, s"batch $i")
    }
    val before = Lineage.activeTable(spark, root)
    val total = before.count()
    val expect = before.filter(col("tile_id").between(LO, HI))
      .select(col("tile_id"), col("byte_len").cast("long")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq

    val snap = Lineage.clusterSnapshots(spark, root, files = Some(6)).get
    Lineage.expireSnapshots(root)
    // row conservation through the re-layout
    assert(Lineage.activeTable(spark, root).count() === total)
    // file ranges are non-overlapping after clustering
    val ranges = Lineage.metricsTable(spark, root)
      .select("tile_id_min", "tile_id_max")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(ranges.length > 1, "need several files for pruning to mean anything")
    ranges.sliding(2).foreach { case Array(a, b) =>
      assert(a._2 < b._1, s"overlapping file ranges $a $b") }

    // pruning: the matched file subset is strictly smaller than the table
    val matched = Lineage.metricsTable(spark, root)
      .filter(col("tile_id_max") >= LO && col("tile_id_min") <= HI)
      .count()
    assert(matched < ranges.length,
      s"range [$LO,$HI] matched all $matched files — not a pruning test")
    val got = Lineage.readTileRange(spark, root, LO, HI)
    // the scan really opens only the matched files
    val opened = got.select(input_file_name()).distinct().count()
    assert(opened <= matched, s"opened $opened files, matched $matched")
    val gotRows = got.select(col("tile_id"), col("byte_len").cast("long")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(gotRows === expect)

    // metrics loss: pruning must fall back to a full read of that
    // snapshot, never silently drop its files
    val metrics = java.nio.file.Paths.get(root, "metrics", s"snap-${snap.id}")
    val walk = java.nio.file.Files.walk(metrics)
      .sorted(java.util.Comparator.reverseOrder()).iterator()
    while (walk.hasNext) java.nio.file.Files.deleteIfExists(walk.next())
    val fallback = Lineage.readTileRange(spark, root, LO, HI)
      .select(col("tile_id"), col("byte_len").cast("long")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(fallback === expect)
  }

  // a mid-table tile range: zoom 10 rows sit above all zoom 6 ids
  private val LO = graft.core.WebMercator.tileId(10, 0, 0)
  private val HI = graft.core.WebMercator.tileId(10, 300L, (1L << 29) - 1)
}

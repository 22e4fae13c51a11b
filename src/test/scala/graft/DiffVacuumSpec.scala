package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Version diff (cache-invalidation lists) + orphan vacuum over the
  * lineage layer.
  */
class DiffVacuumSpec extends AnyFunSuite {
  import SharedSpark._
  import graft.plans.Lineage

  private def tiles(rows: Seq[(Long, Array[Byte])]) = {
    import spark.implicits._
    rows.toDF("tile_id", "mvt_bytes")
      .withColumn("byte_len", length(col("mvt_bytes")))
  }

  test("diffVersions reports added/removed/changed; delta-root dup rows combine order-insensitively") {
    val root = java.nio.file.Files.createTempDirectory("graft-diff").toString
    Lineage.commit(tiles(Seq(
      1L -> "a".getBytes, 2L -> "b".getBytes, 3L -> "c".getBytes)), root, "v1")
    // v2 adds tile 4, adds a DELTA row for tile 2 (same id, new bytes —
    // the streamed-root shape), leaves 1 and 3 untouched
    Lineage.commit(tiles(Seq(
      2L -> "b2".getBytes, 4L -> "d".getBytes)), root, "v2")
    val d12 = Lineage.diffVersions(spark, root, 1L, 2L)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(d12 === Map(2L -> "changed", 4L -> "added"))
    // reverse direction flips added/removed
    val d21 = Lineage.diffVersions(spark, root, 2L, 1L)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(d21 === Map(2L -> "changed", 4L -> "removed"))
    // identical versions diff empty
    assert(Lineage.diffVersions(spark, root, 2L, 2L).count() === 0)
    // against an empty version everything is added
    assert(Lineage.diffVersions(spark, root, 0L, 1L)
      .collect().forall(_.getString(1) == "added"))
  }

  test("vacuumOrphans sweeps only old uncommitted dirs, never committed or fresh ones") {
    val root = java.nio.file.Files.createTempDirectory("graft-vacuum").toString
    Lineage.commit(tiles(Seq(1L -> "a".getBytes)), root, "v1")
    // orphan: a data dir written by a crashed commit (no manifest)
    val oldOrphan = java.nio.file.Paths.get(root, "data", "snap-99")
    java.nio.file.Files.createDirectories(oldOrphan)
    java.nio.file.Files.writeString(oldOrphan.resolve("part-0.parquet"), "x")
    val past = java.nio.file.attribute.FileTime
      .fromMillis(System.currentTimeMillis() - 48L * 3600 * 1000)
    java.nio.file.Files.setLastModifiedTime(oldOrphan, past)
    // fresh orphan: an IN-FLIGHT commit's dir — must survive
    val fresh = java.nio.file.Paths.get(root, "data", "snap-100")
    java.nio.file.Files.createDirectories(fresh)
    val removed = Lineage.vacuumOrphans(root)
    assert(removed.exists(_.endsWith("snap-99")))
    assert(!java.nio.file.Files.exists(oldOrphan))
    assert(java.nio.file.Files.exists(fresh), "fresh in-flight dir swept!")
    assert(java.nio.file.Files.isDirectory(
      java.nio.file.Paths.get(root, "data", "snap-1")), "committed dir swept!")
    // idempotent
    assert(Lineage.vacuumOrphans(root).isEmpty)
    // the table still reads
    assert(Lineage.activeTable(spark, root).count() === 1)
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.S2
import graft.operators.CellCompact

class CellCompactSpec extends AnyFunSuite {
  import SharedSpark._

  private def toDf(cells: Seq[Long]) = {
    import spark.implicits._
    cells.toDF("cell")
  }
  private def cellSet(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.select("cell").collect().map(_.getLong(0)).toSet

  test("children of one cell compact back to it (real geography)") {
    val parent = S2.cellId(48.8566, 2.3522, 10)
    val kids = CellCompact.uncompact(toDf(Seq(parent)), "cell", 12)
    assert(kids.count() === 16)
    // every expanded child really is a descendant
    kids.collect().map(_.getLong(0)).foreach { k =>
      assert(S2.level(k) === 12 && S2.contains(parent, k))
    }
    assert(cellSet(CellCompact.compact(kids, "cell")) === Set(parent))
  }

  test("multi-level cascade matches hand-derived fixpoint") {
    // face-2 level-12 cells at positions 0..499 (the q59 construction):
    // quads 0..124 complete → L11 0..124 → L10 0..30 (+124@11)
    // → L9 0..6 (+28,29,30@10) → L8 0 (+4,5,6@9)
    def cellAt(level: Int, pos: Long): Long =
      (2L << 61) | (pos << (2 * (30 - level) + 1)) | (1L << (2 * (30 - level)))
    val input = toDf((0L until 500L).map(cellAt(12, _)))
    val expected =
      Set(cellAt(8, 0)) ++
        Seq(4L, 5L, 6L).map(cellAt(9, _)) ++
        Seq(28L, 29L, 30L).map(cellAt(10, _)) ++
        Set(cellAt(11, 124))
    assert(cellSet(CellCompact.compact(input, "cell")) === expected)
  }

  test("uncompact is the exact inverse of compact on leaf sets") {
    // deterministic pseudo-random points, faces across the sphere
    // (face ≥ 4 exercises negative 64-bit ids through the bit arithmetic)
    val pts = (0 until 300).map { i =>
      val lat = ((i * 2654435761L) % 1600).toDouble / 10.0 - 80.0
      val lon = ((i * 40503L) % 3600).toDouble / 10.0 - 180.0
      S2.cellId(lat, lon, 12)
    }.distinct
    assert(pts.exists(_ < 0), "want at least one negative id in the mix")
    val s = toDf(pts)
    val compacted = CellCompact.compact(s, "cell")
    val roundTrip = CellCompact.uncompact(compacted, "cell", 12)
    assert(cellSet(roundTrip) === pts.toSet)
    // leaf-count conservation at the compacted levels
    val leafCount = compacted.select(
      sum(pow(lit(4.0), lit(12) - CellCompact.levelOf(col("cell"))).cast("long")))
      .head().getLong(0)
    assert(leafCount === pts.size)
  }

  test("groups compact independently") {
    import spark.implicits._
    def cellAt(pos: Long): Long = (2L << 61) | (pos << 37) | (1L << 36)
    // group a: a complete quad; group b: the same quad minus one cell
    val rows = (0L until 4L).map(p => ("a", cellAt(p))) ++
      (0L until 3L).map(p => ("b", cellAt(p)))
    val out = CellCompact.compact(rows.toDF("grp", "cell"), "cell", Seq("grp"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val parent = S2.parentAtLevel(cellAt(0), 11)
    assert(out === Set(("a", parent)) ++ (0L until 3L).map(p => ("b", cellAt(p))))
  }

  test("uncompact refuses cells deeper than the target level") {
    val deep = S2.cellId(10.0, 10.0, 14)
    val ex = intercept[Exception] {
      CellCompact.uncompact(toDf(Seq(deep)), "cell", 12).collect()
    }
    assert(ex.getMessage.contains("deeper than target level") ||
      ex.getCause != null)
  }

  test("empty and already-compact inputs are fixpoints") {
    import spark.implicits._
    assert(CellCompact.compact(Seq.empty[Long].toDF("cell"), "cell").count() === 0)
    val lone = Seq(S2.cellId(0.0, 0.0, 5), S2.cellId(45.0, 90.0, 7))
    assert(cellSet(CellCompact.compact(toDf(lone), "cell")) === lone.toSet)
  }

  test("driver fast path and superstep path reach the same fixpoint") {
    // the q59 construction: 500 consecutive level-12 cells on face 2 —
    // a multi-level cascade with a leftover tail at every level
    def cellAt(level: Int, pos: Long): Long =
      (2L << 61) | (pos << (2 * (30 - level) + 1)) | (1L << (2 * (30 - level)))
    val input = toDf((0L until 500L).map(cellAt(12, _)))
    val driver = cellSet(CellCompact.compact(input, "cell",
      collectMax = Long.MaxValue))
    val superstep = cellSet(CellCompact.compact(input, "cell",
      collectMax = 0L)) // forces the distributed cascade
    assert(driver === superstep)
  }
}

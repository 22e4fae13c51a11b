package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-track polyline simplification — the trajectory twin of the
  * polygon tiler's Douglas-Peucker stage (there: clip→simplify at tile
  * resolution via JTS; here: the pure [[graft.core.DouglasPeucker]]
  * kernel per ordered point sequence).
  *
  * Scale shape: ONE shuffle keyed by the track id (`groupByKey` →
  * `mapGroups`), then per-group linear work and memory; the reduction
  * is embarrassingly parallel across tracks — 10¹² points distribute
  * by track cardinality, and a single pathological track that outgrows
  * an executor should be windowed upstream (q90-style chunking) before
  * simplification, exactly as a tile pipeline windows oversized
  * geometries.
  */
object Trajectory {

  /** Simplify each track at `tolDeg` (planar degrees — the kNN/DWithin
    * metric). Points are ordered by `orderCol` (ties → lon, lat: a
    * total order, so the result is partitioning-invariant). Returns
    * (idCol, n_in, n_kept, wkt) with wkt the kept polyline as
    * `LINESTRING(x y, …)` at 6 dp (Locale-stable).
    */
  def simplifyTracks(points: DataFrame, idCol: String, orderCol: String,
                     lonCol: String, latCol: String,
                     tolDeg: Double): DataFrame = {
    val spark = points.sparkSession
    import spark.implicits._
    require(tolDeg >= 0.0)
    points
      .select(col(idCol).cast("long"), col(orderCol).cast("long"),
        col(lonCol).cast("double"), col(latCol).cast("double"))
      .as[(Long, Long, Double, Double)]
      .groupByKey(_._1)
      .mapGroups { (id, it) =>
        val pts = it.toArray.sortBy(p => (p._2, p._3, p._4))
        val xs = pts.map(_._3)
        val ys = pts.map(_._4)
        val kept = graft.core.DouglasPeucker.simplifyIndices(xs, ys, tolDeg)
        val wkt = kept.iterator.map { i =>
          String.format(java.util.Locale.ROOT, "%.6f %.6f",
            xs(i).asInstanceOf[AnyRef], ys(i).asInstanceOf[AnyRef])
        }.mkString("LINESTRING(", ", ", ")")
        (id, pts.length.toLong, kept.length.toLong, wkt)
      }
      .toDF(idCol, "n_in", "n_kept", "wkt")
  }
}

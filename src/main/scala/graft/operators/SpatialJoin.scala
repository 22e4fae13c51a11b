package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.geo
import graft.sources.{AdminPolygons, PolyRegistry}

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.types._

/** pip_contains(admin_id, lon, lat) — exact point-in-polygon against the
  * deterministic admin registry; codegen'd static call (no closure, no
  * broadcast needed: the registry is a pure function of a fixed seed and
  * materializes identically in every executor JVM).
  */
case class PipContainsExpr(first: Expression, second: Expression, third: Expression,
    registry: Int = PolyRegistry.Admin)
    extends TernaryExpression {
  override def dataType: DataType = BooleanType
  override def prettyName: String = "pip_contains"
  override protected def nullSafeEval(id: Any, lon: Any, lat: Any): Any =
    PolyRegistry.contains(registry, id.asInstanceOf[Long],
      lon.asInstanceOf[Double], lat.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (id, lon, lat) =>
      s"graft.sources.PolyRegistry.contains($registry, $id, $lon, $lat)")
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression =
    copy(first = f, second = s, third = t)
}

/** pip_query(cell, lon, lat) → array of admin_ids covering the point,
  * resolved through the per-cell STRtree (registry/res are literals).
  */
case class PipQueryExpr(first: Expression, second: Expression, third: Expression,
    registry: Int, res: Int, level: Int = -1)
    extends TernaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "pip_query"
  override protected def nullSafeEval(cell: Any, lon: Any, lat: Any): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      PolyRegistry.queryTree(registry, res, level, cell.asInstanceOf[Long],
        lon.asInstanceOf[Double], lat.asInstanceOf[Double]))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (cell, lon, lat) =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.sources.PolyRegistry.queryTree($registry, $res, $level, $cell, $lon, $lat))")
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression =
    copy(first = f, second = s, third = t)
}

/** Broadcast point-in-polygon join via hex-cell prefix (BASELINE.json
  * north_star: "point-in-polygon joins against admin-boundary polygons
  * using a broadcast R-tree per H3 cell prefix").
  *
  * Plan shape (the reference's broadcast-normalize join, SURVEY.md §2.3):
  *   points(lon,lat) --hex_cell(res)--> equi-join BROADCAST(polygon cell
  *   cover) --> exact PIP filter (codegen'd) --> (point, admin_id) rows.
  *
  * The cover side is tiny (≈10-40 cells × ~80 polygons), so Catalyst picks
  * BroadcastHashJoin; the per-row exact test only runs on cell-collocated
  * candidates. At 100 TB this is shuffle-free on the big side.
  */
object SpatialJoin {
  /** k-anonymity cell suppression (geo-privacy governance for published
    * training data): coarsen each point to a cell and DROP every cell
    * holding fewer than k points — no row in the output is localizable
    * below a crowd of k. Pure groupBy + semi-join; the big side shuffles
    * once on the cell key. Output: one row per surviving point with its
    * cell id and the cell's population.
    */
  def kAnonymizeCells(points: org.apache.spark.sql.DataFrame,
                      cell: org.apache.spark.sql.Column,
                      k: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val withCell = points.withColumn("cell", cell)
    val crowds = withCell.groupBy("cell")
      .agg(count(lit(1)).as("cell_n"))
      .filter(col("cell_n") >= k)
    withCell.join(crowds, "cell")
  }

  import org.apache.spark.sql.GraftBridge.{column, expression}

  def pip_contains(adminId: Column, lon: Column, lat: Column,
                   registry: Int = PolyRegistry.Admin): Column =
    column(PipContainsExpr(expression(adminId), expression(lon), expression(lat),
      registry))

  /** Cell-cover DataFrame of the admin registry at `res`. */
  def polygonCover(spark: SparkSession, res: Int = AdminPolygons.CoverRes,
                   level: Option[Int] = None,
                   registry: Int = PolyRegistry.Admin): DataFrame = {
    import spark.implicits._
    val all = PolyRegistry.polys(registry)
    val polys = level.fold(all)(l => all.filter(_.level == l))
    polys.flatMap(p => AdminPolygons.cellCover(p, res).map(c => (c, p.adminId, p.name)))
      .toDF("cover_cell", "admin_id", "admin_name")
  }

  /** Join `points` (must have `lon`, `lat` double columns) against the
    * admin registry; returns input columns + admin_id + admin_name.
    * Inner join: points matching no polygon drop out (use pipJoinLeft for
    * the tagging variant).
    */
  def pipJoin(points: DataFrame, res: Int = AdminPolygons.CoverRes,
              level: Option[Int] = None,
              registry: Int = PolyRegistry.Admin): DataFrame = {
    val spark = points.sparkSession
    val cover = polygonCover(spark, res, level, registry)
    points
      .withColumn("__cell", geo.hex_cell(col("lon"), col("lat"), lit(res)))
      .join(broadcast(cover), col("__cell") === col("cover_cell"))
      .filter(pip_contains(col("admin_id"), col("lon"), col("lat"), registry))
      .drop("__cell", "cover_cell")
  }

  /** Zonal statistics — aggregate an integer per-point value over the
    * polygon containing each point (count + exact sum + mean): the
    * raster-analytics "summarize a field by admin zone" primitive. One
    * broadcast-cover PIP join (polygons never shuffle) followed by ONE
    * hash aggregation keyed by admin_id with map-side partial combine;
    * the mean is a final double ratio over two exact longs, so the
    * distributed part is order-insensitive under any partitioning.
    * Returns (admin_id, n_pts, sum_v, mean_v).
    */
  def zonalStats(points: DataFrame, valCol: String,
                 res: Int = AdminPolygons.CoverRes,
                 registry: Int = PolyRegistry.Admin): DataFrame =
    pipJoin(points, res, None, registry)
      .groupBy("admin_id")
      .agg(count(lit(1)).as("n_pts"),
        sum(col(valCol).cast("long")).as("sum_v"))
      .withColumn("mean_v", round(
        col("sum_v").cast("double") / col("n_pts").cast("double"), 6))

  /** R-tree variant: instead of the equi-join + post-filter, each point
    * queries the STRtree of its cell's candidate polygons directly (one
    * codegen'd expression + explode; zero joins). Preferable when many
    * polygons share a cover cell — at 10⁵+ admin polygons the per-cell
    * tree turns the candidate scan into O(log n). Same output as pipJoin.
    */
  def pipJoinRtree(points: DataFrame, res: Int = AdminPolygons.CoverRes,
                   registry: Int = PolyRegistry.Admin,
                   level: Option[Int] = None): DataFrame = {
    val hits = column(PipQueryExpr(
      expression(geo.hex_cell(col("lon"), col("lat"), lit(res))),
      expression(col("lon")), expression(col("lat")), registry, res,
      level.getOrElse(-1)))
    points
      .withColumn("admin_id", explode(hits))
  }

  /** Zero-shuffle LEFT PIP tag: per-row candidate lookup through the
    * per-cell STRtree expression, `explode_outer` for the miss row (null
    * admin), names attached via a broadcast of the tiny registry table.
    * Same output multiset as `pipJoinLeft` but with NO window and NO
    * unique-key requirement — the big side never exchanges, which at
    * 100 TB removes the single most expensive shuffle of the MVT
    * pipeline (round-2 stage audit: the window stage cost as much as the
    * whole geoparse map stage).
    */
  def pipJoinLeftRtree(points: DataFrame, res: Int = AdminPolygons.CoverRes,
                       registry: Int = PolyRegistry.Admin,
                       level: Option[Int] = None): DataFrame = {
    val spark = points.sparkSession
    import spark.implicits._
    val hits = column(PipQueryExpr(
      expression(geo.hex_cell(col("lon"), col("lat"), lit(res))),
      expression(col("lon")), expression(col("lat")), registry, res,
      level.getOrElse(-1)))
    val all = PolyRegistry.polys(registry)
    val polys = level.fold(all)(l => all.filter(_.level == l))
    val names = polys.map(p => (p.adminId, p.name)).toDF("admin_id", "admin_name")
    val inCols = points.columns
    points
      .withColumn("admin_id", explode_outer(hits))
      .join(broadcast(names), Seq("admin_id"), "left")
      .select((inCols.toIndexedSeq.map(col) :+ col("admin_id")
        :+ col("admin_name")): _*)
  }

  /** Left variant: points matching no polygon survive with null admin
    * columns (the null-test surface: "features outside all polygons join
    * to nothing"). `keyCol` must uniquely identify a point row.
    */
  def pipJoinLeft(points: DataFrame, keyCol: String,
                  res: Int = AdminPolygons.CoverRes,
                  level: Option[Int] = None,
                  registry: Int = PolyRegistry.Admin): DataFrame = {
    // Single pass (no recompute of the expensive input branch): left-join
    // the broadcast cover, evaluate exact PIP per candidate, then keep hit
    // rows plus exactly one null-tagged row for all-miss points via a
    // window over the point key (one shuffle).
    import org.apache.spark.sql.expressions.Window
    val spark = points.sparkSession
    val cover = polygonCover(spark, res, level, registry)
    val w = Window.partitionBy(keyCol)
    val cand = points
      .withColumn("__cell", geo.hex_cell(col("lon"), col("lat"), lit(res)))
      .join(broadcast(cover), col("__cell") === col("cover_cell"), "left")
      .withColumn("__hit",
        col("admin_id").isNotNull &&
          pip_contains(col("admin_id"), col("lon"), col("lat"), registry))
      .withColumn("__any", max(when(col("__hit"), 1).otherwise(0)).over(w))
      .withColumn("__rn", row_number().over(
        w.orderBy(col("__hit").desc, col("admin_id").asc_nulls_last)))
    cand
      .filter(col("__hit") || (col("__any") === 0 && col("__rn") === 1))
      .withColumn("admin_id", when(col("__hit"), col("admin_id")))
      .withColumn("admin_name", when(col("__hit"), col("admin_name")))
      .drop("__cell", "cover_cell", "__hit", "__any", "__rn")
  }

  /** SQL text of the EXACT point-to-triangle squared distance: 0 when
    * the point is inside (half-plane test with the orientation-sum
    * interior side — the q105 discipline, so any ring orientation
    * works), else the min over the three edges of the clamped
    * point-to-segment distance². ONE string consumed BOTH by the engine
    * (via `expr`) and by the DuckDB oracle replay — the two evaluations
    * share their arithmetic text verbatim, so they cannot drift and the
    * doubles come out bit-identical. Constants are spelled
    * CAST(… AS DOUBLE) because DuckDB parses bare decimals as DECIMAL.
    */
  def pointTriDist2Sql(px: String, py: String,
                       v: Seq[(String, String)]): String = {
    require(v.size == 3)
    def orient(p: (String, String), q: (String, String),
               rx: String, ry: String): String =
      s"((${q._1} - ${p._1}) * ($ry - ${p._2}) - " +
        s"(${q._2} - ${p._2}) * ($rx - ${p._1}))"
    val inside = v.indices.map { i =>
      val p = v(i); val q = v((i + 1) % 3)
      val os = v.map(w => orient(p, q, w._1, w._2)).mkString("(", " + ", ")")
      val op = orient(p, q, px, py)
      s"(($os > 0 AND $op >= 0) OR ($os < 0 AND $op <= 0))"
    }.mkString("(", " AND ", ")")
    val edges = v.indices.map { i =>
      val (ax, ay) = v(i); val (bx, by) = v((i + 1) % 3)
      val dx = s"($bx - $ax)"; val dy = s"($by - $ay)"
      val t = s"greatest(CAST(0.0 AS DOUBLE), least(CAST(1.0 AS DOUBLE), " +
        s"((($px - $ax) * $dx + ($py - $ay) * $dy) / ($dx * $dx + $dy * $dy))))"
      s"(((($ax + $t * $dx) - $px) * (($ax + $t * $dx) - $px)) + " +
        s"((($ay + $t * $dy) - $py) * (($ay + $t * $dy) - $py)))"
    }
    s"(CASE WHEN $inside THEN CAST(0.0 AS DOUBLE) " +
      s"ELSE least(${edges.mkString(", ")}) END)"
  }

  /** Nearest-polygon join within a radius: for every point, the CLOSEST
    * registry triangle at most `radiusDeg` away (planar degrees), with
    * its exact squared distance — the proximity companion of the PIP
    * join (inside → dist 0) and of q94's point-point distance band.
    *
    * Scale shape: each triangle's bbox, EXPANDED by the radius, explodes
    * to planar-grid cells (registry-sized fan-out); each point maps to
    * exactly ONE cell, so every candidate pair meets exactly once (no
    * distinct pass) in one cell equi join — a naive dist ≤ r predicate
    * against the registry would plan as a nested loop. The argmin is a
    * point-keyed window ordered (dist2, admin_id) — deterministic under
    * ties because both engines see bit-identical dist2.
    *
    * `tris` columns: (b_id, bx1, by1, bx2, by2, bx3, by3).
    */
  def nearestPolygonWithin(points: DataFrame, tris: DataFrame,
                           radiusDeg: Double, cellDeg: Double,
                           idCol: String = "doc_id"): DataFrame = {
    require(radiusDeg > 0.0 && cellDeg > 0.0)
    import org.apache.spark.sql.expressions.Window
    val xs = Seq(col("bx1"), col("bx2"), col("bx3"))
    val ys = Seq(col("by1"), col("by2"), col("by3"))
    val cover = tris
      .withColumn("__cx0",
        floor((least(xs: _*) - radiusDeg) / cellDeg).cast("long"))
      .withColumn("__cx1",
        floor((greatest(xs: _*) + radiusDeg) / cellDeg).cast("long"))
      .withColumn("__cy0",
        floor((least(ys: _*) - radiusDeg) / cellDeg).cast("long"))
      .withColumn("__cy1",
        floor((greatest(ys: _*) + radiusDeg) / cellDeg).cast("long"))
      .withColumn("__cx", explode(sequence(col("__cx0"), col("__cx1"))))
      .withColumn("__cy", explode(sequence(col("__cy0"), col("__cy1"))))
      .drop("__cx0", "__cx1", "__cy0", "__cy1")
    val pts = points.select(col(idCol), col("lon"), col("lat"),
      floor(col("lon") / cellDeg).cast("long").as("__cx"),
      floor(col("lat") / cellDeg).cast("long").as("__cy"))
    val d2 = expr(pointTriDist2Sql("lon", "lat",
      Seq(("bx1", "by1"), ("bx2", "by2"), ("bx3", "by3"))))
    val w = Window.partitionBy(idCol)
      .orderBy(col("__d2").asc, col("b_id").asc)
    pts.join(cover, Seq("__cx", "__cy"))
      .withColumn("__d2", d2)
      .filter(col("__d2") <= lit(radiusDeg) * lit(radiusDeg))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col(idCol), col("b_id").as("admin_id"),
        round(col("__d2"), 9).as("dist2"))
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact distributed DBSCAN (Ester et al. KDD'96) over planar points —
  * the density clustering that turns a point cloud into labeled hot
  * regions (the cluster-level view above q62's per-cell G* scores).
  *
  * Decomposition into the engine's existing scale-shaped pieces:
  *  1. ε-neighborhood pairs via [[KnnJoin.withinRadius]] — cell-ring
  *     candidates → ONE equi join, never an all-pairs nested loop;
  *  2. core points = one count aggregation over the pairs (a point's
  *     neighborhood INCLUDES itself, the standard minPts convention);
  *  3. clusters = connected components over CORE–CORE edges
  *     ([[Dedup.connectedComponents]] label propagation, eager
  *     checkpoints per superstep) — cluster_id = min member id;
  *  4. border points join the min-cluster_id of their core neighbors
  *     (deterministic tie policy), everything else is noise.
  *
  * Exactness: every step is a closed ≤-threshold or a min — the whole
  * labeling is replayable in SQL (the oracle runs the transitive
  * closure as a recursive CTE; the ENGINE never does — at 10¹² points
  * closure pairs are quadratic in cluster size, while label
  * propagation stays linear per superstep).
  *
  * Scale hazard: the ε-pair set itself is Σ|blob|² over dense blobs —
  * a Zipf-hot city with 10⁶ points inside ε produces 10¹² pairs no
  * candidate scheme can avoid, because exact DBSCAN's core COUNT needs
  * them. The standard remedy at that density is cell-level
  * pre-aggregation (collapse points to fine-cell representatives with
  * weights, run the weighted core condition Σw ≥ minPts — grid DBSCAN),
  * trading exact point labels for cell-resolution labels; wire it
  * upstream of [[cluster]] when blobs outgrow executors.
  */
object Dbscan {

  /** Cluster `points`(idCol, lon, lat) at radius `epsDeg` (planar
    * degrees, closed ≤) with density `minPts` (self-inclusive). `res`
    * sizes the candidate cells (inradius ≈ ε → rings ~2). Returns
    * (idCol, role ∈ core|border|noise, cluster_id; -1 for noise).
    */
  def cluster(points: DataFrame, idCol: String, epsDeg: Double, minPts: Int,
              res: Int = 1): DataFrame =
    clusterST(points, idCol, epsDeg, minPts, res, timeEps = None)

  /** ST-DBSCAN (Birant & Kut 2007): `timeEps = Some((tCol, εt))` adds
    * the temporal reachability predicate |t_q − t_p| ≤ εt (closed, the
    * spatial convention) — two events cluster only when close in space
    * AND time. The 8-byte time column rides BOTH SIDES of the one cell
    * equi join (`withinRadius` carry columns), so the temporal filter
    * applies in the same stage as the distance filter — no join-back of
    * the pair set; everything downstream — core counts, components,
    * border assign — is unchanged.
    */
  def clusterST(points: DataFrame, idCol: String, epsDeg: Double,
                minPts: Int, res: Int,
                timeEps: Option[(String, Double)]): DataFrame = {
    require(minPts >= 1)
    val timed = timeEps.isDefined
    val qs = points.select(
      Seq(col(idCol).as("q_id"), col("lon").as("q_lon"),
        col("lat").as("q_lat")) ++
        timeEps.map { case (tCol, _) =>
          col(tCol).cast("double").as("__tq") }: _*)
    val ps = points.select(
      Seq(col(idCol).as("p_id"), col("lon"), col("lat")) ++
        timeEps.map { case (tCol, _) =>
          col(tCol).cast("double").as("__tp") }: _*)
    val spatial = KnnJoin.withinRadius(qs, ps, epsDeg, res,
      carry = if (timed) Seq("__tq", "__tp") else Nil)
    // all ordered (q, p) pairs with dist ≤ ε (∧ |Δt| ≤ εt), self
    // included — consumed by the count, the core-edge builder, and the
    // border assign
    val pairs = (timeEps match {
      case None => spatial.select("q_id", "p_id")
      case Some((_, et)) =>
        require(et >= 0.0)
        spatial.filter(abs(col("__tq") - col("__tp")) <= lit(et))
          .select("q_id", "p_id")
    }).localCheckpoint(true)
    val cores = pairs.groupBy("q_id").agg(count(lit(1)).as("__n"))
      .filter(col("__n") >= minPts)
      .select(col("q_id").as("id"))
      .localCheckpoint(true)
    // geometric contraction (see contractedCoreLabels): cores keyed by an
    // eps/2 supercell — same-cell cores are pairwise ≤ eps/√2 < eps apart,
    // i.e. true ε-graph neighbors, so components are unchanged. For
    // ST-DBSCAN the supercell gains an εt/2 time slab: same-slab members
    // are within εt, so the temporal edge condition holds inside a cell
    // too (a purely spatial supercell would merge cores that are NOT
    // temporally reachable).
    val s2 = epsDeg / 2.0
    val coreCell = points.select(
      Seq(col(idCol).cast("long").as("id"),
        floor(col("lon") / lit(s2)).cast("long").as("__sc1"),
        floor(col("lat") / lit(s2)).cast("long").as("__sc2")) ++
        timeEps.map { case (tCol, et) =>
          (if (et > 0.0)
             floor(col(tCol).cast("double") / lit(et / 2.0)).cast("long")
           else col(tCol).cast("double")).as("__sc3") }: _*)
      .join(cores, Seq("id"), "left_semi")
    // no checkpoint: both consumers re-derive it as ONE join over the
    // checkpointed coreNode and the (small or checkpointed) component
    // labels — cheaper than another materialization job
    val coreLabels = contractedCoreLabels(pairs, coreCell)
    val borderLabels = pairs
      .join(cores.select(col("id").as("q_id")), Seq("q_id"), "left_anti")
      .join(coreLabels.select(col("id").as("p_id"),
        col("cluster_id")), Seq("p_id"))
      .groupBy("q_id")
      .agg(min(col("cluster_id")).as("cluster_id"))
      .select(col("q_id").as("id"), col("cluster_id"))
    val labeled = coreLabels.withColumn("role", lit("core"))
      .unionByName(borderLabels.withColumn("role", lit("border")))
    points.select(col(idCol).as("id"))
      .join(labeled, Seq("id"), "left")
      .select(col("id").as(idCol),
        coalesce(col("role"), lit("noise")).as("role"),
        coalesce(col("cluster_id"), lit(-1L)).as("cluster_id"))
  }

  /** Grid (weighted) DBSCAN — the dense-blob remedy from the scaladoc
    * above, shipped: points collapse to one representative per
    * `cellDeg`-degree planar cell (center coordinates, weight = point
    * count), the core condition becomes the WEIGHTED density
    * Σ w(reps within ε) ≥ minPts, and components/border run over reps.
    * Every point inherits its rep's label, so the ε-pair set is bounded
    * by occupied-CELL geometry — a 10⁶-point hot blob contributes a
    * handful of rep pairs instead of 10¹² point pairs — at the cost of
    * cell-resolution labels (pick cellDeg ≪ ε; the standard grid-DBSCAN
    * trade).
    *
    * Deterministic + SQL-replayable end to end: reps are floor-grid
    * cells (rep_id = cx·100000 + cy, exact integers), distances are the
    * fixed-order center-to-center formula, weights are exact counts.
    * Returns (idCol, role, cluster_id = min rep_id of the component;
    * −1 noise).
    */
  def clusterGrid(points: DataFrame, idCol: String, epsDeg: Double,
                  minPts: Int, cellDeg: Double, res: Int = 1): DataFrame = {
    require(minPts >= 1 && cellDeg >= 0.01) // rep_id packing bound
    val withCell = points
      .withColumn("__cx",
        floor((col("lon") + lit(180.0)) / lit(cellDeg)).cast("long"))
      .withColumn("__cy",
        floor((col("lat") + lit(90.0)) / lit(cellDeg)).cast("long"))
      .withColumn("__rep", col("__cx") * lit(100000L) + col("__cy"))
    val reps = withCell.groupBy("__cx", "__cy", "__rep")
      .agg(count(lit(1)).as("__w"))
      .withColumn("__rlon",
        (col("__cx").cast("double") + lit(0.5)) * lit(cellDeg) - lit(180.0))
      .withColumn("__rlat",
        (col("__cy").cast("double") + lit(0.5)) * lit(cellDeg) - lit(90.0))
      .localCheckpoint(true)
    val qs = reps.select(col("__rep").as("q_id"), col("__rlon").as("q_lon"),
      col("__rlat").as("q_lat"))
    val ps = reps.select(col("__rep").as("p_id"), col("__rlon").as("lon"),
      col("__rlat").as("lat"), col("__w"))
    // the rep weight rides the ONE cell equi join as a carry column, so
    // the weighted core count needs no join-back against the rep table
    val pairs = KnnJoin.withinRadius(qs, ps, epsDeg, res, carry = Seq("__w"))
      .select("q_id", "p_id", "__w").localCheckpoint(true)
    val cores = pairs
      .groupBy("q_id").agg(sum("__w").as("__n"))
      .filter(col("__n") >= minPts)
      .select(col("q_id").as("id"))
      .localCheckpoint(true)
    // geometric contraction over k×k lattice blocks, k·cellDeg ≤ eps/2:
    // same-block rep centers are pairwise < eps/√2 < eps apart (true
    // ε-graph neighbors), so components over the contracted graph equal
    // components over the full core-core edge set
    val k = math.max(1L, math.floor((epsDeg / 2.0) / cellDeg).toLong)
    val coreCell = reps.select(col("__rep").as("id"),
        floor(col("__cx") / lit(k)).cast("long").as("__sc1"),
        floor(col("__cy") / lit(k)).cast("long").as("__sc2"))
      .join(cores, Seq("id"), "left_semi")
    // no checkpoint — same reasoning as clusterST's coreLabels
    val coreLabels = contractedCoreLabels(pairs.select("q_id", "p_id"),
        coreCell)
    val borderLabels = pairs
      .join(cores.select(col("id").as("q_id")), Seq("q_id"), "left_anti")
      .join(coreLabels.select(col("id").as("p_id"), col("cluster_id")),
        Seq("p_id"))
      .groupBy("q_id").agg(min(col("cluster_id")).as("cluster_id"))
      .select(col("q_id").as("id"), col("cluster_id"))
    val labeled = coreLabels.withColumn("role", lit("core"))
      .unionByName(borderLabels.withColumn("role", lit("border")))
    withCell.select(col(idCol), col("__rep").as("id"))
      .join(labeled, Seq("id"), "left")
      .select(col(idCol),
        coalesce(col("role"), lit("noise")).as("role"),
        coalesce(col("cluster_id"), lit(-1L)).as("cluster_id"))
  }

  /** Core labels via GEOMETRIC CONTRACTION of the core-core ε-graph —
    * the optimization that keeps connected components off the full pair
    * set. `coreCell` maps every core id to a supercell (columns named
    * `__sc*`) chosen by the caller so that any two members of one
    * supercell are TRUE ε-graph neighbors (pairwise distance ≤ eps/√2 <
    * eps; for ST also |Δt| ≤ εt). Then:
    *
    *  - contraction only adds edges that exist in the true graph
    *    (intra-cell cliques), and every true edge survives as a
    *    supercell edge or intra-cell pair ⇒ components are IDENTICAL;
    *  - the supernode id is the min core id of its cell (unique — cells
    *    partition the cores), so the component minimum over supernodes
    *    IS the component minimum over cores — the exact label the
    *    uncontracted closure computes.
    *
    * The contracted edge set is bounded by occupied-supercell geometry
    * (cells of size eps/2 — the world holds ≤ 360·180/(eps/2)² of them),
    * not by |pairs|: a 10⁸-member dense blob contributes a handful of
    * supercell edges instead of 10¹⁶ core-core edges through the
    * component supersteps. Returns (id, cluster_id) for every core.
    */
  private def contractedCoreLabels(pairs: DataFrame,
                                   coreCell: DataFrame): DataFrame = {
    val scCols = coreCell.columns.filter(_.startsWith("__sc")).toSeq
    val cellMin = coreCell.groupBy(scCols.map(col): _*)
      .agg(min(col("id")).as("__cid"))
    val coreNode = coreCell.join(cellMin, scCols)
      .select(col("id"), col("__cid"))
      .localCheckpoint(true)
    // inner joins double as the old core/core semi-filters: only pairs
    // with BOTH endpoints core survive, now carrying their supernode ids
    val superEdges = pairs
      .join(coreNode.select(col("id").as("q_id"), col("__cid").as("__ca")),
        Seq("q_id"))
      .join(coreNode.select(col("id").as("p_id"), col("__cid").as("__cb")),
        Seq("p_id"))
      .filter(col("__ca") =!= col("__cb"))
      .select(col("__ca").as("id_a"), col("__cb").as("id_b"))
    val cc = Dedup.connectedComponents(superEdges)
    coreNode.join(cc, coreNode("__cid") === cc("id"), "left")
      .select(coreNode("id"),
        coalesce(col("cluster_id"), col("__cid")).as("cluster_id"))
  }

  /** Hot-region polygons: the convex hull of every cluster's member
    * points (core + border; noise excluded) — what a tile layer
    * displays on top of the point density. Labels join back to
    * coordinates, then the hull runs in TWO bounded stages:
    *
    *  1. partial hulls per (cluster_id, `preCellDeg`-degree coarse
    *     cell) — the monotone-chain kernel over each cell's members;
    *  2. the final hull per cluster over the UNION of partial-hull
    *     vertices.
    *
    * Exactness: the strict-corner kernel keeps exactly the extreme
    * points of its input, and an extreme point of the whole cluster is
    * extreme in any subset containing it — so every global hull vertex
    * survives stage 1, and hull(∪ partials) == hull(all members)
    * bit-for-bit (DbscanSpec pins the property on random inputs). The
    * payoff at scale: no task ever materializes a whole cluster — a
    * percolated planetary cluster (10⁸+ members) reduces to per-cell
    * vertex sets bounded by each cell's hull size, and stage 2 sees
    * only those vertices. Returns (cluster_id, n_pts, n_hull, area,
    * wkt) — wkt a closed CCW `POLYGON ((…))` at 6 dp (LINESTRING for
    * degenerate ≤2-point hulls), area the shoelace value rounded 6 dp.
    */
  def clusterHulls(points: DataFrame, idCol: String, epsDeg: Double,
                   minPts: Int, res: Int = 1,
                   preCellDeg: Double = 15.0): DataFrame = {
    val labels = cluster(points, idCol, epsDeg, minPts, res)
      .filter(col("role") =!= "noise")
      .select(col(idCol).as("__id"), col("cluster_id"))
    hullsOfLabels(points, idCol, labels, preCellDeg)
  }

  /** [[clusterHulls]] with GRID (weighted) DBSCAN labeling — the
    * dense-blob scale path for the hot-region product: labels come from
    * [[clusterGrid]] (ε-pair set bounded by occupied-cell geometry, not
    * Σ|blob|² point pairs), hulls still run over the actual member
    * POINTS, so the polygons keep full point resolution even though the
    * density labels are cell-resolution. On blob-shaped input this is
    * the difference between minutes and seconds at 10⁵ points — and
    * between feasible and intractable at 10⁸.
    */
  def clusterGridHulls(points: DataFrame, idCol: String, epsDeg: Double,
                       minPts: Int, cellDeg: Double, res: Int = 1,
                       preCellDeg: Double = 15.0): DataFrame = {
    val labels = clusterGrid(points, idCol, epsDeg, minPts, cellDeg, res)
      .filter(col("role") =!= "noise")
      .select(col(idCol).as("__id"), col("cluster_id"))
    hullsOfLabels(points, idCol, labels, preCellDeg)
  }

  /** Shared hull stage: coordinates × non-noise labels → one polygon per
    * cluster via the partial-hull pre-reduce documented on
    * [[clusterHulls]]. `labels` must be (__id, cluster_id).
    */
  private def hullsOfLabels(points: DataFrame, idCol: String,
                            labels: DataFrame,
                            preCellDeg: Double): DataFrame = {
    require(preCellDeg > 0.0)
    val spark = points.sparkSession
    import spark.implicits._
    val members = points.select(col(idCol).as("__id"), col("lon"), col("lat"))
      .join(labels, Seq("__id"))
      .select(col("cluster_id"), col("lon"), col("lat"),
        floor(col("lon") / lit(preCellDeg)).cast("long").as("__gx"),
        floor(col("lat") / lit(preCellDeg)).cast("long").as("__gy"))
      .as[(Long, Double, Double, Long, Long)]
    // stage 1: per-(cluster, coarse-cell) partial hulls — each task holds
    // one cell's members, never the cluster
    val partials = members
      .groupByKey(r => (r._1, r._4, r._5))
      .mapGroups { (k, it) =>
        val pts = it.map(p => (p._2, p._3)).toArray
        (k._1, pts.length.toLong, graft.core.ConvexHull.hull(pts))
      }
    // stage 2: final hull over partial-hull VERTICES only
    partials
      .groupByKey(_._1)
      .mapGroups { (cid, it) =>
        var n = 0L
        val vs = scala.collection.mutable.ArrayBuffer.empty[(Double, Double)]
        it.foreach { case (_, c, h) => n += c; vs ++= h }
        val h = graft.core.ConvexHull.hull(vs.toArray)
        def fmt(p: (Double, Double)): String =
          String.format(java.util.Locale.ROOT, "%.6f %.6f",
            p._1.asInstanceOf[AnyRef], p._2.asInstanceOf[AnyRef])
        val wkt =
          if (h.length >= 3)
            (h :+ h.head).map(fmt).mkString("POLYGON ((", ", ", "))")
          else h.map(fmt).mkString("LINESTRING (", ", ", ")")
        val area = BigDecimal.valueOf(graft.core.ConvexHull.area(h))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        (cid, n, h.length.toLong, area, wkt)
      }
      .toDF("cluster_id", "n_pts", "n_hull", "area", "wkt")
  }
}

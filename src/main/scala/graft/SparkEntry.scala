package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — one `queries` entry per implemented operator
  * (SURVEY.md §2), with a DuckDB-runnable oracle in `oracleSql` wherever
  * the operator is SQL-expressible. Column names are aliased identically
  * on both sides (driver hashes by sorted column name).
  */
object SparkEntry {
  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** Deterministic derived point cloud from `documents` — identical
    * arithmetic is used in the DuckDB oracles (pure IEEE-double ops), so
    * geo assignments are cross-checkable without shipping our page table.
    */
  private def derivedPoints(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents").select("doc_id")
    d.withColumn("lon", col("doc_id") * lit(17.000170000017) -
        floor(col("doc_id") * lit(17.000170000017) / 360.0) * 360.0 - 180.0)
      .withColumn("lat", col("doc_id") * lit(7.000070000007) -
        floor(col("doc_id") * lit(7.000070000007) / 170.0) * 170.0 - 85.0)
  }

  private val derivedPointsSql =
    """SELECT doc_id,
      |  doc_id * 17.000170000017 - floor(doc_id * 17.000170000017 / 360.0) * 360.0 - 180.0 AS lon,
      |  doc_id * 7.000070000007 - floor(doc_id * 7.000070000007 / 170.0) * 170.0 - 85.0 AS lat
      |FROM documents""".stripMargin

  /** Flagship: end-to-end geoparse → cell encode → tile pipeline on a
    * small synthetic page table.
    */
  def entry(spark: SparkSession): DataFrame = {
    val pages = graft.sources.SynthPages.pagesDF(spark, 2000)
    graft.operators.GeoPipeline.pagesToFeatures(spark, pages)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- relational core (scan, filter, agg, join, window) ----
    "q01_pricing_summary" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum("l_quantity"), 4).as("sum_qty"),
          round(sum("l_extendedprice"), 4).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 4)
            .as("sum_disc_price"),
          round(avg("l_quantity"), 4).as("avg_qty"),
          round(avg("l_discount"), 4).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }),
    "q02_revenue_by_nation" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      val n = t(s, dir, "nation")
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy("n_name")
        .agg(
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 4)
            .as("revenue"),
          count(lit(1)).as("n_lines"))
        .orderBy("n_name")
    }),
    "q03_top_orders_per_customer" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      t(s, dir, "orders")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .withColumn("rn", col("rn").cast("long"))
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    }),
    // ---- geospatial: tile assignment (WebMercator, SQL-parity form) ----
    "q10_tile_assign" -> ((s, dir) => {
      val pts = derivedPoints(s, dir)
      def tx(z: Int) = floor((col("lon") + 180.0) / 360.0 * (1 << z)).cast("long")
      def ty(z: Int) = floor((lit(1.0) -
        log(tan(lit(math.Pi / 4.0) + radians(col("lat")) / 2.0)) / math.Pi) / 2.0 * (1 << z))
        .cast("long")
      pts.select(col("doc_id"),
          round(col("lon"), 6).as("lon_r"), round(col("lat"), 6).as("lat_r"),
          tx(8).as("x8"), ty(8).as("y8"), tx(12).as("x12"), ty(12).as("y12"))
    }),
    "q11_tile_counts" -> ((s, dir) => {
      val pts = derivedPoints(s, dir)
      pts.select(
          floor((col("lon") + 180.0) / 360.0 * 64.0).cast("long").as("x6"),
          floor((lit(1.0) - log(tan(lit(math.Pi / 4.0) + radians(col("lat")) / 2.0))
            / math.Pi) / 2.0 * 64.0).cast("long").as("y6"))
        .groupBy("x6", "y6").agg(count(lit(1)).as("n_points"))
    }),
    // ---- text analysis (training-data ops; pure Catalyst columns) ----
    "q20_text_stats" -> ((s, dir) => {
      import graft.operators.TextAnalysis._
      t(s, dir, "documents").select(
        col("doc_id"),
        tokenCount(col("text")).cast("long").as("n_tokens"),
        charCount(col("text")).cast("long").as("n_chars_calc"),
        round(punctRatio(col("text")), 6).as("punct_ratio"),
        round(stopwordRatio(col("text")), 6).as("stop_ratio"),
        round(meanWordLen(col("text")), 6).as("mean_word_len"))
    }),
    "q21_dedup_exact" -> ((s, dir) => {
      t(s, dir, "documents")
        .groupBy("text")
        .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_copies"))
        .select("keep_id", "n_copies", "text")
    }),
    "q22_langid" -> ((s, dir) => {
      import graft.operators.TextAnalysis._
      t(s, dir, "documents")
        .select(col("doc_id"), langId(col("text")).as("lang_pred"))
    }),
    // ---- fingerprint / simhash (custom codegen'd exprs; rows-only check) ----
    "q23_fingerprint" -> ((s, dir) => {
      t(s, dir, "documents").select(
        col("doc_id"),
        graft.functions.text.fingerprint64(col("text")).as("fp64"),
        graft.functions.text.simhash64(col("text")).as("simhash"))
    })
  )

  def oracleSql: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 4) AS sum_qty,
        |  round(sum(l_extendedprice), 4) AS sum_base_price,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 4) AS sum_disc_price,
        |  round(avg(l_quantity), 4) AS avg_qty,
        |  round(avg(l_discount), 4) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q02_revenue_by_nation" ->
      """SELECT n_name,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 4) AS revenue,
        |  count(*) AS n_lines
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "q03_top_orders_per_customer" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        |  FROM orders) WHERE rn <= 3""".stripMargin,
    "q10_tile_assign" ->
      s"""WITH pts AS ($derivedPointsSql)
         |SELECT doc_id, round(lon, 6) AS lon_r, round(lat, 6) AS lat_r,
         |  CAST(floor((lon + 180.0) / 360.0 * 256.0) AS BIGINT) AS x8,
         |  CAST(floor((1.0 - ln(tan(pi() / 4.0 + radians(lat) / 2.0)) / pi()) / 2.0 * 256.0) AS BIGINT) AS y8,
         |  CAST(floor((lon + 180.0) / 360.0 * 4096.0) AS BIGINT) AS x12,
         |  CAST(floor((1.0 - ln(tan(pi() / 4.0 + radians(lat) / 2.0)) / pi()) / 2.0 * 4096.0) AS BIGINT) AS y12
         |FROM pts""".stripMargin,
    "q11_tile_counts" ->
      s"""WITH pts AS ($derivedPointsSql)
         |SELECT CAST(floor((lon + 180.0) / 360.0 * 64.0) AS BIGINT) AS x6,
         |  CAST(floor((1.0 - ln(tan(pi() / 4.0 + radians(lat) / 2.0)) / pi()) / 2.0 * 64.0) AS BIGINT) AS y6,
         |  count(*) AS n_points
         |FROM pts GROUP BY 1, 2""".stripMargin,
    "q20_text_stats" ->
      """SELECT doc_id,
        |  CASE WHEN length(trim(text)) = 0 THEN 0
        |       ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_tokens,
        |  length(text) AS n_chars_calc,
        |  round(CASE WHEN length(text) = 0 THEN 0.0
        |    ELSE (length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g'))) * 1.0 / length(text) END, 6) AS punct_ratio,
        |  round(CASE WHEN length(trim(text)) = 0 THEN 0.0
        |    ELSE len(list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
        |      t -> t IN ('the','a','an','and','or','of','to','in','is','it','on','for','with','as','by','at'))) * 1.0
        |      / len(regexp_split_to_array(lower(trim(text)), '\s+')) END, 6) AS stop_ratio,
        |  round(CASE WHEN length(trim(text)) = 0 THEN 0.0
        |    ELSE list_sum(list_transform(regexp_split_to_array(trim(text), '\s+'), t -> length(t))) * 1.0
        |      / len(regexp_split_to_array(trim(text), '\s+')) END, 6) AS mean_word_len
        |FROM documents""".stripMargin,
    "q21_dedup_exact" ->
      """SELECT min(doc_id) AS keep_id, count(*) AS n_copies, text
        |FROM documents GROUP BY text""".stripMargin,
    "q22_langid" ->
      """SELECT doc_id,
        |  CASE
        |    WHEN de_n = gm AND gm > 0 THEN 'de'
        |    WHEN en_n = gm AND gm > 0 THEN 'en'
        |    WHEN es_n = gm AND gm > 0 THEN 'es'
        |    WHEN fr_n = gm AND gm > 0 THEN 'fr'
        |    ELSE 'und' END AS lang_pred
        |FROM (
        |  SELECT doc_id,
        |    len(list_filter(toks, t -> t IN ('die','und','mit','das','durch','viele'))) AS de_n,
        |    len(list_filter(toks, t -> t IN ('the','and','with','from','who','about'))) AS en_n,
        |    len(list_filter(toks, t -> t IN ('el','los','con','por','una','sus'))) AS es_n,
        |    len(list_filter(toks, t -> t IN ('la','les','avec','dans','une','leurs'))) AS fr_n,
        |    greatest(
        |      len(list_filter(toks, t -> t IN ('die','und','mit','das','durch','viele'))),
        |      len(list_filter(toks, t -> t IN ('the','and','with','from','who','about'))),
        |      len(list_filter(toks, t -> t IN ('el','los','con','por','una','sus'))),
        |      len(list_filter(toks, t -> t IN ('la','les','avec','dans','une','leurs')))) AS gm
        |  FROM (SELECT doc_id,
        |          regexp_split_to_array(lower(trim(text)), '\s+') AS toks
        |        FROM documents))""".stripMargin
    // q23_fingerprint: custom 64-bit hash exprs — not SQL-expressible;
    // driver records rows-only check.
  )
}

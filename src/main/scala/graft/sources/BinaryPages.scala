package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Page ingestion from raw HTML files via the binaryFile source — the
  * reference's glob scan → per-file parse shape (reference:
  * mvt/discover.py:4-6 `list_s1d_files` sorted glob; mvt/io_espre.py
  * `read_s1d` per-file parse). Parse = the frozen TextExtract rule via
  * the same codegen'd path used everywhere.
  */
object BinaryPages {
  /** Write a page table out as individual .html files (fixture helper /
    * export sink).
    */
  def writeHtmlFiles(pages: DataFrame, dir: String): Unit = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    pages.select("url", "html").collect().foreach { r =>
      val url = r.getString(0)
      val name = url.replaceAll("[^a-zA-Z0-9]+", "_") + ".html"
      java.nio.file.Files.write(
        java.nio.file.Paths.get(dir, name), r.getAs[Array[Byte]](1))
    }
  }

  /** Glob-scan a directory of HTML files → (path, html, text) with the
    * frozen extraction rule applied — one codegen'd expression, no
    * closure udf, no global sort (a 100 TB scan must not Exchange before
    * extraction; callers that need an order sort their own, smaller,
    * derived output).
    */
  def readHtmlDir(spark: SparkSession, dir: String,
                  glob: String = "*.html"): DataFrame = {
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(dir)
      .select(col("path"), col("content").as("html"))
      .withColumn("text", graft.functions.text.extract_text(col("html")))
  }
}

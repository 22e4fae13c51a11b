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

  private val WarcMark = "WARC/1.0\r\n"

  /** Write pages as WARC-style response records (public ISO 28500 record
    * layout: version line, named headers, blank line, payload) — fixture
    * helper / export sink, one .warc file per call.
    */
  def writeWarcFile(pages: DataFrame, path: String): Unit = {
    val p = java.nio.file.Paths.get(path)
    if (p.getParent != null) java.nio.file.Files.createDirectories(p.getParent)
    val out = new java.io.BufferedOutputStream(
      java.nio.file.Files.newOutputStream(p))
    try pages.select("url", "html").collect().foreach { r =>
      val html = r.getAs[Array[Byte]]("html")
      val head = (WarcMark +
        "WARC-Type: response\r\n" +
        s"WARC-Target-URI: ${r.getString(0)}\r\n" +
        s"Content-Length: ${html.length}\r\n" +
        "\r\n").getBytes("UTF-8")
      out.write(head); out.write(html); out.write("\r\n\r\n".getBytes("UTF-8"))
    } finally out.close()
  }

  /** Distributed WARC-style ingest: the file is split on the record
    * marker by the text source's custom line separator (Hadoop line
    * reader handles records spanning input splits — the same mechanics
    * that make plain-text splittable make WARC splittable), then the
    * header fields and payload are pure-column parses, and the payload
    * flows through the same codegen'd extract_text as every other page
    * source. Caveat (documented): the text source decodes UTF-8, so this
    * path is for text payloads; binary payloads need the same record
    * split on a bytes-preserving input format.
    */
  def readWarcDir(spark: SparkSession, dir: String,
                  glob: String = "*.warc"): DataFrame = {
    val sep = "\r\n\r\n"
    spark.read
      .option("lineSep", WarcMark)
      .option("pathGlobFilter", glob)
      .text(dir)
      .filter(length(trim(col("value"))) > 0)
      .select(
        regexp_extract(col("value"), "WARC-Target-URI: (\\S+)", 1).as("url"),
        // payload = after the FIRST header/payload blank line (headers
        // never contain one; the payload may), minus the trailing
        // record terminator
        regexp_replace(
          col("value").substr(instr(col("value"), sep) + 4,
            length(col("value"))),
          "\r\n\r\n\\s*$", "").as("html_str"))
      .filter(col("url") =!= "")
      .withColumn("html", col("html_str").cast("binary"))
      .withColumn("text", graft.functions.text.extract_text(col("html")))
      .drop("html_str")
  }
}

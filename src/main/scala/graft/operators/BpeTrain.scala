package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed BPE merge training (Sennrich et al. 2016): learn the
  * merge table from the corpus itself. The scale insight is that BPE
  * trains on the WORD-TYPE dictionary weighted by frequency, not on
  * corpus positions — so the working set after the first aggregation is
  * vocabulary-sized (millions of rows at web scale, not trillions), and
  * each merge iteration is ONE pair-count aggregation (map-side partials
  * over the dict) plus ONE map applying the chosen merge. The argmax is
  * a single-row agg, not a collect of the counts.
  *
  * Determinism: ties on pair count break by lexicographic pair order, so
  * the merge sequence is a pure function of the corpus. The dict is
  * localCheckpoint'ed per iteration (same iterative-DF discipline as
  * connectedComponents / CellCompact).
  */
object BpeTrain {
  /** End-of-word marker (standard: distinguishes "est</w>" from "est"). */
  final val Eow = "</w>"

  /** Learn `nMerges` merges from whitespace-tokenized, lowercased text.
    * Returns the ordered merge list [(left, right), …].
    */
  def trainMerges(docs: DataFrame, textCol: String,
                  nMerges: Int, minPairCount: Long = 2L): Seq[(String, String)] = {
    val spark = docs.sparkSession
    import spark.implicits._
    // word-type dictionary with frequencies: the one corpus-sized pass
    val words = docs
      .select(explode(split(lower(trim(col(textCol))), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("freq"))
    // initial symbol sequence: characters + end-of-word marker
    var dict = words.select(col("freq"),
        concat(split(col("w"), ""), array(lit(Eow))).as("syms"))
      .localCheckpoint(true)

    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var i = 0
    var done = false
    while (i < nMerges && !done) {
      val pairs = dict.select(col("freq"),
          explode(transform(sequence(lit(1), size(col("syms")) - 1),
            k => struct(element_at(col("syms"), k).as("a"),
              element_at(col("syms"), k + 1).as("b")))).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum("freq").as("n"))
      // single-row argmax with the deterministic tie-break baked into the
      // ordering struct — no counts ever reach the driver
      val top = pairs
        .agg(max(struct(col("n"), struct(negate_lex(col("a")), negate_lex(col("b")))
          .as("inv"), col("a").as("ma"), col("b").as("mb"))).as("m"))
        .select(col("m.n"), col("m.ma"), col("m.mb"))
        .head()
      if (top.isNullAt(0) || top.getLong(0) < minPairCount) done = true
      else {
        val (a, b) = (top.getString(1), top.getString(2))
        merges += ((a, b))
        dict = dict.withColumn("syms", applyMerge(col("syms"), a, b))
          .localCheckpoint(true)
        i += 1
      }
    }
    merges.toSeq
  }

  /** max(struct(n, inv, …)) picks highest n; among ties, the LOWEST
    * lexicographic (a, b) must win, so invert the string ordering by
    * negating each char code into a sortable string.
    */
  private def negate_lex(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    // map each code point → fixed-width hex of (0x10FFFF − code), so
    // larger sorts mean smaller strings. Hex digits [0-9A-F] are
    // ASCII-ordered, so comparing the concatenation compares negated
    // code points positionally for the FULL Unicode range (Spark's
    // `chr` masks its argument to 0xFF, so a chr-based negation would
    // wrap mod 256 beyond Latin-1). Append 'G' (> any hex digit) as
    // the terminator so a PREFIX (lexicographically smaller original)
    // still sorts larger than its extensions.
    val negChar = transform(split(c, ""),
      ch => lpad(hex(lit(0x10FFFF) - ascii(ch)), 6, "0"))
    concat(array_join(negChar, ""), lit("G"))
  }

  /** Replace every adjacent (a, b) with the merged symbol, left-to-right
    * non-overlapping (aggregate fold over the symbol array — pure columns).
    */
  def applyMerge(syms: org.apache.spark.sql.Column, a: String, b: String)
      : org.apache.spark.sql.Column = {
    val merged = a + b
    aggregate(syms,
      array().cast("array<string>"),
      (acc, s) => {
        val appended = concat(acc, array(s))
        // nested when: element_at/slice sit inside the size>0 branch so
        // ANSI mode never evaluates them on the empty accumulator
        when(size(acc) > 0,
          when(element_at(acc, size(acc)) === a && s === b,
            concat(slice(acc, lit(1), size(acc) - 1), array(lit(merged))))
            .otherwise(appended))
          .otherwise(appended)
      })
  }

  /** Tokenize words with a trained merge list (applies merges in order) —
    * the batch encode path; per-row pure column work.
    */
  def encode(docs: DataFrame, textCol: String,
             merges: Seq[(String, String)]): DataFrame = {
    val words = docs.withColumn("__w",
      explode(split(lower(trim(col(textCol))), "\\s+")))
    val init = concat(split(col("__w"), ""), array(lit(Eow)))
    val finalSyms = merges.foldLeft(init) { case (syms, (a, b)) =>
      applyMerge(syms, a, b)
    }
    words.withColumn("bpe_tokens", finalSyms).drop("__w")
  }
}

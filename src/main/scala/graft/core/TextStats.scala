package graft.core

/** Word-level repetition metrics for webtext quality filtering — the
  * Gopher/C4 rule family (duplicate n-gram fraction, most-common-token
  * share). Public-rule provenance: Rae et al. 2021 (Gopher) §A1.1 quality
  * heuristics, Raffel et al. 2020 (C4) repetition filters. One pass per
  * metric over the token array; tokenization is trim + `\s+` split,
  * byte-identical to the q20 text-stats oracle convention.
  */
object TextStats {
  /** Returns [n_words, distinct_word_frac, dup_2gram_frac, top_word_frac,
    * top_2gram_frac] as doubles (n_words integral; empty text → zeros).
    */
  def repetition(s: String): Array[Double] = {
    val trimmed = s.trim
    if (trimmed.isEmpty) return Array(0.0, 0.0, 0.0, 0.0, 0.0)
    val toks = trimmed.split("\\s+")
    val n = toks.length
    val wordCounts = new java.util.HashMap[String, Integer](n * 2)
    var i = 0
    while (i < n) {
      val prev = wordCounts.get(toks(i))
      wordCounts.put(toks(i), if (prev == null) 1 else prev + 1)
      i += 1
    }
    var topW = 0
    val wit = wordCounts.values().iterator()
    while (wit.hasNext) { val c = wit.next().intValue(); if (c > topW) topW = c }
    val nDist = wordCounts.size

    var dupBigramFrac = 0.0
    var topBigramFrac = 0.0
    if (n >= 2) {
      val bigramCounts = new java.util.HashMap[String, Integer](n * 2)
      i = 0
      while (i < n - 1) {
        val k = toks(i) + " " + toks(i + 1)
        val prev = bigramCounts.get(k)
        bigramCounts.put(k, if (prev == null) 1 else prev + 1)
        i += 1
      }
      var topB = 0
      val bit = bigramCounts.values().iterator()
      while (bit.hasNext) { val c = bit.next().intValue(); if (c > topB) topB = c }
      dupBigramFrac = 1.0 - bigramCounts.size.toDouble / (n - 1)
      topBigramFrac = topB.toDouble / (n - 1)
    }
    Array(n.toDouble, nDist.toDouble / n, dupBigramFrac,
      topW.toDouble / n, topBigramFrac)
  }

  /** The 16-word English stopword list shared by the stopword-ratio and
    * Gopher-gate operators (single source of truth for both the Spark and
    * oracle sides).
    */
  val stopwords: Seq[String] = Seq("the", "a", "an", "and", "or", "of", "to",
    "in", "is", "it", "on", "for", "with", "as", "by", "at")

  private val stopSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](stopwords.size * 2)
    stopwords.foreach(s.add)
    s
  }

  /** Gopher-gate metrics in one token pass: [n_words, mean_word_len,
    * n_stopwords, top_word_frac, dup_2gram_frac]. Word length counts
    * Unicode code points (matching SQL length() semantics); stopword
    * membership is on the ROOT-lowercased token. Empty text → zeros.
    */
  def gopher(s: String): Array[Double] = {
    val trimmed = s.trim
    if (trimmed.isEmpty) return Array(0.0, 0.0, 0.0, 0.0, 0.0)
    val toks = trimmed.split("\\s+")
    val n = toks.length
    val wordCounts = new java.util.HashMap[String, Integer](n * 2)
    var chars = 0L
    var nStop = 0
    var i = 0
    while (i < n) {
      val t = toks(i)
      chars += t.codePointCount(0, t.length)
      if (stopSet.contains(t.toLowerCase(java.util.Locale.ROOT))) nStop += 1
      val prev = wordCounts.get(t)
      wordCounts.put(t, if (prev == null) 1 else prev + 1)
      i += 1
    }
    var topW = 0
    val wit = wordCounts.values().iterator()
    while (wit.hasNext) { val c = wit.next().intValue(); if (c > topW) topW = c }

    var dupBigramFrac = 0.0
    if (n >= 2) {
      val bigramCounts = new java.util.HashSet[String](n * 2)
      i = 0
      while (i < n - 1) {
        bigramCounts.add(toks(i) + " " + toks(i + 1))
        i += 1
      }
      dupBigramFrac = 1.0 - bigramCounts.size.toDouble / (n - 1)
    }
    Array(n.toDouble, chars.toDouble / n, nStop.toDouble,
      topW.toDouble / n, dupBigramFrac)
  }
}

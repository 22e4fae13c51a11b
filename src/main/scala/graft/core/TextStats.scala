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
}

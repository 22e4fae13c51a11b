package graft.core

/** Deterministic text hashing kernels: fingerprint, SimHash, MinHash.
  * Static methods so Catalyst codegen can call them (same pattern as the
  * cell encoders). All hashes are pure functions of the text — identical
  * at any parallelism.
  */
object TextHash {
  /** 64-bit polynomial rolling fingerprint over UTF-16 code units
    * (basis 1000003), length-mixed — the document-fingerprint operator.
    */
  def fingerprint64(s: String): Long = {
    if (s == null) return 0L
    var h = 0xcbf29ce484222325L
    var i = 0
    val n = s.length
    while (i < n) { h = h * 1000003L + s.charAt(i); i += 1 }
    h ^ (n.toLong << 1)
  }

  /** Whitespace tokenization (pinned: split on runs of whitespace, lowercase). */
  def tokens(s: String): Array[String] = {
    if (s == null) return Array.empty
    val t = s.trim.toLowerCase(java.util.Locale.ROOT)
    if (t.isEmpty) Array.empty else t.split("\\s+")
  }

  /** Word n-gram shingle hashes. */
  def shingleHashes(s: String, n: Int): Array[Long] = {
    val toks = tokens(s)
    if (toks.length < n) {
      if (toks.isEmpty) Array.empty
      else Array(Rng.mix64(fingerprint64(toks.mkString(" "))))
    } else {
      val out = new Array[Long](toks.length - n + 1)
      var i = 0
      while (i <= toks.length - n) {
        var h = 0xcbf29ce484222325L
        var j = 0
        while (j < n) { h = Rng.mix64(h ^ fingerprint64(toks(i + j))); j += 1 }
        out(i) = h
        i += 1
      }
      out
    }
  }

  /** SimHash-64 over token unigrams: sign-sum of per-token hash bits. */
  def simhash64(s: String): Long = {
    val toks = tokens(s)
    if (toks.isEmpty) return 0L
    val counts = new Array[Int](64)
    var i = 0
    while (i < toks.length) {
      val h = Rng.mix64(fingerprint64(toks(i)))
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (counts(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  @inline def hamming64(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  /** MinHash signature: k minima of seeded re-hashes of word-`shingle`-gram
    * hashes. Empty text → Long.MaxValue everywhere.
    */
  def minhash(s: String, k: Int, shingle: Int): Array[Long] = {
    val sh = shingleHashes(s, shingle)
    val sig = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < sh.length) {
      var j = 0
      while (j < k) {
        val h = Rng.mix64(sh(i) ^ (0x9E3779B97F4A7C15L * (j + 1)))
        if (h < sig(j)) sig(j) = h
        j += 1
      }
      i += 1
    }
    sig
  }

  /** LSH band key: hash of `rowsPerBand` consecutive signature entries. */
  def bandKey(sig: Array[Long], band: Int, rowsPerBand: Int): Long = {
    var h = 0x2545F4914F6CDD1DL ^ band.toLong
    var i = band * rowsPerBand
    val end = math.min(sig.length, i + rowsPerBand)
    while (i < end) { h = Rng.mix64(h ^ sig(i)); i += 1 }
    h
  }

  /** Distinct word n-gram shingles as STRINGS, first-occurrence order —
    * semantics pinned to the SQL form `array_distinct(n-grams of
    * lower(trim(text)) split on \s+)`, with the short-text fallback of a
    * single all-tokens gram. One static call replaces an interpreted
    * HOF pipeline (transform/element_at/concat_ws are not codegen'd and
    * dominated the n-gram dedup runtime ~4×).
    */
  def wordNgrams(s: String, n: Int): Array[String] = {
    val toks = tokens(s)
    val out = new java.util.LinkedHashSet[String]()
    if (toks.length < n) {
      out.add(toks.mkString(" "))
    } else {
      val sb = new java.lang.StringBuilder(64)
      var i = 0
      while (i <= toks.length - n) {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j))
          j += 1
        }
        out.add(sb.toString)
        i += 1
      }
    }
    out.toArray(new Array[String](out.size))
  }

  /** All `bands` LSH band keys of a text's MinHash signature in one call —
    * lets the banded-join fan-out stay inside whole-stage codegen (one
    * expression → array, no HOF lambdas over a materialized signature).
    */
  def minhashBandKeys(s: String, k: Int, bands: Int, shingle: Int): Array[Long] = {
    val sig = minhash(s, k, shingle)
    val rpb = k / bands
    Array.tabulate(bands)(b => bandKey(sig, b, rpb))
  }

  /** Polynomial rolling hashes of every length-`win` character window —
    * ONE pass over the string (Rabin-Karp update: h·B + c entering,
    * −c·B^(win−1) leaving), for exact-substring duplicate detection
    * (Lee et al. 2021 "Deduplicating Training Data Makes Language Models
    * Better" — the hash-window approximation of the suffix-array method).
    * Returns (length − win + 1) hashes; empty if the text is shorter.
    */
  def charWindowHashes(s: String, win: Int): Array[Long] = {
    val n = s.length
    if (win <= 0 || n < win) return Array.emptyLongArray
    val B = 1000003L
    var top = 1L // B^(win-1)
    var i = 0
    while (i < win - 1) { top *= B; i += 1 }
    val out = new Array[Long](n - win + 1)
    var h = 0L
    i = 0
    while (i < win) { h = h * B + s.charAt(i); i += 1 }
    out(0) = h
    i = win
    while (i < n) {
      h = (h - s.charAt(i - win) * top) * B + s.charAt(i)
      out(i - win + 1) = h
      i += 1
    }
    out
  }

  /** Exact Jaccard similarity of word n-gram shingle sets. */
  def jaccardShingles(a: String, b: String, n: Int): Double = {
    val sa = shingleHashes(a, n).toSet
    val sb = shingleHashes(b, n).toSet
    if (sa.isEmpty && sb.isEmpty) 1.0
    else {
      val inter = sa.intersect(sb).size
      inter.toDouble / (sa.size + sb.size - inter)
    }
  }
}

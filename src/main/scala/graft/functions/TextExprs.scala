package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd text-hash expressions (fingerprint, SimHash, MinHash) — the
  * dedup/fingerprint operator surface, kept inside whole-stage codegen via
  * static calls into graft.core.TextHash.
  */
case class Fingerprint64Expr(child: Expression) extends UnaryExpression
    {
  override def dataType: DataType = LongType
  override def prettyName: String = "fingerprint64"
  override protected def nullSafeEval(s: Any): Any =
    graft.core.TextHash.fingerprint64(s.asInstanceOf[UTF8String].toString)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.core.TextHash.fingerprint64($s.toString())")
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

case class SimHash64Expr(child: Expression) extends UnaryExpression
    {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"
  override protected def nullSafeEval(s: Any): Any =
    graft.core.TextHash.simhash64(s.asInstanceOf[UTF8String].toString)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.core.TextHash.simhash64($s.toString())")
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** minhash(text, k, shingle) → array<bigint> signature. */
case class MinHashExpr(child: Expression, k: Int, shingle: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash"
  override protected def nullSafeEval(s: Any): Any =
    new GenericArrayData(
      graft.core.TextHash.minhash(s.asInstanceOf[UTF8String].toString, k, shingle))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.core.TextHash.minhash($s.toString(), $k, $shingle))")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** minhash_bands(text, k, bands, shingle) → array<bigint> of LSH band
  * keys — signature + banding fused into one codegen'd call so the
  * banded join explodes a small long array, never a HOF over the sig.
  */
case class MinHashBandsExpr(child: Expression, k: Int, bands: Int, shingle: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_bands"
  override protected def nullSafeEval(s: Any): Any =
    new GenericArrayData(graft.core.TextHash.minhashBandKeys(
      s.asInstanceOf[UTF8String].toString, k, bands, shingle))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.core.TextHash.minhashBandKeys($s.toString(), $k, $bands, $shingle))")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** word_ngrams(text, n) → array<string> of distinct word n-gram shingles
  * (first-occurrence order) — the codegen'd replacement for the
  * interpreted HOF construction; used by exact n-gram Jaccard dedup.
  */
case class WordNgramsExpr(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_ngrams"
  override protected def nullSafeEval(s: Any): Any =
    WordNgramsKernel.grams(s.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s =>
      s"graft.functions.WordNgramsKernel.grams($s, $n)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Standalone object (NOT the expression's companion): the companion's
  * static forwarder for a method named like an inherited instance method
  * (`eval`) is suppressed by scalac, which breaks Janino resolution and
  * silently drops the whole subtree out of codegen.
  */
object WordNgramsKernel {
  def grams(s: UTF8String, n: Int): GenericArrayData = {
    val g = graft.core.TextHash.wordNgrams(s.toString, n)
    val out = new Array[AnyRef](g.length)
    var i = 0
    while (i < g.length) { out(i) = UTF8String.fromString(g(i)); i += 1 }
    new GenericArrayData(out)
  }
}

/** extract_text(html binary) → string via the frozen TextExtract rule —
  * the per-file parse kept codegen'd (reference: mvt/io_espre.py read_s1d
  * per-file parse; here the byte-identical HTML→text rule).
  */
case class ExtractTextExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "extract_text"
  override protected def nullSafeEval(b: Any): Any =
    UTF8String.fromString(
      graft.core.TextExtract.extract(b.asInstanceOf[Array[Byte]]))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, b =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.core.TextExtract.extract($b))")
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** repetition_stats(text) → array<double>
  * [n_words, distinct_word_frac, dup_2gram_frac, top_word_frac,
  * top_2gram_frac] — the Gopher/C4 repetition quality metrics in ONE
  * codegen'd pass (no HOFs, no per-metric rescans of the token array).
  */
case class RepetitionStatsExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "repetition_stats"
  override protected def nullSafeEval(s: Any): Any =
    RepetitionKernel.stats(s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.functions.RepetitionKernel.stats($s)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** Standalone kernel object (not a companion — see WordNgramsKernel note). */
object RepetitionKernel {
  def stats(s: UTF8String): GenericArrayData =
    new GenericArrayData(graft.core.TextStats.repetition(s.toString))
}

/** gopher_stats(text) → array<double>
  * [n_words, mean_word_len, n_stopwords, top_word_frac, dup_2gram_frac] —
  * every scalar the Gopher quality gate (Rae et al. 2021 §A1.1) needs, in
  * ONE codegen'd token pass (the HOF-lambda formulation breaks whole-stage
  * codegen into an interpreted Project and rescans the token array per
  * metric).
  */
case class GopherStatsExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "gopher_stats"
  override protected def nullSafeEval(s: Any): Any =
    GopherKernel.stats(s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.functions.GopherKernel.stats($s)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

object GopherKernel {
  def stats(s: UTF8String): GenericArrayData =
    new GenericArrayData(graft.core.TextStats.gopher(s.toString))
}

/** char_window_hashes(text, win) → array<bigint>: rolling hash of every
  * length-`win` character window in one codegen'd pass (Rabin-Karp) —
  * the fan-out key for exact-substring duplicate detection. Emitting
  * 8-byte hashes instead of the substrings keeps the explode at ~8
  * bytes/window instead of `win` bytes/window.
  */
case class CharWindowHashesExpr(child: Expression, win: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "char_window_hashes"
  override protected def nullSafeEval(s: Any): Any =
    new GenericArrayData(
      graft.core.TextHash.charWindowHashes(s.asInstanceOf[UTF8String].toString, win))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.core.TextHash.charWindowHashes($s.toString(), $win))")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** jaccard_shingles(a, b, n) → double: exact word-n-gram Jaccard. */
case class JaccardShinglesExpr(left: Expression, right: Expression, n: Int)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaccard_shingles"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    graft.core.TextHash.jaccardShingles(
      a.asInstanceOf[UTF8String].toString, b.asInstanceOf[UTF8String].toString, n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.core.TextHash.jaccardShingles($a.toString(), $b.toString(), $n)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Unicode NFC canonical composition (the mC4/CCNet normalization step:
  * 'e' + COMBINING ACUTE and precomposed 'é' must fingerprint and dedup
  * identically). JDK java.text.Normalizer via a static shim so the call
  * stays inside whole-stage codegen; DuckDB's nfc_normalize() gives the
  * independent oracle (q81).
  */
case class NfcNormalizeExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"
  override protected def nullSafeEval(s: Any): Any =
    UTF8String.fromString(
      graft.core.UnicodeNorm.nfc(s.asInstanceOf[UTF8String].toString))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.core.UnicodeNorm.nfc($s.toString()))")
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

object text {
  import org.apache.spark.sql.GraftBridge.{column, expression}

  def fingerprint64(c: Column): Column = column(Fingerprint64Expr(expression(c)))
  def nfc_normalize(c: Column): Column = column(NfcNormalizeExpr(expression(c)))
  def simhash64(c: Column): Column = column(SimHash64Expr(expression(c)))
  def minhash(c: Column, k: Int, shingle: Int): Column =
    column(MinHashExpr(expression(c), k, shingle))
  def minhash_bands(c: Column, k: Int, bands: Int, shingle: Int): Column =
    column(MinHashBandsExpr(expression(c), k, bands, shingle))
  def extract_text(c: Column): Column = column(ExtractTextExpr(expression(c)))
  def word_ngrams(c: Column, n: Int): Column = column(WordNgramsExpr(expression(c), n))
  def repetition_stats(c: Column): Column = column(RepetitionStatsExpr(expression(c)))
  def gopher_stats(c: Column): Column = column(GopherStatsExpr(expression(c)))
  def char_window_hashes(c: Column, win: Int): Column =
    column(CharWindowHashesExpr(expression(c), win))
  def jaccard_shingles(a: Column, b: Column, n: Int): Column =
    column(JaccardShinglesExpr(expression(a), expression(b), n))
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.BpeTrain

class BpeTrainSpec extends AnyFunSuite {
  import SharedSpark._

  test("textbook corpus learns the classic merge sequence") {
    import spark.implicits._
    // Sennrich et al. example: {low:5, lower:2, newest:6, widest:3}
    val text = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" ")
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val merges = BpeTrain.trainMerges(docs, "text", nMerges = 5)
    assert(merges === Seq(
      ("e", "s"),          // 9 (ties with (s,t),(t,</w>) — lexicographic)
      ("es", "t"),         // 9
      ("est", BpeTrain.Eow),
      ("l", "o"),          // 7 (ties with (o,w))
      ("lo", "w")))
  }

  test("encode applies merges in order: 'lowest' → [low, est</w>]") {
    import spark.implicits._
    val merges = Seq(("e", "s"), ("es", "t"), ("est", BpeTrain.Eow),
      ("l", "o"), ("lo", "w"))
    val out = BpeTrain.encode(Seq((1L, "lowest")).toDF("doc_id", "text"),
        "text", merges)
      .select("bpe_tokens").head().getSeq[String](0)
    assert(out === Seq("low", "est" + BpeTrain.Eow))
  }

  test("tie-break is correct beyond Latin-1: U+00FF sorts before U+0100") {
    import spark.implicits._
    // four pairs all tie at count 3: (ÿ,ÿ), (ÿ,</w>), (Ā,Ā), (Ā,</w>).
    // Lexicographic minimum is (ÿ,</w>) since 'ÿ'(U+00FF) < 'Ā'(U+0100)
    // and '<' < 'ÿ'. A chr()-based negation (masks to 0xFF) wraps U+0100
    // to 0 and would wrongly crown an Ā pair — this pins the full-BMP
    // hex negation.
    val text = Seq.fill(3)("ÿÿ").mkString(" ") + " " +
      Seq.fill(3)("ĀĀ").mkString(" ")
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val merges = BpeTrain.trainMerges(docs, "text", nMerges = 1)
    assert(merges === Seq(("ÿ", BpeTrain.Eow)))
  }

  test("training stops when no pair reaches the minimum count") {
    import spark.implicits._
    val docs = Seq((1L, "ab cd ef")).toDF("doc_id", "text") // all pairs count 1
    assert(BpeTrain.trainMerges(docs, "text", nMerges = 10,
      minPairCount = 2L).isEmpty)
  }
}

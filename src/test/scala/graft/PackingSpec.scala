package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Packing

class PackingSpec extends AnyFunSuite {
  import SharedSpark._

  private def packed(rows: Seq[(Long, Long)], cap: Long, buckets: Int) = {
    import spark.implicits._
    Packing.contiguousPack(rows.toDF("id", "tok"), "id", "tok", cap, buckets)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
  }

  test("bins match the serial exclusive-prefix computation") {
    val rows = Seq(100L -> 10L, 101L -> 900L, 105L -> 200L, 200L -> 1024L,
      201L -> 1L, 300L -> 4000L, 301L -> 5L)
    // serial reference
    var acc = 0L
    val want = rows.sortBy(_._1).map { case (id, t) =>
      val bin = acc / 1024L; acc += t; id -> bin
    }.toMap
    for (b <- Seq(1, 2, 7, 64)) {
      assert(packed(rows, 1024L, b) === want, s"buckets=$b")
    }
  }

  test("bucket count never changes the result (distributed prefix sum)") {
    val rows = (0L until 500L).map(i => (i * 3 + 7, (i * 2654435761L) % 300 + 1))
    val ref = packed(rows, 2048L, 1)
    for (b <- Seq(4, 32, 200)) assert(packed(rows, 2048L, b) === ref)
  }

  test("no single-partition window: the windowed stage is keyed") {
    import spark.implicits._
    val df = (0L until 1000L).map(i => (i, i % 50 + 1)).toDF("id", "tok")
    val plan = Packing.contiguousPack(df, "id", "tok", 4096L)
      .queryExecution.executedPlan.toString
    // a global orderBy window would show an Exchange SinglePartition
    // feeding the Window; the bucketed form partitions by __b
    assert(plan.contains("Window"))
    assert(!plan.contains("SinglePartition"),
      s"global window collapsed to one partition:\n$plan")
  }

  test("empty input and zero-token docs") {
    import spark.implicits._
    assert(Packing.contiguousPack(Seq.empty[(Long, Long)].toDF("id", "tok"),
      "id", "tok", 100L).count() === 0)
    val m = packed(Seq(1L -> 0L, 2L -> 0L, 3L -> 50L), 10L, 3)
    assert(m === Map(1L -> 0L, 2L -> 0L, 3L -> 0L))
  }

  test("chunkTokens: coverage, overlap, short tail, sub-window doc, empty doc") {
    import spark.implicits._
    val words = (1 to 25).map(i => s"w$i")
    val docs = Seq(
      (1L, words.mkString(" ")),       // 25 tokens, k=10 s=6 → 1+ceil(15/6)=4 chunks
      (2L, "a b c"),                   // sub-window → 1 chunk
      (3L, "   ")                       // whitespace-only → dropped
    ).toDF("doc_id", "text")
    val out = Packing.chunkTokens(docs, "text", "doc_id", k = 10, stride = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val d1 = out.filter(_._1 == 1L).sortBy(_._2)
    assert(d1.map(_._2).toSeq === Seq(0L, 1L, 2L, 3L))
    // windows start every `stride` tokens; last is short
    assert(d1(0)._4.startsWith("w1 ") && d1(0)._3 === 10L)
    assert(d1(1)._4.startsWith("w7 ") && d1(1)._3 === 10L)
    assert(d1(2)._4.startsWith("w13 ") && d1(2)._3 === 10L)
    assert(d1(3)._4 === (19 to 25).map(i => s"w$i").mkString(" ") && d1(3)._3 === 7L)
    // overlap: consecutive windows share k - stride = 4 tokens
    assert(d1(0)._4.split(" ").takeRight(4).toSeq === d1(1)._4.split(" ").take(4).toSeq)
    // every token covered exactly when reassembling strided prefixes
    val reassembled = (d1.init.map(_._4.split(" ").take(6)).flatten ++
      d1.last._4.split(" ")).toSeq
    assert(reassembled === words)
    assert(out.filter(_._1 == 2L).toSeq === Seq((2L, 0L, 3L, "a b c")))
    assert(!out.exists(_._1 == 3L))
  }

  test("softDedupWeights: unit mass per distinct content") {
    import spark.implicits._
    val docs = Seq((1L, "x"), (2L, "x"), (3L, "x"), (4L, "y"))
      .toDF("doc_id", "text")
    val out = graft.operators.Dedup.softDedupWeights(docs, col("text"), "doc_id")
      .select("doc_id", "n_copies", "weight")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(out(1L) === ((3L, 0.333333)) && out(2L) === ((3L, 0.333333)))
    assert(out(4L) === ((1L, 1.0)))
    // total mass = number of distinct contents (up to rounding)
    val mass = out.values.map(_._2).sum
    assert(math.abs(mass - 2.0) < 1e-4, s"mass $mass")
  }

  test("shardByTokens: serial parity, contiguity, balance, bucket invariance") {
    import spark.implicits._
    val rows = (0L until 400L).map(i => (i * 7 + 3, (i * 2654435761L) % 97 + 1))
    val df = rows.toDF("id", "tok")
    def run(b: Int) = Packing.shardByTokens(df, "id", "tok", 8, b)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    // serial reference: shard = min(7, exclusive_prefix * 8 / total)
    val total = rows.map(_._2).sum
    var acc = 0L
    val want = rows.sortBy(_._1).map { case (id, t) =>
      val s = math.min(7L, acc * 8 / total); acc += t; (id, t, s)
    }
    val got = run(1)
    assert(got === want)
    for (b <- Seq(4, 64, 200)) assert(run(b) === want, s"buckets=$b")
    // shards are contiguous runs in id order
    val order = got.map(_._3)
    assert(order === order.sorted)
    assert(order.distinct === (0L until 8L).toSeq) // all shards populated
    // token balance: every shard within one max-doc of the ideal mass
    val maxTok = rows.map(_._2).max
    val ideal = total.toDouble / 8
    got.groupBy(_._3).foreach { case (s, g) =>
      val m = g.map(_._2).sum
      assert(math.abs(m - ideal) <= maxTok, s"shard $s mass $m vs $ideal")
    }
  }

  test("full-range fingerprint keys: span math never overflows") {
    import spark.implicits._
    val rows = Seq(Long.MinValue + 5 -> 10L, -1L -> 20L, 3L -> 30L,
      Long.MaxValue - 7 -> 40L)
    val out = Packing.shardByTokens(rows.toDF("id", "tok"), "id", "tok", 2)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    // serial: prefixes 0,10,30,60 of total 100 → shards 0,0,0,1
    assert(out === Map((Long.MinValue + 5) -> 0L, -1L -> 0L, 3L -> 0L,
      (Long.MaxValue - 7) -> 1L))
  }

  test("shardByTokens: degenerate inputs (empty, all-zero tokens)") {
    import spark.implicits._
    assert(Packing.shardByTokens(Seq.empty[(Long, Long)].toDF("id", "tok"),
      "id", "tok", 4).count() === 0)
    val z = Packing.shardByTokens(Seq(1L -> 0L, 2L -> 0L).toDF("id", "tok"),
      "id", "tok", 4).collect().map(_.getLong(2)).toSet
    assert(z === Set(0L))
  }
}

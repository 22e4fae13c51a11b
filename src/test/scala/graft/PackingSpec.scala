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
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.{Rng, TextHash}

class KnnJoinSpec extends AnyFunSuite {
  import SharedSpark._

  test("cell-ring kNN is exact: matches brute force on random data") {
    import spark.implicits._
    val pts = (0 until 2000).map { i =>
      (i.toLong, Rng.uniform(51L, i.toLong, 1L) * 360.0 - 180.0,
        Rng.uniform(51L, i.toLong, 2L) * 170.0 - 85.0)
    }
    val qs = (0 until 25).map { i =>
      (i.toLong, Rng.uniform(52L, i.toLong, 1L) * 360.0 - 180.0,
        Rng.uniform(52L, i.toLong, 2L) * 170.0 - 85.0)
    }
    val got = graft.operators.KnnJoin.knn(
        qs.toDF("q_id", "q_lon", "q_lat"), pts.toDF("p_id", "lon", "lat"), k = 7)
      .select("q_id", "p_id", "rank").as[(Long, Long, Int)].collect()
      .map(r => (r._1, r._3) -> r._2).toMap
    // brute force
    qs.foreach { case (qid, qlon, qlat) =>
      val expect = pts.map { case (pid, lon, lat) =>
        (pid, (qlon - lon) * (qlon - lon) + (qlat - lat) * (qlat - lat))
      }.sortBy(p => (p._2, p._1)).take(7)
      expect.zipWithIndex.foreach { case ((pid, _), i) =>
        assert(got((qid, i + 1)) === pid, s"q=$qid rank=${i + 1}")
      }
    }
  }

  test("sparse-region queries resolve via ring-doubling, still exact") {
    import spark.implicits._
    // 10 points clustered in one city, query on the other side of the world
    val pts = (0 until 10).map(i => (i.toLong, 2.3 + i * 0.01, 48.8 + i * 0.01))
    val qs = Seq((0L, -150.0, -60.0))
    val got = graft.operators.KnnJoin.knn(
      qs.toDF("q_id", "q_lon", "q_lat"), pts.toDF("p_id", "lon", "lat"), k = 3)
      .collect()
    assert(got.length === 3)
  }

  test("every query sparse (pathological res): exact results, no nested-loop join anywhere") {
    import spark.implicits._
    // a fine grid with far-flung points makes EVERY probe come up short —
    // the branch that used to cross-join sparse queries against all points
    val pts = (0 until 30).map(i =>
      (i.toLong, -170.0 + i * 11.0, -80.0 + (i * 37 % 160).toDouble))
    val qs = (0 until 8).map(i =>
      (i.toLong, -160.0 + i * 40.0, -70.0 + i * 18.0))
    val out = graft.operators.KnnJoin.knn(
      qs.toDF("q_id", "q_lon", "q_lat"), pts.toDF("p_id", "lon", "lat"),
      k = 5, res = 6, probeRings = 1)
    val got = out.select("q_id", "p_id", "rank")
      .as[(Long, Long, Int)].collect().map(r => (r._1, r._3) -> r._2).toMap
    qs.foreach { case (qid, qlon, qlat) =>
      val expect = pts.map { case (pid, lon, lat) =>
        (pid, (qlon - lon) * (qlon - lon) + (qlat - lat) * (qlat - lat))
      }.sortBy(p => (p._2, p._1)).take(5)
      expect.zipWithIndex.foreach { case ((pid, _), i) =>
        assert(got((qid, i + 1)) === pid, s"q=$qid rank=${i + 1}")
      }
    }
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan)
  }

  test("fewer than k points in the whole dataset: total-coverage fallback returns what exists, no nested loop") {
    import spark.implicits._
    val pts = Seq((0L, 2.3, 48.8), (1L, -74.0, 40.7))
    val qs = Seq((0L, -150.0, -60.0), (1L, 100.0, 30.0))
    val out = graft.operators.KnnJoin.knn(
      qs.toDF("q_id", "q_lon", "q_lat"), pts.toDF("p_id", "lon", "lat"), k = 5)
    val got = out.collect()
    assert(got.length === 4) // 2 queries × the only 2 points
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan)
  }

  test("withinRadius matches brute force exactly; no nested-loop join") {
    import spark.implicits._
    val pts = (0 until 800).map { i =>
      (i.toLong, Rng.uniform(53L, i.toLong, 1L) * 360.0 - 180.0,
        Rng.uniform(53L, i.toLong, 2L) * 170.0 - 85.0)
    }
    val qs = (0 until 40).map { i =>
      (i.toLong, Rng.uniform(54L, i.toLong, 1L) * 360.0 - 180.0,
        Rng.uniform(54L, i.toLong, 2L) * 170.0 - 85.0)
    }
    val r = 6.0
    val out = graft.operators.KnnJoin.withinRadius(
      qs.toDF("q_id", "q_lon", "q_lat"), pts.toDF("p_id", "lon", "lat"), r)
    val got = out.select("q_id", "p_id").as[(Long, Long)].collect().toSet
    val want = (for {
      (qid, qlon, qlat) <- qs
      (pid, lon, lat) <- pts
      if (qlon - lon) * (qlon - lon) + (qlat - lat) * (qlat - lat) <= r * r
    } yield (qid, pid)).toSet
    assert(got === want, s"missing=${(want -- got).take(3)} extra=${(got -- want).take(3)}")
    // candidate generation is a cell equi join, never a cartesian
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan)
  }

  test("nearest-polygon join: exact argmin vs serial reference; inside points at dist 0; no nested loop") {
    import spark.implicits._
    val rnd = new scala.util.Random(19)
    val tris = (0L until 12L).map { i =>
      val cx = rnd.nextDouble() * 300 - 150
      val cy = rnd.nextDouble() * 140 - 70
      (i, cx, cy, cx + 6 + rnd.nextDouble() * 6, cy + rnd.nextDouble() * 3,
        cx + rnd.nextDouble() * 3, cy + 6 + rnd.nextDouble() * 6)
    }
    val pts = (0L until 500L).map { i =>
      (i, rnd.nextDouble() * 340 - 170, rnd.nextDouble() * 160 - 80)
    }
    val r = 12.0
    // serial reference with the same semantics (clamped point-segment
    // distance, 0 inside, argmin ties by id)
    def segD2(px: Double, py: Double, ax: Double, ay: Double,
              bx: Double, by: Double): Double = {
      val dx = bx - ax; val dy = by - ay
      val t = math.max(0.0, math.min(1.0,
        ((px - ax) * dx + (py - ay) * dy) / (dx * dx + dy * dy)))
      val ex = ax + t * dx - px; val ey = ay + t * dy - py
      ex * ex + ey * ey
    }
    def triD2(px: Double, py: Double,
              t: (Long, Double, Double, Double, Double, Double, Double)): Double = {
      val vs = Seq((t._2, t._3), (t._4, t._5), (t._6, t._7))
      def or(p: (Double, Double), q: (Double, Double), x: Double, y: Double) =
        (q._1 - p._1) * (y - p._2) - (q._2 - p._2) * (x - p._1)
      val inside = vs.indices.forall { i =>
        val p = vs(i); val q = vs((i + 1) % 3)
        val os = vs.map(w => or(p, q, w._1, w._2)).sum
        (os > 0 && or(p, q, px, py) >= 0) || (os < 0 && or(p, q, px, py) <= 0)
      }
      if (inside) 0.0
      else vs.indices.map { i =>
        val p = vs(i); val q = vs((i + 1) % 3)
        segD2(px, py, p._1, p._2, q._1, q._2)
      }.min
    }
    val want = pts.flatMap { case (id, px, py) =>
      val hits = tris.map(t => (t._1, triD2(px, py, t)))
        .filter(_._2 <= r * r)
      if (hits.isEmpty) None
      else Some(id -> hits.minBy(h => (h._2, h._1)))
    }.toMap
    val out = graft.operators.SpatialJoin.nearestPolygonWithin(
      pts.toDF("doc_id", "lon", "lat"),
      tris.toDF("b_id", "bx1", "by1", "bx2", "by2", "bx3", "by3"),
      radiusDeg = r, cellDeg = r)
    val got = out.collect()
      .map(rr => rr.getLong(0) -> (rr.getLong(1), rr.getDouble(2))).toMap
    assert(got.keySet === want.keySet)
    got.foreach { case (id, (aid, d2)) =>
      val (wAid, wD2) = want(id)
      assert(aid === wAid, s"point $id")
      assert(math.abs(d2 - wD2) < 1e-9, s"point $id: $d2 vs $wD2")
    }
    // inside points exist and carry dist2 == 0 exactly
    assert(got.values.exists(_._2 == 0.0))
    assert(got.values.exists(_._2 > 0.0))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan)
  }
}

class DedupSpec extends AnyFunSuite {
  import SharedSpark._
  private lazy val docs = spark.read
    .parquet(s"$sfDir/documents.parquet").cache()

  test("minhash LSH finds every high-jaccard pair (recall at 0.7)") {
    import spark.implicits._
    val lsh = graft.operators.Dedup.minhashPairs(docs, "text", "doc_id",
        k = 64, bands = 16, shingle = 3, threshold = 0.7)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // brute force high-jaccard pairs (small table)
    val texts = docs.select("doc_id", "text").as[(Long, String)].collect()
    val truth = (for {
      (ia, ta) <- texts; (ib, tb) <- texts if ia < ib
      if TextHash.jaccardShingles(ta, tb, 3) >= 0.7
    } yield (ia, ib)).toSet
    assert(truth.nonEmpty, "fixture should contain near-dups")
    assert(truth.subsetOf(lsh),
      s"missed: ${truth -- lsh}") // 16 bands of 4 @ j≥0.7 ⇒ P(miss) < 1e-4
  }

  test("ngram jaccard pairs match scalar kernel exactly") {
    import spark.implicits._
    val got = graft.operators.Dedup.ngramJaccardPairs(docs, "text", "doc_id",
        n = 3, threshold = 0.25, blockCol = Some("source"))
      .as[(Long, Long, Double)].collect().toSet
    val rows = docs.select("doc_id", "text", "source").as[(Long, String, String)].collect()
    val truth = (for {
      (ia, ta, sa) <- rows; (ib, tb, sb) <- rows
      if ia < ib && sa == sb
      j = TextHash.jaccardShingles(ta, tb, 3) if j >= 0.25
    } yield (ia, ib, math.rint(j * 1e6) / 1e6)).toSet
    assert(got.map(t => (t._1, t._2)) === truth.map(t => (t._1, t._2)))
  }

  test("simhash pairs: all returned pairs verified within hamming bound") {
    import spark.implicits._
    val got = graft.operators.Dedup.simhashPairs(docs, "text", "doc_id", 3)
      .as[(Long, Long, Int)].collect()
    val byId = docs.select("doc_id", "text").as[(Long, String)].collect().toMap
    got.foreach { case (a, b, h) =>
      val truth = TextHash.hamming64(TextHash.simhash64(byId(a)), TextHash.simhash64(byId(b)))
      assert(truth === h && h <= 3)
    }
  }

  test("embedding LSH pairs report exact cosines") {
    import spark.implicits._
    val vecs = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val got = graft.operators.Dedup.embeddingPairs(vecs, "embedding", "vec_id",
      threshold = 0.35).collect()
    val byId = vecs.select("vec_id", "embedding").as[(Long, Array[Float])]
      .collect().toMap
    assert(got.nonEmpty)
    got.foreach { r =>
      val a = byId(r.getLong(0)); val b = byId(r.getLong(1))
      var dot = 0.0; var na = 0.0; var nb = 0.0
      a.indices.foreach { i =>
        dot += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i)
      }
      val cos = dot / (math.sqrt(na) * math.sqrt(nb))
      assert(math.abs(cos - r.getDouble(2)) < 1e-6)
      assert(cos >= 0.35)
    }
  }

  test("incremental dedup: corpus hits rejected, in-batch dups winnowed, novel kept") {
    import spark.implicits._
    val corpusTexts = Seq("already crawled page", "another known page")
    val corpus = corpusTexts.toDF("text")
      .select(graft.functions.text.fingerprint64(col("text")).as("text_fp"))
    val incoming = Seq(
      (10L, "already crawled page"), // in corpus → rejected
      (11L, "fresh page one"),       // novel → admitted
      (12L, "fresh page two"),       // novel, duplicated in batch
      (13L, "fresh page two"),       //   → only min id admitted
      (14L, "another known page")    // in corpus → rejected
    ).toDF("doc_id", "text")
    val got = graft.operators.Dedup
      .incrementalDedup(incoming, corpus, "text", "doc_id")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got === Set(11L, 12L))
  }

  test("incremental near-dup: band-collision candidates verified by exact jaccard") {
    import spark.implicits._
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon"
    val corpus = Seq((100L, base)).toDF("doc_id", "text")
    val bandTable = graft.operators.Dedup.minhashBandTable(corpus, "text", "doc_id")
    val incoming = Seq(
      (1L, base),                                    // exact copy → rejected
      (2L, base.replace("theta", "CHANGED")),        // near-dup → rejected
      (3L, "completely different words entirely here with nothing shared at all ok")
    ).toDF("doc_id", "text")
    val admitted = graft.operators.Dedup
      .incrementalNearDup(incoming, bandTable, corpus, "text", "doc_id")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(admitted === Set(3L))
  }

  test("rolling window hashes: one per position, equal iff substrings equal") {
    val s = "abcabcabcXabcabcabc"
    val h = graft.core.TextHash.charWindowHashes(s, 5)
    assert(h.length === s.length - 5 + 1)
    for (i <- h.indices; j <- h.indices)
      assert((h(i) == h(j)) === (s.substring(i, i + 5) == s.substring(j, j + 5)),
        s"positions $i,$j")
    assert(graft.core.TextHash.charWindowHashes("abc", 5).isEmpty)
    assert(graft.core.TextHash.charWindowHashes("", 5).isEmpty)
  }

  test("duplicated spans: coverage merges overlapping windows exactly") {
    import spark.implicits._
    // doc 1 and doc 2 share the 26-char block; doc 3 is all unique
    val block = "the shared boilerplate text"
    val docs = Seq(
      (1L, s"unique-head-one $block unique-tail-one"),
      (2L, s"different-head $block other-tail-here!"),
      (3L, "completely original content with no duplication at all zzz")
    ).toDF("doc_id", "text")
    val out = graft.operators.Dedup
      .duplicatedSpans(docs, "text", "doc_id", minLen = 20)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // serial reference: exact duplicated-window set + interval union
    val texts = Map(1L -> s"unique-head-one $block unique-tail-one",
      2L -> s"different-head $block other-tail-here!",
      3L -> "completely original content with no duplication at all zzz")
    val all = texts.toSeq.flatMap { case (id, t) =>
      (0 to t.length - 20).map(p => (t.substring(p, p + 20), id, p))
    }
    val dupSet = all.groupBy(_._1).filter(_._2.size >= 2).values.flatten.toSeq
    texts.foreach { case (id, t) =>
      val wins = dupSet.filter(_._2 == id).map(_._3).sorted
      val (nw, chars) = (wins.size, {
        var covered = 0; var end = -1
        wins.foreach { p =>
          val e = p + 19
          if (p > end) { covered += 20; end = e }
          else if (e > end) { covered += e - end; end = e }
        }
        covered
      })
      val (nChars, nWins, gotNw, gotChars) = out(id)
      assert(nChars === t.length.toLong && nWins === (t.length - 19).toLong)
      assert(gotNw === nw.toLong, s"doc $id windows")
      assert(gotChars === chars.toLong, s"doc $id coverage")
    }
    assert(out(3L)._3 === 0L && out(3L)._4 === 0L)
  }

  test("intra-doc unit dedup keeps first occurrences in order, zero shuffle") {
    import spark.implicits._
    val in = Seq(
      (1L, "a b a c b a"),   // repeats interleaved
      (2L, "x"),             // single unit
      (3L, ""),              // empty doc
      (4L, "  a   a  ")      // separator runs collapse to empty units
    ).toDF("doc_id", "text")
    val out = graft.operators.Dedup.dedupUnitsWithin(in, "text", " ")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    assert(out(1L) === ((6L, 3L, "a b c")))
    assert(out(2L) === ((1L, 1L, "x")))
    assert(out(3L) === ((0L, 0L, "")))
    assert(out(4L) === ((2L, 1L, "a")))
    // line granularity: the CCNet within-doc boilerplate case
    val lines = graft.operators.Dedup.dedupUnitsWithin(
      Seq((9L, "nav\nbody\nnav\nfooter")).toDF("doc_id", "text"),
      "text", "\n").head()
    assert(lines.getString(4) === "nav\nbody\nfooter")
    // per-row array expression only: no Exchange anywhere in the plan
    val plan = graft.operators.Dedup.dedupUnitsWithin(in, "text", " ")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("host boilerplate: per-site scoping, order kept, non-boiler repeats kept") {
    import spark.implicits._
    val in = Seq(
      // host A: "nav" in all 3 docs (boilerplate at minDocs=3);
      // "promo" in only 2 (kept); within-doc repeats don't inflate counts
      (1L, "A", "nav promo body1 nav"),
      (2L, "A", "nav body2 promo"),
      (3L, "A", "body3 nav nav"),
      // host B: "nav" appears in just 1 doc — NOT boilerplate here
      (4L, "B", "nav own own")
    ).toDF("doc_id", "host", "text")
    val out = graft.operators.Dedup.removeHostBoilerplate(
        in, "text", "doc_id", "host", " ", minDocs = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(3), r.getLong(4), r.getString(5)))).toMap
    assert(out(1L) === ((4L, 2L, "promo body1")))
    assert(out(2L) === ((3L, 2L, "body2 promo")))
    assert(out(3L) === ((3L, 1L, "body3")))
    assert(out(4L) === ((3L, 3L, "nav own own"))) // repeats preserved
  }
}

class SimilaritySpec extends AnyFunSuite {
  import SharedSpark._

  test("IVF top-k achieves high recall vs brute force") {
    import spark.implicits._
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet").cache()
    val qs = e.filter(pmod(col("vec_id"), lit(50)) === 0)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val brute = graft.operators.Similarity.bruteForceTopK(qs, e, k = 10)
      .select("q_id", "vec_id").as[(Long, Long)].collect().toSet
    val cents = graft.operators.Similarity.trainCentroids(e, nCentroids = 8, iters = 2)
    val ivf = graft.operators.Similarity.ivfTopK(qs, e, cents, k = 10, nProbe = 3)
      .select("q_id", "vec_id").as[(Long, Long)].collect().toSet
    val recall = brute.intersect(ivf).size.toDouble / brute.size
    assert(recall >= 0.7, s"IVF recall $recall")
  }

  test("all-corpus IVF self-NN: high recall vs brute force, no cartesian in plan") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val media = graft.operators.Multimodal.synthMedia(spark, 120)
    val f = graft.operators.Multimodal.decode(media).toDF()
      .select(col("media_id").cast("long").as("vec_id"),
        col("features").as("embedding"))
      .localCheckpoint(true)
    // oracle: brute-force nearest non-self neighbor per media
    val qs = f.select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val w = Window.partitionBy("q_id").orderBy(col("rank").asc, col("vec_id").asc)
    val brute = graft.operators.Similarity.bruteForceTopK(qs, f, k = 2)
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
      .select("q_id", "vec_id").as[(Long, Long)].collect().toMap
    val cents = graft.operators.Similarity.trainCentroids(f, nCentroids = 10, iters = 2)
    val self = graft.operators.Similarity.ivfSelfTopK(f, cents, k = 1, nProbe = 4)
    // the scale gate: one equi join on centroid_id — never an all-pairs plan
    val plan = self.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
    val got = self.select("q_id", "vec_id").as[(Long, Long)].collect().toMap
    // every query that found a candidate list reports a neighbor; recall of
    // the TRUE nearest neighbor stays high at nProbe=4
    assert(got.size >= (brute.size * 0.95).toInt, s"${got.size} of ${brute.size}")
    val hits = brute.count { case (q, nn) => got.get(q).contains(nn) }
    val recall = hits.toDouble / brute.size
    assert(recall >= 0.7, s"self-NN recall $recall")
  }
}

class AsofJoinSpec extends AnyFunSuite {
  import SharedSpark._

  test("nearest-within-tolerance matches naive scan") {
    import spark.implicits._
    val ev = spark.read.parquet(s"$sfDir/events.parquet").cache()
    val got = graft.operators.AsofJoin.nearest(
        ev.filter(col("event_type") === "error"),
        ev.filter(col("event_type") === "purchase"),
        "event_id", "ts", "event_id", "ts", tolUs = 600000000L)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val errors = ev.filter(col("event_type") === "error")
      .select(col("event_id"), unix_micros(col("ts").cast("timestamp")).as("us"))
      .as[(Long, Long)].collect()
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), unix_micros(col("ts").cast("timestamp")).as("us"))
      .as[(Long, Long)].collect()
    errors.foreach { case (eid, eus) =>
      val best = purchases.map { case (pid, pus) => (pid, math.abs(eus - pus)) }
        .filter(_._2 <= 600000000L)
        .sortBy(p => (p._2, p._1)).headOption
      assert(got.get(eid) === best, s"event $eid")
    }
  }
}

class RepetitionSpec extends AnyFunSuite {
  import SharedSpark._

  test("repetition metrics: hand-computed values, empty and degenerate inputs") {
    // "a b a b a": n=5, distinct {a,b}=2, bigrams [a b, b a, a b, b a]
    // distinct 2 of 4 -> dup 0.5; top word a=3/5; top bigram 2/4
    val r = graft.core.TextStats.repetition("a b a b a")
    assert(r.toSeq === Seq(5.0, 0.4, 0.5, 0.6, 0.5))
    assert(graft.core.TextStats.repetition("").toSeq === Seq(0.0, 0.0, 0.0, 0.0, 0.0))
    assert(graft.core.TextStats.repetition("  \t ").toSeq === Seq(0.0, 0.0, 0.0, 0.0, 0.0))
    // single word: no bigrams -> bigram metrics 0
    assert(graft.core.TextStats.repetition("word").toSeq === Seq(1.0, 1.0, 0.0, 1.0, 0.0))
    // pure spam: "x x x x" -> dup_2gram 1 - 1/3, top word 1.0
    val spam = graft.core.TextStats.repetition("x x x x")
    assert(spam(3) === 1.0 && spam(4) === 1.0)
    assert(math.abs(spam(2) - (1.0 - 1.0 / 3.0)) < 1e-12)
  }

  test("repetition_stats expression stays codegen'd over the documents scan") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val out = graft.operators.TextAnalysis.repetitionStats(docs, "text", "doc_id")
    assert(out.count() === docs.count())
    // the plan must be a single WholeStageCodegen project over the scan
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project")) // whole-stage-codegen marker
    assert(!plan.contains("Exchange"))
    // filters compose: a quality gate over the metrics stays pushable math
    val spammy = out.filter(col("dup_2gram_frac") > 0.5)
    assert(spammy.count() >= 0)
  }

  test("gopher quality gate: each flag trips on its own violation only") {
    import spark.implicits._
    // diverse content words so no bigram or word repeats past the cap
    val good = (1 to 40).map(i => s"alpha$i the beta$i of gamma$i").mkString(" ")
    val docs = Seq(
      (1L, good),                                  // passes everything
      (2L, "too short to keep"),                   // n_words < 30
      (3L, Seq.fill(40)("spam").mkString(" ")),    // repetition + stopwords
      (4L, (1 to 40).map(i => "a" * 15 + i).mkString(" ")) // mean_wl > 10, no stopwords
    ).toDF("doc_id", "text")
    val out = graft.operators.TextAnalysis
      .gopherFilters(docs, "text", "doc_id", minWords = 30)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Boolean]("keep"))
    assert(!out(2L).getAs[Boolean]("flag_n_words") && !out(2L).getAs[Boolean]("keep"))
    assert(!out(3L).getAs[Boolean]("flag_repetition") &&
      !out(3L).getAs[Boolean]("flag_stopwords") && !out(3L).getAs[Boolean]("keep"))
    assert(!out(4L).getAs[Boolean]("flag_word_len") &&
      !out(4L).getAs[Boolean]("flag_stopwords") && out(4L).getAs[Boolean]("flag_n_words"))
    // plan: one codegen'd projection over the input, no shuffle
    val plan = graft.operators.TextAnalysis
      .gopherFilters(spark.read.parquet(s"$sfDir/documents.parquet"), "text", "doc_id")
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project") && !plan.contains("Exchange"))
  }
}

class ConnectedComponentsSpec extends AnyFunSuite {
  import SharedSpark._

  private def ufClusters(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  test("chain graph (worst-case diameter) converges to one cluster") {
    import spark.implicits._
    val pairs = (1L until 12L).map(i => (i - 1, i)).toDF("id_a", "id_b")
    val cc = graft.operators.Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc.size === 12)
    assert(cc.values.toSet === Set(0L))
  }

  test("clusters over real minhash pairs match driver union-find") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val pairs = graft.operators.Dedup.minhashPairs(
      docs, "text", "doc_id", threshold = 0.5)
    val local = pairs.select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assume(local.nonEmpty) // sf0.001 generator includes near-dups
    val expected = ufClusters(local)
    val got = graft.operators.Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === expected)
  }

  test("driver fast path and superstep path produce identical labels") {
    import spark.implicits._
    // chain ∪ clique ∪ bridged star ∪ isolated pair, with duplicate and
    // reversed edges thrown in — exercises dedup, symmetry, min labels
    val edges = (1L until 9L).map(i => (i - 1, i)) ++ // chain 0..8
      (for (a <- 100L to 104L; b <- 100L to 104L if a < b) yield (a, b)) ++
      Seq((200L, 201L), (200L, 202L), (200L, 203L), (203L, 8L)) ++
      Seq((300L, 301L), (301L, 300L), (300L, 301L)) // dups + reversed
    val df = edges.toDF("id_a", "id_b")
    def labels(collectMax: Long): Map[Long, Long] =
      graft.operators.Dedup
        .connectedComponents(df, collectMax = collectMax)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val driver = labels(collectMax = Long.MaxValue)
    val superstep = labels(collectMax = 0L) // forces the distributed path
    assert(driver === superstep)
    assert(driver.values.toSet === Set(0L, 100L, 300L)) // star merged into chain
  }
}

class BpeTokenSpec extends AnyFunSuite {
  import SharedSpark._

  test("BPE-ish pretokenizer counts: contractions, digits, punctuation runs") {
    import spark.implicits._
    val cases = Seq(
      ("it's a test", 4L),          // [it]['s][ a][ test]
      ("hello, world!! 42", 6L),    // [hello][,][ world][!!][ 4?]... verified below
      ("", 0L),
      ("   ", 1L),                  // one whitespace run
      ("a1b2", 4L))                 // [a][1][b][2]
    val got = cases.map(_._1).toDF("text")
      .select(graft.operators.TextAnalysis.bpeTokenCount(col("text"))
        .cast("long").as("n")).collect().map(_.getLong(0)).toSeq
    // recompute expectation with java regex directly (independent path)
    val p = java.util.regex.Pattern.compile(
      graft.operators.TextAnalysis.BpePretokenPattern)
    val expect = cases.map { case (t, _) =>
      val m = p.matcher(t); var c = 0L; while (m.find()) c += 1; c
    }
    assert(got === expect)
    assert(got(0) === 4L)
    assert(got(2) === 0L && got(3) === 1L && got(4) === 4L)
  }
}

class SamplingSpec extends AnyFunSuite {
  import SharedSpark._
  import graft.operators.Sampling

  test("hash sample is partitioning-invariant and rate-accurate") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def ids(parts: Int): Seq[Long] =
      Sampling.hashSample(docs.repartition(parts),
        Sampling.hashUniform(7L, col("doc_id")), 0.3)
        .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    val a = ids(1)
    assert(a === ids(5))
    val n = docs.count().toDouble
    assert(math.abs(a.length / n - 0.3) < 0.1) // 500 rows: loose CI
    // pure filter: no exchange in the plan
    val plan = Sampling.hashSample(docs,
      Sampling.hashUniform(7L, col("doc_id")), 0.3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
  }

  test("stratified rates apply per stratum; reservoir returns exactly n per key") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val u = Sampling.portableUniform(col("doc_id"))
    val strat = Sampling.stratifiedSample(docs, col("lang"), u,
      Map("en" -> 0.0), defaultRate = 1.0)
    assert(strat.filter(col("lang") === "en").count() === 0)
    assert(strat.count() === docs.filter(col("lang") =!= "en").count())
    val res = Sampling.reservoirPerKey(docs, col("source"), u, col("doc_id"), 3)
    val perKey = res.groupBy("source").count().collect().map(_.getLong(1))
    assert(perKey.forall(_ === 3L))
    // deterministic: same 3 docs at any partitioning
    val r1 = res.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    val r2 = Sampling.reservoirPerKey(docs.repartition(7), col("source"), u,
      col("doc_id"), 3).select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(r1 === r2)
  }

  test("mixture resampling hits target shares with maximal retention, deterministically") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val u = Sampling.portableUniform(col("doc_id"))
    val weights = Map("en" -> 0.4, "de" -> 0.3, "fr" -> 0.3)
    val out = Sampling.toMixture(docs, col("lang"), u, weights)
    val got = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // only weighted domains survive
    assert(got.keySet.subsetOf(weights.keySet))
    // the binding domain (min n/w) keeps ALL rows — maximal retention
    val counts = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val binding = weights.keys.minBy(d => counts(d) / weights(d))
    assert(got(binding) === counts(binding))
    // output shares approximate the targets (coin variance on ~70-row
    // strata: generous tolerance)
    val total = got.values.sum.toDouble
    for ((d, w) <- weights)
      assert(math.abs(got(d) / total - w) < 0.12, s"$d: ${got(d) / total} vs $w")
    // deterministic at any partitioning
    val a = out.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    val b = Sampling.toMixture(docs.repartition(7), col("lang"), u, weights)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(a === b)
  }

  test("cluster-balanced sampling flattens topic skew; smallest cluster keeps all") {
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val assigned = graft.operators.Similarity.seedAssign(e, 37L)
    val before = assigned.groupBy("cluster_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val out = Sampling.balanceByKey(assigned, col("cluster_id"),
      Sampling.portableUniform(col("vec_id")))
    val after = out.groupBy("cluster_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the binding (smallest) cluster keeps every member
    val binding = before.minBy(_._2)._1
    assert(after(binding) === before(binding))
    // shares flatten: post-sample spread is far tighter than the input's
    // (coin variance on ~tens-per-cluster strata — loose gate)
    val spreadBefore = before.values.max.toDouble / before.values.min
    val spreadAfter = after.values.max.toDouble / math.max(1L, after.values.min)
    assert(spreadAfter <= math.max(2.5, spreadBefore / 1.5),
      s"before $spreadBefore after $spreadAfter")
  }
}

class PageRankSpec extends AnyFunSuite {
  import SharedSpark._
  import graft.operators.LinkGraph

  test("two-node cycle is the fixpoint (0.5 each); star concentrates on the hub") {
    import spark.implicits._
    val cycle = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val pr = LinkGraph.pageRank(cycle, iters = 3).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(pr(1L) === 0.5 && pr(2L) === 0.5) // symmetric fixpoint, any iters
    val star = Seq((1L, 9L), (2L, 9L), (3L, 9L), (9L, 1L)).toDF("src", "dst")
    val ps = LinkGraph.pageRank(star, iters = 3).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(ps(9L) > ps(1L) && ps(1L) > ps(2L)) // hub > its target > leaves
    assert(ps(2L) === ps(3L)) // symmetric leaves tie
  }

  test("deterministic at any partitioning; self-loops and duplicate edges ignored") {
    import spark.implicits._
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
    val edges = d.select((col("doc_id") % 50).as("src"),
        (col("doc_id") * 7 % 50).as("dst"))
      .unionAll(d.select((col("doc_id") % 50).as("src"),
        (col("doc_id") * 13 % 50).as("dst")))
    val a = LinkGraph.pageRank(edges, 3).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1).toSeq
    val b = LinkGraph.pageRank(edges.repartition(13), 3).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1).toSeq
    assert(a === b)
    // duplicating the edge list changes nothing (distinct edges)
    val c = LinkGraph.pageRank(edges.unionAll(edges), 3).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1).toSeq
    assert(a === c)
  }
}

class HllSpec extends AnyFunSuite {
  import SharedSpark._

  test("approx distinct: <2% error at rsd=0.02, sketch-only plan when exact is dropped") {
    spark.catalog.clearCache()
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select((col("doc_id") % 7).as("grp"),
        concat(lit("u"), col("doc_id") % 311).as("u"))
    val both = docs.groupBy("grp")
      .agg(approx_count_distinct(col("u"), 0.02).as("a"),
        countDistinct(col("u")).as("e"))
      .collect()
    both.foreach { r =>
      val (a, e) = (r.getLong(1), r.getLong(2))
      assert(math.abs(a - e).toDouble / e < 0.02, s"grp ${r.get(0)}: $a vs $e")
    }
    // the sketch-only aggregation: partial+final HashAggregate, and no
    // Expand (exact countDistinct would add one) — the shuffle carries
    // fixed-size sketches, not per-key value sets
    val plan = docs.groupBy("grp")
      .agg(approx_count_distinct(col("u"), 0.02).as("a"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_approx_count_distinct"), plan)
    assert(!plan.contains("Expand"), plan)
  }
}

class RingStatsSpec extends AnyFunSuite {
  import SharedSpark._

  test("ring stats: hand shapes and JTS parity on the registry polygons") {
    import graft.core.GeoKernels.ringStats
    // unit square, CCW, closed
    val sq = ringStats(Array(0, 1, 1, 0, 0.0), Array(0, 0, 1, 1, 0.0))
    assert(sq(0) === 1.0 && sq(1) === 0.5 && sq(2) === 0.5 && sq(3) === 4.0)
    // same square traversed CW → negative signed area
    val cw = ringStats(Array(0, 0, 1, 1, 0.0), Array(0, 1, 1, 0, 0.0))
    assert(cw(0) === -1.0)
    // degenerate: a line has zero area, vertex-mean centroid
    val ln = ringStats(Array(0, 2, 0.0), Array(0, 0, 0.0))
    assert(ln(0) === 0.0 && ln(1) === 1.0 && ln(3) === 4.0)
    // JTS parity over every registry polygon
    val gf = new org.locationtech.jts.geom.GeometryFactory()
    graft.sources.AdminPolygons.all.foreach { p =>
      val coords = p.xs.indices.map(i =>
        new org.locationtech.jts.geom.Coordinate(p.xs(i), p.ys(i))).toArray
      val poly = gf.createPolygon(coords)
      val r = ringStats(p.xs, p.ys)
      assert(math.abs(math.abs(r(0)) - poly.getArea) < 1e-9, s"${p.name} area")
      val c = poly.getCentroid
      assert(math.abs(r(1) - c.getX) < 1e-9 && math.abs(r(2) - c.getY) < 1e-9,
        s"${p.name} centroid")
      assert(math.abs(r(3) - poly.getExteriorRing.getLength) < 1e-9,
        s"${p.name} perimeter")
    }
  }
}

class LangModelSpec extends AnyFunSuite {
  import SharedSpark._

  test("bigram perplexity matches a serial reference model") {
    import spark.implicits._
    val texts = Map(1L -> "the cat sat on the mat",
      2L -> "the cat ran", 3L -> "dog", 4L -> "")
    val df = texts.toSeq.toDF("doc_id", "text")
    val out = graft.operators.LangModel
      .bigramPerplexity(df, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    // serial reference
    val tok = texts.view.mapValues(t =>
      if (t.trim.isEmpty) Array.empty[String] else t.trim.toLowerCase.split("\\s+")).toMap
    val unis = tok.values.flatten.groupBy(identity).view.mapValues(_.size).toMap
    val v = unis.size
    val bigs = tok.values.flatMap(ts => ts.sliding(2).filter(_.length == 2).map(a => (a(0), a(1))))
      .groupBy(identity).view.mapValues(_.size).toMap
    texts.foreach { case (id, _) =>
      val bgs = tok(id).sliding(2).filter(_.length == 2).map(a => (a(0), a(1))).toSeq
      if (bgs.isEmpty) assert(out(id) === ((0L, 0.0, 0.0)), s"doc $id")
      else {
        val slp = bgs.map { case (w1, w2) =>
          math.log((bigs((w1, w2)) + 0.5) / (unis(w1) + 0.5 * v))
        }.sum
        val avg = BigDecimal(slp / bgs.size)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(out(id)._1 === bgs.size.toLong, s"doc $id count")
        assert(math.abs(out(id)._2 - avg) < 1e-9, s"doc $id avg")
      }
    }
    // the repeated common bigram ("the cat") scores better than the
    // singleton-vocab doc's absent bigrams would — doc 2 beats doc 1's
    // longer mixed text in per-bigram probability? just sanity: finite
    assert(out(1L)._3 > 1.0 && out(2L)._3 > 1.0)
  }

  test("DSIR weights: unseen-bigram floor and target-domain preference") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta alpha beta alpha beta", "en"), // target-like
      (2L, "alpha beta alpha beta", "en"),
      (3L, "gamma delta gamma delta gamma", "de"),    // corpus-only style
      (4L, "gamma delta gamma delta", "de"),
      (5L, "omega sigma", "fr")                       // unseen by target
    ).toDF("doc_id", "text", "lang")
    val out = graft.operators.LangModel.importanceWeights(
        docs, docs.filter(col("lang") === "en"), "text", "doc_id")
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(2), r.getDouble(3), r.getBoolean(5))).toMap
    // target-like docs selected; corpus-only style rejected
    assert(out(1L)._3 && out(2L)._3)
    assert(!out(3L)._3 && !out(4L)._3)
    // doc 5's bigram is unseen by the target model: lp_target must be the
    // smoothed floor ln(0.5 / (0.5 * Vt)) with Vt = 2 ({alpha, beta})
    val floor = BigDecimal(math.log(0.5 / (0.5 * 2)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(out(5L)._1 - floor) < 1e-9, s"${out(5L)}")
  }
}

class SessionsSpec extends AnyFunSuite {
  import SharedSpark._

  test("gap sessionization: boundaries, per-user isolation, tied timestamps") {
    import spark.implicits._
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val ev = Seq(
      (1L, ts(0)), (1L, ts(10)), (1L, ts(2000)), (1L, ts(2100)),
      (2L, ts(50)), (2L, ts(50)), (2L, ts(5000)),
      (3L, ts(7))
    ).toDF("user_id", "ts")
    val out = graft.operators.Sessions
      .sessionStats(ev, "user_id", "ts", gapSec = 1800L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(out.keySet === Set((1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L), (3L, 1L)))
    assert(out((1L, 1L)) === ((2L, 0L, 10000000L, 10000000L)))
    assert(out((1L, 2L)) === ((2L, 2000000000L, 2100000000L, 100000000L)))
    // tied timestamps land in ONE session deterministically
    assert(out((2L, 1L)) === ((2L, 50000000L, 50000000L, 0L)))
    assert(out((2L, 2L))._1 === 1L)
    assert(out((3L, 1L)) === ((1L, 7000000L, 7000000L, 0L)))
  }
}

class RangeJoinSpec extends AnyFunSuite {
  import SharedSpark._
  import graft.operators.RangeJoin

  test("bucketed range join matches the naive BETWEEN join exactly") {
    import spark.implicits._
    val pts = (0 until 3000).map(i =>
      (i.toLong, (graft.core.Rng.uniform(3L, i, 1L) * 1e6).toLong))
    val ivs = (0 until 400).map { i =>
      val lo = (graft.core.Rng.uniform(4L, i, 1L) * 1e6).toLong
      (i.toLong, lo, lo + 1000 + (graft.core.Rng.uniform(4L, i, 2L) * 30000).toLong)
    }
    val got = RangeJoin.pointInInterval(
        pts.toDF("id", "t"), col("id"), col("t"),
        ivs.toDF("id", "lo", "hi"), col("id"), col("lo"), col("hi"),
        bucketWidth = 16384)
      .select("interval_id", "point_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val naive = (for {
      (iid, lo, hi) <- ivs; (pid, t) <- pts if t >= lo && t <= hi
    } yield (iid, pid)).toSet
    assert(naive.nonEmpty && got === naive)
  }

  test("the plan is a hash join on buckets, not a nested loop") {
    import spark.implicits._
    val pts = Seq((1L, 10L)).toDF("id", "t")
    val ivs = Seq((1L, 5L, 15L)).toDF("id", "lo", "hi")
    val plan = RangeJoin.pointInInterval(pts, col("id"), col("t"),
      ivs, col("id"), col("lo"), col("hi"), bucketWidth = 100)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop"), plan)
    assert(plan.contains("HashJoin"), plan)
  }
}

class PiiSpec extends AnyFunSuite {
  import SharedSpark._
  import graft.operators.TextAnalysis

  test("email/phone detection and redaction on realistic strings") {
    import spark.implicits._
    val rows = Seq(
      ("reach me at jane.doe+spam@sub.example.co.uk or call +1 (415) 555-0134 today", 1, 1),
      ("no pii here at all", 0, 0),
      ("two mails a@b.io c.d@e.org and digits 12345 (too short for a phone)", 2, 0),
      ("tel: 020 7946 0958", 0, 1))
    val df = rows.map(_._1).toDF("text").select(
      col("text"),
      TextAnalysis.emailCount(col("text")).as("ne"),
      TextAnalysis.phoneCount(col("text")).as("np"),
      TextAnalysis.redactPii(col("text")).as("red"))
    val got = df.collect()
    rows.zip(got).foreach { case ((t, ne, np), r) =>
      assert(r.getInt(1) === ne, s"emails in '$t'")
      assert(r.getInt(2) === np, s"phones in '$t'")
    }
    val red0 = got(0).getString(3)
    assert(red0.contains("<EMAIL>") && red0.contains("<PHONE>"))
    assert(!red0.contains("@") && !red0.contains("555"))
    assert(got(1).getString(3) === "no pii here at all")
  }
}

class TopWordsSpec extends AnyFunSuite {
  import SharedSpark._

  test("q48 plan uses WindowGroupLimit (partial top-k before the final window)") {
    val plan = SparkEntry.queries("q48_top_words")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan.take(2000))
    // partial aggregation present: hot words pre-reduce map-side
    assert(plan.contains("partial_count") || plan.contains("HashAggregate"), plan.take(2000))
  }
}

class PcaSpec extends AnyFunSuite {
  import SharedSpark._
  import graft.core.Eigen

  test("jacobi: exact eigenpairs on a known symmetric matrix") {
    // [[2,1],[1,2]] -> eigenvalues 3, 1; vectors (1,1)/sqrt2, (1,-1)/sqrt2
    val (ev, vecs) = Eigen.jacobi(Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    assert(math.abs(ev(0) - 3.0) < 1e-12 && math.abs(ev(1) - 1.0) < 1e-12)
    val r = 1.0 / math.sqrt(2.0)
    assert(vecs(0).zip(Array(r, r)).forall { case (a, b) => math.abs(a - b) < 1e-12 })
  }

  test("jacobi on the real covariance: A·v = λ·v, orthonormal basis") {
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val model = graft.operators.Similarity.pcaTrain(e, k = 8)
    // rebuild the full covariance once (small table) to check residuals
    import spark.implicits._
    val rows = e.select(org.apache.spark.sql.functions.col("embedding"))
      .as[Array[Float]].collect()
    val d = rows.head.length; val n = rows.length
    val mean = Array.tabulate(d)(j => rows.map(_(j).toDouble).sum / n)
    val cov = Array.tabulate(d, d)((i, j) =>
      rows.map(v => (v(i) - mean(i)) * (v(j) - mean(j))).sum / n)
    model.basis.zip(model.eigenvalues).foreach { case (v, l) =>
      val av = Array.tabulate(d)(i => (0 until d).map(j => cov(i)(j) * v(j)).sum)
      val resid = math.sqrt(av.zip(v).map { case (a, b) => (a - l * b) * (a - l * b) }.sum)
      assert(resid < 1e-9 * math.max(1.0, math.abs(l)), s"eigen residual $resid for λ=$l")
    }
    for (i <- model.basis.indices; j <- model.basis.indices) {
      val dot = model.basis(i).zip(model.basis(j)).map { case (a, b) => a * b }.sum
      assert(math.abs(dot - (if (i == j) 1.0 else 0.0)) < 1e-10)
    }
    // eigenvalues descending and nonnegative (covariance is PSD)
    assert(model.eigenvalues.sliding(2).forall(p => p(0) >= p(1) - 1e-12))
    assert(model.eigenvalues.forall(_ > -1e-10))
  }

  test("projected component variances equal the eigenvalues; train is partitioning-stable") {
    import org.apache.spark.sql.functions._
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val m = graft.operators.Similarity.pcaTrain(e, k = 3)
    val proj = e.select(graft.functions.vec.pca_project(
      col("embedding"), m.mean, m.basis).as("p"))
    val stats = proj.select(
      var_pop(element_at(col("p"), 1).cast("double")).as("v1"),
      var_pop(element_at(col("p"), 2).cast("double")).as("v2"),
      avg(element_at(col("p"), 1).cast("double")).as("m1")).head()
    assert(math.abs(stats.getDouble(0) - m.eigenvalues(0)) < 1e-4 * m.eigenvalues(0))
    assert(math.abs(stats.getDouble(1) - m.eigenvalues(1)) < 1e-4 * m.eigenvalues(1))
    assert(math.abs(stats.getDouble(2)) < 1e-6) // centered
    // partitioning changes float summation order only at ~1e-12
    val m2 = graft.operators.Similarity.pcaTrain(e.repartition(7), k = 3)
    m.eigenvalues.zip(m2.eigenvalues).foreach { case (a, b) =>
      assert(math.abs(a - b) < 1e-9 * math.max(1.0, a))
    }
    // projection plan is a pure map — no Exchange
    assert(!proj.queryExecution.executedPlan.toString.contains("Exchange"))
  }
}

class DecontaminateSpec extends AnyFunSuite {
  import SharedSpark._

  test("contamination fractions: exact copy 1.0, disjoint 0.0, half-overlap in between") {
    import spark.implicits._
    val bench = Seq((100L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text")
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),      // exact copy
      (2L, "one two three four five six"),              // disjoint
      (3L, "alpha beta gamma delta nine ten eleven"))   // partial overlap
      .toDF("doc_id", "text")
    val out = graft.operators.Dedup.decontaminate(docs, bench,
        "text", "doc_id", n = 3, threshold = 0.5)
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(3), r.getBoolean(4))).toMap
    assert(out(1L) === ((1.0, true)))
    assert(out(2L) === ((0.0, false)))
    // doc 3: grams = 5 trigrams, matched = [alpha beta gamma, beta gamma delta] = 2/5
    assert(out(3L) === ((0.4, false)))
  }
}

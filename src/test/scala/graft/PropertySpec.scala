package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.spec.Config
import graft.transforms._

/** Property-based operator laws (SURVEY §5: stronger-than-reference
  * test strategy). Small generated datasets, algebraic invariants.
  * Deterministic seeded generation (no scalatestplus bridge in the
  * offline cache — a fixed-seed loop gives reproducible cases).
  */
class PropertySpec extends SparkSuite {
  import spark.implicits._

  private def forAll[T](gen: Gen[T], cases: Int = 8)(f: T => Unit): Unit =
    (0 until cases).foreach { i =>
      f(gen.pureApply(Gen.Parameters.default, Seed(i.toLong)))
    }

  private def forAll[A, B](ga: Gen[A], gb: Gen[B])(f: (A, B) => Unit): Unit =
    (0 until 8).foreach { i =>
      f(ga.pureApply(Gen.Parameters.default, Seed(i.toLong)),
        gb.pureApply(Gen.Parameters.default, Seed(1000L + i)))
    }

  private val rows = Gen.listOfN(30, Gen.zip(Gen.choose(0, 9), Gen.choose(-100, 100)))

  test("filter output is a subset and matches scala predicate") {
    forAll(rows) { xs =>
      val df = xs.toDF("k", "v")
      val out = FilterOp(df, Config.of("field" -> "v", "op" -> "gt", "value" -> 0))
        .as[(Int, Int)].collect()
      assert(out.forall(_._2 > 0))
      assert(out.length == xs.count(_._2 > 0))
    }
  }

  test("dedup keep=any yields exactly the distinct key set; idempotent") {
    forAll(rows) { xs =>
      val df = xs.toDF("k", "v")
      val d1 = DedupOp(df, Config.of("keys" -> Seq("k")))
      assert(d1.select("k").as[Int].collect().toSet == xs.map(_._1).toSet)
      val d2 = DedupOp(d1, Config.of("keys" -> Seq("k")))
      assert(d2.count() == d1.count())
    }
  }

  test("union row count is the sum; aggregate count sums to total") {
    forAll(rows, rows) { (a, b) =>
      val dfa = a.toDF("k", "v")
      val dfb = b.toDF("k", "v")
      val u = UnionOp(dfa, Config.of("inputs" -> Seq("b")), Map("b" -> dfb))
      assert(u.count() == a.size + b.size)
      val agg = AggregateOp(u, Config.of("group_by" -> Seq("k"),
        "aggregations" -> Seq(Map("function" -> "count", "as" -> "n"))))
      assert(agg.agg(org.apache.spark.sql.functions.sum("n")).as[Long].head() == a.size + b.size)
    }
  }

  test("sample is partition-count invariant and monotone in threshold") {
    forAll(Gen.choose(1, 10)) { parts =>
      val df = sf("documents").limit(100)
      val s4 = SampleOp(df.repartition(parts), Config.of("key" -> "doc_id", "mod" -> 10, "below" -> 4))
      val s8 = SampleOp(df, Config.of("key" -> "doc_id", "mod" -> 10, "below" -> 8))
      val ids4 = s4.select("doc_id").as[Long].collect().toSet
      val ids8 = s8.select("doc_id").as[Long].collect().toSet
      assert(ids4.subsetOf(ids8))
    }
  }

  test("packing laws: bins respect capacity, partition all docs; bfd never uses more bins") {
    val docsGen = Gen.listOfN(25, Gen.choose(1, 12))
    forAll(docsGen) { lens =>
      val df = lens.zipWithIndex.map { case (n, i) =>
        (i.toLong, s"g${i % 2}", Seq.fill(n)("w").mkString(" "))
      }.toDF("doc_id", "source", "text")
      val cap = 16L
      def check(out: org.apache.spark.sql.DataFrame): Int = {
        val rows = out.select("source", "doc_id", "n_tokens", "bin")
          .as[(String, Long, Long, Long)].collect()
        assert(rows.length == lens.length) // every doc assigned exactly once
        val byBin = rows.groupBy(r => (r._1, r._4))
        byBin.foreach { case ((g, bin), members) =>
          val total = members.map(_._3).sum
          // a bin exceeds capacity only as a single oversized doc
          assert(total <= cap || members.length == 1,
            s"bin ($g,$bin) holds $total tokens across ${members.length} docs")
        }
        // bins are numbered densely from 0 within each group
        rows.groupBy(_._1).foreach { case (_, rs) =>
          val bins = rs.map(_._4).toSet
          assert(bins == (0L until bins.size).toSet)
        }
        byBin.size
      }
      val greedyBins = check(graft.ops.Packing.packGreedy(df, "doc_id", "source", "text", cap))
      val bfdBins = check(graft.ops.Packing.packBestFitDecreasing(df, "doc_id", "source", "text", cap))
      // not a theorem (decreasing-order anomalies exist in bin packing)
      // but deterministic on these fixed seeds — a regression pin that
      // bfd keeps its measured advantage on typical inputs
      assert(bfdBins <= greedyBins, s"bfd used $bfdBins bins vs greedy $greedyBins")
    }
  }

  test("minhash jaccard estimate tracks exact jaccard on near-dups") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota lambda"),
      (3L, "one two three four five six seven eight nine ten")).toDF("doc_id", "text")
    val pairs = graft.ops.Dedup.minhashNearDups(docs, "doc_id", "text", threshold = 0.3)
      .as[(Long, Long, Double)].collect()
    assert(pairs.exists(p => p._1 == 1L && p._2 == 2L && p._3 > 0.5))
    assert(!pairs.exists(p => p._2 == 3L || p._1 == 3L))
  }

  test("capped-bucket LSH contract: pair lost only if every colliding band oversized; exact dups survive") {
    import org.apache.spark.sql.functions._
    import graft.expr.MinHashExpressions
    val (numHashes, bands, k, cap, threshold) = (64, 16, 3, 4, 0.5)
    val r = numHashes / bands
    var anyLost = false // the cap must actually trip somewhere, or the contract check is vacuous
    (0 until 4).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      def words(prefix: String, n: Int) = Seq.fill(n)(s"$prefix${rnd.nextInt(40)}")
      val base = words("hot", 25)
      // 8 distinct near-identical docs: floods shared band buckets past the cap
      val hot = (0 until 8).map(j => (j.toLong, base.updated(j % base.size, s"mut$j").mkString(" ")))
      // 5 byte-identical copies of hot doc 0: exact dups inside the hot cluster
      val dups = (0 until 5).map(j => (100L + j, hot.head._2))
      // an unrelated planted near-dup pair: its buckets hold only itself
      val cold = words("cold", 25)
      val planted = Seq((200L, cold.mkString(" ")),
        (201L, cold.updated(rnd.nextInt(cold.size), "coldmut").mkString(" ")))
      val filler = (0 until 6).map(j => (300L + j, words(s"f$j-", 25).mkString(" ")))
      val df = (hot ++ dups ++ planted ++ filler).toDF("id", "text")

      def pairSet(maxBucketSize: Int) =
        graft.ops.Dedup.minhashNearDups(df, "id", "text", threshold,
          numHashes, k, bands, 42L, maxBucketSize)
          .select("a_id", "b_id").as[(Long, Long)].collect().toSet
      val capped = pairSet(cap)
      val uncapped = pairSet(0)
      assert(capped.subsetOf(uncapped))
      anyLost ||= (uncapped -- capped).nonEmpty

      // exact duplicates always survive a cap (collapsed before banding)
      val dupIds = 0L +: dups.map(_._1)
      dupIds.combinations(2).foreach { case Seq(a, b) =>
        assert(capped.contains((math.min(a, b), math.max(a, b))))
      }
      // the unrelated planted pair's buckets are never oversized
      assert(capped.contains((200L, 201L)))

      // full contract, test-side band recomputation (same kernel, same
      // rep collapse as minhashCandidates): a qualifying rep pair is
      // absent from the capped result IFF its every colliding band
      // bucket exceeds the cap
      val reps = df.join(
        df.select($"id", graft.ops.TextAnalysis.fingerprint($"text").as("fp"))
          .groupBy("fp").agg(min("id").as("rid")).select($"rid"),
        $"id" === $"rid", "left_semi")
      val sig = reps.select($"id",
        MinHashExpressions.minhashSignature(
          MinHashExpressions.textShingleHashes($"text", k), numHashes, 42L).as("sig"))
      val banded = sig.select($"id",
        posexplode(array((0 until bands).map(b => xxhash64(slice($"sig", b * r + 1, r))): _*))
          .as(Seq("band", "bh")))
      val withCount = banded.join(banded.groupBy("band", "bh").count(), Seq("band", "bh"))
      val minBucket = withCount.as("x")
        .join(withCount.as("y"),
          $"x.band" === $"y.band" && $"x.bh" === $"y.bh" && $"x.id" < $"y.id")
        .groupBy($"x.id".as("a"), $"y.id".as("b"))
        .agg(min($"x.count").as("minb"))
        .as[(Long, Long, Long)].collect()
        .map { case (a, b, m) => (a, b) -> m }.toMap
      val repIds = reps.select("id").as[Long].collect().toSet
      uncapped.filter { case (a, b) => repIds(a) && repIds(b) }.foreach { p =>
        val smallestCollidingBucket = minBucket.getOrElse(p, Long.MaxValue)
        // (when every colliding band is oversized, loss is the permitted
        // outcome — nothing to assert in that direction)
        if (smallestCollidingBucket <= cap)
          assert(capped.contains(p), s"pair $p has an under-cap band (size $smallestCollidingBucket) but was lost")
      }
    }
    assert(anyLost, "cap never dropped a pair across all seeds — contract untested")
  }

  test("ooo session fold: any arrival order + any watermark schedule == batch segmentation of kept rows") {
    import graft.streaming.Streaming
    val gap = 100L
    // events in a small time range, partitioned into arrival batches
    // in a RANDOM order; watermark schedule derived from arrivals the
    // way Spark derives it (max event time seen so far − delay)
    val evGen = Gen.listOfN(40, Gen.zip(Gen.choose(0L, 2000L), Gen.choose(1, 9)))
    forAll(evGen, Gen.choose(1, 6)) { (raw, nBatches) =>
      val events = raw.map { case (t, v) => (t, v.toDouble) }
      val batches = events.zipWithIndex.groupBy(_._2 % nBatches).toSeq.sortBy(_._1)
        .map(_._2.map(_._1)) // deterministic "random" interleave by index
      val delay = 150L
      var state: Option[Streaming.OooState] = Some(Streaming.OooState(Nil, None))
      var emitted = List.empty[Streaming.SessionOut]
      var maxSeen = Long.MinValue
      var wm = 0L
      val kept = scala.collection.mutable.ListBuffer.empty[(Long, Double)]
      batches.foreach { b =>
        // Spark semantics: wm in effect during a batch comes from data
        // seen through the PREVIOUS batch
        kept ++= b.filter(_._1 > wm) // what the operator's late filter keeps
        val (out, next) = Streaming.oooAdvance(7L,
          state.getOrElse(Streaming.OooState(Nil, None)), b, wm, gap)
        emitted :::= out.reverse
        state = next
        maxSeen = math.max(maxSeen, (b.map(_._1) :+ maxSeen).max)
        wm = math.max(wm, maxSeen - delay)
      }
      // flush: advance the watermark beyond everything (stream keeps
      // running with fresh data elsewhere) — every kept row releases,
      // every session closes
      val (out, next) = Streaming.oooAdvance(7L,
        state.getOrElse(Streaming.OooState(Nil, None)), Nil, maxSeen + 10 * gap, gap)
      emitted :::= out.reverse
      assert(next.isEmpty, "flush left state behind")
      // reference: plain batch gap-segmentation of the kept rows
      val sorted = kept.toList.sorted
      val expected = scala.collection.mutable.ListBuffer.empty[(Long, Long, Long, Double)]
      var cur: Option[(Long, Long, Long, Double)] = None
      sorted.foreach { case (t, v) =>
        cur match {
          case Some((s, e, n, tot)) if t - e <= gap => cur = Some((s, t, n + 1, tot + v))
          case Some(done) => expected += done; cur = Some((t, t, 1L, v))
          case None => cur = Some((t, t, 1L, v))
        }
      }
      cur.foreach(expected += _)
      val got = emitted.map(s => (s.session_start.getTime, s.session_end.getTime,
        s.n_events, s.total_value)).sorted
      assert(got == expected.toList.sorted,
        s"fold diverged from batch segmentation: got=$got expected=${expected.toList.sorted}")
    }
  }

  test("ngram contamination counts == scala brute-force set intersection") {
    import org.apache.spark.sql.functions.col
    val word = Gen.oneOf("a", "b", "c", "dd", "ee", "ff")
    val doc = Gen.choose(0, 7).flatMap(n => Gen.listOfN(n, word).map(_.mkString(" ")))
    forAll(Gen.listOfN(6, doc), cases = 5) { texts =>
      val train = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val bench = texts.reverse.take(2).zipWithIndex
        .map { case (t, i) => (100L + i, t) }.toDF("doc_id", "text")
      def grams(t: String): Set[String] = {
        val w = t.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
        if (w.length < 2) Set.empty
        else w.sliding(2).map(_.mkString(" ")).toSet
      }
      val benchGrams = texts.reverse.take(2).flatMap(grams).toSet
      val expected = texts.zipWithIndex.collect {
        case (t, i) if grams(t).nonEmpty =>
          i.toLong -> ((grams(t).size.toLong, grams(t).count(benchGrams).toLong))
      }.toMap
      val got = graft.ops.Dedup.ngramContamination(train, bench, "doc_id", "text", n = 2)
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      assert(got == expected, s"texts=$texts")
    }
  }

  test("url kernel == declarative form on generated urls (incl. junk)") {
    import org.apache.spark.sql.functions.col
    val scheme = Gen.oneOf("http", "HTTP", "https", "HTTPS", "ftp", "s3")
    val host = Gen.oneOf("Example.COM", "a.b.c.org", "LOCALHOST", "x-y.io")
    val port = Gen.oneOf("", ":80", ":443", ":8080", ":21")
    val path = Gen.oneOf("", "/", "/A/b", "/p%20q/r", "//double")
    val keys = Gen.listOfN(4, Gen.oneOf("a", "B", "utm_source", "utm_x", "z", "id"))
    val frag = Gen.oneOf("", "#f", "#a#b")
    val urlGen = for {
      s <- scheme; h <- host; p <- port; pa <- path; ks <- keys; f <- frag
      junk <- Gen.oneOf(true, false)
    } yield
      if (junk) s"$h$pa no scheme here $f"
      else s"$s://$h$p$pa" +
        (if (ks.isEmpty) "" else ks.zipWithIndex.map { case (k, i) => s"$k=$i" }
          .mkString("?", "&", "")) + f
    forAll(Gen.listOfN(24, urlGen), cases = 6) { urls =>
      val rows = urls.toDF("url")
        .select(graft.ops.TextAnalysis.normalizeUrl(col("url")).as("k"),
          graft.ops.TextAnalysis.normalizeUrlDeclarative(col("url")).as("d"))
        .collect()
      rows.foreach(r => assert(r.getString(0) == r.getString(1),
        s"kernel '${r.getString(0)}' != declarative '${r.getString(1)}'"))
    }
  }
}

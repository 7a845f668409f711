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
}

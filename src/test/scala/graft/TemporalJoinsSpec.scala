package graft

import org.apache.spark.sql.functions._

import graft.ops.TemporalJoins

/** As-of and range joins (graft.ops.TemporalJoins): semantics against
  * hand-computed expectations, plus the plan-shape guarantees that make
  * them viable at scale (single shuffle / bounded fan-out — no
  * nested-loop join node).
  */
class TemporalJoinsSpec extends SparkSuite {
  import spark.implicits._

  //  key 1: quotes at t=10,20,30 (ids 101,102,103); trades at 5,20,35
  //  key 2: one trade with no quote before it
  private def quotes = Seq(
    (1L, 10L, 101L, 1.0), (1L, 20L, 102L, 2.0), (1L, 30L, 103L, 3.0))
    .toDF("k", "t", "qid", "px")
  private def trades = Seq(
    (1L, 5L, 201L), (1L, 20L, 202L), (1L, 35L, 203L), (2L, 7L, 204L))
    .toDF("k", "t", "tid")

  test("asOf inclusive: latest right row at/before each left time") {
    val out = TemporalJoins.asOf(trades, quotes,
      Seq("k"), Seq("k"), "t", "t",
      rightPayload = Seq("qid", "px"), rightTieBreak = "qid")
      .select("tid", "asof_qid", "asof_px").as[(Long, Option[Long], Option[Double])]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(201L) == ((None, None)))             // nothing at/before t=5
    assert(out(202L) == ((Some(102L), Some(2.0))))  // t=20 quote visible (inclusive)
    assert(out(203L) == ((Some(103L), Some(3.0))))
    assert(out(204L) == ((None, None)))             // key 2 has no quotes
  }

  test("asOf strict: equal-time right row is invisible") {
    val out = TemporalJoins.asOf(trades, quotes,
      Seq("k"), Seq("k"), "t", "t",
      rightPayload = Seq("qid"), rightTieBreak = "qid", strict = true)
      .select("tid", "asof_qid").as[(Long, Option[Long])].collect().toMap
    assert(out(202L).contains(101L)) // t=20 quote excluded, falls back to t=10
  }

  test("asOf output cardinality equals left and plans without a join node") {
    val out = TemporalJoins.asOf(trades, quotes,
      Seq("k"), Seq("k"), "t", "t", Seq("px"), "qid")
    assert(out.count() == 4)
    val physical = out.queryExecution.executedPlan.toString
    assert(!physical.contains("Join"), s"expected join-free plan, got:\n$physical")
  }

  test("asOf ties: among equal-time right rows the max tiebreak wins") {
    val dupQuotes = Seq((1L, 10L, 301L, 1.0), (1L, 10L, 302L, 9.9))
      .toDF("k", "t", "qid", "px")
    val one = Seq((1L, 11L, 401L)).toDF("k", "t", "tid")
    val got = TemporalJoins.asOf(one, dupQuotes,
      Seq("k"), Seq("k"), "t", "t", Seq("qid"), "qid")
      .select("asof_qid").as[Long].head()
    assert(got == 302L)
  }

  test("rangeJoin: inclusive bounds, bucket blocking loses no pairs") {
    val a = Seq((1L, 100L, 1L), (1L, 200L, 2L), (2L, 100L, 3L)).toDF("k", "t", "aid")
    val b = Seq((1L, 100L, 10L), (1L, 149L, 11L), (1L, 150L, 12L),
      (1L, 151L, 13L), (2L, 300L, 14L)).toDF("k", "t", "bid")
    // window (0, 50]: strictly-after to +50 inclusive
    val pairs = TemporalJoins.rangeJoin(a, b, Seq("k"), Seq("k"), "t", "t", 1L, 50L)
      .select("aid", "r_bid").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 11L), (1L, 12L)))  // 149 and 150 in (100,150]; 151 out; key 2 out of range
    // plan must be an equi-join (hash/sort-merge), never nested-loop
    val physical = TemporalJoins.rangeJoin(a, b, Seq("k"), Seq("k"), "t", "t", 1L, 50L)
      .queryExecution.executedPlan.toString
    assert(!physical.contains("NestedLoop"), s"expected equi-join, got:\n$physical")
  }

  test("asOf attaches the latest right row atomically (NULL fields stay NULL)") {
    // latest quote (t=20) has px NULL: the output must NOT back-fill px
    // from the older t=10 row while qid comes from t=20 — the attached
    // row is the t=20 row, nulls included.
    val q = Seq((1L, 10L, 301L, Some(1.0)), (1L, 20L, 302L, Option.empty[Double]))
      .toDF("k", "t", "qid", "px")
    val one = Seq((1L, 25L, 401L)).toDF("k", "t", "tid")
    val got = TemporalJoins.asOf(one, q,
      Seq("k"), Seq("k"), "t", "t", Seq("qid", "px"), "qid")
      .select("asof_qid", "asof_px").as[(Option[Long], Option[Double])].head()
    assert(got == ((Some(302L), None)))
  }

  test("rangeJoin floors negative and >2^53 times exactly (integer bucket math)") {
    val big = (1L << 54) + 3L  // double-rounded bucket ids would collide/miss here
    val a = Seq((1L, -100L, 1L), (1L, big, 2L)).toDF("k", "t", "aid")
    val b = Seq((1L, -150L, 10L), (1L, -30L, 11L), (1L, big + 40L, 12L), (1L, big + 71L, 13L))
      .toDF("k", "t", "bid")
    val pairs = TemporalJoins.rangeJoin(a, b, Seq("k"), Seq("k"), "t", "t", -60L, 70L)
      .select("aid", "r_bid").as[(Long, Long)].collect().toSet
    // -100: [-160,-30] → -150, -30.  big: [big-60, big+70] → big+40 (big+71 excluded)
    assert(pairs == Set((1L, 10L), (1L, 11L), (2L, 12L)))
  }

  test("rangeJoin matches the naive theta-join on random data") {
    val a = (1 to 60).map(i => ((i % 3).toLong, (i * 37 % 500).toLong, i.toLong))
      .toDF("k", "t", "aid")
    val b = (1 to 80).map(i => ((i % 3).toLong, (i * 53 % 500).toLong, (1000 + i).toLong))
      .toDF("k", "t", "bid")
    val fast = TemporalJoins.rangeJoin(a, b, Seq("k"), Seq("k"), "t", "t", -25L, 25L)
      .select("aid", "r_bid").as[(Long, Long)].collect().toSet
    val naive = a.join(b.select(col("k").as("k2"), col("t").as("t2"), col("bid")),
        col("k") === col("k2") && col("t2") >= col("t") - 25 && col("t2") <= col("t") + 25)
      .select("aid", "bid").as[(Long, Long)].collect().toSet
    assert(fast == naive)
  }
}

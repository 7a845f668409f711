package graft

import org.apache.spark.sql.functions._

import graft.ops.{CountMin, TextAnalysis}

/** Count-Min sketch + CMS-prefiltered exact heavy hitters: the
  * no-undercount guarantee, partition independence (the determinism
  * contract an external oracle depends on), kernel ≡ declarative
  * estimate, and the lossless-prefilter heavy-hitter contract.
  */
class CountMinSpec extends SparkSuite {
  import spark.implicits._

  private def corpus() = {
    // zipf-ish: key k appears ~ 2000/k times
    val rows = for {
      k <- 1 to 50
      _ <- 1 to (2000 / k)
    } yield s"key$k"
    rows.toDF("k")
  }

  test("estimates never undercount, and are exact for isolated keys") {
    val df = corpus()
    val sketch = CountMin.build(df, "k", d = 4, w = 2048)
    val truth = df.groupBy("k").count().as[(String, Long)].collect().toMap
    for ((key, cnt) <- truth) {
      val est = CountMin.estimate(sketch, 4, 2048, key)
      assert(est >= cnt, s"$key: est $est < true $cnt")
    }
    // w >> distinct keys: most estimates should be exact
    val exact = truth.count { case (k, c) => CountMin.estimate(sketch, 4, 2048, k) == c }
    assert(exact >= truth.size * 9 / 10)
  }

  test("sketch is independent of partitioning and row order") {
    val df = corpus()
    val a = CountMin.build(df.repartition(7), "k", 4, 1024)
    val b = CountMin.build(df.coalesce(1), "k", 4, 1024)
    val c = CountMin.build(df.orderBy(rand(5)), "k", 4, 1024)
    assert(a.toSeq == b.toSeq)
    assert(a.toSeq == c.toSeq)
  }

  test("declarative estimateCol equals the scala estimate for every key") {
    val df = corpus()
    val sketch = CountMin.build(df, "k", 4, 512)
    val got = df.distinct()
      .select(col("k"), CountMin.estimateCol(sketch, 4, 512, col("k")).as("e"))
      .as[(String, Long)].collect()
    for ((key, e) <- got)
      assert(e == CountMin.estimate(sketch, 4, 512, key), key)
  }

  test("heavyHitters: exactly the keys with true weight >= threshold, exact counts, est >= cnt") {
    val df = corpus()
    val truth = df.groupBy("k").count().as[(String, Long)].collect().toMap
    val t = 100L
    val hh = CountMin.heavyHitters(df, "k", t, d = 4, w = 2048)
      .as[(String, Long, Long)].collect()
    val want = truth.filter(_._2 >= t)
    assert(hh.map(r => r._1 -> r._2).toMap == want)
    hh.foreach { case (k, cnt, est) => assert(est >= cnt, k) }
  }

  test("weighted build: weight column replaces per-row increments") {
    val df = Seq(("a", 10L), ("a", 5L), ("b", 1L)).toDF("k", "w")
    val sketch = CountMin.build(df, "k", 3, 64, weightCol = Some("w"))
    assert(CountMin.estimate(sketch, 3, 64, "a") >= 15L)
    val hh = CountMin.heavyHitters(df, "k", 15L, 3, 64, Some("w"))
      .as[(String, Long, Long)].collect()
    assert(hh.map(_._1).toSeq == Seq("a"))
    assert(hh.head._2 == 15L)
  }

  test("spec op dispatches; missing threshold is an analysis error") {
    import graft.spec._
    val df = corpus()
    val out = graft.transforms.Transforms(df,
      TransformSpec("hh", "heavy_hitters", Config.of(
        "key_field" -> "k", "threshold" -> 500L)), Map.empty)
    assert(out.columns.toSeq == Seq("key", "cnt", "est"))
    assert(out.count() >= 3) // key1..key4 are >= 500
    intercept[GraftAnalysisException] {
      graft.transforms.Transforms(df,
        TransformSpec("hh", "heavy_hitters", Config.of("key_field" -> "k")), Map.empty)
    }
  }

  test("prefilter is plan-visible: the exact aggregate sees only candidate rows") {
    // with a threshold over the corpus max, the candidate set is
    // empty — the groupBy consumes zero rows and returns zero keys
    val df = corpus()
    assert(CountMin.heavyHitters(df, "k", 1000000L).count() == 0)
  }
}

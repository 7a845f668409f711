package graft

import org.apache.spark.sql.functions._
import graft.ops.LinearClassifier

/** fastText-style closed-form linear classifier: solver math pinned
  * against an independent local reference (features re-derived with
  * java MessageDigest + a plain Gaussian-elimination ridge solve —
  * no shared code with the Cholesky path), plus the behavioral
  * contracts (generalization, exclusions, determinism).
  */
class LinearClassifierSpec extends SparkSuite {
  import spark.implicits._

  // ---- local reference implementation (independent of the engine) ----

  private def refTokens(text: String): Seq[String] =
    text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSeq

  private def refBuckets(text: String, nBuckets: Int): Seq[Int] = {
    val toks = refTokens(text)
    val grams = toks ++ toks.sliding(2).filter(_.length == 2).map(_.mkString(" "))
    val md = java.security.MessageDigest.getInstance("MD5")
    grams.map { g =>
      val hex = md.digest(g.getBytes("UTF-8")).take(2).map("%02x".format(_)).mkString
      (Integer.parseInt(hex, 16) % nBuckets)
    }.distinct.sorted
  }

  /** Plain Gaussian elimination with partial pivoting — deliberately
    * a different algorithm from the engine's Cholesky.
    */
  private def refSolve(aIn: Array[Array[Double]], bIn: Array[Double]): Array[Double] = {
    val n = aIn.length
    val a = aIn.map(_.clone())
    val b = bIn.clone()
    for (col <- 0 until n) {
      val piv = (col until n).maxBy(r => math.abs(a(r)(col)))
      val tmp = a(col); a(col) = a(piv); a(piv) = tmp
      val tb = b(col); b(col) = b(piv); b(piv) = tb
      for (r <- col + 1 until n) {
        val f = a(r)(col) / a(col)(col)
        for (c2 <- col until n) a(r)(c2) -= f * a(col)(c2)
        b(r) -= f * b(col)
      }
    }
    val x = new Array[Double](n)
    for (r <- (n - 1) to 0 by -1) {
      var s = b(r)
      for (c2 <- r + 1 until n) s -= a(r)(c2) * x(c2)
      x(r) = s / a(r)(r)
    }
    x
  }

  private val fixture = Seq(
    (1L, "alpha beta gamma alpha", "a"),
    (2L, "beta delta beta", "a"),
    (3L, "omega psi chi", "b"),
    (4L, "psi omega omega tau", "b"),
    (5L, "alpha delta gamma", "a"),
    (6L, "chi tau psi", "b"))

  test("fit matches an independent ridge solve exactly (small buckets)") {
    val nB = 8
    val lambda = 0.01
    val df = fixture.toDF("doc_id", "text", "y")
    val m = LinearClassifier.fit(df, "doc_id", "y", "text", nBuckets = nB, lambda = lambda)

    // reference: dense binary X with bias, normal equations, GE solve
    val dim = nB + 1
    val rows = fixture.map { case (_, text, y) => (refBuckets(text, nB), y) }
    val classes = rows.map(_._2).distinct.sorted
    assert(m.classes.toSeq == classes)
    val x = rows.map { case (bs, _) =>
      val v = new Array[Double](dim)
      bs.foreach(b => v(b) = 1.0)
      v(dim - 1) = 1.0
      v
    }
    val a = Array.ofDim[Double](dim, dim)
    for (r <- x; i <- 0 until dim; j <- 0 until dim) a(i)(j) += r(i) * r(j)
    for (i <- 0 until dim) a(i)(i) += lambda * x.length
    classes.zipWithIndex.foreach { case (cls, ci) =>
      val rhs = new Array[Double](dim)
      rows.zip(x).foreach { case ((_, y), r) =>
        if (y == cls) for (i <- 0 until dim) rhs(i) += r(i)
      }
      val expect = refSolve(a, rhs)
      val got = m.weights(ci)
      assert(got.length == dim)
      expect.zip(got).foreach { case (e, g) => assert(math.abs(e - g) < 1e-9, s"class $cls") }
    }

    // and score() replays w·x + b through the column path exactly
    val scores = m.score(df, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getDouble(2)).toMap
    fixture.foreach { case (id, text, _) =>
      val bs = refBuckets(text, nB)
      classes.zipWithIndex.foreach { case (cls, ci) =>
        val w = m.weights(ci)
        val e = bs.map(w(_)).sum + w(nB)
        assert(math.abs(scores((id, cls)) - e) < 1e-9)
      }
    }
  }

  test("separable vocabulary generalizes to held-out documents") {
    val train = Seq(
      (1L, "cat cat purr whiskers", "cat"), (2L, "purr cat feline", "cat"),
      (3L, "whiskers feline cat", "cat"), (4L, "dog bark woof fetch", "dog"),
      (5L, "woof dog canine", "dog"), (6L, "fetch canine dog", "dog"))
      .toDF("id", "text", "y")
    val m = LinearClassifier.fit(train, "id", "y", "text", nBuckets = 64)
    val test_ = Seq((10L, "purr whiskers feline"), (11L, "bark fetch woof"))
      .toDF("id", "text")
    val got = m.predict(test_, "id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(10L -> "cat", 11L -> "dog"))
  }

  test("documents with no alphanumeric tokens are excluded; nulls safe") {
    val m = LinearClassifier.fit(
      Seq((1L, "aa bb", "x"), (2L, "cc dd", "y")).toDF("id", "text", "y"),
      "id", "y", "text", nBuckets = 16)
    val scored = m.score(
      Seq((1L, "aa"), (2L, "!!! ---"), (3L, null.asInstanceOf[String]))
        .toDF("id", "text"), "id", "text")
    assert(scored.select("id").distinct().as[Long].collect().toSet == Set(1L))
  }

  test("codegen kernel ≡ declarative chain on adversarial inputs") {
    val tricky = Seq(
      "", " ", "a", "The quick-brown_fox 42 jumps!", "  leading and trailing  ",
      "ALL CAPS AND MiXeD", "digits 007 42x7", "ünïcödé ÉTÉ Straße",
      "a a a a", "tab\tand\nnewline seps", "1234567890", "!!!???",
      "word " * 50)
    val df = tricky.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    for (b <- Seq(16, 512)) {
      val mismatches = df.select(
        graft.ops.LinearClassifier.bucketArray(col("text"), b).as("k"),
        graft.ops.LinearClassifier.bucketArrayDeclarative(col("text"), b).as("d"))
        .where(not(col("k") <=> col("d")))
        .count()
      assert(mismatches == 0, s"kernel diverges from declarative chain at nBuckets=$b")
    }
    // null text: both forms yield null
    val nulls = Seq((1L, null.asInstanceOf[String])).toDF("id", "text")
      .select(graft.ops.LinearClassifier.bucketArray(col("text"), 16).as("k"),
        graft.ops.LinearClassifier.bucketArrayDeclarative(col("text"), 16).as("d"))
      .collect().head
    assert(nulls.isNullAt(0) && nulls.isNullAt(1))
  }

  test("fit is deterministic across repeated runs") {
    val df = fixture.toDF("doc_id", "text", "y")
    val m1 = LinearClassifier.fit(df, "doc_id", "y", "text", nBuckets = 32)
    val m2 = LinearClassifier.fit(df, "doc_id", "y", "text", nBuckets = 32)
    assert(m1.classes.toSeq == m2.classes.toSeq)
    m1.weights.zip(m2.weights).foreach { case (a, b) => assert(a.toSeq == b.toSeq) }
  }

  test("degenerate inputs are rejected with analysis-grade errors") {
    val one = Seq((1L, "aa", "only")).toDF("id", "text", "y")
    assertThrows[IllegalArgumentException] {
      LinearClassifier.fit(one, "id", "y", "text")
    }
    assertThrows[IllegalArgumentException] {
      LinearClassifier.fit(one, "id", "y", "text", lambda = 0.0)
    }
  }

  test("spec surface: linear_classify transform trains and predicts") {
    import graft.spec._
    val df = Seq(
      (1L, "cat purr cat", "cat"), (2L, "dog woof dog", "dog"),
      (3L, "purr cat feline", "cat"), (4L, "woof dog canine", "dog"))
      .toDF("id", "text", "y")
    val out = graft.transforms.Transforms(df,
      TransformSpec("lc", "linear_classify", Config.of(
        "id_field" -> "id", "label_field" -> "y", "buckets" -> 32L,
        "predict" -> true)), Map.empty)
    val got = out.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "cat", 2L -> "dog", 3L -> "cat", 4L -> "dog"))
  }
}

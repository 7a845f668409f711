package graft

import org.apache.spark.sql.functions._
import graft.ops.Dedup

/** SemDeDup: planted-twin behavior under the production k-means mode,
  * the paper's keep rule, drop-set invariants, exclusions,
  * determinism. (The hash-centroid mode is end-to-end oracle-gated by
  * x_dedup_semantic — every verdict row replayed in SQL.)
  */
class SemDedupSpec extends SparkSuite {
  import spark.implicits._

  /** Three well-separated cluster directions in R^8; `n` members per
    * cluster with small deterministic jitter, plus one near-identical
    * twin of member 0 in each cluster.
    */
  private def plantedCorpus(n: Int = 6): Seq[(Long, Seq[Float])] = {
    val dirs = Seq(
      Array(1.0, 0, 0, 0, 0, 0, 0, 0),
      Array(0, 0, 1.0, 0, 0, 0, 0, 0),
      Array(0, 0, 0, 0, 0, 1.0, 0, 0))
    val rnd = new scala.util.Random(7)
    val rows = for {
      (dir, c) <- dirs.zipWithIndex
      i <- 0 until n
    } yield {
      val v = dir.map(_ * 10.0).zipWithIndex.map { case (x, j) =>
        x + rnd.nextDouble() * 0.8 + (if (j == (c + i) % 8) 0.3 else 0.0)
      }
      ((c * 100 + i).toLong, v.map(_.toFloat).toSeq)
    }
    // twins: id c*100+90 is id c*100+0 nudged by 1e-4
    val twins = dirs.indices.map { c =>
      val base = rows.find(_._1 == c * 100L).get._2
      ((c * 100 + 90).toLong, base.map(x => x + 1e-4f))
    }
    rows ++ twins
  }

  test("kmeans mode: exactly one of each planted twin survives; paper keep rule") {
    val df = plantedCorpus().toDF("vec_id", "embedding")
    val out = Dedup.semDedup(df, "vec_id", "embedding", dim = 8,
      k = 3, eps = 0.999, centroidMode = "kmeans")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getBoolean(3)))
    assert(out.length == df.count())
    val byId = out.map(r => r._1 -> r).toMap
    for (c <- 0 until 3) {
      val a = byId(c * 100L); val twin = byId(c * 100L + 90)
      assert(a._2 == twin._2, s"twins of cluster $c assigned to different cells")
      assert(a._4 != twin._4, s"cluster $c: expected exactly one twin kept")
      val (kept, dropped) = if (a._4) (a, twin) else (twin, a)
      // the paper's rule: the survivor is the keep-preferred one —
      // strictly lower (centroid_cos, id)
      assert(kept._3 < dropped._3 || (kept._3 == dropped._3 && kept._1 < dropped._1),
        s"cluster $c: survivor is not the keep-preferred twin")
    }
  }

  test("invariant: no two kept items in one cell are eps-close") {
    val df = plantedCorpus(8).toDF("vec_id", "embedding")
    val eps = 0.995
    val out = Dedup.semDedup(df, "vec_id", "embedding", dim = 8,
      k = 3, eps = eps, centroidMode = "kmeans")
    val kept = out.where(col("kept"))
      .join(df, Seq("vec_id"))
      .select(col("vec_id"), col("cell"), col("embedding"))
    val a = kept.select(col("vec_id").as("ia"), col("cell"),
      col("embedding").as("va"))
    val b = kept.select(col("vec_id").as("ib"), col("cell"),
      col("embedding").as("vb"))
    val va = graft.ops.Similarity.toDoubleVec(col("va"))
    val vb = graft.ops.Similarity.toDoubleVec(col("vb"))
    val close = a.join(b, Seq("cell")).where(col("ia") < col("ib"))
      .where(graft.ops.Similarity.dot(va, vb) /
        (graft.ops.Similarity.l2norm(va) * graft.ops.Similarity.l2norm(vb)) >= eps)
    assert(close.count() == 0, "kept set contains an eps-close same-cell pair")
    // and every dropped item has a keep-preferred eps-close witness
    val verdicts = out.join(df, Seq("vec_id"))
    val dA = verdicts.select(col("vec_id").as("ia"), col("cell"),
      col("centroid_cos").as("ca"), col("embedding").as("va"), col("kept").as("ka"))
    val dB = verdicts.select(col("vec_id").as("ib"), col("cell"),
      col("centroid_cos").as("cb"), col("embedding").as("vb"))
    val witnessed = dA.where(!col("ka")).join(dB, Seq("cell"))
      .where(struct(col("cb"), col("ib")) < struct(col("ca"), col("ia")))
      .where(graft.ops.Similarity.dot(va, vb) /
        (graft.ops.Similarity.l2norm(va) * graft.ops.Similarity.l2norm(vb)) >= eps)
      .select("ia").distinct().count()
    assert(witnessed == verdicts.where(!col("kept")).count(),
      "a dropped item lacks its eps-close keep-preferred witness")
  }

  test("zero vectors and wrong-dim vectors are excluded from verdicts") {
    val df = (plantedCorpus(4) ++ Seq(
      (900L, Seq.fill(8)(0.0f)),
      (901L, Seq(1.0f, 2.0f)))).toDF("vec_id", "embedding")
    val out = Dedup.semDedup(df, "vec_id", "embedding", dim = 8,
      k = 3, eps = 0.99, centroidMode = "kmeans")
    val ids = out.select("vec_id").as[Long].collect().toSet
    assert(!ids.contains(900L) && !ids.contains(901L))
  }

  test("hash mode is deterministic and spec-exposed") {
    import graft.spec._
    val df = plantedCorpus(4).toDF("vec_id", "embedding")
    val r1 = Dedup.semDedup(df, "vec_id", "embedding", dim = 8,
      k = 4, eps = 0.9, centroidMode = "hash").orderBy("vec_id").collect()
    val r2 = graft.transforms.Transforms(df,
      TransformSpec("sd", "semdedup", Config.of(
        "id_field" -> "vec_id", "vec_field" -> "embedding", "dim" -> 8L,
        "k" -> 4L, "eps" -> 0.9, "centroids" -> "hash")), Map.empty)
      .orderBy("vec_id").collect()
    assert(r1.toSeq == r2.toSeq)
  }

  test("maxCellSize: twins still collapse (they share sub-cells), output schema intact") {
    val df = plantedCorpus(8).toDF("vec_id", "embedding")
    // cap of 4 forces a re-split of every 9-member cell (p >= 2), yet
    // each twin pair is cosine ~1 — the same sign on every hyperplane
    // up to the 1e-4 nudge, so they stay co-bucketed and still dedup
    val out = Dedup.semDedup(df, "vec_id", "embedding", dim = 8,
      k = 3, eps = 0.999, centroidMode = "hash", maxCellSize = 4)
      .collect().map(r => (r.getLong(0), r.getBoolean(3))).toMap
    assert(out.size == df.count())
    for (c <- 0 until 3)
      assert(out(c * 100L) != out(c * 100L + 90),
        s"cluster $c: capped run no longer collapses the planted twin")
    // cap >= corpus size is a no-op: identical verdicts to uncapped
    val uncapped = Dedup.semDedup(df, "vec_id", "embedding", dim = 8,
      k = 3, eps = 0.999, centroidMode = "hash").orderBy("vec_id").collect()
    val bigCap = Dedup.semDedup(df, "vec_id", "embedding", dim = 8,
      k = 3, eps = 0.999, centroidMode = "hash", maxCellSize = 100000)
      .orderBy("vec_id").collect()
    assert(uncapped.toSeq == bigCap.toSeq)
  }

  test("degenerate parameters rejected eagerly") {
    val df = plantedCorpus(2).toDF("vec_id", "embedding")
    assertThrows[IllegalArgumentException] {
      Dedup.semDedup(df, "vec_id", "embedding", dim = 0)
    }
    assertThrows[IllegalArgumentException] {
      Dedup.semDedup(df, "vec_id", "embedding", dim = 8, k = 1)
    }
    assertThrows[IllegalArgumentException] {
      Dedup.semDedup(df, "vec_id", "embedding", dim = 8, centroidMode = "nope")
    }
  }
}

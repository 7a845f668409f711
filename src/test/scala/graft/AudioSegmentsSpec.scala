package graft

import org.apache.spark.sql.functions._

import graft.ops.AudioSegments

/** Energy-gate segmentation: hand-built window layouts, channel
  * mixing, threshold edges, partial-tail drop, and the quarantine
  * seam. */
class AudioSegmentsSpec extends SparkSuite {
  import spark.implicits._

  private def segs(samples: Array[Int], channels: Int = 1, win: Int = 4,
      threshold: Double = 100.0) =
    AudioSegments.segmentsOf(samples, channels, win, threshold)

  test("windows merge into segments at silence gaps; rms exact on constant amplitude") {
    // layout (win=4): silent, 2x amp 4000, silent, 1x amp 6000
    val s = Array.fill(4)(0) ++ Array.fill(8)(4000) ++ Array.fill(4)(0) ++ Array.fill(4)(6000)
    assert(segs(s) == Vector((1, 2, 4000.0), (4, 1, 6000.0)))
    // leading/trailing activity flushes correctly
    assert(segs(Array.fill(8)(500)) == Vector((0, 2, 500.0)))
    assert(segs(Array.fill(4)(0)) == Vector())
  }

  test("threshold boundary: rms == threshold is ACTIVE; below is not") {
    assert(segs(Array.fill(4)(100), threshold = 100.0) == Vector((0, 1, 100.0)))
    assert(segs(Array.fill(4)(99), threshold = 100.0) == Vector())
    // alternating +/- amplitude has the same energy as constant
    assert(segs(Array(200, -200, 200, -200)) == Vector((0, 1, 200.0)))
  }

  test("stereo mono-mix averages channels; partial tail window drops") {
    // L=4000, R=0 -> mix 2000
    val stereo = Array.fill(4)(Array(4000, 0)).flatten
    assert(segs(stereo, channels = 2) == Vector((0, 1, 2000.0)))
    // 7 samples at win=4: one full window, tail dropped
    assert(segs(Array.fill(7)(300)) == Vector((0, 1, 300.0)))
  }

  test("DataFrame seam: packer layout replays; junk quarantines as seg = -1") {
    val docs = sf("documents")
    val packed = AudioSegments.packSegmentsWav(docs, "doc_id")
    val got = AudioSegments.segments(packed, "doc_id", "payload")
    assert(got.where($"seg" === -1).count() == 0)
    // id arithmetic: n segments and first-segment geometry
    val byId = got.groupBy($"id").agg(count(lit(1)).as("n")).as[(Long, Long)].collect().toMap
    byId.foreach { case (id, n) => assert(n == id % 3 + 1, s"id=$id") }
    val first = got.where($"seg" === 0)
      .select($"id", $"start_ms", $"n_windows", $"rms")
      .as[(Long, Long, Int, Double)].collect()
    first.foreach { case (id, startMs, nw, rms) =>
      assert(startMs == 25L && nw == (id % 4 + 1).toInt && rms == 4000.0, s"id=$id")
    }
    val junk = Seq((7L, "not audio".getBytes)).toDF("doc_id", "payload")
    val q = AudioSegments.segments(junk, "doc_id", "payload").collect()
    assert(q.length == 1 && q(0).getInt(1) == -1)
  }
}

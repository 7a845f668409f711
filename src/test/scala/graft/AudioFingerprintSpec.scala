package graft

import org.apache.spark.sql.functions._
import graft.ops.{AudioFingerprint, AudioPcm}

/** Spectral landmark fingerprints: the id-independent class-overlap
  * table behind the x_audio_fingerprint gate, landmark determinism,
  * and the pair pipeline's collapse/fan-out behavior.
  */
class AudioFingerprintSpec extends SparkSuite {
  import spark.implicits._

  /** Extract one clip's landmarks via the public packer + decoder. */
  private def classLandmarks(c: Long): Array[Long] = {
    val packed = AudioFingerprint.packToneSequenceWav(
      Seq(c).toDF("doc_id"), "doc_id")
    val payload = packed.select("media.payload").as[Array[Byte]].head()
    AudioFingerprint.landmarks(AudioPcm.decode(payload).get)
  }

  test("class-overlap table: 4 same-class, 3 at distance 6 or 7, < 3 elsewhere") {
    val lms = (0L until 10L).map(classLandmarks)
    lms.foreach(l => assert(l.length == 4, "each class carries 4 distinct landmarks"))
    for (a <- 0 until 10; b <- a until 10) {
      val common = lms(a).toSet.intersect(lms(b).toSet).size
      val expect =
        if (a == b) 4
        else if (math.abs(a - b) == 6 || math.abs(a - b) == 7) 3
        else if (math.abs(a - b) == 1) 2
        else if (math.abs(a - b) == 5 || math.abs(a - b) == 8) 1
        else 0
      assert(common == expect, s"classes $a,$b: $common common, expected $expect")
    }
  }

  test("landmarks are deterministic and order-canonical") {
    val l1 = classLandmarks(3L)
    val l2 = classLandmarks(13L) // same class, different id
    assert(l1.toSeq == l2.toSeq)
    assert(l1.toSeq == l1.sorted.toSeq && l1.distinct.length == l1.length)
  }

  test("audioNearDups finds the exact planted pair structure") {
    val docs = (0L until 30L).toDF("doc_id")
    val pairs = AudioFingerprint.audioNearDups(
      AudioFingerprint.packToneSequenceWav(docs, "doc_id"),
      "id", "media", minMatch = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // expected: same-class (3 ids per class -> 3 pairs per class x 10)
    // plus distance-6/7 cross pairs (3x3 member pairs per class pair)
    val expected = (for {
      a <- 0L until 30L; b <- (a + 1) until 30L
      ca = a % 10; cb = b % 10
      if ca == cb || math.abs(ca - cb) == 6 || math.abs(ca - cb) == 7
    } yield (a, b) -> (if (ca == cb) 4L else 3L)).toMap
    assert(pairs == expected)
  }

  test("minMatch filters and the ubiquitous-landmark cap drops hot landmarks") {
    val docs = (0L until 20L).toDF("doc_id")
    val packed = AudioFingerprint.packToneSequenceWav(docs, "doc_id")
    val strict = AudioFingerprint.audioNearDups(packed, "id", "media", minMatch = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // only same-class pairs share all 4
    assert(strict.forall { case (a, b) => a % 10 == b % 10 })
    // cap at df=1 removes every landmark shared by >1 fingerprint set;
    // remaining matches can only be the identical-set pairs
    val capped = AudioFingerprint.audioNearDups(packed, "id", "media",
      minMatch = 3, maxLandmarkDf = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(capped.forall { case (a, b) => a % 10 == b % 10 })
  }

  test("audioDedupGroups: linear-output grouping matches the class graph's closure") {
    val docs = (0L until 30L).toDF("doc_id")
    val groups = AudioFingerprint.audioDedupGroups(
      AudioFingerprint.packToneSequenceWav(docs, "doc_id"),
      "id", "media", minMatch = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(groups.size == 30, "one output row per clip — the linear contract")
    // distance-6/7 edges chain classes {0,1,2,3,6,7,8,9}; 4 and 5 stay alone
    (0L until 30L).foreach { id =>
      val expect = if (id % 10 == 4 || id % 10 == 5) id % 10 else 0L
      assert(groups(id) == expect, s"doc $id grouped as ${groups(id)}, want $expect")
    }
    // strict minMatch=4: only identical sets merge → group = class min
    val strict = AudioFingerprint.audioDedupGroups(
      AudioFingerprint.packToneSequenceWav(docs, "doc_id"),
      "id", "media", minMatch = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0L until 30L).foreach(id => assert(strict(id) == id % 10))
  }

  test("decode runs EXACTLY once per clip per dedup call (checkpoint tripwire)") {
    // Round-9 regression: fp was referenced via 7 downstream frames
    // and Catalyst re-derived the decode+FFT scan ~12×. The eager
    // localCheckpoint pins it to one pass; this counter (JVM-local,
    // exact under local[*]) fails the suite if anyone removes it.
    val docs = (0L until 24L).toDF("doc_id")
    val packed = AudioFingerprint.packToneSequenceWav(docs, "doc_id")
      .localCheckpoint(true) // isolate the counter from packer re-runs
    AudioFingerprint.decodeCount.set(0L)
    AudioFingerprint.audioNearDups(packed, "id", "media", minMatch = 3).collect()
    assert(AudioFingerprint.decodeCount.get() == 24L,
      s"audioNearDups decoded ${AudioFingerprint.decodeCount.get()} payloads for 24 clips")
    AudioFingerprint.decodeCount.set(0L)
    AudioFingerprint.audioDedupGroups(packed, "id", "media", minMatch = 3).collect()
    assert(AudioFingerprint.decodeCount.get() == 24L,
      s"audioDedupGroups decoded ${AudioFingerprint.decodeCount.get()} payloads for 24 clips")
  }

  test("too-short clips produce no landmarks; junk payloads no rows") {
    val short = AudioPcm.decode(
      AudioFingerprint.packToneSequenceWav(Seq(1L).toDF("doc_id"), "doc_id", frames = 2)
        .select("media.payload").as[Array[Byte]].head()).get
    assert(AudioFingerprint.landmarks(short).isEmpty)
    val junk = Seq((9L, "junk".getBytes("UTF-8"))).toDF("id", "p")
      .select(col("id"), struct(col("p").as("payload"), lit("x").as("mime")).as("media"))
    assert(AudioFingerprint.fingerprintDf(junk, "id", "media").count() == 0)
  }
}

package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Audio near-duplicate detection by spectral landmark fingerprinting
  * — the audio member of the near-dup family (text: MinHash/SimHash;
  * embeddings: sign-LSH/SemDeDup; images: pHash). The scheme is the
  * published constellation idea (Wang 2003, "An Industrial-Strength
  * Audio Search Algorithm" — public paper) simplified to a
  * deterministic landmark: per Hann frame take the dominant FFT bin
  * ([[Spectral]]), then hash each TRIPLE of consecutive peak bins —
  * a clip's fingerprint is its landmark set, and clips sharing
  * `minMatch` landmarks are near-duplicate candidates.
  *
  * Scale shape (the MinHash pipeline shape, reused deliberately):
  * landmark extraction is scan-local (decode + FFT per clip);
  * identical fingerprint SETS pre-collapse through an md5 digest so
  * verbatim duplicate audio costs one representative each; reps meet
  * in a landmark-keyed equi-join (ids only — no payloads travel),
  * pair match counts come from one aggregate, and member pairs fan
  * back through the digest membership. `maxLandmarkDf` drops
  * ubiquitous landmarks (the stop-words of audio) before the join —
  * the same hot-bucket cap every banded join here carries.
  */
object AudioFingerprint {

  /** Landmark hashes of one clip: dominant bin per frame, then a
    * 64-bit mix of each consecutive (p0, p1, p2) triple. Clips with
    * fewer than 3 frames yield no landmarks. DISTINCT, sorted — the
    * fingerprint is a set.
    */
  private[graft] def landmarks(clip: AudioPcm.Clip, frameSize: Int = 1024): Array[Long] = {
    require(frameSize >= 8 && (frameSize & (frameSize - 1)) == 0,
      s"fingerprint: frameSize=$frameSize must be a power of 2 >= 8")
    val mono = {
      val n = clip.samples.length / clip.channels
      val out = new Array[Double](n)
      var i = 0
      while (i < n) { out(i) = clip.samples(i * clip.channels).toDouble; i += 1 }
      out
    }
    val nFrames = mono.length / frameSize
    if (nFrames < 3) return Array.emptyLongArray
    val half = frameSize / 2
    val hann = Array.tabulate(frameSize)(n =>
      0.5 - 0.5 * StrictMath.cos(2.0 * StrictMath.PI * n / (frameSize - 1)))
    val peaks = new Array[Int](nFrames)
    var f = 0
    while (f < nFrames) {
      val re = new Array[Double](frameSize)
      val im = new Array[Double](frameSize)
      var n = 0
      while (n < frameSize) { re(n) = mono(f * frameSize + n) * hann(n); n += 1 }
      Spectral.fft(re, im)
      var peakK = 1
      var peakP = 0.0
      var k = 1
      while (k < half) {
        val p = re(k) * re(k) + im(k) * im(k)
        if (p > peakP) { peakP = p; peakK = k }
        k += 1
      }
      peaks(f) = peakK
      f += 1
    }
    val out = new Array[Long](nFrames - 2)
    f = 0
    while (f < nFrames - 2) {
      // 64-bit mix of the triple (splitmix-style finalizer over a
      // base-2048 packing — frame peaks are < frameSize/2 < 2048)
      var h = (peaks(f).toLong << 22) | (peaks(f + 1).toLong << 11) | peaks(f + 2).toLong
      h = (h ^ (h >>> 30)) * 0xbf58476d1ce4e5b9L
      h = (h ^ (h >>> 27)) * 0x94d049bb133111ebL
      out(f) = h ^ (h >>> 31)
      f += 1
    }
    out.distinct.sorted
  }

  /** Decode-pass counter, incremented once per payload decoded by
    * [[fingerprintDf]]. In local mode (tests, the driver harness) this
    * counts every decode in the JVM, so specs can assert the corpus is
    * decoded exactly ONCE per dedup call — the round-9 verdict found
    * Catalyst re-deriving the fingerprint scan ~12× before `fp` was
    * checkpointed, and this is the regression tripwire. On a cluster
    * it degrades gracefully to a per-executor count (never read by the
    * engine itself).
    */
  private[graft] val decodeCount = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Distributed fingerprints: one row per (id, landmark). Non-PCM or
    * too-short payloads produce no rows.
    */
  def fingerprintDf(df: DataFrame, idCol: String, mediaCol: String,
      frameSize: Int = 1024): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(mediaCol + ".payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, payload) =>
          decodeCount.incrementAndGet()
          AudioPcm.decodeAny(payload).toSeq.flatMap { clip =>
            landmarks(clip, frameSize).map(l => (id, l))
          }
        }
      }
      .toDF("id", "landmark")
  }

  /** Near-duplicate clip pairs: (a_id, b_id, n_common) for pairs
    * sharing at least `minMatch` landmarks. `maxLandmarkDf` > 0 drops
    * landmarks present in more than that many DISTINCT fingerprints
    * before the join (ubiquitous-landmark cap). `n_common` counts only
    * landmarks SURVIVING the cap — consistently for cross-set and
    * identical-set pairs, so an identical pair whose shared landmarks
    * are all ubiquitous drops out like any other.
    */
  def audioNearDups(df: DataFrame, idCol: String, mediaCol: String,
      minMatch: Int = 3, frameSize: Int = 1024, maxLandmarkDf: Int = 0): DataFrame = {
    require(minMatch >= 1, s"audio near-dup: minMatch=$minMatch must be >= 1")
    // `fp` is referenced through sets/reps/repLm/lm/ma/mb/cappedSizes;
    // Catalyst does NOT share subplans, so without truncation every
    // leaf occurrence re-decodes and re-FFTs the whole corpus (~12
    // full passes measured in round 9). Eager localCheckpoint runs the
    // decode exactly once — the Components.connectedComponents
    // pattern; same for the derived per-clip digest table.
    val fp = fingerprintDf(df, idCol, mediaCol, frameSize).localCheckpoint(true)
    // identical-fingerprint-set collapse: digest of the sorted
    // landmark set (landmarks() returns sorted distinct, so the
    // digest is canonical)
    val sets = fp.groupBy(col("id"))
      .agg(md5(to_json(struct(sort_array(collect_list(col("landmark")))))).as("__fpd"))
      .localCheckpoint(true)
    val reps = sets.groupBy(col("__fpd")).agg(min(col("id")).as("__rid"))
    val repLm = fp.join(reps.select(col("__rid").as("id"), col("__fpd")), Seq("id"))
    val lm0 =
      if (maxLandmarkDf <= 0) repLm
      else repLm.join(
        repLm.groupBy("landmark").count().where(col("count") > maxLandmarkDf),
        Seq("landmark"), "left_anti")
    // rep landmarks feed the self-join's both sides AND cappedSizes
    val lm = lm0.localCheckpoint(true)
    val a = lm.select(col("landmark"), col("id").as("a_id"))
    val b = lm.select(col("landmark"), col("id").as("b_id"))
    val repPairs = a.join(b, Seq("landmark")).where(col("a_id") < col("b_id"))
      .groupBy(col("a_id"), col("b_id"))
      .agg(count(lit(1)).cast("long").as("n_common"))
      .where(col("n_common") >= minMatch)
    // fan rep pairs back to member pairs through digest membership;
    // identical-set groups also pair among themselves (their common
    // count = the full set size)
    val ma = sets.select(col("__fpd").as("__fa"), col("id").as("__ida"))
    val mb = sets.select(col("__fpd").as("__fb"), col("id").as("__idb"))
    val crossPairs = repPairs
      .join(reps.select(col("__rid").as("a_id"), col("__fpd").as("__fa")), Seq("a_id"))
      .join(reps.select(col("__rid").as("b_id"), col("__fpd").as("__fb")), Seq("b_id"))
      .join(ma, Seq("__fa")).join(mb, Seq("__fb"))
      .select(least(col("__ida"), col("__idb")).as("a_id"),
        greatest(col("__ida"), col("__idb")).as("b_id"), col("n_common"))
    // identical-set pair size = the CAPPED landmark count of the
    // shared digest (lm carries __fpd), so the ubiquity cap applies
    // uniformly to both pair kinds
    val cappedSizes = lm.groupBy(col("__fpd"))
      .agg(count(lit(1)).cast("long").as("__n"))
    val identicalPairs = ma.join(mb, col("__fa") === col("__fb"))
      .where(col("__ida") < col("__idb"))
      .join(cappedSizes.withColumnRenamed("__fpd", "__fa"), Seq("__fa"))
      .where(col("__n") >= minMatch)
      .select(col("__ida").as("a_id"), col("__idb").as("b_id"),
        col("__n").as("n_common"))
    crossPairs.unionByName(identicalPairs)
  }

  /** The SCALE surface of audio dedup: (id, group_id) assignments
    * instead of member pairs. [[audioNearDups]]'s output is
    * inherently O(Σ group²) — correct for the pair contract, but a
    * corpus where near-dup groups grow with the corpus (the 10×
    * probe's planted classes, or real-world viral audio) pays a
    * quadratic fan-out. This variant stops at REP-level pairs,
    * contracts them with [[Components.connectedComponents]]
    * (large/small-star, no driver union-find), and maps members
    * through their fingerprint digest — one output row per clip,
    * linear at any duplication density. `group_id` is the component's
    * canonical (minimum) representative id; clips with no eps-mate
    * keep their own digest representative.
    */
  def audioDedupGroups(df: DataFrame, idCol: String, mediaCol: String,
      minMatch: Int = 3, frameSize: Int = 1024, maxLandmarkDf: Int = 0): DataFrame = {
    require(minMatch >= 1, s"audio groups: minMatch=$minMatch must be >= 1")
    // decode+FFT exactly once (see audioNearDups: Catalyst re-derives
    // un-truncated subplans per leaf occurrence)
    val fp = fingerprintDf(df, idCol, mediaCol, frameSize).localCheckpoint(true)
    val sets = fp.groupBy(col("id"))
      .agg(md5(to_json(struct(sort_array(collect_list(col("landmark")))))).as("__fpd"))
      .localCheckpoint(true)
    val reps = sets.groupBy(col("__fpd")).agg(min(col("id")).as("__rid"))
    val repLm = fp.join(reps.select(col("__rid").as("id"), col("__fpd")), Seq("id"))
    val lm = (
      if (maxLandmarkDf <= 0) repLm
      else repLm.join(
        repLm.groupBy("landmark").count().where(col("count") > maxLandmarkDf),
        Seq("landmark"), "left_anti")
    ).localCheckpoint(true) // both self-join sides read it
    val a = lm.select(col("landmark"), col("id").as("a_id"))
    val b = lm.select(col("landmark"), col("id").as("b_id"))
    val repPairs = a.join(b, Seq("landmark")).where(col("a_id") < col("b_id"))
      .groupBy(col("a_id"), col("b_id"))
      .agg(count(lit(1)).as("__n"))
      .where(col("__n") >= minMatch)
      .select(col("a_id"), col("b_id"))
    val comps = Components.connectedComponents(repPairs)
    val repGroup = reps
      .join(comps, reps("__rid") === comps("id"), "left")
      .select(col("__fpd"), coalesce(col("component"), col("__rid")).as("group_id"))
    sets.join(repGroup, Seq("__fpd"))
      .select(col("id").as(idCol), col("group_id"))
  }

  /** Tone-SEQUENCE WAV payloads for the fingerprint gate: 6 frames of
    * 1024 samples at 16 kHz, frame f's (bin-aligned) frequency chosen
    * by the clip's class c = id mod `classes` as
    * 500 + ((7c + 3f) mod 13)·250 Hz — so same-class clips carry
    * identical landmark sets and different classes share none (the
    * class → landmark-set map is id-independent; pinned in the spec).
    */
  def packToneSequenceWav(df: DataFrame, idCol: String, classes: Int = 10,
      sampleRate: Int = 16000, frames: Int = 6): DataFrame = {
    require(classes >= 2, s"packToneSequenceWav: classes=$classes")
    val spark = df.sparkSession
    import spark.implicits._
    val nClasses = classes
    Partitioning.fanOut(df)
      .select(col(idCol).cast("long"))
      .as[Long]
      .mapPartitions { rows =>
        def le16(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte)
        def le32(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
        rows.map { id =>
          val c = (((id % nClasses) + nClasses) % nClasses).toInt
          val n = 1024 * frames
          val data = new Array[Byte](n * 2)
          var i = 0
          while (i < n) {
            val f = i / 1024
            val freq = 500.0 + ((7 * c + 3 * f) % 13) * 250.0
            val s = (12000.0 * StrictMath.sin(2.0 * StrictMath.PI * freq * i / sampleRate)).toInt
            data(i * 2) = s.toByte
            data(i * 2 + 1) = (s >> 8).toByte
            i += 1
          }
          val wav = "RIFF".getBytes("US-ASCII") ++ le32(36 + data.length) ++
            "WAVE".getBytes("US-ASCII") ++
            "fmt ".getBytes("US-ASCII") ++ le32(16) ++
            le16(1) ++ le16(1) ++ le32(sampleRate) ++ le32(sampleRate * 2) ++
            le16(2) ++ le16(16) ++
            "data".getBytes("US-ASCII") ++ le32(data.length) ++ data
          (id, wav)
        }
      }
      .toDF("id", "__payload")
      .select(col("id"), struct(
        col("__payload").as("payload"),
        lit("audio/wav").as("mime"),
        struct(
          octet_length(col("__payload")).cast("long").as("byte_len"),
          lit(null).cast("int").as("width"),
          lit(null).cast("int").as("height"),
          lit(null).cast("long").as("duration_ms")).as("meta")).as("media"))
  }
}

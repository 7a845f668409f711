package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (SURVEY §2.6): image/audio/video as
  * opaque `binary` payloads plus a typed metadata struct, with
  * decode / feature-extraction running distributed via
  * `mapPartitions`.
  *
  * The Spark-side machinery — schema, batched per-partition execution,
  * deterministic output shape — is real and tested; the actual codec
  * call is stubbed behind [[MediaDecoder]] (image/audio libraries are
  * not available in this environment) with a deterministic fake, so
  * swapping in a real decoder is a one-function change and nothing
  * about the distributed plan moves.
  */
object Multimodal {

  /** Canonical media column layout: payload + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("payload", BinaryType),
    StructField("mime", StringType),
    StructField("meta", StructType(Seq(
      StructField("byte_len", LongType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("duration_ms", LongType))))))

  /** Decoder seam. A real deployment implements `decode` with an image
    * /audio codec (JNI/library); the pipeline shape is identical.
    */
  trait MediaDecoder extends Serializable {
    /** payload → fixed-length feature vector */
    def decode(payload: Array[Byte]): Array[Float]
    def featureDim: Int
  }

  /** Deterministic stand-in decoder: features derived from byte
    * statistics (length, positional byte sums, a rolling hash). NOT a
    * real codec — a placeholder with a stable, testable contract.
    *
    * The arithmetic is deliberately exact-integer until one final
    * double expression per feature (`sum/255.0/len*6`, then rounded
    * to float32): any engine can recompute the features bit-for-bit
    * from the payload bytes, which makes the whole decode path
    * differential-testable (the driver's DuckDB oracle re-derives
    * them from hex pairs of the payload).
    *
    * Layout: f0 = byte length; f1 = rolling hash
    * (h = 31·h + byte mod 2^24, seed 17); f2..f7 = normalized byte
    * sums of positions ≡ j (mod 6).
    */
  final class FakeDecoder extends MediaDecoder {
    val featureDim: Int = 8
    def decode(payload: Array[Byte]): Array[Float] = {
      val out = new Array[Float](featureDim)
      if (payload.isEmpty) return out
      val sums = new Array[Long](6)
      var h = 17L
      var i = 0
      while (i < payload.length) {
        val b = payload(i) & 0xFF
        h = (31L * h + b) % 16777216L
        sums(i % 6) += b
        i += 1
      }
      out(0) = payload.length.toFloat
      out(1) = h.toFloat
      var j = 0
      while (j < 6) {
        out(j + 2) = (sums(j).toDouble / 255.0 / payload.length * 6).toFloat
        j += 1
      }
      out
    }
  }

  /** Wrap a text/binary column into the canonical media struct (used
    * to build test corpora; real ingestion reads payloads from object
    * storage).
    */
  def packText(df: DataFrame, textCol: String, mime: String = "text/plain"): DataFrame =
    df.withColumn("media", struct(
      encode(col(textCol), "UTF-8").as("payload"),
      lit(mime).as("mime"),
      struct(
        octet_length(encode(col(textCol), "UTF-8")).cast("long").as("byte_len"),
        lit(null).cast("int").as("width"),
        lit(null).cast("int").as("height"),
        lit(null).cast("long").as("duration_ms")).as("meta")))

  /** Distributed decode: per-partition batched feature extraction.
    * Runs on executors via `mapPartitions` — the decoder is
    * instantiated once per partition (amortized codec init), rows
    * stream through without materializing the partition.
    */
  def extractFeatures(
      df: DataFrame, idCol: String, mediaCol: String,
      decoder: MediaDecoder = new FakeDecoder()): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(mediaCol + ".payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // per-partition decoder init happens here (once, not per row)
        rows.map { case (id, payload) =>
          (id, payload.length.toLong, decoder.decode(payload))
        }
      }
      .toDF("id", "byte_len", "features")
  }

  /** Transcoder seam for resize: a real deployment wraps an image
    * codec; the stub emits a deterministic downsample of the payload
    * bytes with the declared target dimensions in the metadata, so
    * schema/partitioning/size-accounting behave exactly as the real
    * thing.
    */
  trait MediaResizer extends Serializable {
    def resize(payload: Array[Byte], width: Int, height: Int): Array[Byte]
  }
  final class FakeResizer extends MediaResizer {
    def resize(payload: Array[Byte], width: Int, height: Int): Array[Byte] = {
      if (payload.isEmpty) return payload
      val target = math.max(1, math.min(payload.length, width * height / 8))
      val out = new Array[Byte](target)
      var i = 0
      while (i < target) { out(i) = payload((i.toLong * payload.length / target).toInt); i += 1 }
      out
    }
  }

  /** Distributed resize: payload → resized payload + updated metadata
    * struct. Output keeps the canonical media layout so resize stages
    * compose with decode/feature stages.
    */
  def resize(df: DataFrame, idCol: String, mediaCol: String, width: Int, height: Int,
      resizer: MediaResizer = new FakeResizer()): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(mediaCol + ".payload"), col(mediaCol + ".mime"))
      .as[(Long, Array[Byte], String)]
      .mapPartitions { rows =>
        rows.map { case (id, payload, mime) =>
          val resized = resizer.resize(payload, width, height)
          (id, resized, mime, resized.length.toLong, width, height)
        }
      }
      .toDF("id", "payload", "mime", "byte_len", "width", "height")
  }

  /** Frame sampling for video-like payloads: emit every `stride`-th of
    * `nFrames` equal payload segments as its own row (id, frame_idx,
    * frame bytes). One input row fans out to ≤ nFrames/stride rows —
    * the explode shape real frame extraction has; the segmenting stub
    * stands in for a container demuxer.
    */
  def frameSample(df: DataFrame, idCol: String, mediaCol: String,
      nFrames: Int, stride: Int = 1): DataFrame = {
    require(nFrames > 0 && stride > 0, "frameSample: nFrames and stride must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(mediaCol + ".payload"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, payload) =>
        if (payload.isEmpty) Iterator.empty
        else {
          val segLen = math.max(1, payload.length / nFrames)
          (0 until nFrames by stride).iterator
            .filter(i => i * segLen < payload.length)
            .map { i =>
              val start = i * segLen
              val end = math.min(start + segLen, payload.length)
              (id, i, java.util.Arrays.copyOfRange(payload, start, end))
            }
        }
      }
      .toDF("id", "frame_idx", "frame")
  }
}

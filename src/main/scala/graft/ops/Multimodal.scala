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
    * statistics (length, moments, positional hashes). NOT a real
    * codec — a placeholder with a stable, testable contract.
    */
  final class FakeDecoder(val featureDim: Int = 8) extends MediaDecoder {
    def decode(payload: Array[Byte]): Array[Float] = {
      val out = new Array[Float](featureDim)
      if (payload.isEmpty) return out
      var i = 0
      var h = 1125899906842597L
      while (i < payload.length) {
        h = 31 * h + payload(i)
        out(i % featureDim) += (payload(i) & 0xFF) / 255.0f
        i += 1
      }
      var j = 0
      while (j < featureDim) {
        out(j) = out(j) / payload.length * featureDim
        j += 1
      }
      out(0) = payload.length.toFloat
      out(1) = (h & 0xFFFFFF).toFloat
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
}

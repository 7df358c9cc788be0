package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: image/audio/video as opaque `binary`
  * columns with typed metadata, processed in batched partition passes —
  * the Scala analog of a `mapInPandas` decode stage.
  *
  * The actual codec step is STUBBED (no image/audio libraries in this
  * environment): [[StubDecoder]] produces deterministic fake
  * width/height/features from the bytes. Everything around it — schema,
  * binary plumbing, batch shape, partition-level batching, feature
  * output — is real and tested, so a real decoder drops in by replacing
  * one function.
  */
object Multimodal {

  /** One media blob: the universal multimodal row shape. */
  final case class MediaBlob(doc_id: Long, media_type: String, data: Array[Byte])

  /** Decoded metadata + features. `width`/`height` are fake (stub codec);
    * `n_bytes` and `byte_hist` are real functions of the bytes.
    */
  final case class MediaFeatures(
      doc_id: Long,
      media_type: String,
      n_bytes: Long,
      width: Int,
      height: Int,
      byte_hist: Array[Double])

  /** STUB decoder — deterministic fake of an image decode. A real
    * implementation would decode `blob.data` with an imaging library;
    * everything downstream consumes only the returned schema.
    */
  object StubDecoder {
    val HistBins = 16
    def decode(blob: MediaBlob): MediaFeatures = {
      val bytes = blob.data
      val hist = new Array[Double](HistBins)
      var i = 0
      while (i < bytes.length) {
        hist((bytes(i) & 0xFF) / (256 / HistBins)) += 1.0
        i += 1
      }
      val total = math.max(bytes.length, 1).toDouble
      var j = 0
      while (j < HistBins) { hist(j) /= total; j += 1 }
      MediaFeatures(
        doc_id = blob.doc_id,
        media_type = blob.media_type,
        n_bytes = bytes.length.toLong,
        // fake dimensions, deterministic in the payload size
        width = 16 + (bytes.length % 64),
        height = 16 + ((bytes.length / 64) % 64),
        byte_hist = hist)
    }
  }

  /** Wrap a text corpus as binary blobs (stand-in for real media files —
    * the plumbing is type-identical).
    */
  def toBlobs(docs: DataFrame, idCol: String, payloadCol: String): DataFrame =
    docs.select(
      col(idCol).cast("long").as("doc_id"),
      lit("application/octet-stream").as("media_type"),
      col(payloadCol).cast("binary").as("data"))

  /** The decode stage: batched per-partition map — mirrors the
    * `mapInPandas` batch shape (a real codec amortizes model/codec init
    * per batch, not per row).
    */
  def decodeFeatures(blobs: DataFrame, batchSize: Int = 64): DataFrame = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.as[MediaBlob].mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // per-batch init would go here (codec/model handle)
        batch.iterator.map(StubDecoder.decode)
      }
    }.toDF()
  }

  /** One sampled frame of a media blob (video frame-sampling shape). */
  final case class MediaFrame(doc_id: Long, frame_idx: Long, ts_ms: Long,
      data: Array[Byte])

  /** Frame sampling: one blob fans out to its frames — the batched
    * per-partition flatMap shape a video pipeline needs (rows multiply,
    * so this is the stage that must NOT collect or re-shuffle first; it
    * pipelines inside the scan's partition). The stub "codec" slices the
    * payload into fixed-size chunks at 25 fps (40 ms/frame), keeping
    * every `everyN`-th frame; a real decoder replaces only the slicing.
    */
  def frameSample(blobs: DataFrame, frameBytes: Int = 256, everyN: Int = 1,
      batchSize: Int = 64): DataFrame = {
    require(frameBytes > 0 && everyN > 0, "frameBytes and everyN must be positive")
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.as[MediaBlob].mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // per-batch init would go here (demuxer/codec handle)
        batch.iterator.flatMap { b =>
          val n = b.data.length
          val nFrames = (n + frameBytes - 1) / frameBytes
          (0 until nFrames by everyN).iterator.map { f =>
            val from = f * frameBytes
            MediaFrame(b.doc_id, f.toLong, f.toLong * 40L,
              java.util.Arrays.copyOfRange(b.data, from, math.min(from + frameBytes, n)))
          }
        }
      }
    }.toDF()
  }

  /** A resized media payload (stub codec). */
  final case class ResizedMedia(doc_id: Long, media_type: String,
      width: Int, height: Int, data: Array[Byte])

  /** Resize stage: deterministic nearest-neighbor "downsample" of the
    * byte payload to exactly width*height bytes (index-scaled sampling;
    * zero-filled for empty payloads). Schema and batch shape match what a
    * real image resize over `mapInPandas` produces.
    */
  def resizeStub(blobs: DataFrame, width: Int, height: Int,
      batchSize: Int = 64): DataFrame = {
    require(width > 0 && height > 0, "target dimensions must be positive")
    val spark = blobs.sparkSession
    import spark.implicits._
    val outLen = width * height
    blobs.as[MediaBlob].mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { b =>
          val n = b.data.length
          val out = new Array[Byte](outLen)
          if (n > 0) {
            var i = 0
            while (i < outLen) {
              out(i) = b.data((i.toLong * n / outLen).toInt)
              i += 1
            }
          }
          ResizedMedia(b.doc_id, b.media_type, width, height, out)
        }
      }
    }.toDF()
  }
}

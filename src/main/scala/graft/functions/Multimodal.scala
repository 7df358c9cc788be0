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
}

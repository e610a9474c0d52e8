package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: opaque `binary` payloads with typed metadata,
  * processed by per-partition typed operators.
  *
  * The Spark-side shape is real and at-scale correct — binary column +
  * metadata struct in parquet, `mapPartitions` over the typed Dataset (one
  * JVM pass per partition, no driver involvement, no shuffle) — while the
  * actual media codecs are STUBBED with deterministic byte-level fakes
  * (image/audio libs are not in this container). Swapping `decodeStub` for
  * a real JNI/ffmpeg call changes no schema, partitioning, or plan shape.
  */
object Multimodal {

  final case class MediaMeta(width: Int, height: Int, sampleRate: Int)
  final case class MediaRow(doc_id: Long, modality: String,
      payload: Array[Byte], meta: MediaMeta)
  final case class MediaFeatures(doc_id: Long, modality: String,
      byte_len: Long, checksum: Long, head_byte: Int, tail_byte: Int)

  val P: Long = 2147483647L

  /** Build a media table from the documents table: payload = UTF-8 bytes of
    * the text (a deterministic stand-in for real image/audio bytes),
    * modality round-robin, metadata derived from doc stats.
    */
  def mediaTable(spark: SparkSession, sfDir: String): Dataset[MediaRow] = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(
        col("doc_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("modality"),
        encode(col("text"), "UTF-8").as("payload"),
        struct(
          (col("n_chars") % 640).cast("int").as("width"),
          (col("n_chars") % 480).cast("int").as("height"),
          lit(16000).as("sampleRate")).as("meta"))
      .as[MediaRow]
  }

  /** "Decode" stub: polynomial checksum + head/tail bytes. Deterministic,
    * byte-level, runs where a real codec would — inside mapPartitions on
    * executors, one batch of rows per partition.
    */
  private def featuresOf(m: MediaRow): MediaFeatures = {
    val bytes = m.payload
    var h = 0L
    var i = 0
    while (i < bytes.length) { h = (h * 31 + (bytes(i) & 0xff)) % P; i += 1 }
    MediaFeatures(m.doc_id, m.modality, bytes.length.toLong, h,
      if (bytes.nonEmpty) bytes(0) & 0xff else -1,
      if (bytes.nonEmpty) bytes(bytes.length - 1) & 0xff else -1)
  }

  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.map(featuresOf))
  }

  /** Resize + feature summary in one executor pass (the gate surface for
    * the resize stub: new width, downsampled payload length/checksum).
    */
  def resizeFeatures(media: Dataset[MediaRow], targetWidth: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    resize(media, targetWidth).mapPartitions(_.map { m =>
      val f = featuresOf(m)
      (m.doc_id, m.meta.width, f.byte_len, f.checksum, f.head_byte, f.tail_byte)
    }).toDF("doc_id", "new_width", "byte_len", "checksum", "head_byte", "tail_byte")
  }

  /** "Resize" stub: metadata transform + deterministic payload downsample
    * (every k-th byte — the plumbing a real resampler needs: new payload,
    * new meta, same row identity).
    */
  def resize(media: Dataset[MediaRow], targetWidth: Int): Dataset[MediaRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.map { m =>
      val k = math.max(1, if (m.meta.width > 0) m.meta.width / math.max(targetWidth, 1) else 1)
      val ds = m.payload.indices.collect { case i if i % k == 0 => m.payload(i) }.toArray
      m.copy(payload = ds,
        meta = m.meta.copy(width = math.min(m.meta.width, targetWidth)))
    }
  }

  /** "Frame sample" stub for video rows: split payload into fixed-size
    * frames, keep every `stride`-th — flatMap (1 row → n frames), the shape
    * of real frame extraction.
    */
  def sampleFrames(media: Dataset[MediaRow], frameSize: Int, stride: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(_.modality == "video")
      .flatMap { m =>
        m.payload.grouped(frameSize).zipWithIndex
          .collect { case (frame, idx) if idx % stride == 0 =>
            (m.doc_id, idx, frame.length, frame)
          }
      }
      .toDF("doc_id", "frame_idx", "frame_len", "frame_bytes")
  }
}

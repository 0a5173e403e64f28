package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.Sql

/** Multimodal column support: image/audio/video as opaque `binary` columns
  * with typed metadata, plus feature extraction over `mapPartitions`.
  *
  * The container has no image/audio codecs, so the decode step is a
  * clearly-marked deterministic STUB ([[stubDecode]]); everything around it
  * — schema, kind routing, partition-preserving batch shape, the per-
  * partition iterator contract a real decoder (JNI codec, ONNX runtime)
  * would plug into — is real and tested. The fixture payload is the
  * document text's bytes.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, kind: String, payload: Array[Byte],
      width: Int, height: Int, format: String)

  case class MediaFeatures(doc_id: Long, kind: String, n_bytes: Long,
      histogram: Array[Float])

  /** Media table surrogate: documents → binary payload + typed metadata.
    * kind is routed deterministically from doc_id (image/audio/video). */
  def mediaTable(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "documents").select(
      $"doc_id",
      element_at(typedLit(Seq("image", "audio", "video")),
        (pmod($"doc_id", lit(3L)) + 1).cast("int")).as("kind"),
      $"text".cast("binary").as("payload"),
      ($"n_chars" % 640 + 1).cast("int").as("width"),
      ($"n_chars" % 480 + 1).cast("int").as("height"),
      lit("raw").as("format"))
  }

  /** STUB decoder: a real implementation would decode the payload
    * (image pixels / audio PCM / video frames) here; the container ships no
    * codecs, so features are a deterministic 16-bin byte histogram with the
    * same shape a real embedding would have. Partition-preserving
    * `mapPartitions` — one iterator per partition is exactly the batch
    * shape a native decoder wants (amortized codec init per partition).
    */
  def stubDecode(payload: Array[Byte]): Array[Float] = {
    val hist = new Array[Float](16)
    var i = 0
    while (i < payload.length) { hist((payload(i) & 0xff) / 16) += 1f; i += 1 }
    val n = math.max(payload.length, 1).toFloat
    var j = 0
    while (j < 16) { hist(j) /= n; j += 1 }
    hist
  }

  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition init point for a real codec/session goes here
      it.map(r => MediaFeatures(r.doc_id, r.kind, r.payload.length.toLong,
        stubDecode(r.payload)))
    }
  }

  // ---------------------------------------------------------------- q57
  /** Binary-column metadata: byte length + content digest per media row —
    * binary plumbing that IS oracle-checkable (digest of the raw bytes). */
  def q57MediaMeta(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    mediaTable(s, dir)
      .select($"doc_id", $"kind", length($"payload").cast("long").as("n_bytes"),
        sha2($"payload", 256).as("payload_sha"))
      .orderBy($"doc_id")
  }

  val q57Oracle: String =
    s"""SELECT doc_id,
       |  ['image', 'audio', 'video'][${Sql.pmod("doc_id", 3)} + 1] AS kind,
       |  octet_length(CAST(text AS BLOB)) AS n_bytes,
       |  sha256(text) AS payload_sha
       |FROM documents ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q58
  /** Frame sampling plumbing: split each payload into fixed 64-byte frames
    * (the video-frame-extraction shape: explode over a computed frame
    * index, per-frame offset/length). */
  def q58FrameSample(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    mediaTable(s, dir)
      .withColumn("n_bytes", length($"payload").cast("long"))
      .withColumn("n_frames", expr("(n_bytes + 63) div 64"))
      // guard the zero-byte payload: sequence(0, -1) would step DOWN and
      // emit two bogus frames (the oracle's range(0, 0) emits none)
      .filter($"n_frames" > 0)
      .select($"doc_id", $"kind", $"n_bytes",
        explode(sequence(lit(0L), $"n_frames" - 1)).as("frame_id"))
      .withColumn("frame_offset", $"frame_id" * 64)
      .withColumn("frame_len", least(lit(64L), $"n_bytes" - $"frame_offset"))
      .select($"doc_id", $"frame_id", $"frame_offset", $"frame_len")
      .orderBy($"doc_id", $"frame_id")
  }

  val q58Oracle: String =
    """SELECT doc_id, unnest(range(0, (n_bytes + 63) // 64)) AS frame_id,
      |  unnest(range(0, (n_bytes + 63) // 64)) * 64 AS frame_offset,
      |  LEAST(64, n_bytes - unnest(range(0, (n_bytes + 63) // 64)) * 64) AS frame_len
      |FROM (SELECT doc_id, octet_length(CAST(text AS BLOB)) AS n_bytes FROM documents)
      |ORDER BY doc_id, frame_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q57_media_meta" -> q57MediaMeta _,
    "q58_frame_sample" -> q58FrameSample _,
  )

  val oracles: Map[String, String] = Map(
    "q57_media_meta" -> q57Oracle,
    "q58_frame_sample" -> q58Oracle,
  )
}

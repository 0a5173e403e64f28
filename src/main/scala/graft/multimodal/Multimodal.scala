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

  // ---------------------------------------------------------------- q159
  /** Byte-level media QUALITY gate — real binary introspection with no
    * codec dependency: per media row, the byte-value distribution of the
    * raw payload yields (a) its integer-milli Shannon entropy — the
    * corrupt/blank-asset filter every multimodal ingest runs (near-zero =
    * constant/blank payload; near 8000 = compressed/encrypted bytes
    * posing as raw) — and (b) the printable-byte fraction (the "is this
    * text posing as media" sniff; on the fixture's text-surrogate
    * payloads it correctly reads ~1000‰). Byte extraction is codegen'd
    * builtins over the BINARY column — hex() → fixed-width substr →
    * conv(_, 16, 10) — no UDF anywhere; the oracle parses the same hex
    * pairs positionally via strpos arithmetic. Entropy is libm-free via
    * [[Sql.qlogMilliSpark]]: n·H = Σ c_v·(qlog(n) − qlog(c_v)) in pure
    * int64 milli-bits, ÷ n once at the end (error ≤ 0.086 bits — the
    * q156 quantization, with the gate threshold calibrated on the same
    * quantized scale).
    *
    * Scale shape: the byte explode amplifies ×n_bytes but the partial
    * agg collapses it to ≤ 256 surviving groups per doc per task (the
    * q95/q97 histogram contract — the shuffle is histogram-sized); the
    * entropy fold then runs over ≤ 256 rows per doc on the same
    * clustering; flags are map-side CASEs. */
  def q159MediaEntropy(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // Two measured pitfalls shaped this plan (both kept out of the hot
    // path): hex() INSIDE the per-byte lambda is re-evaluated per element
    // (O(n²) bytes/doc — 6.1 s at sf0.1), and ANY higher-order transform
    // lambda is an interpreted CodegenFallback per element (~4 s for
    // 1.65M evals). So the hex string is computed once per row and split
    // into 2-char pairs by ONE codegen'd regex split (\G anchored); the
    // pair→value parse then runs in the codegen'd post-explode projection.
    val bytes = mediaTable(s, dir)
      .select($"doc_id", $"kind",
        length($"payload").cast("long").as("n_bytes"),
        hex($"payload").as("h"))
      .select($"doc_id", $"kind", $"n_bytes",
        explode(split($"h", "(?<=\\G..)")).as("hb"))
      .filter($"hb" =!= "")
      .select($"doc_id", $"kind", $"n_bytes",
        expr("cast((instr('0123456789ABCDEF', substr(hb, 1, 1)) - 1) * 16 " +
          "+ instr('0123456789ABCDEF', substr(hb, 2, 1)) - 1 as bigint)")
          .as("v"))
    bytes.groupBy($"doc_id", $"kind", $"n_bytes", $"v")
      .agg(count(lit(1)).as("c"))
      .groupBy($"doc_id", $"kind", $"n_bytes")
      .agg(sum(expr(s"c * (${Sql.qlogMilliSpark("n_bytes")}" +
          s" - ${Sql.qlogMilliSpark("c")})")).as("ent_num"),
        sum(when($"v" >= 32L && $"v" <= 126L, $"c").otherwise(0L))
          .as("printable"))
      .withColumn("milli_entropy", expr("ent_num div n_bytes"))
      .withColumn("printable_milli", expr("(printable * 1000) div n_bytes"))
      .withColumn("is_texty", $"printable_milli" >= 950L)
      .withColumn("entropy_ok", $"milli_entropy" >= 4000L)
      .select($"doc_id", $"kind", $"n_bytes", $"milli_entropy",
        $"printable_milli", $"is_texty", $"entropy_ok")
      .orderBy($"doc_id")
  }

  val q159Oracle: String = {
    val kind = s"['image', 'audio', 'video'][${Sql.pmod("doc_id", 3)} + 1]"
    def hx(i: String): String =
      s"(strpos('0123456789ABCDEF', upper(substr(h, CAST($i AS INTEGER), 1))) - 1)"
    s"""WITH base AS (
       |  SELECT doc_id, $kind AS kind,
       |    CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
       |    hex(CAST(text AS BLOB)) AS h
       |  FROM documents),
       |b AS (
       |  SELECT doc_id, kind, n_bytes,
       |    CAST(${hx("bi * 2 - 1")} * 16 + ${hx("bi * 2")} AS BIGINT) AS v
       |  FROM (SELECT *, unnest(range(1, n_bytes + 1)) AS bi FROM base)),
       |hist AS (
       |  SELECT doc_id, kind, n_bytes, v, CAST(COUNT(*) AS BIGINT) AS c
       |  FROM b GROUP BY doc_id, kind, n_bytes, v)
       |SELECT doc_id, kind, n_bytes,
       |  CAST(SUM(c * (${Sql.qlogMilliDuck("n_bytes")}
       |    - ${Sql.qlogMilliDuck("c")})) AS BIGINT) // n_bytes AS milli_entropy,
       |  (CAST(SUM(CASE WHEN v BETWEEN 32 AND 126 THEN c ELSE 0 END)
       |    AS BIGINT) * 1000) // n_bytes AS printable_milli,
       |  (CAST(SUM(CASE WHEN v BETWEEN 32 AND 126 THEN c ELSE 0 END)
       |    AS BIGINT) * 1000) // n_bytes >= 950 AS is_texty,
       |  CAST(SUM(c * (${Sql.qlogMilliDuck("n_bytes")}
       |    - ${Sql.qlogMilliDuck("c")})) AS BIGINT) // n_bytes >= 4000
       |    AS entropy_ok
       |FROM hist GROUP BY doc_id, kind, n_bytes
       |ORDER BY doc_id""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q57_media_meta" -> q57MediaMeta _,
    "q58_frame_sample" -> q58FrameSample _,
    "q159_media_entropy" -> q159MediaEntropy _,
  )

  val oracles: Map[String, String] = Map(
    "q57_media_meta" -> q57Oracle,
    "q58_frame_sample" -> q58Oracle,
    "q159_media_entropy" -> q159Oracle,
  )
}

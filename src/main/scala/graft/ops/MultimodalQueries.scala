package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column handling: media payloads ride through the engine as
  * opaque `binary` columns with typed metadata, and decode/feature
  * extraction runs as a partition-wise typed transform (`mapPartitions`
  * over a `Dataset[MediaAsset]` — the Scala analog of a Pandas-UDF batch
  * pipeline: one decoder instantiation per partition, streamed batches,
  * never a driver collect).
  *
  * No image/audio codec exists in this sandbox, so [[MultimodalStub.decode]]
  * is a STUB: a deterministic fake decoder (documented as such) standing in
  * for libjpeg/ffmpeg. Everything around it — binary schema, partitioning,
  * batch shape, frame-sample explode, metadata extraction — is real Spark
  * plumbing and is what these queries and MultimodalSpec exercise.
  *
  * The reference's closest analog is its non-tabular file path: whole-file
  * bytes treated as a single opaque record (reference:
  * engine/wprdc_etl/pipeline/extractors.py:36-57 FileExtractor;
  * loaders.py:694-727 NontabularFileLoader).
  */
object MultimodalQueries {
  type Q = (SparkSession, String) => DataFrame

  /** An opaque media payload + typed metadata. `content` is the raw bytes
    * (here: utf-8 of the document text standing in for an encoded frame
    * stream — deterministic, no external data). */
  final case class MediaAsset(doc_id: Long, media_type: String,
      content: Array[Byte], n_bytes: Long)

  /** One extracted "frame": fixed-stride sample of the payload. */
  final case class Frame(doc_id: Long, frame_idx: Int, offset: Long,
      frame_hex: String)

  private def docs(s: SparkSession, d: String): DataFrame =
    s.read.parquet(s"$d/documents.parquet")

  /** documents -> binary media assets (media_type assigned round-robin by
    * id — deterministic fake modality labels). */
  def assets(s: SparkSession, d: String): Dataset[MediaAsset] = {
    import s.implicits._
    docs(s, d).select(
      col("doc_id"),
      element_at(
        array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast(IntegerType)).as("media_type"),
      encode(col("text"), "utf-8").as("content"),
      // BYTE length of the payload (length() on a binary column counts
      // bytes) — a char count would diverge from the byte-offset frame
      // math the moment a document carries a multibyte char
      length(encode(col("text"), "utf-8")).cast(LongType).as("n_bytes"))
      .as[MediaAsset]
  }

  // ----------------------------------- q31 binary metadata extraction

  /** Typed metadata over the opaque binary column: byte length, content
    * hash, 8-byte header (magic-bytes sniffing position), first byte —
    * all computed ON the bytes, never on a char view: header/magic are
    * BYTE concepts, and a char-based reading would silently diverge on
    * the first multibyte document (the oracle slices the hex rendering —
    * 2 hex chars per byte — for the same reason: DuckDB md5(VARCHAR)
    * already hashes the utf-8 bytes, but its substr is char-based). */
  private val q31: Q = (s, d) =>
    assets(s, d).toDF()
      .select(col("doc_id"), col("media_type"),
        col("n_bytes"),
        md5(col("content")).as("content_md5"),
        hex(substring(col("content"), 1, 8)).as("header_hex"),
        hex(substring(col("content"), 1, 1)).as("magic0_hex"))
  private val q31Sql =
    """SELECT doc_id,
       CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
       octet_length(encode(text))::BIGINT AS n_bytes,
       md5(text) AS content_md5,
       substr(hex(encode(text)), 1, 16) AS header_hex,
       substr(hex(encode(text)), 1, 2) AS magic0_hex
       FROM documents"""

  // --------------------------------------- q32 frame sampling (explode)

  val FrameStride = 64
  val FrameLen = 16

  /** Fixed-stride frame sampling: every 64th byte offset yields a 16-byte
    * "frame" (hex-encoded). The explode is a generator over a computed
    * sequence — whole-stage-codegen'd, no UDF; at scale each asset's
    * frames stay on the partition that holds its bytes (no join, no
    * shuffle — one pass over the binary column). Frames are sliced from
    * the HEX rendering (2 hex chars per byte) so the offsets are byte
    * offsets on both sides — slicing a char view would drift off the
    * byte grid on multibyte documents (and DuckDB cannot substr a BLOB). */
  private val q32: Q = (s, d) =>
    assets(s, d).toDF()
      .select(col("doc_id"), hex(col("content")).as("hx"),
        explode(sequence(lit(0L),
          greatest(expr(s"(n_bytes - 1) div $FrameStride"), lit(0L)))).as("k"))
      .select(col("doc_id"), col("k").cast(IntegerType).as("frame_idx"),
        (col("k") * FrameStride).as("offset"),
        col("hx").substr((col("k") * (2 * FrameStride) + 1).cast(IntegerType),
          lit(2 * FrameLen)).as("frame_hex"))
  private val q32Sql =
    s"""SELECT doc_id, k::INTEGER AS frame_idx, (k * $FrameStride)::BIGINT AS offset,
        substr(hex(encode(text)), (k * ${2 * FrameStride} + 1)::INTEGER, ${2 * FrameLen}) AS frame_hex
        FROM (SELECT doc_id, text,
              unnest(range(0, greatest((octet_length(encode(text))-1) // $FrameStride, 0) + 1)) AS k
              FROM documents)"""

  val queries: Map[String, Q] = Map(
    "q31_multimodal_metadata" -> q31,
    "q32_multimodal_frame_sample" -> q32)

  val oracles: Map[String, String] = Map(
    "q31_multimodal_metadata" -> q31Sql,
    "q32_multimodal_frame_sample" -> q32Sql)
}

/** The partition-wise decode/feature pipeline (STUBBED decode). */
object MultimodalStub {
  import MultimodalQueries.{Frame, MediaAsset}

  /** STUB decoder — deterministic fake standing in for a real codec
    * (libjpeg/ffmpeg are not in this container). Consumes the opaque
    * bytes, emits fixed-stride "frames". The Spark-side shape is the real
    * thing: called once per partition iterator, streams assets through
    * without materializing the partition. */
  def decodeStub(assets: Iterator[MediaAsset]): Iterator[Frame] =
    assets.flatMap { a =>
      val nFrames = math.max(1L, (a.n_bytes + MultimodalQueries.FrameStride - 1) /
        MultimodalQueries.FrameStride).toInt
      (0 until nFrames).iterator.map { k =>
        val off = k.toLong * MultimodalQueries.FrameStride
        val end = math.min(a.content.length.toLong, off + MultimodalQueries.FrameLen).toInt
        val bytes = if (off >= a.content.length) Array.emptyByteArray
          else a.content.slice(off.toInt, end)
        Frame(a.doc_id, k, off, bytes.map("%02X".format(_)).mkString)
      }
    }

  /** Distributed decode: typed mapPartitions — one decoder per partition,
    * iterator-to-iterator (Spark pipelines it, memory-bounded). */
  def decodeAll(assets: Dataset[MediaAsset]): Dataset[Frame] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions(decodeStub)
  }
}

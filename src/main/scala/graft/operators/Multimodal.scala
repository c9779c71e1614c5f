package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Multimodal-column plumbing: media as opaque `binary` columns with
  * typed metadata, decode/feature-extract/frame-sample as distributed
  * operators. The fixtures have no real image/audio payloads (and this
  * environment has no codec libraries), so the DECODE STEP IS A
  * DETERMINISTIC STUB — what is real, and what these operators pin down,
  * is the Spark-side plumbing: the binary column flow, the metadata
  * schema, the per-frame explode shape, and the batched mapPartitions
  * decode path a real codec would plug into.
  *
  * Scale notes: media payloads stay opaque bytes end-to-end (no
  * driver-side materialization); frame sampling is a generator explode
  * (rows ∝ frames, map-only); the batched decode path processes one
  * partition's records per task — exactly the batch shape a vectorized
  * decode (or a GPU codec) wants at 100 TB.
  */
object Multimodal {

  /** Typed media record: payload + metadata. The fixture payload is the
    * document text UTF-8-encoded — stands in for image/audio bytes.
    */
  final case class MediaRecord(doc_id: Long, media: Array[Byte], media_type: String)

  /** Output of the (stubbed) decode: per-media features. */
  final case class MediaFeatures(
      doc_id: Long, n_bytes: Int, head_byte: Int, fake_channels: Int,
      fake_embedding: Array[Float])

  /** Real media ingestion: the binaryFile source reads raw files as
    * (path, modificationTime, length, content) rows — the actual entry
    * point for image/audio/video payloads at scale (each file's bytes
    * stay on the executor that read it; pathGlobFilter prunes at
    * listing). Returns MediaRecord-shaped rows keyed by an id parsed
    * from the file name.
    */
  def mediaFromFiles(spark: SparkSession, dir: String, glob: String = "*.bin"): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(dir)
      .select(
        regexp_extract(col("path"), "([0-9]+)\\.[a-z]+$", 1).cast("long").as("doc_id"),
        col("content").as("media"),
        lit("application/octet-stream").as("media_type"))

  /** Documents with the media binary column attached. */
  def mediaTable(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        encode(col("text"), "UTF-8").as("media"),
        lit("text/plain").as("media_type"))

  /** M1: metadata extraction over the binary column — byte length,
    * content checksum, and a STUB decode of "channel count" (first
    * checksum nibble; a real decoder would parse the media header).
    * Map-only; the binary payload never leaves the executors.
    */
  def m1MediaMeta(spark: SparkSession, dir: String): DataFrame =
    mediaTable(spark, dir)
      .select(
        col("doc_id"),
        col("media_type"),
        octet_length(col("media")).cast("long").as("n_bytes"),
        md5(col("media")).as("checksum"))
      .withColumn("fake_channels",
        expr("cast(instr('0123456789abcdef', substring(checksum, 1, 1)) - 1 as bigint)"))

  /** M2: frame sampling — one output row per fixed-size frame of the
    * payload (video frame-sample / audio chunking shape): generator
    * explode of the frame index sequence, per-frame slice + checksum.
    * Frames are 100-unit slices; the fixture payload is ASCII so char
    * slices == byte slices (a real codec slices bytes).
    */
  def m2FrameSample(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(
        col("doc_id"), col("text"),
        posexplode(expr("sequence(0, (length(text) + 99) div 100 - 1)")).as(Seq("pos", "frame_idx")))
      .select(
        col("doc_id"),
        col("frame_idx").cast("long").as("frame_idx"),
        expr("cast(length(substring(text, frame_idx * 100 + 1, 100)) as bigint)").as("frame_len"),
        expr("md5(substring(text, frame_idx * 100 + 1, 100))").as("frame_checksum"))

  /** M3: resize — fixed-target nearest-neighbor downsampling of the
    * payload (position i of the output samples position
    * floor(i·len/target) of the input), the index arithmetic every image
    * resize performs, applied to the stand-in payload; a real codec
    * would run the same plan with pixel rows. Map-only, output size
    * bounded at [[ResizeTarget]] units regardless of input size —
    * payloads never grow through this operator. The per-doc transform
    * is a fixed-64-element lambda (bounded, cold path); hot-path ops
    * keep the no-lambda rule.
    */
  val ResizeTarget = 64

  def m3Resize(spark: SparkSession, dir: String): DataFrame = {
    val nOut = s"least(length(text), $ResizeTarget)"
    // Index arithmetic in BIGINT (an int multiply overflows past ~34M
    // chars under ANSI mode); empty payloads short-circuit to md5('') —
    // sequence(0, -1) would otherwise step DOWNWARD and the div by
    // nOut = 0 would throw (reviewer findings).
    val sampled = s"md5(array_join(transform(sequence(0, cast($nOut as int) - 1), " +
      s"i -> substring(text, cast((cast(i as bigint) * cast(length(text) as bigint)) div $nOut as int) + 1, 1)), ''))"
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        expr("cast(length(text) as bigint)").as("orig_len"),
        expr(s"cast($nOut as bigint)").as("resized_len"),
        expr(s"case when length(text) = 0 then md5('') else $sampled end")
          .as("resized_md5"))
  }

  /** Batched decode path (the mapInPandas analog in Scala): one
    * partition's records per call, iterator-in/iterator-out so a real
    * implementation can batch onto an accelerator. The decode itself is
    * a DETERMINISTIC STUB (`???`-free so the plumbing is testable):
    * features derive from the bytes, standing in for codec output.
    */
  def decodeFeatures(spark: SparkSession, media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions { records =>
      records.map { r =>
        // STUB decode — a real pipeline would decode image/audio here.
        val nBytes = r.media.length
        val head = if (nBytes > 0) r.media(0) & 0xff else 0
        val channels = (head % 4) + 1
        // Empty payloads (zero-byte media) get a zero embedding — the
        // modulo index would divide by zero otherwise.
        val emb =
          if (nBytes == 0) Array.fill(8)(0.0f)
          else Array.tabulate(8)(i => ((r.media(i % nBytes) & 0xff) / 255.0f))
        MediaFeatures(r.doc_id, nBytes, head, channels, emb)
      }
    }
  }
}

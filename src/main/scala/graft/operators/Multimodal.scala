package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** One decoded-media record flowing through the multimodal pipeline. */
case class MediaRecord(doc_id: Long, kind: String, payload: Array[Byte])

/** Deterministic stand-in for a decoded image/audio frame. */
case class DecodedMedia(
    doc_id: Long,
    width: Int,
    height: Int,
    n_frames: Int,
    mean_byte: Double)

/** A fixed-size thumbnail produced by the (stubbed) resize stage. */
case class ResizedMedia(
    doc_id: Long,
    width: Int,
    height: Int,
    thumb: Array[Byte])

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * payloads with typed metadata, processed in explicit per-partition
  * batches.
  *
  * The container has no image/audio codecs, so [[decodeStub]] is a
  * clearly-marked deterministic fake (dimensions and stats derived
  * from payload bytes). Everything AROUND the decode is real and is
  * what matters at 100 TB: binary columns survive parquet round-trips,
  * `mapPartitions` keeps decode batched per-partition with no
  * driver involvement, and the feature schema is columnar-typed so
  * downstream plans stay whole-stage-codegen'd.
  */
object Multimodal {

  /** Synthesize the media table from `documents`: payload = utf-8
    * bytes of text (an opaque blob as far as the pipeline cares),
    * typed metadata struct alongside. */
  def mediaTable(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        col("text").cast("binary").as("payload"),
        struct(
          lit("application/octet-stream").as("mime"),
          octet_length(col("text")).as("n_bytes"),
          col("source").as("origin")).as("meta"))

  /** STUB — deterministic fake decode for payloads no JDK codec
    * handles. A real deployment swaps this one function for an actual
    * codec; the surrounding batching/schema/partitioning is unchanged. */
  def decodeStub(r: MediaRecord): DecodedMedia = {
    val b = r.payload
    val w = 1 + (b.headOption.getOrElse(0: Byte) & 0x3f)
    val h = 1 + (if (b.length > 1) b(1) & 0x3f else 0)
    val mean =
      if (b.isEmpty) 0.0
      else b.map(x => (x & 0xff).toLong).sum.toDouble / b.length
    DecodedMedia(r.doc_id, w, h, 1 + b.length / 1024, mean)
  }

  /** REAL image decode via `javax.imageio` (ships in the JDK — PNG/
    * BMP/GIF need no external codec): width/height from the decoded
    * raster, `mean_byte` = mean over per-pixel channel means (a
    * deterministic pixel checksum). Payloads ImageIO does not
    * recognize fall back to [[decodeStub]], so mixed media batches
    * flow through one pass. In-memory decode only (`setUseCache
    * (false)`: no per-record temp files on executors). */
  def decodeRecord(r: MediaRecord): DecodedMedia = {
    javax.imageio.ImageIO.setUseCache(false)
    val img =
      try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.payload)))
      catch { case _: Throwable => None }
    img match {
      case Some(i) if i.getWidth > 0 && i.getHeight > 0 =>
        var sum = 0.0
        var y = 0
        while (y < i.getHeight) {
          var x = 0
          while (x < i.getWidth) {
            val rgb = i.getRGB(x, y)
            sum += (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3.0
            x += 1
          }
          y += 1
        }
        DecodedMedia(r.doc_id, i.getWidth, i.getHeight, 1,
          sum / (i.getWidth.toLong * i.getHeight))
      case _ => decodeStub(r)
    }
  }

  /** Batched decode + feature extraction: one `mapPartitions` pass,
    * iterator-to-iterator (no materialization of the partition). */
  def decodeFeatures(spark: SparkSession, dir: String): Dataset[DecodedMedia] =
    decode(spark, mediaTable(spark, dir)
      .select(col("doc_id"), lit("media").as("kind"), col("payload")))

  /** Decode an arbitrary media relation (doc_id, kind, payload) —
    * ImageIO for recognized image bytes, stub otherwise. */
  def decode(spark: SparkSession, media: DataFrame): Dataset[DecodedMedia] = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions(_.map(decodeRecord))
  }

  /** Explicit batch-shaped decode — the `mapInPandas` execution model:
    * the partition iterator is consumed in fixed-size record batches
    * and each batch is handed to the (stubbed) decoder whole, which is
    * how a real vectorized codec or model-inference step wants its
    * input. Results are independent of batch boundaries (spec-checked)
    * and only one batch is resident per task at a time. */
  def decodeFeaturesBatched(
      spark: SparkSession, dir: String, batchSize: Int = 64): Dataset[DecodedMedia] = {
    import spark.implicits._
    mediaTable(spark, dir)
      .select(col("doc_id"), lit("media").as("kind"), col("payload"))
      .as[MediaRecord]
      .mapPartitions(_.grouped(batchSize).flatMap(batch => batch.map(decodeRecord)))
  }

  /** Resize: deterministic nearest-neighbor downsample of the payload
    * to a `tw`×`th` byte thumbnail (byte i of the thumb = payload byte
    * at the proportional offset). The codec-free stand-in for an image
    * resize — swap the per-record function for a real resampler; the
    * batching, schema (fixed-size binary thumb), and partitioning are
    * the real thing. */
  def resizeStub(r: MediaRecord, tw: Int, th: Int): ResizedMedia = {
    val n = tw * th
    val b = r.payload
    val thumb = Array.tabulate(n) { i =>
      if (b.isEmpty) 0: Byte else b(((i.toLong * b.length) / n).toInt)
    }
    ResizedMedia(r.doc_id, tw, th, thumb)
  }

  /** Batched resize pass — same iterator-to-iterator shape as
    * [[decodeFeatures]]. */
  def resizeThumbs(spark: SparkSession, dir: String,
      tw: Int = 8, th: Int = 8): Dataset[ResizedMedia] = {
    import spark.implicits._
    mediaTable(spark, dir)
      .select(col("doc_id"), lit("stub").as("kind"), col("payload"))
      .as[MediaRecord]
      .mapPartitions(_.map(resizeStub(_, tw, th)))
  }

  /** REAL image resize (the [[decodeRecord]] counterpart): decode via
    * `javax.imageio`, NEAREST-NEIGHBOR sample to a `tw`×`th` grayscale
    * thumbnail — thumb(x,y) = channel mean of the source pixel at the
    * proportional coordinate (⌊x·W/tw⌋, ⌊y·H/th⌋), exact integer
    * arithmetic so the result is bit-deterministic across executors
    * and JVMs (no Graphics2D filtering, whose interpolation is
    * implementation-defined). Unrecognized payloads fall back to
    * [[resizeStub]] so mixed media flows through one pass. */
  def resizeRecord(r: MediaRecord, tw: Int, th: Int): ResizedMedia = {
    javax.imageio.ImageIO.setUseCache(false)
    val img =
      try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.payload)))
      catch { case _: Throwable => None }
    img match {
      case Some(i) if i.getWidth > 0 && i.getHeight > 0 =>
        val thumb = new Array[Byte](tw * th)
        var y = 0
        while (y < th) {
          var x = 0
          while (x < tw) {
            val sx = (x.toLong * i.getWidth / tw).toInt
            val sy = (y.toLong * i.getHeight / th).toInt
            val rgb = i.getRGB(sx, sy)
            thumb(y * tw + x) =
              ((((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3).toByte
            x += 1
          }
          y += 1
        }
        ResizedMedia(r.doc_id, tw, th, thumb)
      case _ => resizeStub(r, tw, th)
    }
  }

  /** Real-resize over an arbitrary media relation — one batched
    * mapPartitions pass, decode and resample fused per record (the
    * decoded raster never leaves the task). */
  def resizeImages(spark: SparkSession, media: DataFrame,
      tw: Int = 8, th: Int = 8): Dataset[ResizedMedia] = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions(_.map(resizeRecord(_, tw, th)))
  }

  /** Frame sampling: every `stride`-th 16-byte slice of the payload —
    * pure binary `substring` arithmetic, no decode needed. */
  def frameSample(spark: SparkSession, dir: String, stride: Int = 4): DataFrame =
    mediaTable(spark, dir)
      .select(
        col("doc_id"),
        posexplode(transform(
          // (len-1) div frame: last index whose slice is non-empty — an
          // exact-multiple payload must NOT emit a trailing empty frame
          sequence(lit(0), floor((octet_length(col("payload")) - 1) / (16 * stride)).cast("int")),
          i => substring(col("payload"), lit(1) + i * (16 * stride), lit(16)))))
      .withColumnRenamed("pos", "frame_no")
      .withColumnRenamed("col", "frame")

  /** `multimodal_framehash` — frame sampling with an exact
    * cross-engine pin: every sampled 16-byte frame of the binary
    * payload ([[frameSample]]: one frame per 16·stride bytes) hashes
    * to md5, so the DuckDB oracle verifies the exact BYTES of every
    * frame boundary, not just frame counts — the strongest check the
    * binary plumbing can get without a codec. (The oracle slices the
    * source TEXT; byte-slicing == char-slicing because the corpus is
    * ASCII — MultimodalSpec asserts that precondition by name, so a
    * testdata drift fails one test instead of a silent mismatch.) */
  def multimodalFramehash(spark: SparkSession, dir: String): DataFrame =
    frameSample(spark, dir)
      .select(col("doc_id"), col("frame_no"), md5(col("frame")).as("frame_md5"))
      .orderBy("doc_id", "frame_no")

  /** `multimodal_features` — oracle-able byte-level features of the
    * binary payload: length, md5, head-bytes hex. */
  def multimodalFeatures(spark: SparkSession, dir: String): DataFrame =
    mediaTable(spark, dir)
      .select(
        col("doc_id"),
        octet_length(col("payload")).as("byte_len"),
        md5(col("payload")).as("content_md5"),
        lower(hex(substring(col("payload"), 1, 8))).as("head_hex"))
      .orderBy("doc_id")
}

package graft

import org.apache.spark.sql.functions._

import graft.operators.{Multimodal, MediaRecord}

class MultimodalSpec extends SparkSpec {

  test("media table: binary payload with consistent typed metadata") {
    val df = Multimodal.mediaTable(spark, sf)
    val bad = df.where(octet_length(col("payload")) =!= col("meta.n_bytes")).count()
    assert(bad === 0)
    assert(df.schema("payload").dataType.typeName === "binary")
  }

  test("decode pipeline: deterministic stub features via mapPartitions") {
    val feats = Multimodal.decodeFeatures(spark, sf).collect()
    assert(feats.length === graft.sources.Tables.documents(spark, sf).count())
    feats.foreach { f =>
      assert(f.width >= 1 && f.width <= 64)
      assert(f.height >= 1 && f.height <= 64)
      assert(f.mean_byte >= 0.0 && f.mean_byte < 256.0)
      assert(f.n_frames >= 1)
    }
    // determinism: a second run is byte-identical
    val again = Multimodal.decodeFeatures(spark, sf).collect()
    assert(feats.sortBy(_.doc_id).toSeq === again.sortBy(_.doc_id).toSeq)
  }

  test("batched decode is invariant to batch boundaries") {
    val rec = Multimodal.decodeFeatures(spark, sf).collect().sortBy(_.doc_id).toSeq
    val b7 = Multimodal.decodeFeaturesBatched(spark, sf, batchSize = 7).collect().sortBy(_.doc_id).toSeq
    val b64 = Multimodal.decodeFeaturesBatched(spark, sf, batchSize = 64).collect().sortBy(_.doc_id).toSeq
    assert(b7 === rec)
    assert(b64 === rec)
  }

  test("decode stub is a pure function of the payload") {
    val a = Multimodal.decodeStub(MediaRecord(1, "stub", "hello world".getBytes))
    val b = Multimodal.decodeStub(MediaRecord(1, "stub", "hello world".getBytes))
    assert(a === b)
    assert(Multimodal.decodeStub(MediaRecord(2, "stub", Array.empty[Byte])).mean_byte === 0.0)
  }

  test("real PNG payloads decode through ImageIO: exact dimensions and pixel mean") {
    import spark.implicits._
    // a 5x3 image with known channel values, PNG-encoded in memory
    def png(w: Int, h: Int, rgb: (Int, Int, Int)): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w)
        img.setRGB(x, y, (rgb._1 << 16) | (rgb._2 << 8) | rgb._3)
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      out.toByteArray
    }
    val media = Seq(
      MediaRecord(1L, "image/png", png(5, 3, (10, 20, 30))),   // mean channel = 20
      MediaRecord(2L, "image/png", png(2, 2, (255, 255, 255))), // mean = 255
      MediaRecord(3L, "text", "not an image at all".getBytes("UTF-8"))) // stub fallback
    val got = Multimodal.decode(spark, media.toDS().toDF("doc_id", "kind", "payload"))
      .collect().sortBy(_.doc_id)
    assert(got(0).width === 5 && got(0).height === 3 && got(0).n_frames === 1)
    assert(math.abs(got(0).mean_byte - 20.0) < 1e-9, s"pixel mean: ${got(0).mean_byte}")
    assert(got(1).width === 2 && got(1).height === 2 && got(1).mean_byte === 255.0)
    // unrecognized bytes keep the deterministic stub semantics
    assert(got(2) === Multimodal.decodeStub(media(2)))
  }

  test("real image resize: nearest-neighbor thumbnail has exact predictable pixels") {
    import spark.implicits._
    // a 4x2 image whose left half is dark gray and right half light
    def png(): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(4, 2, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 2; x <- 0 until 4) {
        val v = if (x < 2) 40 else 200
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      out.toByteArray
    }
    val media = Seq(
      MediaRecord(1L, "image/png", png()),
      MediaRecord(2L, "text", "not an image".getBytes("UTF-8")))
    val got = Multimodal.resizeImages(spark,
      media.toDS().toDF("doc_id", "kind", "payload"), tw = 2, th = 1)
      .collect().sortBy(_.doc_id)
    // nearest-neighbor at (0,0)->(0,0)=40 and (1,0)->(2,0)=200
    assert(got(0).width === 2 && got(0).height === 1)
    assert(got(0).thumb.toSeq === Seq(40.toByte, 200.toByte))
    // unrecognized bytes keep the deterministic stub semantics
    assert(got(1).thumb.toSeq === Multimodal.resizeStub(media(1), 2, 1).thumb.toSeq)
  }

  test("frame sampling slices the payload without decoding") {
    val frames = Multimodal.frameSample(spark, sf)
    assert(frames.where(octet_length(col("frame")) > 16).count() === 0)
    assert(frames.groupBy("doc_id").count().where(col("count") < 1).count() === 0)
  }

  test("resize produces fixed-size deterministic thumbnails for every record") {
    val thumbs = Multimodal.resizeThumbs(spark, sf, tw = 8, th = 8).collect()
    assert(thumbs.nonEmpty)
    assert(thumbs.forall(t => t.thumb.length === 64 && t.width === 8 && t.height === 8))
    // pure function of the payload: same input, same thumb
    val a = Multimodal.resizeStub(MediaRecord(1, "stub", "some payload bytes".getBytes), 4, 4)
    val b = Multimodal.resizeStub(MediaRecord(1, "stub", "some payload bytes".getBytes), 4, 4)
    assert(a.thumb.toSeq === b.thumb.toSeq)
    // the thumb is a proportional sample, so first byte = first payload byte
    assert(a.thumb.head === "some payload bytes".getBytes.head)
  }

  test("multimodal_features: md5 matches text md5 (payload is the utf-8 bytes)") {
    val joined = Multimodal.multimodalFeatures(spark, sf)
      .join(graft.sources.Tables.documents(spark, sf).select(col("doc_id"), md5(col("text")).as("want")), "doc_id")
    assert(joined.where(col("content_md5") =!= col("want")).count() === 0)
  }

  test("framehash precondition: the corpus is ASCII (oracle byte-slicing == char-slicing)") {
    // the multimodal_framehash DuckDB oracle slices TEXT while the
    // engine slices the utf-8 payload — identical only while every
    // char is one byte. A driver testdata drift must fail HERE, by
    // name, not as a silent frame-hash mismatch.
    val nonAscii = graft.sources.Tables.documents(spark, sf)
      .where(octet_length(col("text")) =!= length(col("text"))).count()
    assert(nonAscii === 0, "documents.text grew non-ASCII chars — regenerate the framehash oracle")
  }

  test("multimodal_framehash: frames cover the payload exactly, hashes match recomputation") {
    val frames = Multimodal.multimodalFramehash(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
    val lens = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), octet_length(col("text")).as("n")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val byDoc = frames.groupBy(_._1)
    assert(byDoc.keySet === lens.keySet)
    byDoc.foreach { case (doc, fs) =>
      // frame count = 1 + (len-1) div 64, frame_no contiguous from 0
      assert(fs.map(_._2).sorted.toSeq === (0 until (1 + (lens(doc) - 1) / 64)))
    }
    // spot-check hashes against a direct substring recomputation
    val want = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), md5(substring(col("text"), 1, 16)).as("m")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    byDoc.foreach { case (doc, fs) =>
      assert(fs.find(_._2 == 0).get._3 === want(doc))
    }
  }
}

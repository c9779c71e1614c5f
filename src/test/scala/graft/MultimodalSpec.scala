package graft

import org.apache.spark.sql.functions._

import graft.operators.Multimodal
import graft.operators.Multimodal.MediaRecord

/** The batched decode path (mapPartitions, iterator-in/iterator-out):
  * a REAL P6 PPM parse, deterministic across partitionings, robust to
  * malformed bytes, and byte-exact on a checked-in fixture.
  */
class MultimodalSpec extends SparkTestBase {
  import spark.implicits._

  test("decodeFeatures parses the synthesized P6 corpus deterministically") {
    val media = Multimodal.ppmTable(spark, Sf)
      .select(col("doc_id"), col("media"), col("media_type"))
      .as[MediaRecord]
    val once = Multimodal.decodeFeatures(spark, media).collect()
      .map(f => f.doc_id -> ((f.n_bytes, f.width, f.height, f.channels, f.embedding.toSeq))).toMap
    val repartitioned = Multimodal.decodeFeatures(spark, media.repartition(7)).collect()
      .map(f => f.doc_id -> ((f.n_bytes, f.width, f.height, f.channels, f.embedding.toSeq))).toMap
    assert(once === repartitioned)
    assert(once.nonEmpty)
    // The Scala parser and the expression-level header parse (m1) must
    // read identical geometry out of identical bytes.
    val meta = Multimodal.m1MediaMeta(spark, Sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(4), r.getLong(5), r.getLong(7)))).toMap
    once.foreach { case (id, (nBytes, w, h, channels, emb)) =>
      val (mBytes, mW, mH, mCh) = meta(id)
      assert(nBytes.toLong === mBytes)
      assert(w.toLong === mW && h.toLong === mH && channels.toLong === mCh)
      assert(emb.length === 8)
    }
  }

  test("decodeFeatures is byte-exact on a checked-in PPM fixture") {
    val url = getClass.getResource("/fixtures/img42.ppm")
    assert(url != null, "fixture /fixtures/img42.ppm missing from test resources")
    val dir = new java.io.File(url.toURI).getParent
    val media = Multimodal.mediaFromFiles(spark, dir, "*.ppm")
      .as[MediaRecord]
    val out = Multimodal.decodeFeatures(spark, media).collect()
    assert(out.length === 1)
    val f = out.head
    assert(f.doc_id === 42L)
    assert((f.width, f.height, f.channels) === ((2, 2, 3)))
    // Pixels are 'A'..'L' (65..76); embedding = first 8 bytes / 255.
    val expected = (0 until 8).map(i => (65 + i).toFloat / 255.0f)
    assert(f.embedding.toSeq === expected)
  }

  test("m3 resize bounds output size and samples deterministically") {
    val rows = Multimodal.m3Resize(spark, Sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    assert(rows.nonEmpty)
    rows.values.foreach { case (w, h, resized, md5) =>
      assert(resized === math.min(w * h, Multimodal.ResizeTarget.toLong))
      assert(md5.length === 32)
    }
    // Determinism: same input → same sample positions → same hash.
    val again = Multimodal.m3Resize(spark, Sf).collect()
      .map(r => r.getLong(0) -> r.getString(4)).toMap
    rows.foreach { case (id, (_, _, _, md5)) => assert(again(id) === md5) }
  }

  test("decodeFeatures quarantines malformed payloads instead of throwing") {
    val valid = "P6\n1 1\n255\nRGB".getBytes("US-ASCII")
    val media = Seq(
      MediaRecord(1L, Array.emptyByteArray, "application/octet-stream"),
      MediaRecord(2L, Array[Byte](7, 8, 9), "application/octet-stream"),
      MediaRecord(3L, "P6\n9 9\n255\nxx".getBytes("US-ASCII"), "image/x-portable-pixmap"), // truncated
      MediaRecord(4L, valid, "image/x-portable-pixmap"),
    ).toDS()
    val out = Multimodal.decodeFeatures(spark, media).collect()
      .map(f => f.doc_id -> f).toMap
    Seq(1L, 2L, 3L).foreach { id =>
      assert(out(id).width === -1 && out(id).channels === -1)
      assert(out(id).embedding.toSeq === Seq.fill(8)(0.0f))
    }
    assert(out(4L).width === 1 && out(4L).height === 1 && out(4L).channels === 3)
    assert(out(4L).embedding(0) === 'R'.toFloat / 255.0f)
  }
}

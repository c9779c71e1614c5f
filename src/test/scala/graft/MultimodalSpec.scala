package graft

import org.apache.spark.sql.functions._

import graft.operators.Multimodal
import graft.operators.Multimodal.MediaRecord

/** The batched decode path (mapPartitions, iterator-in/iterator-out):
  * deterministic across partitionings, features derived from the bytes.
  */
class MultimodalSpec extends SparkTestBase {
  import spark.implicits._

  test("decodeFeatures is deterministic and batch-shape preserving") {
    val media = Multimodal.mediaTable(spark, Sf)
      .select(col("doc_id"), col("media"), col("media_type"))
      .as[MediaRecord]
    val once = Multimodal.decodeFeatures(spark, media).collect()
      .map(f => f.doc_id -> ((f.n_bytes, f.head_byte, f.fake_channels, f.fake_embedding.toSeq))).toMap
    val repartitioned = Multimodal.decodeFeatures(spark, media.repartition(7)).collect()
      .map(f => f.doc_id -> ((f.n_bytes, f.head_byte, f.fake_channels, f.fake_embedding.toSeq))).toMap
    assert(once === repartitioned)
    assert(once.nonEmpty)
    // Features are consistent with the payload metadata query.
    val meta = Multimodal.m1MediaMeta(spark, Sf).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    once.foreach { case (id, (nBytes, head, channels, emb)) =>
      assert(nBytes.toLong === meta(id))
      assert(channels === (head % 4) + 1)
      assert(emb.length === 8)
    }
  }

  test("m3 resize bounds output size and samples deterministically") {
    val rows = Multimodal.m3Resize(spark, Sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(rows.nonEmpty)
    rows.values.foreach { case (orig, resized, md5) =>
      assert(resized === math.min(orig, Multimodal.ResizeTarget.toLong))
      assert(md5.length === 32)
    }
    // Determinism: same input → same sample positions → same hash.
    val again = Multimodal.m3Resize(spark, Sf).collect()
      .map(r => r.getLong(0) -> r.getString(3)).toMap
    rows.foreach { case (id, (_, _, md5)) => assert(again(id) === md5) }
  }

  test("decodeFeatures handles zero-byte media (empty payload)") {
    val media = Seq(
      MediaRecord(1L, Array.emptyByteArray, "application/octet-stream"),
      MediaRecord(2L, Array[Byte](7, 8, 9), "application/octet-stream"),
    ).toDS()
    val out = Multimodal.decodeFeatures(spark, media).collect()
      .map(f => f.doc_id -> f).toMap
    assert(out(1L).n_bytes === 0)
    assert(out(1L).head_byte === 0)
    assert(out(1L).fake_embedding.toSeq === Seq.fill(8)(0.0f))
    assert(out(2L).n_bytes === 3)
    assert(out(2L).head_byte === 7)
  }
}

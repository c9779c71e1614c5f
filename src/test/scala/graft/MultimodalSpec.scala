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

  test("m9 chunk walk is byte-exact on a REAL checked-in PNG (valid CRCs, zlib IDAT)") {
    // img7.png: genuine 3x2 grayscale PNG — signature, IHDR, one
    // deflate-compressed IDAT (variable length: the walk must derive
    // IEND's offset from IDAT's length field), IEND; all CRCs valid.
    val url = getClass.getResource("/fixtures/img7.png")
    assert(url != null, "fixture /fixtures/img7.png missing from test resources")
    val dir = new java.io.File(url.toURI).getParent
    // The expression-level walk over the real bytes (mediaFromFiles →
    // pngMetaOf — the exact m9 pipeline, different source).
    val got = Multimodal.pngMetaOf(
        Multimodal.mediaFromFiles(spark, dir, "*.png"))
      .select("doc_id", "sig_ok", "width", "height", "bit_depth",
        "color_type", "n_chunks", "iend_found", "crc_ok")
      .collect()
    assert(got.length === 1)
    val r = got.head
    assert(r.getLong(0) === 7L)
    assert(r.getBoolean(1), "signature must verify")
    assert((r.getLong(2), r.getLong(3)) === ((3L, 2L)), "IHDR geometry")
    assert((r.getLong(4), r.getLong(5)) === ((8L, 0L)), "depth 8, grayscale")
    assert(r.getLong(6) === 3L, "IHDR + IDAT + IEND")
    assert(r.getBoolean(7), "walk must reach IEND")
    assert(r.getBoolean(8), "genuine CRC at the walked IEND offset must verify")
    // And the Scala reference parser agrees with the expression walk.
    val bytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(new java.io.File(url.toURI).getPath))
    assert(Multimodal.parsePng(bytes) ===
      Some(Multimodal.PngHeader(3, 2, 8, 0, 3, iendFound = true)))
    // Hostile-bytes discipline: truncation and a foreign format never throw.
    assert(Multimodal.parsePng(bytes.take(20)) === None)
    assert(Multimodal.parsePng("P6\n1 1\n255\nRGB".getBytes("US-ASCII")) === None)
    // Corrupted-CRC rejection (r14): flip the file's last byte — inside
    // IEND's stored CRC. The walk still reaches IEND (lengths/types are
    // untouched), but the crc32-over-walked-span check must now fail.
    val corrupted = bytes.clone()
    corrupted(corrupted.length - 1) = (corrupted(corrupted.length - 1) ^ 0xff).toByte
    import spark.implicits._
    val bad = Multimodal.pngMetaOf(
        Seq((7L, corrupted)).toDF("doc_id", "media"))
      .select("iend_found", "crc_ok").collect().head
    assert(bad.getBoolean(0), "corrupted CRC must not stop the walk")
    assert(!bad.getBoolean(1), "corrupted CRC must be rejected")
    // A truncated file (CRC field cut off) reads false, never throws.
    val truncated = Multimodal.pngMetaOf(
        Seq((7L, bytes.dropRight(2))).toDF("doc_id", "media"))
      .select("crc_ok").collect().head
    assert(!truncated.getBoolean(0), "truncated CRC field must read false")
  }

  /** Brute-force reference for the audio fingerprint: parse the AU
    * payload bytes directly (big-endian data size at offset 8, PCM from
    * offset 24), window energies, delta bits.
    */
  private def refFingerprint(media: Array[Byte]): Option[(Long, Long)] = {
    def be32(off: Int): Long =
      (0 until 4).foldLeft(0L)((acc, k) => (acc << 8) | (media(off + k) & 0xff))
    val nSamples = (be32(8) / 2).toInt
    val nWin = nSamples / Multimodal.FpWinSamples
    if (nWin < 2) return None
    // The fingerprint covers the first FpMaxWindows windows only (the
    // 31-bit contract); n_windows reports the full count.
    val nFp = math.min(nWin, Multimodal.FpMaxWindows)
    val energies = Array.tabulate(nFp) { w =>
      (0 until Multimodal.FpWinSamples).map { j =>
        val s = 24 + 2 * (w * Multimodal.FpWinSamples + j)
        ((media(s) & 0xff) << 8) | (media(s + 1) & 0xff)
      }.sum.toLong
    }
    val fp = (1 until nFp).foldLeft(0L)((acc, w) =>
      if (energies(w) > energies(w - 1)) acc | (1L << (w - 1)) else acc)
    Some((nWin.toLong, fp))
  }

  test("m7 fingerprint equals the byte-level brute-force recompute") {
    val expected = Multimodal.auTable(spark, Sf)
      .select("doc_id", "media").as[(Long, Array[Byte])].collect()
      .flatMap { case (id, m) => refFingerprint(m).map(id -> _) }.toMap
    assert(expected.nonEmpty)
    val got = Multimodal.m7AudioFingerprint(spark, Sf)
      .select("doc_id", "n_windows", "fingerprint")
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got === expected,
      s"fingerprints diverge: ${(got.toSet -- expected.toSet).take(3)}")
  }

  test("m7 clamps the packing to FpMaxWindows on a 70-window clip") {
    // The fixture constructor caps payloads at 512 bytes (≤ 32 windows),
    // so the bound is exercised with a hand-built AU clip: 70 windows of
    // strictly increasing energy. Unclamped, windows 33..64 would shift
    // into bits 32..63 and window 65 would WRAP onto bit 0 and carry —
    // the r12 verdict's silent-aliasing defect. Clamped, the signature
    // is exactly bits 0..30 set and n_windows still reports 70.
    val nWin = 70
    val pcm = Array.tabulate(nWin * Multimodal.FpWinSamples * 2) { i =>
      val sample = i / (Multimodal.FpWinSamples * 2) // = window index
      if (i % 2 == 0) 0.toByte else sample.toByte    // BE uint16 = window idx
    }
    def be32(v: Int): Array[Byte] =
      Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
        ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    val media: Array[Byte] =
      ".snd".getBytes("US-ASCII") ++ be32(24) ++ be32(pcm.length) ++
        be32(3) ++ be32(8000) ++ be32(1) ++ pcm
    val au = Seq((99L, media)).toDF("doc_id", "media")
    val got = Multimodal.audioFingerprintOf(au)
      .select("doc_id", "n_windows", "fingerprint")
      .as[(Long, Long, Long)].collect()
    assert(got.length === 1)
    val (_, nWindows, fp) = got.head
    assert(nWindows === nWin.toLong, "n_windows must report the FULL count")
    assert(fp === (1L << (Multimodal.FpMaxWindows - 1)) - 1,
      "strictly increasing energies ⇒ bits 0..30 all set, nothing above")
    assert((fp >>> (Multimodal.FpMaxWindows - 1)) === 0L, "31-bit contract")
    // And the brute-force reference (which carries the same budget)
    // agrees byte-for-byte.
    assert(refFingerprint(media) === Some((nWin.toLong, fp)))
  }

  test("m8 equals brute-force banding + hamming over m7's fingerprints") {
    val fp = Multimodal.m7AudioFingerprint(spark, Sf)
      .select("doc_id", "fingerprint").as[(Long, Long)].collect().toMap
    def bands(f: Long) = Seq(f & 255, (f >> 8) & 255, (f >> 16) & 255, (f >> 24) & 255)
    // Brute-force: band buckets (with the shared cap), candidate pairs,
    // full-hamming verify.
    val byBucket = fp.toSeq.flatMap { case (id, f) =>
      bands(f).zipWithIndex.map { case (k, b) => (b, k) -> id }
    }.groupBy(_._1).filter(_._2.size <= graft.operators.LlmOps.LshBucketCap)
    val cand = byBucket.values.flatMap { ids =>
      val v = ids.map(_._2).sorted
      for (i <- v.indices; j <- i + 1 until v.size) yield (v(i), v(j))
    }.toSet
    val expected = cand.flatMap { case (a, b) =>
      val ham = java.lang.Long.bitCount(fp(a) ^ fp(b)).toLong
      if (ham <= Multimodal.AudioFpMaxHamming) Some((a, b, ham)) else None
    }
    val got = Multimodal.m8AudioNeardup(spark, Sf)
      .as[(Long, Long, Long)].collect().toSet
    assert(got === expected)
    assert(got.nonEmpty, "fixture must exercise the near-dup branch")
  }
}

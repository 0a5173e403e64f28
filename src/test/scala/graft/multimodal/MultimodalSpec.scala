package graft.multimodal

import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.multimodal.Multimodal.MediaRow

class MultimodalSpec extends SparkSpec {

  test("media table has the binary + typed-metadata schema") {
    val df = Multimodal.mediaTable(spark, sf)
    val types = df.schema.fields.map(f => f.name -> f.dataType).toMap
    assert(types("payload") === BinaryType)
    assert(types("kind") === StringType)
    assert(types("width") === IntegerType && types("height") === IntegerType)
    val kinds = df.select("kind").distinct().collect().map(_.getString(0)).toSet
    assert(kinds === Set("image", "audio", "video"))
  }

  test("stub feature extraction: deterministic, normalized, partition-preserving") {
    val s = spark
    import s.implicits._
    val media = Multimodal.mediaTable(s, sf).as[MediaRow].repartition(4)
    val feats = Multimodal.extractFeatures(media)
    assert(feats.rdd.getNumPartitions === 4) // mapPartitions keeps layout
    val f1 = feats.collect().sortBy(_.doc_id)
    val f2 = Multimodal.extractFeatures(media).collect().sortBy(_.doc_id)
    assert(f1.map(_.histogram.toSeq).toSeq === f2.map(_.histogram.toSeq).toSeq)
    // histogram of each nonempty payload sums to ~1 (normalized), 16 bins
    f1.take(20).foreach { f =>
      assert(f.histogram.length === 16)
      if (f.n_bytes > 0) assert(math.abs(f.histogram.sum - 1f) < 1e-3)
    }
  }

  test("q159 byte entropy matches a local integer fold; flags discriminate") {
    val s = spark
    import s.implicits._
    def qlog(x: Long): Long = {
      val b = java.lang.Long.toBinaryString(x).length
      val p = 1L << (b - 1)
      (b - 1).toLong * 1000 + (x - p) * 1000 / p
    }
    val docs = graft.Tables(s, sf, "documents")
      .select($"doc_id", $"text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val expected = docs.map { case (id, t) =>
      val bytes = t.getBytes("UTF-8")
      val n = bytes.length.toLong
      val counts = bytes.groupBy(b => b & 0xff).view.mapValues(_.length.toLong)
      val entNum = counts.values.map(c => c * (qlog(n) - qlog(c))).sum
      val printable = bytes.count(b => (b & 0xff) >= 32 && (b & 0xff) <= 126).toLong
      val pm = printable * 1000 / n
      val me = entNum / n
      (id, n, me, pm, pm >= 950, me >= 4000)
    }.sortBy(_._1).toSeq
    val got = Multimodal.q159MediaEntropy(s, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getBoolean(5), r.getBoolean(6))).toSeq
    assert(got === expected.map(e => (e._1, e._2, e._3, e._4, e._5, e._6)))
    // text-surrogate payloads read as text, and the entropy band actually
    // splits the corpus — neither flag is vacuous
    assert(got.forall(_._5))
    assert(got.exists(_._6) && got.exists(!_._6))
  }

  test("q163: hand-built PNG/JPEG binary fixtures parse to their real dimensions") {
    val s = spark
    import s.implicits._
    def bytes(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
    // a REAL 1x1 RGBA PNG header: signature + IHDR (w=1, h=1, depth 8,
    // color 6) + its true CRC — the canonical bytes any png tool emits
    val png1x1 = bytes(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A,
      0x00, 0x00, 0x00, 0x0D, 0x49, 0x48, 0x44, 0x52,
      0x00, 0x00, 0x00, 0x01, 0x00, 0x00, 0x00, 0x01,
      0x08, 0x06, 0x00, 0x00, 0x00, 0x1F, 0x15, 0xC4, 0x89)
    // a REAL JFIF prologue: SOI + APP0 (len 16, version 1.1, 1x1 density,
    // no thumb) + SOF0 (len 17, precision 8, 480 high, 640 wide, 3 comps)
    val jfif640 = bytes(0xFF, 0xD8, 0xFF, 0xE0, 0x00, 0x10,
      0x4A, 0x46, 0x49, 0x46, 0x00, 0x01, 0x01, 0x00,
      0x00, 0x01, 0x00, 0x01, 0x00, 0x00,
      0xFF, 0xC0, 0x00, 0x11, 0x08, 0x01, 0xE0, 0x02, 0x80,
      0x03, 0x01, 0x22, 0x00, 0x02, 0x11, 0x01, 0x03, 0x11, 0x01)
    // a JFIF with a LONGER APP0 (len 18): the segment walk, not a fixed
    // offset, must find SOF0 — 16x32, 12-bit precision
    val jfif12bit = bytes(0xFF, 0xD8, 0xFF, 0xE0, 0x00, 0x12,
      0x4A, 0x46, 0x49, 0x46, 0x00, 0x01, 0x01, 0x00,
      0x00, 0x01, 0x00, 0x01, 0x00, 0x00, 0x00, 0x00,
      0xFF, 0xC0, 0x00, 0x11, 0x0C, 0x00, 0x20, 0x00, 0x10,
      0x03, 0x01, 0x22, 0x00, 0x02, 0x11, 0x01, 0x03, 0x11, 0x01)
    val corrupt = { val c = png1x1.clone(); c(0) = 0; c }
    val truncated = bytes(0xFF, 0xD8, 0xFF, 0xE0, 0x00, 0x10) // walk runs off the end
    val got = Multimodal.parseMediaHeaders(
      Seq(1L -> png1x1, 2L -> jfif640, 3L -> jfif12bit, 4L -> corrupt,
        5L -> truncated).toDF("doc_id", "payload"))
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1),
          if (r.isNullAt(2)) -1L else r.getLong(2),
          if (r.isNullAt(3)) -1L else r.getLong(3),
          if (r.isNullAt(4)) -1L else r.getLong(4)))).toMap
    assert(got(1L) === (("png", 1L, 1L, 8L)))
    assert(got(2L) === (("jpeg", 640L, 480L, 8L)))
    assert(got(3L) === (("jpeg", 16L, 32L, 12L)))
    assert(got(4L) === (("unknown", -1L, -1L, -1L)))
    assert(got(5L) === (("unknown", -1L, -1L, -1L)))
    // the fixture table round-trips: every synthesized payload parses to
    // the dims it was built from, and only the corrupt rows are unknown
    val full = Multimodal.q163MediaHeaders(s, sf).collect()
    assert(full.length === 500)
    full.foreach { r =>
      val id = r.getLong(0)
      if (id % 17 == 0) assert(r.getString(1) === "unknown", s"doc $id")
      else assert(r.getString(1) === (if (id % 2 == 0) "png" else "jpeg"),
        s"doc $id")
    }
  }

  test("q176: hand-built WAV binaries parse, including the odd-size chunk walk") {
    val s = spark
    import s.implicits._
    def bytes(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
    def le4(v: Long): Array[Byte] = bytes((v & 255).toInt, ((v >> 8) & 255).toInt,
      ((v >> 16) & 255).toInt, ((v >> 24) & 255).toInt)
    def le2(v: Long): Array[Byte] = bytes((v & 255).toInt, ((v >> 8) & 255).toInt)
    def ascii(t: String): Array[Byte] = t.getBytes("US-ASCII")
    def fmt(ch: Long, sr: Long, bits: Long): Array[Byte] = {
      val ba = ch * bits / 8
      ascii("fmt ") ++ le4(16) ++ le2(1) ++ le2(ch) ++ le4(sr) ++
        le4(sr * ba) ++ le2(ba) ++ le2(bits)
    }
    // canonical mono 8 kHz 8-bit file; declared data 16000 B = 2000 ms
    val wavMono = ascii("RIFF") ++ le4(36 + 16000) ++ ascii("WAVE") ++
      fmt(1, 8000, 8) ++ ascii("data") ++ le4(16000) ++ bytes(0, 0, 0, 0)
    // stereo 44.1 kHz 16-bit with an ODD-size LIST chunk (9 B + pad byte)
    // between fmt and data — the walk must apply RIFF word alignment
    val wavList = ascii("RIFF") ++ le4(36 + 8 + 9 + 1 + 88200) ++ ascii("WAVE") ++
      fmt(2, 44100, 16) ++ ascii("LIST") ++ le4(9) ++ ascii("INFOxxxxx") ++
      bytes(0) ++ ascii("data") ++ le4(88200) ++ bytes(0, 0)
    val corrupt = { val c = wavMono.clone(); c(0) = 0; c }
    val truncated = ascii("RIFF") ++ le4(4) ++ ascii("WAVE")
    val avi = ascii("RIFF") ++ le4(4) ++ ascii("AVI ") ++ fmt(1, 8000, 8)
    val got = Multimodal.parseWavHeaders(
      Seq(1L -> wavMono, 2L -> wavList, 3L -> corrupt, 4L -> truncated,
        5L -> avi).toDF("doc_id", "payload"))
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1),
          (2 to 6).map(i => if (r.isNullAt(i)) -1L else r.getLong(i))))).toMap
    assert(got(1L) === (("wav", Seq(1L, 8000L, 8L, 16000L, 2000L))))
    assert(got(2L) === (("wav", Seq(2L, 44100L, 16L, 88200L, 500L))))
    assert(got(3L)._1 === "unknown")
    assert(got(4L)._1 === "unknown")
    assert(got(5L)._1 === "unknown")
    // fixture round-trip: synthesized payloads parse back to the formulas
    // they were built from; only doc_id % 19 rows are unknown
    val full = Multimodal.q176WavHeaders(s, sf).collect()
    assert(full.length === 500)
    full.foreach { r =>
      val id = r.getLong(0)
      if (id % 19 == 0) assert(r.getString(1) === "unknown", s"doc $id")
      else {
        assert(r.getString(1) === "wav", s"doc $id")
        assert(r.getLong(2) === 1 + id % 2, s"doc $id channels")
        assert(r.getLong(3) === 8000 * (1 + id % 3), s"doc $id rate")
        assert(r.getLong(4) === 8 * (1 + (id / 2) % 2), s"doc $id bits")
      }
    }
  }

  test("q186: hand-built ISO-BMFF boxes parse, nested mvhd found through the walk") {
    val s = spark
    import s.implicits._
    def be4(v: Long): Array[Byte] = Array(((v >> 24) & 255).toByte,
      ((v >> 16) & 255).toByte, ((v >> 8) & 255).toByte, (v & 255).toByte)
    def ascii(t: String): Array[Byte] = t.getBytes("US-ASCII")
    def mvhd(tscale: Long, dur: Long): Array[Byte] =
      be4(108) ++ ascii("mvhd") ++ be4(0) ++ be4(0) ++ be4(0) ++
        be4(tscale) ++ be4(dur) ++ Array.fill(80)(0.toByte)
    def moov(tscale: Long, dur: Long): Array[Byte] =
      be4(116) ++ ascii("moov") ++ mvhd(tscale, dur)
    // size(4) + 'ftyp'(4) + major 'isom'(4) + minor(4) + compat 'isom'(4)
    // = 20 bytes — the size field must declare the PHYSICAL length or the
    // walk lands mid-box (r11's red spec declared 16)
    val ftyp = be4(20) ++ ascii("ftypisom") ++ be4(0) ++ ascii("isom")
    // 90 s at the QuickTime-canonical 600 timescale
    val plain = ftyp ++ moov(600, 54000)
    // a free box between ftyp and moov — the walk must skip it by size
    val withFree = ftyp ++ be4(11) ++ ascii("free") ++ Array.fill(3)(0.toByte) ++
      moov(44100, 44100)
    // blank the 'f' of 'ftyp' — byte 0 is the size high byte, already 0x00
    val corrupt = { val c = plain.clone(); c(4) = 0; c }
    val noMoov = ftyp ++ be4(8) ++ ascii("mdat")
    val got = Multimodal.parseMp4Headers(
      Seq(1L -> plain, 2L -> withFree, 3L -> corrupt, 4L -> noMoov)
        .toDF("doc_id", "payload"))
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1),
          (2 to 4).map(i => if (r.isNullAt(i)) -1L else r.getLong(i))))).toMap
    assert(got(1L) === (("mp4", Seq(600L, 54000L, 90000L))))
    assert(got(2L) === (("mp4", Seq(44100L, 44100L, 1000L))))
    assert(got(3L)._1 === "unknown")
    assert(got(4L)._1 === "unknown")
    // fixture round-trip: formulas come back out; %23 rows are unknown
    val full = Multimodal.q186Mp4Headers(s, sf).collect()
    assert(full.length === 500)
    full.foreach { r =>
      val id = r.getLong(0)
      if (id % 23 == 0) assert(r.getString(1) === "unknown", s"doc $id")
      else {
        assert(r.getString(1) === "mp4", s"doc $id")
        assert(r.getLong(2) === 600 * (1 + id % 4), s"doc $id timescale")
      }
    }
  }

  test("q189: hand-built TIFFs parse under BOTH byte orders; the walk " +
      "follows the IFD pointer and searches tags") {
    val s = spark
    import s.implicits._
    def ascii(t: String): Array[Byte] = t.getBytes("US-ASCII")
    def n2(le: Boolean, v: Long): Array[Byte] =
      if (le) Array((v & 255).toByte, ((v >> 8) & 255).toByte)
      else Array(((v >> 8) & 255).toByte, (v & 255).toByte)
    def n4(le: Boolean, v: Long): Array[Byte] =
      if (le) Array((v & 255).toByte, ((v >> 8) & 255).toByte,
        ((v >> 16) & 255).toByte, ((v >> 24) & 255).toByte)
      else Array(((v >> 24) & 255).toByte, ((v >> 16) & 255).toByte,
        ((v >> 8) & 255).toByte, (v & 255).toByte)
    def entry(le: Boolean, tag: Long, v: Long): Array[Byte] =
      n2(le, tag) ++ n2(le, 4) ++ n4(le, 1) ++ n4(le, v)
    def tiff(le: Boolean, pad: Int, extra: Boolean,
        w: Long, h: Long, bits: Long): Array[Byte] = {
      val entries =
        (if (extra) entry(le, 254, 0) else Array.emptyByteArray) ++
          entry(le, 256, w) ++ entry(le, 257, h) ++
          entry(le, 258, bits) ++ entry(le, 259, 1)
      ascii(if (le) "II" else "MM") ++ n2(le, 42) ++
        n4(le, 8L + pad) ++ Array.fill(pad)(0.toByte) ++
        n2(le, if (extra) 5L else 4L) ++ entries ++ n4(le, 0)
    }
    val ii = tiff(le = true, pad = 0, extra = false, 640, 480, 8)
    val mm = tiff(le = false, pad = 6, extra = true, 1024, 768, 16)
    val badMagic = { val c = ii.clone(); c(2) = 0x2B; c }
    val corrupt = { val c = mm.clone(); c(0) = 0; c }
    // IFD pointer far past the payload: must classify, not abort
    val wildPtr = ascii("II") ++ n2(le = true, 42) ++
      n4(le = true, 0xFFFFFFF0L) ++ Array.fill(8)(0.toByte)
    val got = Multimodal.parseTiffHeaders(
      Seq(1L -> ii, 2L -> mm, 3L -> badMagic, 4L -> corrupt, 5L -> wildPtr)
        .toDF("doc_id", "payload"))
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), if (r.isNullAt(2)) "-" else r.getString(2),
          (3 to 5).map(i => if (r.isNullAt(i)) -1L else r.getLong(i)))))
      .toMap
    assert(got(1L) === (("tiff", "II", Seq(640L, 480L, 8L))))
    assert(got(2L) === (("tiff", "MM", Seq(1024L, 768L, 16L))))
    assert(got(3L)._1 === "unknown")
    assert(got(4L)._1 === "unknown")
    assert(got(5L)._1 === "unknown")
    // fixture round-trip: formulas come back out; %29 rows are unknown
    val full = Multimodal.q189TiffHeaders(s, sf).collect()
    assert(full.length === 500)
    full.foreach { r =>
      val id = r.getLong(0)
      if (id % 29 == 0) assert(r.getString(1) === "unknown", s"doc $id")
      else {
        assert(r.getString(1) === "tiff", s"doc $id")
        assert(r.getString(2) === (if (id % 2 == 0) "II" else "MM"),
          s"doc $id order")
        assert(r.getLong(5) === 8 * (1 + id % 2), s"doc $id bits")
      }
    }
  }

  test("adversarial payloads: garbage sizes, truncations, random and " +
      "flipped bytes classify — never throw (A3 error isolation)") {
    val s = spark
    import s.implicits._
    def be4(v: Long): Array[Byte] = Array(((v >> 24) & 255).toByte,
      ((v >> 16) & 255).toByte, ((v >> 8) & 255).toByte, (v & 255).toByte)
    def le4(v: Long): Array[Byte] = Array((v & 255).toByte,
      ((v >> 8) & 255).toByte, ((v >> 16) & 255).toByte,
      ((v >> 24) & 255).toByte)
    def ascii(t: String): Array[Byte] = t.getBytes("US-ASCII")
    val validMp4 = be4(20) ++ ascii("ftypisom") ++ be4(0) ++ ascii("isom") ++
      be4(116) ++ ascii("moov") ++ be4(108) ++ ascii("mvhd") ++ be4(0) ++
      be4(0) ++ be4(0) ++ be4(600) ++ be4(54000) ++ Array.fill(80)(0.toByte)
    val validWav = ascii("RIFF") ++ le4(44) ++ ascii("WAVEfmt ") ++ le4(16) ++
      Array[Byte](1, 0, 2, 0) ++ le4(44100) ++ le4(176400) ++
      Array[Byte](4, 0, 16, 0) ++ ascii("data") ++ le4(8) ++
      Array.fill(8)(7.toByte)
    val validPng = Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A)
      .map(_.toByte) ++ be4(13) ++ ascii("IHDR") ++ be4(16) ++ be4(16) ++
      Array[Byte](8, 6, 0, 0, 0) ++ be4(0xDEADBEEFL)
    val rnd = new scala.util.Random(42)
    val adversarial: Seq[Array[Byte]] =
      Seq[Array[Byte]](
        Array.emptyByteArray,
        // the r11 CAST_OVERFLOW repro class: valid signature, garbage size
        be4(0xFFFFFFFFL) ++ ascii("ftypisom") ++ be4(0) ++ ascii("isom"),
        // the original red-spec shape: ftyp declaring 16 but physically 20
        // — the walk reads the 'isom' brand (0x69736F6D) as a size field
        be4(16) ++ ascii("ftypisom") ++ be4(0) ++ ascii("isom") ++
          validMp4.drop(20),
        ascii("RIFF") ++ le4(0xFFFFFFFFL) ++ ascii("WAVEfmt ") ++
          le4(0xFFFFFFFFL) ++ Array.fill(16)(0.toByte),
        // over-bound: moov pushed past Mp4HeaderBytes by a huge free box
        be4(20) ++ ascii("ftypisom") ++ be4(0) ++ ascii("isom") ++
          be4(4096) ++ ascii("free") ++ Array.fill(600)(0.toByte)) ++
      (0 until validMp4.length).map(validMp4.take) ++   // every truncation
      (0 until validWav.length).map(validWav.take) ++
      (0 until validPng.length).map(validPng.take) ++
      (1 to 24).map(n => { val b = new Array[Byte](n * 5); rnd.nextBytes(b); b }) ++
      (1 to 16).map { _ =>                              // bit-flipped valids
        val src = Seq(validMp4, validWav, validPng)(rnd.nextInt(3))
        val c = src.clone(); val i = rnd.nextInt(c.length)
        c(i) = (c(i) ^ (1 << rnd.nextInt(8))).toByte; c
      }
    val df = adversarial.zipWithIndex
      .map { case (p, i) => (i.toLong, p) }.toDF("doc_id", "payload")
    val ok = Set("png", "jpeg", "wav", "mp4", "tiff", "unknown")
    for ((name, parsed) <- Seq(
        "png/jpeg" -> Multimodal.parseMediaHeaders(df),
        "wav" -> Multimodal.parseWavHeaders(df),
        "mp4" -> Multimodal.parseMp4Headers(df),
        "tiff" -> Multimodal.parseTiffHeaders(df))) {
      val rows = parsed.collect()   // must not throw
      assert(rows.length === adversarial.length, name)
      rows.foreach(r => assert(ok.contains(r.getString(1)), s"$name $r"))
    }
    // positive control: the clamps must not break valid specimens
    val valids = Seq(0L -> validMp4, 1L -> validWav, 2L -> validPng)
      .toDF("doc_id", "payload")
    assert(Multimodal.parseMp4Headers(valids)
      .filter($"container" === "mp4").count() === 1)
    assert(Multimodal.parseWavHeaders(valids)
      .filter($"container" === "wav").count() === 1)
    assert(Multimodal.parseMediaHeaders(valids)
      .filter($"container" === "png").count() === 1)
  }
}

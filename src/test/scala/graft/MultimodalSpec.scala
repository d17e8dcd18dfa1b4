package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.Multimodal

/** The mapPartitions decode pipeline: schema contract, determinism, and
  * agreement between the typed path and the SQL-expressible metadata path.
  */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  test("decode emits one feature row per media record, stable schema") {
    val out = Multimodal.qMultimodalDecode(spark, dir)
    assert(out.columns.toSeq ==
      Seq("media_id", "kind", "n_bytes", "width", "height", "frames"))
    assert(out.count() == Multimodal.asMedia(spark, dir).count())
    // the full typed row (incl. the spec-pinned checksum) keeps its schema
    assert(Multimodal.decodeAll(Multimodal.asMedia(spark, dir)).toDF().columns.toSeq ==
      Seq("media_id", "kind", "n_bytes", "width", "height", "frames", "checksum"))
  }

  test("decode is deterministic across runs and partitionings") {
    val a = Multimodal.qMultimodalDecode(spark, dir).collect().toSeq
    val b = Multimodal.qMultimodalDecode(spark, dir).repartition(7).orderBy("media_id").collect().toSeq
    assert(a == b)
  }

  test("typed path agrees with the SQL metadata path on byte length") {
    val typed = Multimodal.qMultimodalDecode(spark, dir).select(col("media_id"), col("n_bytes"))
    val sqlp = Multimodal.qMultimodalMeta(spark, dir)
      .select(col("doc_id").as("media_id"), col("n_bytes").as("n_bytes_sql"))
    val joined = typed.join(sqlp, "media_id")
    assert(joined.filter(col("n_bytes") =!= col("n_bytes_sql")).count() == 0)
  }

  test("frame sampling fans out video records and keeps one frame otherwise") {
    val frames = Multimodal.qMultimodalFrames(spark, dir)
    val perMedia = frames.groupBy("media_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(perMedia.nonEmpty)
    // every 3rd doc is video with `frames = len%25+1` sampled every 5 →
    // ceil(frames/5) rows; image/audio decode to 1 frame → 1 row
    perMedia.foreach { case (id, n) =>
      if (id % 3 == 0) assert(n >= 1 && n <= 5, s"video $id sampled $n frames")
      else assert(n == 1, s"non-video $id must keep exactly one frame")
    }
    assert(perMedia.exists { case (id, n) => id % 3 == 0 && n > 1 },
      "at least one video record must fan out to multiple frames")
    // resize stage preserves aspect arithmetic
    val resized = Multimodal.resizeMeta(frames, 320)
      .filter(col("resized_h") < 1).count()
    assert(resized == 0)
  }

  test("real PNG payloads decode to exact pixel dimensions via javax.imageio") {
    import spark.implicits._
    def pngBytes(w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      (0 until w).foreach(x => (0 until h).foreach(y => img.setRGB(x, y, (x * 31 + y) & 0xFFFFFF)))
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "png", bos), "JDK must ship a PNG writer")
      bos.toByteArray
    }
    val records = Seq(
      Multimodal.MediaRecord(1L, pngBytes(37, 23), "image"),
      Multimodal.MediaRecord(2L, pngBytes(640, 480), "image"),
      // magic matches but the stream is truncated → fallback, not a crash
      Multimodal.MediaRecord(3L, pngBytes(8, 8).take(12), "image"),
      // real PNG bytes but declared audio → stub path (kind is the contract)
      Multimodal.MediaRecord(4L, pngBytes(5, 5), "audio"))
    val out = Multimodal.decodeAll(spark.createDataset(records))
      .collect().map(f => f.media_id -> f).toMap
    assert(out(1L).width === 37 && out(1L).height === 23 && out(1L).frames === 1)
    assert(out(2L).width === 640 && out(2L).height === 480)
    assert(out(3L) === Multimodal.fakeDecode(records(2)), "corrupt PNG falls back to stub")
    assert(out(4L) === Multimodal.fakeDecode(records(3)), "non-image kind never hits the codec")
    assert(out(1L).n_bytes === records.head.payload.length.toLong)
  }

  test("JPEG, BMP and multi-frame GIF payloads decode via the JDK codecs") {
    import spark.implicits._
    def img(w: Int, h: Int, seed: Int): java.awt.image.BufferedImage = {
      val im = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      (0 until w).foreach(x => (0 until h).foreach(y => im.setRGB(x, y, (x * 31 + y + seed) & 0xFFFFFF)))
      im
    }
    def still(fmt: String, im: java.awt.image.BufferedImage): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(im, fmt, bos), s"JDK must ship a $fmt writer")
      bos.toByteArray
    }
    def gif(frames: Seq[java.awt.image.BufferedImage]): Array[Byte] = {
      val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
      val bos = new java.io.ByteArrayOutputStream()
      val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      frames.foreach(f => writer.writeToSequence(
        new javax.imageio.IIOImage(f, null, null), writer.getDefaultWriteParam))
      writer.endWriteSequence(); ios.close(); writer.dispose()
      bos.toByteArray
    }
    val records = Seq(
      Multimodal.MediaRecord(1L, still("jpg", img(33, 17, 1)), "image"),
      Multimodal.MediaRecord(2L, still("bmp", img(12, 9, 2)), "image"),
      // an animated GIF declared video: the JDK's one multi-frame container
      Multimodal.MediaRecord(3L, gif(Seq(img(20, 10, 3), img(20, 10, 4), img(20, 10, 5))), "video"),
      Multimodal.MediaRecord(4L, gif(Seq(img(6, 4, 6))), "image"),
      // real GIF bytes but declared audio → stub path (kind is the contract)
      Multimodal.MediaRecord(5L, gif(Seq(img(6, 4, 7))), "audio"))
    val out = Multimodal.decodeAll(spark.createDataset(records))
      .collect().map(f => f.media_id -> f).toMap
    assert(out(1L).width === 33 && out(1L).height === 17 && out(1L).frames === 1)
    assert(out(2L).width === 12 && out(2L).height === 9 && out(2L).frames === 1)
    assert(out(3L).width === 20 && out(3L).height === 10 && out(3L).frames === 3,
      "animated GIF must report its true frame count")
    assert(out(4L).frames === 1)
    assert(out(5L) === Multimodal.fakeDecode(records(4)), "non-image kind never hits the codec")
    // frame sampling over the REAL frame count: every frame of the
    // 3-frame GIF becomes a row; stills keep one
    val sampled = Multimodal.sampleFrames(
      Multimodal.decodeAll(spark.createDataset(records)), everyN = 1)
      .collect().groupBy(_.media_id).view.mapValues(_.map(_.frame_idx).sorted.toSeq).toMap
    assert(sampled(3L) === Seq(0, 1, 2))
    assert(sampled(1L) === Seq(0) && sampled(4L) === Seq(0))
  }

  test("perceptual near-dup: a re-encoded JPEG pairs with its source; exact hashing misses it") {
    import spark.implicits._
    // 64×72 px of 8×9 solid blocks aligned to the dHash grid, block lumas
    // quantized to multiples of 32 with adjacent blocks distinct — JPEG
    // re-encoding shifts block means by a few units, far inside the
    // 32-level margin, so the dHash survives the lossy round-trip exactly
    def blockImage(seed: Int): java.awt.image.BufferedImage = {
      val rnd = new scala.util.Random(seed)
      val im = new java.awt.image.BufferedImage(72, 64, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var prev = -1
      for (br <- 0 until 8; bc <- 0 until 9) {
        var v = rnd.nextInt(8)
        while (v == prev) v = rnd.nextInt(8)
        prev = v
        val g = v * 32 + 16
        val rgb = (g << 16) | (g << 8) | g
        for (y <- br * 8 until (br + 1) * 8; x <- bc * 8 until (bc + 1) * 8)
          im.setRGB(x, y, rgb)
      }
      im
    }
    def bytes(fmt: String, im: java.awt.image.BufferedImage): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(im, fmt, bos))
      bos.toByteArray
    }
    val src = blockImage(5)
    val png = bytes("png", src)
    val jpg = bytes("jpg", src) // same pixels modulo JPEG loss, new bytes
    val far = bytes("png", blockImage(99))
    // exact (byte-level) hashing cannot see the pair
    assert(!java.util.Arrays.equals(png, jpg))
    assert(java.security.MessageDigest.getInstance("MD5").digest(png).toSeq !==
      java.security.MessageDigest.getInstance("MD5").digest(jpg).toSeq)
    val media = Seq(
      Multimodal.MediaRecord(1L, png, "image"),
      Multimodal.MediaRecord(2L, jpg, "image"),
      Multimodal.MediaRecord(3L, far, "image"))
    // the per-record hashes go through the REAL decode path (sniff → JDK
    // codec → luma raster), not the byte-raster stub
    val hPng = Multimodal.perceptualHash(media(0))
    val hJpg = Multimodal.perceptualHash(media(1))
    val hFar = Multimodal.perceptualHash(media(2))
    assert(java.lang.Long.bitCount(hPng ^ hJpg) <= 3,
      "re-encode must stay within the banded candidate guarantee")
    assert(java.lang.Long.bitCount(hPng ^ hFar) > 3, "a different image must land far")
    // ...and the distributed query reports exactly the planted pair
    val pairs = Multimodal.imageNeardupOf(spark, spark.createDataset(media)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getAs[Number](2).intValue)).toSeq
    assert(pairs.map(p => (p._1, p._2)) === Seq((1L, 2L)))
    assert(pairs.head._3 === java.lang.Long.bitCount(hPng ^ hJpg))
  }

  test("stub decode invariants: dims in range, checksum matches direct call") {
    val rows = Multimodal.decodeAll(Multimodal.asMedia(spark, dir)).toDF()
      .orderBy("media_id").collect()
    rows.foreach { r =>
      assert(r.getAs[Int]("width") >= 1 && r.getAs[Int]("width") <= 640)
      assert(r.getAs[Int]("height") >= 1 && r.getAs[Int]("height") <= 480)
    }
    // pin one checksum against a direct driver-side call (the checksum is
    // outside the registered query's differential face, so this is its gate)
    val doc = spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("doc_id") === 0).collect()(0)
    val expected = Multimodal.fakeDecode(Multimodal.MediaRecord(
      0L, doc.getAs[String]("text").getBytes("UTF-8"), "image"))
    val got = rows.find(_.getAs[Long]("media_id") == 0L).get
    assert(got.getAs[Long]("checksum") == expected.checksum)
    assert(got.getAs[Long]("n_bytes") == expected.n_bytes)
  }

  // ---- real audio decode (javax.sound.sampled) ----------------------------

  /** Encode mono samples in [-1,1] as a real container via the JDK audio
    * writer: 16-bit PCM, little-endian for WAVE, big-endian for AIFF/AU
    * (the format each container mandates), optionally duplicated across
    * `channels`. */
  private def audioBytes(samples: Array[Double], sampleRate: Float,
      channels: Int, fileType: javax.sound.sampled.AudioFileFormat.Type): Array[Byte] = {
    val big = fileType != javax.sound.sampled.AudioFileFormat.Type.WAVE
    val fmt = new javax.sound.sampled.AudioFormat(sampleRate, 16, channels, true, big)
    val raw = new Array[Byte](samples.length * 2 * channels)
    var i = 0
    samples.foreach { v0 =>
      val s = (math.max(-1.0, math.min(1.0, v0)) * 32767).toInt
      (0 until channels).foreach { _ =>
        raw(i) = (if (big) (s >> 8) & 0xFF else s & 0xFF).toByte
        raw(i + 1) = (if (big) s & 0xFF else (s >> 8) & 0xFF).toByte
        i += 2
      }
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(raw), fmt, samples.length)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais, fileType, bos)
    bos.toByteArray
  }

  private val Wave = javax.sound.sampled.AudioFileFormat.Type.WAVE
  private val Aiff = javax.sound.sampled.AudioFileFormat.Type.AIFF
  private val Au = javax.sound.sampled.AudioFileFormat.Type.AU

  /** A 440 Hz tone under a slow |sin| envelope — decisive inter-cell
    * loudness differences, so 16-bit quantization noise can never flip
    * an envelope-hash comparison. */
  private def tone(n: Int, amp: Double, reversed: Boolean = false): Array[Double] =
    Array.tabulate(n) { j =>
      val i = if (reversed) n - 1 - j else j
      amp * (0.2 + 0.8 * math.abs(math.sin(math.Pi * 3.7 * i / n))) *
        math.sin(2 * math.Pi * 440 * j / 8000.0)
    }

  test("real WAV/AIFF payloads decode rate, channels and frames via javax.sound.sampled") {
    import spark.implicits._
    val mono = audioBytes(tone(4000, 0.8), 8000f, 1, Wave)
    val stereo = audioBytes(tone(2000, 0.8), 44100f, 2, Wave)
    val aiff = audioBytes(tone(4000, 0.8), 8000f, 1, Aiff)
    val records = Seq(
      Multimodal.MediaRecord(1L, mono, "audio"),
      Multimodal.MediaRecord(2L, stereo, "audio"),
      Multimodal.MediaRecord(3L, aiff, "audio"),
      // a payload cut INTO the 12-byte RIFF magic never reaches the
      // parser (sniff rejects it) → stub, not a crash
      Multimodal.MediaRecord(4L, mono.take(10), "audio"),
      // real WAV bytes declared image → stub path (kind is the contract)
      Multimodal.MediaRecord(5L, mono, "image"),
      // header INTACT but the data chunk truncated mid-stream — the
      // 100-TB partial-upload class: metadata decode still works (rate/
      // channels/frames come from the header), it must not crash or
      // silently fall back
      Multimodal.MediaRecord(6L, mono.take(50), "audio"))
    val out = Multimodal.decodeAll(spark.createDataset(records))
      .collect().map(f => f.media_id -> f).toMap
    assert(out(1L).width === 8000 && out(1L).height === 1 && out(1L).frames === 4000)
    assert(out(2L).width === 44100 && out(2L).height === 2 && out(2L).frames === 2000)
    assert(out(3L).width === 8000 && out(3L).height === 1 && out(3L).frames === 4000)
    assert(out(4L) === Multimodal.fakeDecode(records(3)), "cut-into-magic falls back to stub")
    assert(out(5L) === Multimodal.fakeDecode(records(4)), "non-audio kind never hits the parser")
    assert(out(6L).width === 8000 && out(6L).height === 1,
      "header-intact truncation still decodes header metadata")
    // ...and the PCM face of the same truncated payload yields only the
    // samples actually present, without throwing
    val partial = Multimodal.decodePcmMono(mono.take(50))
    assert(partial.forall(_.length < 4000), s"got ${partial.map(_.length)}")
  }

  test("AIFF (big-endian) PCM decodes to the same mono samples as its WAV twin") {
    val samples = tone(1000, 0.7)
    val wav = Multimodal.decodePcmMono(audioBytes(samples, 8000f, 1, Wave)).get
    val aiff = Multimodal.decodePcmMono(audioBytes(samples, 8000f, 1, Aiff)).get
    assert(wav.length === 1000 && aiff.length === 1000)
    wav.indices.foreach { i =>
      assert(math.abs(wav(i) - aiff(i)) < 1e-9, s"endianness mismatch at frame $i")
      assert(math.abs(wav(i) - samples(i)) < 1e-3, s"quantization error too large at $i")
    }
    // stereo downmix: both channels carry the same signal → mono equals it
    val st = Multimodal.decodePcmMono(audioBytes(samples, 8000f, 2, Wave)).get
    st.indices.foreach(i => assert(math.abs(st(i) - wav(i)) < 1e-3))
    // AU (the third sniffed container, .snd magic, big-endian): same samples
    val au = Multimodal.decodePcmMono(audioBytes(samples, 8000f, 1, Au)).get
    assert(au.length === 1000)
    au.indices.foreach(i => assert(math.abs(au(i) - wav(i)) < 1e-9, s"AU mismatch at $i"))
  }

  test("audio envelope hash: volume-invariant, envelope-shape-sensitive, pairs in the banded join") {
    import spark.implicits._
    def hash(b: Array[Byte]) = Multimodal.perceptualHash(Multimodal.MediaRecord(0L, b, "audio"))
    val orig = audioBytes(tone(4000, 0.8), 8000f, 1, Wave)
    val quiet = audioBytes(tone(4000, 0.4), 8000f, 1, Wave)
    val far = audioBytes(tone(4000, 0.8, reversed = true), 8000f, 1, Wave)
    val hO = hash(orig); val hQ = hash(quiet); val hF = hash(far)
    // envelope dHash compares ADJACENT time buckets, so uniform volume
    // scaling preserves every comparison — the remaster-louder invariance
    assert(java.lang.Long.bitCount(hO ^ hQ) <= 3, "half-volume copy must stay in the band")
    assert(java.lang.Long.bitCount(hO ^ hF) > 3, "a reversed envelope must land far")
    val media = Seq(
      Multimodal.MediaRecord(1L, orig, "audio"),
      Multimodal.MediaRecord(2L, quiet, "audio"),
      Multimodal.MediaRecord(3L, far, "audio"))
    val pairs = Multimodal.imageNeardupOf(spark, spark.createDataset(media)).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(pairs === Seq((1L, 2L)), "banded join must report exactly the volume-scaled pair")
  }

  test("external-codec seam: a plugged MP3 codec decodes what the JDK can't, same typed flow") {
    import spark.implicits._
    // a fake external MP3 codec — stands in for a libmpg123/ffmpeg
    // binding: claims by real MP3 magic (ID3 tag or MPEG frame sync),
    // "decodes" deterministic features. The SEAM is what this proves:
    // records the JDK has no codec for route through a plugged
    // MediaCodec with no change to the pipeline downstream.
    object FakeMp3Codec extends Multimodal.MediaCodec {
      def name = "fake-mp3"
      def claims(kind: String, payload: Array[Byte]): Boolean =
        kind == "audio" && payload.length >= 3 &&
          ((payload(0) == 'I' && payload(1) == 'D' && payload(2) == '3') ||
            ((payload(0) & 0xFF) == 0xFF && (payload(1) & 0xE0) == 0xE0))
      def decode(kind: String, payload: Array[Byte]): Option[(Int, Int, Int)] =
        if (payload.length < 8) None // truncated → corrupt-payload fallback
        else Some((44100, 2, payload.length / 4))
    }
    val mp3 = Array[Byte]('I', 'D', '3', 4, 0, 0, 0, 0, 0, 12, 1, 2, 3, 4, 5, 6)
    val truncated = Array[Byte]('I', 'D', '3', 4) // claimed but undecodable
    val records = Seq(
      Multimodal.MediaRecord(1L, mp3, "audio"),
      Multimodal.MediaRecord(2L, truncated, "audio"),
      // not claimed by the codec → stub, exactly as without the plug
      Multimodal.MediaRecord(3L, "plain text bytes".getBytes, "audio"))
    // WITHOUT the codec every record stubs (the documented JDK-only scope)
    val bare = Multimodal.decodeAll(spark.createDataset(records))
      .collect().map(f => f.media_id -> f).toMap
    records.foreach(r => assert(bare(r.media_id) === Multimodal.fakeDecode(r)))
    // WITH the codec: claimed-and-decodable records carry ITS features in
    // the same schema; corrupt and unclaimed payloads still stub
    val plugged = Multimodal.decodeAll(spark.createDataset(records), Seq(FakeMp3Codec))
      .collect().map(f => f.media_id -> f).toMap
    assert(plugged(1L).width === 44100 && plugged(1L).height === 2 &&
      plugged(1L).frames === mp3.length / 4,
      "a claimed payload must decode through the external codec")
    assert(plugged(1L).checksum === bare(1L).checksum,
      "payload-derived fields are codec-independent")
    assert(plugged(2L) === Multimodal.fakeDecode(records(1)),
      "a corrupt claimed payload falls back to the stub, not a crash")
    assert(plugged(3L) === Multimodal.fakeDecode(records(2)),
      "unclaimed payloads are untouched by the plug")
    // ...and the downstream typed flow is identical: frame sampling fans
    // out over the externally-decoded frame count like any other record
    val sampled = Multimodal.sampleFrames(
      Multimodal.decodeAll(spark.createDataset(Seq(records.head)), Seq(FakeMp3Codec)),
      everyN = 1).collect()
    assert(sampled.length === mp3.length / 4,
      "frame sampling must fan out over the external codec's frame count")
    // a JDK-decodable payload is never shadowed by an external codec:
    // the real WAV parse wins even with the plug installed
    val wav = audioBytes(tone(1000, 0.5), 8000f, 1, Wave)
    val viaBoth = Multimodal.decodeAll(
      spark.createDataset(Seq(Multimodal.MediaRecord(9L, wav, "audio"))),
      Seq(FakeMp3Codec)).collect()(0)
    assert(viaBoth.width === 8000 && viaBoth.height === 1,
      "JDK codecs take precedence over external plugs")
  }

  test("MP3/ADTS frame-header walk: real metadata, strict rejection of near-misses") {
    import spark.implicits._
    // a real (synthesized) 5-frame 48 kHz stereo MP3 behind an ID3v2 tag
    val mp3 = Multimodal.synthMp3(nFrames = 5, rateIdx = 1, stereo = true)
    val m = Multimodal.readMpegAudioMeta(mp3).get
    assert(m.container === "mp3" && m.sampleRate === 48000 && m.channels === 2)
    assert(m.nFrames === 5 && m.sampleFrames === 5L * 1152)
    assert(m.bitrateKbps === Some(128), "CBR stream reports its header bitrate")
    assert(m.durationMs === 5L * 1152 * 1000 / 48000)
    // hand-rolled header, no synth: byte offsets independently derived
    // (MPEG1 L3, 44100, mono, 128k → frame length 417)
    val hand = new java.io.ByteArrayOutputStream()
    (0 until 2).foreach { _ =>
      val f = new Array[Byte](417)
      f(0) = 0xFF.toByte; f(1) = 0xFB.toByte; f(2) = 0x90.toByte; f(3) = 0xC0.toByte
      hand.write(f)
    }
    val hm = Multimodal.readMpegAudioMeta(hand.toByteArray).get
    assert(hm.sampleRate === 44100 && hm.channels === 1 && hm.nFrames === 2)
    // ADTS: 3 frames, 44100 (freqIdx 4), stereo
    val aac = Multimodal.readMpegAudioMeta(Multimodal.synthAdts(3, 4, 2)).get
    assert(aac.container === "aac" && aac.sampleRate === 44100 && aac.channels === 2)
    assert(aac.nFrames === 3 && aac.sampleFrames === 3L * 1024 && aac.bitrateKbps === None)
    // strictness: the failure mode on a 100 TB corpus is FALSE CLAIMS
    assert(Multimodal.readMpegAudioMeta(mp3.take(mp3.length - 10)) === None,
      "a truncated final frame rejects the whole stream")
    assert(Multimodal.readMpegAudioMeta(Multimodal.synthMp3(1, 0, stereo = false)) === None,
      "a single frame is not enough evidence to claim")
    // mid-stream channel-COUNT switch rejects (strict symmetry with the
    // rate switch); stereo↔joint-stereo alternation keeps count 2 and
    // legitimately claims (r19 review)
    def frameWithMode(mode: Int): Array[Byte] = {
      val f = new Array[Byte](417)
      f(0) = 0xFF.toByte; f(1) = 0xFB.toByte; f(2) = 0x90.toByte
      f(3) = ((mode & 3) << 6).toByte
      f
    }
    assert(Multimodal.readMpegAudioMeta(frameWithMode(3) ++ frameWithMode(0)) === None,
      "a mono→stereo splice is not one stream")
    val js = Multimodal.readMpegAudioMeta(frameWithMode(0) ++ frameWithMode(1)).get
    assert(js.channels === 2, "stereo↔joint-stereo alternation is one 2-channel stream")
    assert(Multimodal.readMpegAudioMeta("ID3 only, no frames".getBytes) === None)
    assert(Multimodal.readMpegAudioMeta(Array[Byte](0xFF.toByte, 0xFB.toByte)) === None)
    assert(Multimodal.readMpegAudioMeta("plain text".getBytes) === None)
    // FLAC STREAMINFO: round trip incl. a >32-bit total-samples field,
    // strict rejection of a non-STREAMINFO first block and truncation
    val big = 5L * 1024 * 1024 * 1024
    assert(Multimodal.readFlacMeta(Multimodal.synthFlac(44100, 2, big))
      === Some((44100, 2, big)))
    assert(Multimodal.readFlacMeta(Multimodal.synthFlac(96000, 6, 1234L))
      === Some((96000, 6, 1234L)))
    val badFirst = Multimodal.synthFlac(44100, 2, 10L).clone()
    badFirst(4) = 0x84.toByte // first block VORBIS_COMMENT, not STREAMINFO
    assert(Multimodal.readFlacMeta(badFirst) === None)
    assert(Multimodal.readFlacMeta(Multimodal.synthFlac(44100, 2, 10L).take(20)) === None)
    assert(Multimodal.readFlacMeta("fLaC but not really a flac".getBytes) === None)
    // ...and through the seam: (sample_rate, channels, sample_frames)
    val flacSeam = Multimodal.decodeAll(spark.createDataset(Seq(
      Multimodal.MediaRecord(9L, Multimodal.synthFlac(48000, 2, 4800L), "audio")))).collect()(0)
    assert(flacSeam.width === 48000 && flacSeam.height === 2 && flacSeam.frames === 4800)
    // the decode seam serves the header metadata WITHOUT any codec plug:
    // (sample_rate, channels, sample_frames) ride the audio convention,
    // shrinking the codec-seam residue to PCM decode only
    val viaSeam = Multimodal.decodeAll(spark.createDataset(Seq(
      Multimodal.MediaRecord(1L, mp3, "audio")))).collect()(0)
    assert(viaSeam.width === 48000 && viaSeam.height === 2 && viaSeam.frames === 5 * 1152)
  }

  test("Ogg page walk (Vorbis/Opus) and EBML walk (WebM): real metadata, strict rejection") {
    // Vorbis: 44.1 kHz stereo, 3 data pages, 4096 total samples
    val ogg = Multimodal.synthOgg("vorbis", 44100, 2, 4096L, dataPages = 3)
    val v = Multimodal.readOggMeta(ogg).get
    assert(v.container === "vorbis" && v.sampleRate === 44100 && v.channels === 2)
    assert(v.nFrames === 4, "page count = 3 data pages + the BOS header page")
    assert(v.sampleFrames === 4096L && v.durationMs === 4096L * 1000 / 44100)
    // Opus: granules tick at 48 kHz regardless of input rate (RFC 7845
    // §5.1 — input_sample_rate is informational), so the reported rate
    // is the decode rate; playback samples exclude the 312 pre-skip the
    // synth plants
    val opus = Multimodal.synthOgg("opus", 16000, 1, 2880L, dataPages = 2)
    val o = Multimodal.readOggMeta(opus).get
    assert(o.container === "opus" && o.sampleRate === 48000 && o.channels === 1)
    assert(o.sampleFrames === 2880L - 312L && o.durationMs === (2880L - 312L) * 1000 / 48000)
    // strict rejections — arbitrary corpus bytes must never half-parse
    assert(Multimodal.readOggMeta("OggS but not really a page".getBytes) === None)
    assert(Multimodal.readOggMeta(ogg.take(ogg.length - 3)) === None,
      "a truncated final page rejects (pages must tile exactly)")
    assert(Multimodal.readOggMeta(ogg.drop(28)) === None, "no resync scan")
    val badVer = ogg.clone(); badVer(4) = 1
    assert(Multimodal.readOggMeta(badVer) === None, "unknown stream version rejects")
    val noBos = ogg.clone(); noBos(5) = 0
    assert(Multimodal.readOggMeta(noBos) === None, "a first page without BOS rejects")
    // the no-EOS case: strip the EOS flag off the last page (pages are
    // 27-byte header + 1 segment-table byte + 10 payload bytes)
    val noEos = Multimodal.synthOgg("vorbis", 44100, 2, 4096L, 2)
    val lastPageAt = noEos.length - (27 + 1 + 10)
    noEos(lastPageAt + 5) = 0
    assert(Multimodal.readOggMeta(noEos) === None, "a stream without EOS rejects")
    // WebM/EBML: 96x64, 7 frames, 280 ms
    val webm = Multimodal.synthWebm(96, 64, 7, 280L)
    val w = Multimodal.readEbmlMeta(webm).get
    assert(w.container === "webm" && w.codec === "vp9")
    assert(w.width === 96 && w.height === 64 && w.nFrames === 7)
    assert(w.durationMs === Some(280L))
    // a non-WebM Matroska codec reads as mkv with the codec suffix
    val mkv = Multimodal.readEbmlMeta(
      Multimodal.synthWebm(32, 32, 1, 40L, codecId = "V_MPEG4/ISO/AVC")).get
    assert(mkv.container === "mkv" && mkv.codec === "mpeg4")
    // strict rejections
    assert(Multimodal.readEbmlMeta("plain text".getBytes) === None)
    assert(Multimodal.readEbmlMeta(webm.take(webm.length - 2)) === None,
      "an element size overrunning the payload rejects (exact nesting)")
    assert(Multimodal.readEbmlMeta(webm.take(12)) === None,
      "the EBML header alone is not a claim — a Segment+Tracks must parse")
    val zeroFrames = Multimodal.synthWebm(96, 64, 0, 280L)
    assert(Multimodal.readEbmlMeta(zeroFrames) === None,
      "a video track with zero blocks rejects (the H.264 zero-pictures rule)")
    // malformed blocks under correct outer nesting must neither count
    // nor throw: a zero-size SimpleBlock (its track varint would read
    // the next sibling's bytes unbounded) and a 1-byte block whose
    // track varint CLAIMS two bytes
    val malformedBlocks = Array[Byte](0xA3.toByte, 0x80.toByte) ++
      Array[Byte](0xA3.toByte, 0x81.toByte, 0x41)
    val withJunk = Multimodal.readEbmlMeta(
      Multimodal.synthWebm(96, 64, 7, 280L, rawClusterBytes = malformedBlocks)).get
    assert(withJunk.nFrames === 7,
      s"block-internal varints must stay inside their block — got $withJunk")
    // an Ogg BOS page whose only lacing value is 255 (the id header
    // CONTINUES on the next page) is not the claimed shape, even when
    // the payload leads with a valid-looking vorbis header
    val vorbisBos = ogg.take(58) // 27 hdr + 1 segtable + 30 id header
    val contPayload = vorbisBos.drop(28) ++ Array.fill(225)(0.toByte)
    val contPage = vorbisBos.take(26) ++ Array[Byte](1, 255.toByte) ++ contPayload
    assert(Multimodal.readOggMeta(contPage ++ ogg.drop(58)) === None,
      "a continued (all-255-lacing) first packet must not half-claim")
    // the decode seam serves Ogg and WebM metadata without a codec plug
    import spark.implicits._
    val viaSeam = Multimodal.decodeAll(spark.createDataset(Seq(
      Multimodal.MediaRecord(1L, ogg, "audio"),
      Multimodal.MediaRecord(2L, webm, "video")))).collect()
      .map(f => f.media_id -> f).toMap
    assert(viaSeam(1L).width === 44100 && viaSeam(1L).height === 2
      && viaSeam(1L).frames === 4096)
    assert(viaSeam(2L).width === 96 && viaSeam(2L).height === 64
      && viaSeam(2L).frames === 7)
  }

  test("MP4 box walk / H.264 SPS parse: real video metadata, strict rejection") {
    import spark.implicits._
    // synthesized MP4: 320x240, 25 frames, 1000 ms at the mvhd clock
    val mp4 = Multimodal.synthMp4(320, 240, 25, 1000L)
    val m = Multimodal.readMp4Meta(mp4).get
    assert(m.container === "mp4" && m.codec === "avc1")
    assert(m.width === 320 && m.height === 240 && m.nFrames === 25)
    assert(m.durationMs === Some(1000L))
    // synthesized Annex-B H.264: 4x3 macroblocks = 64x48, 6 IDR pictures
    val h264 = Multimodal.synthH264(widthMbs = 4, heightMbs = 3, nFrames = 6)
    val hm = Multimodal.readH264Meta(h264).get
    assert(hm.container === "h264" && hm.codec === "avc")
    assert(hm.width === 64 && hm.height === 48 && hm.nFrames === 6)
    assert(hm.durationMs === None, "a clockless raw stream reports no duration")
    // ...but a stream whose SPS carries VUI timing DOES have a clock:
    // 25 fps x 6 frames = 240 ms
    val timed = Multimodal.readH264Meta(
      Multimodal.synthH264(4, 3, 6, fps = 25)).get
    assert(timed.durationMs === Some(240L),
      s"VUI timing_info must yield frames/fps duration, got $timed")
    assert(timed.width === 64 && timed.height === 48 && timed.nFrames === 6)
    // hand-rolled SPS, no synth: bit offsets independently derived
    // (baseline 66, 2x1 macroblocks, frame cropping 1 left chroma unit →
    // 30x16; the 00 00 03 emulation-prevention byte after the zero
    // constraint/level bytes must be STRIPPED before bit reading)
    val handSps = Array(0x67, 0x42, 0x00, 0x00, 0x03, 0x1E, 0xF4, 0x5E, 0xBA).map(_.toByte)
    val slice = Array(0x65, 0x88).map(_.toByte)
    val code = Array[Byte](0, 0, 0, 1)
    val hand = code ++ handSps ++ code ++ slice
    val hv = Multimodal.readH264Meta(hand).get
    assert(hv.width === 30 && hv.height === 16 && hv.nFrames === 1,
      s"hand SPS: crop arithmetic (2*16 - 1*2 = 30) and level=0 via emulation bytes, got $hv")
    // multi-slice pictures are ONE frame: only first_mb_in_slice == 0
    // starts a picture (second slice of the same picture has mb > 0:
    // ue(1) = bits 010 → byte 0x48)
    val midSlice = Array(0x65, 0x48).map(_.toByte)
    val twoSlices = code ++ handSps ++ code ++ slice ++ code ++ midSlice
    assert(Multimodal.readH264Meta(twoSlices).get.nFrames === 1,
      "a continuation slice must not count as a second picture")
    // mvhd all-ones duration is the spec's "unknown" sentinel (ISO
    // 14496-12): the claim stands, the duration does not — a naive
    // divide would report ~49 days
    val unk = Multimodal.readMp4Meta(Multimodal.synthMp4(320, 240, 25, 0xFFFFFFFFL)).get
    assert(unk.width === 320 && unk.nFrames === 25 && unk.durationMs === None,
      s"all-ones mvhd duration must read as unknown, got $unk")
    // VUI duration arithmetic is exact: crafted (frames, nuit) products
    // that overflow Long drop the duration instead of going negative
    assert(Multimodal.vuiDurationMs(6, 1000L, 50000L) === Some(240L))
    assert(Multimodal.vuiDurationMs(Int.MaxValue, 0xFFFFFFFFL, 2L) === None,
      "overflowing VUI product must drop the duration, not wrap negative")
    assert(Multimodal.vuiDurationMs(6, 0L, 50000L) === None)
    // strictness: the failure mode on a 100 TB corpus is FALSE CLAIMS
    assert(Multimodal.readVideoMeta("plain text payload".getBytes) === None)
    assert(Multimodal.readMp4Meta(mp4.take(40)) === None,
      "a moov box whose size overruns the payload rejects")
    assert(Multimodal.readMp4Meta(mp4.take(16)) === None, "ftyp alone is not a claim")
    assert(Multimodal.readH264Meta(code ++ handSps) === None,
      "an SPS with zero coded pictures rejects")
    assert(Multimodal.readH264Meta(h264.take(8)) === None,
      "a truncated SPS rejects instead of throwing")
    assert(Multimodal.readH264Meta(code ++ slice) === None,
      "the first NAL must be the SPS — no resync scan")
    // the decode seam serves container metadata WITHOUT any codec plug:
    // (width, height, frames) for a kind="video" record, so the
    // MediaCodec residue is pixel decode only
    val viaSeam = Multimodal.decodeAll(spark.createDataset(Seq(
      Multimodal.MediaRecord(1L, mp4, "video"),
      Multimodal.MediaRecord(2L, h264, "video")))).collect()
      .map(f => f.media_id -> f).toMap
    assert(viaSeam(1L).width === 320 && viaSeam(1L).height === 240 && viaSeam(1L).frames === 25)
    assert(viaSeam(2L).width === 64 && viaSeam(2L).height === 48 && viaSeam(2L).frames === 6)
    // an animated GIF declared "video" still routes through the JDK
    // image codec FIRST (readVideoMeta never sees bytes ImageIO claims)
    val gif = {
      val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
      val bos = new java.io.ByteArrayOutputStream()
      val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      (0 until 3).foreach { s =>
        val im = new java.awt.image.BufferedImage(8, 6, java.awt.image.BufferedImage.TYPE_INT_RGB)
        (0 until 8).foreach(x => (0 until 6).foreach(y => im.setRGB(x, y, (x * 31 + y + s) & 0xFFFFFF)))
        writer.writeToSequence(new javax.imageio.IIOImage(im, null, null), writer.getDefaultWriteParam)
      }
      writer.endWriteSequence(); ios.close(); writer.dispose()
      bos.toByteArray
    }
    val g = Multimodal.decodeAll(spark.createDataset(Seq(
      Multimodal.MediaRecord(3L, gif, "video")))).collect()(0)
    assert(g.frames === 3, "GIF keeps its imageio decode under the video walk")
  }
}

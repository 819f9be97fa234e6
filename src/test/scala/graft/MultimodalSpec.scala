package graft

import org.apache.spark.sql.functions._

import graft.multimodal.MultimodalOps

/** Multimodal plumbing contract: BINARY payload column with typed
  * metadata, per-partition decode boundary, deterministic features. All
  * three modalities decode for real with the stock JDK: BMP stills and
  * WAV audio through their codecs, video through the concatenated-BMP
  * [[MultimodalOps.Bmv]] stand-in container (per-frame raster decode).
  */
class MultimodalSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("media table carries a BINARY payload and a modality tag") {
    val m = MultimodalOps.mediaTable(spark, sf)
    m.schema("payload").dataType.typeName shouldBe "binary"
    m.select("format").distinct().collect().map(_.getString(0)).toSet shouldBe
      Set("image", "audio", "video")
  }

  test("decode stub: histogram accounts for every payload byte, deterministic") {
    val f = MultimodalOps.extractFeatures(spark, sf).cache()
    f.count() shouldBe 500L
    // histogram mass == payload bytes, per row
    import spark.implicits._
    f.map(r => (r.n_bytes, r.hist.sum)).filter(t => t._1 != t._2)
      .count() shouldBe 0L
    // deterministic across runs
    val a = f.select("doc_id", "n_bytes").orderBy("doc_id").collect()
    val b = MultimodalOps.extractFeatures(spark, sf)
      .select("doc_id", "n_bytes").orderBy("doc_id").collect()
    a shouldBe b
  }

  test("Bmp.encode round-trips exact pixels through javax.imageio") {
    // 2x2 with known colors: red, green / blue, white
    val rgb = Array[Byte](
      255.toByte, 0, 0,   0, 255.toByte, 0,
      0, 0, 255.toByte,   255.toByte, 255.toByte, 255.toByte)
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(MultimodalOps.Bmp.encode(2, 2, rgb)))
    img.getWidth shouldBe 2
    img.getHeight shouldBe 2
    (img.getRGB(0, 0) & 0xFFFFFF) shouldBe 0xFF0000
    (img.getRGB(1, 0) & 0xFFFFFF) shouldBe 0x00FF00
    (img.getRGB(0, 1) & 0xFFFFFF) shouldBe 0x0000FF
    (img.getRGB(1, 1) & 0xFFFFFF) shouldBe 0xFFFFFF
  }

  test("Wav.encode round-trips exact format params and samples through javax.sound.sampled") {
    val samples = Array[Short](0, 1000, -1000, 32767, -32768, 12345, -12345, 42)
    val wav = MultimodalOps.Wav.encode(8000, 2, samples)
    val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(wav))
    val fmt = in.getFormat
    fmt.getSampleRate shouldBe 8000f
    fmt.getChannels shouldBe 2
    fmt.getSampleSizeInBits shouldBe 16
    in.getFrameLength shouldBe 4 // 8 samples / 2 channels
    val bytes = in.readAllBytes()
    val got = Array.tabulate(samples.length)(i =>
      ((bytes(2 * i) & 0xFF) | (bytes(2 * i + 1) << 8)).toShort)
    got.toSeq shouldBe samples.toSeq
  }

  test("audio decode is real: AudioSystem stream features from WAV payloads") {
    import spark.implicits._
    val f = MultimodalOps.extractAudioFeatures(spark, sf).cache()
    val nAudio = MultimodalOps.mediaTable(spark, sf)
      .filter(col("format") === "audio").count()
    f.count() shouldBe nAudio
    // every row decoded: codec-reported rate/channels/duration, histogram
    // mass = decoded sample count (NOT payload byte count — proves the
    // features came from the decoded stream, not the container bytes)
    f.filter(r => r.sample_rate != 8000 || r.channels != 1).count() shouldBe 0L
    f.filter(r => r.duration_us != 100000L).count() shouldBe 0L // 800 frames @ 8 kHz
    f.map(r => r.hist.sum).filter(_ != 800L).count() shouldBe 0L
    f.filter(r => r.n_bytes != 44 + 800 * 2).count() shouldBe 0L
    // deterministic across runs
    val a = f.map(r => (r.doc_id, r.hist.toSeq)).orderBy("_1").collect()
    val b = MultimodalOps.extractAudioFeatures(spark, sf)
      .map(r => (r.doc_id, r.hist.toSeq)).orderBy("_1").collect()
    a shouldBe b
    f.unpersist()
  }

  test("decode falls back for a parseable WAV whose format the sample loop can't read") {
    // a VALID 8-bit PCM WAV: AudioSystem parses it happily, but reading
    // its samples two-bytes-at-a-time would fabricate garbage features —
    // the format check must reject it into the byte-histogram fallback
    val n = 64
    val out8 = java.nio.ByteBuffer.allocate(44 + n)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out8.put("RIFF".getBytes("US-ASCII")).putInt(36 + n)
      .put("WAVE".getBytes("US-ASCII"))
    out8.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(8000).putInt(8000).putShort(1).putShort(8)
    out8.put("data".getBytes("US-ASCII")).putInt(n)
    (0 until n).foreach(i => out8.put((i * 3).toByte))
    val payload = out8.array()
    // sanity: the JDK does parse it as 8-bit audio
    val fmt = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(payload)).getFormat
    fmt.getSampleSizeInBits shouldBe 8
    val res = MultimodalOps.Decode.decode(
      Iterator(MultimodalOps.MediaRow(3L, "audio", payload))).toSeq
    res should have size 1
    res.head.sample_rate shouldBe 0 // NOT emitted as decoded
    res.head.hist.sum shouldBe payload.length.toLong // byte histogram
  }

  test("decode falls back to the byte histogram when a payload merely starts with RIFF/WAVE") {
    // a valid RIFF/WAVE magic with garbage chunk contents: AudioSystem
    // throws (not always IOException) and decode must fall back, not fail
    val payload = ("RIFF" + "xxxx" + "WAVE" + "z" * 100).getBytes("UTF-8")
    val out = MultimodalOps.Decode.decode(
      Iterator(MultimodalOps.MediaRow(2L, "audio", payload))).toSeq
    out should have size 1
    out.head.sample_rate shouldBe 0 // not decoded as audio
    out.head.hist.sum shouldBe payload.length.toLong
  }

  test("decode falls back to the byte histogram when a payload merely starts with BM") {
    val payload = ("BM" + "w" * 100).getBytes("UTF-8") // text, not a BMP
    val out = MultimodalOps.Decode.decode(
      Iterator(MultimodalOps.MediaRow(1L, "image", payload))).toSeq
    out should have size 1
    out.head.width shouldBe 0 // not decoded as an image
    out.head.hist.sum shouldBe payload.length.toLong
  }

  test("image decode is real: ImageIO raster features from BMP payloads") {
    import spark.implicits._
    val f = MultimodalOps.extractImageFeatures(spark, sf).cache()
    val nImages = MultimodalOps.mediaTable(spark, sf)
      .filter(col("format") === "image").count()
    f.count() shouldBe nImages
    // every row decoded: raster dims from the codec, histogram mass =
    // decoded pixel count (NOT payload byte count - proves the features
    // came from the raster, not the bytes)
    f.filter(r => r.width != 16 || r.height != 8).count() shouldBe 0L
    f.map(r => r.hist.sum).filter(_ != 16L * 8).count() shouldBe 0L
    // deterministic across runs
    val a = f.map(r => (r.doc_id, r.hist.toSeq)).orderBy("_1").collect()
    val b = MultimodalOps.extractImageFeatures(spark, sf)
      .map(r => (r.doc_id, r.hist.toSeq)).orderBy("_1").collect()
    a shouldBe b
    f.unpersist()
  }

  test("metadata query is consistent with the feature extraction") {
    val meta = MultimodalOps.multimodalMeta(spark, sf)
    val f = MultimodalOps.extractFeatures(spark, sf)
      .select(col("doc_id"), col("n_bytes").as("fb"))
    meta.join(f, "doc_id").filter(col("n_bytes") =!= col("fb"))
      .count() shouldBe 0L
    meta.filter(col("n_chunks") =!= col("n_frames")).count() shouldBe 0L
  }

  test("video decode is real: per-frame ImageIO features from BMV clips") {
    import spark.implicits._
    val f = MultimodalOps.extractVideoFeatures(spark, sf).collect()
    f.nonEmpty shouldBe true
    f.foreach { r =>
      val expFrames = 3 + (r.doc_id % 3).toInt
      r.n_frames shouldBe expFrames
      (r.width, r.height) shouldBe (16, 8)
      r.duration_us shouldBe expFrames * 100000L
      // histogram mass = w*h*frames — decoded pixels, not payload bytes
      r.hist.sum shouldBe 16L * 8 * expFrames
    }
  }

  test("per-frame luminance matches a from-first-principles recomputation and drifts") {
    import spark.implicits._
    val texts = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").filter(col("doc_id") % 3 === 2)
      .as[(Long, String)].collect().toMap
    val lums = MultimodalOps.videoFrameLuminance(spark, sf).collect()
      .groupBy(_._1).map { case (k, rs) =>
        k -> rs.sortBy(_._2).map(_._3).toSeq }
    lums.keySet shouldBe texts.keySet
    var drifting = 0
    lums.foreach { case (id, perFrame) =>
      val bytes = texts(id).getBytes("UTF-8")
      val expected = perFrame.indices.map { fIdx =>
        val sum = (0 until 16 * 8).map { p =>
          val ch = (0 until 3).map(c =>
            bytes((3 * p + c + 7 * fIdx) % bytes.length) & 0xFF)
          (ch(0) + ch(1) + ch(2)) / 3
        }.map(_.toLong).sum
        sum * 1000L / (16L * 8)
      }
      perFrame shouldBe expected
      if (perFrame.distinct.size > 1) drifting += 1
    }
    // the phase shift makes the temporal axis move for real content
    assert(drifting > lums.size / 2, s"only $drifting/${lums.size} clips drift")
  }

  test("decode falls back to the byte histogram for a truncated BMV clip") {
    import spark.implicits._
    val clip = MultimodalOps.videoTable(spark, sf).head()
    val cut = java.util.Arrays.copyOfRange(clip.payload, 0, clip.payload.length - 20)
    val rows = Seq(MultimodalOps.MediaRow(clip.doc_id, "video", cut))
    val out = MultimodalOps.Decode.decode(rows.iterator).toSeq.head
    out.n_frames shouldBe 0
    out.hist.sum shouldBe cut.length.toLong
  }
}

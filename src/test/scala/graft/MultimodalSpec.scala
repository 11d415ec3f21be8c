package graft

import graft.operators.{Multimodal, MediaRow}
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private val d = Seq((1L, "hello world"), (2L, "a much longer document body here"))
    .toDF("doc_id", "text")

  test("assets: binary payload round-trips, metadata is content-derived") {
    val a = Multimodal.assets(d).orderBy("asset_id").collect()
    assert(new String(a(0).getAs[Array[Byte]]("content"), "UTF-8") === "hello world")
    assert(a(0).getAs[Long]("n_bytes") === 11L)
    assert(a(0).getAs[String]("checksum").length === 32)
  }

  test("decodeMeta dims are deterministic and within the stub ranges") {
    val m = Multimodal.decodeMeta(Multimodal.assets(d)).collect()
    m.foreach { r =>
      val (w, h, f) = (r.getAs[Int]("width"), r.getAs[Int]("height"), r.getAs[Int]("n_frames"))
      assert(w >= 16 && w < 640); assert(h >= 16 && h < 480); assert(f >= 1 && f <= 16)
    }
    def dims(rows: Array[org.apache.spark.sql.Row]) = rows.map(r =>
      (r.getAs[Long]("asset_id"), r.getAs[Int]("width"), r.getAs[Int]("height"),
        r.getAs[Int]("n_frames"))).sortBy(_._1).toSeq
    val again = Multimodal.decodeMeta(Multimodal.assets(d)).collect()
    assert(dims(m) === dims(again))
  }

  test("frameSample counts every step-th frame") {
    val s = Multimodal.frameSample(Multimodal.decodeMeta(Multimodal.assets(d)), step = 4)
      .select("n_frames", "n_sampled", "last_frame").collect()
    s.foreach { r =>
      val exp = (0 until r.getAs[Int]("n_frames") by 4).toSeq
      assert(r.getAs[Int]("n_sampled") === exp.size)
      assert(r.getAs[Int]("last_frame") === exp.last)
    }
  }

  /** Deterministic synthetic image: pixel (x,y) = linear ramp over a gray
    * gradient, encoded through the JDK's own PNG/BMP writers. */
  private def imageBytes(w: Int, h: Int, format: String): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val g = (x * 7 + y * 13) % 256
      img.setRGB(x, y, (g << 16) | (g << 8) | g)
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, format, out)
    out.toByteArray
  }

  private def mediaRow(id: Long, bytes: Array[Byte], mime: String) = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val checksum = md.digest(bytes).map("%02x".format(_)).mkString
    graft.operators.MediaRow(id, bytes, mime, bytes.length.toLong, checksum)
  }

  test("featureExtract decodes real PNG/BMP pixels via ImageIO") {
    val rows = Seq(
      mediaRow(1L, imageBytes(20, 12, "png"), "image/png"),
      mediaRow(2L, imageBytes(33, 7, "bmp"), "image/bmp")).toDS()
    val feats = Multimodal.featureExtract(rows, dim = 8)
      .collect().sortBy(_.asset_id)
    assert((feats(0).width, feats(0).height, feats(0).n_frames) === (20, 12, 1))
    assert((feats(1).width, feats(1).height, feats(1).n_frames) === (33, 7, 1))
    // expected luminance fold computed independently from the same ramp
    def expected(w: Int, h: Int, dim: Int): Array[Float] = {
      val acc = new Array[Float](dim)
      for (y <- 0 until h; x <- 0 until w) {
        val g = (x * 7 + y * 13) % 256
        acc((y * w + x) % dim) += (3 * g) / (3.0f * 255.0f)
      }
      acc
    }
    assert(feats(0).features.toSeq === expected(20, 12, 8).toSeq)
    assert(feats(1).features.toSeq === expected(33, 7, 8).toSeq)
  }

  /** Animated GIF via the ImageIO sequence-writing API (pure JDK). */
  private def animatedGif(w: Int, h: Int, frames: Int): Array[Byte] = {
    import javax.imageio.{IIOImage, ImageIO, ImageTypeSpecifier}
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    val out = new java.io.ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(out)
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    for (f <- 0 until frames) {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        val g = (x + y + f * 31) % 256
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
      }
      val meta = writer.getDefaultImageMetadata(
        new ImageTypeSpecifier(img), writer.getDefaultWriteParam)
      writer.writeToSequence(new IIOImage(img, null, meta), writer.getDefaultWriteParam)
    }
    writer.endWriteSequence(); ios.close(); writer.dispose()
    out.toByteArray
  }

  test("featureExtract counts all frames of an animated GIF") {
    val rows = Seq(mediaRow(3L, animatedGif(12, 8, 4), "image/gif")).toDS()
    val f = Multimodal.featureExtract(rows, dim = 8).collect().head
    assert((f.width, f.height, f.n_frames) === (12, 8, 4))
    assert(f.features.sum > 0f) // frame-0 pixels folded in
  }

  test("featureExtract falls back to the checksum stub on undecodable bytes") {
    val garbage = mediaRow(9L, Array[Byte](1, 2, 3, 4, 5), "image/png")
    val f = Multimodal.featureExtract(Seq(garbage).toDS(), dim = 4).collect().head
    val h = java.lang.Long.parseLong(garbage.checksum.take(15), 16)
    assert(f.width === (h % 624 + 16).toInt)
    assert(f.height === ((h / 1024) % 464 + 16).toInt)
    assert(f.n_frames === (h % 16 + 1).toInt)
    assert(f.features.length === 4)
  }

  /** Deterministic synthetic WAV through the JDK's own writer: 16-bit
    * signed little-endian PCM, sample i = (i * 2617 - 20000) mod-wrapped
    * into short range. */
  private def wavBytes(sampleRate: Float, channels: Int, nFrames: Int): Array[Byte] = {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    val n = nFrames * channels
    val data = new Array[Byte](n * 2)
    for (i <- 0 until n) {
      val s = ((i * 2617 - 20000) % 32768).toShort
      data(2 * i) = (s & 0xff).toByte
      data(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    val fmt = new AudioFormat(sampleRate, 16, channels, true, false)
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, nFrames.toLong)
    val out = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  test("featureExtract decodes real WAV/PCM samples via javax.sound") {
    val rows = Seq(
      mediaRow(4L, wavBytes(8000f, 1, 120), "audio/wav"),
      mediaRow(5L, wavBytes(44100f, 2, 75), "audio/wav")).toDS()
    val feats = Multimodal.featureExtract(rows, dim = 8).collect().sortBy(_.asset_id)
    // width/height/n_frames carry sample rate / channels / PCM frame count
    assert((feats(0).width, feats(0).height, feats(0).n_frames) === (8000, 1, 120))
    assert((feats(1).width, feats(1).height, feats(1).n_frames) === (44100, 2, 75))
    // expected amplitude fold computed independently from the same ramp
    def expected(nSamples: Int, dim: Int): Array[Float] = {
      val acc = new Array[Float](dim)
      for (i <- 0 until nSamples) {
        val s = ((i * 2617 - 20000) % 32768).toShort
        acc(i % dim) += (s / 32768f + 1f) / 2f
      }
      acc
    }
    assert(feats(0).features.toSeq === expected(120, 8).toSeq)
    assert(feats(1).features.toSeq === expected(150, 8).toSeq)
  }

  test("featureExtract falls back to the checksum stub on undecodable audio") {
    val garbage = mediaRow(10L, Array[Byte](82, 73, 70, 70, 0), "audio/wav")
    val f = Multimodal.featureExtract(Seq(garbage).toDS(), dim = 4).collect().head
    val h = java.lang.Long.parseLong(garbage.checksum.take(15), 16)
    assert((f.width, f.height, f.n_frames) ===
      ((h % 624 + 16).toInt, ((h / 1024) % 464 + 16).toInt, (h % 16 + 1).toInt))
  }

  test("featureExtract: typed pipeline agrees with the column-level decode") {
    val assets = Multimodal.assets(d).as[MediaRow]
    val feats = Multimodal.featureExtract(assets, dim = 8).collect()
    val meta = Multimodal.decodeMeta(Multimodal.assets(d)).orderBy("asset_id").collect()
    feats.sortBy(_.asset_id).zip(meta).foreach { case (f, m) =>
      assert(f.width === m.getAs[Int]("width"))
      assert(f.height === m.getAs[Int]("height"))
      assert(f.n_frames === m.getAs[Int]("n_frames"))
      assert(f.features.length === 8)
      assert(f.features.sum > 0f) // bytes actually folded in
    }
  }
  // --- minimal MJPEG-AVI writer (test fixture): RIFF(AVI )/LIST(hdrl)/
  // avih + LIST(movi)/00dc chunks — enough structure for any chunk-walking
  // reader; frame payloads are REAL ImageIO-encoded JPEGs
  private def chunk(id: String, data: Array[Byte]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 + data.length + (data.length & 1))
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put(id.getBytes("US-ASCII")).putInt(data.length).put(data)
    bb.array()
  }
  private def list(kind: String, children: Array[Byte]): Array[Byte] =
    chunk("LIST", kind.getBytes("US-ASCII") ++ children)

  private def jpegBytes(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until h).foreach(y => (0 until w).foreach(x => img.setRGB(x, y, rgb)))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  private def buildAvi(frames: Seq[Array[Byte]], w: Int, h: Int): Array[Byte] = {
    val avih = java.nio.ByteBuffer.allocate(56)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    avih.putInt(40000).putInt(0).putInt(0).putInt(0)    // usec/frame, maxbps, pad, flags
    avih.putInt(frames.length).putInt(0).putInt(1).putInt(0) // total, initial, streams, bufsize
    avih.putInt(w).putInt(h)                             // width, height (+16 reserved)
    val hdrl = list("hdrl", chunk("avih", avih.array()))
    val movi = list("movi", frames.flatMap(f => chunk("00dc", f)).toArray)
    val body = "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi
    chunk("RIFF", body)
  }

  test("L12 video: MJPEG-AVI container parse + real JPEG frame decode") {
    val w = 32; val h = 24
    val frames = Seq(jpegBytes(w, h, 0xffffff), jpegBytes(w, h, 0x000000),
      jpegBytes(w, h, 0x808080))
    val avi = buildAvi(frames, w, h)
    val rows = Seq(MediaRow(1L, avi, "video/avi", avi.length.toLong, "00" * 16))
      .toDS()
    val f = Multimodal.featureExtract(rows, dim = 8).collect().head
    assert(f.width === w && f.height === h)
    assert(f.n_frames === 3) // counted from real movi chunks
    // frame 0 is all-white: every luminance accumulator ≈ (w*h/dim) * 1.0
    val perSlot = w * h / 8.0f
    f.features.foreach(v => assert(math.abs(v - perSlot) / perSlot < 0.05,
      s"luminance fold off: $v vs $perSlot"))
  }

  // --- minimal ISO-BMFF (mp4) writer: big-endian size+fourcc boxes,
  // ftyp + moov(mvhd + trak(tkhd + mdia(minf(stbl(stsz))))) — the
  // codec-free container framing mp4Meta walks
  private def box(id: String, data: Array[Byte]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 + data.length) // big-endian default
    bb.putInt(8 + data.length).put(id.getBytes("US-ASCII")).put(data)
    bb.array()
  }
  private def buildMp4(timescale: Int, duration: Int, w: Int, h: Int,
                       nSamples: Int): Array[Byte] = {
    def fullBox(id: String, version: Int, payload: java.nio.ByteBuffer) =
      box(id, java.nio.ByteBuffer.allocate(4 + payload.position())
        .putInt(version << 24).put(payload.array(), 0, payload.position()).array())
    val mvhd = fullBox("mvhd", 0, java.nio.ByteBuffer.allocate(96)
      .putInt(0).putInt(0).putInt(timescale).putInt(duration))
    // tkhd v0: creation/mod/id/reserved/duration + reserved(8) + layer/
    // alt/volume/reserved (8) + matrix(36), then width/height 16.16
    val tkhdBody = java.nio.ByteBuffer.allocate(80)
    tkhdBody.putInt(0).putInt(0).putInt(1).putInt(0).putInt(duration)
    tkhdBody.position(20 + 8 + 8 + 36)
    tkhdBody.putInt(w << 16).putInt(h << 16)
    val tkhd = box("tkhd", Array[Byte](0, 0, 0, 0) ++ tkhdBody.array())
    val stsz = fullBox("stsz", 0, java.nio.ByteBuffer.allocate(8)
      .putInt(0).putInt(nSamples))
    val trak = box("trak", tkhd ++ box("mdia", box("minf", box("stbl", stsz))))
    box("ftyp", "isom".getBytes("US-ASCII") ++ new Array[Byte](4)) ++
      box("moov", mvhd ++ trak)
  }

  test("L12 video: mp4 box-tree metadata parses without a codec") {
    val mp4 = buildMp4(timescale = 600, duration = 1200, w = 320, h = 240,
      nSamples = 48)
    val meta = Multimodal.mp4Meta(mp4)
    assert(meta.isDefined, "mp4Meta rejected a well-formed BMFF tree")
    assert(meta.get.durationSec === 2.0)
    assert(meta.get.width === 320 && meta.get.height === 240)
    assert(meta.get.nSamples === 48)
    // the typed pipeline routes video/mp4 through the container parse:
    // REAL dimensions and sample count, stub feature fold (no codec)
    val rows = Seq(MediaRow(9L, mp4, "video/mp4", mp4.length.toLong, "b" * 32))
      .toDS()
    val f = Multimodal.featureExtract(rows, dim = 4).collect().head
    assert(f.width === 320 && f.height === 240 && f.n_frames === 48)
  }

  test("L12 video: audio-only trak (zero tkhd width) is not the video track") {
    // trak 1: width 0 (audio); trak 2: real video dims — parser must skip
    // to the nonzero-width trak
    def trakOf(w: Int, h: Int, n: Int): Array[Byte] = {
      val tkhdBody = java.nio.ByteBuffer.allocate(80)
      tkhdBody.position(20 + 8 + 8 + 36)
      tkhdBody.putInt(w << 16).putInt(h << 16)
      val tkhd = box("tkhd", Array[Byte](0, 0, 0, 0) ++ tkhdBody.array())
      val stsz = box("stsz", java.nio.ByteBuffer.allocate(12)
        .putInt(0).putInt(0).putInt(n).array())
      box("trak", tkhd ++ box("mdia", box("minf", box("stbl", stsz))))
    }
    val mvhd = box("mvhd", java.nio.ByteBuffer.allocate(100)
      .putInt(0).putInt(0).putInt(0).putInt(90000).putInt(90000).array())
    val mp4 = box("ftyp", "isom".getBytes("US-ASCII") ++ new Array[Byte](4)) ++
      box("moov", mvhd ++ trakOf(0, 0, 999) ++ trakOf(64, 48, 7))
    val meta = Multimodal.mp4Meta(mp4)
    assert(meta.exists(m => m.width === 64 && m.height === 48 && m.nSamples === 7))
    assert(meta.get.durationSec === 1.0)
  }

  test("L12 video: empty mvhd/tkhd payloads at end-of-buffer degrade, not throw") {
    // mvhd/tkhd boxes whose PAYLOAD offset lands exactly at end-of-buffer:
    // the version-byte read must bounds-check (return None), not AIOOBE —
    // the contract is that a poisoned container degrades to the stub row
    val emptyMvhd = box("ftyp", "isom".getBytes("US-ASCII") ++ new Array[Byte](4)) ++
      box("moov", box("mvhd", Array.emptyByteArray))
    assert(Multimodal.mp4Meta(emptyMvhd).isEmpty)
    val emptyTkhd = box("ftyp", "isom".getBytes("US-ASCII") ++ new Array[Byte](4)) ++
      box("moov", box("mvhd", java.nio.ByteBuffer.allocate(96)
        .putInt(0).putInt(0).putInt(0).putInt(600).putInt(600).array()) ++
        box("trak", box("tkhd", Array.emptyByteArray)))
    assert(Multimodal.mp4Meta(emptyTkhd).isEmpty)
    // and through the typed pipeline: the stub row, not a task failure
    val sum = "c" * 32
    val rows = Seq(MediaRow(3L, emptyMvhd, "video/mp4", emptyMvhd.length.toLong, sum))
      .toDS()
    val f = Multimodal.featureExtract(rows, dim = 4).collect().head
    val h60 = java.lang.Long.parseLong(sum.take(15), 16)
    assert(f.width === (h60 % 624 + 16).toInt)
  }

  test("L12 video: non-AVI and truncated AVI degrade to the checksum stub") {
    val junk = Array.fill[Byte](64)(7)
    val sum = "a" * 32
    val rows = Seq(
      MediaRow(1L, junk, "video/mp4", 64L, sum),
      MediaRow(2L, buildAvi(Seq(jpegBytes(8, 8, 0)), 8, 8).take(20), "video/avi", 20L, sum))
      .toDS()
    val got = Multimodal.featureExtract(rows, dim = 4).collect()
    val h60 = java.lang.Long.parseLong(sum.take(15), 16)
    got.foreach { f =>
      assert(f.width === (h60 % 624 + 16).toInt, s"asset ${f.asset_id} not stubbed")
    }
  }

  // left `darkCells` of the 8 cell columns black, the rest white; optional
  // extra black cell at (row 0, col 7) for the 1-bit perturbation
  private def bwBytes(w: Int, h: Int, format: String, darkCells: Int = 4,
                      perturb: Boolean = false): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val (cx, cy) = (x * 8 / w, y * 8 / h)
      val dark = cx < darkCells || (perturb && cy == 0 && cx == 7)
      img.setRGB(x, y, if (dark) 0 else 0xffffff)
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, format, out)
    out.toByteArray
  }

  test("L12b phash: aHash is format- and scale-invariant on a bimodal raster") {
    val rows = Seq(
      mediaRow(1L, bwBytes(64, 64, "png"), "image/png"),
      mediaRow(2L, bwBytes(128, 128, "bmp"), "image/bmp"),
      mediaRow(3L, bwBytes(48, 80, "png"), "image/png")) // non-square, non-multiple-of-8
      .toDS()
    val got = Multimodal.perceptualHash(rows).collect().sortBy(_.asset_id)
    assert(got.forall(_.decoded), s"pixel path not taken: ${got.toSeq}")
    // white cells are exactly the columns cx >= 4 → per-row bit mask 0xF0
    val expected = 0xF0F0F0F0F0F0F0F0L
    got.foreach(g => assert(g.phash === expected,
      s"asset ${g.asset_id}: ${g.phash.toHexString} != f0f0..."))
  }

  test("L12b phash: undecodable bytes and non-image mimes take the checksum fallback") {
    val sum = "b" * 32
    val rows = Seq(
      MediaRow(1L, Array.fill[Byte](32)(9), "image/png", 32L, sum),
      MediaRow(2L, bwBytes(64, 64, "png"), "text/plain", 100L, sum)).toDS()
    val got = Multimodal.perceptualHash(rows).collect()
    val h = java.lang.Long.parseLong(sum.take(15), 16)
    got.foreach { g =>
      assert(!g.decoded && g.phash === h, s"asset ${g.asset_id} not stubbed: $g")
    }
  }

  test("L12b phash pairs: banding finds the 1-bit neighbor, not the far image") {
    val rows = Seq(
      mediaRow(1L, bwBytes(64, 64, "png"), "image/png"),
      mediaRow(2L, bwBytes(64, 64, "png", perturb = true), "image/png"),
      mediaRow(3L, bwBytes(64, 64, "png", darkCells = 8), "image/png")) // all black
      .toDS()
    val pairs = Multimodal.phashPairs(Multimodal.perceptualHash(rows), maxHamming = 3)
      .collect()
    assert(pairs.length === 1, s"pairs: ${pairs.toSeq}")
    assert(pairs.head.getLong(0) === 1L && pairs.head.getLong(1) === 2L &&
      pairs.head.getInt(2) === 1, s"pair: ${pairs.head}")
  }
}

package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** One media asset: opaque bytes + typed metadata (the multimodal column
  * pattern — content stays an uninterpreted BLOB, everything queryable lives
  * in typed sibling columns). */
final case class MediaRow(asset_id: Long, content: Array[Byte], mime: String,
                          n_bytes: Long, checksum: String)

/** Decoded-frame features for one asset (see [[Multimodal.featureExtract]]:
  * real ImageIO decode for image mimes, real javax.sound WAV/PCM decode for
  * audio mimes (width/height carry sample-rate/channels there), checksum
  * stub otherwise). */
final case class MediaFeatures(asset_id: Long, width: Int, height: Int,
                               n_frames: Int, features: Array[Float])

/** One perceptual fingerprint ([[Multimodal.perceptualHash]]): `decoded`
  * distinguishes a real pixel-derived aHash from the checksum fallback. */
final case class MediaHash(asset_id: Long, phash: Long, decoded: Boolean)

/** Multimodal-column plumbing: treat image/audio/video as opaque `binary`
  * columns with typed metadata, and run decode / feature-extract / resize /
  * frame-sample as per-partition batch functions over the binary payload.
  *
  * Decode is REAL for image and audio payloads: [[featureExtract]] routes
  * `image/ *` mimes through JDK `javax.imageio` (PNG/BMP/GIF/JPEG — whatever
  * readers the JRE ships, no external codec needed) and derives width/height/
  * frame count/features from actual decoded pixels; `audio/ *` mimes go
  * through `javax.sound.sampled` (WAV/PCM, also codec-free JDK) with sample
  * rate/channels/frame count and an amplitude fold. Other mimes (and bytes
  * no reader accepts) fall back to a deterministic checksum-derived stub, so
  * the pipeline shape stays total: video codecs are not in this
  * container. The column-level [[decodeMeta]] keeps the checksum arithmetic
  * on purpose — it is the SQL-expressible twin that the DuckDB gate oracle
  * reproduces bit-for-bit.
  *
  * Scale: binary payloads ride along in parquet; metadata predicates
  * (mime, n_bytes, checksum) push down to the scan so full-content reads
  * only happen for selected assets. Feature extraction is a shuffle-free
  * narrow transformation; one partition = one batch of assets through the
  * codec, so reader setup amortizes per partition, not per row.
  */
object Multimodal {

  /** Wrap a text corpus as binary assets: content = UTF-8 bytes (the
    * stand-in for real media bytes), metadata derived from the content.
    * DuckDB parity: `encode(text)`, `octet_length`, `md5`. */
  def assets(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("asset_id"),
      col("text").cast("binary").as("content"),
      lit("text/plain").as("mime"),
      octet_length(col("text")).cast("bigint").as("n_bytes"),
      md5(col("text")).as("checksum"))

  /** Deterministic checksum "decode" at the column level: dimensions and
    * frame count derived from the checksum's portable 60-bit hash — integer
    * arithmetic only, so a DuckDB oracle reproduces it exactly. The typed
    * [[featureExtract]] path decodes real pixels for image mimes; this
    * column twin exists for the cross-engine gate and for metadata-only
    * scans that must not fetch content bytes. */
  def decodeMeta(assets: DataFrame): DataFrame =
    // integer `div`, not `/`: float division of a 60-bit value loses ulps
    // past 2^53 and would truncate differently than DuckDB's `//`
    assets.withColumn("h60",
        conv(substring(col("checksum"), 1, 15), 16, 10).cast("bigint"))
      .withColumn("width", (col("h60") % 624 + 16).cast("int"))
      .withColumn("height", (expr("h60 div 1024") % 464 + 16).cast("int"))
      .withColumn("n_frames", (col("h60") % 16 + 1).cast("int"))
      .drop("h60")

  /** Frame sampling: every `step`-th frame index, as a count + first/last
    * (scalar projections of the sampled sequence). */
  def frameSample(decoded: DataFrame, step: Int): DataFrame =
    decoded
      .withColumn("n_sampled", (floor((col("n_frames") - 1) / step) + 1).cast("int"))
      .withColumn("last_frame", (col("n_sampled") - 1) * step)

  /** Feature extraction over the binary payload, per-partition batches.
    *
    * `image/ *` payloads decode through `javax.imageio`: width/height from
    * the first frame, `n_frames` from the reader's frame count (multi-frame
    * GIFs report all frames), and `dim` luminance accumulators folded from
    * every pixel of frame 0 — deterministic for a fixed image. Anything
    * else — non-image mimes, or image bytes no installed reader accepts —
    * takes the checksum stub (same fold over raw content bytes, dims from
    * the 60-bit hash, matching [[decodeMeta]]), so a poisoned blob degrades
    * to metadata instead of failing the batch. */
  def featureExtract(assets: Dataset[MediaRow], dim: Int = 16): Dataset[MediaFeatures] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.mapPartitions { rows =>
      rows.map { r =>
        val decoded =
          if (r.mime.startsWith("image/")) decodeImage(r, dim)
          else if (r.mime.startsWith("audio/")) decodeAudio(r, dim)
          else if (r.mime.startsWith("video/")) decodeVideo(r, dim)
          else None
        decoded.getOrElse(stubFeatures(r, dim))
      }
    }
  }

  /** Real MJPEG-AVI decode: a pure-JVM RIFF/AVI container walk (no native
    * codec — the container is just framed chunks) collecting the video
    * stream's `##dc`/`##db` frame chunks, then a real ImageIO JPEG decode
    * of frame 0 for dimensions + the luminance fold. `n_frames` counts the
    * actual frame chunks in `movi` (not the header's declared total, which
    * lies in truncated files). None — i.e. checksum-stub degradation — for
    * anything that is not a parseable RIFF-AVI with a decodable first
    * frame. MP4/ISO-BMFF gets a REAL container-metadata parse
    * ([[mp4Meta]]: moov box tree → duration, track dimensions, sample
    * count — the container framing needs no codec); its FRAME PIXELS
    * stay undecodable by design (H.264 et al. are not in the JDK), so
    * the feature vector for mp4 is the same content-byte fold the stub
    * uses, with the metadata fields real. */
  private def decodeVideo(r: MediaRow, dim: Int): Option[MediaFeatures] = {
    val frames = aviVideoFrames(r.content)
    if (frames.nonEmpty)
      return decodeImage(MediaRow(r.asset_id, frames.head, "image/jpeg",
          frames.head.length.toLong, r.checksum), dim)
        .map(f => f.copy(n_frames = frames.length))
    mp4Meta(r.content).map { m =>
      MediaFeatures(r.asset_id, m.width, m.height, m.nSamples,
        stubFeatures(r, dim).features)
    }
  }

  /** Parsed ISO-BMFF (mp4/mov) container metadata. */
  final case class Mp4Meta(durationSec: Double, width: Int, height: Int,
                           nSamples: Int)

  /** Walk an ISO-BMFF box tree (big-endian u32 size + fourcc; size 1 =
    * 64-bit largesize follows, size 0 = to-end-of-scope) and read the
    * metadata the container carries without any codec: `mvhd` movie
    * duration/timescale, the video `tkhd`'s 16.16 fixed-point dimensions,
    * and that track's `stsz` sample (frame) count. The video track is the
    * first trak with nonzero tkhd width; None for bytes that are not a
    * plausible BMFF file (no `ftyp`/`moov` at the top level). The walk
    * descends only the fixed moov→trak→mdia→minf→stbl path, one level at
    * a time — hostile nesting cannot recurse, and each level is a
    * step-capped linear scan. */
  private[graft] def mp4Meta(bytes: Array[Byte]): Option[Mp4Meta] = {
    def fourcc(off: Int): String =
      if (off + 4 > bytes.length) ""
      else new String(bytes, off, 4, java.nio.charset.StandardCharsets.US_ASCII)
    def u32(off: Int): Long =
      if (off < 0 || off + 4 > bytes.length) -1L
      else ((bytes(off) & 0xffL) << 24) | ((bytes(off + 1) & 0xffL) << 16) |
        ((bytes(off + 2) & 0xffL) << 8) | (bytes(off + 3) & 0xffL)
    def u64(off: Int): Long = (u32(off) << 32) | u32(off + 4)
    // version byte of a full box, bounds-checked: a truncated mvhd/tkhd whose
    // payload offset lands at end-of-buffer must degrade (contract: poisoned
    // media yields the stub row, never a task failure), not throw AIOOBE
    def ver(off: Int): Int =
      if (off < 0 || off >= bytes.length) -1 else bytes(off) & 0xff
    // the (id, dataOff, boxEnd) children of one box scope
    def children(start: Int, end: Int): List[(String, Int, Int)] = {
      val out = List.newBuilder[(String, Int, Int)]
      var pos = start; var steps = 0
      while (pos + 8 <= end && steps < 100000) {
        steps += 1
        val size0 = u32(pos)
        val (dataOff, boxEnd) =
          if (size0 == 1) (pos + 16, pos + u64(pos + 8))
          else if (size0 == 0) (pos + 8, end.toLong)
          else (pos + 8, pos + size0)
        if (boxEnd < dataOff || boxEnd > end) pos = end // truncated/corrupt
        else {
          out += ((fourcc(pos + 4), dataOff, boxEnd.toInt))
          pos = boxEnd.toInt
        }
      }
      out.result()
    }
    if (bytes.length < 8) return None
    val top = children(0, bytes.length)
    if (!top.exists(_._1 == "ftyp") && !top.exists(_._1 == "moov")) return None
    val moov = top.find(_._1 == "moov").getOrElse(return None)
    val moovKids = children(moov._2, moov._3)
    val (timescale, duration) = moovKids.find(_._1 == "mvhd").map { case (_, o, _) =>
      if (ver(o) == 1) (u32(o + 20), u64(o + 24))
      else (u32(o + 12), u32(o + 16))
    }.getOrElse((0L, 0L))
    val vid = moovKids.iterator.filter(_._1 == "trak").map { case (_, to, te) =>
      val kids = children(to, te)
      val (w, h) = kids.find(_._1 == "tkhd").map { case (_, o, _) =>
        val wOff = if (ver(o) == 1) o + 88 else o + 76
        // truncated reads come back -1 → negative width → the _._1 > 0
        // video-track probe below rejects the track, degrading cleanly
        ((u32(wOff) >> 16).toInt, (u32(wOff + 4) >> 16).toInt)
      }.getOrElse((0, 0))
      val samples = (for {
        (id1, o1, e1) <- kids if id1 == "mdia"
        (id2, o2, e2) <- children(o1, e1) if id2 == "minf"
        (id3, o3, e3) <- children(o2, e2) if id3 == "stbl"
        (id4, o4, _) <- children(o3, e3) if id4 == "stsz"
      } yield u32(o4 + 8).toInt).headOption.getOrElse(0)
      (w, h, samples)
    }.find(_._1 > 0)
    vid.collect { case (w, h, n) if timescale > 0 =>
      Mp4Meta(duration.toDouble / timescale, w, h, n)
    }
  }

  /** Walk a RIFF-AVI chunk tree and return the video frame payloads
    * (`##dc` compressed / `##db` uncompressed chunks inside `movi` LISTs),
    * in file order. Empty for non-AVI or structurally broken bytes. */
  private[operators] def aviVideoFrames(bytes: Array[Byte]): Seq[Array[Byte]] = {
    def fourcc(off: Int): String =
      if (off + 4 > bytes.length) ""
      else new String(bytes, off, 4, java.nio.charset.StandardCharsets.US_ASCII)
    def u32(off: Int): Long =
      if (off + 4 > bytes.length) -1L
      else (bytes(off) & 0xffL) | ((bytes(off + 1) & 0xffL) << 8) |
        ((bytes(off + 2) & 0xffL) << 16) | ((bytes(off + 3) & 0xffL) << 24)
    if (bytes.length < 12 || fourcc(0) != "RIFF" || fourcc(8) != "AVI ") return Nil
    val out = Seq.newBuilder[Array[Byte]]
    def isFrame(id: String): Boolean =
      id.length == 4 && id(0).isDigit && id(1).isDigit &&
        (id.substring(2) == "dc" || id.substring(2) == "db")
    // iterative chunk walk with an explicit stack — a hostile file cannot
    // recurse the JVM stack away
    val stack = scala.collection.mutable.Stack((12, bytes.length))
    while (stack.nonEmpty) {
      var (pos, end) = stack.pop()
      var steps = 0
      while (pos + 8 <= end && steps < 1000000) {
        steps += 1
        val id = fourcc(pos)
        val size = u32(pos + 4)
        if (size < 0 || pos + 8 + size > bytes.length) { pos = end } // truncated
        else {
          val dataOff = pos + 8
          if (id == "LIST" || id == "RIFF") {
            stack.push((dataOff + 4, dataOff + size.toInt)) // skip list-type fourcc
          } else if (isFrame(id) && size > 0) {
            out += java.util.Arrays.copyOfRange(bytes, dataOff, dataOff + size.toInt)
          }
          pos = dataOff + size.toInt + (size.toInt & 1) // chunks are word-aligned
        }
      }
    }
    out.result()
  }

  /** Real ImageIO decode; None when no installed reader accepts the bytes. */
  /** L12b: average-hash (aHash) perceptual fingerprints — the image-dedup
    * primitive: decode, box-average the luminance into an 8×8 grid, set
    * bit `i` iff cell `i`'s mean exceeds the global mean. The threshold
    * comparison is EXACT integer cross-multiplication
    * (`cellSum·nTotal > totalSum·cellCnt` — no float division), so the
    * hash is bit-deterministic for a fixed decoded raster, and the box
    * means make it invariant under resampling and lossless re-encoding
    * (PNG ↔ BMP of the same content hash identically — spec-proved).
    * Non-image mimes and undecodable bytes take the checksum-derived
    * fallback (`decoded = false`) so the pipeline stays total — the same
    * degradation contract as [[featureExtract]]. Shuffle-free narrow
    * transformation; at 100 TB the hash pass is the scan itself. */
  def perceptualHash(assets: Dataset[MediaRow]): Dataset[MediaHash] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.mapPartitions { rows =>
      rows.map { r =>
        val h = if (r.mime.startsWith("image/")) aHashImage(r) else None
        h.map(MediaHash(r.asset_id, _, decoded = true))
          .getOrElse(MediaHash(r.asset_id,
            java.lang.Long.parseLong(r.checksum.take(15), 16),
            decoded = false))
      }
    }
  }

  private def aHashImage(r: MediaRow): Option[Long] = {
    import javax.imageio.ImageIO
    val in = ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(r.content))
    try {
      val readers = ImageIO.getImageReaders(in)
      if (!readers.hasNext) return None
      val reader = readers.next()
      try {
        reader.setInput(in, false, true)
        val img = reader.read(0)
        val (w, h) = (img.getWidth, img.getHeight)
        // < 8 px has no 8×8 grid; > 16 MP would overflow the exact
        // integer threshold products below (765·16e6·16e6 < 2^63)
        if (w < 8 || h < 8 || w.toLong * h > 16000000L) return None
        val sums = new Array[Long](64)
        val cnts = new Array[Long](64)
        var y = 0
        while (y < h) {
          val cy = y * 8 / h
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            val lum = ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
            val c = cy * 8 + x * 8 / w
            sums(c) += lum
            cnts(c) += 1
            x += 1
          }
          y += 1
        }
        val total = sums.sum
        val n = cnts.sum
        var bits = 0L
        var i = 0
        while (i < 64) {
          if (sums(i) * n > total * cnts(i)) bits |= (1L << i)
          i += 1
        }
        Some(bits)
      } catch {
        case _: java.io.IOException => None // truncated/corrupt stream
      } finally reader.dispose()
    } finally in.close()
  }

  /** Near-duplicate image pairs with hamming distance ≤ `maxHamming` over
    * the aHash, via the same pigeonhole banding as
    * [[Dedup.nearDupSimhash]] (64 bits → `maxHamming+1` disjoint bands;
    * any pair inside the budget matches exactly on ≥ 1 band — exact
    * recall) and the same bucket-group + in-list pair expansion (never a
    * self-join that re-runs the decode per side). */
  def phashPairs(hashes: Dataset[MediaHash], maxHamming: Int = 3): DataFrame = {
    val nBands = maxHamming + 1
    require(64 % nBands == 0, s"band count $nBands must divide 64")
    val width = 64 / nBands
    val mask = if (width == 64) -1L else (1L << width) - 1
    val bandStructs = array((0 until nBands).map { b =>
      struct(lit(b).as("band"),
        shiftrightunsigned(col("phash"), b * width).bitwiseAND(lit(mask)).as("bv"))
    }: _*)
    hashes.toDF()
      .select(col("asset_id"), col("phash"), explode(bandStructs).as("b"))
      .select(col("asset_id"), col("phash"),
        col("b.band").as("band"), col("b.bv").as("bv"))
      .groupBy(col("band"), col("bv"))
      .agg(array_sort(collect_list(struct(col("asset_id"), col("phash")))).as("ds"))
      .filter(size(col("ds")) >= 2)
      .select(explode(flatten(transform(col("ds"), (x, i) =>
        transform(slice(col("ds"), i + 2, size(col("ds"))),
          y => struct(x.as("a"), y.as("b")))))).as("p"))
      .select(col("p.a.asset_id").as("i"), col("p.b.asset_id").as("j"),
        bit_count(col("p.a.phash").bitwiseXOR(col("p.b.phash"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  private def decodeImage(r: MediaRow, dim: Int): Option[MediaFeatures] = {
    import javax.imageio.ImageIO
    val in = ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(r.content))
    try {
      val readers = ImageIO.getImageReaders(in)
      if (!readers.hasNext) return None
      val reader = readers.next()
      try {
        reader.setInput(in, false, true)
        val nFrames = math.max(reader.getNumImages(true), 1)
        val img = reader.read(0)
        val (w, h) = (img.getWidth, img.getHeight)
        // luminance fold over the real raster, row-major — one accumulator
        // per (pixel index mod dim), mirroring the byte fold of the stub
        val acc = new Array[Float](dim)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            val lum = (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) +
              (rgb & 0xff)) / (3.0f * 255.0f)
            acc((y * w + x) % dim) += lum
            x += 1
          }
          y += 1
        }
        Some(MediaFeatures(r.asset_id, w, h, nFrames, acc))
      } catch {
        case _: java.io.IOException => None // truncated/corrupt stream
      } finally reader.dispose()
    } finally in.close()
  }

  /** Real WAV/PCM decode via JDK `javax.sound.sampled` (no external codec —
    * the same move as ImageIO for images); None when the bytes aren't a
    * parseable audio file or the encoding isn't 8/16-bit PCM. Field mapping
    * for audio assets: width = sample rate (Hz), height = channel count,
    * n_frames = PCM frame count, features = per-(sample index mod dim)
    * accumulators of amplitude normalized to [0,1] — the audio twin of the
    * image path's luminance fold. */
  private def decodeAudio(r: MediaRow, dim: Int): Option[MediaFeatures] = {
    import javax.sound.sampled.{AudioFormat, AudioSystem}
    try {
      val in = AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(r.content))
      try {
        val fmt = in.getFormat
        val bits = fmt.getSampleSizeInBits
        val signed = fmt.getEncoding == AudioFormat.Encoding.PCM_SIGNED
        val unsigned = fmt.getEncoding == AudioFormat.Encoding.PCM_UNSIGNED
        if ((bits != 8 && bits != 16) || !(signed || unsigned)) return None
        val bytes = in.readAllBytes()
        val nFrames =
          if (in.getFrameLength >= 0) in.getFrameLength.toInt
          else bytes.length / math.max(fmt.getFrameSize, 1)
        val acc = new Array[Float](dim)
        var i = 0
        var s = 0
        if (bits == 8) {
          while (i < bytes.length) {
            val v = if (signed) bytes(i).toInt else (bytes(i) & 0xff) - 128
            acc(s % dim) += (v / 128f + 1f) / 2f
            i += 1; s += 1
          }
        } else {
          while (i + 1 < bytes.length) {
            val raw =
              if (fmt.isBigEndian) (bytes(i) << 8) | (bytes(i + 1) & 0xff)
              else (bytes(i + 1) << 8) | (bytes(i) & 0xff)
            val v = if (signed) raw.toShort.toInt else (raw & 0xffff) - 32768
            acc(s % dim) += (v / 32768f + 1f) / 2f
            i += 2; s += 1
          }
        }
        Some(MediaFeatures(r.asset_id, fmt.getSampleRate.toInt,
          fmt.getChannels, nFrames, acc))
      } finally in.close()
    } catch {
      case _: javax.sound.sampled.UnsupportedAudioFileException => None
      case _: java.io.IOException => None // truncated/corrupt stream
    }
  }

  /** Checksum-derived fallback, bit-compatible with [[decodeMeta]]. */
  private def stubFeatures(r: MediaRow, dim: Int): MediaFeatures = {
    val acc = new Array[Float](dim)
    var i = 0
    while (i < r.content.length) {
      acc(i % dim) += (r.content(i) & 0xff) / 255.0f
      i += 1
    }
    val h = java.lang.Long.parseLong(r.checksum.take(15), 16)
    MediaFeatures(r.asset_id, (h % 624 + 16).toInt, ((h / 1024) % 464 + 16).toInt,
      (h % 16 + 1).toInt, acc)
  }
}

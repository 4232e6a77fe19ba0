package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, processed in partition-sized
  * batches behind the `Decoder` seam. Image dimensions are decoded FOR
  * REAL via the JDK's `javax.imageio` ([[ImageIoDecoder]] — header-only,
  * PNG/JPEG/GIF/BMP, zero external deps); audio/video and non-image
  * payloads fall back to [[StubDecoder]], a clearly-labeled deterministic
  * fake (those codecs aren't in this environment). Everything Spark-side —
  * schema, batch iteration via mapPartitions on a typed Dataset, partition
  * sizing, feature extraction — is real and tested either way.
  *
  * Scale posture: payloads never pass through a shuffle (features are
  * extracted map-side and the binary column dropped before any wide
  * operation); `binaryFile` reads split per file; feature rows are narrow.
  */
object Multimodal {

  final case class MediaRow(media_id: Long, kind: String, payload: Array[Byte])
  final case class MediaFeatures(media_id: Long, kind: String,
      n_bytes: Long, checksum: Long, width: Int, height: Int)

  /** Decode stub: a real deployment plugs a codec here (javacv, ffmpeg
    * bindings, ...). The fake is deterministic in the payload so tests and
    * oracle comparisons are stable. */
  trait Decoder extends Serializable {
    def decode(kind: String, payload: Array[Byte]): (Int, Int)
  }

  object StubDecoder extends Decoder {
    override def decode(kind: String, payload: Array[Byte]): (Int, Int) = {
      // deterministic fake dimensions derived from content
      val h = payload.foldLeft(17L)((a, b) => a * 31 + (b & 0xff))
      (((h & 0x3ff) + 16).toInt, (((h >>> 10) & 0x3ff) + 16).toInt)
    }
  }

  /** REAL image decode via the JDK's `javax.imageio`: reads only the
    * image header (width/height come from the format metadata — no pixel
    * decode, no buffer allocation proportional to the image), so cost per
    * payload is O(header) regardless of image size. Executor-side safe:
    * ImageIO is headless-clean and the readers are per-call (disposed),
    * never shared across threads. */
  object ImageIoDecoder extends Decoder {
    override def decode(kind: String, payload: Array[Byte]): (Int, Int) = {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        require(readers.hasNext,
          s"no JDK image reader recognizes this payload (kind=$kind)")
        val r = readers.next()
        try {
          r.setInput(iis, true, true)
          (r.getWidth(0), r.getHeight(0))
        } finally r.dispose()
      } finally iis.close()
    }
  }

  /** Batch feature extraction over binary payloads: one pass per
    * partition, no shuffle, payload dropped from the output row. */
  def extractFeatures(media: Dataset[MediaRow],
      decoder: Decoder = StubDecoder): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val (w, h) = decoder.decode(r.kind, r.payload)
        var crc = 0L
        var i = 0
        while (i < r.payload.length) { crc = crc * 1000003L + (r.payload(i) & 0xff); i += 1 }
        MediaFeatures(r.media_id, r.kind, r.payload.length.toLong, crc, w, h)
      }
    }
  }

  final case class ResizedMedia(media_id: Long, kind: String,
      width: Int, height: Int, payload: Array[Byte])
  final case class FrameRow(media_id: Long, frame_idx: Int, payload: Array[Byte])

  /** Resize: decode (stub) -> scale to target box -> re-encode (stub:
    * deterministic truncation/padding of the payload proportional to the
    * area change). Map-side, one pass, payload stays partition-local. */
  def resize(media: Dataset[MediaRow], maxW: Int, maxH: Int,
      decoder: Decoder = StubDecoder): Dataset[ResizedMedia] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val (w, h) = decoder.decode(r.kind, r.payload)
        val scale  = math.min(1.0, math.min(maxW.toDouble / w, maxH.toDouble / h))
        val (nw, nh) = (math.max(1, (w * scale).toInt), math.max(1, (h * scale).toInt))
        // stub re-encode: payload length scales with area ratio
        val nBytes = math.max(1, (r.payload.length * scale * scale).toInt)
        ResizedMedia(r.media_id, r.kind, nw, nh, r.payload.take(nBytes))
      }
    }
  }

  /** Frame sampling: emit `n` evenly-spaced frames per video payload
    * (stub: deterministic payload slices). One row per frame — the long,
    * shuffle-friendly shape for downstream per-frame featurization. */
  def sampleFrames(media: Dataset[MediaRow], n: Int): Dataset[FrameRow] = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      val len = r.payload.length
      if (len == 0) Iterator.empty
      else (0 until n).iterator.map { i =>
        val start = (len.toLong * i / n).toInt
        val end   = (len.toLong * (i + 1) / n).toInt
        FrameRow(r.media_id, i, r.payload.slice(start, math.max(end, start + 1)))
      }
    }
  }

  /** Wrap the documents table as fake media payloads (UTF-8 bytes) — the
    * plumbing demo used by tests and the harness query. */
  def documentsAsMedia(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    graft.Tables(spark, dir, "documents")
      .select(col("doc_id").as("media_id"),
        lit("text").as("kind"),
        encode(col("text"), "UTF-8").as("payload"))
      .as[MediaRow]
  }

  /** Synthesize a REAL PNG per document (dimensions a pure function of
    * doc_id: w = 16 + id%32, h = 16 + id%17; one pixel carries id bits) —
    * encoded map-side with `javax.imageio`, so [[ImageIoDecoder]] is
    * exercised end-to-end against an oracle-expressible dimension formula
    * (q77). Both encode and decode stay partition-local. */
  def documentsAsPngMedia(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    graft.Tables(spark, dir, "documents")
      .select(col("doc_id")).as[Long]
      .mapPartitions { ids =>
        ids.map { id =>
          val w = (16 + id % 32).toInt
          val h = (16 + id % 17).toInt
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          img.setRGB(0, 0, (id & 0xffffffL).toInt)
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", bos)
          MediaRow(id, "image/png", bos.toByteArray)
        }
      }
  }

  /** Pattern-PNG corpus for the perceptual-dedup gate (q198): each doc
    * renders a 9-band horizontal pattern (band boundaries on the SAME
    * `gx*w/9` grid [[dHash64]] averages over, so each hash cell sees a
    * constant and the hash is EXACTLY dimension-invariant) whose band
    * levels walk up/down by the bits of doc_id % 16 — making the dHash
    * signature literally those bits. Two docs are perceptual duplicates
    * iff doc_id % 16 matches, REGARDLESS of their (q77-formula) differing
    * dimensions — which is the point of a perceptual hash, and gives an
    * expected cluster structure that is pure doc_id arithmetic an SQL
    * oracle can state without decoding anything. Encode stays
    * partition-local like [[documentsAsPngMedia]]. */
  def documentsAsPatternPngMedia(spark: SparkSession,
      dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    graft.Tables(spark, dir, "documents")
      .select(col("doc_id")).as[Long]
      .mapPartitions { ids =>
        ids.map { id =>
          val w = (16 + id % 32).toInt
          val h = (16 + id % 17).toInt
          val p = (id % 16).toInt
          // band levels: start mid-gray, step +-8 per band by bit i of p
          // => dHash bit i == bit i of p, for ANY image dimensions
          val v = new Array[Int](9)
          v(0) = 128
          var i = 0
          while (i < 8) {
            v(i + 1) = v(i) + (if (((p >> i) & 1) == 1) 8 else -8)
            i += 1
          }
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var gx = 0
          while (gx < 9) {
            var x = gx * w / 9
            val x1 = (gx + 1) * w / 9
            while (x < x1) {
              var y = 0
              val g = v(gx)
              val rgb = (g << 16) | (g << 8) | g
              while (y < h) {
                img.setRGB(x, y, rgb)
                y += 1
              }
              x += 1
            }
            gx += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", bos)
          MediaRow(id, "image/png", bos.toByteArray)
        }
      }
  }

  /** 64-bit perceptual difference hash (dHash): REAL pixel decode via
    * `ImageIO.read`, area-average downscale to a 9x8 grayscale grid, one
    * sign bit per horizontal neighbor pair. Grayscale is the (r+2g+b)/4
    * luma approximation, so color inputs hash on perceived brightness
    * (for gray payloads — r=g=b — this is exactly the channel value).
    * Pixel-identical images hash identically by construction;
    * near-identical images differ in few bits (Hamming-bucketable like
    * SimHash — q34's machinery applies unchanged to the image domain).
    * Pure JVM arithmetic: deterministic across executors/runs. */
  def dHash64(payload: Array[Byte]): Long = {
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(payload))
    require(img != null, "payload is not a decodable image")
    val (gw, gh) = (9, 8)
    val w = img.getWidth
    val h = img.getHeight
    val cell = Array.ofDim[Double](gh, gw)
    var gy = 0
    while (gy < gh) {
      val y0 = gy * h / gh
      val y1 = math.max((gy + 1) * h / gh, y0 + 1)
      var gx = 0
      while (gx < gw) {
        val x0 = gx * w / gw
        val x1 = math.max((gx + 1) * w / gw, x0 + 1)
        var s = 0L
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) {
            // luma ~ (r + 2g + b) / 4; divide once at the end
            val rgb = img.getRGB(x, y)
            s += (rgb >>> 16 & 0xff) + 2 * (rgb >>> 8 & 0xff) + (rgb & 0xff)
            x += 1
          }
          y += 1
        }
        cell(gy)(gx) = s.toDouble / (4.0 * (y1 - y0) * (x1 - x0))
        gx += 1
      }
      gy += 1
    }
    var bits = 0L
    var i = 0
    gy = 0
    while (gy < gh) {
      var gx = 0
      while (gx < gw - 1) {
        if (cell(gy)(gx) < cell(gy)(gx + 1)) bits |= 1L << i
        i += 1
        gx += 1
      }
      gy += 1
    }
    bits
  }

  /** Fixed-stride frame sampling over opaque binary payloads — the video
    * (or audio-window) decode SHAPE with the codec stubbed (the count-based
    * typed twin is [[sampleFrames]]): frame i is the
    * byte slice [i·stride, i·stride + frameLen) of the payload, tagged
    * with its offset, actual length, and a 64-bit content fingerprint. A
    * real deployment swaps the slice for a codec call inside the same
    * plan; everything Spark-side — schema, per-frame fan-out, the no-
    * shuffle guarantee — is what production runs. Pure Catalyst (sequence
    * + posexplode + binary substring + xxhash64), whole-stage codegen'd,
    * payloads never cross a shuffle. */
  def strideFrames(media: DataFrame, frameLen: Int, stride: Int): DataFrame = {
    require(frameLen > 0 && stride > 0, "frameLen and stride must be positive")
    media
      .select(col("media_id"), col("payload"),
        length(col("payload")).as("n_bytes"))
      .select(col("media_id"), col("payload"), col("n_bytes"),
        posexplode(sequence(lit(0),
          greatest(ceil(col("n_bytes").cast("double") / stride).cast("int") - 1,
            lit(0)))).as(Seq("frame_idx", "off0")))
      .select(col("media_id"), col("frame_idx"),
        (col("frame_idx") * stride).as("offset"),
        least(lit(frameLen), col("n_bytes") - col("frame_idx") * stride)
          .as("frame_len"),
        xxhash64(col("payload").substr(
          (col("frame_idx") * stride + 1).cast("int"), lit(frameLen)))
          .as("frame_hash"))
      .filter(col("frame_len") > 0)
  }
}

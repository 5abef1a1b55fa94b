package graft.functions

/** Pure-JVM media codecs for the multimodal pipeline: 24-bit uncompressed
  * BMP (BITMAPINFOHEADER) and PCM WAV (RIFF) — both fully specified public
  * formats parseable without native libraries. These make the multimodal
  * decode stage REAL work (header parse + pixel/sample region extraction)
  * where opaque codecs (JPEG/PNG/MP3) would need external libraries; the
  * Spark-side plumbing is format-agnostic, so swapping in a JNI codec for
  * those is a local change to [[decode]].
  *
  * All multi-byte integers little-endian, per both formats' specs.
  */
object MediaCodec {

  /** A decoded payload: for BMP, width/height/channels are pixel
    * dimensions and `region` the (padded, bottom-up) pixel array; for WAV,
    * width = sample rate, height = frame count, channels = channel count,
    * `region` the data chunk bytes. */
  final case class Decoded(format: String, width: Int, height: Int,
                           channels: Int, region: Array[Byte])

  private def le16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
      ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
  private def putLe16(b: Array[Byte], o: Int, v: Int): Unit = {
    b(o) = v.toByte; b(o + 1) = (v >> 8).toByte
  }
  private def putLe32(b: Array[Byte], o: Int, v: Int): Unit = {
    b(o) = v.toByte; b(o + 1) = (v >> 8).toByte
    b(o + 2) = (v >> 16).toByte; b(o + 3) = (v >> 24).toByte
  }

  /** Row stride of a 24-bit BMP: 3 bytes/pixel, rows padded to 4 bytes. */
  def bmpRowSize(width: Int): Int = ((3 * width + 3) / 4) * 4

  /** Encode a 24-bit BI_RGB BMP. `pixels` supplies the raw pixel-array
    * bytes (bottom-up rows, already padded); short input is zero-padded,
    * long input truncated — callers use this to wrap arbitrary byte
    * streams as REAL image files. */
  def encodeBmp24(width: Int, height: Int, pixels: Array[Byte]): Array[Byte] = {
    val rowSize = bmpRowSize(width)
    val pixelBytes = rowSize * height
    val out = new Array[Byte](54 + pixelBytes)
    out(0) = 'B'; out(1) = 'M'
    putLe32(out, 2, out.length)   // file size
    putLe32(out, 10, 54)          // pixel-array offset
    putLe32(out, 14, 40)          // BITMAPINFOHEADER size
    putLe32(out, 18, width)
    putLe32(out, 22, height)
    putLe16(out, 26, 1)           // planes
    putLe16(out, 28, 24)          // bits per pixel
    putLe32(out, 30, 0)           // BI_RGB (uncompressed)
    putLe32(out, 34, pixelBytes)
    putLe32(out, 38, 2835); putLe32(out, 42, 2835) // 72 dpi
    System.arraycopy(pixels, 0, out, 54, math.min(pixels.length, pixelBytes))
    out
  }

  /** Encode a PCM WAV (RIFF/fmt/data). `samples` are raw little-endian
    * sample bytes. */
  def encodeWav(sampleRate: Int, channels: Int, bitsPerSample: Int,
                samples: Array[Byte]): Array[Byte] = {
    val blockAlign = channels * bitsPerSample / 8
    val out = new Array[Byte](44 + samples.length)
    out(0) = 'R'; out(1) = 'I'; out(2) = 'F'; out(3) = 'F'
    putLe32(out, 4, 36 + samples.length)
    out(8) = 'W'; out(9) = 'A'; out(10) = 'V'; out(11) = 'E'
    out(12) = 'f'; out(13) = 'm'; out(14) = 't'; out(15) = ' '
    putLe32(out, 16, 16)          // PCM fmt chunk size
    putLe16(out, 20, 1)           // audio format = PCM
    putLe16(out, 22, channels)
    putLe32(out, 24, sampleRate)
    putLe32(out, 28, sampleRate * blockAlign) // byte rate
    putLe16(out, 32, blockAlign)
    putLe16(out, 34, bitsPerSample)
    out(36) = 'd'; out(37) = 'a'; out(38) = 't'; out(39) = 'a'
    putLe32(out, 40, samples.length)
    System.arraycopy(samples, 0, out, 44, samples.length)
    out
  }

  private def decodeBmp(b: Array[Byte]): Option[Decoded] = {
    if (b.length < 54) return None
    val pixelOffset = le32(b, 10)
    val width = le32(b, 18)
    val height = le32(b, 22) // negative = top-down; report magnitude
    val bpp = le16(b, 28)
    val compression = le32(b, 30)
    // bpp restricted to real whole-byte formats (8/16/24/32): rejects the
    // bpp=0 "valid" decode and, with ALL-LONG size arithmetic below,
    // closes the Int-overflow hole where a crafted width made rowSize
    // negative and copyOfRange throw — corrupt payloads must return None,
    // never crash the batch
    if (width <= 0 || height == 0 || compression != 0 ||
      bpp < 8 || bpp > 32 || bpp % 8 != 0) return None
    val rows = math.abs(height.toLong)
    val rowSize = ((bpp.toLong / 8L * width.toLong + 3L) / 4L) * 4L
    val end = pixelOffset.toLong + rowSize * rows
    if (pixelOffset < 54 || end > b.length) return None
    Some(Decoded("bmp", width, rows.toInt, bpp / 8,
      java.util.Arrays.copyOfRange(b, pixelOffset, end.toInt)))
  }

  private def decodeWav(b: Array[Byte]): Option[Decoded] = {
    if (b.length < 44) return None
    // chunk walk: fmt and data may appear in any order with extra chunks
    var channels = 0; var sampleRate = 0; var blockAlign = 0
    var data: Array[Byte] = null
    // LONG offsets: a crafted chunk size near 2^31 must fail the bounds
    // check, not wrap negative past it and crash the batch
    var o = 12L
    while (o + 8 <= b.length) {
      val oi = o.toInt
      val id = new String(b, oi, 4, java.nio.charset.StandardCharsets.US_ASCII)
      val size = le32(b, oi + 4).toLong & 0xFFFFFFFFL // u32 per RIFF spec
      if (o + 8 + size > b.length) return None
      id match {
        case "fmt " if size >= 16 =>
          channels = le16(b, oi + 8 + 2)
          sampleRate = le32(b, oi + 8 + 4)
          blockAlign = le16(b, oi + 8 + 12)
        case "data" =>
          data = java.util.Arrays.copyOfRange(b, oi + 8, (o + 8 + size).toInt)
        case _ => ()
      }
      o += 8 + size + (size & 1) // chunks are word-aligned
    }
    if (channels <= 0 || blockAlign <= 0 || data == null) None
    else Some(Decoded("wav", sampleRate, data.length / blockAlign, channels, data))
  }

  /** Sniff + parse. None for unrecognized/corrupt payloads — pipelines
    * SKIP those rows (same policy as the corrupt-feed skip in the GTFS-RT
    * ingest), they must never fail the batch. */
  def decode(b: Array[Byte]): Option[Decoded] = {
    if (b.length >= 2 && b(0) == 'B' && b(1) == 'M') decodeBmp(b)
    else if (b.length >= 12 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' &&
      b(3) == 'F' && b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E')
      decodeWav(b)
    else None
  }

  /** Box-filter downsample of a decoded pixel region ("resize"): the
    * image partitions into `f`×`f` pixel blocks per channel (edge blocks
    * truncated at the image bounds) and each output cell is the INTEGER
    * sum of its block's byte values — the exact-arithmetic form of mean
    * pooling (divide by the block's pixel count to get means; sums keep
    * the result integer for cross-engine verification). Output index
    * (br·outW + bc)·channels + ch, rows in storage order, stride padded
    * to 4 bytes per the BMP spec. */
  def resizeBlockSums(region: Array[Byte], width: Int, height: Int,
                      channels: Int, f: Int): Array[Long] = {
    val rowSize = ((channels * width + 3) / 4) * 4
    val outW = (width + f - 1) / f
    val outH = (height + f - 1) / f
    val out = new Array[Long](outH * outW * channels)
    var br = 0
    while (br < outH) {
      var bc = 0
      while (bc < outW) {
        var ch = 0
        while (ch < channels) {
          var s = 0L
          var dr = 0
          while (dr < f) {
            val r = br * f + dr
            if (r < height) {
              var dc = 0
              while (dc < f) {
                val c = bc * f + dc
                if (c < width) {
                  val idx = r * rowSize + c * channels + ch
                  if (idx < region.length) s += region(idx) & 0xff
                }
                dc += 1
              }
            }
            dr += 1
          }
          out((br * outW + bc) * channels + ch) = s
          ch += 1
        }
        bc += 1
      }
      br += 1
    }
    out
  }

  /** Frame sampling over a decoded 16-bit mono PCM region: every `hop`-th
    * sample position starts a `win`-sample analysis frame (truncated at
    * the stream end), and each frame reports the INTEGER sum of absolute
    * sample values — the exact-arithmetic energy profile a pipeline
    * thumbnails audio with. */
  def frameEnergies(region: Array[Byte], win: Int = 64,
                    hop: Int = 256): Array[Long] = {
    val nSamples = region.length / 2
    val nFrames = if (nSamples == 0) 0 else (nSamples + hop - 1) / hop
    val out = new Array[Long](nFrames)
    var fi = 0
    while (fi < nFrames) {
      var s = 0L
      var j = 0
      while (j < win && fi * hop + j < nSamples) {
        val p = 2 * (fi * hop + j)
        val v = (region(p) & 0xff) | ((region(p + 1) & 0xff) << 8)
        val signed = if (v >= 32768) v - 65536 else v
        s += math.abs(signed)
        j += 1
      }
      out(fi) = s
      fi += 1
    }
    out
  }

  /** `n` mean-normalized chunk averages over a decoded region — the pooled
    * "patch feature" stage (byte-level; for 16-bit audio this is a coarse
    * amplitude profile, for pixel data per-patch brightness). */
  def patchMeans(region: Array[Byte], n: Int = 16): Array[Float] = {
    val out = new Array[Float](n)
    if (region.isEmpty) return out
    val chunk = math.max(1, region.length / n)
    var i = 0
    while (i < n) {
      var sum = 0L; var c = 0
      var j = i * chunk
      val end = math.min(region.length, (i + 1) * chunk)
      while (j < end) { sum += region(j) & 0xff; c += 1; j += 1 }
      out(i) = if (c == 0) 0f else sum.toFloat / (c * 255f)
      i += 1
    }
    out
  }
}

package graft.functions

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.stream.MemoryCacheImageOutputStream
import javax.imageio.{IIOImage, ImageIO, ImageWriteParam}

/** Deterministic image synthesis + real encode/decode/phash/PSNR using only
  * the JDK's ImageIO (PNG lossless, JPEG lossy) — no external image libs.
  *
  * This realizes FIXTURES.md §B1: procedural gradient+noise images whose
  * decoded pixels satisfy the input_hint invariant (PSNR ≥ 40 dB for jpeg,
  * exact for png), and a 64-bit DCT-sign perceptual hash for near-dup
  * dedupe. The reference crawler has no image handling (graft requirement,
  * SURVEY.md preamble); generation is seeded so fetches are bit-reproducible.
  */
object Images {

  // ImageIO defaults to a DISK-backed stream cache: every decode/encode
  // creates and deletes a temp file, which serializes on the filesystem and
  // destroys multi-core scaling. Keep streams in memory.
  ImageIO.setUseCache(false)

  /** Deterministic grayscale pixel field: smooth 2-D gradient + low-amplitude
    * seeded noise. Smoothness keeps JPEG PSNR comfortably above 40 dB while
    * the noise makes each image unique (phash-distinguishable).
    */
  def synthPixels(seed: Long, w: Int, h: Int): Array[Int] = {
    val px = new Array[Int](w * h)
    val s1 = Hashing.splitmix64(seed)
    val s2 = Hashing.splitmix64(s1)
    // per-image gradient direction / phase from the seed
    val ax = 1 + (Hashing.pmod(s1, 5L)).toInt
    val ay = 1 + (Hashing.pmod(s2, 5L)).toInt
    val phase = Hashing.pmod(s1 >>> 8, 256L).toInt
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val base = (phase + (x * ax * 160) / w + (y * ay * 160) / h) % 256
        // +-4 gray-level noise, deterministic per (seed,x,y)
        val n = Hashing.pmod(Hashing.splitmix64(seed ^ (x.toLong << 32) ^ y.toLong), 9L).toInt - 4
        val v = math.max(0, math.min(255, base + n))
        px(y * w + x) = v
        x += 1
      }
      y += 1
    }
    px
  }

  private def toImage(px: Array[Int], w: Int, h: Int): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var i = 0
    while (i < px.length) { raster.setSample(i % w, i / w, 0, px(i)); i += 1 }
    img
  }

  // The ImageIO service-registry lookup inside ImageIO.read/write is
  // synchronized — at 32 decode threads it burns more CPU in contention than
  // in actual decoding. Cache one reader/writer instance per thread
  // (ImageReader.setInput resets state, so reuse is supported).
  private val pngReaderTL = ThreadLocal.withInitial[javax.imageio.ImageReader] { () =>
    ImageIO.getImageReadersByFormatName("png").next()
  }
  private val jpegReaderTL = ThreadLocal.withInitial[javax.imageio.ImageReader] { () =>
    ImageIO.getImageReadersByFormatName("jpeg").next()
  }
  private val pngWriterTL = ThreadLocal.withInitial[javax.imageio.ImageWriter] { () =>
    ImageIO.getImageWritersByFormatName("png").next()
  }
  private val jpegWriterTL = ThreadLocal.withInitial[javax.imageio.ImageWriter] { () =>
    ImageIO.getImageWritersByFormatName("jpeg").next()
  }

  private def writeWith(writer: javax.imageio.ImageWriter, img: BufferedImage,
                        param: ImageWriteParam): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val ios = new MemoryCacheImageOutputStream(out)
    writer.setOutput(ios)
    try writer.write(null, new IIOImage(img, null, null), param)
    finally { writer.setOutput(null); ios.close() }
    out.toByteArray
  }

  def encodePng(px: Array[Int], w: Int, h: Int): Array[Byte] =
    writeWith(pngWriterTL.get(), toImage(px, w, h), null)

  def encodeJpeg(px: Array[Int], w: Int, h: Int, quality: Float = 0.95f): Array[Byte] = {
    val writer = jpegWriterTL.get()
    val param = writer.getDefaultWriteParam
    param.setCompressionMode(ImageWriteParam.MODE_EXPLICIT)
    param.setCompressionQuality(quality)
    writeWith(writer, toImage(px, w, h), param)
  }

  /** Allocation-light ImageInputStream directly over a byte array — the
    * stock MemoryCacheImageInputStream allocates cache segments per decode,
    * which at ~600k decodes/round is pure GC churn (the hi-parallelism
    * level's memory traffic is the round's scaling bottleneck; BENCH.md). */
  private final class ByteArrayImageInputStream(buf: Array[Byte])
    extends javax.imageio.stream.ImageInputStreamImpl {
    override def read(): Int = {
      if (streamPos >= buf.length) return -1
      bitOffset = 0
      val b = buf(streamPos.toInt) & 0xFF
      streamPos += 1
      b
    }
    override def read(b: Array[Byte], off: Int, len: Int): Int = {
      if (streamPos >= buf.length) return -1
      bitOffset = 0
      val n = math.min(len, buf.length - streamPos.toInt)
      System.arraycopy(buf, streamPos.toInt, b, off, n)
      streamPos += n
      n
    }
    override def length(): Long = buf.length.toLong
    override def isCached: Boolean = true
    override def isCachedMemory: Boolean = true
  }

  private def isPngMagic(bytes: Array[Byte]): Boolean =
    bytes.length > 8 && (bytes(0) & 0xFF) == 0x89 && bytes(1) == 0x50

  /** Decode a PNG or JPEG payload back to grayscale pixels. */
  def decode(bytes: Array[Byte]): (Array[Int], Int, Int) = {
    val isPng = isPngMagic(bytes)
    val reader = if (isPng) pngReaderTL.get() else jpegReaderTL.get()
    val iis = new ByteArrayImageInputStream(bytes)
    val img =
      try { reader.setInput(iis, true, true); reader.read(0) }
      finally { reader.setInput(null); iis.close() }
    require(img != null, "undecodable image payload")
    val w = img.getWidth; val h = img.getHeight
    val raster = img.getRaster
    val bands = raster.getNumBands
    val px = new Array[Int](w * h)
    if (bands == 1) {
      // bulk raster read (getSample per pixel is an order of magnitude slower)
      raster.getSamples(0, 0, w, h, 0, px)
    } else {
      val r = raster.getSamples(0, 0, w, h, 0, new Array[Int](w * h))
      val g = raster.getSamples(0, 0, w, h, 1, new Array[Int](w * h))
      val b = raster.getSamples(0, 0, w, h, 2, new Array[Int](w * h))
      var i = 0
      while (i < px.length) {
        px(i) = (r(i) * 299 + g(i) * 587 + b(i) * 114 + 500) / 1000
        i += 1
      }
    }
    (px, w, h)
  }

  /** Peak signal-to-noise ratio in dB between two equal-size pixel fields.
    * Infinity for identical images. Input-hint invariant: >= 40 dB for jpeg.
    */
  def psnr(a: Array[Int], b: Array[Int]): Double = {
    require(a.length == b.length, "psnr: size mismatch")
    var se = 0.0
    var i = 0
    while (i < a.length) { val d = (a(i) - b(i)).toDouble; se += d * d; i += 1 }
    if (se == 0.0) Double.PositiveInfinity
    else 10.0 * math.log10(255.0 * 255.0 * a.length / se)
  }

  /** Reusable per-thread decode state: a destination image handed to the
    * reader via ImageReadParam.setDestination plus a sample buffer. Kills
    * the per-row BufferedImage + int[] allocations of the verify hot loop
    * (~5 KB/row x 600k rows/round of young-gen churn; the 8-core level's
    * GC and memory traffic are the scaling bottleneck — VERDICT r3 #1). */
  private final class DecodeBuf {
    var img: BufferedImage = _
    var px: Array[Int] = _
    def ensure(w: Int, h: Int): Unit =
      if (img == null || img.getWidth != w || img.getHeight != h) {
        img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
        px = new Array[Int](w * h)
      }
  }
  private val decodeBufTL = ThreadLocal.withInitial[DecodeBuf](() => new DecodeBuf)

  /** Decode `bytes` and verify it against the deterministic synthetic ground
    * truth for `mixedSeed` at dims (w, h) — the input-hint per-row invariant
    * (exact pixels for png, PSNR >= 40 dB for jpeg), evaluated STREAMING:
    * the expected pixel is recomputed per (x, y) in registers instead of
    * being materialized (or cached) as an Array[Int], and the decode reuses
    * a per-thread destination image. Zero steady-state allocation and zero
    * shared-cache traffic — the previous per-executor ground-truth memo was
    * both a bandwidth hog (4 KB reads across cores per row) and an unbounded
    * -bytes hazard (ADVICE r3). Bit-identical to the materialized
    * formulation: same per-pixel arithmetic, same y-major/x-minor IEEE
    * accumulation order for the PSNR fold (pinned by ImagesSpec).
    */
  def verifySynth(bytes: Array[Byte], mixedSeed: Long, w: Int, h: Int,
                  exact: Boolean): Boolean = {
    val isPng = isPngMagic(bytes)
    val reader = if (isPng) pngReaderTL.get() else jpegReaderTL.get()
    val iis = new ByteArrayImageInputStream(bytes)
    val buf = decodeBufTL.get()
    val img =
      try {
        reader.setInput(iis, true, true)
        if (reader.getWidth(0) != w || reader.getHeight(0) != h) return false
        buf.ensure(w, h)
        val param = reader.getDefaultReadParam
        param.setDestination(buf.img)
        try reader.read(0, param)
        catch {
          // a payload the gray destination can't take (e.g. an RGB image at
          // web scale) falls back to the allocating path — same verdict,
          // just slower for that row
          case _: Exception =>
            val (px, dw, dh) = decode(bytes)
            if (dw != w || dh != h) return false
            return verifyPixelsAgainstSynth(px, mixedSeed, w, h, exact)
        }
      } finally { reader.setInput(null); iis.close() }
    if (img.getWidth != w || img.getHeight != h) return false
    val raster = img.getRaster
    if (raster.getNumBands != 1) {
      val (px, dw, dh) = decode(bytes)
      if (dw != w || dh != h) return false
      return verifyPixelsAgainstSynth(px, mixedSeed, w, h, exact)
    }
    raster.getSamples(0, 0, w, h, 0, buf.px)
    verifyPixelsAgainstSynth(buf.px, mixedSeed, w, h, exact)
  }

  /** Streaming ground-truth compare: expected pixels recomputed on the fly
    * with synthPixels' exact per-pixel arithmetic and loop order; `exact`
    * demands bit equality (png), otherwise PSNR >= 40 dB with the same
    * y-major squared-error fold as [[psnr]]. */
  def verifyPixelsAgainstSynth(px: Array[Int], seed: Long, w: Int, h: Int,
                               exact: Boolean): Boolean = {
    if (px.length < w * h) return false
    val s1 = Hashing.splitmix64(seed)
    val s2 = Hashing.splitmix64(s1)
    val ax = 1 + Hashing.pmod(s1, 5L).toInt
    val ay = 1 + Hashing.pmod(s2, 5L).toInt
    val phase = Hashing.pmod(s1 >>> 8, 256L).toInt
    var se = 0.0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val base = (phase + (x * ax * 160) / w + (y * ay * 160) / h) % 256
        val n = Hashing.pmod(Hashing.splitmix64(seed ^ (x.toLong << 32) ^ y.toLong), 9L).toInt - 4
        val v = math.max(0, math.min(255, base + n))
        val d = (px(y * w + x) - v).toDouble
        if (exact && d != 0.0) return false
        se += d * d
        x += 1
      }
      y += 1
    }
    if (exact) true
    else if (se == 0.0) true
    else 10.0 * math.log10(255.0 * 255.0 * (w * h).toDouble / se) >= 40.0
  }

  /** 64-bit perceptual hash: resample to 32x32, 8x8 DCT low-frequency block,
    * sign-vs-median bits (classic pHash construction, public algorithm).
    */
  def phash64(px: Array[Int], w: Int, h: Int): Long = {
    val N = 32
    // area-average resample to 32x32
    val small = new Array[Double](N * N)
    var sy = 0
    while (sy < N) {
      var sx = 0
      while (sx < N) {
        val x0 = sx * w / N; val x1 = math.max(x0 + 1, (sx + 1) * w / N)
        val y0 = sy * h / N; val y1 = math.max(y0 + 1, (sy + 1) * h / N)
        var s = 0.0; var c = 0
        var y = y0
        while (y < y1) { var x = x0; while (x < x1) { s += px(y * w + x); c += 1; x += 1 }; y += 1 }
        small(sy * N + sx) = s / c
        sx += 1
      }
      sy += 1
    }
    // 8x8 top-left 2-D DCT-II coefficients
    val coeffs = new Array[Double](64)
    var u = 0
    while (u < 8) {
      var v = 0
      while (v < 8) {
        var s = 0.0
        var y = 0
        while (y < N) {
          var x = 0
          while (x < N) {
            s += small(y * N + x) *
              math.cos((2 * x + 1) * u * math.Pi / (2 * N)) *
              math.cos((2 * y + 1) * v * math.Pi / (2 * N))
            x += 1
          }
          y += 1
        }
        coeffs(v * 8 + u) = s
        v += 1
      }
      u += 1
    }
    // median of AC coefficients (skip DC at 0)
    val ac = coeffs.drop(1).sorted
    val median = (ac(30) + ac(31)) / 2.0
    var bits = 0L
    var i = 1
    while (i < 64) { if (coeffs(i) > median) bits |= (1L << (i - 1)); i += 1 }
    bits
  }

  def hamming64(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
}

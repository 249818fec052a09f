package graft

import graft.functions.Images
import org.scalatest.funsuite.AnyFunSuite

/** Input-hint invariants: PNG roundtrip exact; JPEG decode PSNR >= 40 dB;
  * phash catches re-encoded duplicates and separates distinct images. */
class ImagesSpec extends AnyFunSuite {

  test("png roundtrip is pixel-exact") {
    val px = Images.synthPixels(42L, 64, 48)
    val (back, w, h) = Images.decode(Images.encodePng(px, 64, 48))
    assert((w, h) == (64, 48))
    assert(back.sameElements(px))
    assert(Images.psnr(px, back).isPosInfinity)
  }

  test("jpeg decode meets PSNR >= 40 dB") {
    (0 until 5).foreach { i =>
      val px = Images.synthPixels(1000L + i, 128, 128)
      val (back, _, _) = Images.decode(Images.encodeJpeg(px, 128, 128))
      val p = Images.psnr(px, back)
      assert(p >= 40.0, s"seed $i psnr $p")
    }
  }

  test("phash: re-encoded duplicate is near, distinct images are far") {
    val a = Images.synthPixels(5L, 64, 64)
    val b = Images.synthPixels(6L, 64, 64)
    val ha = Images.phash64(a, 64, 64)
    val hb = Images.phash64(b, 64, 64)
    val (aJpeg, _, _) = Images.decode(Images.encodeJpeg(a, 64, 64))
    val haJ = Images.phash64(aJpeg, 64, 64)
    assert(Images.hamming64(ha, haJ) <= 4, "jpeg re-encode should stay phash-near")
    assert(Images.hamming64(ha, hb) > 10, "distinct images should be phash-far")
  }

  test("streaming verifySynth is bit-identical to the materialized verify") {
    // the hot-path verifier (reused decode buffers + per-pixel expected
    // recompute) must agree with the reference formulation (full decode +
    // synthPixels array + psnr/sameElements) on every row — run both over
    // many seeds/dims/formats, interleaved on one thread so buffer reuse
    // across differing dims is exercised
    val cases = for {
      seed <- 0L until 40L
      (w, h) <- Seq((32, 32), (16, 24), (48, 32))
    } yield (seed * 7919L, w, h)
    cases.foreach { case (seed, w, h) =>
      val px = Images.synthPixels(seed, w, h)
      val png = Images.encodePng(px, w, h)
      val jpg = Images.encodeJpeg(px, w, h)
      val (dj, _, _) = Images.decode(jpg)
      val refJpeg = Images.psnr(px, dj) >= 40.0
      assert(Images.verifySynth(png, seed, w, h, exact = true),
        s"png seed=$seed $w x $h")
      assert(Images.verifySynth(jpg, seed, w, h, exact = false) == refJpeg,
        s"jpeg seed=$seed $w x $h")
      // wrong ground truth must fail in both exact and psnr modes
      assert(!Images.verifySynth(png, seed + 1, w, h, exact = true))
      assert(!Images.verifySynth(jpg, seed + 1, w, h, exact = false))
      // dim mismatch must fail without throwing
      assert(!Images.verifySynth(png, seed, w + 1, h, exact = true))
    }
    // streaming PSNR fold order matches Images.psnr bit-for-bit: compare the
    // boundary decision on the exact same decoded pixels
    val px = Images.synthPixels(123L, 32, 32)
    val jpg = Images.encodeJpeg(px, 32, 32, quality = 0.7f)
    val (d, _, _) = Images.decode(jpg)
    assert(Images.verifyPixelsAgainstSynth(d, 123L, 32, 32, exact = false) ==
      (Images.psnr(px, d) >= 40.0))
  }

  test("deterministic synthesis") {
    assert(Images.synthPixels(9L, 32, 32).toSeq == Images.synthPixels(9L, 32, 32).toSeq)
    assert(Images.encodePng(Images.synthPixels(9L, 32, 32), 32, 32).toSeq ==
      Images.encodePng(Images.synthPixels(9L, 32, 32), 32, 32).toSeq)
  }
}

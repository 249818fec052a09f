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

  test("deterministic synthesis") {
    assert(Images.synthPixels(9L, 32, 32).toSeq == Images.synthPixels(9L, 32, 32).toSeq)
    assert(Images.encodePng(Images.synthPixels(9L, 32, 32), 32, 32).toSeq ==
      Images.encodePng(Images.synthPixels(9L, 32, 32), 32, 32).toSeq)
  }
}

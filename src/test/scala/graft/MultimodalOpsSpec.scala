package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.MultimodalOps.{resizeStub, MediaMeta}

/** Pure-function checks for the multimodal stubs (the mm_* keys' values
  * are oracle-graded; these pin the CONTRACTS the oracles mirror). */
class MultimodalOpsSpec extends AnyFunSuite {

  test("resizeStub caps the LONG edge at 256 and preserves aspect ratio") {
    // the earlier width-only cap let portrait inputs keep heights > 256
    val landscape = resizeStub(MediaMeta(1, 10, 500, 100, 1, "png"))
    assert(landscape.out_w == 256 && landscape.out_h == 100 * 256 / 500)
    val portrait = resizeStub(MediaMeta(2, 10, 100, 500, 1, "png"))
    assert(portrait.out_h == 256 && portrait.out_w == 100 * 256 / 500)
    val small = resizeStub(MediaMeta(3, 10, 100, 200, 1, "png"))
    assert(small.out_w == 100 && small.out_h == 200) // under the cap: untouched
    Seq(landscape, portrait, small).foreach { r =>
      assert(math.max(r.out_w, r.out_h) <= 256)
      assert(r.out_bytes == r.out_w.toLong * r.out_h * 3)
    }
  }

  test("phashSketch: median-split popcount, determinism, edit tolerance") {
    import graft.operators.MultimodalOps.{phashSketch, MediaIn, DctT}
    // the quantized DCT basis: row u=0 is the constant 1e4 vector and
    // every other row sums to ~0 (orthogonality survives quantization
    // up to the rounding residue)
    assert(DctT(0).forall(_ == 10000L))
    (1 until 8).foreach(u => assert(math.abs(DctT(u).sum) <= 8, s"u=$u"))
    val payload = ("the quick brown fox jumps over the lazy dog, " * 12).getBytes("UTF-8")
    val a = phashSketch(MediaIn(1L, payload))
    assert(a.ph_bits.length == 64)
    assert(a.n_ones == a.ph_bits.count(_ == '1'))
    // bit i is set iff 2·coef > a31+a32: at most 32 coefficients can sit
    // strictly above the median pair
    assert(a.n_ones <= 32)
    // deterministic across calls and doc ids
    assert(phashSketch(MediaIn(99L, payload.clone())).ph_bits == a.ph_bits)
    // a one-byte edit flips few bits (the perceptual-hash property the
    // banded near-dup join downstream relies on)...
    val edited = payload.clone(); edited(7) = 'X'.toByte
    val b = phashSketch(MediaIn(2L, edited))
    val ham = a.ph_bits.zip(b.ph_bits).count { case (x, y) => x != y }
    assert(ham <= 16, s"hamming $ham after a 1-byte edit")
    // ...while unrelated content lands far away
    val other = phashSketch(MediaIn(3L, ("completely different content with other bytes! " * 11).getBytes("UTF-8")))
    val hamFar = a.ph_bits.zip(other.ph_bits).count { case (x, y) => x != y }
    assert(hamFar > 16, s"hamming $hamFar for unrelated content")
  }
}

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
}

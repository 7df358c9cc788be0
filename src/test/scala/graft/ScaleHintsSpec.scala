package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.ScaleHints

class ScaleHintsSpec extends AnyFunSuite {

  test("defaults scale as √n: 100× the rows is 10× the buckets") {
    val n = 1L << 20
    val a = ScaleHints.forCount(n)
    val b = ScaleHints.forCount(100L * n) // (2^10)²·100 = (2^10·10)², exact
    assert(a.nlist === 1024 && b.nlist === 10240)
    assert(a.pairBlocks === 1024 && b.pairBlocks === 10240)
    assert(a.cellCap === 1024L && b.cellCap === 10240L)
  }

  test("floors keep tiny corpora sane") {
    val h = ScaleHints.forCount(100)
    assert(h.nlist === 16)      // √100 = 10 < floor 16
    assert(h.pairBlocks === 32) // floor 32 keeps small runs parallel
    assert(h.cellCap === 1000L) // quadratic on 1000 rows is trivial
    assert(ScaleHints.forCount(0).nlist === 16)
  }

  test("caps bound driver-side structures at extreme n") {
    val h = ScaleHints.forCount(Long.MaxValue)
    assert(h.nlist === (1 << 18))      // centroid matrix stays driver-safe
    assert(h.pairBlocks === (1 << 16))
    assert(h.cellCap > 1000L)
  }

  test("negative counts are rejected") {
    intercept[IllegalArgumentException](ScaleHints.forCount(-1))
  }
}

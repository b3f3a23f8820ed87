package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.util.Resolution

/** Pins the auto-resolution formula at the two scales the probes
  * measure: the gate corpus (where auto MUST reproduce the former
  * fixed defaults bit-for-bit — correctness hashes depend on it) and
  * the 10× probe corpus (where auto must reproduce the measured
  * mitigations without a hand-passed knob).
  */
class ResolutionSpec extends AnyFunSuite {

  test("at or below the calibration corpus, auto IS the base default") {
    // d09: sf0.001/sf0.01 (500 vectors) and sf0.1 (2000) → 4 planes
    assert(Resolution.autoBits(500, 2000, 4, 24) == 4)
    assert(Resolution.autoBits(2000, 2000, 4, 24) == 4)
    // m07: sf0.01 (500 docs) and sf0.1 (5000) → 17 frames
    assert(Resolution.autoBits(500, 5000, 17, 64) == 17)
    assert(Resolution.autoBits(5000, 5000, 17, 64) == 17)
  }

  test("at the probe's 10x corpus, auto yields the measured mitigations") {
    // +⌈log₂10⌉ = 4 bits: m07 17→21 frames (SCALE.md 26.2 → 7.3 s),
    // d09 4→8 planes (one past the measured 7-plane row)
    assert(Resolution.autoBits(50000, 5000, 17, 64) == 21)
    assert(Resolution.autoBits(20000, 2000, 4, 24) == 8)
  }

  test("growth is ceil-log2 (conservative), monotone, and clamped") {
    // exact powers of two add exactly log2
    assert(Resolution.autoBits(4000, 2000, 4, 24) == 5)
    assert(Resolution.autoBits(16000, 2000, 4, 24) == 7)
    // any fractional growth rounds UP (smaller buckets, never larger)
    assert(Resolution.autoBits(2001, 2000, 4, 24) == 5)
    // monotone non-decreasing over three decades
    val xs = (1 to 60).map(k => Resolution.autoBits(1000L << (k % 20),
      2000, 4, 24))
    assert((1 to 40).forall(i =>
      Resolution.autoBits(2000L * i, 2000, 4, 24) <=
        Resolution.autoBits(2000L * (i + 1), 2000, 4, 24)))
    assert(xs.forall(x => x >= 4 && x <= 24))
    // the hi clamp holds at absurd scale (m07's 64-frame decode cap)
    assert(Resolution.autoBits(Long.MaxValue / 2, 5000, 17, 64) == 64)
  }

  test("the (tables, probes) schedule follows the measured frontier") {
    // at or below the calibration corpus: the classic 8-table
    // un-probed join — every gate corpus lands here, so gate hashes
    // are bit-identical to the former fixed defaults
    assert(Resolution.lshTableProbes(500, 2000) == ((8, 0)))
    assert(Resolution.lshTableProbes(2000, 2000) == ((8, 0)))
    // above it: the measured frontier's cheaper-index configuration —
    // 4 tables + 2 probe flips, 0.943 recall at half the index rows
    // of the un-probed 8-table join (SCALE.md d09_multiprobe_frontier)
    assert(Resolution.lshTableProbes(2001, 2000) == ((4, 2)))
    assert(Resolution.lshTableProbes(2000000, 2000) == ((4, 2)))
  }

  test("Fixed passes through; Int lifts implicitly") {
    assert(Resolution.resolve(Resolution.Fixed(7), sys.error("not forced"),
      2000, 4, 24) == 7)
    val r: Resolution = 21 // implicit Int → Fixed
    assert(Resolution.resolve(r, sys.error("not forced"), 5000, 17, 64) == 21)
    var counted = false
    assert(Resolution.resolve(Resolution.Auto, { counted = true; 20000L },
      2000, 4, 24) == 8)
    assert(counted, "Auto must force the corpus count")
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite

/** Bench outlier self-defense (round-15 lesson: a contended driver
  * pass recorded d15 at 66.7 s against a ~7 s record and burned a
  * judge investigation — the harness now replicates suspicious
  * single-shots on the spot). The predicate is pure and pinned here;
  * the end-to-end flag (a synthetic tiny prior forcing a replication,
  * "replicated" field in both records) is exercised via a filtered
  * Bench run against a faked BENCH_FULL_LATEST.
  */
class BenchSpec extends AnyFunSuite {

  test("isOutlier: fires only past factor × record AND the floor") {
    // 3× the 2 s record with a 1 s floor: 6.0 s is the boundary
    assert(!Bench.isOutlier(5.9, 2.0, 1.0))
    assert(Bench.isOutlier(6.1, 2.0, 1.0))
    // sub-floor noise never replicates, however large the ratio
    assert(!Bench.isOutlier(0.9, 0.1, 1.0))
    assert(Bench.isOutlier(0.9, 0.1, 0.0))
    // failed queries (negative time) and corrupt records never fire
    assert(!Bench.isOutlier(-4.0, 1.0, 0.0))
    assert(!Bench.isOutlier(10.0, -1.0, 0.0))
    assert(!Bench.isOutlier(10.0, 0.0, 0.0))
  }
}

package graft.util

/** Corpus-size-derived resolution for fingerprint/LSH knobs.
  *
  * The scale probes measured the same cliff twice: a FIXED-resolution
  * blocking key (d09's 4 hyperplanes, m07's 16 gradient bits) keeps a
  * constant number of collision classes, so when the corpus grows 10×
  * every class grows 10× and Σ bucket² candidate work grows 100×
  * (SCALE.md: d09 6.6×, m07 23× runtime). Both measured mitigations
  * instantiate one rule — class count 2^bits must grow ∝ n — which
  * this object centralizes so operators size themselves instead of
  * relying on caller discipline:
  *
  *   bits(n) = base + max(0, ⌈log₂(n / n₀)⌉)
  *
  * where n₀ is the corpus size `base` was calibrated at. At or below
  * n₀ the formula returns exactly `base` (an integer comparison, no
  * float boundary), so gate outputs at sf0.01/sf0.1 are bit-identical
  * to the former fixed defaults; at the probe's 10× corpus it returns
  * base+4 — the measured m07 mitigation exactly (17→21 frames ≙ 16→20
  * bits) and one plane past d09's measured 7-plane row (⌈log₂10⌉ = 4;
  * the conservative side of the cliff, since extra planes only shrink
  * buckets).
  *
  * `Auto` (the operators' default) pays one `count()` on the input —
  * at 100 TB a metadata-served count-star, O(files) next to the
  * operator's own scan — then applies the formula. `Fixed` is the
  * explicit override for spec fixtures and probe baselines. An `Int`
  * implicitly lifts to `Fixed`, so existing `nPlanes = 7` call sites
  * read unchanged.
  */
sealed trait Resolution
object Resolution {
  /** Derive the knob from a corpus count at plan-build time. */
  case object Auto extends Resolution

  /** Caller-pinned value (spec fixtures, probe cliff baselines). */
  final case class Fixed(value: Int) extends Resolution

  import scala.language.implicitConversions
  implicit def fromInt(v: Int): Resolution = Fixed(v)

  /** base + max(0, step·⌈log₂(n/n₀)⌉), clamped to [base, hi].
    *
    * `step` is the bits-per-corpus-doubling rate. 1 (the default) is
    * right when every added bit doubles the collision-class count —
    * d09's hyperplane LSH, where each plane IS a key bit. BANDED
    * Hamming blockers (m07's pigeonhole bands) split their bits
    * across `bands` independent blocking keys, so an added bit only
    * reaches one band: classes per band grow 2^(Δbits/bands), and
    * keeping Σ bucket² flat needs step = bands (step 1 leaves m07's
    * per-band classes growing ∝ n^(1/4) — the 10×/100× probe rows).
    * The trade differs from d09's: pigeonhole recall for
    * hamming ≤ maxHam is full at ANY width, but a fixed maxHam over
    * more bits is a TIGHTER near-dup band (measured: 10.4M pairs at
    * 21 frames → 6.2M at 33 for the same 10× corpus) — resolution
    * growth narrows what counts as a near-dup rather than dropping
    * members of a fixed band.
    */
  def autoBits(n: Long, n0: Long, base: Int, hi: Int,
      step: Int = 1): Int =
    if (n <= n0) base
    else math.min(hi, base + step *
      math.ceil(math.log(n.toDouble / n0.toDouble) / math.log(2.0)).toInt)

  /** Resolve a knob against a by-name corpus count (only forced for
    * `Auto`).
    */
  def resolve(r: Resolution, n: => Long, n0: Long, base: Int,
      hi: Int, step: Int = 1): Int = r match {
    case Fixed(v) => v
    case Auto => autoBits(n, n0, base, hi, step)
  }

  /** Sentinel for Int knobs that default to corpus-derived values
    * (the LSH pair join's tables/probes): callers pass a real value
    * to pin a configuration, the sentinel to let the operator size
    * itself from the corpus count.
    */
  val AutoInt: Int = -1

  /** (tables, probeFlips) for the multi-table LSH pair join — the
    * MEASURED recall/index-cost frontier (SCALE.md "Multi-probe vs
    * tables", ScaleProbe d09_multiprobe_frontier), not a formula. At
    * or below the calibration corpus n₀: the classic 8-table
    * un-probed join — the configuration every gate was pinned at, so
    * gate corpora (≤ n₀ by construction) stay bit-identical. Above
    * n₀: 4 tables + 2 margin-ranked probe flips — on the measured
    * frontier that is 0.943 recall vs the 8-table join's 0.757 at
    * HALF the index rows, and at 100 TB the index replica cost (one
    * exploded (tbl, bucket) row per vector per table) is the
    * constraint, so recall is bought with probes (which explode only
    * the probe side of the join), never with index replicas.
    */
  def lshTableProbes(n: Long, n0: Long): (Int, Int) =
    if (n <= n0) (8, 0) else (4, 2)
}

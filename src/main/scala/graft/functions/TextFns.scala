package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Reusable column builders for the text/dedup/similarity operators.
  *
  * Everything here is built from codegen'd built-ins (no UDFs) so the
  * expressions stay inside whole-stage codegen and compute per-row
  * without shuffles — at 100 TB the shingle/minhash/simhash signatures
  * are embarrassingly parallel map work; only the candidate joins
  * shuffle, and those key on short digest strings.
  *
  * Cross-engine determinism: all hashing routes through md5 (identical
  * in Spark and DuckDB); hex digits are decoded with ascii() arithmetic
  * (both engines); integer math only, except the final cosine folds
  * which are sequential in both engines.
  */
object TextFns {

  /** Whitespace tokens of a single-space-separated text column. */
  def tokens(text: Column): Column = split(text, " ")

  /** Distinct n-word shingles. Guards the degenerate short-doc case
    * (Spark's sequence(a,b) runs DESCENDING when a>b, so a doc with
    * fewer than n tokens must short-circuit to an empty array).
    */
  def shingles(toks: Column, n: Int = 3): Column = {
    val grams = transform(
      sequence(lit(1), size(toks) - (n - 1)),
      i => concat_ws(" ", (0 until n).map(o => element_at(toks, i + o)): _*))
    when(size(toks) >= n, array_distinct(grams))
      .otherwise(array().cast("array<string>"))
  }

  /** Affine-rehash minhash parameters: h_i(x) = (a_i·x + b_i) mod M with
    * M = 2^31-1. The base hash is 28 bits (7 hex digits of md5), so
    * a_i·x stays far below 2^63 — no overflow under ANSI mode, and the
    * identical integer arithmetic runs in any SQL engine.
    */
  val MinhashMod: Long = 2147483647L
  def minhashA(i: Int): Long = 2L * i + 3L
  def minhashB(i: Int): Long = 97L * i + 1L

  /** Per-row k-slot minhash signature of a distinct-shingle array —
    * the scalar (map-side, no explode/groupBy) form of the
    * `minhash16_agg` path, for contexts where rows must stay whole
    * (streaming state keys). Same arithmetic: 28-bit base hash from
    * the first 7 md5 hex digits, then the affine rehash family; the
    * two forms produce identical signatures for the same shingle set
    * (pinned in DedupSpec). Routed through the [[MinhashSigExpr]]
    * kernel — the HOF formulation interpreted one lambda per
    * (shingle, slot) and cost ~11 s at sf0.1 on the streaming path;
    * callers must have run [[VectorExprs.register]] on the session
    * (every operator entry point does). Empty shingle arrays yield an
    * EMPTY signature — callers must key short docs some other way.
    */
  def minhashSig(sh: Column, k: Int = 16): Column =
    call_function("minhash_sig", sh, lit(k))

  /** LSH band keys from a minhash signature: bands of r consecutive
    * signature entries digested together. Returns array<string>[bands].
    */
  def bandKeys(sig: Column, bands: Int, r: Int): Column =
    array((0 until bands).map { b =>
      md5(concat_ws("|", (0 until r).map(j =>
        element_at(sig, b * r + j + 1).cast("string")): _*))
    }: _*)

  /** Numeric value (0-15) of a single lowercase hex digit column. */
  def hexVal(d: Column): Column =
    when(ascii(d) >= 97, ascii(d) - 87).otherwise(ascii(d) - 48)

  /** 16-bit hash slice of a precomputed md5 hex digest: 4 hex digits
    * starting at digit offset `off` (0-based). Bit k of the result is
    * `(h >> k) & 1`. Four slices of one digest give a 64-bit token hash
    * with a single md5 evaluation.
    */
  def hexBits16(dig: Column, off: Int): Column =
    (0 until 4).map { d =>
      hexVal(substring(dig, off + d + 1, 1)) * lit(1 << (4 * (3 - d)))
    }.reduce(_ + _)

  /** SimHash value from per-bit set-counts and the token count: bit k is
    * set iff (#tokens with bit k) ≥ half, i.e. 2·b_k - n ≥ 0.
    */
  def simhashFromBitCounts(bitCounts: Seq[Column], n: Column): Column =
    bitCounts.zipWithIndex.map { case (b, k) =>
      when(b * 2 - n >= 0, lit(1 << k)).otherwise(lit(0))
    }.reduce(_ + _)

  /** Cast a float-array column to double elements. */
  def asDoubles(v: Column): Column = transform(v, x => x.cast("double"))

  /** Sequential left-fold dot product of two equal-length double arrays —
    * the same evaluation order DuckDB's list_cosine_similarity uses, so
    * results are bit-identical across engines.
    */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** L2 norm via the same sequential fold. */
  def l2(a: Column): Column = sqrt(aggregate(a, lit(0.0), (acc, x) => acc + x * x))

  /** Cosine similarity of two double-array columns. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2(a) * l2(b))

  /** Codegen'd cosine via the registered array_dot/array_norm kernels
    * ([[VectorExprs.register]] must have run on the session). Takes
    * SQL-resolvable column names (e.g. "a.v") because the kernels are
    * reached through the function registry. Bit-identical to [[cosine]].
    */
  def cosineFast(a: String, b: String): Column =
    expr(s"array_dot($a, $b) / (array_norm($a) * array_norm($b))")

  /** Deterministic md5-derived pseudo-random hyperplane, computed ONCE
    * driver-side: weight_i = hexval(md5("<plane>:<i>")[0]) - 7.5 —
    * byte-identical to the SQL-side definition (java MessageDigest md5
    * == SQL md5), so the oracle recomputes it symbolically while Spark
    * ships the weights as a literal.
    */
  def planeWeights(plane: Int, dim: Int): Array[Double] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    (0 until dim).map { i =>
      val digest = md.digest(s"$plane:$i".getBytes("UTF-8"))
      val firstHexDigit = (digest(0) >> 4) & 0xf
      firstHexDigit.toDouble - 7.5
    }.toArray
  }

  /** LSH bucket id from nPlanes hyperplane signs. Projections run
    * through the codegen array_dot kernel against literal weight arrays
    * ([[VectorExprs.register]] must have run) — the interpreted
    * md5-per-element formulation was ~50× slower. `planeOffset` shifts
    * into a different stretch of the hyperplane family — how a
    * multi-table LSH index gives each table independent planes.
    */
  def lshBucket(v: Column, nPlanes: Int, dim: Int,
      planeOffset: Int = 0): Column =
    (0 until nPlanes).map { j =>
      val dotJ = call_function("array_dot", v,
        typedlit(planeWeights(planeOffset + j, dim)))
      when(dotJ >= 0, lit(1 << j)).otherwise(lit(0))
    }.reduce(_ + _)
}

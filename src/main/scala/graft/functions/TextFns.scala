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

  /** MinHash signature: k lexicographic-min md5 digests over the shingle
    * set, seeded by prefixing the seed index. Returns array<string>[k].
    * min(md5(seed:shingle)) is a valid uniform minhash per seed and is
    * reproducible in any engine with md5 + string min.
    */
  def minhashSignature(sh: Column, k: Int): Column =
    array((0 until k).map { i =>
      array_min(transform(sh, x => md5(concat(lit(s"$i:"), x))))
    }: _*)

  /** LSH band keys from a minhash signature: bands of r consecutive
    * signature entries digested together. Returns array<string>[bands].
    */
  def bandKeys(sig: Column, bands: Int, r: Int): Column =
    array((0 until bands).map { b =>
      md5(concat_ws("|", (0 until r).map(j => element_at(sig, b * r + j + 1)): _*))
    }: _*)

  /** Numeric value (0-15) of a single lowercase hex digit column. */
  def hexVal(d: Column): Column =
    when(ascii(d) >= 97, ascii(d) - 87).otherwise(ascii(d) - 48)

  /** Bit k (0..15) of the first 16 bits of md5(token): k/4-th hex digit,
    * bit (3 - k%4) within it.
    */
  private def md5Bit(tok: Column, k: Int): Column = {
    val digit = substring(md5(tok), k / 4 + 1, 1)
    shiftright(hexVal(digit), 3 - k % 4).bitwiseAND(lit(1))
  }

  /** 16-bit SimHash over the distinct-token set: per bit position, sum
    * +1/-1 contributions across tokens; bit set iff the sum is >= 0.
    */
  def simhash16(toks: Column): Column = {
    val uniq = array_distinct(toks)
    val bitCols = (0 until 16).map { k =>
      val s = aggregate(uniq, lit(0),
        (acc, t) => acc + (md5Bit(t, k) * 2 - lit(1)))
      when(s >= 0, lit(1 << k)).otherwise(lit(0))
    }
    bitCols.reduce(_ + _)
  }

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

  /** Signed projection of an embedding onto a deterministic md5-derived
    * pseudo-random hyperplane: weight_i = hexval(md5("<plane>:<i>")[0]) - 7.5.
    * Used for random-hyperplane LSH bucketing; reproducible anywhere
    * md5 + ascii exist.
    */
  def planeDot(v: Column, plane: Int, dim: Int): Column = {
    val products = transform(sequence(lit(0), lit(dim - 1)), i => {
      val w = hexVal(substring(md5(concat(lit(s"$plane:"), i.cast("string"))), 1, 1))
        .cast("double") - lit(7.5)
      element_at(v, i + 1) * w
    })
    aggregate(products, lit(0.0), (acc, x) => acc + x)
  }

  /** LSH bucket id from nPlanes hyperplane signs. */
  def lshBucket(v: Column, nPlanes: Int, dim: Int): Column =
    (0 until nPlanes).map { j =>
      when(planeDot(v, j, dim) >= 0, lit(1 << j)).otherwise(lit(0))
    }.reduce(_ + _)
}

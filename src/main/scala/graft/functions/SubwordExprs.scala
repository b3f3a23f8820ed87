package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared greedy-longest-match vocabulary for the subword kernels —
  * the scale-real replacement for embedding the vocab as plan literals
  * (an `array_contains(typedlit(...))` when-chain grows the expression
  * tree and the generated code linearly with the vocab; a real 32k-64k
  * BPE vocab would blow both up). Here the vocab lives in ONE
  * length-bucketed hash-set object referenced by the expression — the
  * executor receives it once per stage via the serialized plan (the
  * broadcast-by-closure pattern), lookups are O(1) per position, and
  * the plan/codegen size is constant no matter how many pieces the
  * vocab holds (pinned in PlanShapeSpec).
  *
  * Piece membership is only ever tested for lengths in
  * [minLen, maxLen]; entries outside that band are ignored. Lookups
  * slice the word with code-point substrings, matching the SQL
  * `substring` semantics the oracle replays.
  */
final class SubwordVocab(val pieces: Array[String], val minLen: Int,
    val maxLen: Int) extends Serializable {
  require(minLen >= 1 && maxLen >= minLen, s"bad piece band [$minLen,$maxLen]")

  @transient private lazy val byLen: Array[java.util.HashSet[UTF8String]] = {
    val sets = Array.fill(maxLen + 1)(new java.util.HashSet[UTF8String]())
    pieces.foreach { p =>
      val l = p.codePointCount(0, p.length)
      if (l >= minLen && l <= maxLen) sets(l).add(UTF8String.fromString(p)): Unit
    }
    sets
  }

  /** Greedy match length at 0-based code-point position p: the longest
    * vocab piece starting there, else 1 (single-char fallback).
    */
  def matchLen(w: UTF8String, p: Int, n: Int): Int = {
    var l = maxLen
    while (l >= minLen) {
      if (p + l <= n && byLen(l).contains(w.substring(p, p + l))) return l
      l -= 1
    }
    1
  }

  /** Number of greedy pieces the word splits into ('' → 0). */
  def countPieces(w: UTF8String): Int = {
    val n = w.numChars()
    var p = 0
    var c = 0
    while (p < n) { c += 1; p += matchLen(w, p, n) }
    c
  }

  /** The greedy pieces themselves, in order; they concatenate back to
    * the word exactly (partition property, pinned in TextAnalysisSpec).
    * Each piece is cloned so the output never aliases a reused row
    * buffer (same discipline as [[ShinglesOf]]).
    */
  def splitPieces(w: UTF8String): ArrayData = {
    val n = w.numChars()
    val out = new scala.collection.mutable.ArrayBuffer[AnyRef](math.max(n / 2, 4))
    var p = 0
    while (p < n) {
      val l = matchLen(w, p, n)
      out += w.substring(p, p + l).clone()
      p += l
    }
    new GenericArrayData(out.toArray)
  }

  /** Compact rendering keeps query-plan strings constant-size. */
  override def toString: String = s"vocab[${pieces.length}]"

  /** Content equality so expression dedup/semanticEquals still works. */
  override def hashCode: Int =
    java.util.Arrays.hashCode(pieces.asInstanceOf[Array[AnyRef]]) * 31 +
      minLen * 7 + maxLen
  override def equals(o: Any): Boolean = o match {
    case v: SubwordVocab =>
      minLen == v.minLen && maxLen == v.maxLen &&
        java.util.Arrays.equals(pieces.asInstanceOf[Array[AnyRef]],
          v.pieces.asInstanceOf[Array[AnyRef]])
    case _ => false
  }
}

object SubwordVocab {
  /** Build from the registry calling convention: subword_xxx(word,
    * vocabArray, minLen, maxLen). The vocab literal is evaluated ONCE
    * at function-resolution time and dropped from the expression tree —
    * the resolved plan carries only the compact vocab reference.
    */
  def fromArgs(es: Seq[Expression]): SubwordVocab = {
    val arr = es(1).eval().asInstanceOf[ArrayData]
    val pieces = arr.toObjectArray(StringType).map(_.toString)
    new SubwordVocab(pieces,
      es(2).eval().asInstanceOf[Number].intValue(),
      es(3).eval().asInstanceOf[Number].intValue())
  }
}

/** Greedy-longest-match piece COUNT of a word under the vocab. */
case class SubwordCount(child: Expression, vocab: SubwordVocab)
    extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "subword_count"

  override def nullSafeEval(a: Any): Any =
    vocab.countPieces(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("subwordVocab", vocab,
      classOf[SubwordVocab].getName)
    nullSafeCodeGen(ctx, ev, w => s"${ev.value} = $ref.countPieces($w);")
  }

  override protected def withNewChildInternal(c: Expression): SubwordCount =
    copy(child = c)
}

/** Greedy-longest-match piece LIST of a word under the vocab. */
case class SubwordSplit(child: Expression, vocab: SubwordVocab)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "subword_split"

  override def nullSafeEval(a: Any): Any =
    vocab.splitPieces(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("subwordVocab", vocab,
      classOf[SubwordVocab].getName)
    nullSafeCodeGen(ctx, ev, w => s"${ev.value} = $ref.splitPieces($w);")
  }

  override protected def withNewChildInternal(c: Expression): SubwordSplit =
    copy(child = c)
}

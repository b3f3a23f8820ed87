package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
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

/** Shared k-gram hashing loop: 60-bit md5 prefixes (bit-identical to
  * the SQL `conv(substring(md5(gram), 1, 15), 16, 10)` the oracles
  * replay), one tight pass, position order. Empty for docs shorter
  * than k tokens.
  */
private[functions] object GramHash {
  def hashes(toks: ArrayData, k: Int): Array[Long] = {
    val n = toks.numElements()
    if (n < k) return Array.empty[Long]
    val md = java.security.MessageDigest.getInstance("MD5")
    val ng = n - k + 1
    val hv = new Array[Long](ng)
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i < ng) {
      sb.setLength(0)
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(toks.getUTF8String(i + j).toString)
        j += 1
      }
      val dig = md.digest(
        sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      // first 15 hex digits = bytes 0-6 (56 bits) + byte 7's high nibble
      var h = 0L
      var b = 0
      while (b < 7) { h = (h << 8) | (dig(b) & 0xffL); b += 1 }
      hv(i) = (h << 4) | ((dig(7) >> 4) & 0xfL)
      md.reset()
      i += 1
    }
    hv
  }
}

/** Position-ordered k-gram hashes of a token array — [[WinnowFps]]'s
  * hashing WITHOUT the winnowing selection: index i holds the hash of
  * the gram starting at token i, so a posexplode recovers (position,
  * gram) pairs. Feeds exact-substring dedup, where occurrence
  * positions matter.
  */
case class GramHashes(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {
  require(k >= 1, s"k must be >= 1: $k")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "gram_hashes"

  override def nullSafeEval(a: Any): Any =
    new GenericArrayData(GramHash.hashes(a.asInstanceOf[ArrayData], k))

  override protected def withNewChildInternal(c: Expression): GramHashes =
    copy(child = c)
}

/** Winnowing fingerprints of a token array in one eval pass: hash
  * every k-gram (60-bit md5 prefix — bit-identical to the SQL
  * `conv(substring(md5(gram), 1, 15), 16, 10)` the oracle replays),
  * slide a w-window, collect the distinct window minima in first-
  * occurrence order. Semantically identical to the HOF formulation
  * (transform + array_min(slice)), but a tight loop: the interpreted
  * HOF route allocated a Vector copy per window and re-walked the
  * expression tree per element — measured MINUTES for the sf0.1
  * corpus in one scan task, vs sub-second here. Short-doc
  * conventions preserved: fewer than k tokens → empty; fewer than w
  * grams → the single overall minimum.
  */
case class WinnowFps(child: Expression, k: Int, w: Int)
    extends UnaryExpression with CodegenFallback {
  require(k >= 1 && w >= 1, s"k and w must be >= 1: k=$k w=$w")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_fps"

  override def nullSafeEval(a: Any): Any = {
    val toks = a.asInstanceOf[ArrayData]
    val hv = GramHash.hashes(toks, k)
    val ng = hv.length
    if (ng == 0) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    val last = math.max(ng - w, 0)
    var s = 0
    while (s <= last) {
      var m = hv(s)
      var t = 1
      while (t < w && s + t < ng) {
        if (hv(s + t) < m) m = hv(s + t)
        t += 1
      }
      seen.add(m): Unit
      s += 1
    }
    new GenericArrayData(seen.toArray.asInstanceOf[Array[AnyRef]])
  }

  override protected def withNewChildInternal(c: Expression): WinnowFps =
    copy(child = c)
}

/** Per-row k-slot minhash signature of a distinct-shingle array in one
  * eval pass — the kernel form of [[TextFns.minhashSig]]'s HOF
  * formulation (which interpreted one lambda per (shingle, slot): 16×
  * the shingle count in expression-tree walks; the streaming near-dup
  * path spent ~11 s at sf0.1 in it). Arithmetic is bit-identical: the
  * 28-bit base hash is the first 7 hex digits of md5(shingle), slot i
  * takes the minimum of (h·(2i+3) + 97i+1) mod (2³¹−1). Empty shingle
  * arrays yield an EMPTY signature (callers key short docs some other
  * way — both the HOF's all-null array and this empty array are
  * distinct from every real signature).
  */
case class MinhashSigExpr(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {
  require(k >= 1, s"k must be >= 1: $k")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override def nullSafeEval(a: Any): Any = {
    val sh = a.asInstanceOf[ArrayData]
    val n = sh.numElements()
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val md = java.security.MessageDigest.getInstance("MD5")
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val dig = md.digest(sh.getUTF8String(i).getBytes)
      // first 7 hex digits: bytes 0-2 (24 bits) + byte 3's high nibble
      val h = ((dig(0) & 0xffL) << 20) | ((dig(1) & 0xffL) << 12) |
        ((dig(2) & 0xffL) << 4) | ((dig(3) >> 4) & 0xfL)
      var s = 0
      while (s < k) {
        val v = (h * graft.functions.TextFns.minhashA(s) +
          graft.functions.TextFns.minhashB(s)) % graft.functions.TextFns.MinhashMod
        if (v < mins(s)) mins(s) = v
        s += 1
      }
      md.reset()
      i += 1
    }
    new GenericArrayData(mins.map(_.asInstanceOf[AnyRef]))
  }

  override protected def withNewChildInternal(c: Expression): MinhashSigExpr =
    copy(child = c)
}

/** Ranked BPE merge table for the bpe_split kernel — same
  * broadcast-by-closure shape as [[SubwordVocab]]: the merge list is
  * ONE reference object, plan size independent of merge count, O(1)
  * rank lookups.
  */
final class BpeMerges(val pairs: Array[(String, String)]) extends Serializable {
  @transient private lazy val rank: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer]()
    pairs.zipWithIndex.foreach { case ((a, b), i) =>
      m.put(a + "\u0000" + b, i): Unit
    }
    m
  }

  /** Apply the merges to one word, GPT-2 style: repeatedly merge the
    * adjacent pair with the LOWEST rank (earliest-learned merge wins,
    * occurrences merged left-to-right) until no adjacent pair is in
    * the table. '' → no pieces.
    */
  def split(w: String): Array[String] = {
    if (w.isEmpty) return Array.empty
    var syms = w.map(_.toString).toArray
    var done = false
    while (!done && syms.length > 1) {
      var best = Int.MaxValue
      var i = 0
      while (i < syms.length - 1) {
        val r = rank.get(syms(i) + "\u0000" + syms(i + 1))
        if (r != null && r < best) best = r
        i += 1
      }
      if (best == Int.MaxValue) done = true
      else {
        val (a, b) = pairs(best)
        val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
        var j = 0
        while (j < syms.length) {
          if (j < syms.length - 1 && syms(j) == a && syms(j + 1) == b) {
            out += a + b
            j += 2
          } else {
            out += syms(j)
            j += 1
          }
        }
        syms = out.toArray
      }
    }
    syms
  }

  override def toString: String = s"merges[${pairs.length}]"
  override def hashCode: Int =
    java.util.Arrays.hashCode(pairs.asInstanceOf[Array[AnyRef]])
  override def equals(o: Any): Boolean = o match {
    case m: BpeMerges =>
      java.util.Arrays.equals(pairs.asInstanceOf[Array[AnyRef]],
        m.pairs.asInstanceOf[Array[AnyRef]])
    case _ => false
  }
}

object BpeMerges {
  /** Registry calling convention: bpe_split(word, mergesArray) where
    * each merge is "a<space>b" (symbols never contain spaces — they
    * come from whitespace-split words). Evaluated once at function
    * resolution and dropped from the tree, like [[SubwordVocab]].
    */
  def fromArgs(es: Seq[Expression]): BpeMerges = {
    val arr = es(1).eval().asInstanceOf[ArrayData]
    new BpeMerges(arr.toObjectArray(StringType).map { s =>
      val t = s.toString
      val i = t.indexOf(' ')
      require(i > 0 && i < t.length - 1,
        s"bpe_split merge entry '$t' is not in 'a<space>b' form " +
          "(each merge is the left and right symbol joined by one space)")
      (t.substring(0, i), t.substring(i + 1))
    })
  }
}

/** BPE piece LIST of a word under a ranked merge table. */
case class BpeSplit(child: Expression, merges: BpeMerges)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_split"

  override def nullSafeEval(a: Any): Any =
    new GenericArrayData(merges.split(a.asInstanceOf[UTF8String].toString)
      .map(UTF8String.fromString(_): AnyRef))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeMerges", merges,
      classOf[BpeMerges].getName)
    val cls = classOf[GenericArrayData].getName
    nullSafeCodeGen(ctx, ev, w => {
      val parts = ctx.freshName("parts")
      val arr = ctx.freshName("arr")
      val i = ctx.freshName("i")
      s"""
         |java.lang.String[] $parts = $ref.split($w.toString());
         |Object[] $arr = new Object[$parts.length];
         |for (int $i = 0; $i < $parts.length; $i++) {
         |  $arr[$i] = org.apache.spark.unsafe.types.UTF8String.fromString($parts[$i]);
         |}
         |${ev.value} = new $cls($arr);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): BpeSplit =
    copy(child = c)
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

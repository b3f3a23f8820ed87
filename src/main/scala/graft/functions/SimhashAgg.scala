package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash accumulator over md5 hex digests — one imperative
  * aggregate in place of 64 declarative bit-count sums.
  *
  * Input: a 32-char lowercase hex md5 digest per (doc, token) row.
  * Buffer: 64 bit-counters + the token count. Update decodes the first
  * 16 hex digits once (byte arithmetic on the UTF8String, no substring/
  * ascii expression trees) and bumps the counters; merge is element-wise
  * addition, so the aggregation combines map-side like any partial agg.
  * Eval emits the 4 16-bit band values (band j packs bits [16j,16j+16),
  * bit k set iff 2·count ≥ n — majority with ties up).
  *
  * Bit/band layout is IDENTICAL to the declarative formulation it
  * replaces (hexBits16 slices + simhashFromBitCounts), so the DuckDB
  * oracle is untouched. Measured ~1.8× on d04 end-to-end: the 64-sum
  * shape paid 16 hex-decode expression evaluations and 64 aggregate
  * updates per row.
  */
/** MinHash signature accumulator over md5 hex digests — one imperative
  * aggregate in place of k=16 declarative min-aggregates plus the
  * 7-hex-digit base-hash projection.
  *
  * Input: a 32-char lowercase hex md5 digest per (doc, shingle) row.
  * Update decodes the first 7 hex digits into the 28-bit base hash and
  * folds it through the k affine rehashes (h_i = (a_i·x + b_i) mod M,
  * same [[TextFns.minhashA]]/[[TextFns.minhashB]]/[[TextFns.MinhashMod]]
  * constants the DuckDB oracle derives symbolically); merge is
  * element-wise min, so partial aggregation combines map-side. Eval
  * emits the k-entry signature array — identical values to the
  * declarative formulation it replaces.
  */
case class Minhash16Agg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  private val K = 16

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def prettyName: String = "minhash16_agg"

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(K)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val dig = child.eval(input).asInstanceOf[UTF8String]
    if (dig != null) {
      var hv = 0L
      var d = 0
      while (d < 7) {
        val b = dig.getByte(d)
        hv = (hv << 4) | (if (b >= 'a') b - 'a' + 10 else b - '0')
        d += 1
      }
      var i = 0
      while (i < K) {
        val v = (hv * TextFns.minhashA(i) + TextFns.minhashB(i)) % TextFns.MinhashMod
        if (v < buf(i)) buf(i) = v
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < K) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any =
    new GenericArrayData(buf.map(v => v: Any))

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(K * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(K)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(o: Int): Minhash16Agg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): Minhash16Agg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): Minhash16Agg = copy(child = cs.head)
}

case class Simhash64Agg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Int]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "simhash64_agg"

  // 64 bit-counters + token count
  override def createAggregationBuffer(): Array[Int] = new Array[Int](65)

  override def update(buf: Array[Int], input: InternalRow): Array[Int] = {
    val dig = child.eval(input).asInstanceOf[UTF8String]
    if (dig != null) {
      var j = 0
      while (j < 4) {
        var h = 0
        var d = 0
        while (d < 4) {
          val b = dig.getByte(4 * j + d)
          val hv = if (b >= 'a') b - 'a' + 10 else b - '0'
          h = (h << 4) | hv
          d += 1
        }
        var k = 0
        while (k < 16) {
          buf(16 * j + k) += (h >> k) & 1
          k += 1
        }
        j += 1
      }
      buf(64) += 1
    }
    buf
  }

  override def merge(a: Array[Int], b: Array[Int]): Array[Int] = {
    var i = 0
    while (i < 65) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Int]): Any = {
    val n = buf(64)
    val bands = new Array[Any](4)
    var j = 0
    while (j < 4) {
      var band = 0
      var k = 0
      while (k < 16) {
        if (2 * buf(16 * j + k) - n >= 0) band |= 1 << k
        k += 1
      }
      bands(j) = band
      j += 1
    }
    new GenericArrayData(bands)
  }

  override def serialize(buf: Array[Int]): Array[Byte] = {
    val bb = ByteBuffer.allocate(65 * 4)
    buf.foreach(bb.putInt)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Int] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(65)(bb.getInt())
  }

  override def withNewMutableAggBufferOffset(o: Int): Simhash64Agg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): Simhash64Agg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): Simhash64Agg = copy(child = cs.head)
}

package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Bottom-K-DISTINCT aggregate over long hashes — the KMV sketch's
  * merge algebra (order statistics: union, then keep the K minima) as
  * one Catalyst imperative aggregate.
  *
  * Buffer: the current K smallest distinct values, sorted ascending
  * (≤ K longs — for K=256 a 2 KB cap per group no matter how many
  * rows flow through). Update is a binary-search insert that drops
  * duplicates and evicts the current maximum once full; merge is a
  * capped sorted-merge with dedup. Both are associative and
  * commutative, so the map-side combine on a 1000-executor batch job
  * and the micro-batch fold of a streaming aggregation are the same
  * operation — which is exactly what the streamed-KMV gate (w13)
  * pins: unlike HLL registers (max), CMS cells (sum), and histogram
  * buckets (add), whose state is bounded by the value domain, KMV's
  * state bound comes from the AGGREGATE itself, so a streamed build
  * needs this operator — no combination of built-in folds keeps
  * bottom-K state bounded.
  *
  * Reference for the sketch family: Bar-Yossef et al. RANDOM'02,
  * Beyer et al. SIGMOD'07 (see Sketches.kmvSketches — the batch build
  * this must reproduce hash-for-hash).
  */
case class BottomKAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  require(k > 0, s"bottom_k_agg: k must be positive, got $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "bottom_k_agg"

  override def createAggregationBuffer(): Array[Long] = Array.emptyLongArray

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) buf
    else insert(buf, v.asInstanceOf[Number].longValue())
  }

  private def insert(buf: Array[Long], v: Long): Array[Long] = {
    // full-buffer fast path: one compare instead of a binary search —
    // on a uniform hash stream this is the hot branch for all but
    // O(K·ln n) of n updates, and it is what keeps the batch KMV
    // build's per-row cost O(1) (Sketches.kmvSketches)
    if (buf.length == k && v >= buf(k - 1)) return buf
    val pos = java.util.Arrays.binarySearch(buf, v)
    if (pos >= 0) buf // duplicate
    else {
      val ip = -pos - 1
      if (buf.length < k) {
        val out = new Array[Long](buf.length + 1)
        System.arraycopy(buf, 0, out, 0, ip)
        out(ip) = v
        System.arraycopy(buf, ip, out, ip + 1, buf.length - ip)
        out
      } else if (ip < k) {
        // evict the current maximum, shift the tail right in place
        System.arraycopy(buf, ip, buf, ip + 1, k - ip - 1)
        buf(ip) = v
        buf
      } else buf // v above the Kth minimum of a full buffer
    }
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    if (b.isEmpty) return a
    if (a.isEmpty) return b
    val out = new Array[Long](math.min(k, a.length + b.length))
    var i = 0; var j = 0; var n = 0
    var last = 0L; var any = false
    while (n < out.length && (i < a.length || j < b.length)) {
      val v =
        if (j >= b.length || (i < a.length && a(i) <= b(j))) {
          val x = a(i); i += 1; x
        } else { val x = b(j); j += 1; x }
      if (!any || v != last) { out(n) = v; n += 1; last = v; any = true }
    }
    if (n == out.length) out else java.util.Arrays.copyOf(out, n)
  }

  override def eval(buf: Array[Long]): Any =
    new GenericArrayData(buf.map(v => v: Any))

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(o: Int): BottomKAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BottomKAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): BottomKAgg = copy(child = cs.head)
}

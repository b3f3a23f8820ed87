package graft.store

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.store.SchemaRegistry.unionByNameAllowMissing

/** Hot in-memory view of one table — the MemoryStore analog
  * (duo/src/memory.rs:13-20): recent micro-batches kept queryable with
  * ~1 s visibility, unioned with cold parquet at query time.
  *
  * Spark mapping (SURVEY §1.5 S1): the buffered batches live as an
  * in-memory DataFrame built from collected rows. Appends arrive from
  * the ingest loop's foreachBatch; `snapshot` is what queries union with
  * the parquet store; `drain` is the 60 s flush handoff
  * (duo/src/memory.rs:83-88). All mutation is driver-side under a lock,
  * like the reference's RwLock — the data volume here is only the last
  * flush interval's worth, the 100 TB bulk lives in parquet.
  *
  * Schema drift: batches may carry new dynamic log columns; appends
  * union by name with missing columns nulled, so the snapshot always has
  * the widest schema seen (duo/src/schema.rs:78-89 semantics).
  */
final class MemoryView(spark: SparkSession, baseSchema: org.apache.spark.sql.types.StructType) {

  private var current: DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], baseSchema)
  private var n: Long = 0L
  private var deltas: Int = 0
  private val lock = new Object

  /** Append a micro-batch: the DELTA is materialized once (eager
    * localCheckpoint) and the view becomes a lazy union of
    * checkpointed deltas — O(batch) work per append. The prior form
    * re-checkpointed the WHOLE accumulated view on every append
    * (O(total) per append, O(n²) per flush interval). The union plan
    * is collapsed back into one checkpoint every
    * [[MemoryView.CollapseEvery]] appends so a long flush interval
    * cannot grow an unbounded plan. Returns the materialized delta so
    * the caller can reuse it (WAL append, emptiness probe) without
    * re-running the upstream lineage — on the engine's append path
    * that lineage otherwise executed three times per batch (guide §5:
    * reused and expensive to recompute).
    */
  def append(batch: DataFrame): DataFrame = lock.synchronized {
    val delta = batch.localCheckpoint(eager = true)
    // counted on the checkpointed blocks (no upstream recompute) —
    // feeds the engine's hot-view size guard
    val dn = delta.count()
    if (dn > 0L) {
      current = unionByNameAllowMissing(current, delta)
      n += dn
      deltas += 1
      if (deltas >= MemoryView.CollapseEvery) {
        current = current.localCheckpoint(eager = true)
        deltas = 0
      }
    }
    delta
  }

  /** Buffered row count — the size signal [[graft.DuoEngine]]'s
    * early-flush guard triggers on. O(1): maintained at append time.
    */
  def rows: Long = lock.synchronized(n)

  /** Current queryable snapshot. */
  def snapshot(): DataFrame = lock.synchronized(current)

  /** Atomically take everything and reset to empty — the Parquet-flush
    * handoff (duo/src/grpc/server.rs:89-120).
    */
  def drain(): DataFrame = lock.synchronized {
    val out = current
    current = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], out.schema)
    n = 0L
    deltas = 0
    out
  }

  // O(1): `n` is maintained at append time on checkpointed blocks
  def isEmpty: Boolean = lock.synchronized(n == 0L)
}

object MemoryView {
  /** Collapse the lazy union-of-deltas back into one local checkpoint
    * after this many appends: bounds the snapshot plan's width while
    * keeping the common flush interval (a handful of appends) at one
    * materialization per batch.
    */
  val CollapseEvery: Int = 32
}

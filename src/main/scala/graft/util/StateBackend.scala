package graft.util

/** Streaming state-backend selection as an ENGINE CONFIG, with the
  * sizing rule written down instead of re-derived per incident.
  *
  * Spark's default state store (`HDFSBackedStateStoreProvider`) holds
  * every key of every maintained version in executor-heap hash maps;
  * the RocksDB provider keeps state off-heap with a bounded block
  * cache. The crossover is a HEAP-KEY budget, not a data-size one:
  * measured on this engine's ingest loop (w11 at 100× rows,
  * SCALE.md), the in-heap store OOMed a 48 GiB driver at ~60M state
  * keys while RocksDB ran the identical query in constant heap — the
  * one-conf-line fix every large deployment runs. Results are
  * backend-invariant (provider choice changes WHERE state lives,
  * never what the operator computes — pinned by spec and by w11
  * running RocksDB under its oracle in the normal bench).
  *
  * [[HeapKeyCeiling]] is deliberately an order of magnitude under the
  * measured failure point: the heap store keeps ~2 versions of each
  * store plus snapshot copies during maintenance, and executors share
  * the heap with shuffle/scan buffers, so sizing to the OOM edge is
  * sizing to fall off it.
  */
object StateBackend {

  /** Spark's default executor-heap provider — right while total state
    * keys stay well under [[HeapKeyCeiling]] (lowest per-op latency,
    * no native I/O).
    */
  val HeapProvider: String =
    "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider"

  /** Off-heap RocksDB provider — the backend for large state. */
  val RocksDBProvider: String =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  /** The session conf key a chosen backend is applied to (captured by
    * a streaming query at start and pinned into its checkpoint).
    */
  val ConfKey = "spark.sql.streaming.stateStore.providerClass"

  /** Heap-key budget above which RocksDB is selected. See scaladoc for
    * the measurement this derives from (in-heap OOM at ~60M keys/48g).
    */
  val HeapKeyCeiling: Long = 10L * 1000 * 1000

  /** The config rule: expected total state keys → provider class. */
  def forExpectedKeys(expectedKeys: Long): String =
    if (expectedKeys > HeapKeyCeiling) RocksDBProvider else HeapProvider

  /** Streaming state-PARTITION sizing rule, [[forExpectedKeys]]'s
    * companion: a short-batch stateful query's wall is dominated by
    * the per-batch state-commit term (partitions × stores-per-operator
    * × micro-batches — a stream-stream join carries FOUR stores per
    * partition) until per-partition state volume is large, so size
    * the partition count to expected state rows instead of inheriting
    * the batch-scan shuffle default. ~250k rows/partition keeps a
    * heap-store partition far below memory pressure (w09 measured
    * ~200k buffered rows/store at 4 partitions with no pressure)
    * while minimizing commit count; the floor keeps a minimum of
    * task parallelism for the stateful stage.
    */
  def partitionsForStateRows(expectedRows: Long, floor: Int = 4): Int =
    math.max(floor,
      math.min(1 << 10, math.ceil(expectedRows / 250000.0).toInt))

  /** The full session-conf set for a chosen provider — one place to
    * grow provider-specific tuning. Deliberately minimal today:
    * RocksDB changelog checkpointing was measured on w11 at sf0.1 and
    * REJECTED (21.9 s warm vs 17.5 s snapshot-mode — at a
    * few-batches-per-query profile the changelog is pure extra I/O;
    * it pays off on long-running streams where commit latency
    * amortizes snapshot uploads, not here).
    */
  def sessionConf(provider: String): Seq[(String, String)] =
    Seq(ConfKey -> provider)
}

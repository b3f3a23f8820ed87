package graft.ingest

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.DuoEngine

/** Structured-Streaming wiring of the ingest path (ST1-ST5 as one
  * pipeline): a stream of partial span records flows through the
  * stateful close-merge ([[SpanMerger.mergeStream]]) and lands in the
  * engine's hot view via foreachBatch; raw log rows append directly.
  * Every `flushEveryBatches` micro-batches the engine flushes the hot
  * views to cold parquet and clears the WAL — the 1 s / 60 s cadence of
  * the reference expressed as trigger interval × flush modulus.
  */
object StreamingIngest {

  /** @param expectedStateKeys sizing hint for the span-merge state (≈
    *   peak open spans): selects the state-store backend via
    *   [[graft.util.StateBackend.forExpectedKeys]] — heap maps below
    *   the documented ceiling, RocksDB above it (the w11 100× lesson:
    *   60M keys OOMs the in-heap store; one conf line fixes it). The
    *   provider is session conf, captured by the query at start; pass
    *   None to leave the session's current setting untouched.
    */
  def startSpans(engine: DuoEngine, records: Dataset[SpanRecord],
      trigger: Trigger = Trigger.ProcessingTime("1 second"),
      flushEveryBatches: Long = 60,
      expectedStateKeys: Option[Long] = None): StreamingQuery = {
    import engine.spark.implicits._
    expectedStateKeys.foreach(n => engine.spark.conf.set(
      graft.util.StateBackend.ConfKey,
      graft.util.StateBackend.forExpectedKeys(n)))
    SpanMerger.mergeStream(engine.spark, records)
      .writeStream
      .outputMode("append")
      .trigger(trigger)
      .foreachBatch { (batch: Dataset[graft.model.Span], batchId: Long) =>
        engine.appendSpanBatch(batch.toDF())
        if (batchId > 0 && batchId % flushEveryBatches == 0) engine.flush()
      }
      .start()
  }

  def startLogs(engine: DuoEngine, logs: DataFrame,
      trigger: Trigger = Trigger.ProcessingTime("1 second"),
      flushEveryBatches: Long = 60): StreamingQuery =
    logs.writeStream
      .outputMode("append")
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        engine.appendLogBatch(batch)
        if (batchId > 0 && batchId % flushEveryBatches == 0) engine.flush()
      }
      .start()
}

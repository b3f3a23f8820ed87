package graft.util

import org.apache.spark.sql.{DataFrame, Encoder, SparkSession}

/** Shared harness for the oracle-gated REAL streaming executions
  * (w03/w04/w05): feed a MemoryStream one micro-batch per element of
  * `batches`, run the operator under test through an append-mode
  * memory sink, and return the landed table. Holding the skeleton
  * (source wiring, unique sink naming, addData/processAllAvailable
  * cadence, stop-in-finally) in ONE place means lifecycle fixes apply
  * to every streaming gate at once. The driver-side feed is the test
  * harness — a MemoryStream can only be fed from the driver; the
  * operator under test stays fully distributed.
  */
private[graft] object StreamGate {

  private val seq = new java.util.concurrent.atomic.AtomicInteger

  /** @param columns  names given to the tuple-encoded feed columns
    * @param build    the streaming operator under test, applied to the
    *                 named source frame
    * @param onDrained observer invoked after the last batch drains and
    *                 before the query stops — [[graft.ScaleProbe]]
    *                 reads state-store metrics off `lastProgress` here
    */
  def run[A: Encoder](s: SparkSession, name: String, columns: Seq[String],
      batches: Seq[Seq[A]], build: DataFrame => DataFrame,
      onDrained: org.apache.spark.sql.streaming.StreamingQuery => Unit =
        _ => ()): DataFrame = {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val input = MemoryStream[A]
    val out = build(input.toDF().toDF(columns: _*))
    val qname = s"${name}_${seq.incrementAndGet()}"
    val query = out.writeStream.format("memory").queryName(qname)
      .outputMode("append").start()
    try {
      batches.foreach { b =>
        input.addData(b): Unit
        query.processAllAvailable()
      }
      onDrained(query)
    } finally query.stop()
    // detach the result from the memory sink and DROP the sink's temp
    // view: gate outputs are small by design (bounded survivor/window
    // sets), but a repeated bench pass would otherwise accumulate one
    // sink table per invocation in executor memory for the session's
    // lifetime. A LocalRelation copy keeps the result self-contained.
    val landed = s.table(qname)
    val result = s.createDataFrame(
      java.util.Arrays.asList(landed.collect(): _*), landed.schema)
    s.catalog.dropTempView(qname): Unit
    result
  }
}

package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.DataFrame

/** The one door a V1 streaming `Source` needs: its `getBatch` contract
  * requires the returned DataFrame's logical plan to carry
  * `isStreaming = true` (MicroBatchExecution splices it into the
  * incremental plan), and the only constructor for that is
  * `SparkSession.internalCreateDataFrame(..., isStreaming = true)`, which
  * is `private[sql]`. This is the same call Spark's own FileStreamSource
  * and Delta Lake's DeltaSource make; like [[ColumnBridge]] it lives in
  * the `org.apache.spark.sql` package tree so graft proper never touches
  * internals directly.
  */
object StreamBridge {

  /** Re-wrap a batch DataFrame as a streaming micro-batch: same rows,
    * same schema, lazily planned (`toRdd` does not execute here), with
    * the streaming bit set.
    */
  def asStreamingBatch(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
      .asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    spark.internalCreateDataFrame(df.queryExecution.toRdd, df.schema,
      isStreaming = true)
  }

  /** The inverse door, for a V1 streaming `Sink`: `addBatch` receives a
    * DataFrame whose plan still carries `isStreaming = true`, which any
    * batch write (`df.write...`) refuses — re-wrap the micro-batch's
    * physical rows as a plain batch frame. This is exactly what Spark's
    * own `ForeachBatchSink` does before invoking the user handler.
    */
  def asBatch(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
      .asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    spark.internalCreateDataFrame(df.queryExecution.toRdd, df.schema,
      isStreaming = false)
  }
}

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
}

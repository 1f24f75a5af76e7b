package org.apache.spark.sql.graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.classic.{Dataset => ClassicDataset}
import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.sql.execution.datasources.LogicalRelation

/** The ONE internal-API bridge the v1 streaming source needs
  * (`graft.sources.TxStreamSource`): `Source.getBatch` must return a
  * DataFrame whose plan is tagged `isStreaming = true`
  * (MicroBatchExecution asserts it at the call site), and batch scans
  * built with the public reader come back `isStreaming = false` with no
  * public re-tag. Every published v1 file/lakehouse source solves this
  * the same way — a helper inside the `org.apache.spark.sql` package
  * tree with access to the `private[sql]` plan constructors (the
  * delta-io OSS connector's `DeltaSource.getBatch` is the canonical
  * public example). Kept deliberately tiny: re-tag the LEAF relations
  * of an already-analyzed plan and rebuild the Dataset; no other
  * internal surface is touched.
  */
object StreamingShim {

  /** Return `df` with every batch leaf relation re-tagged
    * `isStreaming = true` — the getBatch contract. Works for plain
    * file scans (`LogicalRelation`) and checkpointed/local frames
    * (`LogicalRDD`), which are the only leaves the Tx source emits.
    */
  def asStreaming(df: DataFrame): DataFrame = {
    val cdf = df.asInstanceOf[ClassicDataset[org.apache.spark.sql.Row]]
    val spark = cdf.sparkSession
    val plan = cdf.queryExecution.analyzed.transform {
      case lr: LogicalRelation if !lr.isStreaming => lr.copy(isStreaming = true)
      case lrdd: LogicalRDD if !lrdd.isStreaming =>
        lrdd.copy(isStreaming = true)(spark, None, None)
    }
    ClassicDataset.ofRows(spark, plan)
  }
}

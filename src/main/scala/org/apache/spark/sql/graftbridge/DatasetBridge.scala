package org.apache.spark.sql.graftbridge

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.plans.physical.{HashPartitioning, UnknownPartitioning}
import org.apache.spark.sql.classic.{Dataset => ClassicDataset}
import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.storage.StorageLevel

/** Bridge to `private[sql]` plan surgery for iterative operators
  * (PageRank, connected components): materialize a round into a
  * persisted InternalRow RDD and rewrap it as a single-leaf plan.
  *
  * Why not `persist + rdd.count + createDataFrame` (the previous
  * shape): `df.rdd` pays a full InternalRow→Row decode per round and
  * `createDataFrame` pays the encode back, and the rewrapped leaf
  * reports UnknownPartitioning — so an iteration whose output is
  * already clustered on the loop key re-exchanges it EVERY round.
  * `Dataset.localCheckpoint` keeps the partitioning in theory but
  * loses it under AQE (the adaptive root reports the partitioning
  * only after the final stage materializes, which `fromDataset`
  * doesn't wait for). This helper skips both costs: the persisted
  * rows stay in Tungsten binary format, and the leaf declares the
  * hash partitioning the caller knows the rows to have.
  */
object DatasetBridge {

  /** Materialize `df` eagerly into a persisted RDD and return a
    * DataFrame over a single [[LogicalRDD]] leaf declaring
    * `HashPartitioning(partCols)`, plus a release hook for the
    * persisted blocks.
    *
    * SAFETY: the declared partitioning is a *claim* — downstream
    * joins co-partition against it without re-exchanging, so a wrong
    * claim silently mis-joins. The caller asserts the plan's final
    * stage hash-clusters rows by `partCols` into the session's
    * shuffle-partition count (true for any plan whose terminal
    * exchange/aggregation/join is keyed on `partCols`). If AQE
    * changed the partition count (coalesce/skew-split — layouts that
    * are clustered but NOT modulo-N), the claim is withdrawn and the
    * leaf reports UnknownPartitioning: correct, just one exchange
    * slower. */
  def materializedHashPartitioned(df: DataFrame, partCols: Seq[String])
      : (DataFrame, () => Unit) = {
    val cds = df.asInstanceOf[ClassicDataset[Row]]
    val spark = cds.sparkSession
    // UnsafeRow buffers are reused per partition iterator — copy
    // before persisting (same contract Dataset.checkpoint honors)
    val rdd: RDD[InternalRow] =
      cds.queryExecution.toRdd.map(_.copy())
        .persist(StorageLevel.MEMORY_AND_DISK)
    // one materializing action, no result collection beyond task acks
    rdd.foreachPartition(it => while (it.hasNext) it.next())
    val attrs = cds.queryExecution.analyzed.output.map(_.newInstance())
    val expected = spark.sessionState.conf.numShufflePartitions
    val part =
      if (rdd.getNumPartitions == expected)
        HashPartitioning(partCols.map(n => attrs.find(_.name == n).get), expected)
      else UnknownPartitioning(rdd.getNumPartitions)
    val leaf = LogicalRDD(attrs, rdd, part, Nil, isStreaming = false)(spark)
    (ClassicDataset.ofRows(spark, leaf), () => { rdd.unpersist(blocking = true); () })
  }

  /** Materialize-and-rewrap with no partitioning claim — the
    * InternalRow twin of `persist + rdd.count + createDataFrame`,
    * minus the per-round Row decode/encode. `sign` folds each row
    * into a task-local (count, xor) pair merged via accumulators by
    * the caller (see GraphOps.materializeAndSign). */
  def materialized(df: DataFrame, sign: Iterator[InternalRow] => Unit)
      : (DataFrame, () => Unit) = {
    val cds = df.asInstanceOf[ClassicDataset[Row]]
    val spark = cds.sparkSession
    val rdd: RDD[InternalRow] =
      cds.queryExecution.toRdd.map(_.copy())
        .persist(StorageLevel.MEMORY_AND_DISK)
    rdd.foreachPartition(sign(_))
    val attrs = cds.queryExecution.analyzed.output.map(_.newInstance())
    val leaf = LogicalRDD(attrs, rdd, UnknownPartitioning(rdd.getNumPartitions),
      Nil, isStreaming = false)(spark)
    (ClassicDataset.ofRows(spark, leaf), () => { rdd.unpersist(blocking = true); () })
  }
}

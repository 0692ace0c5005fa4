package graft.sinks

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Batch write-side hygiene for corpus-scale outputs. At 100 TB the
  * write layout IS the read performance of every downstream job:
  *  - partition directories on the columns downstream filters prune on
  *    (partition pruning turns a full scan into a directory lookup);
  *  - sort within partitions on the columns downstream joins/groups
  *    key on (parquet min/max row-group stats then skip pages);
  *  - bound file sizes so a skewed partition writes many parallel
  *    files instead of one task-killing giant;
  *  - bucket repeatedly-joined tables so the join shuffle is paid once
  *    at write time.
  */
object WriteOps {

  /** Write `df` as a bucketed + sorted managed table: rows are hash-
    * bucketed on `bucketCols` into `numBuckets` files per partition
    * and sorted within each bucket. Two tables bucketed the same way
    * join/aggregate on the bucket columns with NO exchange — the
    * shuffle is paid once at write time and amortized over every
    * subsequent join, the core co-location technique for repeatedly-
    * joined 100 TB fact tables. (Bucket metadata lives in the session
    * catalog, so this writes via `saveAsTable`.) */
  def bucketedTable(df: DataFrame, table: String,
                    bucketCols: Seq[String], sortCols: Seq[String],
                    numBuckets: Int): Unit =
    df.repartition(numBuckets, bucketCols.map(col): _*)
      .write
      .mode("overwrite")
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(sortCols.head, sortCols.tail: _*)
      .format("parquet")
      .saveAsTable(table)

  /** Write parquet partitioned by `partitionCols`, rows sorted within
    * each output task by `sortCols`, at most `maxRecordsPerFile` rows
    * per file. `repartition(partitionCols)` first, so each partition
    * directory is produced by one task group (no N-files-per-task
    * explosion when many input tasks each hold a sliver of every
    * partition).
    *
    * `tasksPerPartition > 1` adds a salt to the repartition keys so a
    * hot partition value is written by that many parallel tasks instead
    * of serializing through a single writer (`repartition(partitionCols)`
    * alone hashes each partition value to exactly one task;
    * `maxRecordsPerFile` only splits files *sequentially* within it). */
  def partitionedSorted(df: DataFrame, path: String,
                        partitionCols: Seq[String], sortCols: Seq[String],
                        maxRecordsPerFile: Long,
                        tasksPerPartition: Int = 1): Unit = {
    import org.apache.spark.sql.functions.{hash, lit, pmod}
    val keyed =
      if (tasksPerPartition <= 1) df.repartition(partitionCols.map(col): _*)
      else df.repartition(
        (partitionCols.map(col) :+
          pmod(hash(sortCols.map(col): _*), lit(tasksPerPartition))): _*)
    keyed
      .sortWithinPartitions((partitionCols ++ sortCols).map(col): _*)
      .write
      .mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partitionCols: _*)
      .parquet(path)
  }

  /** Write parquet range-clustered and sorted on `sortCols` into
    * `numFiles` files — the unpartitioned sibling of
    * [[partitionedSorted]] for tables read whole but filtered/joined
    * on a key prefix: one range exchange (sampled bounds, balanced
    * output tasks) plus an in-task sort gives globally disjoint,
    * sorted key ranges per file, so parquet min/max row-group stats
    * prune point and range reads on the sort key. This is the layout
    * the tokenize-once pipeline stores its encoded id arrays in
    * (t24's stage step). */
  def sortedParquet(df: DataFrame, path: String, sortCols: Seq[String],
                    numFiles: Int): Unit =
    df.repartitionByRange(numFiles, sortCols.map(col): _*)
      .sortWithinPartitions(sortCols.map(col): _*)
      .write.mode("overwrite").parquet(path)

  /** Write parquet clustered in Morton (z-) order over `dims` — the
    * multi-column data-skipping layout: `repartitionByRange` + in-task
    * sort on the interleaved key ([[graft.plans.ZValue]]) places rows
    * close in EVERY dimension into the same files, so parquet min/max
    * stats prune reads filtered on ANY dim combination, where
    * [[partitionedSorted]]'s lexicographic sort only serves its leading
    * column. `dims` are pre-binned long columns in `[0, 2^bits)` —
    * bin width is a domain decision the caller owns.
    *
    * 100 TB shape: one range exchange on the z key (sampled bounds,
    * `numFiles` balanced output tasks) + per-task sort; the z key
    * itself is a codegen'd narrow expression and is dropped before
    * writing, so the layout costs nothing in the files themselves. */
  def zOrderedParquet(df: DataFrame, path: String,
                      dims: Seq[org.apache.spark.sql.Column],
                      bits: Int, numFiles: Int): Unit = {
    df.withColumn("__z", graft.plans.ZValue.of(bits, dims: _*))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write
      .mode("overwrite")
      .parquet(path)
  }

  /** Small-file compaction report. */
  final case class CompactStats(filesBefore: Int, filesAfter: Int,
                                bytes: Long, compacted: Boolean)

  /** Bin-pack a parquet directory's small files into ~`targetBytes`
    * outputs — the table-maintenance job every streaming sink needs
    * at scale: micro-batch appends (S5-S7) accrete one-file-per-batch
    * layouts whose per-file open/footer cost eventually dominates
    * every downstream scan. Rewrites ONLY when it would help (2+
    * files under half the target), into ceil(totalBytes/targetBytes)
    * outputs via a round-robin repartition (pure size balancing — no
    * key skew risk), and swaps atomically-per-rename: write to a
    * sibling `.compact.tmp` dir, move the old dir aside, move the new
    * one in, delete the old — a crashed job leaves either the old or
    * the new complete directory, never a mix. Idempotent: a second
    * run reports `compacted = false` and touches nothing.
    *
    * 100 TB shape: the rewrite is one narrow scan→write job per
    * table (no shuffle beyond the size-balancing round-robin
    * exchange); at cluster scale you run it per partition directory
    * under a partition-granularity lock, exactly like open-source
    * table formats' OPTIMIZE. */
  def compactSmallFiles(spark: org.apache.spark.sql.SparkSession,
                        path: String, targetBytes: Long): CompactStats = {
    import org.apache.hadoop.fs.Path
    val hPath = new Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(hPath)
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
    val total = files.map(_.getLen).sum
    val small = files.count(_.getLen < targetBytes / 2)
    if (files.length < 2 || small < 2)
      return CompactStats(files.length, files.length, total, compacted = false)
    val outFiles = math.max(1, math.ceil(total.toDouble / targetBytes).toInt)
    val tmp = new Path(path + ".compact.tmp")
    val old = new Path(path + ".compact.old")
    fs.delete(tmp, true); fs.delete(old, true)
    spark.read.parquet(path)
      .repartition(outFiles)
      .write.mode("overwrite").parquet(tmp.toString)
    require(fs.rename(hPath, old), s"compact: could not move $path aside")
    require(fs.rename(tmp, hPath), s"compact: could not move new dir in")
    fs.delete(old, true)
    val after = fs.listStatus(hPath)
      .count(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
    CompactStats(files.length, after, total, compacted = true)
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Two-pass RANGE-PARTITIONED global ranking — the 100 TB upgrade
  * path for global (or low-cardinality-key) rank windows that the
  * SURVEY documented and r16's verdict asked shipped (item 4).
  *
  * The naive spelling — `row_number()/ntile()/percent_rank() OVER
  * (ORDER BY ...)` with no PARTITION BY — plans as Exchange
  * SinglePartition + one task sorting the ENTIRE input: the sort
  * budget of a single task grows with the corpus, the exact failure
  * q29's 25-way nation key only postpones. Here instead:
  *
  *  1. `repartitionByRange` on the order key (one balanced sampled-
  *     bounds exchange; each of `numParts` tasks holds a disjoint,
  *     ordered key range of ~n/numParts rows);
  *  2. per-partition LOCAL row_numbers (each window group is one
  *     range bucket — bounded, shrinks as numParts grows with the
  *     cluster);
  *  3. per-partition count offsets, a driver pull BOUNDED BY
  *     CONSTRUCTION at `numParts` rows (the saltedEquiJoinHot
  *     discipline), folded back in as a literal map lookup —
  *     global_rank = offset(bucket) + local_rank.
  *
  * ntile / percent_rank / cume_dist then derive from the global rank
  * and the total count in EXACT integer/IEEE arithmetic, value-
  * identical to the built-in window functions whenever `order` is a
  * TOTAL order (rank == row_number; callers must pass a tiebreaker —
  * the q29 discipline). No task ever sorts more than one range
  * bucket, so the plan survives any corpus size by raising numParts.
  */
object RankOps {

  /** [[globalQuantileRanks]] plus the release hook for the range-
    * partitioned persist (pid assignment must be CONSISTENT between
    * the count pass and the rank pass; un-persisted lineage would
    * re-sample range bounds per consumer). */
  def globalQuantileRanksReleasable(df: DataFrame, order: Seq[Column],
                                    tiles: Int, numParts: Int)
      : (DataFrame, () => Unit) = {
    require(tiles >= 1, "tiles must be >= 1")
    require(numParts >= 1, "numParts must be >= 1")
    val parted = df.repartitionByRange(numParts, order: _*)
      .withColumn("__pid", spark_partition_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // bounded driver pull: at most numParts rows, by construction
    val cnts = parted.groupBy(col("__pid")).agg(count(lit(1)).as("c"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val n = cnts.map(_._2).sum
    val offs = cnts.map(_._1).zip(
      cnts.map(_._2).scanLeft(0L)(_ + _)) // offset = rows in lower buckets
    val offExpr =
      if (offs.isEmpty) lit(0L)
      else element_at(
        map(offs.flatMap { case (p, o) => Seq(lit(p), lit(o)) }: _*),
        col("__pid"))
    val w = Window.partitionBy(col("__pid")).orderBy(order: _*)
    val ranked = parted
      .withColumn("grank", row_number().over(w).cast("long") + offExpr)
    // exact ntile: q+1-sized buckets first (r of them), then q-sized —
    // integer `div` arithmetic, value-identical to ntile() OVER a
    // total order (the CASE guards the q = 0 more-tiles-than-rows
    // degenerate case, where every row gets its own bucket)
    val q = n / tiles
    val r = n % tiles
    val cut = r * (q + 1)
    val tileCol =
      expr(s"CASE WHEN $q = 0 OR grank <= $cut " +
        s"THEN (grank - 1) div ${q + 1} + 1 " +
        s"ELSE $r + (grank - $cut - 1) div $q + 1 END")
    // micro-unit quantization via floor(ratio * 1e6) — pure IEEE ops,
    // identical in every engine (the q29 lesson: round(x, 6) hits
    // exact half-ties where engines' rounding modes disagree). The
    // RATIO MUST BE COMPUTED FIRST: a window engine evaluates
    // percent_rank/cume_dist as a double ratio and then scales, so
    // `(1e6 * rank) / n` — exact integer-valued division — lands one
    // ulp ABOVE `(rank / n) * 1e6` whenever rank/n rounds down
    // (measured at sf0.1: 57 off-by-one cume rows on exact-ratio
    // granks like 471/15000).
    val pctCol =
      if (n > 1)
        floor(((col("grank") - 1).cast("double") /
          lit((n - 1).toDouble)) * lit(1.0e6)).cast("long")
      else lit(0L)
    val cumeCol =
      if (n > 0)
        floor((col("grank").cast("double") / lit(n.toDouble)) *
          lit(1.0e6)).cast("long")
      else lit(0L)
    val out = ranked
      .withColumn("tile", tileCol)
      .withColumn("pct_rank_u", pctCol)
      .withColumn("cume_u", cumeCol)
      .drop("__pid")
    (out, () => { parted.unpersist(blocking = true); () })
  }

  /** Global (grank, tile, pct_rank_u, cume_u) over a total order —
    * see the object doc. Bench/Verify clearCache() between queries;
    * library callers in long sessions use the releasable form. */
  def globalQuantileRanks(df: DataFrame, order: Seq[Column],
                          tiles: Int, numParts: Int): DataFrame =
    globalQuantileRanksReleasable(df, order, tiles, numParts)._1
}

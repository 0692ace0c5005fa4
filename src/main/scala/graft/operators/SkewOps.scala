package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigation helpers for joins whose key distribution has hot
  * keys (the classic 100 TB failure mode: one reducer gets the hot
  * key's entire partition while 999 executors idle).
  *
  * First line of defense is AQE (`spark.sql.adaptive.skewJoin.enabled`,
  * on by default in the engine's sessions), which splits skewed
  * shuffle partitions at runtime. Salting is the explicit fallback for
  * cases AQE can't fix: skew concentrated in a single join KEY (AQE
  * can split a partition, but a sort-merge join still co-locates one
  * key's rows) or non-shuffle aggregations over hot keys.
  */
object SkewOps {

  /** Equi-join `large` (key-skewed) with `small` by salting: each
    * large-side row gets a deterministic salt in [0, saltFactor), the
    * small side is replicated saltFactor times, and the join key
    * becomes (key, salt) — so a hot key's rows spread across
    * saltFactor reducers instead of one. The result set is identical
    * to `large.join(small, key)`; cost is saltFactor x small-side
    * duplication (use for medium small-sides where broadcast doesn't
    * fit but one reducer per hot key is too slow).
    *
    * The salt hashes the large row's full content PLUS a per-row
    * disambiguator (`monotonically_increasing_id`): content alone
    * leaves fully identical duplicate rows of a hot key on ONE salt —
    * exactly the skew the operator targets (r16 advice). The result
    * set is salt-invariant (salting is pure execution strategy), so
    * the partition-layout-dependent id costs nothing in determinism
    * of the OUTPUT; only the internal spread changes.
    *
    * RETRY CAVEAT (r17 advice): `monotonically_increasing_id` is a
    * nondeterministic-marked expression — its value depends on the
    * task's partition id and row position. That is safe HERE because
    * the large side is expected to be a deterministically-ordered
    * source (a file scan or cached table whose partition contents are
    * stable under task retry), so a retried task re-derives the same
    * salts and the join neither drops nor duplicates rows. A caller
    * feeding the salted side from a NONDETERMINISTICALLY-ordered
    * shuffle (e.g. round-robin repartition of unstable input) could
    * see retry-divergent salts — the SPARK-38388 class of failure;
    * materialize or checkpoint such an input first. */
  def saltedEquiJoin(large: DataFrame, small: DataFrame, key: String,
                     saltFactor: Int): DataFrame = {
    require(saltFactor > 1, "saltFactor must exceed 1")
    val salted = large.withColumn("__salt",
      pmod(xxhash64((large.columns.map(col) :+
          monotonically_increasing_id()).toIndexedSeq: _*),
        lit(saltFactor)).cast("int"))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    // Pin the SORT-MERGE strategy (round 15, replacing the r6-era
    // shuffle-hash pin). Two failure modes bracket the choice:
    //  - left to its own stats, AQE elects to BROADCAST the
    //    saltFactor-x replicated side (measured at sf0.1: the whole
    //    8x-replicated table built into one driver-side hash
    //    relation) — which silently un-salts the join (a broadcast
    //    join has no reducer skew to spread) and at the operator's
    //    documented scale (small side too big to broadcast) would
    //    OOM the driver;
    //  - the r6 `shuffle_hash` pin fixed that but planted the
    //    opposite cliff: ShuffledHashJoin's per-partition build
    //    CANNOT spill, so when the replicated side outgrows
    //    executor memory the join dies with "not enough memory to
    //    build hash map" (measured at the 10x sf1 sweep: 12M
    //    replicated rows / 4 partitions OOM'd a default-heap
    //    session outright, and ground a large-heap one to 2.5x the
    //    sort-merge time under GC pressure).
    // A merge-hinted SortMergeJoin keeps the (key, salt)-keyed
    // exchange on both sides — the salt still spreads a hot key
    // across saltFactor reducers — and SMJ spills gracefully at any
    // scale; the hint survives AQE (no broadcast demotion,
    // PlanShapeSpec pins it), and AQE's OptimizeSkewedJoin remains
    // applicable on top for residual (key, salt) skew.
    salted.join(replicated.hint("merge"), Seq(key, "__salt"))
      .drop("__salt")
  }

  /** [[saltedEquiJoin]] with TARGETED salting (round 16): the full-
    * salt spelling replicates the ENTIRE small side saltFactor times,
    * which is itself a scale problem when the small side is a large
    * dim table (measured at the saltjoin probe: 8× replicating a 10M-
    * row dim made the salted join 10× the plain join's wall — the
    * cure cost more than the disease). Here hot keys are DETECTED
    * first — one map-side-combined count pass plus a driver pull that
    * is bounded by construction (at most 1/hotMinShare keys can each
    * carry ≥ hotMinShare of the rows, so ≤ 128 keys at the default) —
    * and only they are salted: the small side replicates saltFactor
    * copies of just the hot keys' rows, every other row joins on salt
    * 0 exactly as an unsalted SMJ would. A hot key's rows spread
    * across saltFactor reducers; the cold path pays nothing.
    *
    * Result-identical to `large.join(small, key)` (salting is pure
    * execution strategy; detection is exact counting, so the plan is
    * deterministic for a given input). Use over [[saltedEquiJoin]]
    * whenever the small side is too big to replicate wholesale —
    * i.e. at exactly the scale salting exists for. */
  def saltedEquiJoinHot(large: DataFrame, small: DataFrame, key: String,
                        saltFactor: Int,
                        hotMinShare: Double = 1.0 / 128): DataFrame = {
    require(saltFactor > 1, "saltFactor must exceed 1")
    require(hotMinShare > 0 && hotMinShare <= 1,
      "hotMinShare must be in (0, 1]")
    val counts = large.groupBy(col(key)).agg(count(lit(1)).as("__cnt"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // coalesce: sum over ZERO rows is NULL and getLong would NPE —
      // an empty large side must behave like the plain join (empty
      // result, all-cold path; r16 advice)
      val total = counts.agg(coalesce(sum(col("__cnt")), lit(0L)))
        .collect()(0).getLong(0)
      val floor = math.max(1L, math.ceil(total * hotMinShare).toLong)
      val hot = counts.filter(col("__cnt") >= floor)
        .select(col(key)).collect().map(_.get(0)).toSeq
      val isHot: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
        c => if (hot.isEmpty) lit(false) else c.isin(hot: _*)
      // same per-row disambiguator as saltedEquiJoin: without it,
      // duplicate rows of a genuinely hot key all land on one salt —
      // the exact population this targeted variant exists for
      val salted = large.withColumn("__salt",
        when(isHot(col(key)),
          pmod(xxhash64((large.columns.map(col) :+
              monotonically_increasing_id()).toIndexedSeq: _*),
            lit(saltFactor)).cast("int"))
          .otherwise(lit(0)))
      val replicated = small.withColumn("__salt",
        explode(when(isHot(col(key)),
          sequence(lit(0), lit(saltFactor - 1)))
          .otherwise(array(lit(0)))))
      // same merge pin as saltedEquiJoin (see the bracket comment
      // there): no broadcast demotion, no non-spillable hash build
      salted.join(replicated.hint("merge"), Seq(key, "__salt"))
        .drop("__salt")
    } finally counts.unpersist(blocking = false)
  }
}

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
    * The salt is a hash of the large row's full content: deterministic
    * for reproducibility, and it spreads even identical-key rows. */
  def saltedEquiJoin(large: DataFrame, small: DataFrame, key: String,
                     saltFactor: Int): DataFrame = {
    require(saltFactor > 1, "saltFactor must exceed 1")
    val salted = large.withColumn("__salt",
      pmod(xxhash64(large.columns.map(col).toIndexedSeq: _*), lit(saltFactor))
        .cast("int"))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    // Pin the shuffle-hash strategy: left to its own stats, AQE elects
    // to BROADCAST the saltFactor-x replicated side (measured at sf0.1:
    // the whole 8x-replicated table built into one driver-side hash
    // relation) — which silently un-salts the join (a broadcast join
    // has no reducer skew to spread) and at the operator's documented
    // scale (small side too big to broadcast) would OOM the driver.
    // The hint keeps the (key, salt)-keyed exchange on both sides with
    // a per-partition hash build — no sort, no broadcast.
    salted.join(replicated.hint("shuffle_hash"), Seq(key, "__salt"))
      .drop("__salt")
  }
}

package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.{LongType, MapType, StringType}

import graft.functions.TextOps
import graft.ml.{ModelLoader, SentimentModel, SentimentScorer}
import graft.operators.{CorpusOps, DedupOps, DetParams, GraphOps, SimilarityOps, SketchOps}

/** Driver contract — flagship entry, per-operator query inventory, and
  * the DuckDB oracle SQL for each SQL-expressible query.
  * Blueprint: SURVEY.md §2 (operator inventory) and §7 (build plan).
  *
  * Conventions for oracle parity (driver hashes values after sorting
  * columns by name):
  *  - every computed column aliased identically in Spark and SQL;
  *  - double-summing avoided: sums go through DECIMAL (exact, order-
  *    independent) and only then to DOUBLE;
  *  - timestamps compared as epoch BIGINT;
  *  - token arrays compared as space-joined strings.
  */
object SparkEntry {

  // ---- table readers -------------------------------------------------
  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(s, dir)
    else s.read.parquet(s"$dir/$name.parquet")

  /** events.parquet carries TIMESTAMP(NANOS) which Spark's vectorized
    * reader rejects; read nanos as long (session-level legacy flag is
    * set in Verify/Bench; schema-level fallback here) and convert to a
    * microsecond TimestampType column — same truncation DuckDB applies
    * casting TIMESTAMP_NS → TIMESTAMP. */
  private def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = s.read.parquet(s"$dir/events.parquet")
    // integer div, not double: ns values overflow double's 2^53 mantissa
    raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
  }

  /** Model artifacts (reference's frozen PipelineModel, read-only). */
  val ModelDir: String =
    sys.env.getOrElse("GRAFT_MODEL_DIR", "/root/reference/pre_trained_model")

  /** Committed model-fixture parquet (flattened vocab/idf/coef tables
    * for the relational m5 oracle; see graft.tools.DumpModelFixture). */
  val FixtureDir: String =
    sys.env.getOrElse("GRAFT_FIXTURE_DIR", "/root/repo/fixtures")

  // model + broadcast scorer cached per JVM (Verify/Bench are one-shot)
  @volatile private var cachedScorer: SentimentScorer = _
  def scorer(s: SparkSession): SentimentScorer = {
    if (cachedScorer == null) synchronized {
      if (cachedScorer == null)
        cachedScorer = SentimentModel.scorer(s, ModelLoader.load(s, ModelDir))
    }
    cachedScorer
  }

  // ---- shared expressions -------------------------------------------
  private val cleanTokens: Column = TextOps.cleanTokens(col("text"))



  /** Feature projection shared by the LR re-fit family (m7 fit,
    * m10 AUC evaluation): is-English target, bias, scaled token count,
    * type/token ratio, scaled char count. */
  private[graft] val LrFitCols = Seq("xb", "x1", "x2", "x3")
  private def lrFitFeatures(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents").select(
      when(col("lang") === "en", 1.0).otherwise(0.0).as("y"),
      lit(1.0).as("xb"),
      (size(cleanTokens).cast("double") / lit(100.0)).as("x1"),
      coalesce(size(array_distinct(cleanTokens)).cast("double") /
        nullif(size(cleanTokens), lit(0)), lit(0.0)).as("x2"),
      (col("n_chars").cast("double") / lit(1000.0)).as("x3"))



  /** Marker-word language prediction over [[cleanTokens]] — THE
    * heuristic; the single definition t3, m12, and m13 all consume
    * (edit here and the CTE twin together, or the oracle parity of
    * all three silently breaks). */
  private lazy val langPredCol: Column = {
    val toks = cleanTokens
    def score(words: Seq[String]): Column =
      size(filter(toks, w => w.isInCollection(words)))
    val sEn = score(LangMarkers.en); val sDe = score(LangMarkers.de)
    val sEs = score(LangMarkers.es); val sFr = score(LangMarkers.fr)
    val g = greatest(sEn, sDe, sEs, sFr)
    when(g === 0, "und")
      .when(sEn === g, "en").when(sDe === g, "de")
      .when(sEs === g, "es").otherwise("fr")
  }

  /** (actual, predicted, count) confusion matrix of the t3 lang-ID
    * heuristic — shared by m12 (raw matrix) and m13 (per-class PRF). */
  private def langConfusion(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("lang"), langPredCol.as("pred_lang"))
      .groupBy(col("lang"), col("pred_lang"))
      .agg(count(lit(1)).as("n"))

  /** Flagship query (driver smoke-checks rows > 0 on sf0.001):
    * scan documents → clean/tokenize → stop words → native 5-stage
    * sentiment scoring → aggregate sentiment mix per language. */
  def entry(spark: SparkSession): DataFrame = {
    val docs = t(spark, "/root/testdata/sf0.001", "documents")
    scorer(spark).scoreText(docs, "text")
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("prediction")).as("n_negative"),
        avg(size(col("cleaned_data"))).as("avg_tokens"))
      .orderBy(col("lang"))
  }

  // ---- query inventory ----------------------------------------------
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // == reference operator surface (SURVEY.md §2a/2b/2g) ==

    // P1: binary→string cast projection (Kafka `CAST(value AS STRING)`)
    "p1_cast_project" -> ((s, dir) =>
      t(s, dir, "documents").select(
        col("doc_id"),
        decode(encode(col("text"), "UTF-8"), "UTF-8").as("message"))),

    // P2/F2: JSON field decode (from_json / get_json_object)
    "p2_json_decode" -> ((s, dir) =>
      t(s, dir, "events").select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k_val"))),

    // P3: null-dropping filter (dropna) — pinned to the computed
    // column so the predicate matches the oracle's `et IS NOT NULL`
    // exactly (a bare .na.drop() would also drop on event_id nulls).
    "p3_null_filter" -> ((s, dir) =>
      t(s, dir, "events")
        .select(col("event_id"),
          nullif(col("event_type"), lit("click")).as("et"))
        .na.drop(Seq("et"))),

    // P4/F3-F6: clean + tokenize chain (pure built-ins, codegen'd)
    "p4_clean_tokenize" -> ((s, dir) =>
      t(s, dir, "documents").select(
        col("doc_id"),
        concat_ws(" ", cleanTokens).as("toks"))),

    // P5: final narrow projection
    "p5_final_project" -> ((s, dir) =>
      t(s, dir, "documents").select(col("doc_id"), col("lang"))),

    // P6: comma scrub (producer-side)
    "p6_comma_scrub" -> ((s, dir) =>
      t(s, dir, "documents").select(
        col("doc_id"), TextOps.scrubCommas(col("text")).as("scrubbed"))),

    // F7: JSON encode (producer envelope)
    "f7_json_encode" -> ((s, dir) =>
      t(s, dir, "documents").select(
        col("doc_id"),
        to_json(struct(col("lang").as("message"))).as("payload"))),

    // M1: stop-word removal (181-word English list, case-insensitive)
    "m1_stopwords" -> ((s, dir) =>
      t(s, dir, "documents").select(
        col("doc_id"),
        concat_ws(" ", TextOps.removeStopWords(cleanTokens)).as("words"))),

    // M2: term-frequency as an un-pivoted (doc_id, term, tf) table
    "m2_tf" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"), explode(cleanTokens).as("term"))
        .groupBy(col("doc_id"), col("term"))
        .agg(count(lit(1)).as("tf"))),

    // M2–M5: native 5-stage sentiment scoring (DuckDB oracle scores
    // relationally against the flattened model fixture; the golden
    // corpus + mllib parity specs cross-check in ScalaTest)
    "m5_sentiment" -> ((s, dir) => {
      val sc = scorer(s)
      sc.scoreText(t(s, dir, "documents"), "text")
        .select(col("doc_id"), col("prediction"))
    }),

    // == relational core over the TPC-H-ish tables ==

    // hash aggregate with exact decimal sums (TPC-H Q1 flavor)
    "q1_agg" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"),
          sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("sum_base"),
          sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .cast("decimal(18,4)")).cast("double").as("sum_disc"),
          count(lit(1)).as("n"))),

    // broadcast dim join chain (supplier ⋈ nation ⋈ region)
    "q2_dim_join" -> ((s, dir) => {
      val sup = t(s, dir, "supplier")
      val nat = broadcast(t(s, dir, "nation"))
      val reg = broadcast(t(s, dir, "region"))
      sup.join(nat, col("s_nationkey") === col("n_nationkey"))
        .join(reg, col("n_regionkey") === col("r_regionkey"))
        .select(col("s_suppkey"), col("s_name"), col("n_name"), col("r_name"))
    }),

    // 3-way join + group + deterministic top-N (TPC-H Q3 flavor)
    "q3_join_topn" -> ((s, dir) => {
      val cust = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      val ord = t(s, dir, "orders")
      val li = t(s, dir, "lineitem")
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .groupBy(col("o_orderkey"))
        .agg(
          sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .cast("decimal(18,4)")).cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("revenue").desc, col("o_orderkey"))
        .limit(10)
    }),

    // grouped aggregate over the event stream table
    "q4_events_agg" -> ((s, dir) =>
      t(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(
          count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,4)")).cast("double").as("sum_value"),
          min(col("value")).as("min_value"),
          max(col("value")).as("max_value"))),

    // event-time tumbling window (batch twin of the streaming agg)
    "q5_time_window" -> ((s, dir) =>
      t(s, dir, "events")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(
          unix_timestamp(col("window.start")).as("bucket"),
          col("event_type"), col("n"))),

    // top-k per group via ranking window function
    "q6_topk_per_group" -> ((s, dir) => {
      val w = Window.partitionBy(col("event_type"))
        .orderBy(col("value").desc, col("event_id"))
      t(s, dir, "events")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("event_type"), col("event_id"), col("value"), col("rn"))
    }),

    // anti join (customers with no order above a total)
    "q7_anti_join" -> ((s, dir) => {
      val bigOrders = t(s, dir, "orders").filter(col("o_totalprice") > 400000)
      t(s, dir, "customer")
        .join(bigOrders, col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
    }),

    // semi join (suppliers in regions that have customers w/ balance>0)
    "q8_semi_join" -> ((s, dir) => {
      val richCust = t(s, dir, "customer").filter(col("c_acctbal") > 5000)
        .select(col("c_nationkey"))
      t(s, dir, "supplier")
        .join(richCust, col("s_nationkey") === col("c_nationkey"), "left_semi")
        .select(col("s_suppkey"), col("s_name"))
    }),

    // set op: distinct union of nations seen on either side
    "q9_union_distinct" -> ((s, dir) =>
      t(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
        .union(t(s, dir, "supplier").select(col("s_nationkey").as("nationkey")))
        .distinct()),

    // global sort + limit (deterministic tiebreak)
    "q10_sort_limit" -> ((s, dir) =>
      t(s, dir, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(10)
        .select(col("o_orderkey"), col("o_totalprice"))),

    // distinct aggregate (two-phase: partial distinct then merge)
    "q11_distinct_agg" -> ((s, dir) =>
      t(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("n_users"),
          count(lit(1)).as("n"))),

    // exact distinct via custom bitmap TypedImperativeAggregate:
    // constant-size OR-mergeable state per group (vs countDistinct's
    // per-value expand+merge shuffle) — the precomputed-distinct
    // pattern for dense bounded id domains
    "q21_bitmap_distinct" -> ((s, dir) =>
      t(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(graft.plans.BitmapDistinctCount(col("user_id"), 1 << 20)
          .as("n_users"))),

    // hierarchical rollup (grouping-set expansion)
    "q12_rollup" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double")
            .as("sum_qty"))),

    // full cube (all grouping-set combinations)
    "q15_cube" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double")
            .as("sum_qty"))),

    // explicit grouping sets (one-dimensional marginals only — the
    // cube minus the full cross and grand total)
    "q16_grouping_sets" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .groupingSets(
          Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus"))),
          col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"))),

    // lead/lag value navigation per user (window partitioned by user —
    // state bounded per partition, scales with users)
    "q17_lead_lag" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      t(s, dir, "events").select(
        col("event_id"), col("user_id"), col("value"),
        lag(col("value"), 1).over(w).as("prev_value"),
        lead(col("value"), 1).over(w).as("next_value"))
    }),

    // sessionization: gap-based session windows per user (batch twin
    // of streaming session_window aggregation; partitioned by user)
    "q18_sessions" -> ((s, dir) =>
      t(s, dir, "events")
        .groupBy(session_window(col("ts"), "10 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n_events"))
        .select(
          unix_timestamp(col("session_window.start")).as("sess_start"),
          col("user_id"), col("n_events"))),

    // range join: each click joined to the session interval containing
    // it — equi key (user) + range predicate, so the join partitions
    // on user and the per-partition range scan is bounded (the
    // scale-correct range-join shape; a bare theta join would be n*m)
    "q24_range_join" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val sess = ev
        .groupBy(session_window(col("ts"), "10 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id").as("s_user"),
          col("session_window.start").as("s_start"),
          col("session_window.end").as("s_end"),
          col("n_events"))
      ev.filter(col("event_type") === "click")
        .join(sess,
          col("user_id") === col("s_user") &&
            col("ts") >= col("s_start") && col("ts") < col("s_end"))
        .select(col("event_id"), col("user_id"),
          unix_timestamp(col("s_start")).as("sess_start"), col("n_events"))
    }),

    // correlated scalar subqueries (Catalyst decorrelates them into
    // aggregate + join — exercising the subquery rewrite path)
    "q23_scalar_subquery" -> ((s, dir) => {
      t(s, dir, "customer").createOrReplaceTempView("customer_v")
      t(s, dir, "orders").createOrReplaceTempView("orders_v")
      s.sql(
        """SELECT c_custkey, c_name,
          |  (SELECT COUNT(*) FROM orders_v o
          |   WHERE o.o_custkey = c.c_custkey) AS n_orders,
          |  (SELECT CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 0) AS DOUBLE)
          |   FROM orders_v o WHERE o.o_custkey = c.c_custkey) AS total_spent
          |FROM customer_v c
          |WHERE (SELECT COUNT(*) FROM orders_v o
          |       WHERE o.o_custkey = c.c_custkey) >= 12""".stripMargin)
    }),

    // skew-salted equi-join: result-identical to the plain join (the
    // oracle is the plain SQL join), but a hot orderkey's rows spread
    // across saltFactor reducers instead of one
    "q22_salted_join" -> ((s, dir) =>
      graft.operators.SkewOps.saltedEquiJoin(
          t(s, dir, "lineitem").select(col("l_orderkey"), col("l_quantity")),
          t(s, dir, "orders").select(col("o_orderkey").as("l_orderkey"),
            col("o_totalprice")),
          "l_orderkey", saltFactor = 8)
        .groupBy(col("l_orderkey"))
        .agg(
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double")
            .as("sum_qty"),
          max(col("o_totalprice")).as("total"),
          count(lit(1)).as("n"))),

    // pivot: one row per user, one count column per event type
    // (explicit value list keeps the schema static and plannable)
    "q19_pivot" -> ((s, dir) =>
      t(s, dir, "events")
        .groupBy(col("user_id"))
        .pivot("event_type", Seq("click", "purchase", "view"))
        .agg(count(lit(1)))
        // fill ONLY the pivot count columns — a bare na.fill(0) would
        // also rewrite a NULL user_id group key to 0 and diverge from
        // the oracle's GROUP BY NULL row
        .na.fill(0L, Seq("click", "purchase", "view"))),

    // set ops beyond union: customer nations without suppliers
    // (except) and with suppliers (intersect)
    "q20_set_ops" -> ((s, dir) => {
      val c = t(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
      val su = t(s, dir, "supplier").select(col("s_nationkey").as("nationkey"))
      c.except(su).withColumn("op", lit("except"))
        .union(c.intersect(su).withColumn("op", lit("intersect")))
    }),

    // set ops with BAG semantics (q20's distinct twins): EXCEPT ALL /
    // INTERSECT ALL preserve multiplicities — Spark plans them as a
    // count-balancing aggregate + generator replication, never a
    // distinct — the dup-sensitive reconciliation shape (e.g. "events
    // one shard has more copies of than another")
    "q44_bag_set_ops" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val a = ev.filter(col("user_id") % 2 === 0).select(col("event_type"))
      val b = ev.filter(col("user_id") % 2 === 1).select(col("event_type"))
      a.exceptAll(b).withColumn("op", lit("except_all"))
        .union(a.intersectAll(b).withColumn("op", lit("intersect_all")))
    }),

    // exact grouped percentiles (sort-based, linear interpolation)
    "q14_percentile" -> ((s, dir) =>
      t(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(
          round(expr("percentile(value, 0.5)"), 6).as("p50"),
          round(expr("percentile(value, 0.95)"), 6).as("p95"))),

    // as-of join: each click matched to the user's most recent
    // purchase at-or-before it (window partitioned by user — scales
    // with users, state bounded per partition)
    "q13_asof_join" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val ev = t(s, dir, "events")
        .filter(col("event_type").isin("click", "purchase"))
        .select(col("event_id"), col("user_id"), col("ts"),
          when(col("event_type") === "purchase", 0).otherwise(1).as("tag"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("tag"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      ev.withColumn("last_purchase_id",
          last(when(col("tag") === 0, col("event_id")), ignoreNulls = true)
            .over(w))
        .filter(col("tag") === 1)
        .select(col("event_id").as("click_id"), col("user_id"),
          col("last_purchase_id"))
    }),

    // == LLM-data-pipeline operators (SURVEY.md §7.6) ==

    // exact dedup via hash groupBy (keeper = min doc_id)
    "d1_exact_dedup" -> ((s, dir) =>
      t(s, dir, "documents")
        .groupBy(col("text"))
        .agg(min(col("doc_id")).as("keeper"), count(lit(1)).as("n_dups"))),

    // token statistics (token counting)
    "t1_token_stats" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"), cleanTokens.as("toks"))
        .select(
          col("doc_id"),
          size(col("toks")).as("n_tokens"),
          size(array_distinct(col("toks"))).as("n_uniq"),
          length(concat_ws("", col("toks"))).as("n_alpha_chars"))),

    // quality scoring: ratios from exact integer counts (IEEE-exact)
    "t2_quality" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"), col("text"), cleanTokens.as("toks"))
        .select(
          col("doc_id"),
          (length(regexp_replace(col("text"), "[^A-Za-z]", "")) /
            nullif(length(col("text")), lit(0))).as("alpha_ratio"),
          (size(TextOps.removeStopWords(col("toks"))).cast("double") /
            nullif(size(col("toks")), lit(0))).as("content_ratio"),
          (length(concat_ws("", col("toks"))).cast("double") /
            nullif(size(col("toks")), lit(0))).as("avg_token_len"))),

    // language ID: marker-word scoring with deterministic argmax
    // (the single langPredCol definition m12/m13 also consume)
    "t3_lang_id" -> ((s, dir) =>
      t(s, dir, "documents").select(
        col("doc_id"), langPredCol.as("pred_lang"))),

    // keep-latest-per-key compaction (the CDC/upsert read shape):
    // newest event per (user, type) by (ts desc, event_id desc) —
    // total order, deterministic survivor; WindowGroupLimit prunes to
    // 1 per key map-side before the single keyed window
    "q45_latest_per_key" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"), col("event_type"))
        .orderBy(col("ts").desc, col("event_id").desc)
      t(s, dir, "events")
        .select(col("user_id"), col("event_type"), col("event_id"),
          col("value"), row_number().over(w).as("rn"))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_type"), col("event_id"),
          col("value"))
    }),

    // evaluation: confusion matrix of the t3 language-ID heuristic
    // against the labeled lang column — one keyed aggregate over the
    // (actual, predicted) pairs; the per-class quality readout every
    // classifier eval starts with (m10/m11's categorical sibling)
    "m12_confusion" -> ((s, dir) => langConfusion(s, dir)),

    // per-class precision / recall / F1 from the m12 matrix, as
    // BIGINT micro-units via integer div — ratios of integer counts
    // are exactly the tie-prone quantity float round(x, 6) mishandles
    // (the q29 lesson), and integer arithmetic is engine-stable by
    // construction. F1 spelled 2·tp div (n_pred + n_actual) since
    // n_pred + n_actual = 2·tp + fp + fn.
    // real BPE vocabulary fit: 8 greedy pair merges over the corpus
    // word frequencies (t5 counts merge CANDIDATES; this trains the
    // merge table itself — the m7 LR-refit loop applied to tokenization)
    "m14_bpe_fit" -> ((s, dir) =>
      graft.operators.CorpusOps.bpeFit(
        t(s, dir, "documents"), cleanTokens, nMerges = 8)),

    "m13_prf" -> ((s, dir) => {
      // cm feeds three consumers (act/prd/tp) on DIFFERENT keys, so
      // exchange reuse cannot cover them — persist the <=25-row
      // matrix instead of tokenizing the corpus three times (the
      // harness clearCache()s between queries; library callers hold
      // the d4-style release discipline)
      val cm = langConfusion(s, dir)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val act = cm.groupBy(col("lang")).agg(sum(col("n")).as("n_actual"))
      val prd = cm.groupBy(col("pred_lang")).agg(sum(col("n")).as("n_pred"))
      val tp = cm.filter(col("lang") === col("pred_lang"))
        .select(col("lang"), col("n").as("tp"))
      act
        .join(tp, Seq("lang"), "left_outer")
        .join(prd.withColumnRenamed("pred_lang", "lang"), Seq("lang"), "left_outer")
        .select(col("lang"),
          coalesce(col("tp"), lit(0L)).as("tp"),
          col("n_actual"),
          coalesce(col("n_pred"), lit(0L)).as("n_pred"),
          expr("(1000000 * coalesce(tp, 0L)) div nullif(coalesce(n_pred, 0L), 0)")
            .as("precision_u"),
          expr("(1000000 * coalesce(tp, 0L)) div n_actual").as("recall_u"),
          expr("(2000000 * coalesce(tp, 0L)) div (coalesce(n_pred, 0L) + n_actual)")
            .as("f1_u"))
    }),

    // document fingerprinting: full-content hash + min-shingle hash
    "t4_fingerprint" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"), cleanTokens.as("toks"))
        .select(
          col("doc_id"),
          md5(concat_ws(" ", col("toks"))).as("fp"),
          when(size(col("toks")) >= 3,
            array_min(transform(
              sequence(lit(0), size(col("toks")) - 3),
              i => md5(concat_ws(" ",
                element_at(col("toks"), i + 1),
                element_at(col("toks"), i + 2),
                element_at(col("toks"), i + 3))))))
            .as("min_shingle_fp"))),

    // BPE-ish regex token count (letters runs | digit runs | symbols)
    "t5_bpe_tokens" -> ((s, dir) =>
      t(s, dir, "documents").select(
        col("doc_id"),
        expr("size(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]', 0))")
          .as("n_bpe"))),

    // == dedup family (SURVEY.md §7.6; narrow signature + LSH join) ==

    // MinHash signatures → per-doc LSH band keys (char-trigram sets)
    "d2_minhash_sig" -> ((s, dir) => {
      val sig = DedupOps.withMinhashSignature(
        t(s, dir, "documents"), "doc_id", "text")
      sig.select(col("doc_id") +:
        DedupOps.bandKeys(col("sig")).zipWithIndex
          .map { case (k, i) => k.as(s"b$i") }: _*)
    }),

    // MinHash LSH candidate pairs (band bucket self-join)
    "d2b_minhash_pairs" -> ((s, dir) =>
      DedupOps.minhashCandidatePairs(t(s, dir, "documents"), "doc_id", "text")),

    // 60-bit SimHash fingerprints (tf-weighted, narrow one-pass)
    "d3_simhash" -> ((s, dir) =>
      DedupOps.withSimhash(t(s, dir, "documents"), "doc_id", cleanTokens)),

    // SimHash hamming-distance pairs via 4x15-bit pigeonhole banding
    "d3b_simhash_pairs" -> ((s, dir) =>
      DedupOps.simhashHammingPairs(
        t(s, dir, "documents"), "doc_id", cleanTokens, maxHamming = 3)),

    // n-gram Jaccard verification of MinHash-LSH candidate pairs —
    // the scale pipeline: candidate generation is LSH-bounded (never
    // O(n^2)); the exact intersect runs only on candidates. One
    // array_intersect per pair: |A∪B| = |A|+|B|-|A∩B| with set sizes
    // precomputed; staged projections keep Catalyst from inlining
    // (and thus duplicating) the intersect.
    "d4_ngram_jaccard" -> ((s, dir) =>
      DedupOps.nearDuplicatePairs(
        t(s, dir, "documents"), "doc_id", "text", threshold = 0.6)),

    // edit-distance verification of LSH candidate pairs (catches
    // small in-place edits that trigram Jaccard scores leniently)
    "d6_edit_distance" -> ((s, dir) =>
      DedupOps.editDistancePairs(
        t(s, dir, "documents"), "doc_id", "text", maxDist = 100)),

    // embedding-cosine near-dup pairs via sign-LSH banding
    "d5_embed_neardup" -> ((s, dir) =>
      SimilarityOps.embeddingNearDupPairs(
        t(s, dir, "embeddings"), "vec_id", "embedding", 0.45)),

    // == similarity search over embeddings ==

    // brute-force exact cosine top-5 for a broadcast query set
    "s1_ann_topk" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      SimilarityOps.bruteForceTopK(
        e, e.filter(col("vec_id") < 10), "vec_id", "embedding", 5)
    }),

    // sign-LSH bucketed ANN top-3 (the scale path)
    "s2_ann_lsh" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      SimilarityOps.lshTopK(
        e, e.filter(col("vec_id") < 10), "vec_id", "embedding", 3)
    }),

    // cross-corpus ANN JOIN: both sides large (even vs odd split of
    // the embedding table standing in for crawl-vs-training-set), no
    // broadcast — band-keyed shuffle join + bounded-state top-k
    "s8_ann_join" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      SimilarityOps.lshJoinTopK(
        e.filter(pmod(col("vec_id"), lit(2)) === 0),
        e.filter(pmod(col("vec_id"), lit(2)) === 1),
        "vec_id", "embedding", 3)
    }),

    // embedding-space governance: pairwise cosine between per-label
    // centroids (classes-separable / sources-drift-together readout,
    // d12's embedding twin). Engine-stable by construction: each
    // float is quantized ONCE via floor-micro-units (pure IEEE ops —
    // the q29 pattern; FLOAT->DECIMAL casts are a dialect trap, Spark
    // goes through the shortest decimal repr where DuckDB keeps the
    // exact binary value), the per-dim centroid is an integer-div
    // mean of exact BIGINT sums (div truncation parity with // is
    // m13's), and all dots/norms are then exact integer arithmetic —
    // one irrational sqrt/round at the very end (the safe one-shot
    // class). Plan: posexplode (narrow) -> one keyed agg to a
    // |labels|x|dims| table (640 rows here, tiny at ANY corpus size)
    // -> self-join on dim over that tiny table. The only full-data
    // pass is the map-side-partial agg; cmu is bounded 1e6 by
    // construction so nothing overflows at any corpus size.
    "s9_centroid_sim" -> ((s, dir) => {
      val cent = t(s, dir, "embeddings")
        .select(col("label"), posexplode(col("embedding")).as(Seq("dim", "v")))
        .select(col("label"), col("dim"),
          floor(col("v").cast("double") * lit(1e6)).as("vu"))
        .groupBy(col("label"), col("dim"))
        .agg(expr("sum(vu) div count(1)").as("cmu"))
        .persist()
      val nrm = cent.groupBy(col("label"))
        .agg(sum(col("cmu") * col("cmu")).as("nrm2"))
        .filter(col("nrm2") > 0)
      cent.as("a")
        .join(cent.as("b"),
          col("a.dim") === col("b.dim") && col("a.label") < col("b.label"))
        .groupBy(col("a.label").as("label_a"), col("b.label").as("label_b"))
        .agg(sum(col("a.cmu") * col("b.cmu")).as("dot"))
        .join(nrm.as("x"), col("label_a") === col("x.label"))
        .join(nrm.as("y"), col("label_b") === col("y.label"))
        .select(col("label_a"), col("label_b"),
          round(col("dot") / (sqrt(col("x.nrm2")) * sqrt(col("y.nrm2"))), 6)
            .as("cos_sim"))
    }),

    // IVF-bucketed ANN top-3 (coarse quantizer + probed cells)
    "s3_ann_ivf" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      SimilarityOps.ivfTopK(
        e, e.filter(col("vec_id") < 10), "vec_id", "embedding",
        numCentroids = 16, probes = 2, k = 3)
    }),

    // product-quantization ANN top-3: 4 subspaces x 16-centroid
    // codebooks (corpus-prefix codebook, like s3's quantizer),
    // asymmetric distance over the code table
    "s4_ann_pq" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      SimilarityOps.pqTopK(
        e, e.filter(col("vec_id") < 10), e.filter(col("vec_id") < 16),
        "vec_id", "embedding", subspaces = 4, k = 3)
    }),

    // IVF-PQ composition: coarse cells (full distance = sum of
    // subspace distances) + ADC over codes, probed cells only
    "s5_ann_ivfpq" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      SimilarityOps.ivfPqTopK(
        e, e.filter(col("vec_id") < 10), e.filter(col("vec_id") < 16),
        "vec_id", "embedding", subspaces = 4, probes = 2, k = 3)
    }),

    // sparse-vector similarity: TF-IDF cosine pairs through an
    // inverted-index join (CorpusOps.tfidfCosinePairs) — documents
    // meet only through shared terms, Σ df² bounded by the maxDf
    // vocabulary cut, never all-pairs. Word-BIGRAM vocabulary (the
    // unigram vocab of the synthetic corpus is 31 terms — too coarse
    // to discriminate); sequence() is guarded because Spark's
    // sequence(1, 0) DESCENDS where DuckDB's range(1, 1) is empty.
    "s6_tfidf_pairs" -> ((s, dir) => {
      val d0 = t(s, dir, "documents").select(col("doc_id"), cleanTokens.as("toks"))
      val bigrams = when(size(col("toks")) >= 2,
        expr("transform(sequence(1, size(toks) - 1), " +
          "i -> concat(toks[i - 1], ' ', toks[i]))"))
        .otherwise(array().cast("array<string>"))
      CorpusOps.tfidfCosinePairs(d0, "doc_id", bigrams,
        maxDf = 100L, minCos = 0.3)
    }),

    // hard-negative mining — the contrastive-training pair generator:
    // per anchor, the top-3 MOST SIMILAR vectors with a DIFFERENT
    // label (easy negatives are useless; the near-boundary ones carry
    // the gradient signal). s1's broadcast-anchor shape with a label
    // predicate in the join; deterministic top-k (sim desc, id).
    "s11_hard_negatives" -> ((s, dir) => {
      // zero-norm guards on BOTH sides (the s7/s8 lesson: 0/0 is NULL
      // in Spark but NaN in DuckDB, and NaN sorts FIRST under desc)
      val e = t(s, dir, "embeddings")
        .filter(SimilarityOps.dotD(col("embedding"), col("embedding")) > 0)
      val anchors = broadcast(e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("a_id"), col("label").as("a_label"),
          col("embedding").as("a_emb")))
      val scored = e.join(anchors,
          col("vec_id") =!= col("a_id") && col("label") =!= col("a_label"))
        .select(col("a_id"), col("vec_id"),
          SimilarityOps.cosine6(col("a_emb"), col("embedding")).as("sim"))
      val w = Window.partitionBy(col("a_id"))
        .orderBy(col("sim").desc, col("vec_id"))
      scored.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
    }),

    // ANN recall@5 eval — the quality metric every approximate index
    // deployment tracks: per query, how many of the sign-LSH top-5
    // (s2's shape) appear in the exact brute-force top-5 (s1's
    // shape). Both sides are deterministic (sim desc, id tiebreak),
    // the overlap is an equi-join on unique (q, id) pairs, and recall
    // is integer micro-units (count ratio — the q29 tie class). At
    // scale the eval runs on a sampled query set exactly like this
    // broadcast one; the corpus-side cost is the two operators'.
    "q54_ann_recall" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val q = e.filter(col("vec_id") < 10)
      val exact = SimilarityOps.bruteForceTopK(e, q, "vec_id", "embedding", 5)
        .select(col("q_id"), col("vec_id"))
      val approx = SimilarityOps.lshTopK(e, q, "vec_id", "embedding", 5)
        .select(col("q_id"), col("vec_id"))
      val hits = approx.join(exact, Seq("q_id", "vec_id"))
        .groupBy(col("q_id")).agg(count(lit(1)).as("__h"))
      q.select(col("vec_id").as("q_id"))
        .join(hits, Seq("q_id"), "left")
        .select(col("q_id"), coalesce(col("__h"), lit(0L)).as("n_hit"))
        .withColumn("recall_mu", expr("(1000000 * n_hit) div 5"))
    }),

    // int8 scalar quantization (SQ8) — the embedding-compression path
    // every vector index at corpus scale runs (4x storage cut before
    // the PQ/IVF machinery of s3-s5): per-vector symmetric scale
    // max|v|/127, code = floor(v*127/vmax + 0.5) (floor(x+0.5) is
    // identical IEEE in both engines; round() is not), and the
    // reconstruction-error census in exact integer nano-units —
    // per-element floor quantization, BIGINT fold, integer-div mean.
    // Pure narrow transform, no shuffle at any corpus size.
    "s10_sq8_quantize" -> ((s, dir) =>
      t(s, dir, "embeddings")
        .filter(size(col("embedding")) > 0)
        .select(col("vec_id"), col("embedding"),
          greatest(abs(expr("cast(array_max(embedding) as double)")),
            abs(expr("cast(array_min(embedding) as double)"))).as("vmax"))
        .filter(col("vmax") > 0)
        .withColumn("codes",
          expr("transform(embedding, v -> " +
            "cast(floor(cast(v as double) * 127.0 / vmax + 0.5) as int))"))
        .select(col("vec_id"),
          floor(col("vmax") * lit(1e6)).as("vmax_mu"),
          size(col("codes")).as("n_dims"),
          // coalesce per element: a NULL array element would NULL the
          // whole Spark fold while DuckDB's list_sum SKIPS nulls —
          // treating it as 0 matches the oracle's skip semantics
          expr("aggregate(zip_with(embedding, codes, (v, c) -> " +
            "cast(floor(abs(cast(v as double) - c * vmax / 127.0) * 1e9) " +
            "as bigint)), 0L, (acc, x) -> acc + coalesce(x, 0L))")
            .as("sum_err_nano"))
        .withColumn("mean_err_nano", expr("sum_err_nano div n_dims"))),

    // SemDeDup (Abbas et al. 2023): nearest-cell assignment against
    // broadcast coarse cells, within-cell cosine prune at 0.45 (this
    // corpus's planted near-dup level, cf. d5), min-id kept — the
    // cell bound is the explicit capacity/recall trade that keeps the
    // pair stream finite at corpus scale
    "s7_semantic_dedup" -> ((s, dir) =>
      SimilarityOps.semanticDedup(
        t(s, dir, "embeddings"), "vec_id", "embedding",
        numCentroids = 16, minCos = 0.45)),

    // corpus vocabulary + idf (training-side CountVectorizer/IDF twin)
    "m6_vocab" -> ((s, dir) =>
      CorpusOps.vocabularyWithIdf(
        t(s, dir, "documents"), "doc_id", cleanTokens, limit = 500)),

    // winnowing rolling-hash fingerprint (min of 8-char window hashes)
    "t6_rolling_fp" -> ((s, dir) =>
      t(s, dir, "documents").select(
        col("doc_id"), DedupOps.rollingFingerprint(col("text")).as("roll_fp"))),

    // deterministic corpus subsample: keep docs whose content hash
    // lands in a fixed residue class — reproducible across runs and
    // cluster sizes (unlike rand()-based sample), narrow, no shuffle
    "t7_det_sample" -> ((s, dir) =>
      t(s, dir, "documents")
        .filter(pmod(DedupOps.md5Hash32(col("text")), lit(10)) === 0)
        .select(col("doc_id"), col("lang"))),

    // sequence packing for training: docs go into 32 hash buckets,
    // each bucket packs greedily (in doc_id order) into 4096-token
    // bins via a running token count. The window is partitioned by
    // bucket, so state and sort are per-bucket — scales with buckets
    // x executors, never a global sort (the bucket count would be
    // sized ~ cluster parallelism at 100 TB)
    "t8_seq_pack" -> ((s, dir) => {
      val w = Window.partitionBy(col("bucket")).orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "documents")
        .select(col("doc_id"), cleanTokens.as("toks"))
        .select(col("doc_id"), size(col("toks")).as("n_tokens"),
          pmod(DedupOps.md5Hash32(col("doc_id").cast("string")), lit(32))
            .as("bucket"))
        .withColumn("cum", sum(col("n_tokens")).over(w))
        .select(col("doc_id"), col("bucket"), col("n_tokens"),
          floor((col("cum") - col("n_tokens")) / 4096).as("bin"))
    }),

    // near-dup cluster closure: the pair detectors (d2b..d6) emit
    // pairs; an actual dedup pass needs the transitive closure and one
    // representative per cluster. MinHash-LSH candidate pairs →
    // connected components (alternating large-star/small-star,
    // O(log^2 n) shuffle rounds — never a driver-side union-find) →
    // cluster label = component-min doc id + cluster size.
    "d7_dedup_clusters" -> ((s, dir) => {
      val pairs = DedupOps.minhashCandidatePairs(
        t(s, dir, "documents"), "doc_id", "text")
      GraphOps.connectedComponents(pairs, "doc_a", "doc_b")
        .select(col("node").as("doc_id"), col("component").as("cluster"))
        .withColumn("csize",
          count(lit(1)).over(Window.partitionBy(col("cluster"))))
    }),

    // train/benchmark decontamination (the GPT-3-appendix pattern):
    // flag training docs sharing any word 5-gram with a held-out set.
    // The held-out split is hash-deterministic (reproducible across
    // runs/cluster sizes); gram hashes are md5 so the oracle matches
    // exactly. At 100 TB the benchmark gram set is tiny vs the corpus
    // — broadcast it; the corpus side stays narrow (explode + one
    // broadcast-join probe, no corpus shuffle before the per-doc agg).
    "d8_decontaminate" -> ((s, dir) => {
      val grams = t(s, dir, "documents")
        .select(col("doc_id"), cleanTokens.as("toks"),
          (pmod(DedupOps.md5Hash32(col("doc_id").cast("string")), lit(10)) === 0)
            .as("is_test"))
        // streamed generator — no per-doc gram array materialized
        // (plans.NgramGenerate; the transform+slice spelling is its
        // parity oracle in NgramGenerateSpec)
        .select(col("doc_id"), col("is_test"),
          graft.plans.NgramGenerate.of(col("toks"), 5).as("ng"))
        .select(col("doc_id"), col("is_test"), md5(col("ng")).as("gh"))
      val testGrams = grams.filter(col("is_test")).select(col("gh")).distinct()
      grams.filter(!col("is_test"))
        .join(broadcast(testGrams), "gh")
        .groupBy(col("doc_id"))
        .agg(count_distinct(col("gh")).as("n_shared"))
    }),

    // repetition-based quality (Gopher-style): repeated-word fraction
    // and the most-frequent-bigram share of all word bigrams. The
    // bigram mode is explode → (doc, bigram) count → per-doc max/sum —
    // two key-partitioned aggregations, no per-doc state beyond the
    // group row, so the shape is flat at any corpus size.
    "t9_repetition" -> ((s, dir) => {
      val d = t(s, dir, "documents")
        .select(col("doc_id"), cleanTokens.as("toks"))
      val bi = d.select(col("doc_id"),
          graft.plans.NgramGenerate.of(col("toks"), 2).as("bg"))
        .groupBy(col("doc_id"), col("bg")).agg(count(lit(1)).as("cnt"))
        .groupBy(col("doc_id"))
        .agg(max(col("cnt")).as("maxc"), sum(col("cnt")).as("sumc"))
      d.select(col("doc_id"),
          (lit(1) - size(array_distinct(col("toks"))).cast("double") /
            nullif(size(col("toks")), lit(0))).as("dup_word_frac"))
        .join(bi, Seq("doc_id"), "left")
        .select(col("doc_id"), col("dup_word_frac"),
          (col("maxc").cast("double") / col("sumc")).as("top_bigram_frac"))
    }),

    // bigram-LM fluency score (CCNet/KenLM-style quality filter):
    // corpus-fit add-one bigram model, per-doc mean log-probability
    "t10_bigram_lm" -> ((s, dir) =>
      CorpusOps.bigramLmScores(t(s, dir, "documents"), "doc_id", cleanTokens)),

    // duplicated-span measurement (the span-level signal behind
    // "Deduplicating Training Data Makes Language Models Better",
    // Lee et al. 2022): per doc, the fraction of its word 8-gram
    // occurrences that appear in at least one other document. Two
    // key-partitioned aggregations over the exploded gram stream —
    // the same shuffles an exact substring-dedup pass needs at scale.
    "d9_dup_spans" -> ((s, dir) => {
      val g = t(s, dir, "documents")
        .select(col("doc_id"), cleanTokens.as("toks"))
        .select(col("doc_id"),
          graft.plans.NgramGenerate.of(col("toks"), 8).as("ng"))
        .select(col("doc_id"), md5(col("ng")).as("gh"))
      val gd = g.groupBy(col("gh")).agg(count_distinct(col("doc_id")).as("nd"))
      g.join(gd, "gh")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_grams"),
          sum(when(col("nd") > 1, 1L).otherwise(0L)).as("n_dup"))
        .select(col("doc_id"), col("n_grams"), col("n_dup"),
          (col("n_dup").cast("double") / col("n_grams")).as("dup_frac"))
    }),

    // end-to-end corpus dedup (the d4+d7 capstone): verified near-dup
    // pairs → cluster closure → one representative per cluster
    "d10_dedup_keep" -> ((s, dir) =>
      DedupOps.deduplicateCorpus(
          t(s, dir, "documents"), "doc_id", "text", threshold = 0.6)
        .select(col("doc_id"), col("lang"))),

    // stratified deterministic sampling: per-language keep rates via
    // hash residues — downsample the dominant language, keep the
    // rare ones (training-mix balancing). Reproducible across runs
    // and cluster sizes; narrow, no shuffle.
    "q25_stratified_sample" -> ((s, dir) =>
      t(s, dir, "documents")
        .withColumn("r", pmod(DedupOps.md5Hash32(col("text")), lit(100)))
        .filter(col("r") <
          when(col("lang") === "en", 20)
            .when(col("lang") === "de", 50)
            .when(col("lang") === "es", 50)
            .when(col("lang") === "fr", 80)
            .otherwise(100))
        .select(col("doc_id"), col("lang"), col("source"))),

    // quality-policy dedup (d10's practical variant): per near-dup
    // cluster keep the LONGEST member, not the min id — the "keep the
    // best copy" policy real corpus pipelines use
    "d11_dedup_keepbest" -> ((s, dir) =>
      DedupOps.deduplicateCorpusKeepBest(
          t(s, dir, "documents"), "doc_id", "text", threshold = 0.6,
          quality = col("n_chars"))
        .select(col("doc_id"), col("lang"), col("n_chars"))),

    // BOTH keep policies from ONE LSH→verify→closure pass
    // (DedupOps.dedupPipelineReleasable): d10 and d11 as standalone
    // queries each pay the full prefix — the composed shape is what a
    // real pipeline runs when it wants to compare policies, and it
    // pays the dominant cost once (the cluster labels stay
    // materialized across both policy branches).
    "d13_dedup_policies" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val (keepMin, keepBest, _) = DedupOps.dedupPipelineReleasable(
        docs, "doc_id", "text", threshold = 0.6)
      keepMin.select(col("doc_id"), lit("min_id").as("policy"))
        .unionByName(keepBest(col("n_chars"))
          .select(col("doc_id"), lit("keep_best").as("policy")))
    }),

    // incremental ingestion dedup: a delta batch (doc_id % 5 = 0
    // standing in for today's crawl) admitted against the base corpus
    // (the rest) — band-keyed delta-vs-base join, trigram-Jaccard
    // verify on collisions only, dup_of = smallest matching base id
    // (NULL = admitted). The shape that NEVER re-pairs base-vs-base:
    // per-batch cost rides the delta, not the 100 TB corpus.
    "d14_incremental_dedup" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      DedupOps.incrementalDedupReleasable(
        docs.filter(pmod(col("doc_id"), lit(5)) =!= 0),
        docs.filter(pmod(col("doc_id"), lit(5)) === 0),
        "doc_id", "text", threshold = 0.6)._1
    }),

    // character-entropy quality signal (low-entropy docs are boiler-
    // plate/garbage): unigram char entropy from exact counts. Explode
    // is positional (substring probe), both aggregations key on
    // doc_id so the second reuses the window's exchange; entropy
    // terms quantized to DECIMAL so the per-doc sum is order-free.
    "t11_char_entropy" -> ((s, dir) => {
      val w = Window.partitionBy(col("doc_id"))
      t(s, dir, "documents")
        .filter(length(col("text")) >= 1)
        .select(col("doc_id"), col("text"),
          explode(sequence(lit(1), length(col("text")))).as("i"))
        .select(col("doc_id"), expr("substring(text, i, 1)").as("ch"))
        .groupBy(col("doc_id"), col("ch")).agg(count(lit(1)).as("c"))
        .withColumn("n", sum(col("c")).over(w))
        .select(col("doc_id"), col("n"),
          (col("c") * round(log(col("c").cast("double") / col("n")), 6)
            .cast("decimal(18,6)")).as("term"))
        .groupBy(col("doc_id"), col("n"))
        .agg(sum(col("term")).as("st"))
        .select(col("doc_id"), col("n").as("n_scored_chars"),
          (lit(0.0) - (col("st").cast("double") / col("n"))).as("char_entropy"))
    }),

    // distributed re-fit of the reference's LogisticRegression stage
    // (full-batch gradient descent, 3 steps at lr 0.5; quality
    // features -> is-English target). One map-reduce pass per step;
    // only k gradient cells reach the driver. Deterministic to the
    // bit across engines and cluster sizes (see logisticFitWeights).
    "m7_lr_fit" -> ((s, dir) => {
      val w = CorpusOps.logisticFitWeights(
        lrFitFeatures(s, dir), "y", LrFitCols, iters = 3, lr = 0.5)
      import s.implicits._
      Seq(("bias", w(0)), ("x1", w(1)), ("x2", w(2)), ("x3", w(3)))
        .toDF("feature", "weight")
    }),

    // exact ROC-AUC of the m7-fit classifier WITHOUT a global row
    // sort: scores quantize to 6 dp, so the rank pass runs over the
    // score HISTOGRAM — distinct scores are bounded by quantization
    // (≤ 1e6 + 1 rows) at ANY corpus size, so the ordered window here
    // is a bounded constant, not an unpartitioned-window scale hazard.
    // AUC = P(score₊ > score₋) + P(tie)/2 via the Mann–Whitney U
    // statistic; the numerator stays integer (2·U) until one final
    // division, so the value is bit-deterministic across engines and
    // cluster sizes.
    "m10_auc" -> ((s, dir) => {
      val feats = lrFitFeatures(s, dir)
      val w = CorpusOps.logisticFitWeights(feats, "y", LrFitCols,
        iters = 3, lr = 0.5)
      val z = LrFitCols.zip(w).map { case (c, wi) => lit(wi) * col(c) }
        .reduceLeft(_ + _)
      val hist = feats
        .select(col("y"), round(lit(1.0) / (lit(1.0) + exp(-z)), 6).as("p"))
        .groupBy(col("p"))
        .agg(sum(when(col("y") === 1.0, 1L).otherwise(0L)).as("np"),
          sum(when(col("y") === 1.0, 0L).otherwise(1L)).as("nn"))
      val cum = Window.orderBy(col("p"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      hist
        .withColumn("cumneg", sum(col("nn")).over(cum) - col("nn"))
        .agg(sum(col("np") * (lit(2L) * col("cumneg") + col("nn"))).as("u2"),
          sum(col("np")).as("n_pos"), sum(col("nn")).as("n_neg"))
        .select((col("u2") / (lit(2.0) * col("n_pos") * col("n_neg"))).as("auc"),
          col("n_pos"), col("n_neg"))
    }),

    // multinomial Naive Bayes fit over the token stream (class =
    // lang): add-one-smoothed conditionals + class priors, top-10
    // terms per class. All key-partitioned aggs with map-side
    // combine; class totals fold from the (class, term) counts.
    "m8_nb_fit" -> ((s, dir) =>
      CorpusOps.naiveBayesModel(
        t(s, dir, "documents"), "lang", cleanTokens, topK = 10)),

    // ordered event funnel: first view, first click AFTER it, first
    // purchase after that, per user. Each step is a type-pushed scan
    // (PushedFilters: event_type = ...) joined on user_id against the
    // shrinking previous step, then a key-partitioned min — the
    // standard distributed funnel; nothing per-user ever collects.
    "q26_funnel" -> ((s, dir) => {
      val ev = t(s, dir, "events")
        .select(col("user_id"), col("event_type"), col("ts"))
      val v = ev.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("ts")).as("t_view"))
      val c = ev.filter(col("event_type") === "click").join(v, "user_id")
        .filter(col("ts") > col("t_view"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("t_click"))
      val p = ev.filter(col("event_type") === "purchase").join(c, "user_id")
        .filter(col("ts") > col("t_click"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("t_purchase"))
      v.join(c, Seq("user_id"), "left").join(p, Seq("user_id"), "left")
        .select(col("user_id"),
          unix_timestamp(col("t_view")).as("view_s"),
          unix_timestamp(col("t_click")).as("click_s"),
          unix_timestamp(col("t_purchase")).as("purchase_s"))
    }),

    // unpivot/melt: the inverse of q19's pivot — wide per-flag measure
    // columns back to long (measure, value) rows. The unpivot is a
    // local Expand over the (tiny) aggregate output; no extra shuffle
    // beyond the aggregation's own.
    "q27_unpivot" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"),
          sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("sum_price"),
          sum(col("l_discount").cast("decimal(18,4)")).cast("double").as("sum_disc"),
          sum(col("l_tax").cast("decimal(18,4)")).cast("double").as("sum_tax"))
        .unpivot(Array(col("l_returnflag")),
          Array(col("sum_qty"), col("sum_price"), col("sum_disc"), col("sum_tax")),
          "measure", "value")),

    // rolling time-range frame: per event, the same user's trailing-
    // hour event count and value sum (RANGE on epoch seconds, so ties
    // within a second share one frame — order-insensitive). The frame
    // state is per-user and streams with the partition sort; there is
    // never a global sort. Value sums ride DECIMAL so the frame-slide
    // arithmetic is exact and order-free.
    "q28_rolling_window" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("es")).rangeBetween(-3600L, 0L)
      t(s, dir, "events")
        .select(col("event_id"), col("user_id"),
          unix_timestamp(col("ts")).as("es"),
          col("value").cast("decimal(18,4)").as("v"))
        .select(col("event_id"), col("user_id"), col("es"),
          count(lit(1)).over(w).as("n_1h"),
          sum(col("v")).over(w).cast("double").as("v_1h"))
    }),

    // ROWS-frame moving average (q28's RANGE sibling): trailing-4-row
    // mean per user under a total order. The frame sum rides DECIMAL
    // — DuckDB evaluates sliding windows with a segment tree, so a
    // DOUBLE frame sum would re-associate float addition and drift
    // from Spark's streaming accumulation; exact DECIMAL makes the
    // slide order-free — and the mean is one final double division.
    "q46_moving_avg" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id")).rowsBetween(-3, 0)
      t(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("ts"),
          col("value").cast("decimal(18,4)").as("v"))
        .select(col("event_id"), col("user_id"),
          (sum(col("v")).over(w).cast("double") /
            count(lit(1)).over(w)).as("avg_4"))
    }),

    // capstone composition — the LLM data-prep pipeline END TO END in
    // one declarative plan: length/token quality gate → exact dedup
    // (min-id per content hash, WindowGroupLimit-pruned) →
    // deterministic 50% hash-residue sample → per-language mix
    // report. Every stage is an operator proven elsewhere (t2, d1,
    // t7, q1-family); the point is that they COMPOSE into a single
    // Catalyst plan with no materialization barriers between stages.
    "p7_prep_pipeline" -> ((s, dir) => {
      val w = Window.partitionBy(md5(col("text"))).orderBy(col("doc_id"))
      t(s, dir, "documents")
        .select(col("doc_id"), col("lang"), col("text"), col("n_chars"),
          cleanTokens.as("toks"))
        .filter(col("n_chars").between(100, 5000) && size(col("toks")) >= 10)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .filter(pmod(DedupOps.md5Hash32(col("text")), lit(2)) === 0)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          (sum(size(col("toks")).cast("decimal(18,0)")).cast("double") /
            count(lit(1))).as("avg_tokens"))
    }),

    // Pearson correlation from DECIMAL-exact sufficient statistics
    // (n, Σx, Σy, Σx², Σy², Σxy): the built-in corr/covar aggregates
    // accumulate running double moments — order-dependent, so
    // engine-unstable — where the sufficient-statistics spelling is
    // one keyed aggregate of exact sums (map-side partials, constant
    // merge state) and the algebra runs once per group on identical
    // doubles. Correlates value with hour-of-day per event type.
    "q50_corr" -> ((s, dir) => {
      val xy = t(s, dir, "events")
        .select(col("event_type"), col("value").as("x"),
          hour(col("ts")).cast("double").as("y"))
      def d(c: Column): Column = c.cast("decimal(28,8)")
      xy.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(d(col("x"))).cast("double").as("sx"),
          sum(d(col("y"))).cast("double").as("sy"),
          sum(d(col("x") * col("x"))).cast("double").as("sxx"),
          sum(d(col("y") * col("y"))).cast("double").as("syy"),
          sum(d(col("x") * col("y"))).cast("double").as("sxy"))
        .select(col("event_type"), col("n"),
          // greatest(·, 0) guards the q39 cancellation class (a
          // zero-variance side would sqrt a tiny negative: NaN in
          // Spark, hard error in DuckDB); nullif keeps the
          // undefined-correlation case a NULL row on both engines
          ((col("n") * col("sxy") - col("sx") * col("sy")) /
            nullif(
              sqrt(greatest(col("n") * col("sxx") - col("sx") * col("sx"),
                lit(0.0))) *
              sqrt(greatest(col("n") * col("syy") - col("sy") * col("sy"),
                lit(0.0))), lit(0.0)))
            .as("corr_xy"))
    }),

    // schema-drift union: two feeds with different column sets,
    // aligned BY NAME with missing columns null-filled — the
    // ingestion-time reality unionByPosition silently corrupts
    // (DuckDB spells it UNION ALL BY NAME)
    "q48_union_by_name" -> ((s, dir) => {
      val a = t(s, dir, "documents")
        .select(col("doc_id"), col("lang"), col("n_chars"))
      val b = t(s, dir, "documents")
        .select(col("doc_id"), col("source"), col("lang"))
      a.unionByName(b, allowMissingColumns = true)
    }),

    // null-safe equality join (<=>): NULL keys MATCH each other,
    // where plain = drops them — the semantics reconciliation jobs
    // need when "unknown" is a real group. Both sides aggregate
    // first, so the null group joins 1:1, not cross-product.
    // DuckDB spells the operator IS NOT DISTINCT FROM.
    "q49_null_safe_join" -> ((s, dir) => {
      val e = t(s, dir, "events")
        .select(nullif(col("event_type"), lit("click")).as("k"), col("value"))
      val a = e.groupBy(col("k")).agg(count(lit(1)).as("n_a"))
      val b = e.groupBy(col("k").as("kb"))
        .agg(sum(col("value").cast("decimal(18,4)")).cast("double").as("sum_b"))
      a.join(b, col("k") <=> col("kb"))
        .select(col("k"), col("n_a"), col("sum_b"))
    }),

    // monthly revenue trend + month-over-month delta: date_trunc
    // bucketing into a BOUNDED month table (one row per month, ever),
    // so the global lag window is safe — the one case an
    // unpartitioned window is the right call. DECIMAL revenue sums;
    // months emit as epoch BIGINT per the oracle convention.
    "q47_monthly_trend" -> ((s, dir) => {
      val m = t(s, dir, "orders")
        .groupBy(date_trunc("month", col("o_orderdate")).as("mth"))
        .agg(count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast("decimal(18,2)"))
            .cast("double").as("revenue"))
      val w = Window.orderBy(col("mth"))
      m.select(unix_timestamp(col("mth")).as("mth"),
        col("n_orders"), col("revenue"),
        (col("revenue") - coalesce(lag(col("revenue"), 1).over(w), lit(0.0)))
          .as("delta"))
    }),

    // per-source corpus governance profile: the data-mix report every
    // training-set review starts with — one keyed aggregate, DECIMAL
    // order-free means, exact small-domain distinct
    "t13_source_profile" -> ((s, dir) =>
      t(s, dir, "documents")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("lang")).as("n_langs"),
          (sum(col("n_chars").cast("decimal(18,0)")).cast("double") /
            count(lit(1))).as("avg_chars"),
          (sum(size(cleanTokens).cast("decimal(18,0)")).cast("double") /
            count(lit(1))).as("avg_tokens"))),

    // overlapping token-window chunking — the splitting step every
    // training/RAG pipeline runs before packing (t8 packs whole docs;
    // real corpora need long docs cut to model context first):
    // 32-token windows at stride 24 (8-token overlap so no boundary
    // n-gram is lost), chunk count = floor((n-1)/stride)+1 per doc.
    // Pure narrow explode — one corpus pass, no shuffle; the chunk
    // fingerprint (md5 of the joined window, t4's spelling) feeds
    // span-level dedup downstream.
    "t15_chunk_windows" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"), cleanTokens.as("toks"))
        .filter(size(col("toks")) >= 1)
        .select(col("doc_id"), col("toks"),
          explode(TextOps.chunkIndices("toks")).as("chunk_idx"))
        .select(col("doc_id"), col("chunk_idx"),
          TextOps.chunkSlice("toks", "chunk_idx").as("chunk"))
        .select(col("doc_id"), col("chunk_idx"),
          size(col("chunk")).as("chunk_len"),
          TextOps.chunkFingerprint(col("chunk")).as("chunk_fp"))),

    // chunk-sequence packing — t8's greedy packer at CHUNK granularity
    // (what a trainer actually consumes: t15 windows assembled into
    // fixed 128-token sequences): chunks keep document order inside a
    // doc-keyed hash bucket, cumulative length assigns each chunk its
    // sequence id. Window is per-bucket (32 bounded partitions of the
    // corpus — at real scale bucket count rises with cluster size,
    // same note as t8), everything else narrow.
    "t16_chunk_pack" -> ((s, dir) => {
      val w = Window.partitionBy(col("bucket"))
        .orderBy(col("doc_id"), col("chunk_idx"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "documents")
        .select(col("doc_id"), cleanTokens.as("toks"))
        .filter(size(col("toks")) >= 1)
        .select(col("doc_id"), col("toks"),
          explode(TextOps.chunkIndices("toks")).as("chunk_idx"))
        .select(col("doc_id"), col("chunk_idx"),
          size(TextOps.chunkSlice("toks", "chunk_idx")).as("chunk_len"),
          pmod(DedupOps.md5Hash32(col("doc_id").cast("string")), lit(32))
            .as("bucket"))
        .withColumn("cum", sum(col("chunk_len")).over(w))
        .select(col("doc_id"), col("chunk_idx"), col("bucket"),
          col("chunk_len"),
          floor((col("cum") - col("chunk_len")) / 128).as("seq_id"))
    }),

    // cross-document duplicated-chunk detection over the t15 windows
    // (the exact-substring dedup readout at window granularity, Lee
    // et al. 2022): chunk fingerprints shared by 2+ DOCUMENTS, with
    // occurrence census and the min-doc keeper — repeated boilerplate
    // windows surface here even when whole documents differ. One
    // keyed agg on the fingerprint (map-side partials); the heavy
    // tail (unique fps, the vast majority) dies in the partial
    // aggregate before the shuffle.
    "d15_chunk_dups" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"), cleanTokens.as("toks"))
        .filter(size(col("toks")) >= 1)
        .select(col("doc_id"),
          explode(TextOps.chunkIndices("toks")).as("ci"),
          col("toks"))
        .select(col("doc_id"),
          TextOps.chunkFingerprint(TextOps.chunkSlice("toks", "ci"))
            .as("chunk_fp"))
        .groupBy(col("chunk_fp"))
        .agg(count(lit(1)).as("n_occ"),
          countDistinct(col("doc_id")).as("n_docs"),
          min(col("doc_id")).as("keeper_doc"))
        .filter(col("n_docs") >= 2)),

    // α-temperature source-mix rebalancing (CorpusOps.alphaMixSample):
    // a 25% budget split across sources ∝ sqrt(n_s) — small sources
    // upweighted, the Gopher/LLaMA sub-linear mixing shape — with
    // integer-compare hash sampling. Census output: per-source docs,
    // rate, and sampled count (the report the mix review reads).
    "t14_mix_rebalance" -> ((s, dir) =>
      CorpusOps.alphaMixSample(
        t(s, dir, "documents"), "source", col("text"), budgetDen = 4)._2),

    // per-group quantile ranks: balance decile / percent_rank /
    // cume_dist within each nation. partitionBy keeps every frame
    // per-nation — never the single-partition global window an
    // unpartitioned ntile would force — and (acctbal desc, custkey)
    // is a total order, so bucket assignment is deterministic.
    // Quantized to micro-units via floor(x * 1e6) — pure IEEE ops,
    // identical in every engine — NOT round(x, 6): rank/n hits exact
    // 6-dp half-ties (e.g. 41/640 = .0640625) where Spark's HALF_UP
    // and DuckDB's scaled-multiply rounding disagree (found by the
    // sf0.1 oracle sweep; same lesson as q38's fixed-point ranks).
    "q29_decile_rank" -> ((s, dir) => {
      val w = Window.partitionBy(col("c_nationkey"))
        .orderBy(col("c_acctbal").desc, col("c_custkey"))
      t(s, dir, "customer")
        .select(col("c_custkey"), col("c_nationkey"), col("c_acctbal"),
          ntile(10).over(w).as("decile"),
          floor(percent_rank().over(w) * lit(1.0e6)).as("pct_rank_u"),
          floor(cume_dist().over(w) * lit(1.0e6)).as("cume_u"))
    }),

    // corpus bigram PMI (collocation mining): pointwise mutual
    // information from exact unigram/bigram counts, min support 5,
    // top 50. Both count passes are key-partitioned aggs with map-side
    // combine over the streamed n-gram generator; the unigram table
    // joins back on the word key (broadcast at this SF, shuffle-hash at
    // corpus scale); corpus totals ride 1-row broadcasts. The top-k is
    // orderBy+limit → TakeOrderedAndProject, never a global sort.
    "t12_pmi" -> ((s, dir) => {
      val toks = t(s, dir, "documents").select(cleanTokens.as("toks"))
      val uni = toks.select(explode(col("toks")).as("w"))
        .groupBy(col("w")).agg(count(lit(1)).as("cw"))
      val bi = toks.select(graft.plans.NgramGenerate.of(col("toks"), 2).as("bg"))
        .groupBy(col("bg")).agg(count(lit(1)).as("cb"))
      // corpus totals from ONE narrow pass over per-doc token counts —
      // n_uni = Σ len, n_bi = Σ max(len-1, 0) — map-side partials
      // only, instead of re-aggregating the (word|bigram) count tables
      val tots = toks.select(size(col("toks")).as("l"))
        .agg(sum(col("l")).as("n_uni"),
          sum(greatest(col("l") - 1, lit(0))).as("n_bi"))
      bi.filter(col("cb") >= 5)
        .withColumn("w1", split(col("bg"), " ").getItem(0))
        .withColumn("w2", split(col("bg"), " ").getItem(1))
        .join(uni.select(col("w").as("w1"), col("cw").as("c1")), "w1")
        .join(uni.select(col("w").as("w2"), col("cw").as("c2")), "w2")
        .crossJoin(broadcast(tots))
        // identical spelling on the oracle side: one double division of
        // two left-assoc triple products, then ln, then 6-dp round
        .select(col("bg"), col("cb"),
          round(log(col("cb").cast("double") * col("n_uni") * col("n_uni") /
            (col("n_bi").cast("double") * col("c1") * col("c2"))), 6).as("pmi"))
        .orderBy(col("pmi").desc, col("bg"))
        .limit(50)
    }),

    // cross-source contamination matrix (corpus governance): how many
    // near-dup candidate pairs span each (source, source) combination.
    // Rides the d2b LSH band-bucket candidates — never all-pairs; the
    // source lookup joins the 2-column doc→source projection; the
    // final matrix aggregate is |sources|² rows.
    "d12_source_overlap" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val src = docs.select(col("doc_id"), col("source"))
      DedupOps.minhashCandidatePairs(docs, "doc_id", "text")
        .select(col("doc_a"), col("doc_b"))
        .join(src.as("sa"), col("doc_a") === col("sa.doc_id"))
        .join(src.as("sb"), col("doc_b") === col("sb.doc_id"))
        .select(least(col("sa.source"), col("sb.source")).as("src_a"),
          greatest(col("sa.source"), col("sb.source")).as("src_b"))
        .groupBy(col("src_a"), col("src_b"))
        .agg(count(lit(1)).as("n_pairs"))
    }),

    // constant-state frequency probe (the 100 TB replacement for a
    // full token groupBy when only a known vocabulary matters): one
    // count-min sketch aggregate — mergeable width×depth counter
    // state, built-in codegen'd update — then the probe loop runs on
    // the driver against the collected sketch (bounded: ~1.6 MB, the
    // same constant-size-collect pattern as the k-means centroids).
    // Width (2/eps = 20k) ≫ this corpus's vocabulary, so estimates
    // are collision-free here and hash-match the exact-count oracle;
    // at real vocabularies the same query is the documented
    // overcount-≤-eps·N approximate path.
    "q30_sketch_counts" -> ((s, dir) =>
      SketchOps.cmsTokenCounts(
        t(s, dir, "documents"), cleanTokens,
        LangMarkers.en ++ LangMarkers.de ++ LangMarkers.es ++ LangMarkers.fr)),

    // class-indicative keywords (χ² feature selection over the doc-
    // frequency contingency table): for each (lang, term) with support
    // ≥ 5, the χ² statistic of term-presence vs class, top 5 terms per
    // class. All four contingency cells derive from three key-
    // partitioned aggregations (term×class, term, class) plus a 1-row
    // doc total riding a broadcast — nothing is ever per-pair. The
    // per-class top-k is a class-keyed window, and χ² is rounded to
    // 6 dp before the ordering so the selection is engine-stable.
    "m9_chi2_keywords" -> ((s, dir) => {
      // the lang-key join pushes isnotnull(lang) into ITS copy of the
      // token scan; filtering here puts the same predicate on every
      // consumer, so the (lang, term) exchange stays canonically equal
      // across the tt branch and the join branch and AQE reuses it
      // (one tokenize pass instead of two)
      val d = t(s, dir, "documents")
        .filter(col("lang").isNotNull)
        .select(col("lang"), array_distinct(cleanTokens).as("toks"))
      val pres = d.select(col("lang"), explode(col("toks")).as("w"))
      val tc = pres.groupBy(col("lang"), col("w")).agg(count(lit(1)).as("a"))
      val tt = tc.groupBy(col("w")).agg(sum(col("a")).as("t"))
      val ct = d.groupBy(col("lang")).agg(count(lit(1)).as("c"))
      val nn = d.agg(count(lit(1)).as("n"))
      // dev = a*d - b*c of the 2x2 table, spelled identically in the
      // oracle: double * long products, left-assoc
      val dev = col("a").cast("double") *
          (col("n") - col("c") - col("t") + col("a")) -
        (col("c") - col("a")).cast("double") * (col("t") - col("a"))
      val w = Window.partitionBy(col("lang"))
        .orderBy(col("chi2").desc, col("w"))
      tc.filter(col("a") >= 5)
        .join(tt, "w").join(broadcast(ct), "lang").crossJoin(broadcast(nn))
        // a term present in EVERY doc has a degenerate 2x2 table
        // (n - t = 0 → 0/0): drop it, identically in the oracle
        .filter(col("t") < col("n"))
        .select(col("lang"), col("w"), col("a"),
          round(col("n").cast("double") * dev * dev /
            (col("c").cast("double") * (col("n") - col("c")) *
              col("t") * (col("n") - col("t"))), 6).as("chi2"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 5)
        .select(col("lang"), col("w"), col("a"), col("chi2"))
    }),

    // full outer join: per-nation customer vs supplier counts, both
    // sides preserved (nations with only one side surface with a 0).
    // Two key-partitioned pre-aggregations shrink each side to
    // |nations| rows BEFORE the join — the aggregate-then-join shape
    // that keeps a full outer join cheap at any scale.
    "q31_full_outer" -> ((s, dir) => {
      val c = t(s, dir, "customer")
        .groupBy(col("c_nationkey").cast("long").as("nationkey"))
        .agg(count(lit(1)).as("n_cust"))
      val su = t(s, dir, "supplier")
        .groupBy(col("s_nationkey").cast("long").as("nationkey"))
        .agg(count(lit(1)).as("n_supp"))
      c.join(su, Seq("nationkey"), "full_outer")
        .select(col("nationkey"),
          coalesce(col("n_cust"), lit(0L)).as("n_cust"),
          coalesce(col("n_supp"), lit(0L)).as("n_supp"))
    }),

    // grouped collection surface: per-user sorted event-type array +
    // array predicates. sort_array makes collect_list order-free (the
    // unordered collect is engine/partition-dependent); the array stays
    // bounded by the per-user event count, never a corpus-wide state.
    "q32_collect_types" -> ((s, dir) =>
      t(s, dir, "events")
        .groupBy(col("user_id"))
        .agg(sort_array(collect_list(col("event_type"))).as("types_arr"))
        .select(col("user_id"),
          concat_ws(" ", col("types_arr")).as("types"),
          size(col("types_arr")).as("n_events"),
          array_contains(col("types_arr"), "purchase").as("has_purchase"),
          size(array_distinct(col("types_arr"))).as("n_distinct_types"))),

    // map-typed JSON surface: decode props to MAP, explode to
    // (key, value) rows, aggregate per key. Dynamic keys (no schema
    // pinned per key) — the semi-structured path p2's fixed-field
    // get_json_object can't express; explode(map) is a narrow
    // generator, the only shuffle is the per-key aggregate.
    "q33_map_ops" -> ((s, dir) =>
      t(s, dir, "events")
        .select(explode(from_json(col("props"), MapType(StringType, LongType)))
          .as(Seq("k", "v")))
        .groupBy(col("k"))
        .agg(count(lit(1)).as("n"), sum(col("v")).as("sum_v"),
          min(col("v")).as("min_v"), max(col("v")).as("max_v"))),

    // deterministic k-per-group sample: rank by content hash within
    // each language, keep 3 — the "random but reproducible" per-class
    // subsample training mixes use (same rows on any cluster size or
    // rerun, unlike rand()). WindowGroupLimit prunes to k per group
    // map-side before the single key-partitioned window.
    "q34_group_sample" -> ((s, dir) => {
      val w = Window.partitionBy(col("lang"))
        .orderBy(md5(col("text")), col("doc_id"))
      t(s, dir, "documents")
        .select(col("doc_id"), col("lang"),
          row_number().over(w).as("rk"))
        .filter(col("rk") <= 3)
    }),

    // calibration curve (reliability diagram) of the m7-fit
    // classifier: bucket predictions by percent, compare mean predicted
    // probability to the observed positive rate. One key-partitioned
    // aggregate over the scored stream; DECIMAL sums keep the means
    // order-free. The eval twin of m10's discrimination measure.
    "m11_calibration" -> ((s, dir) => {
      val feats = lrFitFeatures(s, dir)
      val w = CorpusOps.logisticFitWeights(feats, "y", LrFitCols,
        iters = 3, lr = 0.5)
      val z = LrFitCols.zip(w).map { case (c, wi) => lit(wi) * col(c) }
        .reduceLeft(_ + _)
      feats
        .select(col("y"), round(lit(1.0) / (lit(1.0) + exp(-z)), 6).as("p"))
        .withColumn("bucket",
          least(floor(col("p") * 100).cast("long"), lit(99L)))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"),
          (sum(col("p").cast("decimal(18,6)")).cast("double") /
            count(lit(1))).as("mean_pred"),
          (sum(col("y").cast("decimal(18,6)")).cast("double") /
            count(lit(1))).as("pos_rate"))
    }),

    // grouping() indicators on a rollup: a NULL group key from the
    // DATA is indistinguishable from a subtotal row without
    // grouping_id — the disambiguation every BI layer on top of a
    // rollup needs. Single Expand + hash aggregate, same shape as q12.
    "q35_grouping_id" -> ((s, dir) =>
      t(s, dir, "orders")
        .rollup(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          grouping(col("o_orderstatus")).as("g_status"),
          grouping(col("o_orderpriority")).as("g_prio"))),

    // calendar heatmap shape: events bucketed by day-of-week x
    // hour-of-day — one narrow projection of the timestamp plus a
    // single 7x24-key aggregate; the session timezone is pinned UTC
    // on both engines so the bucket math agrees.
    "q36_time_heatmap" -> ((s, dir) =>
      t(s, dir, "events")
        .select(dayofweek(col("ts")).as("dow"), hour(col("ts")).as("hod"),
          col("value"))
        .groupBy(col("dow"), col("hod"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,4)")).cast("double").as("sum_value"))),

    // fixed-bound histogram per event type: width_bucket puts each
    // value in one of 10 equal bins over [0, 500) (SQL-standard edge
    // semantics: 0 below, n+1 at/above the bound — identical in both
    // engines). One narrow projection + one (type, bucket) aggregate —
    // the distributed histogram every profiling pass starts with.
    "q37_histogram" -> ((s, dir) =>
      t(s, dir, "events")
        .select(col("event_type"),
          width_bucket(col("value"), lit(0.0), lit(500.0), lit(10L)).as("bucket"))
        .groupBy(col("event_type"), col("bucket"))
        .agg(count(lit(1)).as("n"))),

    // z-score outlier detection: per-type mean/stddev from one
    // key-partitioned aggregate (DECIMAL sums of value and value², so
    // the moments are order-free), stats broadcast back onto the
    // stream, flag |z| beyond 3σ. The anomaly-flagging pass every
    // telemetry pipeline runs; at 100 TB the stats table stays one
    // row per type and the probe side never shuffles. The z-score is
    // 6-dp-rounded BEFORE the threshold compare so the kept set is
    // engine-stable at the boundary.
    "q39_outliers" -> ((s, dir) => {
      val e = t(s, dir, "events")
      val mean = col("s1") / col("n")
      // greatest(var, 0): floating cancellation can push the variance
      // of a CONSTANT-valued group to ~-1e-17, where Spark's sqrt
      // returns NaN (which then SURVIVES the threshold — NaN orders
      // above every number) and DuckDB hard-errors; the sd > 0 filter
      // then drops zero-variance groups, which by definition have no
      // outliers
      val stats = e.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,4)")).cast("double").as("s1"),
          sum((col("value") * col("value")).cast("decimal(28,8)"))
            .cast("double").as("s2"))
        .select(col("event_type"), mean.as("mean"),
          sqrt(greatest(col("s2") / col("n") - mean * mean, lit(0.0))).as("sd"))
        .filter(col("sd") > 0.0)
      e.join(broadcast(stats), Seq("event_type"))
        .select(col("event_id"), col("event_type"), col("value"),
          round((col("value") - col("mean")) / col("sd"), 6).as("z"))
        .filter(abs(col("z")) > 3.0)
    }),

    // PageRank over the supplier↔customer trade graph (suppliers at
    // even node ids, customers odd; edges symmetrized so the
    // bipartite graph has no dangling mass). 5 fixed iterations of
    // GraphOps.pageRank — per-iteration keyed join + keyed agg, all
    // rank mass in bit-exact 1e-12 fixed point — checked against a
    // 5-step unrolled-CTE oracle. Top-20 by rank keeps the result
    // stable and small; the double view divides once at the edge.
    "q38_pagerank" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
        .select(col("l_orderkey").as("ok"),
          (col("l_suppkey").cast("long") * 2).as("src"))
      val o = t(s, dir, "orders")
        .select(col("o_orderkey").as("ok"),
          (col("o_custkey").cast("long") * 2 + 1).as("dst"))
      // no distinct here: pageRank canonicalizes (repartition + local
      // dedup) anyway — a pre-distinct would add a full extra
      // exchange of the edge stream for nothing
      val base = li.join(o, Seq("ok")).select(col("src"), col("dst"))
      val sym = base.union(base.select(col("dst"), col("src")))
      GraphOps.pageRank(sym, "src", "dst", iters = 5)
        .select(col("node"),
          (col("pr_fp").cast("double") / lit(1.0e12)).as("pr"))
        .orderBy(col("pr").desc, col("node"))
        .limit(20)
    }),

    // Bloom-pruned semi-join (SketchOps.bloomPrunedSemiJoin): the
    // runtime-filter pattern as a library op — a 2^20-bit bitmap of
    // the urgent-order keys built in one narrow pass, shipped as a
    // plan literal, probed map-side in codegen so non-members never
    // reach the join exchange; the exact semi-join then removes the
    // false positives, so the oracle is the plain semi-join.
    // NB the bitmap build is EAGER: constructing this DataFrame runs
    // the narrow build job over orders (the literal must exist at
    // plan time) — correctly charged to this query's bench slot.
    "q40_bloom_join" -> ((s, dir) => {
      val urgent = t(s, dir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
      SketchOps.bloomPrunedSemiJoin(
        t(s, dir, "lineitem"), "l_orderkey", urgent, "o_orderkey")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
    }),

    // top-k per group WITHOUT a sort: plans.TopKRows rides the
    // ordinary hash-aggregate pipeline with a k-element buffer per
    // (partition, group) — q6's window shape sorts group slices even
    // under WindowGroupLimit; this is the constant-state aggregate
    // twin. Deterministic (ord desc, id asc) total order matches the
    // row_number oracle.
    "q41_topk_agg" -> ((s, dir) =>
      t(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(graft.plans.TopKRows.of(col("value"), col("event_id"), 3).as("top"))
        .select(col("event_type"), posexplode(col("top")).as(Seq("pos", "r")))
        .select(col("event_type"), (col("pos") + 1).as("rk"),
          col("r.id").as("event_id"), col("r.ord").as("value"))),

    // mergeable quantile sketch (plans.QuantileSketchAgg) — the
    // 100 TB replacement for q14's exact percentile, whose per-group
    // sort is the known scale pain point. The sketch rides the hash
    // aggregate with O(k·log(n/k)) state and carries its OWN
    // worst-case rank-error accounting (bound += 2^h per level-h
    // compaction — the classic compactor argument). The query then
    // verifies the guarantee against the true distribution in one
    // extra broadcast-join pass: output is the sketch's INVARIANTS
    // (exact n, rank-window property), because the estimates
    // legitimately vary with Spark's merge order while the
    // guarantees must not — same reasoning as the oracle, which
    // checks n and the property, not an estimate byte.
    "q51_quantile_sketch" -> ((s, dir) => {
      val ev = t(s, dir, "events")
        .select(col("event_type"), col("value").cast("double").as("v"))
      val sk = ev.groupBy(col("event_type"))
        .agg(graft.plans.QuantileSketchAgg
          .of(col("v"), 400, Seq(0.5, 0.95)).as("sk"))
      val est = sk.select(col("event_type"), col("sk.n").as("n"),
          col("sk.bound").as("bound"), explode(col("sk.qs")).as("q"))
        .select(col("event_type"), col("n"), col("bound"),
          when(col("q.phi") === 0.5, "p50").otherwise("p95").as("phi"),
          col("q.phi").as("phiv"), col("q.est").as("est"))
      val target = greatest(lit(1L), ceil(col("phiv") * col("n")))
      ev.join(broadcast(est), Seq("event_type"))
        .groupBy(col("event_type"), col("phi"), col("phiv"),
          col("n"), col("bound"), col("est"))
        .agg(sum(when(col("v") < col("est"), 1L).otherwise(0L)).as("lt"),
          sum(when(col("v") <= col("est"), 1L).otherwise(0L)).as("leq"))
        .select(col("event_type"), col("phi"), col("n"),
          ((col("lt") + lit(1L) <= target + col("bound")) &&
            (col("leq") >= target - col("bound"))).as("ok"))
    }),

    // adaptive quality floor: per-language 10th-percentile cutoff on
    // an alpha-ratio quality signal, then the keep/drop census — the
    // calibrated-threshold pattern ("drop the worst decile of EACH
    // language", not one global floor that ejects whole low-resource
    // languages). Quality is BIGINT micro-units via integer div (a
    // ratio of integer counts — exactly the q29 tie class), and the
    // percentile comes from a cumulative window over the per-language
    // HISTOGRAM of those micro-units (m10's trick: the histogram is
    // bounded at 1e6+1 rows per language at ANY corpus size, so there
    // is never a raw-row sort; cutoff selection `10*cum >= n` is
    // integer, cum is exact). The q51 sketch is the same pattern when
    // even the histogram key space is unbounded.
    "q52_adaptive_quality" -> ((s, dir) => {
      val hist = t(s, dir, "documents")
        .filter(length(col("text")) >= 1)
        .select(col("lang"),
          expr("(1000000 * cast(length(regexp_replace(text, '[^A-Za-z]', '')) as bigint)) div length(text)")
            .as("q_mu"))
        .groupBy(col("lang"), col("q_mu"))
        .agg(count(lit(1)).as("cnt"))
        .persist()
      val wc = Window.partitionBy(col("lang")).orderBy(col("q_mu"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wn = Window.partitionBy(col("lang"))
      val cut = hist
        .withColumn("cum", sum(col("cnt")).over(wc))
        .withColumn("n", sum(col("cnt")).over(wn))
        .filter(col("cum") * 10 >= col("n"))
        .groupBy(col("lang")).agg(min(col("q_mu")).as("cutoff_mu"))
      hist.join(cut, Seq("lang"))
        .groupBy(col("lang"), col("cutoff_mu"))
        .agg(sum(col("cnt")).as("n_total"),
          sum(when(col("q_mu") >= col("cutoff_mu"), col("cnt"))
            .otherwise(lit(0L))).as("n_kept"))
    }),

    // recency weighting — the "prefer recent data" curation signal:
    // per-user event value decayed with a 7-day half-life against the
    // corpus reference time (max ts — deterministic, no wall clock).
    // Age is exact BIGINT micros; the decay is one-shot pow (6-dp
    // round — irrational, tie measure zero, the t10/ln class); terms
    // are DECIMAL-quantized so the per-user sum is order-free. Plan:
    // narrow term compute + 1-row broadcast + ONE keyed agg.
    "q53_time_decay" -> ((s, dir) => {
      val ev = t(s, dir, "events").select(col("user_id"),
        expr("unix_micros(ts)").as("us"), col("value"))
      // reference time collected once (1 row, an exact BIGINT — the
      // t14 lesson: a dependent 1-row aggregate re-scans the table
      // under its consumer even with AQE reuse); the column-pruned
      // max scan + the term scan are the only two table passes
      val refUs = ev.agg(max(col("us"))).collect()(0).getLong(0)
      ev.select(col("user_id"),
          round(col("value") * pow(lit(0.5),
            (lit(refUs) - col("us")) / lit(604800000000.0)), 6)
            .cast("decimal(18,6)").as("term"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("term")).cast("double").as("decayed_value"))
    }),

    // weighted deterministic sampling: keep probability proportional
    // to a quality weight (length-derived here), decided by comparing
    // a content-hash residue against the per-row weight — an INTEGER
    // compare, so the kept set is engine- and cluster-size-stable
    // (t7's uniform sampler with importance weights: the training-mix
    // upsampling/downsampling primitive). Narrow, no shuffle.
    "q42_weighted_sample" -> ((s, dir) => {
      val w1000 = least(greatest(expr("n_chars div 2"), lit(100L)), lit(900L))
      t(s, dir, "documents")
        .filter(pmod(DedupOps.md5Hash32(col("text")), lit(1000)) < w1000)
        .select(col("doc_id"), col("lang"), w1000.as("w1000"))
    }),

    // left outer join + aggregate: every customer, including the
    // order-less (count over the null-extended side = 0) — one
    // keyed join + one keyed agg; DECIMAL sum, coalesced before the
    // double cast so empty groups read 0.0 not NULL
    "q43_left_outer" -> ((s, dir) =>
      t(s, dir, "customer")
        .join(t(s, dir, "orders"),
          col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("n_orders"),
          coalesce(sum(col("o_totalprice").cast("decimal(18,2)")), lit(0))
            .cast("double").as("sum_price")))
  )

  // ---- oracle SQL ----------------------------------------------------
  /** One DuckDB twin per query — the full map lives in
    * [[OracleQueries]] (moved for maintainability, byte-identical). */
  def oracleSql: Map[String, String] = OracleQueries.all
}

/** Marker-word profiles for the language-ID heuristic. */
private object LangMarkers {
  val en = Seq("the", "and", "is", "of", "to", "in", "that", "it")
  val de = Seq("der", "die", "und", "ist", "das", "nicht", "ein", "zu")
  val es = Seq("el", "los", "es", "y", "que", "de", "una", "por")
  val fr = Seq("le", "les", "est", "et", "dans", "une", "pour", "sur")
}

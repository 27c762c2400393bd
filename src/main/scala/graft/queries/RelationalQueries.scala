package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational operator families from SURVEY.md §2.3-§2.7 over the
  * /root/testdata TPC-H-ish tables, each with a DuckDB oracle.
  *
  * Cross-engine determinism rule: any aggregation over doubles goes
  * through DECIMAL (exact, order-independent) and is cast back to double
  * at the end — a raw double SUM would differ between Spark and DuckDB in
  * the last ulp depending on reduction order. Single-division ratios of
  * exact values are bit-identical without rounding.
  */
object RelationalQueries {
  import Queries.t

  /** sum(cast decimal) cast double — order-independent exact sum. */
  private def sumd(c: Column): Column =
    sum(c.cast("decimal(18,4)")).cast("double")

  /** GlobalRank partition count = the session's shuffle-partition
    * setting (round 6): the former constant 4 capped the range
    * repartition + window + checkpoint at 4-way parallelism on ANY
    * deployment — a constant tuned for neither local nor cluster mode
    * (guide §2 "make partitioning scale-adaptive"). Global ranks and
    * running sums are partition-count-invariant (per-partition ranks +
    * exact offsets), so results are unchanged at any value.
    */
  private def parts(s: SparkSession): Int =
    s.sessionState.conf.numShufflePartitions
  private def sqlSumd(e: String): String =
    s"CAST(SUM(CAST($e AS DECIMAL(18,4))) AS DOUBLE)"

  def all: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A1/A7: group-by aggregation (reference: dataset.py:31-36,
    // documents_dataset.py:149)
    "q_agg_pricing" -> ((s, d) => {
      import s.implicits._
      t(s, d, "lineitem")
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          sumd($"l_quantity").as("sum_qty"),
          sumd($"l_extendedprice").as("sum_price"),
          (sumd($"l_discount") / count(lit(1))).as("avg_disc"),
          count(lit(1)).as("n_rows"))
        .orderBy($"l_returnflag", $"l_linestatus")
    }),

    // P1/P6 + A: filter before aggregate — predicate pushed to parquet
    "q_agg_filtered_revenue" -> ((s, d) => {
      import s.implicits._
      t(s, d, "lineitem")
        .filter($"l_shipdate" < lit(java.sql.Timestamp.valueOf("1998-01-01 00:00:00")))
        .groupBy($"l_returnflag")
        .agg(sum(($"l_extendedprice".cast("decimal(18,4)") *
          (lit(1).cast("decimal(18,4)") - $"l_discount".cast("decimal(18,4)"))))
          .cast("double").as("revenue"))
        .orderBy($"l_returnflag")
    }),

    // A6/A7: multi-distinct aggregation (reference: ner_dataset.py:86-98)
    "q_agg_distinct" -> ((s, d) => {
      import s.implicits._
      t(s, d, "orders")
        .groupBy($"o_orderpriority")
        .agg(
          count(lit(1)).as("n_orders"),
          countDistinct($"o_custkey").as("n_customers"),
          countDistinct($"o_orderstatus").as("n_statuses"))
        .orderBy($"o_orderpriority")
    }),

    // J1: broadcast hash join fact->dim (reference:
    // word_sense_pipeline.py:229-239 token->lemma lookup)
    "q_join_broadcast" -> ((s, d) => {
      import s.implicits._
      t(s, d, "lineitem")
        .join(broadcast(t(s, d, "part")), $"l_partkey" === $"p_partkey")
        .groupBy($"p_brand")
        .agg(sumd($"l_quantity").as("sum_qty"), count(lit(1)).as("n_rows"))
        .orderBy($"p_brand")
    }),

    // J: star join across 4 tables — Catalyst reorders, dims broadcast
    "q_join_star" -> ((s, d) => {
      import s.implicits._
      t(s, d, "orders")
        .join(t(s, d, "customer"), $"o_custkey" === $"c_custkey")
        .join(broadcast(t(s, d, "nation")), $"c_nationkey" === $"n_nationkey")
        .join(broadcast(t(s, d, "region")), $"n_regionkey" === $"r_regionkey")
        .groupBy($"r_name")
        .agg(count(lit(1)).as("n_orders"),
          sumd($"o_totalprice").as("total_price"))
        .orderBy($"r_name")
    }),

    // P9: broadcast left-semi join (reference: wikipedia_dataset.py:83-87)
    "q_join_semi" -> ((s, d) => {
      import s.implicits._
      t(s, d, "customer")
        .join(t(s, d, "orders"), $"c_custkey" === $"o_custkey", "left_semi")
        .groupBy($"c_mktsegment")
        .agg(count(lit(1)).as("n_customers"))
        .orderBy($"c_mktsegment")
    }),

    // U4: anti join (reference: documents_dataset.py:79-81 seen-URL skip)
    "q_join_anti" -> ((s, d) => {
      import s.implicits._
      t(s, d, "customer")
        .join(t(s, d, "orders"), $"c_custkey" === $"o_custkey", "left_anti")
        .groupBy($"c_mktsegment")
        .agg(count(lit(1)).as("n_customers"))
        .orderBy($"c_mktsegment")
    }),

    // J7: positional zip join via global row_number (reference:
    // dataset.py:191-195) — distributed two-pass rank, NOT a
    // single-partition window (graft.plans.GlobalRank)
    "q_join_zip" -> ((s, d) => {
      import s.implicits._
      val o = graft.plans.GlobalRank.withGlobalRowNumber(
        t(s, d, "orders").select($"o_orderkey", $"o_totalprice"),
        "rn", Seq($"o_orderkey"), parts(s)).select($"o_totalprice", $"rn")
      val c = graft.plans.GlobalRank.withGlobalRowNumber(
        t(s, d, "customer").select($"c_custkey", $"c_acctbal"),
        "rn", Seq($"c_custkey"), parts(s)).select($"c_acctbal", $"rn")
      o.join(c, "rn")
        .agg(count(lit(1)).as("n_pairs"),
          sum(when($"o_totalprice" > $"c_acctbal", 1L).otherwise(0L))
            .as("n_order_gt_bal"))
    }),

    // W3: top-k per group (reference: search_pipeline.py:78-88 torch.topk)
    "q_window_topk" -> ((s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"o_orderpriority")
        .orderBy($"o_totalprice".desc, $"o_orderkey")
      t(s, d, "orders")
        .withColumn("rn", row_number().over(w))
        .filter($"rn" <= 3)
        .select($"o_orderpriority", $"rn", $"o_orderkey", $"o_totalprice")
        .orderBy($"o_orderpriority", $"rn")
    }),

    // A12-shape: running aggregate over an ordering window
    "q_window_running" -> ((s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"o_custkey")
        .orderBy($"o_orderdate", $"o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, d, "orders").select(
        $"o_custkey", $"o_orderkey",
        sum($"o_totalprice".cast("decimal(18,4)")).over(w)
          .cast("double").as("cum_price"),
        count(lit(1)).over(w).as("cum_orders"))
    }),

    // W2: stable ordering + lag (the conv_id/turn_idx pattern on events)
    "q_window_lag" -> ((s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      t(s, d, "events").select(
        $"user_id", $"event_id",
        lag($"event_type", 1).over(w).as("prev_type"),
        row_number().over(w).as("turn_rank"))
    }),

    // W5: argmax per group (reference: metrics.py:476-502)
    "q_window_argmax" -> ((s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id")
        .orderBy($"value".desc, $"event_id")
      t(s, d, "events")
        .withColumn("rn", row_number().over(w))
        .filter($"rn" === 1)
        .select($"user_id", $"event_type".as("top_type"),
          $"value".as("top_value"))
        .orderBy($"user_id")
    }),

    // A2: stratified split via ntile (reference: dataset.py:38-56)
    "q_window_ntile" -> ((s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"c_mktsegment")
        .orderBy($"c_acctbal", $"c_custkey")
      t(s, d, "customer")
        .withColumn("tile", ntile(4).over(w))
        .groupBy($"c_mktsegment", $"tile")
        .agg(count(lit(1)).as("n"),
          sumd($"c_acctbal").as("bal_sum"))
        .orderBy($"c_mktsegment", $"tile")
    }),

    // O1/O4: global sort + limit (reference: search_pipeline.py:140)
    "q_sort_limit" -> ((s, d) => {
      import s.implicits._
      t(s, d, "lineitem")
        .orderBy($"l_extendedprice".desc, $"l_orderkey", $"l_linenumber")
        .select($"l_orderkey", $"l_linenumber", $"l_extendedprice")
        .limit(10)
    }),

    // U1/U2: union + distinct (reference: ner_dataset.py:112-134)
    "q_union_distinct" -> ((s, d) => {
      import s.implicits._
      t(s, d, "customer").select($"c_nationkey".as("nationkey"))
        .union(t(s, d, "supplier").select($"s_nationkey".as("nationkey")))
        .distinct()
        .orderBy($"nationkey")
    }),

    // A14: exact Pearson correlation from decimal sums (reference:
    // metrics.py:359-381) — a raw corr() would be reduction-order
    // dependent; this is exact then one double formula
    "q_corr_exact" -> ((s, d) => {
      import s.implicits._
      val x = $"l_quantity".cast("decimal(18,4)")
      val y = $"l_extendedprice".cast("decimal(18,4)")
      val agg = t(s, d, "lineitem").agg(
        count(lit(1)).cast("double").as("n"),
        sum(x).cast("double").as("sx"),
        sum(y).cast("double").as("sy"),
        sum((x * y).cast("decimal(38,8)")).cast("double").as("sxy"),
        sum((x * x).cast("decimal(38,8)")).cast("double").as("sxx"),
        sum((y * y).cast("decimal(38,8)")).cast("double").as("syy"))
      agg.select(
        (($"n" * $"sxy" - $"sx" * $"sy") /
          (sqrt($"n" * $"sxx" - $"sx" * $"sx") *
            sqrt($"n" * $"syy" - $"sy" * $"sy"))).as("pearson_r"))
    }),

    // A14: Spearman correlation = Pearson over ranks (reference:
    // metrics.py:359-381). Ranks are distinct (row_number with a key
    // tiebreak — deterministic cross-engine), so all sums are exact
    // integers and the final formula is one double expression.
    "q_corr_spearman" -> ((s, d) => {
      import s.implicits._
      val ev = t(s, d, "events").select($"event_id", $"value", $"user_id")
      val rx = graft.plans.GlobalRank.withGlobalRowNumber(
        ev, "rank_x", Seq($"value", $"event_id"), parts(s))
      val both = graft.plans.GlobalRank.withGlobalRowNumber(
        rx, "rank_y", Seq($"user_id", $"event_id"), parts(s))
      val agg = both.agg(
        count(lit(1)).cast("double").as("n"),
        sum($"rank_x").cast("double").as("sx"),
        sum($"rank_y").cast("double").as("sy"),
        sum($"rank_x" * $"rank_y").cast("double").as("sxy"),
        sum($"rank_x" * $"rank_x").cast("double").as("sxx"),
        sum($"rank_y" * $"rank_y").cast("double").as("syy"))
      agg.select(
        (($"n" * $"sxy" - $"sx" * $"sy") /
          (sqrt($"n" * $"sxx" - $"sx" * $"sx") *
            sqrt($"n" * $"syy" - $"sy" * $"sy"))).as("spearman_rho"))
    }),

    // A12/A13: best-threshold sweep — one global ranking window, single
    // pass accumulating P/R/F1 (reference: metrics.py:276-314,417-447)
    "q_threshold_sweep" -> ((s, d) => {
      import s.implicits._
      val ev = t(s, d, "events")
        .select($"event_id", $"value",
          when($"event_type" === "purchase", 1L).otherwise(0L).as("label"))
      val total = ev.agg(sum($"label").as("total_pos"))
      // distributed global rank + running sum (no single-partition window)
      val ranked = graft.plans.GlobalRank.withGlobalRankAndCumSum(
        ev, "rank", "tp", $"label", Seq($"value".desc, $"event_id"), parts(s))
      ranked.crossJoin(broadcast(total))
        .withColumn("precision", $"tp".cast("double") / $"rank")
        .withColumn("recall", $"tp".cast("double") / $"total_pos")
        .withColumn("f1",
          when($"tp" > 0,
            lit(2.0) * $"precision" * $"recall" / ($"precision" + $"recall"))
            .otherwise(lit(0.0)))
        .orderBy($"f1".desc, $"rank")
        .select($"rank", $"value".as("threshold"), $"tp", $"precision",
          $"recall", $"f1")
        .limit(1)
    }),

    // event-time bucketing (batch equivalent of the streaming window)
    "q_time_bucket" -> ((s, d) => {
      import s.implicits._
      t(s, d, "events")
        .groupBy(date_trunc("hour", $"ts").as("hour"), $"event_type")
        .agg(count(lit(1)).as("n"), sumd($"value").as("value_sum"))
        .orderBy($"hour", $"event_type")
    }),

    // F16: JSON field extraction (reference: documents_dataset.py:73-92)
    "q_json_extract" -> ((s, d) => {
      import s.implicits._
      t(s, d, "events")
        .select($"event_type",
          get_json_object($"props", "$.k").cast("long").as("k"))
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n"), sum($"k").as("k_sum"),
          max($"k").as("k_max"))
        .orderBy($"event_type")
    }),

    // A3: docs-per-group concat aggregation (reference:
    // topic_modeling.py:79 groupby.agg(' '.join)) — sorted for
    // cross-engine determinism
    "q_agg_concat" -> ((s, d) => {
      import s.implicits._
      t(s, d, "documents")
        .groupBy($"lang")
        .agg(concat_ws(" ",
          array_sort(collect_list(format_string("%04d", $"doc_id"))))
          .as("doc_ids"))
        .orderBy($"lang")
    }),

    // A6: distinct-set accumulation (reference: ner_dataset.py:86-98
    // tag-set build), emitted as a sorted joined string
    "q_agg_collect_set" -> ((s, d) => {
      import s.implicits._
      t(s, d, "documents")
        .groupBy($"lang")
        .agg(
          concat_ws(",", sort_array(collect_set($"source"))).as("sources"),
          countDistinct($"source").as("n_sources"))
        .orderBy($"lang")
    }),

    // A13: average precision over a global ranking (reference:
    // metrics.py:383-403) — distributed rank+cumsum, one exact division
    // per positive, rounded sum (cross-engine reduction-order guard)
    "q_agg_avg_precision" -> ((s, d) => {
      import s.implicits._
      val ev = t(s, d, "events")
        .select($"event_id", $"value",
          when($"event_type" === "purchase", 1L).otherwise(0L).as("label"))
      val ranked = graft.plans.GlobalRank.withGlobalRankAndCumSum(
        ev, "rank", "tp", $"label", Seq($"value".desc, $"event_id"), parts(s))
      ranked
        .agg(
          round(sum(when($"label" === 1,
            $"tp".cast("double") / $"rank").otherwise(0.0)) /
            sum($"label"), 9).as("avg_precision"),
          sum($"label").as("total_pos"))
    }),

    // F15: scalar math projection (reference: topic_modeling.py:112-118)
    "q_scalar_math" -> ((s, d) => {
      import s.implicits._
      t(s, d, "lineitem")
        .filter($"l_orderkey" < 100)
        .select(
          $"l_orderkey", $"l_linenumber",
          round(log($"l_extendedprice"), 6).as("ln_price"),
          round(sqrt($"l_quantity"), 6).as("sqrt_qty"),
          abs($"l_discount" - lit(0.05)).as("abs_disc_delta"),
          ($"l_quantity" * $"l_extendedprice").as("qty_price"))
        .orderBy($"l_orderkey", $"l_linenumber")
    }),
  )

  def oracle: Map[String, String] = Map(
    "q_agg_pricing" ->
      s"""SELECT l_returnflag, l_linestatus,
         ${sqlSumd("l_quantity")} AS sum_qty,
         ${sqlSumd("l_extendedprice")} AS sum_price,
         ${sqlSumd("l_discount")} / COUNT(*) AS avg_disc,
         COUNT(*) AS n_rows
         FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""",
    "q_agg_filtered_revenue" ->
      """SELECT l_returnflag,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) *
           (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4))))
           AS DOUBLE) AS revenue
         FROM lineitem WHERE l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
         GROUP BY 1 ORDER BY 1""",
    "q_agg_distinct" ->
      """SELECT o_orderpriority, COUNT(*) AS n_orders,
         COUNT(DISTINCT o_custkey) AS n_customers,
         COUNT(DISTINCT o_orderstatus) AS n_statuses
         FROM orders GROUP BY 1 ORDER BY 1""",
    "q_join_broadcast" ->
      s"""SELECT p_brand, ${sqlSumd("l_quantity")} AS sum_qty,
         COUNT(*) AS n_rows
         FROM lineitem JOIN part ON l_partkey = p_partkey
         GROUP BY 1 ORDER BY 1""",
    "q_join_star" ->
      s"""SELECT r_name, COUNT(*) AS n_orders,
         ${sqlSumd("o_totalprice")} AS total_price
         FROM orders
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY 1 ORDER BY 1""",
    "q_join_semi" ->
      """SELECT c_mktsegment, COUNT(*) AS n_customers FROM customer
         WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
         GROUP BY 1 ORDER BY 1""",
    "q_join_anti" ->
      """SELECT c_mktsegment, COUNT(*) AS n_customers FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
         GROUP BY 1 ORDER BY 1""",
    "q_join_zip" ->
      """WITH o AS (SELECT o_totalprice,
           ROW_NUMBER() OVER (ORDER BY o_orderkey) AS rn FROM orders),
         c AS (SELECT c_acctbal,
           ROW_NUMBER() OVER (ORDER BY c_custkey) AS rn FROM customer)
         SELECT COUNT(*) AS n_pairs,
           CAST(SUM(CASE WHEN o_totalprice > c_acctbal THEN 1 ELSE 0 END)
             AS BIGINT) AS n_order_gt_bal
         FROM o JOIN c USING (rn)""",
    "q_window_topk" ->
      """SELECT o_orderpriority, rn, o_orderkey, o_totalprice FROM (
           SELECT o_orderpriority, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_orderpriority
               ORDER BY o_totalprice DESC, o_orderkey) AS rn
           FROM orders) WHERE rn <= 3 ORDER BY o_orderpriority, rn""",
    "q_window_running" ->
      """SELECT o_custkey, o_orderkey,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER w AS DOUBLE)
           AS cum_price,
         COUNT(*) OVER w AS cum_orders
         FROM orders
         WINDOW w AS (PARTITION BY o_custkey
           ORDER BY o_orderdate, o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""",
    "q_window_lag" ->
      """SELECT user_id, event_id,
         LAG(event_type, 1) OVER w AS prev_type,
         ROW_NUMBER() OVER w AS turn_rank
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""",
    "q_window_argmax" ->
      """SELECT user_id, event_type AS top_type, value AS top_value FROM (
           SELECT user_id, event_type, value,
             ROW_NUMBER() OVER (PARTITION BY user_id
               ORDER BY value DESC, event_id) AS rn
           FROM events) WHERE rn = 1 ORDER BY user_id""",
    "q_window_ntile" ->
      s"""SELECT c_mktsegment, tile, COUNT(*) AS n,
         ${sqlSumd("c_acctbal")} AS bal_sum
         FROM (SELECT c_mktsegment, c_acctbal,
           NTILE(4) OVER (PARTITION BY c_mktsegment
             ORDER BY c_acctbal, c_custkey) AS tile
           FROM customer)
         GROUP BY 1, 2 ORDER BY 1, 2""",
    "q_sort_limit" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
         ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 10""",
    "q_union_distinct" ->
      """SELECT DISTINCT nationkey FROM (
           SELECT c_nationkey AS nationkey FROM customer
           UNION ALL SELECT s_nationkey AS nationkey FROM supplier)
         ORDER BY nationkey""",
    // NOTE: DuckDB multiplies DECIMAL(p,s) as p1+p2 <= 38, so the
    // multiplication operands are DECIMAL(19,4) here (19+19=38); Spark
    // uses (18,4) — values are identical, no rounding occurs either way
    "q_corr_exact" ->
      """WITH a AS (SELECT
           CAST(COUNT(*) AS DOUBLE) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sx,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sy,
           CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(19,4)) *
             CAST(l_extendedprice AS DECIMAL(19,4)) AS DECIMAL(38,8)))
             AS DOUBLE) AS sxy,
           CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(19,4)) *
             CAST(l_quantity AS DECIMAL(19,4)) AS DECIMAL(38,8)))
             AS DOUBLE) AS sxx,
           CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(19,4)) *
             CAST(l_extendedprice AS DECIMAL(19,4)) AS DECIMAL(38,8)))
             AS DOUBLE) AS syy
           FROM lineitem)
         SELECT (n * sxy - sx * sy) /
           (SQRT(n * sxx - sx * sx) * SQRT(n * syy - sy * sy)) AS pearson_r
         FROM a""",
    "q_corr_spearman" ->
      """WITH r AS (SELECT
           ROW_NUMBER() OVER (ORDER BY value, event_id) AS rank_x,
           ROW_NUMBER() OVER (ORDER BY user_id, event_id) AS rank_y
           FROM events),
         a AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n,
           CAST(SUM(rank_x) AS DOUBLE) AS sx,
           CAST(SUM(rank_y) AS DOUBLE) AS sy,
           CAST(SUM(rank_x * rank_y) AS DOUBLE) AS sxy,
           CAST(SUM(rank_x * rank_x) AS DOUBLE) AS sxx,
           CAST(SUM(rank_y * rank_y) AS DOUBLE) AS syy
           FROM r)
         SELECT (n * sxy - sx * sy) /
           (SQRT(n * sxx - sx * sx) * SQRT(n * syy - sy * sy))
             AS spearman_rho
         FROM a""",
    "q_threshold_sweep" ->
      """WITH ev AS (SELECT event_id, value,
           CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS label
           FROM events),
         tot AS (SELECT SUM(label) AS total_pos FROM ev),
         ranked AS (SELECT event_id, value, label,
           ROW_NUMBER() OVER (ORDER BY value DESC, event_id) AS rank,
           CAST(SUM(label) OVER (ORDER BY value DESC, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS tp
           FROM ev)
         SELECT rank, value AS threshold, tp,
           CAST(tp AS DOUBLE) / rank AS precision,
           CAST(tp AS DOUBLE) / total_pos AS recall,
           CASE WHEN tp > 0 THEN
             2.0 * (CAST(tp AS DOUBLE) / rank) * (CAST(tp AS DOUBLE) / total_pos)
               / ((CAST(tp AS DOUBLE) / rank) + (CAST(tp AS DOUBLE) / total_pos))
           ELSE 0.0 END AS f1
         FROM ranked CROSS JOIN tot
         ORDER BY f1 DESC, rank LIMIT 1""",
    "q_time_bucket" ->
      s"""SELECT date_trunc('hour', ts) AS hour, event_type,
         COUNT(*) AS n, ${sqlSumd("value")} AS value_sum
         FROM events GROUP BY 1, 2 ORDER BY 1, 2""",
    "q_json_extract" ->
      """SELECT event_type, COUNT(*) AS n,
         CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT))
           AS BIGINT) AS k_sum,
         MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS k_max
         FROM events GROUP BY 1 ORDER BY 1""",
    "q_agg_concat" ->
      """SELECT lang,
         string_agg(printf('%04d', doc_id), ' ' ORDER BY printf('%04d', doc_id))
           AS doc_ids
         FROM documents GROUP BY 1 ORDER BY 1""",
    "q_agg_collect_set" ->
      """SELECT lang,
         string_agg(DISTINCT source, ',' ORDER BY source) AS sources,
         COUNT(DISTINCT source) AS n_sources
         FROM documents GROUP BY 1 ORDER BY 1""",
    "q_agg_avg_precision" ->
      """WITH ev AS (SELECT event_id, value,
           CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS label
           FROM events),
         ranked AS (SELECT label,
           ROW_NUMBER() OVER (ORDER BY value DESC, event_id) AS rank,
           SUM(label) OVER (ORDER BY value DESC, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS tp
           FROM ev)
         SELECT
           ROUND(SUM(CASE WHEN label = 1
               THEN CAST(tp AS DOUBLE) / rank ELSE 0.0 END) / SUM(label), 9)
             AS avg_precision,
           CAST(SUM(label) AS BIGINT) AS total_pos
         FROM ranked""",
    "q_scalar_math" ->
      """SELECT l_orderkey, l_linenumber,
         ROUND(LN(l_extendedprice), 6) AS ln_price,
         ROUND(SQRT(l_quantity), 6) AS sqrt_qty,
         ABS(l_discount - 0.05) AS abs_disc_delta,
         l_quantity * l_extendedprice AS qty_price
         FROM lineitem WHERE l_orderkey < 100
         ORDER BY l_orderkey, l_linenumber""",
  )
}

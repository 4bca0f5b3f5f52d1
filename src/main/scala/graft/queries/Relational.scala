package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.etl.Readers

/** SURVEY.md §2B Q01–Q24: the relational query surface, DataFrame-first so
  * Catalyst owns pushdown/pruning/join strategy. Reference-derived shapes
  * cite their OP-xx origin (SURVEY.md §2A).
  *
  * Scale notes (100 TB design intent):
  *  - dimension joins (q17/q18) broadcast `nation`/`region` explicitly —
  *    they are O(10^2) rows at any scale factor;
  *  - global aggregates are single partial+final hash-agg stages (no
  *    pre-shuffle);
  *  - top-k queries compile to TakeOrderedAndProject (no global sort
  *    materialization).
  */
object Relational {

  private def t(spark: SparkSession, sfDir: String, name: String): DataFrame =
    Tables.load(spark, sfDir, name)

  def defs: Seq[Q] = Seq(
    // Q01 [R, OP-17] whole-table count.
    Q("q01_count",
      (s, d) => t(s, d, "lineitem").agg(count(lit(1)).as("n")),
      Some("SELECT COUNT(*) AS n FROM lineitem")),

    // Q02 [R, OP-10/21] projection + deterministic prefix. Ordered by the
    // FULL output column list: (l_orderkey, l_linenumber) is not unique in
    // the synthetic data, so any sort on fewer columns than the output is
    // nondeterministic at the tie/limit boundary.
    Q("q02_project",
      (s, d) =>
        t(s, d, "lineitem")
          .select("l_orderkey", "l_partkey", "l_quantity")
          .orderBy(col("l_orderkey"), col("l_partkey"), col("l_quantity"))
          .limit(100),
      Some("""SELECT l_orderkey, l_partkey, l_quantity FROM lineitem
              ORDER BY l_orderkey, l_partkey, l_quantity LIMIT 100""")),

    // Q03 [R, OP-04] multi-token null normalization (reference scan
    // null_values=["", "null", "NULL", "None"]).
    Q("q03_null_norm",
      (s, d) =>
        Readers.normalizeNullMarkers(t(s, d, "part"), Seq("p_type"))
          .select(col("p_type").as("c"))
          .filter(col("c").isNull)
          .agg(count(lit(1)).as("n")),
      Some("""SELECT COUNT(*) AS n FROM (
                SELECT CASE WHEN p_type IN ('', 'null', 'NULL', 'None')
                       THEN NULL ELSE p_type END AS c FROM part) t
              WHERE c IS NULL""")),

    // Q04 [R, OP-13] between + is-null predicate.
    Q("q04_between_null",
      (s, d) =>
        t(s, d, "lineitem")
          .filter(col("l_quantity").between(10, 20) || col("l_quantity").isNull)
          .agg(count(lit(1)).as("n")),
      Some("""SELECT COUNT(*) AS n FROM lineitem
              WHERE (l_quantity BETWEEN 10 AND 20) OR l_quantity IS NULL""")),

    // Q05 [R, OP-14] OR-reduce quarantine filter.
    Q("q05_or_quarantine",
      (s, d) => {
        val viol: Seq[Column] = Seq(
          !col("l_quantity").between(0, 30),
          !col("l_extendedprice").between(0, 40000))
        t(s, d, "lineitem").filter(viol.reduce(_ || _)).agg(count(lit(1)).as("n"))
      },
      Some("""SELECT COUNT(*) AS n FROM lineitem
              WHERE NOT (l_quantity BETWEEN 0 AND 30)
                 OR NOT (l_extendedprice BETWEEN 0 AND 40000)""")),

    // Q06 [R, OP-15] AND-reduce keep filter (complement of Q05 + null-keep).
    Q("q06_and_keep",
      (s, d) => {
        val keep: Seq[Column] = Seq(
          col("l_quantity").between(0, 30) || col("l_quantity").isNull,
          col("l_extendedprice").between(0, 40000) || col("l_extendedprice").isNull)
        t(s, d, "lineitem").filter(keep.reduce(_ && _)).agg(count(lit(1)).as("n"))
      },
      Some("""SELECT COUNT(*) AS n FROM lineitem
              WHERE (l_quantity BETWEEN 0 AND 30 OR l_quantity IS NULL)
                AND (l_extendedprice BETWEEN 0 AND 40000 OR l_extendedprice IS NULL)""")),

    // Q07 [R, OP-16] guarded conditional downcast (out-of-range -> null).
    // FLOOR before the narrow cast so both engines agree on integral value
    // (DuckDB rounds double->int casts; Spark truncates).
    Q("q07_guarded_cast",
      (s, d) =>
        t(s, d, "lineitem")
          .select(
            col("l_orderkey"),
            when(col("l_quantity").between(0, 127),
              floor(col("l_quantity")).cast("smallint"))
              .otherwise(lit(null).cast("smallint")).as("q"))
          .orderBy(col("l_orderkey").asc, col("q").asc_nulls_first)
          .limit(1000),
      Some("""SELECT l_orderkey,
                     CASE WHEN l_quantity BETWEEN 0 AND 127
                          THEN CAST(FLOOR(l_quantity) AS SMALLINT)
                          ELSE NULL END AS q
              FROM lineitem ORDER BY l_orderkey, q NULLS FIRST LIMIT 1000""")),

    // Q08 [R, OP-18] multi-column global min/max in ONE pass (single
    // partial+final agg stage — the profiler's stats scan).
    Q("q08_minmax",
      (s, d) =>
        t(s, d, "lineitem").agg(
          min(col("l_quantity")).as("min_qty"),
          max(col("l_quantity")).as("max_qty"),
          min(col("l_extendedprice")).as("min_price"),
          max(col("l_extendedprice")).as("max_price"),
          // Dates rendered as ISO strings: engine/oracle client libraries
          // disagree on date vs timestamp rendering, strings never do.
          date_format(min(col("l_shipdate")), "yyyy-MM-dd").as("min_ship"),
          date_format(max(col("l_shipdate")), "yyyy-MM-dd").as("max_ship")),
      Some("""SELECT MIN(l_quantity) AS min_qty, MAX(l_quantity) AS max_qty,
                     MIN(l_extendedprice) AS min_price, MAX(l_extendedprice) AS max_price,
                     STRFTIME(MIN(l_shipdate), '%Y-%m-%d') AS min_ship,
                     STRFTIME(MAX(l_shipdate), '%Y-%m-%d') AS max_ship
              FROM lineitem""")),

    // Q09 [R, OP-19] exact distinct count + distinct ratio (the
    // dictionary-encode decision input; approx_count_distinct is the
    // at-scale variant, behaviorally tested).
    Q("q09_distinct_ratio",
      (s, d) =>
        t(s, d, "lineitem").agg(
          countDistinct(col("l_returnflag")).as("n_distinct"),
          round(countDistinct(col("l_returnflag")).cast("double") / count(lit(1)), 8)
            .as("ratio")),
      Some("""SELECT COUNT(DISTINCT l_returnflag) AS n_distinct,
                     ROUND(CAST(COUNT(DISTINCT l_returnflag) AS DOUBLE)/COUNT(*), 8) AS ratio
              FROM lineitem""")),

    // Q10 [R, OP-25] non-strict string->date parse: mixed valid/invalid
    // strings; failures become null (ANSI off = Polars strict=False).
    Q("q10_try_date",
      (s, d) =>
        t(s, d, "events")
          .select(
            when((col("event_id") % 2) === 0,
              concat(lit("2024-01-0"), ((col("event_id") % 9) + 1).cast("string")))
              .otherwise(col("event_type")).as("s"))
          .agg(
            sum(when(to_date(col("s")).isNull, 1).otherwise(0)).as("failed"),
            count(lit(1)).as("total")),
      Some("""SELECT CAST(SUM(CASE WHEN TRY_CAST(s AS DATE) IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS failed,
                     COUNT(*) AS total
              FROM (SELECT CASE WHEN event_id % 2 = 0
                                THEN '2024-01-0' || CAST(event_id % 9 + 1 AS STRING)
                                ELSE event_type END AS s FROM events) t""")),

    // Q11 [R, OP-24] top-k sort desc -> TakeOrderedAndProject.
    Q("q11_topk",
      (s, d) =>
        t(s, d, "lineitem")
          .orderBy(col("l_extendedprice").desc, col("l_orderkey").asc)
          .select("l_orderkey", "l_extendedprice")
          .limit(10),
      Some("""SELECT l_orderkey, l_extendedprice FROM lineitem
              ORDER BY l_extendedprice DESC, l_orderkey ASC LIMIT 10""")),

    // Q12 [R, OP-21/22] deterministic limit.
    Q("q12_limit",
      (s, d) => t(s, d, "nation").orderBy(col("n_nationkey")).limit(5),
      Some("""SELECT n_nationkey, n_name, n_regionkey FROM nation
              ORDER BY n_nationkey LIMIT 5""")),

    // Q13 [R, OP-30] string scalar functions.
    Q("q13_string_fns",
      (s, d) =>
        t(s, d, "nation")
          .orderBy(col("n_nationkey"))
          .select(
            col("n_name"),
            lower(col("n_name")).as("lname"),
            when(col("n_name").like("%A%"), 1).otherwise(0).as("has_a")),
      Some("""SELECT n_name, LOWER(n_name) AS lname,
                     CASE WHEN n_name LIKE '%A%' THEN 1 ELSE 0 END AS has_a
              FROM nation ORDER BY n_nationkey""")),

    // Q14 [R, OP-31] date-part extraction + group-by (the OP-07 partition
    // key derivation, as a query).
    Q("q14_dateparts",
      (s, d) =>
        t(s, d, "orders")
          .groupBy(
            year(col("o_orderdate")).as("y"),
            month(col("o_orderdate")).as("m"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("y"), col("m")),
      Some("""SELECT CAST(YEAR(o_orderdate) AS INT) AS y,
                     CAST(MONTH(o_orderdate) AS INT) AS m, COUNT(*) AS n
              FROM orders GROUP BY 1, 2 ORDER BY 1, 2""")),

    // Q15 [R, OP-28/29] downcast bounds check (Int32 ladder rung).
    Q("q15_bounds",
      (s, d) =>
        t(s, d, "orders")
          .filter(col("o_totalprice") > 2147483647d || col("o_totalprice") < -2147483648d)
          .agg(count(lit(1)).as("n")),
      Some("""SELECT COUNT(*) AS n FROM orders
              WHERE o_totalprice > 2147483647 OR o_totalprice < -2147483648""")),

    // Q16 [E] TPC-H Q1 shape: filter + partial/final hash aggregate.
    // Date-level filter on both sides (timestamp column cast to DATE) so
    // engines agree regardless of time-of-day components.
    Q("q16_tpch_q1",
      (s, d) =>
        t(s, d, "lineitem")
          .filter(col("l_shipdate").cast("date") <= lit("1998-09-02"))
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            round(sum(col("l_quantity")), 2).as("sum_qty"),
            round(sum(col("l_extendedprice")), 2).as("sum_price"),
            count(lit(1)).as("n"))
          .orderBy(col("l_returnflag"), col("l_linestatus")),
      Some("""SELECT l_returnflag, l_linestatus,
                     ROUND(SUM(l_quantity), 2) AS sum_qty,
                     ROUND(SUM(l_extendedprice), 2) AS sum_price,
                     COUNT(*) AS n
              FROM lineitem
              WHERE CAST(l_shipdate AS DATE) <= DATE '1998-09-02'
              GROUP BY l_returnflag, l_linestatus
              ORDER BY l_returnflag, l_linestatus""")),

    // Q17 [E] inner equi-join, dimension side broadcast (25 rows — never
    // shuffle the fact table for this at any scale).
    Q("q17_join_agg",
      (s, d) =>
        t(s, d, "customer")
          .join(broadcast(t(s, d, "nation")),
            col("c_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("n_name")),
      Some("""SELECT n_name, COUNT(*) AS n FROM customer
              JOIN nation ON c_nationkey = n_nationkey
              GROUP BY n_name ORDER BY n_name""")),

    // Q18 [E] multi-join star shape, both dims broadcast.
    Q("q18_multijoin",
      (s, d) =>
        t(s, d, "customer")
          .join(broadcast(t(s, d, "nation")),
            col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(t(s, d, "region")),
            col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("r_name"), col("n_name"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("r_name"), col("n_name")),
      Some("""SELECT r_name, n_name, COUNT(*) AS n FROM customer
              JOIN nation ON c_nationkey = n_nationkey
              JOIN region ON n_regionkey = r_regionkey
              GROUP BY r_name, n_name ORDER BY r_name, n_name""")),

    // Q19 [E] left-semi / left-anti joins (null-safe EXISTS semantics, not
    // NOT IN).
    Q("q19_semi_join",
      (s, d) =>
        t(s, d, "customer")
          .join(t(s, d, "orders"), col("c_custkey") === col("o_custkey"), "left_semi")
          .agg(count(lit(1)).as("n")),
      Some("""SELECT COUNT(*) AS n FROM customer c
              WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)""")),

    Q("q19_anti_join",
      (s, d) =>
        t(s, d, "customer")
          .join(t(s, d, "orders"), col("c_custkey") === col("o_custkey"), "left_anti")
          .agg(count(lit(1)).as("n")),
      Some("""SELECT COUNT(*) AS n FROM customer c
              WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)""")),

    // Q20 [E] window ranking: first order per customer.
    Q("q20_first_order",
      (s, d) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
        t(s, d, "orders")
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(
            col("o_custkey"),
            date_format(col("o_orderdate"), "yyyy-MM-dd").as("od"),
            col("o_totalprice"),
            col("rn"))
          .orderBy(col("o_custkey"))
          .limit(100)
      },
      Some("""SELECT o_custkey, STRFTIME(o_orderdate, '%Y-%m-%d') AS od, o_totalprice,
                     CAST(rn AS INT) AS rn
              FROM (SELECT o_custkey, o_orderdate, o_totalprice, o_orderkey,
                           ROW_NUMBER() OVER (PARTITION BY o_custkey
                                              ORDER BY o_orderdate, o_orderkey) AS rn
                    FROM orders) t
              WHERE rn = 1 ORDER BY o_custkey LIMIT 100""")),

    // Q21 [E] analytic window frame: per-customer running total.
    Q("q21_running_sum",
      (s, d) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        t(s, d, "orders")
          .select(
            col("o_orderkey"),
            round(sum(col("o_totalprice")).over(w), 2).as("running"))
          .orderBy(col("o_orderkey"))
          .limit(100)
      },
      Some("""SELECT o_orderkey,
                     ROUND(SUM(o_totalprice) OVER (PARTITION BY o_custkey
                           ORDER BY o_orderdate, o_orderkey
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running
              FROM orders ORDER BY o_orderkey LIMIT 100""")),

    // Q22 [E] set operations.
    Q("q22_intersect",
      (s, d) =>
        t(s, d, "customer").select(col("c_nationkey").as("k"))
          .intersect(t(s, d, "supplier").select(col("s_nationkey").as("k")))
          .orderBy(col("k")),
      Some("""SELECT c_nationkey AS k FROM customer
              INTERSECT SELECT s_nationkey AS k FROM supplier ORDER BY k""")),

    Q("q22_except",
      (s, d) =>
        t(s, d, "customer").select(col("c_nationkey").as("k"))
          .except(t(s, d, "supplier").select(col("s_nationkey").as("k")))
          .orderBy(col("k")),
      Some("""SELECT c_nationkey AS k FROM customer
              EXCEPT SELECT s_nationkey AS k FROM supplier ORDER BY k""")),

    Q("q22_union_all",
      (s, d) =>
        t(s, d, "customer").select(col("c_nationkey").as("k"))
          .unionAll(t(s, d, "supplier").select(col("s_nationkey").as("k")))
          .agg(count(lit(1)).as("n")),
      Some("""SELECT COUNT(*) AS n FROM (
                SELECT c_nationkey AS k FROM customer
                UNION ALL SELECT s_nationkey AS k FROM supplier) t""")),

    // Q23 [E] exact dedup on a key pair (hash groupBy under the hood).
    Q("q23_dedup_pairs",
      (s, d) =>
        t(s, d, "lineitem").select("l_partkey", "l_suppkey").distinct()
          .agg(count(lit(1)).as("n")),
      Some("""SELECT COUNT(*) AS n FROM (
                SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) t""")),

    // Q24 [E] tumbling event-time window, batch-checkable form (5-minute
    // buckets). The streaming path (window() + watermark) is behaviorally
    // tested in graft.streaming; this bucket form is the hash-matched one.
    Q("q24_event_buckets",
      (s, d) =>
        t(s, d, "events")
          .groupBy(floor(unix_timestamp(col("ts")) / 300).as("bucket"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("bucket")),
      Some("""SELECT CAST(FLOOR(EPOCH(ts)/300) AS BIGINT) AS bucket, COUNT(*) AS n
              FROM events GROUP BY 1 ORDER BY 1"""))
  )
}

package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Relational operator suite over the TPC-H-ish testdata.
  *
  * Covers the reference's relational surface (SURVEY.md §2.3/§2.4: broadcast
  * equi-join `base.py:221-225`, shuffle equi-join `base.py:227`, semi-join
  * spirit `base.py:364-389`, grouped hash agg `base.py:192-208`, distinct
  * `base.py:352`, union `base.py:350`, collect_list `base.py:116-117`) plus
  * the standard capabilities the reference lacks (window functions, sorts /
  * top-k, set ops, rollup/cube, outer/anti joins) — all declarative
  * DataFrame plans so Catalyst applies pushdown, pruning, join selection
  * and whole-stage codegen.
  *
  * Scale notes (100 TB posture): every aggregate is a partial+final hash
  * agg; small dims (nation, region, customer at dim-scale) are broadcast
  * explicitly; fact⋈fact joins shuffle on their equi-keys only after
  * column pruning; outputs are rounded/ordered deterministically for the
  * oracle gate.
  */
object Relational {

  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables(s, dir, n)

  val queries: Seq[Q] = Seq(

    // --- scans + hash aggregation (TPC-H Q1 shape; SURVEY A2 analogue) ---
    Q("q01_agg_lineitem",
      (s, dir) => {
        t(s, dir, "lineitem")
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            round(sum(col("l_quantity")), 2).as("sum_qty"),
            round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
            round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
            round(avg(col("l_quantity")), 4).as("avg_qty"),
            round(avg(col("l_discount")), 4).as("avg_disc"),
            count(lit(1)).as("count_order"))
          .orderBy(col("l_returnflag"), col("l_linestatus"))
      },
      Some("""SELECT l_returnflag, l_linestatus,
             |round(sum(l_quantity),2) AS sum_qty,
             |round(sum(l_extendedprice),2) AS sum_base_price,
             |round(sum(l_extendedprice*(1-l_discount)),2) AS sum_disc_price,
             |round(avg(l_quantity),4) AS avg_qty,
             |round(avg(l_discount),4) AS avg_disc,
             |count(*) AS count_order
             |FROM lineitem GROUP BY 1,2 ORDER BY 1,2""".stripMargin),
      bench = true),

    // --- filter + projection; predicate/column pushdown reach the scan ---
    Q("q02_filter_pushdown",
      (s, dir) => {
        t(s, dir, "lineitem")
          .filter(col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
                  col("l_shipdate") <  lit("1996-01-01").cast("timestamp") &&
                  col("l_quantity") > 45)
          .select(col("l_orderkey"), col("l_linenumber"),
            round(col("l_quantity"), 2).as("qty"),
            round(col("l_extendedprice"), 2).as("price"))
          .orderBy(col("l_orderkey"), col("l_linenumber"))
      },
      Some("""SELECT l_orderkey, l_linenumber, round(l_quantity,2) AS qty,
             |round(l_extendedprice,2) AS price
             |FROM lineitem
             |WHERE l_shipdate >= TIMESTAMP '1995-01-01'
             |  AND l_shipdate <  TIMESTAMP '1996-01-01' AND l_quantity > 45
             |ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    // --- broadcast hash join (reference J1, base.py:221-225) ---
    Q("q03_broadcast_join",
      (s, dir) => {
        t(s, dir, "orders")
          .join(broadcast(t(s, dir, "customer")), col("o_custkey") === col("c_custkey"))
          .groupBy(col("c_mktsegment"))
          .agg(round(sum(col("o_totalprice")), 2).as("revenue"),
               count(lit(1)).as("n_orders"))
          .orderBy(col("c_mktsegment"))
      },
      Some("""SELECT c_mktsegment, round(sum(o_totalprice),2) AS revenue,
             |count(*) AS n_orders
             |FROM orders JOIN customer ON o_custkey = c_custkey
             |GROUP BY 1 ORDER BY 1""".stripMargin),
      bench = true),

    // --- fact⋈fact shuffle join (reference J2, base.py:227) ---
    Q("q04_shuffle_join_agg",
      (s, dir) => {
        t(s, dir, "lineitem")
          .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_orderpriority"))
          .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
               count(lit(1)).as("n_lines"))
          .orderBy(col("o_orderpriority"))
      },
      Some("""SELECT o_orderpriority,
             |round(sum(l_extendedprice*(1-l_discount)),2) AS revenue,
             |count(*) AS n_lines
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |GROUP BY 1 ORDER BY 1""".stripMargin),
      bench = true),

    // --- multiway join: TPC-H Q5 shape (dims broadcast, facts shuffled) ---
    Q("q05_multiway_join",
      (s, dir) => {
        val customer = t(s, dir, "customer")
        val orders   = t(s, dir, "orders")
        val lineitem = t(s, dir, "lineitem")
        val supplier = t(s, dir, "supplier")
        val nation   = t(s, dir, "nation")
        val region   = t(s, dir, "region")
        lineitem
          .join(orders, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(customer), col("o_custkey") === col("c_custkey"))
          .join(broadcast(supplier),
            col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
          .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("r_name"), col("n_name"))
          .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
          .orderBy(col("r_name"), col("n_name"))
      },
      Some("""SELECT r_name, n_name,
             |round(sum(l_extendedprice*(1-l_discount)),2) AS revenue
             |FROM lineitem
             |JOIN orders   ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey  = c_custkey
             |JOIN supplier ON l_suppkey  = s_suppkey AND c_nationkey = s_nationkey
             |JOIN nation   ON s_nationkey = n_nationkey
             |JOIN region   ON n_regionkey = r_regionkey
             |GROUP BY 1,2 ORDER BY 1,2""".stripMargin),
      bench = true),

    // --- left-semi join (reference J3 vocabulary-membership spirit) ---
    Q("q06_semi_join",
      (s, dir) => {
        val bigOrders = t(s, dir, "orders").filter(col("o_totalprice") > 100000)
        t(s, dir, "customer")
          .join(bigOrders, col("c_custkey") === col("o_custkey"), "left_semi")
          .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name")).agg(count(lit(1)).as("n_cust"))
          .orderBy(col("n_name"))
      },
      Some("""SELECT n_name, count(*) AS n_cust
             |FROM customer JOIN nation ON c_nationkey = n_nationkey
             |WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 100000)
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // --- left-anti join ---
    Q("q07_anti_join",
      (s, dir) => {
        t(s, dir, "customer")
          .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left_anti")
          .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n_cust"))
          .orderBy(col("c_mktsegment"))
      },
      Some("""SELECT c_mktsegment, count(*) AS n_cust
             |FROM customer
             |WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // --- left outer join, nulls → 0 ---
    Q("q08_outer_join",
      (s, dir) => {
        t(s, dir, "customer")
          .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left_outer")
          .groupBy(col("c_custkey"))
          .agg(count(col("o_orderkey")).as("n_orders"),
               round(coalesce(sum(col("o_totalprice")), lit(0.0)), 2).as("total_spend"))
          .orderBy(col("c_custkey"))
      },
      Some("""SELECT c_custkey, count(o_orderkey) AS n_orders,
             |round(coalesce(sum(o_totalprice),0),2) AS total_spend
             |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // --- window: ranked top-k per group (SURVEY §2.5 extension) ---
    Q("q09_window_topk",
      (s, dir) => {
        val w = Window.partitionBy(col("p_brand"))
          .orderBy(col("p_retailprice").desc, col("p_partkey"))
        t(s, dir, "part")
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 3)
          .select(col("p_brand"), col("p_partkey"),
            round(col("p_retailprice"), 2).as("price"), col("rn"))
          .orderBy(col("p_brand"), col("rn"))
      },
      Some("""SELECT p_brand, p_partkey, round(p_retailprice,2) AS price, rn
             |FROM (SELECT p_brand, p_partkey, p_retailprice,
             |        row_number() OVER (PARTITION BY p_brand
             |          ORDER BY p_retailprice DESC, p_partkey) AS rn
             |      FROM part)
             |WHERE rn <= 3 ORDER BY p_brand, rn""".stripMargin)),

    // --- window: running sum + lag ---
    Q("q10_window_running",
      (s, dir) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
        t(s, dir, "orders")
          .select(col("o_custkey"), col("o_orderkey"),
            round(sum(col("o_totalprice"))
              .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 2)
              .as("running_spend"),
            round(coalesce(lag(col("o_totalprice"), 1).over(w), lit(0.0)), 2)
              .as("prev_price"))
          .orderBy(col("o_custkey"), col("o_orderkey"))
      },
      Some("""SELECT o_custkey, o_orderkey,
             |round(sum(o_totalprice) OVER (PARTITION BY o_custkey
             |  ORDER BY o_orderdate, o_orderkey
             |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),2) AS running_spend,
             |round(coalesce(lag(o_totalprice,1) OVER (PARTITION BY o_custkey
             |  ORDER BY o_orderdate, o_orderkey),0),2) AS prev_price
             |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin),
      bench = true),

    // --- distinct (reference A4, base.py:352) ---
    Q("q11_distinct",
      (s, dir) => {
        t(s, dir, "lineitem")
          .select(col("l_returnflag"), col("l_linestatus")).distinct()
          .orderBy(col("l_returnflag"), col("l_linestatus"))
      },
      Some("""SELECT DISTINCT l_returnflag, l_linestatus
             |FROM lineitem ORDER BY 1,2""".stripMargin)),

    // --- union + distinct (reference U1, base.py:350-352) ---
    Q("q12_union_distinct",
      (s, dir) => {
        t(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
          .union(t(s, dir, "supplier").select(col("s_nationkey").as("nationkey")))
          .distinct()
          .orderBy(col("nationkey"))
      },
      Some("""SELECT c_nationkey AS nationkey FROM customer
             |UNION
             |SELECT s_nationkey FROM supplier ORDER BY 1""".stripMargin)),

    // --- intersect ---
    Q("q13_intersect",
      (s, dir) => {
        t(s, dir, "lineitem").select(col("l_partkey").as("partkey"))
          .intersect(
            t(s, dir, "part").filter(col("p_size") > 40)
              .select(col("p_partkey").as("partkey")))
          .orderBy(col("partkey"))
      },
      Some("""SELECT l_partkey AS partkey FROM lineitem
             |INTERSECT
             |SELECT p_partkey FROM part WHERE p_size > 40 ORDER BY 1""".stripMargin)),

    // --- except ---
    Q("q14_except",
      (s, dir) => {
        t(s, dir, "part").select(col("p_partkey").as("partkey"))
          .except(t(s, dir, "lineitem").select(col("l_partkey").as("partkey")))
          .orderBy(col("partkey"))
      },
      Some("""SELECT p_partkey AS partkey FROM part
             |EXCEPT
             |SELECT l_partkey FROM lineitem ORDER BY 1""".stripMargin)),

    // --- rollup (capability extension; SURVEY §2.4 absent-note) ---
    Q("q15_rollup",
      (s, dir) => {
        t(s, dir, "lineitem")
          .rollup(col("l_returnflag"), col("l_linestatus"))
          .agg(round(sum(col("l_quantity")), 2).as("sum_qty"), count(lit(1)).as("n"))
          .select(coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
                  coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
                  col("sum_qty"), col("n"))
          .orderBy(col("rf"), col("ls"))
      },
      Some("""SELECT coalesce(l_returnflag,'ALL') AS rf,
             |coalesce(l_linestatus,'ALL') AS ls,
             |round(sum(l_quantity),2) AS sum_qty, count(*) AS n
             |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
             |ORDER BY 1,2""".stripMargin)),

    // --- cube ---
    Q("q16_cube",
      (s, dir) => {
        t(s, dir, "orders")
          .cube(col("o_orderstatus"), col("o_orderpriority"))
          .agg(round(sum(col("o_totalprice")), 2).as("revenue"), count(lit(1)).as("n"))
          .select(coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
                  coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
                  col("revenue"), col("n"))
          .orderBy(col("status"), col("priority"))
      },
      Some("""SELECT coalesce(o_orderstatus,'ALL') AS status,
             |coalesce(o_orderpriority,'ALL') AS priority,
             |round(sum(o_totalprice),2) AS revenue, count(*) AS n
             |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
             |ORDER BY 1,2""".stripMargin)),

    // --- collect_list (reference A3, base.py:116-117), sorted for determinism ---
    Q("q17_collect_sorted",
      (s, dir) => {
        t(s, dir, "supplier")
          .groupBy(col("s_nationkey"))
          .agg(array_join(sort_array(collect_list(col("s_name"))), "|").as("names"))
          .orderBy(col("s_nationkey"))
      },
      Some("""SELECT s_nationkey, string_agg(s_name, '|' ORDER BY s_name) AS names
             |FROM supplier GROUP BY 1 ORDER BY 1""".stripMargin)),

    // --- global sort + limit (top-k) ---
    Q("q18_topk_orders",
      (s, dir) => {
        t(s, dir, "orders")
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
          .limit(20)
          .select(col("o_orderkey"), round(col("o_totalprice"), 2).as("price"))
      },
      Some("""SELECT o_orderkey, round(o_totalprice,2) AS price
             |FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""".stripMargin)),

    // --- exact count-distinct per group ---
    Q("q19_count_distinct",
      (s, dir) => {
        t(s, dir, "orders")
          .groupBy(col("o_orderpriority"))
          .agg(countDistinct(col("o_custkey")).as("n_cust"), count(lit(1)).as("n_orders"))
          .orderBy(col("o_orderpriority"))
      },
      Some("""SELECT o_orderpriority, count(DISTINCT o_custkey) AS n_cust,
             |count(*) AS n_orders
             |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin)),

    // --- statistical aggregates: stddev/variance/correlation/covariance +
    //     exact interpolated percentiles (Spark `percentile` ≡ DuckDB
    //     `quantile_cont`) ---
    Q("q19c_stat_aggs",
      (s, dir) => {
        t(s, dir, "lineitem")
          .groupBy(col("l_returnflag"))
          .agg(
            round(stddev_samp(col("l_quantity")), 4).as("sd_qty"),
            round(var_samp(col("l_quantity")), 4).as("var_qty"),
            round(corr(col("l_quantity"), col("l_extendedprice")), 4).as("corr_qp"),
            round(covar_samp(col("l_quantity"), col("l_discount")), 6).as("cov_qd"),
            round(expr("percentile(l_quantity, 0.5)"), 2).as("median_qty"),
            round(expr("percentile(l_extendedprice, 0.9)"), 2).as("p90_price"))
          .orderBy(col("l_returnflag"))
      },
      Some("""SELECT l_returnflag,
             |round(stddev_samp(l_quantity),4) AS sd_qty,
             |round(var_samp(l_quantity),4) AS var_qty,
             |round(corr(l_quantity,l_extendedprice),4) AS corr_qp,
             |round(covar_samp(l_quantity,l_discount),6) AS cov_qd,
             |round(quantile_cont(l_quantity, 0.5),2) AS median_qty,
             |round(quantile_cont(l_extendedprice, 0.9),2) AS p90_price
             |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin)),

    // --- approx distinct (HLL sketch; implementation-specific values → no
    //     SQL oracle, driver records rows-only; exact twin is q19) ---
    Q("q19b_approx_distinct",
      (s, dir) => {
        t(s, dir, "lineitem")
          .groupBy(col("l_returnflag"))
          .agg(approx_count_distinct(col("l_partkey"), 0.02).as("approx_parts"))
          .orderBy(col("l_returnflag"))
      },
      None),

    // --- deterministic mode / arg-max: the per-group "most frequent" and
    //     "row with the extreme" WITHOUT a window sort — max_by over a
    //     struct ordering key (count-then-value for the mode; value-then-
    //     unique-key for the arg-max) keeps both as plain two-level hash
    //     aggs, the scale-correct pattern vs row_number-over-sort. Ties
    //     are pinned by the struct's lexicographic order, so the result
    //     is deterministic on both engines. ---
    Q("q111_mode_argmax",
      (s, dir) => {
        val oc = t(s, dir, "orders").join(t(s, dir, "customer"),
          col("o_custkey") === col("c_custkey"))
        val modal = oc
          .groupBy(col("c_mktsegment"), col("o_orderpriority"))
          .agg(count(lit(1)).as("n"))
          .groupBy(col("c_mktsegment"))
          .agg(max_by(col("o_orderpriority"),
            struct(col("n"), col("o_orderpriority"))).as("modal_priority"))
        val top = oc.groupBy(col("c_mktsegment"))
          .agg(max_by(col("o_orderkey"),
              struct(col("o_totalprice"), col("o_orderkey"))).as("top_order"),
            round(max(col("o_totalprice")), 2).as("top_price"))
        modal.join(top, "c_mktsegment").orderBy(col("c_mktsegment"))
      },
      Some("""WITH oc AS (SELECT * FROM orders
             |            JOIN customer ON o_custkey = c_custkey),
             |cnt AS (SELECT c_mktsegment, o_orderpriority, count(*) AS n
             |        FROM oc GROUP BY 1,2),
             |m AS (SELECT c_mktsegment, o_orderpriority AS modal_priority,
             |        row_number() OVER (PARTITION BY c_mktsegment
             |          ORDER BY n DESC, o_orderpriority DESC) AS rn
             |      FROM cnt),
             |tp AS (SELECT c_mktsegment, o_orderkey AS top_order,
             |         o_totalprice,
             |         row_number() OVER (PARTITION BY c_mktsegment
             |           ORDER BY o_totalprice DESC, o_orderkey DESC) AS rn
             |       FROM oc)
             |SELECT m.c_mktsegment, m.modal_priority, tp.top_order,
             |       round(tp.o_totalprice, 2) AS top_price
             |FROM m JOIN tp USING (c_mktsegment)
             |WHERE m.rn = 1 AND tp.rn = 1
             |ORDER BY m.c_mktsegment""".stripMargin)),

    // --- unpivot (wide->long melt): the schema-normalization step before
    //     generic per-measure aggregation. Spark's Dataset.unpivot is a
    //     single Expand over the scan (one pass, no union of N scans —
    //     the UNION ALL oracle formulation reads the table 3x; the Expand
    //     reads it once), then one hash agg on (flag, measure). ---
    Q("q112_unpivot",
      (s, dir) => {
        t(s, dir, "lineitem")
          .unpivot(Array(col("l_returnflag")),
            Array(col("l_quantity"), col("l_discount"), col("l_tax")),
            "measure", "val")
          .groupBy(col("l_returnflag"), col("measure"))
          .agg(round(sum(col("val")), 2).as("total"))
          .orderBy(col("l_returnflag"), col("measure"))
      },
      Some("""SELECT l_returnflag, measure, round(sum(val), 2) AS total
             |FROM (
             |  SELECT l_returnflag, 'l_quantity' AS measure,
             |         l_quantity AS val FROM lineitem
             |  UNION ALL SELECT l_returnflag, 'l_discount', l_discount
             |  FROM lineitem
             |  UNION ALL SELECT l_returnflag, 'l_tax', l_tax FROM lineitem)
             |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // --- explicit GROUPING SETS with grouping() flags (rollup/cube's
    //     general form, q15/q16's completion) — exercised through the SQL
    //     surface on a registered view; the physical plan is the same
    //     single Expand + hash agg Catalyst gives rollup. ---
    Q("q113_grouping_sets",
      (s, dir) => {
        t(s, dir, "lineitem").createOrReplaceTempView("li_gs")
        s.sql("""SELECT coalesce(l_returnflag, 'ALL') AS rf,
                |       coalesce(l_linestatus, 'ALL') AS ls,
                |       cast(grouping(l_returnflag) AS INT) AS g_rf,
                |       cast(grouping(l_linestatus) AS INT) AS g_ls,
                |       round(sum(l_extendedprice), 2) AS sum_price,
                |       count(*) AS n
                |FROM li_gs
                |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                |                        (l_returnflag), ())
                |ORDER BY rf, ls""".stripMargin)
      },
      Some("""SELECT coalesce(l_returnflag, 'ALL') AS rf,
             |       coalesce(l_linestatus, 'ALL') AS ls,
             |       grouping(l_returnflag)::INT AS g_rf,
             |       grouping(l_linestatus)::INT AS g_ls,
             |       round(sum(l_extendedprice), 2) AS sum_price,
             |       count(*) AS n
             |FROM lineitem
             |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
             |                        (l_returnflag), ())
             |ORDER BY rf, ls""".stripMargin)),

    // --- TPC-H Q5-shaped star join: revenue (Σ extprice·(1−disc)) by
    //     customer nation and order year. The fact chain is lineitem ⋈
    //     orders ⋈ customer with every dimension (customer→nation→region)
    //     broadcast; the only corpus-scale shuffles are the two fact-key
    //     exchanges and the final (nation, year) agg — the canonical
    //     data-warehouse plan at any scale. ---
    Q("q180_revenue_by_nation_year",
      (s, dir) => {
        val li = Tables(s, dir, "lineitem")
          .select(col("l_orderkey"),
            (col("l_extendedprice") * (lit(1.0) - col("l_discount")))
              .as("rev"))
        val ord = Tables(s, dir, "orders")
          .select(col("o_orderkey"), col("o_custkey"),
            year(col("o_orderdate")).as("yr"))
        val cust = Tables(s, dir, "customer")
          .select(col("c_custkey"), col("c_nationkey"))
        val nat = Tables(s, dir, "nation")
          .select(col("n_nationkey"), col("n_name"))
        li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
          .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name"), col("yr"))
          .agg(round(sum(col("rev")), 2).as("revenue"),
            count(lit(1)).as("n_items"))
          .orderBy(col("n_name"), col("yr"))
      },
      Some("""SELECT n_name, year(o_orderdate) AS yr,
             |  round(sum(l_extendedprice * (1.0 - l_discount)), 2)
             |    AS revenue,
             |  count(*) AS n_items
             |FROM lineitem
             |JOIN orders ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |JOIN nation ON c_nationkey = n_nationkey
             |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),
      bench = true),

    // --- revenue concentration: the share of each nation's total revenue
    //     held by its top-5 customers (the account-concentration risk
    //     metric). Ranking and shares run on the customers-sized revenue
    //     aggregate — the corpus-scale work is the same fact chain as
    //     q180 reduced per customer first. ---
    Q("q183_revenue_concentration",
      (s, dir) => {
        val li = Tables(s, dir, "lineitem")
          .select(col("l_orderkey"),
            (col("l_extendedprice") * (lit(1.0) - col("l_discount")))
              .as("rev"))
        val ord = Tables(s, dir, "orders")
          .select(col("o_orderkey"), col("o_custkey"))
        val cust = Tables(s, dir, "customer")
          .select(col("c_custkey"), col("c_nationkey"))
        val nat = Tables(s, dir, "nation")
          .select(col("n_nationkey"), col("n_name"))
        val perCust = li
          .join(ord, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
          .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name"), col("c_custkey"))
          .agg(sum(col("rev")).as("crev"))
        val w = Window.partitionBy(col("n_name"))
          .orderBy(col("crev").desc, col("c_custkey"))
        perCust
          .withColumn("rk", row_number().over(w))
          .groupBy(col("n_name"))
          .agg(count(lit(1)).as("n_customers"),
            round(sum(when(col("rk") <= 5, col("crev")).otherwise(0.0))
              / sum(col("crev")), 4).as("top5_share"))
          .orderBy(col("n_name"))
      },
      Some("""WITH pc AS (
             |  SELECT n_name, c_custkey,
             |         sum(l_extendedprice * (1.0 - l_discount)) AS crev
             |  FROM lineitem
             |  JOIN orders ON l_orderkey = o_orderkey
             |  JOIN customer ON o_custkey = c_custkey
             |  JOIN nation ON c_nationkey = n_nationkey
             |  GROUP BY 1, 2),
             |r AS (
             |  SELECT *, row_number() OVER (PARTITION BY n_name
             |    ORDER BY crev DESC, c_custkey) AS rk FROM pc)
             |SELECT n_name, count(*) AS n_customers,
             |  round(sum(CASE WHEN rk <= 5 THEN crev ELSE 0.0 END)
             |    / sum(crev), 4) AS top5_share
             |FROM r GROUP BY 1 ORDER BY 1""".stripMargin)),

    // --- 2-D skyline (Pareto frontier): parts minimizing retail price
    //     while maximizing size. Sort-based plan, NOT the O(n²) dominance
    //     self-join the textbook NOT EXISTS spells: one groupBy collapses
    //     the table to (distinct price, max size) — any non-max-size part
    //     at a price is dominated by its own price group — then a running
    //     max over the price-ordered GROUP frame keeps exactly the prices
    //     whose best size strictly beats every cheaper price's best, and a
    //     broadcast semi-join back tags the surviving rows. The window
    //     runs over distinct-price GROUPS (already thousands-fold smaller
    //     than rows; at 100 TB swap in repartitionByRange + two-pass
    //     prefix-max — same algebra, no single-partition stage). Oracled
    //     against the quadratic NOT EXISTS definition, which this plan
    //     must equal row-for-row. ---
    Q("q189_skyline",
      (s, dir) => {
        val p = Tables(s, dir, "part")
          .select(col("p_partkey"), col("p_size"), col("p_retailprice"))
        val g = p.groupBy(col("p_retailprice"))
          .agg(max(col("p_size")).as("gmax"))
        val w = Window.orderBy(col("p_retailprice"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val surv = g.withColumn("prevmax", max(col("gmax")).over(w))
          .filter(col("prevmax").isNull || col("gmax") > col("prevmax"))
          .select(col("p_retailprice"), col("gmax"))
        p.join(broadcast(surv), Seq("p_retailprice"))
          .filter(col("p_size") === col("gmax"))
          .select(col("p_partkey"), col("p_size"), col("p_retailprice"))
          .orderBy(col("p_partkey"))
      },
      Some("""SELECT p_partkey, p_size, p_retailprice FROM part a
             |WHERE NOT EXISTS (
             |  SELECT 1 FROM part b
             |  WHERE b.p_retailprice <= a.p_retailprice
             |    AND b.p_size >= a.p_size
             |    AND (b.p_retailprice < a.p_retailprice OR b.p_size > a.p_size))
             |ORDER BY p_partkey""".stripMargin)),

    // --- q189's 100 TB twin, SHIPPED (the q75/q75b pattern): the same
    //     skyline with NO single-partition window. Price groups are
    //     range-partitioned; pass 1 collects per-partition (max size,
    //     min price) — a partition-count-sized frame, metadata by
    //     construction — and turns it into per-partition PREFIX-MAX
    //     offsets on the driver; pass 2 runs the running max WITHIN each
    //     partition (parallel) and combines with the broadcast offset.
    //     Range partitioning colocates equal prices, so group semantics
    //     are identical to q189's; the checkpoint pins partition ids
    //     across the two passes (range sampling re-runs otherwise).
    //     Same oracle as q189 — the outputs must be row-identical. ---
    Q("q189b_skyline_ranged",
      (s, dir) => {
        val p = Tables(s, dir, "part")
          .select(col("p_partkey"), col("p_size"), col("p_retailprice"))
        val rg = p.groupBy(col("p_retailprice"))
          .agg(max(col("p_size")).as("gmax"))
          .repartitionByRange(8, col("p_retailprice"))
          .withColumn("pid", spark_partition_id())
          .localCheckpoint()
        val bounds = rg.groupBy(col("pid"))
          .agg(min(col("p_retailprice")).as("lo"), max(col("gmax")).as("pmax"))
          .collect().sortBy(_.getAs[Double]("lo"))
        // prefix max over partitions with strictly smaller price ranges —
        // zip each partition with the running max of everything BEFORE it
        // (scanLeft.init), which is total on 0- and 1-partition inputs
        // where a sliding(2) pairing would emit a short window.
        val offsets = bounds
          .zip(bounds.scanLeft(Int.MinValue) { (acc, r) =>
            math.max(acc, r.getAs[Int]("pmax"))
          }.init)
          .map { case (r, off) => (r.getAs[Int]("pid"), off) }
          .toSeq
        val offDf = broadcast(
          s.createDataFrame(offsets).toDF("pid", "off"))
        val w = Window.partitionBy(col("pid")).orderBy(col("p_retailprice"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val surv = rg
          .withColumn("inmax",
            coalesce(max(col("gmax")).over(w), lit(Int.MinValue)))
          .join(offDf, "pid")
          .filter(col("gmax") > greatest(col("inmax"), col("off")))
          .select(col("p_retailprice"), col("gmax"))
        p.join(broadcast(surv), Seq("p_retailprice"))
          .filter(col("p_size") === col("gmax"))
          .select(col("p_partkey"), col("p_size"), col("p_retailprice"))
          .orderBy(col("p_partkey"))
      },
      Some("""SELECT p_partkey, p_size, p_retailprice FROM part a
             |WHERE NOT EXISTS (
             |  SELECT 1 FROM part b
             |  WHERE b.p_retailprice <= a.p_retailprice
             |    AND b.p_size >= a.p_size
             |    AND (b.p_retailprice < a.p_retailprice OR b.p_size > a.p_size))
             |ORDER BY p_partkey""".stripMargin))
  )
}

package streamline.batch

import org.apache.spark.sql.{DataFrame, SparkSession}
import streamline.Q

/** §2.13 SQL-text entry point — the remaining TPC-H query shapes.
  *
  * SqlApi.scala carries Q1/3/5/10/11/16/18/22; this module completes
  * the 22-query suite with Q2/4/6/7/8/9/12/13/14/15/17/19/20/21,
  * adapted to the fixture schemas exactly the way Q11/Q16/Q22 were:
  * there is no `partsupp` table and lineitem has no
  * commitdate/receiptdate/shipmode, so
  *  - Q2/Q17/Q20's part-supplier cost/stock relation is derived from
  *    lineitem ((partkey, suppkey) grouping; min unit price as the
  *    supply-cost stand-in),
  *  - Q4/Q12/Q21's "late lineitem" predicates use l_shipdate relative
  *    to o_orderdate (a join-local predicate, never a correlated
  *    non-equi one) or the returned-flag,
  *  - Q19's container predicates become p_size bands.
  * Every query keeps the ORIGINAL relational shape the TPC-H query is
  * famous for (correlated EXISTS, nested IN chains, min-per-group join
  * back, disjunctive join predicates, nested aggregation, scalar-max
  * CTE), because the shape is what exercises the planner.
  *
  * Determinism follows SURVEY.md §2.12: all money math in
  * DECIMAL(18,4) with a single final DOUBLE cast, counts pinned to
  * BIGINT, years to INT, and every ORDER BY extended to a unique key
  * so LIMIT cuts identically in both engines. Ratios (Q8/Q14) divide
  * two correctly-rounded doubles — one IEEE operation, bit-identical
  * in both engines. Q9's profit subtraction re-casts the revenue term
  * to DECIMAL(18,4) first (exact: the product has scale 4) so the
  * difference stays inside both engines' 38-digit cap instead of
  * tripping their different precision-loss rules.
  *
  * Scale posture mirrors the originals: the selective dimension
  * (part/supplier/nation) always filters FIRST and broadcasts into the
  * lineitem scan; the big table shuffles once on its join key;
  * min-per-group (Q2/Q15) and avg-per-group (Q17) are keyed
  * aggregates joined back, never windowed sorts; the Q21 EXISTS pair
  * plans as semi/anti joins on l_orderkey. Nothing here reads
  * lineitem more than the textual number of references.
  */
object SqlTpch {

  import SqlApi.sql

  private val vol =
    """CAST(l_extendedprice AS DECIMAL(18,4))
      |         * (1 - CAST(l_discount AS DECIMAL(18,4)))""".stripMargin

  private val revenue = s"CAST(sum($vol) AS DOUBLE)"

  /** q_sql_tpch2 — minimum-cost-supplier shape (TPC-H Q2): the
    * min-per-group scalar joined back against the group. The
    * part-supplier cost relation is lineitem's (partkey, suppkey)
    * pairs with min(l_extendedprice) as the cost stand-in (no
    * partsupp table in the fixtures). */
  private val tpch2Text = """
    WITH ps AS (
      SELECT l_partkey AS partkey, l_suppkey AS suppkey,
             min(l_extendedprice) AS supplycost
      FROM lineitem GROUP BY l_partkey, l_suppkey),
    mincost AS (
      SELECT partkey, min(supplycost) AS min_cost
      FROM ps
        JOIN supplier ON suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE'
      GROUP BY partkey)
    SELECT s_acctbal, s_name, n_name, p_partkey, p_brand,
           supplycost
    FROM part
      JOIN ps ON p_partkey = ps.partkey
      JOIN supplier ON ps.suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      JOIN mincost ON mincost.partkey = p_partkey
                  AND ps.supplycost = mincost.min_cost
    WHERE p_type = 'ECONOMY' AND r_name = 'EUROPE'
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100"""

  /** q_sql_tpch4 — order-priority-checking shape (TPC-H Q4): a
    * correlated EXISTS (planned as a left-semi join) under a keyed
    * count. The lateness predicate is the returned flag (no
    * commit/receipt dates in the fixture). */
  private val tpch4Text = """
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-07-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1997-10-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority"""

  /** q_sql_tpch6 — forecasting-revenue-change shape (TPC-H Q6): the
    * canonical fully-pushed-down scan aggregate; every predicate
    * reaches the parquet reader. */
  private val tpch6Text = """
    SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))
                    * CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE)
             AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24"""

  /** q_sql_tpch7 — volume-shipping shape (TPC-H Q7): the two-nation
    * OR pair over a 6-table join, grouped by both nation roles and
    * ship year. */
  private val tpch7Text = s"""
    SELECT supp_nation, cust_nation, l_year,
           CAST(sum(volume) AS DOUBLE) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(EXTRACT(YEAR FROM l_shipdate) AS INT) AS l_year,
             $vol AS volume
      FROM supplier
        JOIN lineitem ON s_suppkey = l_suppkey
        JOIN orders ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00') shipping
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year"""

  /** q_sql_tpch8 — national-market-share shape (TPC-H Q8): the
    * conditional-share ratio per order year. Both sums are exact
    * decimals; the share is ONE double division. NATION_9 is the
    * dominant supplier nation in the AMERICA-region slice, so the
    * share is nonzero in both years. */
  private val tpch8Text = s"""
    SELECT o_year,
           CAST(sum(volume) FILTER (WHERE nation = 'NATION_9')
                AS DOUBLE)
             / CAST(sum(volume) AS DOUBLE) AS mkt_share
    FROM (
      SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS o_year,
             $vol AS volume,
             n2.n_name AS nation
      FROM part
        JOIN lineitem ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n1 ON c_nationkey = n1.n_nationkey
        JOIN region ON n1.n_regionkey = r_regionkey
        JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'AMERICA'
        AND o_orderdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                            AND TIMESTAMP '1997-12-31 00:00:00'
        AND p_type = 'ECONOMY') all_nations
    GROUP BY o_year
    ORDER BY o_year"""

  /** q_sql_tpch9 — product-type-profit shape (TPC-H Q9): profit per
    * supplier nation per year over a part-name LIKE slice. Cost
    * stand-in: p_retailprice × quantity (no partsupp supplycost).
    * The revenue product is re-cast to DECIMAL(18,4) — exact, its
    * value has scale 4 — before the subtraction so both engines
    * subtract identical narrow decimals. */
  private val tpch9Text = """
    SELECT nation, o_year, CAST(sum(amount) AS DOUBLE) AS sum_profit
    FROM (
      SELECT n_name AS nation,
             CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS o_year,
             CAST(CAST(l_extendedprice AS DECIMAL(18,4))
                  * (1 - CAST(l_discount AS DECIMAL(18,4)))
                  AS DECIMAL(18,4))
               - CAST(p_retailprice AS DECIMAL(12,2))
                 * CAST(l_quantity AS DECIMAL(4,0)) AS amount
      FROM part
        JOIN lineitem ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders ON o_orderkey = l_orderkey
        JOIN nation ON s_nationkey = n_nationkey
      WHERE p_name LIKE '%bolt%') profit
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC"""

  /** q_sql_tpch12 — shipping-mode-priority shape (TPC-H Q12): the
    * two-bucket CASE count per lineitem class. Mode stand-in:
    * l_returnflag; lateness stand-in: shipped on/after the order
    * date (a plain join predicate). */
  private val tpch12Text = """
    SELECT l_returnflag,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT)
             AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT)
             AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= o_orderdate
      AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_returnflag
    ORDER BY l_returnflag"""

  /** q_sql_tpch13 — customer-distribution shape (TPC-H Q13): the
    * nested aggregation (count per customer, then histogram of the
    * counts) over a filtered LEFT JOIN — the filter lives in the ON
    * clause so customers with zero qualifying orders still count.
    * Filter stand-in: priority, not the comment LIKE. */
  private val tpch13Text = """
    SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
    FROM (SELECT c_custkey, count(o_orderkey) AS c_count
          FROM customer
            LEFT JOIN orders ON c_custkey = o_custkey
                            AND o_orderpriority <> '1-URGENT'
          GROUP BY c_custkey) c_orders
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC"""

  /** q_sql_tpch14 — promotion-effect shape (TPC-H Q14): the
    * percentage ratio of a conditional sum to the total, one month
    * of ship dates. The fixture's p_type domain has a literal
    * 'PROMO' value. */
  private val tpch14Text = s"""
    SELECT CAST(100 AS DOUBLE)
             * CAST(sum($vol) FILTER (WHERE p_type = 'PROMO')
                    AS DOUBLE)
             / CAST(sum($vol) AS DOUBLE) AS promo_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-10-01 00:00:00'"""

  /** q_sql_tpch15 — top-supplier shape (TPC-H Q15): a revenue CTE
    * referenced twice — once as the join input, once under max() —
    * with the scalar max joined as a single-row broadcast (the Q11
    * lesson: a scalar-subquery spelling executes the aggregate
    * twice). Equality is on the EXACT decimal, cast to double only
    * on output. */
  private val tpch15Text = s"""
    WITH revenue0 AS (
      SELECT l_suppkey AS supplier_no, sum($vol) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name,
           CAST(total_revenue AS DOUBLE) AS total_revenue
    FROM supplier
      JOIN revenue0 ON s_suppkey = supplier_no
      JOIN (SELECT max(total_revenue) AS mx FROM revenue0) m
        ON total_revenue = mx
    ORDER BY s_suppkey"""

  /** q_sql_tpch17 — small-quantity-order shape (TPC-H Q17): rows
    * below 20% of their part's average quantity. The avg threshold
    * is spelled in EXACT integer-ish decimal arithmetic
    * (5·q·cnt < sum_qty ⟺ q < 0.2·avg) so no engine's double
    * rounding can flip a boundary row, and the per-part aggregate
    * is a CTE joined back (one lineitem pass for it, not one per
    * row). */
  private val tpch17Text = """
    WITH pq AS (
      SELECT l_partkey AS agg_partkey,
             CAST(count(*) AS DECIMAL(10,0)) AS cnt,
             sum(CAST(l_quantity AS DECIMAL(18,4))) AS sum_qty
      FROM lineitem GROUP BY l_partkey)
    SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)))
                AS DOUBLE) / CAST(7 AS DOUBLE) AS avg_yearly
    FROM lineitem
      JOIN part ON p_partkey = l_partkey
      JOIN pq ON agg_partkey = l_partkey
    WHERE p_brand = 'Brand#23'
      AND 5 * CAST(l_quantity AS DECIMAL(18,4)) * cnt < sum_qty"""

  /** q_sql_tpch19 — discounted-revenue shape (TPC-H Q19): the
    * disjunction of three brand/size/quantity bands as a JOIN
    * predicate (container bands become p_size bands). The planner
    * should push the common p_partkey equality and evaluate the OR
    * residually. */
  private val tpch19Text = s"""
    SELECT $revenue AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 20 AND 30)"""

  /** q_sql_tpch20 — potential-part-promotion shape (TPC-H Q20): the
    * nested IN chain — suppliers IN (heavy shippers of parts IN
    * (name slice)) — with the per-(supplier, part) shipped quantity
    * as the availqty stand-in. Both INs plan as semi joins. */
  private val tpch20Text = """
    SELECT s_name, s_acctbal, n_name
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE s_suppkey IN (
      SELECT l_suppkey FROM lineitem
      WHERE l_partkey IN (SELECT p_partkey FROM part
                          WHERE p_name LIKE 'small%')
        AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY l_suppkey, l_partkey
      HAVING sum(CAST(l_quantity AS DECIMAL(18,4))) > 50)
    ORDER BY s_name"""

  /** q_sql_tpch21 — waiting-supplier shape (TPC-H Q21): the classic
    * EXISTS / NOT EXISTS pair against the same fact table (semi +
    * anti join on l_orderkey). "Late" = shipped more than 180 days
    * after the order date; the NOT EXISTS branch re-joins orders
    * INSIDE the subquery so its lateness predicate stays local
    * (never a correlated non-equi reference to the outer order). */
  private val tpch21Text = """
    SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM supplier
      JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
      JOIN orders ON o_orderkey = l1.l_orderkey
      JOIN nation ON s_nationkey = n_nationkey
    WHERE o_orderstatus = 'F'
      AND l1.l_shipdate > o_orderdate + INTERVAL 180 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1
                      FROM lineitem l3
                        JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate >
                              o3.o_orderdate + INTERVAL 180 DAY)
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 100"""

  /** q_sql_correlated_scalar — a correlated scalar aggregate subquery
    * in the SELECT list (Calcite CORRELATE → scalar agg). Catalyst
    * decorrelates it to one keyed aggregate LEFT-OUTER-joined back,
    * never a per-row re-execution, and handles the classic COUNT bug
    * (an order with no lineitems must read 0, not NULL — the outer
    * join's NULL is coalesced by the decorrelation). The 1998+ date
    * filter keeps some orders lineitem-less so the COUNT-bug path is
    * actually exercised in the data. */
  private val correlatedScalarText = """
    SELECT o_orderkey, o_totalprice,
      (SELECT CAST(count(*) AS BIGINT) FROM lineitem
       WHERE l_orderkey = o_orderkey) AS n_items,
      (SELECT CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)
       FROM lineitem WHERE l_orderkey = o_orderkey) AS sum_qty
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
    ORDER BY o_orderkey"""

  private def q(name: String, text: String): Q =
    Q(name, (spark: SparkSession, dir: String) => sql(spark, dir, text),
      text)

  val all: Seq[Q] = Seq(
    q("q_sql_tpch2", tpch2Text),
    q("q_sql_tpch4", tpch4Text),
    q("q_sql_tpch6", tpch6Text),
    q("q_sql_tpch7", tpch7Text),
    q("q_sql_tpch8", tpch8Text),
    q("q_sql_tpch9", tpch9Text),
    q("q_sql_tpch12", tpch12Text),
    q("q_sql_tpch13", tpch13Text),
    q("q_sql_tpch14", tpch14Text),
    q("q_sql_tpch15", tpch15Text),
    q("q_sql_tpch17", tpch17Text),
    q("q_sql_tpch19", tpch19Text),
    q("q_sql_tpch20", tpch20Text),
    q("q_sql_tpch21", tpch21Text),
    q("q_sql_correlated_scalar", correlatedScalarText))
}

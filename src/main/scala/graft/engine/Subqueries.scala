package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}

/** SQL-text subquery surface (SURVEY §2.2's declarative-query capability,
  * exercised through `spark.sql` rather than the DataFrame API). These hit
  * Catalyst rewrite rules the DataFrame operators never touch:
  * RewriteCorrelatedScalarSubquery (correlated scalar -> left outer join +
  * aggregate, with the COUNT-bug null fixup), RewritePredicateSubquery
  * (EXISTS/IN -> semi/anti join), and LateralJoin planning.
  *
  * Scale posture: every rewrite lands on a key-partitioned shuffle or
  * broadcast join — the subquery text is sugar, the physical plan is the
  * same join/aggregate shapes as the rest of the engine, so the 100 TB
  * behavior is inherited from those operators.
  *
  * Temp-view names are scoped by the sfDir slug so concurrent builders at
  * different scale factors on one shared session never collide
  * (ConcurrencySpec's contract); re-registration of the same (view, sfDir)
  * pair is idempotent.
  */
object Subqueries {

  private def slug(d: String): String = d.replaceAll("[^A-Za-z0-9_]", "_")

  /** Register the fixture views for this sfDir and return the suffix. */
  private def views(s: SparkSession, d: String): String = {
    val g = slug(d)
    Tables.customer(s, d).createOrReplaceTempView(s"customer_$g")
    Tables.orders(s, d).createOrReplaceTempView(s"orders_$g")
    Tables.lineitem(s, d).createOrReplaceTempView(s"lineitem_$g")
    g
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Correlated scalar subquery in the SELECT list: per-customer order
    // count. Catalyst must rewrite to a left outer join + aggregate AND
    // patch the COUNT bug (customers with no orders get 0, not NULL).
    "q_subq_scalar" -> { (s, d) =>
      val g = views(s, d)
      s.sql(
        s"""SELECT c_custkey, c_name,
           | (SELECT count(*) FROM orders_$g o
           |   WHERE o.o_custkey = c.c_custkey) AS n_orders
           | FROM customer_$g c
           | WHERE c_custkey <= 500
           | ORDER BY c_custkey""".stripMargin)
    },

    // Correlated EXISTS / NOT EXISTS over the same driving table in one
    // query: orders that have at least one returned item and none shipped
    // after the order date + 60 days. Both rewrite to semi/anti joins on
    // l_orderkey with the correlated residual pushed into the join.
    "q_subq_exists" -> { (s, d) =>
      val g = views(s, d)
      s.sql(
        s"""SELECT o_orderkey, o_orderpriority
           | FROM orders_$g o
           | WHERE EXISTS (SELECT 1 FROM lineitem_$g l
           |    WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
           |  AND NOT EXISTS (SELECT 1 FROM lineitem_$g l
           |    WHERE l.l_orderkey = o.o_orderkey
           |     AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
           | ORDER BY o_orderkey""".stripMargin)
    },

    // IN / NOT IN predicate subqueries (both key columns are non-null, so
    // NOT IN's three-valued-logic trap is not in play): orders from
    // BUILDING-segment customers, excluding multi-item orders.
    "q_subq_in" -> { (s, d) =>
      val g = views(s, d)
      s.sql(
        s"""SELECT o_orderkey, o_custkey, o_totalprice
           | FROM orders_$g
           | WHERE o_custkey IN (SELECT c_custkey FROM customer_$g
           |    WHERE c_mktsegment = 'BUILDING')
           |  AND o_orderkey NOT IN (SELECT l_orderkey FROM lineitem_$g
           |    GROUP BY l_orderkey HAVING count(*) > 3)
           | ORDER BY o_orderkey""".stripMargin)
    },

    // Uncorrelated scalar subquery as a filter threshold. max() is exact
    // on doubles (no summation-order sensitivity), so the comparison is
    // engine-stable; the subquery plans as a one-row broadcast.
    "q_subq_uncorrelated" -> { (s, d) =>
      val g = views(s, d)
      s.sql(
        s"""SELECT o_orderkey, o_totalprice
           | FROM orders_$g
           | WHERE o_totalprice > (SELECT max(o_totalprice)
           |    FROM orders_$g) * 0.8
           | ORDER BY o_orderkey""".stripMargin)
    },

    // Correlated scalar AGGREGATE subquery in the WHERE clause: each
    // customer's most recent order(s). Catalyst decorrelates into a
    // per-custkey max aggregate joined back on the key (exactly the
    // groupBy+join a hand-written latest-row query would build), so the
    // sugar costs one extra key-partitioned aggregate, never a
    // per-row re-scan. max(date) is exact — no float boundary — and
    // date ties legitimately return both orders, deterministically.
    "q_subq_correlated_agg" -> { (s, d) =>
      val g = views(s, d)
      s.sql(
        s"""SELECT o_orderkey, o_custkey, o_orderdate, o_totalprice
           | FROM orders_$g o
           | WHERE o_orderdate = (SELECT max(o2.o_orderdate)
           |    FROM orders_$g o2 WHERE o2.o_custkey = o.o_custkey)
           | ORDER BY o_orderkey""".stripMargin)
    },

    // LATERAL correlated subquery: each priority bucket's three most
    // recent orders — the SQL spelling of top-k-per-group. Spark plans a
    // LateralJoin; the DataFrame twin is q_topk_per_group's window.
    "q_subq_lateral" -> { (s, d) =>
      val g = views(s, d)
      s.sql(
        s"""SELECT p.o_orderpriority, t.o_orderkey, t.o_orderdate
           | FROM (SELECT DISTINCT o_orderpriority FROM orders_$g) p,
           |  LATERAL (SELECT o_orderkey, o_orderdate FROM orders_$g o
           |    WHERE o.o_orderpriority = p.o_orderpriority
           |    ORDER BY o_orderdate DESC, o_orderkey LIMIT 3) t
           | ORDER BY p.o_orderpriority, t.o_orderdate DESC,
           |  t.o_orderkey""".stripMargin)
    },

    // Quantified comparison (ALL) surface: suppliers strictly above /
    // below EVERY account balance in the reference nations. Spark SQL has
    // no `> ALL (subquery)` quantifier, so the engine spells the standard
    // decorrelation — `> ALL S` ≡ `> max(S)` and `< ALL S` ≡ `< min(S)`
    // for a non-empty null-free S (both hold here: s_acctbal is null-free
    // and the reference set is non-empty at every fixture SF) — while the
    // DuckDB oracle runs the true ALL quantifier, pinning the rewrite's
    // equivalence. Each scalar subquery plans as a one-row broadcast;
    // comparisons are raw parquet doubles (no arithmetic, no rounding).
    "q_subq_any_all" -> { (s, d) =>
      val g = views(s, d)
      Tables.supplier(s, d).createOrReplaceTempView(s"supplier_$g")
      s.sql(
        s"""SELECT 'gt_all' AS rel, s_suppkey, s_name, s_acctbal
           | FROM supplier_$g
           | WHERE s_acctbal > (SELECT max(s_acctbal) FROM supplier_$g
           |    WHERE s_nationkey % 5 = 0)
           | UNION ALL
           | SELECT 'lt_all' AS rel, s_suppkey, s_name, s_acctbal
           | FROM supplier_$g
           | WHERE s_acctbal < (SELECT min(s_acctbal) FROM supplier_$g
           |    WHERE s_nationkey % 5 = 0)
           | ORDER BY rel, s_suppkey""".stripMargin)
    },

    // The NOT IN null trap — the three-valued-logic semantics every SQL
    // migration gets burned by: a NULL in the subquery makes
    // `x NOT IN (…)` UNKNOWN for every x (a planted NULL row guarantees
    // the trap at every SF), so the count collapses to 0, while the
    // null-filtered NOT IN and the NOT EXISTS anti-join agree on the
    // true complement. All three spellings run side by side and the
    // oracle must reproduce the identical triple — pinning that both
    // engines implement the standard (and standardly surprising) 3VL.
    // Scale: NOT EXISTS plans as a LeftAnti hash join on the key; the
    // NOT IN variants build a null-aware anti join (Spark's
    // NullAwareAntiJoin) — the demo also documents WHY production
    // pipelines spell complements as anti-joins.
    "q_subq_not_in" -> { (s, d) =>
      val g = views(s, d)
      Tables.customer(s, d).createOrReplaceTempView(s"customer_$g")
      Tables.orders(s, d).createOrReplaceTempView(s"orders_$g")
      s.sql(
        s"""WITH ref AS (
           |  SELECT o_custkey AS k FROM orders_$g
           |   WHERE o_orderstatus = 'P'
           |  UNION ALL SELECT CAST(NULL AS BIGINT)),
           | a AS (SELECT count(*) AS n_not_in FROM customer_$g
           |  WHERE c_custkey NOT IN (SELECT k FROM ref)),
           | b AS (SELECT count(*) AS n_not_in_clean FROM customer_$g
           |  WHERE c_custkey NOT IN
           |   (SELECT k FROM ref WHERE k IS NOT NULL)),
           | e AS (SELECT count(*) AS n_anti FROM customer_$g c
           |  WHERE NOT EXISTS
           |   (SELECT 1 FROM ref r WHERE r.k = c.c_custkey)),
           | t AS (SELECT count(*) AS n_customers FROM customer_$g)
           | SELECT n_not_in, n_not_in_clean, n_anti, n_customers
           | FROM a, b, e, t""".stripMargin)
    }
  )

  val oracle: Map[String, String] = Map(
    "q_subq_scalar" ->
      """SELECT c_custkey, c_name,
        | (SELECT count(*) FROM orders o
        |   WHERE o.o_custkey = c.c_custkey) AS n_orders
        | FROM customer c WHERE c_custkey <= 500
        | ORDER BY c_custkey""".stripMargin.replaceAll("\n", " "),

    "q_subq_exists" ->
      """SELECT o_orderkey, o_orderpriority
        | FROM orders o
        | WHERE EXISTS (SELECT 1 FROM lineitem l
        |    WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l
        |    WHERE l.l_orderkey = o.o_orderkey
        |     AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
        | ORDER BY o_orderkey""".stripMargin.replaceAll("\n", " "),

    "q_subq_in" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
        | FROM orders
        | WHERE o_custkey IN (SELECT c_custkey FROM customer
        |    WHERE c_mktsegment = 'BUILDING')
        |  AND o_orderkey NOT IN (SELECT l_orderkey FROM lineitem
        |    GROUP BY l_orderkey HAVING count(*) > 3)
        | ORDER BY o_orderkey""".stripMargin.replaceAll("\n", " "),

    "q_subq_uncorrelated" ->
      """SELECT o_orderkey, o_totalprice
        | FROM orders
        | WHERE o_totalprice > (SELECT max(o_totalprice) FROM orders) * 0.8
        | ORDER BY o_orderkey""".stripMargin.replaceAll("\n", " "),

    "q_subq_correlated_agg" ->
      """SELECT o_orderkey, o_custkey, o_orderdate, o_totalprice
        | FROM orders o
        | WHERE o_orderdate = (SELECT max(o2.o_orderdate)
        |    FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
        | ORDER BY o_orderkey""".stripMargin.replaceAll("\n", " "),

    "q_subq_lateral" ->
      """SELECT p.o_orderpriority, t.o_orderkey, t.o_orderdate
        | FROM (SELECT DISTINCT o_orderpriority FROM orders) p,
        |  LATERAL (SELECT o_orderkey, o_orderdate FROM orders o
        |    WHERE o.o_orderpriority = p.o_orderpriority
        |    ORDER BY o_orderdate DESC, o_orderkey LIMIT 3) t
        | ORDER BY p.o_orderpriority, t.o_orderdate DESC, t.o_orderkey"""
        .stripMargin.replaceAll("\n", " "),

    // The TRUE quantified spelling — pins the Spark-side max/min
    // decorrelation equivalent (valid: reference set non-empty, no nulls).
    "q_subq_any_all" ->
      """SELECT * FROM (
        | SELECT 'gt_all' AS rel, s_suppkey, s_name, s_acctbal
        |  FROM supplier
        |  WHERE s_acctbal > ALL (SELECT s_acctbal FROM supplier
        |     WHERE s_nationkey % 5 = 0)
        | UNION ALL
        | SELECT 'lt_all' AS rel, s_suppkey, s_name, s_acctbal
        |  FROM supplier
        |  WHERE s_acctbal < ALL (SELECT s_acctbal FROM supplier
        |     WHERE s_nationkey % 5 = 0))
        | ORDER BY rel, s_suppkey"""
        .stripMargin.replaceAll("\n", " "),

    // The same planted-NULL trap triple — both engines must agree that
    // NOT IN over a null-bearing set counts zero while the filtered
    // NOT IN and NOT EXISTS agree on the true complement.
    "q_subq_not_in" ->
      """WITH ref AS (
        |  SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'P'
        |  UNION ALL SELECT CAST(NULL AS BIGINT)),
        | a AS (SELECT CAST(count(*) AS BIGINT) AS n_not_in
        |  FROM customer WHERE c_custkey NOT IN (SELECT k FROM ref)),
        | b AS (SELECT CAST(count(*) AS BIGINT) AS n_not_in_clean
        |  FROM customer WHERE c_custkey NOT IN
        |   (SELECT k FROM ref WHERE k IS NOT NULL)),
        | e AS (SELECT CAST(count(*) AS BIGINT) AS n_anti FROM customer c
        |  WHERE NOT EXISTS
        |   (SELECT 1 FROM ref r WHERE r.k = c.c_custkey)),
        | t AS (SELECT CAST(count(*) AS BIGINT) AS n_customers
        |  FROM customer)
        | SELECT n_not_in, n_not_in_clean, n_anti, n_customers
        | FROM a, b, e, t"""
        .stripMargin.replaceAll("\n", " ")
  )
}

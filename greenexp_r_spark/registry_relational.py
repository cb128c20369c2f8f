"""Registry section 4: relational (TPC-H-ish) queries + oracles."""

from __future__ import annotations

from .operators import relational as R
from .registry import QSpec

_ORACLE_PRICING = """
WITH g AS (
  SELECT l_returnflag, l_linestatus,
         CAST(SUM(CAST(round(l_quantity * 100) AS BIGINT))
              AS BIGINT) AS sum_qty_c,
         CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT))
              AS BIGINT) AS sum_price_c,
         CAST(SUM(CAST(round(l_extendedprice * (1.0 - l_discount) * 1000000)
                  AS BIGINT)) AS BIGINT) AS sum_disc_price_micro,
         CAST(SUM(CAST(round(l_discount * 10000) AS BIGINT))
              AS BIGINT) AS sum_disc_bp,
         COUNT(*) AS count_order
  FROM lineitem GROUP BY l_returnflag, l_linestatus
)
SELECT l_returnflag, l_linestatus, sum_qty_c, sum_price_c,
       sum_disc_price_micro,
       CAST(sum_qty_c AS DOUBLE) / (100.0 * count_order) AS avg_qty,
       CAST(sum_disc_bp AS DOUBLE) / (10000.0 * count_order) AS avg_disc,
       count_order
FROM g
"""

_ORACLE_TOP_CUST = """
WITH rev AS (
  SELECT o_custkey,
         CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS revenue_c,
         COUNT(*) AS n_orders
  FROM orders GROUP BY o_custkey
),
j AS (
  SELECT r.r_name, c.c_custkey, c.c_name, rev.revenue_c, rev.n_orders
  FROM rev
  JOIN customer c ON rev.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
)
SELECT r_name AS region,
       CAST(ROW_NUMBER() OVER (PARTITION BY r_name
            ORDER BY revenue_c DESC, c_custkey ASC) AS INT) AS rank,
       c_custkey AS custkey, c_name AS cust_name, revenue_c, n_orders
FROM j
QUALIFY rank <= 5
"""

_ORACLE_NATION = """
SELECT n.n_name AS nation, o.o_orderpriority,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(round(o.o_totalprice * 100) AS BIGINT))
            AS BIGINT) AS total_c
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name, o.o_orderpriority
HAVING COUNT(*) > 5
"""


def build_relational_registry() -> dict[str, QSpec]:
    return {
        "q_pricing_summary": QSpec(
            lambda s, sf: R.pricing_summary(s, sf), _ORACLE_PRICING),
        "q_top_customers_by_region": QSpec(
            lambda s, sf: R.top_customers_by_region(s, sf),
            _ORACLE_TOP_CUST),
        "q_nation_order_stats": QSpec(
            lambda s, sf: R.nation_order_stats(s, sf), _ORACLE_NATION),
    }

"""Order/part market analytics: basket affinity, discount
elasticity, ABC revenue classification (r16 queue, X199/X200/X203).

The X-family's first cohort over the TPC-H-shaped tables rather than
documents/events/embeddings: the reference's cost-ETL consumers run
exactly this class of "what sells together / what drives volume /
which SKUs carry the revenue" panel on the loaded fact table (the
reference stops at load + views — src/loaders/postgresql.py:46-107
leaves analysis to downstream SQL; these operators ARE that
downstream layer, Spark-native).

House conventions throughout: exact integer/DECIMAL arithmetic
(cents·e2 discounts → e4 revenue units), ppm ratios via integer
division, deterministic tie-breaks, two-phase rank/cumsum helpers
from operators/ranking.py instead of unpartitioned windows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# money-to-integer conventions shared with the TPC-H analog suite:
# extendedprice is exact cents at e2; discount is an exact e2 fraction
# (0.00-0.10 in TPC-H); quantity is integral but arrives as a double
# in some fixture generations, so it rounds through e0.
_CENTS = "CAST(ROUND({col} * 100) AS BIGINT)"
_E2 = "CAST(ROUND({col} * 100) AS BIGINT)"
_QTY = "CAST(ROUND({col}) AS BIGINT)"


def market_basket_pairs(
    lineitem: DataFrame,
    order_col: str = "l_orderkey",
    item_col: str = "l_partkey",
    top_n: int = 25,
) -> DataFrame:
    """X199: market-basket affinity — the top part PAIRS co-ordered
    in the same order, with support/confidence/lift (Agrawal et al.
    1993's frequent-itemset panel at k=2, the size that needs no
    candidate lattice).

    Output per pair (item_a < item_b): ``n_both`` (orders containing
    both), ``support_ppm`` = 10⁶·n_both div N_orders,
    ``conf_a_to_b_ppm`` = 10⁶·n_both div n_a (and the reverse), and
    ``lift_ppm`` = 10⁶·N·n_both div (n_a·n_b) through DECIMAL(38,0)
    (the product overflows BIGINT at warehouse scale).  Top ``top_n``
    by (n_both desc, item_a, item_b) — exact integers end to end.

    Scale: pair generation is a self-join on the ORDER key over the
    distinct (order, item) table, so per-order work is bounded by
    basket size squared (TPC-H baskets ≤ 7 lines; retail baskets are
    tens) — linear in orders, never item-cardinality-squared.  The
    top-n pair set arrives via TakeOrderedAndProject and only then
    joins the item-frequency table (the ≤ top_n-row side broadcast),
    so nothing pair-cardinality-sized crosses one task."""
    items = (
        lineitem.select(
            F.col(order_col).alias("__o"), F.col(item_col).alias("__i")
        )
        .distinct()
    )
    n_orders = items.agg(
        F.count_distinct(F.col("__o")).cast("long").alias("__N")
    )
    item_counts = items.groupBy("__i").agg(
        F.count(F.lit(1)).cast("long").alias("__ni")
    )
    a = items.select(F.col("__o"), F.col("__i").alias("item_a"))
    b = items.select(F.col("__o"), F.col("__i").alias("item_b"))
    pairs = (
        a.join(b, "__o")
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_both"))
        .orderBy(F.desc("n_both"), F.asc("item_a"), F.asc("item_b"))
        .limit(int(top_n))
    )
    na = item_counts.select(
        F.col("__i").alias("item_a"), F.col("__ni").alias("__na")
    )
    nb = item_counts.select(
        F.col("__i").alias("item_b"), F.col("__ni").alias("__nb")
    )
    return (
        F.broadcast(pairs)
        .join(na, "item_a")
        .join(nb, "item_b")
        .crossJoin(F.broadcast(n_orders))
        .select(
            "item_a",
            "item_b",
            "n_both",
            F.expr("(1000000 * n_both) div __N").alias("support_ppm"),
            F.expr("(1000000 * n_both) div __na").alias("conf_a_to_b_ppm"),
            F.expr("(1000000 * n_both) div __nb").alias("conf_b_to_a_ppm"),
            F.expr(
                "CAST((CAST(1000000 AS DECIMAL(38,0)) * __N * n_both) "
                "div (CAST(__na AS DECIMAL(38,0)) * __nb) AS BIGINT)"
            ).alias("lift_ppm"),
        )
        .orderBy(F.desc("n_both"), F.asc("item_a"), F.asc("item_b"))
    )


def discount_qty_elasticity(
    lineitem: DataFrame,
    part: DataFrame,
    group_col: str = "p_brand",
    partkey_li: str = "l_partkey",
    partkey_p: str = "p_partkey",
    discount_col: str = "l_discount",
    qty_col: str = "l_quantity",
) -> DataFrame:
    """X200: discount→quantity elasticity per part group — the OLS
    slope of quantity on discount, the "does discounting move volume"
    panel, computed exactly: x = e2 discount ticks, y = integral
    quantity, slope_e6 = 10⁶·(n·Σxy − Σx·Σy) div (n·Σx² − (Σx)²)
    with every sum in DECIMAL(38,0) and ONE integer division at the
    end (the X59/X174 closed-form discipline — no float drift, no
    per-engine summation-order dependence).  A group whose discounts
    are all equal has zero denominator and reports NULL slope with
    its ``n_lines`` intact.

    Scale: one partkey-equi-join (dimension side; Catalyst/AQE picks
    broadcast when part fits) + one |groups|-bounded aggregate —
    nothing beyond the fact-table scan."""
    x = F.expr(_E2.format(col=discount_col))
    y = F.expr(_QTY.format(col=qty_col))
    j = lineitem.select(
        F.col(partkey_li).alias("__pk"),
        x.cast("decimal(38,0)").alias("__x"),
        y.cast("decimal(38,0)").alias("__y"),
    ).join(
        part.select(
            F.col(partkey_p).alias("__pk"), F.col(group_col).alias("grp")
        ),
        "__pk",
    )
    return (
        j.groupBy("grp")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            F.sum("__x").alias("__sx"),
            F.sum("__y").alias("__sy"),
            F.sum(F.col("__x") * F.col("__y")).alias("__sxy"),
            F.sum(F.col("__x") * F.col("__x")).alias("__sxx"),
        )
        .select(
            "grp",
            "n_lines",
            F.expr(
                "CASE WHEN n_lines * __sxx - __sx * __sx = 0 THEN NULL "
                "ELSE CAST((CAST(1000000 AS DECIMAL(38,0)) * "
                "(n_lines * __sxy - __sx * __sy)) "
                "div (n_lines * __sxx - __sx * __sx) AS BIGINT) END"
            ).alias("slope_e6"),
        )
        .orderBy("grp")
    )


def part_revenue_abc(
    lineitem: DataFrame,
    partkey_col: str = "l_partkey",
    price_col: str = "l_extendedprice",
    discount_col: str = "l_discount",
    a_ppm: int = 800_000,
    b_ppm: int = 950_000,
) -> DataFrame:
    """X203: ABC (Pareto) revenue classification — parts ranked by
    discounted revenue, classed A/B/C by cumulative revenue share
    (≤ ``a_ppm``, ≤ ``b_ppm``, rest — the 80/95 warehouse default),
    reported as a 3-row panel (class, n_parts, revenue_e4,
    share_ppm).  The "which SKUs carry the revenue" census.

    Exactness: revenue per line = cents(price) · (100 − e2 discount)
    — an exact e4 integer; per-part sums and the running total in
    DECIMAL(38,0); a part is class A iff its INCLUSIVE cumulative
    revenue · 10⁶ ≤ a_ppm · total (integer comparison, documented
    boundary: the part that crosses the threshold starts the next
    class).

    Scale (the reason this lives here and not in a notebook): the
    revenue ranking + running sum go through the two-phase
    ``ranking.with_global_cumsum`` — ordered by (−revenue as double
    for bucket balance, exact −revenue DECIMAL, partkey) — so no
    part-cardinality sort ever runs in one task; decimal→double is
    monotone (IEEE round-to-nearest), so the double leading key can
    collapse near-ties into one bucket but never inverts order, and
    the exact DECIMAL key refines inside the bucket."""
    from .ranking import with_global_cumsum

    rev = F.expr(
        f"CAST({_CENTS.format(col=price_col)} AS DECIMAL(38,0)) * "
        f"(100 - {_E2.format(col=discount_col)})"
    )
    parts = (
        lineitem.select(
            F.col(partkey_col).alias("__pk"), rev.alias("__r")
        )
        .groupBy("__pk")
        .agg(F.sum("__r").alias("__rev"))
        .withColumn("__negd", (-F.col("__rev")).cast("double"))
        .withColumn("__neg", -F.col("__rev"))
    )
    cum = with_global_cumsum(
        parts,
        ["__negd", "__neg", "__pk"],
        "__rev",
        cum_col="__cum",
        total_col="__W",
    )
    classed = cum.select(
        F.expr(
            f"CASE WHEN __cum * 1000000 <= CAST({int(a_ppm)} AS "
            "DECIMAL(38,0)) * __W THEN 'A' "
            f"WHEN __cum * 1000000 <= CAST({int(b_ppm)} AS "
            "DECIMAL(38,0)) * __W THEN 'B' ELSE 'C' END"
        ).alias("abc_class"),
        F.col("__rev"),
        F.col("__W"),
    )
    return (
        classed.groupBy("abc_class")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_parts"),
            F.sum("__rev").cast("decimal(38,0)").alias("revenue_e4"),
            F.max("__W").alias("__W"),
        )
        .select(
            "abc_class",
            "n_parts",
            "revenue_e4",
            F.expr(
                "CAST((CAST(1000000 AS DECIMAL(38,0)) * revenue_e4) "
                "div __W AS BIGINT)"
            ).alias("share_ppm"),
        )
        .orderBy("abc_class")
    )

"""Relational core operators (SURVEY.md §2.2, §2.6, partial §2.8).

Each public function is a `queries()` entry with a matching DuckDB
oracle in ``via_spark.oracles``. They re-express the reference's
filter/projection/top-k surface over the driver fixture tables, plus
TPC-H-style headline aggregate/join queries that exercise the same
operator classes at volume (the reference has no SQL benchmark of its
own — BASELINE.md).

Reference parity notes (capability, not code):
* P1 time-range predicate    — ``app/services/qdrant_service.py:140``
* P2 keyword equality        — ``app/services/qdrant_service.py:93-94``
* P3 full-text MatchText     — ``app/services/forensic_analysis_service.py:28``
* P4/S3/K4 live-tail filter  — ``app/api/v1/endpoints/stream.py:11-37``
* P7 malformed-record drop   — ``app/services/ingestion_service.py:69-71``
* P8 response shaping        — ``app/services/forensic_analysis_service.py:67-74``
* K3 newest-N sample         — ``app/services/qdrant_service.py:155``
* F5 severity mapping        — ``generate_logs.py:59``
* F9 JSON serialization      — ``app/services/ingestion_service.py:66``

Scale posture: every filter here is a native Column predicate that
Catalyst pushes into the parquet scan (check ``PushedFilters`` in
``.explain``); every top-k is an ``orderBy().limit()`` that Spark plans
as TakeOrderedAndProject (partition-local heap + driver merge — no
global sort); the TPC-H joins broadcast their dimension sides.

Determinism: money aggregates go through ``fixed6`` (floor to 1e-6
fixed-point, sum as exact BIGINT, divide back) so Spark and DuckDB agree
bit-for-bit regardless of summation order — double sums are NOT
reorder-stable, fixed-point sums are.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from via_spark.functions.text import severity_number, tokens
from via_spark.session import load_table

# event_type → OTel-style severity text (pinned engine mapping so the
# reference's severity-number table F5 applies to the fixture stream).
EVENT_SEVERITY = {
    "error": "ERROR",
    "purchase": "WARN",
    "signup": "INFO",
    "click": "DEBUG",
    "view": "DEBUG",
}

FIXED_SCALE = 1_000_000  # 1e-6 fixed point for reorder-stable money sums


def fixed6(col: Column) -> Column:
    """double → exact 1e-6 fixed-point BIGINT (floor). Summing these is
    associative/exact, unlike double sums."""
    return F.floor(col * FIXED_SCALE).cast("long")


# --- P1: time-range predicate + P8 shaping ---------------------------------

def time_range_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders placed in calendar 1996 (P1 range pushdown on a timestamp)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.where(
            F.col("o_orderdate").between(
                F.lit("1996-01-01").cast("timestamp_ntz"),
                F.lit("1996-12-31 23:59:59").cast("timestamp_ntz"),
            )
        )
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate")
    )


# --- P2: keyword equality ---------------------------------------------------

def keyword_filter_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BUILDING-segment customers (P2 keyword predicate, P8 projection)."""
    c = load_table(spark, sf_dir, "customer")
    return c.where(F.col("c_mktsegment") == "BUILDING").select(
        "c_custkey", "c_name", "c_acctbal"
    )


# --- P3: full-text word match ----------------------------------------------

def fulltext_match_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents whose token set contains BOTH 'hash' and 'merge'
    (MatchText word semantics: lowercased word tokenizer, all terms)."""
    d = load_table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    return d.where(
        F.array_contains(toks, "hash") & F.array_contains(toks, "merge")
    ).select("doc_id", "lang", "source", "n_chars")


# --- S3/P4/K4: live tail ----------------------------------------------------

def live_tail_documents(spark: SparkSession, sf_dir: str, needle: str = "spark",
                        limit: int = 50) -> DataFrame:
    """Last `limit` documents (doc_id desc = file order) containing the
    needle case-insensitively — the reference's live-tail endpoint."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.where(F.contains(F.lower(F.col("text")), F.lit(needle.lower())))
        .orderBy(F.col("doc_id").desc())
        .limit(limit)
        .select("doc_id", "text")
    )


# --- P7: malformed-record filter -------------------------------------------

def malformed_filter_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe JSON key extraction with dropout of malformed rows
    (P7), keeping rows with props.k > 80."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        ev.withColumn("k", k)
        .where(F.col("k").isNotNull() & (F.col("k") > 80))
        .select("event_id", "event_type", "k")
    )


# --- F5 + F9: severity mapping and JSON shaping ----------------------------

def severity_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events → severity text (pinned EVENT_SEVERITY map) → OTel
    severity number (F5) → counts."""
    ev = load_table(spark, sf_dir, "events")
    mapping = F.create_map(*[F.lit(x) for kv in EVENT_SEVERITY.items() for x in kv])
    sev = F.element_at(mapping, F.col("event_type"))
    return (
        ev.withColumn("severity", sev)
        .withColumn("severity_number", severity_number("severity"))
        .groupBy("severity", "severity_number")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def json_payload_shaping(spark: SparkSession, sf_dir: str, limit: int = 100) -> DataFrame:
    """F9: serialize a projected payload back to a JSON string
    (the reference's full_log_json passthrough)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.orderBy(F.col("event_id").asc())
        .limit(limit)
        .select(
            "event_id",
            F.to_json(
                F.struct(F.col("event_id"), F.col("event_type"), F.col("user_id"))
            ).alias("payload_json"),
        )
    )


# --- K3: newest-N sample ----------------------------------------------------

def newest_events(spark: SparkSession, sf_dir: str, n: int = 1000) -> DataFrame:
    """Newest `n` events (ts desc, event_id desc tiebreak) — the
    baseline-sample scan shape, planned as TakeOrderedAndProject."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select("event_id", F.expr("ts div 1000000000").alias("ts_sec"))
        .orderBy(F.col("ts_sec").desc(), F.col("event_id").desc())
        .limit(n)
    )


# --- TPC-H-style headline queries (joins + aggs at volume) ------------------

def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: grouped lineitem aggregates with reorder-stable
    fixed-point money sums. Map-side partial aggregation + single
    shuffle on the (tiny) group key — the textbook Spark agg plan."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            (F.sum(fixed6(F.col("l_quantity"))) / float(FIXED_SCALE)).alias("sum_qty"),
            (F.sum(fixed6(F.col("l_extendedprice"))) / float(FIXED_SCALE)).alias("sum_base_price"),
            (F.sum(fixed6(disc_price)) / float(FIXED_SCALE)).alias("sum_disc_price"),
            (F.sum(fixed6(charge)) / float(FIXED_SCALE)).alias("sum_charge"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: 3-way join, grouped revenue, global top-10.
    customer is the small side → broadcast; lineitem↔orders shuffle on
    the join key with AQE sizing."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    cutoff = F.lit("1996-03-15").cast("timestamp_ntz")
    rev = fixed6(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        li.where(F.col("l_shipdate") > cutoff)
        .join(o.where(F.col("o_orderdate") < cutoff), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(c.where(F.col("c_mktsegment") == "BUILDING")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg((F.sum(rev) / float(FIXED_SCALE)).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("o_orderdate").asc(), F.col("l_orderkey").asc())
        .limit(10)
    )


def local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 5-way join with two broadcast dimension tables
    (nation, region) and a co-located customer/supplier nation match."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    rev = fixed6(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(s, (F.col("l_suppkey") == F.col("s_suppkey")) & (F.col("c_nationkey") == F.col("s_nationkey")))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r.where(F.col("r_name") == "ASIA")), F.col("n_regionkey") == F.col("r_regionkey"))
        .where(
            F.col("o_orderdate").between(
                F.lit("1996-01-01").cast("timestamp_ntz"),
                F.lit("1996-12-31 23:59:59").cast("timestamp_ntz"),
            )
        )
        .groupBy("n_name")
        .agg((F.sum(rev) / float(FIXED_SCALE)).alias("revenue"))
    )


# --- Q4 shape: EXISTS semi-join + grouped counts ----------------------------

def order_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: orders in a quarter having at least one lineitem
    shipped more than 60 days after the order date (EXISTS → left_semi
    join with a cross-table predicate), counted per priority. Semi join
    semantics — no row duplication, shuffles once on the order key."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    window = o.where(
        F.col("o_orderdate").between(
            F.lit("1996-01-01").cast("timestamp_ntz"),
            F.lit("1996-03-31 23:59:59").cast("timestamp_ntz"),
        )
    )
    return (
        window.join(
            li,
            (F.col("o_orderkey") == F.col("l_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


# --- Q14 shape: conditional aggregate over a part join ----------------------

def promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promo revenue share in one month. Conditional
    fixed-point sums keep the ratio exactly reproducible; the part side
    joins on its key (broadcast at fixture scale, shuffle at 100 TB)."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    rev = fixed6(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    joined = li.where(
        F.col("l_shipdate").between(
            F.lit("1996-03-01").cast("timestamp_ntz"),
            F.lit("1996-03-31 23:59:59").cast("timestamp_ntz"),
        )
    ).join(p, F.col("l_partkey") == F.col("p_partkey"))
    agg = joined.agg(
        F.sum(F.when(F.col("p_type").startswith("PROMO"), rev).otherwise(0)).alias("promo_fix"),
        F.sum(rev).alias("total_fix"),
    )
    return agg.select(
        (F.col("promo_fix").cast("double") / FIXED_SCALE).alias("promo_revenue"),
        (F.col("total_fix").cast("double") / FIXED_SCALE).alias("total_revenue"),
        (
            F.lit(100.0) * F.col("promo_fix").cast("double") / F.col("total_fix")
        ).alias("promo_share_pct"),
    )


# --- skew-aware aggregation (salting pattern) -------------------------------

def salted_counts(df: DataFrame, key: str, salt_n: int = 16) -> DataFrame:
    """Two-phase salted aggregation for skewed keys: count per
    (key, salt) first — spreading one hot key over ``salt_n`` reducers —
    then sum the partials per key. Results are identical to a plain
    groupBy; only the shuffle distribution changes. AQE's skew handling
    covers joins; this is the aggregation-side pattern made explicit."""
    salted = df.withColumn("_salt", (F.rand(seed=42) * salt_n).cast("int"))
    partial = salted.groupBy(key, "_salt").agg(F.count(F.lit(1)).alias("_partial"))
    return partial.groupBy(key).agg(F.sum("_partial").alias("n"))


def salted_event_type_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.event_type is skewed (view/click dominate) — count via the
    salting pattern; oracle is the plain GROUP BY (same result)."""
    ev = load_table(spark, sf_dir, "events")
    return salted_counts(ev, "event_type")


# --- pivot + grouping sets (breadth beyond the reference) -------------------

def event_type_severity_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: one row per user-id bucket, one count column per event
    type — the wide-table shape dashboards consume. Pinned column set
    (explicit pivot values) keeps the schema stable at any scale and
    avoids the extra distinct-values job."""
    ev = load_table(spark, sf_dir, "events")
    bucket = (F.col("user_id") % 10).alias("user_bucket")
    return (
        ev.groupBy(bucket)
        .pivot("event_type", ["view", "click", "signup", "purchase", "error"])
        .agg(F.count(F.lit(1)))
        .na.fill(0)
    )


def lineitem_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over (returnflag, linestatus): per-group, per-flag and
    grand-total fixed-point revenue in one pass — Spark plans the
    grouping sets as a single expand+aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    rev = fixed6(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            (F.sum(rev) / float(FIXED_SCALE)).alias("revenue"),
            F.count(F.lit(1)).alias("n"),
        )
    )


def per_day_topk(spark: SparkSession, sf_dir: str, k: int = 3) -> DataFrame:
    """K5 literal form: per-day top-k — each daily shard ("collection"
    in the reference's federated layout) contributes its OWN top-k by
    value, the per-collection page a federated search merges. The
    engine's documented K5 superset (true global top-k, SCALE.md)
    coexists; this is the per-shard page shape itself.

    Scale: one shuffle on the day key; row_number-over-limit compiles
    to WindowGroupLimit, so each partition keeps a k-row heap instead
    of fully sorting its day."""
    ev = load_table(spark, sf_dir, "events")
    day = F.expr("ts div 1000000000 div 86400").cast("int")
    w = Window.partitionBy("day").orderBy(
        F.col("value").desc(), F.col("event_id").asc()
    )
    return (
        ev.select("event_id", day.alias("day"), "value")
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
    )


def customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13 shape: left outer join + two-level aggregation — how many
    customers placed how many orders (order-less customers count at 0).
    Scale: both aggregations are hash aggs; the join shuffles on
    custkey with map-side partial counts after AQE."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    per = (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


def min_cost_supplier(spark: SparkSession, sf_dir: str, size: int = 15) -> DataFrame:
    """Q2 shape (adapted to this schema — no partsupp table): for each
    part of the given size, the supplier with the lowest total billed
    amount for it (ties → smallest suppkey). The correlated-scalar-min
    subquery becomes a per-part WindowGroupLimit — one shuffle on
    partkey, no correlated re-execution."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").where(F.col("p_size") == size)
    s = load_table(spark, sf_dir, "supplier")
    cost = (
        li.join(F.broadcast(p.select("p_partkey", "p_brand")),
                li["l_partkey"] == p["p_partkey"])
        .groupBy("p_partkey", "p_brand", "l_suppkey")
        .agg(F.sum(fixed6(F.col("l_extendedprice"))).alias("cost_fix"))
    )
    w = Window.partitionBy("p_partkey").orderBy(
        F.col("cost_fix").asc(), F.col("l_suppkey").asc()
    )
    best = (
        cost.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
    )
    return (
        best.join(F.broadcast(s), best["l_suppkey"] == s["s_suppkey"])
        .select(
            "p_partkey", "p_brand",
            F.col("s_suppkey"), "s_name",
            (F.col("cost_fix") / float(FIXED_SCALE)).alias("cost"),
        )
    )


def large_orders_having(spark: SparkSession, sf_dir: str, min_qty: int = 300) -> DataFrame:
    """Q18 shape: HAVING over a grouped sum, then enrich with two joins
    and take the top-100 heap. Quantities are integral, so the BIGINT
    sum is exact under any reduction order."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"))
        .where(F.col("sum_qty") > min_qty)
    )
    return (
        big.join(o, big["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .select("c_name", "c_custkey", "o_orderkey", "o_orderdate",
                "o_totalprice", "sum_qty")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(100)
    )


def brand_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 shape: NOT IN (suppliers in arrears) as a broadcast left_anti
    join + COUNT DISTINCT per (brand, type). The anti-join runs before
    the aggregation so excluded suppliers never reach the distinct."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    s = load_table(spark, sf_dir, "supplier")
    bad = s.where(F.col("s_acctbal") < 0).select(
        F.col("s_suppkey").alias("l_suppkey")
    )
    return (
        li.join(F.broadcast(bad), "l_suppkey", "left_anti")
        .join(F.broadcast(p.select("p_partkey", "p_brand", "p_type")),
              li["l_partkey"] == p["p_partkey"])
        .groupBy("p_brand", "p_type")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


def _buyers_in_year(orders: DataFrame, year: int) -> DataFrame:
    """Distinct customers with an order in calendar ``year`` — the
    timestamp-literal predicate pushes down to the parquet scan."""
    return (
        orders.where(
            (F.col("o_orderdate") >= F.lit(f"{year}-01-01").cast("timestamp_ntz"))
            & (F.col("o_orderdate") < F.lit(f"{year + 1}-01-01").cast("timestamp_ntz"))
        )
        .select("o_custkey")
        .distinct()
    )


def repeat_buyers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT set op: customers who ordered in BOTH 1995 and 1996.

    Spark plans INTERSECT as a distinct + hash semi-join on all
    columns — one shuffle per side on the full row key, AQE-skew-safe.
    Enriched with the market segment via a broadcast dim join."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    both = _buyers_in_year(orders, 1995).intersect(_buyers_in_year(orders, 1996))
    return both.join(
        F.broadcast(cust.select(F.col("c_custkey").alias("o_custkey"), "c_mktsegment")),
        "o_custkey",
    )


def lapsed_buyers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT set op: customers who ordered in 1995 but NOT in 1996
    (churn cohort). Spark plans EXCEPT as distinct + left-anti hash
    join — same scale shape as the rules anti-join."""
    orders = load_table(spark, sf_dir, "orders")
    return _buyers_in_year(orders, 1995).subtract(_buyers_in_year(orders, 1996))


PIVOT_EVENT_TYPES = ("view", "click", "signup", "purchase", "error")


def event_type_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt): the wide pivot back to long form — one row per
    (bucket, event_type) INCLUDING explicit zero cells, which a direct
    long-form groupBy would omit. Spark's ``unpivot`` expands columns
    to rows with no shuffle (the only shuffle is the pivot's own agg)."""
    wide = event_type_severity_pivot(spark, sf_dir)
    return wide.unpivot(
        ["user_bucket"], list(PIVOT_EVENT_TYPES), "event_type", "n"
    )


def severity_set_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation: the sorted distinct event types per
    user bucket joined into one string. ``collect_set`` order is
    partition-noise, so ``array_sort`` pins it BEFORE the join —
    the discipline any listagg needs to be deterministic under
    distributed aggregation."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy((F.col("user_id") % 10).alias("user_bucket"))
        .agg(
            F.array_join(F.array_sort(F.collect_set("event_type")), ",").alias(
                "event_types"
            ),
            F.countDistinct("event_type").alias("n_types"),
        )
    )


def referential_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality audit: count referential-integrity violations via
    broadcast anti-joins (orders→customer, lineitem→orders,
    orders→existing lineitems). Emits one row per check INCLUDING
    zeros — the audit's contract is 'checked and clean', not silence.
    Each check is one anti-join + count; nothing is quadratic."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    li = load_table(spark, sf_dir, "lineitem")

    def cnt(df: DataFrame, name: str) -> DataFrame:
        return df.agg(
            F.lit(name).alias("violation"), F.count(F.lit(1)).alias("n")
        )

    orphan_orders = orders.join(
        F.broadcast(cust.select(F.col("c_custkey").alias("o_custkey"))),
        "o_custkey",
        "left_anti",
    )
    orphan_lineitems = li.join(
        orders.select(F.col("o_orderkey").alias("l_orderkey")),
        "l_orderkey",
        "left_anti",
    )
    childless_orders = orders.join(
        li.select(F.col("l_orderkey").alias("o_orderkey")).distinct(),
        "o_orderkey",
        "left_anti",
    )
    return (
        cnt(orphan_orders, "orders_without_customer")
        .unionByName(cnt(orphan_lineitems, "lineitems_without_order"))
        .unionByName(cnt(childless_orders, "orders_without_lineitems"))
    )


def props_json_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON attribute extraction over the events ``props`` column (the
    F10 attribute-lookup capability applied to a raw JSON string
    column): per event_type, coverage and stats of the integer ``k``
    attribute.

    Scale posture: get_json_object is a JVM-native codegen expression
    (no Python), evaluated once per row pre-aggregation; the agg is one
    hash shuffle keyed by event_type. Sums are exact BIGINTs; the mean
    is derived from them, so parity is bit-exact.
    """
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count("k").alias("n_with_k"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
        .withColumn(
            "avg_k",
            F.col("sum_k").cast("double") / F.col("n_with_k").cast("double"),
        )
    )


def events_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-profiling audit of the events table: per column, null count
    and exact distinct cardinality — the table-health report a pipeline
    runs before trusting a new data drop.

    Scale posture: one pass computes all null counts (conditional sums)
    plus one count_distinct per column in a single aggregation (Spark
    plans multi-distinct via expand — cost scales with column count,
    bounded here); the unpivot to rows is driver-side on a 1-row frame.
    """
    ev = load_table(spark, sf_dir, "events")
    cols = ["event_type", "user_id", "value", "props"]
    aggs = []
    for c in cols:
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nulls"))
        aggs.append(F.count_distinct(F.col(c)).alias(f"{c}__distinct"))
    one = ev.agg(F.count(F.lit(1)).alias("n_rows"), *aggs)
    stack = ", ".join(f"'{c}', {c}__nulls, {c}__distinct" for c in cols)
    return one.select(
        "n_rows",
        F.expr(
            f"stack({len(cols)}, {stack}) AS (column_name, n_nulls, n_distinct)"
        ),
    ).select("column_name", "n_nulls", "n_distinct", "n_rows")


def revenue_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto report: customers ranked by lifetime order revenue,
    bucketed into deciles (decile 1 = top spenders), with each decile's
    exact revenue share — the concentration curve behind "which 10% of
    accounts carry the business" (and, for a data pipeline, "which 10%
    of feeds carry the tokens").

    Scale posture: per-customer revenue is one hash agg with exact
    fixed-point money sums; the global decile rank goes through
    rank.global_row_number (range partition + broadcast offsets — no
    single-partition window); shares derive from BIGINT sums. The
    decile formula ((rank-1)*10 div n) + 1 is pure integer arithmetic,
    identical in both engines (ntile's remainder distribution is NOT).
    """
    from via_spark.operators.rank import global_row_number

    o = load_table(spark, sf_dir, "orders")
    per = o.groupBy("o_custkey").agg(
        F.sum(fixed6(F.col("o_totalprice"))).alias("revenue_fix")
    )
    ranked = global_row_number(
        per, [F.col("revenue_fix").desc(), F.col("o_custkey").asc()], "rank"
    )
    tot = per.agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum("revenue_fix").alias("total_fix"),
    )
    return (
        ranked.crossJoin(F.broadcast(tot))
        .withColumn("decile", F.expr("((rank - 1) * 10) div n_customers + 1"))
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("revenue_fix").alias("decile_revenue_fix"),
            (
                F.sum("revenue_fix").cast("double")
                / F.first("total_fix").cast("double")
            ).alias("revenue_share"),
        )
    )


# --- TPC-H Q7/Q8/Q10 shapes over the fixture's column subset ---------------

def volume_shipping(spark: SparkSession, sf_dir: str,
                    nation_a: str = "NATION_1", nation_b: str = "NATION_2") -> DataFrame:
    """TPC-H Q7 shape: shipping volume between two nations by year —
    supplier nation × customer nation revenue for the (A,B)/(B,A) pairs
    over a two-year ship window. Exercises a four-way join where BOTH
    endpoints need a nation dimension (aliased broadcast joins) plus a
    disjunctive cross-nation predicate.

    Scale posture: lineitem joins orders on the fact key (shuffle);
    supplier/customer/nation sides broadcast; the year extraction is a
    post-join projection so the date filter still pushes to the scan.
    """
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate").between(
            F.lit("1996-01-01").cast("timestamp_ntz"),
            F.lit("1997-12-31 23:59:59").cast("timestamp_ntz"),
        )
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    su = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    cu = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load_table(spark, sf_dir, "nation")
    n1 = n.select(F.col("n_nationkey").alias("s_nationkey"), F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("c_nationkey"), F.col("n_name").alias("cust_nation"))
    pair = (
        (F.col("supp_nation") == nation_a) & (F.col("cust_nation") == nation_b)
    ) | ((F.col("supp_nation") == nation_b) & (F.col("cust_nation") == nation_a))
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(su), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(cu), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), "s_nationkey")
        .join(F.broadcast(n2), "c_nationkey")
        .where(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.sum(fixed6(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("revenue_fix"))
    )


def returned_item_report(spark: SparkSession, sf_dir: str, k: int = 20) -> DataFrame:
    """TPC-H Q10 shape: top-k customers by revenue lost to returned
    items (l_returnflag = 'R') for orders placed in 1996-Q1, with the
    customer's nation — the churn-triage report.

    Scale posture: order-date range pushes to the orders scan; the
    fact-fact join shuffles on the order key; customer + nation sides
    broadcast; the final cut is a TakeOrderedAndProject heap.
    """
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate").between(
            F.lit("1996-01-01").cast("timestamp_ntz"),
            F.lit("1996-03-31 23:59:59").cast("timestamp_ntz"),
        )
    ).select("o_orderkey", "o_custkey")
    cu = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_acctbal", "c_nationkey")
    n = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nationkey"), F.col("n_name")
    )
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cu), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), "c_nationkey")
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(fixed6(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("revenue_fix"))
        .orderBy(F.col("revenue_fix").desc(), F.col("c_custkey").asc())
        .limit(k)
    )


def nation_market_share(spark: SparkSession, sf_dir: str,
                        target_nation: str = "NATION_3",
                        region: str = "EUROPE",
                        p_type: str = "PROMO") -> DataFrame:
    """TPC-H Q8 shape: the target nation's share of PROMO-part revenue
    sold to customers of one region, per order year — a conditional
    share over a five-way join (part, supplier+nation, orders,
    customer+nation+region).

    Scale posture: part/supplier/customer/nation/region sides all
    broadcast; lineitem↔orders is the one fact shuffle; the share is a
    division of exact fixed-point sums.
    """
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").where(F.col("p_type") == p_type).select("p_partkey")
    su = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    ns = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nationkey"), F.col("n_name").alias("supp_nation")
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    cu = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nc = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nationkey"), F.col("n_regionkey")
    )
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == region).select(
        F.col("r_regionkey").alias("n_regionkey")
    )
    rev = fixed6(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    tgt = F.when(F.col("supp_nation") == target_nation, rev).otherwise(F.lit(0).cast("long"))
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(su), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(ns), "s_nationkey")
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cu), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nc), "c_nationkey")
        .join(F.broadcast(r), "n_regionkey")
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.sum(tgt).alias("target_rev_fix"),
            F.sum(rev).alias("total_rev_fix"),
        )
        .withColumn(
            "mkt_share",
            F.col("target_rev_fix").cast("double") / F.col("total_rev_fix").cast("double"),
        )
    )


def large_volume_customers(spark: SparkSession, sf_dir: str,
                           min_qty: float = 250.0, k: int = 100) -> DataFrame:
    """TPC-H Q18 shape: orders whose total line quantity exceeds
    ``min_qty``, with the owning customer — the "whale orders" report.
    Exercises agg→HAVING→join-back-to-facts, the shape behind any
    "find the heavy keys, then hydrate them" pipeline step.

    Scale posture: the per-order quantity agg is one hash agg on the
    fact's natural key (map-side partial combine, no pre-shuffle); the
    HAVING filter shrinks the agg output to the whale subset BEFORE the
    join back, so the orders join sees only qualifying keys; customer
    is a broadcast dim; the final cut is a TakeOrderedAndProject heap.
    Quantity sums use exact 1e-6 fixed point so the threshold compare
    is reorder-stable.
    """
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(fixed6(F.col("l_quantity"))).alias("total_qty_fix"))
        .where(F.col("total_qty_fix") > int(min_qty * FIXED_SCALE))
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    cu = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        big.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cu), F.col("o_custkey") == F.col("c_custkey"))
        .select("c_custkey", "c_name", "o_orderkey", "o_orderdate",
                "o_totalprice", "total_qty_fix")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(k)
    )


def small_quantity_revenue(spark: SparkSession, sf_dir: str,
                           brand: str = "Brand#4") -> DataFrame:
    """TPC-H Q17 shape: average yearly revenue lost if small-quantity
    orders for one brand's parts moved to bulk — lineitems whose
    quantity is below 20% of their part's average quantity.

    The correlated AVG subquery is decorrelated into a per-part agg
    joined back on the part key; the 20%-of-average compare is exact
    integer arithmetic (qty < 0.2·avg ⟺ 5·qty_fix·n < sum_fix, n > 0),
    so no float threshold wobble.

    Scale posture: the brand filter pushes to the part scan and, via
    the broadcast part join, prunes lineitem BEFORE the per-part stats
    agg, so both the agg and the stats join run on the brand's slice
    only (per TPC-H spec the AVG is over the part's full lineitem
    history — which the brand slice IS, since the filter is on the
    part key side). One fact shuffle on l_partkey; everything else
    broadcasts.
    """
    p = load_table(spark, sf_dir, "part").where(
        F.col("p_brand") == brand
    ).select("p_partkey")
    li = load_table(spark, sf_dir, "lineitem").join(
        F.broadcast(p), F.col("l_partkey") == F.col("p_partkey")
    )
    stats = li.groupBy(F.col("l_partkey").alias("sp_partkey")).agg(
        F.count(F.lit(1)).alias("n_li"),
        F.sum(fixed6(F.col("l_quantity"))).alias("sum_qty_fix"),
    )
    return (
        li.join(stats, F.col("l_partkey") == F.col("sp_partkey"))
        .where(
            F.lit(5) * fixed6(F.col("l_quantity")) * F.col("n_li")
            < F.col("sum_qty_fix")
        )
        .agg(
            F.sum(fixed6(F.col("l_extendedprice"))).alias("revenue_fix"),
            (
                F.sum(fixed6(F.col("l_extendedprice"))).cast("double")
                / F.lit(7.0) / F.lit(float(FIXED_SCALE))
            ).alias("avg_yearly"),
        )
    )


def top_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: the supplier(s) with the maximum shipped
    revenue over 1996-Q1 — a scalar-MAX subquery over a derived
    revenue view (ties all returned, per spec).

    Scale posture: the ship-date range pushes to the lineitem scan;
    per-supplier revenue is one hash agg; the scalar max is a 1-row
    broadcast crossJoin (no second shuffle); supplier is a broadcast
    dim for the name hydration.
    """
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate").between(
            F.lit("1996-01-01").cast("timestamp_ntz"),
            F.lit("1996-03-31 23:59:59").cast("timestamp_ntz"),
        )
    )
    rev = li.groupBy("l_suppkey").agg(
        F.sum(fixed6(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
            "total_rev_fix"
        )
    )
    mx = rev.agg(F.max("total_rev_fix").alias("max_rev_fix"))
    su = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.crossJoin(F.broadcast(mx))
        .where(F.col("total_rev_fix") == F.col("max_rev_fix"))
        .join(F.broadcast(su), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_rev_fix")
    )


def dormant_high_balance_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: customers with above-average account balance
    (average over positive balances only) who have NEVER placed an
    order, rolled up per nation — the "dormant capital" report. The
    fixture has no ``c_phone``, so the country-code substring of the
    spec (TPC-H 2.18.4, public) becomes the nation dim it stands for.

    The scalar AVG compare is exact: bal > sum/n ⟺ bal_fix > sum_fix
    div n for positive sums (integer floor both engines), so no float
    average and no BIGINT overflow at any scale (no bal_fix·n product).

    Scale posture: the positive-balance AVG is one 1-row agg broadcast
    via crossJoin; the "never ordered" test is a left_anti join against
    the orders key projection (shuffle on c_custkey only for the
    above-average slice); nation broadcasts.
    """
    cu = load_table(spark, sf_dir, "customer")
    pos = cu.where(F.col("c_acctbal") > 0).agg(
        F.count(F.lit(1)).alias("n_pos"),
        F.sum(fixed6(F.col("c_acctbal"))).alias("sum_bal_fix"),
    )
    rich = (
        cu.crossJoin(F.broadcast(pos))
        .where(
            fixed6(F.col("c_acctbal"))
            > F.expr("sum_bal_fix div n_pos")
        )
    )
    o = load_table(spark, sf_dir, "orders").select("o_custkey")
    n = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nationkey"), F.col("n_name")
    )
    return (
        rich.join(o, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .join(F.broadcast(n), "c_nationkey")
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(fixed6(F.col("c_acctbal"))).alias("totacctbal_fix"),
        )
    )


def profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit per supplier nation per year. The
    fixture ships no ``partsupp`` (no ps_supplycost), so cost is the
    documented proxy 10% of part retail price per unit — the join
    topology (part ⋈ lineitem ⋈ supplier ⋈ nation + year rollup) is
    the point, not the cost model.

    Scale posture: part and supplier/nation broadcast; the only
    shuffle is the final (nation, year) hash agg with map-side
    partials; profit is computed per-row in one codegen expression and
    fixed-pointed BEFORE the sum, so the rollup is reorder-exact.
    """
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_retailprice")
    su = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nationkey"), F.col("n_name")
    )
    amount = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.col("p_retailprice") * F.col("l_quantity") * F.lit(0.1)
    )
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(su), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), "s_nationkey")
        .groupBy(F.col("n_name").alias("nation"),
                 F.year("l_shipdate").alias("o_year"))
        .agg(F.sum(fixed6(amount)).alias("profit_fix"))
    )


def daily_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio-to-report: each order priority's share of its day's total
    order revenue — the classic OLAP percent-of-total, with the share
    computed on the AGGREGATED frame (one window over |days|×|priorities|
    rows), never over the fact table.

    Scale posture: one hash agg on (day, priority) with exact
    fixed-point money sums; the day-total window runs on the tiny agg
    output; shares are division-only doubles.
    """
    o = load_table(spark, sf_dir, "orders")
    agg = o.groupBy(
        F.to_date("o_orderdate").alias("day"),
        F.col("o_orderpriority").alias("priority"),
    ).agg(F.sum(fixed6(F.col("o_totalprice"))).alias("rev_fix"))
    from pyspark.sql import Window

    day_total = F.sum("rev_fix").over(
        Window.partitionBy("day").rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
    )
    return agg.select(
        "day",
        "priority",
        "rev_fix",
        (F.col("rev_fix").cast("double") / day_total.cast("double")).alias(
            "rev_share"
        ),
    )


def rollup_region_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical ROLLUP: customer order revenue totaled at the
    (region, nation) level, the nation subtotal's parent region level,
    and the grand total — one pass producing every level of the
    geography hierarchy (NULL marks the rolled-up level, as in
    standard SQL ROLLUP).

    Scale posture: nation/region broadcast onto the orders⋈customer
    fact join; ROLLUP is a single hash agg with grouping-set expansion
    (rows × 3 levels), exact fixed-point sums.
    """
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    cu = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nationkey"), "n_name", "n_regionkey"
    )
    r = load_table(spark, sf_dir, "region").select(
        F.col("r_regionkey").alias("n_regionkey"), "r_name"
    )
    return (
        o.join(F.broadcast(cu), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), "c_nationkey")
        .join(F.broadcast(r), "n_regionkey")
        .rollup("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(fixed6(F.col("o_totalprice"))).alias("rev_fix"),
        )
    )


def orders_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS: order counts and revenue by priority AND by
    status as two independent groupings in ONE scan/agg pass — the
    dashboard query that would otherwise be two queries (cube would
    also pay for the unwanted cross combinations).

    Scale posture: one scan, one grouping-set-expanded hash agg; the
    output is |priorities| + |statuses| rows.
    """
    o = load_table(spark, sf_dir, "orders")
    return o.groupingSets(
        [["o_orderpriority"], ["o_orderstatus"]],
        "o_orderpriority",
        "o_orderstatus",
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(fixed6(F.col("o_totalprice"))).alias("rev_fix"),
    )


def customer_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation — the classic CRM triage grid: per customer,
    Recency (newest order epoch-day), Frequency (order count), and
    Monetary (lifetime spend, 1e-6 fixed point), each binned into
    exact quartiles (1 = best: most recent / most orders / highest
    spend), composed into the 3-digit segment code (111 = champions,
    444 = lost). Quartile = ((rank-1)·4) div n + 1 over the exact
    global ranking — pure integer arithmetic, ties pinned by custkey.

    Scale posture: one orders scan into a customers-keyed hash agg;
    the three rankings each run INDEPENDENTLY over that CUSTOMER-sized
    aggregate (range partition + broadcast offsets — no
    single-partition window) and equi-join back on ``c_custkey``.
    Chaining the rankings instead compounds the two evaluation
    branches (counts + offsets-join) of each level — 2³ = 8 upstream
    re-evaluations, 16 orders scans in the physical plan, measured 3×
    slower at sf0.1. The independent-rankings-join shape keeps the
    re-evaluation constant (two per ranking); at cluster scale,
    persisting the aggregate before ranking cuts those six scans of
    the customer-sized frame to one materialization.
    """
    from via_spark.operators.rank import global_row_number

    orders = load_table(spark, sf_dir, "orders")
    base = orders.groupBy(F.col("o_custkey").alias("c_custkey")).agg(
        F.max(F.unix_date(F.col("o_orderdate").cast("date")))
        .cast("long")
        .alias("recency_day"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(F.floor(F.col("o_totalprice") * 1_000_000).cast("long")).alias(
            "monetary_fix"
        ),
    )
    dims = [
        ("r_quartile", [F.col("recency_day").desc(), F.col("c_custkey").asc()]),
        ("f_quartile", [F.col("frequency").desc(), F.col("c_custkey").asc()]),
        ("m_quartile", [F.col("monetary_fix").desc(), F.col("c_custkey").asc()]),
    ]
    cur = base
    for out, order in dims:
        q = global_row_number(base, order, "_rk", total="_n").select(
            "c_custkey",
            (F.expr("((_rk - 1) * 4) div _n").cast("int") + 1).alias(out),
        )
        cur = cur.join(q, "c_custkey")
    return cur.select(
        "c_custkey",
        "recency_day",
        "frequency",
        "monetary_fix",
        "r_quartile",
        "f_quartile",
        "m_quartile",
        (
            F.col("r_quartile") * 100 + F.col("f_quartile") * 10 + F.col("m_quartile")
        ).alias("rfm_segment"),
    )


# --- TPC-H Q12/Q19/Q20/Q21 shapes over the fixture's column subset ---------

def returnflag_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (adapted — the fixture has no l_shipmode, so the
    grouping key is l_returnflag): for lines shipped in 1996, count
    critical-priority (URGENT/HIGH) vs other orders per flag — the
    "did the cheap ship mode delay critical orders" report re-keyed.

    Scale posture: the ship-date range pushes to the lineitem scan; the
    fact-fact join shuffles on the order key; both counts come out of
    ONE hash agg via conditional sums (no second pass, no self-join).
    """
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    ).select("l_orderkey", "l_returnflag")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    crit = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(crit, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(crit, 0).otherwise(1)).cast("long").alias("low_line_count"),
        )
    )


# (brand, size_lo, size_hi, qty_lo, qty_hi) disjunct arms — pinned so the
# oracle renders the identical predicate.
DISJUNCT_ARMS = (
    ("Brand#1", 1, 10, 1, 20),
    ("Brand#2", 5, 20, 10, 30),
    ("Brand#3", 10, 40, 20, 50),
)


def disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: revenue matched by an OR-of-ANDs predicate over
    part attributes × line quantity — one arm per brand, each with its
    own size and quantity band, summed per brand.

    Scale posture: the predicate is a single disjunction evaluated
    after a broadcast part join (part is the dim side), so Catalyst
    keeps it in one codegen stage; no arm runs its own scan. Revenue
    sums are exact 1e-6 fixed point.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    arm = None
    for brand, slo, shi, qlo, qhi in DISJUNCT_ARMS:
        a = (
            (F.col("p_brand") == brand)
            & F.col("p_size").between(slo, shi)
            & F.col("l_quantity").between(qlo, qhi)
        )
        arm = a if arm is None else (arm | a)
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .where(arm)
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(fixed6(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
                "revenue_fix"
            ),
        )
    )


def excess_shippers(spark: SparkSession, sf_dir: str,
                    name_prefix: str = "red ",
                    year: int = 1996,
                    pct_num: int = 3, pct_den: int = 10) -> DataFrame:
    """TPC-H Q20 shape (adapted — no partsupp table): suppliers who
    shipped more than ``pct_num/pct_den`` of a red part's total
    ``year`` volume, i.e. the "who could drain this part's stock"
    probe re-expressed over shipped quantities.

    Scale posture: the part-name prefix filter broadcasts; the fact is
    scanned ONCE — per-part totals come from a partition window over
    the (part, supplier) agg, not a second aggregation of the same
    subtree (which Spark would re-plan as a second scan); the share
    threshold compares exact fixed-point integers cross-multiplied
    (q·den > tot·num — no float division); nation/supplier dims
    broadcast at the end.
    """
    p = load_table(spark, sf_dir, "part").where(
        F.col("p_name").startswith(name_prefix)
    ).select("p_partkey")
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit(f"{year}-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit(f"{year + 1}-01-01").cast("timestamp_ntz"))
    ).select("l_partkey", "l_suppkey", "l_quantity")
    ps = (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(fixed6(F.col("l_quantity"))).alias("q_fix"))
        .withColumn(
            "tot_fix", F.sum("q_fix").over(Window.partitionBy("l_partkey"))
        )
    )
    su = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name", "s_nationkey")
    n = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nationkey"), F.col("n_name")
    )
    return (
        ps.where(F.col("q_fix") * pct_den > F.col("tot_fix") * pct_num)
        .select("l_suppkey")
        .distinct()
        .join(F.broadcast(su), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), "s_nationkey")
        .select("s_suppkey", "s_name", "n_name")
    )


def late_only_suppliers(spark: SparkSession, sf_dir: str,
                        late_days: int = 90, k: int = 25) -> DataFrame:
    """TPC-H Q21 shape (adapted — late = shipped more than
    ``late_days`` after the order date, since the fixture has no
    commit/receipt dates): on finished multi-supplier orders, count
    per supplier the orders where THEY were the only late shipper —
    the "who alone held the order up" blame report.

    Scale posture: Q21's EXISTS + NOT-EXISTS double correlated
    subquery is re-expressed as per-order distinct-supplier counts
    computed by ``size(collect_set(...))`` partition windows over the
    joined facts — the fact is scanned and shuffled ONCE (join on the
    order key, window on the same key), instead of two correlated
    fact self-joins or an agg branch that would re-scan the subtree.
    Supplier dim broadcasts; final cut is a TakeOrderedAndProject
    heap.
    """
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey", "o_orderdate")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    lo = li.join(o, F.col("l_orderkey") == F.col("o_orderkey")).select(
        "l_orderkey",
        "l_suppkey",
        (
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.make_dt_interval(days=F.lit(late_days))
        ).alias("late"),
    )
    w = Window.partitionBy("l_orderkey")
    blamed = (
        lo.withColumn("n_supp", F.size(F.collect_set("l_suppkey").over(w)))
        .withColumn(
            "n_late",
            F.size(
                F.collect_set(F.when(F.col("late"), F.col("l_suppkey"))).over(w)
            ),
        )
        .where(F.col("late") & (F.col("n_supp") > 1) & (F.col("n_late") == 1))
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    su = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        blamed.groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .join(F.broadcast(su), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_name", "numwait")
        .orderBy(F.col("numwait").desc(), F.col("s_name").asc())
        .limit(k)
    )


def pareto_frontier_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline / Pareto frontier over the part dimension (Börzsönyi
    et al. 2001): the parts not dominated on (minimize retail price,
    maximize size) — q dominates p when q is no worse on both axes and
    strictly better on one.  Price compares in exact 1e-6 fixed point.

    2-D skylines reduce to ONE running max: p is on the frontier iff
    ``p_size > max(p_size | price < p.price)`` (no cheaper part is at
    least as large) AND ``p_size = max(p_size | price = p.price)``
    (nothing strictly larger at the same price; equal (price, size)
    ties all stay, as dominance is strict-somewhere).

    Scale posture: NO data-wide window over the fact — the running max
    lives on the price-GRAIN aggregate (|distinct prices| rows, ≪
    |parts| for any dimension with a bounded price book), and parts
    join that tiny threshold table back by price equi-join (broadcast).
    The O(n²) NOT-EXISTS form is the oracle, not the plan.
    """
    p = load_table(spark, sf_dir, "part").select(
        "p_partkey",
        "p_brand",
        "p_type",
        "p_size",
        fixed6(F.col("p_retailprice")).alias("price_fix"),
    )
    return skyline2d_over(p)


def skyline2d_over(p: DataFrame) -> DataFrame:
    """Core 2-D skyline over ANY frame with (price_fix, p_size) axes
    (minimize price_fix, maximize p_size; other columns pass through) —
    property-tested against a brute-force dominance model in
    tests/test_properties.py."""
    price_grain = p.groupBy("price_fix").agg(F.max("p_size").alias("max_sz"))
    w = Window.orderBy("price_fix").rowsBetween(
        Window.unboundedPreceding, -1
    )
    thresholds = price_grain.withColumn(
        "best_cheaper", F.max("max_sz").over(w)
    )
    return (
        p.join(F.broadcast(thresholds), "price_fix")
        .where(
            (
                F.col("best_cheaper").isNull()
                | (F.col("p_size") > F.col("best_cheaper"))
            )
            & (F.col("p_size") == F.col("max_sz"))
        )
        .drop("max_sz", "best_cheaper")
        .select(*[c for c in p.columns if c != "price_fix"], "price_fix")
    )

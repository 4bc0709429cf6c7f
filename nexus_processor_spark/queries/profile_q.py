"""Table profiling / reconciliation queries over the testdata, with
DuckDB oracles. The snapshot-diff derives both "versions" from the same
orders table with deterministic key-modulo membership and a synthetic
status mutation, so the diff is reproducible cross-engine."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nexus_processor_spark.operators import profile, quality
from nexus_processor_spark.sources.tables import load_table

PROFILE_COLS = ["o_orderkey", "o_custkey", "o_orderstatus", "o_orderdate"]
HIST_LO, HIST_HI, HIST_BUCKETS = 0.0, 120_000.0, 24


def q_profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profile (nulls / exact distincts / min-max) of orders in
    one aggregate pass + literal-stack unpivot."""
    return profile.profile_table(
        load_table(spark, sf_dir, "orders"), PROFILE_COLS
    )


def _snapshots(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    m10 = F.pmod(F.col("o_orderkey"), F.lit(10))
    old = orders.filter(m10 != 0)
    new = orders.filter(m10 != 1).withColumn(
        "o_orderstatus",
        F.when(F.pmod(F.col("o_orderkey"), F.lit(7)) == 0, F.lit("X"))
        .otherwise(F.col("o_orderstatus")),
    )
    return old, new


def q_orders_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC-style snapshot reconciliation: keys added / removed / changed
    / same between two deterministic versions of orders."""
    old, new = _snapshots(spark, sf_dir)
    return profile.table_diff(old, new, "o_orderkey")


def q_orders_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Copy-on-write MERGE through the REAL snapshot machinery
    (sources/snapshots.py): orders committed as two key-ranged
    directories with manifest stats, then an upsert of deterministic
    updates (price doubled where key % 97 == 0) plus brand-new keys
    (key + 10M). Only the directories whose key range contains an
    update are rewritten; the oracle is the plain row-level MERGE in
    SQL, so any key lost or duplicated by the directory surgery
    hash-mismatches."""
    from nexus_processor_spark.sources import snapshots
    from nexus_processor_spark.sources.tables import scratch_dir

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    median = orders.agg(
        F.expr("percentile_approx(o_orderkey, 0.5)")).first()[0]
    t = scratch_dir("orders_upsert_q")
    snapshots.write_snapshot(
        orders.filter(F.col("o_orderkey") < median), t,
        mode="overwrite", stats_cols=("o_orderkey",))
    snapshots.write_snapshot(
        orders.filter(F.col("o_orderkey") >= median), t,
        mode="append", stats_cols=("o_orderkey",))
    mod = orders.filter(F.pmod("o_orderkey", F.lit(97)) == 0)
    updates = mod.withColumn(
        "o_totalprice", F.col("o_totalprice") * 2
    ).unionByName(
        mod.select(
            (F.col("o_orderkey") + F.lit(10_000_000)).alias("o_orderkey"),
            "o_totalprice",
        )
    )
    snapshots.upsert_snapshot(spark, t, updates, "o_orderkey")
    return snapshots.read_snapshot(spark, t)


def q_orders_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One CDC change batch applied to a snapshotted orders table
    through streaming/cdc.py: last-write-wins sequencing (price*2 at
    seq 1 loses to price*3 at seq 2), tombstone deletes at the highest
    seq, all merged copy-on-write into the ranged base directories. The
    oracle is the row-level CASE/WHERE MERGE — any key the directory
    surgery loses, duplicates, or resurrects hash-mismatches."""
    from nexus_processor_spark.sources import snapshots
    from nexus_processor_spark.sources.tables import scratch_dir
    from nexus_processor_spark.streaming import cdc

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    median = orders.agg(
        F.expr("percentile_approx(o_orderkey, 0.5)")).first()[0]
    t = scratch_dir("orders_cdc_q")
    snapshots.write_snapshot(
        orders.filter(F.col("o_orderkey") < median), t,
        mode="overwrite", stats_cols=("o_orderkey",))
    snapshots.write_snapshot(
        orders.filter(F.col("o_orderkey") >= median), t,
        mode="append", stats_cols=("o_orderkey",))
    mod = orders.filter(F.pmod("o_orderkey", F.lit(89)) == 0)

    def _chg(df, price, seq, deleted):
        return df.select(
            "o_orderkey", price.alias("o_totalprice"),
            F.lit(seq).alias("seq"), F.lit(deleted).alias("deleted"),
        )

    changes = (
        _chg(mod, F.col("o_totalprice") * 2, 1, False)
        .unionByName(_chg(mod, F.col("o_totalprice") * 3, 2, False))
        .unionByName(_chg(
            orders.filter(F.pmod("o_orderkey", F.lit(97)) == 0),
            F.lit(None).cast("double"), 3, True,
        ))
    )
    cdc.apply_cdc_batch(
        spark, t, changes, "o_orderkey", seq_col="seq", delete_col="deleted"
    )
    return snapshots.read_snapshot(spark, t)


def q_orders_ivm_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incrementally-maintained aggregate view (streaming/cdc.py
    maintain_agg_batch): orders snapshotted cold, then one CDC batch —
    %89 keys triple their price AND migrate to status 'U', %97 keys
    tombstone (delete outranks the update by seq) — refreshing ONLY the
    touched status groups of the per-status count/sum view. The oracle
    recomputes the view from the merged final state, so a stale
    untouched group, a missed pre-image group, or a lingering
    vanished group all hash-mismatch."""
    from nexus_processor_spark.sources import snapshots
    from nexus_processor_spark.sources.tables import scratch_dir
    from nexus_processor_spark.streaming import cdc

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    t = scratch_dir("orders_ivm_base")
    a = scratch_dir("orders_ivm_agg")
    measures = [
        F.count("*").cast("long").alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("total_price"),
    ]

    def _chg(df, status, price, seq, deleted):
        return df.select(
            "o_orderkey", status.alias("o_orderstatus"),
            price.alias("o_totalprice"),
            F.lit(seq).alias("seq"), F.lit(deleted).alias("deleted"),
        )

    cold = _chg(orders, F.col("o_orderstatus"), F.col("o_totalprice"),
                0, False)
    cdc.maintain_agg_batch(
        spark, t, a, cold, "o_orderkey", "o_orderstatus", measures,
        seq_col="seq", delete_col="deleted", version=0,
    )
    upd = orders.filter(F.pmod("o_orderkey", F.lit(89)) == 0)
    dele = orders.filter(F.pmod("o_orderkey", F.lit(97)) == 0)
    changes = _chg(upd, F.lit("U"), F.col("o_totalprice") * 3, 1, False) \
        .unionByName(_chg(dele, F.lit(None).cast("string"),
                          F.lit(None).cast("double"), 2, True))
    cdc.maintain_agg_batch(
        spark, t, a, changes, "o_orderkey", "o_orderstatus", measures,
        seq_col="seq", delete_col="deleted", version=1,
    )
    return snapshots.read_snapshot(spark, a)


def _scd2_log(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The deterministic 3-seq change log over orders shared by the
    SCD2 queries: seq 1 migrates %89 keys to status 'U'; seq 2 re-emits
    'U' for %89∩%97 keys (collapses as a consecutive duplicate UNLESS
    the price also changed) and doubles %97 prices."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )

    def _v(df, status, price, seq):
        return df.select(
            "o_orderkey", status.alias("status"), price.alias("price"),
            F.lit(seq).cast("long").alias("seq"),
        )

    return (
        _v(orders, F.col("o_orderstatus"), F.col("o_totalprice"), 0)
        .unionByName(_v(
            orders.filter(F.pmod("o_orderkey", F.lit(89)) == 0),
            F.lit("U"), F.col("o_totalprice"), 1,
        ))
        .unionByName(_v(
            orders.filter(F.pmod("o_orderkey", F.lit(97)) == 0),
            F.when(F.pmod("o_orderkey", F.lit(89)) == 0, F.lit("U"))
            .otherwise(F.col("o_orderstatus")),
            F.col("o_totalprice") * 2, 2,
        ))
    )


def q_orders_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 dimension built from the deterministic 3-seq change
    log over orders (operators/scd.py). Versions chain
    valid_from/valid_to per key; one key-partitioned window, no
    unpartitioned ops."""
    from nexus_processor_spark.operators import scd

    return scd.scd2_history(_scd2_log(spark, sf_dir), "o_orderkey", "seq")


def q_temporal_dim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The query an SCD2 table exists for: every lineitem joined to the
    orders-dimension version in force at its own point in time
    (at = l_linenumber % 3 against the 3-seq history) —
    ``valid_from <= at < valid_to`` riding a plain o_orderkey equi hash
    join; validity intervals partition the timeline so no fact ever
    fans out to two versions."""
    from nexus_processor_spark.operators import scd

    hist = scd.scd2_history(_scd2_log(spark, sf_dir), "o_orderkey", "seq")
    facts = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"),
        F.col("l_linenumber").cast("long").alias("l_linenumber"),
        F.pmod("l_linenumber", F.lit(3)).cast("long").alias("at"),
    )
    return scd.temporal_join(facts, hist, "o_orderkey", "at")


def q_orders_cdc_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC extraction (streaming/cdc.py extract_changes): the minimal
    change batch that transforms the old orders snapshot into the new
    one — upserts carry new values, removed keys tombstone, identical
    keys emit nothing. Round-trip vs apply_cdc_batch is test-pinned;
    the oracle recomputes the same diff with null-safe comparisons."""
    from nexus_processor_spark.streaming import cdc

    old, new = _snapshots(spark, sf_dir)
    return cdc.extract_changes(old, new, "o_orderkey")


def q_customer_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution (operators/linkage.py): customers matched
    against a deterministically-drifted copy of themselves (name
    appended/edited within Levenshtein 2 for 2/3 of keys, small balance
    drift for 1/5) via (nation, segment) blocking + Fellegi-Sunter-style
    integer field scores + best-match argmax. The oracle replays the
    block join, the Levenshtein tiers, and the tiebreak in SQL —
    ambiguous near-name neighbors resolve identically by construction."""
    from nexus_processor_spark.operators import linkage

    cust = load_table(spark, sf_dir, "customer")
    a = cust.select(
        F.col("c_custkey").alias("a_id"), "c_name", "c_nationkey",
        "c_acctbal", "c_mktsegment",
    )
    m3 = F.pmod("c_custkey", F.lit(3))
    b = cust.select(
        (F.col("c_custkey") + F.lit(1_000_000)).alias("b_id"),
        F.when(m3 == 0, F.concat(F.col("c_name"), F.lit("X")))
        .when(m3 == 1, F.translate(F.col("c_name"), "#", "-"))
        .otherwise(F.col("c_name")).alias("c_name"),
        "c_nationkey",
        F.when(F.pmod("c_custkey", F.lit(5)) == 0,
               F.col("c_acctbal") + F.lit(0.5))
        .otherwise(F.col("c_acctbal")).alias("c_acctbal"),
        "c_mktsegment",
    )
    rules = [
        linkage.field_rule("c_name", "levenshtein",
                           w_match=4, w_near=2, w_miss=-3, max_edit=2),
        linkage.field_rule("c_acctbal", "numeric",
                           w_match=1, w_miss=-1, tol=0.75),
    ]
    scored = linkage.block_and_score(
        a, b, "a_id", "b_id", ["c_nationkey", "c_mktsegment"], rules
    )
    return linkage.best_matches(scored, 3)


def q_price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-width histogram of l_extendedprice (width_bucket + one
    groupBy — identical bucketing function in DuckDB)."""
    return profile.histogram(
        load_table(spark, sf_dir, "lineitem"), "l_extendedprice",
        HIST_LO, HIST_HI, HIST_BUCKETS,
    )


def q_quality_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality expectation suite over orders: null / uniqueness /
    range / set / regex / anomaly-count / referential-integrity checks,
    all computed in ONE aggregation pass (plus one broadcast indicator
    join for the FK check) and unpivoted to a row per expectation."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    return quality.run_checks(
        orders,
        [
            quality.not_null("o_custkey"),
            quality.unique("o_orderkey"),
            quality.in_range("o_totalprice", 0.0, 600_000.0),
            quality.in_set("o_orderstatus", ["O", "F", "P"]),
            quality.matches("o_orderpriority", "^[1-5]-"),
            quality.non_negative_count(
                F.col("o_totalprice") <= 0, "nonpositive_price"
            ),
        ],
        refs=[quality.Referential("o_custkey", cust, "c_custkey")],
    )


DEPTH_BUCKETS = 8


def q_price_quantile_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth histogram of l_extendedprice: exact interpolated octile
    boundaries, one broadcast back, one groupBy."""
    return profile.quantile_histogram(
        load_table(spark, sf_dir, "lineitem"), "l_extendedprice",
        DEPTH_BUCKETS,
    )


QUERIES = {
    "quality_orders": q_quality_orders,
    "price_quantile_histogram": q_price_quantile_histogram,
    "profile_orders": q_profile_orders,
    "orders_snapshot_diff": q_orders_snapshot_diff,
    "orders_upsert": q_orders_upsert,
    "orders_cdc_apply": q_orders_cdc_apply,
    "orders_ivm_agg": q_orders_ivm_agg,
    "orders_scd2": q_orders_scd2,
    "orders_cdc_extract": q_orders_cdc_extract,
    "customer_linkage": q_customer_linkage,
    "temporal_dim_join": q_temporal_dim_join,
    "price_histogram": q_price_histogram,
}


def _profile_one(col: str) -> str:
    return f"""
        SELECT '{col}' AS col_name,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(count(*) - count({col}) AS BIGINT) AS n_nulls,
               CAST(count(DISTINCT {col}) AS BIGINT) AS n_distinct,
               CAST(min({col}) AS VARCHAR) AS min_value,
               CAST(max({col}) AS VARCHAR) AS max_value
        FROM orders
    """


_BUCKET_W = (HIST_HI - HIST_LO) / HIST_BUCKETS

_OCTILES = ", ".join(
    f"round(quantile_cont(x, {i / 8}), 6)" for i in range(1, 8)
)

ORACLE = {
    "price_quantile_histogram": f"""
        WITH v AS (SELECT CAST(l_extendedprice AS DOUBLE) AS x
                   FROM lineitem WHERE l_extendedprice IS NOT NULL),
        c AS (SELECT [{_OCTILES}] AS cuts FROM v),
        b AS (SELECT 1 + len(list_filter(cuts, t -> x > t)) AS bucket, cuts
              FROM v, c)
        SELECT bucket,
               CASE WHEN bucket > 1 THEN cuts[CAST(bucket AS INT) - 1] END
                 AS bucket_lo,
               CASE WHEN bucket < 8 THEN cuts[CAST(bucket AS INT)] END
                 AS bucket_hi,
               CAST(count(*) AS BIGINT) AS n
        FROM b GROUP BY 1, 2, 3
    """,
    "quality_orders": """
        WITH m AS (
            SELECT
                avg(CASE WHEN o_custkey IS NOT NULL THEN 1.0 ELSE 0.0 END)
                    AS not_null_custkey,
                CAST(count(DISTINCT o_orderkey) - count(*) AS DOUBLE)
                    AS unique_orderkey,
                avg(CASE WHEN o_totalprice BETWEEN 0.0 AND 600000.0
                         THEN 1.0 ELSE 0.0 END) AS range_totalprice,
                avg(CASE WHEN o_orderstatus IN ('O', 'F', 'P')
                         THEN 1.0 ELSE 0.0 END) AS set_status,
                avg(CASE WHEN regexp_matches(o_orderpriority, '^[1-5]-')
                         THEN 1.0 ELSE 0.0 END) AS match_priority,
                sum(CASE WHEN o_totalprice <= 0 THEN 1.0 ELSE 0.0 END)
                    AS nonpositive_price,
                avg(CASE WHEN o_custkey IN (SELECT c_custkey FROM customer)
                         THEN 1.0 ELSE 0.0 END) AS ref_custkey
            FROM orders
        )
        SELECT "check", metric, passed FROM (
            SELECT 'not_null:o_custkey' AS "check",
                   not_null_custkey AS metric,
                   not_null_custkey >= 1.0 AS passed FROM m
            UNION ALL
            SELECT 'unique:o_orderkey', unique_orderkey,
                   unique_orderkey = 0.0 FROM m
            UNION ALL
            SELECT 'in_range:o_totalprice', range_totalprice,
                   range_totalprice = 1.0 FROM m
            UNION ALL
            SELECT 'in_set:o_orderstatus', set_status,
                   set_status >= 1.0 FROM m
            UNION ALL
            SELECT 'matches:o_orderpriority', match_priority,
                   match_priority >= 1.0 FROM m
            UNION ALL
            SELECT 'zero:nonpositive_price', nonpositive_price,
                   nonpositive_price = 0.0 FROM m
            UNION ALL
            SELECT 'references:o_custkey->c_custkey', ref_custkey,
                   ref_custkey >= 1.0 FROM m
        ) ORDER BY "check"
    """,
    "profile_orders": " UNION ALL ".join(_profile_one(c) for c in PROFILE_COLS),
    "orders_cdc_apply": """
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 89 = 0 THEN o_totalprice * 3
                    ELSE o_totalprice END AS o_totalprice
        FROM orders WHERE o_orderkey % 97 <> 0
    """,
    "orders_upsert": """
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 97 = 0 THEN o_totalprice * 2
                    ELSE o_totalprice END AS o_totalprice
        FROM orders
        UNION ALL
        SELECT o_orderkey + 10000000, o_totalprice
        FROM orders WHERE o_orderkey % 97 = 0
    """,
    "orders_snapshot_diff": """
        WITH o AS (SELECT o_orderkey, o_orderstatus, o_totalprice
                   FROM orders WHERE o_orderkey % 10 <> 0),
        n AS (SELECT o_orderkey,
                     CASE WHEN o_orderkey % 7 = 0 THEN 'X'
                          ELSE o_orderstatus END AS o_orderstatus,
                     o_totalprice
              FROM orders WHERE o_orderkey % 10 <> 1)
        SELECT coalesce(o.o_orderkey, n.o_orderkey) AS o_orderkey,
               CASE WHEN o.o_orderkey IS NULL THEN 'added'
                    WHEN n.o_orderkey IS NULL THEN 'removed'
                    WHEN o.o_orderstatus IS NOT DISTINCT FROM n.o_orderstatus
                     AND o.o_totalprice IS NOT DISTINCT FROM n.o_totalprice
                    THEN 'same' ELSE 'changed' END AS diff_status
        FROM o FULL OUTER JOIN n USING (o_orderkey)
    """,
    "price_histogram": f"""
        SELECT bucket,
               round({HIST_LO} + (bucket - 1) * {_BUCKET_W}, 6) AS bucket_lo,
               round({HIST_LO} + bucket * {_BUCKET_W}, 6) AS bucket_hi,
               CAST(count(*) AS BIGINT) AS n
        FROM (
            -- DuckDB 1.0 has no width_bucket; this is its exact formula
            -- (floor of the double division by the bucket width, +1,
            -- clamped to 0 / n+1 outside the range)
            SELECT CASE
                WHEN x < {HIST_LO} THEN 0
                WHEN x >= {HIST_HI} THEN {HIST_BUCKETS + 1}
                ELSE CAST(floor((x - {HIST_LO}) / {_BUCKET_W}) AS BIGINT) + 1
            END AS bucket
            FROM (SELECT CAST(l_extendedprice AS DOUBLE) AS x
                  FROM lineitem WHERE l_extendedprice IS NOT NULL)
        ) GROUP BY bucket
        ORDER BY bucket
    """,
}


# the IVM view recomputed directly from the merged final state: the
# update (seq 1) loses to the tombstone (seq 2) on keys divisible by
# both 89 and 97, exactly as last-write-wins sequences them
ORACLE["orders_ivm_agg"] = """
    WITH final AS (
        SELECT CASE WHEN o_orderkey % 89 = 0 THEN 'U'
                    ELSE o_orderstatus END AS o_orderstatus,
               CASE WHEN o_orderkey % 89 = 0 THEN o_totalprice * 3
                    ELSE o_totalprice END AS p
        FROM orders
        WHERE o_orderkey % 97 <> 0
    )
    SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_orders,
           round(sum(p), 2) AS total_price
    FROM final GROUP BY 1
"""


# the same 3-seq change log replayed with lag/lead windows: consecutive
# null-safe-equal versions drop, survivors chain valid_from -> valid_to
ORACLE["orders_scd2"] = """
    WITH log AS (
        SELECT o_orderkey, o_orderstatus AS status,
               o_totalprice AS price, 0 AS seq
        FROM orders
        UNION ALL
        SELECT o_orderkey, 'U', o_totalprice, 1
        FROM orders WHERE o_orderkey % 89 = 0
        UNION ALL
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 89 = 0 THEN 'U'
                    ELSE o_orderstatus END,
               o_totalprice * 2, 2
        FROM orders WHERE o_orderkey % 97 = 0
    ),
    kept AS (
        SELECT o_orderkey, status, price, seq FROM (
            SELECT *, lag(status) OVER w AS ps, lag(price) OVER w AS pp,
                   lag(seq) OVER w AS pq
            FROM log
            WINDOW w AS (PARTITION BY o_orderkey ORDER BY seq)
        )
        WHERE pq IS NULL OR status IS DISTINCT FROM ps
           OR price IS DISTINCT FROM pp
    )
    SELECT o_orderkey, status, price,
           CAST(seq AS BIGINT) AS valid_from,
           CAST(lead(seq) OVER (PARTITION BY o_orderkey ORDER BY seq)
                AS BIGINT) AS valid_to,
           lead(seq) OVER (PARTITION BY o_orderkey ORDER BY seq) IS NULL
               AS is_current
    FROM kept
"""

# the diff recomputed with null-safe comparisons: upserts carry new
# values, removed keys tombstone with null values, identical keys absent
ORACLE["orders_cdc_extract"] = """
    WITH old AS (
        SELECT o_orderkey, o_orderstatus, o_totalprice
        FROM orders WHERE o_orderkey % 10 <> 0
    ),
    new AS (
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 7 = 0 THEN 'X'
                    ELSE o_orderstatus END AS o_orderstatus,
               o_totalprice
        FROM orders WHERE o_orderkey % 10 <> 1
    )
    SELECT n.o_orderkey, n.o_orderstatus, n.o_totalprice,
           FALSE AS deleted
    FROM new n LEFT JOIN old o ON n.o_orderkey = o.o_orderkey
    WHERE o.o_orderkey IS NULL
       OR n.o_orderstatus IS DISTINCT FROM o.o_orderstatus
       OR n.o_totalprice IS DISTINCT FROM o.o_totalprice
    UNION ALL
    SELECT o.o_orderkey, NULL, NULL, TRUE
    FROM old o LEFT JOIN new n ON o.o_orderkey = n.o_orderkey
    WHERE n.o_orderkey IS NULL
"""


# the linkage pipeline replayed in SQL: same drift, same Levenshtein
# tiers, same integer weights, same (score DESC, b_key) tiebreak
ORACLE["customer_linkage"] = """
    WITH a AS (
        SELECT c_custkey AS a_key, c_name, c_nationkey, c_acctbal,
               c_mktsegment
        FROM customer
    ),
    b AS (
        SELECT c_custkey + 1000000 AS b_key,
               CASE WHEN c_custkey % 3 = 0 THEN c_name || 'X'
                    WHEN c_custkey % 3 = 1 THEN replace(c_name, '#', '-')
                    ELSE c_name END AS c_name,
               c_nationkey,
               CASE WHEN c_custkey % 5 = 0 THEN c_acctbal + 0.5
                    ELSE c_acctbal END AS c_acctbal,
               c_mktsegment
        FROM customer
    ),
    p AS (
        SELECT a.a_key, b.b_key,
               CAST(CASE WHEN a.c_name = b.c_name THEN 4
                         WHEN levenshtein(a.c_name, b.c_name) <= 2 THEN 2
                         ELSE -3 END
                    + CASE WHEN abs(a.c_acctbal - b.c_acctbal) <= 0.75
                           THEN 1 ELSE -1 END AS BIGINT) AS score
        FROM a JOIN b USING (c_nationkey, c_mktsegment)
    )
    SELECT a_key, b_key, score FROM (
        SELECT *, row_number() OVER (PARTITION BY a_key
                                     ORDER BY score DESC, b_key) AS rn
        FROM p WHERE score >= 3
    ) WHERE rn = 1
"""


# the same history CTE as orders_scd2, then the point-in-time join:
# each lineitem matches exactly one version of its order's dimension row
ORACLE["temporal_dim_join"] = """
    WITH log AS (
        SELECT o_orderkey, o_orderstatus AS status,
               o_totalprice AS price, 0 AS seq
        FROM orders
        UNION ALL
        SELECT o_orderkey, 'U', o_totalprice, 1
        FROM orders WHERE o_orderkey % 89 = 0
        UNION ALL
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 89 = 0 THEN 'U'
                    ELSE o_orderstatus END,
               o_totalprice * 2, 2
        FROM orders WHERE o_orderkey % 97 = 0
    ),
    kept AS (
        SELECT o_orderkey, status, price, seq FROM (
            SELECT *, lag(status) OVER w AS ps, lag(price) OVER w AS pp,
                   lag(seq) OVER w AS pq
            FROM log
            WINDOW w AS (PARTITION BY o_orderkey ORDER BY seq)
        )
        WHERE pq IS NULL OR status IS DISTINCT FROM ps
           OR price IS DISTINCT FROM pp
    ),
    hist AS (
        SELECT o_orderkey, status, price,
               CAST(seq AS BIGINT) AS valid_from,
               CAST(lead(seq) OVER (PARTITION BY o_orderkey
                                    ORDER BY seq) AS BIGINT) AS valid_to
        FROM kept
    ),
    f AS (
        SELECT l_orderkey AS o_orderkey,
               CAST(l_linenumber AS BIGINT) AS l_linenumber,
               CAST(l_linenumber % 3 AS BIGINT) AS at
        FROM lineitem
    )
    SELECT f.o_orderkey, f.l_linenumber, f.at,
           h.status, h.price, h.valid_from, h.valid_to
    FROM f JOIN hist h
      ON h.o_orderkey = f.o_orderkey
     AND h.valid_from <= f.at
     AND (h.valid_to IS NULL OR f.at < h.valid_to)
"""


def q_orders_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only schema evolution end to end (snapshots.
    evolve_schema): orders committed as two key-ranged directories,
    then rename o_totalprice->price + drop o_orderstatus + add flag —
    ZERO data files touched — then a CoW upsert whose affected
    pre-rename directories are read through the manifest's column map.
    The oracle is the plain row-level result: any value the rename
    indirection loses or misaligns hash-mismatches."""
    from nexus_processor_spark.sources import snapshots
    from nexus_processor_spark.sources.tables import scratch_dir

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    median = orders.agg(
        F.expr("percentile_approx(o_orderkey, 0.5)")).first()[0]
    t = scratch_dir("orders_evolve_q")
    snapshots.write_snapshot(
        orders.filter(F.col("o_orderkey") < median), t,
        mode="overwrite", stats_cols=("o_orderkey",))
    snapshots.write_snapshot(
        orders.filter(F.col("o_orderkey") >= median), t,
        mode="append", stats_cols=("o_orderkey",))
    snapshots.evolve_schema(
        t, rename={"o_totalprice": "price"},
        drop=("o_orderstatus",), add={"flag": "string"})
    mod = orders.filter(F.pmod("o_orderkey", F.lit(101)) == 0)
    updates = mod.select(
        "o_orderkey",
        (F.col("o_totalprice") * 3).alias("price"),
        F.lit("u").alias("flag"),
    )
    updates = updates.unionByName(updates.select(
        (F.col("o_orderkey") + F.lit(20_000_000)).alias("o_orderkey"),
        "price", "flag"))
    snapshots.upsert_snapshot(spark, t, updates, "o_orderkey")
    return snapshots.read_snapshot(spark, t)


QUERIES["orders_schema_evolution"] = q_orders_schema_evolution

ORACLE["orders_schema_evolution"] = """
    WITH upd AS (
        SELECT o_orderkey, o_totalprice * 3 AS price, 'u' AS flag
        FROM orders WHERE o_orderkey % 101 = 0
        UNION ALL
        SELECT o_orderkey + 20000000, o_totalprice * 3, 'u'
        FROM orders WHERE o_orderkey % 101 = 0
    )
    SELECT o_orderkey, price, flag FROM upd
    UNION ALL
    SELECT o_orderkey, o_totalprice AS price,
           CAST(NULL AS VARCHAR) AS flag
    FROM orders
    WHERE o_orderkey NOT IN (SELECT o_orderkey FROM upd)
"""

from __future__ import annotations

from nexus_processor_spark import sql as sqlmod

SF = "/root/testdata/sf0.001"


def test_views_and_parameterized_sql(spark):
    sqlmod.register_testdata_views(spark, SF, ("events", "orders"))
    out = sqlmod.sql(
        spark,
        """
        SELECT event_type, count(*) AS n
        FROM events WHERE event_type = :et GROUP BY 1
        """,
        et="click",
    ).collect()
    assert len(out) == 1 and out[0].event_type == "click" and out[0].n > 0


def test_injection_is_inert(spark):
    sqlmod.register_testdata_views(spark, SF, ("events",))
    # a value that would break an f-string query stays a plain value
    evil = "click' OR '1'='1"
    rows = sqlmod.sql(
        spark,
        "SELECT count(*) AS n FROM events WHERE event_type = :et",
        et=evil,
    ).collect()
    assert rows[0].n == 0


def test_engine_sql_functions_match_column_builders(spark):
    from pyspark.sql import functions as F

    from nexus_processor_spark.functions.core import (
        event_seconds,
        interval_floor,
        make_run_id,
    )
    from nexus_processor_spark.sql import register_engine_functions

    register_engine_functions(spark)

    ns = [1_704_844_800_123_456_789, -1_234_567_891_234_567_890, 0, 999]
    df = spark.createDataFrame([(v,) for v in ns], "ts long")
    df.createOrReplaceTempView("ts_probe")
    sql_rows = spark.sql(
        "SELECT event_seconds(ts) AS s, event_micros(ts) AS us, "
        "interval_floor(event_seconds(ts), 3600.0) AS b FROM ts_probe"
    ).collect()
    col_rows = df.select(
        event_seconds("ts").alias("s"),
        interval_floor(event_seconds("ts"), 3600.0).alias("b"),
    ).collect()
    assert [r.s for r in sql_rows] == [r.s for r in col_rows]
    assert [r.b for r in sql_rows] == [r.b for r in col_rows]

    r = spark.sql(
        "SELECT make_run_id('ARCS', 1234) AS rid, "
        "run_id_to_filename(make_run_id('ARCS', 1234)) AS fn, "
        "hash_bucket('apple', 16) AS hb, hash_sign('apple') AS hs, "
        "jaccard(array('a','b','c'), array('b','c','d')) AS j, "
        "cosine(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS cos"
    ).first()
    assert (r.rid, r.fn) == ("ARCS:1234", "ARCS_1234")
    import hashlib

    h = hashlib.md5(b"apple").hexdigest()
    assert r.hb == int(h[:8], 16) % 16
    assert r.hs == (1 if int(h[8], 16) % 2 == 0 else -1)
    assert r.j == 2 / 4
    assert r.cos == 1.0

    # engine twin for make_run_id column builder
    got = spark.createDataFrame([("ARCS", 1234)], "i string, r long").select(
        make_run_id("i", "r").alias("rid")
    ).first().rid
    assert got == r.rid

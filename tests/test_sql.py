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

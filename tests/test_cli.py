"""CLI behavior tests (the reference pins its CLI the same way,
tests/test_cli.py there)."""

from __future__ import annotations

import json

import pytest

from nexus_processor_spark.__main__ import main

from tests.test_nexus_ingest import fixture_tree


def test_ddl_command(capsys):
    assert main(["ddl", "events"]) == 0
    out = capsys.readouterr().out
    assert out.startswith("CREATE TABLE IF NOT EXISTS events")
    assert "PARTITIONED BY (instrument_id, run_number)" in out


def test_ddl_all_tables(capsys):
    assert main(["ddl"]) == 0
    assert capsys.readouterr().out.count("CREATE TABLE") == 9


def test_missing_subcommand_exits():
    with pytest.raises(SystemExit):
        main([])


def test_ingest_and_timeslice_cli(spark, tmp_path, capsys):
    # main() reuses (and doesn't stop) the fixture's active session.
    p = tmp_path / "run.json"
    p.write_text(json.dumps(fixture_tree()))
    lake = str(tmp_path / "lake")
    assert main(["ingest", str(p), "--output", lake, "--tables", "events,daslogs"]) == 0
    err = capsys.readouterr().err
    assert "wrote events" in err and "wrote daslogs" in err
    out_dir = str(tmp_path / "slice")
    assert main(["timeslice", "--root", lake, "--interval", "1",
                 "--run-id", "REF_L:12345", "--output", out_dir]) == 0
    got = spark.read.parquet(out_dir).collect()
    assert len(got) == 1 and got[0].event_count == 4
    assert spark.sparkContext._jsc is not None  # session survived main()


def test_corpus_cli_ops(spark, tmp_path):
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta", "en", "web"),
         (2, "alpha beta gamma delta", "en", "web"),
         (3, "totally different words here", "en", "books")],
        "doc_id long, text string, lang string, source string",
    )
    src = str(tmp_path / "docs.parquet")
    docs.write.parquet(src)

    out = str(tmp_path / "dedup.parquet")
    assert main(["corpus", "dedup", "--input", src, "--output", out]) == 0
    assert spark.read.parquet(out).count() == 2  # exact dup collapsed

    out2 = str(tmp_path / "profile.parquet")
    assert main(["corpus", "profile", "--input", src, "--output", out2]) == 0
    prof = spark.read.parquet(out2)
    assert prof.count() == 3 and "bpe_tokens" in prof.columns

    out3 = str(tmp_path / "sample.parquet")
    assert main(["corpus", "sample", "--input", src, "--output", out3,
                 "--fraction", "1.0"]) == 0
    assert spark.read.parquet(out3).count() == 3

    out4 = str(tmp_path / "score.parquet")
    assert main(["corpus", "score", "--input", src, "--output", out4]) == 0
    sc = spark.read.parquet(out4)
    assert sc.count() == 3 and "avg_log2_p" in sc.columns

    out5 = str(tmp_path / "mix.parquet")
    assert main(["corpus", "mix", "--input", src, "--output", out5]) == 0
    mix = spark.read.parquet(out5)
    assert mix.count() == 2 and "weight" in mix.columns


def test_corpus_diff_cli(spark, tmp_path):
    old = str(tmp_path / "v1.parquet")
    new = str(tmp_path / "v2.parquet")
    spark.createDataFrame(
        [(1, "same"), (2, "before")], "doc_id long, text string"
    ).write.parquet(old)
    spark.createDataFrame(
        [(1, "same"), (2, "after"), (3, "added")], "doc_id long, text string"
    ).write.parquet(new)
    out = str(tmp_path / "diff.parquet")
    assert main(["corpus", "diff", "--input", old, "--against", new,
                 "--output", out]) == 0
    got = {r.doc_id: r.status for r in spark.read.parquet(out).collect()}
    assert got == {1: "unchanged", 2: "changed", 3: "added"}


def test_corpus_curate_stream_cli(spark, tmp_path):
    long_a = ("the quick brown fox jumps over the lazy dog while the band "
              "plays a slow tune in the park")
    src = tmp_path / "incoming"
    src.mkdir()
    spark.createDataFrame(
        [(1, long_a), (2, long_a), (3, "too short")],
        "doc_id long, text string",
    ).coalesce(1).write.parquet(str(src / "b1"))
    sink = str(tmp_path / "sink")
    assert main([
        "corpus", "curate-stream", "--input", str(src / "*"),
        "--output", sink, "--state", str(tmp_path / "state"),
        "--checkpoint", str(tmp_path / "ck"),
    ]) == 0
    got = {r.doc_id: (r.keep, r.drop_reason)
           for r in spark.read.option("basePath", sink)
           .parquet(f"{sink}/batch=*").collect()}
    assert got == {1: (True, None), 2: (False, "exact_dup"),
                   3: (False, "low_quality")}


def test_corpus_curate_stream_cli_quality_quantile(spark, tmp_path):
    """--quality-q gates on the accumulated text-length quantile (the
    metric is derived in-stream); the bottom-half docs drop low_quality."""
    texts = [
        (i, " ".join(f"doc{i}tok{j}" for j in range(4 + 4 * i)))
        for i in range(1, 5)
    ]
    src = tmp_path / "incoming"
    src.mkdir()
    spark.createDataFrame(texts, "doc_id long, text string") \
        .coalesce(1).write.parquet(str(src / "b1"))
    sink = str(tmp_path / "sink")
    assert main([
        "corpus", "curate-stream", "--input", str(src / "*"),
        "--output", sink, "--state", str(tmp_path / "state"),
        "--checkpoint", str(tmp_path / "ck"), "--quality-q", "0.5",
    ]) == 0
    got = {r.doc_id: (r.keep, r.drop_reason)
           for r in spark.read.option("basePath", sink)
           .parquet(f"{sink}/batch=*").collect()}
    assert got == {1: (False, "low_quality"), 2: (False, "low_quality"),
                   3: (True, None), 4: (True, None)}


def test_check_cli_gate_semantics(spark, tmp_path, capsys):
    good = tmp_path / "good.parquet"
    spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "id long, name string"
    ).write.parquet(str(good))
    assert main(["check", "--input", str(good), "--key", "id",
                 "--not-null", "name"]) == 0
    out = capsys.readouterr().out
    assert out.count("PASS") == 3 and "FAIL" not in out

    bad = tmp_path / "bad.parquet"
    spark.createDataFrame(
        [(1, "a"), (1, None)], "id long, name string"
    ).write.parquet(str(bad))
    assert main(["check", "--input", str(bad), "--key", "id",
                 "--not-null", "name"]) == 1
    out = capsys.readouterr().out
    assert "FAIL unique:id" in out and "FAIL not_null:name" in out


def test_check_cli_requires_some_expectation(spark, tmp_path):
    p = tmp_path / "t.parquet"
    spark.createDataFrame([(1,)], "id long").write.parquet(str(p))
    assert main(["check", "--input", str(p)]) == 2


def test_synth_cli_roundtrip(spark, tmp_path, capsys):
    out = str(tmp_path / "ev.parquet")
    assert main(["synth", "events", "--rows", "1000", "--output", out]) == 0
    df = spark.read.parquet(out)
    assert df.count() == 1000
    assert set(df.columns) == {"event_id", "ts", "user_id", "event_type",
                               "value", "props"}


def test_query_cli_runs_registry_entry(spark, capsys):
    assert main(["query", "timeslice_interval",
                 "--sf-dir", "/root/testdata/sf0.001", "--limit", "5"]) == 0
    out = capsys.readouterr().out
    assert "interval" in out and "event_count" in out


def test_query_cli_unknown_name_lists(spark, capsys):
    assert main(["query", "no_such_query"]) == 2
    assert "timeslice_interval" in capsys.readouterr().err


def test_query_cli_explain_flag(spark, capsys):
    assert main(["query", "pricing_summary",
                 "--sf-dir", "/root/testdata/sf0.001", "--explain"]) == 0
    out = capsys.readouterr().out
    assert "HashAggregate" in out and "Physical Plan" in out


def test_timeslice_range_and_summary_flags(spark, tmp_path, capsys):
    import json as _json

    from nexus_processor_spark.__main__ import main
    from tests.test_nexus_ingest import fixture_tree

    src = tmp_path / "run.json"
    src.write_text(_json.dumps(fixture_tree()))
    main(["ingest", str(src), "--output", str(tmp_path / "lake")])
    capsys.readouterr()

    out = tmp_path / "slice"
    # events sit at pulse_time 10.0/10.5 + offsets; [10, 11) catches all 4
    main(["timeslice", "--root", str(tmp_path / "lake"),
          "--interval", "1", "--start", "10", "--end", "11",
          "--output", str(out)])
    rows = spark.read.parquet(str(out)).collect()
    assert sum(r.event_count for r in rows) == 4

    main(["timeslice", "--root", str(tmp_path / "lake"),
          "--start", "10", "--end", "10.5", "--summary"])
    printed = capsys.readouterr().out
    assert "event_count" in printed


def test_replay_run_range_flags(tmp_path, capsys):
    import json as _json

    from nexus_processor_spark.__main__ import main
    from tests.test_nexus_ingest import fixture_tree

    src = tmp_path / "run.json"
    src.write_text(_json.dumps(fixture_tree()))
    main(["ingest", str(src), "--output", str(tmp_path / "lake")])
    capsys.readouterr()

    main(["replay", "--root", str(tmp_path / "lake"),
          "--run-start", "12000", "--run-end", "13000"])
    assert capsys.readouterr().out.count("\n") == 4  # all four events

    main(["replay", "--root", str(tmp_path / "lake"),
          "--run-start", "1", "--run-end", "2"])
    assert capsys.readouterr().out.count("\n") == 0  # range excludes the run


def test_stream_count_sink_drains_exactly_once(tmp_path, capsys):
    import json as _json

    from nexus_processor_spark.__main__ import main
    from tests.test_nexus_ingest import fixture_tree

    src = tmp_path / "run.json"
    src.write_text(_json.dumps(fixture_tree()))
    main(["ingest", str(src), "--output", str(tmp_path / "lake")])
    capsys.readouterr()

    ck = str(tmp_path / "ck")
    main(["stream", "--root", str(tmp_path / "lake"), "--checkpoint", ck])
    assert "streamed 4 events" in capsys.readouterr().err
    # second drain on the same checkpoint: no new data
    main(["stream", "--root", str(tmp_path / "lake"), "--checkpoint", ck])
    assert "streamed 0 events" in capsys.readouterr().err


@pytest.mark.slow
def test_replay_flight_server_serves_events(tmp_path, capsys):
    import json as _json
    import threading

    from nexus_processor_spark.__main__ import main
    from nexus_processor_spark.sources.flight import read_flight
    from tests.test_nexus_ingest import fixture_tree

    src = tmp_path / "run.json"
    src.write_text(_json.dumps(fixture_tree()))
    main(["ingest", str(src), "--output", str(tmp_path / "lake")])
    capsys.readouterr()

    got = {}

    def serve():
        main(["replay", "--root", str(tmp_path / "lake"),
              "--output", "flight", "--port", "0", "--serve-seconds", "8"])

    t = threading.Thread(target=serve, daemon=True)
    t.start()
    import re
    import time

    endpoint = None
    for _ in range(40):
        time.sleep(0.25)
        err = capsys.readouterr().err
        m = re.search(r"serving events at (grpc://\S+)", err)
        if m:
            endpoint = m.group(1)
            break
    assert endpoint, "server never announced its endpoint"
    tbl = read_flight(endpoint, "events")
    got["rows"] = tbl.num_rows
    t.join(20)
    assert got["rows"] == 4


def test_replay_csv_and_dry_run(tmp_path, capsys):
    import json as _json

    from nexus_processor_spark.__main__ import main
    from tests.test_nexus_ingest import fixture_tree

    src = tmp_path / "run.json"
    src.write_text(_json.dumps(fixture_tree()))
    main(["ingest", str(src), "--output", str(tmp_path / "lake")])
    capsys.readouterr()

    main(["replay", "--root", str(tmp_path / "lake"), "--format", "csv"])
    cap = capsys.readouterr()
    lines = cap.out.strip().splitlines()
    assert "instrument_id" in lines[0].split(",")  # header names all cols
    assert len(lines) == 5  # header + 4 events
    assert all(len(ln.split(",")) == len(lines[0].split(",")) for ln in lines)

    main(["replay", "--root", str(tmp_path / "lake"), "--dry-run"])
    cap = capsys.readouterr()
    assert "would replay 4 events" in cap.err and cap.out == ""


def test_ingest_time_log_selects_pulse_clock(spark, tmp_path):
    import json as _json

    from nexus_processor_spark.sources import nexus
    from tests.test_nexus_ingest import fixture_tree

    tree = fixture_tree()
    # an alternative clock with very different times
    tree["entry"]["DASlogs"]["frame_clock"] = {"time": [100.0, 200.0]}
    p = tmp_path / "run.json"
    p.write_text(_json.dumps(tree))
    default = nexus.ingest_table(spark, [str(p)], "events")
    alt = nexus.ingest_table(spark, [str(p)], "events", time_log="frame_clock")
    assert {r.pulse_time for r in default.collect()} == {10.0, 10.5}
    assert {r.pulse_time for r in alt.collect()} == {100.0, 200.0}


def test_summary_without_range_and_one_sided_run_range(tmp_path, capsys):
    import json as _json

    from nexus_processor_spark.__main__ import main
    from tests.test_nexus_ingest import fixture_tree

    src = tmp_path / "run.json"
    src.write_text(_json.dumps(fixture_tree()))
    main(["ingest", str(src), "--output", str(tmp_path / "lake")])
    capsys.readouterr()

    # --summary alone must print the GLOBAL summary, not interval rows
    main(["timeslice", "--root", str(tmp_path / "lake"), "--summary"])
    printed = capsys.readouterr().out
    assert "event_count" in printed and "interval_start" not in printed

    # a one-sided run range must filter (lower bound above the run)
    main(["replay", "--root", str(tmp_path / "lake"),
          "--run-start", "99999", "--dry-run"])
    assert "would replay 0 events" in capsys.readouterr().err
    main(["replay", "--root", str(tmp_path / "lake"),
          "--run-end", "99999", "--dry-run"])
    assert "would replay 4 events" in capsys.readouterr().err


def test_lakehouse_cli_extract_apply_ivm(spark, tmp_path, capsys):
    """VERDICT r5 next #8: the lakehouse composition (CDC extract ->
    apply -> IVM) as one CLI invocation, with the maintained view
    checked against a recompute by the command itself (exit 0 only when
    both equivalences hold)."""
    old_rows = [(k, k % 3, float(k)) for k in range(30)]
    # drift: drop 3 keys, change 4 values, add 5 keys (group migration
    # included: key 7 moves from group 1 to group 2)
    new_rows = (
        [(k, k % 3, float(k)) for k in range(30)
         if k not in (0, 10, 20) and k not in (3, 7, 11, 13)]
        + [(3, 0, 99.5), (7, 2, 7.0), (11, 2, 1.25), (13, 1, -4.0)]
        + [(k, k % 3, float(k) / 2) for k in range(100, 105)]
    )
    schema = "k long, g long, x double"
    old_p = str(tmp_path / "old.parquet")
    new_p = str(tmp_path / "new.parquet")
    spark.createDataFrame(old_rows, schema).write.parquet(old_p)
    spark.createDataFrame(new_rows, schema).write.parquet(new_p)
    assert main([
        "lakehouse", "--input", old_p, "--against", new_p,
        "--key", "k", "--group", "g", "--measure", "x",
        "--table-dir", str(tmp_path / "tbl"),
        "--agg-dir", str(tmp_path / "agg"),
    ]) == 0
    cap = capsys.readouterr()
    assert "PASS maintained base == NEW snapshot" in cap.out
    assert "PASS maintained view == full recompute" in cap.out
    # the change feed was minimal: 3 tombstones + 4 updates + 5 inserts
    assert "applied 12 extracted change rows" in cap.err

"""Bulk randomized property checks (seeded; one Spark job per property
instead of one per example — per-example Spark roundtrips would make
hypothesis-style shrinking pay 0.5s per case)."""

from __future__ import annotations

import math

import duckdb
import numpy as np
from pyspark.sql import functions as F

from nexus_processor_spark.functions.core import (
    event_seconds,
    interval_floor,
    make_run_id,
    run_id_from_filename,
    run_id_to_filename,
)
from nexus_processor_spark.functions.text import (
    char_shingles,
    tokens,
    word_shingles,
    word_shingles_text,
)


def test_event_seconds_matches_duckdb_epoch_bulk(spark):
    rng = np.random.default_rng(3)
    # µs-aligned nanos across 1970..2100, including negatives (pre-epoch)
    micros = rng.integers(-2**52, 2**52, size=2000)
    ns = [int(m) * 1000 for m in micros]
    got = [r.s for r in
           spark.createDataFrame([(x,) for x in ns], "ts long")
           .select(event_seconds("ts").alias("s")).collect()]
    want = [r[0] for r in duckdb.connect().execute(
        "SELECT epoch(make_timestamp(m)) FROM (SELECT unnest(?) AS m)", [
            [int(m) for m in micros]]
    ).fetchall()]
    assert got == want


def test_interval_floor_matches_python_bulk(spark):
    rng = np.random.default_rng(4)
    ts = np.concatenate([
        rng.uniform(-1e9, 1e9, 500),
        np.array([0.0, -0.0, 59.999999, 60.0, -60.0, -0.001]),
    ])
    rows = (spark.createDataFrame([(float(t),) for t in ts], "t double")
            .select("t", interval_floor("t", 60).alias("i")).collect())
    for r in rows:
        assert r.i == math.floor(r.t / 60.0), r


def test_run_id_roundtrip_bulk(spark):
    rng = np.random.default_rng(5)
    alphabet = "ABC_xyz0129-."
    names = ["".join(rng.choice(list(alphabet), size=rng.integers(1, 12)))
             for _ in range(300)]
    # trailing underscore would merge with the run-number separator and
    # break the last-underscore parse; the reference's instrument names
    # never end in '_', so normalize the fixture the same way
    names = [n.rstrip("_") or "X" for n in names]
    runs = [int(x) for x in rng.integers(0, 10**9, size=300)]
    df = spark.createDataFrame(list(zip(names, runs)), "inst string, run long")
    rid = make_run_id("inst", "run")
    out = df.select(
        "inst", "run",
        run_id_from_filename(run_id_to_filename(rid)).alias("back"),
    ).collect()
    for r in out:
        assert r.back == f"{r.inst.replace(':', '_')}:{r.run}", r


def test_word_shingles_text_equals_split_form_bulk(spark):
    """The regex fast path must be EXACTLY the split-then-join semantics,
    including empty tokens from doubled/leading/trailing separators."""
    rng = np.random.default_rng(11)
    pieces = ["a", "bb", "ccc", "", "", "d e", "x"]
    texts = [" ".join(rng.choice(pieces, size=rng.integers(0, 14)))
             for _ in range(400)]
    texts += ["", " ", "  ", "a", "a ", " a", "a b", "a  b", "  a b c  ",
              "a b c", "a\tb c d", "aa bb cc dd"]
    for n in (1, 2, 3, 5):
        rows = (spark.createDataFrame([(t,) for t in texts], "text string")
                .select(
                    word_shingles(tokens("text"), n).alias("slow"),
                    word_shingles_text("text", n).alias("fast"),
                ).collect())
        for r in rows:
            assert r.slow == r.fast, (n, r)


def test_word_shingles_text_all_equals_python_reference_bulk(spark):
    """The non-distinct (bag) regex form must yield every occurrence in
    order, exactly as the split-then-join Python reference, under the
    same adversarial spacing."""
    from nexus_processor_spark.functions.text import word_shingles_text_all

    rng = np.random.default_rng(13)
    pieces = ["a", "bb", "ccc", "", "", "d e", "x", "a", "bb"]
    texts = [" ".join(rng.choice(pieces, size=rng.integers(0, 14)))
             for _ in range(300)]
    texts += ["", " ", "a", "a b", "a a a a", "a  a  a", "  a b a b  "]

    def ref(t, n):
        toks = t.split(" ")
        return [" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)]

    for n in (1, 2, 3):
        rows = (spark.createDataFrame(list(enumerate(texts)), "i long, text string")
                .select("i", word_shingles_text_all("text", n).alias("bag"))
                .collect())
        for r in rows:
            assert r.bag == ref(texts[r.i], n), (n, texts[r.i])


def test_char_shingles_regex_matches_substring_semantics_bulk(spark):
    """The one-pass regex k-gram extraction must equal per-position
    substring slicing (incl. newlines — DOTALL — and short/empty texts)."""
    rng = np.random.default_rng(12)
    alphabet = list("ab c\nd.!")
    texts = ["".join(rng.choice(alphabet, size=rng.integers(0, 30)))
             for _ in range(300)]
    for k in (1, 3, 8):
        rows = (spark.createDataFrame([(t,) for t in texts], "text string")
                .select("text", char_shingles(F.col("text"), k).alias("got"))
                .collect())
        for r in rows:
            want = []
            for i in range(max(len(r.text) - k + 1, 0)):
                g = r.text[i:i + k]
                if g not in want:
                    want.append(g)
            assert r.got == want, (k, r)


def test_marker_hits_text_equals_array_form_bulk(spark):
    """regexp_count with token-boundary anchors must equal the
    filter-over-token-array count — whole tokens only, duplicates counted,
    prefix words ('a' vs 'and', 'is' vs 'ist') never cross-matched."""
    from nexus_processor_spark.operators.textstats import (
        LANG_MARKERS,
        _marker_hits,
        _marker_hits_text,
    )

    rng = np.random.default_rng(13)
    vocab = ["the", "a", "of", "and", "is", "ist", "theo", "la", "y",
             "and", "x1", "", "als"]
    texts = [" ".join(rng.choice(vocab, size=rng.integers(0, 16)))
             for _ in range(300)] + ["", "the", " the ", "a a a", "isthe is"]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    for markers in LANG_MARKERS.values():
        rows = df.select(
            _marker_hits(tokens("text"), markers).alias("slow"),
            _marker_hits_text(F.col("text"), markers).alias("fast"),
        ).collect()
        for r in rows:
            assert r.slow == r.fast, (markers, r)


def test_bpe_count_decomposition_equals_alternation_bulk(spark):
    """letter-runs + digit-runs + other-singles (translate arithmetic)
    must equal the one-alternation-regex BPE count, incl. non-ASCII."""
    from nexus_processor_spark.operators.textstats import (
        BPE_TOKEN_RE,
        text_profile,
    )

    rng = np.random.default_rng(14)
    alphabet = list("abcXY z01!.,9 é\n")
    texts = ["".join(rng.choice(alphabet, size=rng.integers(0, 60)))
             for _ in range(400)]
    texts += ["", "abc", "123", "a1b2", "!!", "a b", " a ", "éé 12ab!"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    want = {r.doc_id: r.bpe for r in df.select(
        "doc_id",
        F.regexp_count(F.col("text"), F.lit(BPE_TOKEN_RE)).cast("long")
        .alias("bpe")).collect()}
    got = {r.doc_id: r.bpe_tokens
           for r in text_profile(df).select("doc_id", "bpe_tokens").collect()}
    assert got == want


def test_shingle_count_property_bulk(spark):
    rng = np.random.default_rng(6)
    texts = [" ".join(rng.choice(["a", "bb", "ccc", "dd"],
                                 size=rng.integers(0, 12)))
             for _ in range(200)]
    rows = (spark.createDataFrame([(t,) for t in texts], "text string")
            .select("text", word_shingles(tokens("text"), 3).alias("sh"))
            .collect())
    for r in rows:
        n = len(r.text.split(" ")) if r.text else 1  # split('') -> ['']
        expect_max = max(n - 2, 0)
        assert 0 <= len(r.sh) <= expect_max or (r.text == "" and r.sh == [])
        assert len(set(r.sh)) == len(r.sh)  # distinct by construction


def test_round_half_up_matches_spark_round(spark):
    """The numpy HALF_UP helper must agree with Spark's round() on any
    input, including exact .5 boundaries (numpy's own round is
    half-even and would not)."""
    from nexus_processor_spark.operators.vector_arrow import _round_half_up

    for digits in (0, 1, 2, 6):
        p10 = 10.0 ** digits
        vals = [0.5, -0.5, 1.5, 2.5, -2.5, 0.25, -0.125, 3.335, -3.335,
                123.456789, -987.654321, 0.0, 17.0, -17.0]
        vals = [v / p10 for v in vals] + vals
        df = spark.createDataFrame([(float(v),) for v in vals], "x double")
        got = [r.r for r in
               df.select(F.round("x", digits).alias("r")).collect()]
        want = _round_half_up(np.array(vals, dtype=np.float64), digits)
        assert got == list(want), digits


def test_funnel_invariants_bulk(spark):
    """Randomized event streams: stage counts are monotone non-increasing
    and bounded by the distinct users holding step 1."""
    from nexus_processor_spark.operators import behavior

    rng = np.random.default_rng(11)
    kinds = ["view", "click", "purchase"]
    rows = [
        (i, int(rng.integers(0, 40)), int(rng.integers(0, 10**6)),
         kinds[int(rng.integers(0, 3))])
        for i in range(3000)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts long, event_type string"
    )
    res = sorted(behavior.funnel_stages(df, kinds).collect(),
                 key=lambda r: r["stage"])
    counts = [r["n_users"] for r in res]
    assert counts == sorted(counts, reverse=True)
    viewers = df.filter("event_type = 'view'").select("user_id").distinct().count()
    assert counts[0] == viewers


def test_quantile_histogram_conserves_mass_bulk(spark):
    """Bucket counts sum to the non-null row count for random data and
    random bucket counts, and depths are near-equal on distinct values."""
    from nexus_processor_spark.operators import profile

    rng = np.random.default_rng(12)
    for nb in (2, 5, 16):
        vals = rng.normal(0, 100, size=1500)
        df = spark.createDataFrame([(float(v),) for v in vals], "v double")
        res = profile.quantile_histogram(df, "v", nb).collect()
        assert sum(r["n"] for r in res) == 1500
        # continuous data -> equal depths within interpolation slack
        assert all(abs(r["n"] - 1500 / nb) <= 2 for r in res)


def test_recall_bounds_bulk(spark):
    """recall@k stays in [0, 1] and equals 1 iff approx == exact."""
    from nexus_processor_spark.operators.similarity import recall_at_k

    rng = np.random.default_rng(13)
    exact = [(q, int(rng.integers(0, 50))) for q in range(20) for _ in range(5)]
    approx = [(q, n + int(rng.integers(0, 2)) * 1000) for q, n in exact]
    e = spark.createDataFrame(exact, "query_id long, vec_id long")
    a = spark.createDataFrame(approx, "query_id long, vec_id long")
    for r in recall_at_k(a, e, 5).collect():
        assert 0.0 <= r["recall"] <= 1.0
    full = recall_at_k(e, e, 5)
    assert all(r["recall"] == 1.0 for r in full.collect())


def test_triangle_count_total_matches_closed_wedges_bulk(spark):
    """Random graphs: per-vertex triangle counts sum to 3x the number of
    triangles, and match a numpy trace computation."""
    from nexus_processor_spark.operators import graph

    rng = np.random.default_rng(14)
    n = 25
    adj = np.zeros((n, n), dtype=int)
    edges = []
    for _ in range(80):
        a, b = int(rng.integers(0, n)), int(rng.integers(0, n))
        if a != b and not adj[a][b]:
            adj[a][b] = adj[b][a] = 1
            edges.append((a, b))
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    per_vertex = graph.triangle_count(df).collect()
    total = sum(r["n_triangles"] for r in per_vertex)
    expected_triangles = int(np.trace(np.linalg.matrix_power(adj, 3)) // 6)
    assert total == 3 * expected_triangles


def test_interval_cells_cover_exactly_bulk(spark):
    """_cells(start, end, grid) must equal the set of grid cells whose
    [c*g, (c+1)*g) range intersects the half-open [start, end) — for
    random intervals including boundary-aligned and sub-grid ones."""
    import math
    import random

    from pyspark.sql import functions as F

    from nexus_processor_spark.operators.intervals import _cells

    rng = random.Random(31)
    grid = 7.5
    rows = []
    for i in range(300):
        s = rng.uniform(-40, 40)
        if i % 5 == 0:
            s = round(s / grid) * grid  # force boundary alignment
        ln = rng.choice([0.0, 1e-4, 0.5, grid, grid * 3.2, 40.0])
        rows.append((i, s, s + ln))
    df = spark.createDataFrame(rows, "i long, s double, e double")
    got = {}
    out = df.select(
        "i", F.explode(_cells(F.col("s"), F.col("e"), grid)).alias("c")
    ).collect()
    for r in out:
        got.setdefault(r.i, set()).add(r.c)
    for i, s, e in rows:
        if e <= s:
            want = set()
        else:
            lo = math.floor(s / grid)
            hi = math.floor(e / grid)
            if e == hi * grid:
                hi -= 1
            want = set(range(lo, max(lo, hi) + 1))
        assert got.get(i, set()) == want, (i, s, e)


def test_distributed_prefix_sum_grids_bulk(spark):
    """The two-phase scan equals the python prefix sum for degenerate
    grids: one bucket holds everything, and one-row-per-bucket."""
    import random

    from nexus_processor_spark.operators.prefix import distributed_running_sum

    rng = random.Random(17)
    rows = [(i, rng.uniform(0, 100.0), rng.randint(-9, 9))
            for i in range(500)]
    ordered = sorted(rows, key=lambda r: (r[1], r[0]))
    want = {}
    acc = 0
    for i, _, v in ordered:
        acc += v
        want[i] = acc
    df = spark.createDataFrame(rows, "id long, t double, v int")
    for grid in (1e6, 0.01, 13.0):
        got = {
            r.id: r.running_total
            for r in distributed_running_sum(
                df, order_col="t", value_col="v", grid=grid,
                tiebreak_cols=("id",),
            ).collect()
        }
        assert got == want, grid

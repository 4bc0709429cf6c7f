"""Arrow-batched numpy kernels for the vector hot paths.

Spark's higher-order array functions (``transform``/``aggregate``/
``zip_with``) evaluate their lambdas *interpreted, per element* — they
never enter whole-stage codegen. At dim 4 that's noise; at dim 64 over
millions of vectors it dominates (measured on the 1M x 64 vecbench:
int8-quantize 34 s native HOF vs ~1-2 s here; nearest-of-32 assignment
18 s vs <2 s). These kernels run the same math as one numpy/BLAS call
per Arrow batch via ``mapInPandas``/``applyInPandas`` — the documented
exception to "UDFs are the slow path": Arrow amortizes the Python
boundary to per-batch, and numpy beats the interpreted JVM loop.

Semantics match the native expressions in ``functions.vector`` /
``operators.similarity``: float64 math, HALF_UP rounding (numpy's
``round`` is banker's — ``_round_half_up`` mirrors Spark), id
tiebreaks. The native forms remain the oracle-exactness path (their
sequential fold accumulation is reproducible in DuckDB SQL); these are
the scale path, pinned equal by ``tests/test_vector_arrow.py``.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _round_half_up(x: np.ndarray, digits: int = 0) -> np.ndarray:
    """Spark/DuckDB ``round`` (HALF_UP, away from zero) — numpy's round
    is HALF_EVEN and would disagree on exact .5 boundaries.

    One allocation, in-place ufunc pipeline: the naive
    ``sign(x)*floor(abs(x)*p+0.5)/p`` spends ~6 array temporaries —
    on the gram-matrix kernels that is hundreds of MB of fresh pages
    per task, and first-touch page faulting (not arithmetic) dominated
    the measured runtime (cold 1.03 s vs warm 0.11 s on a 3125**2
    matrix; this form: 0.07 s)."""
    p = 10.0 ** digits
    out = np.abs(x)
    out *= p
    out += 0.5
    np.floor(out, out=out)
    out /= p
    return np.copysign(out, x, out=out)


def _mat(col: pd.Series) -> np.ndarray:
    return np.array(col.tolist(), dtype=np.float64)


def quantize_arrow(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    digits: int = 6,
) -> DataFrame:
    """Arrow twin of the ``vector_quantize`` projection: per-vector
    ``scale`` (max |x|), int8 codes ``q8``, unit-normalized ``unit``.
    Map-only: no shuffle, one numpy pass per Arrow batch."""
    schema = (
        f"{id_col} long, scale double, q8 array<long>, unit array<double>"
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            v = _mat(b[vec_col])
            scale = np.abs(v).max(axis=1)
            ok = scale > 0
            with np.errstate(divide="ignore", invalid="ignore"):
                q8 = _round_half_up(v / scale[:, None] * 127.0)
                n = np.sqrt((v * v).sum(axis=1))
                unit = _round_half_up(v / n[:, None], digits)
            yield pd.DataFrame({
                id_col: b[id_col].to_numpy(),
                "scale": scale,
                "q8": [r.astype(np.int64) if o else None
                       for r, o in zip(q8, ok)],
                "unit": [r if o else None for r, o in zip(unit, ok)],
            })

    return df.select(id_col, vec_col).mapInPandas(kernel, schema)


def kmeans_assign_arrow(
    corpus: DataFrame,
    centroids: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> DataFrame:
    """Arrow twin of ``similarity.kmeans_assign``: nearest centroid by
    squared L2, distances rounded with a centroid-id tiebreak.

    The centroid table is tiny by definition (k rows) — it collects to a
    dense k x d matrix shipped in the task closure (the numpy analog of
    the broadcast join), so the corpus pass is map-only: per batch, k
    difference-square reductions in centroid-id order with strict-less
    updates, which keeps the lowest id on rounded ties.
    """
    rows = sorted(
        centroids.select(id_col, vec_col).collect(), key=lambda r: r[id_col]
    )
    ids = np.array([r[id_col] for r in rows], dtype=np.int64)
    cmat = np.array([list(r[vec_col]) for r in rows], dtype=np.float64)
    schema = f"{id_col} long, centroid_id long, dist double"

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            v = _mat(b[vec_col])
            best_d = np.full(len(v), np.inf)
            best_i = np.zeros(len(v), dtype=np.int64)
            for j in range(len(ids)):  # id order → ties keep lowest id
                diff = v - cmat[j]
                d = _round_half_up((diff * diff).sum(axis=1), round_digits)
                upd = d < best_d
                best_d[upd] = d[upd]
                best_i[upd] = ids[j]
            yield pd.DataFrame({
                id_col: b[id_col].to_numpy(),
                "centroid_id": best_i,
                "dist": best_d,
            })

    return corpus.select(id_col, vec_col).mapInPandas(kernel, schema)


def knn_graph_arrow(
    corpus: DataFrame,
    k: int = 5,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str = "label",
    round_digits: int = 6,
) -> DataFrame:
    """Arrow twin of ``similarity.knn_graph``: per-cell all-pairs cosine
    top-k as ONE BLAS gram matrix per cell (``applyInPandas`` over the
    cell grouping — same shuffle as the native cell equi-join, but the
    pair scoring is U @ U.T instead of per-pair interpreted folds).

    Cells must fit in a task (the same bound the native cell join's
    window already imposes); output matches the native op: ``query_id,
    vec_id, cos, rank`` with rounded-cosine, id tiebreak ranking.
    """
    schema = "query_id long, vec_id long, cos double, rank long"

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        v = _mat(g[vec_col])
        ids = g[id_col].to_numpy(dtype=np.int64)
        n = np.sqrt((v * v).sum(axis=1))
        with np.errstate(divide="ignore", invalid="ignore"):
            u = v / n[:, None]
        u[n == 0] = 0.0
        s = _round_half_up(u @ u.T, round_digits)
        np.fill_diagonal(s, -np.inf)  # exclude self
        m = len(ids)
        kk = min(k, m - 1)
        if kk <= 0:
            return pd.DataFrame(
                {"query_id": [], "vec_id": [], "cos": [], "rank": []}
            )
        # rank by (-cos, vec_id): lexsort is stable, last key primary
        order = np.lexsort((np.broadcast_to(ids, (m, m)), -s), axis=1)
        top = order[:, :kk]
        qid = np.repeat(ids, kk)
        nbr = ids[top.ravel()]
        cos = s[np.repeat(np.arange(m), kk), top.ravel()]
        rank = np.tile(np.arange(1, kk + 1, dtype=np.int64), m)
        return pd.DataFrame(
            {"query_id": qid, "vec_id": nbr, "cos": cos, "rank": rank}
        )

    return (
        corpus.select(id_col, vec_col, cell_col)
        .groupBy(cell_col)
        .applyInPandas(lambda _, g: kernel(g), schema)
        .filter(F.col("cos") != float("-inf"))
    )


def semantic_dedup_arrow(
    corpus: DataFrame,
    centroids: DataFrame,
    threshold: float,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> DataFrame:
    """Arrow twin of ``similarity.semantic_dedup``: assignment via
    ``kmeans_assign_arrow``, then each cluster's drop set from ONE gram
    matrix (``applyInPandas`` over the cluster grouping) instead of a
    per-pair interpreted fold join.

    A vector is dropped when some lower-id cluster-mate sits at rounded
    cosine >= ``threshold`` — with ids sorted, that's an upper-triangle
    any() per column. Output matches the native op: surviving
    ``id_col, centroid_id``.
    """
    assign = kmeans_assign_arrow(
        corpus, centroids, id_col=id_col, vec_col=vec_col,
        round_digits=round_digits,
    )
    tagged = corpus.select(id_col, vec_col).join(
        assign.select(id_col, "centroid_id"), id_col
    )
    schema = f"{id_col} long, centroid_id long"

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_col, ignore_index=True)
        v = _mat(g[vec_col])
        n = np.sqrt((v * v).sum(axis=1))
        with np.errstate(divide="ignore", invalid="ignore"):
            u = v / n[:, None]
        u[n == 0] = 0.0
        # drop j when any i<j (strict upper triangle, ids ascending)
        # sits at rounded cosine >= t. The gram matrix is computed in
        # COLUMN BLOCKS: a full n x n materialization plus rounding
        # temporaries is O(n**2) fresh pages per cell, and with every
        # core running a worker the page-fault churn (not the matmul)
        # dominated and destabilized the wall time (reps swung 10-50 s
        # at 200k vectors; blocked they hold steady). Same per-element
        # arithmetic, same drop set.
        m = len(g)
        dropped = np.zeros(m, dtype=bool)
        block = 1024
        rows = np.arange(m)
        for j0 in range(1, m, block):
            j1 = min(j0 + block, m)
            s = _round_half_up(u @ u[j0:j1].T, round_digits)
            ge = s >= threshold
            ge &= rows[:, None] < np.arange(j0, j1)[None, :]
            dropped[j0:j1] = ge.any(axis=0)
        keep = g.loc[~dropped, [id_col, "centroid_id"]]
        return keep

    return tagged.groupBy("centroid_id").applyInPandas(
        lambda _, g: kernel(g), schema
    )


def pq_encode_arrow(
    corpus: DataFrame,
    codebooks: DataFrame,
    m: int = 4,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> DataFrame:
    """Arrow twin of ``similarity.pq_encode``: per-subspace nearest-code
    argmin as one numpy pass per batch (same rounded HALF_UP distances,
    same code-id tiebreak — pinned equal by tests). The codebook table is
    m·k tiny rows; it ships dense in the task closure. Map-only: the
    native form's per-(row, sub) argmin shuffle disappears entirely."""
    rows = codebooks.select("sub", "code_id", "centroid").collect()
    by_sub: dict[int, list] = {}
    for r in rows:
        by_sub.setdefault(r["sub"], []).append(r)
    subs = sorted(by_sub)
    if subs != list(range(m)):
        raise ValueError(f"codebooks cover subs {subs}, expected 0..{m - 1}")
    cmats = []
    cids = []
    for s in subs:
        rs = sorted(by_sub[s], key=lambda r: r["code_id"])
        cids.append(np.array([r["code_id"] for r in rs], dtype=np.int64))
        cmats.append(np.array([list(r["centroid"]) for r in rs],
                              dtype=np.float64))
    schema = f"{id_col} long, codes array<int>"

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            v = _mat(b[vec_col])
            n, d = v.shape
            sl = d // m
            codes = np.zeros((n, m), dtype=np.int64)
            for s in subs:
                subv = v[:, s * sl:(s + 1) * sl]
                best_d = np.full(n, np.inf)
                best_i = np.zeros(n, dtype=np.int64)
                for j in range(len(cids[s])):  # id order → ties keep lowest
                    diff = subv - cmats[s][j]
                    dd = _round_half_up((diff * diff).sum(axis=1), round_digits)
                    upd = dd < best_d
                    best_d[upd] = dd[upd]
                    best_i[upd] = cids[s][j]
                codes[:, s] = best_i
            yield pd.DataFrame({
                id_col: b[id_col].to_numpy(),
                "codes": [row.astype(np.int32).tolist() for row in codes],
            })

    return corpus.select(id_col, vec_col).mapInPandas(kernel, schema)


def pack_int8_codes(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Symmetric-int8 codes packed into ONE ``binary`` cell per vector —
    the at-rest form of the 4x/8x-shrunk scan corpus (64 bytes per
    64-dim vector instead of 512 float64 bytes): what a 100 TB vector
    store actually persists for its quantized search tier. Quantization
    math is identical to ``functions.vector.quantize_int8`` /
    ``quantize_arrow`` (round-HALF-UP of ``x / max|x| * 127``); all-zero
    vectors have no scale and are dropped, matching the native filter.
    Map-only: no shuffle, one numpy pass per Arrow batch."""
    schema = f"{id_col} long, code binary"

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            v = _mat(b[vec_col])
            scale = np.abs(v).max(axis=1)
            ok = scale > 0
            with np.errstate(divide="ignore", invalid="ignore"):
                q8 = _round_half_up(v / scale[:, None] * 127.0)
            ids = b[id_col].to_numpy(dtype=np.int64)
            keep = np.flatnonzero(ok)
            yield pd.DataFrame({
                id_col: ids[keep],
                "code": [q8[i].astype(np.int8).tobytes() for i in keep],
            })

    return df.select(id_col, vec_col).mapInPandas(kernel, schema)


def int8_candidates_arrow(
    codes: DataFrame,
    query_ids: np.ndarray,
    query_codes: np.ndarray,
    candidates: int,
    *,
    id_col: str = "vec_id",
) -> DataFrame:
    """Per-partition top-``candidates`` by exact INTEGER int8 dot
    product against every query — the candidate-generation scan of
    :func:`operators.similarity.int8_rerank_topk`.

    The packed corpus batch unpacks to an (n, d) int8 matrix and scores
    via ONE float32 BLAS GEMM: every int8 product sum is an integer
    < 2^24 for d <= 1024, so float32 accumulation is EXACT integer
    arithmetic at 2x the float64 GEMM rate (dims above 1024 fall back
    to float64, exact to 2^53). Selection order is the composite key
    ``score * 2^32 - vec_id`` — deterministic on score ties, so the
    per-partition top-C provably contains each partition's true
    (score DESC, vec_id ASC) top-C and the downstream global window
    reproduces the oracle's candidate set bit-for-bit. Requires
    0 <= vec_id < 2^31 (asserted) for the composite to order correctly.

    Emits ``candidates`` rows per (partition batch, query): with P
    Arrow batches the downstream global top-C window sees P*C rows per
    query — thousands, regardless of corpus size.
    """
    n_q, dim = query_codes.shape
    acc = np.float32 if dim <= 1024 else np.float64
    q_t = np.ascontiguousarray(query_codes.T.astype(acc))
    qid = query_ids.astype(np.int64)
    schema = "query_id long, vec_id long, score_q long"

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            if not len(b):
                continue
            ids = b[id_col].to_numpy(dtype=np.int64)
            if ids.size and (ids.min() < 0 or ids.max() >= 1 << 31):
                raise ValueError(
                    "int8_candidates_arrow needs 0 <= vec_id < 2^31 "
                    "for the deterministic tiebreak composite")
            mat = np.frombuffer(
                b"".join(b["code"].tolist()), dtype=np.int8
            ).reshape(ids.size, -1)
            scores = mat.astype(acc) @ q_t  # exact integers (see above)
            scores_i64 = scores.astype(np.int64)
            # a query vector living in this batch must NEVER surface as
            # its own candidate: mask the EMITTED score too, not just
            # the selection composite — when the batch has <= candidates
            # rows every row is emitted, and a real (maximal) self score
            # would win a global top-C slot downstream and silently
            # shrink the candidate set to C-1
            self_mask = ids[:, None] == qid[None, :]
            scores_i64[self_mask] = np.iinfo(np.int64).min
            comp = scores_i64 * np.int64(1 << 32)
            comp -= ids[:, None]
            # select on NEGATED comp with masked rows forced to int64
            # MAX, not min: negating int64 min wraps back to int64 min
            # (two's complement), which would make masked rows the
            # SMALLEST of -comp — argpartition would pick the self row
            # FIRST, wasting one of the batch's emission slots (the
            # batch then contributes C-1 real candidates and the
            # "per-partition top-C contains the true top-C" guarantee
            # silently breaks for the self-containing batch)
            neg = np.negative(comp)
            neg[self_mask] = np.iinfo(np.int64).max
            top = min(candidates, ids.size)
            idx = np.argpartition(neg, top - 1, axis=0)[:top]
            yield pd.DataFrame({
                "query_id": np.repeat(qid, top),
                "vec_id": ids[idx].ravel(order="F"),
                "score_q": np.take_along_axis(
                    scores_i64, idx, axis=0).ravel(order="F"),
            })

    return codes.select(id_col, "code").mapInPandas(kernel, schema)


def int8_candidates_cells_arrow(
    codes: DataFrame,
    query_ids: np.ndarray,
    query_codes: np.ndarray,
    cell_ids: np.ndarray,
    allowed: np.ndarray,
    candidates: int,
    *,
    id_col: str = "vec_id",
    cell_col: str = "cell",
) -> DataFrame:
    """Cell-restricted variant of :func:`int8_candidates_arrow` — the
    candidate scan of ``similarity.ivf_int8_rerank_topk``: each query
    sees only corpus rows whose coarse cell is among its probed cells.

    ``cell_ids`` is the sorted union of every query's probed cells;
    ``allowed`` is a ``(len(cell_ids), n_queries)`` bool matrix —
    ``allowed[c, j]`` says query ``j`` probes ``cell_ids[c]``. The
    caller pre-filters ``codes`` to ``cell_ids`` (an ``isin`` the
    scan's partition pruning eats when the packed tier is written
    partitioned by cell), so the GEMM only ever touches probed rows;
    the mask handles the per-query difference WITHIN the union.

    Ineligible and self rows mask BOTH the emitted score and the
    selection composite to int64 min — a batch smaller than
    ``candidates`` emits every row, and a masked row must neither
    surface with a real score nor consume a downstream top-C slot
    (callers drop score_q == int64 min). Selection order and the
    vec_id < 2^31 requirement match :func:`int8_candidates_arrow`.
    """
    n_q, dim = query_codes.shape
    if allowed.shape != (cell_ids.size, n_q):
        raise ValueError(
            f"allowed must be (n_cells={cell_ids.size}, n_q={n_q}), "
            f"got {allowed.shape}")
    acc = np.float32 if dim <= 1024 else np.float64
    q_t = np.ascontiguousarray(query_codes.T.astype(acc))
    qid = query_ids.astype(np.int64)
    cells_sorted = np.sort(cell_ids.astype(np.int64))
    order = np.argsort(cell_ids.astype(np.int64), kind="stable")
    allowed_sorted = np.ascontiguousarray(allowed[order])
    masked = np.iinfo(np.int64).min
    schema = "query_id long, vec_id long, score_q long"

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            if not len(b):
                continue
            ids = b[id_col].to_numpy(dtype=np.int64)
            if ids.size and (ids.min() < 0 or ids.max() >= 1 << 31):
                raise ValueError(
                    "int8_candidates_cells_arrow needs 0 <= vec_id < "
                    "2^31 for the deterministic tiebreak composite")
            row_cells = b[cell_col].to_numpy(dtype=np.int64)
            pos = np.searchsorted(cells_sorted, row_cells)
            pos_c = np.minimum(pos, cells_sorted.size - 1)
            known = cells_sorted[pos_c] == row_cells
            # (n, n_q) eligibility: row i scored for query j only when
            # its cell is one of j's probes (unknown cell: no query)
            elig = np.where(
                known[:, None], allowed_sorted[pos_c], False)
            mat = np.frombuffer(
                b"".join(b["code"].tolist()), dtype=np.int8
            ).reshape(ids.size, -1)
            scores = mat.astype(acc) @ q_t  # exact integers
            scores_i64 = scores.astype(np.int64)
            dead = ~elig
            dead |= ids[:, None] == qid[None, :]
            scores_i64[dead] = masked
            comp = scores_i64 * np.int64(1 << 32)
            comp -= ids[:, None]
            # as in int8_candidates_arrow: select on -comp with dead
            # rows at int64 MAX (negating int64 min wraps to itself —
            # dead rows would otherwise sort FIRST and fill the whole
            # selection wherever they outnumber live ones, which here
            # they routinely do: every non-probed (row, query) pair is
            # dead)
            neg = np.negative(comp)
            neg[dead] = np.iinfo(np.int64).max
            top = min(candidates, ids.size)
            idx = np.argpartition(neg, top - 1, axis=0)[:top]
            yield pd.DataFrame({
                "query_id": np.repeat(qid, top),
                "vec_id": ids[idx].ravel(order="F"),
                "score_q": np.take_along_axis(
                    scores_i64, idx, axis=0).ravel(order="F"),
            })

    return codes.select(id_col, "code", cell_col).mapInPandas(
        kernel, schema)

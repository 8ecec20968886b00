"""Similarity search over embedding columns (``array<float>``).

Baseline: brute-force cosine top-k — a broadcast join of the (small) query
set against the candidate table, scored with a JVM-side fold (no Python),
ranked per query.  Scale path: random-hyperplane LSH bucketing — candidates
are hash-partitioned by bucket so each query only scans its bucket, the
standard IVF/LSH trade-off.

All float math is double-precision with a fixed left-to-right fold order so
the DuckDB oracle can reproduce scores.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def _lit_d(x: float) -> str:
    """SQL text of a double literal with the EXACT bits of ``x``.

    ``repr`` emits the shortest decimal string that round-trips to the
    same IEEE double in any correctly-rounded parser — Spark's
    string→DOUBLE cast included — so ``CAST('<repr>' AS DOUBLE)`` folds
    to a literal bit-identical to ``F.lit(x)`` without a py4j call.
    Non-finite values have engine-specific spellings; callers here only
    inline finite model state (centroids, norms, eigenvectors)."""
    import math

    if not math.isfinite(x):
        raise ValueError(f"non-finite literal not inlineable: {x!r}")
    return f"CAST('{x!r}' AS DOUBLE)"


def _lit_array_d(vals) -> str:
    """SQL text of an ARRAY<DOUBLE> literal (see :func:`_lit_d`)."""
    return "array(" + ", ".join(_lit_d(float(v)) for v in vals) + ")"


def _dot_text(a: str, b: str) -> str:
    """SQL text of :func:`dot` — the IDENTICAL zip_with + left-fold
    aggregate expression, built as one string so constructing a
    k-centroid assignment costs one ``F.expr`` parse instead of
    thousands of py4j round-trips (measured ~1s per 64-wide dot built
    element-by-element from Python — pure driver-side chatter)."""
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE)"
        " * CAST(y AS DOUBLE)), CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"
    )


def dot(a: Column | str, b: Column | str) -> Column:
    """Σ a_i·b_i as a left-to-right double fold (deterministic order)."""
    if isinstance(a, str) and isinstance(b, str):
        return F.expr(_dot_text(_quote_ident(a), _quote_ident(b)))
    prods = F.zip_with(_c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column | str) -> Column:
    return F.sqrt(dot(a, a))


def flat_dot(a: Column | str, b: Column | str, dim: int, parts: int = 1) -> Column:
    """Bit-identical to :func:`dot` for ``dim``-wide arrays, unrolled as a
    flat left-associated sum of ``a[i]·b[i]`` terms.

    Why it exists: ``F.aggregate``/``F.zip_with`` lambdas are evaluated
    per-element by the interpreted HigherOrderFunction path — outside
    whole-stage codegen — which made the pair-scan cosine the entire cost
    of SemDeDup at the 100× rehearsal (123s of a 105s+profile query; the
    98M-pair join itself took 1.7s).  A fixed-width chain of GetArrayItem
    · cast · multiply · add compiles into the surrounding codegen stage.

    Exactness (``parts=1``): ``((x0·y0 + x1·y1) + x2·y2) + …`` is the same
    IEEE double sequence as the fold's ``((0.0 + x0·y0) + x1·y1) + …``
    because ``0.0 + x == x`` for every non-NaN double — so swapping it in
    changes no result hash, and the DuckDB oracles keep their
    ``list_sum`` form.  Requires the physical array width; callers probe
    it from the data (``F.size``) and fall back to :func:`dot` when
    unknown.

    ``parts>1`` — split-partials order: the terms are grouped into
    ``parts`` consecutive left-associated partial sums, combined
    left-associatively at the top (``(p0 + p1) + p2 …``).  This is a
    DIFFERENT (still fully deterministic) IEEE summation order from the
    fold, so any oracle grading a ``parts>1`` site must mirror it with
    explicit per-term SQL (see ``queries/suite._dot_split_sql``), not
    ``list_sum``.  Why bother: the ``parts=1`` chain is one ~64-deep
    left-leaning Add spine — Catalyst's per-rule tree transforms walk it
    superlinearly (a measured ~2.3s fixed driver-planning floor per call
    at dim=64) and whole-stage codegen emits it as one straight-line
    block.  The split shape is ~8 deep, plans in a fraction of the time,
    and gives codegen natural subexpression boundaries; round-10
    measurements (BENCH_EMB_FORMS_r10.json) show it strictly faster under
    both broadcast and sort-merge join regimes at every scale tried.
    """
    if dim <= 0:
        return F.lit(0.0)
    parts = max(1, min(parts, dim))
    if isinstance(a, str) and isinstance(b, str):
        # Fast construction path (round-10): the same expression tree
        # built as ONE SQL string + one F.expr parse.  The element-wise
        # py4j loop below costs ~1s of driver chatter per 64-wide call
        # (measured; it was the bulk of embedding_near_dup's fixed
        # "planning floor"); the parsed text analyzes to the identical
        # GetArrayItem·Cast·Multiply·Add tree, so plans, codegen and
        # result bits are unchanged.  Dotted names ("l.v") parse as
        # qualified attribute references.
        return F.expr(_flat_dot_text(a, b, dim, parts))
    a, b = _c(a), _c(b)
    chunk = -(-dim // parts)  # ceil — last partial may be short
    partials: list[Column] = []
    for start in range(0, dim, chunk):
        acc = None
        for i in range(start, min(start + chunk, dim)):
            t = a.getItem(i).cast("double") * b.getItem(i).cast("double")
            acc = t if acc is None else acc + t
        partials.append(acc)
    total = partials[0]
    for p in partials[1:]:
        total = total + p
    return total


def _flat_dot_lit_text(a: str, vals: list) -> str:
    """SQL text of the flat fold-order chain Σ ``a[i]·vals[i]`` against a
    Python-held literal vector (parts=1, left-associated — BIT-identical
    to the ``zip_with``/``aggregate`` fold at ``len(vals)`` width, since
    ``0.0 + x₀ = x₀`` for non-NaN doubles), with each literal emitted via
    :func:`_lit_d` so it round-trips exactly.  Used by the inline
    assignment chains so the per-centroid dots run in whole-stage codegen
    instead of the interpreted HOF path (round-10)."""
    acc = None
    for i, v in enumerate(vals):
        t = f"(CAST({a}[{i}] AS DOUBLE) * {_lit_d(float(v))})"
        acc = t if acc is None else f"({acc} + {t})"
    return acc if acc is not None else "CAST(0.0 AS DOUBLE)"


def _flat_dot_lit_split_text(col: str, vals: list, parts: int) -> str:
    """SQL text of the SPLIT-PARTIALS :func:`flat_dot` chain with one side
    a Python-held literal vector: same grouping and left-associated order
    as :func:`_flat_dot_text` (literal side in the ``a`` position), each
    literal emitted exactly via :func:`_lit_d`.  IEEE multiplication is
    commutative bit-for-bit, so folding the cast-literal into the term
    changes nothing; the SUM order is pinned by the parentheses."""
    col = _quote_ident(col)
    dim = len(vals)
    chunk = -(-dim // parts)
    groups: list[str] = []
    for start in range(0, dim, chunk):
        acc = None
        for i in range(start, min(start + chunk, dim)):
            t = f"({_lit_d(float(vals[i]))} * CAST({col}[{i}] AS DOUBLE))"
            acc = t if acc is None else f"({acc} + {t})"
        groups.append(acc)
    total = groups[0]
    for g in groups[1:]:
        total = f"({total} + {g})"
    return total


def _flat_dot_py(a, b, dim: int, parts: int) -> float:
    """Python-float mirror of :func:`flat_dot`'s split-partials order.
    Python floats ARE IEEE doubles and + / * are the same correctly-
    rounded operations the JVM executes, so evaluating the identical
    left-associated sequence here is bit-identical to evaluating the
    staged expression on an executor — what lets a driver-held query
    vector's norm be inlined as a literal."""
    parts = max(1, min(parts, dim))
    chunk = -(-dim // parts)
    partials: list[float] = []
    for start in range(0, dim, chunk):
        acc = None
        for i in range(start, min(start + chunk, dim)):
            t = float(a[i]) * float(b[i])
            acc = t if acc is None else acc + t
        partials.append(acc)
    total = partials[0]
    for p in partials[1:]:
        total = total + p
    return total


#: bounded-query-set gate for the inlined ANN scoring paths: a probe set
#: this small is driver-held model state (k-means centroid precedent),
#: and inlining it turns the non-equi broadcast join + interpreted
#: per-pair projection into ONE codegen scan projection.  Above the gate
#: the generic join path is kept (an unbounded query side must never be
#: collected).
ANN_INLINE_MAX = 64


def _collect_inline_queries(
    q: DataFrame, cols: list[str], vec_col: str, dim: int
) -> list | None:
    """Collect a BOUNDED query side for literal inlining, or ``None`` to
    keep the generic join path: more than :data:`ANN_INLINE_MAX` rows, a
    NULL / wrong-width vector (the literal mirror needs the pinned
    width), or a non-finite component (engine literal spellings differ).
    Rows come back sorted by the first column (the id) so expression
    construction is deterministic."""
    rows = q.select(*cols).limit(ANN_INLINE_MAX + 1).collect()
    if len(rows) > ANN_INLINE_MAX or not rows:
        return None
    import math

    for r in rows:
        if r[0] is None:
            return None
        v = r[vec_col]
        if v is None or len(v) != dim:
            return None
        if any(x is None or not math.isfinite(x) for x in v):
            return None
    return sorted(rows, key=lambda r: r[0])


def _quote_ident(name: str) -> str:
    """Backtick-quote a (possibly alias-qualified) column name for SQL
    text: ``l.v`` → ``` `l`.`v` ``` — each dot-separated segment quoted,
    so reserved words and underscore-leading names parse as references."""
    return ".".join(f"`{p}`" for p in name.split("."))


def _flat_dot_text(a: str, b: str, dim: int, parts: int) -> str:
    """SQL text of the :func:`flat_dot` chain — explicit parentheses pin
    the left-associated grouping of each partial and of the top-level
    combine, so the parsed tree is the loop-built tree node for node."""
    a, b = _quote_ident(a), _quote_ident(b)
    chunk = -(-dim // parts)
    groups: list[str] = []
    for start in range(0, dim, chunk):
        acc = None
        for i in range(start, min(start + chunk, dim)):
            t = f"(CAST({a}[{i}] AS DOUBLE) * CAST({b}[{i}] AS DOUBLE))"
            acc = t if acc is None else f"({acc} + {t})"
        groups.append(acc)
    total = groups[0]
    for g in groups[1:]:
        total = f"({total} + {g})"
    return total


def cosine(a: Column | str, b: Column | str) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


#: summation split of every width-pinned cosine (scoring dots AND norms):
#: the split-partials shape whole-stage codegen compiles into short
#: independent chains.  Round-10 micro-benchmark at 10M pairs / dim 64
#: (noop sink, same session): interpreted HOF cosine 1545 s executor CPU,
#: flat parts=1 211 s, flat parts=8 **15.8 s**.  Any DuckDB oracle grading
#: a parts>1 site must mirror the order with explicit per-term SQL
#: (queries/suite._dot_split_sql) — same contract as embedding_near_dup.
COSINE_SPLIT_PARTS = 8


def _staged_cosine(
    q: DataFrame, c: DataFrame, qv: str, cv: str, dim: int | None
) -> tuple:
    """(q', c', score) for a pair-scoring join: with the vector width
    pinned by the caller's table contract, each side's norm is staged
    into a column BEFORE the join (computed once per ROW, where the
    ``cosine`` form re-folds both norms once per PAIR) and the per-pair
    dot is the codegen :func:`flat_dot` split-partials chain
    (:data:`COSINE_SPLIT_PARTS`) instead of the interpreted
    zip_with/aggregate fold (round-10, guide §4 — the same staged shape
    :func:`semdedup`'s pair scan uses).  The split summation order is a
    DIFFERENT (fully deterministic) IEEE sequence from the fold, so
    oracles of width-pinned callers mirror it via ``_dot_split_sql``.
    ``dim=None`` keeps the fold form for generic/ragged callers."""
    if dim is None:
        return q, c, cosine(qv, cv)
    p = COSINE_SPLIT_PARTS
    qs = q.withColumn("_nq", F.sqrt(flat_dot(qv, qv, dim, parts=p)))
    cs = c.withColumn("_nc", F.sqrt(flat_dot(cv, cv, dim, parts=p)))
    score = flat_dot(qv, cv, dim, parts=p) / (F.col("_nq") * F.col("_nc"))
    return qs, cs, score


def _np_flat_dot(V, W, dim: int, parts: int):
    """NumPy mirror of :func:`flat_dot`'s split-partials order over row
    matrices ``V``/``W`` of shape (n, dim): every multiply and add is an
    ELEMENTWISE ufunc call in the exact left-associated sequence the
    staged expression executes per row, so the result vector is
    bit-identical to the JVM evaluation.  (Deliberately NOT np.dot /
    np.add.reduce — both use pairwise/SIMD summation with a different,
    version-dependent order.)"""
    chunk = -(-dim // parts)
    partials = []
    for start in range(0, dim, chunk):
        acc = None
        for i in range(start, min(start + chunk, dim)):
            t = V[:, i] * W[:, i]
            acc = t if acc is None else acc + t
        partials.append(acc)
    total = partials[0]
    for p in partials[1:]:
        total = total + p
    return total


def _lsh_bucket_py(v, nbits: int, dim: int) -> int:
    """Driver-Python mirror of :func:`_lsh_bucket_text` for one vector —
    same left-fold order, and Spark's comparison rule for the sign test
    (NaN compares greater than 0, unlike IEEE/NumPy)."""
    import math

    out = 0
    for b in range(nbits):
        acc = None
        for i in range(dim):
            sgn = 1.0 if (i * (2 * b + 3) + b * 7) % 4 < 2 else -1.0
            t = float(v[i]) * sgn
            acc = t if acc is None else acc + t
        if acc > 0 or math.isnan(acc):
            out += 1 << b
    return out


def _lsh_bucket_np(V, nbits: int, dim: int):
    """NumPy mirror of :func:`_lsh_bucket_text` over a row matrix: per
    bit one left-folded elementwise ±column sum, bit-identical to the
    expression for finite inputs (rows containing non-finite values are
    the caller's job — Spark's NaN-greatest comparison differs from
    IEEE)."""
    import numpy as np

    n = V.shape[0]
    buck = np.zeros(n, dtype=np.int64)
    for b in range(nbits):
        acc = None
        for i in range(dim):
            t = V[:, i] * (1.0 if (i * (2 * b + 3) + b * 7) % 4 < 2 else -1.0)
            acc = t if acc is None else acc + t
        buck += np.where(acc > 0, 1 << b, 0)
    return buck


def _inline_scored(
    c,
    rows,
    dim: int,
    with_label: bool = False,
    prune_k: int | None = None,
    prune_self: bool = False,
    nbits: int | None = None,
    qbuckets: list | None = None,
):
    """(query_id, neighbor_id[, nlabel], score[, qlabel]) of a BOUNDED
    driver-held query set against the candidate frame ``c`` (columns
    ``neighbor_id``, ``cv``[, ``nlabel``]).

    Scoring runs in a ``mapInArrow`` batch function: candidate vectors
    arrive as one contiguous Arrow buffer, reshape zero-copy to (n, dim),
    and the per-query cosines evaluate as ~dim elementwise NumPy ops in
    :func:`flat_dot`'s exact split-partials order (guide §4.2 — hand
    whole batches to vectorized native code).  Why not the codegen
    expression form: a 64-term×8-part chain per query compiles into
    generated methods so large that HotSpot either never JITs them or
    JITs them only after several executions — measured at the 100×
    replica: 38-75 s executor CPU on the execution a bench actually
    pays, vs ~a second of NumPy loops for the identical arithmetic.
    Rows violating the width contract degrade instead of erroring:
    NULL vector, any NULL element among the first ``dim``, or fewer
    than ``dim`` elements → NULL score; a zero-norm vector → NaN; extra
    elements beyond ``dim`` are ignored.  (The ANSI expression path
    this replaces RAISED on short and zero-norm vectors —
    INVALID_ARRAY_INDEX / DIVIDE_BY_ZERO — so none of these rows were
    inside its contract either; on contract data the two paths are
    bit-identical, pinned by
    test_inline_arrow_scorer_bit_identical_to_expression_path.)

    ``prune_k``: when set, each batch emits only its local top-k rows
    per query under the consumer's exact total order (score DESC with
    NaN greatest — Spark's double ordering — then neighbor_id ASC),
    after applying the consumer's own pair filters (``prune_self`` drops
    the self pair; ``with_label`` + ``prune_k`` drops same-label pairs
    exactly like the NULL-safe inequality).  The global top-k is a
    subset of the union of batch-local top-ks under the same total
    order, and the downstream window recomputes exact ranks, so results
    are independent of batching.  Batches carrying contract-violating
    rows (NULL scores possible) skip pruning entirely — NULL ordering
    stays the window's job."""
    import math

    from pyspark.sql.types import DoubleType, StructField, StructType

    p = COSINE_SPLIT_PARTS
    queries = [
        (
            r[0],
            [float(x) for x in r[1]],
            math.sqrt(_flat_dot_py(r[1], r[1], dim, p)),
            (r[2] if with_label else None),
        )
        for r in rows
    ]
    in_schema = c.schema
    id_field = in_schema["neighbor_id"]
    out_fields = [
        StructField("query_id", id_field.dataType, True),
        StructField("neighbor_id", id_field.dataType, id_field.nullable),
    ]
    if with_label:
        nl = in_schema["nlabel"]
        out_fields.append(StructField("nlabel", nl.dataType, True))
        out_fields.append(StructField("qlabel", nl.dataType, True))
    out_fields.append(StructField("score", DoubleType(), True))
    out_schema = StructType(out_fields)

    def score_batches(batches):
        import numpy as np
        import pyarrow as pa

        for b in batches:
            n = b.num_rows
            if n == 0:
                continue
            names = b.schema.names
            i_id = names.index("neighbor_id")
            i_cv = names.index("cv")
            ids = b.column(i_id)
            cv = b.column(i_cv)
            nlab = b.column(names.index("nlabel")) if with_label else None
            # fast path: no NULL vectors and every row exactly `dim` wide
            # → the list values are one contiguous buffer, reshape free
            flat = None
            if cv.null_count == 0:
                vals = cv.combine_chunks().flatten() if isinstance(
                    cv, pa.ChunkedArray
                ) else cv.flatten()
                if len(vals) == n * dim and vals.null_count == 0:
                    flat = vals.to_numpy(zero_copy_only=False)
            if flat is not None:
                V = flat.reshape(n, dim)
                bad = None
            else:
                # contract-violating batch (NULL/ragged/short rows):
                # densify with the expression path's NULL rule
                V = np.zeros((n, dim), dtype=np.float64)
                bad = np.zeros(n, dtype=bool)
                for j, row in enumerate(cv.to_pylist()):
                    if (
                        row is None
                        or len(row) < dim
                        or any(x is None for x in row[:dim])
                    ):
                        bad[j] = True
                    else:
                        V[j, :] = row[:dim]
            with np.errstate(divide="ignore", invalid="ignore"):
                nc = np.sqrt(_np_flat_dot(V, V, dim, p))
                scores = []
                for qid, qv, nq, qlabel in queries:
                    Q = np.broadcast_to(
                        np.asarray(qv, dtype=np.float64), (n, dim)
                    )
                    scores.append(_np_flat_dot(Q, V, dim, p) / (nq * nc))
            mask = bad if bad is not None and bad.any() else None
            ids_np = None
            try:
                ids_np = ids.to_numpy(zero_copy_only=False)
            except Exception:
                ids_np = None  # non-numeric ids: no pruning/self filter
            buck = None
            if nbits is not None:
                # join-on-bucket semantics inside the batch: rows emit
                # only for queries whose bucket matches; a contract-bad
                # row has a NULL bucket in the expression form and never
                # matches; Spark's NaN-greatest sign test is mirrored
                # per-row for non-finite vectors
                buck = _lsh_bucket_np(V, nbits, dim)
                nonfin = ~np.isfinite(V).all(axis=1)
                if bad is not None:
                    nonfin &= ~bad
                for j in np.flatnonzero(nonfin):
                    buck[j] = _lsh_bucket_py(V[j], nbits, dim)
                if bad is not None:
                    buck[bad] = -1
            for qi, ((qid, qv, nq, qlabel), score) in enumerate(
                zip(queries, scores)
            ):
                sel = None
                can_prune = prune_k is not None and ids_np is not None and (
                    mask is None or buck is not None
                )
                if buck is not None or can_prune:
                    keep = np.ones(n, dtype=bool)
                    if buck is not None:
                        keep &= buck == qbuckets[qi]
                    if prune_self and qid is not None and ids_np is not None:
                        keep &= ids_np != qid
                    if with_label:
                        import pyarrow.compute as pc

                        if qlabel is None:
                            keep[:] = False
                        else:
                            eq = pc.equal(nlab, pa.scalar(qlabel, nlab.type))
                            ne = pc.fill_null(pc.invert(eq), False)
                            keep &= ne.to_numpy(zero_copy_only=False)
                    idx = np.flatnonzero(keep)
                    if can_prune and idx.size > prune_k:
                        s = score[idx]
                        nan = np.isnan(s)
                        order = np.lexsort(
                            (ids_np[idx], np.where(nan, 0.0, -s), ~nan)
                        )
                        idx = idx[order[:prune_k]]
                    sel = pa.array(idx)
                take = (lambda a: a.take(sel)) if sel is not None else (
                    lambda a: a
                )
                m = len(sel) if sel is not None else n
                cols = [
                    pa.array(np.full(m, qid), type=pa.int64()).cast(ids.type)
                    if qid is not None
                    else pa.nulls(m, ids.type),
                    take(ids),
                ]
                if with_label:
                    cols.append(take(nlab))
                    cols.append(
                        pa.nulls(m, nlab.type)
                        if qlabel is None
                        else pa.array([qlabel] * m).cast(nlab.type)
                    )
                cols.append(
                    take(pa.array(score, mask=mask))
                    if sel is not None
                    else pa.array(score, mask=mask)
                )
                yield pa.RecordBatch.from_arrays(
                    cols, names=[f.name for f in out_fields]
                )

    return c.mapInArrow(score_batches, out_schema)


def brute_force_topk(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Exact cosine top-k per query vector.

    ``queries`` is expected to be small — Spark broadcasts it, so the scan
    of ``candidates`` is a single pass with no shuffle of the big side;
    ranking shuffles only (query × k-ish) rows.  Self-matches excluded.
    With ``dim`` pinned by the caller's table contract the scoring pass
    runs as staged-norm codegen (see :func:`_staged_cosine`).
    """
    from lab_flink_repository_analytics_spark.session import rebalance

    # the broadcast join keeps the probe side's partitioning, so a narrow
    # local candidate scan must spread BEFORE the per-row scoring pass
    c = rebalance(candidates).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id")
    )

    def ranked(scored):
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(
                "query_id",
                "neighbor_id",
                F.col("rank").cast("int").alias("rank"),
                F.round("score", 6).alias("cos_sim"),
            )
        )

    rows = (
        _collect_inline_queries(queries, [id_col, vec_col], vec_col, dim)
        if dim is not None
        else None
    )
    if rows is not None:
        # Inlined bounded-query path (round-11): the cross join's
        # BroadcastNestedLoopJoin multiplied rows before scoring and the
        # giant per-pair expression hit the JIT's huge-method cliff on
        # the execution a bench actually pays (see _inline_scored).
        # With the query set driver-held, scoring is one vectorized
        # Arrow pass over the candidate scan — no join at all — and
        # bit-identical: the NumPy dot mirrors flat_dot's split order op
        # for op, the query norm is the same IEEE sequence, and the self
        # pair is filtered after scoring exactly as the join condition
        # filtered it before.
        scored = _inline_scored(c, rows, dim, prune_k=k, prune_self=True)
        return ranked(
            scored.filter(F.col("query_id") != F.col("neighbor_id")).select(
                "query_id", "neighbor_id", "score"
            )
        )
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    q, c, score = _staged_cosine(q, c, "qv", "cv", dim)
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            score.alias("score"),
        )
    )
    return ranked(scored)


# Fixed hyperplane seed constants for LSH bucketing (engine-portable:
# pseudo-random ±1 hyperplanes derived from (bit, dim) via a hash-free
# affine rule — stable literals, reproducible in SQL).
LSH_NBITS = 8


def _hyperplane_sign(bit: int, dim_index: Column) -> Column:
    """Deterministic ±1 component of hyperplane ``bit`` at dimension i.

    Uses a small affine congruence (no engine hash): sign = +1 iff
    (i*(2*bit+3) + bit*7) mod 4 < 2.  Crude but fixed and portable; LSH
    quality only needs the planes to be ~uncorrelated.
    """
    v = (dim_index * (2 * bit + 3) + bit * 7) % 4
    return F.when(v < 2, F.lit(1.0)).otherwise(F.lit(-1.0))


def lsh_bucket(
    vec: Column | str, nbits: int = LSH_NBITS, dim: int | None = None
) -> Column:
    """Random-hyperplane LSH bucket id (0..2^nbits-1) for a vector.

    With ``dim`` pinned by the caller's table contract, each bit's
    projection unrolls to a flat codegen sum (one ``F.expr`` parse)
    instead of ``nbits`` interpreted zip_with/aggregate folds per row
    (round-10, guide §4).  Value-identical: the fold's ``0.0 + x₀``
    equals ``x₀`` for every non-NaN double, ±1.0 multiplication is
    exact, and the only +0.0/−0.0 divergence a dropped leading zero can
    introduce is erased by the ``proj > 0`` comparison (−0.0 > 0 and
    +0.0 > 0 are both false)."""
    if dim is not None and isinstance(vec, str):
        return F.expr(_lsh_bucket_text(_quote_ident(vec), nbits, dim))
    v = _c(vec)
    idx = F.sequence(F.lit(0), F.size(v) - 1)
    bits = []
    for b in range(nbits):
        proj = F.aggregate(
            F.zip_with(
                v,
                idx,
                lambda x, i: x.cast("double") * _hyperplane_sign(b, i),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bits.append(F.when(proj > 0, F.lit(1 << b)).otherwise(F.lit(0)))
    out = bits[0]
    for bcol in bits[1:]:
        out = out + bcol
    return out.cast("int")


def _lsh_bucket_text(v: str, nbits: int, dim: int) -> str:
    """SQL text of :func:`lsh_bucket` for a fixed-width vector: per bit a
    flat left-associated sum of ``±v[i]`` terms (the affine sign rule
    evaluated in Python), then the same CASE/add/cast chain."""
    bits = []
    for b in range(nbits):
        acc = None
        for i in range(dim):
            sgn = "1.0" if (i * (2 * b + 3) + b * 7) % 4 < 2 else "-1.0"
            t = f"(CAST({v}[{i}] AS DOUBLE) * CAST('{sgn}' AS DOUBLE))"
            acc = t if acc is None else f"({acc} + {t})"
        bits.append(
            f"(CASE WHEN ({acc}) > CAST(0.0 AS DOUBLE)"
            f" THEN {1 << b} ELSE 0 END)"
        )
    total = bits[0]
    for t in bits[1:]:
        total = f"({total} + {t})"
    return f"CAST(({total}) AS INT)"


def sampled_centroids(
    vectors: DataFrame,
    n_lists: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic coarse quantizer: the ``n_lists`` lowest-id vectors.

    The IVF recall/speed trade-off only depends on centroid *quality*;
    sampling keeps the whole pipeline engine-portable (a DuckDB oracle can
    reproduce it).  For production recall, train with
    :func:`kmeans_centroids` instead — the query plan is identical.
    """
    return (
        vectors.orderBy(id_col)
        .limit(n_lists)
        .select(F.col(id_col).alias("cid"), F.col(vec_col).alias("cv"))
    )


def kmeans_centroids(
    vectors: DataFrame,
    n_lists: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Trained coarse quantizer via Spark MLlib k-means (JVM-side Lloyd)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array

    feats = vectors.select(array_to_vector(F.col(vec_col)).alias("features"))
    model = KMeans(k=n_lists, seed=seed).fit(feats)
    spark = vectors.sparkSession
    rows = [(i, list(map(float, c))) for i, c in enumerate(model.clusterCenters())]
    # JVM LocalRelation, not createDataFrame: k×dim driver-held floats —
    # a Python-worker-backed ExistingRDD scan pays defaultParallelism
    # worker spin-ups per materialization (see session.local_relation);
    # repr→string→double round-trips each centroid coordinate bit-exactly
    from lab_flink_repository_analytics_spark.session import local_relation

    return local_relation(spark, rows, "cid int, cv array<double>")


#: quantizers up to this size are inlined as codegen literals; larger ones
#: fall back to the broadcast-join + window plan
MAX_INLINE_CENTROIDS = 1024


def _inline_assignments(
    vectors: DataFrame,
    cent_rows: list,
    n_best: int,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """Shuffle-FREE centroid assignment: the (bounded) centroid table is
    inlined as scalar literals and the per-vector rank is an
    ``array_sort`` over (-cosine, cid) structs — one narrow projection,
    no crossJoin row expansion, no window exchange.  Tie-break and float
    semantics are bit-identical to the join+window plan: centroid norms
    are pre-folded in Python with the same left-to-right IEEE-double
    order as :func:`dot`, and ascending (-cs, cid) ≡ (cs DESC, cid).

    Round-10: each centroid's cosine is STAGED as its own projected
    column (a flat fold-order ``v[i]·c_i`` literal chain, parts=1 — BIT
    identical to the zip_with/aggregate fold at the centroid width, so
    every oracle keeps its fold-form ``_cos_sql``) and the ``array_sort``
    rank sees only those bound attributes.  Why staging matters:
    ``array_sort`` is a codegen-FALLBACK expression, so any compute left
    inside its child tree evaluates INTERPRETED — both the original HOF
    folds (317 s CPU / 2M rows, k=16) and a first attempt that inlined
    the flat chains directly under the sort (652 s — interpreted flat
    trees are WORSE than interpreted folds) ran there.  With the cosines
    staged into codegen'd columns the same projection measures **40.9 s**
    CPU (7.8×).  Width comes from the centroid model rows, not a probe;
    rows whose vectors differ in width from the centroids are out of
    contract (the fold form NULLed their cosines; the flat form reads the
    first ``dim`` elements)."""
    import math

    # one expr-string parse per staged cosine column: the per-element
    # py4j construction this replaces cost ~1s per centroid row of pure
    # driver chatter (round-10 measurement)
    cs_cols = []
    entries = []
    dim = None
    for j, r in enumerate(sorted(cent_rows, key=lambda r: r["cid"])):
        cv = [float(x) for x in r["cv"]]
        dim = len(cv)
        acc = 0.0
        for x in cv:
            acc += x * x
        ncv = math.sqrt(acc)
        dot_txt = _flat_dot_lit_text("`v`", cv)
        cs_cols.append(
            F.expr(f"({dot_txt} / (`_nv` * {_lit_d(ncv)}))").alias(f"_cs{j}")
        )
        entries.append(
            f"named_struct('negcs', -`_cs{j}`, 'cid', {int(r['cid'])})"
        )
    ranked = F.expr(
        f"slice(array_sort(array({', '.join(entries)})), 1, {int(n_best)})"
    )
    nv = (
        F.sqrt(flat_dot("v", "v", dim)) if dim else norm(F.col("v"))
    )
    return (
        vectors.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
        .withColumn("_nv", nv)
        .select("id", "v", *cs_cols)
        .select("id", "v", F.posexplode(ranked).alias("pos", "e"))
        .select(
            "id",
            "v",
            F.col("e.cid").alias("cid"),
            (F.col("pos") + 1).cast("int").alias("rn"),
        )
    )


#: coarse quantizers at or below this size skip the two-level routing in
#: :func:`hierarchical_assignments` (n_super = 1 degenerates bit-exactly
#: to the flat argmax, so small corpora keep the one-projection plan)
HIERARCHICAL_MIN_LISTS = 64


def hierarchical_assignments(
    vectors: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_super: int | None = None,
    max_inline: int | None = None,
) -> DataFrame:
    """Two-level coarse-quantizer assignment: route each vector through
    ``n_super`` super-centroids (the lowest-cid prefix of the quantizer),
    then score ONLY the centroids whose nearest super matches — O(2·√k)
    cosines per vector instead of the flat argmax's O(k).

    Why it exists: SemDeDup grows the quantizer with the corpus
    (k = n/512), so the flat assignment is O(n·k) = O(n²/512) — measured
    1.2-super-linear at the 100× rehearsal (BENCH_SF10.md).  Two-level
    routing is the standard IVF answer (coarse-within-coarse); cluster
    sizes stay ~512 so the downstream intra-cluster pair scan stays
    linear in n.

    Determinism contract (what keeps the DuckDB oracle exact): supers are
    a PREFIX of the cid-sorted centroid list; each centroid belongs to its
    nearest super by (cos DESC, sid ASC) except supers, which belong to
    THEMSELVES (so no routing bucket is ever empty, even with duplicate
    centroid vectors); each vector picks its best super then the best
    centroid within that super's bucket, both by (cos DESC, id ASC).  The
    driver-side centroid→super cosines use the same left-to-right IEEE
    double fold as :func:`dot`.  ``n_super`` defaults to
    ``1`` for quantizers ≤ HIERARCHICAL_MIN_LISTS — which reduces to the
    flat argmax bit-for-bit — else ``isqrt(k)``.  Precondition for
    n_super > 1: non-zero-norm vectors (routing cosines are undefined on
    zero vectors; the flat n_super = 1 path has no such constraint).

    Plan: TWO chained narrow projections (super rank, then a bucket
    lookup and an in-place ``array_sort`` argmax) — no shuffle, no window
    at any scale.  The routed bucket arrives one of two ways, switched on
    quantizer size (``max_inline``, default MAX_INLINE_CENTROIDS):

    * ``k ≤ max_inline`` — the whole quantizer is collected driver-side
      (model-artifact-sized) and the buckets are ``create_map`` literals:
      zero joins, pure codegen.
    * ``k > max_inline`` — only the √k supers are collected/inlined; the
      k-sized level STAYS DISTRIBUTED: each centroid routes to its super
      with the same inline compare chain, buckets fold to one
      (sid, array<struct>) row each, and vectors pick up their bucket via
      a BROADCAST join on sid — still shuffle-free on the vector table,
      and neither driver memory nor the Catalyst plan grows with k (the
      round-6 form inlined all k as literals unboundedly).  The argmax
      expression over the bucket array is identical in both forms, and
      the per-centroid norms use the same left-to-right fold, so the two
      plans are bit-exact for the same (k, n_super) — pinned by
      tests/test_datapipe.py.

    Returns (id, v, cid, rn=1) like ``ivf_assignments``.
    """
    import math

    if max_inline is None:
        max_inline = MAX_INLINE_CENTROIDS
    cent = centroids.select("cid", "cv")
    k = cent.count()
    if n_super is None:
        n_super = 1 if k <= HIERARCHICAL_MIN_LISTS else max(1, math.isqrt(k))

    def _pydot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc += x * y
        return acc

    if k <= max_inline:
        rows = sorted(cent.collect(), key=lambda r: int(r["cid"]))
        sup_src = rows[:n_super]
    else:
        rows = None
        sup_src = sorted(
            cent.orderBy("cid").limit(n_super).collect(),
            key=lambda r: int(r["cid"]),
        )

    supers = []
    for r in sup_src:
        sv = [float(x) for x in r["cv"]]
        supers.append((int(r["cid"]), sv, math.sqrt(_pydot(sv, sv))))
    super_ids = {sid for sid, _, _ in supers}

    if n_super == 1 and rows is not None:
        # single routing bucket = flat argmax over the whole quantizer —
        # identical compare chain to _inline_assignments
        return _inline_assignments(vectors, rows, 1, id_col, vec_col)

    def _sup_entries(vec_sql: str, nv_sql: str) -> Column:
        # expr-string construction (round-10): one parse; the routing
        # dots are flat fold-order literal chains (codegen) — bit-identical
        # to the former HOF fold at the quantizer width, see
        # _flat_dot_lit_text
        entries = []
        for sid, sv, ns in supers:
            cs = f"({_flat_dot_lit_text(vec_sql, sv)} / ({nv_sql} * {_lit_d(ns)}))"
            entries.append(f"named_struct('negcs', -{cs}, 'sid', {int(sid)})")
        return F.expr(
            f"element_at(array_sort(array({', '.join(entries)})), 1)['sid']"
        )

    sup_dim = len(supers[0][1]) if supers else None
    base = vectors.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v")
    ).withColumn(
        "_nv",
        F.sqrt(flat_dot("v", "v", sup_dim)) if sup_dim else norm(F.col("v")),
    )
    best_sid = _sup_entries("`v`", "`_nv`")

    scored = F.transform(
        F.col("_cands"),
        lambda e: F.struct(
            (-(dot(F.col("v"), e["cv"]) / (F.col("_nv") * e["ncv"]))).alias(
                "negcs"
            ),
            e["cid"].alias("cid"),
        ),
    )
    pick = lambda df: (  # noqa: E731 — shared tail of both bucket forms
        df.withColumn("_best", F.element_at(F.array_sort(scored), 1)).select(
            "id",
            "v",
            F.col("_best.cid").alias("cid"),
            F.lit(1).cast("int").alias("rn"),
        )
    )

    if rows is not None:
        buckets: dict[int, list] = {sid: [] for sid, _, _ in supers}
        for r in rows:
            cid = int(r["cid"])
            cv = [float(x) for x in r["cv"]]
            if cid in super_ids:
                buckets[cid].append(r)
                continue
            nc = math.sqrt(_pydot(cv, cv))
            best = None
            for sid, sv, ns in supers:
                cs = _pydot(cv, sv) / (nc * ns)
                key = (-cs, sid)
                if best is None or key < best[0]:
                    best = (key, sid)
            buckets[best[1]].append(r)
        map_args = []
        for sid, _, _ in supers:
            arr = []
            for r in buckets[sid]:
                cv = [float(x) for x in r["cv"]]
                arr.append(
                    f"named_struct('cid', {int(r['cid'])},"
                    f" 'cv', {_lit_array_d(cv)},"
                    f" 'ncv', {_lit_d(math.sqrt(_pydot(cv, cv)))})"
                )
            map_args += [str(int(sid)), "array(" + ", ".join(arr) + ")"]
        cand_map = F.expr("map(" + ", ".join(map_args) + ")")
        return pick(
            base.withColumn("_cands", F.element_at(cand_map, best_sid))
        )

    # distributed bucket build: route every centroid to its super with
    # the SAME compare chain (supers route to themselves), fold each
    # bucket into one array row, broadcast — n_super rows, k structs total
    cw = cent.withColumn("_nc", norm(F.col("cv")))
    cent_sid = F.when(
        F.col("cid").isin(*[int(s) for s in super_ids]), F.col("cid")
    ).otherwise(_sup_entries("`cv`", "`_nc`"))
    bucket = (
        cw.select(
            cent_sid.alias("sid"),
            F.struct(
                F.col("cid").alias("cid"),
                F.col("cv").alias("cv"),
                F.col("_nc").alias("ncv"),
            ).alias("c"),
        )
        .groupBy("sid")
        .agg(F.collect_list("c").alias("_cands"))
    )
    joined = base.withColumn("_sid", best_sid).join(
        F.broadcast(bucket), F.col("_sid") == F.col("sid")
    )
    return pick(joined)


def ivf_assignments(
    vectors: DataFrame,
    centroids: DataFrame,
    n_best: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    inline: bool = True,
) -> DataFrame:
    """Rank each vector's centroids by cosine; keep the best ``n_best``.

    Default plan (``inline=True``, quantizer ≤ MAX_INLINE_CENTROIDS):
    collect the centroid table driver-side — it is model-artifact-sized
    by contract, never data-scale — and assign via a pure codegen
    projection (see :func:`_inline_assignments`).  The vector table is
    scanned once with NO shuffle at any scale.

    Fallback (large quantizers): centroids broadcast into a crossJoin,
    per-vector rank via a window partitioned by vector id — one hash
    exchange of the #centroids-expanded pair table.
    """
    if inline:
        rows = centroids.select("cid", "cv").collect()
        if len(rows) <= MAX_INLINE_CENTROIDS:
            return _inline_assignments(vectors, rows, n_best, id_col, vec_col)
    v = vectors.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    pairs = v.crossJoin(F.broadcast(centroids)).select(
        "id", "v", "cid", cosine("v", "cv").alias("cs")
    )
    wnd = Window.partitionBy("id").orderBy(F.col("cs").desc(), F.col("cid"))
    return (
        pairs.withColumn("rn", F.row_number().over(wnd))
        .filter(F.col("rn") <= n_best)
        .select("id", "v", "cid", "rn")
    )


def ivf_topk(
    queries: DataFrame,
    candidates: DataFrame,
    centroids: DataFrame,
    k: int = 10,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """IVF approximate top-k: candidates live in exactly one inverted list
    (their nearest centroid); each query probes its ``nprobe`` nearest
    lists and scores only those lists' members — a ``nprobe/n_lists``
    fraction of the data.  At scale the candidate side is written
    partitioned/bucketed by ``cid`` so a probe is a partition-pruned scan.

    The quantizer is materialized ONCE and shared by both assignment
    passes — a lazy ``centroids`` plan (e.g. :func:`sampled_centroids`'
    TakeOrdered over the data table) would otherwise execute twice.
    """
    rows = centroids.select("cid", "cv").collect()
    if len(rows) <= MAX_INLINE_CENTROIDS:
        cand = _inline_assignments(candidates, rows, 1, id_col, vec_col)
        probes = _inline_assignments(queries, rows, nprobe, id_col, vec_col)
    else:
        cand = ivf_assignments(
            candidates, centroids, 1, id_col, vec_col, inline=False
        )
        probes = ivf_assignments(
            queries, centroids, nprobe, id_col, vec_col, inline=False
        )
    cand = cand.select(
        F.col("id").alias("neighbor_id"), F.col("v").alias("cv2"), "cid"
    )
    probes = probes.select(
        F.col("id").alias("query_id"), F.col("v").alias("qv"), "cid"
    )
    probes, cand, score = _staged_cosine(probes, cand, "qv", "cv2", dim)
    scored = (
        F.broadcast(probes)
        .join(cand, on="cid")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", score.alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.col("rank").cast("int").alias("rank"),
            F.round("score", 6).alias("cos_sim"),
        )
    )


def lsh_topk(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 10,
    nbits: int = LSH_NBITS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Approximate top-k: score only candidates in the query's LSH bucket.

    At scale the candidate side is pre-bucketed (partitioned/bucketed table
    on ``bucket``), so a query touches 1/2^nbits of the data.  With ``dim``
    pinned by the caller's table contract, bucketing and scoring run as
    codegen (see :func:`lsh_bucket` / :func:`_staged_cosine`).
    """
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id")
    )

    def ranked(scored):
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(
                "query_id",
                "neighbor_id",
                F.col("rank").cast("int").alias("rank"),
                F.round("score", 6).alias("cos_sim"),
            )
        )

    rows = (
        _collect_inline_queries(queries, [id_col, vec_col], vec_col, dim)
        if dim is not None
        else None
    )
    if rows is not None:
        # Inlined bounded-query path (round-11): candidate bucketing ran
        # the 8-bit unrolled projection expression over EVERY candidate
        # row — the same generated-code JIT cliff as the pair scoring
        # (ann_recall_eval spent 60 s executor CPU here at the 100×
        # replica's first execution).  The Arrow scorer computes buckets
        # and scores in one vectorized pass; the bucket-equality join
        # becomes the per-query bucket mask (bit-identical: same fold
        # order, Spark's NaN-greatest sign rule mirrored, NULL-bucket
        # rows never match).
        c = candidates.select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
        )
        qb = [_lsh_bucket_py(r[1], nbits, dim) for r in rows]
        scored = _inline_scored(
            c,
            rows,
            dim,
            prune_k=k,
            prune_self=True,
            nbits=nbits,
            qbuckets=qb,
        )
        return ranked(
            scored.filter(F.col("query_id") != F.col("neighbor_id")).select(
                "query_id", "neighbor_id", "score"
            )
        )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        lsh_bucket(vec_col, nbits, dim=dim).alias("bucket"),
    )
    c = candidates.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        lsh_bucket(vec_col, nbits, dim=dim).alias("bucket"),
    )
    q, c, score = _staged_cosine(q, c, "qv", "cv", dim)
    scored = (
        F.broadcast(q)
        .join(c, on="bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", score.alias("score"))
    )
    return ranked(scored)


def group_centroids(
    vectors: DataFrame,
    group_cols: list[str],
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Mean-pool vector aggregation: the per-group centroid of an embedding
    column (class prototypes, per-language anchors, cluster summaries).

    Plan shape for 100 TB: posexplode the vector (row-local, no shuffle),
    then ONE hash aggregation on (group, dim) with map-side partials —
    shuffle volume is dims × groups, independent of row count.  Sums run
    in DECIMAL(30,15) so they are order-independent (exact) across any
    partitioning; the final per-dim mean is rounded to 6 decimals.  The
    sorted-struct collect rebuilds the ARRAY<DOUBLE> centroid without a
    second exchange (same grouping key prefix).

    With ``dim`` pinned by the caller's table contract (round-10, same
    shape as mean_pairwise_cosine's fixed-width path): ``dim`` flat
    decimal SUMs + one COUNT in a SINGLE per-group HashAggregate — no
    Generate multiplying rows ×dim before the partial agg, no second
    aggregation.  Bit-identical within the contract (decimal sums are
    grouping-exact; per-(group, pos) count ≡ per-group non-null row count
    at uniform width; same division/round).  NULL vectors are excluded in
    both forms; empty/ragged vectors are out of contract.
    """
    gs = [F.col(g) for g in group_cols]
    if dim is not None:
        g = (
            vectors.where(F.col(vec_col).isNotNull())
            .groupBy(*group_cols)
            .agg(
                F.count(F.lit(1)).alias("_n"),
                *[
                    F.sum(
                        F.get(vec_col, d).cast("double").cast("decimal(30,15)")
                    ).alias(f"_s{d}")
                    for d in range(dim)
                ],
            )
        )
        return g.select(
            *group_cols,
            F.array(
                *[
                    F.round(F.col(f"_s{d}").cast("double") / F.col("_n"), 6)
                    for d in range(dim)
                ]
            ).alias("centroid"),
            F.col("_n").alias("n_vectors"),
        )
    ex = vectors.select(
        *gs, F.posexplode(F.col(vec_col)).alias("pos", "x")
    )
    per_dim = ex.groupBy(*group_cols, "pos").agg(
        F.round(
            F.sum(F.col("x").cast("double").cast("decimal(30,15)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("v"),
        F.count(F.lit(1)).alias("n"),
    )
    return per_dim.groupBy(*group_cols).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "v"))), lambda s: s["v"]
        ).alias("centroid"),
        F.max("n").alias("n_vectors"),
    )


def int8_quantize(
    vec: Column | str, scale_out: bool = True, scale: Column | None = None
) -> Column:
    """Per-vector symmetric int8 scalar quantization — the 4× storage cut
    every large-scale embedding store applies before ANN serving.

    ``scale = max(|v_i|) / 127``; ``q_i = floor(v_i/scale + 0.5)`` (explicit
    half-up — ``round()`` library semantics differ between engines, the
    floor form is bit-identical everywhere).  All-zero vectors quantize to
    zeros with scale 0.  Returns a struct ``(q: array<int>, scale:
    double)`` (or just the array with ``scale_out=False``); dequantize is
    ``q_i * scale``.  Row-local — no shuffle, no UDF.
    """
    v = _c(vec)
    if scale is None:
        # NOTE: interpreted HOF lambdas get no common-subexpression
        # elimination, so this inline scale chain re-evaluates per
        # ELEMENT inside the q lambda below.  Fine for tests/small rows;
        # table-scale callers should stage the scale into a column first
        # (``withColumn("_scale", ...)``) and pass it via ``scale`` —
        # same operand order, same bits, O(1) per element.
        absmax = F.array_max(F.transform(v, lambda x: F.abs(x.cast("double"))))
        scale = absmax / F.lit(127.0)
    q = F.transform(
        v,
        lambda x: F.when(scale == 0, F.lit(0))
        .otherwise(F.floor(x.cast("double") / scale + F.lit(0.5)))
        .cast("int"),
    )
    if not scale_out:
        return q
    return F.struct(q.alias("q"), scale.alias("scale"))


def quantization_error(vec: Column | str, quant: Column) -> Column:
    """Mean absolute reconstruction error of :func:`int8_quantize` output —
    exact-DECIMAL summed (order-independent across partitions) so grouped
    averages hash-match any engine."""
    v = _c(vec)
    diffs = F.zip_with(
        v,
        quant["q"],
        lambda x, qi: F.abs(x.cast("double") - qi.cast("double") * quant["scale"]).cast(
            "decimal(18,12)"
        ),
    )
    return (
        F.aggregate(
            diffs,
            F.lit(0).cast("decimal(28,12)"),
            # re-cast each step: decimal addition widens the type, and the
            # fold's merge must return the zero's type
            lambda acc, d: (acc + d).cast("decimal(28,12)"),
        ).cast("double")
        / F.size(v)
    )


def _round6_ge_cut(threshold: float) -> float:
    """Smallest double ``t`` such that ``cs >= t`` (IEEE double compare)
    ⟺ ``double(round_half_up(cs, 6)) >= double(threshold)`` — Spark's
    ``F.round(cs, 6) >= lit(threshold)`` predicate, reduced to one raw
    double comparison so a vectorized scorer can apply it without
    per-pair decimal arithmetic.  Derivation: the smallest 6-decimal
    value k·1e-6 whose double is >= the threshold's double, minus the
    half-up tie 5e-7, lifted to the smallest double at-or-above that
    decimal cut.  Positive thresholds only (half-up rounds positives
    away from zero)."""
    import math
    from decimal import Decimal

    if not threshold > 0:
        raise ValueError("positive threshold required")
    td = Decimal(threshold)
    k = int(td * 10**6)  # floor
    if float(Decimal(k) / Decimal(10**6)) < threshold:
        k += 1
    cut = Decimal(k) / Decimal(10**6) - Decimal("0.0000005")
    t = float(cut)
    if Decimal(t) < cut:
        t = math.nextafter(t, math.inf)
    return t


def _semdedup_dropped_arrow(asg, dim: int, threshold: float, id_col: str):
    """Within-cluster SemDeDup drop set as ONE grouped Arrow pass
    (guide §4.2): per cluster, the pairwise split-partials cosine matrix
    evaluates as ~dim elementwise outer-product accumulations in NumPy —
    bit-identical order to the staged expression the cluster self-join
    evaluated per pair — and a vector is dropped when any LOWER-id row
    clears the threshold (the exact ``F.round(cs,6) >= threshold``
    predicate via :func:`_round6_ge_cut`, with Spark's NaN-greatest
    comparison mirrored).  Ships each vector ONCE (the self-join shipped
    every pair) and replaces the generated per-pair expression that paid
    the huge-method JIT cliff on first execution (measured 24.7 s
    executor CPU at sf0.1, ~12 s steady, for ~13M pairs).

    Caller contract (the ``dim`` gate): every vector non-NULL and
    exactly ``dim`` wide — semdedup only takes this path after its
    min==max width probe."""
    import math as _math

    from pyspark.sql.types import StructField, StructType

    p = COSINE_SPLIT_PARTS
    cut = _round6_ge_cut(threshold)
    out_schema = StructType([StructField("id", asg.schema["id"].dataType)])

    def dropped_of_group(table):
        import numpy as np
        import pyarrow as pa

        tbl = table.combine_chunks()
        id_type = tbl.schema.field("id").type
        ids = tbl.column("id").to_numpy(zero_copy_only=False)
        m = len(ids)
        if m < 2:
            return pa.table({"id": pa.array([], type=id_type)})
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        V = (
            tbl.column("v").chunk(0).flatten()
            .to_numpy(zero_copy_only=False).reshape(m, dim)
        )[order]
        with np.errstate(divide="ignore", invalid="ignore"):
            norm = np.sqrt(_np_flat_dot(V, V, dim, p))
            dropped = np.zeros(m, dtype=bool)
            chunk = -(-dim // p)
            # row blocks bound the (block × m) pair matrix; each block
            # accumulates the same left-associated partial order as
            # flat_dot, elementwise over the block
            bs = max(1, min(m, 4_194_304 // m))
            for s in range(0, m - 1, bs):
                e = min(s + bs, m)
                B = V[s:e]
                partials = []
                for start in range(0, dim, chunk):
                    acc = None
                    for d in range(start, min(start + chunk, dim)):
                        t = np.multiply.outer(B[:, d], V[:, d])
                        acc = t if acc is None else acc + t
                    partials.append(acc)
                P = partials[0]
                for q in partials[1:]:
                    P = P + q
                cs = P / np.multiply.outer(norm[s:e], norm)
                hit = (cs >= cut) | np.isnan(cs)  # Spark: NaN >= t
                # pair rule: lo strictly below hi in ascending-id order
                lo_rank = np.arange(s, e)[:, None]
                hi_rank = np.arange(m)[None, :]
                dropped |= (hit & (lo_rank < hi_rank)).any(axis=0)
        return pa.table({"id": pa.array(ids[dropped]).cast(id_type)})

    # no .distinct(): each id lives in exactly one cluster group and the
    # group function emits it at most once (the old pair join needed the
    # dedup because id_hi matched many id_lo rows)
    return (
        asg.select("cluster_id", "id", "v")
        .groupBy("cluster_id")
        .applyInArrow(dropped_of_group, out_schema)
    )


def semdedup(
    vectors: DataFrame,
    centroids: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023): cluster
    with a coarse quantizer, then drop any vector whose cluster contains a
    LOWER-id vector with cosine ≥ ``threshold``.

    Returns (``id_col``, cluster_id, keep) for every input vector — the
    keep-filter is the dedup decision, deterministic under any
    partitioning (lowest id in each near-dup group survives).

    Scale shape: the O(n²) cosine matrix is confined to single clusters —
    centroids broadcast for assignment (one narrow pass), then ONE
    self-equi-join on cluster id; cluster sizes are capped by the
    quantizer granularity (#clusters scales with n at 100 TB, exactly the
    SemDeDup recipe).  The drop rule needs no transitive closure, so no
    iteration — one join + one semi-join-shaped aggregation.

    Assignment semantics AT SCALE (explicit, round-7): for quantizers
    larger than HIERARCHICAL_MIN_LISTS the cluster assignment is the
    two-level ROUTED argmax of :func:`hierarchical_assignments` — an
    IVF-style approximation of the flat nearest-centroid rule (a vector
    whose true nearest centroid lives under a different super is assigned
    to its routed bucket's best instead, so the drop-set can differ from
    a flat-argmax SemDeDup).  This is the standard IVF recall trade
    (Abbas et al. cluster with exactly such a coarse quantizer); the
    routed-vs-flat divergence is QUANTIFIED, not defined away — pinned by
    tests/test_datapipe.py two ways: an agreement LOWER bound on a
    realistic corpus (test_hierarchical_routed_vs_flat_divergence_
    quantified) and a constructed super-boundary crossing where routed
    and flat MUST differ (test_hierarchical_routing_actually_diverges).
    Below the gate (≤ 64 lists) the assignment is bit-exactly the flat
    argmax.

    Ragged embedding widths: pair cosines NULL out (zip_with pads the
    shorter array), so differing-width vectors are never near-dups; the
    codegen fast path is only taken when all widths match.
    """
    from lab_flink_repository_analytics_spark.session import (
        persist_bounded,
        rebalance,
    )

    # assignments feed three consumers (both sides of the cluster join +
    # the final keep join) — persist so the quantizer pass runs once, and
    # rebalance so a narrow local scan spreads before the per-vector
    # centroid scoring (no-op on a many-split cluster scan)
    # two-level routed assignment: SemDeDup's quantizer grows with the
    # corpus (k = n/512), so the flat argmax would be O(n²/512) — the
    # hierarchical router keeps it O(n·√k) and degenerates bit-exactly to
    # the flat compare chain for small quantizers (n_super = 1)
    asg = persist_bounded(
        hierarchical_assignments(
            rebalance(vectors), centroids, id_col, vec_col
        ).select("id", "v", F.col("cid").alias("cluster_id")),
        "similarity.semdedup.asg",
    )
    # pair-scan arithmetic: the cluster join emits ~(cluster_size/2)
    # cosines PER VECTOR, so the per-pair expression must live inside
    # whole-stage codegen — probe the physical dim once and unroll
    # (HOF lambdas measured 70× the join's own cost at the 100×
    # rehearsal).  Each row's norm is computed once here, not once per
    # pair — same value for every pair the row joins into.
    # The probe runs on the PERSISTED asg frame (materializing the cache
    # the query needs anyway — no extra pass over the source plan) and
    # checks min==max width: a ragged embedding column falls back to the
    # fold-based cosine instead of silently NULLing short rows' norms /
    # truncating long rows' dots at a width sampled from one arbitrary row.
    dim_row = asg.agg(
        F.min(F.size("v")).alias("lo"), F.max(F.size("v")).alias("hi")
    ).first()
    dim = (
        int(dim_row["lo"])
        if dim_row is not None
        and dim_row["lo"] is not None
        and dim_row["lo"] == dim_row["hi"]
        else None
    )
    if dim is not None and threshold > 0:
        # round-11 (guide §4.2): the within-cluster pair scan runs as ONE
        # grouped Arrow pass — each vector ships once instead of once per
        # pair, the split-partials cosine evaluates as vectorized NumPy
        # in the identical IEEE order, and the generated per-pair
        # expression that paid the huge-method JIT cliff on first
        # execution (24.7 s executor CPU at sf0.1; ~12 s steady) is out
        # of the plan.  The r10 staged-expression join remains below as
        # the ragged-width fallback; the oracle (_dot_split_sql mirror)
        # is unchanged because the values are bit-identical.
        dropped = _semdedup_dropped_arrow(asg, dim, threshold, id_col)
    else:  # empty input (shape-only plan) or ragged widths: fold cosine
        a = asg.select(
            F.col("id").alias("id_lo"), F.col("v").alias("v_lo"), "cluster_id"
        )
        b = asg.select(
            F.col("id").alias("id_hi"), F.col("v").alias("v_hi"), "cluster_id"
        )
        cs = cosine("v_lo", "v_hi")
        dropped = (
            a.join(b, "cluster_id")
            .filter(F.col("id_lo") < F.col("id_hi"))
            .filter(F.round(cs, 6) >= F.lit(threshold))
            .select(F.col("id_hi").alias("id"))
            .distinct()
        )
    return (
        asg.join(dropped.withColumn("dropped", F.lit(True)), "id", "left")
        .select(
            F.col("id").alias(id_col),
            "cluster_id",
            F.coalesce(~F.col("dropped"), F.lit(True)).alias("keep"),
        )
    )


def hard_negatives(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    dim: int | None = None,
) -> DataFrame:
    """Hard-negative mining for contrastive training: per query, the top-k
    most cosine-similar candidates with a DIFFERENT label — the negatives
    closest to the decision boundary.

    Same plan as :func:`brute_force_topk` (broadcast the small query set,
    one pass over candidates, per-query window top-k) plus the label
    inequality pushed into the join condition so same-label pairs are
    never scored.  At scale, swap the candidate scan for the IVF/LSH
    bucketed variants exactly as with ANN.
    """
    from lab_flink_repository_analytics_spark.session import rebalance

    c = rebalance(candidates).select(
        F.col(id_col).alias("neg_id"),
        F.col(vec_col).alias("cv"),
        F.col(label_col).alias("nlabel"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("neg_id"))

    def ranked(scored):
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(
                "query_id",
                "neg_id",
                F.col("rank").cast("int").alias("rank"),
                F.round("score", 6).alias("cos_sim"),
            )
        )

    rows = (
        _collect_inline_queries(
            queries, [id_col, vec_col, label_col], vec_col, dim
        )
        if dim is not None
        else None
    )
    if rows is not None:
        # Inlined bounded-query path (round-11): the label-inequality
        # join is a BroadcastNestedLoopJoin that multiplied rows before
        # the giant per-pair score expression, which pays the JIT
        # huge-method cliff on first execution (measured at the 10×
        # replica: 4.14 s r9 fold → 9.34 s r10 flat executor CPU).  The
        # vectorized Arrow scorer (see _inline_scored) is bit-identical
        # and stable; the label filter applies after scoring with
        # identical null semantics (NOT(NULL = x) dropped the pair in
        # the join; NULL qlabel != x drops it here).
        scored = _inline_scored(
            c.withColumnRenamed("neg_id", "neighbor_id"),
            rows,
            dim,
            with_label=True,
            prune_k=k,
        )
        return ranked(
            scored.filter(F.col("qlabel") != F.col("nlabel"))
            .select(
                "query_id",
                F.col("neighbor_id").alias("neg_id"),
                "score",
            )
        )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        F.col(label_col).alias("qlabel"),
    )
    q, c, score = _staged_cosine(q, c, "qv", "cv", dim)
    scored = (
        F.broadcast(q)
        .join(c, F.col("qlabel") != F.col("nlabel"))
        .select("query_id", "neg_id", score.alias("score"))
    )
    return ranked(scored)


def kmeans_lloyd_df(
    vectors: DataFrame,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Distributed Lloyd k-means in pure DataFrame ops, engine-exact:
    returns the final (``id_col``, cluster_id) assignment.

    Determinism contract (what makes a DuckDB oracle possible where
    MLlib's float k-means is not): init = the k lowest-id vectors
    (:func:`sampled_centroids`); assignment = cosine argmax with
    (cs DESC, cid) tie-break; update = per-dimension EXACT-decimal mean
    rounded to 6 places (order-independent across partitions, same as
    :func:`group_centroids`).  Empty clusters keep their previous
    centroid.

    Scale shape per iteration: assignment is the inlined-quantizer
    projection (NO shuffle — centroids are driver-held model state,
    k ≤ MAX_INLINE_CENTROIDS by contract, exactly how MLlib holds
    centers); the update is one per-cluster hash aggregation of ``dim``
    flat decimal sums when the caller pins the vector width, else one
    (cluster, dim) hash aggregation over a posexplode.  The driver
    round-trips k×dim scalars per iteration — bounded model state,
    never data.
    """
    cents = [
        {"cid": r["cid"], "cv": [float(x) for x in r["cv"]]}
        for r in sampled_centroids(vectors, k, id_col, vec_col).collect()
    ]
    asg = None
    for it in range(iters):
        asg = _inline_assignments(vectors, cents, 1, id_col, vec_col)
        if it == iters - 1:
            # the returned assignment is computed from the centroids as
            # they stand at the top of the final iteration; the final
            # update's centroids are never read again, so running its
            # aggregation + collect was one whole dead data pass per call
            # (round-10, guide §2.4 — the output plan is bit-identical
            # with or without it)
            break
        if dim is not None:
            # Fixed-width single-aggregation update (round-10, guide
            # §2.2/§2.3 — same shape as mean_pairwise_cosine's dim path):
            # with the vector width pinned by the caller's table contract,
            # the per-(cluster, dim) means become ``dim`` flat decimal SUMs
            # plus one COUNT in a single per-cluster HashAggregate — no
            # posexplode Generate multiplying rows ×dim before the
            # exchange, no second (cid) aggregation, no collect_list.
            # Bit-identical within the width contract: decimal sums are
            # exact (grouping-independent), the per-(cid, pos) row count
            # equals the per-cid row count when every vector has exactly
            # ``dim`` elements, and the double division + round are the
            # same expressions.  Rows narrower/wider than ``dim`` are out
            # of contract (same stance as embedding_near_dup); the
            # explode path below stays for generic callers.
            upd = (
                asg.groupBy("cid")
                .agg(
                    F.count(F.lit(1)).alias("_n"),
                    *[
                        F.sum(
                            F.get("v", d).cast("double").cast("decimal(30,15)")
                        ).alias(f"_s{d}")
                        for d in range(dim)
                    ],
                )
                .select(
                    "cid",
                    *[
                        F.round(
                            F.col(f"_s{d}").cast("double") / F.col("_n"), 6
                        ).alias(f"_m{d}")
                        for d in range(dim)
                    ],
                )
                .collect()
            )
            new = {
                r["cid"]: [float(r[f"_m{d}"]) for d in range(dim)] for r in upd
            }
            cents = [
                {"cid": c["cid"], "cv": new.get(c["cid"], c["cv"])}
                for c in cents
            ]
            continue
        upd = (
            asg.select("cid", F.posexplode("v").alias("pos", "x"))
            .groupBy("cid", "pos")
            .agg(
                F.round(
                    F.sum(F.col("x").cast("double").cast("decimal(30,15)"))
                    .cast("double")
                    / F.count(F.lit(1)),
                    6,
                ).alias("m")
            )
            .groupBy("cid")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "m"))),
                    lambda s: s["m"],
                ).alias("cv")
            )
            .collect()
        )
        new = {r["cid"]: [float(x) for x in r["cv"]] for r in upd}
        cents = [
            {"cid": c["cid"], "cv": new.get(c["cid"], c["cv"])} for c in cents
        ]
    return asg.select(F.col("id").alias(id_col), F.col("cid").alias("cluster_id"))


def mean_pairwise_cosine(
    vectors: DataFrame,
    group_col: str = "label",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Mean pairwise cosine similarity WITHIN each group — the corpus
    redundancy/diversity signal a SemDeDup-style curation pass reads per
    source/label before deciding how aggressively to deduplicate it.

    O(N·d), never O(N²): with unit-normalized rows ``u_i`` the identity
    ``Σ_{i≠j} u_i·u_j = ‖Σ_i u_i‖² − Σ_i ‖u_i‖²`` reduces the all-pairs
    mean to two moments — per-dim component sums and per-row self-dots.
    Both are DECIMAL sums of deterministic doubles
    (order-independent under any partitioning — the
    :func:`covariance_matrix` float policy), so the result is bit-stable
    across shuffle layouts and has an exact DuckDB twin.  Plan: one
    posexplode meets a map-side partial agg (shuffle volume #groups·dim
    rows), one per-group rollup of row-local self-dots, and a broadcast
    join of the two model-sized tables.  Groups with a single vector
    report NULL (no pairs).  Output: (``group_col``, n_vectors, mean_cos).

    Preconditions enforced up front (not silently skewed into the mean):
    rows with a NULL embedding or a zero-norm embedding cannot contribute
    a unit vector, so they are excluded from ``n_vectors`` too; NULL group
    labels are dropped — a null-keyed "group" has no curation meaning.
    The squared component sum is accumulated as DECIMAL(38,10) (28 integer
    digits), so per-group size is bounded by ~1e13 worst-case-aligned unit
    vectors before overflow — not the ~31M a (30,15) cast would allow.
    """
    from lab_flink_repository_analytics_spark.session import rebalance

    # Stage the norm into a COLUMN before the per-element division
    # (round-10): interpreted HOF lambdas get no common-subexpression
    # elimination, so a lambda-captured ``norm(vec)`` expression
    # re-evaluated the whole 64-term fold per ELEMENT — measured 10×
    # (1.43 s → 0.14 s for this projection at sf0.1), bit-identical
    # results (same operand order, only the evaluation count changes).
    rows = (
        rebalance(vectors)
        .where(F.col(group_col).isNotNull() & F.col(vec_col).isNotNull())
        .withColumn("_nrm", norm(vec_col))
        .where(F.col("_nrm") > 0)
        .select(
            F.col(group_col).alias("grp"),
            # the divisor is NULL-guarded (not just filtered) so ANSI mode
            # cannot raise DIVIDE_BY_ZERO when codegen evaluates the
            # projection alongside the filter; guarded rows are already
            # excluded by the _nrm > 0 predicate above
            F.transform(
                F.col(vec_col),
                lambda x: x.cast("double")
                / F.when(F.col("_nrm") > 0, F.col("_nrm")),
            ).alias("u"),
        )
    )
    n = F.col("n_vectors")
    if dim is not None:
        # Fixed-width single-aggregation path (round-10, guide §2.3/§2.4):
        # with the vector width pinned by the caller's table contract, the
        # per-dim component sums become ``dim`` flat SUM aggregates in the
        # SAME HashAggregate as n_vectors/ssum — no posexplode (which
        # multiplied rows ×dim through a Generate before the exchange: 20 s
        # of the 23 s executor time at sf0.1 lived in that stage), no
        # second pass over ``rows`` (the un-persisted projection used to
        # run once for dims and once for rowagg), no dims exchange and no
        # broadcast join.  Bit-identical to the explode form: DECIMAL sums
        # are exact, hence order- and grouping-independent; ``F.get``
        # yields NULL past a row's width exactly as posexplode generates
        # no row there (SUM skips both), and the NULL-sum dims that the
        # old sumsq aggregate skipped enter the ``+`` chain as exact
        # decimal zeros via coalesce.  Rows WIDER than ``dim`` would lose
        # their tail dims — out of contract, same stance as
        # embedding_near_dup's width contract.
        g = rows.groupBy("grp").agg(
            F.count(F.lit(1)).cast("bigint").alias("n_vectors"),
            F.sum(dot("u", "u").cast("decimal(30,15)")).alias("ssum"),
            *[
                F.sum(F.get("u", d).cast("decimal(30,15)")).alias(f"_s{d}")
                for d in range(dim)
            ],
        )
        sq = [
            F.coalesce(
                (F.col(f"_s{d}").cast("double") * F.col(f"_s{d}").cast("double")).cast(
                    "decimal(38,10)"
                ),
                F.lit(0).cast("decimal(38,10)"),
            )
            for d in range(dim)
        ]
        sumsq = sq[0]
        for term in sq[1:]:
            sumsq = sumsq + term
        return g.select(
            F.col("grp").alias(group_col),
            n,
            F.when(
                n > 1,
                F.round(
                    (sumsq.cast("double") - F.col("ssum").cast("double"))
                    / (n * (n - 1)),
                    6,
                ),
            ).alias("mean_cos"),
        )
    dims = (
        rows.select("grp", F.posexplode("u").alias("d", "x"))
        .groupBy("grp", "d")
        .agg(F.sum(F.col("x").cast("decimal(30,15)")).alias("s"))
    )
    gsum = dims.groupBy("grp").agg(
        F.sum(
            (F.col("s").cast("double") * F.col("s").cast("double")).cast(
                "decimal(38,10)"
            )
        ).alias("sumsq")
    )
    rowagg = rows.groupBy("grp").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_vectors"),
        F.sum(dot("u", "u").cast("decimal(30,15)")).alias("ssum"),
    )
    return (
        rowagg.join(F.broadcast(gsum), "grp")
        .select(
            F.col("grp").alias(group_col),
            n,
            F.when(
                n > 1,
                F.round(
                    (F.col("sumsq").cast("double") - F.col("ssum").cast("double"))
                    / (n * (n - 1)),
                    6,
                ),
            ).alias("mean_cos"),
        )
    )


def covariance_matrix(
    vectors: DataFrame,
    vec_col: str = "embedding",
    upper_only: bool = True,
) -> DataFrame:
    """Sample covariance matrix of the embedding column: (i, j, cov) with
    1-based dims, upper triangle by default.

    Engine-exact two-pass moments: Σ x_i·x_j and Σ x_i are DECIMAL sums of
    deterministic double products (order-independent at any partitioning),
    combined as (Σxy − Σx·Σy/n)/(n−1) in double, rounded to 6.  Plan: the
    dim² pair expansion happens per row and meets a map-side partial
    aggregation immediately — shuffle volume is dim²·#partitions rows
    (model-sized), never data-scale; the dim-level sums rollup reuses the
    same scan.  This is the X^T X building block of distributed PCA
    (:func:`pca_project`).
    """
    from lab_flink_repository_analytics_spark.session import rebalance

    # the dim² expansion is the data-amplifying map stage — spread a
    # narrow local scan across the executors first (no-op on a
    # many-split cluster scan); both moment passes reuse the rebalanced
    # frame
    vectors = rebalance(vectors.select(F.col(vec_col).alias(vec_col)))
    v = F.col("v")
    a = vectors.select(F.col(vec_col).alias("v")).select(
        F.posexplode(v).alias("i0", "xi"), v.alias("v2")
    )
    if upper_only:
        # generate ONLY the upper triangle (round-10, guide §2.3): slicing
        # v2 to its j ≥ i tail before the second posexplode halves the
        # Generate's output (dim² → dim(dim+1)/2 rows per input row)
        # instead of discarding the lower triangle with a post-filter;
        # j recovers from the slice-relative position.  Same (i0, j0,
        # xi, xj) row set as explode-then-filter — measured value-equal
        # (sxy and n) at sf0.1.
        b = a.select(
            "i0",
            "xi",
            F.posexplode(F.expr("slice(v2, i0 + 1, size(v2) - i0)")).alias(
                "jrel", "xj"
            ),
        ).select("i0", "xi", (F.col("i0") + F.col("jrel")).alias("j0"), "xj")
    else:
        b = a.select("i0", "xi", F.posexplode("v2").alias("j0", "xj"))
    mom = b.groupBy("i0", "j0").agg(
        F.sum(
            (F.col("xi").cast("double") * F.col("xj").cast("double")).cast(
                "decimal(30,15)"
            )
        ).alias("sxy"),
        F.count(F.lit(1)).alias("n"),
    )
    dims = (
        vectors.select(F.posexplode(F.col(vec_col)).alias("i0", "x"))
        .groupBy("i0")
        .agg(F.sum(F.col("x").cast("double").cast("decimal(30,15)")).alias("sx"))
    )
    d1 = dims.select(F.col("i0").alias("i0"), F.col("sx").alias("si"))
    d2 = dims.select(F.col("i0").alias("j0"), F.col("sx").alias("sj"))
    return (
        mom.join(F.broadcast(d1), "i0")
        .join(F.broadcast(d2), "j0")
        .select(
            (F.col("i0") + 1).cast("int").alias("i"),
            (F.col("j0") + 1).cast("int").alias("j"),
            F.round(
                (
                    F.col("sxy").cast("double")
                    - F.col("si").cast("double")
                    * F.col("sj").cast("double")
                    / F.col("n")
                )
                / (F.col("n") - 1),
                6,
            ).alias("cov"),
        )
    )


def pca_project(
    vectors: DataFrame,
    k: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Project embeddings onto their top-k principal components.

    Distributed part: :func:`covariance_matrix` (exact-decimal moments,
    model-sized shuffle).  Driver part: eigendecomposition of the dim²
    matrix (numpy ``eigh`` — model state, like k-means centers) with a
    deterministic sign convention (largest-|coord| entry positive).  The
    projection itself inlines the components as literals — one narrow
    codegen pass over the data, no shuffle (same pattern as
    :func:`_inline_assignments`).  Output: (``id_col``, pc ARRAY<DOUBLE>
    of length k), coordinates of the MEAN-CENTERED vector.
    """
    import numpy as np

    cov_rows = covariance_matrix(vectors, vec_col, upper_only=True).collect()
    dim = max(r["j"] for r in cov_rows)
    cov = np.zeros((dim, dim))
    for r in cov_rows:
        cov[r["i"] - 1, r["j"] - 1] = r["cov"]
        cov[r["j"] - 1, r["i"] - 1] = r["cov"]
    vals, vecs = np.linalg.eigh(cov)
    comps = []
    for c in range(1, k + 1):
        comp = vecs[:, -c]
        # deterministic sign: the largest-magnitude coordinate is positive
        pivot = int(np.argmax(np.abs(comp)))
        if comp[pivot] < 0:
            comp = -comp
        comps.append([float(x) for x in comp])
    mean = [
        float(x)
        for x in np.array(
            vectors.agg(
                *[
                    F.avg(F.col(vec_col)[i].cast("double")).alias(f"m{i}")
                    for i in range(dim)
                ]
            ).collect()[0]
        )
    ]
    # expr-string construction (round-10): same tree, one parse — see
    # _inline_assignments for the measured py4j-loop cost this replaces
    centered = (
        f"zip_with(`{vec_col}`, {_lit_array_d(mean)},"
        " (x, m) -> CAST(x AS DOUBLE) - m)"
    )
    coord_texts = [
        f"aggregate(zip_with({centered}, {_lit_array_d(comp)},"
        " (x, w) -> x * w), CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"
        for comp in comps
    ]
    coords = F.expr("array(" + ", ".join(coord_texts) + ")")
    return vectors.select(F.col(id_col).alias(id_col), coords.alias("pc"))

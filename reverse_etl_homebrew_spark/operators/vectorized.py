"""Arrow/pandas vectorized variants of the vector-math operators —
the high-dimensional scale path (SURVEY.md §2.10; SNIPPETS.md [1]-[3]
Arrow patterns).

The flat unrolled expressions in functions/vectors.py are ideal up to
a few hundred dimensions (pure codegen, bit-deterministic vs the
oracle). Past that, expression size grows linearly and JVM codegen
falls back to interpretation — so the engine provides numpy-backed
Pandas UDFs: one Arrow batch in, one matrix multiply out. ~10-100×
over row-at-a-time Python, and dimension-independent plan size.
"""

from __future__ import annotations

from typing import Sequence

import pandas as pd

from pyspark.sql import DataFrame, functions as F, types as T


def _vector_matrix(vecs: "pd.Series", kernel: str):
    """``np.asarray(series.tolist())`` with the ANN-tier population
    contract made LOUD (r12 review): a NULL embedding row reaching an
    Arrow kernel used to die batch-wide inside numpy with an opaque
    ``setting an array element with a sequence`` / ragged-array error.
    NULL vectors carry no geometry — the tier's declared contract is
    that they are filtered or repaired UPSTREAM (seed readers degrade,
    fixtures/null_robustness_probe.py documents the population side) —
    so the violation is reported as the schema-contract breach it is,
    naming the kernel, instead of a numpy traceback."""
    import numpy as np

    if vecs.isna().any():
        from ..sources.catalog import SchemaContractError

        raise SchemaContractError(
            f"NULL embedding reached the {kernel} kernel — the ANN "
            f"tier's population contract (non-NULL vectors) is "
            f"violated; filter or repair the batch upstream"
        )
    # r13 non-finite components class: the finite scope is enforced at
    # the OPERATOR boundaries (the masking bucketer's NULL-bucket
    # exclusion; the exact/topk paths' norm and fold filters), so the
    # scoring kernels do NOT re-scan every candidate batch for
    # non-finite values — a first-draft isfinite().all() backstop here
    # ran on every pair batch (candidates × dim × 2 sides) and cost
    # 10-20% on the heavy similarity keys for rows that provably
    # cannot be poisoned. Direct kernel API use with non-finite
    # components yields NaN scores (numpy semantics), the documented
    # garbage-in boundary; the NULL guard above stays because a ragged
    # batch CRASHES numpy rather than degrading.
    try:
        return np.asarray(vecs.tolist(), dtype=np.float64)
    except ValueError as exc:
        # ragged batch (mixed vector lengths): numpy's raw error names
        # neither the kernel nor the contract — re-raise as the same
        # SchemaContractError the NULL guard uses (r14 advisor)
        from ..sources.catalog import SchemaContractError

        raise SchemaContractError(
            f"ragged embedding batch reached the {kernel} kernel — "
            f"vector dimensionality is a table property (the ingress "
            f"dimension rule); fix the producer"
        ) from exc


def cosine_scores_pandas(
    df: DataFrame,
    query: Sequence[float],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Cosine similarity of every row vector against ``query`` via a
    scalar Pandas UDF (Arrow-batched numpy matmul)."""
    import numpy as np

    q = np.asarray(list(query), dtype=np.float64)
    qn = float(np.sqrt((q * q).sum()))

    @F.pandas_udf(T.DoubleType())
    def score(vecs: pd.Series) -> pd.Series:
        m = _vector_matrix(vecs, "cosine_scores")
        dots = m @ q
        norms = np.sqrt((m * m).sum(axis=1)) * qn
        with np.errstate(divide="ignore", invalid="ignore"):
            out = np.where(norms > 0, dots / norms, np.nan)
        return pd.Series(out)

    from ..functions import vectors as _VEC

    return df.where(_VEC.finite_geometry(F.col(vec_col), len(q))).select(
        F.col(id_col), score(F.col(vec_col)).alias("score")
    )


def topk_pandas(
    df: DataFrame,
    query: Sequence[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k via the vectorized scorer + TakeOrdered.

    Zero-norm vectors score NaN in the numpy scorer; map them to NULL
    so ranking matches the codegen/SQL path (Spark sorts NaN *above*
    every number in DESC, while a SQL CASE yields NULL which sorts
    last — silently promoting degenerate vectors into the top-k)."""
    scored = cosine_scores_pandas(df, query, id_col, vec_col)
    clean = F.when(~F.isnan("score"), F.round("score", 6))
    return (
        scored.select(id_col, clean.alias("score"))
        .orderBy(F.desc_nulls_last("score"), F.col(id_col))
        .limit(k)
    )


def ivf_assign_pandas(
    df: DataFrame,
    centroids: Sequence[Sequence[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF coarse quantization: assign each vector to its nearest
    centroid (dot-product argmax) — the partitioning step of an
    IVF-flat ANN index. Centroids are deterministic constants chosen
    by the caller (e.g. a prior k-means job or a hash-seeded sample).

    At query time, scoring is restricted to the probe centroids'
    inverted lists — the scan-reduction analog of LSH bucketing with
    better geometry for clustered data."""
    import numpy as np

    C = np.asarray([list(c) for c in centroids], dtype=np.float64)  # (k, d)

    @F.pandas_udf(T.IntegerType())
    def assign(vecs: pd.Series) -> pd.Series:
        # r13: mask corrupt rows to a NULL cell (the bucketer idiom);
        # callers' downstream cell filters exclude them for free
        isnull = vecs.isna().to_numpy()
        if isnull.any():
            safe = vecs.copy()
            safe[isnull] = pd.Series(
                [[float("nan")] * C.shape[1]] * int(isnull.sum()),
                index=safe.index[isnull],
            )
            m = np.asarray(safe.tolist(), dtype=np.float64)
        else:
            m = np.asarray(vecs.tolist(), dtype=np.float64)
        finite = np.isfinite(m).all(axis=1)
        if not finite.all():
            m = np.where(finite[:, None], m, 0.0)
        sims = m @ C.T  # (n, k)
        argmax = sims.argmax(axis=1)
        if finite.all():
            return pd.Series(argmax.astype("int32"))
        # nullable masking built explicitly (r14, advisor): assigning
        # None into an int32 Series relies on a silent dtype upcast —
        # a FutureWarning in pandas 2.x and a TypeError in 3.0
        return pd.Series(
            [int(c) if ok else None for c, ok in zip(argmax, finite)],
            dtype="object",
        )

    # nondeterministic mark: see table_buckets_pandas — the cell
    # filter below (and topk_ivf's probe isin) would otherwise re-plan
    # the kernel a second time under the pushed-down predicate
    return df.select(
        F.col(id_col),
        F.col(vec_col),
        assign.asNondeterministic()(F.col(vec_col)).alias("ivf_cell"),
    ).where(F.col("ivf_cell").isNotNull())


def topk_ivf(
    df: DataFrame,
    query: Sequence[float],
    centroids: Sequence[Sequence[float]],
    k: int = 10,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-flat approximate top-k: score only vectors whose cell is
    among the query's ``n_probe`` nearest centroids."""
    import numpy as np

    C = np.asarray([list(c) for c in centroids], dtype=np.float64)
    q = np.asarray(list(query), dtype=np.float64)
    probe_cells = [int(i) for i in (C @ q).argsort()[::-1][:n_probe]]
    assigned = ivf_assign_pandas(df, centroids, id_col, vec_col)
    cand = assigned.filter(F.col("ivf_cell").isin(probe_cells)).select(id_col, vec_col)
    return topk_pandas(cand, query, k, id_col, vec_col)


def pair_cosine_pandas():
    """Scalar Pandas UDF scoring CANDIDATE PAIRS: cosine of two vector
    columns given their precomputed norms.

    Accumulation is an explicit per-dimension left fold (vectorized
    ACROSS pairs, sequential across dims), so every result is
    bit-identical to the codegen flat fold in functions/vectors.dot
    and to DuckDB's list_sum — the Arrow speed path keeps the oracle
    exact. Exists because a filter over a projected dim-unrolled dot
    re-evaluates the fold per reference (predicate + output) and blows
    the JIT method budget — the candidate-scoring stage of the
    LSH pair joins ran un-JIT'd (measured ~2 s per run on an 87k-pair
    stage that numpy does in milliseconds). Zero/invalid norms yield
    NULL, matching ``F.when(den > 0, ...)``."""
    import numpy as np

    @F.pandas_udf(T.DoubleType())
    def cos(v: pd.Series, bv: pd.Series, n: pd.Series, bn: pd.Series) -> pd.Series:
        if len(v) == 0:
            return pd.Series([], dtype="float64")
        A = _vector_matrix(v, "pair_cosine")
        B = _vector_matrix(bv, "pair_cosine")
        acc = A[:, 0] * B[:, 0]
        for i in range(1, A.shape[1]):
            acc = acc + A[:, i] * B[:, i]
        den = n.to_numpy(dtype=np.float64) * bn.to_numpy(dtype=np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            out = acc / den
        res = pd.Series(out)
        res[den <= 0] = None
        return res

    return cos


def pair_cosine_flags_pandas():
    """Fused pair-cosine for the bucketer-less EXACT knn branch
    (r15 optimization round): computes BOTH vector norms inside the
    kernel and emits ``struct<score: double, ok: boolean>`` — ``ok``
    is the finite-geometry scope (both norms finite), evaluated where
    the vectors already are instead of as two per-side
    ``norm_fold_pandas`` kernels plus scalar filters.

    Why: the exact branch paid THREE Python round-trips per query
    (left norm, right norm, pair cosine), each a fixed worker/Arrow
    cost that dominates at low row counts and adds three
    serialization passes at any size; the vectors cross the boundary
    for the cosine anyway, so the norms are two extra vectorized
    folds over bytes already in cache — one ArrowEvalPython node
    instead of three (guide §4.1: you control how many times you
    cross, cross once).

    Bit-identical to the unfused spelling: the norm is the same
    sequential left fold as ``norm_fold_pandas`` / the codegen
    ``l2_norm`` (float32→float64 widening is exact, IEEE sqrt is
    correctly rounded), the score is the same ``acc / (l_nrm*r_nrm)``
    with NULL when the denominator is not > 0, and ``ok`` reproduces
    the old per-side ``nrm IS NOT NULL AND nrm < inf`` filter: a
    NaN-component fold is NaN, an Inf-component fold overflows to
    +Inf — both legs non-finite, both excluded (the r14 advisor
    contract), while legitimate zero-norm vectors stay (ok=true,
    score NULL — the oracle's CASE)."""
    import numpy as np

    ret = T.StructType(
        [
            T.StructField("score", T.DoubleType()),
            T.StructField("ok", T.BooleanType()),
        ]
    )

    @F.pandas_udf(ret)
    def cosf(v: pd.Series, bv: pd.Series) -> pd.DataFrame:
        if len(v) == 0:
            return pd.DataFrame({"score": pd.Series([], dtype="float64"),
                                 "ok": pd.Series([], dtype="bool")})
        A = _vector_matrix(v, "pair_cosine_flags")
        B = _vector_matrix(bv, "pair_cosine_flags")
        la = A[:, 0] * A[:, 0]
        lb = B[:, 0] * B[:, 0]
        acc = A[:, 0] * B[:, 0]
        for i in range(1, A.shape[1]):
            la = la + A[:, i] * A[:, i]
            lb = lb + B[:, i] * B[:, i]
            acc = acc + A[:, i] * B[:, i]
        ln = np.sqrt(la)
        rn = np.sqrt(lb)
        ok = np.isfinite(ln) & np.isfinite(rn)
        den = ln * rn
        with np.errstate(divide="ignore", invalid="ignore"):
            out = acc / den
        score = pd.Series(out)
        score[~(den > 0)] = None
        return pd.DataFrame({"score": score, "ok": pd.Series(ok)})

    # nondeterministic mark: see table_buckets_pandas — the exact knn
    # branch filters on the ``ok`` field of this output, and predicate
    # pushdown would otherwise re-plan the kernel below the filter
    return cosf.asNondeterministic()


def query_cosine_flags_pandas(query):
    """Fused literal-query cosine for the UN-scoped brute branch (r15):
    one Arrow pass emitting ``struct<score: double, ok: boolean>`` —
    the dot against the fixed query vector AND the row norm computed
    as the same sequential left folds as ``dot_literal`` /
    ``l2_norm`` (bit-identical doubles), with ``ok`` the
    finite-geometry scope on the norm (NaN fold → NaN, Inf fold →
    +Inf, both excluded; finite zero-norm rows stay and score NULL —
    the oracle's CASE). Replaces norm_fold_pandas + a 64-term codegen
    dot in topk_brute's cosine path: same kernel count, one fewer
    per-element JVM pass, and the dim-unrolled expression tree leaves
    the plan."""
    import math

    import numpy as np

    q = np.asarray([float(x) for x in query], dtype=np.float64)
    # qn as the strict left fold (matches VEC._py_dot + math.sqrt)
    acc = 0.0
    for x in query:
        acc += float(x) * float(x)
    qn = math.sqrt(acc)
    ret = T.StructType(
        [
            T.StructField("score", T.DoubleType()),
            T.StructField("ok", T.BooleanType()),
        ]
    )

    @F.pandas_udf(ret)
    def qcos(v: pd.Series) -> pd.DataFrame:
        if len(v) == 0:
            return pd.DataFrame({"score": pd.Series([], dtype="float64"),
                                 "ok": pd.Series([], dtype="bool")})
        A = _vector_matrix(v, "query_cosine_flags")
        nrm_acc = A[:, 0] * A[:, 0]
        dot = A[:, 0] * q[0]
        for i in range(1, A.shape[1]):
            nrm_acc = nrm_acc + A[:, i] * A[:, i]
            dot = dot + A[:, i] * q[i]
        nrm = np.sqrt(nrm_acc)
        ok = np.isfinite(nrm)
        den = nrm * qn
        with np.errstate(divide="ignore", invalid="ignore"):
            out = dot / den
        score = pd.Series(out)
        score[~(den > 0)] = None
        return pd.DataFrame({"score": score, "ok": pd.Series(ok)})

    # nondeterministic mark: the caller filters on ``ok`` — see
    # table_buckets_pandas
    return qcos.asNondeterministic()


def norm_fold_pandas():
    """Scalar Pandas UDF: per-row L2 norm as the SAME sequential
    left fold as functions/vectors.l2_norm (bit-identical doubles —
    the pair_cosine precedent). Exists for the exact knn branch's
    finite-geometry scope: a poisoned vector's fold is NaN, and the
    Arrow boundary maps NaN → NULL, so `norm IS NOT NULL` on this
    kernel's output is a pushdown-proof exclusion that still keeps
    legitimate zero-norm vectors (norm 0.0, finite — their pairs
    score NULL downstream exactly like the oracle's CASE)."""
    import numpy as np

    @F.pandas_udf(T.DoubleType())
    def nrm(v: pd.Series) -> pd.Series:
        if len(v) == 0:
            return pd.Series([], dtype="float64")
        A = _vector_matrix(v, "norm_fold")
        acc = A[:, 0] * A[:, 0]
        for i in range(1, A.shape[1]):
            acc = acc + A[:, i] * A[:, i]
        return pd.Series(np.sqrt(acc))

    # nondeterministic mark: see table_buckets_pandas — the exact knn
    # branch filters `nrm IS NOT NULL AND < inf` on this output, and
    # predicate pushdown would otherwise run the fold twice per side
    return nrm.asNondeterministic()


def centroid_dists_pandas(centroid_vectors):
    """Scalar Pandas UDF returning the RAW squared-L2 distance of a
    vector to each of K centroids as ``array<double>`` (centroid
    order = input order).

    Accumulation is an explicit per-dimension left fold (vectorized
    across rows), so each distance is bit-identical to the flat
    codegen ``(a_i - c_i)²`` fold and to DuckDB's list_sum — rounding
    and argmin stay JVM-side on the tiny output array, keeping the
    oracle arithmetic entirely out of numpy's rounding semantics.
    Exists because K unrolled distance expressions in one projection
    (K·dim·2 terms) cost tens of seconds of janino compile per query
    (measured 28 s for K=8, dim=64 — plan-size disease, not data
    cost)."""
    import numpy as np

    C = np.asarray([list(v) for v in centroid_vectors], dtype=np.float64)

    @F.pandas_udf(T.ArrayType(T.DoubleType()))
    def dists(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype="object")
        # r13 vector-component poison: MASK corrupt rows (NULL vector,
        # NULL/NaN/Inf component) to a NULL distance list — the same
        # attribute-barrier exclusion as the bucketer. The kmeans
        # callers filter `dists IS NOT NULL` on this output; an
        # input-side fold filter referenced across the iterate plan's
        # three consumers re-inlined the 64-term fold everywhere and
        # measured 7× (the janino/pushdown class).
        isnull = vecs.isna().to_numpy()
        if isnull.any():
            safe = vecs.copy()
            dim = C.shape[1]
            safe[isnull] = pd.Series(
                [[float("nan")] * dim] * int(isnull.sum()),
                index=safe.index[isnull],
            )
            A = np.asarray(safe.tolist(), dtype=np.float64)
        else:
            A = np.asarray(vecs.tolist(), dtype=np.float64)
        finite = np.isfinite(A).all(axis=1)
        if not finite.all():
            A = np.where(finite[:, None], A, 0.0)
        cols = []
        for j in range(C.shape[0]):
            d0 = A[:, 0] - C[j, 0]
            acc = d0 * d0
            for i in range(1, A.shape[1]):
                di = A[:, i] - C[j, i]
                acc = acc + di * di
            cols.append(acc)
        M = np.stack(cols, axis=1)
        if finite.all():
            return pd.Series(list(M))
        return pd.Series([row if ok else None for row, ok in zip(M, finite)])

    # nondeterministic mark: see table_buckets_pandas — the kmeans
    # assigners filter `dists IS NOT NULL` on this output, and
    # predicate pushdown would otherwise run the K-centroid kernel
    # twice per assignment pass
    return dists.asNondeterministic()


def table_buckets_pandas(planes_flat, planes_per_table: int, tables: int):
    """Pandas UDF computing all L hash-table bucket ids of a vector in
    ONE Arrow-batched matmul — returns array<long> of length
    ``tables``, each entry tagged with ``t * 2**planes_per_table``.

    Bit order matches functions/vectors.random_hyperplane_signs (first
    plane = MSB). This is the multi-table scale path: L×p flat
    sign-fold expressions in one projection blow past the JVM's
    generated-method JIT budget and run interpreted (measured 6×
    slower than the numpy kernel over the same planes), while the
    Arrow batch keeps plan size independent of L and p.

    Bucket SIGNS are guaranteed bit-identical to the oracle's
    left-to-right sign fold by construction, at matmul speed: BLAS
    reassociates the summation, so a projection within accumulation
    error of zero could flip a sign versus the fold (a pure-fold
    kernel is 70-130x slower per batch — measured). The hybrid
    computes the BLAS projection PLUS a rigorous summation-order error
    bound (any two orders of summing d products differ by at most
    ~2·d·u·Σ|vᵢpᵢ|; 8·d·u used for margin), and recomputes the exact
    scalar left fold ONLY for entries whose |projection| falls inside
    the bound — everywhere else sign(matmul) == sign(fold) is
    mathematically guaranteed, and inside the bound the fold's own
    value decides. Equality to the codegen fold is also pinned
    empirically (test_arrow_bucketer_matches_codegen_sign_fold, plus a
    forced-cancellation unit test)."""
    import numpy as np

    P = np.asarray([list(p) for p in planes_flat], dtype=np.float64)  # (L*p, d)
    weights = (
        np.left_shift(
            np.int64(1), np.arange(planes_per_table - 1, -1, -1, dtype=np.int64)
        )
    )
    tags = np.arange(tables, dtype=np.int64) << planes_per_table

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def buckets(vecs: pd.Series) -> pd.Series:
        import numpy as np

        # r13 vector-component poison: the bucketer MASKS corrupt rows
        # (NULL vector, NULL/NaN/Inf component) to a NULL bucket list
        # instead of raising — its output is a Python-eval attribute
        # barrier, so the operators' `bucket IS NOT NULL` filter is
        # the finite-geometry scope in a form Catalyst can never push
        # back into a duplicated 64-term fold (an input-side fold
        # filter measured 1.2-2.3× on the bucketed keys; this is
        # free). None components arrive as NaN via asarray; whole-NULL
        # vectors are masked before tolist so numpy never sees a
        # ragged object row. Scoring kernels (_vector_matrix callers)
        # keep the LOUD contract — by the time pairs are scored the
        # bucket filter has already excluded every poisoned row.
        isnull = vecs.isna().to_numpy()
        if isnull.any():
            dim = P.shape[1]
            safe = vecs.copy()
            safe[isnull] = pd.Series([[float("nan")] * dim] * int(isnull.sum()),
                                     index=safe.index[isnull])
            m = np.asarray(safe.tolist(), dtype=np.float64)
        else:
            m = np.asarray(vecs.tolist(), dtype=np.float64)
        finite = np.isfinite(m).all(axis=1)
        if finite.all():
            # fast path (clean batches — the overwhelmingly common
            # case): one isfinite pass, no copies, no per-row python
            signs = hybrid_fold_signs(m, P)
            bs = signs.reshape(len(m), tables, planes_per_table).astype(np.int64) @ weights
            return pd.Series(list(bs + tags))
        # compute buckets on a zeroed copy (values irrelevant — masked
        # rows emit NULL) to keep BLAS happy
        m = np.where(finite[:, None], m, 0.0)
        signs = hybrid_fold_signs(m, P)  # (n, L*p)
        bs = signs.reshape(len(m), tables, planes_per_table).astype(np.int64) @ weights
        bs = bs + tags  # (n, L)
        out = [row if ok else None for row, ok in zip(bs, finite)]
        return pd.Series(out)

    # r14 (ab_r14_ledger attribution): deterministic in FACT, marked
    # nondeterministic so the optimizer cannot re-inline the kernel
    # into its consumers' filters — PushDownPredicate substitutes the
    # projected alias into a `bucket IS NOT NULL` / probe `isin()`
    # filter and plans a SECOND ArrowEvalPython, silently doubling
    # every kernel evaluation (measured 1.34× on incremental-knn; the
    # r13 "attribute barrier" claim held for Project collapse but not
    # for filter pushdown). The annotation's only effect is disabling
    # those moves: the filter stays ABOVE the projection and the
    # kernel runs once.
    return buckets.asNondeterministic()


def bucket_norm_pandas(planes_flat, planes_per_table: int, tables: int):
    """Fused bucketer + per-vector L2 norm (r15 optimization round):
    one Arrow pass emitting ``struct<bs: array<long>, nrm: double>``
    — the same bucket ids as ``table_buckets_pandas`` (same hybrid
    sign-fold guarantee, same masking: corrupt rows get NULL fields)
    plus the same norm double as the codegen ``l2_norm`` fold
    (sequential left fold, float32→float64 exact, IEEE sqrt).

    Why fused: every bucketed vector path (knn_join, build_ann_index,
    incremental_knn, embedding_near_dup_pairs) projected the norm as
    a dim-unrolled codegen fold NEXT TO the bucketer kernel — the
    vectors cross the Python boundary for the buckets anyway, so the
    norm there is one extra vectorized fold over bytes already in
    cache, while the codegen spelling re-built a 64-term expression
    tree per side per query (driver analysis/optimizer time scales
    with it — the plan text was dominated by two such folds) and a
    second full pass over the array elements in the JVM. The fold
    arithmetic is bit-identical, so scores are unchanged.

    Masking contract is table_buckets_pandas's, verbatim: NULL
    vector / NULL / NaN / Inf component ⇒ NULL ``bs`` AND NULL
    ``nrm`` — consumers' bucket filters exclude those rows before
    anything shuffles, and the NULL nrm can never reach a score."""
    import numpy as np

    P = np.asarray([list(p) for p in planes_flat], dtype=np.float64)  # (L*p, d)
    weights = (
        np.left_shift(
            np.int64(1), np.arange(planes_per_table - 1, -1, -1, dtype=np.int64)
        )
    )
    tags = np.arange(tables, dtype=np.int64) << planes_per_table
    ret = T.StructType(
        [
            T.StructField("bs", T.ArrayType(T.LongType())),
            T.StructField("nrm", T.DoubleType()),
        ]
    )

    @F.pandas_udf(ret)
    def bucket_norm(vecs: pd.Series) -> pd.DataFrame:
        import numpy as np

        isnull = vecs.isna().to_numpy()
        if isnull.any():
            dim = P.shape[1]
            safe = vecs.copy()
            safe[isnull] = pd.Series([[float("nan")] * dim] * int(isnull.sum()),
                                     index=safe.index[isnull])
            m = np.asarray(safe.tolist(), dtype=np.float64)
        else:
            m = np.asarray(vecs.tolist(), dtype=np.float64)
        finite = np.isfinite(m).all(axis=1)
        if not finite.all():
            m = np.where(finite[:, None], m, 0.0)
        # exact left-fold self-dot (same doubles as l2_norm / the SQL
        # oracle's list_sum fold), then IEEE sqrt
        acc = m[:, 0] * m[:, 0]
        for i in range(1, m.shape[1]):
            acc = acc + m[:, i] * m[:, i]
        nrm = np.sqrt(acc)
        signs = hybrid_fold_signs(m, P)
        bs = signs.reshape(len(m), tables, planes_per_table).astype(np.int64) @ weights
        bs = bs + tags
        if finite.all():
            return pd.DataFrame(
                {"bs": pd.Series(list(bs)), "nrm": pd.Series(nrm)}
            )
        return pd.DataFrame(
            {
                "bs": pd.Series(
                    [row if ok else None for row, ok in zip(bs, finite)]
                ),
                "nrm": pd.Series(
                    [float(x) if ok else None for x, ok in zip(nrm, finite)]
                ),
            }
        )

    # nondeterministic mark: see table_buckets_pandas (filter pushdown
    # would re-plan the kernel below its consumers' bucket filters)
    return bucket_norm.asNondeterministic()


def hybrid_fold_signs(m, P):
    """The hybrid bucketer's sign kernel, factored out so the error
    bound is a property-testable invariant without a SparkSession
    (tests/test_property_scalars.py), the way ``_mg_merge_batch`` pins
    the Misra-Gries retention guarantee.

    Returns the boolean sign matrix (projection >= 0) for rows ``m``
    (n x d) against planes ``P`` (q x d), GUARANTEED entry-for-entry
    equal to the sequential left fold ``((m[i,0]*P[j,0]) + m[i,1]*
    P[j,1]) + ...``: BLAS computes the projection in some arbitrary
    summation order, but any two orders of summing d products differ
    by at most ~2·d·u·Σ|mᵢPⱼᵢ| (standard floating-point summation
    error, u = 2⁻⁵³; 8·d·u used for margin) — so wherever |matmul
    projection| exceeds that bound its sign equals the fold's sign
    mathematically, and inside the bound the kernel RECOMPUTES the
    exact fold and lets its value decide."""
    import numpy as np

    m = np.ascontiguousarray(m, dtype=np.float64)
    proj = m @ P.T  # (n, q)
    # summation-order error bound: |any-order - fold| ≤ 8·d·u·Σ|terms|
    bound = (np.abs(m) @ np.abs(P.T)) * (8.0 * m.shape[1] * 2.0**-53)
    risky_rows = (np.abs(proj) <= bound).any(axis=1)
    if risky_rows.any():
        # exact per-dimension left fold for the rows holding risky
        # entries, VECTORIZED across those rows and all planes —
        # degenerate inputs (all-zero/padding embeddings make every
        # entry risky) must not fall onto a per-entry Python loop
        mr = m[risky_rows]
        acc = mr[:, 0:1] * P[None, :, 0].reshape(1, -1)
        for i in range(1, mr.shape[1]):
            acc = acc + mr[:, i : i + 1] * P[None, :, i].reshape(1, -1)
        proj[risky_rows] = acc
    return proj >= 0


def deterministic_centroids(df: DataFrame, n: int, vec_col: str = "embedding", id_col: str = "vec_id"):
    """Cheap deterministic centroid picks: the vectors whose ids hash
    lowest (a seeded reservoir stand-in for k-means — the plumbing /
    test path; use ``train_centroids`` when recall matters). Rows
    with a NULL vector carry no usable centroid and are skipped (r12,
    the advisor's query_vector NULL-embedding crash class)."""
    from ..functions import vectors as _VEC

    rows = (
        df.select(id_col, vec_col)
        .filter(_VEC.finite_vector(F.col(vec_col)))
        .withColumn("__h", F.xxhash64(F.col(id_col)))
        .orderBy("__h")
        .limit(n)
        .collect()
    )
    return [[float(x) for x in r[vec_col]] for r in rows]


def train_centroids(
    df: DataFrame,
    n: int,
    vec_col: str = "embedding",
    max_iter: int = 20,
    seed: int = 7,
):
    """Offline-trained IVF centroids via MLlib KMeans — the production
    geometry path behind the same return shape as
    ``deterministic_centroids`` (a list of dense float lists, usable
    directly by ``ivf_assign_pandas`` / ``topk_ivf``).

    KMeans is a distributed Spark job (k-means|| init, partial
    aggregation per iteration), so training scales with the corpus;
    the k×d centroid matrix that comes back is driver-small and ships
    to scorers as a broadcast constant. Recall at a given n_probe
    depends on centroid geometry — trained centroids track the data's
    actual cluster structure where hash-picked ones are arbitrary
    corpus points (recall comparison pinned in
    tests/test_vectorized_stateful.py)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    from ..functions import vectors as _VEC

    feat = df.where(_VEC.finite_vector(F.col(vec_col))).select(
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("features")
    )
    model = KMeans(k=n, maxIter=max_iter, seed=seed).fit(feat)
    return [[float(x) for x in c] for c in model.clusterCenters()]


def misra_gries_candidates(df: DataFrame, col: str, k: int) -> DataFrame:
    """Phase 1 of distributed heavy-hitters: a mergeable Misra-Gries
    summary per input partition (mapInArrow), emitting at most ``k``
    candidate items per partition.

    The summary is maintained batch-at-a-time with Arrow's C++
    ``value_counts`` directly on the incoming RecordBatch — no
    per-row Python and no Arrow→pandas materialization of the item
    strings (the pandas path measured ~1.6 s at sf0.1 on 1.5M grams,
    dominated by Series construction; the Arrow path only converts
    the ≤ distinct-per-batch (item, count) pairs to Python) — and
    compressed by the mergeable-summaries rule: when more than ``k``
    items are held, subtract the (k+1)-th largest count from every
    item and drop the non-positive ones. Standard guarantee
    (Misra-Gries / PODS'12 mergeable summaries): an item whose true
    count in the partition exceeds (partition rows)/(k+1) always
    survives, so the union of per-partition candidates is a SUPERSET
    of every item with global count > n/k — pigeonhole: such an item
    must beat the threshold in at least one partition. Phase 2
    (exact recount of candidates) then makes the final answer exact
    and deterministic regardless of which extra candidates each
    partitioning produces.

    Scale shape: the shuffle after this operator carries at most
    (partitions x k) candidate rows, NOT the item vocabulary — the
    point of the sketch when the vocabulary itself is too large to
    hash-aggregate cheaply.

    NULL items are excluded (filtered before the sketch, matching
    ``heavy_hitters_exact``'s declared semantics); the output schema
    is derived from the input column's type, so non-string item ids
    (the common bigint case) work without a cast — the yielded array
    is built with the EXPLICIT Arrow type of that column (inference
    from Python ints would always produce int64 and fail mapInArrow's
    declared-schema check for narrower int columns)."""
    import pyarrow as pa
    from pyspark.sql.pandas.types import to_arrow_type

    item_type = df.schema[col].dataType
    arrow_item = to_arrow_type(item_type)

    # Arrow batches arrive at ~10k rows; merging distinct items per
    # batch runs the Python pair loop once per batch over that batch's
    # distinct set. Buffering ~256k rows per C++ value_counts keeps
    # the loop at distinct-per-CHUNK — the same ~25× Python-loop cut
    # the grouped twin (misra_gries_candidates_by_group) already
    # documents; the mergeable-summaries algebra is indifferent to the
    # chunking (pre-counted chunks merge the same as rows). Applied to
    # the ungrouped path in the r14 optimization round.
    chunk_rows = 1 << 18

    def summarize(batches):
        counts: dict = {}

        def flush(buf):
            vc = pa.compute.value_counts(
                pa.chunked_array([b.column(0) for b in buf])
            )
            _mg_merge_pairs(
                counts,
                zip(vc.field("values").to_pylist(), vc.field("counts").to_pylist()),
                k,
            )

        buf, buffered = [], 0
        for batch in batches:
            buf.append(batch)
            buffered += batch.num_rows
            if buffered >= chunk_rows:
                flush(buf)
                buf, buffered = [], 0
        if buf:
            flush(buf)
        # yield nothing for empty summaries (equal-counts compression
        # can drop every held item): an empty python list would
        # type-infer as null and fight the declared schema
        if counts:
            yield pa.RecordBatch.from_arrays(
                [pa.array(list(counts.keys()), type=arrow_item)], names=[col]
            )

    return (
        df.select(col)
        .filter(F.col(col).isNotNull())
        .mapInArrow(summarize, schema=T.StructType([T.StructField(col, item_type)]))
    )


def _mg_merge_pairs(counts: dict, pairs, k: int) -> None:
    """Merge pre-counted (item, count) pairs into a Misra-Gries
    summary in place (mergeable-summaries compression: add the
    batch's counts, then if more than ``k`` items are held, subtract
    the (k+1)-th largest count and drop non-positive items). The
    Python loop touches only DISTINCT items per batch, never rows —
    counting itself happens upstream (Arrow value_counts /
    pandas value_counts)."""
    import heapq

    for item, c in pairs:
        counts[item] = counts.get(item, 0) + int(c)
    if len(counts) > k:
        thr = heapq.nlargest(k + 1, counts.values())[-1]
        for i, c in list(counts.items()):
            if c - thr > 0:
                counts[i] = c - thr
            else:
                del counts[i]


def _mg_merge_batch(counts: dict, items: "pd.Series", k: int) -> None:
    """Pandas-Series entry point over ``_mg_merge_pairs`` — kept as
    the Hypothesis surface (tests/test_property_scalars.py pins the
    retention guarantee through it, byte-identical compression path
    to the Arrow batches ``misra_gries_candidates`` feeds)."""
    _mg_merge_pairs(counts, items.value_counts().items(), k)


def topk_frequent_sketch(
    df: DataFrame, col: str, k: int, sketch_k: int, strict: bool = True
) -> DataFrame:
    """Top-``k`` most frequent non-null items via the two-phase
    Misra-Gries sketch + exact recount — the vocabulary-too-big path
    behind a plain ``GROUP BY item ORDER BY count`` top-k.

    Same two scans as ``heavy_hitters_exact``: per-partition mergeable
    summaries of capacity ``sketch_k`` (candidates only — at most
    partitions x sketch_k rows ever shuffle, never the vocabulary),
    then ONE masked recount whose hash aggregation yields the
    candidates' exact counts AND the exact total n. The top-k is then
    TakeOrdered over the tiny candidate frame with a (count DESC,
    item ASC) total order.

    Exactness regime: any non-candidate item has true count
    <= n/(sketch_k+1) (mergeable-summaries retention bound), so the
    returned set IS the global top-k whenever the k-th returned count
    exceeds n/(sketch_k+1). ``strict=True`` embeds that check in the
    plan (CASE + raise_error over the k-row result — lazy, one compare
    per returned row) and raises when the data leaves the provable
    regime, including the fewer-than-k-candidates case where a
    non-candidate could belong to the result; ``strict=False`` returns
    the best-effort head instead. Sizing rule: pick sketch_k so the
    expected k-th count clears n/(sketch_k+1) with margin — counts are
    integers, so when the guard passes the result is exact and the
    oracle comparison is bit-for-bit."""
    cands = misra_gries_candidates(df, col, sketch_k).distinct()
    masked = (
        df.select(col)
        .filter(F.col(col).isNotNull())
        .join(
            F.broadcast(cands.withColumn("__cand", F.lit(True))), [col], "left"
        )
        .select(F.when(F.col("__cand"), F.col(col)).alias("__k"))
    )
    grouped = masked.groupBy("__k").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    if not strict:
        return (
            grouped.filter(F.col("__k").isNotNull())
            .orderBy(F.col("cnt").desc(), F.col("__k").asc())
            .limit(k)
            .select(F.col("__k").alias(col), "cnt")
        )
    from pyspark.sql import Window as W

    item_type = df.schema[col].dataType
    msg = (
        "topk_frequent_sketch: data outside the provable regime for "
        f"sketch_k={sketch_k}, k={k} — the k-th count does not clear "
        "n/(sketch_k+1); enlarge sketch_k or pass strict=False"
    )
    # ``grouped`` is tiny (at most partitions x sketch_k candidates
    # plus the NULL mask bucket), so the ranking/guard windows below
    # run over one small partition — and the whole guard is ONE
    # lineage (the input is scanned exactly twice: sketch + recount).
    # n and the candidate count come from one window pass over the
    # WHOLE frame (null bucket included — its cnt is part of n);
    # candidates rank below-null-last so the null bucket never holds
    # a top-k rank.
    w1 = W.partitionBy(F.lit(1))
    wrank = W.partitionBy(F.lit(1)).orderBy(
        F.col("__k").isNull().asc(), F.col("cnt").desc(), F.col("__k").asc()
    )
    ranked = (
        grouped.withColumn("__n", F.sum("cnt").over(w1))
        .withColumn(
            "__cands",
            F.count(F.when(F.col("__k").isNotNull(), F.lit(1))).over(w1),
        )
        .withColumn("__rank", F.row_number().over(wrank))
        .withColumn(
            "__kth",
            F.max(
                F.when(
                    (F.col("__rank") == k) & F.col("__k").isNotNull(),
                    F.col("cnt"),
                )
            ).over(w1),
        )
    )
    # Row retention: the k best candidates — plus, when the candidate
    # set is EMPTY while the input is not (aggressive compression on
    # flat data can empty every partition summary — observed,
    # partition-layout dependent), the NULL-mask bucket row, which
    # then exists by construction (every input row was masked to it)
    # and carries the guard that a zero-row result would bypass.
    keep = ranked.filter(
        (F.col("__k").isNotNull() & (F.col("__rank") <= k))
        | (F.col("__k").isNull() & (F.col("__cands") == 0))
    )
    # Per-row guard: fires when fewer than k candidates exist or the
    # k-th count does not clear the non-candidate ceiling. CASE is
    # lazy, so in-regime data pays k compares; the projection is
    # never reordered below its filter, so the null-bucket sentinel
    # raises if and only if it was kept.
    bad = (
        F.col("__k").isNull()
        | (F.col("__cands") < F.lit(k))
        | (F.col("__kth") * F.lit(sketch_k + 1) <= F.col("__n"))
    )
    return keep.select(
        F.when(bad, F.raise_error(F.lit(msg)).cast(item_type))
        .otherwise(F.col("__k"))
        .alias(col),
        "cnt",
    )


def heavy_hitters_exact(df: DataFrame, col: str, k: int) -> DataFrame:
    """Exact heavy hitters (non-null items with count > n/k, n = the
    non-null row count) in exactly TWO scans of the input: the
    Misra-Gries candidate sketch per partition, then one masked
    recount — every row's item is mapped to itself if it is a
    candidate and to NULL otherwise (left join against the broadcast
    candidate set), so a single hash aggregation yields both the
    candidates' exact counts AND, as the sum over its at most
    (partitions x k + 1) rows, the exact total n. No third scan for
    the total, and the final threshold filter runs on the tiny
    aggregated frame. Output (item, cnt) is exact and
    partition-invariant by construction. NULL input items are
    excluded by declared semantics (filter first to include-as-a-key
    behavior if needed)."""
    cands = misra_gries_candidates(df, col, k).distinct()
    masked = (
        df.select(col)
        .filter(F.col(col).isNotNull())
        .join(
            F.broadcast(cands.withColumn("__cand", F.lit(True))), [col], "left"
        )
        .select(F.when(F.col("__cand"), F.col(col)).alias("__k"))
    )
    grouped = masked.groupBy("__k").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    tot = grouped.agg(F.sum("cnt").alias("__n"))
    return (
        grouped.filter(F.col("__k").isNotNull())
        .crossJoin(F.broadcast(tot))
        .filter(F.col("cnt") > F.col("__n") / float(k))
        .select(F.col("__k").alias(col), "cnt")
    )


def misra_gries_candidates_by_group(
    df: DataFrame, group_col: str, col: str, k: int
) -> DataFrame:
    """Phase 1 of PER-GROUP distributed heavy hitters: one mergeable
    Misra-Gries summary of capacity ``k`` per (input partition,
    group) pair, maintained batch-at-a-time with Arrow's C++
    ``group_by(...).aggregate(count_all)`` on the incoming
    RecordBatch — the Python loop touches only DISTINCT
    (group, item) pairs per batch, never rows (the same contract as
    the ungrouped ``misra_gries_candidates``).

    The retention guarantee is per group by the same pigeonhole as
    the global case: an item whose count within a group exceeds
    (that group's rows in the partition)/(k+1) survives that
    partition's summary, so the union over partitions is a superset
    of every item with group-global count > n_g/k. Emission is at
    most (groups seen in the partition) × k candidate pairs — the
    shuffle carries candidates per group, never any group's
    vocabulary. NULL items and NULL group keys are excluded by
    declared semantics."""
    import pyarrow as pa
    from pyspark.sql.pandas.types import to_arrow_type

    g_type = df.schema[group_col].dataType
    item_type = df.schema[col].dataType
    arrow_g = to_arrow_type(g_type)
    arrow_item = to_arrow_type(item_type)

    # Arrow batches arrive at ~10k rows; counting distinct pairs per
    # batch would run the Python pair loop once per batch (measured
    # ~1.1M iterations over 6M grams at sf0.1). Buffering ~256k rows
    # per C++ group_by keeps the Python loop at distinct-pairs ×
    # (rows/chunk) — a ~25× cut — and the mergeable-summaries algebra
    # is indifferent to the chunking (pre-counted chunks merge the
    # same as rows).
    chunk_rows = 1 << 18

    def summarize(batches):
        sums: dict = {}

        def flush(buf):
            counted = (
                pa.Table.from_batches(buf)
                .group_by([group_col, col])
                .aggregate([([], "count_all")])
            )
            per: dict = {}
            for g, it, c in zip(
                counted.column(group_col).to_pylist(),
                counted.column(col).to_pylist(),
                counted.column("count_all").to_pylist(),
            ):
                per.setdefault(g, []).append((it, c))
            for g, pairs in per.items():
                _mg_merge_pairs(sums.setdefault(g, {}), pairs, k)

        buf, buffered = [], 0
        for batch in batches:
            buf.append(batch)
            buffered += batch.num_rows
            if buffered >= chunk_rows:
                flush(buf)
                buf, buffered = [], 0
        if buf:
            flush(buf)
        gs, its = [], []
        for g, cs in sums.items():
            for it in cs:
                gs.append(g)
                its.append(it)
        # empty summaries yield nothing (see misra_gries_candidates);
        # arrays carry the declared Arrow types explicitly — Python
        # int inference would widen narrow int columns to int64 and
        # fail mapInArrow's schema check
        if its:
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(gs, type=arrow_g),
                    pa.array(its, type=arrow_item),
                ],
                names=[group_col, col],
            )

    return (
        df.select(group_col, col)
        .filter(F.col(col).isNotNull() & F.col(group_col).isNotNull())
        .mapInArrow(
            summarize,
            schema=T.StructType(
                [
                    T.StructField(group_col, g_type),
                    T.StructField(col, item_type),
                ]
            ),
        )
    )


def topk_frequent_by_group(
    df: DataFrame,
    group_col: str,
    col: str,
    k: int,
    sketch_k: int,
    strict: bool = True,
) -> DataFrame:
    """Top-``k`` most frequent non-null items PER GROUP via the
    two-phase Misra-Gries sketch + exact recount — the grouped twin
    of ``topk_frequent_sketch`` (per-language vocabulary heads, the
    shape a sharded training pipeline audits per shard).

    Two scans, same as the ungrouped path: per-(partition, group)
    summaries of capacity ``sketch_k``, then ONE masked recount —
    every row maps its item to itself if (group, item) is a
    candidate and to NULL otherwise, so a single (group, item) hash
    aggregation yields each candidate's exact count AND, summed per
    group, the exact per-group total n_g. Ranking and the exactness
    guard then run per group over the tiny candidate frame (windows
    partitioned by the group key — bounded state, no global
    ordering).

    Exactness regime per group: any non-candidate has true count
    ≤ n_g/(sketch_k+1), so the group's returned set IS its top-k
    whenever the k-th returned count clears that ceiling.
    ``strict=True`` embeds the per-group check in the plan (raises on
    ANY group outside the regime, including the fewer-than-k-
    candidates and emptied-summaries cases via the per-group NULL
    bucket sentinel); ``strict=False`` returns each group's
    best-effort head."""
    from pyspark.sql import Window as W

    cands = misra_gries_candidates_by_group(
        df, group_col, col, sketch_k
    ).distinct()
    masked = (
        df.select(group_col, col)
        .filter(F.col(col).isNotNull() & F.col(group_col).isNotNull())
        .join(
            F.broadcast(cands.withColumn("__cand", F.lit(True))),
            [group_col, col],
            "left",
        )
        .select(group_col, F.when(F.col("__cand"), F.col(col)).alias("__k"))
    )
    grouped = masked.groupBy(group_col, "__k").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    wrank = W.partitionBy(group_col).orderBy(
        F.col("__k").isNull().asc(), F.col("cnt").desc(), F.col("__k").asc()
    )
    if not strict:
        return (
            grouped.filter(F.col("__k").isNotNull())
            .withColumn("__rank", F.row_number().over(wrank))
            .filter(F.col("__rank") <= k)
            .select(group_col, F.col("__k").alias(col), "cnt")
        )
    item_type = df.schema[col].dataType
    msg = (
        "topk_frequent_by_group: a group is outside the provable "
        f"regime for sketch_k={sketch_k}, k={k} — its k-th count does "
        "not clear n_g/(sketch_k+1); enlarge sketch_k or pass "
        "strict=False"
    )
    w1 = W.partitionBy(group_col)
    ranked = (
        grouped.withColumn("__n", F.sum("cnt").over(w1))
        .withColumn(
            "__cands",
            F.count(F.when(F.col("__k").isNotNull(), F.lit(1))).over(w1),
        )
        .withColumn("__rank", F.row_number().over(wrank))
        .withColumn(
            "__kth",
            F.max(
                F.when(
                    (F.col("__rank") == k) & F.col("__k").isNotNull(),
                    F.col("cnt"),
                )
            ).over(w1),
        )
    )
    # per-group row retention mirrors topk_frequent_sketch: the k
    # best candidates, plus the group's NULL-mask bucket when its
    # candidate set is empty (exists by construction then) so an
    # empty group result cannot bypass the guard
    keep = ranked.filter(
        (F.col("__k").isNotNull() & (F.col("__rank") <= k))
        | (F.col("__k").isNull() & (F.col("__cands") == 0))
    )
    bad = (
        F.col("__k").isNull()
        | (F.col("__cands") < F.lit(k))
        | (F.col("__kth") * F.lit(sketch_k + 1) <= F.col("__n"))
    )
    return keep.select(
        group_col,
        F.when(bad, F.raise_error(F.lit(msg)).cast(item_type))
        .otherwise(F.col("__k"))
        .alias(col),
        "cnt",
    )

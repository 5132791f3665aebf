"""Similarity search over embedding columns (SURVEY.md §2.11;
top-k literature anchors in PAPERS.md: EDBT 2020 incremental top-k,
ICDE 2021 distributed top-k, SIGMOD 2020 adaptive similarity).

Two tiers:

- ``topk_brute``: exact scoring of every vector against the query —
  a map-side projection (no shuffle) + TakeOrderedAndProject. At
  100 TB this is one full scan but zero shuffle; per-partition heaps
  keep driver cost at O(k).
- ``topk_lsh``: random-hyperplane bucketing bounds the scored
  candidate set: score only vectors whose bucket matches the query's
  bucket (multi-probe over 1-bit flips for recall). Trades recall for
  a ~2^planes scan reduction — the scale path when the query rate is
  high enough to matter.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, functions as F

from ..functions import vectors as VEC
from ..functions.exactmath import guard_dec_units, round6_dec6_over_int
from .dedup import _deterministic_planes


def topk_brute(
    df: DataFrame,
    query: Sequence[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    metric: str = "cosine",
    pre_scoped: bool = False,
    norm_col: "str | None" = None,
) -> DataFrame:
    """Exact top-k by cosine (or dot) against a literal query vector.
    Scores are rounded to 6 decimals for cross-run determinism, with
    the id as tie-break.

    ``pre_scoped=True`` (r14 optimization round): the caller
    guarantees every input row already passed the finite-geometry
    scope — true for the LSH/IVF candidate paths, whose masking
    kernels (NULL bucket / NULL cell) excluded corrupt vectors before
    the probe filter. Skipping the redundant ``finite_geometry``
    filter here removes a second inlined dim-term fold from the
    candidate-scoring stage; with it, that stage's generated
    ``processNext()`` crossed janino's 64 KB method limit and the
    WHOLE stage (probe ``isin`` over every row + scoring) silently
    ran interpreted (ERROR CodeGenerator fallback — measured 10.8 s
    vs 1.3 s at sf0.1 on topk-similarity-lsh). Results are identical:
    the scope was already applied upstream. This is a CONTRACT, not a
    hint (r14 advisor): passing it without an upstream masking kernel
    lets NaN/Inf-component vectors reach scoring, where NaN scores
    rank differently cross-engine — the r13 bug class.

    ``norm_col`` (r15 optimization round, cosine + pre_scoped only):
    the caller already carries a per-row L2 norm computed with the
    bit-identical left fold (the fused ``bucket_norm_pandas``
    kernel), so the scoring stage keeps exactly ONE dim-unrolled fold
    (the query dot) instead of the two ``cosine_literal`` inlines —
    same ``when(norm × qn > 0)`` NULL semantics, same doubles."""
    if norm_col is not None and pre_scoped and metric == "cosine":
        import math

        qn = F.lit(math.sqrt(VEC._py_dot(query, query)))
        score = F.when(
            F.col(norm_col) * qn > 0,
            VEC.dot_literal(F.col(vec_col), query) / (F.col(norm_col) * qn),
        )
        return (
            df.select(F.col(id_col), F.round(score, 6).alias("score"))
            .orderBy(F.desc("score"), F.col(id_col))
            .limit(k)
        )
    if not pre_scoped and metric == "cosine":
        # Un-scoped cosine spelling: the r9-r14 history of this branch
        # is codegen width — the original finite_geometry +
        # cosine_literal form inlined THREE dim-term folds and crossed
        # janino's 64 KB method limit at dim 64 (the stage ran
        # interpreted, measured 8.8 s → 3.9 s once fixed); the r14 fix
        # kept ONE codegen fold (the query dot) next to a
        # norm_fold_pandas kernel + scalar filter. r15 fuses the
        # remaining fold INTO the kernel (query_cosine_flags_pandas):
        # same kernel count, one fewer per-element JVM pass, and the
        # dim-unrolled tree leaves the plan entirely. Scores are
        # bit-identical (same left folds, same (norm × qn)
        # denominator, same NULL for zero-norm rows) and the ``ok``
        # flag reproduces the old `nrm IS NOT NULL AND < inf`
        # finite-geometry exclusion exactly (NaN fold / Inf overflow —
        # both legs, the r14 advisor contract).
        from .vectorized import query_cosine_flags_pandas

        _qc = query_cosine_flags_pandas(query)
        return (
            df.where(F.col(vec_col).isNotNull())
            .select(F.col(id_col), _qc(F.col(vec_col)).alias("__cf"))
            .where(F.col("__cf").getField("ok"))
            .select(
                F.col(id_col),
                F.round(F.col("__cf").getField("score"), 6).alias("score"),
            )
            .orderBy(F.desc("score"), F.col(id_col))
            .limit(k)
        )
    score = (
        VEC.cosine_literal(F.col(vec_col), query)
        if metric == "cosine"
        else VEC.dot_literal(F.col(vec_col), query)
    )
    # finite-geometry scope (r13 non-finite components class): a NaN
    # score would rank differently under the two engines' NaN orders
    if not pre_scoped:
        df = df.where(VEC.finite_geometry(F.col(vec_col), len(query)))
    return (
        df.select(F.col(id_col), F.round(score, 6).alias("score"))
        .orderBy(F.desc("score"), F.col(id_col))
        .limit(k)
    )


def topk_lsh(
    df: DataFrame,
    query: Sequence[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes: int = 6,
) -> DataFrame:
    """Approximate top-k: prune to LSH-bucket candidates, then exact
    cosine on the survivors. Candidate buckets = query bucket plus all
    1-bit-flip probes.

    The data-side bucket is computed by the Arrow matmul bucketer
    (operators/vectorized.table_buckets_pandas), not the flat codegen
    sign fold: Catalyst pushes the probe filter through the bucket
    projection, and an IN-filter carrying two inlined copies of a
    planes×dim fold (the In check + the pushed isnotnull) overflows
    janino's 64 KB method limit — the whole stage then silently runs
    INTERPRETED (observed: ERROR CodeGenerator + fallback). Same
    lesson, same fix as the multi-table knn path. Bucket values are
    identical (same planes, same MSB bit order), so the SQL oracle is
    unchanged."""
    dim = len(query)
    hp = _deterministic_planes(planes, dim)

    def bucket_of(vec):
        return sum(
            (1 if sum(a * b for a, b in zip(p, vec)) >= 0 else 0) << (planes - 1 - i)
            for i, p in enumerate(hp)
        )

    qb = bucket_of([float(x) for x in query])
    # multi-probe to Hamming radius 2: recall on near-orthogonal
    # neighbor sets stays useful while still scanning only
    # (1 + p + p(p-1)/2) of 2^p buckets
    probe_buckets = (
        [qb]
        + [qb ^ (1 << i) for i in range(planes)]
        + [qb ^ (1 << i) ^ (1 << j) for i in range(planes) for j in range(i)]
    )
    from .vectorized import bucket_norm_pandas

    bn = bucket_norm_pandas(hp, planes, tables=1)
    cand = (
        # the masking kernel gives corrupt vectors a NULL bucket,
        # which isin() drops — the finite-geometry scope for free;
        # pre_scoped tells topk_brute NOT to re-scope (the redundant
        # second fold pushed the candidate stage past janino's 64 KB
        # method limit and the probe filter ran interpreted — r14).
        # r15: the kernel is the FUSED bucket+norm pass, and the norm
        # rides into scoring (norm_col) so the candidate stage keeps
        # one dim fold (the query dot) instead of cosine_literal's two
        # norm inlines — same doubles, same NULL semantics.
        df.where(F.col(vec_col).isNotNull())
        .withColumn("__bn", bn(F.col(vec_col)))
        .withColumn("__bucket", F.element_at(F.col("__bn").getField("bs"), 1))
        .withColumn("__nrm", F.col("__bn").getField("nrm"))
        .filter(F.col("__bucket").isin(probe_buckets))
    )
    return topk_brute(
        cand, query, k, id_col, vec_col, pre_scoped=True, norm_col="__nrm"
    )


def knn_join(
    left: DataFrame,
    right: DataFrame,
    k: int = 3,
    left_id: str = "vec_id",
    right_id: str = "vec_id",
    vec_col: str = "embedding",
    planes: "int | None" = None,
    probe_radius: int = 2,
    tables: int = 1,
    exact: bool = False,
    broadcast: "bool | None" = None,
) -> DataFrame:
    """k nearest right-vectors for every left-vector.

    Default is SCALE-SAFE: both sides are hyperplane-bucketed and only
    in-bucket pairs are scored — an equi-join on the bucket key (plain
    shuffle, no replication), with the left side exploded over its
    Hamming-radius-``probe_radius`` probe buckets for recall. Cost is
    O(pairs-sharing-a-bucket), never |L|×|R|; two 100 TB fact tables
    produce a ShuffledHash/SortMerge join, not a
    BroadcastNestedLoopJoin (asserted in tests).

    ``planes=None`` auto-sizes the bucket space to the right side
    (target ~64 rows/bucket: max(6, ceil(log2(n/64))), capped at 16) —
    in-bucket pair count scales with |L|·|R|/2^planes, so a FIXED
    plane count turns 10× growth on both sides into ~100× work
    (measured; SCALE.md).

    ``tables=L`` uses L INDEPENDENT hash tables (disjoint plane sets,
    bucket keys tagged per table in one equi-join): recall compounds
    as 1-(1-p)^L while probe count grows linearly in L — the
    beyond-1e7-rows configuration, where widening one table's probe
    radius (~p² probes) stops paying. With L>1, combine with
    ``probe_radius=0 or 1``; candidate pairs matching in several
    tables are deduplicated before scoring. Storage/shuffle on the
    right side grows ×L (the classic LSH-table trade).

    ``exact=True`` opts into the exhaustive cross score + per-left
    window — correct for query-batch-vs-corpus shapes where one side
    is bounded (the reference's search-then-rank shape). There
    ``broadcast=None`` lets AQE pick the strategy; pass
    ``broadcast=True`` only when the right side is known-small.

    Approximate recall: a left vector only sees neighbors within its
    probed buckets, so it may return fewer than ``k`` rows — the
    standard ANN trade (multi-probe LSH; PAPERS.md anchors)."""
    import math

    from pyspark.sql import Window as W

    from .joins import maybe_broadcast

    if planes is None and not exact:
        n_right = right.count()
        planes = min(16, max(6, math.ceil(math.log2(max(n_right, 1) / 64 + 1))))
    # norms computed once per vector, not once per candidate pair —
    # bit-identical score (see VEC.cosine_with_norms) — and, r15,
    # computed INSIDE the bucketer kernel (bucket_norm_pandas): the
    # vectors cross the Arrow boundary for the buckets anyway, so the
    # norm there is one extra vectorized fold over bytes already in
    # cache, where the old codegen fold re-built a dim-unrolled
    # expression tree per side per query (driver plan-size cost) and
    # paid a second element-wise pass in the JVM. Finite-geometry
    # scope (r13 non-finite components class) is branch-specific: the
    # bucketed branches inherit it from the MASKING kernel (corrupt
    # rows get a NULL bucket, which no equi-join can match — an
    # attribute-barrier form Catalyst cannot push back into a
    # duplicated fold; measured free); the exact branch, which has no
    # bucketer, gets it from the fused pair kernel's ``ok`` flag.
    # Pair scoring in the Arrow kernel (explicit left fold — the same
    # doubles as VEC.cosine_with_norms and the SQL oracles): candidate
    # volume is pairs-per-bucket × probes, and the dim-unrolled codegen
    # fold on that stage ran un-JIT'd (same finding as
    # embedding_near_dup_pairs; see pair_cosine_pandas).
    from .vectorized import pair_cosine_pandas

    _cos = pair_cosine_pandas()
    score_expr = F.round(
        _cos(F.col("l_v"), F.col("r_v"), F.col("l_nrm"), F.col("r_nrm")), 6
    )

    def _side(df_, id_in, id_out, v_out):
        return df_.where(F.col(vec_col).isNotNull()).select(
            F.col(id_in).alias(id_out), F.col(vec_col).alias(v_out)
        )

    if exact:
        # r15: ONE fused Arrow kernel instead of three (two per-side
        # norm_fold_pandas kernels + the pair cosine). The kernel
        # computes both norms next to the dot — bit-identical folds —
        # and its ``ok`` flag reproduces the old per-side
        # ``nrm IS NOT NULL AND nrm < inf`` finite-geometry exclusion
        # exactly (NaN fold → NaN, Inf fold → +Inf, both excluded;
        # legitimate zero-norm vectors stay and score NULL, the
        # oracle's CASE). Poisoned rows now reach the join before the
        # post-kernel filter drops them, but the EXCLUDED row set is
        # identical, so the result is too. Three Python round-trips
        # per run → one (guide §4.1).
        from .vectorized import pair_cosine_flags_pandas

        _cosf = pair_cosine_flags_pandas()
        le = _side(left, left_id, "l_id", "l_v")
        re = _side(right, right_id, "r_id", "r_v")
        scored = (
            le.join(maybe_broadcast(re, broadcast))
            .withColumn("__cf", _cosf(F.col("l_v"), F.col("r_v")))
            .where(F.col("__cf").getField("ok"))
            .withColumn("score", F.round(F.col("__cf").getField("score"), 6))
        )
    elif tables == 1:
        # single-table: Arrow matmul bucket (same bit order and — in
        # practice — same signs as the SQL oracle's fold; see
        # table_buckets_pandas) + multi-probe XOR flips on the
        # materialized base bucket column. NOT the codegen sign fold:
        # CollapseProject inlines a projected fold into every probe
        # expression — planes×dim×(1+p+p(p-1)/2) expression nodes ran
        # un-JIT'd (measured 13.7 s steady-state at sf0.1 for a
        # 2 000-row corpus; Arrow bucket path: see bench)
        from .vectorized import bucket_norm_pandas

        dim = VEC.infer_dim(right, vec_col)
        hp = _deterministic_planes(planes, dim)
        bn = bucket_norm_pandas(hp, planes, tables=1)
        r = (
            _side(right, right_id, "r_id", "r_v")
            .withColumn("__bn", bn(F.col("r_v")))
            .select(
                "r_id",
                "r_v",
                F.col("__bn").getField("nrm").alias("r_nrm"),
                F.element_at(F.col("__bn").getField("bs"), 1).alias("__bucket"),
            )
        )
        l = (
            _side(left, left_id, "l_id", "l_v")
            .withColumn("__bn", bn(F.col("l_v")))
            .select(
                "l_id",
                "l_v",
                F.col("__bn").getField("nrm").alias("l_nrm"),
                F.element_at(F.col("__bn").getField("bs"), 1).alias("__b0"),
            )
        )
        probes = [F.col("__b0")]
        if probe_radius >= 1:
            probes += [
                F.col("__b0").bitwiseXOR(F.lit(1 << i)) for i in range(planes)
            ]
        if probe_radius >= 2:
            probes += [
                F.col("__b0").bitwiseXOR(F.lit((1 << i) | (1 << j)))
                for i in range(planes)
                for j in range(i)
            ]
        l = (
            l.withColumn("__bucket", F.explode(F.array_distinct(F.array(*probes))))
            .drop("__b0")
        )
        # equi-join on the bucket key: each right row lives in exactly
        # one bucket and probe buckets are distinct, so a (l, r) pair
        # matches at most once — no post-join dedup needed
        scored = l.join(r, "__bucket").withColumn("score", score_expr)
    else:
        # multi-table: L·p flat sign folds in one projection overflow
        # the JIT method budget and run interpreted (measured 6×
        # slower) — compute all table buckets in one Arrow matmul
        from .vectorized import bucket_norm_pandas

        dim = VEC.infer_dim(right, vec_col)
        hp_all = _deterministic_planes(planes * tables, dim)
        bn = bucket_norm_pandas(hp_all, planes, tables)
        r = (
            _side(right, right_id, "r_id", "r_v")
            .withColumn("__bn", bn(F.col("r_v")))
            .select(
                "r_id",
                "r_v",
                F.col("__bn").getField("nrm").alias("r_nrm"),
                F.explode(F.col("__bn").getField("bs")).alias("__bucket"),
            )
        )
        l = (
            _side(left, left_id, "l_id", "l_v")
            .withColumn("__bn", bn(F.col("l_v")))
            .select(
                "l_id",
                "l_v",
                F.col("__bn").getField("nrm").alias("l_nrm"),
                F.explode(F.col("__bn").getField("bs")).alias("__tb"),
            )
        )
        probes = [F.col("__tb")]
        if probe_radius >= 1:
            # flips touch bits < planes only, so the table tag survives
            probes += [
                F.col("__tb").bitwiseXOR(F.lit(1 << i)) for i in range(planes)
            ]
        if probe_radius >= 2:
            probes += [
                F.col("__tb").bitwiseXOR(F.lit((1 << i) | (1 << j)))
                for i in range(planes)
                for j in range(i)
            ]
        l = l.withColumn(
            "__bucket", F.explode(F.array_distinct(F.array(*probes)))
        ).drop("__tb")
        # a pair can match in several tables → dedup before scoring
        cand = l.join(r, "__bucket").dropDuplicates(["l_id", "r_id"])
        scored = cand.withColumn("score", score_expr)
    w = W.partitionBy("l_id").orderBy(F.desc("score"), F.col("r_id"))
    return (
        # Explicit projection before the ranking window: the window
        # shuffles its input, and scored still carries both dim-length
        # vector columns. ColumnPruning drops them today; stating the
        # projection makes the pairs × 2 × dim × 8 B shuffle saving a
        # guarantee rather than an optimizer courtesy.
        scored.select("l_id", "r_id", "score")
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .select("l_id", "r_id", "score")
    )


def build_ann_index(
    corpus: DataFrame,
    planes: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The accepted-corpus ANN index: every corpus vector with its
    pre-computed L2 norm and single-table hyperplane bucket —
    ``(r_id, r_v, r_nrm, bucket)``. In production this is a PERSISTED
    table bucketed on ``bucket`` (the same layout discipline as the
    IVM state table and ``build_span_index``): the nightly
    ``incremental_knn`` probe then joins batch vectors against it
    WITHOUT shuffling the index — only the (small) new batch's probe
    rows move (asserted in tests/test_physical_layout.py). Append-only
    maintenance: bucket the accepted batch with the SAME planes and
    append.

    NULL vectors carry no geometry and are excluded (the r12
    NULL-embedding degrade contract — a NULL row would otherwise
    poison the Arrow bucketer batch-wide)."""
    from .vectorized import bucket_norm_pandas

    dim = VEC.infer_dim(corpus, vec_col)
    hp = _deterministic_planes(planes, dim)
    # r15: fused bucket+norm kernel — the norm used to be a
    # dim-unrolled codegen fold projected next to the bucketer; the
    # fused kernel computes it in the same Arrow pass (bit-identical
    # left fold, see bucket_norm_pandas)
    bn = bucket_norm_pandas(hp, planes, tables=1)
    out = (
        corpus.where(F.col(vec_col).isNotNull())
        .select(
            F.col(id_col).alias("r_id"),
            F.col(vec_col).alias("r_v"),
        )
        .withColumn("__bn", bn(F.col("r_v")))
        .select(
            "r_id",
            "r_v",
            F.col("__bn").getField("nrm").alias("r_nrm"),
            F.element_at(F.col("__bn").getField("bs"), 1).alias("bucket"),
        )
        # finite-geometry scope (r13): the masking kernel emits a
        # NULL bucket for corrupt vectors — excluded here so the
        # persisted index never carries them
        .where(F.col("bucket").isNotNull())
    )
    # dim tag (r14, ab_r14_ledger attribution): consumers need the
    # index dimension for the drift contract, but infer_dim over THIS
    # plan can no longer prune the bucket column (the NULL-bucket
    # filter references it), so the one-row driver job would spin up
    # the Python kernel — measured 0.95 s vs 0.13 s on a plain scan.
    # The tag rides the session-local DataFrame; a PERSISTED index
    # loses it and infer_dim falls back to the cheap plain-scan path.
    out._sg_ann_dim = dim
    return out


def _cap_buckets(ann_index: DataFrame, bucket_cap: int, k: int = 0) -> DataFrame:
    """Keep at most ``bucket_cap`` index rows per bucket with a
    DETERMINISTIC total-order election: lowest ``r_id`` first
    (NULLs last), residual ties broken by the vector hash (the
    content-dedup discipline — r_id alone leaves NULL-id rows and
    dirty-feed duplicate ids tied on partition order).

    The total order makes the cap IDEMPOTENT and APPEND-STABLE: a row
    evicted by an earlier cap ranks after every survivor in its
    bucket, so capping (capped index ∪ delta) equals capping the full
    rebuild over (corpus ∪ delta) — the append≡rebuild-under-cap
    invariant pinned in tests/test_incremental_knn.py."""
    from pyspark.sql import Window as W

    if k and bucket_cap < k:
        raise ValueError(
            f"bucket_cap={bucket_cap} < k={k}: a capped bucket could "
            f"not even fill one probe's top-k"
        )
    wb = W.partitionBy("bucket").orderBy(
        F.col("r_id").asc_nulls_last(), F.xxhash64("r_v")
    )
    return (
        ann_index.withColumn("__bc", F.row_number().over(wb))
        .filter(F.col("__bc") <= bucket_cap)
        .drop("__bc")
    )


def append_to_ann_index(
    ann_index: DataFrame,
    accepted_batch: DataFrame,
    planes: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucket_cap: "int | None" = None,
) -> DataFrame:
    """Index MAINTENANCE for the nightly-ingest loop: once a probed
    batch is accepted into the corpus, bucket it with the SAME planes
    and union it onto the index — append-only, never a rebuild (the
    ``build_span_index`` discipline lifted to vectors). In production
    this is an INSERT INTO the bucketed index table: the new rows land
    in their buckets and co-location with future probes is preserved
    by the table layout, not recomputed.

    Invariant (pinned in tests/test_incremental_knn.py): appending a
    disjoint batch is EQUIVALENT to rebuilding the index over
    corpus ∪ batch — same planes ⇒ same bucket for every vector ⇒
    identical probe results — and re-accepting the same batch is a
    no-op: EXACT duplicate index rows collapse via full-row distinct
    (deterministic by construction — collapsed rows are identical on
    every column, so there is no survivor to elect; the r12 review
    caught the earlier (r_id, bucket) key-dedup electing a
    partition-order-dependent survivor when a re-accepted id carried
    an UPDATED vector). A re-accepted id with conflicting vector
    keeps both rows — the conflicting-redelivery boundary, owned
    upstream like everywhere else (tests/test_conflicting_redelivery).

    Dimension contract: the delta must match the index's
    dimensionality — validated loudly here (the review's dim-drift
    foot-gun: mismatched dims would silently bucket with different
    planes and score truncated cosines). ``planes`` must equal the
    index's construction planes; in production both are table
    properties. The local distinct shuffles the index; the production
    form is INSERT INTO the bucketed table with the accept-once
    ledger upstream, where this collapse is a safety net, not the
    layout mechanism.

    ``bucket_cap`` (r14, VERDICT r13 #4): the skew cap is enforced
    HERE, at maintenance time — the place the incremental_knn
    docstring always said production enforces it. Pass the same cap
    the probe path uses and the maintained index keeps ≤cap rows per
    bucket with the deterministic lowest-r_id election
    (``_cap_buckets``); the probe join then never needs its own
    index-side ranking window, so the bucketed layout's
    no-index-shuffle property survives. The total order makes
    cap-on-append ≡ cap-on-rebuild exact (pinned in
    tests/test_incremental_knn.py)."""
    dim_idx = getattr(ann_index, "_sg_ann_dim", 0) or VEC.infer_dim(
        ann_index, "r_v"
    )
    dim_new = VEC.infer_dim(accepted_batch, vec_col)
    if dim_idx and dim_new and dim_idx != dim_new:
        from ..sources.catalog import SchemaContractError

        raise SchemaContractError(
            f"ann index append: batch dimension {dim_new} != index "
            f"dimension {dim_idx} — dimension is a property of the "
            f"index, fix the producer"
        )
    delta = build_ann_index(accepted_batch, planes, id_col, vec_col)
    merged = ann_index.unionByName(delta).distinct()
    if bucket_cap is not None:
        merged = _cap_buckets(merged, bucket_cap)
    merged._sg_ann_dim = dim_idx or dim_new  # propagate the dim tag
    return merged


def incremental_knn(
    new_batch: DataFrame,
    ann_index: DataFrame,
    k: int = 3,
    planes: int = 6,
    probe_radius: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucket_cap: "int | None" = None,
) -> DataFrame:
    """Vector-tier incremental twin of ``incremental_dup_spans``: k
    approximate nearest neighbors in the ACCEPTED corpus for every
    vector of a NEW ingest batch, against the persisted bucketed ANN
    index from ``build_ann_index`` → ``(l_id, r_id, score)``.

    Scale shape (the nightly-ingest discipline lifted to embeddings):
    the batch is bucketed with the same planes, exploded over its
    Hamming-radius-``probe_radius`` probe buckets, and equi-joined on
    the bucket key. With the index bucketed on ``bucket`` the join
    co-locates WITHOUT moving the index — per-ingest shuffle is
    O(batch × probes), independent of corpus size; the index side
    contributes only its scan (flat at 10× corpus, measured —
    SCALE.md). Candidate scoring reuses the Arrow pair-cosine kernel
    and the per-vector pre-computed norms; ranking shuffles only the
    (l_id, r_id, score) triple.

    Same approximate-recall trade as ``knn_join``: a batch vector only
    sees neighbors inside its probed buckets. ``planes`` must match
    the index's construction planes — in production it is a property
    of the index table, not a per-query knob. Dimensionality IS
    validated here (r12 review): the planes derive from the INDEX's
    dimension (the authoritative side), and a batch whose vectors
    drifted to a different dimension is refused loudly — silently
    bucketing 32-dim vectors with 64-dim planes and folding truncated
    cosines is the wrong-neighbor class the ingress contract exists
    to keep out.

    ``bucket_cap`` (r13 skew lever, the df_cap precedent lifted to
    vectors): bound the index rows scored per bucket. A DIRECTIONAL
    Zipf head (boilerplate embeddings — templated pages, near-empty
    docs) concentrates in one bucket, and when the BATCH is hot in
    the same direction the candidate count grows multiplicatively
    (0.3·M batch × 0.3·N bucket — fixtures/skew_ann_probe.py measures
    it). The cap keeps the survivors DETERMINISTIC (lowest ``r_id``
    per bucket — the content-dedup total-order discipline) and trades
    hot-bucket recall for bounded work; cold buckets are unaffected.
    In production the cap is enforced at index-MAINTENANCE time (the
    bucketed table keeps ≤cap rows per bucket on append), so the
    probe join still never shuffles the index; applying it here
    ranks the index per bucket — the local measurement form. The
    better lever when semantics allow it is collapsing near-dup
    vectors BEFORE indexing (the probe measures both)."""
    from pyspark.sql import Window as W

    from .vectorized import bucket_norm_pandas, pair_cosine_pandas

    dim = getattr(ann_index, "_sg_ann_dim", 0) or VEC.infer_dim(
        ann_index, "r_v"
    )
    dim_batch = VEC.infer_dim(new_batch, vec_col)
    if dim == 0:
        dim = dim_batch  # empty index: plan shape from the batch
    if dim and dim_batch and dim != dim_batch:
        from ..sources.catalog import SchemaContractError

        raise SchemaContractError(
            f"incremental knn: batch dimension {dim_batch} != index "
            f"dimension {dim} — dimension is a property of the index, "
            f"fix the producer"
        )
    if bucket_cap is not None:
        # the shared deterministic election (_cap_buckets) — in
        # production the cap is already enforced at maintenance time
        # (append_to_ann_index) and this probe-side ranking is a no-op
        # on an already-capped index (the cap is idempotent)
        ann_index = _cap_buckets(ann_index, bucket_cap, k=k)
    hp = _deterministic_planes(planes, dim)
    # r15: fused bucket+norm kernel (see bucket_norm_pandas) — the
    # batch norm rides the same Arrow pass as the bucket instead of a
    # dim-unrolled codegen fold
    bn = bucket_norm_pandas(hp, planes, tables=1)
    l = (
        new_batch.where(F.col(vec_col).isNotNull())
        .select(
            F.col(id_col).alias("l_id"),
            F.col(vec_col).alias("l_v"),
        )
        .withColumn("__bn", bn(F.col("l_v")))
        .select(
            "l_id",
            "l_v",
            F.col("__bn").getField("nrm").alias("l_nrm"),
            F.element_at(F.col("__bn").getField("bs"), 1).alias("__b0"),
        )
        # finite-geometry scope (r13): corrupt batch vectors carry a
        # NULL base bucket from the masking kernel — dropped before
        # the probe explode so they never shuffle
        .where(F.col("__b0").isNotNull())
    )
    probes = [F.col("__b0")]
    if probe_radius >= 1:
        probes += [F.col("__b0").bitwiseXOR(F.lit(1 << i)) for i in range(planes)]
    if probe_radius >= 2:
        probes += [
            F.col("__b0").bitwiseXOR(F.lit((1 << i) | (1 << j)))
            for i in range(planes)
            for j in range(i)
        ]
    l = l.withColumn(
        "bucket", F.explode(F.array_distinct(F.array(*probes)))
    ).drop("__b0")
    # each index row lives in exactly one bucket and probe buckets are
    # distinct → a (l, r) pair matches at most once, no post-join dedup
    _cos = pair_cosine_pandas()
    scored = l.join(ann_index, "bucket").withColumn(
        "score",
        F.round(_cos(F.col("l_v"), F.col("r_v"), F.col("l_nrm"), F.col("r_nrm")), 6),
    )
    w = W.partitionBy("l_id").orderBy(F.desc("score"), F.col("r_id"))
    return (
        # project before the ranking window so the shuffle never
        # carries the two dim-length vector columns (knn_join lesson)
        scored.select("l_id", "r_id", "score")
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .select("l_id", "r_id", "score")
    )


def knn_join_brute(
    left: DataFrame,
    right: DataFrame,
    k: int = 3,
    left_id: str = "vec_id",
    right_id: str = "vec_id",
    vec_col: str = "embedding",
    broadcast: "bool | None" = None,
) -> DataFrame:
    """Exhaustive k-NN join (cross score). Kept as the explicit
    bounded-side spelling of ``knn_join(exact=True)`` — use only when
    one side is a bounded query batch."""
    return knn_join(
        left,
        right,
        k,
        left_id,
        right_id,
        vec_col,
        exact=True,
        broadcast=broadcast,
    )


def bm25_topk(
    docs: DataFrame,
    query_terms: list,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 keyword retrieval: top-k documents for a bag of query
    terms — the lexical complement to embedding similarity in a
    retrieval pipeline.

    Shape: tokenize → per-(doc, term) tf + per-doc length (one
    explode + one groupBy), df per query term from the same term rows,
    idf/score as pure column math, TakeOrdered for the top k. The
    per-term document frequencies are a |query| × 1 aggregate —
    trivially broadcastable; corpus stats (N, avgdl) reduce to one
    row. No all-pairs anything: cost is O(corpus tokens) + one
    shuffle on (doc, term).

    Determinism: tf/df/dl are integers, N/avgdl derive from integers,
    and the float score is rounded to 6 decimals with an id tie-break
    — cross-engine stable (oracle-checked vs DuckDB)."""
    from ..functions import text as TX

    terms = [t.lower() for t in query_terms]
    # r15: a pre-explode spread_for_fanout was MEASURED here and
    # rejected (0.62× interleaved): the masked regroup's groups are
    # few-per-doc and heavily repeated, so round-robin spreading puts
    # every group in every partition and multiplies the partial-agg
    # shuffle rows by the core count — the opposite of the char-gram
    # keys, whose vocabulary is tiny and whose fan-out is 10× larger.
    toks = docs.select(
        F.col(id_col).alias("id"),
        F.explode(F.split(TX.normalized_text(F.col(text_col)), " ")).alias("term"),
    )
    # r14 optimization round: ONE corpus tokenize instead of two. The
    # old shape consumed `toks` twice (doc lengths + query-term tf),
    # re-running the normalize→split→explode corpus scan per consumer.
    # The masked regroup (the heavy-hitters recount idiom) folds both
    # into a single explode + single (id, masked-term) aggregation:
    # non-query terms collapse into one NULL bucket per doc, so the
    # shuffle carries ≤ |query|+1 partially-aggregated rows per doc,
    # and dl / tf / stats all derive from the pinned tiny result
    # (≤ (|query|+1) × docs rows — a staging table in production
    # terms). Counts are integers, identical by construction.
    mterm = F.when(F.col("term").isin(terms), F.col("term"))
    grouped = (
        toks.groupBy("id", mterm.alias("term"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .localCheckpoint(eager=False)
    )
    doclen = grouped.groupBy("id").agg(F.sum("cnt").cast("long").alias("dl"))
    stats = doclen.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    tf = grouped.filter(F.col("term").isNotNull()).select(
        "id", "term", F.col("cnt").alias("tf")
    )
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        tf.join(df_, ["term"])
        .join(doclen, ["id"])
        .crossJoin(stats)
        .withColumn(
            "idf",
            F.log(
                (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
            ),
        )
        .withColumn(
            "term_score",
            F.col("idf")
            * (F.col("tf") * (k1 + 1))
            / (F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))),
        )
    )
    return (
        scored.groupBy("id")
        .agg(F.round(F.sum("term_score"), 6).alias("bm25"))
        .orderBy(F.desc("bm25"), F.col("id"))
        .limit(k)
        .select(F.col("id").alias(id_col), "bm25")
    )


def tfidf_topterms(
    docs: DataFrame,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document top-k characteristic terms by tf-idf — the
    keyword-extraction face of the retrieval stack (tf and idf from
    the same tokenize→aggregate spine as ``bm25_topk``).

    Shape: one explode (map-side), one (id, term) groupBy for tf, one
    small term groupBy for df, a 1-row corpus count crossJoin, and a
    per-id window for the top-k cut. The df join is on the term
    vocabulary — heavy-tailed but bounded; AQE handles the skewed
    stop-term buckets (tf rows for a stop term are at most n_docs).

    Determinism: tf/df/n_docs are integers; the float score is rounded
    to 6 decimals BEFORE ranking with a term tie-break, so the window
    order (and therefore the emitted row set) is cross-engine stable
    — the same device the oracle-green ``bm25_topk`` uses."""
    from pyspark.sql import Window as W

    from ..functions import text as TX

    toks = docs.select(
        F.col(id_col).alias("id"),
        F.explode(F.split(TX.normalized_text(F.col(text_col)), " ")).alias("term"),
    ).filter(F.length("term") > 0)
    tf = toks.groupBy("id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    stats = toks.agg(F.countDistinct("id").alias("n_docs"))
    scored = (
        tf.join(dfreq, ["term"])
        .crossJoin(stats)
        .withColumn(
            "tfidf",
            F.round(
                F.col("tf")
                * F.log(F.col("n_docs").cast("double") / F.col("df")),
                6,
            ),
        )
    )
    w = W.partitionBy("id").orderBy(F.desc("tfidf"), F.col("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(F.col("id").alias(id_col), "term", "tfidf", "rank")
    )


def trigram_lm_score(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document cross-entropy under a char-trigram language model
    trained on the corpus itself — the classic cheap perplexity-style
    quality filter for training-data pipelines (docs whose character
    statistics diverge from the corpus — boilerplate, foreign text,
    binary junk — score high).

    Model: add-one-smoothed P(c3 | c1c2) = (count(g)+1) /
    (count(ctx)+V), with count(ctx) the corpus occurrences of the
    2-char context as a trigram prefix and V the corpus alphabet size
    (distinct third chars). Score = mean over the document's trigram
    OCCURRENCES of -ln P, i.e. its per-char cross-entropy in nats.

    Shape: trigram explode from a pre-split char array (O(1) per char
    — UTF8String.substring would be O(position), see SCALE.md), one
    groupBy for the trigram counts, a prefix re-aggregation OF THE
    COUNTS (vocabulary-sized, not corpus-sized), the model joined back
    to the per-doc gram rows on the trigram key, and one per-doc agg.
    The model table is vocabulary-bounded (≤ V^3 rows): broadcastable
    on a cluster; the in-doc sum is exact DECIMAL so the result is
    independent of partition/accumulation order (cross-engine stable
    after the 6-decimal round)."""
    from ..functions import text as TX

    from .scans import spread_for_fanout

    # char_array MUST be a projected column before char_ngrams_from:
    # an inline split inside the transform lambda re-evaluates the
    # whole normalize+split per CHARACTER (the functions/text.py
    # caveat this operator itself violated until r9 — measured 19.6 s
    # vs 0.35 s for the gram explode at sf0.01, and this stream is
    # consumed twice: model build + per-doc join).
    # r15: spread the narrow doc rows BEFORE the ~10³× gram fan-out —
    # the scan's input-byte partitioning serialized both gram scans on
    # one core locally (no-op once the scan exceeds core count).
    grams = spread_for_fanout(
        docs.select(F.col(id_col).alias("id"), F.col(text_col))
    ).select(
        "id",
        TX.char_array(TX.normalized_text(F.col(text_col))).alias("__ch"),
    ).select(
        "id",
        F.explode(TX.char_ngrams_from(F.col("__ch"), 3)).alias("g"),
    )
    # r14 optimization round: pin the trigram count table. c3 feeds
    # THREE consumers (ctx re-aggregation, the alphabet count, the
    # model join spine) and each reference otherwise re-runs the
    # whole normalize→char-split→explode corpus scan — the before
    # plan held FOUR Generate passes over documents for one query.
    # c3 is vocabulary-bounded (≤ V³ rows — ~32k at sf0.1), so the
    # pin is a tiny staging table in production terms (the _pin
    # discipline), and the corpus is now scanned exactly twice:
    # once to count, once to score — the two-scan floor this
    # operator shares with heavy-hitters.
    c3 = (
        grams.groupBy("g")
        .agg(F.count(F.lit(1)).alias("c3"))
        .localCheckpoint(eager=False)
    )
    ctx = c3.groupBy(F.substring("g", 1, 2).alias("pfx")).agg(
        F.sum("c3").alias("c2")
    )
    vocab = c3.agg(
        F.countDistinct(F.substring("g", 3, 1)).alias("v_next")
    )
    model = (
        c3.withColumn("pfx", F.substring("g", 1, 2))
        .join(ctx, ["pfx"])
        .crossJoin(vocab)
        .select(
            "g",
            (
                -F.log(
                    (F.col("c3") + F.lit(1).cast("double"))
                    / (F.col("c2") + F.col("v_next"))
                )
            ).alias("nll"),
        )
    )
    return (
        # broadcast the model DELIBERATELY (guide §3.1): it is
        # vocabulary-bounded by construction, but Catalyst cannot
        # estimate a post-aggregation size — locally it had picked the
        # reverse build side (broadcasting the EXPLODED gram stream,
        # which only "fits" because the sf0.1 file-size estimate is
        # small; at corpus scale that flips to a sort-merge join that
        # shuffles every gram occurrence by its trigram). With the
        # hint the occurrence stream never shuffles: explode → probe
        # the broadcast model → partial-agg per doc.
        # PRECONDITION (r14 advisor): the hint assumes a bounded
        # alphabet — the model is ≤ V³ rows, which for a-z0-9-space
        # corpora is ≤ 50k but for a large-alphabet corpus (CJK,
        # V ~ 10⁴) can reach 10¹² and must NOT be broadcast; such a
        # deployment drops the hint and accepts the gram shuffle (or
        # gates it on a driver-side count of the pinned c3, one cheap
        # job on an already-materialized table).
        grams.join(F.broadcast(model), ["g"])
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_trigrams"),
            F.sum(F.col("nll").cast("decimal(38,12)")).alias("s12"),
        )
        .select(
            F.col("id").alias(id_col),
            "n_trigrams",
            # r9: exact-integer rounding — the per-doc decimal(38,12)
            # sum in 1e-12 units fits int64 (|nll| <= ln(corpus) ~ 45,
            # so a 1e14-char doc would still fit), and halfaway(s12 /
            # (n*1e6)) IS the 6-decimal rounding of the mean — no
            # double division before the round, so the only remaining
            # cross-engine surface is the 1e-12 quantization of each
            # engine's ln(), whose distance from any rounding cut the
            # boundary-margin test measures in exact integers
            # (tests/test_round_boundary_margin.py).
            round6_dec6_over_int(
                guard_dec_units("s12", 10**12, "n_trigrams * 1000000"),
                "n_trigrams * 1000000",
            ).alias("xent_nats"),
        )
    )

"""Vector math over ``array<float>`` embedding columns, computed in
double precision as FLAT dimension-unrolled expressions.

Why flat and not higher-order functions: stacking several
``F.aggregate``/``F.zip_with`` lambdas inside one projection was
observed to be NONDETERMINISTIC on Spark 4.1 local[N] (lambda-variable
state shared across identically-named lambda params); flat
element_at chains are plain codegen'd arithmetic — deterministic,
branch-free, and faster (no per-element function-call overhead).

Summation order is a strict left fold (t0 + t1 + ...), bit-identical
to DuckDB's ``list_sum(list_transform(...))`` over the same data —
which is what makes the similarity operators oracle-checkable.

Scale: these are map-side projections — no shuffle; the embedding
dimension is fixed per table, so unrolling is bounded (d ≤ a few
thousand). For very high-d vectors swap in a pandas_udf with numpy
behind the same signatures.
"""

from __future__ import annotations

from functools import reduce
from typing import Sequence, Union

from pyspark.sql import Column, DataFrame, functions as F

ColumnOrName = Union[Column, str]


def _c(col: ColumnOrName) -> Column:
    return F.col(col) if isinstance(col, str) else col


def _sum_terms(terms: Sequence[Column]) -> Column:
    """Left-fold sum — fixed order for bit determinism. Zero terms
    (an empty vector table makes infer_dim 0) folds to literal 0.0 so
    the dot/bucket expressions stay well-formed and an empty input
    flows through to an empty output instead of a driver-side
    TypeError (r11 empty-input probe)."""
    if not terms:
        return F.lit(0.0)
    return reduce(lambda a, b: a + b, terms)


def finite_vector(col: ColumnOrName) -> Column:
    """True iff the vector is non-NULL and every component is a
    non-NULL finite float — the vector-tier scope of the non-finite
    poison class (r13 probe: NaN/Inf COMPONENTS, which the r11
    scalar arms never planted, split the engines — DuckDB's decimal
    cast raises on a NaN component where Spark's silently NULLs it
    out of a centroid sum, and NaN cosine scores rank differently
    under the two engines' NaN orderings). A vector with a corrupt
    component carries no usable geometry, so it is excluded from the
    vector universe at every operator boundary — the NULL-vector
    degrade contract extended to non-finite.

    This forall() form is exact but runs the lambda INTERPRETED per
    element — measured +11-47% on the hot similarity keys. Use it on
    COLD paths only (driver-side seed/centroid collection); hot
    operators scope with ``finite_geometry`` below, whose SQL twin is
    ``FINITE_VEC_SQL``.

    Length-0 vectors are OUT of scope (r14, advisor): ``F.forall``
    over an empty array is vacuously true, but an empty embedding
    carries no geometry and ``FINITE_VEC_SQL`` already requires
    ``len(c) > 0`` — the size leg makes the engine scope match the
    declared SQL twin exactly."""
    c = _c(col)
    return (
        c.isNotNull()
        & (F.size(c) > 0)
        & F.forall(
            c,
            lambda x: x.isNotNull()
            & ~F.isnan(x)
            & (F.abs(x) < F.lit(float("inf"))),
        )
    )


def finite_geometry(col: ColumnOrName, dim: int) -> Column:
    """The HOT-path finite scope: the vector's self-dot over the
    table's ``dim`` is a finite double. Pure flat codegen — the SAME
    fold the norms/scores already compute, so Catalyst's
    subexpression elimination makes it ~free where a norm column
    exists, and it never leaves whole-stage codegen. Equivalent to
    ``finite_vector`` on contract-conforming data (uniform ``dim``,
    the ingress rule): a NULL vector or NULL component NULLs the left
    fold (excluded), NaN/±Inf components make it non-finite
    (excluded), and a too-short vector hits an out-of-range
    element_at → NULL (excluded). The one deliberate difference:
    components BEYOND ``dim`` are invisible — out of contract by the
    dimension rule, refused loudly at every index boundary. SQL twin:
    ``FINITE_VEC_SQL`` (with an explicit NULL-component leg, because
    DuckDB's list_sum skips NULLs where the engine fold propagates
    them)."""
    d = dot(col, col, dim)
    return ~F.isnan(d) & (F.abs(d) < F.lit(float("inf")))


def finite_norm(norm_col: ColumnOrName) -> Column:
    """The zero-cost form of the finite-geometry scope for operators
    that ALREADY project a per-vector norm column: a corrupt component
    makes the norm NaN (NaN fold), ±Inf (overflow), or NULL (NULL
    component propagates the left fold) — one scalar comparison on the
    computed column, placed ABOVE the projection so CollapseProject
    cannot duplicate a 64-term fold into the filter (measured: an
    input-side finite_geometry filter re-inlined the fold and ran the
    bucketed knn paths 1.8-2.3× slower; this form is free)."""
    c = _c(norm_col)
    return ~F.isnan(c) & (c < F.lit(float("inf")))


# The DuckDB twin of ``finite_vector`` lives in sqlfrags (the leaf
# oracle-fragment module); re-exported here so engine-side callers
# find scope + twin in one place.
from ..sqlfrags import FINITE_VEC_SQL  # noqa: E402


def infer_dim(df: DataFrame, vec_col: str = "embedding") -> int:
    """Embedding dimensionality from the first NON-NULL row (fixed per
    table). NULL vectors carry no dimension and are skipped (r12 — the
    advisor's NULL-embedding crash class: ``size(NULL)`` is NULL and
    the int() cast threw); an all-NULL column infers 0 like an empty
    table."""
    row = (
        df.where(F.col(vec_col).isNotNull())
        .select(F.size(F.col(vec_col)).alias("d"))
        .first()
    )
    return int(row["d"]) if row else 0


def query_vector(
    df: DataFrame, vec_id: int = 0, vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> "tuple[list, bool]":
    """The driver-side seed vector for similarity queries →
    ``(vector, found)``, with the r11 empty-input contract: when the
    seed row is absent (empty table, filtered-out id) the caller
    builds its NORMAL plan around the returned all-zeros stand-in
    (dimension inferred; 1 on a fully empty table) and fences the
    result with ``.where(F.lit(False))`` — a schema-correct EMPTY
    frame, matching the SQL oracle's empty-correlated-subquery
    semantics, instead of the NoneType crash the probe caught.

    A present seed row whose embedding is NULL is the same contract
    (r12, advisor finding): it carries no usable query vector, so it
    degrades to the stand-in with ``found=False`` — matching the SQL
    side, where a NULL embedding NULLs every score and the top-k over
    NULL scores is as empty as a missing seed — rather than crashing
    with an opaque ``TypeError: 'NoneType' is not iterable``.

    A seed with NULL or non-finite COMPONENTS (r13, the vector-tier
    non-finite class) is the same degrade: a NaN/Inf component makes
    every score NaN, which the two engines rank differently — the
    seed CTEs scope to ``FINITE_VEC_SQL``, and so does this. A
    LENGTH-0 (non-NULL) seed embedding is the same degrade too (r14,
    advisor: Python's ``all()`` over an empty list is vacuously true,
    but ``FINITE_VEC_SQL`` requires ``len(c) > 0`` — an empty seed
    carries no geometry and the oracle's seed CTE excludes it)."""
    import math

    row = df.filter(F.col(id_col) == vec_id).select(vec_col).first()
    if (
        row is not None
        and row[vec_col] is not None
        and len(row[vec_col]) > 0
        and all(x is not None and math.isfinite(x) for x in row[vec_col])
    ):
        return [float(x) for x in row[vec_col]], True
    return [0.0] * (infer_dim(df, vec_col) or 1), False


def dot(a: ColumnOrName, b: ColumnOrName, dim: int) -> Column:
    """Dot product of two array columns, unrolled over ``dim``."""
    ac, bc = _c(a), _c(b)
    return _sum_terms(
        [
            F.element_at(ac, F.lit(i + 1)).cast("double")
            * F.element_at(bc, F.lit(i + 1)).cast("double")
            for i in range(dim)
        ]
    )


def dot_literal(a: ColumnOrName, q: Sequence[float]) -> Column:
    """Dot product against a fixed query vector (constants folded into
    codegen — no join, no array literal materialization)."""
    ac = _c(a)
    return _sum_terms(
        [
            F.element_at(ac, F.lit(i + 1)).cast("double") * F.lit(float(q[i]))
            for i in range(len(q))
        ]
    )


def l2_norm(a: ColumnOrName, dim: int) -> Column:
    return F.sqrt(dot(a, a, dim))


def cosine(a: ColumnOrName, b: ColumnOrName, dim: int) -> Column:
    """Cosine similarity; NULL when either norm is zero."""
    num = dot(a, b, dim)
    den = l2_norm(a, dim) * l2_norm(b, dim)
    return F.when(den > 0, num / den)


def cosine_with_norms(
    a: ColumnOrName, b: ColumnOrName, na: ColumnOrName, nb: ColumnOrName, dim: int
) -> Column:
    """Cosine from PRE-COMPUTED per-vector norms — for candidate-pair
    scoring after a join, where ``cosine`` would recompute both norms
    (2·dim multiply-adds + a sqrt) once per pair instead of once per
    vector. Bit-identical to ``cosine``: the norm of a vector is the
    same double whether computed before or after the join, and the
    num/den expression is unchanged."""
    den = _c(na) * _c(nb)
    return F.when(den > 0, dot(a, b, dim) / den)


def cosine_literal(a: ColumnOrName, q: Sequence[float]) -> Column:
    import math

    qn = math.sqrt(_py_dot(q, q))
    den = l2_norm(a, len(q)) * F.lit(qn)
    return F.when(den > 0, dot_literal(a, q) / den)


def _py_dot(x: Sequence[float], y: Sequence[float]) -> float:
    """Driver-side strict left-fold dot (same order as the SQL side)."""
    acc = 0.0
    for a, b in zip(x, y):
        acc += float(a) * float(b)
    return acc


def random_hyperplane_signs(
    a: ColumnOrName, planes: Sequence[Sequence[float]]
) -> Column:
    """Sign bits of projections onto fixed hyperplanes → an int bucket
    id (SimHash/LSH family). ``planes`` are deterministic constants
    chosen by the caller; output is a LongType bucket usable as a
    shuffle/group key."""
    bits = [F.when(dot_literal(a, p) >= 0, F.lit(1)).otherwise(F.lit(0)) for p in planes]
    acc = F.lit(0).cast("long")
    for b in bits:
        acc = acc * F.lit(2) + b.cast("long")
    return acc

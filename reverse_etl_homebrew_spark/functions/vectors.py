"""Vector math over ``array<float>`` embedding columns — pure Column
expressions (higher-order functions), computed in double precision.

The left-fold ``F.aggregate`` accumulates strictly left-to-right, so
results are bit-deterministic and reproducible across runs and
engines; DuckDB's ``list_sum(list_transform(...))`` over the same
float data produces bit-identical doubles, which is what makes the
similarity operators oracle-checkable.

For the 100 TB path, brute-force scoring is embarrassingly parallel
(no shuffle: a map-side projection + a top-k TakeOrdered), and the
LSH-bucketed variant in operators/similarity.py bounds the candidate
set before scoring.
"""

from __future__ import annotations

from typing import Sequence, Union

from pyspark.sql import Column, functions as F

ColumnOrName = Union[Column, str]


def _c(col: ColumnOrName) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot(a: ColumnOrName, b: ColumnOrName) -> Column:
    """Dot product of two array<float|double> columns, in double."""
    return F.aggregate(
        F.zip_with(_c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def dot_literal(a: ColumnOrName, q: Sequence[float]) -> Column:
    """Dot product against a fixed query vector (broadcast as an array
    literal — stays entirely inside codegen, no join needed)."""
    qcol = F.array(*[F.lit(float(x)) for x in q])
    return F.aggregate(
        F.zip_with(_c(a), qcol, lambda x, y: x.cast("double") * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: ColumnOrName) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: ColumnOrName, b: ColumnOrName) -> Column:
    """Cosine similarity; NULL when either norm is zero."""
    num = dot(a, b)
    den = l2_norm(a) * l2_norm(b)
    return F.when(den > 0, num / den)


def cosine_literal(a: ColumnOrName, q: Sequence[float]) -> Column:
    import math

    qn = math.sqrt(sum(float(x) * float(x) for x in q))
    den = l2_norm(a) * F.lit(qn)
    return F.when(den > 0, dot_literal(a, q) / den)


def random_hyperplane_signs(a: ColumnOrName, planes: Sequence[Sequence[float]]) -> Column:
    """Sign bits of projections onto fixed hyperplanes → an int bucket
    id (SimHash/LSH family). ``planes`` are deterministic constants
    chosen by the caller; output is a LongType bucket usable as a
    shuffle/group key."""
    bits = [F.when(dot_literal(a, p) >= 0, F.lit(1)).otherwise(F.lit(0)) for p in planes]
    acc = F.lit(0).cast("long")
    for b in bits:
        acc = acc * F.lit(2) + b.cast("long")
    return acc

"""Empty-input robustness gate (r11 probe, fourth poison class after
NULL values, NULL keys, and re-delivery): a fully-empty table — a
filtered-out partition, a fresh ingest, a bad upstream — must flow
through to a schema-correct EMPTY result, never an obscure
driver-side crash.

The probe found 12 vector-tier keys dying on ``.first()``-seeded
query vectors, empty centroid collections, and zero-term fold
expressions (``TypeError: 'NoneType' object is not subscriptable``,
``reduce() of empty iterable``). The contract now: the plan builds
around a zero-vector stand-in and is fenced with ``lit(False)`` when
the seed is absent (functions/vectors.query_vector), zero-term folds
collapse to literal 0.0 (``_sum_terms``), and seedless k-means
short-circuits — all matching the SQL oracle's
empty-correlated-subquery semantics. hybrid-rrf empties only its
VECTOR leg: lexical retrieval still fuses.

One DOCUMENTED engine boundary remains, pinned below so a Spark
behavior change gets noticed: Spark's cube()/rollup() omit the
SQL-standard grand-total grouping set on EMPTY input (SQL emits one
() row with COUNT 0 / NULL sums; Spark emits nothing). It manifests
only on fully-empty input — any non-empty input carries the total
row — and fixing it would mean wrapping a Catalyst built-in for a
case real pipelines guard upstream.
"""

from __future__ import annotations

import os
import tempfile

import duckdb
import pytest

from reverse_etl_homebrew_spark import queries as Q

from test_oracle_parity import _duck, _rowset

SF_DIR = "/root/testdata/sf0.001"

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

# the 12 formerly-crashing keys plus empty-flow representatives from
# each operator family
KEYS = [
    "topk-similarity", "topk-similarity-lsh", "topk-similarity-pandas",
    "topk-similarity-ivf", "hybrid-rrf",
    "knn-join", "knn-join-tables", "knn-join-lsh",
    "similarity-join", "embedding-near-dup",
    "kmeans-assign", "kmeans-iterate",
    "groupby-agg", "window-rank", "fuzzy-dedup", "dup-span-rate",
    "incremental-dup-spans", "incremental-knn", "patient-sync-pipeline",
    "heavy-hitters", "ngram-topk-sketch",
    # late-r12 keys: empty corpus/facts must yield schema-correct
    # empty results through the chunker, the set-digest diff, both
    # decontaminate forms, the two-phase rank selection (no bins to
    # locate), and the full composite chain
    "chunk-documents", "corpus-diff", "decontaminate-bloom",
    "quantiles-twophase", "corpus-prep-pipeline",
    # r13: the incremental refresh composite — an empty snapshot pair
    # must flow through diff → admission → probes → subtractive stats
    # to a schema-correct empty report
    "corpus-refresh-pipeline",
    # r14: the chunk → pack composite — an empty corpus must yield a
    # schema-correct empty packing (the window over zero rows)
    "pack-chunks",
]


@pytest.fixture(scope="module")
def empty_dir():
    out = tempfile.mkdtemp(prefix="sg-empty-gate-")
    con = duckdb.connect()
    for t in TABLES:
        src = os.path.join(SF_DIR, f"{t}.parquet")
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{src}') LIMIT 0) "
            f"TO '{os.path.join(out, t + '.parquet')}' (FORMAT PARQUET)"
        )
    con.close()
    return out


@pytest.fixture(scope="module")
def duck(empty_dir):
    return _duck(empty_dir)


@pytest.mark.parametrize("name", KEYS)
def test_empty_input_parity(spark, name, duck, empty_dir):
    sdf = Q.QUERIES[name](spark, empty_dir)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]
    cur = duck.execute(Q.ORACLE[name])
    d_cols = [c[0] for c in cur.description]
    d_rows = cur.fetchall()
    assert sorted(s_cols) == sorted(d_cols)
    assert _rowset(s_cols, s_rows) == _rowset(d_cols, d_rows)


def test_cube_rollup_empty_grand_total_boundary(spark, duck, empty_dir):
    """The documented divergence, pinned in both directions: SQL emits
    exactly the one grand-total row on empty input; Spark's
    cube()/rollup() emit nothing. If either side changes, re-open the
    policy decision in this module's docstring."""
    for key in ("cube-agg", "rollup-agg"):
        assert Q.QUERIES[key](spark, empty_dir).count() == 0, key
        assert len(duck.execute(Q.ORACLE[key]).fetchall()) == 1, key

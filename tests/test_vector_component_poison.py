"""Vector-COMPONENT poison gate (r13 — the r11 non-finite class's
missing arm): the scalar arms planted NaN/Inf in events.value and
orders.o_totalprice, but never INSIDE embedding vectors. First run
found the engines splitting exactly as the scalar class predicted:

- embedding-centroid hit the silent-vs-loud decimal split (DuckDB's
  CAST(NaN AS DECIMAL) raises; Spark's silently NULLs the component
  out of the class mean — a silent wrong answer);
- every similarity surface MISMATCHed: NaN cosine scores rank
  differently under the two engines' NaN orderings, and poisoned
  vectors polluted LSH buckets/candidates asymmetrically;
- array-ops diverged on the NULL-component lane (Spark array_min/max
  skip NULLs; the oracle's list_sort kept them).

Policy (the NULL-vector degrade contract extended): a vector with a
NULL or non-finite COMPONENT carries no usable geometry and is
excluded from the vector universe at every operator boundary —
``functions/vectors.finite_vector`` engine-side, ``FINITE_VEC_SQL``
oracle-side, two-sided like every poison class. The Arrow kernels
keep a LOUD backstop (SchemaContractError) for direct API use that
bypasses operator boundaries. Pure array SURFACES (array-ops,
explode) are not geometry — they pass the poison through, with
oracle expressions chosen to match Spark's array semantics exactly.

Three poison lanes planted per run: a NaN component (vec_id % 37),
an Infinity component (% 41), a NULL component (% 43).
"""

from __future__ import annotations

import math
import os
import shutil
import tempfile

import duckdb
import pytest

from pyspark.sql import functions as F

from reverse_etl_homebrew_spark import queries as Q
from reverse_etl_homebrew_spark.functions import vectors as VEC

from test_oracle_parity import _duck, _rowset

SF_DIR = "/root/testdata/sf0.001"

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

# every registered key that reads the embeddings table
KEYS = [
    # geometry tier — excluded-vector semantics
    "topk-similarity", "topk-similarity-pandas", "topk-similarity-lsh",
    "topk-similarity-ivf", "knn-join", "knn-join-tables", "knn-join-lsh",
    "similarity-join", "embedding-near-dup", "embedding-centroid",
    "kmeans-assign", "kmeans-iterate", "incremental-knn", "hybrid-rrf",
    "corpus-refresh-pipeline",
    # array surfaces — poison passes through, engines must agree on it
    "array-ops", "explode-posexplode", "multimodal-cols",
]


@pytest.fixture(scope="module")
def poisoned_dir():
    out = tempfile.mkdtemp(prefix="sg-veccomp-")
    con = duckdb.connect()
    for t in TABLES:
        src = os.path.join(SF_DIR, f"{t}.parquet")
        dst = os.path.join(out, f"{t}.parquet")
        if t == "embeddings":
            con.execute(
                f"""
                COPY (
                  SELECT vec_id,
                         CASE
                           WHEN vec_id % 37 = 0 THEN list_transform(
                             embedding, (x, i) ->
                             CASE WHEN i = 1 THEN 'NaN'::FLOAT ELSE x END)
                           WHEN vec_id % 41 = 0 THEN list_transform(
                             embedding, (x, i) ->
                             CASE WHEN i = 2 THEN 'Infinity'::FLOAT ELSE x END)
                           WHEN vec_id % 43 = 0 THEN list_transform(
                             embedding, (x, i) ->
                             CASE WHEN i = 3 THEN NULL ELSE x END)
                           ELSE embedding
                         END AS embedding,
                         label
                  FROM read_parquet('{src}')
                ) TO '{dst}' (FORMAT PARQUET)
                """
            )
        else:
            shutil.copyfile(src, dst)
    con.close()
    return out


@pytest.fixture(scope="module")
def duck(poisoned_dir):
    return _duck(poisoned_dir)


@pytest.mark.parametrize("name", KEYS)
def test_component_poison_parity(spark, name, duck, poisoned_dir):
    sdf = Q.QUERIES[name](spark, poisoned_dir)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]
    cur = duck.execute(Q.ORACLE[name])
    d_cols = [c[0] for c in cur.description]
    d_rows = cur.fetchall()
    assert sorted(s_cols) == sorted(d_cols)
    assert _rowset(s_cols, s_rows) == _rowset(d_cols, d_rows)


def test_poison_is_nonvacuous(spark, poisoned_dir):
    """The poisoned universe must actually shrink: excluded vectors
    exist, and the geometry keys run on strictly fewer vectors."""
    from reverse_etl_homebrew_spark.sources.catalog import load_table

    e = load_table(spark, poisoned_dir, "embeddings")
    n_total = e.count()
    n_finite = e.where(VEC.finite_vector(F.col("embedding"))).count()
    assert 0 < n_finite < n_total


def test_finite_vector_truth_table(spark):
    rows = [
        (1, [1.0, 2.0]),
        (2, [float("nan"), 1.0]),
        (3, [float("inf"), 1.0]),
        (4, [float("-inf"), 1.0]),
        (5, [None, 1.0]),
        (6, None),
        (7, []),
    ]
    df = spark.createDataFrame(rows, "id int, v array<double>")
    got = {
        r["id"]: r["ok"]
        for r in df.select(
            "id", VEC.finite_vector(F.col("v")).alias("ok")
        ).collect()
    }
    # an empty array has no offending component — vacuously finite
    # (and no geometry either: dim-0 operators fence via infer_dim)
    assert got == {1: True, 2: False, 3: False, 4: False, 5: False,
                   6: False, 7: True}


def test_kernel_guard_is_loud_on_nonfinite(spark):
    from reverse_etl_homebrew_spark.operators.vectorized import (
        pair_cosine_pandas,
    )
    from reverse_etl_homebrew_spark.sources.catalog import SchemaContractError

    df = spark.createDataFrame(
        [([float("nan"), 1.0], [1.0, 1.0], 1.0, 1.4142)],
        "a array<double>, b array<double>, na double, nb double",
    )
    cos = pair_cosine_pandas()
    with pytest.raises(Exception) as ei:
        df.select(cos("a", "b", "na", "nb")).collect()
    assert "non-finite" in str(ei.value)


def test_query_vector_degrades_on_nonfinite_seed(spark):
    df = spark.createDataFrame(
        [(0, [float("nan"), 1.0]), (1, [1.0, 2.0])],
        "vec_id int, embedding array<double>",
    )
    vec, found = VEC.query_vector(df, vec_id=0)
    assert not found
    assert all(x == 0.0 for x in vec)
    vec1, found1 = VEC.query_vector(df, vec_id=1)
    assert found1 and math.isfinite(sum(vec1))

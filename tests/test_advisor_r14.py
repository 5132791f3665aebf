"""Pins for the round-13 advisor findings (ADVICE.md round 13).

1. (medium) Exact knn_join branch: an Inf-COMPONENT vector's norm
   folds to +Inf — not NaN, so not NULL at the Arrow boundary — and
   survived the exact branch's isNotNull-only filter, joining with
   NULL cosine scores that enter the top-k whenever a left row has
   fewer than k finite candidates. Both legs of the finite-norm scope
   now run on both sides (`norm IS NOT NULL AND norm < inf`), so the
   engine matches the oracle's FINITE_VEC_SQL exclusion exactly.

2. (low) ``finite_vector`` admitted a length-0 (non-NULL) vector —
   F.forall over an empty array is vacuously true — while its
   declared SQL twin FINITE_VEC_SQL requires ``len(c) > 0``. Same for
   ``query_vector``'s driver-side ``all()`` check. Both now exclude
   the empty vector, matching the oracle scope.

3. (low) ``corpus_refresh_report``: a lang whose EVERY doc was
   retired folded to an n=0 state row; the oracle recomputes stats
   from the refreshed corpus, where that lang has no rows. The merged
   state is now filtered to ``n > 0`` before report assembly.

4. (low) ``ivf_assign_pandas`` masked corrupt rows by assigning None
   into an int32 Series (silent dtype upcast — FutureWarning in
   pandas 2.x, TypeError in 3.0). The nullable result is now built
   explicitly as an object Series.
"""

from __future__ import annotations

import math
import os
import shutil
import tempfile

import duckdb
import pytest

from pyspark.sql import Row, functions as F

from reverse_etl_homebrew_spark import queries as Q
from reverse_etl_homebrew_spark.functions import vectors as VEC
from reverse_etl_homebrew_spark.operators.similarity import knn_join

from test_oracle_parity import _duck, _rowset

SF_DIR = "/root/testdata/sf0.001"

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


# ---------------------------------------------------------------------------
# 1. exact knn_join excludes Inf-component vectors (both sides)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def inf_component_dir():
    """vec_id 12's embedding has its first component replaced by +Inf
    (norm overflows to +Inf without ever passing through NaN — the
    exact case the NaN→NULL Arrow mapping does not catch). vec_id 12
    sits inside the registered knn-join's left batch (vec_id < 20) AND
    in its right corpus, so the fix is exercised on both legs."""
    out = tempfile.mkdtemp(prefix="sg-infcomp-")
    con = duckdb.connect()
    for t in TABLES:
        src = os.path.join(SF_DIR, f"{t}.parquet")
        dst = os.path.join(out, f"{t}.parquet")
        if t == "embeddings":
            con.execute(
                f"""COPY (
                  SELECT vec_id,
                         CASE WHEN vec_id = 12
                              THEN ['infinity'::FLOAT] || embedding[2:]
                              ELSE embedding END AS embedding,
                         label
                  FROM read_parquet('{src}')
                ) TO '{dst}' (FORMAT PARQUET)"""
            )
        else:
            shutil.copyfile(src, dst)
    con.close()
    return out


def test_exact_knn_join_excludes_inf_component_two_sided(
    spark, inf_component_dir
):
    sdf = Q.QUERIES["knn-join"](spark, inf_component_dir)
    cols = sdf.columns
    s = _rowset(cols, [tuple(r) for r in sdf.collect()])
    duck = _duck(inf_component_dir)
    cur = duck.execute(Q.ORACLE["knn-join"])
    d = _rowset([c[0] for c in cur.description], cur.fetchall())
    assert s == d
    # the poisoned vector appears on NEITHER side of any pair, and no
    # NULL score sneaks into a top-k
    sc = sorted(cols)
    li, ri, si = sc.index("l_id"), sc.index("r_id"), sc.index("score")
    assert s, "healthy vectors must still join"
    assert all(row[li] != ("i", 12) and row[ri] != ("i", 12) for row in s)
    assert all(row[si] != ("n",) for row in s)


def test_exact_knn_join_inf_candidate_never_pads_a_short_topk(spark):
    """The advisor's precise failure shape: a left row with FEWER than
    k finite candidates must return only the finite ones — never an
    Inf-component candidate with a NULL score as padding."""
    left = spark.createDataFrame(
        [Row(vec_id=0, embedding=[1.0, 0.0])]
    )
    right = spark.createDataFrame(
        [
            Row(vec_id=10, embedding=[1.0, 0.0]),
            Row(vec_id=11, embedding=[0.0, 1.0]),
            Row(vec_id=12, embedding=[float("inf"), 0.0]),
        ]
    )
    rows = knn_join(left, right, k=3, exact=True).collect()
    assert sorted(r["r_id"] for r in rows) == [10, 11]
    assert all(r["r_id"] != 12 for r in rows)
    # and an Inf-component LEFT row vanishes rather than emitting a
    # k-row block of NULL scores
    left_inf = spark.createDataFrame(
        [Row(vec_id=0, embedding=[float("inf"), 0.0])]
    )
    assert knn_join(left_inf, right, k=3, exact=True).count() == 0


# ---------------------------------------------------------------------------
# 2. finite_vector / query_vector exclude the length-0 vector
# ---------------------------------------------------------------------------

def test_finite_vector_matches_sql_twin_on_empty_vector(spark):
    rows = [
        Row(vec_id=0, embedding=[1.0, 2.0]),          # healthy
        Row(vec_id=1, embedding=[]),                   # empty, non-NULL
        Row(vec_id=2, embedding=None),                 # NULL vector
        Row(vec_id=3, embedding=[float("nan"), 1.0]),  # NaN component
        Row(vec_id=4, embedding=[float("inf"), 1.0]),  # Inf component
        Row(vec_id=5, embedding=[None, 1.0]),          # NULL component
    ]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    kept = sorted(
        r["vec_id"]
        for r in df.where(VEC.finite_vector(F.col("embedding"))).collect()
    )
    assert kept == [0]
    # byte-for-byte the same scope as the declared SQL twin
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE v AS SELECT * FROM (VALUES "
        "(0, [1.0, 2.0]), "
        "(1, []::DOUBLE[]), "
        "(2, NULL), "
        "(3, ['nan'::DOUBLE, 1.0]), "
        "(4, ['infinity'::DOUBLE, 1.0]), "
        "(5, [NULL::DOUBLE, 1.0])"
        ") t(vec_id, embedding)"
    )
    want = [
        r[0]
        for r in con.execute(
            "SELECT vec_id FROM v WHERE "
            + VEC.FINITE_VEC_SQL.format(c="embedding")
            + " ORDER BY vec_id"
        ).fetchall()
    ]
    con.close()
    assert kept == want


def test_query_vector_degrades_on_empty_seed_embedding(spark):
    df = spark.createDataFrame(
        [Row(vec_id=0, embedding=[]), Row(vec_id=1, embedding=[3.0, 4.0])],
        "vec_id int, embedding array<double>",
    )
    vec, found = VEC.query_vector(df)
    assert not found
    # stand-in carries the table's inferred dimension, all zeros
    assert vec and all(x == 0.0 for x in vec)


# ---------------------------------------------------------------------------
# 3. fully-retired lang vanishes from the refresh report
# ---------------------------------------------------------------------------

def test_fully_retired_lang_produces_no_report_row(spark):
    from reverse_etl_homebrew_spark.operators.refresh import (
        corpus_refresh_report,
    )

    old = spark.createDataFrame(
        [
            Row(doc_id=1, text="alpha beta gamma", lang="aa"),
            Row(doc_id=2, text="delta epsilon", lang="aa"),
            Row(doc_id=3, text="zeta eta theta", lang="bb"),
            Row(doc_id=4, text="iota kappa", lang="bb"),
        ]
    )
    # new snapshot retires EVERY 'aa' doc and keeps 'bb' intact
    new = old.where(F.col("lang") != "aa")
    vecs = spark.createDataFrame(
        [Row(vec_id=3, embedding=[1.0, 0.0]), Row(vec_id=4, embedding=[0.0, 1.0])]
    )
    rep = {r["lang"]: r.asDict() for r in
           corpus_refresh_report(old, new, vecs).collect()}
    assert set(rep) == {"bb"}, (
        "a fully-retired lang must not survive as an n=0 fold row"
    )
    assert rep["bb"]["n_docs_total"] == 2
    assert rep["bb"]["n_retired"] == 0


# ---------------------------------------------------------------------------
# 4. ivf_assign_pandas masks the mixed batch without dtype coercion
# ---------------------------------------------------------------------------

def test_ivf_assign_mixed_batch_masks_explicitly(spark):
    """Exercises the finite.all()==False path (the one that previously
    assigned None into an int32 Series): healthy rows keep exact int
    cells, corrupt rows are excluded, in one Arrow batch."""
    from reverse_etl_homebrew_spark.operators.vectorized import (
        ivf_assign_pandas,
    )

    df = spark.createDataFrame(
        [
            Row(vec_id=0, embedding=[1.0, 0.0]),
            Row(vec_id=1, embedding=[0.0, 1.0]),
            Row(vec_id=2, embedding=[float("nan"), 1.0]),
            Row(vec_id=3, embedding=None),
            Row(vec_id=4, embedding=[float("inf"), 0.0]),
            Row(vec_id=5, embedding=[0.9, 0.1]),
        ],
        "vec_id int, embedding array<double>",
    ).coalesce(1)  # one Arrow batch → the mixed masking path
    cents = [[1.0, 0.0], [0.0, 1.0]]
    got = {
        r["vec_id"]: r["ivf_cell"]
        for r in ivf_assign_pandas(df, cents).collect()
    }
    assert got == {0: 0, 1: 1, 5: 0}

"""Unit gates for the late-r12 corpus ops: chunk_documents,
snapshot_diff, and the Bloom-prefiltered decontaminate twin.

The oracle-parity and plan-shape gates cover the registered forms;
these pin the operator-level contracts — coverage algebra, the NULL
scope rules, and the prefilter's exactness under forced collisions.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from reverse_etl_homebrew_spark.operators import chunking as CH
from reverse_etl_homebrew_spark.operators import dedup as DD
from reverse_etl_homebrew_spark.operators.merge import snapshot_diff


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# ---------------------------------------------------------------------------
# chunk_documents
# ---------------------------------------------------------------------------


def test_chunks_cover_every_token_and_tail_runs_short(spark):
    text = " ".join(f"t{i}" for i in range(10))  # 10 tokens
    out = CH.chunk_documents(
        _docs(spark, [(1, text)]), size=4, stride=3
    ).collect()
    # starts 1,4,7,10 -> chunk lengths 4,4,4,1
    by_id = {r.chunk_id: r for r in out}
    assert sorted(by_id) == [0, 1, 2, 3]
    assert [by_id[i].n_chunk_tokens for i in range(4)] == [4, 4, 4, 1]
    assert by_id[0].chunk == "t0 t1 t2 t3"
    assert by_id[3].chunk == "t9"
    # stride coverage: every token index appears in at least one chunk
    seen = set()
    for r in out:
        seen.update(r.chunk.split(" "))
    assert seen == {f"t{i}" for i in range(10)}


def test_short_doc_yields_single_whole_chunk(spark):
    out = CH.chunk_documents(_docs(spark, [(1, "a b")]), size=64, stride=48).collect()
    assert len(out) == 1
    assert out[0].chunk == "a b" and out[0].n_chunk_tokens == 2


def test_null_and_empty_docs_yield_no_chunks(spark):
    rows = [(1, None), (None, "has text"), (2, "   "), (3, "x")]
    out = CH.chunk_documents(_docs(spark, rows), size=4, stride=3).collect()
    assert [(r.doc_id, r.chunk) for r in out] == [(3, "x")]


def test_chunk_documents_rejects_bad_knobs(spark):
    with pytest.raises(ValueError):
        CH.chunk_documents(_docs(spark, [(1, "x")]), size=0, stride=3)
    with pytest.raises(ValueError):
        CH.chunk_documents(_docs(spark, [(1, "x")]), size=4, stride=0)


# ---------------------------------------------------------------------------
# snapshot_diff
# ---------------------------------------------------------------------------


def test_snapshot_diff_status_matrix(spark):
    old = _docs(spark, [(1, "same"), (2, "old"), (3, "gone"), (4, None)])
    new = _docs(spark, [(1, "same"), (2, "new"), (5, "fresh"), (4, None)])
    out = {
        r.doc_id: r.status
        for r in snapshot_diff(old, new, "doc_id", F.md5("text")).collect()
    }
    # 1 unchanged (filtered), 4 NULL-text both sides -> unchanged (filtered)
    assert out == {2: "changed", 3: "removed", 5: "added"}


def test_snapshot_diff_null_text_vs_text_is_changed(spark):
    old = _docs(spark, [(1, None)])
    new = _docs(spark, [(1, "now present")])
    out = snapshot_diff(old, new, "doc_id", F.md5("text")).collect()
    assert [(r.doc_id, r.status) for r in out] == [(1, "changed")]


def test_snapshot_diff_null_keys_out_of_scope(spark):
    old = _docs(spark, [(None, "a"), (1, "x")])
    new = _docs(spark, [(None, "b"), (1, "x")])
    assert snapshot_diff(old, new, "doc_id", F.md5("text")).count() == 0


# ---------------------------------------------------------------------------
# contamination_flags_prefiltered
# ---------------------------------------------------------------------------


def _contamination_fixture(spark):
    bench = _docs(
        spark,
        [(100, "the quick brown fox jumps over the lazy dog again today")],
    )
    train = _docs(
        spark,
        [
            # shares the full bench 8-gram window
            (1, "prefix the quick brown fox jumps over the lazy dog tail"),
            # no shared 8-gram
            (2, "completely different words with no overlap whatsoever at all ok"),
        ],
    )
    return train, bench


def test_prefiltered_equals_exact_form(spark):
    train, bench = _contamination_fixture(spark)
    exact = {
        (r.doc_id, r.shared_grams)
        for r in DD.contamination_flags(train, bench, n=8).collect()
    }
    pre = {
        (r.doc_id, r.shared_grams)
        for r in DD.contamination_flags_prefiltered(train, bench, n=8).collect()
    }
    assert exact == pre and exact, "prefiltered form diverged from exact"


def test_prefiltered_exact_even_when_every_position_collides(spark):
    """m=1 saturates both Bloom lanes (every gram maps to position 0),
    the worst collision case: the prefilter passes everything through
    and the exact join must still produce the exact answer."""
    train, bench = _contamination_fixture(spark)
    exact = {
        (r.doc_id, r.shared_grams)
        for r in DD.contamination_flags(train, bench, n=8).collect()
    }
    pre = {
        (r.doc_id, r.shared_grams)
        for r in DD.contamination_flags_prefiltered(train, bench, n=8, m=1).collect()
    }
    assert exact == pre


def test_prefiltered_empty_benchmark_yields_empty(spark):
    train, bench = _contamination_fixture(spark)
    out = DD.contamination_flags_prefiltered(
        train, bench.filter(F.lit(False)), n=8
    )
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == ["doc_id", "shared_grams"]

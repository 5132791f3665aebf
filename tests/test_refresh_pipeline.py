"""Invariants of the corpus-refresh composite (operators/refresh.py),
beyond the driver's oracle row:

- refresh(corpus, corpus) is a NO-OP: zero candidates/admissions/
  flags, totals equal to the corpus' own per-lang stats;
- refresh(corpus, corpus ∪ delta) ≡ prep over the union on the
  overlap (VERDICT r12 #3): for a pure-append snapshot pair the
  refreshed totals equal a from-scratch recompute over
  corpus ∪ admitted(delta);
- retraction is exact: a snapshot that only drops keys yields totals
  equal to a from-scratch recompute over the survivors — the
  subtractive arm of the merge_rollup_state fold, which the additive
  `incremental-agg-merge` proof never exercised;
- the ANN append-equivalence invariant extends THROUGH the composite:
  probing a follow-up batch against append_to_ann_index(survivor
  index, admitted batch) equals probing against a full rebuild over
  survivors ∪ admitted.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from reverse_etl_homebrew_spark.functions import text as TX
from reverse_etl_homebrew_spark.operators.dedup import incremental_dedup
from reverse_etl_homebrew_spark.operators.refresh import corpus_refresh_report
from reverse_etl_homebrew_spark.operators.similarity import (
    append_to_ann_index,
    build_ann_index,
    incremental_knn,
)
from reverse_etl_homebrew_spark.sources.catalog import load_table

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return (
        load_table(spark, SF_DIR, "documents")
        .filter(F.col("doc_id").isNotNull())
        .select("doc_id", "text", "lang")
    )


@pytest.fixture(scope="module")
def vecs(spark):
    return load_table(spark, SF_DIR, "embeddings")


def _totals(df):
    """From-scratch per-lang (n_docs, tokens) recompute — the ground
    truth the incremental fold must equal."""
    out = df.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(TX.token_count(F.col("text"))).cast("long").alias("t"),
    )
    return {r["lang"]: (r["n"], r["t"]) for r in out.collect()}


def _report(spark, old, new, vecs):
    rows = corpus_refresh_report(old, new, vecs).collect()
    return {r["lang"]: r.asDict() for r in rows}


def test_noop_refresh(spark, docs, vecs):
    rep = _report(spark, docs, docs, vecs)
    want = _totals(docs)
    assert set(rep) == set(want)
    for lang, row in rep.items():
        assert row["n_candidates"] == 0
        assert row["n_admitted"] == 0
        assert row["admitted_tokens"] == 0
        assert row["n_span_flagged"] == 0
        assert row["n_knn_pairs"] == 0
        assert (row["n_docs_total"], row["tokens_total"]) == want[lang]


def test_pure_append_refresh_equals_prep_on_union(spark, docs, vecs):
    # delta: 30 genuinely-new docs (shifted ids, text perturbed so
    # fingerprints are fresh) plus 10 exact copies of accepted docs
    # (must be rejected by admission)
    fresh_delta = docs.filter(F.col("doc_id") < 30).select(
        (F.col("doc_id") + 50000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" appended-v2")).alias("text"),
        "lang",
    )
    dup_delta = docs.filter(
        (F.col("doc_id") >= 30) & (F.col("doc_id") < 40)
    ).select((F.col("doc_id") + 60000).alias("doc_id"), "text", "lang")
    delta = fresh_delta.unionByName(dup_delta)
    new = docs.unionByName(delta)

    rep = _report(spark, docs, new, vecs)
    admitted = incremental_dedup(delta, docs)
    want = _totals(docs.unionByName(admitted.select("doc_id", "text", "lang")))
    got = {
        lang: (row["n_docs_total"], row["tokens_total"])
        for lang, row in rep.items()
    }
    assert got == want
    # the duplicate arm really was rejected
    n_admitted = sum(row["n_admitted"] for row in rep.values())
    assert n_admitted == admitted.count() == fresh_delta.count()


def test_retraction_refresh_equals_recompute_over_survivors(spark, docs, vecs):
    new = docs.filter(F.col("doc_id") % 3 != 0)
    rep = _report(spark, docs, new, vecs)
    want = _totals(new)
    dropped = {
        r["lang"]: r["n"]
        for r in docs.filter(F.col("doc_id") % 3 == 0)
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert sum(r["n_retired"] for r in rep.values()) == sum(dropped.values())
    # r14 (advisor): a lang whose every doc was retired must VANISH
    # from the report — the oracle recomputes from the refreshed
    # corpus, where that lang has no rows — instead of surviving as an
    # n=0 fold artifact. The report's lang universe IS the survivors'.
    assert set(rep) == set(want)
    for lang, row in rep.items():
        assert row["n_retired"] == dropped.get(lang, 0)
        assert row["n_candidates"] == 0 and row["n_admitted"] == 0
        n, t = want[lang]
        assert row["n_docs_total"] == n
        assert row["tokens_total"] == t


def test_span_index_append_equals_rebuild(spark, docs):
    """The span-index maintenance twin of the ANN append invariant:
    appending an admitted batch's windows ≡ rebuilding over the union,
    and re-appending the same batch is a no-op (set idempotence)."""
    from reverse_etl_homebrew_spark.operators.dedup import (
        append_to_span_index,
        build_span_index,
        incremental_dup_spans,
    )

    old = docs.filter(F.col("doc_id") < 300)
    batch = docs.filter(F.col("doc_id").between(300, 360)).select(
        (F.col("doc_id") + 50000).alias("doc_id"), "text", "lang"
    )
    appended = append_to_span_index(build_span_index(old), batch)
    rebuilt = build_span_index(old.unionByName(batch))
    a = sorted(r["win"] for r in appended.collect())
    b = sorted(r["win"] for r in rebuilt.collect())
    assert a == b
    again = append_to_span_index(appended, batch)
    assert again.count() == appended.count()
    # a follow-up batch probed against the appended index sees exactly
    # what the rebuilt index shows
    batch2 = docs.filter(F.col("doc_id") > 400).select(
        (F.col("doc_id") + 90000).alias("doc_id"), "text", "lang"
    )
    via_append = sorted(
        map(tuple, incremental_dup_spans(batch2, appended).collect())
    )
    via_rebuild = sorted(
        map(tuple, incremental_dup_spans(batch2, rebuilt).collect())
    )
    assert via_append == via_rebuild and via_append


def test_append_index_equivalence_through_composite(spark, docs, vecs):
    # refresh admits a batch; a FOLLOW-UP batch probed against the
    # appended index must see exactly what a rebuilt index shows
    delta = docs.filter(F.col("doc_id") < 40).select(
        (F.col("doc_id") + 50000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" v2")).alias("text"),
        "lang",
    )
    admitted = incremental_dedup(delta, docs)
    # admitted delta vectors: reuse the originals' embeddings under
    # the shifted ids (disjoint from the index by id)
    adm_vecs = vecs.filter(F.col("vec_id") < 40).select(
        (F.col("vec_id") + 50000).alias("vec_id"), "embedding", "label"
    )
    assert admitted.count() == adm_vecs.count()

    base_idx = build_ann_index(vecs, planes=6)
    appended = append_to_ann_index(base_idx, adm_vecs, planes=6)
    rebuilt = build_ann_index(vecs.unionByName(adm_vecs), planes=6)

    batch2 = vecs.filter(F.col("vec_id").between(100, 120)).select(
        (F.col("vec_id") + 90000).alias("vec_id"), "embedding", "label"
    )
    via_append = sorted(
        map(tuple, incremental_knn(batch2, appended, k=3, planes=6).collect())
    )
    via_rebuild = sorted(
        map(tuple, incremental_knn(batch2, rebuilt, k=3, planes=6).collect())
    )
    assert via_append == via_rebuild
    assert via_append  # non-vacuous

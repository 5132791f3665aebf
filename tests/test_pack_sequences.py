"""operators.chunking.pack_sequences (r14, registered as the
`pack-chunks` key — the pre-existing `pack-sequences` key is the
DOC-granular greedy packer): GPT-style token packing of chunks into
fixed-capacity sequences — contiguity, straddle arithmetic, shard
locality, width determinism, and the one-shuffle/pruned-text plan.
Registered-key parity vs DuckDB rides in test_oracle_parity.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from reverse_etl_homebrew_spark.operators.chunking import (
    chunk_documents,
    pack_sequences,
)
from reverse_etl_homebrew_spark.sources.catalog import load_table

SF_DIR = "/root/testdata/sf0.001"


def _packed(spark, cap=512):
    chunks = chunk_documents(
        load_table(spark, SF_DIR, "documents"),
        "text",
        "doc_id",
        size=64,
        stride=48,
        carry=("lang",),
    )
    return pack_sequences(chunks, cap=cap, shard_cols=("lang",))


def test_contiguity_and_straddle_arithmetic(spark):
    rows = _packed(spark, cap=100).collect()
    by_shard: dict = {}
    for r in rows:
        by_shard.setdefault(r["lang"], []).append(r)
    assert len(by_shard) > 1
    for shard, rs in by_shard.items():
        rs.sort(key=lambda r: r["tok_start"])
        # contiguous stream: each chunk starts where the previous ended
        off = 0
        for r in rs:
            assert r["tok_start"] == off, (shard, r)
            off += r["n_tok"]
            # straddle arithmetic: seq ids cover exactly the token range
            assert r["seq_first"] == r["tok_start"] // 100
            assert r["seq_last"] == (r["tok_start"] + r["n_tok"] - 1) // 100
            assert r["seq_offset"] == r["tok_start"] % 100
            assert r["seq_last"] >= r["seq_first"]
        # with 64-token chunks and cap=100, straddles MUST occur
    assert any(r["seq_last"] > r["seq_first"] for r in rows)


def test_sequence_fill_is_exact(spark):
    """Every sequence except each shard's last holds exactly cap
    tokens — the packing invariant that makes the layout dense."""
    cap = 100
    rows = _packed(spark, cap=cap).collect()
    totals: dict = {}
    for r in rows:
        totals[r["lang"]] = max(
            totals.get(r["lang"], 0), r["tok_start"] + r["n_tok"]
        )
    for shard, total in totals.items():
        n_seqs = (total + cap - 1) // cap
        last_fill = total - (n_seqs - 1) * cap
        assert 1 <= last_fill <= cap
        # chunk-level coverage of every full sequence: sum of overlap
        # with [s*cap, (s+1)*cap) == cap for every non-final s
        shard_rows = [r for r in rows if r["lang"] == shard]
        for s in range(n_seqs - 1):
            lo, hi = s * cap, (s + 1) * cap
            cov = sum(
                max(0, min(hi, r["tok_start"] + r["n_tok"]) - max(lo, r["tok_start"]))
                for r in shard_rows
            )
            assert cov == cap, (shard, s)


def test_width_invariance(spark):
    """Packing is deterministic at any shuffle width (the r14
    duplicate-key/tie discipline)."""
    outs = []
    saved = spark.conf.get("spark.sql.shuffle.partitions")
    for width in ("5", "32"):
        spark.conf.set("spark.sql.shuffle.partitions", width)
        try:
            outs.append(sorted(map(tuple, _packed(spark).collect())))
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", saved)
    assert outs[0] == outs[1]


def test_plan_one_shuffle_and_text_pruned(spark):
    df = _packed(spark)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan
    # the chunk TEXT (concat_ws of the slice) must be pruned out —
    # the packer consumes only counts
    assert "concat_ws" not in plan, "chunk text not pruned from packing plan"
    explained = df._jdf.queryExecution().optimizedPlan().toString()
    assert "pythonUDF" not in explained.lower()


def test_cap_validation():
    with pytest.raises(ValueError):
        pack_sequences(None, cap=0)


def test_giant_chunk_spans_many_sequences(spark):
    """A chunk larger than cap spans ceil(n_tok/cap)±1 sequences —
    the giant-rows composition case."""
    chunks = spark.createDataFrame(
        [("en", 1, 0, 350), ("en", 1, 1, 10)],
        "lang string, doc_id long, chunk_id long, n_chunk_tokens long",
    )
    rows = {
        r["chunk_id"]: r
        for r in pack_sequences(chunks, cap=100, shard_cols=("lang",)).collect()
    }
    assert rows[0]["seq_first"] == 0 and rows[0]["seq_last"] == 3
    assert rows[1]["tok_start"] == 350
    assert rows[1]["seq_first"] == 3 and rows[1]["seq_last"] == 3

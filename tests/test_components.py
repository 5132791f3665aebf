"""Connected-components / cluster-dedup tests."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from reverse_etl_homebrew_spark.operators.components import (
    connected_components,
    dedup_survivors,
)
from reverse_etl_homebrew_spark.operators import dedup as DD
from reverse_etl_homebrew_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


def test_storage_mode_requires_checkpoint_dir(spark):
    """Persist alone cannot cut iterative lineage (measured 7x blowup)
    — storage mode must refuse to run without a reliable checkpoint
    dir rather than silently exploding plan size."""
    if spark.sparkContext.getCheckpointDir() is not None:
        pytest.skip("checkpoint dir already set in this session")
    pairs = spark.createDataFrame([(1, 2)], "a_id long, b_id long")
    with pytest.raises(ValueError, match="checkpoint dir"):
        connected_components(pairs, storage="DISK_ONLY")


@pytest.mark.parametrize("storage", [None, "MEMORY_AND_DISK", "DISK_ONLY"])
def test_chain_and_triangle_merge(spark, storage, tmp_path):
    """Same answers under the localCheckpoint default AND both real
    checkpoint+cache levels — the cluster path must not be dead code."""
    if storage is not None:
        spark.sparkContext.setCheckpointDir(str(tmp_path / "ckpt"))
    # chain 1-2-3 plus triangle 10-11-12 plus isolated pair 20-21
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (11, 12), (10, 12), (20, 21)],
        "a_id long, b_id long",
    )
    labels = connected_components(pairs, storage=storage)
    comps = {r["id"]: r["component"] for r in labels.collect()}
    if storage is not None:
        labels.unpersist()  # storage-mode contract: caller releases
    assert comps[1] == comps[2] == comps[3] == 1
    assert comps[10] == comps[11] == comps[12] == 10
    assert comps[20] == comps[21] == 20


def test_storage_mode_releases_blocks_on_non_convergence(spark, tmp_path):
    """A path graph that cannot converge in max_iter must raise AND
    leave no pinned blocks behind (try/finally on the error path)."""
    sc = spark.sparkContext
    sc.setCheckpointDir(str(tmp_path / "ckpt"))
    chain = [(i, i + 1) for i in range(12)]
    pairs = spark.createDataFrame(chain, "a_id long, b_id long")
    before = len([r for r in sc._jsc.sc().getRDDStorageInfo()])
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(pairs, max_iter=2, storage="MEMORY_AND_DISK")
    after = len([r for r in sc._jsc.sc().getRDDStorageInfo()])
    assert after <= before


def test_dedup_survivors_keeps_one_per_cluster(spark):
    docs = spark.range(0, 30).select(F.col("id").alias("doc_id"))
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6)], "a_id long, b_id long"
    )
    out = {r["doc_id"] for r in dedup_survivors(docs, pairs).collect()}
    assert 1 in out and 2 not in out and 3 not in out
    assert 5 in out and 6 not in out
    # untouched rows survive
    assert {0, 4, 7, 29} <= out
    assert len(out) == 30 - 3


def test_end_to_end_minhash_cluster_dedup(spark):
    """Full pipeline: corpus with planted duplicates → MinHash pairs →
    clusters → survivors."""
    docs = load_table(spark, SF, "documents").select("doc_id", "text").filter(
        F.col("doc_id") < 40
    )
    d0 = docs.filter(F.col("doc_id") == 0).select(F.lit(1000).alias("doc_id"), "text")
    d0b = docs.filter(F.col("doc_id") == 0).select(F.lit(1001).alias("doc_id"), "text")
    corpus = docs.unionByName(d0).unionByName(d0b)
    pairs = DD.minhash_lsh_pairs(corpus, num_hashes=16, bands=4).filter(
        F.col("est_jaccard") >= 0.9
    )
    survivors = {r["doc_id"] for r in dedup_survivors(corpus, pairs).collect()}
    assert 0 in survivors and 1000 not in survivors and 1001 not in survivors

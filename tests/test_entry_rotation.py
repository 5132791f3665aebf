"""Guard the driver-registry emission order in ``__spark_entry__``.

The driver caps CORRECTNESS at ~50 entries per round, evaluating
``queries()`` in dict order. Round 5 learned the hard way that the cap
must be *counted*: the keys whose code changed that round landed at
positions 52-54 and got no driver row. These tests pin the invariants
so a future rotation can't repeat that.
"""

from __future__ import annotations

import __spark_entry__ as entry

CAP = 50

# Keys that MUST be inside the cap this round: added or code changed
# this round, or driver evidence is stale (round 4 — the planned
# round-6 overflow).
MUST_RUN_R7 = {
    # r4-stale cohort (round-6 overflow, now the stalest evidence)
    "pivot-agg", "running-window", "lag-lead", "unpivot-melt",
    "gap-fill", "quantiles", "string-funcs", "null-safe-join",
    "distinct-agg", "array-ops", "struct-json-ops",
    "explode-posexplode", "conditional-agg",
    # added this round — never had a driver row
    "tfidf-topterms", "trigram-lm-score", "weighted-sample",
    "pii-scrub", "dedup-rate-report", "length-histogram",
    "image-resize", "audio-resample",
    "ngram-topk", "vocab-stats", "domain-stats", "embedding-centroid",
    "anomaly-zscore", "scd2-history", "bucketed-join",
    "entropy-quality", "containment-dedup", "mad-outliers",
    "shard-assign", "kmeans-assign",
    "ewma-smooth", "window-median", "merge-intervals",
    "funnel-steps", "retention-cohorts", "rank-funcs", "stats-agg",
    "dedup-survivorship",
    # code changed (numpy MJPEG decode; LSH pair-scoring rewrite) /
    # perf-audited this round
    "multimodal-decode", "fuzzy-dedup", "fuzzy-dedup-clusters",
    "similarity-join", "embedding-near-dup", "knn-join",
    "knn-join-tables", "knn-join-lsh", "topk-similarity-lsh",
}


def test_priority_has_no_duplicates_and_resolves():
    qs = entry.queries()
    assert len(entry._PRIORITY) == len(set(entry._PRIORITY))
    missing = [k for k in entry._PRIORITY if k not in qs]
    assert not missing, f"_PRIORITY names unknown keys: {missing}"


def test_must_run_keys_inside_cap():
    head = list(entry.queries().keys())[:CAP]
    assert len(head) == CAP
    outside = MUST_RUN_R7 - set(head)
    assert not outside, f"must-run keys fell outside the {CAP}-cap: {outside}"


def test_queries_and_oracle_emit_same_order():
    qkeys = list(entry.queries().keys())
    okeys = list(entry.oracle_sql().keys())
    # oracle registry is a subset (rows-only keys omit SQL) but the
    # relative order of shared keys must match, so the driver pairs
    # them correctly under the cap.
    shared = [k for k in qkeys if k in set(okeys)]
    assert shared == [k for k in okeys if k in set(qkeys)]

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

# Keys that MUST be inside the cap this round (round 11):
# (a) the 15 ROLLED_TO_R11 keys from the r10 pin (VERDICT r10 #1 —
# the stalest evidence in the registry, r7; four of them had their
# code changed by the r10 NULL pass);
# (b) every other r10 NULL-policy-touched key whose latest driver
# evidence predates the change (VERDICT r10 #2);
# (c) every key whose code or oracle changed THIS round — the r11
# NULL-KEY probe fixes — plus the new key incremental-dup-spans.
MUST_RUN_R11 = {
    # (a) ROLLED_TO_R11 (r7 evidence; first four NULL-policy-changed)
    "struct-json-ops", "running-window", "scd2-history",
    "window-median",
    "pii-scrub", "pivot-agg", "quantiles", "rank-funcs",
    "retention-cohorts", "shard-assign", "stats-agg", "string-funcs",
    "tfidf-topterms", "unpivot-melt", "weighted-sample",
    # (b) r10 NULL-policy-touched, evidence predates the change
    "tumbling-window", "sliding-window", "session-window",
    "markov-transitions", "attribution-last-touch", "scd2-lookup",
    "ngram-jaccard", "decontaminate", "incremental-dedup",
    "containment-dedup", "containment-dedup-capped", "asof-join",
    # (c) changed this round (r11 NULL-key probe fixes)
    "anti-join", "roi-patient-anti-join", "exact-dedup", "lang-id",
    "quota-sample", "dup-span-rate", "repetition-metrics",
    "fuzzy-dedup-clusters", "pack-sequences", "roi-sync-pipeline",
    "incremental-agg-merge",
    # new this round — a key with zero driver history must never wait
    "incremental-dup-spans",
    # mp4 corruption gates changed its decode path this round
    "multimodal-decode",
    # re-delivery probe fixes: _pruned_grams collapses exact
    # (id, text) re-deliveries — these two changed beyond the keys
    # already listed in (c)
    "fuzzy-dedup", "dedup-survivorship",
    # empty-input probe fixes: missing-seed fences + the _sum_terms
    # zero-term guard representative
    "topk-similarity", "topk-similarity-lsh", "topk-similarity-pandas",
    "topk-similarity-ivf", "hybrid-rrf", "kmeans-assign",
    "kmeans-iterate", "knn-join-lsh",
}

# The r8-evidenced keys deliberately rolled past the cap to round 12 —
# pinned so the roll stays EXPLICIT, not an accident of ordering.
# These must lead the round-12 rotation (together with any key whose
# code changes in round 12).
ROLLED_TO_R12 = {
    # the seven late-r11 non-finite-policy keys that did not fit the
    # saturated cap — proven clean-data no-ops (see __spark_entry__
    # boundary comment), they MUST be discharged first in r12
    "equi-inner-join", "json-coerce", "grouping-sets",
    "skew-salted-join", "conditional-agg", "anomaly-zscore",
    "mad-outliers",
    "ambiguity-count", "approx-distinct", "dedup-lastwin",
    "delta-scan", "dlq-attempt-join", "dlq-attempt-read",
    "doc-fingerprint", "email-match-join",
    "embedding-centroid", "embedding-near-dup",
    "full-scan", "groupby-agg", "idmap-join",
    "knn-join", "knn-join-tables",
    "latest-per-group", "ledger-watermark-read", "max-ifnull-agg",
    "point-lookup", "processed-skip", "quality-score",
    "run-counters", "semi-join", "set-except", "set-intersect",
    "simhash-dedup", "similarity-join", "sqlite-scan-pushdown",
    "text-analysis", "tiered-match-join", "token-count",
    "topk-sort", "union-all", "window-rank",
}


def test_priority_has_no_duplicates_and_resolves():
    qs = entry.queries()
    assert len(entry._PRIORITY) == len(set(entry._PRIORITY))
    missing = [k for k in entry._PRIORITY if k not in qs]
    assert not missing, f"_PRIORITY names unknown keys: {missing}"


def test_must_run_keys_inside_cap():
    head = list(entry.queries().keys())[:CAP]
    assert len(head) == CAP
    outside = MUST_RUN_R11 - set(head)
    assert not outside, f"must-run keys fell outside the {CAP}-cap: {outside}"


def test_rolled_keys_are_exactly_the_named_cohort():
    order = list(entry.queries().keys())
    head, tail = set(order[:CAP]), order[CAP:]
    assert ROLLED_TO_R12 & head == set(), "a rolled key leaked into the cap"
    assert ROLLED_TO_R12 <= set(tail)
    # and they sit immediately after the boundary, so the r12 rotation
    # inherits them first
    assert set(tail[: len(ROLLED_TO_R12)]) == ROLLED_TO_R12


def test_queries_and_oracle_emit_same_order():
    qkeys = list(entry.queries().keys())
    okeys = list(entry.oracle_sql().keys())
    # oracle registry is a subset (rows-only keys omit SQL) but the
    # relative order of shared keys must match, so the driver pairs
    # them correctly under the cap.
    shared = [k for k in qkeys if k in set(okeys)]
    assert shared == [k for k in okeys if k in set(qkeys)]

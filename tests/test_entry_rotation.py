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

# Keys that MUST be inside the cap this round (round 10): the 18
# r6-evidenced keys rolled from round 9 by explicit plan (VERDICT r9
# item 1 — the ROLLED_TO_R10 pin), plus every key whose code changed
# this round: the guard_den_mul product-denominator guard
# (mix-weights, bigram-lift-topk), the guard_dec_units IS-NOT-TRUE
# overflow comparison (ewma-smooth, trigram-lm-score,
# incremental-agg-merge — the last also gained the null-inclusive
# delta split), and the explicitly-typed Arrow emission in the
# Misra-Gries sketch phases (heavy-hitters, ngram-topk-sketch,
# heavy-hitters-by-group) — and the two keys NEW this round
# (dup-span-detect, dup-span-rate), which have no driver evidence yet.
MUST_RUN_R10 = {
    # r6-evidenced cohort, rolled from the r9 cap by explicit plan
    "patient-sync-pipeline", "protected-drop", "quota-sample",
    "range-join", "repetition-metrics", "roi-patient-anti-join",
    "roi-sync-pipeline", "rollup-agg", "simhash-dedup-md5",
    "skew-salted-join", "split-assign", "stratified-sample",
    "threetier-composite", "topk-similarity", "topk-similarity-ivf",
    "topk-similarity-pandas", "video-frame-index", "watermark-filter",
    # code changed this round
    "mix-weights", "bigram-lift-topk", "incremental-agg-merge",
    "ewma-smooth", "trigram-lm-score", "heavy-hitters",
    "ngram-topk-sketch", "heavy-hitters-by-group",
    # new this round — a key with zero driver history must never wait
    "dup-span-detect", "dup-span-rate",
}

# The r7-evidenced keys deliberately rolled past the cap to round 11 —
# pinned so the roll stays EXPLICIT, not an accident of ordering.
# These must lead the round-11 rotation (together with any key whose
# code changes in round 11).
ROLLED_TO_R11 = {
    # pii-scrub / pivot-agg: displaced mid-round by the two NEW r10
    # keys (dup-span-detect / dup-span-rate), which have no driver
    # evidence at all and therefore outrank an r7-evidenced re-check
    "pii-scrub", "pivot-agg",
    "quantiles", "rank-funcs", "retention-cohorts", "running-window",
    "scd2-history", "shard-assign", "stats-agg", "string-funcs",
    "struct-json-ops", "tfidf-topterms", "unpivot-melt",
    "weighted-sample", "window-median",
}


def test_priority_has_no_duplicates_and_resolves():
    qs = entry.queries()
    assert len(entry._PRIORITY) == len(set(entry._PRIORITY))
    missing = [k for k in entry._PRIORITY if k not in qs]
    assert not missing, f"_PRIORITY names unknown keys: {missing}"


def test_must_run_keys_inside_cap():
    head = list(entry.queries().keys())[:CAP]
    assert len(head) == CAP
    outside = MUST_RUN_R10 - set(head)
    assert not outside, f"must-run keys fell outside the {CAP}-cap: {outside}"


def test_rolled_keys_are_exactly_the_named_fifteen():
    order = list(entry.queries().keys())
    head, tail = set(order[:CAP]), order[CAP:]
    assert ROLLED_TO_R11 & head == set(), "a rolled key leaked into the cap"
    assert ROLLED_TO_R11 <= set(tail)
    # and they sit immediately after the boundary, so the r11 rotation
    # inherits them first
    assert set(tail[: len(ROLLED_TO_R11)]) == ROLLED_TO_R11


def test_queries_and_oracle_emit_same_order():
    qkeys = list(entry.queries().keys())
    okeys = list(entry.oracle_sql().keys())
    # oracle registry is a subset (rows-only keys omit SQL) but the
    # relative order of shared keys must match, so the driver pairs
    # them correctly under the cap.
    shared = [k for k in qkeys if k in set(okeys)]
    assert shared == [k for k in okeys if k in set(qkeys)]

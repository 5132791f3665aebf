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

# Keys that MUST be inside the cap this round (round 9): the 3
# evidence-gapped keys named by VERDICT r8 (heavy-hitters has never
# faced the driver; vocab-stats and dedup-rate-report changed rounding
# code after the r8 cap filled), the 14 r5-stale scalar keys rolled
# from round 8 by explicit plan, and the keys added or code-changed
# this round.
MUST_RUN_R9 = {
    # evidence-gapped
    "heavy-hitters", "vocab-stats", "dedup-rate-report",
    # r5-evidenced cohort, rolled from the r8 cap by explicit plan
    "bool-normalize", "identifier-canon", "email-normalize",
    "phi-redact", "epoch-millis", "eastern-date", "json-payload",
    "natural-key", "next-birthday", "patient-projection",
    "roi-projection", "remote-search", "remote-get",
    "retry-threshold",
    # added / code changed this round: the two-phase sketch path, the
    # two keys whose product denominator gained guard_den, and the two
    # KNOWN-RESIDUAL keys moved onto exact integer rounding
    "ngram-topk-sketch", "bigram-lift-topk", "mix-weights",
    "bucketed-join", "ewma-smooth", "trigram-lm-score",
    "markov-transitions",
    # added in the round-9 continuation: the IVM merge, the z-order
    # layout, and the grouped sketch operators — new keys must face
    # the driver the round they ship (the heavy-hitters lesson
    # from r8)
    "incremental-agg-merge", "zorder-layout", "heavy-hitters-by-group",
}

# The r6-evidenced keys deliberately rolled past the cap to round 10 —
# pinned so the roll stays EXPLICIT, not an accident of ordering.
# These must lead the round-10 rotation (together with any key whose
# code changes in round 10). patient-sync-pipeline, protected-drop
# and quota-sample rolled when the three new r9-continuation
# operators took their cap slots.
ROLLED_TO_R10 = {
    "patient-sync-pipeline", "protected-drop", "quota-sample",
    "range-join", "repetition-metrics", "roi-patient-anti-join", "roi-sync-pipeline",
    "rollup-agg", "simhash-dedup-md5", "skew-salted-join",
    "split-assign", "stratified-sample", "threetier-composite",
    "topk-similarity", "topk-similarity-ivf", "topk-similarity-pandas",
    "video-frame-index", "watermark-filter",
}


def test_priority_has_no_duplicates_and_resolves():
    qs = entry.queries()
    assert len(entry._PRIORITY) == len(set(entry._PRIORITY))
    missing = [k for k in entry._PRIORITY if k not in qs]
    assert not missing, f"_PRIORITY names unknown keys: {missing}"


def test_must_run_keys_inside_cap():
    head = list(entry.queries().keys())[:CAP]
    assert len(head) == CAP
    outside = MUST_RUN_R9 - set(head)
    assert not outside, f"must-run keys fell outside the {CAP}-cap: {outside}"


def test_rolled_keys_are_exactly_the_named_fifteen():
    order = list(entry.queries().keys())
    head, tail = set(order[:CAP]), order[CAP:]
    assert ROLLED_TO_R10 & head == set(), "a rolled key leaked into the cap"
    assert ROLLED_TO_R10 <= set(tail)
    # and they sit immediately after the boundary, so the r10 rotation
    # inherits them first
    assert set(tail[: len(ROLLED_TO_R10)]) == ROLLED_TO_R10


def test_queries_and_oracle_emit_same_order():
    qkeys = list(entry.queries().keys())
    okeys = list(entry.oracle_sql().keys())
    # oracle registry is a subset (rows-only keys omit SQL) but the
    # relative order of shared keys must match, so the driver pairs
    # them correctly under the cap.
    shared = [k for k in qkeys if k in set(okeys)]
    assert shared == [k for k in okeys if k in set(qkeys)]

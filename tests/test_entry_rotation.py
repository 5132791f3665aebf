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

# Keys that MUST be inside the cap this round: evidence-gapped (never
# driver-checked, or the r7 row errored), added this round, or code
# changed this round.
MUST_RUN_R8 = {
    # evidence-gapped: the 5 post-cap r7 additions never had a driver
    # row; embedding-centroid's r7 row errored (array column) and its
    # output was reshaped this round
    "mix-weights", "markov-transitions", "kmeans-iterate",
    "scd2-lookup", "attribution-last-touch", "embedding-centroid",
    # added this round — never had a driver row
    "containment-dedup-capped", "sqlite-scan-pushdown",
    # code changed this round: bucketer matmul → guaranteed-fold-equal
    # hybrid; containment-dedup gained the lineage cut
    "topk-similarity-lsh", "knn-join", "knn-join-lsh",
    "knn-join-tables", "similarity-join", "embedding-near-dup",
    "containment-dedup",
}

# The r5-evidenced keys deliberately rolled past the cap to round 9 —
# pinned so the roll stays the EXPLICIT 14, not an accident of
# ordering. These must lead the round-9 rotation.
ROLLED_TO_R9 = {
    "bool-normalize", "identifier-canon", "email-normalize",
    "phi-redact", "epoch-millis", "eastern-date", "json-payload",
    "natural-key", "next-birthday", "patient-projection",
    "roi-projection", "remote-search", "remote-get",
    "retry-threshold",
}


def test_priority_has_no_duplicates_and_resolves():
    qs = entry.queries()
    assert len(entry._PRIORITY) == len(set(entry._PRIORITY))
    missing = [k for k in entry._PRIORITY if k not in qs]
    assert not missing, f"_PRIORITY names unknown keys: {missing}"


def test_must_run_keys_inside_cap():
    head = list(entry.queries().keys())[:CAP]
    assert len(head) == CAP
    outside = MUST_RUN_R8 - set(head)
    assert not outside, f"must-run keys fell outside the {CAP}-cap: {outside}"


def test_rolled_keys_are_exactly_the_named_fourteen():
    order = list(entry.queries().keys())
    head, tail = set(order[:CAP]), order[CAP:]
    assert ROLLED_TO_R9 & head == set(), "a rolled key leaked into the cap"
    assert ROLLED_TO_R9 <= set(tail)
    # and they sit immediately after the boundary, so the r9 rotation
    # inherits them first
    assert set(tail[: len(ROLLED_TO_R9)]) == ROLLED_TO_R9


def test_queries_and_oracle_emit_same_order():
    qkeys = list(entry.queries().keys())
    okeys = list(entry.oracle_sql().keys())
    # oracle registry is a subset (rows-only keys omit SQL) but the
    # relative order of shared keys must match, so the driver pairs
    # them correctly under the cap.
    shared = [k for k in qkeys if k in set(okeys)]
    assert shared == [k for k in okeys if k in set(qkeys)]

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

# Keys that MUST be inside the cap this round (round 12):
# (a) the 7 late-r11 non-finite-policy keys pinned as ROLLED_TO_R12
#     (VERDICT r11 #1 — discharge first);
# (b) ewma-smooth, the r11 pin's one accounting slip (query+oracle
#     changed in f5d280d, evidence r10 — VERDICT r11 #1 names it);
# (c) every key whose code or oracle changed THIS round — the two
#     advisor fixes (exact-dedup total-order survivor tie-break;
#     the NULL-embedding-seed degrade contract across the vector
#     seed keys) plus the NEW key incremental-knn;
# (d) the r8-evidenced stale cohort of ROLLED_TO_R12.
# dup-span-detect stays out by the judge's own condition: the r11
# dedup.py edits do NOT reach token_span_windows/duplicate_spans
# (verified against git diff f7a3334..HEAD), so its plan is unchanged
# and its r10 evidence is current.
MUST_RUN_R12 = {
    # (a) non-finite-policy leads
    "equi-inner-join", "json-coerce", "grouping-sets",
    "skew-salted-join", "conditional-agg", "anomaly-zscore",
    "mad-outliers",
    # (b) the pin slip
    "ewma-smooth",
    # (c) changed this round (advisor fixes, the new keys, and the
    # schema-drift col_or_null chains in both sync pipelines)
    "exact-dedup", "incremental-knn",
    "topk-similarity", "topk-similarity-pandas",
    "topk-similarity-lsh", "topk-similarity-ivf",
    "hybrid-rrf", "kmeans-assign", "kmeans-iterate",
    "patient-sync-pipeline", "roi-sync-pipeline",
    "protected-drop", "external-scan-pushdown", "decontaminate",
    # late-r12 NEW keys — zero driver history never waits
    "chunk-documents", "corpus-diff", "decontaminate-bloom",
    "quantiles-twophase", "corpus-prep-pipeline",
    # (d) r8-evidenced stale cohort (union-all, set-intersect and
    # max-ifnull-agg displaced by the three late-r12 NEW keys — see
    # the __spark_entry__ header for the per-key sibling-coverage
    # rationale; they lead round 13 with the other rolls)
    "ambiguity-count", "approx-distinct", "dedup-lastwin",
    "dlq-attempt-join", "dlq-attempt-read",
    "email-match-join",
    "embedding-centroid", "embedding-near-dup",
    "groupby-agg", "idmap-join",
    "knn-join", "knn-join-tables",
    "latest-per-group", "ledger-watermark-read",
    "processed-skip", "quality-score",
    "run-counters", "semi-join",
    "similarity-join", "sqlite-scan-pushdown",
    "text-analysis", "tiered-match-join",
    "window-rank",
}

# Keys deliberately rolled past the saturated cap to round 13 —
# pinned so the roll stays EXPLICIT, not an accident of ordering. The
# candidate set was 56 keys for a 50-cap (41 rolled from r11 +
# ewma-smooth + 14 changed this round); the rolls buy the weakest
# evidence available: simhash-dedup's driver check is rows-only by
# declared design (oracle-exact twin simhash-dedup-md5 hash-green
# r10, code unchanged since r8); full-scan, point-lookup, topk-sort,
# delta-scan are one-line projection/filter/sort scans unchanged
# since r8 whose scan+project shape every other key exercises on
# every run; doc-fingerprint is a one-line sha256 projection whose
# fingerprint algebra the in-cap exact-dedup key oracle-checks
# byte-for-byte in its window partition key. They must lead round 13
# together with any key whose code changes then.
ROLLED_TO_R13 = {
    "simhash-dedup", "full-scan", "point-lookup", "topk-sort",
    "delta-scan", "doc-fingerprint",
    # displaced late-r12 by the five NEW keys (zero-history rule)
    "union-all", "set-intersect", "max-ifnull-agg", "set-except",
    "token-count",
}


def test_priority_has_no_duplicates_and_resolves():
    qs = entry.queries()
    assert len(entry._PRIORITY) == len(set(entry._PRIORITY))
    missing = [k for k in entry._PRIORITY if k not in qs]
    assert not missing, f"_PRIORITY names unknown keys: {missing}"


def test_cap_is_exactly_saturated():
    # the round-12 cap is exactly the must-run set — any key that
    # gains a code/oracle change later in the round must DISPLACE a
    # stale-cohort key here, never silently exceed the cap
    assert len(MUST_RUN_R12) == CAP


def test_must_run_keys_inside_cap():
    head = list(entry.queries().keys())[:CAP]
    assert len(head) == CAP
    outside = MUST_RUN_R12 - set(head)
    assert not outside, f"must-run keys fell outside the {CAP}-cap: {outside}"


def test_rolled_keys_are_exactly_the_named_cohort():
    order = list(entry.queries().keys())
    head, tail = set(order[:CAP]), order[CAP:]
    assert ROLLED_TO_R13 & head == set(), "a rolled key leaked into the cap"
    assert ROLLED_TO_R13 <= set(tail)
    # and they sit immediately after the boundary, so the r13 rotation
    # inherits them first
    assert set(tail[: len(ROLLED_TO_R13)]) == ROLLED_TO_R13


def test_queries_and_oracle_emit_same_order():
    qkeys = list(entry.queries().keys())
    okeys = list(entry.oracle_sql().keys())
    # oracle registry is a subset (rows-only keys omit SQL) but the
    # relative order of shared keys must match, so the driver pairs
    # them correctly under the cap.
    shared = [k for k in qkeys if k in set(okeys)]
    assert shared == [k for k in okeys if k in set(qkeys)]

"""Guard the driver-registry emission order in ``__spark_entry__``.

The driver caps CORRECTNESS at ~50 entries per round, evaluating
``queries()`` in dict order. Round 5 learned the hard way that the cap
must be *counted*: the keys whose code changed that round landed at
positions 52-54 and got no driver row. These tests pin the invariants
so a future rotation can't repeat that.

Round 13 adds the LOW-ROTATION tier (VERDICT r12 #2): ~20
trivially-shaped keys whose machinery in-cap siblings exercise every
round get a documented 4-round refresh cadence instead of competing
with substantive keys for cap slots. The cadence is enforced HERE,
mechanically, against the CORRECTNESS_r*.json history — not by prose.
"""

from __future__ import annotations

import glob
import json
import os
import re

import __spark_entry__ as entry

CAP = 50
ROUND = 13  # bump each round — the cadence assertions key off it

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _latest_evidence() -> dict[str, int]:
    """Latest driver CORRECTNESS round per key, from the repo-root
    history files. Keys with no row yet (new this round) are absent."""
    latest: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(_HERE, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"_r(\d+)\.json$", path).group(1))
        with open(path) as fh:
            for key in json.load(fh):
                latest[key] = max(latest.get(key, 0), rnd)
    return latest


# Keys that MUST be inside the cap this round (round 13):
# (a) the 11 keys pinned as ROLLED_TO_R13 by round 12 — discharged
#     first, as VERDICT r12 #1 mandates;
# (b) every key whose code or oracle changed THIS round: corpus-diff
#     (snapshot_diff digest injectivity — advisor r12), decontaminate-
#     bloom (m guard + exact-vs-prefiltered auto-selector), the NEW
#     corpus-refresh-pipeline and epoch-millis-eastern (zero driver
#     history never waits), incremental-knn (bucket_cap lever), and —
#     late r13 — the 14 vector-tier keys whose code AND oracles
#     gained the finite-component scope (the component-poison class);
# (c) 18 of the 32 r9-evidenced keys (the other 14 were displaced by
#     the vector tier — changed code outranks stale-but-unchanged —
#     and are pinned ROLLED_TO_R14 below);
# (d) 2 oldest-r10 refreshes: simhash-dedup-md5 (backs the rows-only
#     twin's trust), dup-span-detect (exempted two rounds on
#     byte-identity arguments — re-faced now).
MUST_RUN_R13 = {
    # (a) the ROLLED_TO_R13 leads
    "simhash-dedup", "full-scan", "point-lookup", "topk-sort",
    "delta-scan", "doc-fingerprint",
    "union-all", "set-intersect", "max-ifnull-agg", "set-except",
    "token-count",
    # (b) changed this round
    "corpus-diff", "decontaminate-bloom", "corpus-refresh-pipeline",
    "incremental-knn", "epoch-millis-eastern",
    "topk-similarity", "topk-similarity-pandas",
    "topk-similarity-lsh", "topk-similarity-ivf",
    "knn-join", "knn-join-tables", "knn-join-lsh",
    "similarity-join", "embedding-near-dup", "embedding-centroid",
    "kmeans-assign", "kmeans-iterate", "hybrid-rrf", "array-ops",
    # (c) the kept r9 cohort
    "bm25-topk", "bool-normalize", "bucketed-join", "coalesce-chain",
    "const-columns", "cube-agg", "drop-null-props", "eastern-date",
    "email-normalize", "epoch-millis", "hll-sketch-merge",
    "identifier-canon", "json-payload", "merge-upsert",
    "multimodal-cols", "natural-key", "override-skip",
    "zorder-layout",
    # (d) oldest-r10 refreshes
    "simhash-dedup-md5", "dup-span-detect",
}

# The set pinned by round 12's test file — r13 must discharge it
# exactly (VERDICT r12 #1).
ROLLED_TO_R13 = {
    "simhash-dedup", "full-scan", "point-lookup", "topk-sort",
    "delta-scan", "doc-fingerprint",
    "union-all", "set-intersect", "max-ifnull-agg", "set-except",
    "token-count",
}

# Keys displaced from the r13 cap by late-round changed/new keys —
# pinned as the r14 leads (the ROLLED_TO_R13 convention): they rotate
# first next round, together with the rest of the r10-evidenced
# cohort (which turns 4 rounds old at r14) and any key whose code or
# oracle changes then. The 14 r9-evidenced members were displaced by
# the vector-tier finite-component fix; at r14 their evidence turns
# five rounds old, so the cadence test forces them into that cap.
ROLLED_TO_R14 = {
    "threetier-composite", "heavy-hitters",
    "ambiguity-multi", "ambiguity-no-key", "dedup-rate-report",
    "dq-audit", "fk-orphans", "lock-projection", "next-birthday",
    "patient-projection", "phi-redact", "remote-get", "remote-search",
    "retry-threshold", "roi-projection", "vocab-stats",
}


def test_priority_has_no_duplicates_and_resolves():
    qs = entry.queries()
    assert len(entry._PRIORITY) == len(set(entry._PRIORITY))
    missing = [k for k in entry._PRIORITY if k not in qs]
    assert not missing, f"_PRIORITY names unknown keys: {missing}"


def test_cap_is_exactly_saturated():
    # any key that gains a code/oracle change later in the round must
    # DISPLACE a filler key here, never silently exceed the cap
    assert len(MUST_RUN_R13) == CAP


def test_must_run_keys_inside_cap():
    head = list(entry.queries().keys())[:CAP]
    assert len(head) == CAP
    outside = MUST_RUN_R13 - set(head)
    assert not outside, f"must-run keys fell outside the {CAP}-cap: {outside}"


def test_rolled_to_r13_discharged():
    # the r12 roll leads the cap, as pinned
    head = list(entry.queries().keys())[:CAP]
    assert ROLLED_TO_R13 <= set(head)
    assert set(head[: len(ROLLED_TO_R13)]) == ROLLED_TO_R13


def test_rolled_to_r14_sit_first_after_the_boundary():
    order = list(entry.queries().keys())
    head, tail = set(order[:CAP]), order[CAP:]
    assert ROLLED_TO_R14 & head == set(), "a rolled key leaked into the cap"
    assert set(tail[: len(ROLLED_TO_R14)]) == ROLLED_TO_R14


def test_low_rotation_tier_membership_resolves():
    qs = entry.queries()
    unknown = entry._LOW_ROTATION - set(qs)
    assert not unknown, f"_LOW_ROTATION names unknown keys: {unknown}"
    # tier keys must be a deliberate, bounded list — growth needs the
    # same sibling-coverage rationale the current members carry
    assert len(entry._LOW_ROTATION) == 21


def test_low_rotation_cadence():
    """The tier invariant, enforced against the driver history: a
    low-rotation key's evidence may never be older than 4 rounds at
    the END of the current round — i.e. by round R it must either
    carry evidence >= R-3 already or sit inside this round's cap.
    (Code/oracle changes re-enter the cap immediately via the
    engine-wide changed-code rule; that arm is procedural and shows
    up as membership in MUST_RUN.)"""
    latest = _latest_evidence()
    stale = {
        k
        for k in entry._LOW_ROTATION
        if latest.get(k, 0) < ROUND - 3 and k not in MUST_RUN_R13
    }
    assert not stale, f"low-rotation keys past their 4-round cadence: {stale}"


def test_no_key_evidence_older_than_four_rounds():
    """The registry-wide floor (VERDICT r12 #1's target, made
    mechanical): every key either has driver evidence within the last
    4 rounds or is in this round's cap. New keys (no history) must be
    in-cap — the zero-history-never-waits rule."""
    latest = _latest_evidence()
    qs = entry.queries()
    violations = {
        k
        for k in qs
        if latest.get(k, 0) < ROUND - 4 and k not in MUST_RUN_R13
    }
    assert not violations, (
        f"keys whose evidence would end the round older than 4 rounds: "
        f"{violations}"
    )


def test_queries_and_oracle_emit_same_order():
    qkeys = list(entry.queries().keys())
    okeys = list(entry.oracle_sql().keys())
    # oracle registry is a subset (rows-only keys omit SQL) but the
    # relative order of shared keys must match, so the driver pairs
    # them correctly under the cap.
    shared = [k for k in qkeys if k in set(okeys)]
    assert shared == [k for k in okeys if k in set(qkeys)]

"""Guard the driver-registry emission order in ``__spark_entry__``.

The driver caps CORRECTNESS at ~50 entries per round, evaluating
``queries()`` in dict order. Round 5 learned the hard way that the cap
must be *counted*: the keys whose code changed that round landed at
positions 52-54 and got no driver row. These tests pin the invariants
so a future rotation can't repeat that.

Round 13 added the LOW-ROTATION tier (VERDICT r12 #2): 21
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
ROUND = 14  # bump each round — the cadence assertions key off it

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


# Keys that MUST be inside the cap this round (round 14):
# (a) the 16 keys pinned as ROLLED_TO_R14 by round 13 — discharged
#     first, as VERDICT r13 #1 mandates (their r9/r10 evidence hits
#     the cadence floor this round);
# (b) every key whose code or oracle changed THIS round: the r13
#     advisor fixes — knn-join (exact-branch Inf-norm exclusion),
#     the finite_vector/query_vector empty-embedding scope (the four
#     topk-similarity variants, hybrid-rrf, both kmeans keys),
#     corpus-refresh-pipeline (fully-retired langs dropped from the
#     subtractive fold), incremental-knn (bucket_cap enforced at
#     append time, VERDICT r13 #4). knn-join-tables / knn-join-lsh
#     are byte-identity exempt (the exact-branch edit is dead code on
#     the bucketed branches; neither calls query_vector) and carry
#     fresh r13 evidence;
# (c) the r10-evidenced cohort (21 of 24 — three displaced into
#     ROLLED_TO_R15 by the late-round (d) changes), whose evidence
#     turns four rounds old at r14's end;
# (d) keys changed late in the round by the duplicate-key/tie class.
MUST_RUN_R14 = {
    # (a) the ROLLED_TO_R14 leads
    "threetier-composite", "heavy-hitters",
    "ambiguity-multi", "ambiguity-no-key", "dedup-rate-report",
    "dq-audit", "fk-orphans", "lock-projection", "next-birthday",
    "patient-projection", "phi-redact", "remote-get", "remote-search",
    "retry-threshold", "roi-projection", "vocab-stats",
    # (b) changed this round
    "knn-join",
    "topk-similarity", "topk-similarity-pandas",
    "topk-similarity-lsh", "topk-similarity-ivf",
    "hybrid-rrf", "kmeans-assign", "kmeans-iterate",
    "corpus-refresh-pipeline", "incremental-knn",
    # (c) the r10 cohort (20 of 24 — four displaced by (d))
    "audio-resample", "bigram-lift-topk", "distinct-agg",
    "domain-stats", "entropy-quality", "explode-posexplode",
    "funnel-steps", "gap-fill", "heavy-hitters-by-group",
    "image-resize", "lag-lead", "length-histogram",
    "mix-weights", "ngram-topk", "ngram-topk-sketch", "null-safe-join",
    "range-join", "rollup-agg",
    "trigram-lm-score", "video-frame-index",
    # (d) changed or NEW late in round 14 — the duplicate-key/tie
    # poison class fixes (fixtures/dupkey_tie_probe.py): merge-upsert's
    # payload-arbitration total order (code + oracle), running-window
    # and lag-lead's o_totalprice tie-break (lag-lead already in (c)),
    # repetition-metrics' per-physical-row oracle regroup, and the new
    # pack-chunks composite (zero-history-never-waits)
    "merge-upsert", "running-window", "repetition-metrics",
    "pack-chunks",
}

# The set pinned by round 13's test file — r14 must discharge it
# exactly (VERDICT r13 #1).
ROLLED_TO_R14 = {
    "threetier-composite", "heavy-hitters",
    "ambiguity-multi", "ambiguity-no-key", "dedup-rate-report",
    "dq-audit", "fk-orphans", "lock-projection", "next-birthday",
    "patient-projection", "phi-redact", "remote-get", "remote-search",
    "retry-threshold", "roi-projection", "vocab-stats",
}

# Keys displaced from the r14 cap by late-round changed/new keys (the
# ROLLED_TO_R13/R14 convention): the duplicate-key/tie class changed
# merge-upsert / running-window / repetition-metrics, and
# pack-chunks shipped new, after the cap was counted — displacing
# these four (c)-cohort members. Their r10 evidence is exactly 4
# rounds old at r14's end — inside the hard floor below — and they
# lead the r15 cap.
ROLLED_TO_R15: set[str] = {
    "split-assign", "stratified-sample", "watermark-filter",
    "merge-intervals",
}


def test_priority_has_no_duplicates_and_resolves():
    qs = entry.queries()
    assert len(entry._PRIORITY) == len(set(entry._PRIORITY))
    missing = [k for k in entry._PRIORITY if k not in qs]
    assert not missing, f"_PRIORITY names unknown keys: {missing}"


def test_cap_is_exactly_saturated():
    # any key that gains a code/oracle change later in the round must
    # DISPLACE a filler key here, never silently exceed the cap
    assert len(MUST_RUN_R14) == CAP


def test_must_run_keys_inside_cap():
    head = list(entry.queries().keys())[:CAP]
    assert len(head) == CAP
    outside = MUST_RUN_R14 - set(head)
    assert not outside, f"must-run keys fell outside the {CAP}-cap: {outside}"


def test_rolled_to_r14_discharged():
    # the r13 roll leads the cap, as pinned
    head = list(entry.queries().keys())[:CAP]
    assert ROLLED_TO_R14 <= set(head)
    assert set(head[: len(ROLLED_TO_R14)]) == ROLLED_TO_R14


def test_rolled_to_r15_sit_first_after_the_boundary():
    order = list(entry.queries().keys())
    head, tail = set(order[:CAP]), order[CAP:]
    assert ROLLED_TO_R15 & head == set(), "a rolled key leaked into the cap"
    assert set(tail[: len(ROLLED_TO_R15)]) == ROLLED_TO_R15


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
        if latest.get(k, 0) < ROUND - 3 and k not in MUST_RUN_R14
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
        if latest.get(k, 0) < ROUND - 4 and k not in MUST_RUN_R14
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

#!/usr/bin/env python
"""Giant-rows probe (eleventh poison class): plant single PATHOLOGICAL
documents — hundreds of kB, the thing a 100 TB crawl corpus contains
millions of — in a COPY of the testdata and run every oracle-backed key
through the parity compare, watching for per-row memory blowups in the
Arrow kernels, unbounded output explosions in the per-token explode
plans, and two-sided disagreement on the reference's DLQ clamps
(payload ≤90000 / error ≤10000, main.py:398-399).

Every prior poison class planted many SMALL hostile values; this one
plants few ENORMOUS rows, because the failure modes are different:
  - a 300 kB text row exploded per-token multiplies into 60 000+
    output rows from ONE input row (span windows, trigrams, chunks);
  - an Arrow batch is bounded by ROW COUNT by default (10 000), so a
    run of giant rows is a multi-GB batch unless bytes are bounded;
  - the single-cell intermediate (the token array, the ngram array)
    is megabytes in ONE UnsafeRow cell;
  - string-kernel cost is quadratic if any step re-evaluates the
    tokenize per window (the trigram-lm r9 lesson, now at 1000x the
    stakes).

Lanes (deterministic, by fixed doc_id — one row each, so the corpus
stats stay recognizable and any blowup is attributable):
  17 -> minified-JS crawl page, ~300 kB, whitespace-sparse: the
        raw-whitespace tokenizer sees ~8k punctuation-glued tokens
        while normalized_text turns the punctuation into separators
        and sees ~56k small ones — a 7x fan-out between the two views
        of the SAME row.
  34 -> one single alphanumeric token, 200 000 chars, zero whitespace
        anywhere: tokens() must return exactly one element holding the
        whole string; shingle/fingerprint kernels get a 200 kB cell.
  51 -> boilerplate repeat, ~300 kB of ONE sentence repeated: extreme
        within-doc duplication — every span window is a within-doc
        repeat, the worst case for the dup-span explode and for
        fingerprint cardinality assumptions.
  68 -> the DLQ payload boundary row: >90 000 chars with multibyte
        codepoints straddling position 90 000, so the engine's
        truncate() and the oracle's substring must agree in CODEPOINTS
        (never bytes) exactly at the reference's clamp.
  85 -> high-vocabulary crawl page, ~300 kB with ~40 000 DISTINCT
        tokens from one row: sketch/heavy-hitter state and vocab
        operators see a single row contributing more distinct keys
        than the rest of the corpus combined.

n_chars is updated to length(text) for the poisoned rows so
length-aware operators see the truth (a giant doc hiding behind a
stale small n_chars would dodge the operators this probe exists to
stress).

Adjudication (r14, sf0.001, full 163-key oracle registry, idle host):
  **161 OK / 0 MISMATCH / 0 engine errors / 0 DuckDB errors / 0 memory
  blowups; suite wall 242.7 s** (clean-corpus parity is ~180 s, so the
  five giant rows cost ~35%, all volume-linear); slowest keys under
  poison: knn-join-tables 12.3 s (vector key, poison-independent),
  corpus-prep 9.5, corpus-refresh 9.1, fuzzy-dedup 9.1. The 2 non-OK
  are BOTH the documented sketch-guard boundary (loud, never silent):
  `ngram-topk-sketch` / `heavy-hitters-by-group` raised their in-plan
  provable-regime guards — the giant lanes' char-trigram mass flattens
  the tail below sketch_k=255's pigeonhole bound; a larger sketch_k
  (4095) returns the exact top-k again (same knob as the
  adversarial-text arm; pinned in
  tests/test_giant_rows.py::test_sketch_guard_under_giant_vocab).
  fuzzy-dedup / clusters / survivorship stay EXACT (a giant doc is its
  own cluster — the banding boundary is about diluting planted pairs,
  not adding mass). Chunker stride arithmetic at ~49k tokens, span
  linearity, the single-token degenerate case, and the three-way DLQ
  clamp agreement (engine / DuckDB / the reference's literal Python
  slice, astral codepoint at the boundary) are all pinned in
  tests/test_giant_rows.py.

The probe's real finds — each fixed, none visible on ordinary corpora:
  1. ENGINE: pii-scrub's textbook unbounded email regex sent Java's
     backtracking matcher quadratic on the 200k single-token lane
     (pinned the executor for minutes; DuckDB's RE2 is linear).
     Fixed with \b anchoring + RFC-bounded quantifiers — one pattern
     string feeds both engines, so parity is unchanged (see
     queries_text._PII_EMAIL).
  2. ORACLE HARNESS: the lateral `FROM toks, unnest(generate_series)`
     + `list[i:i+k]` window idiom copies the whole token list per
     output row — dup-span-rate's oracle alone ran >25 min on ONE
     poisoned row. All word-window/gram oracles now share
     sqlfrags.word_ngram_rows (zipped unnest + lead(), linear;
     value-equality old-vs-new verified at sf0.001 + sf0.01 before
     the swap). Same class: the lateral-JOIN form of plain unnest
     (bigram-lift's uni, entropy-quality's chars) vs the streaming
     SELECT-list unnest — 76.5 s vs 0.1 s measured.
  3. ORACLE HARNESS: DuckDB re-evaluates a non-materialized 1-row
     aggregate CTE per probe row under CROSS JOIN — bigram-lift-topk's
     `tot` cost 60 s of its 195.7 s; `AS MATERIALIZED` on uni/tot
     makes the whole key 0.1 s.
Arrow posture: `spark.sql.execution.arrow.maxBytesPerBatch` (Spark 4)
rides in _RUNTIME_CONFS — measured locally to split a giant-row stream
into byte-bounded batches where the row-count bound alone built one
~64 MB batch (tests/test_giant_rows.py::test_arrow_batches_byte_bounded);
at 10k rows/batch of crawl-page-sized rows that is the difference
between a bounded kernel and a multi-GB allocation per core.

Usage:
    python fixtures/giant_rows_probe.py [sf_dir] [key ...]
"""
from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _minified_js(target: int = 300_000) -> str:
    """Deterministic minified-JS-like page: near-zero whitespace, long
    punctuation-dense statements with a per-repeat counter so the
    content never cycles exactly."""
    parts = []
    i = 0
    size = 0
    while size < target:
        frag = (
            f"function f{i}(a,b){{var c{i}=a*{i}+b;return c{i}>>1}};"
            f"var x{i}=f{i}({i},{i + 1});console.log(JSON.stringify("
            f'{{"k{i}":x{i},"arr":[{i},{i + 1},{i + 2}]}}));'
        )
        parts.append(frag)
        size += len(frag)
        i += 1
    return "".join(parts)[:target]


def _single_token(target: int = 200_000) -> str:
    """One alnum token, no whitespace anywhere: base36-ish counter
    stream so the content is aperiodic."""
    parts = []
    i = 0
    size = 0
    while size < target:
        parts.append(f"z{i:x}")
        size += len(parts[-1])
        i += 1
    return "".join(parts)[:target]


def _boilerplate(target: int = 300_000) -> str:
    sent = "the quick brown fox jumps over the lazy dog again and again "
    return (sent * (target // len(sent) + 1))[:target]


def _dlq_boundary(target: int = 95_000) -> str:
    """>90k chars with an astral-plane codepoint at index 89 999
    (0-based), so a codepoint-counting clamp keeps it as the LAST
    kept char and a byte- or UTF-16-counting clamp splits or drops
    it. Multibyte runs lead up to and follow the boundary."""
    head = ("payload" + "中文" + "x") * 9000  # 10 chars/rep -> 90000
    head = head[:89_999]
    boundary = "\U0001f600"  # index 89999: the 90000th codepoint
    tail = ("café" + "y" * 6) * 500
    return (head + boundary + tail)[:target]


def _high_vocab(target: int = 300_000) -> str:
    """~40k DISTINCT whitespace tokens from one row (aperiodic counter
    words, each unique)."""
    parts = []
    i = 0
    size = 0
    while size < target:
        parts.append(f"w{i:x}q{(i * 2654435761) & 0xFFFF:x}")
        size += len(parts[-1]) + 1
        i += 1
    return " ".join(parts)[:target]


LANES = {
    17: _minified_js,
    34: _single_token,
    51: _boilerplate,
    68: _dlq_boundary,
    85: _high_vocab,
}


def build_giant_dir(sf_dir: str) -> str:
    out = tempfile.mkdtemp(prefix="sg-giant-")
    con = duckdb.connect()
    case = " ".join(f"WHEN doc_id = {k} THEN ?" for k in LANES)
    for t in TABLES:
        src = os.path.join(sf_dir, f"{t}.parquet")
        dst = os.path.join(out, f"{t}.parquet")
        if t == "documents":
            con.execute(
                f"""COPY (
                  SELECT doc_id,
                         CASE {case} ELSE text END AS text,
                         lang, source,
                         CASE {case.replace('?', 'length(CAST(? AS VARCHAR))')}
                              ELSE n_chars END AS n_chars
                  FROM read_parquet('{src}')
                ) TO '{dst}' (FORMAT PARQUET)""",
                [f() for f in LANES.values()] + [f() for f in LANES.values()],
            )
        else:
            shutil.copyfile(src, dst)
    con.close()
    return out


def main() -> None:
    args = sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.001"
    only = set(args[1:])
    adv = build_giant_dir(sf_dir)
    print(f"giant-rows dir: {adv}")

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests"))
    from test_oracle_parity import _duck, _rowset

    from reverse_etl_homebrew_spark import queries as Q
    from reverse_etl_homebrew_spark.session import get_spark

    spark = get_spark("giant-rows-probe")
    duck = _duck(adv)

    counts = {"OK": 0, "MISMATCH": 0, "SPARK_ERR": 0, "DUCK_ERR": 0, "BOTH_RAISE": 0}
    slow = []
    t_suite = time.monotonic()
    for name, sql in Q.ORACLE.items():
        if only and name not in only:
            continue
        s_err = d_err = None
        t0 = time.monotonic()
        try:
            sdf = Q.QUERIES[name](spark, adv)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            s_err = str(e)[:200]
        t_spark = time.monotonic() - t0
        try:
            cur = duck.execute(sql)
            d_cols = [c[0] for c in cur.description]
            d_rows = cur.fetchall()
        except Exception as e:  # noqa: BLE001
            d_err = str(e)[:200]
        dt = time.monotonic() - t0
        print(f"[{name}] spark {t_spark:.1f}s duck {dt - t_spark:.1f}s",
              flush=True)
        slow.append((dt, name))
        if s_err and d_err:
            verdict = "BOTH_RAISE"
        elif s_err:
            verdict = "SPARK_ERR"
        elif d_err:
            verdict = "DUCK_ERR"
        elif sorted(s_cols) != sorted(d_cols):
            verdict = "MISMATCH"
        elif _rowset(s_cols, s_rows) != _rowset(d_cols, d_rows):
            verdict = "MISMATCH"
        else:
            verdict = "OK"
        counts[verdict] += 1
        if verdict != "OK":
            print(f"{verdict:10s} {name} {s_err or d_err or ''}")
    print("summary:", counts)
    print(f"suite wall: {time.monotonic() - t_suite:.1f}s")
    print("slowest under poison:",
          [(n, round(d, 2)) for d, n in sorted(slow, reverse=True)[:8]])
    spark.stop()


if __name__ == "__main__":
    main()

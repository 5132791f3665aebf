#!/usr/bin/env python
"""Adversarial-text probe: append deterministic hostile snippets to
documents.text in a COPY of the testdata and run every oracle-backed
key through the parity compare — the dialect-divergence hunt for the
text tier (Spark compiles Java regex, DuckDB compiles RE2; quoting,
class semantics, and multibyte handling are the classic split points;
ASCII-vs-unicode ``\\s`` is the one KNOWN divergence, so the injected
whitespace stays ASCII).

Snippets by doc_id % 7:
  1 -> regex metacharacters (backslash, $1, classes, braces, pipe)
  2 -> quote/format soup ("double" 'single' %s {fmt})
  3 -> one 5000-char token (tokenizer + shingle stress)
  4 -> non-ASCII letters (cafe-with-accent, CJK, Greek, sharp-s)
  5 -> ASCII whitespace runs (\\n\\n, \\t) and edge spacing
  6 -> HTML/JSON-ish fragments (<div class=..>, {"k": [1,2]})

First-run adjudication (r10, sf0.001): 149/154 OK outright; ZERO
silent dialect divergences (the Java-regex-vs-RE2 split never
materialized — the normalize/tokenize algebra is dialect-safe on all
six snippet classes). The five non-OK keys are documented operator
boundaries with working knobs, both MEASURED on this corpus:
- ngram-topk-sketch / heavy-hitters-by-group raised their in-plan
  provable-regime guards (loud, never silent truncation): the
  adversarial grams flattened the trigram distribution past
  sketch_k=255's pigeonhole bound; sketch_k=1023 returns the EXACT
  oracle top-50 again.
- fuzzy-dedup / -clusters / dedup-survivorship failed their oracle
  recall gate because the snippets DEGRADED planted clone pairs into
  the 0.6-0.8 jaccard gray zone below the 4x8 banding's S-curve
  midpoint (0.84): bands=4 missed 16 of 27 true pairs, bands=8
  missed 1, bands=16 is EXACTLY equal — the documented
  banding-steepness knob, behaving as the S-curve math predicts.

Usage:
    python fixtures/adversarial_text_probe.py [sf_dir] [key ...]
"""
from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

SNIPPETS = {
    1: r"back\slash $1 (group) [cla-ss] {brace} .*+? |pipe ^caret",
    2: """"double" 'single' %s %d {fmt} `tick` ~tilde~""",
    3: "x" * 5000,
    4: "café 中文 Ωmega straße",
    5: "line1\n\nline2\tend  double  space ",
    6: '<div class="x">&amp;</div> {"k": [1, 2], "s": "v"}',
}

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def build_adversarial_dir(sf_dir: str) -> str:
    out = tempfile.mkdtemp(prefix="sg-advtext-")
    con = duckdb.connect()
    case = " ".join(
        f"WHEN doc_id % 7 = {k} THEN text || ' ' || ?" for k in SNIPPETS
    )
    for t in TABLES:
        src = os.path.join(sf_dir, f"{t}.parquet")
        dst = os.path.join(out, f"{t}.parquet")
        if t == "documents":
            con.execute(
                f"""COPY (
                  SELECT doc_id,
                         CASE {case} ELSE text END AS text,
                         lang, source, n_chars
                  FROM read_parquet('{src}')
                ) TO '{dst}' (FORMAT PARQUET)""",
                list(SNIPPETS.values()),
            )
        else:
            shutil.copyfile(src, dst)
    con.close()
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    adv = build_adversarial_dir(sf_dir)
    print(f"adversarial dir: {adv}")

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests"))
    from test_oracle_parity import _duck, _rowset

    from reverse_etl_homebrew_spark import queries as Q
    from reverse_etl_homebrew_spark.session import get_spark

    spark = get_spark("advtext-probe")
    duck = _duck(adv)

    counts = {"OK": 0, "MISMATCH": 0, "SPARK_ERR": 0, "DUCK_ERR": 0, "BOTH_RAISE": 0}
    for name, sql in Q.ORACLE.items():
        if only and name not in only:
            continue
        s_err = d_err = None
        try:
            sdf = Q.QUERIES[name](spark, adv)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            s_err = str(e)[:160]
        try:
            cur = duck.execute(sql)
            d_cols = [c[0] for c in cur.description]
            d_rows = cur.fetchall()
        except Exception as e:  # noqa: BLE001
            d_err = str(e)[:160]
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
    spark.stop()


if __name__ == "__main__":
    main()

"""Constructive ROUND-boundary safety for the two former KNOWN
RESIDUAL sites (functions/exactmath.py header).

Round 9 moved both `ewma-smooth` and `trigram-lm-score` onto exact
integer half-away rounding (round6_dec6_over_int), eliminating the
shortest-repr-vs-binary double-ROUND divergence entirely — motivated
by a measured sf0.1 ewma pre-round value only 9.2e-7 (in 1e6-scaled
units) from a .5e-7 cut, inside the divergence slack at 10x data.

What remains, and what this file PROVES about the tested data, in
exact integer arithmetic (no doubles anywhere in the argument):

- ewma: numerator (decimal(38,6) weighted sum) and denominator
  (integer coefficient mass) are exact and engine-identical, so the
  result is exact, full stop. The test shows the guard_dec_units
  envelope is never approached (max units magnitude vs int64).
- trigram: each engine casts ITS OWN ln() doubles to decimal(38,12)
  before the exact sum; a 1-ulp cross-engine ln difference can move
  a term's 1e-12-unit representation by at most 1, so the per-doc
  integer numerator a = s12 can differ by at most n (= occurrence
  count) between engines. halfaway(a / b) with b = n*1e6 changes
  only if 2*(a mod b) crosses b — so if the integer distance
  |2*(a mod b) - b| exceeds 2n for every doc, NO reachable ln
  divergence can flip the rounded result. The test asserts a 10x
  margin on that bound at every tested SF.
"""

from __future__ import annotations

import os
from decimal import Decimal

import duckdb
import pytest

SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
_env_sf = os.environ.get("SPARK_GRAFT_TEST_SF_DIR")
if _env_sf and _env_sf not in SF_DIRS:
    SF_DIRS.append(_env_sf)

_EWMA_DEPTH = 10
_EWMA_COEFFS = [7**k * 10 ** (_EWMA_DEPTH - 1 - k) for k in range(_EWMA_DEPTH)]
_CO_SQL = "[" + ", ".join(map(str, _EWMA_COEFFS)) + "]"

_INT64_MAX = 2**63 - 1


@pytest.mark.parametrize("sf", SF_DIRS)
def test_ewma_units_stay_far_inside_the_int64_envelope(sf):
    """The guarded decimal->units cast can never fire on this data:
    the largest |SUM(wx)|*1e6 is orders of magnitude below
    int64max - 3*SUM(w). (The envelope tolerates |value| up to
    ~2.8e3; the data's max is ~560.)"""
    con = duckdb.connect()
    num_s, den = con.execute(
        f"""
        WITH v AS (
          SELECT user_id, value,
                 ROW_NUMBER() OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS rn
          FROM read_parquet('{sf}/events.parquet') WHERE value IS NOT NULL
        ), terms AS (
          SELECT a.user_id, a.rn AS arn,
                 CAST(b.value AS DECIMAL(38,6))
                   * ({_CO_SQL}[a.rn - b.rn + 1]) AS wx,
                 {_CO_SQL}[a.rn - b.rn + 1] AS w
          FROM v a JOIN v b ON a.user_id = b.user_id
           AND b.rn BETWEEN a.rn - {_EWMA_DEPTH - 1} AND a.rn
        ), sums AS (
          SELECT SUM(wx) AS s, SUM(w) AS w FROM terms GROUP BY user_id, arn
        )
        SELECT CAST(MAX(abs(s)) AS VARCHAR), CAST(MAX(w) AS BIGINT) FROM sums
        """
    ).fetchone()
    con.close()
    units_max = int(Decimal(num_s) * 10**6)
    envelope = _INT64_MAX - 3 * den
    # measured headroom is ~14x at sf0.1 (units_max ~6.4e17 vs the
    # 9.2e18 envelope — |value| up to ~560 against the ~2.8e3 cap)
    assert units_max * 10 < envelope, (units_max, envelope)


@pytest.mark.parametrize("sf", SF_DIRS)
def test_trigram_integer_margin_beats_ln_quantization_shift(sf):
    """For every document, the exact integer numerator a = s12 sits
    at least 10x the worst-case cross-engine shift (n units) away
    from the half-away cut of a/(n*1e6): |2*(a mod b) - b| > 20*n.
    Therefore no 1-ulp ln() difference between the JVM and libm can
    change any rounded xent_nats at this SF — constructively, not
    probabilistically."""
    con = duckdb.connect()
    rows = con.execute(
        f"""
        WITH norm AS (
          SELECT doc_id AS id,
                 trim(regexp_replace(regexp_replace(lower(text),
                      '[^a-z0-9\\s]', ' ', 'g'), '\\s+', ' ', 'g')) AS t
          FROM read_parquet('{sf}/documents.parquet')
        ), grams AS (
          SELECT id, substr(t, i, 3) AS g
          FROM norm,
               unnest(generate_series(1, greatest(length(t) - 2, 1))) AS u(i)
        ), c3 AS (
          SELECT g, COUNT(*) AS c3 FROM grams GROUP BY g
        ), ctx AS (
          SELECT substr(g, 1, 2) AS pfx, SUM(c3) AS c2 FROM c3 GROUP BY pfx
        ), vocab AS (
          SELECT COUNT(DISTINCT substr(g, 3, 1)) AS v_next FROM c3
        ), model AS (
          SELECT g, -ln((c3 + CAST(1 AS DOUBLE)) / (c2 + v_next)) AS nll
          FROM c3 JOIN ctx ON substr(g, 1, 2) = pfx CROSS JOIN vocab
        )
        SELECT CAST(SUM(CAST(nll AS DECIMAL(38,12))) AS VARCHAR) AS s,
               COUNT(*) AS n
        FROM grams JOIN model USING (g)
        GROUP BY id
        """
    ).fetchall()
    con.close()
    assert rows
    worst = None
    for s_str, n in rows:
        a = int(Decimal(s_str) * 10**12)
        assert a >= 0  # -ln of a probability < 1
        b = n * 1_000_000
        margin = abs(2 * (a % b) - b)
        if worst is None or margin / n < worst[0] / worst[1]:
            worst = (margin, n)
        assert margin > 20 * n, (
            f"doc with n={n} sits {margin} units from the cut — "
            f"inside the 20n ln-quantization slack"
        )
    # envelope check: the 1e-12-units numerator never approaches int64
    max_a = max(int(Decimal(s) * 10**12) for s, _ in rows)
    max_b = max(n for _, n in rows) * 1_000_000
    assert max_a * 100 < _INT64_MAX - 3 * max_b

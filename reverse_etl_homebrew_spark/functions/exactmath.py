"""Cross-engine exact rounding of rational values.

``ROUND(CAST(a AS DOUBLE) / b, 6)`` is NOT cross-engine stable when
the true rational a/b lands exactly on a .5e-7 cut: Spark rounds the
shortest decimal repr of the double (``BigDecimal.valueOf`` →
HALF_UP) while DuckDB rounds the raw binary value (libm), and the two
can differ by 1e-6. Found by the r8 full-registry sf0.1 parity sweep
on ``embedding-centroid`` (mean of 6-decimal decimals over n=192 —
denominators whose factors divide the 2·10⁶ scale hit the cut with
real probability).

The stable device: compute the 6-decimal rounding ENTIRELY in
integers — half-away-from-zero division in 1e-6 units,
``sign(a) * ((2·|a| + b) div (2·b))`` with a pre-scaled numerator —
then ONE exact division by 1e6 at the end (both engines perform the
identical IEEE op on identical integers). Nonnegative operands make
Spark's ``div`` (truncation) and DuckDB's ``//`` (floor) agree.

Two entry points per engine, by numerator kind:

- integer numerator (counts):       units = a · 1e6
- decimal(38,6) numerator (sums):   units = CAST(a · 1e6 AS BIGINT)
  (exact — scale-6 decimals times 1e6 are integral)

This is a leaf module (no package imports) so query modules and
``sqlfrags`` can both use it without cycles.

Hardened call sites (r8): embedding-centroid, kmeans-iterate means,
mix-weights, markov-transitions, vocab-stats TTR, dedup-rate-report,
both containment keys. KNOWN RESIDUAL sites kept on double ROUND with
eyes open: `ewma-smooth` and `trigram-lm-score` have decimal-grid
numerators whose 1e-6-scaled magnitude can overflow BIGINT (weights
up to 1e9 × values), and DuckDB's ``//`` on DECIMAL performs TRUE
division (measured: 10//4 = 2.5), so no overflow-safe shared integer
algebra exists without INT128; their boundary-hit probability is far
lower (irrational log terms / non-dyadic weight sums) and all three
SF sweeps are green. percent_rank/cume_dist (`rank-funcs`) divide by
n-1/n whose values at every test SF are coprime to the 2·10⁶ scale
(exact cuts impossible there — parity-safe, left as builtins).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

SCALE = 1_000_000


def round6_int_ratio(num_sql: str, den_sql: str) -> Column:
    """Exact 6-decimal half-away rounding of ``num/den`` for INTEGER
    SQL expressions (``den > 0``), as a double Column. ``num`` may be
    negative."""
    return _units_to_double(
        f"(2 * abs({num_sql}) * {SCALE} + ({den_sql})) div (2 * ({den_sql}))",
        num_sql,
    )


def round6_dec6_over_int(sum6_sql: str, den_sql: str) -> Column:
    """Exact 6-decimal half-away rounding of ``s/den`` where ``s`` is
    ALREADY in 1e-6 units (a decimal(38,6) sum times 1e6, cast to
    long) and ``den`` is a positive integer expression."""
    return _units_to_double(
        f"(2 * abs({sum6_sql}) + ({den_sql})) div (2 * ({den_sql}))",
        sum6_sql,
    )


def _units_to_double(mag_units_sql: str, sign_of_sql: str) -> Column:
    signed = F.expr(
        f"CASE WHEN ({sign_of_sql}) < 0 THEN -1 ELSE 1 END * ({mag_units_sql})"
    )
    return signed.cast("double") / float(SCALE)


def sql_round6_int_ratio(num: str, den: str) -> str:
    """DuckDB twin of ``round6_int_ratio`` (identical algebra)."""
    return (
        f"CAST(CASE WHEN ({num}) < 0 THEN -1 ELSE 1 END"
        f" * ((2 * abs({num}) * {SCALE} + ({den})) // (2 * ({den})))"
        f" AS DOUBLE) / {SCALE}.0"
    )


def sql_round6_dec6_over_int(sum6: str, den: str) -> str:
    """DuckDB twin of ``round6_dec6_over_int`` (identical algebra)."""
    return (
        f"CAST(CASE WHEN ({sum6}) < 0 THEN -1 ELSE 1 END"
        f" * ((2 * abs({sum6}) + ({den})) // (2 * ({den})))"
        f" AS DOUBLE) / {SCALE}.0"
    )

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
eyes open: `ewma-smooth` and `trigram-lm-score` — the division
algebra below is now full-range safe, but REPRESENTING their
numerators in 1e-6/1e-12 units as BIGINT overflows at creation
(weighted sums up to ~1e13 × the scale), and DuckDB's ``//`` on
DECIMAL performs TRUE division (measured: 10//4 = 2.5), so the
decimal-typed alternative has no shared floor semantics without
INT128. Their boundary-hit probability is far lower (irrational log
terms / non-dyadic weight sums) and all three SF sweeps are green.
percent_rank/cume_dist (`rank-funcs`) divide by n-1/n whose values at
every test SF are coprime to the 2·10⁶ scale (exact cuts impossible
there — parity-safe, left as builtins).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

SCALE = 1_000_000

# Largest denominator the int-ratio algebra tolerates: the remainder
# side's intermediate 2·(b−1)·1e6 + b = b·(2e6+1) − 2e6 must fit
# int64, so b ≤ (2^63−1+2e6) div (2e6+1). Above it Spark (non-ANSI)
# WRAPS silently while DuckDB raises — wrong-answer-vs-crash
# divergence. Call sites whose denominator is not structurally
# bounded (e.g. a product of two data-derived counts) wrap it in
# ``guard_den`` / ``sql_guard_den`` so BOTH engines raise at the
# envelope instead of diverging.
INT_RATIO_DEN_MAX = 4_611_683_712_586


def guard_den(den_sql: str) -> str:
    """Spark-side denominator guard: raises past INT_RATIO_DEN_MAX
    (matching DuckDB's native overflow behavior) instead of wrapping.
    CASE evaluates lazily, so the in-envelope path costs one compare."""
    return (
        f"CASE WHEN ({den_sql}) > {INT_RATIO_DEN_MAX}"
        f" THEN CAST(raise_error('exactmath: int-ratio denominator"
        f" exceeds the int64 1e-6 fixed-point envelope') AS BIGINT)"
        f" ELSE ({den_sql}) END"
    )


def sql_guard_den(den_sql: str) -> str:
    """DuckDB twin of ``guard_den`` (DuckDB would raise on the wrap
    anyway; the guard makes the failure message and the cut point
    identical across engines)."""
    return (
        f"CASE WHEN ({den_sql}) > {INT_RATIO_DEN_MAX}"
        f" THEN CAST(error('exactmath: int-ratio denominator"
        f" exceeds the int64 1e-6 fixed-point envelope') AS BIGINT)"
        f" ELSE ({den_sql}) END"
    )

# Overflow discipline: the magnitude is computed via a divmod
# decomposition — halfaway(|a|·1e6 / b) = (|a| div b)·1e6 +
# halfaway((|a| mod b)·1e6 / b) — so the largest REMAINDER-side
# intermediate is 2·(b-1)·1e6 + b (a naive 2·|a|·1e6 would wrap int64
# past |a| ≈ 4.6e12 — inside the 100 TB count range — wrapping
# silently in Spark while DuckDB raises: wrong-answer-vs-crash
# divergence). The remaining envelope limits are inherent to 1e-6
# fixed point in int64: the RESULT |a/b| must stay ≤ ~9.2e12 (its
# units value must fit), and the int-ratio denominator ≤ ~4.6e12.
# Ratios of counts/shares/probabilities sit far inside both. The dec6
# variant's intermediates are bounded by |s6| + 3·b: full-range safe.


def _int_ratio_units(num: str, den: str, div: str) -> str:
    """Magnitude of halfaway(|num|/den) in 1e-6 units; ``div`` is the
    engine's integral-division operator (Spark ``div``, DuckDB ``//``
    — identical for the nonnegative operands used here)."""
    a, b = f"abs({num})", f"({den})"
    return (
        f"(({a}) {div} {b}) * {SCALE}"
        f" + (2 * (({a}) % {b}) * {SCALE} + {b}) {div} (2 * {b})"
    )


def _dec6_units(sum6: str, den: str, div: str) -> str:
    a, b = f"abs({sum6})", f"({den})"
    return (
        f"(({a}) {div} {b})"
        f" + (2 * (({a}) % {b}) + {b}) {div} (2 * {b})"
    )


def round6_int_ratio(num_sql: str, den_sql: str) -> Column:
    """Exact 6-decimal half-away rounding of ``num/den`` for INTEGER
    SQL expressions (``den > 0``), as a double Column. ``num`` may be
    negative and arbitrarily large; ``den`` must stay below ~4.6e12
    (see overflow discipline above)."""
    return _units_to_double(_int_ratio_units(num_sql, den_sql, "div"), num_sql)


def round6_dec6_over_int(sum6_sql: str, den_sql: str) -> Column:
    """Exact 6-decimal half-away rounding of ``s/den`` where ``s`` is
    ALREADY in 1e-6 units (a decimal(38,6) sum times 1e6, cast to
    long) and ``den`` is a positive integer expression. Safe for the
    full int64 range of both operands."""
    return _units_to_double(_dec6_units(sum6_sql, den_sql, "div"), sum6_sql)


def _units_to_double(mag_units_sql: str, sign_of_sql: str) -> Column:
    signed = F.expr(
        f"CASE WHEN ({sign_of_sql}) < 0 THEN -1 ELSE 1 END * ({mag_units_sql})"
    )
    return signed.cast("double") / float(SCALE)


def _sql_units_to_double(mag_units_sql: str, sign_of_sql: str) -> str:
    return (
        f"CAST(CASE WHEN ({sign_of_sql}) < 0 THEN -1 ELSE 1 END"
        f" * ({mag_units_sql}) AS DOUBLE) / {SCALE}.0"
    )


def sql_round6_int_ratio(num: str, den: str) -> str:
    """DuckDB twin of ``round6_int_ratio`` (identical algebra)."""
    return _sql_units_to_double(_int_ratio_units(num, den, "//"), num)


def sql_round6_dec6_over_int(sum6: str, den: str) -> str:
    """DuckDB twin of ``round6_dec6_over_int`` (identical algebra)."""
    return _sql_units_to_double(_dec6_units(sum6, den, "//"), sum6)

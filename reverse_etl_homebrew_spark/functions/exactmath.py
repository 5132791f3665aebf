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
both containment keys. r9 closed the two former KNOWN RESIDUAL
sites: `ewma-smooth` (its 1e-6-unit numerator DOES fit int64 — the
r8 note over-estimated the weighted-sum range; measured max ~6.4e17
vs the 9.2e18 envelope, guarded by ``guard_dec_units``) and
`trigram-lm-score` (per-DOC 1e-12-unit sums are small — ≤ ~4e17 —
and halfaway(s12 / (n·1e6)) IS the 6-decimal rounding of the mean,
so no new function was needed). The move was forced by measurement:
the sf0.1 margin probe found an ewma pre-round value only 9.2e-7
(1e6-scaled) from a .5e-7 cut — inside the double-ROUND divergence
slack at 10× data. Remaining trigram surface (each engine quantizes
its own ln() doubles at 1e-12 before the exact sum) is bounded by n
integer units per doc and constructively margin-checked in
tests/test_round_boundary_margin.py. percent_rank/cume_dist
(`rank-funcs`) divide by n-1/n whose values at every test SF are
coprime to the 2·10⁶ scale (exact cuts impossible there —
parity-safe, left as builtins). Guard family: ``guard_den`` (ratio
denominators already in int64), ``guard_den_mul`` (denominators that
are PRODUCTS of two counts — the envelope check runs in
DECIMAL(38,0) before any int64 multiply, because guard_den over a
product would let a past-int64 wrap land back in-range and fail
open), ``guard_mul`` (int64 products of data-derived counts),
``guard_dec_units`` (decimal→units numerators; its comparison is
``IS NOT TRUE`` so even a comparison that overflows precision 38 to
NULL raises instead of silently NULL-casting) — each with a ``sql_``
DuckDB twin raising at the identical cut, so every envelope exit is
a crash in BOTH engines, never a silent wrap/NULL in one of them.
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


def guard_den_mul(a_sql: str, b_sql: str) -> str:
    """Guarded int-ratio denominator that is a PRODUCT of two
    nonnegative BIGINT expressions. ``guard_den`` alone is NOT safe
    for products: it evaluates its argument in int64 first, so a
    product past int64 wraps (Spark non-ANSI ``*``) BEFORE the
    compare and can land back inside the accepted range (e.g.
    2^32 * 2^32 wraps to 0) — failing open exactly where DuckDB
    raises. Here the envelope check runs in DECIMAL(38,0) (exact for
    int64 factors, like ``guard_mul``) BEFORE any int64 multiply;
    the ELSE branch's product is ≤ INT_RATIO_DEN_MAX so it cannot
    wrap. Products in (INT_RATIO_DEN_MAX, ∞) — wrapped or not — all
    raise."""
    return (
        f"CASE WHEN CAST({a_sql} AS DECIMAL(38,0)) * ({b_sql})"
        f" > {INT_RATIO_DEN_MAX}"
        f" THEN CAST(raise_error('exactmath: int-ratio denominator"
        f" exceeds the int64 1e-6 fixed-point envelope') AS BIGINT)"
        f" ELSE CAST({a_sql} AS BIGINT) * ({b_sql}) END"
    )


def sql_guard_den_mul(a_sql: str, b_sql: str) -> str:
    """DuckDB twin of ``guard_den_mul`` (DuckDB would raise on the
    int64 wrap anyway; the guard moves the cut to the identical
    INT_RATIO_DEN_MAX envelope with the identical message)."""
    return (
        f"CASE WHEN CAST({a_sql} AS DECIMAL(38,0)) * ({b_sql})"
        f" > {INT_RATIO_DEN_MAX}"
        f" THEN CAST(error('exactmath: int-ratio denominator"
        f" exceeds the int64 1e-6 fixed-point envelope') AS BIGINT)"
        f" ELSE CAST({a_sql} AS BIGINT) * ({b_sql}) END"
    )


def guard_mul(a_sql: str, b_sql: str) -> str:
    """Guarded int64 product of two nonnegative BIGINT expressions:
    the overflow check runs in DECIMAL(38,0) (exact, cannot itself
    overflow for int64 inputs), and past int64 BOTH engines raise —
    Spark's non-ANSI `*` wraps silently where DuckDB raises, the same
    wrong-answer-vs-crash divergence class as the division guards.
    For ratio numerators that are products of two data-derived counts
    (e.g. c(xy)·N in `bigram-lift-topk`)."""
    return (
        f"CASE WHEN CAST({a_sql} AS DECIMAL(38,0)) * ({b_sql})"
        f" > {2**63 - 1}"
        f" THEN CAST(raise_error('exactmath: int64 product overflow')"
        f" AS BIGINT)"
        f" ELSE ({a_sql}) * ({b_sql}) END"
    )


def sql_guard_mul(a_sql: str, b_sql: str) -> str:
    """DuckDB twin of ``guard_mul`` (DuckDB would raise on the wrap
    anyway; the guard makes the failure identical across engines)."""
    return (
        f"CASE WHEN CAST({a_sql} AS DECIMAL(38,0)) * ({b_sql})"
        f" > {2**63 - 1}"
        f" THEN CAST(error('exactmath: int64 product overflow')"
        f" AS BIGINT)"
        f" ELSE ({a_sql}) * ({b_sql}) END"
    )


def guard_dec_units(dec_sql: str, unit_scale: int, den_sql: str) -> str:
    """Build the integer-units BIGINT numerator for
    ``round6_dec6_over_int`` from an exact DECIMAL SQL expression
    (scale matching ``unit_scale``: 1e6 for decimal(38,6) sums, 1e12
    for decimal(38,12) sums), raising in BOTH engines when the units
    magnitude would leave the int64 envelope |units| <= int64max -
    3*den (the _dec6_units remainder intermediate is bounded by 3*den).
    Without the guard Spark's non-ANSI decimal->bigint cast NULLs
    silently on overflow while DuckDB raises — the same
    wrong-answer-vs-crash divergence class ``guard_den`` closes on the
    denominator side. The comparison runs in DECIMAL (exact for every
    reachable magnitude); for sums so large the comparison product
    itself overflows precision 38 (~1e20 at scale 12 / ~1e26 at
    scale 6 — beyond any physical data scale) Spark's non-ANSI
    decimal multiply yields NULL, so the guard compares via
    ``IS NOT TRUE``: a NULL comparison counts as over-envelope and
    raises rather than falling through to a silent NULL cast. A NULL
    ``dec_sql`` input (empty/all-NULL sum) stays NULL-in → NULL-out,
    matching DuckDB."""
    return (
        f"CASE WHEN ({dec_sql}) IS NOT NULL AND"
        f" ((abs({dec_sql}) * {unit_scale}"
        f" <= CAST({2**63 - 1} AS DECIMAL(38,0)) - 3 * ({den_sql}))"
        f" IS NOT TRUE)"
        f" THEN CAST(raise_error('exactmath: dec-units numerator"
        f" exceeds the int64 envelope') AS BIGINT)"
        f" ELSE CAST(({dec_sql}) * {unit_scale} AS BIGINT) END"
    )


def sql_guard_dec_units(dec_sql: str, unit_scale: int, den_sql: str) -> str:
    """DuckDB twin of ``guard_dec_units`` (DuckDB would raise on the
    cast anyway; the guard makes the failure message and the cut point
    identical across engines, including the NULL-comparison regime —
    see ``guard_dec_units``)."""
    return (
        f"CASE WHEN ({dec_sql}) IS NOT NULL AND"
        f" ((abs({dec_sql}) * {unit_scale}"
        f" <= CAST({2**63 - 1} AS DECIMAL(38,0)) - 3 * ({den_sql}))"
        f" IS NOT TRUE)"
        f" THEN CAST(error('exactmath: dec-units numerator"
        f" exceeds the int64 envelope') AS BIGINT)"
        f" ELSE CAST(({dec_sql}) * {unit_scale} AS BIGINT) END"
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

"""Z-order (Morton-curve) bit interleave in pure integer SQL.

Leaf module (no package imports) shared by the ``zorder-layout``
stats query (queries_misc.py) and the ``write_zordered`` layout sink
(sources/files.py) — both engines' integral division operators agree
on the nonnegative grid coordinates used here, so the same string
renders the Spark plan and the DuckDB oracle.
"""

from __future__ import annotations


def z_interleave_sql(gx: str, gy: str, bits: int, intdiv: str) -> str:
    """Morton/Z-order bit interleave of two ``bits``-wide nonnegative
    grid coordinates, in pure integer arithmetic (div/mod/add — no
    engine-specific bitwise operators, and the terms occupy disjoint
    bit positions so + is |). ``intdiv`` is the engine's integral
    division (Spark ``div``, DuckDB ``//`` — identical on the
    nonnegative operands used here)."""
    terms = []
    for i in range(bits):
        terms.append(f"((({gx}) {intdiv} {1 << i}) % 2) * {1 << (2 * i)}")
        terms.append(f"((({gy}) {intdiv} {1 << i}) % 2) * {1 << (2 * i + 1)}")
    return "(" + " + ".join(terms) + ")"

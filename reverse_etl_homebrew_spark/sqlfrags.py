"""Shared DuckDB-oracle SQL fragments.

Leaf module (no package imports) so both ``queries_text`` and
``queries_analytic`` can use these at module-import time without
creating a cycle through ``queries``.
"""

_DOT_SQL = (
    "list_sum(list_transform(list_zip({a}, {b}), "
    "x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))"
)

# DuckDB twin of functions/vectors.finite_geometry (r13 vector-tier
# non-finite class): a vector is in the geometry universe iff it is
# non-NULL, has no NULL component, and its self-dot is a finite
# double — the exact quantity the scorers consume, so the engine-side
# check is the SAME flat codegen fold the norms already use (a
# forall() HOF predicate measured +11-47% on the hot similarity
# keys; this form is ~free). NULL components need the explicit
# list_filter leg because DuckDB's list_sum SKIPS NULLs (SQL SUM)
# while the engine's left fold propagates them.
FINITE_VEC_SQL = (
    "({c} IS NOT NULL"
    " AND len(list_filter({c}, x -> x IS NULL)) = 0"
    " AND len({c}) > 0"
    " AND isfinite(list_sum(list_transform({c},"
    " x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))"
)

# Shared by topk-similarity (codegen fold scorer) and
# topk-similarity-pandas (Arrow/numpy scorer): both round scores to 6
# decimals, so one brute-force SQL oracle checks either physical path.
_TOPK_SIM_SQL = f"""
    WITH q AS (
      SELECT embedding AS qv FROM embeddings
      WHERE vec_id = 0 AND {FINITE_VEC_SQL.format(c='embedding')}
    ), scored AS (
      SELECT e.vec_id,
             {_DOT_SQL.format(a='e.embedding', b='q.qv')} AS dp,
             sqrt({_DOT_SQL.format(a='e.embedding', b='e.embedding')}) AS na,
             sqrt({_DOT_SQL.format(a='q.qv', b='q.qv')}) AS nq
      FROM embeddings e, q
      WHERE {FINITE_VEC_SQL.format(c='e.embedding')}
    )
    SELECT vec_id,
           ROUND(CASE WHEN na * nq > 0 THEN dp / (na * nq) END, 6) AS score
    FROM scored
    ORDER BY score DESC, vec_id
    LIMIT 10
    """

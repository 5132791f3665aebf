"""Upsert / MERGE semantics without a transactional table format
(SURVEY.md §2.2 `idmap-merge`, §2.5 `merge-join`).

The reference MERGEs one row at a time into the BigQuery ID map
(main.py:354-371): matched → update hubspot_id/updated_at, not matched
→ insert. Set-oriented equivalent: last-writer-wins per key across
(existing ∪ incoming), implemented as a key-grouped window — one
shuffle on the merge key, no driver involvement.

On a Delta/Iceberg deployment the same call sites swap to a native
``MERGE INTO`` (the storage format is injected at the sink layer);
this pure-DataFrame fallback keeps the engine dependency-free.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window as W, functions as F


def upsert_merge(
    existing: DataFrame,
    incoming: DataFrame,
    keys: Sequence[str],
    order_col: str = "updated_at",
) -> DataFrame:
    """Last-writer-wins merge of ``incoming`` over ``existing`` on
    ``keys`` (MERGE semantics, main.py:356-363).

    Ties on ``order_col`` break toward the incoming batch (__src=1),
    matching MERGE's matched-update-wins behavior; duplicate keys
    *within* the incoming batch also converge deterministically
    (main.py FIXTURES branch 12 — last writer by order_col wins).

    The window's ordering must be a TOTAL order over rows that can
    tie: duplicate keys *within one batch* with equal ``order_col``
    (the r14 duplicate-key/tie poison class,
    fixtures/dupkey_tie_probe.py) are otherwise decided by partition
    merge order — a different winner per re-run, per cluster width,
    per AQE re-plan. (The reference's serial loop resolves the same
    tie by ROW ORDER in the batch, which a distributed engine cannot
    reproduce; BigQuery MERGE itself refuses duplicate source keys.)
    Arbitration: after (order_col DESC, __src DESC), the remaining
    payload columns DESC NULLS LAST in schema order — any total rule
    works, this one is oracle-expressible verbatim and collapses
    full-duplicate rows to the same output either way."""
    cols = existing.columns
    tagged = existing.select(*cols).withColumn("__src", F.lit(0)).unionByName(
        incoming.select(*cols).withColumn("__src", F.lit(1))
    )
    arb = [
        F.desc_nulls_last(c)
        for c in cols
        if c not in keys and c != order_col
    ]
    w = W.partitionBy(*keys).orderBy(F.desc(order_col), F.desc("__src"), *arb)
    return (
        tagged.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__src")
    )


def rollup_partial(df: DataFrame, key: str, value_col: str, ts_col: str) -> DataFrame:
    """Mergeable partial-aggregate state for a per-``key`` rollup:
    exact count / decimal(38,6) sum / min / max — each a mergeable
    summary (Agarwal et al., PODS'12), so states fold associatively
    and a maintenance job never rescans history. Columns:
    (key, n, s6, lo, hi)."""
    from .aggregates import finite_dec

    return df.groupBy(key).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(finite_dec(F.col(value_col))).alias("s6"),
        F.min(ts_col).alias("lo"),
        F.max(ts_col).alias("hi"),
    )


def merge_rollup_state(state: DataFrame, delta: DataFrame, key: str) -> DataFrame:
    """Fold a delta batch's partial state into the stored state:
    counts add, exact decimal sums add, bounds take least/greatest
    (NULL-skipping in both Spark and DuckDB, so a key present on one
    side keeps that side's bound). Full-outer on the rollup key; with
    the state table bucketed by ``key`` the join co-partitions and
    only the delta side shuffles. Output has the same shape as the
    inputs — the merge is closed, so batches fold in indefinitely.

    NULL-group handling (r11 NULL-key probe): GROUP BY treats NULL as
    a real group on both engines, but an equality join never matches
    NULL keys — a NULL-key state row and a NULL-key delta row would
    stay permanently unmerged (two output rows where the recompute
    has one). An eqNullSafe join would fix that but wraps the join
    key in coalesce/isnull expressions, which defeats the bucketed
    state scan (measured: 'Bucketed: true' disappears from the plan).
    Instead the NULL group — AT MOST ONE ROW PER SIDE, since inputs
    are post-group-by states — takes a separate union + re-aggregate
    branch whose fold algebra is identical (SQL SUM/MIN/MAX skip
    NULLs, and SUM of an all-NULL set stays NULL — the s6 identity);
    the non-NULL bulk keeps the plain equality join and its zero-
    state-shuffle bucketed plan."""
    zero6 = F.lit(0).cast("decimal(38,6)")
    merged_nn = (
        state.where(F.col(key).isNotNull())
        .alias("s")
        .join(
            delta.where(F.col(key).isNotNull()).alias("d"),
            [key],
            "full_outer",
        )
        .select(
            key,
            (
                F.coalesce(F.col("s.n"), F.lit(0))
                + F.coalesce(F.col("d.n"), F.lit(0))
            ).alias("n"),
            # NULL is the sum's identity, not 0: a side whose every
            # value was NULL carries s6 = NULL (SQL SUM semantics),
            # and the single-pass recompute keeps NULL for such keys —
            # coalescing BOTH NULLs to 0 would break merge ≡ recompute
            # exactly there (found by the randomized fold property).
            F.when(
                F.col("s.s6").isNull() & F.col("d.s6").isNull(),
                F.lit(None).cast("decimal(38,6)"),
            )
            .otherwise(
                F.coalesce(F.col("s.s6"), zero6)
                + F.coalesce(F.col("d.s6"), zero6)
            )
            .alias("s6"),
            F.least(F.col("s.lo"), F.col("d.lo")).alias("lo"),
            F.greatest(F.col("s.hi"), F.col("d.hi")).alias("hi"),
        )
    )
    null_group = (
        state.where(F.col(key).isNull())
        .unionByName(delta.where(F.col(key).isNull()))
        .groupBy(key)
        .agg(
            F.sum("n").alias("n"),
            F.sum("s6").alias("s6"),
            F.min("lo").alias("lo"),
            F.max("hi").alias("hi"),
        )
    )
    return merged_nn.unionByName(null_group)


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_col: str,
    fingerprint: F.Column,
) -> DataFrame:
    """CDC-style diff of two corpus snapshots on a natural key:
    ``(key_col, status)`` with status in added / removed / changed —
    the incremental-refresh primitive that decides which documents a
    nightly pipeline must (re)process instead of rescanning the whole
    corpus (the reference's processed-skip ledger, main.py:500-516,
    lifted from per-run ids to content identity).

    ``fingerprint`` is a Column expression evaluated against each
    side's ``text``-bearing row (e.g. ``F.md5("text")``). Each side
    reduces to ONE row per key — a sorted digest of its DISTINCT
    fingerprint set — so a key's content identity is its version SET:
    exact re-deliveries collapse (the engine-wide r11 policy — a doc
    delivered twice by an at-least-once feed is one snapshot fact),
    CONFLICTING re-deliveries make the key 'changed' only when the
    version sets actually differ (identical multi-version snapshots
    compare unchanged — never the M×N join fan-out that reports a
    no-op refresh as changed), and a NULL payload digests to a
    sentinel so it compares like any other version rather than
    reading as absence.

    Digest injectivity (r12 advisor): each fingerprint VALUE is
    md5-hashed before the sorted-set join, so the set digest is a
    comma-join of fixed-width hex tokens. Without this, a caller
    fingerprint whose values can contain ``','`` or equal the literal
    ``'null'`` could make DISTINCT version sets digest identically
    (``{'a,b'}`` vs ``{'a','b'}``) and misreport changed keys as
    unchanged. The NULL sentinel stays the bare 4-char ``'null'`` —
    it can never collide with 32-char md5 hex output.

    Shape: each side is one hash aggregation down to (key, digest) —
    two narrow columns — then a single 1:1 full-outer equi-join on
    the key; at scale both snapshots are bucketed digest tables, so
    the join co-locates with no fact shuffle (the incremental-dedup
    layout). Unchanged keys are dropped AFTER the join by a map-side
    filter — in a production run the digest table is the join input,
    so nothing rescans payloads.

    NULL keys are out of scope on both engines (the settled identity
    rule): an equality join can never pair them, so every NULL-key row
    would misreport as added + removed; upstream identity repair owns
    them.
    """

    def digest(df, out):
        return (
            df.filter(F.col(key_col).isNotNull())
            .select(
                F.col(key_col).alias("__k"),
                F.coalesce(
                    F.md5(fingerprint.cast("string")), F.lit("null")
                ).alias("__fp"),
            )
            .groupBy("__k")
            .agg(F.array_join(F.sort_array(F.collect_set("__fp")), ",").alias(out))
        )

    joined = digest(old, "__ofp").join(digest(new, "__nfp"), ["__k"], "full_outer")
    status = (
        F.when(F.col("__ofp").isNull(), F.lit("added"))
        .when(F.col("__nfp").isNull(), F.lit("removed"))
        .when(F.col("__ofp") != F.col("__nfp"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return (
        joined.select(F.col("__k").alias(key_col), status.alias("status"))
        .filter(F.col("status") != "unchanged")
    )

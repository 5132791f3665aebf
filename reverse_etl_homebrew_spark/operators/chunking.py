"""Document chunking for training-sequence assembly.

The reference pipeline ships whole rows to its sink (main.py has no
chunking stage); this operator belongs to the extension tier — the
step between corpus filtering and sequence packing (`pack-sequences`)
when documents exceed the model context: split each document into
fixed-size token windows advanced by a stride, keeping the overlap
that preserves cross-boundary context (the standard pretraining
chunk-with-overlap recipe).

Scale shape: pure map-side row expansion — tokenize once behind a
projection boundary, explode an arithmetic start-position sequence,
slice per start. No shuffle, no Python, no state; output volume is
``ceil(tokens/stride)`` rows per doc, so the operator streams at scan
speed on any corpus size and the downstream packer owns the ordering
shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions import text as TX


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    size: int = 64,
    stride: int = 48,
    carry: tuple = (),
) -> DataFrame:
    """One row per (doc, chunk): ``(id_col, *carry, chunk_id, chunk,
    n_chunk_tokens)``.

    ``carry`` names extra columns to project through the expansion
    (e.g. a language or shard label) — a pure map-side passthrough, so
    downstream grouping never has to re-join chunks back to the doc
    table on a key that re-delivered or conflicting rows can make
    non-unique (the r12 review's fan-out class).

    Chunk starts advance by ``stride`` whitespace tokens from position
    1 while the PREVIOUS chunk has not yet reached the final token —
    i.e. start ≤ max(n_tokens − size + stride, 1) — so every token
    lands in at least one chunk, tail chunks run shorter rather than
    padding or dropping trailing tokens, and no chunk is ever fully
    contained in its predecessor (a start whose whole window the
    previous chunk already covered would emit 100%-overlap duplicate
    training content — the exact thing the dedup tier exists to
    remove). ``chunk_id`` is the 0-based stride index, so
    ``start = chunk_id * stride + 1`` reconstructs the offset.

    NULL-id and NULL-text docs are out of scope on both engines, the
    settled corpus conventions: chunking is a layout keyed by doc
    identity (the pack-sequences rule — a NULL id has no stable
    position downstream), and a NULL text has no tokens to chunk (the
    dedup-universe rule). Zero-token docs yield no chunks — strict,
    like token_span_windows' no-padded-window rule.
    """
    if stride < 1 or size < 1:
        raise ValueError(f"size and stride must be >= 1, got {size=} {stride=}")
    toks = (
        df.filter(F.col(id_col).isNotNull() & F.col(text_col).isNotNull())
        .select(F.col(id_col), *carry, TX.tokens(F.col(text_col)).alias("__tt"))
        .where(F.size("__tt") >= 1)
    )
    # upper bound: n − (size − stride), capped at n for the
    # gap-sampling case (stride > size) where a start past n would
    # emit an empty chunk
    n = F.size("__tt")
    starts = F.sequence(
        F.lit(1),
        F.greatest(F.least(n, n - F.lit(size - stride)), F.lit(1)),
        F.lit(stride),
    )
    exploded = toks.select(id_col, *carry, "__tt", F.explode(starts).alias("__i"))
    piece = F.slice(F.col("__tt"), F.col("__i"), size)
    return exploded.select(
        id_col,
        *carry,
        ((F.col("__i") - 1) / stride).cast("long").alias("chunk_id"),
        F.concat_ws(" ", piece).alias("chunk"),
        F.size(piece).cast("long").alias("n_chunk_tokens"),
    )


def pack_sequences(
    chunks: DataFrame,
    cap: int,
    shard_cols: tuple = ("lang",),
    id_col: str = "doc_id",
    chunk_col: str = "chunk_id",
    ntok_col: str = "n_chunk_tokens",
) -> DataFrame:
    """Token-packing layout for training-sequence assembly: map each
    chunk onto fixed-capacity (``cap``-token) sequences by contiguous
    concatenation within a shard — the GPT-style packing recipe where
    the token stream is split at exact ``cap`` boundaries and a chunk
    may straddle two (or more) sequences. The reference ships whole
    rows (main.py:558-575 builds per-row payloads); this is the
    extension-tier step AFTER chunk_documents that turns a filtered
    corpus into the dense fixed-length batches a trainer consumes.

    Output: one row per input chunk —
    ``(*shard_cols, id_col, chunk_col, n_tok, tok_start, seq_first,
    seq_last, seq_offset)`` where ``tok_start`` is the chunk's 0-based
    offset in its shard's token stream, ``seq_first``/``seq_last`` the
    shard-local sequence ids it lands in (``seq_last > seq_first`` iff
    the chunk straddles a boundary), and ``seq_offset`` its offset
    inside ``seq_first``. All arithmetic is integer-exact (``div`` /
    ``%``, never double division — a shard's token stream can exceed
    2^53 long before it exceeds int64).

    Scale shape: ONE shuffle — the per-shard window sort — then pure
    arithmetic; output volume equals input volume. Sequence ids are
    deliberately SHARD-LOCAL (the composite key (*shard_cols, seq_id)
    is globally unique): a global id would need a second all-shard
    pass for offsets, while shard-local ids make packing
    embarrassingly parallel — the 100 TB contract is that shards
    (lang × hash-bucket in production) are sized to an executor, the
    same discipline as the span/ANN bucket layouts. The ordering
    (id, chunk, n_tok) is TOTAL over output-distinguishable rows (the
    r14 duplicate-key/tie class): rows tying on all three are
    output-identical, so the packing multiset is deterministic at any
    width even under duplicate-id corruption.
    """
    if cap < 1:
        raise ValueError(f"cap must be >= 1, got {cap=}")
    from pyspark.sql import Window as W

    w = (
        W.partitionBy(*shard_cols)
        .orderBy(id_col, chunk_col, ntok_col)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    tok_start = (F.sum(ntok_col).over(w) - F.col(ntok_col)).cast("long")
    out = chunks.select(
        *shard_cols,
        id_col,
        chunk_col,
        F.col(ntok_col).cast("long").alias("n_tok"),
        tok_start.alias("tok_start"),
    )
    c = F.lit(int(cap))
    return out.select(
        *shard_cols,
        id_col,
        chunk_col,
        "n_tok",
        "tok_start",
        F.expr(f"tok_start div {int(cap)}").cast("long").alias("seq_first"),
        F.expr(f"(tok_start + n_tok - 1) div {int(cap)}")
        .cast("long")
        .alias("seq_last"),
        (F.col("tok_start") % c).cast("long").alias("seq_offset"),
    )

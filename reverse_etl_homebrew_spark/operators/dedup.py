"""Deduplication operator family (SURVEY.md §2.7 `dedup-lastwin`,
§2.11 extension tier: exact / MinHash-LSH / SimHash / n-gram Jaccard /
embedding-cosine near-dup).

Scale design: every variant reduces to (a) a map-side fingerprint or
sketch computed in pure Column expressions, then (b) ONE shuffle on
the fingerprint/bucket key. Candidate pairs are only materialized
within buckets (LSH banding), never as a cross join — the property
that keeps near-dup detection tractable on a 1e10-document corpus.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window as W, functions as F

from ..functions import text as TX
from ..functions import vectors as VEC


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def exact_dedup(df: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Exact duplicate removal on key columns — hash-shuffle dedup
    (dropDuplicates). Which survivor is kept is partition-order
    dependent; use ``lastwin_dedup`` when the survivor matters."""
    return df.dropDuplicates(list(keys))


def content_dedup(
    df: DataFrame, text_col: str = "text", id_col: str | None = None
) -> DataFrame:
    """Exact-content dedup by normalized-text fingerprint: keeps the
    lowest-``id_col`` row per fingerprint so the survivor is
    deterministic. ``id_col`` must be unique per row; it defaults to
    the frame's first column only for backward compatibility — pass it
    explicitly (a non-unique first column would make the survivor
    partition-order dependent)."""
    order_col = id_col if id_col is not None else df.columns[0]
    fp = df.withColumn("__fp", TX.sha_fingerprint(text_col))
    w = W.partitionBy("__fp").orderBy(F.col(order_col))
    return fp.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop(
        "__rn", "__fp"
    )


def lastwin_dedup(
    df: DataFrame, keys: Sequence[str], order: Sequence[Column]
) -> DataFrame:
    """Deterministic survivor: one row per key, first under ``order``
    (the reference's implicit one-row-per-natural-key idempotency,
    MERGE last-writer-wins main.py:357-363)."""
    w = W.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


# ---------------------------------------------------------------------------
# MinHash + LSH near-dup
# ---------------------------------------------------------------------------
#
# Implementation note: the sketch pipelines deliberately avoid stacking
# multiple higher-order-function lambdas (transform/aggregate/filter)
# in one projection — observed to produce NONDETERMINISTIC results on
# Spark 4.1 local[N] (lambda-variable state races across identical
# lambda names). The explode → flat-hash-columns → groupBy(min) shape
# below is also the right one at scale: each shingle is normalized and
# hashed exactly once, instead of num_hashes times.


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 32,
    shingle_n: int = 5,
) -> DataFrame:
    """One row per document with columns m0..m{k-1}: the MinHash
    signature over the distinct character-shingle set (seeded xxhash64
    family). Single shuffle (groupBy id, partial min map-side)."""
    normalized = df.select(
        F.col(id_col).alias("id"), TX.normalized_text(F.col(text_col)).alias("__nt")
    )
    shingled = normalized.select(
        "id",
        F.explode(F.array_distinct(TX.char_ngrams_from(F.col("__nt"), shingle_n))).alias(
            "g"
        ),
    )
    # one string hash per shingle, then the k-member family as cheap
    # fixed-width hashes of (base_hash, i) — O(len + k) per shingle
    # instead of O(k·len)
    hashed = shingled.select("id", F.xxhash64("g").alias("h")).select(
        "id",
        *[F.xxhash64(F.col("h"), F.lit(i)).alias(f"h{i}") for i in range(num_hashes)],
    )
    return hashed.groupBy("id").agg(
        *[F.min(f"h{i}").alias(f"m{i}") for i in range(num_hashes)]
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 5,
) -> DataFrame:
    """Candidate near-duplicate pairs via MinHash banding:
    signature → ``bands`` band-hashes → self-join within band buckets.

    Shuffle profile: shingle-hash groupBy, explode to (bands × rows)
    bucket rows, shuffle on (band, bucket); pairs enumerated only
    inside buckets — never a cross join. Returns distinct
    (a_id, b_id, est_jaccard) with a < b, est_jaccard = signature
    agreement fraction."""
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(df, id_col, text_col, num_hashes, shingle_n)
    banded = sig.select(
        "id",
        *[F.col(f"m{i}") for i in range(num_hashes)],
        F.posexplode(
            F.array(
                *[
                    F.xxhash64(
                        F.concat_ws(
                            ",",
                            F.lit(b),
                            *[
                                F.col(f"m{b * rows_per_band + r}").cast("string")
                                for r in range(rows_per_band)
                            ],
                        )
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band", "bucket"),
    )
    # explicit renames instead of DataFrame aliases: self-join alias
    # resolution is fragile (can silently rebind both legs to one side)
    left = banded.select(
        F.col("id").alias("a_id"),
        *[F.col(f"m{i}").alias(f"a_m{i}") for i in range(num_hashes)],
        "band",
        "bucket",
    )
    right = banded.select(
        F.col("id").alias("b_id"),
        *[F.col(f"m{i}").alias(f"b_m{i}") for i in range(num_hashes)],
        "band",
        "bucket",
    )
    agree = sum(
        (F.col(f"a_m{i}") == F.col(f"b_m{i}")).cast("int") for i in range(num_hashes)
    )
    pairs = (
        left.join(right, ["band", "bucket"])
        .filter(F.col("a_id") < F.col("b_id"))
        .select(
            "a_id",
            "b_id",
            (agree.cast("double") / F.lit(float(num_hashes))).alias("est_jaccard"),
        )
        .dropDuplicates(["a_id", "b_id"])
    )
    return pairs


# ---------------------------------------------------------------------------
# SimHash near-dup
# ---------------------------------------------------------------------------

def simhash_fingerprints(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 64,
    shingle_n: int = 4,
) -> DataFrame:
    """One row per document with its SimHash fingerprint (per-bit
    majority vote over shingle hashes), as (id, sh).

    Explode → single xxhash64 → per-bit conditional sums in one
    groupBy: flat expressions only (see module note), one shuffle,
    each shingle hashed once."""
    hashed = (
        df.select(
            F.col(id_col).alias("id"), TX.normalized_text(F.col(text_col)).alias("__nt")
        )
        .select(
            "id",
            F.explode(
                F.array_distinct(TX.char_ngrams_from(F.col("__nt"), shingle_n))
            ).alias("g"),
        )
        .select("id", F.xxhash64("g").alias("h"))
    )
    votes = hashed.groupBy("id").agg(
        F.count(F.lit(1)).alias("total"),
        *[
            F.sum(F.shiftrightunsigned("h", b).bitwiseAND(F.lit(1)).cast("long")).alias(
                f"v{b}"
            )
            for b in range(bits)
        ],
    )
    acc = F.lit(0).cast("long")
    for b in range(bits):
        bit = F.when(F.col(f"v{b}") * 2 >= F.col("total"), F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        acc = acc + F.shiftleft(bit, b)
    return votes.select("id", acc.alias("sh"))


def simhash_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    prefix_bits: int = 16,
) -> DataFrame:
    """Near-dup candidate pairs by SimHash: block on the top
    ``prefix_bits`` of the fingerprint (cheap LSH for small Hamming
    radii), verify Hamming distance inside blocks via bit_count."""
    sh = simhash_fingerprints(df, id_col, text_col).withColumn(
        "block", F.shiftrightunsigned("sh", 64 - prefix_bits)
    )
    a = sh.select(F.col("id").alias("a_id"), F.col("sh").alias("a_sh"), "block")
    b = sh.select(F.col("id").alias("b_id"), F.col("sh").alias("b_sh"), "block")
    return (
        a.join(b, ["block"])
        .filter(F.col("a_id") < F.col("b_id"))
        .withColumn("hamming", F.bit_count(F.col("a_sh").bitwiseXOR(F.col("b_sh"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("a_id", "b_id", "hamming")
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard (exact, bucket-bounded)
# ---------------------------------------------------------------------------

def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    df_cap: int = 100,
) -> DataFrame:
    """Word-n-gram Jaccard similarity for candidate pairs sharing at
    least one n-gram: explode n-grams → shuffle on n-gram → pairs per
    posting list → |A∩B| / |A∪B| from per-doc set sizes.

    At corpus scale the posting-list join is bounded by dropping
    ultra-common n-grams (document frequency cap) — the standard
    prefix-filter trick; df_cap keeps hot shingles from quadratic
    blowup. Jaccard is therefore computed over the PRUNED gram sets —
    a well-defined approximation of full-set Jaccard (both numerator
    and denominator exclude grams with document frequency > df_cap;
    pairs sharing only hot grams are not candidates). Per-doc sizes
    join back via plain shuffle joins: one row per document is
    fact-sized, never broadcast."""
    grams = (
        df.select(
            F.col(id_col).alias("id"),
            F.split(TX.normalized_text(F.col(text_col)), " ").alias("__toks"),
        )
        .select(
            "id",
            F.explode(F.array_distinct(TX.word_ngrams_from(F.col("__toks"), n))).alias(
                "g"
            ),
        )
    )
    hot = grams.groupBy("g").agg(F.count(F.lit(1)).alias("df")).filter(
        F.col("df") > df_cap
    )
    # hot-gram list size follows the corpus (Zipf tail over df_cap), so
    # no forced broadcast — AQE broadcasts it only while it is small
    pruned = grams.join(hot.select("g"), ["g"], "left_anti")
    # sizes from the SAME pruned set the intersections are counted on,
    # so numerator and denominator are consistent
    sizes = pruned.groupBy("id").agg(F.count(F.lit(1)).alias("set_size"))
    a, b = pruned.alias("a"), pruned.alias("b")
    inter = (
        a.join(b, (F.col("a.g") == F.col("b.g")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("a_id"), F.col("b.id").alias("b_id"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    out = (
        inter.join(sizes.withColumnsRenamed({"id": "a_id", "set_size": "a_size"}), ["a_id"])
        .join(sizes.withColumnsRenamed({"id": "b_id", "set_size": "b_size"}), ["b_id"])
        .withColumn(
            "jaccard",
            F.col("inter").cast("double")
            / (F.col("a_size") + F.col("b_size") - F.col("inter")).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("a_id", "b_id", "jaccard")
    )
    return out


# ---------------------------------------------------------------------------
# embedding-cosine near-dup
# ---------------------------------------------------------------------------

def embedding_near_dup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    planes: int = 8,
) -> DataFrame:
    """Near-duplicate vectors by cosine ≥ threshold, candidate-bounded
    by random-hyperplane LSH buckets (vectors this similar almost
    always agree on all ``planes`` sign bits; multi-probe raises recall
    by also joining each vector's 1-bit-flip neighbor buckets)."""
    dim = VEC.infer_dim(df, vec_col)
    hyperplanes = _deterministic_planes(planes, dim)
    base = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        VEC.random_hyperplane_signs(F.col(vec_col), hyperplanes).alias("b0"),
    )
    # multi-probe: each row joins on its own bucket plus 1-bit flips
    probes = F.array(
        F.col("b0"), *[F.col("b0").bitwiseXOR(F.lit(1 << i)) for i in range(planes)]
    )
    probed = base.select("id", "v", F.explode(probes).alias("bucket"))
    anchors = base.select(
        F.col("id").alias("b_id"), F.col("v").alias("b_v"), F.col("b0").alias("bucket")
    )
    pairs = (
        probed.join(anchors, ["bucket"])
        .filter(F.col("id") < F.col("b_id"))
        .dropDuplicates(["id", "b_id"])
        .withColumn("cos", VEC.cosine(F.col("v"), F.col("b_v"), dim))
        .filter(F.col("cos") >= threshold)
        .select(F.col("id").alias("a_id"), "b_id", "cos")
    )
    return pairs


def _deterministic_planes(k: int, dim: int):
    """Fixed pseudo-random hyperplanes from a hash recurrence — no RNG
    state, identical on every run/executor."""
    planes = []
    x = 2463534242
    for _ in range(k):
        p = []
        for _ in range(dim):
            # xorshift64
            x ^= (x << 13) & 0xFFFFFFFFFFFFFFFF
            x ^= x >> 7
            x ^= (x << 17) & 0xFFFFFFFFFFFFFFFF
            p.append(((x % 2001) - 1000) / 1000.0)
        planes.append(p)
    return planes

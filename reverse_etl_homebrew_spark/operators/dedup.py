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


def content_dedup(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact-content dedup by normalized-text fingerprint: keeps the
    lowest-id row per fingerprint so the result is deterministic."""
    fp = df.withColumn("__fp", TX.sha_fingerprint(text_col))
    w = W.partitionBy("__fp").orderBy(*[F.col(c) for c in df.columns[:1]])
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

def minhash_signature(col: Column, num_hashes: int = 32, shingle_n: int = 5) -> Column:
    """MinHash signature (array<long>, one min per seeded xxhash64 of
    the shingle set). Pure Column expressions — each hash family
    member is xxhash64(seed-prefixed shingle)."""
    shingles = TX.char_ngrams(col, shingle_n)
    sig = [
        F.array_min(
            F.transform(shingles, lambda s, i=i: F.xxhash64(F.concat(F.lit(f"h{i}:"), s)))
        )
        for i in range(num_hashes)
    ]
    return F.array(*sig)


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

    Shuffle profile: one explode to (bands × rows) bucket rows, one
    shuffle on (band, bucket), pairs enumerated only inside buckets.
    Returns distinct (a_id, b_id, est_jaccard) with a < b, where
    est_jaccard is the signature-agreement fraction."""
    rows_per_band = num_hashes // bands
    sig = df.select(
        F.col(id_col).alias("id"),
        minhash_signature(F.col(text_col), num_hashes, shingle_n).alias("sig"),
    )
    banded = sig.select(
        "id",
        "sig",
        F.posexplode(
            F.array(
                *[
                    F.xxhash64(
                        F.concat_ws(
                            ",",
                            F.lit(b),
                            *[
                                F.element_at("sig", b * rows_per_band + r + 1).cast("string")
                                for r in range(rows_per_band)
                            ],
                        )
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band", "bucket"),
    )
    left = banded.alias("l")
    right = banded.alias("r")
    pairs = (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .select(
            F.col("l.id").alias("a_id"),
            F.col("r.id").alias("b_id"),
            (
                F.size(
                    F.filter(
                        F.zip_with("l.sig", "r.sig", lambda x, y: (x == y).cast("int")),
                        lambda v: v == 1,
                    )
                ).cast("double")
                / F.lit(float(num_hashes))
            ).alias("est_jaccard"),
        )
        .dropDuplicates(["a_id", "b_id"])
    )
    return pairs


# ---------------------------------------------------------------------------
# SimHash near-dup
# ---------------------------------------------------------------------------

def simhash(col: Column, bits: int = 64, shingle_n: int = 4) -> Column:
    """SimHash over character shingles: per-bit majority vote of
    shingle hashes, emitted as one LongType fingerprint. Hamming-close
    fingerprints ⇒ similar documents."""
    shingles = TX.char_ngrams(col, shingle_n)
    hashed = F.transform(shingles, lambda s: F.xxhash64(s))
    acc = F.lit(0).cast("long")
    for b in range(bits):
        # vote for bit b: count of shingle-hashes with bit set vs total
        votes = F.size(
            F.filter(hashed, lambda h, b=b: h.bitwiseAND(F.lit(1).cast("long") << b) != 0)
        )
        total = F.size(hashed)
        bit = F.when(votes * 2 >= total, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        acc = acc + (bit << b)
    return acc


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
    sh = df.select(
        F.col(id_col).alias("id"), simhash(F.col(text_col)).alias("sh")
    ).withColumn("block", F.shiftrightunsigned("sh", 64 - prefix_bits))
    a, b = sh.alias("a"), sh.alias("b")
    return (
        a.join(b, (F.col("a.block") == F.col("b.block")) & (F.col("a.id") < F.col("b.id")))
        .withColumn(
            "hamming", F.bit_count(F.col("a.sh").bitwiseXOR(F.col("b.sh")))
        )
        .filter(F.col("hamming") <= max_hamming)
        .select(F.col("a.id").alias("a_id"), F.col("b.id").alias("b_id"), "hamming")
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
) -> DataFrame:
    """Exact word-n-gram Jaccard similarity for candidate pairs sharing
    at least one n-gram: explode n-grams → shuffle on n-gram → pairs
    per posting list → exact |A∩B| / |A∪B| from per-doc set sizes.

    At corpus scale the posting-list join is bounded by dropping
    ultra-common n-grams (document frequency cap) — the standard
    prefix-filter trick; df_cap here keeps hot shingles from
    quadratic blowup."""
    df_cap = 100
    grams = (
        df.select(
            F.col(id_col).alias("id"),
            F.explode(F.array_distinct(TX.word_ngrams(F.col(text_col), n))).alias("g"),
        )
    )
    sizes = grams.groupBy("id").agg(F.count(F.lit(1)).alias("set_size"))
    hot = grams.groupBy("g").agg(F.count(F.lit(1)).alias("df")).filter(
        F.col("df") > df_cap
    )
    pruned = grams.join(F.broadcast(hot.select("g")), ["g"], "left_anti")
    a, b = pruned.alias("a"), pruned.alias("b")
    inter = (
        a.join(b, (F.col("a.g") == F.col("b.g")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("a_id"), F.col("b.id").alias("b_id"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    out = (
        inter.join(F.broadcast(sizes.withColumnsRenamed({"id": "a_id", "set_size": "a_size"})), ["a_id"])
        .join(F.broadcast(sizes.withColumnsRenamed({"id": "b_id", "set_size": "b_size"})), ["b_id"])
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
    dim_row = df.select(F.size(vec_col).alias("d")).first()
    dim = dim_row["d"] if dim_row else 0
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
        .withColumn("cos", VEC.cosine(F.col("v"), F.col("b_v")))
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

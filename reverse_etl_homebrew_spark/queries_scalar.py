"""Scalar-transform operator queries (SURVEY.md §2.3) — each reference
per-row transform exercised over testdata columns with a DuckDB oracle
replicating the exact semantics.

Registered into the shared registry (imported by queries.py at the
bottom of the module).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .functions import scalars as SC
from .sources.catalog import load_table
from .queries import register


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


#: Deterministic messy-boolean token vocabulary (every token class of
#: main.py:127-130 plus an unknown string and a blank).
_BOOL_TOKENS = [
    "true", "False", "1", "y", " YES ", "t", "0", "n", "NO", "f", "", "maybe",
]
_BOOL_TOKENS_SQL = ", ".join(f"'{t}'" for t in _BOOL_TOKENS)


@register(
    "bool-normalize",
    sql=f"""
    WITH toks AS (
      SELECT c_custkey,
             ([{_BOOL_TOKENS_SQL}])[(c_custkey % 12) + 1] AS token
      FROM customer
    )
    SELECT c_custkey, token,
           CASE WHEN token IS NULL OR TRIM(LOWER(token)) = '' THEN NULL
                WHEN TRIM(LOWER(token)) IN ('true','1','y','yes','t') THEN 'true'
                WHEN TRIM(LOWER(token)) IN ('false','0','n','no','f') THEN 'false'
                ELSE TRIM(LOWER(token)) END AS normalized
    FROM toks
    """,
)
def q_bool_normalize(spark, sf_dir):
    """Messy truthiness → 'true'/'false'/NULL (to_hubspot_bool,
    main.py:114-132), over a deterministic token column."""
    token = F.element_at(
        F.array(*[F.lit(t) for t in _BOOL_TOKENS]), (F.col("c_custkey") % 12 + 1).cast("int")
    )
    return _t(spark, sf_dir, "customer").select(
        "c_custkey",
        token.alias("token"),
        SC.bool_normalize(token).alias("normalized"),
    )


@register(
    "identifier-canon",
    sql=r"""
    SELECT c_custkey,
           CASE WHEN CAST(c_acctbal AS DECIMAL(38,9))
                     = CAST(FLOOR(CAST(c_acctbal AS DECIMAL(38,9))) AS DECIMAL(38,9))
                THEN CAST(CAST(CAST(c_acctbal AS DECIMAL(38,9)) AS DECIMAL(38,0)) AS VARCHAR)
                ELSE regexp_replace(regexp_replace(
                       CAST(CAST(c_acctbal AS DECIMAL(38,9)) AS VARCHAR),
                       '0+$', ''), '\.$', '')
           END AS canon_bal,
           CAST(c_custkey AS VARCHAR) AS canon_key
    FROM customer
    """,
)
def q_identifier_canon(spark, sf_dir):
    """Decimal/float → canonical id string: '.0'-trim + trailing-zero
    strip (format_identifier, main.py:205-221)."""
    return _t(spark, sf_dir, "customer").select(
        "c_custkey",
        SC.identifier_canon(F.col("c_acctbal")).alias("canon_bal"),
        SC.identifier_canon(F.col("c_custkey")).alias("canon_key"),
    )


@register(
    "email-normalize",
    sql="""
    SELECT c_custkey,
           NULLIF(LOWER(TRIM(CONCAT('  ', UPPER(c_name), '@Example.COM  '))), '') AS email,
           NULLIF(LOWER(TRIM(CASE WHEN c_custkey % 9 = 0 THEN '   ' ELSE c_name END)), '') AS email_or_null
    FROM customer
    """,
)
def q_email_normalize(spark, sf_dir):
    """strip+lowercase, blank→NULL (main.py:573); second column drives
    the blank branch."""
    messy = F.concat(F.lit("  "), F.upper(F.col("c_name")), F.lit("@Example.COM  "))
    maybe_blank = F.when(F.col("c_custkey") % 9 == 0, F.lit("   ")).otherwise(
        F.col("c_name")
    )
    return _t(spark, sf_dir, "customer").select(
        "c_custkey",
        SC.email_normalize(messy).alias("email"),
        SC.email_normalize(maybe_blank).alias("email_or_null"),
    )


@register(
    "phi-redact",
    sql="""
    SELECT c_custkey, substring(sha256(c_name), 1, 8) AS name_hash8
    FROM customer
    """,
)
def q_phi_redact(spark, sf_dir):
    """sha256[:8] PHI redaction (hash8, main.py:93-97; applied
    main.py:84-89)."""
    return _t(spark, sf_dir, "customer").select(
        "c_custkey", SC.phi_redact(F.col("c_name")).alias("name_hash8")
    )


@register(
    "epoch-millis",
    sql="""
    SELECT o_orderkey, epoch_ms(o_orderdate) AS order_epoch_ms
    FROM orders
    """,
)
def q_epoch_millis(spark, sf_dir):
    """Naive-UTC timestamp → epoch ms (clean_value policy, main.py:109;
    engine form of to_epoch_millis, main.py:134-158)."""
    return _t(spark, sf_dir, "orders").select(
        "o_orderkey", SC.epoch_millis_utc(F.col("o_orderdate")).alias("order_epoch_ms")
    )


@register(
    "epoch-millis-eastern",
    sql="""
    SELECT o_orderkey,
           epoch_ms(timezone('America/New_York', CAST(o_orderdate AS TIMESTAMP)))
             AS order_epoch_ms_eastern
    FROM orders
    """,
)
def q_epoch_millis_eastern(spark, sf_dir):
    """Naive wall time treated as America/New_York → epoch ms — the
    reference's ``to_epoch_millis`` policy (main.py:134-158), the one
    tz policy that had no oracle-backed key until r13's tz-drift
    probe established WHERE an oracle is safe: the wall→instant
    direction diverges between Java/zoneinfo and DuckDB/ICU only in
    the fall-back AMBIGUOUS hour (01:00-02:00) — and a DATE cast to
    TIMESTAMP is always midnight, structurally outside both the
    ambiguous hour and the spring-forward gap (02:00-03:00), so both
    engines agree on every input this oracle can produce
    (tests/test_tz_drift.py allowlists exactly this key and pins the
    midnight-safety argument)."""
    return _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        SC.epoch_millis_eastern(F.col("o_orderdate")).alias(
            "order_epoch_ms_eastern"
        ),
    )


@register(
    "eastern-date",
    sql="""
    SELECT o_orderkey,
           strftime(timezone('America/New_York', timezone('UTC', o_orderdate)),
                    '%Y-%m-%d') AS eastern_date
    FROM orders
    """,
)
def q_eastern_date(spark, sf_dir):
    """UTC instant → America/New_York calendar date string
    (to_eastern_date_string, main.py:160-180); DST-correct via IANA tz
    on both engines."""
    return _t(spark, sf_dir, "orders").select(
        "o_orderkey", SC.eastern_date(F.col("o_orderdate")).alias("eastern_date")
    )


@register(
    "json-payload",
    sql="""
    SELECT o_orderkey,
           substring(
             to_json(struct_pack(o_orderkey := o_orderkey,
                                 o_orderstatus := o_orderstatus,
                                 o_orderpriority := o_orderpriority)),
             1, 60) AS payload
    FROM orders
    """,
)
def q_json_payload(spark, sf_dir):
    """Row → JSON string + truncation clamp (DLQ payload,
    main.py:398-399)."""
    return _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        SC.truncate(
            SC.json_payload("o_orderkey", "o_orderstatus", "o_orderpriority"), 60
        ).alias("payload"),
    )


@register(
    "natural-key",
    sql=r"""
    SELECT c_custkey,
           COALESCE(
             CASE WHEN c_custkey % 2 = 1 THEN CAST(c_custkey AS VARCHAR) END,
             CASE WHEN c_custkey % 4 = 2 THEN
               CASE WHEN CAST(c_acctbal AS DECIMAL(38,9))
                         = CAST(FLOOR(CAST(c_acctbal AS DECIMAL(38,9))) AS DECIMAL(38,9))
                    THEN CAST(CAST(CAST(c_acctbal AS DECIMAL(38,9)) AS DECIMAL(38,0)) AS VARCHAR)
                    ELSE regexp_replace(regexp_replace(
                           CAST(CAST(c_acctbal AS DECIMAL(38,9)) AS VARCHAR),
                           '0+$', ''), '\.$', '')
               END
             END,
             substring(sha256(to_json(struct_pack(c_custkey := c_custkey))), 1, 8)
           ) AS natural_key
    FROM customer
    """,
)
def q_natural_key(spark, sf_dir):
    """Composite natural-key coalesce chain with content-hash fallback
    (main.py:560-565): odd keys use the primary id, half the evens use
    the canonicalized secondary, the rest fall through to hash8."""
    c = _t(spark, sf_dir, "customer")
    primary = F.when(F.col("c_custkey") % 2 == 1, SC.identifier_canon(F.col("c_custkey")))
    secondary = F.when(F.col("c_custkey") % 4 == 2, SC.identifier_canon(F.col("c_acctbal")))
    return c.select(
        "c_custkey",
        SC.natural_key(primary, secondary, hash_cols=[F.col("c_custkey")]).alias(
            "natural_key"
        ),
    )


@register(
    "next-birthday",
    sql="""
    WITH dob AS (
      SELECT c_custkey,
             CASE WHEN c_custkey % 50 = 0 THEN DATE '1980-02-29'
                  ELSE make_date(1980 + c_custkey % 40,
                                 1 + c_custkey % 12,
                                 1 + c_custkey % 28) END AS dob
      FROM customer
    ), parts AS (
      SELECT c_custkey, dob,
             month(dob) AS m, day(dob) AS d FROM dob
    ), cand AS (
      SELECT c_custkey, dob, m, d,
             CASE WHEN m = 2 AND d = 29 THEN NULL
                  ELSE make_date(2026, m, d) END AS this_year,
             CASE WHEN m = 2 AND d = 29 THEN NULL
                  ELSE make_date(2027, m, d) END AS next_year
      FROM parts
    )
    SELECT c_custkey, dob,
           CASE WHEN this_year < DATE '2026-08-13' THEN next_year
                ELSE this_year END AS next_birthday
    FROM cand
    """,
)
def q_next_birthday(spark, sf_dir):
    """Next-birthday derivation incl. the Feb-29 NULL edge
    (compute_next_birthday, main.py:182-203: `.replace(year=...)`
    raises on leap day → reference returns None; engine yields NULL
    from invalid make_date). 2026/2027 are both non-leap, so every
    Feb-29 DOB lands on the NULL path in both engines."""
    c = _t(spark, sf_dir, "customer")
    dob = F.when(F.col("c_custkey") % 50 == 0, F.to_date(F.lit("1980-02-29"))).otherwise(
        F.make_date(
            F.lit(1980) + F.col("c_custkey") % 40,
            F.lit(1) + F.col("c_custkey") % 12,
            F.lit(1) + F.col("c_custkey") % 28,
        )
    )
    today = F.to_date(F.lit("2026-08-13"))
    return c.select(
        "c_custkey",
        dob.alias("dob"),
        SC.next_birthday(dob, today).alias("next_birthday"),
    )


@register(
    "patient-projection",
    sql=r"""
    SELECT CAST(c_custkey AS VARCHAR) AS patient_id,
           NULLIF(LOWER(TRIM(c_name)), '') AS email,
           split_part(c_name, '#', 1) AS firstname,
           COALESCE(NULLIF(split_part(c_name, '#', 2), ''), c_name) AS lastname,
           CASE WHEN CAST(c_acctbal AS DECIMAL(38,9))
                     = CAST(FLOOR(CAST(c_acctbal AS DECIMAL(38,9))) AS DECIMAL(38,9))
                THEN CAST(CAST(CAST(c_acctbal AS DECIMAL(38,9)) AS DECIMAL(38,0)) AS VARCHAR)
                ELSE regexp_replace(regexp_replace(
                       CAST(CAST(c_acctbal AS DECIMAL(38,9)) AS VARCHAR),
                       '0+$', ''), '\.$', '')
           END AS account_balance,
           c_mktsegment AS segment,
           'customer' AS lifecyclestage,
           'true' AS amd_synced
    FROM customer
    """,
)
def q_patient_projection(spark, sf_dir):
    """The wide mapping projection (map_patient_to_contact,
    main.py:555-611): renames, coalesce chains, canonicalized ids,
    constant columns, blank→NULL dropping — one single select."""
    c = _t(spark, sf_dir, "customer")
    return c.select(
        SC.identifier_canon(F.col("c_custkey")).alias("patient_id"),
        SC.email_normalize(F.col("c_name")).alias("email"),
        F.split_part(F.col("c_name"), F.lit("#"), F.lit(1)).alias("firstname"),
        SC.coalesce_first(
            SC.blank_to_null(F.split_part(F.col("c_name"), F.lit("#"), F.lit(2))),
            F.col("c_name"),
        ).alias("lastname"),
        SC.identifier_canon(F.col("c_acctbal")).alias("account_balance"),
        F.col("c_mktsegment").alias("segment"),
        F.lit("customer").alias("lifecyclestage"),
        F.lit("true").alias("amd_synced"),
    )


@register(
    "roi-projection",
    sql="""
    SELECT CAST(o_orderkey AS VARCHAR) AS roi_id,
           CAST(o_custkey AS VARCHAR) AS patient_id,
           epoch_ms(o_orderdate) AS accepted_epoch_ms,
           strftime(timezone('America/New_York', timezone('UTC', o_orderdate)),
                    '%Y-%m-%d') AS completed_eastern_date,
           o_orderpriority AS template_name,
           LOWER(o_orderstatus) AS processing_status
    FROM orders
    """,
)
def q_roi_projection(spark, sf_dir):
    """ROI custom-object projection (map_roi_to_custom,
    main.py:635-661): id canon, epoch-millis + eastern-date temporal
    props, lowercased status."""
    o = _t(spark, sf_dir, "orders")
    return o.select(
        SC.identifier_canon(F.col("o_orderkey")).alias("roi_id"),
        SC.identifier_canon(F.col("o_custkey")).alias("patient_id"),
        SC.epoch_millis_utc(F.col("o_orderdate")).alias("accepted_epoch_ms"),
        SC.eastern_date(F.col("o_orderdate")).alias("completed_eastern_date"),
        F.col("o_orderpriority").alias("template_name"),
        F.lower(F.col("o_orderstatus")).alias("processing_status"),
    )


@register(
    "processed-skip",
    sql="""
    SELECT CASE WHEN LOWER(o_orderstatus) = 'f' AND o_orderdate IS NOT NULL
                THEN 'skip' ELSE 'process' END AS branch,
           COUNT(*) AS n
    FROM orders GROUP BY 1
    """,
)
def q_processed_skip(spark, sf_dir):
    """Processed-row skip predicate (main.py:736-742): lowercased
    status match AND completion stamp present → skip branch."""
    o = _t(spark, sf_dir, "orders")
    branch = F.when(
        (F.lower(F.col("o_orderstatus")) == "f") & F.col("o_orderdate").isNotNull(),
        "skip",
    ).otherwise("process")
    return o.select(branch.alias("branch")).groupBy("branch").agg(
        F.count(F.lit(1)).alias("n")
    )


@register(
    "retry-threshold",
    sql="""
    WITH attempts AS (
      SELECT o_orderkey AS natural_key, COALESCE(m.max_att, 0) + 1 AS attempt
      FROM orders
      LEFT JOIN (SELECT l_orderkey, MAX(l_linenumber) AS max_att
                 FROM lineitem GROUP BY l_orderkey) m ON o_orderkey = l_orderkey
      WHERE o_orderstatus = 'F'
    )
    SELECT natural_key, attempt FROM attempts WHERE attempt >= 5
    """,
)
def q_retry_threshold(spark, sf_dir):
    """Alert threshold filter: attempts >= 5 → alert branch
    (main.py:714-727, 748-773; README.md:78)."""
    from .operators import joins as J

    failures = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select(
            F.lit("rois").alias("job_type"),
            F.col("o_orderkey").alias("natural_key"),
            F.lit("unresolved").alias("error"),
        )
    )
    dlq = _t(spark, sf_dir, "lineitem").select(
        F.lit("rois").alias("job_type"),
        F.col("l_orderkey").alias("natural_key"),
        F.lit("unresolved").alias("error"),
        F.col("l_linenumber").alias("attempt"),
    )
    return (
        J.dlq_attempt_join(failures, dlq)
        .filter(F.col("attempt") >= 5)
        .select("natural_key", "attempt")
    )

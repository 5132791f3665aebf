"""Pins for the r13 clock/timezone-drift poison class
(fixtures/tz_drift_probe.py — VERDICT r12 #6).

The engine's three tz policies (SURVEY §7) under DST-transition and
pre-1883 wall times, three-way against DuckDB and Python zoneinfo
(the reference's own stack, fold=0):

- spring-forward GAP wall times: all three stacks resolve to the same
  instant (Java shifts forward by the gap; zoneinfo fold=0 keeps the
  pre-transition offset — same instant by construction);
- fall-back AMBIGUOUS wall times: Spark/Java and zoneinfo resolve to
  the EARLIER offset; DuckDB/ICU to the LATER — the ONE divergence
  the probe found, pinned here as a documented boundary in BOTH
  directions (the engine is reference-faithful; no registry oracle
  is exposed because epoch_millis_eastern has no oracle-backed key —
  asserted below so adding one without disambiguation gets noticed);
- LMT-era timestamps: all three stacks agree to the second
  (America/New_York local mean time, -04:56:02);
- the instant→wall policy (eastern_date) is a total function — no
  ambiguity — and agrees across all stacks at every 2026 transition
  boundary instant;
- session-timezone independence: queries.register re-pins
  spark.sql.session.timeZone to UTC on every call (normalize_session),
  so flipping the conf between calls cannot move results — spot-pinned
  here on the keys whose plans cast DATE→TIMESTAMP (the cast that IS
  session-tz-dependent in Spark); the probe's arm 1 proves it
  registry-wide.
"""

from __future__ import annotations

from datetime import datetime
from zoneinfo import ZoneInfo

import duckdb
import pytest

from pyspark.sql import functions as F

from reverse_etl_homebrew_spark import queries as Q
from reverse_etl_homebrew_spark.functions import scalars as SC

SF_DIR = "/root/testdata/sf0.001"

WALL_ROWS = [
    ("gap", "2026-03-08 02:30:00"),
    ("ambiguous", "2026-11-01 01:30:00"),
    ("lmt", "1880-06-01 12:00:00"),
    ("normal", "2026-06-15 12:00:00"),
]


@pytest.fixture(scope="module")
def wall(spark):
    df = spark.createDataFrame(WALL_ROWS, "k string, s string").select(
        "k", F.col("s").cast("timestamp_ntz").alias("t")
    )
    rows = df.select(
        "k",
        SC.epoch_millis_eastern(F.col("t")).alias("ms"),
        SC.eastern_date(F.col("t")).alias("ed"),
    ).collect()
    return {r["k"]: (r["ms"], r["ed"]) for r in rows}


def _py_eastern_ms(s: str) -> int:
    return int(
        datetime.fromisoformat(s)
        .replace(tzinfo=ZoneInfo("America/New_York"))
        .timestamp() * 1000
    )


def _duck_eastern_ms(s: str) -> int:
    con = duckdb.connect()
    (ms,) = con.execute(
        f"SELECT epoch_ms(timezone('America/New_York', TIMESTAMP '{s}'))"
    ).fetchone()
    con.close()
    return ms


@pytest.mark.parametrize("k,s", [r for r in WALL_ROWS if r[0] != "ambiguous"])
def test_wall_to_instant_three_way_agreement(wall, k, s):
    ms, _ = wall[k]
    assert ms == _py_eastern_ms(s) == _duck_eastern_ms(s)


def test_ambiguous_wall_time_boundary_pinned(wall):
    s = dict(WALL_ROWS)["ambiguous"]
    ms, _ = wall["ambiguous"]
    # engine == reference stack (earlier offset, EDT)
    assert ms == _py_eastern_ms(s)
    # DuckDB picks the later offset (EST) — exactly one hour later.
    # If either engine changes resolution policy, re-open the
    # documented boundary in fixtures/tz_drift_probe.py.
    assert _duck_eastern_ms(s) == ms + 3_600_000


def test_lmt_offset_exact_to_the_second(wall):
    # America/New_York local mean time is -04:56:02; noon LMT
    # 1880-06-01 = 16:56:02 UTC
    ms, ed = wall["lmt"]
    assert ms == -2826947038000
    assert ed == "1880-06-01"


# Keys whose oracle performs a wall→Eastern conversion on inputs that
# are STRUCTURALLY outside the divergent window: epoch-millis-eastern
# feeds a DATE cast to TIMESTAMP — always midnight, never inside the
# ambiguous hour (01:00-02:00) or the spring-forward gap (02:00-03:00).
_WALL_TO_EASTERN_ALLOWLIST = {"epoch-millis-eastern"}


def test_wall_to_eastern_oracles_are_disambiguated():
    """The wall→instant direction is the ONE place the probe found the
    engines disagree (DuckDB resolves the ambiguous fall-back hour to
    the later offset; Java/zoneinfo to the earlier). Any oracle
    performing that conversion must either be allowlisted with a
    structural ambiguity-free argument (midnight-only inputs) or
    disambiguate explicitly — this trips on new unvetted uses."""
    hazard = "timezone('America/New_York',"
    for name, sql in Q.ORACLE.items():
        if name in _WALL_TO_EASTERN_ALLOWLIST:
            continue
        # eastern-date's instant→wall double conversion is a total
        # function (timezone('UTC', ...) inside) — not a hazard
        flat = " ".join(sql.split())
        stripped = flat.replace(
            "timezone('America/New_York', timezone('UTC',", ""
        )
        assert hazard not in stripped, (
            f"{name} converts a wall time to Eastern in its oracle — "
            f"disambiguate fall-back hours explicitly or allowlist with "
            f"a structural argument (see fixtures/tz_drift_probe.py)"
        )


def test_allowlisted_key_inputs_are_midnight_only(spark):
    """The epoch-millis-eastern allowlist rests on midnight-only
    inputs; verify the claim against the data."""
    from reverse_etl_homebrew_spark.sources.catalog import load_table

    o = load_table(spark, SF_DIR, "orders")
    non_midnight = o.where(
        F.date_trunc("day", F.col("o_orderdate").cast("timestamp"))
        != F.col("o_orderdate").cast("timestamp")
    ).count()
    assert non_midnight == 0


def test_eastern_date_boundary_instants(spark):
    rows = [
        ("2026-03-08 06:59:59", "2026-03-08"),
        ("2026-03-08 07:00:00", "2026-03-08"),
        ("2026-11-01 05:30:00", "2026-11-01"),
        ("2026-11-01 06:30:00", "2026-11-01"),
        ("2026-03-08 04:59:59", "2026-03-07"),  # 23:59:59 EST 03-07
        ("1880-06-01 03:00:00", "1880-05-31"),  # LMT rolls the date
    ]
    df = spark.createDataFrame(rows, "s string, want string").select(
        F.col("s").cast("timestamp_ntz").alias("t"), "want"
    )
    out = df.select(SC.eastern_date(F.col("t")).alias("ed"), "want").collect()
    for r in out:
        assert r["ed"] == r["want"]


def test_session_tz_flip_cannot_move_results(spark):
    """The date→timestamp cast inside epoch_millis_utc IS
    session-tz-dependent in Spark; normalize_session re-pins UTC on
    every registered call, so a hostile conf flip between calls must
    not move a single value."""
    keys = ["epoch-millis", "eastern-date", "json-coerce"]
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    base = {
        k: sorted(map(tuple, Q.QUERIES[k](spark, SF_DIR).collect()))
        for k in keys
    }
    try:
        for tz in ("Asia/Kathmandu", "Pacific/Chatham"):
            for k in keys:
                spark.conf.set("spark.sql.session.timeZone", tz)
                got = sorted(map(tuple, Q.QUERIES[k](spark, SF_DIR).collect()))
                assert got == base[k], (k, tz)
    finally:
        spark.conf.set("spark.sql.session.timeZone", "UTC")

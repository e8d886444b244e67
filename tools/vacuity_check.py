#!/usr/bin/env python3
"""Vacuity check: flag registry entries whose ORACLE output has a numeric
column that is ALL-ZERO at EVERY provided scale factor.

Motivation (round 11): an oracle-exact entry can still be vacuous — both
engines computing the same *trivially-zero* value, so the hash matches
while the computation under test never fires. The first run of this sweep
caught two real cases nine rounds of exact-hash gating never could:
`tpch_q8_market_share` conditioned its revenue share on a nation name
('CHINA') that matched no generated nation, so the share was identically
0.0 in BOTH engines (and the first fix, NATION_7, was still vacuous at
sf0.001 — this tool now checks every SF); and `sketch_count_min`'s 4×64
grid exceeded the corpus's 31-word vocabulary, so the overestimate column
— the sketch's defining one-sided error — was 0 at every SF.

Criterion: all-zero across ALL given sf_dirs. A column that is zero at
sf0.01 but lights up at sf0.1 (e.g. `dedup_exact.is_duplicate` — the
corpus simply has no exact duplicates below 5000 docs) is exercised by
the tri-scale gate and is NOT vacuous. All-constant-nonzero is
deliberately not flagged: a first sweep showed it is dominated by
legitimate totals/denominators repeated per row (n_days=30, exact=150,
within-5pct verdict flags == the sketch PASSING).

Allowlist: columns legitimately zero at every SF, each with the reason
and, for DQ-style pass-verdicts, the negative-control pytest that
exercises the nonzero path on injected data.

DuckDB-only (no Spark session): the oracle side is authoritative for
values; Spark parity is already certified by check_oracle.py.

Usage: python tools/vacuity_check.py [sf_dir ...]
       (default: all three generated SFs)
Exit 1 if a non-allowlisted always-zero numeric column is found.
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

DEFAULT_SFS = [
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
]

# (entry, column) -> why always-zero is correct, and where the nonzero
# path is exercised instead
ALLOWED_ZERO = {
    # mins over 0-based id domains: 0 IS the true minimum
    ("events_variant_shred", "min_k"): "min over a 0-based key domain",
    ("io_csv_roundtrip", "min_user"): "user_id is 0-based; 0 is the true min",
    # clean-data DQ reports: zero is the PASS verdict; violation paths are
    # pinned by negative-control tests that inject failures
    (
        "dq_constraint_report",
        "n_violations",
    ): "clean generated data; injected-violation pytest: "
    "tests/test_round11_ops.py::test_dq_constraint_report_detects_injected_violations",
    (
        "dq_referential_orphans",
        "orphan_rows",
    ): "clean FKs; tests/test_round9b_ops.py::test_referential_orphans_detects_injected_orphan",
    (
        "dq_referential_orphans",
        "orphan_keys",
    ): "clean FKs; same injected-orphan pytest",
    (
        "layout_column_stats",
        "n_nulls",
    ): "generated columns carry no NULLs; null handling covered by "
    "io/roundtrip suites",
    (
        "events_bot_score",
        "bot_flag",
    ): "no generated user crosses the bot threshold; "
    "tests/test_round9b_ops.py::test_bot_score_flags_synthetic_burst",
}


def main() -> int:
    import pandas as pd

    import __spark_entry__ as entrymod

    sf_dirs = sys.argv[1:] or DEFAULT_SFS
    oracles = entrymod.oracle_sql()
    # (entry, col) -> True while zero-at-every-sf-so-far
    always_zero: dict[tuple[str, str], bool] = {}
    errors: list[str] = []
    for sf_dir in sf_dirs:
        con = duckdb.connect()
        con.execute("PRAGMA threads=8")
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf_dir}/{t}.parquet')"
            )
        for name, sql in oracles.items():
            try:
                df = con.execute(sql).fetchdf()
            except Exception as exc:  # noqa: BLE001 - report, keep sweeping
                errors.append(f"{name} @ {sf_dir}: {exc}")
                continue
            for c in df.columns:
                col = df[c]
                if not pd.api.types.is_numeric_dtype(col):
                    continue
                vals = col.dropna()
                key = (name, c)
                # needs >= 3 observed rows at at least one SF to count as
                # a real signal; zero stays "pending" until then
                zero_here = len(vals) >= 3 and bool((vals == 0).all())
                nonzero_here = bool((vals != 0).any())
                if nonzero_here:
                    always_zero[key] = False
                elif zero_here and always_zero.get(key, True):
                    always_zero[key] = True
        con.close()
    failures = [
        f"{name}.{c}: zero at every checked SF"
        for (name, c), flag in sorted(always_zero.items())
        if flag and (name, c) not in ALLOWED_ZERO
    ]
    allowed_hits = sum(
        1
        for (name, c), flag in always_zero.items()
        if flag and (name, c) in ALLOWED_ZERO
    )
    for e in errors:
        print(f"ERR {e}")
    for f in failures:
        print(f"VACUOUS {f}")
    print(
        f"vacuity: {len(failures)} flagged, {allowed_hits} allowlisted "
        f"always-zero columns (documented), sfs={len(sf_dirs)}, "
        f"errors={len(errors)}"
    )
    return 1 if failures or errors else 0


if __name__ == "__main__":
    raise SystemExit(main())

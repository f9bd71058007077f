"""CLI entry-point test (reference Program.cs analogue): run the module
as a subprocess on a small CSV and check the emitted stats JSON."""

from __future__ import annotations

import json
import subprocess
import sys

HEADER = (
    "tpep_pickup_datetime,tpep_dropoff_datetime,passenger_count,trip_distance,"
    "store_and_fwd_flag,PULocationID,DOLocationID,fare_amount,tip_amount\n"
)


def test_cli_runs_and_prints_stats(tmp_path):
    csv = tmp_path / "in.csv"
    csv.write_text(
        HEADER
        + "01/01/2020 10:00:00 AM,01/01/2020 10:10:00 AM,1,1.0,N,1,2,10,1\n"
        + "01/01/2020 10:00:00 AM,01/01/2020 10:10:00 AM,1,9.9,Y,9,9,99,9\n"  # dup
        + "bad-ts,01/01/2020 11:05:00 AM,2,2.0,N,3,4,20,2\n"  # invalid
    )
    out = subprocess.run(
        [
            sys.executable, "-m", "etl_developstoday_test_spark",
            "--input", str(csv),
            "--duplicates", str(tmp_path / "dups"),
            "--output", str(tmp_path / "clean"),
            "--master", "local[2]",
            "--shuffle-partitions", "4",
        ],
        capture_output=True, text=True, timeout=300, cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr[-2000:]
    stats = json.loads(out.stdout.strip().splitlines()[-1])
    assert stats == {
        "TotalRowsRead": 3,
        "ParsedRows": 2,
        "InvalidRows": 1,
        "DuplicateRows": 1,
        "InsertedRows": 1,
        "DuplicatesFileRows": 1,
    }


def test_driver_registry_consistency():
    """Every _CHANGED_THIS_ROUND name must exist (a typo silently wastes
    a driver correctness slot), with no duplicates; queries() must
    expose exactly the registry, and every query must have an oracle.
    (Rotation-order invariants live in tests/test_driver_rotation.py.)"""
    import __spark_entry__ as entry_mod
    from etl_developstoday_test_spark.plans.queries import ORACLE_SQL, QUERIES

    changed = entry_mod._CHANGED_THIS_ROUND
    assert len(changed) == len(set(changed)), "duplicates in _CHANGED_THIS_ROUND"
    missing = [n for n in changed if n not in QUERIES]
    assert not missing, f"_CHANGED_THIS_ROUND names not in QUERIES: {missing}"
    assert set(entry_mod.queries()) == set(QUERIES)
    assert set(entry_mod.oracle_sql()) == set(ORACLE_SQL)
    no_oracle = [n for n in QUERIES if n not in ORACLE_SQL]
    assert not no_oracle, f"queries without oracle twins: {no_oracle}"

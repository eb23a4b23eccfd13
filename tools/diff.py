#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle compare (dev aid only; the
engine itself never depends on this). Usage:

    python3 tools/diff.py <verify_out_dir> [sf_dir]

Runs graft.Verify output against the oracle SQL it dumped: for each query,
reads <out>/<name>/ parquet, runs oracle_sql.json[name] in DuckDB with the
sf_dir parquet tables registered as views, sorts columns by name and rows by
all columns, and compares values exactly.
"""
import json
import math
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df.columns):
        df = df.sort_values(by=list(df.columns), kind="mergesort", ignore_index=True)
    return df


def values_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    if isinstance(a, (list, tuple)) or isinstance(b, (list, tuple)):
        a, b = list(a), list(b)
        return len(a) == len(b) and all(values_equal(x, y) for x, y in zip(a, b))
    try:
        if pd.isna(a) and pd.isna(b):
            return True
        if bool(pd.isna(a)) != bool(pd.isna(b)):
            return False
    except (TypeError, ValueError):
        pass
    return a == b


def main() -> int:
    out_dir = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001"
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    n_fail = 0
    for name, sql in sorted(oracles.items()):
        try:
            mine = canon(pd.read_parquet(f"{out_dir}/{name}"))
            oracle = canon(con.sql(sql).df())
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if list(mine.columns) != list(oracle.columns):
            print(f"FAIL {name}: columns {list(mine.columns)} != {list(oracle.columns)}")
            n_fail += 1
            continue
        # Dtype-KIND strictness: the driver's compare hashes values
        # type-sensitively, so an int64 parquet column vs a float64 oracle
        # column (the DuckDB SUM(integer)->HUGEINT->float64 pandas path)
        # is a driver FAIL even though Python `5 == 5.0`. Catch it here.
        kind_bad = None
        for c in mine.columns:
            km, ko = mine[c].dtype.kind, oracle[c].dtype.kind
            if km != ko and {km, ko} <= {"i", "u", "f"} and "f" in {km, ko}:
                kind_bad = (c, mine[c].dtype, oracle[c].dtype)
                break
        if kind_bad:
            c, dm, do = kind_bad
            print(f"FAIL {name}: col {c} dtype kind {dm} != {do} "
                  "(int-vs-float would hash-mismatch in the driver compare)")
            n_fail += 1
            continue
        if len(mine) != len(oracle):
            print(f"FAIL {name}: rows {len(mine)} != {len(oracle)}")
            n_fail += 1
            continue
        bad = None
        for i in range(len(mine)):
            for c in mine.columns:
                if not values_equal(mine[c].iloc[i], oracle[c].iloc[i]):
                    bad = (i, c, mine[c].iloc[i], oracle[c].iloc[i])
                    break
            if bad:
                break
        if bad:
            i, c, mv, ov = bad
            print(f"FAIL {name}: row {i} col {c}: mine={mv!r} oracle={ov!r}")
            n_fail += 1
        else:
            print(f"OK   {name}: {len(mine)} rows x {len(mine.columns)} cols")
    print(f"{'PASS' if n_fail == 0 else 'FAIL'}: {len(oracles) - n_fail}/{len(oracles)} queries match")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())

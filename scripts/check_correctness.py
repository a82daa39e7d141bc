#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: check_correctness.py <sf_dir> <verify_out_dir>

Reads <verify_out_dir>/oracle_sql.json (written by graft.Verify), runs each
oracle SQL in DuckDB over views of the sf parquet tables, loads the
corresponding Spark parquet result, sorts columns by name, and compares
row-by-row. Exit code 1 if any query mismatches.
"""
import glob
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    out = {}
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            s = s.dt.tz_localize(None) if getattr(s.dt, "tz", None) is not None else s
            s = s.astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(s):
            s = s.astype("float64")
        elif pd.api.types.is_integer_dtype(s):
            s = s.astype("Int64")
        out[c] = s
    return pd.DataFrame(out)


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)

    failures, checked, rows_only = [], 0, 0

    # Declared queries with no output directory failed inside Verify —
    # flag them instead of silently skipping.
    try:
        with open(f"{out_dir}/queries.json") as f:
            declared = set(json.load(f))
    except FileNotFoundError:
        declared = set(oracles)
    produced = {d.rstrip("/").split("/")[-1] for d in glob.glob(f"{out_dir}/*/")}
    for missing in sorted(declared - produced):
        failures.append((missing, "query produced no output (failed in Verify)"))

    for name in sorted(glob.glob(f"{out_dir}/*/")):
        qname = name.rstrip("/").split("/")[-1]
        files = glob.glob(f"{name}/part-*.parquet") or glob.glob(f"{name}/*.parquet")
        if not files:
            failures.append((qname, "no spark output parquet"))
            continue
        got = pd.concat([pd.read_parquet(f) for f in sorted(files)])
        if qname not in oracles:
            rows_only += 1
            print(f"  [rows-only] {qname}: {len(got)} rows")
            if len(got) == 0:
                failures.append((qname, "rows-only check: 0 rows"))
            continue
        checked += 1
        try:
            want = con.execute(oracles[qname]).df()
        except Exception as e:
            failures.append((qname, f"oracle SQL failed: {e}"))
            continue
        g, w = normalize(got), normalize(want)
        if list(g.columns) != list(w.columns):
            failures.append((qname, f"columns {list(g.columns)} != {list(w.columns)}"))
            continue
        if len(g) != len(w):
            failures.append((qname, f"row count {len(g)} != {len(w)}"))
            continue
        g = g.reset_index(drop=True)
        w = w.reset_index(drop=True)
        bad = []
        for c in g.columns:
            gs, ws = g[c], w[c]
            # exact equality, even for floats: the query suite's determinism
            # policy (exact decimal sums, identical-operand divisions) makes
            # both engines produce bit-identical doubles
            eq = (gs.isna() & ws.isna()) | (gs == ws)
            if not eq.fillna(False).all():
                i = int((~eq.fillna(False)).idxmax())
                bad.append(f"col {c} first diff @row {i}: got={gs[i]!r} want={ws[i]!r}")
        if bad:
            failures.append((qname, "; ".join(bad)))
        else:
            print(f"  [ok] {qname}: {len(g)} rows")

    print(f"\n{checked} oracle-checked, {rows_only} rows-only, {len(failures)} failures")
    for q, msg in failures:
        print(f"  [FAIL] {q}: {msg}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))

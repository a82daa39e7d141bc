#!/usr/bin/env python3
"""Oracle result-type lint — catches the HUGEINT-sum failure class early.

Usage: oracle_typelint.py <sf_dir> <verify_out_dir>

The driver's gate compares DuckDB oracle output to Spark parquet output by
value hash, so a TYPE divergence (DuckDB `sum(BIGINT)` -> HUGEINT vs Spark
BIGINT, or an accidental DECIMAL) surfaces only as an opaque hash fail —
this bit the repo in r8 (q_profile family) and r10 (q_domain_rollup). This
lint makes the divergence loud and names the column: it DESCRIBEs every
oracle SQL from oracle_sql.json (no data scanned) and compares each output
column's type CLASS against the Spark parquet result schema.

Exit 1 if any oracle emits HUGEINT/UHUGEINT/DECIMAL, or a column's type
class (int/float/string/timestamp/date/bool/binary/list) disagrees with
Spark's.
"""
import json
import sys

import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# DuckDB type name -> comparison class
def duck_class(t: str) -> str:
    t = t.upper()
    if t.startswith("DECIMAL") or t in ("HUGEINT", "UHUGEINT"):
        return "WIDE"  # never valid: Spark has no parquet writer for these
    if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT",
             "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"):
        return "int"
    if t in ("FLOAT", "REAL", "DOUBLE"):
        return "float"
    if t.startswith("VARCHAR") or t == "UUID":
        return "string"
    if t.startswith("TIMESTAMP"):
        return "timestamp"
    if t == "DATE":
        return "date"
    if t == "BOOLEAN":
        return "bool"
    if t == "BLOB":
        return "binary"
    if t.endswith("[]") or t.startswith("STRUCT") or t.startswith("MAP"):
        return "nested"
    return t


def arrow_class(t) -> str:
    import pyarrow as pa
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    if pa.types.is_list(t) or pa.types.is_struct(t) or pa.types.is_map(t):
        return "nested"
    return str(t)


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    bad = 0
    for name in sorted(oracles):
        sql = oracles[name]
        try:
            desc = con.execute(f"DESCRIBE {sql}").fetchall()
        except Exception as e:  # noqa: BLE001 - report and continue
            print(f"  [ERR] {name}: DESCRIBE failed: {e}")
            bad += 1
            continue
        duck = {row[0]: duck_class(row[1]) for row in desc}
        try:
            schema = pq.read_schema(f"{out_dir}/{name}.parquet")
        except Exception:
            schema = None
        problems = []
        for c, cls in duck.items():
            if cls == "WIDE":
                problems.append(
                    f"{c}: DuckDB emits {dict((r[0], r[1]) for r in desc)[c]}"
                    " (wrap in CAST(... AS BIGINT/DOUBLE))")
        if schema is not None:
            spark = {schema.names[i]: arrow_class(schema.types[i])
                     for i in range(len(schema.names))}
            if set(spark) != set(duck):
                problems.append(
                    f"column sets differ: spark={sorted(spark)}"
                    f" duck={sorted(duck)}")
            else:
                for c in spark:
                    if duck[c] != "WIDE" and spark[c] != duck[c]:
                        problems.append(
                            f"{c}: spark {spark[c]} vs duck {duck[c]}")
        if problems:
            bad += 1
            print(f"  [BAD] {name}:")
            for p in problems:
                print(f"        {p}")
    n = len(oracles)
    print(f"{n - bad}/{n} oracles type-clean")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))

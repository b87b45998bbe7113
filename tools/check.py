#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads each <outDir>/<name> parquet (Spark result), runs the matching SQL
from <outDir>/oracle_sql.json in DuckDB over the sfDir parquet tables, and
compares values with columns sorted by name and rows fully sorted.
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, list):
        return "[" + ",".join(norm(x) for x in v) + "]"
    return str(v)


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm(r[i]) for i in order) for r in rows]
    out.sort()
    return [c for c in sorted(cols)], out


def type_mismatches(spark_rel, duck_rel):
    """The driver's hash is type-sensitive: a DuckDB HUGEINT column vs a
    Spark BIGINT column hash-mismatches even when every value is equal
    (round-7 root cause: sum(BIGINT) widens to HUGEINT and // preserves
    it).  Compare per-column type names after the same sort-by-name the
    value compare uses and flag any widening the stringified value
    compare below cannot see."""
    s = dict(zip(spark_rel.columns, [str(t) for t in spark_rel.types]))
    d = dict(zip(duck_rel.columns, [str(t) for t in duck_rel.types]))
    bad = []
    for c in sorted(set(s) & set(d)):
        if s[c] != d[c]:
            bad.append(f"{c}: spark={s[c]} duck={d[c]}")
    return bad


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            spark_rel = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            duck_rel = con.sql(sql)
            t_bad = type_mismatches(spark_rel, duck_rel)
            s_cols, s_rows = canon(spark_rel.fetchall(), spark_rel.columns)
            d_cols, d_rows = canon(duck_rel.fetchall(), duck_rel.columns)
        except Exception as e:
            print(f"FAIL {name}: exception {e}")
            n_fail += 1
            continue
        if s_cols != d_cols:
            print(f"FAIL {name}: columns {s_cols} vs {d_cols}")
            n_fail += 1
        elif t_bad:
            print(f"FAIL {name}: column-type widening — " + "; ".join(t_bad))
            n_fail += 1
        elif s_rows != d_rows:
            n_fail += 1
            print(f"FAIL {name}: {len(s_rows)} spark rows vs {len(d_rows)} duck rows")
            for i, (a, b) in enumerate(zip(s_rows, d_rows)):
                if a != b:
                    print(f"  first diff at sorted row {i}:\n    spark {a}\n    duck  {b}")
                    break
            else:
                if len(s_rows) != len(d_rows):
                    print(f"  row-count mismatch; first extra: "
                          f"{(s_rows if len(s_rows) > len(d_rows) else d_rows)[min(len(s_rows), len(d_rows))]}")
        else:
            print(f"PASS {name} ({len(s_rows)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))

#!/usr/bin/env python3
"""Local mimic of the driver's t2 correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/oracle_sql.json, registers the sfDir parquet tables as
DuckDB views, runs each oracle SQL, loads the Spark result parquet, sorts
columns by name + rows by all columns, and compares values exactly
(with a small float fallback report so near-misses are diagnosable).
"""
import sys, json, glob, math
import duckdb

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        spark_files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not spark_files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            rel = con.sql(sql)
            # Output-type gate (round-10 rule, from the q108/q145 recurrence):
            # DuckDB silently widens integer arithmetic over aggregate/window
            # results to HUGEINT (and division literals to DECIMAL); pandas
            # renders those as float64/object, which can NEVER hash-match
            # Spark's BIGINT/DOUBLE. Any such type in an oracle's OUTPUT
            # schema is an immediate local failure — cast it in the SQL.
            widened = [(c, str(t)) for c, t in zip(rel.columns, rel.types)
                       if "HUGEINT" in str(t).upper() or "DECIMAL" in str(t).upper()]
            if widened:
                print(f"FAIL {name}: widened oracle output types {widened} "
                      f"(add CAST(... AS BIGINT/DOUBLE) in the oracle SQL)")
                n_fail += 1
                continue
            odf = rel.fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        sdf = con.execute(
            f"SELECT * FROM read_parquet({spark_files!r})").fetchdf()
        ocols, scols = sorted(odf.columns), sorted(sdf.columns)
        if ocols != scols:
            print(f"FAIL {name}: columns oracle={ocols} spark={scols}")
            n_fail += 1
            continue
        o = odf[ocols].sort_values(ocols, kind="mergesort").reset_index(drop=True)
        s = sdf[scols].sort_values(scols, kind="mergesort").reset_index(drop=True)
        if len(o) != len(s):
            print(f"FAIL {name}: rows oracle={len(o)} spark={len(s)}")
            n_fail += 1
            continue
        bad = []
        for c in ocols:
            ov, sv = o[c].tolist(), s[c].tolist()
            for i, (a, b) in enumerate(zip(ov, sv)):
                a, b = norm(a), norm(b)
                pa = a is None or (isinstance(a, float) and math.isnan(a)) or str(a) == 'NaT'
                pb = b is None or (isinstance(b, float) and math.isnan(b)) or str(b) == 'NaT'
                if pa and pb:
                    continue
                if pa != pb or not (a == b):
                    bad.append((c, i, a, b))
                    if len(bad) > 4:
                        break
            if len(bad) > 4:
                break
        if bad:
            print(f"FAIL {name}: {len(bad)}+ value diffs, e.g. {bad[:3]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(o)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()

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

# ---- window ORDER BY float gate (round-11 rule, from the q52 recurrence) ----
# A window function ranked over a COMPUTED floating-point expression is the
# one place the row-sorted hash compare cannot save: a last-ulp difference
# between the two engines' float pipelines flips WHICH row rank-1 selects,
# not how rows are ordered afterwards. Mechanical rule: every ORDER BY
# expression inside an OVER(...) must resolve to something integer, rounded,
# or bit-identical-by-construction (a raw parquet column, read identically by
# both engines). Raw computed doubles (cosine similarities, divisions,
# float aggregates) must go through round()/CAST-to-integer fixed point first.

_SAFE_FNS = {"round", "floor", "ceil", "ceiling", "trunc", "row_number",
             "rank", "dense_rank", "ntile", "count", "bit_count",
             "epoch_us", "epoch_ms", "epoch", "strlen", "length", "octet_length",
             "hash", "md5", "abs", "sign", "xor", "mod", "len",
             "time_bucket", "date_trunc", "strftime", "year", "month", "day"}
_FLOAT_FNS = {"/", "list_cosine_similarity", "list_distance", "sqrt", "exp",
              "ln", "log", "log2", "log10", "pow", "power", "acos", "asin",
              "atan", "random", "avg", "mean", "stddev", "var_pop", "percentile",
              "percentile_cont", "quantile_cont", "setseed"}
_INT_CAST_IDS = {"TINYINT", "SMALLINT", "INTEGER", "BIGINT", "HUGEINT",
                 "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT", "VARCHAR",
                 "DATE", "TIMESTAMP", "BOOLEAN", "TIMESTAMP_NS"}

def _collect_aliases(node, aliases):
    if isinstance(node, dict):
        if "select_list" in node and isinstance(node["select_list"], list):
            for e in node["select_list"]:
                a = e.get("alias") if isinstance(e, dict) else None
                if a:
                    aliases.setdefault(a.lower(), []).append(e)
        for v in node.values():
            _collect_aliases(v, aliases)
    elif isinstance(node, list):
        for v in node:
            _collect_aliases(v, aliases)

def _collect_window_orders(node, out):
    if isinstance(node, dict):
        if node.get("class") == "WINDOW":
            for ob in node.get("orders") or []:
                if isinstance(ob, dict) and "expression" in ob:
                    out.append(ob["expression"])
        for v in node.values():
            _collect_window_orders(v, out)
    elif isinstance(node, list):
        for v in node:
            _collect_window_orders(v, out)

def _expr_safe(expr, aliases, basecols, stack):
    if not isinstance(expr, dict):
        return True
    cls = expr.get("class")
    if cls == "CONSTANT":
        return True
    if cls == "CAST":
        tid = str((expr.get("cast_type") or {}).get("id", "")).upper()
        if tid in _INT_CAST_IDS:
            return True
        return _expr_safe(expr.get("child"), aliases, basecols, stack)
    if cls == "COLUMN_REF":
        name = (expr.get("column_names") or ["?"])[-1].lower()
        if name in stack:
            return True  # pass-through alias chain; verdict comes from the defining expr
        if name in aliases:
            return all(_expr_safe(d, aliases, basecols, stack | {name})
                       for d in aliases[name])
        if name in basecols:
            return True  # raw stored column: both engines read identical bits
        return False
    if cls in ("FUNCTION", "WINDOW"):
        fn = str(expr.get("function_name", "")).lower()
        if fn in _SAFE_FNS:
            return True
        if fn in _FLOAT_FNS:
            return False
        kids = expr.get("children") or []
        return all(_expr_safe(k, aliases, basecols, stack) for k in kids)
    # operators and wrappers: recurse whatever children exist
    kids = []
    for key in ("children", "child", "left", "right"):
        v = expr.get(key)
        if isinstance(v, list):
            kids.extend(v)
        elif isinstance(v, dict):
            kids.append(v)
    if kids:
        return all(_expr_safe(k, aliases, basecols, stack) for k in kids)
    return True

def _expr_repr(expr):
    cls = expr.get("class")
    if cls == "COLUMN_REF":
        return ".".join(expr.get("column_names") or [])
    if cls in ("FUNCTION", "WINDOW"):
        return f"{expr.get('function_name')}(...)"
    return str(cls)

def check_window_orders(con, name, sql, basecols):
    """Returns a list of offending window-ORDER-BY expressions (empty = ok)."""
    try:
        ast = json.loads(con.execute(
            "SELECT json_serialize_sql(?::varchar)", [sql]).fetchone()[0])
    except Exception:
        return []  # unparseable here: the actual run will surface real errors
    if not isinstance(ast, dict) or ast.get("error"):
        return []
    # scratch-table columns are stored bits BOTH engines read from the same
    # parquet — as safe as base-table columns, whatever their type
    import re
    stored = set(basecols)
    for path in re.findall(r"read_parquet\('([^']+)'", sql):
        try:
            for row in con.execute(
                    f"DESCRIBE SELECT * FROM read_parquet('{path}')").fetchall():
                stored.add(row[0].lower())
        except Exception:
            pass  # missing scratch surfaces as a real failure in the run
    aliases, orders = {}, []
    _collect_aliases(ast, aliases)
    _collect_window_orders(ast, orders)
    return [_expr_repr(e) for e in orders
            if not _expr_safe(e, aliases, stored, frozenset())]
# ---------------------------------------------------------------------------

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    basecols = set()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
        for row in con.execute(f"DESCRIBE {t}").fetchall():
            basecols.add(row[0].lower())
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        offending = check_window_orders(con, name, sql, basecols)
        if offending:
            print(f"FAIL {name}: window ORDER BY over raw computed float "
                  f"{offending} — rank selection can flip on a last-ulp "
                  "difference; order by round()/integer fixed point instead")
            n_fail += 1
            continue
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

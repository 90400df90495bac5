#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness check.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>

For each <name>/ parquet dir in verifyOutDir, runs oracle_sql.json[name] in
DuckDB (with the testdata parquet registered as views) and compares: row
count, column-name set, arrow column TYPES (the driver's hash is
type-sensitive — DuckDB sum(INTEGER) returning HUGEINT/decimal128 vs
Spark's int64 must FAIL here exactly like it fails there), and values
with columns sorted by name.
Dev-tool only — the engine itself is the Scala library.
"""
import sys, json, glob, os, math
import duckdb
import pyarrow.parquet as pq
import pyarrow as pa

TABLES = ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]

def norm(v):
    if isinstance(v, float):
        r = round(v, 9)
        # the driver's hash is bit-sensitive: -0.0 and +0.0 hash
        # differently there (r16's mm_text_alignment shipped "green"
        # locally because Python -0.0 == 0.0), so keep the zero sign
        # distinguishable here too
        if r == 0.0 and math.copysign(1.0, r) < 0:
            return "-0.0"
        return r
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    return v

def norm_type(t: pa.DataType) -> str:
    """Canonical type label matching the driver's type-sensitive hash.

    Only representation variants that carry no value semantics are
    merged (string widths, timestamp tz spelling); integer width vs
    decimal128 stays distinct — that IS the class this check exists for.
    """
    if pa.types.is_large_string(t) or pa.types.is_string(t):
        return "string"
    if pa.types.is_large_binary(t) or pa.types.is_binary(t):
        return "binary"
    if pa.types.is_timestamp(t):
        return f"timestamp[{t.unit}]"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"list<{norm_type(t.value_type)}>"
    return str(t)

def table_types(tbl: pa.Table):
    return {f.name: norm_type(f.type) for f in tbl.schema}

def table_rows(tbl: pa.Table):
    cols = sorted(tbl.column_names)
    data = [tbl.column(c).to_pylist() for c in cols]
    return cols, [tuple(norm(col[i]) for col in data) for i in range(tbl.num_rows)]

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        # testdata ships single-file tables; GenCorpus (Spark) writes
        # <table>.parquet/ directories — read either shape
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):
            p = f"{p}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    n_pass = n_fail = n_noop = 0
    for name in names:
        files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        spark_tbl = pa.concat_tables([pq.read_table(f) for f in files]) if files else None
        if name not in oracle:
            status = "rows-only"
            ok = spark_tbl is not None
            n_noop += 1
            print(f"{'OK ' if ok else 'FAIL'} {name}: {status} rows={spark_tbl.num_rows if spark_tbl is not None else 'MISSING'}")
            continue
        try:
            duck_tbl = con.sql(oracle[name]).arrow()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        if spark_tbl is None:
            print(f"FAIL {name}: spark result missing")
            n_fail += 1
            continue
        sc, srows = table_rows(spark_tbl)
        dc, drows = table_rows(duck_tbl)
        if sc != dc:
            print(f"FAIL {name}: columns spark={sc} duck={dc}")
            n_fail += 1
            continue
        st, dt = table_types(spark_tbl), table_types(duck_tbl)
        badt = {c: (st[c], dt[c]) for c in sc if st[c] != dt[c]}
        if badt:
            print(f"FAIL {name}: column TYPES differ (driver hash is "
                  f"type-sensitive): {badt}")
            n_fail += 1
            continue
        if len(srows) != len(drows):
            print(f"FAIL {name}: rowcount spark={len(srows)} duck={len(drows)}")
            n_fail += 1
            continue
        bad = [(i, a, b) for i, (a, b) in enumerate(zip(srows, drows)) if a != b]
        if bad:
            i, a, b = bad[0]
            print(f"FAIL {name}: {len(bad)}/{len(srows)} rows differ; first@{i}: spark={a} duck={b}")
            n_fail += 1
        else:
            print(f"OK   {name}: {len(srows)} rows, cols={sc}")
            n_pass += 1
    print(f"\n== {n_pass} pass, {n_fail} fail, {n_noop} rows-only ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()

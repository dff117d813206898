#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [--json <path>]

Mimics the driver: registers each <sfDir>/*.parquet as a view named by file
stem, runs every SQL in <outDir>/oracle_sql.json, reads the Spark result
parquet from <outDir>/<name>/, sorts columns by name, and compares values.

--json writes a per-query verdict artifact (the builder-side redundancy the
r18 verdict asked for after the driver's CORRECTNESS_r18.json came back
empty): {"sf": ..., "n_pass": N, "n_fail": N, "queries": {name: "pass" |
"FAIL: reason"}} — commit it as logs/ORACLE_r<N>.json with the gate run so
the round's correctness claim stays auditable even if the driver artifact
is lost.
"""
import sys, os, glob, json
import duckdb
import pandas as pd
import pyarrow.parquet as pq
import pyarrow.dataset as pads

def load_spark(outdir, name):
    path = os.path.join(outdir, name)
    return pads.dataset(path, format="parquet").to_table().to_pandas()

def norm(df):
    df = df[sorted(df.columns)].reset_index(drop=True)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif df[c].dtype == object:
            # duckdb may return Decimal/int128 as object
            try:
                df[c] = pd.to_numeric(df[c])
            except (ValueError, TypeError):
                pass
    return df

USAGE = "usage: python3 tools/check.py <sfDir> <verifyOutDir> [--json <path>]"

def parse_args(argv):
    json_out = None
    pos = []
    i = 1
    while i < len(argv):
        if argv[i] == "--json":
            if i + 1 >= len(argv) or argv[i + 1].startswith("--"):
                sys.exit(f"{USAGE}\n--json requires a path argument")
            json_out = argv[i + 1]
            i += 2
        else:
            pos.append(argv[i])
            i += 1
    if len(pos) != 2:
        sys.exit(USAGE)
    return pos[0], pos[1], json_out

def main():
    sfdir, outdir, json_out = parse_args(sys.argv)
    con = duckdb.connect()
    # resource caps (check_each.py sets these so one pathological oracle
    # can't thrash the whole box); no-ops when unset
    if os.environ.get("DUCKDB_MEMORY_LIMIT"):
        con.execute(f"SET memory_limit='{os.environ['DUCKDB_MEMORY_LIMIT']}'")
    if os.environ.get("DUCKDB_THREADS"):
        con.execute(f"SET threads={int(os.environ['DUCKDB_THREADS'])}")
    if os.environ.get("DUCKDB_TEMP_DIR"):
        con.execute(f"SET temp_directory='{os.environ['DUCKDB_TEMP_DIR']}'")
    for f in glob.glob(f"{sfdir}/*.parquet"):
        name = os.path.basename(f)[:-len(".parquet")]
        # a Spark-written table is a DIRECTORY of part files (the 10x
        # GenScale probe layout); the driver fixtures are single files
        src = f"{f}/*.parquet" if os.path.isdir(f) else f
        if name == "events":
            # probe layout stores ts as BIGINT nanos (Spark cannot write
            # TIMESTAMP(NANOS)); normalize to micros exactly like
            # graft.Tables.events does (`ts div 1000` -> timestamp_micros)
            typ = con.sql(f"SELECT typeof(ts) FROM '{src}' LIMIT 1").fetchone()[0]
            if typ == "BIGINT":
                con.execute(
                    f"CREATE VIEW events AS SELECT * REPLACE (make_timestamp(ts // 1000) AS ts) FROM '{src}'")
                continue
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{src}'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    verdicts = {}
    def fail(name, reason):
        nonlocal n_fail
        print(f"FAIL {name}: {reason}")
        verdicts[name] = f"FAIL: {reason}"
        n_fail += 1
    for name in sorted(oracle):
        try:
            spark_df = norm(load_spark(outdir, name))
            duck_df = norm(con.sql(oracle[name]).df())
        except Exception as e:
            fail(name, f"load/exec error: {e}")
            continue
        if list(spark_df.columns) != list(duck_df.columns):
            fail(name, f"columns spark={list(spark_df.columns)} duck={list(duck_df.columns)}")
            continue
        if len(spark_df) != len(duck_df):
            fail(name, f"rows spark={len(spark_df)} duck={len(duck_df)}")
            continue
        bad = []
        for c in spark_df.columns:
            a, b = spark_df[c], duck_df[c]
            eq = (a == b) | (a.isna() & b.isna())
            if not eq.all():
                i = (~eq).idxmax()
                bad.append(f"{c}[row {i}]: spark={a[i]!r} duck={b[i]!r} ({(~eq).sum()} diffs)")
        if bad:
            fail(name, "; ".join(bad))
        else:
            print(f"PASS {name} ({len(spark_df)} rows)")
            verdicts[name] = "pass"
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    if json_out:
        with open(json_out, "w") as f:
            json.dump({"sf": sfdir, "n_pass": n_pass, "n_fail": n_fail,
                       "queries": verdicts}, f, indent=1, sort_keys=True)
        print(f"wrote {json_out}")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()

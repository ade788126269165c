#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet written by graft.Verify, runs the
matching SQL from oracle_sql.json in DuckDB against the same fixture
tables, and compares schema + row values exactly (column order normalized
by name, like the driver).
"""
import json, os, sys, glob
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def connect(sf_dir):
    con = duckdb.connect()
    # bounded memory + disk spill: the heavy per-row list-CTE twins
    # (PQ family) otherwise exhaust the allocator, and a DuckDB OOM
    # poisons the connection — every later query fails spuriously
    con.execute("SET memory_limit='100GB'")
    con.execute("SET temp_directory='/tmp/duck_spill'")
    # the PQ-family oracles are thousands-of-expressions-wide CTE chains;
    # DuckDB's per-thread pipeline buffers make their memory scale with
    # thread count, so allow capping (default nproc OOMs at 32 threads)
    if os.environ.get("DUCKDB_THREADS"):
        con.execute(f"SET threads={int(os.environ['DUCKDB_THREADS'])}")
    for t in TABLES:
        # derived scale dirs (tools/MakeScale) store tables as parquet
        # DIRECTORIES named <t>.parquet — glob the part files
        path = f"{sf_dir}/{t}.parquet"
        src = f"'{path}/*.parquet'" if os.path.isdir(path) else f"'{path}'"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM {src}")
    # derived events keep ts as BIGINT nanos (the shape Spark reads under
    # nanosAsLong); the oracle SQL expects TIMESTAMP like the driver
    # fixtures (TIMESTAMP(NANOS) → µs), so normalize the view to match
    ts_type = {r[0]: r[1] for r in con.execute("DESCRIBE events").fetchall()}
    if ts_type.get("ts") == "BIGINT":
        epath = f"{sf_dir}/events.parquet"
        esrc = f"'{epath}/*.parquet'" if os.path.isdir(epath) else f"'{epath}'"
        con.execute("CREATE OR REPLACE VIEW events AS SELECT * REPLACE "
                    f"(make_timestamp(ts // 1000) AS ts) FROM {esrc}")
    return con

def main(sf_dir, out_dir):
    con = connect(sf_dir)
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    skip = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else set()
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if name in skip:
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet({files!r})").fetchdf()
            exp = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: {e}", flush=True)
            n_fail += 1
            # a failed (esp. OOM'd) query can poison the allocator —
            # rebuild the connection so later queries judge cleanly
            try:
                con.close()
            except Exception:
                pass
            con = connect(sf_dir)
            continue
        got = got.reindex(sorted(got.columns), axis=1)
        exp = exp.reindex(sorted(exp.columns), axis=1)
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(exp.columns)}")
            n_fail += 1
            continue
        if [str(d) for d in got.dtypes] != [str(d) for d in exp.dtypes]:
            print(f"FAIL {name}: dtypes {list(map(str, got.dtypes))} != {list(map(str, exp.dtypes))}")
            n_fail += 1
            continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} != {len(exp)}")
            n_fail += 1
            continue
        eq = got.equals(exp)
        if not eq:
            diff = (got != exp) & ~(got.isna() & exp.isna())
            bad = diff.any(axis=1)
            print(f"FAIL {name}: {int(bad.sum())}/{len(got)} rows differ; first:")
            print(got[bad].head(3))
            print(exp[bad].head(3))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    # an all-zero gate means the harness itself broke (empty oracle map,
    # missing dump dir) — fail LOUDLY instead of looking like a quiet
    # green (the round-7/8 empty-CORRECTNESS lesson)
    if n_pass == 0:
        print("ERROR: gate produced no results — harness/handoff failure")
        return 2
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))

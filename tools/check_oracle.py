#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir> [skipCsv]

Reads each <verifyOutDir>/<name>/ parquet written by graft.Verify, runs the
matching SQL from oracle_sql.json in DuckDB against the same fixture
tables, and compares schema + row values.

DRIVER-FAITHFUL COMPARISON (the round-15 lesson): the pre-r16 gate read
BOTH sides through DuckDB and compared pandas frames, so any
representation DuckDB's reader normalizes identically passed locally
while the driver's hash could still differ — exactly how the
decimal(38,0) graph trio shipped red with bit-identical values. This
version:

  1. reads the SPARK side through pyarrow (its own parquet reader, like
     the driver), the ORACLE side through DuckDB — two independent
     readers, no shared normalization;
  2. HARD-FAILS any Spark output whose parquet schema contains a decimal
     type (parquet int128 decimals are the known canonicalization trap;
     the registry's contract is to re-encode exact decimals as canonical
     integer strings before they leave the engine). Extend
     DECIMAL_ALLOWLIST only after a driver-green proof;
  3. canonicalizes every cell to a text rendering under one explicit
     policy (below) and compares the canonical rows exactly, in order —
     equality of canonical rows == equality of any hash of them.

Cell policy: null→"\\0N"; bool→"T"/"F"; int→decimal text; float→repr
(both sides are float64 from the same arithmetic; -0.0 is normalized to
0.0 because the two engines legitimately disagree on result sign of
zero); Decimal→normalized plain text; timestamp→UTC-naive ISO text;
date→ISO; bytes→hex; list/struct→recursive "[..]"/"{k=v,..}".
"""
import json, os, sys, glob
from decimal import Decimal
import datetime
import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# spark-side output columns PROVEN driver-hash-stable as decimals (none
# yet — the registry re-encodes decimals as strings instead)
DECIMAL_ALLOWLIST = set()

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

def canon_type(t):
    """Canonical type label for an Arrow type — loose enough to treat
    reader-equivalent encodings (string/large_string, timestamp units)
    as one type, strict across genuinely different logical types."""
    if pa.types.is_boolean(t): return "bool"
    if pa.types.is_integer(t): return f"int{t.bit_width}"
    if pa.types.is_floating(t): return "float"
    if pa.types.is_decimal(t): return f"decimal({t.precision},{t.scale})"
    if pa.types.is_string(t) or pa.types.is_large_string(t): return "str"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t): return "bin"
    if pa.types.is_timestamp(t): return "ts"
    if pa.types.is_date(t): return "date"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"list<{canon_type(t.value_type)}>"
    if pa.types.is_struct(t):
        inner = ",".join(f"{t.field(i).name}:{canon_type(t.field(i).type)}"
                         for i in range(t.num_fields))
        return f"struct<{inner}>"
    return str(t)

def canon_cell(v):
    """One explicit text rendering per logical value — the comparison's
    unit of truth. Any two cells rendering identically are equal; any
    cross-engine representation drift renders differently and fails."""
    if v is None:
        return "\0N"
    if isinstance(v, bool):
        return "T" if v else "F"
    if isinstance(v, int):
        return str(v)
    if isinstance(v, float):
        if v != v:
            return "NaN"
        if v == 0.0:
            return "0.0"  # fold -0.0 and 0.0: engines differ on zero sign
        return repr(v)
    if isinstance(v, Decimal):
        # plain text, no exponent, no trailing fractional zeros drift:
        # normalize scale-0 values to pure integer text
        s = format(v, "f")
        return s
    if isinstance(v, datetime.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(datetime.timezone.utc).replace(tzinfo=None)
        return v.isoformat(sep=" ", timespec="microseconds")
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return "0x" + bytes(v).hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon_cell(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}={canon_cell(v[k])}"
                              for k in sorted(v)) + "}"
    return str(v)

def canon_rows(tbl, cols):
    """Table → ordered list of canonical row strings, columns in the
    given (name-sorted) order."""
    data = {c: tbl.column(c).to_pylist() for c in cols}
    return ["\x01".join(canon_cell(data[c][i]) for c in cols)
            for i in range(tbl.num_rows)]

def main(sf_dir, out_dir):
    con = connect(sf_dir)
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    skip = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else set()
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if name in skip:
            continue
        files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            got = pa.concat_tables(
                [pq.read_table(f) for f in files], promote_options="default")
            exp = con.execute(sql).arrow()
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
        # decimal guard: the one output class with a PROVEN driver-hash
        # divergence (r15 graph trio) — fail before any value compare
        dec_cols = [f.name for f in got.schema
                    if pa.types.is_decimal(f.type)
                    and f"{name}.{f.name}" not in DECIMAL_ALLOWLIST]
        if dec_cols:
            print(f"FAIL {name}: spark output has decimal column(s) "
                  f"{dec_cols} — re-encode as canonical string/BIGINT "
                  "(driver parquet-int128 hash trap)")
            n_fail += 1
            continue
        gcols, ecols = sorted(got.schema.names), sorted(exp.schema.names)
        if gcols != ecols:
            print(f"FAIL {name}: columns {gcols} != {ecols}")
            n_fail += 1
            continue
        gtypes = [canon_type(got.schema.field(c).type) for c in gcols]
        etypes = [canon_type(exp.schema.field(c).type) for c in ecols]
        if gtypes != etypes:
            print(f"FAIL {name}: types {gtypes} != {etypes}")
            n_fail += 1
            continue
        if got.num_rows != exp.num_rows:
            print(f"FAIL {name}: rows {got.num_rows} != {exp.num_rows}")
            n_fail += 1
            continue
        grows, erows = canon_rows(got, gcols), canon_rows(exp, ecols)
        if grows != erows:
            bad = [i for i, (a, b) in enumerate(zip(grows, erows)) if a != b]
            print(f"FAIL {name}: {len(bad)}/{len(grows)} rows differ; first:")
            for i in bad[:3]:
                print(f"  row {i} spark : {grows[i]!r}")
                print(f"  row {i} oracle: {erows[i]!r}")
            n_fail += 1
        else:
            print(f"PASS {name} ({got.num_rows} rows)")
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

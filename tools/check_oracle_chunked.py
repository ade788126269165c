#!/usr/bin/env python3
"""check_oracle.py in OOM-isolated chunks.

At derived scale (6M-row fact tables) one long-lived DuckDB process can
poison its allocator mid-sweep (round-15: a single-process run of the
242-query registry died after ~58 queries with 2 KB "bad allocation"
failures while the machine had 120 GB free; every single one of the
"failed" queries passed in a fresh process). This wrapper runs the
registry through check_oracle.py in chunks, each its own process, and
retries any non-PASS singly — so an allocator death costs one chunk
re-run, never a poisoned tail of spurious reds.

Usage: python3 tools/check_oracle_chunked.py <sfDir> <verifyOutDir> [chunk=20]
"""
import json, os, re, subprocess, sys

def main(sf_dir, out_dir, chunk=20):
    allq = sorted(json.load(open(f"{out_dir}/oracle_sql.json")).keys())
    env = dict(os.environ)
    env.setdefault("DUCKDB_THREADS", "8")
    here = os.path.dirname(os.path.abspath(__file__))
    results = {}

    def run(names):
        skip = ",".join(q for q in allq if q not in names)
        try:
            r = subprocess.run(
                [sys.executable, f"{here}/check_oracle.py", sf_dir, out_dir,
                 skip],
                capture_output=True, text=True, env=env, timeout=3600)
        except subprocess.TimeoutExpired as e:
            # one hung DuckDB chunk must not abort the sweep and discard
            # everything accumulated so far — report no passes so the
            # chunk's queries fall through to the single-query retries
            print(f"TIMEOUT chunk [{names[0]}..{names[-1]}]: {e}",
                  flush=True)
            return set(), ""
        return set(re.findall(r"^PASS (\S+)", r.stdout, re.M)), r.stdout

    for i in range(0, len(allq), chunk):
        names = allq[i:i + chunk]
        passed, _ = run(names)
        for q in names:
            results[q] = "PASS" if q in passed else None
        for q in [x for x in names if results[x] is None]:
            p1, out1 = run([q])
            if q in p1:
                results[q] = "PASS"
            else:
                results[q] = "FAIL"
                fl = [l for l in out1.splitlines() if l.startswith("FAIL")]
                print(fl[0] if fl else f"FAIL {q}: (no output)", flush=True)
        done = sum(1 for v in results.values() if v)
        print(f"[{done}/{len(allq)}] chunk {i // chunk}: "
              f"{sum(1 for q in names if results[q] == 'PASS')}/{len(names)} pass",
              flush=True)
    n_pass = sum(1 for v in results.values() if v == "PASS")
    print(f"== {n_pass} pass, {len(allq) - n_pass} fail ==")
    return 0 if n_pass == len(allq) else 1

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  int(sys.argv[3]) if len(sys.argv) > 3 else 20))

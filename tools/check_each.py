#!/usr/bin/env python3
"""Per-query driver for check.py at probe scales: runs each oracle in its
own subprocess with a wall-clock budget and a DuckDB memory/thread cap, so
one pathological oracle (e.g. a replication-induced quadratic pair blowup)
cannot sink or thrash the whole table.

Usage: python3 tools/check_each.py <sfDir> <verifyOutDir> [timeoutSec] [memGB]
"""
import sys, os, json, shutil, subprocess, tempfile, time

def main():
    # abspath: the symlink target below is created inside a /tmp subdir, so
    # a relative outdir would dangle and every query would FAIL 'no output'
    sfdir, outdir = os.path.abspath(sys.argv[1]), os.path.abspath(sys.argv[2])
    timeout = int(sys.argv[3]) if len(sys.argv) > 3 else 1800
    memgb = sys.argv[4] if len(sys.argv) > 4 else "48"
    oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    here = os.path.dirname(os.path.abspath(__file__))
    results = {}
    for name in sorted(oracle):
        sub = tempfile.mkdtemp(prefix=f"check-{name}-")
        os.symlink(os.path.join(outdir, name), os.path.join(sub, name))
        with open(os.path.join(sub, "oracle_sql.json"), "w") as f:
            json.dump({name: oracle[name]}, f)
        env = dict(os.environ, DUCKDB_MEMORY_LIMIT=f"{memgb}GB", DUCKDB_THREADS="16")
        t0 = time.time()
        try:
            p = subprocess.run(
                [sys.executable, os.path.join(here, "check.py"), sfdir, sub],
                capture_output=True, text=True, timeout=timeout, env=env)
            line = [l for l in p.stdout.splitlines() if l.startswith(("PASS", "FAIL"))]
            results[name] = (line[0] if line else f"FAIL {name}: no output", time.time() - t0)
        except subprocess.TimeoutExpired:
            results[name] = (f"TIMEOUT {name}: oracle exceeded {timeout}s", time.time() - t0)
        shutil.rmtree(sub, ignore_errors=True)
        line, dt = results[name]
        print(f"{line}   [{dt:.0f}s]", flush=True)
    n_pass = sum(1 for l, _ in results.values() if l.startswith("PASS"))
    print(f"== {n_pass}/{len(results)} pass ==")

if __name__ == "__main__":
    main()

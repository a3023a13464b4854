#!/usr/bin/env python3
"""Fold the python-twin stream baseline INTO a StreamBench capture so
the Spark-vs-single-process crossover (STREAMING.md's r14 find: the
simhash sink beats the python twin outright at batch 4000) is
machine-checked round over round instead of re-measured by hand.

For every simhash_dedup row of the Spark capture, runs
tools/stream_baseline.py at the same (kept, batch_rows) cell and
attaches:
  py_twin_mean_warm_sec   the twin's warm mean s/batch
  py_twin_rows_per_s      the twin's sustained docs/s
  spark_over_py_speedup   twin_sec / spark_sec (>1 = Spark wins)

NOT part of the library (driver-side python stack only).

Usage: python3 tools/streambench_capture.py <spark_capture.json> <out.json> [universe_dir]
  spark_capture.json: one JSON object per line (the STREAMBENCH lines)
"""
import json
import re
import subprocess
import sys


def main():
    src, dst = sys.argv[1], sys.argv[2]
    universe = sys.argv[3] if len(sys.argv) > 3 else "/root/repo/benchdata/sf10"
    here = __file__.rsplit("/", 1)[0]
    rows = [json.loads(line) for line in open(src) if line.strip()]
    for r in rows:
        if r.get("sink") != "simhash_dedup":
            continue
        cmd = ["python3", f"{here}/stream_baseline.py", universe,
               str(r["kept"]), str(r["batch_rows"]), "6"]
        print(f"[twin] kept={r['kept']} batch={r['batch_rows']} ...", flush=True)
        out = subprocess.run(cmd, capture_output=True, text=True, check=True).stdout
        m = re.search(r"STREAM_BASELINE (\{.*\})", out)
        if not m:
            sys.exit(f"no STREAM_BASELINE line in twin output:\n{out[-2000:]}")
        tw = json.loads(m.group(1))
        r["py_twin_mean_warm_sec"] = tw["mean_warm_sec"]
        r["py_twin_rows_per_s"] = tw["rows_per_s"]
        r["spark_over_py_speedup"] = (
            round(tw["mean_warm_sec"] / r["mean_warm_sec"], 2)
            if r["mean_warm_sec"] else None)
    with open(dst, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    wins = [r for r in rows if r.get("spark_over_py_speedup", 0) and
            r["spark_over_py_speedup"] >= 1.0]
    print(f"[twin] merged {dst}: {len(wins)} simhash cells where Spark >= twin")


if __name__ == "__main__":
    main()

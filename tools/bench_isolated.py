#!/usr/bin/env python3
"""Fresh-JVM-per-sample isolated benchmark (VERDICT r8 next #1).

The in-process driver bench (graft.Bench, median-of-3 in ONE shared JVM)
demonstrably cannot resolve sub-2x perf claims on the shuffle-heavy
d-suite: round-over-round swings of +/-60% on untouched code (r7->r8:
d7 -46%, d3 +60%, d12 +63%). This runner removes the shared-JVM
confound entirely: every SAMPLE is its own java process running
graft.Bench restricted to a single query via SPARK_GRAFT_BENCH_ONLY,
with SPARK_GRAFT_BENCH_ITERS=1 so the reported number is the one timed
execution of that query in a cold-started, warmed-up (Bench's untimed
warmup job still runs) JVM.

Samples are taken ROUND-ROBIN across all requested cells (variant x
query), not per-cell blocks, so slow machine-wide drift (thermal, page
cache) lands evenly on every cell instead of biasing whichever cell ran
last. Reported per cell: n, median, p25/p75, IQR, and raw samples.

Usage:
  tools/bench_isolated.py --out BENCH_ISOLATED.json --n 10 \
      label=CLASSES_DIR:QUERY ...

e.g. an A/B of d9 across two builds plus twin-query comparisons:
  tools/bench_isolated.py --out BENCH_ISOLATED_r09.json --n 10 \
      d9@pre=/tmp/graft-pre/target/scala-2.13/classes:d9_dup_clusters \
      d9@post=/root/repo/target/scala-2.13/classes:d9_dup_clusters \
      m6=/root/repo/target/scala-2.13/classes:m6_merge_badkey \
      m12=/root/repo/target/scala-2.13/classes:m12_merge_badkey_salted
"""
import argparse
import json
import os
import statistics
import subprocess
import sys
import time

# Mirrors build.sbt's jdk17AddOpens — Spark 4.x on JDK 17 outside
# spark-submit needs the module opens spark-submit would inject.
ADD_OPENS = [
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
]


def run_sample(classes, query, sf_dir, cpus, mem):
    cmd = ["java"]
    for p in ADD_OPENS:
        cmd += ["--add-opens", f"{p}=ALL-UNNAMED"]
    cmd += [
        f"-Xmx{mem}",
        "-Dspark.ui.enabled=false",
        "-Dspark.sql.session.timeZone=UTC",
        "-cp", f"{classes}:/opt/spark/jars/*",
        "graft.Bench",
    ]
    env = dict(os.environ)
    env.update({
        "SPARK_GRAFT_SF_DIR": sf_dir,
        "SPARK_GRAFT_CPUS": str(cpus),
        "SPARK_GRAFT_BENCH_ITERS": "1",
        "SPARK_GRAFT_BENCH_ONLY": query,
    })
    r = subprocess.run(cmd, env=env, capture_output=True, text=True, timeout=900)
    line = next((l for l in reversed(r.stdout.splitlines())
                 if l.startswith('{"metric"')), None)
    if r.returncode != 0 or line is None:
        raise RuntimeError(
            f"sample failed rc={r.returncode}: {r.stderr.strip()[-500:]}")
    obj = json.loads(line)
    t = obj["queries"].get(query)
    if t is None or t < 0:
        raise RuntimeError(f"query {query} failed in-bench: {obj.get('failed')}")
    return t


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--n", type=int, default=10)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--mem", default="8g")
    ap.add_argument("cells", nargs="+", help="label=CLASSES_DIR:QUERY")
    args = ap.parse_args()

    cells = []
    for c in args.cells:
        label, rest = c.split("=", 1)
        classes, query = rest.rsplit(":", 1)
        cells.append({"label": label, "classes": classes, "query": query,
                      "samples": [], "errors": 0})

    t0 = time.time()
    for rnd in range(args.n):
        for cell in cells:
            try:
                t = run_sample(cell["classes"], cell["query"],
                               args.sf_dir, args.cpus, args.mem)
                cell["samples"].append(t)
                print(f"[{time.time()-t0:7.1f}s] round {rnd+1}/{args.n} "
                      f"{cell['label']}: {t:.3f}s", file=sys.stderr, flush=True)
            except Exception as e:
                cell["errors"] += 1
                print(f"[{time.time()-t0:7.1f}s] round {rnd+1}/{args.n} "
                      f"{cell['label']}: ERROR {e}", file=sys.stderr, flush=True)

    out = {
        "protocol": {
            "mode": "fresh JVM per sample (SPARK_GRAFT_BENCH_ONLY, ITERS=1)",
            "order": "round-robin across cells",
            "n_rounds": args.n, "sf_dir": args.sf_dir,
            "cpus": args.cpus, "mem": args.mem,
        },
        "cells": {},
    }
    for cell in cells:
        s = sorted(cell["samples"])
        if s:
            qs = statistics.quantiles(s, n=4, method="inclusive") if len(s) >= 2 else [s[0]] * 3
            stats = {"n": len(s), "median": round(statistics.median(s), 3),
                     "p25": round(qs[0], 3), "p75": round(qs[2], 3),
                     "iqr": round(qs[2] - qs[0], 3),
                     "min": round(s[0], 3), "max": round(s[-1], 3)}
        else:
            stats = {"n": 0}
        out["cells"][cell["label"]] = {
            "query": cell["query"], "classes": cell["classes"],
            **stats, "errors": cell["errors"],
            "samples": [round(x, 3) for x in cell["samples"]],
        }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps({k: {kk: v[kk] for kk in ("median", "p25", "p75", "n")
                          if kk in v}
                      for k, v in out["cells"].items()}, indent=2))


if __name__ == "__main__":
    main()

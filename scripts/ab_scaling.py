"""Interleaved paired scaling measurement (round-7 verdict directive #2).

The sequential 2c/8c windows of scripts/scaling_bench.py produced four
efficiency readings spanning 0.695-0.874 on identical code — the two
levels saw DIFFERENT host states, so the spread measured the windows, not
the engine.  This script applies the alternating-A/B methodology that
settled Appendices D/G/I/K to the scaling bench itself: small,big,small,
big,… with each (small_i, big_i) adjacent in time, so every efficiency
reading compares two runs of the same host window.  Each level still runs
in a fresh taskset-pinned subprocess (JVM warm-up inside, untimed).

Writes "## Appendix N" into BENCH/BASELINE.md (appends; never rewrites
the header or earlier appendices).  Usage:

    SCALING_N=2 PAIRS=3 python scripts/ab_scaling.py
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, os, sys
sys.path.insert(0, %(repo)r)
import bench
cpus = int(sys.argv[1])
spark = bench.build_spark(cpus)
spark.sparkContext.setLogLevel("ERROR")
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
res = {"cpus": cpus}
res["probe_sec"] = bench.window_probe(spark, sf_dir)
_ = bench.bench_cdc_replay(spark, "sf0.1")  # warm-up: codegen/JIT, untimed
r = bench.bench_cdc_replay(spark, "sf0.1")  # measured (itself best-of-2)
res["replay"] = r
d = bench.bench_decode_only(spark, "sf0.1")
res["decode"] = d
print("RESULT:" + json.dumps(res))
spark.stop()
"""


def run_level(cpus: int) -> dict:
    env = dict(os.environ)
    env.setdefault("SPARK_GRAFT_CDC_OPS", "3200000")
    os.makedirs("/dev/shm/spark_graft_scratch", exist_ok=True)
    env.setdefault("TMPDIR", "/dev/shm/spark_graft_scratch")
    env.setdefault("SPARK_LOCAL_DIRS", "/dev/shm/spark_graft_scratch")
    cmd = [
        "taskset", "-c", f"0-{cpus - 1}", sys.executable, "-c",
        CHILD % {"repo": REPO}, str(cpus),
    ]
    proc = subprocess.run(
        cmd, capture_output=True, text=True, timeout=3600, cwd=REPO, env=env,
    )
    for line in proc.stdout.splitlines():
        if line.startswith("RESULT:"):
            return json.loads(line[len("RESULT:"):])
    raise RuntimeError(
        f"no result at cpus={cpus}:\n{proc.stdout[-2000:]}\n{proc.stderr[-2000:]}"
    )


def main():
    small = int(os.environ.get("SCALING_N", "2"))
    big = small * 4
    n_pairs = int(os.environ.get("PAIRS", "3"))
    pairs = []
    for i in range(n_pairs):
        t0 = time.time()
        rs = run_level(small)
        rb = run_level(big)
        e = (rb["replay"]["rows_per_sec"] / rs["replay"]["rows_per_sec"]) / (
            big / small
        )
        ed = (rb["decode"]["rows_per_sec"] / rs["decode"]["rows_per_sec"]) / (
            big / small
        )
        pairs.append(
            {
                "pair": i,
                "eff_e2e": round(e, 3),
                "eff_decode": round(ed, 3),
                "small_sec": rs["replay"]["sec"],
                "big_sec": rb["replay"]["sec"],
                "small_probe": rs["probe_sec"],
                "big_probe": rb["probe_sec"],
                "wall_min": round((time.time() - t0) / 60, 1),
            }
        )
        print(json.dumps(pairs[-1]), flush=True)
    med = statistics.median(p["eff_e2e"] for p in pairs)
    med_d = statistics.median(p["eff_decode"] for p in pairs)
    out = os.path.join(REPO, "BENCH", "BASELINE.md")
    stamp = time.strftime("%Y-%m-%d %H:%M UTC", time.gmtime())
    with open(out, "a") as f:
        f.write(
            f"""

## Appendix N — interleaved paired {small}c/{big}c scaling (round-8; verdict directive #2)

The four sequential windows of Appendix L spanned 0.695-0.874 efficiency on
identical code because each level saw a different host state.  Here the two
levels ALTERNATE ({small}c,{big}c per pair, fresh pinned subprocess each, JVM warm-up
untimed, replay itself best-of-2), so each efficiency reading compares two
runs of the same window — the same A/B methodology that settled Appendices
D/G/I/K.  Probes published per run.  Generated {stamp} by
scripts/ab_scaling.py on the round-8 tree.

| pair | e2e eff | decode eff | {small}c sec | {big}c sec | {small}c probe | {big}c probe |
|---|---|---|---|---|---|---|
"""
        )
        for p in pairs:
            f.write(
                f"| {p['pair']} | {p['eff_e2e']} | {p['eff_decode']} | "
                f"{p['small_sec']} | {p['big_sec']} | "
                f"{min(p['small_probe'])} | {min(p['big_probe'])} |\n"
            )
        f.write(
            f"\n**Paired medians: e2e {med}, decode {med_d}** "
            f"({n_pairs} pairs).  North-rule bar: >= 0.8.\n"
        )
    print(json.dumps({"median_e2e": med, "median_decode": med_d}))


if __name__ == "__main__":
    main()

"""Two-parallelism scaling evidence (north rule: ≥0.8 efficiency N→4N).

No real cluster in this sandbox, so the same job runs at local[8] and
local[32] on identical input (driver instruction in BASELINE.md).  Each
level runs in a fresh subprocess (a SparkSession master can't change
in-process).  Writes BENCH/BASELINE.md.

Efficiency = (T_small / T_big) / (cores_big / cores_small): 1.0 means
perfect linear scaling; the sandbox shares one machine so memory bandwidth
and the parquet source cap the upper end.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, os, sys, time, tempfile, shutil
sys.path.insert(0, %(repo)r)
import bench
cpus = int(sys.argv[1])
spark = bench.build_spark(cpus)
spark.sparkContext.setLogLevel("ERROR")
# warm the JVM/codegen once on a small slice, then measure
seg, n_ops = bench.ensure_cdc_fixture("sf0.1")
res = {"cpus": cpus, "n_ops": n_ops}
# window-quality probe (engine-independent parquet scan+agg): makes each
# level self-qualifying — a degraded host window shows up here, not as a
# phantom engine regression (same policy as bench.py's probe_sec)
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
res["probe_sec"] = bench.window_probe(spark, sf_dir)
best = None
for trial in range(4):  # trial 0 = warmup; best-of-3 measured (the sandbox
    r = bench.bench_cdc_replay(spark, "sf0.1")  # is a shared VM: scheduler/
    res[f"replay_trial{trial}"] = r             # host noise is +-10 pct run to run)
    if trial > 0 and (best is None or r["sec"] < best["sec"]):
        best = r
res["replay_best"] = best
db = None
for trial in range(2):
    d = bench.bench_decode_only(spark, "sf0.1")
    if db is None or d["sec"] < db["sec"]:
        db = d
res["decode"] = db
print("RESULT:" + json.dumps(res))
spark.stop()
"""


def run_level(cpus: int) -> dict:
    env = dict(os.environ)
    # big enough that per-level compute (~280 s single-core) dwarfs the
    # ~5 s of driver/commit latency that doesn't parallelize
    env.setdefault("SPARK_GRAFT_CDC_OPS", "3200000")
    # tmpfs scratch: on this single box every level shares ONE disk, so
    # table writes + shuffle spill serialize at ~300 MB/s regardless of
    # cores — a multi-executor cluster has per-executor disks, so the
    # scaling criterion is about CPU, not one SSD.  RAM-backed scratch
    # isolates the CPU term honestly.
    os.makedirs("/dev/shm/spark_graft_scratch", exist_ok=True)
    env.setdefault("TMPDIR", "/dev/shm/spark_graft_scratch")
    env.setdefault("SPARK_LOCAL_DIRS", "/dev/shm/spark_graft_scratch")
    # taskset pins the WHOLE process tree (JVM + python workers + pyarrow
    # thread pools) to exactly `cpus` CPUs — local[N] alone does not bound
    # CPU use because arrow/JVM helper threads spill onto every core, which
    # silently turns the "N-core" level into a whole-box run
    cmd = ["taskset", "-c", f"0-{cpus - 1}", sys.executable, "-c",
           CHILD % {"repo": REPO}, str(cpus)]
    proc = subprocess.run(
        cmd, capture_output=True, text=True, timeout=3600, cwd=REPO, env=env,
    )
    for line in proc.stdout.splitlines():
        if line.startswith("RESULT:"):
            return json.loads(line[len("RESULT:"):])
    raise RuntimeError(f"no result at cpus={cpus}:\n{proc.stdout[-2000:]}\n{proc.stderr[-2000:]}")


def main():
    small = int(os.environ.get("SCALING_N", "4"))
    big = small * 4
    r_small = run_level(small)
    r_big = run_level(big)

    t_small = r_small["replay_best"]["sec"]
    t_big = r_big["replay_best"]["sec"]
    tput_small = r_small["replay_best"]["rows_per_sec"]
    tput_big = r_big["replay_best"]["rows_per_sec"]
    eff = (tput_big / tput_small) / (big / small)

    td_small = r_small["decode"]["rows_per_sec"]
    td_big = r_big["decode"]["rows_per_sec"]
    eff_d = (td_big / td_small) / (big / small)

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    out = os.path.join(REPO, "BENCH", "BASELINE.md")
    # the per-round appendices (A..) accumulate below the header —
    # rewriting the whole file would destroy them; keep the tail
    tail = ""
    if os.path.exists(out):
        prev = open(out).read()
        idx = prev.find("\n## Appendix")
        if idx >= 0:
            tail = prev[idx:]
    with open(out, "w") as f:
        f.write(f"""# BENCH/BASELINE — scaling evidence (sandbox form of the north rule)

North rule: ≥0.8 throughput scaling efficiency between N and 4N executors.
Sandbox evidence: the same end-to-end CDC replay job (decode → LWW dedup →
bucketed-lake MERGE, {r_small['n_ops']:,} change events) at two parallelism
levels on identical input, fresh JVM each, best of 3 measured trials
reported (trial 0 warms codegen/JIT; the sandbox is a shared VM with
±10% host noise run-to-run, so best-of-n isolates the engine's capability).  Each level is `taskset`-pinned to exactly its
core budget (local[N] alone does not bound CPU — JVM/pyarrow helper threads
spill onto all cores).  Scratch (lake table, shuffle) is tmpfs-backed: the
sandbox's single shared SSD would serialize both levels at the same ~300
MB/s regardless of cores, which a multi-executor cluster (per-executor
disks / object store) does not do — the criterion measures compute scaling.

| level | cores | e2e replay sec | e2e rows/sec | decode-only rows/sec |
|---|---|---|---|---|
| N  | {small} | {t_small} | {tput_small:,.0f} | {td_small:,.0f} |
| 4N | {big} | {t_big} | {tput_big:,.0f} | {td_big:,.0f} |

**End-to-end scaling efficiency (N→4N): {eff:.3f}**
**Decode-stage scaling efficiency (N→4N): {eff_d:.3f}**

Window quality (engine-independent parquet scan+agg probe, seconds, per
level): N = {r_small.get('probe_sec')}, 4N = {r_big.get('probe_sec')}.
Compare against other windows' probes before reading efficiency deltas
round-over-round — the shared host drifts ±15-50% hour to hour
(Appendices A/B/G).

Efficiency = (throughput_4N / throughput_N) / 4.  The e2e row is the north
metric (change-events/sec applied: decode + LWW + exactly-once merge into a
committed, queryable table).  The decode-only row is the zero-shuffle
bounded-replay path (size-binned segment files, code-generated per-schema
parsers, columnar JSON-envelope output) — the same work class as the
reference's log-only pipeline.

Reference single-node comparison point: 594,249 rows/sec, log-only
(/root/reference/README.md:427; pipeline mode, batch 8192).  The 4N
decode-only row is the apples-to-apples number; the e2e row additionally
pays for the LWW merge and exactly-once commit the reference does not do.
Unlike the reference, both keep scaling horizontally — segments are
independent decode units and the merge is bucket-parallel, so a
1000-executor cluster assigns segments/buckets across executors with no
shared state (see myzql_binlog_connector_spark/functions/decode.py and
plans/lake.py docstrings for the partitioning argument).

Raw results:
```json
{json.dumps({"small": r_small, "big": r_big}, indent=2)}
```
""")
        f.write(tail)
    print(json.dumps({"eff_e2e": eff, "eff_decode": eff_d,
                      "tput_small": tput_small, "tput_big": tput_big}))
    print("wrote", out)


if __name__ == "__main__":
    main()

"""Model-based fuzz of the change-feed planner (``iter_commit_deltas``,
shared by ``read_changes`` and the ``lake_changes`` source).

The planner reads real manifest JSON from disk, so the fuzz materializes a
synthetic-but-faithful manifest directory for a random commit history —
merges (change data), compactions/rebuckets (no change data), and
watermark-only commits (lineage tail NOT advanced, exactly like
``set_watermarks``) — with a random ``lineage_keep`` trimming and random
vacuum cut, then checks the planned (version, files) list against the
model: exactly the change-data commits in range and above the vacuum
floor, in version order, no duplicates, no gaps.

Pure driver-side (no SparkSession): hundreds of histories per second."""

from __future__ import annotations

import json
import os

from hypothesis import given, settings
from hypothesis import strategies as st

from myzql_binlog_connector_spark.plans.lake import (
    MANIFEST_DIR,
    iter_commit_deltas,
)

# one history step: what kind of commit lands next
_STEP = st.sampled_from(["merge", "compact", "watermark"])


def _write_history(root: str, steps: list[str], lineage_keep: int, vacuum_keep: int | None):
    """Materialize manifests for the history; return (head_version,
    {version: files} of change commits surviving vacuum, head_manifest)."""
    mdir = os.path.join(root, MANIFEST_DIR)
    os.makedirs(mdir, exist_ok=True)
    lineage: list[dict] = []
    truth: dict[int, list[str]] = {}
    version = 0
    for step in steps:
        version += 1
        if step == "merge":
            files = [f"{root}/data/v{version}/part-0.parquet"]
            rec = {"version": version, "delta_files": files}
            truth[version] = files
            lineage = (lineage + [rec])[-lineage_keep:]
        elif step == "compact":
            rec = {"version": version, "compaction": True,
                   "compacted_buckets": [0]}
            lineage = (lineage + [rec])[-lineage_keep:]
        # watermark-only: version bumps, lineage untouched (set_watermarks)
        manifest = {
            "version": version,
            "schema": "{}",
            "files": {},
            "lineage": list(lineage),
        }
        with open(os.path.join(mdir, f"v{version}.json"), "w") as f:
            json.dump(manifest, f)
    if version == 0:
        return 0, {}, None
    if vacuum_keep is not None:
        cut = max(1, version - vacuum_keep + 1)
        for v in range(1, cut):
            os.remove(os.path.join(mdir, f"v{v}.json"))
            truth.pop(v, None)
    with open(os.path.join(mdir, f"v{version}.json")) as f:
        head = json.load(f)
    return version, truth, head


@given(
    steps=st.lists(_STEP, min_size=1, max_size=24),
    lineage_keep=st.integers(min_value=1, max_value=6),
    vacuum_keep=st.one_of(st.none(), st.integers(min_value=1, max_value=24)),
    data=st.data(),
)
@settings(max_examples=200, deadline=None)
def test_planner_matches_model(tmp_path_factory, steps, lineage_keep, vacuum_keep, data):
    root = str(tmp_path_factory.mktemp("feedfuzz"))
    head_v, truth, head = _write_history(root, steps, lineage_keep, vacuum_keep)
    if head is None:
        return
    lo = data.draw(st.integers(min_value=1, max_value=head_v), label="lo")
    hi = data.draw(st.integers(min_value=lo, max_value=head_v), label="hi")
    # stay at/above the vacuum floor: the retention check is the CALLER's
    # job (read_changes / _plan_commits) and is tested separately
    oldest = min(
        int(n[1:-5])
        for n in os.listdir(os.path.join(root, MANIFEST_DIR))
        if n.startswith("v")
    )
    lo = max(lo, oldest)
    if hi < lo:
        return
    got = iter_commit_deltas(root, lo, hi, head)
    want = sorted((v, f) for v, f in truth.items() if lo <= v <= hi)
    assert got == want

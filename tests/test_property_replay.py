"""Property-based replay correctness: arbitrary op sequences → encode →
distributed decode+apply == pure-Python LWW oracle (SURVEY.md §5.2 item 1,
generalized beyond the seeded generator's op shapes)."""

from __future__ import annotations

import glob

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from myzql_binlog_connector_spark.binlog.encoder import (
    EventWriter,
    TRANSCRIPTS_SCHEMA,
)
from myzql_binlog_connector_spark.genlog import GeneratedStream, write_segments_parquet
from myzql_binlog_connector_spark.plans.apply import TranscriptsApplier
from myzql_binlog_connector_spark.plans.lake import BucketedLakeTable

# key space deliberately tiny so ops collide on keys (the interesting case)
keys = st.tuples(st.sampled_from(["a", "b", "c"]), st.integers(0, 3))
texts = st.text(
    alphabet=st.characters(codec="utf-8", exclude_categories=("Cs",)),
    min_size=0, max_size=40,
)
op_kinds = st.sampled_from(["I", "U", "D"])
ops_strategy = st.lists(st.tuples(op_kinds, keys, texts), min_size=1, max_size=40)


def _oracle(ops):
    state = {}
    for kind, key, text in ops:
        if kind == "D":
            state.pop(key, None)
        else:
            state[key] = text  # upsert semantics for both I and U
    return state


def _encode(ops, tmp_path):
    w = EventWriter()
    w.format_description()
    w.table_map(5, TRANSCRIPTS_SCHEMA)
    ts = 1_700_000_000_000_000
    for kind, (conv, turn), text in ops:
        ts += 1000
        row = (conv, turn, "user", text, None, ts)
        if kind == "I":
            w.write_rows(5, TRANSCRIPTS_SCHEMA, [row])
        elif kind == "U":
            w.update_rows(5, TRANSCRIPTS_SCHEMA, [(row, row)])
        else:
            w.delete_rows(5, TRANSCRIPTS_SCHEMA, [row])
    w.rotate("binlog.000002")
    stream = GeneratedStream(
        segments=[(1, [(off, i + 1, i + 1, pkt) for i, (off, pkt) in enumerate(w.events)])]
    )
    write_segments_parquet(stream, str(tmp_path))
    return sorted(glob.glob(str(tmp_path / "*.parquet")))


class TestReplayProperty:
    @settings(
        max_examples=12,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(ops=ops_strategy)
    def test_arbitrary_op_sequences_match_oracle(self, spark, tmp_path_factory, ops):
        tmp = tmp_path_factory.mktemp("prop")
        paths = _encode(ops, tmp / "seg")
        table = BucketedLakeTable(spark, str(tmp / "t"), ["conv_id", "turn_idx"], n_buckets=2)
        TranscriptsApplier(spark, table).apply_files(paths, batch_id=0)
        got = {(r.conv_id, r.turn_idx): r.text for r in table.read().collect()}
        want = _oracle(ops)
        assert got == want

"""Spark-facing decode: raw binlog event blobs → change-event envelope DF.

The plan shape (SURVEY.md §3.2 restatement):

    events(file_seq, offset, gtid, event_seq, event_blob)
      → repartition(file_seq)              # a segment is a self-contained
      → sortWithinPartitions(file_seq, offset)   # decode unit: TABLE_MAP
      → mapInArrow(decode)                 # precedes its ROWS events
      → [filter / dedup / merge downstream]

Scale notes: segments are independent decode units (each starts with
FORMAT_DESCRIPTION and re-announces TABLE_MAP before ROWS runs, exactly as a
real binlog file does), so decoding parallelizes linearly across segments —
at 10^10 events the source is tens of thousands of segment files spread over
executors, no global state, no driver collect.  The per-partition
``BinlogSession`` carries the table-map cache in arrival order, preserving
the reference's last-TABLE_MAP-wins semantics within each segment
(binlog_reader.zig:419-424).  Decode happens inside Arrow batches
(``mapInArrow``): Python runs once per ~8192-row batch, never per Spark row.
"""

from __future__ import annotations

import os
from typing import Iterator

import pyarrow as pa

from pyspark.sql import DataFrame

from ..binlog import rowvec as _rv
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..binlog.decoder import BinlogSession

ENVELOPE_SCHEMA = StructType(
    [
        StructField("timestamp", LongType(), False),
        StructField("server_id", IntegerType(), False),
        StructField("log_pos", LongType(), False),
        StructField("event_row_index", LongType(), False),
        StructField("database", StringType(), True),
        StructField("table_name", StringType(), True),
        StructField("dml_type", StringType(), False),
        StructField("before_values", StringType(), True),
        StructField("after_values", StringType(), True),
        StructField("gtid", LongType(), False),
        StructField("event_seq", LongType(), False),
        StructField("file_seq", IntegerType(), False),
        StructField("payload_schema", StringType(), True),
    ]
)

_ARROW_ENVELOPE = pa.schema(
    [
        ("timestamp", pa.int64()),
        ("server_id", pa.int32()),
        ("log_pos", pa.int64()),
        ("event_row_index", pa.int64()),
        ("database", pa.string()),
        ("table_name", pa.string()),
        ("dml_type", pa.string()),
        ("before_values", pa.string()),
        ("after_values", pa.string()),
        ("gtid", pa.int64()),
        ("event_seq", pa.int64()),
        ("file_seq", pa.int32()),
        ("payload_schema", pa.string()),
    ]
)

_COLS = [f.name for f in _ARROW_ENVELOPE]


def _env_to_batch(out) -> pa.RecordBatch:
    return pa.RecordBatch.from_arrays(
        [pa.array(col, type=f.type) for col, f in zip(out.columns(), _ARROW_ENVELOPE)],
        schema=_ARROW_ENVELOPE,
    )


#: dml_type marker for quarantined (dead-letter) packets — see
#: :func:`decode_changes` ``on_error="quarantine"``
DML_CORRUPT = "_corrupt"


def _quarantine_env_row(out, blob, file_seq, gtid, event_seq, err,
                        framed: bool = True) -> None:
    """Append a dead-letter envelope row for an undecodable packet: the
    error, the event-type byte, and a hex prefix of the raw bytes ride in
    ``after_values`` so a DLQ consumer can triage without re-reading the
    source.

    ``framed=False``: ``blob`` is a bare event BODY (vec-flush retries
    hand the deferred payload, not the framed packet), so byte 5 is row
    data, not the event type — report it as unknown rather than lie."""
    from ..binlog.decoder import _dumps

    mv = memoryview(blob)
    out.timestamp.append(0)
    out.server_id.append(0)
    out.log_pos.append(0)
    out.event_row_index.append(1)
    out.database.append(None)
    out.table_name.append(None)
    out.dml_type.append(DML_CORRUPT)
    out.before_values.append(None)
    out.after_values.append(_dumps({
        "error": f"{type(err).__name__}: {err}"[:500],
        "event_type": mv[5] if framed and len(mv) > 5 else None,
        "blob_prefix": bytes(mv[:64]).hex(),
        "blob_len": len(mv),
    }))
    out.gtid.append(gtid)
    out.event_seq.append(event_seq)
    out.file_seq.append(file_seq)
    out.payload_schema.append(None)


def _blob_views(arr) -> list:
    """Zero-copy memoryviews over a (Large)Binary Arrow array's data buffer.

    ``to_pylist()`` materializes every blob as Python ``bytes`` up front —
    double the peak memory of the batch.  Slicing one memoryview over the
    shared data buffer keeps the bytes where Arrow put them; the decoder
    stack (wire/decoder/rowcodec) consumes buffer-protocol objects
    throughout."""
    import numpy as np

    if isinstance(arr, pa.ChunkedArray):
        out: list = []
        for ch in arr.chunks:
            out.extend(_blob_views(ch))
        return out
    n = len(arr)
    if n == 0:
        return []
    bufs = arr.buffers()
    off_dtype = np.int64 if pa.types.is_large_binary(arr.type) else np.int32
    offs = np.frombuffer(
        bufs[1],
        dtype=off_dtype,
        count=n + 1,
        offset=arr.offset * np.dtype(off_dtype).itemsize,
    )
    # pyarrow Buffers export format 'b' (SIGNED char) — indexing would
    # return negative ints for bytes > 0x7f; cast('B') is zero-copy
    mv = memoryview(bufs[2]).cast("B")
    return [mv[offs[i] : offs[i + 1]] for i in range(n)]


def _vec_flush_rows(parallelism: int | None) -> int:
    """Per-worker deferred-row flush bound for the vectorized collectors.

    A fixed TOTAL budget (1M estimated rows across the job) divided by the
    worker count, clamped to [8192, 512k].  Rationale: the numpy kernels
    saturate their vectorization win by a few thousand rows per group, but
    the deferred buffers + flush output batches are ~100 bytes/row of hot
    working set PER WORKER — at local[32] a 512k/worker bound (~50 MB x 32)
    thrashed the shared memory bus and JVM heap and made the typed path
    1.8x slower than the per-row parsers (round-4 regression); 16-32k/worker
    restored it to fastest-overall.  At 2 cores the same formula yields the
    old 512k bound, where big batches win (+28% pinned A/B).
    ``SPARK_GRAFT_VEC_FLUSH_ROWS`` overrides unconditionally.
    """
    env = os.environ.get("SPARK_GRAFT_VEC_FLUSH_ROWS")
    if env:
        return int(env)
    if not parallelism or parallelism <= 0:
        return 1 << 19
    return max(8192, min(1 << 19, (1 << 20) // parallelism))


def make_decoder(table_filter=None, stop_position=None, out_batch_rows: int = 8192,
                 verify_crc: bool = False, on_error: str = "raise",
                 flush_rows: int | None = None):
    """Build the mapInArrow function.  One BinlogSession per partition: the
    table-map cache persists across Arrow batches within the partition,
    matching the reference reader whose cache lives for the connection.
    Decode is columnar end to end: the code-generated per-schema parsers
    (binlog/rowcodec.py) append straight into per-column lists — no per-row
    dicts anywhere on the path.

    ``on_error="quarantine"``: an undecodable packet (CRC mismatch, parse
    error, truncated body) becomes a dead-letter row with
    ``dml_type='_corrupt'`` instead of failing the job; decode continues.
    Default ``"raise"`` keeps reference-parity fail-fast semantics."""
    from ..binlog.decoder import EnvelopeBatch

    flush_rows = flush_rows or _rv.FLUSH_ROWS
    quarantine = on_error == "quarantine"

    def decode_partition(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        from ..binlog.rowvec import EnvVecCollector

        session = BinlogSession(
            table_filter=table_filter, stop_position=stop_position, verify_crc=verify_crc
        )
        vec = EnvVecCollector(_ARROW_ENVELOPE)
        out = EnvelopeBatch()

        def q_cb(fs, g, es, lp, payload, err):
            _quarantine_env_row(out, payload, fs, g, es, err, framed=False)

        for batch in batches:
            file_seqs = batch.column("file_seq").to_pylist()
            gtids = batch.column("gtid").to_pylist()
            event_seqs = batch.column("event_seq").to_pylist()
            blobs = _blob_views(batch.column("event_blob"))
            for i in range(batch.num_rows):
                # Per-row parsers append before/after_values row by row and
                # extend the meta columns only after the event fully decodes;
                # snapshot so a mid-event failure can be rolled back instead
                # of leaving the batch ragged (which would fail the whole
                # partition in RecordBatch.from_arrays — defeating quarantine
                # exactly on the events it exists for).  Lazy while the
                # batch is empty — truncate(None) clears (round-7 A/B: the
                # unconditional per-event snapshot was ~8% of clean decode
                # on the typed path; same economics here).
                marks = (
                    out.mark() if (quarantine and len(out)) else None
                )
                try:
                    session.process_packet_columnar_vec(
                        blobs[i], file_seqs[i], gtids[i], event_seqs[i], out, vec
                    )
                except Exception as e:
                    if not quarantine:
                        raise
                    out.truncate(marks)
                    _quarantine_env_row(
                        out, blobs[i], file_seqs[i], gtids[i], event_seqs[i], e
                    )
                if len(out) >= out_batch_rows:
                    yield _env_to_batch(out)
                    out = EnvelopeBatch()
            if vec.rows_hint >= flush_rows:
                for rb in vec.flush(on_error=on_error, quarantine=q_cb):
                    session.rows_emitted += rb.num_rows
                    yield rb
        for rb in vec.flush(on_error=on_error, quarantine=q_cb):
            session.rows_emitted += rb.num_rows
            yield rb
        if len(out):
            yield _env_to_batch(out)

    return decode_partition


# ---------------------------------------------------------------------------
# typed fast path: decode straight into typed Arrow columns (no JSON
# envelope, no from_json) — the apply pipeline's hot path
# ---------------------------------------------------------------------------

_META_ARROW = [
    ("_deleted", pa.bool_()),
    ("_gtid", pa.int64()),
    ("_event_seq", pa.int64()),
    ("_event_row_index", pa.int64()),
    ("_file_seq", pa.int32()),
    ("_log_pos", pa.int64()),
]

_INT_CODES = frozenset({1, 2, 3, 8, 9, 13, 16, 247, 248})  # ints/year/bit/enum/set
_FLOAT_CODES = frozenset({4, 5})


def _payload_kinds(descs: list[str]) -> list[str]:
    """Widest per-position Arrow kind over all schema descriptors seen:
    'i' int64 / 'f' float64 / 's' string."""
    import json as _json

    kinds: list[str] = []
    for desc in descs:
        for i, (code, meta, _n) in enumerate(_json.loads(desc)):
            if code == 254:  # STRING: ENUM/SET are ints, CHAR is string
                kind = "i" if (meta >> 8) in (247, 248) else "s"
            elif code in _INT_CODES:
                kind = "i"
            elif code in _FLOAT_CODES:
                kind = "f"
            else:
                kind = "s"
            if i >= len(kinds):
                kinds.append(kind)
            elif kinds[i] != kind:
                if {kinds[i], kind} == {"i", "f"}:
                    kinds[i] = "f"
                else:
                    kinds[i] = "s"
    return kinds


def make_typed_decoder(
    column_names: list[str],
    kinds: list[str],
    key_positions: tuple[int, ...],
    table_filter=None,
    stop_position=None,
    out_batch_rows: int = 8192,
    flush_rows: int | None = None,
    on_error: str = "raise",
):
    """Arrow UDF body: raw packets → typed change rows.

    Output columns: payload (one per ``column_names``, Arrow type per
    ``kinds``) + the merge meta columns.  DELETE rows carry only the key
    positions (from the before image) — matching the envelope-path
    semantics of ``TranscriptsApplier.typed_changes``.

    ``on_error="quarantine"``: the flagship replay path's parity with the
    envelope decoder's dead-letter contract — an undecodable packet (CRC
    mismatch, truncation, parse error) becomes a row whose payload columns
    are null and whose ``_corrupt`` column carries the triage record
    (error + event-type byte + hex prefix), instead of failing the job.
    A failed vectorized flush group retries its events singly so one
    corrupt body poisons only itself.  The output schema gains the
    ``_corrupt`` string column ONLY in this mode (null on good rows)."""
    quarantine = on_error == "quarantine"
    arrow_schema = pa.schema(
        [
            (name, {"i": pa.int64(), "f": pa.float64(), "s": pa.string()}[k])
            for name, k in zip(column_names, kinds)
        ]
        + _META_ARROW
    )
    out_schema = (
        arrow_schema.append(pa.field("_corrupt", pa.string()))
        if quarantine else arrow_schema
    )
    n_payload = len(column_names)

    def to_batch(cols: list[list]) -> pa.RecordBatch:
        arrays = [pa.array(c, type=f.type) for c, f in zip(cols, arrow_schema)]
        if quarantine:
            arrays.append(pa.nulls(len(cols[0]) if cols else 0, pa.string()))
        return pa.RecordBatch.from_arrays(arrays, schema=out_schema)

    def with_null_corrupt(rb: pa.RecordBatch) -> pa.RecordBatch:
        return rb.append_column("_corrupt", pa.nulls(rb.num_rows, pa.string()))

    def new_cols():
        return [[] for _ in range(n_payload + len(_META_ARROW))]

    kinds_t = tuple(kinds)
    keys_t = tuple(key_positions)
    flush_rows = flush_rows or _rv.FLUSH_ROWS

    def dead_batch(dead: list[tuple]) -> pa.RecordBatch:
        """Dead-letter rows: null payload, meta where parseable, _corrupt
        carrying the triage record (same fields as _quarantine_env_row)."""
        n = len(dead)
        arrays = [pa.nulls(n, f.type) for f in arrow_schema][:n_payload]
        arrays += [
            pa.array([False] * n, pa.bool_()),                 # _deleted
            pa.array([d[1] for d in dead], pa.int64()),        # _gtid
            pa.array([d[2] for d in dead], pa.int64()),        # _event_seq
            pa.array([0] * n, pa.int64()),                     # _event_row_index
            pa.array([d[0] for d in dead], pa.int32()),        # _file_seq
            pa.array([d[3] for d in dead], pa.int64()),        # _log_pos
            pa.array([d[4] for d in dead], pa.string()),       # _corrupt
        ]
        return pa.RecordBatch.from_arrays(arrays, schema=out_schema)

    def corrupt_text(blob, err, framed: bool = True) -> str:
        # framed=False: bare event body (vec-flush retry) — byte 5 is row
        # data, not the event type; report unknown rather than lie
        import json as _json

        mv = memoryview(blob)
        return _json.dumps({
            "error": f"{type(err).__name__}: {err}"[:500],
            "event_type": mv[5] if framed and len(mv) > 5 else None,
            "blob_prefix": bytes(mv[:64]).hex(),
            "blob_len": len(mv),
        }, separators=(",", ":"))

    def decode_stream(packet_iter):
        """packet_iter yields (blob, file_seq, gtid, event_seq).

        Hot shape (fixed-width + varchar + timestamp columns — the whole
        transcripts schema): events defer into a ``TypedVecCollector`` and
        decode as batched numpy array programs (binlog/rowvec.py) — no
        per-row Python at all.  Everything else (partial updates, cold
        column types) decodes through the code-generated per-row parsers
        (binlog/rowcodec.py) appending into Arrow builder lists."""
        from ..binlog.decoder import BinlogSession
        from ..binlog.rowvec import TypedVecCollector

        session = BinlogSession(table_filter=table_filter, stop_position=stop_position)
        vec = TypedVecCollector(kinds_t, keys_t, n_payload, arrow_schema)
        cols = new_cols()
        # apps: payload appends + _deleted append; meta_cols: the rest
        apps = tuple(c.append for c in cols[: n_payload + 1])
        meta_cols = cols[n_payload + 1 :]
        dead: list[tuple] = []  # (file_seq, gtid, event_seq, log_pos, text)

        def q_cb(fs, g, es, lp, payload, err):
            dead.append((fs, g, es, lp, corrupt_text(payload, err, framed=False)))

        n = 0
        for blob, file_seq, gtid, event_seq in packet_iter:
            if quarantine:
                # per-row parsers extend the builder lists mid-event;
                # a failure must roll back instead of leaving the batch
                # ragged (same policy as make_decoder).  LAZY snapshot
                # (round-7 A/B: an unconditional tuple(len) per event cost
                # ~8% of clean-stream decode): n == 0 ⇔ cols is empty —
                # the steady state when every event takes the vectorized
                # hot path — so the rollback target is "clear"; a real
                # snapshot is taken only while a cold batch accumulates.
                marks = tuple(len(c) for c in cols) if n else None
                try:
                    n += session.process_packet_typed_vec(
                        blob, file_seq, gtid, event_seq,
                        apps, meta_cols, kinds_t, keys_t, n_payload, vec,
                    )
                except Exception as e:
                    if marks is None:
                        for c in cols:
                            del c[:]
                    else:
                        for c, m in zip(cols, marks):
                            del c[m:]
                    mv = memoryview(blob)
                    lp = (
                        int.from_bytes(mv[14:18], "little")
                        if len(mv) >= 18 else 0
                    )
                    dead.append(
                        (file_seq, gtid, event_seq, lp, corrupt_text(blob, e))
                    )
            else:
                n += session.process_packet_typed_vec(
                    blob, file_seq, gtid, event_seq,
                    apps, meta_cols, kinds_t, keys_t, n_payload, vec,
                )
            if n >= out_batch_rows:
                yield to_batch(cols)
                cols = new_cols()
                apps = tuple(c.append for c in cols[: n_payload + 1])
                meta_cols = cols[n_payload + 1 :]
                n = 0
            if vec.rows_hint >= flush_rows:
                # bound deferred-buffer memory (and keep string columns far
                # below the int32 Arrow offset limit on huge inputs); sized
                # per worker count — see _vec_flush_rows
                for rb in vec.flush(on_error=on_error, quarantine=q_cb):
                    session.rows_emitted += rb.num_rows
                    yield with_null_corrupt(rb) if quarantine else rb
        if n:
            yield to_batch(cols)
        for rb in vec.flush(on_error=on_error, quarantine=q_cb):
            session.rows_emitted += rb.num_rows
            yield rb if not quarantine else with_null_corrupt(rb)
        if dead:
            yield dead_batch(dead)

    return decode_stream, out_schema


def _bin_pack_paths(spark, paths: list[str], per_core: int = 2) -> DataFrame:
    """LPT bin-packing of segment files into decode tasks.

    One task per *file* drowns small segments in per-task overhead (~25 ms
    each) and lets one hot segment straggle a whole wave; packing by file
    size into ``per_core × parallelism`` bins gives one balanced wave with
    amortized task cost.  File size is a good proxy for decode cost (bytes
    ≈ events).  Returns a DataFrame with one JSON-encoded path list per row,
    one row per partition."""
    import heapq
    import json as _json
    import os

    n_bins = max(1, min(len(paths), spark.sparkContext.defaultParallelism * per_core))

    def size_of(p):
        try:
            return os.path.getsize(p)
        except OSError:
            return 1  # non-local FS: fall back to uniform packing

    sized = sorted(((size_of(p), p) for p in paths), reverse=True)
    bins: list[list[str]] = [[] for _ in range(n_bins)]
    heap = [(0, i) for i in range(n_bins)]
    heapq.heapify(heap)
    for sz, p in sized:
        load, i = heapq.heappop(heap)
        bins[i].append(p)
        heapq.heappush(heap, (load + sz, i))
    bins = [b for b in bins if b]
    # parallelize slices exactly one bin per partition — a round-robin
    # repartition() would clump bins (observed: 2 bins in one task, 0 in
    # another) and add a shuffle stage
    rdd = spark.sparkContext.parallelize(
        [(_json.dumps(b),) for b in bins], len(bins)
    )
    return spark.createDataFrame(rdd, "paths string")


def decode_typed_from_files(
    spark,
    paths: list[str],
    column_names: list[str],
    kinds: list[str],
    key_positions: tuple[int, ...] = (0, 1),
    table_filter=None,
    stop_position=None,
    on_error: str = "raise",
) -> DataFrame:
    """Zero-shuffle typed decode: size-balanced file bins, pyarrow read
    inside the task, typed Arrow columns out.  The bounded-replay fast
    path.

    ``on_error="quarantine"`` adds a ``_corrupt`` string column (null on
    good rows); undecodable packets become dead-letter rows instead of
    failing the job — see :func:`make_typed_decoder`."""
    import json as _json

    import pyarrow.parquet as pq

    from pyspark.sql.types import (
        BooleanType,
        DoubleType,
    )

    decode_stream, arrow_schema = make_typed_decoder(
        column_names, kinds, key_positions, table_filter, stop_position,
        flush_rows=_vec_flush_rows(spark.sparkContext.defaultParallelism),
        on_error=on_error,
    )
    fields = [
        StructField(name, {"i": LongType(), "f": DoubleType(), "s": StringType()}[k], True)
        for name, k in zip(column_names, kinds)
    ] + [
        StructField("_deleted", BooleanType(), False),
        StructField("_gtid", LongType(), False),
        StructField("_event_seq", LongType(), False),
        StructField("_event_row_index", LongType(), False),
        StructField("_file_seq", IntegerType(), False),
        StructField("_log_pos", LongType(), False),
    ]
    if on_error == "quarantine":
        fields.append(StructField("_corrupt", StringType(), True))
    spark_schema = StructType(fields)

    bins_df = _bin_pack_paths(spark, paths)

    def decode_files(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            for blob in batch.column("paths").to_pylist():
                for path in _json.loads(blob):
                    tbl = pq.read_table(
                        path,
                        columns=["file_seq", "offset", "gtid", "event_seq", "event_blob"],
                        use_threads=False,  # tasks are already core-parallel
                    )
                    packet_iter = zip(
                        tbl.column("event_blob").to_pylist(),
                        tbl.column("file_seq").to_pylist(),
                        tbl.column("gtid").to_pylist(),
                        tbl.column("event_seq").to_pylist(),
                    )
                    yield from decode_stream(packet_iter)

    return bins_df.mapInArrow(decode_files, schema=spark_schema)


def decode_segment_files(
    spark,
    paths: list[str],
    table_filter=None,
    stop_position: tuple[int, int] | None = None,
    out_batch_rows: int = 32768,
) -> DataFrame:
    """Zero-shuffle decode: one task per segment file, read with pyarrow
    inside the task, decode inline.

    ``decode_changes`` must shuffle raw blobs to co-locate segments; when
    the store is laid out one-file-per-segment (our generator, and the
    natural layout of a binlog archive), the file itself is the decode unit
    — size-balanced bins of segment files give one wave of tasks with no
    data movement at all.  This is the high-throughput bounded-replay path;
    the streaming path keeps ``decode_changes`` because foreachBatch hands
    it blob rows."""
    import json as _json

    import pyarrow.parquet as pq

    bins_df = _bin_pack_paths(spark, paths)
    flush_rows = _vec_flush_rows(spark.sparkContext.defaultParallelism)

    def decode_files(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        from ..binlog.decoder import BinlogSession, EnvelopeBatch
        from ..binlog.rowvec import EnvVecCollector

        for batch in batches:
            for pblob in batch.column("paths").to_pylist():
                for path in _json.loads(pblob):
                    session = BinlogSession(
                        table_filter=table_filter, stop_position=stop_position
                    )
                    vec = EnvVecCollector(_ARROW_ENVELOPE)
                    tbl = pq.read_table(
                        path,
                        columns=["file_seq", "offset", "gtid", "event_seq", "event_blob"],
                        use_threads=False,  # tasks are already core-parallel
                    )
                    file_seqs = tbl.column("file_seq").to_pylist()
                    gtids = tbl.column("gtid").to_pylist()
                    event_seqs = tbl.column("event_seq").to_pylist()
                    blobs = _blob_views(tbl.column("event_blob"))
                    out = EnvelopeBatch()
                    for i in range(tbl.num_rows):
                        session.process_packet_columnar_vec(
                            blobs[i], file_seqs[i], gtids[i], event_seqs[i], out, vec
                        )
                        if len(out) >= out_batch_rows:
                            yield _env_to_batch(out)
                            out = EnvelopeBatch()
                        if vec.rows_hint >= flush_rows:
                            for rb in vec.flush():
                                session.rows_emitted += rb.num_rows
                                yield rb
                    if len(out):
                        yield _env_to_batch(out)
                    for rb in vec.flush():
                        session.rows_emitted += rb.num_rows
                        yield rb

    return bins_df.mapInArrow(decode_files, schema=ENVELOPE_SCHEMA)


SCHEMA_SCAN_SCHEMA = StructType(
    [
        StructField("database", StringType(), True),
        StructField("table_name", StringType(), True),
        StructField("payload_schema", StringType(), True),
    ]
)

_ARROW_SCHEMA_SCAN = pa.schema(
    [("database", pa.string()), ("table_name", pa.string()), ("payload_schema", pa.string())]
)


def scan_schemas(events_df: DataFrame) -> DataFrame:
    """Light pre-pass: parse only the 19-byte headers and TABLE_MAP events,
    emitting (database, table_name, payload_schema) rows.  Row decode is
    skipped entirely, so this costs ~1% of a full decode — it feeds the
    typed-extraction schema without persisting the decoded envelope.

    When the source carries the ``event_type`` column (segment stores
    written by this engine do), the TABLE_MAP predicate is pushed into the
    parquet scan so only TABLE_MAP blobs ever reach Python."""
    import json as _json

    from pyspark.sql import functions as F

    from ..binlog.constants import CRC_LEN, HEADER_LEN, EventType
    from ..binlog.decoder import parse_table_map

    if "event_type" in events_df.columns:
        events_df = events_df.filter(
            F.col("event_type") == int(EventType.TABLE_MAP)
        ).select("event_blob")

    def scan(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        seen: set[bytes] = set()
        rows: list[tuple[str, str, str]] = []
        for batch in batches:
            blobs = _blob_views(batch.column("event_blob"))
            for i in range(batch.num_rows):
                blob = blobs[i]
                # binlogs re-announce TABLE_MAP before every statement's
                # ROWS events, so a segment store carries ~1 per statement
                # (hundreds of thousands); identical schemas have
                # byte-identical payloads past the 6B table_id + 2B flags.
                # Dedupe on those raw bytes FIRST — a set-add per event —
                # and run the actual parse only once per distinct schema
                # (was: full parse_table_map per event, ~5x the cost of
                # the whole pre-pass)
                if blob[5] != EventType.TABLE_MAP:
                    continue  # byte 5 = event_type; keeps the dedup set
                    # TABLE_MAP-only when the source lacks the pushdown col
                raw_key = bytes(blob[1 + HEADER_LEN + 8 : len(blob) - CRC_LEN])
                if raw_key in seen:
                    continue
                seen.add(raw_key)
                body = blob[1 : len(blob) - CRC_LEN]
                try:
                    _tid, schema = parse_table_map(body[HEADER_LEN:])
                except Exception:
                    # corrupt announcement: this PRE-PASS only discovers
                    # schemas, so skip it — real binlogs re-announce per
                    # statement and a good copy (different raw bytes)
                    # still lands here.  The decode stage decides the
                    # corrupt event's fate: raise in fail-fast mode,
                    # dead-letter in quarantine mode.
                    continue
                desc = _json.dumps(
                    [[c.type_code, c.meta, int(c.nullable)] for c in schema.columns],
                    separators=(",", ":"),
                )
                rows.append((schema.database, schema.table, desc))
        if rows:
            yield pa.RecordBatch.from_pydict(
                {
                    "database": [r[0] for r in rows],
                    "table_name": [r[1] for r in rows],
                    "payload_schema": [r[2] for r in rows],
                },
                schema=_ARROW_SCHEMA_SCAN,
            )

    return events_df.mapInArrow(scan, schema=SCHEMA_SCAN_SCHEMA).distinct()


def decode_changes(
    events_df: DataFrame,
    table_filter=None,
    stop_position: tuple[int, int] | None = None,
    already_partitioned: bool = False,
    verify_crc: bool = False,
    on_error: str = "raise",
) -> DataFrame:
    """Decode a DataFrame of raw framed packets into the change envelope.

    ``events_df`` columns: file_seq int, offset long, gtid long,
    event_seq long, event_blob binary.

    ``stop_position``: (file_seq, log_pos) exclusive upper bound — events
    whose log_pos >= bound are excluded (binlog_reader.zig:443-455).

    ``already_partitioned``: skip the repartition+sort when the caller
    guarantees segment-aligned, offset-ordered partitions (e.g. one source
    file per segment read with a file-per-partition layout).

    ``on_error="quarantine"``: undecodable packets become dead-letter rows
    (``dml_type='_corrupt'``, error + hex prefix in ``after_values``)
    instead of failing the job — route them with
    ``df.filter("dml_type = '_corrupt'")``; appliers exclude them.
    """
    df = events_df
    if not already_partitioned:
        # RANGE-partition whole segments together, then order within.
        # Hash partitioning here had classic few-distinct-keys skew: ~2×
        # parallelism segment ids hashed into parallelism partitions leave
        # some partitions with 3-4 segments and others empty, so the
        # decode wave ran at the speed of the unluckiest task (paired A/B
        # at sf1.0: range median 2.78s vs hash 3.24s, worst trial 2.9s vs
        # 5.4s).  Ranges at 2× parallelism keep every partition to ~one
        # contiguous segment run; equal keys still land together, which is
        # all segment-integral decode needs.  The partition count is
        # explicit: AQE would otherwise coalesce this small-by-bytes
        # shuffle into one task and serialize the decode — blob bytes are
        # a bad proxy for decode CPU (each blob fans out to ~85 envelope
        # rows).
        n = events_df.sparkSession.sparkContext.defaultParallelism
        df = df.repartitionByRange(2 * n, "file_seq").sortWithinPartitions(
            "file_seq", "offset"
        )
    return df.mapInArrow(
        make_decoder(
            table_filter=table_filter,
            stop_position=stop_position,
            verify_crc=verify_crc,
            on_error=on_error,
            flush_rows=_vec_flush_rows(
                events_df.sparkSession.sparkContext.defaultParallelism
            ),
        ),
        schema=ENVELOPE_SCHEMA,
    )

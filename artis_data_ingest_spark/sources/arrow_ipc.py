"""Apache Arrow IPC ingest + sink (Feather v2 / the ``.arrow`` and
``.arrows`` files every Arrow-native tool exchanges).

Arrow IPC is the columnar interchange of the ML-tooling world —
HuggingFace ``datasets`` stores shards as Arrow files, Polars/DuckDB
dump ``.arrow``, Flight payloads are the stream format on a socket.
pyarrow ships in this image, so both framings are first-class:

  * FILE format (``ARROW1`` magic, footer with a record-batch index
    — what ``feather.write_feather`` emits), read memory-mapped;
  * STREAM format (schema message then batches, no footer — what a
    socket capture or ``RecordBatchStreamWriter`` produces).

:func:`read_arrow_ipc` reads MANY files as one DataFrame (one task
per file, format auto-detected per file by magic, rows tagged
``_source``); the schema is inferred once driver-side and every
other file must match it exactly — a shard with drifted columns
fails loudly with its path, never null-fills.  Scalar columns plus
``list<scalar>`` (the embedding-shard shape) are supported.

:func:`write_arrow_ipc` is the sink half: one IPC file per Spark
partition (Arrow batches pass through, column-major, no row pivot),
atomically renamed, with a ``_SUCCESS`` marker after every task
finished — the same publish discipline as the tar/WARC sinks.

Scale posture: the file is the parallelism unit in both directions;
batches move through ``mapInArrow`` so nothing is ever pivoted to
rows in Python.
"""

from __future__ import annotations

import glob as _glob
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

_FILE_MAGIC = b"ARROW1"


class ArrowIpcError(ValueError):
    """File is not Arrow IPC / schema drifted across shards."""


def _spark_type(arrow_type) -> T.DataType:
    import pyarrow as pa

    scalars = {
        pa.int8(): T.ByteType(), pa.int16(): T.ShortType(),
        pa.int32(): T.IntegerType(), pa.int64(): T.LongType(),
        pa.float32(): T.FloatType(), pa.float64(): T.DoubleType(),
        pa.string(): T.StringType(),
        pa.large_string(): T.StringType(),
        pa.bool_(): T.BooleanType(), pa.date32(): T.DateType(),
        pa.binary(): T.BinaryType(),
        pa.large_binary(): T.BinaryType(),
    }
    if arrow_type in scalars:
        return scalars[arrow_type]
    if pa.types.is_timestamp(arrow_type):
        return (T.TimestampType() if arrow_type.tz
                else T.TimestampNTZType())
    if pa.types.is_decimal(arrow_type):
        return T.DecimalType(arrow_type.precision, arrow_type.scale)
    if pa.types.is_list(arrow_type) or pa.types.is_large_list(
        arrow_type
    ):
        return T.ArrayType(_spark_type(arrow_type.value_type))
    raise ArrowIpcError(
        f"unsupported Arrow type {arrow_type!r} (scalars and "
        "list<scalar> only)"
    )


def _open_any(path: str):
    """→ pyarrow RecordBatch reader for either IPC framing."""
    import pyarrow as pa
    import pyarrow.ipc as ipc

    with open(path, "rb") as fh:
        head = fh.read(6)
    try:
        if head == _FILE_MAGIC:
            return ipc.open_file(pa.memory_map(path))
        return ipc.open_stream(pa.OSFile(path, "rb"))
    except pa.ArrowInvalid as ex:
        raise ArrowIpcError(
            f"{path} is not an Arrow IPC file/stream: {ex}"
        ) from ex


def _reader_schema(path: str):
    return _open_any(path).schema


def read_arrow_ipc(
    spark: SparkSession, paths: list[str] | str
) -> DataFrame:
    """Many Arrow IPC files (file or stream framing, auto-detected
    per file) as ONE DataFrame + ``_source`` basename tag."""
    if isinstance(paths, str):
        resolved = sorted(_glob.glob(paths)) or [paths]
    else:
        resolved = sorted(paths)
    if not resolved:
        raise ArrowIpcError("read_arrow_ipc: empty path list")
    resolved = [os.path.abspath(p) for p in resolved]
    arrow_schema = _reader_schema(resolved[0])
    first = resolved[0]
    fields = [
        (f.name, _spark_type(f.type)) for f in arrow_schema
    ]
    out_schema = T.StructType(
        [T.StructField(n, t, True) for n, t in fields]
        + [T.StructField("_source", T.StringType(), False)]
    )
    want = [(f.name, str(f.type)) for f in arrow_schema]

    def load(batches):
        import pyarrow as pa

        for batch in batches:
            for path in batch.column("path").to_pylist():
                reader = _open_any(path)
                have = [(f.name, str(f.type)) for f in reader.schema]
                if have != want:
                    raise ArrowIpcError(
                        f"{path}: schema {have} drifted from "
                        f"{first}: {want} — shards must agree"
                    )
                src = os.path.basename(path)
                if hasattr(reader, "num_record_batches"):  # file fmt
                    it = (
                        reader.get_batch(i)
                        for i in range(reader.num_record_batches)
                    )
                else:
                    it = iter(reader)
                for rb in it:
                    yield pa.RecordBatch.from_arrays(
                        list(rb.columns)
                        + [pa.array([src] * rb.num_rows,
                                    pa.string())],
                        names=[f.name for f in rb.schema]
                        + ["_source"],
                    )

    n_parts = max(1, min(len(resolved), 32))
    return (
        spark.createDataFrame([(p,) for p in resolved], "path string")
        .repartition(n_parts)
        .mapInArrow(load, out_schema)
    )


def write_arrow_ipc(
    df: DataFrame,
    out_dir: str,
    stream: bool = False,
    compression: str | None = None,
) -> int:
    """One Arrow IPC file per Spark partition under ``out_dir``
    (``part-NNNNN.arrow``, or ``.arrows`` stream framing with
    ``stream=True``), written column-major straight from the task's
    Arrow batches and atomically renamed; ``_SUCCESS`` stamped after
    all tasks finish.  Returns the file count.  ``compression``:
    None | 'zstd' | 'lz4' (IPC body buffer compression)."""
    import pyarrow as pa

    os.makedirs(out_dir, exist_ok=True)
    # resolve the arrow schema ONCE on the driver so empty partitions
    # still write valid (zero-batch) files and types never drift
    probe_schema = df.schema

    def _arrow_schema():
        return pa.schema([
            pa.field(f.name, _to_arrow(f.dataType))
            for f in probe_schema.fields
        ])

    def _to_arrow(dt):
        m = {
            "tinyint": pa.int8(), "smallint": pa.int16(),
            "int": pa.int32(), "bigint": pa.int64(),
            "float": pa.float32(), "double": pa.float64(),
            "string": pa.string(), "boolean": pa.bool_(),
            "date": pa.date32(), "binary": pa.binary(),
            "timestamp": pa.timestamp("us", tz="UTC"),
            "timestamp_ntz": pa.timestamp("us"),
        }
        s = dt.simpleString()
        if s in m:
            return m[s]
        if isinstance(dt, T.DecimalType):
            return pa.decimal128(dt.precision, dt.scale)
        if isinstance(dt, T.ArrayType):
            return pa.list_(_to_arrow(dt.elementType))
        raise ArrowIpcError(
            f"unsupported column type {s!r} for the IPC sink"
        )

    ext = "arrows" if stream else "arrow"

    def _write(batches):
        import pyarrow.ipc as ipc
        from pyspark import TaskContext

        # IpcWriteOptions is not picklable — build it in the task
        opts = ipc.IpcWriteOptions(compression=compression)
        pid = TaskContext.get().partitionId()
        schema = _arrow_schema()
        final = os.path.join(out_dir, f"part-{pid:05d}.{ext}")
        tmp = os.path.join(out_dir, f"_tmp-part-{pid:05d}.{ext}")
        sink = pa.OSFile(tmp, "wb")
        writer = (
            ipc.new_stream(sink, schema, options=opts) if stream
            else ipc.new_file(sink, schema, options=opts)
        )
        n = 0
        with writer:
            for rb in batches:
                writer.write_batch(rb.cast(schema))
                n += rb.num_rows
        sink.close()
        os.replace(tmp, final)
        yield pa.RecordBatch.from_arrays(
            [pa.array([final], pa.string()),
             pa.array([n], pa.int64())],
            names=["path", "n_rows"],
        )

    manifest = df.mapInArrow(
        _write, "path string, n_rows long"
    ).collect()  # bounded: one row per partition
    with open(os.path.join(out_dir, "_SUCCESS"), "w"):
        pass
    return len(manifest)

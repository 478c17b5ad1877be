"""Spark 4 Python DataSource over the training-shard export format.

The export side (``sources/export.py``) writes parquet partitioned by
(lang, shard_id) plus a self-validating ``manifest.json``. This module is
the CONSUMER side as a first-class Spark source: a custom
``pyspark.sql.datasource.DataSource`` named ``training_shards`` that

- derives its partition list from the MANIFEST, not a directory listing —
  one ``InputPartition`` per shard, so Spark schedules shard reads across
  executors exactly like any other splittable source (and a shard missing
  from disk fails loudly instead of silently shrinking the corpus);
- reads each shard's parquet with pyarrow and yields Arrow RecordBatches —
  the zero-copy path into Spark's columnar pipeline (no per-row Python);
- re-attaches the (lang, shard_id) partition values as constant columns,
  mirroring what Spark's own partitioned-parquet reader does;
- optionally (``option("validate", "true")``) recomputes the shard's
  order-insensitive content checksum ON READ and refuses to emit a shard
  whose bytes don't match the manifest — integrity enforcement at the
  source boundary, where a trainer wants it.

This is the pattern for wrapping any bespoke corpus layout (WebDataset-ish
tar shards, JSONL bundles, vendor feeds) as a parallel Spark source: the
manifest drives partition planning; pyarrow does the IO; Spark never needs
the layout to be one of its built-ins.
"""

from __future__ import annotations

import json
import os
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

SHARD_SCHEMA = (
    "doc_id bigint, n_tokens bigint, text string, lang string, shard_id bigint"
)
CHECKSUM_MOD = 1_000_000_007  # same constant as sources/export.py


def _md5_int60(s: str) -> int:
    import hashlib

    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)


class ShardPartition(InputPartition):
    def __init__(self, lang: str, shard_id: int, path: str, xor: int, summod: int):
        self.lang = lang
        self.shard_id = shard_id
        self.path = path
        self.xor = xor
        self.summod = summod


class TrainingShardsReader(DataSourceReader):
    def __init__(self, options: dict):
        self.root = options.get("path")
        if not self.root:
            raise ValueError("training_shards: option 'path' (export dir) required")
        self.validate = str(options.get("validate", "false")).lower() == "true"

    def partitions(self) -> Sequence[InputPartition]:
        with open(os.path.join(self.root, "manifest.json")) as f:
            manifest = json.load(f)
        return [
            ShardPartition(
                s["lang"],
                int(s["shard_id"]),
                s["path"],
                int(s["content_xor"]),
                int(s["content_sum_mod"]),
            )
            for s in manifest["shards"]
        ]

    def read(self, part: ShardPartition) -> Iterator:
        import pyarrow as pa
        import pyarrow.parquet as pq

        if part is None:  # zero-shard manifest: Spark still issues one read
            return
        tbl = pq.read_table(part.path, columns=["doc_id", "n_tokens", "text"])
        if self.validate:
            xor, summod = 0, 0
            for doc_id, text in zip(
                tbl.column("doc_id").to_pylist(), tbl.column("text").to_pylist()
            ):
                h = _md5_int60(f"{doc_id}|{text}")
                xor ^= h
                summod += h % CHECKSUM_MOD
            if xor != part.xor or summod != part.summod:
                raise ValueError(
                    f"training_shards: checksum mismatch for shard "
                    f"(lang={part.lang}, shard_id={part.shard_id}) — content on "
                    f"disk does not match the manifest"
                )
        n = tbl.num_rows
        out = pa.table(
            {
                "doc_id": tbl.column("doc_id").cast(pa.int64()),
                "n_tokens": tbl.column("n_tokens").cast(pa.int64()),
                "text": tbl.column("text").cast(pa.string()),
                "lang": pa.array([part.lang] * n, pa.string()),
                "shard_id": pa.array([part.shard_id] * n, pa.int64()),
            }
        )
        yield from out.to_batches()


class TrainingShardsDataSource(DataSource):
    """``spark.read.format("training_shards").load(export_dir)``."""

    @classmethod
    def name(cls) -> str:
        return "training_shards"

    def schema(self) -> str:
        return SHARD_SCHEMA

    def reader(self, schema) -> DataSourceReader:
        return TrainingShardsReader(self.options)

    def simpleStreamReader(self, schema):
        return TrainingShardsStreamReader(self.options)


def register_training_shards(spark) -> None:
    """Idempotently register the source with this session."""
    try:
        spark.dataSource.register(TrainingShardsDataSource)
    except Exception:  # already registered under this name
        pass


# ---------------------------------------------------------- registered query

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

import feature_datalake_sl_mandic_spark.operators.text  # noqa: E402,F401  (registers corpus_pack_shards)
from feature_datalake_sl_mandic_spark.registry import _REGISTRY as _REG  # noqa: E402
from feature_datalake_sl_mandic_spark.registry import register  # noqa: E402


@register(
    "pyds_training_shards_roundtrip",
    # The custom source must hand back exactly what the packer decided, so
    # the oracle is the SAME shard-totals SQL that checks corpus_pack_shards.
    oracle=_REG["corpus_pack_shards"].oracle,
    tags=("sources", "python-datasource", "arrow", "export", "roundtrip"),
)
def pyds_training_shards_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end custom-source roundtrip: pack documents into token-budget
    shards, export them (parquet + manifest), then read the export back
    through the ``training_shards`` Python DataSource WITH on-read checksum
    validation and re-aggregate per-shard totals. Hash-matching the
    pack-shards oracle proves the whole write -> manifest -> custom-source
    read loop is lossless; the checksum option proves the read actually
    verified content integrity (a tampered shard would fail the scan — see
    tests/test_pyds.py).

    Scale shape: the source plans one InputPartition per manifest shard, so
    a 100k-shard export reads with 100k-way parallelism and Arrow batches
    flow straight into columnar processing; validation is per-shard local
    work on the executor that read the bytes."""
    import tempfile

    from feature_datalake_sl_mandic_spark.catalog import load_table
    from feature_datalake_sl_mandic_spark.operators.text import pack_shard_assignments
    from feature_datalake_sl_mandic_spark.sources.export import export_training_shards

    docs = load_table(spark, sf_dir, "documents").where(
        # shards partition by (lang, shard_id) and checksum over text:
        # null-keyed rows have no shard home and are excluded up front
        F.col("lang").isNotNull() & F.col("text").isNotNull()
    )
    packed = pack_shard_assignments(docs).join(docs.select("doc_id", "text"), "doc_id")
    out = tempfile.mkdtemp(prefix="pyds_shards_")
    export_training_shards(packed, out)
    register_training_shards(spark)
    df = (
        spark.read.format("training_shards")
        .option("validate", "true")
        .load(out)
    )
    return (
        df.groupBy("lang", "shard_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
        )
        .orderBy("lang", "shard_id")
    )


# ------------------------------------------------------- streaming replay

from pyspark.sql.datasource import SimpleDataSourceStreamReader  # noqa: E402


class TrainingShardsStreamReader(SimpleDataSourceStreamReader):
    """Shard-arrival replay: each micro-batch delivers the next
    ``maxShardsPerBatch`` shards from the manifest, in (lang, shard_id)
    order — a deterministic stand-in for a feed where shard directories land
    over time. Offsets are just the count of shards consumed, so restarts
    resume exactly and ``readBetweenOffsets`` replays any committed batch
    byte-identically (the exactly-once replay contract checkpoint recovery
    needs).

    Uses the SIMPLE stream-reader API (driver-side reads): right for
    manifest-bounded micro-batches; a partition-parallel
    ``DataSourceStreamReader`` is the upgrade path when single shards exceed
    driver comfort."""

    def __init__(self, options: dict):
        self.root = options.get("path")
        if not self.root:
            raise ValueError("training_shards: option 'path' (export dir) required")
        with open(os.path.join(self.root, "manifest.json")) as f:
            manifest = json.load(f)
        self.shards = sorted(
            manifest["shards"], key=lambda s: (s["lang"], s["shard_id"])
        )
        self.per_batch = int(options.get("maxShardsPerBatch", "1"))

    def initialOffset(self) -> dict:
        return {"i": 0}

    def _rows(self, lo: int, hi: int):
        import pyarrow.parquet as pq

        for s in self.shards[lo:hi]:
            tbl = pq.read_table(s["path"], columns=["doc_id", "n_tokens", "text"])
            for doc_id, n_tokens, text in zip(
                tbl.column("doc_id").to_pylist(),
                tbl.column("n_tokens").to_pylist(),
                tbl.column("text").to_pylist(),
            ):
                yield (doc_id, n_tokens, text, s["lang"], int(s["shard_id"]))

    def read(self, start: dict):
        i = int(start["i"])
        n = len(self.shards)
        if i >= n:
            return iter([]), {"i": i}
        j = min(i + self.per_batch, n)
        # a LIST iterator, not a generator: Spark's simple-reader wrapper
        # both next()s the result and deep-copies it into the prefetch
        # cache for checkpoint replay — generators aren't picklable,
        # bare lists aren't iterators.
        return iter(list(self._rows(i, j))), {"i": j}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(list(self._rows(int(start["i"]), int(end["i"]))))

    def commit(self, end: dict) -> None:
        pass  # manifest-backed source: nothing to clean up


# --------------------------------------------------- custom writer (sink side)

from dataclasses import dataclass  # noqa: E402

from pyspark.sql.datasource import (  # noqa: E402
    DataSourceWriter,
    WriterCommitMessage,
)


@dataclass
class _ShardCommit(WriterCommitMessage):
    path: str
    n_rows: int
    n_chars: int


class JsonlShardsWriter(DataSourceWriter):
    """Task side: each partition writes ONE JSONL shard to a temp name and
    reports (path, rows, chars) in its commit message. Driver side: commit()
    atomically publishes `_manifest.json` from the collected messages — the
    same two-phase pattern real table formats use (tasks stage files, the
    driver's single commit makes them visible). abort() leaves no manifest,
    so failed jobs are invisible to readers by construction."""

    def __init__(self, options: dict):
        self.root = options.get("path")
        if not self.root:
            raise ValueError("jsonl_shards: option 'path' required")

    def write(self, iterator) -> _ShardCommit:
        import json as _json
        import os
        import uuid

        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        os.makedirs(self.root, exist_ok=True)
        path = os.path.join(self.root, f"shard-{pid:05d}-{uuid.uuid4().hex}.jsonl")
        n_rows = n_chars = 0
        with open(path, "w") as f:
            for row in iterator:
                line = _json.dumps(row.asDict(), sort_keys=True, default=str)
                f.write(line + "\n")
                n_rows += 1
                n_chars += len(line)
        return _ShardCommit(path=path, n_rows=n_rows, n_chars=n_chars)

    def commit(self, messages) -> None:
        import json as _json
        import os

        manifest = {
            "shards": [
                {"path": m.path, "n_rows": m.n_rows, "n_chars": m.n_chars}
                for m in messages
                if m is not None
            ],
            "n_rows": sum(m.n_rows for m in messages if m is not None),
        }
        tmp = os.path.join(self.root, "_manifest.json.tmp")
        with open(tmp, "w") as f:
            _json.dump(manifest, f, indent=2, sort_keys=True)
        os.replace(tmp, os.path.join(self.root, "_manifest.json"))

    def abort(self, messages) -> None:
        import os

        for m in messages:
            if m is not None and os.path.exists(m.path):
                os.remove(m.path)


class JsonlShardsDataSource(DataSource):
    """``df.write.format("jsonl_shards").option("path", d).mode("append").save()``
    — the WRITE side of the Python DataSource API: per-task staged JSONL
    shards published atomically by a driver-side manifest commit."""

    @classmethod
    def name(cls) -> str:
        return "jsonl_shards"

    def writer(self, schema, overwrite: bool) -> DataSourceWriter:
        return JsonlShardsWriter(self.options)


def register_jsonl_shards(spark) -> None:
    """Idempotently register the sink with this session."""
    try:
        spark.dataSource.register(JsonlShardsDataSource)
    except Exception:
        pass

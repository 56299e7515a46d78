"""The Arrow-vectorized extraction operator (SURVEY.md §2.9, §3.4).

One ``mapInArrow`` stage is the ONLY JVM→Python crossing in the whole
pipeline: batches of ``(bucket, conv_id, turn_idx, role, text)`` arrive
as Arrow RecordBatches, the pure-Python kernels run data-local on each
row of the batch, and one Arrow batch of results goes back. No
row-at-a-time Python UDFs exist anywhere (input_hint mandate).

Scale notes:
- extraction is per-turn pure (no cross-turn state), so Arrow batch
  boundaries, partitioning and parallelism cannot change results
  (SURVEY.md §7.3.5);
- memory per task is bounded by
  ``spark.sql.execution.arrow.maxRecordsPerBatch`` regardless of
  partition size — a mega-conversation partition streams through in
  bounded batches;
- the Python worker is reused across batches
  (``spark.python.worker.reuse`` default), so kernel import cost is
  amortized per executor, not per batch.
"""

from __future__ import annotations

from typing import Iterator

import pyarrow as pa
from pyspark.sql import DataFrame

from ..kernel.dispatch import extract_turn

# Arrow-side output schema. Must stay in lock-step with
# sources.tableio.EXTRACTED_SCHEMA (+ leading bucket passthrough).
_SPAN_STRUCT = pa.struct(
    [
        pa.field("span_idx", pa.int32(), nullable=False),
        pa.field("kind", pa.string(), nullable=False),
        pa.field("text", pa.string(), nullable=False),
        pa.field("start", pa.int32(), nullable=False),
        pa.field("end", pa.int32(), nullable=False),
    ]
)

_OUT_SCHEMA = pa.schema(
    [
        pa.field("bucket", pa.int32()),
        pa.field("conv_id", pa.string()),
        pa.field("turn_idx", pa.int32()),
        pa.field("kind", pa.string()),
        pa.field("extracted_text", pa.string()),
        pa.field("spans", pa.list_(_SPAN_STRUCT)),
        pa.field("blocks_kept", pa.int64()),
        pa.field("blocks_dropped", pa.int64()),
        pa.field("parse_failed", pa.int32()),
    ]
)

OUT_DDL = (
    "bucket int, conv_id string, turn_idx int, kind string, "
    "extracted_text string, "
    "spans array<struct<span_idx:int,kind:string,text:string,start:int,end:int>>, "
    "blocks_kept long, blocks_dropped long, parse_failed int"
)


def _extract_batches(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
    for batch in batches:
        # bucket/conv_id/turn_idx are pure pass-through: reuse the
        # incoming Arrow buffers as-is (zero-copy) instead of
        # round-tripping them through Python lists — only role/text are
        # materialized, only computed columns are rebuilt.
        roles = batch.column("role").to_pylist()
        texts = batch.column("text").to_pylist()

        kinds, etexts, spans_col = [], [], []
        kept, dropped, failed = [], [], []
        for role, text in zip(roles, texts):
            res = extract_turn(role, text)
            kinds.append(res["kind"])
            etexts.append(res["extracted_text"])
            spans_col.append(res["spans"])
            kept.append(res["blocks_kept"])
            dropped.append(res["blocks_dropped"])
            failed.append(res["parse_failed"])

        yield pa.RecordBatch.from_arrays(
            [
                batch.column("bucket"),
                batch.column("conv_id"),
                batch.column("turn_idx"),
                pa.array(kinds, pa.string()),
                pa.array(etexts, pa.string()),
                pa.array(spans_col, pa.list_(_SPAN_STRUCT)),
                pa.array(kept, pa.int64()),
                pa.array(dropped, pa.int64()),
                pa.array(failed, pa.int32()),
            ],
            schema=_OUT_SCHEMA,
        )


def extract_arrow(df: DataFrame) -> DataFrame:
    """Apply the extraction kernels to a DataFrame with columns
    ``(bucket, conv_id, turn_idx, role, text)``; bucket is passed
    through for per-partition audit grouping."""
    return df.select("bucket", "conv_id", "turn_idx", "role", "text").mapInArrow(
        _extract_batches, OUT_DDL
    )

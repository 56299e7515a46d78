"""Sequential golden-fixture oracle (SURVEY.md §5.2.1).

Runs the extraction kernels one row at a time, in plain Python, with no
Spark anywhere — a genuinely independent driver path. The Spark
pipeline's partitioning, sorting and Arrow batching are therefore
exercised *against* these fixtures rather than sharing them.

Fixture rows are rendered with the fixture-exact serializer
(``textutil.to_min_json``: Python ``json.dumps`` defaults,
``ensure_ascii=False`` — /root/reference/app.py:731,736) and written
sorted by ``(conv_id, turn_idx)``.
"""

from __future__ import annotations

from typing import Dict, Iterable, Iterator, List

from .dispatch import extract_turn
from .textutil import to_min_json


def extract_rows(rows: Iterable[Dict]) -> Iterator[Dict]:
    """transcript rows → golden rows (spans rendered to JSON text)."""
    for r in rows:
        res = extract_turn(r.get("role"), r.get("text"))
        yield {
            "conv_id": r["conv_id"],
            "turn_idx": r["turn_idx"],
            "kind": res["kind"],
            "extracted_text": res["extracted_text"],
            "spans_json": to_min_json(res["spans"]),
            "blocks_kept": res["blocks_kept"],
            "blocks_dropped": res["blocks_dropped"],
            "parse_failed": res["parse_failed"],
        }


def golden_rows(rows: Iterable[Dict]) -> List[Dict]:
    out = list(extract_rows(rows))
    out.sort(key=lambda r: (r["conv_id"], r["turn_idx"]))
    return out


def write_golden_jsonl(rows: Iterable[Dict], path: str) -> int:
    n = 0
    with open(path, "w", encoding="utf-8") as f:
        for g in golden_rows(rows):
            f.write(to_min_json(g))
            f.write("\n")
            n += 1
    return n


def read_golden_jsonl(path: str) -> List[Dict]:
    import json

    with open(path, encoding="utf-8") as f:
        return [json.loads(ln) for ln in f if ln.strip()]

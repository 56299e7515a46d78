"""PDF-derived token-stream segmentation (SURVEY.md §2.3 F1/F3, §2.6 O1).

The payload (FIXTURES.md §1.2) is base64 of ``%PDF-TOKENS`` + a compact
JSON token stream mirroring the JSON layout tree the reference walks
after async OCR (/root/reference/app.py:371-412):

    {"shards": [{"name": "...", "pages": [{"blocks": [{"paragraphs":
        [{"words": [{"t": "word", "br": null|1|2|3|5}, ...]}, ...]},
        ...]}, ...]}, ...]}

Semantics preserved from the reference:

- shards sorted lexicographically by name before the walk
  (/root/reference/app.py:357) — page numbering is deterministic even
  when the storage listing is unordered;
- a single global ``page_idx`` increments across shards
  (/root/reference/app.py:373-381);
- per page, lines are assembled block→paragraph→word with the
  dict-variant fold: tail flushed per *paragraph* with ``.rstrip()``
  (/root/reference/app.py:402-406);
- ``page_count = page_idx or 1`` (/root/reference/app.py:411);
- dense page relabel + gap fill to 1..max(1, page_count)
  (/root/reference/app.py:453-459).
"""

from __future__ import annotations

import base64
import binascii
import json
from typing import Dict, List, Optional, Tuple

from . import lines as L

MAGIC = "%PDF-TOKENS"
# base64 of the first 9 payload bytes ("%PDF-TOKE") — a constant prefix
# of every encoded payload, usable for native-expression dispatch.
B64_MAGIC_PREFIX = "JVBERi1UT0tF"


class PdfStreamError(ValueError):
    """Raised when the payload is not a valid token stream."""


def decode_payload(text: str) -> dict:
    """base64 → magic check → JSON parse. Any failure raises
    ``PdfStreamError`` (callers fall back deterministically)."""
    try:
        raw = base64.b64decode(text, validate=True)
    except (binascii.Error, ValueError) as e:
        raise PdfStreamError(f"bad base64: {e}") from e
    try:
        decoded = raw.decode("utf-8")
    except UnicodeDecodeError as e:
        raise PdfStreamError(f"bad utf-8: {e}") from e
    if not decoded.startswith(MAGIC):
        raise PdfStreamError("missing %PDF-TOKENS magic")
    try:
        obj = json.loads(decoded[len(MAGIC):])
    except json.JSONDecodeError as e:
        raise PdfStreamError(f"bad json: {e}") from e
    if not isinstance(obj, dict):
        raise PdfStreamError("token stream root is not an object")
    return obj


def _paragraph_words(para: dict) -> List[Tuple[str, Optional[int]]]:
    return [
        ("" if (t := w.get("t")) is None else str(t), w.get("br"))
        for w in para.get("words") or []
    ]


def walk_pages(stream: dict) -> Tuple[Dict[int, List[str]], int]:
    """Shard-sorted walk → ``(per_page line map, page_count)``.

    Mirrors /root/reference/app.py:371-411: global page index across
    sorted shards; per-paragraph tail flush with ``.rstrip()``;
    ``page_count = page_idx or 1``.
    """
    shards = list(stream.get("shards") or [])
    shards.sort(key=lambda s: str(s.get("name", "")))

    per_page: Dict[int, List[str]] = {}
    page_idx = 0
    for shard in shards:
        for page in shard.get("pages") or []:
            page_idx += 1
            page_lines: List[str] = []
            for block in page.get("blocks") or []:
                for para in block.get("paragraphs") or []:
                    page_lines.extend(
                        L.assemble_lines(_paragraph_words(para), L.TAIL_RSTRIP)
                    )
            per_page[page_idx] = page_lines
    return per_page, (page_idx or 1)


def extract_pages(text: str) -> List[Tuple[int, str]]:
    """Full PDF-payload segmentation: decode → walk → dense relabel.

    Returns ``[(page_number, page_text), ...]`` for pages
    1..max(1, page_count), gap-filled with "".
    """
    per_page, page_count = walk_pages(decode_payload(text))
    return L.dense_pages(per_page, page_count)

"""Regenerate the committed golden fixtures (fixtures/golden_tiny.jsonl).

Usage: python scripts/make_fixtures.py

Deterministic: same seed → byte-identical file. The tiny tier is 40
conversations (seed 42) with one forced 120-turn mega-conversation.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from ocr_engine_spark.kernel.oracle import write_golden_jsonl  # noqa: E402
from ocr_engine_spark.sources.synth import gen_transcripts  # noqa: E402

TINY = dict(n_convs=40, seed=42, mega=1, mega_turns=120)


def main() -> None:
    out = os.path.join(os.path.dirname(__file__), "..", "fixtures", "golden_tiny.jsonl")
    n = write_golden_jsonl(gen_transcripts(**TINY), os.path.abspath(out))
    print(f"wrote {n} golden rows → {out}")


if __name__ == "__main__":
    main()

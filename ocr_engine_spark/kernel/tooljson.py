"""Tool-output JSON probe + stable flatten (SURVEY.md §2.3 F6).

``first_json_object`` reproduces the reference's probe exactly
(/root/reference/app.py:214-224, ocr_any.py:164-176): empty text →
``{}``; first DOTALL match of ``\\{.*\\}`` (greedy — spans from the
first "{" to the *last* "}"); ``json.loads`` failure → ``{}``.

``flatten_json`` renders the probed object to deterministic
``path: value`` lines, depth-first in insertion order (``json.loads``
preserves key order). Scalars are rendered with the fixture-exact
serializer (Python ``json.dumps`` defaults, ``ensure_ascii=False`` —
/root/reference/app.py:731,736), so strings keep their quotes and the
rendering round-trips.
"""

from __future__ import annotations

import json
import re
from typing import Any, Dict, List

_JSON_OBJ_RE = re.compile(r"\{.*\}", re.DOTALL)


def first_json_object(text: str | None) -> Dict:
    """Parity: /root/reference/app.py:214-224."""
    if not text:
        return {}
    m = _JSON_OBJ_RE.search(text)
    if not m:
        return {}
    try:
        obj = json.loads(m.group(0))
    except Exception:
        return {}
    # json.loads can return non-dict only if the regex matched an
    # object-looking region; with a {...} match the root is a dict or
    # the parse fails, but guard anyway.
    return obj if isinstance(obj, dict) else {}


def _render_scalar(v: Any) -> str:
    return json.dumps(v, ensure_ascii=False)


def _flatten(prefix: str, v: Any, out: List[str]) -> None:
    if isinstance(v, dict):
        if not v:
            out.append(f"{prefix}: {{}}" if prefix else "{}")
            return
        for k, sub in v.items():
            _flatten(f"{prefix}.{k}" if prefix else str(k), sub, out)
    elif isinstance(v, list):
        if not v:
            out.append(f"{prefix}: []")
            return
        for i, sub in enumerate(v):
            _flatten(f"{prefix}[{i}]", sub, out)
    else:
        out.append(f"{prefix}: {_render_scalar(v)}")


def flatten_json(obj: Dict) -> List[str]:
    """Object → ordered ``path: value`` lines. ``{}`` → no lines."""
    out: List[str] = []
    if obj:
        for k, v in obj.items():
            _flatten(str(k), v, out)
    return out

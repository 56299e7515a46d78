"""Pure-Python deterministic extraction kernels (no Spark imports).

These implement, from scratch, the semantic-bearing transforms of the
reference engine (SURVEY.md §2, operators marked ⚙) plus the two
deterministic classifiers that replace its external calls:

- ``lines``      break-type line-assembly fold (reference app.py:273-324,
                 app.py:382-412)
- ``pdfstream``  PDF-derived token-stream segmentation (reference
                 app.py:353-412 shard walk; app.py:453-459 gap fill)
- ``htmlblocks`` DOM tokenization + text-density/link-density boilerplate
                 classification (replaces the reference's LLM
                 interpretation stage, app.py:606-630)
- ``tooljson``   first-JSON-object probe + stable flatten (reference
                 app.py:214-224)
- ``textutil``   slugify / clamp / keep-longer merge / minified-JSON
                 serializer (reference app.py:187-191, 226-231;
                 ocr_any.py:229-235)
- ``dispatch``   payload-kind detection + the per-turn extraction entry
                 point (reference app.py:635-645 type dispatch)

Everything here is a pure function of its inputs: no wall clock, no
randomness, no I/O. That is what makes per-turn byte-equality fixtures
and cross-parallelism determinism possible.
"""

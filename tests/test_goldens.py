"""Committed golden snapshot — drift guard.

Oracle and Spark share the same kernels, so parity tests alone cannot catch
a kernel change that silently shifts BOTH sides' output.  This pins the
oracle's output for the seeded corpus (analogue of the reference's
committed converted example images, README.md:45-122).  If a kernel change
legitimately alters extraction semantics, regenerate via the command in
this docstring and explain the diff in the commit message:

    python - <<'EOF'
    ... see git log for tests/goldens_300.json ...
    EOF
"""

from __future__ import annotations

import hashlib
import json
import os

from manga_translator_spark.corpus import generate_corpus
from manga_translator_spark.oracle import extract_corpus

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "goldens_300.json")


def test_oracle_matches_committed_goldens():
    with open(GOLDEN_PATH) as f:
        pinned = json.load(f)
    got = extract_corpus(generate_corpus(300))
    assert len(got) == len(pinned)
    for e in got:
        p = pinned[e.url]
        assert hashlib.sha256(e.extracted_text.encode()).hexdigest() == p["sha256"], e.url
        assert len(e.extracted_text) == p["n_chars"], e.url
        assert e.n_blocks == p["n_blocks"], e.url
        tail = list(e.spans[-1]) if e.spans else None
        assert tail == p["spans_tail"], e.url
        assert [list(r) for r in e.recognized] == p["recognized"], e.url

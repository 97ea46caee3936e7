"""Regenerate tests/goldens_300.json from the single-process oracle.

Run ONLY on a deliberate kernel-semantics change (CLAUDE.md invariant), and
say why in the commit message.  Prints a diff summary of what shifted.
"""

from __future__ import annotations

import hashlib
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from manga_translator_spark.corpus import generate_corpus
from manga_translator_spark.oracle import extract_corpus

GOLDEN_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests", "goldens_300.json"
)


def main() -> int:
    old = {}
    if os.path.exists(GOLDEN_PATH):
        with open(GOLDEN_PATH) as f:
            old = json.load(f)
    got = extract_corpus(generate_corpus(300))
    new = {
        e.url: {
            "sha256": hashlib.sha256(e.extracted_text.encode()).hexdigest(),
            "n_chars": len(e.extracted_text),
            "n_blocks": e.n_blocks,
            "spans_tail": list(e.spans[-1]) if e.spans else None,
            "recognized": [list(r) for r in e.recognized],
        }
        for e in got
    }
    changed = {"sha256": 0, "n_chars": 0, "n_blocks": 0, "spans_tail": 0, "recognized": 0}
    for url, row in new.items():
        prev = old.get(url, {})
        for k in changed:
            if prev.get(k) != row[k]:
                changed[k] += 1
    with open(GOLDEN_PATH, "w") as f:
        json.dump(new, f, indent=0, sort_keys=True)
        f.write("\n")
    print(f"wrote {len(new)} goldens; fields changed vs previous: {changed}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

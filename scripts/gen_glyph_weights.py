"""Build and commit the fixed glyph-classifier weights (.npz).

Run from the repo root:  python scripts/gen_glyph_weights.py

Deterministic: the alphabet is printable ASCII + the corpus word lists'
non-ASCII inventory, glyph bitmaps are md5-derived (glyph_model.py), and
the weights are the template-matching closed form W = G.T, b = -|g|^2/2.
Regenerate ONLY when the alphabet or glyph derivation changes — the file
is a model artifact like any committed checkpoint.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from manga_translator_spark.functions.glyph_model import (  # noqa: E402
    _WEIGHTS_PATH,
    build_alphabet,
    build_weights,
)


def main() -> None:
    alphabet = build_alphabet()
    arrs = build_weights(alphabet)
    np.savez_compressed(_WEIGHTS_PATH, **arrs)
    size = os.path.getsize(_WEIGHTS_PATH)
    print(f"wrote {_WEIGHTS_PATH}: {len(alphabet)} classes, {size} bytes")


if __name__ == "__main__":
    main()

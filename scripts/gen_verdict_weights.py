"""Build and commit the fixed patch-verdict weights (.npz).

Run from the repo root:  python scripts/gen_verdict_weights.py

Deterministic: the weights are the closed-form decision-equivalent
encoding of the documented keep rule (functions/verdict_model.py proves
the equivalence).  Regenerate ONLY when the rule constants or the feature
set change — the file is a model artifact like any committed checkpoint.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from manga_translator_spark.functions.verdict_model import (  # noqa: E402
    _WEIGHTS_PATH,
    build_weights,
)


def main() -> None:
    arrs = build_weights()
    np.savez_compressed(_WEIGHTS_PATH, **arrs)
    size = os.path.getsize(_WEIGHTS_PATH)
    print(f"wrote {_WEIGHTS_PATH}: {arrs['weights'].shape} weights, {size} bytes")


if __name__ == "__main__":
    main()

"""Build and commit the fixed media-embedding projection (.npz).

Run from the repo root:  python scripts/gen_media_embed_weights.py

Deterministic: the projection is md5-derived row by row
(functions/media_embed.py build_weights).  Regenerate ONLY when the
canonical grid or embedding dim changes — the file is a model artifact
like any committed checkpoint.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from manga_translator_spark.functions.media_embed import (  # noqa: E402
    _WEIGHTS_PATH,
    build_weights,
)


def main() -> None:
    arrs = build_weights()
    np.savez_compressed(_WEIGHTS_PATH, **arrs)
    size = os.path.getsize(_WEIGHTS_PATH)
    print(f"wrote {_WEIGHTS_PATH}: {arrs['proj'].shape} proj, {size} bytes")


if __name__ == "__main__":
    main()

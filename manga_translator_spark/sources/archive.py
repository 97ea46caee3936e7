"""Archive source: zip-of-pages -> pages rows (the CBZ scan analogue).

The reference ingests zip archives of images, extracting members and
**sorting filenames for deterministic order** (reference pipelines/
cbz.py:34-41, sort at :39).  Ours ingests zips of HTML files shipped as
binary blobs — either rows of an existing DataFrame (`archive:binary`) or
files on disk via Spark's binaryFile source — and explodes them into pages
rows.  Member decompression happens executor-side inside mapInPandas, so a
directory of archives fans out with no driver involvement; determinism
comes from explicit sort keys, never zip order.
"""

from __future__ import annotations

import io
import zipfile
from collections.abc import Iterator
from typing import TYPE_CHECKING

import pandas as pd

if TYPE_CHECKING:
    from pyspark.sql import DataFrame, SparkSession

_OUT_SCHEMA = "archive string, member string, html binary"


def read_archives(spark: "SparkSession", path_glob: str) -> "DataFrame":
    """Scan zip files via the binaryFile source (S1/S3 analogue: reader-
    level glob expansion replaces the reference's folder-walk,
    cli/main.py:67)."""
    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.zip")
        .load(path_glob)
        .select("path", "content")
    )


def explode_archive_members(archives: "DataFrame") -> "DataFrame":
    """(path, content) -> one row per .html/.htm/.pdf member, sorted.

    PDF members ride in the same ``html`` payload column — the engine's
    content-type router (operators/pdf_extract.extract_any) dispatches on
    the payload magic downstream, exactly as with a mixed crawl table.
    Truncated/invalid zips yield zero rows rather than failing the task
    (a crashed archive must not kill the bucket; the lineage table records
    counts).  Member order inside each archive is sorted by name — the
    cbz.py:39 determinism rule.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {"archive": [], "member": [], "html": []}
            for path, blob in zip(pdf["path"], pdf["content"]):
                try:
                    zf = zipfile.ZipFile(io.BytesIO(blob))
                    names = sorted(
                        n for n in zf.namelist()
                        if n.endswith((".html", ".htm", ".pdf")) and not n.endswith("/")
                    )
                    for name in names:
                        out["archive"].append(path)
                        out["member"].append(name)
                        out["html"].append(zf.read(name))
                except (zipfile.BadZipFile, OSError, ValueError):
                    continue
            yield pd.DataFrame(out)

    return archives.mapInPandas(run, schema=_OUT_SCHEMA)


def archive_pages(archives: "DataFrame") -> "DataFrame":
    """Members as a pages-shaped table: url = archive!member."""
    from pyspark.sql import functions as F

    members = explode_archive_members(archives)
    return members.select(
        F.concat_ws("!", "archive", "member").alias("url"),
        F.lit(None).cast("timestamp").alias("warc_ts"),
        F.col("html"),
        F.lit(None).cast("string").alias("text"),
        F.lit(None).cast("string").alias("lang"),
    )

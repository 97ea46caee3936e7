"""Language-code normalization dimension (SURVEY §2.4).

The reference normalizes language codes through pycountry alpha_3 ->
alpha_2 with a hand-rolled fallback table (reference translator/src/
manga_translator/utils.py:382-406 ``simplify_lang_code``).  The relational
transplant is a small broadcast-joined dimension table; the codes below are
the public ISO-639 pairs for the languages the corpus and the reference's
translator surface actually use.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

if TYPE_CHECKING:
    from pyspark.sql import DataFrame, SparkSession

# (alpha3, alpha2, english_name) — public ISO-639 data
LANG_DIM = [
    ("eng", "en", "English"),
    ("jpn", "ja", "Japanese"),
    ("deu", "de", "German"),
    ("fra", "fr", "French"),
    ("spa", "es", "Spanish"),
    ("ita", "it", "Italian"),
    ("por", "pt", "Portuguese"),
    ("rus", "ru", "Russian"),
    ("zho", "zh", "Chinese"),
    ("kor", "ko", "Korean"),
    ("nld", "nl", "Dutch"),
    ("pol", "pl", "Polish"),
]


def lang_dim(spark: "SparkSession") -> "DataFrame":
    return spark.createDataFrame(LANG_DIM, "alpha3 string, alpha2 string, lang_name string")


def values_sql() -> str:
    """DuckDB VALUES clause mirroring lang_dim exactly."""
    rows = ", ".join(f"('{a3}', '{a2}', '{nm}')" for a3, a2, nm in LANG_DIM)
    return f"(VALUES {rows}) AS lang_dim(alpha3, alpha2, lang_name)"


def normalize_lang(docs: "DataFrame", spark: "SparkSession", col: str = "lang") -> "DataFrame":
    """Broadcast-join normalization: any alpha2/alpha3 spelling -> alpha2.

    Broadcast is explicit (the dim is 12 rows); unknown codes fall through
    unchanged via coalesce — the reference returns the input code when
    pycountry misses too (utils.py:386-388).
    """
    from pyspark.sql import functions as F

    dim = lang_dim(spark)
    d = F.broadcast(dim)
    joined = docs.join(d, F.lower(F.col(col)) == d.alpha3, "left")
    return joined.withColumn(
        "lang_norm", F.coalesce("alpha2", F.lower(F.col(col)))
    ).drop("alpha3", "alpha2", "lang_name")

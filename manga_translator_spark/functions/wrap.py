"""Per-block text-flow (wrap): the drawer stage's algorithmic core.

Transplant of the reference's densest algorithm, ``wrap_text_pure`` +
``find_best_font_size`` (translator/src/manga_translator/utils.py:135-169,
273-335) and its memo caches (``LayoutCache``/``WrappedLine``/``WrapResult``
utils.py:57-89), adapted to web text:

* **Metric adaptation (documented deviation)**: the reference measures
  words in pixels via ``font.getbbox``; web text has no font, so the
  metric here is a deterministic unit cell — word width = ``len(word)``,
  space width = 1, line height = 1.  Everything else — the greedy fill,
  the word-too-wide ``None`` contract, the ``min(x_end + space, width)``
  clamp, line offsets ``prev.offset + prev.height + line_spacing``, and
  the (x_bounds, y) bounds — follows utils.py:135-169 statement for
  statement, so the *algorithm* (not the font) is what's transplanted.
* **Whitespace**: words split on the explicit ASCII class
  ``[ \\t\\n\\x0b\\f\\r]`` (NOT ``str.split``'s unicode semantics) so the
  Spark SQL fold (Java regex) and the DuckDB twin (RE2) tokenize
  byte-identically — all three implementations are equality-tested.
* **Hyphenation** (wrap_text_with_hyphenator, utils.py:182-267) is out of
  scope: it needs pyphen dictionaries (external data) — the pure wrapper
  is the shared path both reference variants reduce to.

This module is the shared kernel: the oracle and any Python stage import
it; the Spark/DuckDB SQL folds (``wrap_fold_spark``/``wrap_fold_duck``)
are built from the same width model and are asserted equal to it.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

# Explicit ASCII whitespace class — identical in Python re, Java regex
# (Spark) and RE2 (DuckDB); see module docstring.
_WS_RE = re.compile(r"[ \t\n\x0b\f\r]+")


class WidthCache:
    """LayoutCache analogue (reference utils.py:78-89): memoizes the word
    -> width metric.  ``len`` is cheap, but the cache is the structural
    hook where a real metric (font.getbbox / a width table) plugs in, and
    Python stages reuse ONE instance per Arrow batch exactly as the
    reference reuses one LayoutCache per draw call."""

    def __init__(self) -> None:
        self.cache: dict[str, int] = {}

    def get(self, word: str) -> int:
        w = self.cache.get(word)
        if w is None:
            w = self.cache[word] = len(word)
        return w


@dataclass
class WrappedLine:
    """utils.py:57-65 analogue; height = max word height (1 in unit cells)."""

    words: list[str] = field(default_factory=list)
    offset: float = 0.0
    height: float = 0.0

    def add_word(self, word: str, word_height: float) -> None:
        self.words.append(word)
        self.height = max(self.height, word_height)

    @property
    def text(self) -> str:
        return " ".join(self.words)


@dataclass
class WrapResult:
    """utils.py:68-71 analogue: wrapped lines + (x_bounds, y) bounds."""

    lines: list[WrappedLine]
    bounds: tuple[float, float]


SPACE_W = 1
LINE_H = 1


def wrap_text_pure(
    text: str,
    wrap_width: float = float("inf"),
    line_spacing: float = 2,
    cache: WidthCache | None = None,
) -> WrapResult | None:
    """Greedy width-bounded word wrap — utils.py:135-169 transplant.

    Returns None when any single word exceeds ``wrap_width`` (the caller's
    retry contract: find_best_font_size shrinks the font and retries;
    :func:`fit_wrap_width` widens the wrap and retries)."""
    cache = cache or WidthCache()
    words = [w for w in _WS_RE.split(text) if w]
    bounds = [(w, cache.get(w)) for w in words]
    # Text too big to fit on a line (utils.py:146-147)
    if any(w > wrap_width for _, w in bounds):
        return None

    x_offset = 0.0
    line_idx = 0
    lines = [WrappedLine([], 0)]
    x_bounds = 0.0
    for word, width in bounds:
        x_end = x_offset + width
        if x_end > wrap_width:
            last = lines[-1]
            lines.append(WrappedLine([], last.offset + last.height + line_spacing))
            line_idx += 1
            x_bounds = max(x_bounds, x_offset)
            x_offset = 0.0
            x_end = width
        lines[line_idx].add_word(word, LINE_H)
        x_offset = min(x_end + SPACE_W, wrap_width)
        x_bounds = max(x_bounds, x_offset)
    last = lines[-1]
    return WrapResult(lines, (x_bounds, last.offset + last.height))


def wrap_lines(text: str, wrap_width: int) -> list[str] | None:
    """The lines-only view: list of space-joined lines, or None when a
    word exceeds ``wrap_width`` (mirrors the SQL folds' NULL)."""
    res = wrap_text_pure(text, wrap_width)
    if res is None:
        return None
    return [ln.text for ln in res.lines]


def _next_probe(lo: int, hi: int) -> int:
    """find_next_test (utils.py:270-271)."""
    return lo + ((hi - lo) // 2)


def fit_wrap_width(
    text: str,
    max_lines: int,
    min_width: int = 8,
    max_width: int = 200,
    tolerance: int = 1,
) -> tuple[int, list[str]] | None:
    """find_best_font_size analogue (utils.py:273-335): the same bisection
    loop, searching the *wrap width* that fits a line budget instead of the
    font size that fits a pixel box (the unit-cell metric has no font
    size).  Returns (width, lines) for the narrowest probed width whose
    wrap fits ``max_lines``, or None when even ``max_width`` overflows."""
    current = max_width
    cur_min, cur_max = min_width, max_width
    best: tuple[int, list[str]] | None = None
    while True:
        lines = wrap_lines(text, current)
        if lines is not None and len(lines) <= max_lines:
            best = (current, lines)
            cur_max = current
            nxt = _next_probe(cur_min, cur_max)
            if abs(best[0] - nxt) < tolerance or nxt == current:
                break
            current = nxt
        else:
            cur_min = current
            nxt = _next_probe(cur_min, cur_max)
            best_width = current if best is None else best[0]
            # nxt == current guards the integer stall the reference's
            # grow-direction search cannot hit (interval [fail, best] of
            # gap 1 re-probes the failing width forever otherwise)
            if abs(best_width - nxt) < tolerance or nxt == current:
                break
            current = nxt
    return best


# --------------------------------------------------------------------------
# SQL folds — the same greedy wrap as codegen-free column expressions, one
# for Spark (aggregate fold; the state rides a named_struct) and one for
# DuckDB (list_reduce; the accumulated lines ride a chr(10)-joined string
# because DuckDB 1.0's list_reduce drops nested-list accumulator state).
# Both take the word array expression so callers control tokenization; use
# words_expr_spark/_duck for the shared splitter.
# --------------------------------------------------------------------------

WS_CLASS_SQL = "[ \\\\t\\\\n\\\\x0B\\\\f\\\\r]+"


def words_expr_spark(text_col: str) -> str:
    return f"filter(split({text_col}, '{WS_CLASS_SQL}'), w -> w != '')"


def words_expr_duck(text_col: str) -> str:
    return (
        f"list_filter(regexp_split_to_array({text_col}, '[ \\t\\n\\x0b\\f\\r]+'), "
        "w -> w != '')"
    )


def wrap_fold_spark(words_expr: str, width: int) -> str:
    """Spark expr -> STRUCT<wrapped: STRING, n_lines: INT>; wrapped is the
    chr(10)-joined lines, NULL when a word exceeds ``width`` (the kernel's
    None).  State: (ls joined-finished-lines, n finished count, cur open
    line, x offset, bad overlong-flag) — the exact transition of
    wrap_text_pure including the min(x_end+1, width) clamp."""
    return f"""aggregate(
      {words_expr},
      named_struct('ls', '', 'n', 0, 'cur', CAST(NULL AS STRING), 'x', 0, 'bad', false),
      (s, w) -> CASE
        WHEN s.bad OR length(w) > {width} THEN
          named_struct('ls', s.ls, 'n', s.n, 'cur', s.cur, 'x', s.x, 'bad', true)
        WHEN s.cur IS NULL THEN
          named_struct('ls', s.ls, 'n', s.n, 'cur', w,
                       'x', least(length(w) + 1, {width}), 'bad', false)
        WHEN s.x + length(w) > {width} THEN
          named_struct('ls', IF(s.n = 0, s.cur, concat(s.ls, char(10), s.cur)),
                       'n', s.n + 1, 'cur', w,
                       'x', least(length(w) + 1, {width}), 'bad', false)
        ELSE
          named_struct('ls', s.ls, 'n', s.n, 'cur', concat(s.cur, ' ', w),
                       'x', least(s.x + length(w) + 1, {width}), 'bad', false)
      END,
      s -> CASE
        WHEN s.bad THEN named_struct('wrapped', CAST(NULL AS STRING), 'n_lines', CAST(NULL AS INT))
        WHEN s.cur IS NULL THEN named_struct('wrapped', '', 'n_lines', 1)
        WHEN s.n = 0 THEN named_struct('wrapped', s.cur, 'n_lines', 1)
        ELSE named_struct('wrapped', concat(s.ls, char(10), s.cur), 'n_lines', s.n + 1)
      END)"""


def wrap_sql_duck(src: str, width: int, id_col: str = "doc_id", text_col: str = "text") -> str:
    """DuckDB twin of the greedy wrap as a full WITH RECURSIVE query over
    ``src``: (id_col, n_lines INT, wrapped VARCHAR, fits INT).

    NOT a list_reduce fold: DuckDB 1.0's list_reduce returns stale results
    from earlier rows under vectorized execution (reproduced — whole fold
    results duplicated across rows), so the sequential state walks a
    recursive CTE instead: one step row per word carrying (i, line_no, x),
    then words group into lines (string_agg ORDER BY i) and lines into the
    wrapped text (string_agg ORDER BY line_no).  Overlong words are
    detected up front (no recursion needed) and yield NULL, mirroring the
    kernel's None."""
    words = words_expr_duck(text_col)
    return f"""
      WITH RECURSIVE wsrc AS (
        SELECT {id_col}, ws, len(ws) AS n,
               len(list_filter(ws, w -> length(w) > {width})) > 0 AS bad
        FROM (SELECT {id_col}, {words} AS ws FROM {src})
      ),
      steps AS (
        SELECT {id_col}, ws, n, 1 AS i, 0 AS line_no,
               least(length(ws[1]) + 1, {width}) AS x
        FROM wsrc WHERE NOT bad AND n > 0
        UNION ALL
        SELECT {id_col}, ws, n, i + 1,
               CASE WHEN x + length(ws[i + 1]) > {width} THEN line_no + 1 ELSE line_no END,
               CASE WHEN x + length(ws[i + 1]) > {width}
                    THEN least(length(ws[i + 1]) + 1, {width})
                    ELSE least(x + length(ws[i + 1]) + 1, {width}) END
        FROM steps WHERE i < n
      ),
      wlines AS (
        SELECT {id_col}, line_no, string_agg(ws[i], ' ' ORDER BY i) AS line
        FROM steps GROUP BY {id_col}, line_no
      ),
      wagg AS (
        SELECT {id_col}, count(*) AS n_lines,
               string_agg(line, chr(10) ORDER BY line_no) AS wrapped
        FROM wlines GROUP BY {id_col}
      )
      SELECT w.{id_col} AS {id_col},
             CAST(CASE WHEN w.bad THEN NULL WHEN w.n = 0 THEN 1 ELSE a.n_lines END AS INT) AS n_lines,
             CASE WHEN w.bad THEN NULL WHEN w.n = 0 THEN '' ELSE a.wrapped END AS wrapped,
             CASE WHEN w.bad THEN 0 ELSE 1 END AS fits
      FROM wsrc w LEFT JOIN wagg a USING ({id_col})
    """

"""HTML -> flat DOM-block array: the *detector* stage kernel.

Transplant of the reference's region detector (reference: translator/src/
manga_translator/detection/yolo.py:14-32 — batched model over frames, emitting
per-frame ``list[DetectionResult(cls, bbox, confidence)]``, base contract
core/plugin.py:237-251).  Our "frame" is a web page; our "region" is a
block-level DOM element carrying visible text (or an embedded image).

This module is **pure Python / stdlib-only** and is imported by BOTH the
single-process oracle (golden generator) and the Spark ``mapInPandas`` stage,
so block boundaries, feature values and classification are byte/bit-identical
on the two sides by construction (SURVEY.md §5/§7).

Positional alignment note: the reference aligns stage outputs by list index
(``source_index``, pipelines/image_to_image.py:11-21).  We replace that with
the explicit key ``(url, block_idx)`` where ``block_idx`` is document order —
the one ordering the parser itself guarantees deterministically.
"""

from __future__ import annotations

import base64
import re
from dataclasses import dataclass, field
from html.parser import HTMLParser

from manga_translator_spark.functions.normalize import decode_html, normalize_text

# Block classes — analogue of DetectionClasses (reference core/constants.py:6-8:
# TextBubble=0, FreeText=1) plus an embedded-image class feeding the OCR stage.
CLS_MAIN = 0
CLS_BOILERPLATE = 1
CLS_EMBEDDED_IMG = 2

# Classifier thresholds (integer-exact; see classify_block).
MIN_MAIN_CHARS = 25          # a MAIN block needs >= 25 visible chars
LINK_DENSITY_NUM = 1         # boilerplate if n_link_chars/n_chars >= 1/3,
LINK_DENSITY_DEN = 3         # tested as DEN*n_link_chars >= NUM*n_chars*... (ints)

# Elements that delimit a text block (Boilerpipe-style flattening).
BLOCK_TAGS = frozenset(
    """p h1 h2 h3 h4 h5 h6 li dt dd td th caption figcaption blockquote pre
       div article section main header footer nav aside ul ol table tr form
       fieldset figure details summary body""".split()
)
# Subtrees whose text is never visible.
SKIP_TAGS = frozenset("script style noscript template head svg iframe".split())
# Void elements (never pushed on the open-element stack).
VOID_TAGS = frozenset(
    "img br hr meta link input area base col embed source track wbr".split()
)
# Element tags that are boilerplate by construction.
HINT_TAGS = frozenset("nav aside footer header".split())
# class=/id= tokens that mark furniture (ads, navs, social chrome).
HINT_TOKENS = frozenset(
    """nav menu sidebar footer header ad ads banner breadcrumb breadcrumbs
       comment comments share social copyright widget promo sponsored""".split()
)

_TOKEN_SPLIT_RE = re.compile(r"[^a-z0-9]+")
_DATA_URI_RE = re.compile(r"^data:image/[a-z0-9.+-]+;base64,(.*)$", re.IGNORECASE | re.DOTALL)


@dataclass(slots=True)
class Block:
    """One flattened DOM block — the DetectionResult analogue.

    Field mapping vs the reference (core/plugin.py:231-235):
    ``cls`` <-> DetectionResult.cls, ``score`` <-> confidence, and
    ``(block_idx, depth)`` replace the geometric bbox.
    """

    block_idx: int
    tag: str
    depth: int
    text: str
    n_chars: int
    n_links: int
    n_link_chars: int
    hint: bool
    cls: int
    score: float
    img_payload: bytes | None = None


def _has_hint(tag: str, attrs: list[tuple[str, str | None]]) -> bool:
    if tag in HINT_TAGS:
        return True
    for name, value in attrs:
        if name in ("class", "id", "role") and value:
            for token in _TOKEN_SPLIT_RE.split(value.lower()):
                if token in HINT_TOKENS:
                    return True
    return False


def classify_block(n_chars: int, n_link_chars: int, hint: bool, is_img: bool) -> int:
    """The detector's decision rule (analogue of YOLO class+confidence,
    reference detection/yolo.py:23-28 + constants.py:6-8).

    Integer-only comparisons so the Spark column-expression twin in
    ``operators/classify.py`` agrees bit-for-bit (SURVEY §7 risk register:
    no float thresholds that straddle representations).
    """
    if is_img:
        return CLS_EMBEDDED_IMG
    if hint:
        return CLS_BOILERPLATE
    if n_chars < MIN_MAIN_CHARS:
        return CLS_BOILERPLATE
    # link_density >= 1/3  <=>  3*n_link_chars >= n_chars
    if LINK_DENSITY_DEN * n_link_chars >= LINK_DENSITY_NUM * n_chars:
        return CLS_BOILERPLATE
    return CLS_MAIN


def score_block(n_chars: int, n_link_chars: int, hint: bool) -> float:
    """Confidence analogue: text mass discounted by link mass and hint.

    float64 arithmetic with the exact same operation order as the Spark
    expression twin — IEEE-754 makes the two sides identical.
    """
    density = (n_chars - n_link_chars) / (n_chars + 1.0)
    return density * 0.5 if hint else density


@dataclass(slots=True)
class _OpenBlock:
    tag: str
    depth: int
    hint: bool
    parts: list[str] = field(default_factory=list)
    link_parts: list[str] = field(default_factory=list)
    n_links: int = 0


class _BlockParser(HTMLParser):
    """Tolerant streaming parser: flat blocks in document order.

    Malformed/unclosed markup (FIXTURES.md id%83 edge case) is handled by
    construction: unmatched end tags are ignored, unclosed elements are
    flushed at EOF — and identically so on oracle and executor because this
    is the same code.
    """

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: list[Block] = []
        self._stack: list[tuple[str, bool]] = []  # (tag, inherited_hint)
        self._cur: _OpenBlock | None = None
        self._skip_depth = 0
        self._a_depth = 0

    # -- helpers -----------------------------------------------------------
    def _inherited_hint(self) -> bool:
        return bool(self._stack) and self._stack[-1][1]

    def _flush(self) -> None:
        cur, self._cur = self._cur, None
        if cur is None:
            return
        text = normalize_text("".join(cur.parts))
        if not text:
            return
        link_text = normalize_text(" ".join(cur.link_parts))
        n_chars, n_link = len(text), len(link_text)
        cls = classify_block(n_chars, n_link, cur.hint, is_img=False)
        self.blocks.append(
            Block(
                block_idx=len(self.blocks),
                tag=cur.tag,
                depth=cur.depth,
                text=text,
                n_chars=n_chars,
                n_links=cur.n_links,
                n_link_chars=n_link,
                hint=cur.hint,
                cls=cls,
                score=score_block(n_chars, n_link, cur.hint),
            )
        )

    def _open_block(self, tag: str, hint: bool) -> None:
        self._flush()
        self._cur = _OpenBlock(tag=tag, depth=len(self._stack), hint=hint)

    # -- HTMLParser callbacks ---------------------------------------------
    def handle_starttag(self, tag: str, attrs: list[tuple[str, str | None]]) -> None:
        if tag in SKIP_TAGS:
            self._skip_depth += 1
            self._stack.append((tag, self._inherited_hint()))
            return
        if self._skip_depth:
            if tag not in VOID_TAGS:
                self._stack.append((tag, self._inherited_hint()))
            return
        if tag == "img":
            self._handle_img(attrs)
            return
        if tag in VOID_TAGS:
            if tag == "br" and self._cur is not None:
                self._cur.parts.append(" ")
            return
        hint = self._inherited_hint() or _has_hint(tag, attrs)
        if tag == "a":
            self._a_depth += 1
            if self._cur is not None:
                self._cur.n_links += 1
        self._stack.append((tag, hint))
        if tag in BLOCK_TAGS:
            self._open_block(tag, hint)

    def handle_startendtag(self, tag: str, attrs: list[tuple[str, str | None]]) -> None:
        if tag == "img":
            self._handle_img(attrs)
        elif tag == "br" and self._cur is not None:
            self._cur.parts.append(" ")

    def handle_endtag(self, tag: str) -> None:
        if tag in VOID_TAGS:
            return
        # fast path: well-formed markup closes the top of the stack
        if self._stack and self._stack[-1][0] == tag:
            self._stack.pop()
            if tag in SKIP_TAGS:
                self._skip_depth = max(0, self._skip_depth - 1)
            if tag == "a":
                self._a_depth = max(0, self._a_depth - 1)
            if tag in BLOCK_TAGS:
                self._flush()
            return
        # pop to the matching open tag; ignore stray end tags
        for i in range(len(self._stack) - 1, -1, -1):
            if self._stack[i][0] == tag:
                for popped, _hint in reversed(self._stack[i:]):
                    if popped in SKIP_TAGS:
                        self._skip_depth = max(0, self._skip_depth - 1)
                    if popped == "a":
                        self._a_depth = max(0, self._a_depth - 1)
                    if popped in BLOCK_TAGS:
                        self._flush()
                del self._stack[i:]
                break

    def handle_data(self, data: str) -> None:
        if self._skip_depth or not data:
            return
        if self._cur is None:
            if not data.strip():
                return
            # bare text outside any block element: synthesize a body block
            self._open_block("body", self._inherited_hint())
        self._cur.parts.append(data)
        if self._a_depth > 0:
            self._cur.link_parts.append(data)

    def _handle_img(self, attrs: list[tuple[str, str | None]]) -> None:
        if self._skip_depth:
            return
        src = next((v for k, v in attrs if k == "src" and v), None)
        if not src:
            return
        m = _DATA_URI_RE.match(src)
        if not m:
            return
        try:
            payload = base64.b64decode(m.group(1), validate=False)
        except (ValueError, TypeError):
            return
        # embedded image = its own zero-text block routed to the OCR stage
        # (analogue of a FreeText region crop, image_to_image.py:61-71)
        self._flush()
        hint = self._inherited_hint()
        self.blocks.append(
            Block(
                block_idx=len(self.blocks),
                tag="img",
                depth=len(self._stack),
                text="",
                n_chars=0,
                n_links=0,
                n_link_chars=0,
                hint=hint,
                cls=CLS_EMBEDDED_IMG,
                score=0.0,
                img_payload=payload,
            )
        )

    def close(self) -> None:  # flush any unclosed trailing block
        super().close()
        self._flush()


# ---------------------------------------------------------------------------
# Fast tokenizer engine
# ---------------------------------------------------------------------------
# Profiling shows ~85% of extract_blocks time inside stdlib html.parser's
# tokenization machinery (regex scanning + position bookkeeping we never
# use).  This tokenizer drives the SAME _BlockParser state machine through
# its handle_* methods, so block semantics are defined once; a corpus-wide
# test asserts engine equality (tests/test_kernels.py).  The stdlib engine
# stays as the reference implementation and fallback.

from html import unescape as _unescape  # noqa: E402

# start tags reuse html.parser's OWN compiled tolerant regexes, so the
# fast engine's tag/attr boundaries are char-identical by construction
# ('<p<>' is a tag named 'p<' there; a dangling quote is an attr *name*).
# These are PRIVATE stdlib globals and Python >= 3.13 reshaped them (CVE
# hardening), so the imports are guarded: any missing name or unexpected
# pattern shape disables the fast engine and every caller falls back to
# the stdlib reference engine (ADVICE r02) — correctness never depends on
# the stdlib's internals, only the speedup does.
_FAST_ENGINE_OK = True
try:
    from html.parser import attrfind_tolerant as _ATTRFIND_TOLERANT  # noqa: E402
    from html.parser import locatestarttagend_tolerant as _LOCATE_START_END  # noqa: E402
    from html.parser import tagfind_tolerant as _TAGFIND_TOLERANT  # noqa: E402
except ImportError:  # pragma: no cover - future-Python guard
    _ATTRFIND_TOLERANT = _LOCATE_START_END = _TAGFIND_TOLERANT = None
    _FAST_ENGINE_OK = False
else:
    # probe the exact internals the fast engine replicates: the tolerant
    # tag-name shape and the cdata close pattern set_cdata_mode binds.
    try:
        if _TAGFIND_TOLERANT.pattern != r"([a-zA-Z][^\t\n\r\f />\x00]*)(?:\s|/(?!>))*":
            _FAST_ENGINE_OK = False
        import html.parser as _hp_mod

        _probe = _hp_mod.HTMLParser()
        _probe.set_cdata_mode("script")
        if _probe.interesting.pattern != r"</\s*script\s*>":
            _FAST_ENGINE_OK = False
        del _probe, _hp_mod
    except Exception:  # pragma: no cover - future-Python guard
        _FAST_ENGINE_OK = False

# Fuse the tag-name capture into the stdlib locate pattern (one C-regex
# call instead of two per start tag).  Pure string surgery on the stdlib
# pattern source; if a future Python changes the pattern shape, fall back
# to the two-call path (_LOCATE_NAMED = None).
_LOCATE_NAMED = None
_name_part = r"[a-zA-Z][^\t\n\r\f />\x00]*"
if _FAST_ENGINE_OK and _LOCATE_START_END.pattern.count("<" + _name_part) == 1:
    _cand = re.compile(
        _LOCATE_START_END.pattern.replace("<" + _name_part, "<(" + _name_part + ")", 1),
        _LOCATE_START_END.flags,
    )
    if _cand.groups == 1:
        _LOCATE_NAMED = _cand
# End-tag handling mirrors html.parser.parse_endtag exactly: first the
# strict form (whitespace allowed around the name), then the tolerant
# name grab (any non-space/slash/gt chars), else bogus-comment skip.
_ENDTAG_RE = re.compile(r"</\s*([a-zA-Z][-.a-zA-Z0-9:_]*)\s*>")  # endtagfind
_ENDNAME_TOLERANT_RE = re.compile(r"[a-zA-Z][^\t\n\r\f />\x00]*")  # tagfind_tolerant
# Conservative "clean attribute region" shape: when it fullmatches AND the
# block parser won't read the attrs (no class/id/role token, not <img>),
# the per-attr tolerant loop is skipped entirely — attrfind_tolerant
# provably consumes such regions to exactly the same end position, so the
# emitted events are identical with attrs=[] (the parser only ever reads
# class/id/role and img src).  Anything unusual falls through to the
# faithful loop.
_SIMPLE_ATTRS_RE = re.compile(
    r"""(?:\s+[a-zA-Z_:][-a-zA-Z0-9_:.]*(?:\s*=\s*(?:"[^"]*"|'[^']*'|[^\s>'"=<`]+))?)*\s*"""
)
# marked sections (<![CDATA[...]]> etc.) — mirrors _markupbase
# parse_marked_section exactly, including its raise on unknown keywords
# (extract_blocks catches and flushes, identically for both engines)
_MS_NAME_RE = re.compile(r"[a-zA-Z][-_.a-zA-Z0-9]*\s*")  # _declname_match
_COMMENT_CLOSE_RE = re.compile(r"--\s*>")  # _markupbase._commentclose
_MS_CLOSE_RE = re.compile(r"]\s*]\s*>")  # _markedsectionclose
_MS_COND_CLOSE_RE = re.compile(r"]\s*>")  # _msmarkedsectionclose

# raw-text elements: content runs to the close tag (html.parser's
# CDATA_CONTENT_ELEMENTS).  The close-tag search uses the same pattern the
# stdlib engine binds in set_cdata_mode — r'</\s*{tag}\s*>' — so
# adversarial forms like '</ script>' or '</script x>' parse identically
# on both engines (engine-equality invariant; snippets pinned in
# tests/test_kernels.py).
_RAWTEXT = ("script", "style")
_RAWTEXT_CLOSE = {t: re.compile(r"</\s*%s\s*>" % t) for t in _RAWTEXT}


def _fast_feed(s: str, p: "_BlockParser") -> None:
    i, n = 0, len(s)
    lower = None  # lazily lowered copy for rawtext close-tag search

    def _bogus(lt: int) -> int:
        """Incomplete construct: html.parser's recovery emits the raw
        slice up to (and including) the next '>' — else up to the next
        '<', else just the '<' itself — as *data*, unescaped, and resumes
        there (goahead's k<0 branch).  Byte-equal replication."""
        gt = s.find(">", lt + 1)
        if gt >= 0:
            k = gt + 1
        else:
            k2 = s.find("<", lt + 1)
            k = k2 if k2 >= 0 else lt + 1
        chunk = s[lt:k]
        p.handle_data(_unescape(chunk) if "&" in chunk else chunk)
        return k

    while i < n:
        lt = s.find("<", i)
        if lt < 0:
            rest = s[i:]
            if rest:
                p.handle_data(_unescape(rest) if "&" in rest else rest)
            break
        if lt > i:
            chunk = s[i:lt]
            p.handle_data(_unescape(chunk) if "&" in chunk else chunk)
        nxt = s[lt + 1 : lt + 2]
        if nxt == "!":
            if s.startswith("<!--", lt):
                cm = _COMMENT_CLOSE_RE.search(s, lt + 4)
                i = _bogus(lt) if cm is None else cm.end()
            elif s.startswith("<![", lt):
                # marked section: name scan, keyword dispatch, close search
                if lt + 3 == n:
                    i = _bogus(lt)
                    continue
                nm = _MS_NAME_RE.match(s, lt + 3)
                if nm is None:  # stdlib _scan_name raises AssertionError
                    raise ValueError("expected name token in marked section")
                if nm.end() == n:
                    i = _bogus(lt)  # name ran to EOF: incomplete
                    continue
                name = nm.group().strip().lower()
                if name in ("temp", "cdata", "ignore", "include", "rcdata"):
                    cm = _MS_CLOSE_RE.search(s, lt + 3)
                elif name in ("if", "else", "endif"):
                    cm = _MS_COND_CLOSE_RE.search(s, lt + 3)
                else:  # stdlib raises on unknown status keywords
                    raise ValueError("unknown status keyword in marked section")
                i = _bogus(lt) if cm is None else cm.end()
            else:  # doctype / bogus declaration
                end = s.find(">", lt + 1)
                i = _bogus(lt) if end < 0 else end + 1
            continue
        if nxt == "?":
            end = s.find(">", lt + 1)
            i = _bogus(lt) if end < 0 else end + 1
            continue
        if nxt == "/":
            m = _ENDTAG_RE.match(s, lt)
            if m:  # strict '</ name >' form (the common case, checked first)
                p.handle_endtag(m.group(1).lower())
                i = m.end()
                continue
            if s.find(">", lt + 2) < 0:
                i = _bogus(lt)  # incomplete close tag: data recovery
                continue
            nm = _ENDNAME_TOLERANT_RE.match(s, lt + 2)
            if nm:  # tolerant: junk between name and '>' is consumed
                p.handle_endtag(nm.group(0).lower())
                i = s.find(">", nm.end()) + 1
                if i == 0:
                    break
                continue
            i = s.find(">", lt + 2) + 1  # '</>' / bogus comment: skip it
            continue
        c = s[lt + 1 : lt + 2]
        if not ("a" <= c <= "z" or "A" <= c <= "Z"):
            p.handle_data("<")  # stray '<' is text (stdlib emits it as data)
            i = lt + 1
            continue
        # --- faithful port of parse_starttag/check_for_whole_start_tag ---
        # (html.parser's own compiled tolerant regexes, so quote-in-name and
        # dangling-quote edge cases parse char-identically)
        if _LOCATE_NAMED is not None:
            lm = _LOCATE_NAMED.match(s, lt)
            j = lm.end()
        else:
            lm = None
            j = _LOCATE_START_END.match(s, lt).end()
        nc = s[j : j + 1]
        if nc == ">":
            endpos = j + 1
        elif nc == "/":
            endpos = j + 2 if s.startswith("/>", j) else -1
        elif nc == "":
            endpos = -1
        elif nc in "abcdefghijklmnopqrstuvwxyz=/ABCDEFGHIJKLMNOPQRSTUVWXYZ":
            endpos = -1  # mid-attribute at buffer end
        elif j > lt:
            endpos = j
        else:
            endpos = lt + 1
        if endpos < 0:
            i = _bogus(lt)  # incomplete open tag: data recovery
            continue
        if lm is not None:
            raw_name = lm.group(1)
            tag = raw_name if raw_name.islower() else raw_name.lower()
            k = lm.end(1)  # name end; attrs regexes tolerate the gap
        else:
            tm = _TAGFIND_TOLERANT.match(s, lt + 1)
            tag = tm.group(1).lower()
            k = tm.end()
        attrs = None
        if nc == ">" or nc == "/":  # clean closer; endpos is j+1 / j+2
            region = s[k:j]
            if not region:
                attrs = []
            elif tag != "img":
                rl = region if region.islower() else region.lower()
                if (
                    "class" not in rl
                    and "id" not in rl
                    and "role" not in rl
                    and _SIMPLE_ATTRS_RE.fullmatch(region)
                ):
                    attrs = []
        if attrs is None:
            attrs = []
            if lm is not None:  # faithful loop needs tagfind's exact k
                k = _TAGFIND_TOLERANT.match(s, lt + 1).end()
            while k < endpos:
                am = _ATTRFIND_TOLERANT.match(s, k)
                if not am:
                    break
                attrname, rest, attrvalue = am.group(1, 2, 3)
                if not rest:
                    attrvalue = None
                elif attrvalue[:1] == "'" == attrvalue[-1:] or attrvalue[:1] == '"' == attrvalue[-1:]:
                    attrvalue = attrvalue[1:-1]
                if attrvalue:
                    attrvalue = _unescape(attrvalue)
                attrs.append((attrname.lower(), attrvalue))
                k = am.end()
            end = s[k:endpos].strip()
            if end not in (">", "/>"):
                p.handle_data(s[lt:endpos])  # junk mid-tag: raw, NOT unescaped
                i = endpos
                continue
            selfclosing = end.endswith("/>")
        else:
            selfclosing = nc == "/"
        i = endpos
        if selfclosing:
            p.handle_startendtag(tag, attrs)
            continue
        p.handle_starttag(tag, attrs)
        if tag in _RAWTEXT:
            if lower is None:
                lower = s.lower()
            cm = _RAWTEXT_CLOSE[tag].search(lower, i)
            if cm is None:
                # unterminated rawtext: rest of doc is script/style content
                p.handle_endtag(tag)
                break
            p.handle_endtag(tag)
            i = cm.end()


DEFAULT_ENGINE = "fast" if _FAST_ENGINE_OK else "stdlib"


def extract_blocks(html: bytes | str, engine: str = DEFAULT_ENGINE) -> list[Block]:
    """Parse one page into its flat block list (document order).

    This is the shared kernel: the oracle calls it directly; the Spark
    detect/fused stages call it per row inside an Arrow batch.  ``engine``
    selects the tokenizer: "fast" (default; ~3x stdlib throughput) or
    "stdlib" (html.parser, the reference implementation both are tested
    against).  Both drive the same _BlockParser state machine.
    """
    text = decode_html(html) if isinstance(html, (bytes, bytearray, memoryview)) else (html or "")
    parser = _BlockParser()
    try:
        if engine == "fast" and _FAST_ENGINE_OK:
            _fast_feed(text, parser)
            parser._flush()
        else:
            parser.feed(text)
            parser.close()
    except Exception:
        # both engines are tolerant; any residual parse error yields
        # whatever blocks were collected — same behavior on both sides.
        parser._flush()
    return parser.blocks

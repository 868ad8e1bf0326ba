"""P1 extract stage: deterministic HTML→text + per-document graph.

Reference analogs:
- html→text = ``LanguageFrontend.parse(File) → TranslationUnitDeclaration``
  (frontends/cpp/CXXLanguageFrontend.kt:69): one row in, one document
  graph out, embarrassingly parallel, byte-identical per url (the
  per-row invariant from BASELINE.json `input_hint`).
- forgiving parsing + ProblemNode on bad input (Handler.java:129-138):
  malformed HTML never raises; it yields best-effort text plus a
  ``problem`` row.
- mention order edges with an ``index`` property = EOG construction
  (EvaluationOrderGraphPass.java:87-130, Properties.java:43 INDEX).
- within-document coreference chain = DFG edges (Node.kt:109-112).
- section containment = AST subgraph (SubgraphWalker.java:101-150).

Everything here is *within-row*: no shuffle, no cross-document state
(SURVEY.md §7.1 P1).  Stateful setup (gazetteer token index, compiled
regexes) happens once per actor in ``__init__`` — the stage is passed to
``map_batches`` as a callable class with ``concurrency=N``.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

import numpy as np
import pyarrow as pa

from ..normalize import (
    char_to_byte_offsets,
    collapse_ws,
    content_id,
    norm_name,
)
from ..world import CONNECTOR_TO_PRED

BLOCK_TAGS = frozenset({"title", "h1", "h2", "h3", "h4", "h5", "h6", "p"})
SKIP_TAGS = frozenset({"nav", "footer", "script", "style", "aside"})
HEADING_TAGS = frozenset({"title", "h1", "h2", "h3", "h4", "h5", "h6"})

_TOKEN = re.compile(r"\w+", re.UNICODE)
_CAP = re.compile(r"^[A-ZÀ-Þ][\wÀ-ÿ]*$")
# numeric literal token (int or decimal) — the Literal-node analog
_NUM = re.compile(r"\d+(?:\.\d+)?")
# A sentence break is a newline, or terminal punctuation followed by
# whitespace and a capital/digit (so "Acme Labs Inc. is based in ..."
# does NOT break mid-sentence on the corporate-suffix period).  Callers
# include the next mention's first character in the probed segment.
_SENT_BREAK = re.compile(r"\n|[.!?](?=\s+[A-ZÀ-Þ0-9])")


class Block:
    """One extracted text block.  ``branch``/``chosen`` carry A/B-variant
    containment (``<div class="variant" data-branch=... data-chosen=...>``)
    — the web analog of an if/else arm: ``branch`` is the arm label,
    ``chosen`` is True/False when the page declares a constant condition
    (which arm was actually served), None when undeclared."""

    __slots__ = ("tag", "text", "branch", "chosen")

    def __init__(self, tag: str, text: str, branch: str | None = None,
                 chosen: bool | None = None):
        self.tag = tag
        self.text = text
        self.branch = branch
        self.chosen = chosen

    def __iter__(self):  # (tag, text) unpacking compatibility
        return iter((self.tag, self.text))


class _BlockParser(HTMLParser):
    """Forgiving block extractor: collects the whitespace-normalized text
    of every title/h1-h6/p element that is not inside
    nav/footer/aside/script/style.  Blocks join with "\\n" to form the
    canonical extracted text.  ``div.variant`` wrappers stamp their
    branch metadata onto contained blocks (EOG branch analog)."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: list[Block] = []
        self._skip = 0
        self._cur_tag: str | None = None
        self._buf: list[str] = []
        # one entry per OPEN <div>: None or (branch, chosen)
        self._divs: list[tuple[str, bool | None] | None] = []

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in SKIP_TAGS:
            self._skip += 1
        elif tag == "div":
            ad = dict(attrs)
            if ad.get("class") == "variant" and ad.get("data-branch"):
                chosen_attr = ad.get("data-chosen")
                chosen = (
                    None if chosen_attr is None
                    else chosen_attr == ad["data-branch"]
                )
                self._divs.append((ad["data-branch"], chosen))
            else:
                self._divs.append(None)
        elif self._skip == 0 and tag in BLOCK_TAGS:
            self._flush()
            self._cur_tag = tag

    def handle_endtag(self, tag: str) -> None:
        if tag in SKIP_TAGS:
            self._skip = max(0, self._skip - 1)
        elif tag == "div":
            if self._divs:
                self._divs.pop()
        elif tag in BLOCK_TAGS and self._cur_tag == tag:
            self._flush()

    def handle_data(self, data: str) -> None:
        if self._skip == 0 and self._cur_tag is not None:
            self._buf.append(data)

    def _variant_ctx(self) -> tuple[str, bool | None] | None:
        for entry in reversed(self._divs):
            if entry is not None:
                return entry
        return None

    def _flush(self) -> None:
        if self._cur_tag is not None:
            text = collapse_ws("".join(self._buf))
            if text:
                ctx = self._variant_ctx()
                branch, chosen = ctx if ctx else (None, None)
                self.blocks.append(Block(self._cur_tag, text, branch, chosen))
            self._buf.clear()
            self._cur_tag = None

    def close(self) -> None:  # flush an unterminated block (truncated html)
        super().close()
        self._flush()


class _FastMiss(Exception):
    """Raised by _fast_blocks on ANY construct outside its strict
    grammar; the caller falls back to the html.parser path."""


# Strict "clean HTML" grammar for the fast path.  Anything outside it
# (comments, PIs, CDATA sections, single-quoted / unquoted-value /
# entity-bearing attributes, bare '<' in text, truncated trailing
# markup) raises _FastMiss — equivalence with html.parser is
# guaranteed by construction on the accepted language and pinned by
# the differential fuzz test (test_extract).
_FAST_START = re.compile(
    r"([a-zA-Z][a-zA-Z0-9]*)"
    r"((?:\s+[a-zA-Z_:][-a-zA-Z0-9_:.]*(?:=\"[^\"<>&]*\")?)*)\s*(/?)>"
)
_FAST_END = re.compile(r"/\s*([a-zA-Z][a-zA-Z0-9]*)\s*>")
_FAST_DOCTYPE = re.compile(r"![Dd][Oo][Cc][Tt][Yy][Pp][Ee][^>]*>")
_FAST_ATTR = re.compile(r"([a-zA-Z_:][-a-zA-Z0-9_:.]*)(?:=\"([^\"]*)\")?")
_CDATA_CLOSE = {t: re.compile(r"</\s*" + t, re.IGNORECASE)
                for t in ("script", "style")}


def _fast_blocks(s: str) -> list[Block]:
    """Single-pass scanner for the strict grammar above, replicating
    _BlockParser's state machine with plain locals (html.parser spends
    most of its time in per-chunk regex bookkeeping, per-tag attribute
    parsing and unconditional unescape; this path skips all three for
    the common case).  Raises _FastMiss on anything irregular."""
    from html import unescape

    blocks: list[Block] = []
    skip = 0
    cur_tag: str | None = None
    buf: list[str] = []
    divs: list[tuple[str, bool | None] | None] = []

    def flush() -> None:
        nonlocal cur_tag
        if cur_tag is not None:
            text = collapse_ws("".join(buf))
            if text:
                ctx = None
                for entry in reversed(divs):
                    if entry is not None:
                        ctx = entry
                        break
                branch, chosen = ctx if ctx else (None, None)
                blocks.append(Block(cur_tag, text, branch, chosen))
            buf.clear()
            cur_tag = None

    def start(tag: str, attrs_str: str) -> None:
        nonlocal skip, cur_tag
        if tag in SKIP_TAGS:
            skip += 1
        elif tag == "div":
            entry: tuple[str, bool | None] | None = None
            if attrs_str:
                ad = {m.group(1).lower(): m.group(2)
                      for m in _FAST_ATTR.finditer(attrs_str)}
                if ad.get("class") == "variant" and ad.get("data-branch"):
                    chosen_attr = ad.get("data-chosen")
                    entry = (
                        ad["data-branch"],
                        None if chosen_attr is None
                        else chosen_attr == ad["data-branch"],
                    )
            divs.append(entry)
        elif skip == 0 and tag in BLOCK_TAGS:
            flush()
            cur_tag = tag

    def end(tag: str) -> None:
        nonlocal skip
        if tag in SKIP_TAGS:
            skip = max(0, skip - 1)
        elif tag == "div":
            if divs:
                divs.pop()
        elif tag in BLOCK_TAGS and cur_tag == tag:
            flush()

    pos = 0
    n = len(s)
    find = s.find
    while pos < n:
        lt = find("<", pos)
        if lt != pos:
            data = s[pos:] if lt < 0 else s[pos:lt]
            if skip == 0 and cur_tag is not None:
                buf.append(unescape(data) if "&" in data else data)
            if lt < 0:
                break
            pos = lt
        nxt = s[lt + 1: lt + 2]
        if nxt == "/":
            m = _FAST_END.match(s, lt + 1)
            if not m:
                raise _FastMiss
            end(m.group(1).lower())
            pos = m.end()
        elif nxt == "!":
            m = _FAST_DOCTYPE.match(s, lt + 1)
            if not m:
                raise _FastMiss  # comment / CDATA section / other decl
            pos = m.end()
        else:
            m = _FAST_START.match(s, lt + 1)
            if not m:
                raise _FastMiss  # '<?', bare '<', or irregular tag
            tag = m.group(1).lower()
            start(tag, m.group(2))
            pos = m.end()
            if m.group(3):  # self-closing: html.parser fires start+end
                end(tag)
            elif tag in _CDATA_CLOSE:
                # raw-text element: content (possibly with '<') is data
                # until the matching close tag; dropped here because
                # script/style are SKIP_TAGS (skip >= 1 right now)
                cm = _CDATA_CLOSE[tag].search(s, pos)
                if cm is None:
                    raise _FastMiss  # truncated inside raw text
                em = _FAST_END.match(s, cm.start() + 1)
                if not em or em.group(1).lower() != tag:
                    raise _FastMiss  # e.g. '</scriptx>' inside cdata
                end(tag)
                pos = em.end()
    flush()  # unterminated block (truncated html)
    return blocks


def _blocks_htmlparser(text: str) -> list[Block]:
    p = _BlockParser()
    p.feed(text)
    p.close()
    return p.blocks


def extract_blocks(html: bytes) -> tuple[list[Block], bool]:
    """(blocks, is_problem).  Never raises — the analog of best-effort
    frontends with failOnError=false (TranslationManager.kt:353-369).
    Clean pages take the strict single-pass scanner; anything outside
    its grammar falls back to html.parser (identical output either
    way — differential-fuzz-pinned)."""
    is_problem = b"</html>" not in html
    text = html.decode("utf-8", errors="replace")
    try:
        return _fast_blocks(text), is_problem
    except Exception:  # _FastMiss or any surprise: take the slow path
        pass
    try:
        return _blocks_htmlparser(text), is_problem
    except Exception:  # html.parser is forgiving, but belt-and-braces
        return [], True


def extract_text(html: bytes) -> tuple[str, bool]:
    blocks, is_problem = extract_blocks(html)
    return "\n".join(t for _, t in blocks), is_problem


def build_detector_index(aliases: list[str]) -> tuple[dict, int]:
    """token-tuple → alias index + max n-gram length (driver-side,
    broadcast-once)."""
    index: dict[tuple[str, ...], str] = {}
    max_n = 1
    for alias in aliases:
        toks = tuple(t.lower() for t in _TOKEN.findall(alias))
        if toks:
            index[toks] = alias
            max_n = max(max_n, len(toks))
    return index, max_n


class Mention:
    __slots__ = ("start", "end", "surface", "norm", "inferred")

    def __init__(self, start: int, end: int, surface: str, norm: str, inferred: bool):
        self.start = start
        self.end = end
        self.surface = surface
        self.norm = norm
        self.inferred = inferred


class MentionDetector:
    """Gazetteer-driven mention detection via longest-match token n-gram
    lookup (O(tokens × max_n) dict probes — NOT a giant regex
    alternation, which backtracks per alternative), plus a
    capitalized-run fallback for out-of-dictionary entities (the analog
    of inference-on-miss, VariableUsageResolver.java:409-452).

    For large gazetteers, build the index ONCE on the driver with
    :func:`build_detector_index` and broadcast it — rebuilding a 50k+
    alias index in every actor's ``__init__`` costs seconds × actors
    (measured as the dominant flagship cost before this change)."""

    def __init__(self, aliases: list[str] | None = None,
                 prebuilt: tuple[dict, int] | None = None):
        if prebuilt is not None:
            self.index, self.max_n = prebuilt
            return
        self.index, self.max_n = build_detector_index(aliases or [])

    def detect(self, text: str) -> list[Mention]:
        toks = [(m.start(), m.end(), m.group()) for m in _TOKEN.finditer(text)]
        low = [t[2].lower() for t in toks]
        n_tok = len(toks)
        mentions: list[Mention] = []
        anaphors: list[tuple[int, int, str]] = []  # (start, end, low_token)
        i = 0
        while i < n_tok:
            hit_n = 0
            for n in range(min(self.max_n, n_tok - i), 0, -1):
                if tuple(low[i : i + n]) in self.index:
                    hit_n = n
                    break
            if hit_n:
                start, end = toks[i][0], toks[i + hit_n - 1][1]
                surface = text[start:end]
                mentions.append(Mention(start, end, surface, norm_name(surface), False))
                i += hit_n
            else:
                # capitalized-run fallback: >=2 tokens, first alphabetic
                # capitalized, rest capitalized-or-numeric, no sentence
                # break between tokens
                if _CAP.match(toks[i][2]):
                    j = i + 1
                    while (
                        j < n_tok
                        and (_CAP.match(toks[j][2]) or toks[j][2].isdigit())
                        and not _SENT_BREAK.search(text[toks[j - 1][1] : toks[j][0] + 1])
                        and tuple(low[j : j + 1]) not in self.index
                    ):
                        j += 1
                    if j - i >= 2:
                        start, end = toks[i][0], toks[j - 1][1]
                        surface = text[start:end]
                        mentions.append(
                            Mention(start, end, surface, norm_name(surface), True)
                        )
                        i = j
                        continue
                    # single unmatched capitalized token: candidate
                    # anaphor for within-document scope resolution
                    anaphors.append((toks[i][0], toks[i][1], low[i]))
                i += 1

        # within-document scope resolution (ScopeManager analog,
        # ScopeManager.kt:375-602): a bare capitalized token whose
        # lowercase equals the FINAL token of an earlier mention's norm
        # resolves to that mention's entity (nearest antecedent wins,
        # deterministically)
        if anaphors and mentions:
            resolved: list[Mention] = []
            for start, end, tok in anaphors:
                antecedent = None
                for m in mentions:
                    if m.start >= start:
                        break
                    if not m.inferred and m.norm.split()[-1:] == [tok]:
                        antecedent = m  # keep scanning: nearest prior wins
                if antecedent is not None:
                    resolved.append(
                        Mention(start, end, text[start:end], antecedent.norm,
                                antecedent.inferred)
                    )
            if resolved:
                mentions = sorted(
                    mentions + resolved, key=lambda m: (m.start, m.end)
                )
        return mentions


def triples_from_mentions(
    text: str, mentions: list[Mention], lang: str
) -> list[tuple[Mention, str, Mention]]:
    """Adjacent mention pairs within one sentence whose between-text is a
    known predicate connector → (subj, pred, obj).  The connector table
    is per-language — the analog of extension→frontend dispatch
    (TranslationManager.kt:373-405)."""
    conn = CONNECTOR_TO_PRED.get(lang) or CONNECTOR_TO_PRED["en"]
    out = []
    for m1, m2 in zip(mentions, mentions[1:]):
        if _SENT_BREAK.search(text[m1.end : m2.start + 1]):
            continue
        pred = conn.get(text[m1.end : m2.start].strip(" \t.,;:"))
        if pred:
            out.append((m1, pred, m2))
    return out


def _byte_offsets(text: str):
    # the numpy continuation-byte mask is ASCII-fast too — one path
    return char_to_byte_offsets(text)


class ExtractTriples:
    """Lean extract: pages batch → TRIPLES_RAW batch (mention detection +
    connector matching only; no node/edge assembly).  Used by the
    in-memory query path.  Pass to ``map_batches(ExtractTriples,
    fn_constructor_kwargs=dict(dict_ref=ref), concurrency=N)``."""

    def __init__(self, dict_ref=None, aliases: list[str] | None = None,
                 index_ref=None):
        if index_ref is not None:
            import ray

            self.detector = MentionDetector(prebuilt=ray.get(index_ref))
            return
        if aliases is None:
            import ray

            rows = ray.get(dict_ref)
            aliases = [r["alias"] for r in rows]
        self.detector = MentionDetector(aliases)

    def __call__(self, batch: pa.Table) -> pa.Table:
        cols: dict[str, list] = {k: [] for k in (
            "subj_surface", "subj_norm", "pred", "obj_surface", "obj_norm",
            "url", "span_start",
        )}
        urls = batch["url"].to_pylist()
        langs = batch["lang"].to_pylist()
        htmls = batch["html"].to_pylist()
        for url, lang, html in zip(urls, langs, htmls):
            text, _problem = extract_text(html)
            mentions = self.detector.detect(text)
            if not mentions:
                continue
            b_off = _byte_offsets(text)
            for m1, pred, m2 in triples_from_mentions(text, mentions, lang):
                cols["subj_surface"].append(m1.surface)
                cols["subj_norm"].append(m1.norm)
                cols["pred"].append(pred)
                cols["obj_surface"].append(m2.surface)
                cols["obj_norm"].append(m2.norm)
                cols["url"].append(url)
                cols["span_start"].append(b_off[m1.start])
        from ..schemas import TRIPLES_RAW

        return pa.Table.from_pydict(cols, schema=TRIPLES_RAW)


def mention_literals(text: str, mentions: list[Mention]) -> list[str | None]:
    """Per-mention numeric literal: the first standalone number between
    the mention's end and the NEXT mention's start, within the same
    sentence — the web analog of a ``Literal`` node adjacent to a
    reference in the AST (ValueEvaluator.kt:269-294 looks up literal
    operands the same way: nearest in evaluation order).  Kept as the
    source string ("123" / "456.5") so int-vs-float promotion stays
    decidable downstream."""
    if not mentions or _NUM.search(text) is None:
        return [None] * len(mentions)  # no digits anywhere — common case
    out: list[str | None] = []
    for k, m in enumerate(mentions):
        nxt = mentions[k + 1].start if k + 1 < len(mentions) else len(text)
        sb = _SENT_BREAK.search(text, m.end)
        limit = min(nxt, sb.start() if sb else len(text))
        num = _NUM.search(text, m.end, limit)
        out.append(num.group() if num else None)
    return out


# Bump whenever the extracted graph's schema or edge semantics change —
# on-disk /tmp caches are keyed on it, so stale graphs from an older
# extractor version are never compared against fresh in-memory results.
GRAPH_FORMAT_VERSION = 5

# Superset schema for the single-pass full-graph extract: one output row
# stream with a `kind` discriminator, written with
# write_parquet(partition_cols=["kind"]) so ONE pass over the pages
# produces nodes/, edges/ and triples_raw/ directories (SURVEY.md §7.1).
GRAPH_SCHEMA = pa.schema(
    [
        ("kind", pa.string()),  # node | edge | triple | problem
        ("url", pa.string()),
        ("node_id", pa.string()),
        ("label", pa.string()),
        ("name", pa.string()),
        ("norm_name", pa.string()),
        ("span_start", pa.int64()),
        ("span_end", pa.int64()),
        ("is_inferred", pa.bool_()),
        # adjacent numeric literal on Mention nodes (Literal-node analog,
        # source string so int/float promotion stays decidable); null on
        # every other kind
        ("literal", pa.string()),
        ("src_id", pa.string()),
        ("dst_id", pa.string()),
        ("etype", pa.string()),
        ("index", pa.int32()),
        # PropertyEdge property-map columns (Properties.java:43-49):
        # BRANCH marks the true/false arm of a fork edge; UNREACHABLE
        # marks edges killed by a constant condition (UnreachableEOGPass
        # semantics: flagged, never silently dropped).  Null elsewhere.
        ("branch", pa.bool_()),
        ("unreachable", pa.bool_()),
        ("subj_surface", pa.string()),
        ("subj_norm", pa.string()),
        ("pred", pa.string()),
        ("obj_surface", pa.string()),
        ("obj_norm", pa.string()),
    ]
)


class _ColumnRows:
    """Columnar accumulator for GRAPH_SCHEMA rows.

    Each emission records only the columns it actually sets, as
    (row_offset, count, values-or-scalar) segments; adjacent segments
    with the same scalar coalesce (one segment per page for ``url``,
    per run for ``kind``).  At table build, absent stretches become
    ``pa.nulls`` (O(1) per gap — a null array is a bitmap, not cells)
    and scalar runs become ``pa.repeat`` — so the sparse majority of
    the 22-column × ~100-rows-per-page grid never touches a Python
    list.  (The previous list-of-dicts assembly was a measured 12% of
    full-graph per-page cost; per-column list padding still ~13%.)"""

    __slots__ = ("segs", "total")

    def __init__(self) -> None:
        # per column: list of (offset, count, values_list | scalar)
        self.segs: dict[str, list] = {n: [] for n in GRAPH_SCHEMA.names}
        self.total = 0

    def emit(self, count: int, **columns) -> None:
        if not count:
            return
        off = self.total
        for name, v in columns.items():
            segs = self.segs[name]
            if (segs and not isinstance(v, list)
                    and segs[-1][0] + segs[-1][1] == off
                    and segs[-1][2] is v):
                segs[-1] = (segs[-1][0], segs[-1][1] + count, v)
            else:
                segs.append((off, count, v))
        self.total += count

    def table(self) -> pa.Table:
        from itertools import repeat

        arrays = []
        for field in GRAPH_SCHEMA:
            segs = self.segs[field.name]
            if not segs:  # fully-absent column: a null bitmap, no cells
                arrays.append(pa.nulls(self.total, field.type))
                continue
            col: list = [None] * self.total  # one C-level alloc
            for off, count, v in segs:
                if isinstance(v, list):
                    col[off:off + count] = v
                else:  # scalar run via slice-assign from an iterator —
                    col[off:off + count] = repeat(v, count)  # no temp list
            arrays.append(pa.array(col, field.type))
        return pa.Table.from_arrays(arrays, schema=GRAPH_SCHEMA)


class ExtractGraph:
    """Full extract: pages batch → graph rows (nodes + AST/EOG/DFG/TRIPLE
    edges + raw triples + problem rows) under GRAPH_SCHEMA.

    ``config_ref`` is the compilation-database sidecar analog
    (CompilationDatabase.kt:1-208, used Application.kt:347-353): a
    broadcast per-url config table overriding extraction parameters —
    ``lang`` forces the connector dispatch (per-file compiler-flags
    analog), ``skip`` excludes the url with an auditable problem row
    (the compdb's file-list restriction).  Absent urls use defaults."""

    def __init__(self, dict_ref=None, aliases: list[str] | None = None,
                 index_ref=None, config_ref=None,
                 config: dict[str, dict] | None = None):
        if config is not None:
            self.config = config
        elif config_ref is not None:
            import ray

            self.config = ray.get(config_ref)
        else:
            self.config = {}
        if index_ref is not None:
            import ray

            self.detector = MentionDetector(prebuilt=ray.get(index_ref))
            return
        if aliases is None:
            import ray

            rows = ray.get(dict_ref)
            aliases = [r["alias"] for r in rows]
        self.detector = MentionDetector(aliases)

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = _ColumnRows()
        urls = batch["url"].to_pylist()
        langs = batch["lang"].to_pylist()
        htmls = batch["html"].to_pylist()
        for url, lang, html in zip(urls, langs, htmls):
            self._one(url, lang, html, out)
        return out.table()

    def _one(self, url: str, lang: str, html: bytes,
             out: _ColumnRows) -> None:
        cfg = self.config.get(url)
        if cfg:
            if cfg.get("skip"):
                # compdb exclusion: auditable, never a silent drop
                out.emit(
                    1, kind="problem", url=url,
                    node_id=content_id(url, "problem"), label="Problem",
                    name="excluded-by-config", is_inferred=False,
                )
                return
            lang = cfg.get("lang") or lang
        lang_problem = lang not in CONNECTOR_TO_PRED
        blocks, is_problem = extract_blocks(html)
        text = "\n".join(t for _, t in blocks)
        b_off = _byte_offsets(text)

        doc_id = content_id(url, "doc")
        out.emit(
            1, kind="node", url=url, node_id=doc_id, label="Document",
            name=url, norm_name=url, span_start=0, span_end=b_off[-1],
            is_inferred=False,
        )
        if is_problem:
            out.emit(
                1, kind="problem", url=url,
                node_id=content_id(url, "problem"), label="Problem",
                name="truncated-html", is_inferred=False,
            )
        if lang_problem:
            # dispatch-with-problem-row, not a silent fallback: the
            # analog of the reference's "unsupported extension" error
            # (TranslationManager.kt:373-405) — extraction still runs
            # best-effort with the default (en) connector table
            out.emit(
                1, kind="problem", url=url,
                node_id=content_id(url, "problem-lang"), label="Problem",
                name=f"unsupported-lang:{lang}", is_inferred=False,
            )

        # Section nodes from heading blocks + AST doc→section edges.
        # Block k starts at cumulative offset (sum of lens + k separators).
        sections: list[tuple[int, str]] = []  # (char_start, node_id)
        sec_names: list[str] = []
        # (char_start, char_end, group_id, arm_label, chosen) per variant
        # block — a maximal run of variant blocks forms one fork group
        variant_spans: list[tuple[int, int, int, str, bool | None]] = []
        in_variant_run = False
        n_groups = 0
        pos = 0
        for blk in blocks:
            tag, btext = blk.tag, blk.text
            if blk.branch is not None:
                if not in_variant_run:
                    n_groups += 1
                    in_variant_run = True
                variant_spans.append(
                    (pos, pos + len(btext), n_groups - 1, blk.branch,
                     blk.chosen)
                )
            else:
                in_variant_run = False
            if tag in HEADING_TAGS:
                # doc-hash prefix + span: content-derived (M4 IdentifierPass
                # analog — no counters), unique (one section per offset),
                # and ONE hash per document instead of one per node
                sections.append((pos, f"{doc_id}s{pos}"))
                sec_names.append(btext)
            pos += len(btext) + 1  # +1 for the "\n" joiner

        n_sec = len(sections)
        out.emit(
            n_sec, kind="node", url=url,
            node_id=[sid for _p, sid in sections], label="Section",
            name=sec_names, norm_name=[norm_name(t) for t in sec_names],
            span_start=[b_off[p] for p, _sid in sections],
            span_end=[b_off[p + len(t)]
                      for (p, _sid), t in zip(sections, sec_names)],
            is_inferred=False,
        )
        out.emit(
            n_sec, kind="edge", url=url, src_id=doc_id,
            dst_id=[sid for _p, sid in sections], etype="AST",
            index=list(range(n_sec)), is_inferred=False,
        )

        mentions = self.detector.detect(text)
        literals = mention_literals(text, mentions)
        ment_ids = [f"{doc_id}m{m.start}-{m.end}" for m in mentions]
        out.emit(
            len(mentions), kind="node", url=url, node_id=ment_ids,
            label="Mention", name=[m.surface for m in mentions],
            norm_name=[m.norm for m in mentions],
            span_start=[b_off[m.start] for m in mentions],
            span_end=[b_off[m.end] for m in mentions],
            is_inferred=[m.inferred for m in mentions], literal=literals,
        )

        # AST: owning section = last section starting at/before mention
        ast_src: list[str] = []
        ast_dst: list[str] = []
        ast_idx: list[int] = []
        sec_child_count: dict[str, int] = {}
        for m, mid in zip(mentions, ment_ids):
            owner = None
            for s_start, sid in sections:
                if s_start <= m.start:
                    owner = sid
                else:
                    break
            if owner is not None:
                k = sec_child_count.get(owner, 0)
                sec_child_count[owner] = k + 1
                ast_src.append(owner)
                ast_dst.append(mid)
                ast_idx.append(k)
        out.emit(
            len(ast_src), kind="edge", url=url, src_id=ast_src,
            dst_id=ast_dst, etype="AST", index=ast_idx, is_inferred=False,
        )

        # EOG: branch-aware evaluation order (INDEX-carrying, order is
        # data not stream position — SURVEY.md §2.11).  Plain documents
        # degenerate to the linear mention chain; A/B variant blocks
        # fork/join with branch + unreachable edge properties
        # (EvaluationOrderGraphPass.java:87-130, UnreachableEOGPass.kt:41-97).
        from .dfg import build_eog, flow_sensitive_dfg, flow_sensitive_dfg_linear

        def _variant_tag(m: Mention):
            for v_start, v_end, gid, label, chosen in variant_spans:
                if v_start <= m.start < v_end:
                    return (gid, label, chosen)
            return None

        tags = [_variant_tag(m) for m in mentions] if variant_spans else [
            None
        ] * len(mentions)
        eog_edges = build_eog(tags)
        out.emit(
            len(eog_edges), kind="edge", url=url,
            src_id=[ment_ids[si] for si, _d, _b, _u in eog_edges],
            dst_id=[ment_ids[di] for _s, di, _b, _u in eog_edges],
            etype="EOG", index=list(range(len(eog_edges))),
            branch=[b for _s, _d, b, _u in eog_edges],
            unreachable=[u for _s, _d, _b, u in eog_edges],
            is_inferred=False,
        )

        # DFG2: flow-sensitive refinement (ControlFlowSensitiveDFGPass
        # analog) — strong updates kill stale defs, joins union value
        # sets, unreachable arms never reach a live use
        norms = [m.norm for m in mentions]
        bare = [
            len(m.surface.split()) == 1 and len(m.norm.split()) > 1
            for m in mentions
        ]
        # fork-free documents take the singleton-environment fast path
        # (equivalence with the general fixpoint is property-pinned)
        dfg2 = (
            flow_sensitive_dfg(norms, bare, eog_edges) if variant_spans
            else flow_sensitive_dfg_linear(norms, bare)
        )
        out.emit(
            len(dfg2), kind="edge", url=url,
            src_id=[ment_ids[d] for d, _u in dfg2],
            dst_id=[ment_ids[u] for _d, u in dfg2],
            etype="DFG2", is_inferred=False,
        )

        # DFG: within-document coreference — consecutive mentions of the
        # same norm form a chain (prevDFG/nextDFG analog)
        dfg_src: list[str] = []
        dfg_dst: list[str] = []
        last_by_norm: dict[str, int] = {}
        for i, m in enumerate(mentions):
            j = last_by_norm.get(m.norm)
            if j is not None:
                dfg_src.append(ment_ids[j])
                dfg_dst.append(ment_ids[i])
            last_by_norm[m.norm] = i
        out.emit(
            len(dfg_src), kind="edge", url=url, src_id=dfg_src,
            dst_id=dfg_dst, etype="DFG", is_inferred=False,
        )

        # TRIPLE edges + raw triple rows
        midx = {id(m): i for i, m in enumerate(mentions)}
        trips = triples_from_mentions(text, mentions, lang)
        t_inf = [m1.inferred or m2.inferred for m1, _p, m2 in trips]
        out.emit(
            len(trips), kind="edge", url=url,
            src_id=[ment_ids[midx[id(m1)]] for m1, _p, _m2 in trips],
            dst_id=[ment_ids[midx[id(m2)]] for _m1, _p, m2 in trips],
            etype="TRIPLE", name=[p for _m1, p, _m2 in trips],
            is_inferred=t_inf,
        )
        out.emit(
            len(trips), kind="triple", url=url,
            subj_surface=[m1.surface for m1, _p, _m2 in trips],
            subj_norm=[m1.norm for m1, _p, _m2 in trips],
            pred=[p for _m1, p, _m2 in trips],
            obj_surface=[m2.surface for _m1, _p, m2 in trips],
            obj_norm=[m2.norm for _m1, _p, m2 in trips],
            span_start=[b_off[m1.start] for m1, _p, _m2 in trips],
            is_inferred=t_inf,
        )

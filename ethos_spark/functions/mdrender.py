"""Markdown → HTML rendering for the serve layer (F6).

Reference: ``marked(content)`` at detail-handler.ts:32-34; the listing view
then strips tags via jsdom and truncates to 250 chars + "..."
(listing-handler.ts:82-92). No markdown package exists in this environment,
so this is a small renderer covering exactly the constructs our
HTML→Markdown converter emits (setext/ATX headings, paragraphs, em/strong,
inline code, links, images, lists, blockquotes, indented code, hr) — i.e.
round-trip-complete for engine-produced content.
"""

from __future__ import annotations

import re
from html import escape

_INLINE_RULES = [
    (re.compile(r"!\[([^\]]*)\]\(([^)\s]+)(?:\s+\"([^\"]*)\")?\)"),
     lambda m: f'<img src="{escape(m.group(2))}" alt="{escape(m.group(1))}"'
               + (f' title="{escape(m.group(3))}"' if m.group(3) else "") + ">"),
    (re.compile(r"\[([^\]]*)\]\(([^)\s]+)(?:\s+\"([^\"]*)\")?\)"),
     lambda m: f'<a href="{escape(m.group(2))}"'
               + (f' title="{escape(m.group(3))}"' if m.group(3) else "")
               + f">{m.group(1)}</a>"),
    (re.compile(r"\*\*([^*]+)\*\*"), lambda m: f"<strong>{m.group(1)}</strong>"),
    (re.compile(r"(?<![\w\\])_([^_]+)_(?!\w)"), lambda m: f"<em>{m.group(1)}</em>"),
    (re.compile(r"`([^`]+)`"), lambda m: f"<code>{escape(m.group(1))}</code>"),
]

_UNESCAPE = re.compile(r"\\([\\*_\[\]`#>+\-.~=])")


def _inline(text: str) -> str:
    for pat, repl in _INLINE_RULES:
        text = pat.sub(repl, text)
    return _UNESCAPE.sub(r"\1", text).replace("  \n", "<br>\n")


def markdown_to_html(md: str | None) -> str | None:
    if md is None:
        return None
    blocks = re.split(r"\n{2,}", md.strip("\n"))
    out: list[str] = []
    for block in blocks:
        lines = block.split("\n")
        # setext headings
        if len(lines) == 2 and re.fullmatch(r"=+", lines[1] or "x"):
            out.append(f"<h1>{_inline(lines[0])}</h1>")
            continue
        if len(lines) == 2 and re.fullmatch(r"-+", lines[1] or "x"):
            out.append(f"<h2>{_inline(lines[0])}</h2>")
            continue
        m = re.match(r"^(#{1,6}) (.*)$", lines[0])
        if m and len(lines) == 1:
            lvl = len(m.group(1))
            out.append(f"<h{lvl}>{_inline(m.group(2))}</h{lvl}>")
            continue
        if block.strip() == "* * *":
            out.append("<hr>")
            continue
        if all(l.startswith("    ") or not l.strip() for l in lines):
            code = "\n".join(l[4:] for l in lines)
            out.append(f"<pre><code>{escape(code)}</code></pre>")
            continue
        if all(l.startswith(">") or not l.strip() for l in lines):
            inner = "\n".join(re.sub(r"^> ?", "", l) for l in lines)
            out.append(f"<blockquote>{markdown_to_html(inner)}</blockquote>")
            continue
        if re.match(r"^\*   ", lines[0]):
            items = re.split(r"\n(?=\*   )", block)
            lis = "".join(
                f"<li>{_inline(re.sub(chr(10) + '    ', chr(10), i[4:]))}</li>"
                for i in items
            )
            out.append(f"<ul>{lis}</ul>")
            continue
        if re.match(r"^\d+\.  ", lines[0]):
            items = re.split(r"\n(?=\d+\.  )", block)
            lis = "".join(
                f"<li>{_inline(re.sub(r'^' + chr(92) + 'd+' + chr(92) + '.  ', '', i))}</li>"
                for i in items
            )
            out.append(f"<ol>{lis}</ol>")
            continue
        out.append(f"<p>{_inline(block)}</p>")
    return "\n".join(out)


# the 250-char listing preview lives in serve/views.py (preview_250),
# which matches the reference's textContent semantics exactly — the older
# whitespace-collapsing variant here was removed as dead code

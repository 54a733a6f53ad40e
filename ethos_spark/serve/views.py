"""HTML web views: the browse-the-corpus UI (reference
src/server/views/{listing,detail}.ts, rendered by
routes/listing-handler.ts:68-92 and detail-handler.ts:21-47).

The reference compiles pug templates against PicoCSS; this renders the
same semantic structure with stdlib string templating (no pug/jsdom in
this container). Behaviors mirrored exactly:

- listing preview: ``marked(content)`` → DOM textContent → ``substring(0,
  250).trim() + "..."`` — the ellipsis is appended UNCONDITIONALLY (the
  reference does, even for short content), and textContent keeps the
  renderer's inter-block newlines (listing-handler.ts:82-92)
- article links carry page/source query params only when page>1 / source
  set (views/listing.ts articleUrl construction); the detail view's back
  link propagates them back (views/detail.ts backUrl)
- source ``<select>`` nav with the current source selected; unknown
  source ids render as "Undefined" (listing-handler.ts:69-71)
- pagination nav: Previous when page>1, "Page X of Y", Next when
  page<totalPages; "No publications found." when empty
- detail content is the marked-rendered markdown, UNESCAPED (pug ``!=``)
"""

from __future__ import annotations

import re
from html import escape

from ethos_spark.functions.mdrender import markdown_to_html

_TAG_RE = re.compile(r"<[^>]+>")


def preview_250(md: str | None, limit: int = 250) -> str:
    """Reference listing preview (listing-handler.ts:82-92): render the
    markdown, take DOM textContent (tags stripped, whitespace kept),
    substring(0, 250), trim, append "..." unconditionally."""
    html = markdown_to_html(md) or ""
    text = _TAG_RE.sub("", html)
    return text[:limit].strip() + "..."


def _fmt_date(iso: str | None) -> str | None:
    """Deterministic stand-in for toLocaleDateString(): M/D/YYYY (the
    reference's output is locale-dependent; en-US is its CI locale)."""
    if not iso:
        return None
    m = re.match(r"(\d{4})-(\d{2})-(\d{2})", iso)
    if not m:
        return iso
    y, mo, d = m.groups()
    return f"{int(mo)}/{int(d)}/{y}"


def _article_url(hash_: str, page: int, source: str | None) -> str:
    url = f"/{hash_}"
    params = []
    if page > 1:
        params.append(f"page={page}")
    if source:
        params.append(f"source={source}")
    return url + ("?" + "&".join(params) if params else "")


def _page_href(page: int, source: str | None) -> str:
    return f"/?page={page}" + (f"&source={source}" if source else "")


_SHELL = (
    "<!DOCTYPE html><html><head><title>Ethos - {title}</title></head>"
    '<body style="max-width: 1152px;margin: auto;">'
    '<header><nav><ul><li><strong><a href="{home}" aria-label="Home">'
    "{home_label}</a></strong></li></ul></nav></header><main>{main}</main>"
    "</body></html>"
)


def render_listing(
    publications: list[dict],
    pagination: dict,
    sources: list,
    current_source: str | None = None,
) -> str:
    """views/listing.ts — publications: dicts with hash/title/author/
    source (display name)/publishedDate/content (the 250-char preview)."""
    opts = ['<option value="">All Sources</option>']
    for s in sources:
        sel = " selected" if current_source == s.id else ""
        opts.append(
            f'<option value="{escape(s.id)}"{sel}>{escape(s.name)}</option>'
        )
    form = (
        '<div><form method="get" action="/">'
        '<label for="source">Filter by source:</label>'
        '<select id="source" name="source" onchange="this.form.submit()">'
        + "".join(opts)
        + "</select></form></div>"
    )
    page = pagination["page"]
    if publications:
        arts = []
        for p in publications:
            a_url = _article_url(p["hash"], page, current_source)
            meta_left = ""
            if p["author"]:
                meta_left += f"<div><small>{escape(p['author'])}</small></div>"
            meta_left += f"<div><small>{escape(p['source'])}</small></div>"
            pub_date = _fmt_date(p["publishedDate"])
            meta_right = (
                f'<div style="text-align: right;"><small>Published on '
                f"{pub_date}</small></div>"
                if pub_date
                else ""
            )
            arts.append(
                "<article>"
                f'<h3><a href="{a_url}">{escape(p["title"] or "")}</a></h3>'
                f'<div role="group"><div>{meta_left}</div>{meta_right}</div>'
                '<div style="line-height: 1.5em; height: 4.5em; overflow:'
                f' hidden;"><p>{escape(p["content"])}</p></div>'
                f'<div style="text-align: right;"><a href="{a_url}" '
                f'role="button" aria-label="Read more about '
                f'{escape(p["title"] or "")}">Continue reading</a></div>'
                "</article>"
            )
        nav_items = []
        if page > 1:
            nav_items.append(
                f'<li><a href="{_page_href(page - 1, current_source)}" '
                'rel="prev">Previous</a></li>'
            )
        nav_items.append(
            f"<li><span>Page {page} of {pagination['totalPages']}</span></li>"
        )
        if page < pagination["totalPages"]:
            nav_items.append(
                f'<li><a href="{_page_href(page + 1, current_source)}" '
                'rel="next">Next</a></li>'
            )
        body = (
            "<div>" + "".join(arts) + "</div>"
            '<nav role="navigation" aria-label="Pagination navigation"><ul>'
            + "".join(nav_items)
            + "</ul></nav>"
        )
    else:
        body = "<div><p>No publications found.</p></div>"
    return _SHELL.format(
        title="Publications",
        home="/",
        home_label="Ethos",
        main="<h1>Publications</h1>" + form + body,
    )


def render_detail(publication: dict, page: int | None, source: str | None) -> str:
    """views/detail.ts — publication.content is rendered HTML (unescaped,
    pug ``!=``); the back link propagates page/source."""
    back = "/"
    params = []
    if page:
        params.append(f"page={page}")
    if source:
        params.append(f"source={source}")
    if params:
        back += "?" + "&".join(params)
    pub_date = _fmt_date(publication["publishedDate"])
    meta_left = ""
    if publication["author"]:
        meta_left += (
            f"<div><small>{escape(publication['author'])}</small></div>"
            f"<div><small>{escape(publication['source'])}</small></div>"
        )
    meta_right = (
        f'<div style="text-align: right;"><small>Published on {pub_date}'
        "</small></div>"
        if pub_date
        else ""
    )
    main = (
        "<article>"
        f"<h1>{escape(publication['title'] or '')}</h1>"
        f'<div role="group"><div>{meta_left}</div>{meta_right}</div>'
        f'<div><a href="{escape(publication["url"])}" target="_blank">'
        "View Original</a></div>"
        f"<div><p>{publication['content']}</p></div>"
        "</article>"
    )
    return _SHELL.format(
        title=escape(publication["title"] or ""),
        home=back,
        home_label="← Back to Publications",
        main=main,
    )

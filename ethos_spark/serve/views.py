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
from html import escape, unescape
from urllib.parse import quote

from ethos_spark.functions.mdrender import markdown_to_html

# HTML5 tag-open only starts at <letter, </ or <! — a bare "<" followed by
# anything else (e.g. "1 < 2") is TEXT and survives textContent
_TAG_RE = re.compile(r"<[a-zA-Z/!][^>]*>")


def preview_250(md: str | None, limit: int = 250) -> str:
    """Reference listing preview (listing-handler.ts:82-92): render the
    markdown, take DOM textContent (tags stripped, entities DECODED — jsdom
    textContent yields plain text, so '&amp;' comes back as '&'; the
    listing template then re-escapes it exactly once), substring(0, 250),
    trim, append "..." unconditionally."""
    html = markdown_to_html(md) or ""
    text = unescape(_TAG_RE.sub("", html))
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
    # user-controlled params are percent-encoded before embedding in href
    # attributes (the reference's pug a(href=...) escapes attribute values;
    # raw interpolation here was a reflected-XSS vector via ?source=)
    url = f"/{quote(hash_, safe='')}"
    params = []
    if page > 1:
        params.append(f"page={page}")
    if source:
        params.append(f"source={quote(source, safe='')}")
    return url + ("?" + "&".join(params) if params else "")


def _page_href(page: int, source: str | None) -> str:
    return f"/?page={page}" + (
        f"&source={quote(source, safe='')}" if source else ""
    )


# Classless, pico-style stylesheet inlined in <head> exactly like the
# reference (views/listing.ts:16 `style!= PicoCSS`, pico.classless.min.ts —
# Pico CSS v2 classless build). Handwritten compact stand-in covering the
# semantic elements these views emit (nav/article/select/button/small),
# with Pico's azure primary, spacing scale and automatic dark scheme — not
# a copy of the minified distribution.
PICO_STYLE = """:root{--p-bg:#fff;--p-fg:#373c44;--p-h:#2d3138;
--p-muted:#646b79;--p-primary:#0172ad;--p-primary-hover:#015887;
--p-card:#fff;--p-border:#e7eaf0;--p-radius:.25rem;
font-size:100%;font-family:system-ui,"Segoe UI",Roboto,Oxygen,Ubuntu,
Cantarell,Helvetica,Arial,"Helvetica Neue",sans-serif}
@media (prefers-color-scheme:dark){:root{--p-bg:#13171f;--p-fg:#c2c7d0;
--p-h:#f0f1f3;--p-muted:#8891a4;--p-primary:#01aaff;
--p-primary-hover:#79c0ff;--p-card:#181c25;--p-border:#202632}}
*,::after,::before{box-sizing:border-box}
body{margin:0;padding:0 1rem;background:var(--p-bg);color:var(--p-fg);
line-height:1.5;font-weight:400}
h1,h2,h3{color:var(--p-h);font-weight:700;line-height:1.2;
margin:1rem 0 .5rem}
h1{font-size:2rem}h3{font-size:1.25rem}
a{color:var(--p-primary);text-decoration:underline;
text-underline-offset:.1rem}
a:hover{color:var(--p-primary-hover)}
small{color:var(--p-muted);font-size:.875em}
header>nav ul{display:flex;list-style:none;margin:0;padding:.5rem 0}
header>nav a{text-decoration:none}
nav[role=navigation] ul{display:flex;gap:1rem;list-style:none;
justify-content:center;padding:1rem 0}
article{background:var(--p-card);border:1px solid var(--p-border);
border-radius:var(--p-radius);padding:1rem;margin:1rem 0;
box-shadow:0 1px 2px rgba(0,0,0,.04)}
article h3{margin-top:0}
div[role=group]{display:flex;justify-content:space-between;gap:1rem}
select{appearance:none;width:100%;max-width:20rem;padding:.5rem 1rem;
margin:.25rem 0 1rem;border:1px solid var(--p-border);
border-radius:var(--p-radius);background:var(--p-card);
color:var(--p-fg);font-size:1rem}
label{display:block;color:var(--p-muted);margin-bottom:.25rem}
a[role=button]{display:inline-block;background:var(--p-primary);
color:#fff;padding:.5rem 1rem;border-radius:var(--p-radius);
text-decoration:none;font-weight:600}
a[role=button]:hover{background:var(--p-primary-hover);color:#fff}
main>div>p{color:var(--p-muted)}"""

_SHELL = (
    "<!DOCTYPE html><html><head><title>Ethos - {title}</title>"
    "<style>{style}</style></head>"
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
        style=PICO_STYLE,
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
        params.append(f"source={quote(source, safe='')}")  # XSS-safe href
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
        style=PICO_STYLE,
        title=escape(publication["title"] or ""),
        home=back,
        home_label="← Back to Publications",
        main=main,
    )

"""Golden fixtures for the HTML→Markdown converter (the byte-identical
invariant, reference ContentPageExtractor.ts:104-135; FIXTURES.md §3).

Expected strings follow Turndown v7 defaults: setext h1/h2, ``*   `` bullets,
``1.  `` ordered items, indented code blocks, ``_em_``/``**strong**``,
inlined links, ``* * *`` hr, 2-space+\\n line breaks, markdown escaping."""

import pytest

from ethos_spark.functions.markdown import html_to_markdown


GOLDEN = [
    ("<p>plain text</p>", "plain text"),
    ("<h1>Title</h1>", "Title\n====="),
    ("<h2>Sub</h2>", "Sub\n---"),
    ("<h3>Deep</h3>", "### Deep"),
    ("<p>a</p><p>b</p>", "a\n\nb"),
    ("<p><strong>bold</strong> and <em>italic</em></p>", "**bold** and _italic_"),
    ("<p><b>bold</b> and <i>italic</i></p>", "**bold** and _italic_"),
    ('<p><a href="https://x.y/z">link</a></p>', "[link](https://x.y/z)"),
    ('<p><a href="/z" title="T">link</a></p>', '[link](/z "T")'),
    ('<p><img src="/i.png" alt="pic"></p>', "![pic](/i.png)"),
    ("<ul><li>one</li><li>two</li></ul>", "*   one\n*   two"),
    ("<ol><li>one</li><li>two</li></ol>", "1.  one\n2.  two"),
    ('<ol start="5"><li>five</li><li>six</li></ol>', "5.  five\n6.  six"),
    ("<blockquote><p>quoted</p></blockquote>", "> quoted"),
    (
        "<blockquote><p>a</p><p>b</p></blockquote>",
        "> a\n> \n> b",
    ),
    ("<pre><code>x = 1\ny = 2</code></pre>", "    x = 1\n    y = 2"),
    ("<p>inline <code>code()</code> here</p>", "inline `code()` here"),
    ("<hr>", "* * *"),
    ("<p>line one<br>line two</p>", "line one  \nline two"),
    # whitespace collapsing across inline elements
    ("<p>  a   <em> b </em>   c  </p>", "a _b_ c"),
    # escaping
    ("<p>5 * 3 = 15</p>", "5 \\* 3 = 15"),
    ("<p>snake_case</p>", "snake\\_case"),
    ("<p>[bracketed]</p>", "\\[bracketed\\]"),
    # NBSP → space (reference substitution #1)
    ("<p>a b</p>", "a b"),
    # mojibake: â€œ → " ; the â€-prefix rule fires before the longer pairs,
    # exactly as in the reference's ordered replace chain
    ("<p>â€œquoteâ€</p>", '"quote"'),
    # nested structures
    (
        "<div><h2>Sec</h2><p>body <strong>x</strong></p><ul><li>a</li></ul></div>",
        "Sec\n---\n\nbody **x**\n\n*   a",
    ),
    # list item with multiple blocks indents continuation by 4 spaces
    (
        "<ul><li><p>first</p><p>second</p></li></ul>",
        "*   first\n    \n    second",
    ),
    # empty inline elements vanish
    ("<p>a <strong> </strong>b</p>", "a b"),
    # unknown inline tags pass through content
    ("<p>a <span>b</span> c</p>", "a b c"),
    # generic block containers pass through with block joins
    ("<div><div>a</div><div>b</div></div>", "a\n\nb"),
]


@pytest.mark.parametrize("html,expected", GOLDEN, ids=range(len(GOLDEN)))
def test_golden_markdown(html, expected):
    assert html_to_markdown(html) == expected


def test_fallback_none():
    assert html_to_markdown(None) is None


def test_exclusions_roundtrip():
    """Node extraction with exclude_selectors → markdown (access_now-style
    author exclusion, reference access_now.ts:47-52)."""
    from ethos_spark.extraction.content import extract_content_fields
    from ethos_spark.sources.config import ContentConfig, FieldConfig

    cfg = ContentConfig(
        container_selector="#post",
        fields={
            "content": FieldConfig(".entry", "node", exclude_selectors=(".ad",)),
            "author": FieldConfig(
                "#authors", "text", optional=True, exclude_selectors=(".pic",)
            ),
        },
    )
    html = (
        '<div id="post"><div class="entry"><p>keep</p>'
        '<div class="ad">DROP</div><p>also keep</p></div>'
        '<div id="authors"><span class="pic">IMG</span> Jane Doe </div></div>'
    )
    f = extract_content_fields(html, cfg)
    assert f["content"] == "keep\n\nalso keep"
    assert f["author"] == "Jane Doe"
    assert f["_errors"] == []


def test_required_content_missing_errors():
    from ethos_spark.extraction.content import extract_content_fields
    from ethos_spark.sources.config import ContentConfig, FieldConfig

    cfg = ContentConfig(
        container_selector="#post",
        fields={"content": FieldConfig(".entry", "node")},
    )
    f = extract_content_fields('<div id="post"><p>x</p></div>', cfg)
    assert f["content"] is None
    assert any("Required field 'content'" in e for e in f["_errors"])
    f2 = extract_content_fields("<div><p>x</p></div>", cfg)
    assert any("Container selector" in e for e in f2["_errors"])

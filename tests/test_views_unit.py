"""Pure-unit view tests (no Spark): XSS-safe hrefs, pico-style shell,
entity-decoded previews (round-3 ADVICE items + VERDICT item 9)."""

from ethos_spark.serve.views import (
    PICO_STYLE,
    preview_250,
    render_detail,
    render_listing,
)


class _Src:
    def __init__(self, id_, name):
        self.id = id_
        self.name = name


PAG = {"page": 2, "totalPages": 3}
PUB = {
    "hash": "abc123",
    "title": "T",
    "author": "A",
    "source": "S",
    "publishedDate": "2025-03-01",
    "content": "prev",
}


def test_reflected_source_param_is_encoded_in_hrefs():
    evil = '"><script>alert(1)</script>'
    html = render_listing([dict(PUB)], PAG, [_Src("s1", "Source 1")], evil)
    assert "<script>alert(1)</script>" not in html
    # the value survives, percent-encoded, inside the hrefs
    assert "source=%22%3E%3Cscript%3E" in html
    det = render_detail({**PUB, "url": "https://x/y", "content": "<p>c</p>"},
                        2, evil)
    assert "<script>alert(1)</script>" not in det
    assert "source=%22%3E%3Cscript%3E" in det


def test_pico_style_inlined_in_head():
    html = render_listing([], {"page": 1, "totalPages": 1}, [])
    assert "<style>" in html and PICO_STYLE in html
    assert "prefers-color-scheme:dark" in PICO_STYLE  # auto dark scheme
    det = render_detail({**PUB, "url": "u", "content": "c"}, None, None)
    assert PICO_STYLE in det


def test_preview_decodes_entities_like_textcontent():
    # markdown renderer escapes & as &amp;; jsdom textContent decodes it
    # back — the preview must be plain text (single-escape on render)
    out = preview_250("AT&T says 1 < 2")
    assert "&amp;" not in out and "&lt;" not in out
    assert "AT&T" in out and "1 < 2" in out
    # re-escape happens exactly once in the listing template
    html = render_listing(
        [dict(PUB, content=preview_250("AT&T says 1 < 2"))],
        PAG, [], None,
    )
    assert "AT&amp;T" in html and "&amp;amp;" not in html

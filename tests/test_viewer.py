"""Terminal viewer parity (reference src/ui/viewer.ts, tested like its
mocked-inquirer suite src/tests/ui/viewer.test.ts): 50/page windows,
global numbering, reference nav label formats, same-page return after
viewing, en-US date rendering, empty-session message."""

from datetime import datetime

from ethos_spark.ui.viewer import (
    ITEMS_PER_PAGE,
    ViewerItem,
    locale_date,
    page_lines,
    render_item,
    run_viewer,
)


def _items(n):
    return [
        ViewerItem(
            title=f"Article {i}",
            hash=f"h{i:04d}",
            url=f"https://ex.com/{i}",
            published_date=datetime(2024, 3, 7) if i % 2 == 0 else None,
            content=f"# md {i}",
        )
        for i in range(n)
    ]


class Script:
    def __init__(self, cmds):
        self.cmds = list(cmds)
        self.out: list[str] = []
        self.viewed: list[str] = []

    def input(self, _prompt=""):
        if not self.cmds:
            raise EOFError
        return self.cmds.pop(0)

    def print(self, *a):
        self.out.append(" ".join(str(x) for x in a))

    def pager(self, text, _print_fn=None):
        self.viewed.append(text)


def test_locale_date_is_en_us_no_padding():
    assert locale_date(datetime(2024, 3, 7)) == "3/7/2024"
    assert locale_date(datetime(1999, 12, 31)) == "12/31/1999"


def test_page_lines_labels_and_windows():
    items = _items(120)  # 3 pages: 50/50/20
    p0 = page_lines(items, 0)
    assert p0[0] == "Select an item to view (Page 0/3) - 120 total items:"
    assert p0[1] == "1. Article 0 (3/7/2024)"
    assert p0[2] == "2. Article 1"  # null date -> no suffix (viewer.ts:100)
    assert "Next page (2/3) >>  [n]" in "\n".join(p0)
    assert "Previous page" not in "\n".join(p0)  # first page: no prev

    p1 = page_lines(items, 1)
    assert p1[1] == "51. Article 50 (3/7/2024)"  # global numbering
    joined = "\n".join(p1)
    assert "<< Previous page (1/3)  [p]" in joined
    assert "Next page (3/3) >>  [n]" in joined

    few = page_lines(_items(7), 0)
    assert few[0] == "Select an item to view - 7 total items:"
    assert "-" * 50 not in "\n".join(few)  # single page: no separator/nav


def test_nav_view_and_same_page_return():
    items = _items(120)
    s = Script(["n", "60", "p", "3", "b"])
    run_viewer(items, input_fn=s.input, print_fn=s.print, pager=s.pager)
    # viewed items in order: 60 from page 1, then 3 after returning to page 0
    assert [r.splitlines()[1] for r in s.viewed] == [
        '  "title": "Article 59",',
        '  "title": "Article 2",',
    ]
    # after viewing 60 the loop re-showed PAGE 1 (same-page return)
    shown_after_view = "\n".join(s.out)
    assert "51. Article 50" in shown_after_view


def test_bad_input_and_bounds():
    items = _items(10)
    s = Script(["p", "n", "0", "11", "zap", "q"])
    run_viewer(items, input_fn=s.input, print_fn=s.print, pager=s.pager)
    assert s.viewed == []  # nothing valid selected
    bad = [l for l in s.out if l.startswith("Unrecognized option")]
    # single page: p/n are not valid nav -> unrecognized; 0/11 out of range
    assert len(bad) == 5


def test_empty_items_message():
    s = Script([])
    run_viewer([], input_fn=s.input, print_fn=s.print, pager=s.pager)
    assert s.out == ["No stored files found."]


def test_render_item_payload():
    it = _items(1)[0]
    doc = render_item(it)
    assert '"hash": "h0000"' in doc
    assert '"content": "# md 0"' in doc
    assert '"publishedDate": "2024-03-07T00:00:00"' in doc


def test_item_count_per_page_is_reference_50():
    assert ITEMS_PER_PAGE == 50

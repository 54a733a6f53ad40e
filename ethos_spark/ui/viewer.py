"""Terminal data viewer — parity with the reference's interactive pager
(src/ui/viewer.ts): session contents listed 50/page in processed_order,
``N. Title (M/D/YYYY)`` rows numbered globally, ``<< Previous page`` /
``Next page >>`` navigation with the reference's label format
(viewer.ts:108-126), ``Back to menu`` exit, and item selection opening the
stored content through ``less -R`` when available (falling back to a plain
print with the reference's "Less viewer not available" message,
viewer.ts:188-192).

The inquirer arrow-key prompt is replaced by a line prompt (type the item
number / ``n`` / ``p`` / ``b``) — same state machine, stdin-driven, so the
whole loop is testable by feeding a command script (tests/test_viewer.py),
the sandbox analogue of the reference's mocked-inquirer viewer tests
(src/tests/ui/viewer.test.ts)."""

from __future__ import annotations

import json
import shutil
import subprocess
import sys
from dataclasses import dataclass
from datetime import datetime

ITEMS_PER_PAGE = 50
SEPARATOR_LINE = "-" * 50
BACK_LABEL = "Back to menu"


@dataclass
class ViewerItem:
    title: str
    hash: str
    url: str
    published_date: datetime | None = None
    content: str | None = None  # markdown body (the stored file's payload)


def locale_date(d: datetime) -> str:
    """en-US toLocaleDateString(): M/D/YYYY (no zero padding)."""
    return f"{d.month}/{d.day}/{d.year}"


def page_lines(items: list[ViewerItem], page: int) -> list[str]:
    """The menu block for one page — reference choice labels verbatim."""
    total_pages = max(1, -(-len(items) // ITEMS_PER_PAGE))
    start = page * ITEMS_PER_PAGE
    current = items[start : start + ITEMS_PER_PAGE]
    lines = []
    page_info = f" (Page {page}/{total_pages})" if total_pages > 1 else ""
    lines.append(
        f"Select an item to view{page_info} - {len(items)} total items:"
    )
    for i, it in enumerate(current):
        pub = f" ({locale_date(it.published_date)})" if it.published_date else ""
        lines.append(f"{start + i + 1}. {it.title}{pub}")
    if total_pages > 1:
        lines.append(SEPARATOR_LINE)
        if page > 0:
            lines.append(f"<< Previous page ({page}/{total_pages})  [p]")
        if page < total_pages - 1:
            lines.append(f"Next page ({page + 2}/{total_pages}) >>  [n]")
    lines.append(f"{BACK_LABEL}  [b]")
    return lines


def render_item(it: ViewerItem) -> str:
    """The stored-content document the reference opens (<hash>.json in the
    content dir): title/url/date metadata + the markdown payload."""
    return json.dumps(
        {
            "title": it.title,
            "url": it.url,
            "publishedDate": (
                it.published_date.isoformat() if it.published_date else None
            ),
            "hash": it.hash,
            "content": it.content,
        },
        indent=2,
        ensure_ascii=False,
    )


def open_in_pager(text: str, print_fn=print) -> None:
    """less -R when available on a tty; reference fallback message else."""
    if shutil.which("less") and sys.stdout.isatty():  # pragma: no cover - tty
        subprocess.run(["less", "-R"], input=text.encode("utf-8"))
        return
    print_fn("Less viewer not available. Please install 'less' to view files.")
    print_fn(text)


def run_viewer(
    items: list[ViewerItem],
    input_fn=input,
    print_fn=print,
    pager=open_in_pager,
) -> None:
    """The paginated select loop (viewer.ts showPaginatedViewer): number →
    view item then return to the SAME page; n/p → page nav; b/q → back."""
    if not items:
        print_fn("No stored files found.")
        return
    total_pages = max(1, -(-len(items) // ITEMS_PER_PAGE))
    page = 0
    while True:
        for line in page_lines(items, page):
            print_fn(line)
        try:
            cmd = input_fn("> ").strip().lower()
        except EOFError:
            return
        if cmd in ("b", "q", "back", ""):
            return
        if cmd in ("n", "next") and page < total_pages - 1:
            page += 1
            continue
        if cmd in ("p", "prev") and page > 0:
            page -= 1
            continue
        if cmd.isdigit() and 1 <= int(cmd) <= len(items):
            pager(render_item(items[int(cmd) - 1]), print_fn)
            continue
        print_fn(f"Unrecognized option: {cmd}")

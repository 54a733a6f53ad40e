"""Post-crawl summary block parity (reference src/ui/summary.ts:4-82):
line formats, conditional sublines, stop-reason message map, toFixed(2)
percentages, optional label on listing stats only."""

from ethos_spark.crawl.runner import CrawlSummary
from ethos_spark.ui.summary import render_crawl_summary


def _summary(**kw):
    base = dict(session_id="s1", source_id="src_x")
    base.update(kw)
    return CrawlSummary(**base)


def _fs(name, ok, att, opt=False):
    return {
        "field_name": name,
        "success_count": ok,
        "total_attempts": att,
        "is_optional": opt,
    }


def test_full_block_format():
    s = _summary(
        items_processed=7,
        duplicates_skipped=2,
        total_filtered=1,
        contents_crawled=7,
        pages_processed=3,
        urls_excluded=4,
        items_with_errors=2,
        listing_error_messages=["l1"],
        content_error_messages=["c1", "c2"],
        stopped_reason="no_next_button",
        wall_sec=1.5,
    )
    got = render_crawl_summary(
        s,
        "Synthetic News",
        [_fs("title", 9, 10), _fs("author", 1, 3, opt=True)],
        [_fs("content", 7, 8)],
    )
    assert got.splitlines() == [
        "Summary:",
        "  Source: Synthetic News (src_x)",
        "  Items found: 10",  # processed + dups + filtered (summaryBuilder)
        "  Items successfully retrieved: 7",
        "  Items with errors: 2",
        "    Listing extraction errors: 1",
        "    Content extraction errors: 2",
        "  Listing pages processed: 3",
        "  Duplicates skipped: 2",
        "  URLs excluded: 4",
        "  Stop reason: no more pages available",
        "",
        "Listing field extraction stats:",
        "  title: 9/10 (90.00%)",
        "  author: 1/3 (33.33%) (optional)",
        "",
        "Content field extraction stats:",
        "  content: 7/8 (87.50%)",
        "",
        "Crawl took: 1.5 seconds",
    ]


def test_conditional_lines_absent_when_zero():
    s = _summary(items_processed=5, contents_crawled=5, pages_processed=1)
    got = render_crawl_summary(s, "X", [_fs("url", 5, 5)])
    assert "Items with errors" not in got
    assert "Duplicates skipped" not in got
    assert "URLs excluded" not in got
    assert "Stop reason" not in got
    assert "Content field extraction stats" not in got


def test_zero_attempts_prints_bare_zero_like_toFixed_branch():
    s = _summary(pages_processed=1)
    got = render_crawl_summary(s, "X", [_fs("date", 0, 0)])
    assert "  date: 0/0 (0%)" in got


def test_interrupt_reason_message():
    s = _summary(stopped_reason="process_interrupted", pages_processed=1)
    got = render_crawl_summary(s, "X", [])
    assert "  Stop reason: process was interrupted" in got

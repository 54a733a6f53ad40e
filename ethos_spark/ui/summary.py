"""Post-crawl summary block — parity with the reference's
``displayCrawlSummary`` (src/ui/summary.ts:4-82): same lines, same
conditionals (error sublines only when nonzero, stop-reason message map,
``(optional)`` suffix on listing stats only), percentages with two
decimals via toFixed semantics, content-stage stats in their own section.
Rendered as a string so the CLI prints it and tests assert it verbatim.
"""

from __future__ import annotations

from typing import Mapping, Sequence

STOP_REASON_MESSAGES = {
    "max_pages": "reached maximum pages limit",
    "no_next_button": "no more pages available",
    "all_duplicates": "all items on page were already crawled",
    "process_interrupted": "process was interrupted",
}


def _pct(ok: int, att: int) -> str:
    # toFixed(2) of (ok/att*100); the reference prints bare 0 when att==0
    return f"{ok / att * 100:.2f}" if att > 0 else "0"


def _stat_line(s: Mapping, optional_label: bool) -> str:
    opt = " (optional)" if optional_label and s.get("is_optional") else ""
    return (
        f"  {s['field_name']}: {s['success_count']}/{s['total_attempts']}"
        f" ({_pct(s['success_count'], s['total_attempts'])}%){opt}"
    )


def render_crawl_summary(
    summary,
    source_name: str,
    listing_stats: Sequence[Mapping] = (),
    content_stats: Sequence[Mapping] = (),
) -> str:
    """summary: CrawlSummary; listing/content_stats: field_stats rows
    (dict-likes) aggregated per field for this session."""
    out = ["Summary:"]
    out.append(f"  Source: {source_name} ({summary.source_id})")
    out.append(f"  Items found: {summary.items_found}")
    out.append(f"  Items successfully retrieved: {summary.items_processed}")
    if summary.items_with_errors > 0:
        out.append(f"  Items with errors: {summary.items_with_errors}")
        n_l = len(summary.listing_error_messages or [])
        n_c = len(summary.content_error_messages or [])
        if n_l > 0:
            out.append(f"    Listing extraction errors: {n_l}")
        if n_c > 0:
            out.append(f"    Content extraction errors: {n_c}")
    out.append(f"  Listing pages processed: {summary.pages_processed}")
    if summary.duplicates_skipped > 0:
        out.append(f"  Duplicates skipped: {summary.duplicates_skipped}")
    if summary.urls_excluded > 0:
        out.append(f"  URLs excluded: {summary.urls_excluded}")
    if summary.stopped_reason:
        msg = STOP_REASON_MESSAGES.get(
            summary.stopped_reason, summary.stopped_reason
        )
        out.append(f"  Stop reason: {msg}")
    out.append("")
    out.append("Listing field extraction stats:")
    for s in listing_stats:
        out.append(_stat_line(s, optional_label=True))
    if content_stats:
        out.append("")
        out.append("Content field extraction stats:")
        for s in content_stats:
            out.append(_stat_line(s, optional_label=False))
    out.append("")
    out.append(f"Crawl took: {summary.wall_sec} seconds")
    return "\n".join(out)

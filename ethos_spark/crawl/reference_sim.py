"""Sequential reference simulator: the Ethos crawl loop, faithfully.

This is NOT part of the engine. It is the executable specification the
distributed engine is tested against (north_rule: "matching the reference's
crawl ordering and URL-seen set under the same seed list + politeness
budget"). It mirrors, step for step:

- page loop + stop conditions       ArticleListingCrawler.ts:247-340
- processPageItems counter flow     ArticleListingCrawler.ts:41-104
- session seen-set dedup            UrlFilter.ts:23-37
- persistent-store dedup            ContentMetadataStore.ts:189-210
- content extraction + error flag   ContentPageExtractor.ts / ContentDataMapper.ts
- processed_order at store time     ProcessingPipeline.ts:87-94, MetadataTracker.ts:333-347
- summary arithmetic                summaryBuilder.ts:26-29

Runs over any url→html mapping (the synthetic corpus), one source at a time.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from ethos_spark.extraction.content import extract_content_fields
from ethos_spark.extraction.listing import extract_listing_items
from ethos_spark.functions.datefns import parse_published_date
from ethos_spark.functions.urlfns import sha1_hex
from ethos_spark.sources.config import SourceConfig


@dataclass
class SimItem:
    url: str
    title: str
    author: str | None
    published_date: str | None  # ISO
    content: str | None
    processed_order: int
    had_content_extraction_error: bool


@dataclass
class SimResult:
    items: list[SimItem] = field(default_factory=list)
    pages_processed: int = 0
    items_processed: int = 0
    duplicates_skipped: int = 0
    urls_excluded: int = 0
    total_filtered: int = 0
    contents_crawled: int = 0
    stopped_reason: str = ""
    seen_urls: set[str] = field(default_factory=set)

    @property
    def items_found(self) -> int:
        # summaryBuilder.ts:26-29
        return self.items_processed + self.duplicates_skipped + self.total_filtered

    @property
    def seen_hashes(self) -> set[str]:
        return {sha1_hex(u) for u in self.seen_urls}


def simulate_crawl(
    corpus: dict[str, str],
    config: SourceConfig,
    max_pages: int | None = None,
    stop_on_all_duplicates: bool = True,
    skip_existing_urls: bool = True,
    existing_urls: set[str] | None = None,
) -> SimResult:
    """Crawl ``config.listing.url`` through the corpus exactly as the
    reference's single-process loop would."""
    existing = set(existing_urls or ())
    r = SimResult()
    seen: set[str] = set()  # session seen-set (ArticleListingCrawler.ts:244)
    page_url: str | None = config.listing.url
    processed_order = 0

    while True:
        html = corpus.get(page_url or "")
        if html is None:
            # navigation failure on first page = crawl error; afterwards the
            # pagination handler returns false → NO_NEXT_BUTTON
            r.stopped_reason = "no_next_button"
            break

        page = extract_listing_items(html, config.listing, page_url)
        page_items = page["items"]

        # counter flow of processPageItems (ArticleListingCrawler.ts:58-66)
        r.urls_excluded += len(page["excluded_urls"])
        # filteredCount in the tracker = ALL filtered containers incl.
        # excluded ones (filteredItems.length at ListingPageExtractor.ts:230-235)
        r.total_filtered += page["filtered_count"] + len(page["excluded_urls"])

        # session dedup, insertion-order preserving (UrlFilter.ts:23-37)
        new_items = []
        for it in page_items:
            if it["url"] not in seen:
                seen.add(it["url"])
                new_items.append(it)
        r.duplicates_skipped += len(page_items) - len(new_items)

        # persistent dedup (ContentMetadataStore.ts:189-210)
        if skip_existing_urls:
            items_to_process = [it for it in new_items if it["url"] not in existing]
            r.duplicates_skipped += len(new_items) - len(items_to_process)
        else:
            items_to_process = list(new_items)

        # all-duplicates early stop (ArticleListingCrawler.ts:260-286):
        # fires BEFORE pagesProcessed increments
        if page_items and not items_to_process and stop_on_all_duplicates:
            r.stopped_reason = "all_duplicates"
            break

        # content fan-out: fetch each article page, extract, flag errors
        for it in items_to_process:
            listing_date_iso = (
                parse_published_date(it["published_raw"])
                if it["published_raw"]
                else None
            )
            content_html = corpus.get(it["url"])
            item = SimItem(
                url=it["url"],
                title=it["title"] or "",
                author=it["author"],
                published_date=listing_date_iso,
                content=None,
                processed_order=0,
                had_content_extraction_error=False,
            )
            if content_html is None:
                item.had_content_extraction_error = True
            else:
                fields = extract_content_fields(
                    content_html, config.content, it["url"]
                )
                # mergeContentData: content overrides listing where present
                if fields.get("title"):
                    item.title = fields["title"]
                if fields.get("content"):
                    item.content = fields["content"]
                if fields.get("author"):
                    item.author = fields["author"]
                if fields["_errors"]:
                    item.had_content_extraction_error = True
            existing.add(item.url)
            processed_order += 1
            item.processed_order = processed_order
            r.items.append(item)

        r.contents_crawled += len(items_to_process)
        r.items_processed += len(items_to_process)
        r.pages_processed += 1

        if max_pages and r.pages_processed >= max_pages:
            r.stopped_reason = "max_pages"
            break

        next_url = page["next_url"]
        if not next_url or next_url not in corpus:
            r.stopped_reason = "no_next_button"
            break
        page_url = next_url

    r.seen_urls = seen
    return r


def build_corpus(n_hosts: int, total_articles: int) -> dict[str, str]:
    """Materialize the synthetic corpus as url→html (driver-side, small
    scales only — tests)."""
    from ethos_spark import synth

    counts = synth.zipf_article_counts(n_hosts, total_articles)
    corpus: dict[str, str] = {}
    for h, c in enumerate(counts):
        for i in range(c):
            corpus[synth.article_url(h, i)] = synth.article_html(h, i)
        for p in range(1, synth.n_listing_pages(c) + 1):
            corpus[synth.listing_url(h, p)] = synth.listing_html(h, p, c)
    return corpus

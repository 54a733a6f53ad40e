"""Declarative crawl-source configs (the reference's ``SourceConfig``).

Mirrors src/core/types.ts:25-60 (FieldConfig/PaginationConfig/ListingConfig/
ContentConfig/SourceConfig). ``should_exclude_item`` closures from the
per-source TS modules (access_now.ts:14-23, electronic_frontier_foundation.ts
:13-22) become *declarative* exclusion rules here — marker substrings over the
container HTML + URL path substrings — so the whole predicate compiles to
vectorized logic inside the extraction UDF (and is also expressible as pure
Column expressions for the oracle path).
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class FieldConfig:
    selector: str
    attribute: str  # text | href | src | node | <attr-name>
    optional: bool = False
    exclude_selectors: tuple[str, ...] = ()


@dataclass(frozen=True)
class PaginationConfig:
    next_button_selector: str | None = None
    delay_sec: float = 1.0  # PaginationHandler.ts:7 default


@dataclass(frozen=True)
class ExclusionRules:
    """Declarative ``shouldExcludeItem``: exclude when container HTML contains
    any marker OR the extracted url contains any path substring."""

    container_markers: tuple[str, ...] = ()
    url_substrings: tuple[str, ...] = ()

    def matches(self, container_html: str, url: str | None) -> bool:
        if any(m in container_html for m in self.container_markers):
            return True
        if url and any(s in url for s in self.url_substrings):
            return True
        return False


@dataclass(frozen=True)
class ListingConfig:
    url: str
    container_selector: str
    fields: dict[str, FieldConfig]
    pagination: PaginationConfig = field(default_factory=PaginationConfig)
    exclusions: ExclusionRules = field(default_factory=ExclusionRules)


@dataclass(frozen=True)
class ContentConfig:
    container_selector: str
    fields: dict[str, FieldConfig]


@dataclass(frozen=True)
class SourceConfig:
    id: str
    name: str
    listing: ListingConfig
    content: ContentConfig
    # politeness (north_rule): max content fetches per host per round and
    # per-source delay analogue (access_now.ts:11 delaySec=30)
    max_per_host_per_round: int = 8  # HIGH_PERFORMANCE_LIMIT, constants.ts:16-21


# ---------------------------------------------------------------------------
# The synthetic source family used by synth.py + tests. Selector shapes chosen
# to exercise the same extraction features as the reference's real sources.
# ---------------------------------------------------------------------------

SYNTH_SOURCE = SourceConfig(
    id="synthetic_news",
    name="Synthetic News",
    listing=ListingConfig(
        url="https://news-0.example.org/list/1",
        container_selector=".post-list .post-item",
        fields={
            "title": FieldConfig(".post-title", "text"),
            "url": FieldConfig(".post-link", "href"),
            "publishedDate": FieldConfig(".post-date", "text"),
            "author": FieldConfig(".post-author", "text", optional=True),
        },
        pagination=PaginationConfig(next_button_selector=".pagination a.next"),
        exclusions=ExclusionRules(
            container_markers=("post-item--external",),
            url_substrings=("/press-release/", "/guide/"),
        ),
    ),
    content=ContentConfig(
        container_selector="#main",
        fields={
            "title": FieldConfig("header h1", "text", optional=True),
            "content": FieldConfig(
                ".article-body", "node", exclude_selectors=(".share", ".related")
            ),
            "author": FieldConfig(".byline", "text", optional=True),
        },
    ),
)

SOURCES: dict[str, SourceConfig] = {SYNTH_SOURCE.id: SYNTH_SOURCE}

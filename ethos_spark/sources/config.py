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

# ---------------------------------------------------------------------------
# The reference's real source registry (src/config/sources/index.ts:10-18),
# re-declared. Selector strings are the reference's own (public config data);
# the imperative shouldExcludeItem closures become declarative rules.
# In-sandbox these run against per-source synthetic fixtures shaped to the
# same selector families (tests/test_reference_sources.py); on a real deploy
# they run against the live sites through an HttpFetcher.
# ---------------------------------------------------------------------------

ACCESS_NOW = SourceConfig(
    id="access_now",
    name="Access Now",
    listing=ListingConfig(
        url="https://www.accessnow.org/news-updates/?_language=english",
        container_selector=".post-grid.facetwp-template .post-grid-item",
        fields={
            "title": FieldConfig(".post-grid-item--title", "text"),
            "url": FieldConfig(".post-grid-item--link", "href"),
            "publishedDate": FieldConfig(".post-grid-item--date", "text"),
        },
        pagination=PaginationConfig(
            ".post-grid-pagination .facetwp-page.next", delay_sec=30.0
        ),  # access_now.ts:11 — aggressive-crawl block
        exclusions=ExclusionRules(
            container_markers=("post-grid-item--external-icon",),
            url_substrings=("accessnow.org/press-release", "accessnow.org/guide"),
        ),  # access_now.ts:14-23
    ),
    content=ContentConfig(
        container_selector="#post-container",
        fields={
            "title": FieldConfig("header h1", "text", optional=True),
            "content": FieldConfig(".entry-content", "node"),
            "author": FieldConfig(
                "#authors", "text", optional=True,
                exclude_selectors=(".profilePic", ".authorInfo > a"),
            ),
        },
    ),
)

EFF = SourceConfig(
    id="electronic_frontier_foundation",
    name="Electronic Frontier Foundation",
    listing=ListingConfig(
        url="https://eff.org/updates",
        container_selector=".views-row article.node",
        fields={
            "title": FieldConfig(".node__title", "text"),
            "url": FieldConfig(".node__title a", "href"),
            "publishedDate": FieldConfig(".node-date", "text"),
            "author": FieldConfig(".node-author", "text", optional=True),
        },
        pagination=PaginationConfig(".pager__item.pager__item--next a"),
        exclusions=ExclusionRules(
            url_substrings=(
                "eff.org/event/", "eff.org/wp/", "eff.org/cases/",
                "eff.org/calendar/",
            )
        ),  # electronic_frontier_foundation.ts:13-22
    ),
    content=ContentConfig(
        container_selector="#main-content",
        fields={
            "title": FieldConfig(".pane-page-title h1", "text", optional=True),
            "content": FieldConfig(
                ".node--full", "node",
                exclude_selectors=(".take-action", ".field--type-file"),
            ),
        },
    ),
)

TORRENT_FREAK = SourceConfig(
    id="torrent_freak",
    name="TorrentFreak",
    listing=ListingConfig(
        url="https://torrentfreak.com/",
        container_selector=".page__content .preview-article",
        fields={
            "title": FieldConfig(".preview-article__title", "text"),
            "url": FieldConfig("& > a", "href"),  # torrent_freak.ts:18-21
            "publishedDate": FieldConfig(
                ".preview-article__published time", "text"
            ),
        },
        pagination=PaginationConfig(".page__navigation .navigation__link.next"),
    ),
    content=ContentConfig(
        container_selector="main",
        fields={
            "title": FieldConfig(".hero__title", "text", optional=True),
            "content": FieldConfig(".article .article__body", "node"),
            "author": FieldConfig(
                ".hero__published", "text", optional=True,
                exclude_selectors=("time",),
            ),
        },
    ),
)

DECLASSIFIED_UK = SourceConfig(
    id="declassified_uk",
    name="Declassified UK",
    listing=ListingConfig(
        url="https://www.declassifieduk.org/category/archive/",
        container_selector=".blog-with-tags.ls-archive-blog .et_pb_post",
        fields={
            "title": FieldConfig(".entry-title", "text"),
            "url": FieldConfig(".entry-title a", "href"),
            "publishedDate": FieldConfig(".post-meta .published", "text"),
        },
        pagination=PaginationConfig(".wp-pagenavi .nextpostslink"),
    ),
    content=ContentConfig(
        container_selector="#main-content",
        fields={
            "title": FieldConfig(".entry-title", "text", optional=True),
            "content": FieldConfig(
                ".et_pb_post_content", "node",
                exclude_selectors=(
                    ".wp-block-buttons", ".wp-block-separator", ".related-post",
                ),
            ),
            "author": FieldConfig(
                ".ls_co_authors", "text", optional=True,
                exclude_selectors=(".ls-date",),
            ),
        },
    ),
)

FREEDOM_PRESS = SourceConfig(
    id="freedom_press_foundation",
    name="Freedom of the Press Foundation",
    listing=ListingConfig(
        url="https://freedom.press/issues/",
        container_selector=".article-list .card-listing",
        fields={
            "title": FieldConfig(".heading .card-link", "text"),
            "url": FieldConfig(".heading .card-link", "href"),
            # datetime attribute extraction (freedom_press_foundation.ts)
            "publishedDate": FieldConfig(".meta-info time", "datetime"),
            "author": FieldConfig(
                ".meta-info .card-meta-link:not(:nth-child(1))",
                "text",
                optional=True,
            ),
        },
        pagination=PaginationConfig(
            ".pagination .pagination-link:nth-of-type(2)"
        ),
    ),
    content=ContentConfig(
        container_selector=".blog-page",
        fields={
            "title": FieldConfig("h1.heading", "text", optional=True),
            "content": FieldConfig(
                ".post-content", "node",
                exclude_selectors=(".form.newsletter-signup",),
            ),
        },
    ),
)

LOGOS_PRESS = SourceConfig(
    id="logos_press_engine",
    name="Logos Press Engine",
    listing=ListingConfig(
        url="https://press.logos.co/search?type=article",
        container_selector=".section .post-card",
        fields={
            "title": FieldConfig(".post-card__title", "text"),
            "url": FieldConfig(".post-card__title", "href"),
            "publishedDate": FieldConfig(
                ".post-card__label span:nth-of-type(2)", "text"
            ),
        },
        pagination=PaginationConfig(None),  # logos_press_engine.ts: ""
    ),
    content=ContentConfig(
        container_selector="main article",
        fields={
            "title": FieldConfig("header h1", "text", optional=True),
            # empty selector = the container itself, minus excluded subtrees
            # (logos_press_engine.ts:36-41)
            "content": FieldConfig(
                "", "node", exclude_selectors=("header", "div", "span")
            ),
            "author": FieldConfig("header div > p", "text"),
        },
    ),
)

P2P_FOUNDATION = SourceConfig(
    id="p2p_foundation",
    name="P2P Foundation",
    listing=ListingConfig(
        url="https://blog.p2pfoundation.net/",
        container_selector=".blog-masonry article",
        fields={
            "title": FieldConfig(".entry-title", "text"),
            "url": FieldConfig(".entry-title a", "href"),
            "publishedDate": FieldConfig(".entry-date", "text"),
        },
        pagination=PaginationConfig(".nav-previous a"),
    ),
    content=ContentConfig(
        container_selector="#main",
        fields={
            "title": FieldConfig(
                ".entry-header .entry-title", "text", optional=True
            ),
            "content": FieldConfig("article.post .entry-content", "node"),
            "author": FieldConfig(
                ".entry-header .author", "text",
                exclude_selectors=(".pw-icon-user-outline",),
            ),
        },
    ),
)

SOURCES: dict[str, SourceConfig] = {
    s.id: s
    for s in (
        SYNTH_SOURCE, ACCESS_NOW, EFF, TORRENT_FREAK, DECLASSIFIED_UK,
        FREEDOM_PRESS, LOGOS_PRESS, P2P_FOUNDATION,
    )
}

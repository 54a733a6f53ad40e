"""Per-source extraction fixtures: synthetic HTML shaped to each reference
source's selector family must extract the expected fields — the in-sandbox
stand-in for the reference's 7 live-site integration suites
(src/tests/integration/*, 26 golden fixtures)."""

import pytest

from ethos_spark.extraction.content import extract_content_fields
from ethos_spark.extraction.listing import extract_listing_items
from ethos_spark.sources.config import SOURCES


LISTING_FIXTURES = {
    "access_now": (
        """
        <div class="post-grid facetwp-template">
          <div class="post-grid-item">
            <span class="post-grid-item--title"> Real story </span>
            <a class="post-grid-item--link" href="https://www.accessnow.org/real-story/">go</a>
            <span class="post-grid-item--date">July 10, 2025</span>
          </div>
          <div class="post-grid-item post-grid-item--external-icon">
            <span class="post-grid-item--title">External</span>
            <a class="post-grid-item--link" href="https://elsewhere.org/x">go</a>
            <span class="post-grid-item--date">July 9, 2025</span>
          </div>
          <div class="post-grid-item">
            <span class="post-grid-item--title">PR</span>
            <a class="post-grid-item--link" href="https://www.accessnow.org/press-release/p1/">go</a>
            <span class="post-grid-item--date">July 8, 2025</span>
          </div>
        </div>
        <div class="post-grid-pagination"><a class="facetwp-page next" href="/page/2">»</a></div>
        """,
        {"items": [("Real story", "https://www.accessnow.org/real-story/")],
         "excluded": 2, "next": True},
    ),
    "electronic_frontier_foundation": (
        """
        <div class="views-row"><article class="node">
          <h2 class="node__title"><a href="/deeplinks/2025/a1">EFF post</a></h2>
          <span class="node-date">10 July 2025</span>
          <span class="node-author">By EFF Staff</span>
        </article></div>
        <div class="views-row"><article class="node">
          <h2 class="node__title"><a href="https://eff.org/event/meetup">Event</a></h2>
          <span class="node-date">9 July 2025</span>
        </article></div>
        <ul><li class="pager__item pager__item--next"><a href="?page=1">next</a></li></ul>
        """,
        {"items": [("EFF post", "https://eff.org/deeplinks/2025/a1")],
         "excluded": 1, "next": True},
    ),
    "torrent_freak": (
        """
        <div class="page__content">
          <div class="preview-article">
            <a href="https://torrentfreak.com/story-250710/">
              <h3 class="preview-article__title">TF story</h3>
            </a>
            <div class="preview-article__published"><time>July 10, 2025</time></div>
          </div>
        </div>
        <div class="page__navigation"><a class="navigation__link next" href="/page/2/">next</a></div>
        """,
        {"items": [("TF story", "https://torrentfreak.com/story-250710/")],
         "excluded": 0, "next": True},
    ),
    "declassified_uk": (
        """
        <div class="blog-with-tags ls-archive-blog">
          <article class="et_pb_post">
            <h2 class="entry-title"><a href="https://www.declassifieduk.org/a1/">DCUK story</a></h2>
            <p class="post-meta"><span class="published">10 July 2025</span></p>
          </article>
        </div>
        <div class="wp-pagenavi"><a class="nextpostslink" href="/category/archive/page/2/">»</a></div>
        """,
        {"items": [("DCUK story", "https://www.declassifieduk.org/a1/")],
         "excluded": 0, "next": True},
    ),
    "freedom_press_foundation": (
        """
        <div class="article-list">
          <div class="card-listing">
            <h3 class="heading"><a class="card-link" href="/issues/a1/">FPF story</a></h3>
            <div class="meta-info">
              <time datetime="2025-07-10T00:00:00Z">July 10</time>
              <a class="card-meta-link">Category</a>
              <a class="card-meta-link">Jane Writer</a>
            </div>
          </div>
        </div>
        <nav class="pagination"><a class="pagination-link">1</a><a class="pagination-link" href="/issues/?page=2">2</a></nav>
        """,
        {"items": [("FPF story", "https://freedom.press/issues/a1/")],
         "excluded": 0, "next": True},
    ),
}

LISTING_FIXTURES["logos_press_engine"] = (
    """
    <div class="section">
      <div class="post-card">
        <a class="post-card__title" href="/a-post">Logos story</a>
        <div class="post-card__label"><span>Article</span><span>10 July 2025</span></div>
      </div>
    </div>
    """,
    {"items": [("Logos story", "https://press.logos.co/a-post")],
     "excluded": 0, "next": False},
)
LISTING_FIXTURES["p2p_foundation"] = (
    """
    <div class="blog-masonry">
      <article>
        <h2 class="entry-title"><a href="https://blog.p2pfoundation.net/a1">P2P story</a></h2>
        <span class="entry-date">10 July 2025</span>
      </article>
    </div>
    <div class="nav-previous"><a href="/page/2">older</a></div>
    """,
    {"items": [("P2P story", "https://blog.p2pfoundation.net/a1")],
     "excluded": 0, "next": True},
)

CONTENT_FIXTURES = {
    "access_now": (
        """
        <div id="post-container">
          <header><h1> AN title </h1></header>
          <div id="authors"><img class="profilePic" src="/p.png">
            <div class="authorInfo"><a href="/u/1">profile</a></div> Ada Author </div>
          <div class="entry-content"><p>Body <strong>text</strong>.</p></div>
        </div>
        """,
        {"title": "AN title", "author": "Ada Author", "content": "Body **text**."},
    ),
    "electronic_frontier_foundation": (
        """
        <div id="main-content">
          <div class="pane-page-title"><h1>EFF title</h1></div>
          <div class="node--full"><p>Keep this.</p>
            <div class="take-action">ACT NOW</div>
            <div class="field--type-file">download.pdf</div>
          </div>
        </div>
        """,
        {"title": "EFF title", "author": None, "content": "Keep this."},
    ),
    "torrent_freak": (
        """
        <main>
          <h1 class="hero__title">TF title</h1>
          <div class="hero__published"><time>July 10, 2025</time> by Andy M </div>
          <div class="article"><div class="article__body"><p>TF body.</p></div></div>
        </main>
        """,
        {"title": "TF title", "author": "by Andy M", "content": "TF body."},
    ),
    "declassified_uk": (
        """
        <div id="main-content">
          <h1 class="entry-title">DCUK title</h1>
          <div class="ls_co_authors">Phil Miller <span class="ls-date">10 July</span></div>
          <div class="et_pb_post_content"><p>DCUK body.</p>
            <div class="wp-block-buttons">DONATE</div>
            <hr class="wp-block-separator">
            <div class="related-post">related</div>
          </div>
        </div>
        """,
        {"title": "DCUK title", "author": "Phil Miller", "content": "DCUK body."},
    ),
    "freedom_press_foundation": (
        """
        <div class="blog-page">
          <h1 class="heading">FPF title</h1>
          <div class="post-content"><p>FPF body.</p>
            <div class="form newsletter-signup">SIGN UP</div>
          </div>
        </div>
        """,
        {"title": "FPF title", "author": None, "content": "FPF body."},
    ),
}


CONTENT_FIXTURES["logos_press_engine"] = (
    """
    <main><article>
      <header><h1>Logos title</h1><div><p>Logos Writer</p></div></header>
      <div class="sidebar">nav junk</div>
      <p>Logos body.</p>
      <span>share</span>
    </article></main>
    """,
    {"title": "Logos title", "author": "Logos Writer", "content": "Logos body."},
)
CONTENT_FIXTURES["p2p_foundation"] = (
    """
    <div id="main">
      <div class="entry-header"><h1 class="entry-title">P2P title</h1>
        <span class="author"><i class="pw-icon-user-outline"></i>Michel B</span></div>
      <article class="post"><div class="entry-content"><p>P2P body.</p></div></article>
    </div>
    """,
    {"title": "P2P title", "author": "Michel B", "content": "P2P body."},
)


@pytest.mark.parametrize("source_id", sorted(LISTING_FIXTURES))
def test_listing_extraction(source_id):
    cfg = SOURCES[source_id]
    html, want = LISTING_FIXTURES[source_id]
    r = extract_listing_items(html, cfg.listing, cfg.listing.url)
    got = [(i["title"], i["url"]) for i in r["items"]]
    assert got == want["items"]
    assert len(r["excluded_urls"]) + r["filtered_count"] == want["excluded"]
    assert (r["next_url"] is not None) == want["next"]
    for item in r["items"]:
        assert item["published_raw"]


@pytest.mark.parametrize("source_id", sorted(CONTENT_FIXTURES))
def test_content_extraction(source_id):
    cfg = SOURCES[source_id]
    html, want = CONTENT_FIXTURES[source_id]
    f = extract_content_fields(html, cfg.content)
    assert f.get("title") == want["title"]
    assert f.get("author") == want["author"]
    assert f.get("content") == want["content"]
    assert f["_errors"] == []

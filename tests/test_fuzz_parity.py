"""Property-based cross-implementation parity (hypothesis).

The crawl's correctness hinges on three pure kernels agreeing across
independent implementations; example tables pin known cases, these fuzz
the space between them:

- JVM url canonicalization (CrawlRunner._with_url_cols Column exprs) ==
  Python ``canonicalize_url`` on arbitrary well-formed http(s) URLs —
  a disagreement silently splits/merges seen-set identities.
- Spark ``h56`` (conv/substring/md5 Column path) == the documented
  ``int(md5[:14], 16)`` definition — every dedup/sampling oracle keys
  on this equality.
- html→markdown never raises and always returns str on arbitrary tag
  soup (the extractor feeds it uncurated web HTML).
"""

import hashlib

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from ethos_spark.functions.markdown import html_to_markdown
from ethos_spark.functions.urlfns import canonicalize_url
from ethos_spark.session import get_spark


@pytest.fixture(scope="module")
def spark():
    s = get_spark("test-fuzz", master="local[2]", shuffle_partitions=2)
    yield s
    s.stop()


# -- URL generation: the resolved-absolute-URL domain the crawler feeds ----

_label = st.text("abcDEFgh23-", min_size=1, max_size=8).filter(
    lambda s: not s.startswith("-") and not s.endswith("-")
)
_seg = st.text("abcXY09._~%-", min_size=0, max_size=6)
_kv = st.tuples(
    st.text("abkZ09", min_size=1, max_size=4), st.text("xyQ78._", min_size=0, max_size=4)
)


@st.composite
def _urls(draw):
    scheme = draw(st.sampled_from(["http", "https", "HTTP", "Https"]))
    host = ".".join(draw(st.lists(_label, min_size=1, max_size=3)))
    user = draw(st.sampled_from(["", "", "", "bob@", "a:b@"]))
    port = draw(
        st.sampled_from(["", "", ":80", ":443", ":8080", ":1", ":65535"])
    )
    path = "".join("/" + draw(_seg) for _ in range(draw(st.integers(0, 3))))
    q = draw(st.lists(_kv, min_size=0, max_size=4))
    query = "?" + "&".join(f"{k}={v}" for k, v in q) if q else draw(
        st.sampled_from(["", "", "?"])
    )
    frag = draw(st.sampled_from(["", "", "#x", "#sec?a=1"]))
    return f"{scheme}://{user}{host}{port}{path}{query}{frag}"


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(st.lists(_urls(), min_size=20, max_size=60))
def test_jvm_canon_equals_python(spark, urls):
    from ethos_spark.crawl.runner import CrawlRunner

    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = {
        r.url: r.url_canon
        for r in CrawlRunner._with_url_cols(df).collect()
    }
    for u in urls:
        assert got[u] == canonicalize_url(u), u


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    st.lists(
        st.text(min_size=0, max_size=40).filter(lambda s: "\x00" not in s),
        min_size=10,
        max_size=40,
    )
)
def test_h56_equals_definition(spark, texts):
    import pyspark.sql.functions as F

    from ethos_spark.ops.dedup import h56

    df = spark.createDataFrame([(t,) for t in set(texts)], "t string")
    got = {r.t: r.h for r in df.select("t", h56(F.col("t")).alias("h")).collect()}
    for t in set(texts):
        assert got[t] == int(hashlib.md5(t.encode("utf-8")).hexdigest()[:14], 16)


# -- markdown robustness on tag soup ---------------------------------------

_tag = st.sampled_from(
    "p div span h1 h2 li ul ol a em strong code pre br hr img table tr td "
    "blockquote figure script style".split()
)


@st.composite
def _soup(draw, depth=0):
    if depth > 3 or draw(st.booleans()):
        return draw(st.text("ab *_`#[]()<>&;\n\t-", max_size=20))
    t = draw(_tag)
    inner = "".join(
        draw(_soup(depth + 1)) for _ in range(draw(st.integers(0, 3)))
    )
    attrs = draw(st.sampled_from(["", "", ' href="x"', ' class="c" id=1', " src='y'"]))
    closed = draw(st.sampled_from(["full", "full", "open", "self"]))
    if closed == "self":
        return f"<{t}{attrs}/>{inner}"
    if closed == "open":
        return f"<{t}{attrs}>{inner}"
    return f"<{t}{attrs}>{inner}</{t}>"


@settings(max_examples=200, deadline=None)
@given(_soup())
def test_markdown_total_on_tag_soup(html):
    out = html_to_markdown(html)
    assert out is None or isinstance(out, str)

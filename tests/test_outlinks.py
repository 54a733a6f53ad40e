"""Generic outlink extraction (extraction/outlinks.py): DOM anchor walk,
lenient resolution, canonicalization, and the host link-graph rollup."""

import pytest
import pyspark.sql.functions as F

from ethos_spark.extraction.outlinks import (
    extract_outlinks,
    extract_page_outlinks,
    host_link_graph,
)
from ethos_spark.session import get_spark


def test_kernel_resolution_and_canon():
    html = (
        "<html><body>"
        '<a href="https://B.Example.org/x?b=2&amp;a=1">q</a>'
        '<a href="/abs/path">p</a>'
        '<a href="rel/child">c</a>'
        '<a href="#frag">skip</a>'
        "<a>no href</a>"
        '<a href="  ">blank</a>'
        '<div><a href="../sib">nested</a></div>'
        "</body></html>"
    )
    got = extract_page_outlinks("https://host.org/dir/page.html", html)
    assert got == [
        # entity-decoded, host lowercased, query params sorted
        ("https://B.Example.org/x?b=2&a=1", "https://b.example.org/x?a=1&b=2"),
        ("/abs/path", "https://host.org/abs/path"),
        ("rel/child", "https://host.org/dir/rel/child"),
        ("../sib", "https://host.org/sib"),
    ]


def test_spark_explode_and_host_graph():
    spark = get_spark("test-outlinks", master="local[2]", shuffle_partitions=2)
    rows = [
        (
            "https://a.org/1",
            b'<a href="https://b.org/x">1</a><a href="https://b.org/y">2</a>'
            b'<a href="/self">3</a>',
        ),
        ("https://b.org/1", b'<a href="https://a.org/z">4</a>'),
        ("https://c.org/1", None),  # fetch miss: no rows
    ]
    df = spark.createDataFrame(rows, "url string, html binary")
    links = extract_outlinks(df)
    assert links.count() == 4
    g = [
        (r.src_host, r.dst_host, r.n_links)
        for r in host_link_graph(links).collect()
    ]
    # self-link a.org/1 -> /self dropped
    assert g == [("a.org", "b.org", 2), ("b.org", "a.org", 1)]

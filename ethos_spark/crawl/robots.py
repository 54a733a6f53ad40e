"""robots.txt parsing → the robots dim table for the politeness gate.

north_rule addition (no reference analogue; closest is the per-source
politeness delay, access_now.ts:11). Parsing follows the subset of RFC 9309
relevant to a crawler identifying as ``*``: Disallow path prefixes under
``User-agent: *`` groups (Allow precedence and wildcards are out of scope
for this engine's gate, which is a conservative prefix match — a disallowed
prefix always wins).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ethos_spark import schemas


def parse_robots_txt(text: str, agent: str = "*") -> list[str]:
    """Extract Disallow prefixes applying to ``agent``. RFC 9309 group
    selection: an exact-match user-agent group supersedes the ``*`` group
    (it does not merge with it)."""
    exact: list[str] = []
    star: list[str] = []
    current: list[str] | None = None
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, value = line.partition(":")
        key = key.strip().lower()
        value = value.strip()
        if key == "user-agent":
            if value == agent:
                current = exact
            elif value == "*":
                current = star
            else:
                current = None
        elif key == "disallow" and current is not None and value:
            current.append(value)
    return exact if exact else star


def robots_table(
    spark: SparkSession, per_host_txt: dict[str, str], agent: str = "*"
) -> DataFrame:
    """(host, disallow array) dim from fetched robots.txt bodies. In
    production the bodies arrive through the same fetch stage (one
    ``https://host/robots.txt`` frontier row per newly-discovered host);
    parsing is driver-side only for the dim build here because the dim is
    tiny relative to the frontier."""
    rows = [
        (host, parse_robots_txt(txt, agent)) for host, txt in per_host_txt.items()
    ]
    return spark.createDataFrame(rows, schemas.ROBOTS)


def extract_sitemap_lines(text: str) -> list[str]:
    """RFC 9309 §2.3 ``Sitemap:`` lines (group-independent, absolute
    URLs) — the standard bootstrap handoff to the sitemap source
    (sources/sitemap.discover_seed_urls)."""
    out: list[str] = []
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        key, _, value = line.partition(":")
        if key.strip().lower() == "sitemap" and value.strip():
            out.append(value.strip())
    return out

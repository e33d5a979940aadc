"""Web-graph construction from the crawl (outlink extraction).

A Common-Crawl-style pipeline's first graph step: parse each page's
stored ``html`` payload for hrefs and roll the page-level edges up to
a host-level weighted graph (the input to pagerank_hosts-style link
analysis and per-domain quality priors).

The Spark side genuinely PARSES the binary html (JVM
``regexp_extract_all`` — no Python in the hot path); the synthetic
page generator (sources/pages.py) plants three ``<link href>``
elements in ``<head>`` as affine functions of page_id, so the DuckDB
oracle can rebuild the exact edge list ARITHMETICALLY, without a
parser — value-hash equality proves the extraction recovers the
planted structure byte-for-byte, the same planted-ground-truth trick
as the geocoder's loc tokens.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..geo.cells_sql import PAGES_SQL
from ..sources.pages import N_HOSTS, synth_pages
from .relational import QuerySpec

CATALOG: dict[str, QuerySpec] = {}


def _register(name: str, sql=None):
    def deco(fn):
        CATALOG[name] = QuerySpec(fn, sql)
        return fn

    return deco


_HREF_RE = r'href="([^"]+)"'
_HOST_RE = r"^https?://([^/]+)/"
N_LINKS = 3  # links planted per page (sources/pages.py)

# doc_id is recoverable from the url path; multiplier=1 at oracle
# scale means page_id == doc_id, so the oracle's arithmetic matches
# the generator's exactly
_DID = r"CAST(regexp_extract(url, 'p/(\d+)$', 1) AS BIGINT)"


def _outlinks_sql() -> str:
    return f"""
    WITH {PAGES_SQL},
    links AS (
        SELECT url, warc_ts, {_DID} AS did,
               unnest(generate_series(1, {N_LINKS})) AS m
        FROM pages
    )
    SELECT url, warc_ts,
           CAST(m - 1 AS BIGINT) AS link_pos,
           'https://site' || CAST((did * 7 + m * 13) % {N_HOSTS} AS VARCHAR)
               || '.example/p/' || CAST(did * 3 + m AS VARCHAR) AS href,
           'site' || CAST((did * 7 + m * 13) % {N_HOSTS} AS VARCHAR)
               || '.example' AS dst_host
    FROM links
    """


@_register("webgraph_outlinks", _outlinks_sql())
def webgraph_outlinks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Outlink extraction: decode the binary html, pull every
    ``href="…"`` with one JVM regexp_extract_all, posexplode to
    (url, crawl, link_pos, href, dst_host) edges. Map-only — zero
    shuffles, scales as a pure scan at 10^12 rows.

    FULL oracle: DuckDB re-derives the PLANTED links from doc_id
    arithmetic (no parsing) — a parser bug that drops, reorders, or
    mangles one href hash-fails."""
    pages = synth_pages(spark, sf_dir)
    h = F.col("html").cast("string")
    links = F.regexp_extract_all(h, F.lit(_HREF_RE), 1)
    return (
        pages.select("url", "warc_ts", F.posexplode(links).alias("link_pos", "href"))
        .select(
            "url",
            "warc_ts",
            F.col("link_pos").cast("long").alias("link_pos"),
            "href",
            F.regexp_extract("href", _HOST_RE, 1).alias("dst_host"),
        )
    )


def _host_degree_sql() -> str:
    return f"""
    WITH {PAGES_SQL},
    pages1 AS (
        SELECT DISTINCT url, {_DID} AS did FROM pages
    ),
    edges AS (
        SELECT 'site' || CAST(did % {N_HOSTS} AS VARCHAR) || '.example'
                   AS src_host,
               'site' || CAST((did * 7 + m * 13) % {N_HOSTS} AS VARCHAR)
                   || '.example' AS dst_host
        FROM pages1, unnest(generate_series(1, {N_LINKS})) AS t(m)
    )
    SELECT src_host, dst_host, COUNT(*) AS n_links
    FROM edges GROUP BY src_host, dst_host
    """


@_register("webgraph_host_degree", _host_degree_sql())
def webgraph_host_degree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Host-level weighted edge list: parse outlinks, dedupe re-crawls
    (a url's links are identical across crawls, so DISTINCT url first
    — the crawl-frequency bias a naive rollup would bake in), then
    count page-level edges per (src_host, dst_host) pair.

    One distinct + one groupBy; both shuffle on host keys whose
    cardinality is the domain count (~10^8 at web scale, well-hashed).
    FULL oracle: same rollup over the arithmetically-rebuilt edges."""
    pages = synth_pages(spark, sf_dir).dropDuplicates(["url"])
    h = F.col("html").cast("string")
    links = F.regexp_extract_all(h, F.lit(_HREF_RE), 1)
    edges = pages.select(
        F.regexp_extract("url", _HOST_RE, 1).alias("src_host"),
        F.explode(links).alias("href"),
    ).select("src_host", F.regexp_extract("href", _HOST_RE, 1).alias("dst_host"))
    return edges.groupBy("src_host", "dst_host").agg(
        F.count(F.lit(1)).alias("n_links")
    )

"""WARC-style record framing for the crawl pages.

Common Crawl delivers pages as WARC files: a header block of
``Name: value`` lines, a blank line, then ``Content-Length`` bytes of
payload. This module round-trips the pages table through that
framing — ``warc_records`` SERIALIZES each page into one framed
binary record (pure JVM concat — the writer side of a crawl
ingester), and ``parse_warc_col`` PARSES a record column back into
(url, warc_date, content_length, payload) with JVM string ops only
(regexp + substr framed by Content-Length, exactly how a streaming
WARC reader frames records without parsing the payload).

No real WARC file I/O happens in the sandbox (no external data, by
construction) — but the framing grammar, the length-delimited
payload slicing, and the header fields match the public WARC/1.0
layout closely enough that swapping in a real `warcio`-style reader
only replaces the record *source*, not the DataFrame plumbing.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .pages import synth_pages

_CRLF = "\r\n"


def warc_records(spark: SparkSession, sf_dir: str, multiplier: int = 1) -> DataFrame:
    """One framed WARC response record per crawl: headers + blank
    line + html payload, as a single ``record:binary`` column (plus
    the url/warc_ts keys for test joins). Content-Length is the html
    byte length — the field a reader MUST trust to frame the payload
    (payloads may contain anything, including header-looking
    lines)."""
    pages = synth_pages(spark, sf_dir, multiplier)
    header = F.concat(
        F.lit("WARC/1.0" + _CRLF),
        F.lit("WARC-Type: response" + _CRLF),
        F.lit("WARC-Target-URI: "),
        F.col("url"),
        F.lit(_CRLF),
        F.lit("WARC-Date: "),
        F.date_format("warc_ts", "yyyy-MM-dd'T'HH:mm:ss'Z'"),
        F.lit(_CRLF),
        F.lit("Content-Length: "),
        F.length(F.col("html")).cast("string"),
        F.lit(_CRLF + _CRLF),
    )
    record = F.concat(header.cast("binary"), F.col("html"))
    return pages.select("url", "warc_ts", record.alias("record"))


def parse_warc_col(record: Column) -> list[Column]:
    """Columns (uri, warc_date, content_length, payload) parsed from a
    framed record. Header fields come from anchored regexps over the
    header block; the payload is sliced by Content-Length from the
    first blank line — NOT by searching the payload, so payload bytes
    that look like headers cannot confuse the framing. Junk records
    (no blank line / no Content-Length) yield NULLs, not errors
    (try_cast + regexp's empty-match semantics)."""
    s = record.cast("string")
    sep = F.instr(s, _CRLF + _CRLF)  # 1-based; 0 = not found
    head = F.substring(s, F.lit(1), sep - 1)
    uri = F.regexp_extract(head, r"WARC-Target-URI: ([^\r\n]+)", 1)
    wdate = F.regexp_extract(head, r"WARC-Date: ([^\r\n]+)", 1)
    clen = F.regexp_extract(head, r"Content-Length: (\d+)", 1).try_cast("long")
    payload = F.when(
        (sep > 0) & clen.isNotNull(),
        F.substring(s, sep + 4, clen),
    )
    return [
        F.when(sep > 0, F.nullif(uri, F.lit(""))).alias("uri"),
        F.when(sep > 0, F.to_timestamp(F.nullif(wdate, F.lit("")))).alias("warc_date"),
        F.when(sep > 0, clen).alias("content_length"),
        payload.alias("payload"),
    ]

"""Unit tests for the round-3 web-curation operators
(operators/webtext.py) and the quantile-sketch bound entry.

The driver's oracle gate covers sf0.01 value equality; these tests pin
the SEMANTICS on hand-built rows where the expected answer is written
out by hand — rule-by-rule for URL canonicalization, arithmetic for
repetition fractions, and a planted boilerplate chunk for the global
paragraph dedup.
"""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from osm_data_classification_spark.operators.webtext import (
    CHUNK,
    canonical_url_cols,
)


def _canon(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url_raw string")
    host, canon = canonical_url_cols(F.col("url_raw"))
    rows = df.select(host.alias("h"), canon.alias("c")).collect()
    return [(r["h"], r["c"]) for r in rows]


def test_url_canonicalize_rules(spark):
    cases = {
        # lowercase scheme+host, strip www
        "HTTPS://WWW.Example.COM/a": ("example.com", "https://example.com/a"),
        # default https port dropped, non-default kept
        "https://example.com:443/a": ("example.com", "https://example.com/a"),
        "https://example.com:8443/a": (
            "example.com",
            "https://example.com:8443/a",
        ),
        "http://example.com:80/a": ("example.com", "http://example.com/a"),
        # trailing slash stripped on non-root; root stays '/'
        "https://example.com/a/": ("example.com", "https://example.com/a"),
        "https://example.com": ("example.com", "https://example.com/"),
        "https://example.com/": ("example.com", "https://example.com/"),
        # utm params dropped, others kept in order, bare '?' dropped
        "https://example.com/a?utm_source=x&id=1&utm_campaign=y": (
            "example.com",
            "https://example.com/a?id=1",
        ),
        "https://example.com/a?utm_source=x": (
            "example.com",
            "https://example.com/a",
        ),
        # fragment dropped
        "https://example.com/a#frag": ("example.com", "https://example.com/a"),
        # path case preserved (paths ARE case-sensitive)
        "https://example.com/CaseSensitive": (
            "example.com",
            "https://example.com/CaseSensitive",
        ),
    }
    got = _canon(spark, list(cases))
    for (url, want), have in zip(cases.items(), got):
        assert have == want, f"{url}: {have} != {want}"


def test_url_canonicalize_junk_is_null(spark):
    """Non-URL junk (always present in a real frontier) must
    canonicalize to NULL, never to a degenerate ':///' string."""
    junk = ["not a url", "", "ftp//broken", "https://", "   ", "A@B"]
    got = _canon(spark, junk)
    assert all(h is None and c is None for h, c in got), got


def test_url_canonicalize_idempotent(spark, sf_dir):
    """canon(canon(x)) == canon(x) — the defining property of a
    canonicalization; run over the full synthesized messy set."""
    from osm_data_classification_spark.operators.webtext import url_canonicalize

    out = url_canonicalize(spark, sf_dir).select("url_canon")
    h2, c2 = canonical_url_cols(F.col("url_canon"))
    again = out.select(F.col("url_canon").alias("once"), c2.alias("twice"))
    bad = again.where(F.col("once") != F.col("twice")).count()
    assert bad == 0


def test_repetition_metrics_by_hand(spark, tmp_path):
    docs = spark.createDataFrame(
        [
            # bigrams: [a b, b a, a b, b a] -> 4 total, 2 distinct,
            # dup = (2-1)+(2-1) = 2 -> 500; top = 2 -> 500
            (1, "a b a b a", "en", "s", 9),
            # bigrams: [x y, y z] -> no dups -> 0; top = 1/2 -> 500
            (2, "x y z", "en", "s", 5),
            # single token: excluded
            (3, "solo", "en", "s", 4),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    d = str(tmp_path / "documents.parquet")
    docs.write.parquet(d)
    from osm_data_classification_spark.operators.webtext import (
        text_repetition_metrics,
    )

    rows = {
        r["doc_id"]: r
        for r in text_repetition_metrics(spark, str(tmp_path)).collect()
    }
    assert set(rows) == {1, 2}
    assert rows[1]["n_bigrams"] == 4
    assert rows[1]["n_distinct_bigrams"] == 2
    assert rows[1]["dup_bigram_x1000"] == 500
    assert rows[1]["top_bigram_x1000"] == 500
    assert rows[2]["dup_bigram_x1000"] == 0
    assert rows[2]["top_bigram_x1000"] == 500


def test_paragraph_dedup_drops_planted_boilerplate(spark, tmp_path):
    """Two docs share one identical 8-token chunk (the planted cookie
    banner); it must be dropped from BOTH, and the reassembled digest
    must equal the hand-computed md5 of the surviving text."""
    banner = " ".join(f"cookie{i}" for i in range(CHUNK))
    uniq1 = " ".join(f"alpha{i}" for i in range(CHUNK))
    uniq2 = " ".join(f"beta{i}" for i in range(CHUNK))
    docs = spark.createDataFrame(
        [
            (1, banner + " " + uniq1, "en", "s", 1),
            (2, banner + " " + uniq2, "en", "s", 1),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    from osm_data_classification_spark.operators.webtext import (
        dedup_paragraph_global,
    )

    rows = {
        r["doc_id"]: r
        for r in dedup_paragraph_global(spark, str(tmp_path)).collect()
    }
    for doc_id, kept in ((1, uniq1), (2, uniq2)):
        assert rows[doc_id]["n_chunks"] == 2
        assert rows[doc_id]["n_kept"] == 1
        want = hashlib.md5(kept.encode()).hexdigest()
        assert rows[doc_id]["kept_md5"] == want


def test_paragraph_dedup_all_dropped_digests_empty(spark, tmp_path):
    """A doc that is 100% boilerplate keeps zero chunks and digests
    the empty string (the oracle's coalesce branch)."""
    banner = " ".join(f"c{i}" for i in range(CHUNK))
    docs = spark.createDataFrame(
        [(1, banner, "en", "s", 1), (2, banner, "en", "s", 1)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    from osm_data_classification_spark.operators.webtext import (
        dedup_paragraph_global,
    )

    rows = dedup_paragraph_global(spark, str(tmp_path)).collect()
    empty_md5 = hashlib.md5(b"").hexdigest()
    for r in rows:
        assert r["n_kept"] == 0
        assert r["kept_md5"] == empty_md5


def test_dedup_url_canonical_collapses_variant_groups(spark, sf_dir):
    """Every canonical group must hold exactly the 4 noisy variants of
    its base id (doc_ids 4b..4b+3), keep the smallest, and the raw
    variants must not all be byte-identical (the noise is real)."""
    from osm_data_classification_spark.operators.webtext import (
        dedup_url_canonical,
    )

    rows = dedup_url_canonical(spark, sf_dir).collect()
    assert all(r["n_raw"] == 4 for r in rows)
    assert all(r["keep_doc"] % 4 == 0 for r in rows)
    # the 4 variants are not all identical strings for at least some groups
    assert any(r["n_raw_distinct"] > 1 for r in rows)


def test_pii_scrub_removes_all_planted_pii(spark, sf_dir):
    """After scrubbing, re-running the matchers on the scrubbed text
    must find zero PII — the defining property of a scrub."""
    from osm_data_classification_spark.io import load_table
    from osm_data_classification_spark.operators.webtext import (
        _DIRTY_SPARK,
        _EMAIL_RE,
        _IP_RE,
        _PHONE_RE,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    dirty = docs.select("doc_id", F.expr(_DIRTY_SPARK).alias("t"))
    scrubbed = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("t"), _EMAIL_RE, "<EMAIL>"),
            _PHONE_RE,
            "<PHONE>",
        ),
        _IP_RE,
        "<IP>",
    )
    leftovers = dirty.select(scrubbed.alias("s")).where(
        F.col("s").rlike(_EMAIL_RE)
        | F.col("s").rlike(_PHONE_RE)
        | F.col("s").rlike(_IP_RE)
    )
    assert leftovers.count() == 0
    # and every doc had at least the injected email+phone+ip
    from osm_data_classification_spark.operators.webtext import text_pii_scrub

    counted = text_pii_scrub(spark, sf_dir)
    bad = counted.where(
        (F.col("n_email") < 1) | (F.col("n_phone") < 1) | (F.col("n_ip") < 1)
    ).count()
    assert bad == 0


def test_stratified_sample_deterministic_and_rate_accurate(spark, sf_dir):
    """The sample must be identical across runs/partitionings and each
    stratum's keep fraction must sit near its configured rate."""
    from osm_data_classification_spark.io import load_table
    from osm_data_classification_spark.operators.webtext import (
        _DEFAULT_RATE,
        _STRATA_RATES,
        sample_stratified,
    )

    a = {r["doc_id"] for r in sample_stratified(spark, sf_dir).collect()}
    b = {r["doc_id"] for r in sample_stratified(spark, sf_dir).collect()}
    assert a == b
    totals = {
        r["lang"]: r["n"]
        for r in load_table(spark, sf_dir, "documents")
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    kept = {
        r["lang"]: r["n"]
        for r in sample_stratified(spark, sf_dir)
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for lang, total in totals.items():
        want = _STRATA_RATES.get(lang, _DEFAULT_RATE) / 1000
        got = kept.get(lang, 0) / total
        # binomial noise at sf0.001 group sizes: ±4 sigma
        sigma = (want * (1 - want) / total) ** 0.5
        assert abs(got - want) <= 4 * sigma + 1 / total, (lang, got, want)


def test_quantile_bound_flag_true_on_real_data(spark, sf_dir):
    from osm_data_classification_spark.operators.relational import CATALOG

    rows = CATALOG["agg_quantile_bound"].fn(spark, sf_dir).collect()
    assert len(rows) > 0
    assert all(r["within_bound"] for r in rows)


def test_quantile_exact_p50_matches_numpy(spark, sf_dir):
    """The emitted exact p50 must equal the floor((n-1)/2)-indexed
    sorted element per group (quantile_disc definition)."""
    import numpy as np

    from osm_data_classification_spark.io import load_table
    from osm_data_classification_spark.operators.relational import CATALOG

    got = {
        r["event_type"]: r
        for r in CATALOG["agg_quantile_bound"].fn(spark, sf_dir).collect()
    }
    ev = (
        load_table(spark, sf_dir, "events")
        .where(F.col("value").isNotNull())
        .select("event_type", "value")
        .collect()
    )
    by_type: dict[str, list[float]] = {}
    for r in ev:
        by_type.setdefault(r["event_type"], []).append(r["value"])
    for et, vals in by_type.items():
        v = np.sort(np.array(vals))
        want = int(np.floor(v[(len(v) - 1) // 2] * 1000))
        assert got[et]["exact_p50_x1000"] == want, et
        assert got[et]["n"] == len(vals)


def test_decontaminate_flags_exactly_planted_overlaps(spark, sf_dir):
    """The dedup corpus plants exact copies of originals < 25 (at
    +20000) and first-token-dropped near copies of originals < 50 (at
    +10000); benchmark = every 41st original. The flagged set must
    equal a brute-force python re-computation over the same corpus
    (the synthetic generator reuses sentence runs, so ORGANIC 8-gram
    overlaps between distinct docs exist and are genuine contamination
    — exactly what the op is for), and the planted copies of benchmark
    docs must always be inside it."""
    from osm_data_classification_spark.operators.dedup import (
        EXACT_OFF,
        N_EXACT,
        N_NEAR,
        NEAR_OFF,
    )
    from osm_data_classification_spark.operators.webtext import (
        DECON_MOD,
        dedup_decontaminate,
    )

    rows = {r["doc_id"]: r for r in dedup_decontaminate(spark, sf_dir).collect()}

    # brute-force python oracle over the same corpus construction
    from osm_data_classification_spark.io import load_table
    from osm_data_classification_spark.operators.webtext import DECON_NGRAM

    docs = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, sf_dir, "documents").collect()
    }

    def sh(text):
        t = text.strip().split()
        return {
            " ".join(t[i : i + DECON_NGRAM])
            for i in range(len(t) - DECON_NGRAM + 1)
        }

    corpus = dict(docs)
    for d, t in docs.items():
        if d < N_NEAR:
            corpus[d + NEAR_OFF] = t.split(None, 1)[1] if " " in t else ""
        if d < N_EXACT:
            corpus[d + EXACT_OFF] = t
    bench = {d: sh(t) for d, t in docs.items() if d % DECON_MOD == 0}
    bench_all = set().union(*bench.values()) if bench else set()
    want = {}
    for d, t in corpus.items():
        if d % DECON_MOD == 0 and d < NEAR_OFF:
            continue
        shared = sh(t) & bench_all
        if shared:
            want[d] = (len(shared), sum(1 for b in bench.values() if b & sh(t)))
    assert set(rows) == set(want), (sorted(rows), sorted(want))
    for did, (n_sh, n_bd) in want.items():
        assert rows[did]["n_shared_shingles"] == n_sh, did
        assert rows[did]["n_bench_docs"] == n_bd, did
    # the planted copies of benchmark docs are always flagged
    for base in range(0, N_EXACT, DECON_MOD):
        assert base + EXACT_OFF in rows
    for base in range(0, N_NEAR, DECON_MOD):
        assert base + NEAR_OFF in rows


def test_curation_funnel_monotone_and_consistent(spark, sf_dir):
    """Each funnel stage only removes rows (monotone), the counts
    equal the stage DataFrames' own counts, and the final stage is
    non-empty at the test sf."""
    from osm_data_classification_spark.operators.webtext import (
        curate_corpus_funnel,
        curate_stages,
    )

    funnel = {
        r["stage"]: r["rows"]
        for r in curate_corpus_funnel(spark, sf_dir).collect()
    }
    order = [
        "s0_input", "s1_url_dedup", "s2_token_gate", "s3_repetition_gate",
        "s4_not_benchmark", "s5_decontaminated", "s6_sampled",
    ]
    assert set(funnel) == set(order), sorted(funnel)
    counts = [funnel[s] for s in order]
    assert counts == sorted(counts, reverse=True), counts
    assert counts[-1] > 0
    stages = curate_stages(spark, sf_dir)
    for s in order:
        assert stages[s].count() == funnel[s], s


def test_curate_job_output_is_scrubbed_and_deterministic(spark, sf_dir, tmp_path):
    """The job's curated corpus carries no PII and two runs produce
    identical row sets (hash-threshold sampling, no rand())."""
    from osm_data_classification_spark.jobs_api import run_curate

    out1 = str(tmp_path / "c1")
    out2 = str(tmp_path / "c2")
    a = run_curate(spark, sf_dir, out1)
    b = run_curate(spark, sf_dir, out2)
    # identical (n_docs, order-insensitive corpus checksum) witnesses
    assert a == b and a[0] > 0, (a, b)
    from osm_data_classification_spark.operators.webtext import (
        _EMAIL_RE,
        _IP_RE,
        _PHONE_RE,
    )

    back = spark.read.parquet(f"{out1}/data/data")
    leftovers = back.where(
        F.col("text").rlike(_EMAIL_RE)
        | F.col("text").rlike(_PHONE_RE)
        | F.col("text").rlike(_IP_RE)
    ).count()
    assert leftovers == 0


def test_url_canonicalize_variant_invariance_randomized(spark):
    """Randomized (seeded) batch property check: for 500 random
    canonical URLs, every noisy variant — case noise on scheme/host,
    `www.`, default port, utm params, fragment, trailing slash —
    canonicalizes back to the original, in one Spark job."""
    import random

    rng = random.Random(7)
    rows = []
    for i in range(500):
        scheme = rng.choice(["http", "https"])
        host = f"h{rng.randrange(1000)}.example"
        path = "/" + "/".join(
            f"P{rng.randrange(50)}" for _ in range(rng.randrange(1, 4))
        )
        q = (
            f"?a={rng.randrange(10)}&b={rng.randrange(10)}"
            if rng.random() < 0.5
            else ""
        )
        canon = f"{scheme}://{host}{path}{q}"
        noisy = scheme.upper() if rng.random() < 0.5 else scheme
        h = host.upper() if rng.random() < 0.5 else host
        if rng.random() < 0.5:
            h = "WWW." + h
        port = (
            (":443" if scheme == "https" else ":80")
            if rng.random() < 0.5
            else ""
        )
        extra = ""
        if q and rng.random() < 0.5:
            extra = "&utm_source=x&utm_medium=y"
        elif not q and rng.random() < 0.5:
            q2 = "?utm_source=x"
            extra = ""
            q = q2  # only-utm query must vanish entirely
            canon = f"{scheme}://{host}{path}"
        slash = "/" if rng.random() < 0.3 else ""
        frag = "#f" + str(rng.randrange(9)) if rng.random() < 0.5 else ""
        variant = f"{noisy}://{h}{port}{path}{slash}{q}{extra}{frag}"
        rows.append((variant, canon))

    df = spark.createDataFrame(rows, "url_raw string, want string")
    _, canon_col = canonical_url_cols(F.col("url_raw"))
    bad = (
        df.select("url_raw", "want", canon_col.alias("got"))
        .where(F.col("got") != F.col("want"))
        .collect()
    )
    assert not bad, bad[:5]


def test_repetition_and_paragraph_bounds_randomized(spark):
    """Randomized batch bounds: for random token sequences, the
    repetition ratios stay inside [0, 1000], dup+distinct accounting
    is consistent, and paragraph dedup never keeps more chunks than it
    saw."""
    import random

    rng = random.Random(11)
    docs = []
    for i in range(300):
        n = rng.randrange(2, 60)
        toks = [f"w{rng.randrange(8)}" for _ in range(n)]
        docs.append((i, " ".join(toks), "en", "s", n))
    df = spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    )
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(f"{d}/documents.parquet")
        from osm_data_classification_spark.operators.webtext import (
            dedup_paragraph_global,
            text_repetition_metrics,
        )

        for r in text_repetition_metrics(spark, d).collect():
            assert 0 <= r["dup_bigram_x1000"] <= 1000
            assert 0 < r["top_bigram_x1000"] <= 1000
            assert r["n_distinct_bigrams"] <= r["n_bigrams"]
            # dup fraction = (n - distinct) / n, integer-scaled
            want = (r["n_bigrams"] - r["n_distinct_bigrams"]) * 1000 // r[
                "n_bigrams"
            ]
            assert r["dup_bigram_x1000"] == want
        for r in dedup_paragraph_global(spark, d).collect():
            assert 0 <= r["n_kept"] <= r["n_chunks"]


def test_global_shuffle_is_a_permutation_and_stable(spark, sf_dir):
    """sample_global_shuffle: positions within each shard are dense
    0..n-1, every doc appears exactly once, and the assignment is
    bit-identical across two independent evaluations (no rand()
    anywhere)."""
    from osm_data_classification_spark.operators.text import (
        SHUFFLE_SHARDS,
        sample_global_shuffle,
    )

    a = sample_global_shuffle(spark, sf_dir).collect()
    b = sample_global_shuffle(spark, sf_dir).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    docs = [r["doc_id"] for r in a]
    assert len(docs) == len(set(docs))
    by_shard = {}
    for r in a:
        assert 0 <= r["shard"] < SHUFFLE_SHARDS
        by_shard.setdefault(r["shard"], []).append(r)
    for rows in by_shard.values():
        rows.sort(key=lambda r: r["pos"])
        assert [r["pos"] for r in rows] == list(range(len(rows)))
        # pos order == (shuffle_key, doc_id) order
        keys = [(r["shuffle_key"], r["doc_id"]) for r in rows]
        assert keys == sorted(keys)


def test_outlinks_parse_matches_planted_arithmetic(spark, sf_dir):
    """webgraph_outlinks must recover exactly the links the generator
    planted: 3 per page, href rebuilt from page_id arithmetic; a page
    with no hrefs (junk html) yields zero rows, not an error."""
    from osm_data_classification_spark.operators.webgraph import (
        N_LINKS,
        webgraph_outlinks,
    )
    from osm_data_classification_spark.sources.pages import N_HOSTS

    rows = webgraph_outlinks(spark, sf_dir).collect()
    by_page = {}
    for r in rows:
        by_page.setdefault((r["url"], r["warc_ts"]), []).append(r)
    for (url, _), links in by_page.items():
        pid = int(url.rsplit("/", 1)[1])
        links.sort(key=lambda r: r["link_pos"])
        assert [r["link_pos"] for r in links] == list(range(N_LINKS))
        for m, r in enumerate(links, start=1):
            host = (pid * 7 + m * 13) % N_HOSTS
            assert r["href"] == f"https://site{host}.example/p/{pid * 3 + m}"
            assert r["dst_host"] == f"site{host}.example"

    # junk html degrades to an empty edge set
    import pyspark.sql.functions as F

    junk = spark.createDataFrame(
        [("u1", bytearray(b"\xff\xfe not html at all"))], "url string, html binary"
    )
    got = junk.select(
        F.explode(
            F.regexp_extract_all(F.col("html").cast("string"), F.lit(r'href="([^"]+)"'), 1)
        )
    ).count()
    assert got == 0


def test_warc_parse_junk_records_yield_nulls(spark):
    """A WARC reader on a real crawl sees truncated/garbage records;
    parse_warc_col must degrade them to NULLs, never raise, and must
    frame the payload by Content-Length even when the payload itself
    contains header-looking bytes."""
    import pyspark.sql.functions as F

    from osm_data_classification_spark.sources.warc import parse_warc_col

    evil_payload = "WARC-Target-URI: https://evil.example/\r\n\r\nx"
    rec = (
        "WARC/1.0\r\nWARC-Target-URI: https://a.example/p/1\r\n"
        "WARC-Date: 2024-01-02T03:04:00Z\r\n"
        f"Content-Length: {len(evil_payload)}\r\n\r\n{evil_payload}"
    )
    rows = spark.createDataFrame(
        [
            (rec.encode(),),
            (b"no blank line at all",),
            (b"WARC/1.0\r\nContent-Length: oops\r\n\r\npayload",),
            (b"",),
        ],
        "record binary",
    ).select(*parse_warc_col(F.col("record"))).collect()
    good = rows[0]
    assert good["uri"] == "https://a.example/p/1"
    assert str(good["warc_date"]).startswith("2024-01-02 03:04")
    assert good["content_length"] == len(evil_payload)
    assert good["payload"] == evil_payload  # header-looking bytes stay payload
    for junk in rows[1:3]:
        assert junk["uri"] is None or junk["content_length"] is None
    assert rows[3]["payload"] is None


def test_host_coupling_requires_shared_rare_destinations(spark, sf_dir):
    """Bibliographic coupling sanity: every emitted pair genuinely
    shares >= 1 out-destination and meets the Jaccard floor computed
    from the real out-degree table; ha < hb canonical order holds."""
    from pyspark.sql import functions as F

    from osm_data_classification_spark.operators.webgraph import (
        _COUPLE_THRESH,
        CATALOG as WG,
    )

    out = WG["webgraph_host_coupling"].fn(spark, sf_dir).collect()
    assert out, "no coupled host pairs found"
    for r in out:
        assert r["ha"] < r["hb"]
        assert r["n_shared"] >= 1
        assert r["jaccard_x1000"] >= _COUPLE_THRESH


def test_host_boilerplate_strips_chrome_keeps_body(spark, sf_dir):
    """Every page must lose exactly its nav+footer chrome (planted on
    100% of each host's pages) and keep every body line; the kept
    digest must differ from the all-lines digest (something was
    actually stripped)."""
    from pyspark.sql import functions as F

    from osm_data_classification_spark.operators.webtext import (
        CATALOG as WT,
    )

    out = WT["webtext_host_boilerplate"].fn(spark, sf_dir)
    bad = out.filter(F.col("n_boiler") < 2).count()
    assert bad == 0, f"{bad} pages did not lose their nav+footer"
    # kept lines = n_lines - n_boiler >= 1 body line for every page
    assert out.filter(F.col("n_lines") - F.col("n_boiler") < 1).count() == 0

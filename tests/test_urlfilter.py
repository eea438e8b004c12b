"""URL canonicalization + url dedup (stages/urlfilter.py): canonical-form
rules vs a urllib-based reference, earliest-crawl-wins dedup, determinism."""

import numpy as np
import pyarrow as pa


def test_canonicalize_rules():
    from imagededupx_ray.stages.urlfilter import canonicalize_urls

    cases = {
        "HTTP://Example.COM/Path": "http://example.com/Path",
        "http://example.com:80/a": "http://example.com/a",
        "https://example.com:443/a": "https://example.com/a",
        "https://example.com:8443/a": "https://example.com:8443/a",
        "http://example.com/a#frag": "http://example.com/a",
        "http://example.com/a?utm_source=x&q=1": "http://example.com/a?q=1",
        "http://example.com/a?q=1&utm_campaign=y": "http://example.com/a?q=1",
        "http://example.com/a?gclid=123": "http://example.com/a",
        "http://example.com/a/": "http://example.com/a",
        "http://example.com/": "http://example.com/",
        "http://example.com/a?fbclid=z#f": "http://example.com/a",
        # path case is preserved; query order is preserved
        "http://ex.com/A/B?z=2&a=1": "http://ex.com/A/B?z=2&a=1",
        # ADVICE r4: params whose names merely END in a tracking name must
        # survive — the strip is anchored to a preceding [?&]
        "http://h/?xgclid=5&a=1": "http://h/?xgclid=5&a=1",
        "http://h/?myutm_source=1&a=2": "http://h/?myutm_source=1&a=2",
        "http://h/?xfbclid=9": "http://h/?xfbclid=9",
        # runs of consecutive tracking params strip in one pass
        "http://h/?utm_a=1&utm_b=2&a=3": "http://h/?a=3",
        "http://h/?utm_a=1&gclid=2": "http://h/",
        "http://h/?a=1&utm_x=2&b=3": "http://h/?a=1&b=3",
    }
    out = canonicalize_urls(pa.array(list(cases.keys()))).to_pylist()
    for (raw, want), got in zip(cases.items(), out):
        assert got == want, (raw, got, want)


def test_url_dedup_keeps_earliest_crawl(ray_session):
    import ray.data as rd

    from imagededupx_ray.stages.urlfilter import url_dedup

    urls = [
        "http://a.com/x?utm_source=1",   # same canonical as the next two
        "HTTP://A.com/x",
        "http://a.com/x/",
        "http://b.com/y",
        "http://c.com/z",
    ]
    ts = np.array(
        ["2021-06-01T00:00:00", "2021-01-01T00:00:00", "2021-03-01T00:00:00",
         "2022-01-01T00:00:00", "NaT"],
        dtype="datetime64[us]",
    )
    pages = rd.from_arrow(
        pa.table(
            {
                "url": pa.array(urls, type=pa.string()),
                "warc_ts": pa.array(ts),
                "html": pa.nulls(5, pa.binary()),
                "text": pa.array([f"t{i}" for i in range(5)], type=pa.string()),
                "lang": pa.array(["en"] * 5, type=pa.string()),
            }
        )
    )
    out = url_dedup(pages).to_pandas().sort_values("canonical_url")
    assert len(out) == 3
    grp = out.set_index("canonical_url")
    # earliest crawl of the a.com/x family is the 2021-01-01 row (raw url #1)
    assert grp.loc["http://a.com/x", "url"] == "HTTP://A.com/x"
    assert grp.loc["http://a.com/x", "text"] == "t1"
    assert grp.loc["http://b.com/y", "text"] == "t3"
    assert grp.loc["http://c.com/z", "text"] == "t4"  # NaT ts still kept
    # determinism
    out2 = url_dedup(pages).to_pandas().sort_values("canonical_url")
    assert out.reset_index(drop=True).equals(out2.reset_index(drop=True))


def test_extract_hosts_rules():
    from imagededupx_ray.stages.urlfilter import extract_hosts

    cases = {
        "http://Example.COM/a": "example.com",
        "https://user:pw@Host.Net:8443/p?q=1": "host.net",
        "http://h": "h",
        "ftp://files.example/x": "files.example",
        "no-scheme-at-all": "",
        "": "",
    }
    got = extract_hosts(pa.array(list(cases.keys()))).to_pylist()
    for (raw, want), g in zip(cases.items(), got):
        assert g == want, (raw, g, want)


def test_host_cap_matches_duckdb_row_number(ray_session):
    """host_cap == the SQL keep rule ROW_NUMBER() OVER (PARTITION BY host
    ORDER BY warc_ts NULLS LAST, url) <= K, on the synthetic pages corpus
    (hot boiler site well above the cap), at several K and blockings."""
    import duckdb
    import pandas as pd
    import ray.data as rd

    from imagededupx_ray.sources.synthetic import generate_pages
    from imagededupx_ray.stages.urlfilter import extract_hosts, host_cap

    pages_tbl, _, _ = generate_pages(n_pages=400, seed=7)
    hosts = extract_hosts(pages_tbl["url"])
    ref_in = pd.DataFrame(
        {
            "url": pages_tbl["url"].to_pylist(),
            "host": hosts.to_pylist(),
            "warc_ts": pages_tbl["warc_ts"].to_pandas(),
        }
    )
    con = duckdb.connect()
    con.register("pages", ref_in)
    for k in (1, 3, 25):
        want = con.execute(
            "SELECT url FROM (SELECT url, ROW_NUMBER() OVER ("
            "PARTITION BY host ORDER BY warc_ts ASC NULLS LAST, url ASC) rn "
            "FROM pages) WHERE rn <= ?" , [k]
        ).df()["url"].sort_values().tolist()
        for blocks in (1, 5):
            got = (
                host_cap(rd.from_arrow(pages_tbl).repartition(blocks), k)
                .to_pandas()["url"].sort_values().tolist()
            )
            assert got == want, (k, blocks, len(got), len(want))
    # the hot site actually exceeds every tested cap (planted attrition)
    counts = ref_in.groupby("host").size()
    assert counts.max() > 25


def test_host_cap_keeps_earliest_and_host_column(ray_session):
    import ray.data as rd

    from imagededupx_ray.stages.urlfilter import host_cap

    urls = [f"http://hot.example/p{i}" for i in range(6)] + ["http://cold.example/x"]
    ts = np.array(
        ["2021-01-05", "2021-01-02", "2021-01-04", "2021-01-01", "2021-01-03", "NaT",
         "2021-06-01"],
        dtype="datetime64[us]",
    )
    pages = rd.from_arrow(
        pa.table(
            {
                "url": pa.array(urls, type=pa.string()),
                "warc_ts": pa.array(ts),
                "text": pa.array([f"t{i}" for i in range(7)], type=pa.string()),
            }
        )
    )
    out = host_cap(pages, 2).to_pandas()
    assert set(out["host"]) == {"hot.example", "cold.example"}
    hot = out[out["host"] == "hot.example"]["url"].sort_values().tolist()
    # the two earliest crawls survive; NaT sorts last and is dropped
    assert hot == ["http://hot.example/p1", "http://hot.example/p3"]
    assert out[out["host"] == "cold.example"]["url"].tolist() == ["http://cold.example/x"]


def test_blocked_host_mask_suffix_semantics():
    from imagededupx_ray.functions.hashing import token_hash_flat
    from imagededupx_ray.stages.urlfilter import blocked_host_mask, extract_hosts

    blocked = np.sort(token_hash_flat(pa.array(["bad.com", "evil.org"])))
    urls = pa.array(
        [
            "http://bad.com/x",          # exact
            "https://www.bad.com/",      # subdomain
            "http://notbad.com/",        # NOT a dot-suffix
            "http://a.b.evil.org/z",     # deep subdomain
            "http://good.com/",
            "not a url",                 # no host -> never blocked
            "http://BAD.com/up",         # case-insensitive
            "http://com/",               # bare label != suffix of bad.com
        ]
    )
    m = blocked_host_mask(extract_hosts(urls), blocked)
    assert m.tolist() == [True, True, False, True, False, False, True, False]
    # empty blocklist blocks nothing
    m0 = blocked_host_mask(extract_hosts(urls), np.empty(0, dtype=np.uint64))
    assert not m0.any()


def test_load_blocklist(tmp_path):
    from imagededupx_ray.stages.urlfilter import load_blocklist

    f = tmp_path / "bl.txt"
    f.write_text("# comment\nBad.com\n*.evil.org  # trailing\n\n.dotted.net\n")
    assert load_blocklist(str(f)) == ["bad.com", "evil.org", "dotted.net"]


def test_host_blocklist_filter_matches_duckdb(ray_session):
    """Kept set equals the DuckDB dot-suffix twin over the same host
    extraction (simple authority urls: no userinfo/port)."""
    import duckdb
    import ray.data as rd

    from imagededupx_ray.stages.urlfilter import host_blocklist_filter

    rng = np.random.default_rng(5)
    hosts = ["bad.com", "www.bad.com", "a.bad.com", "notbad.com", "ok.net",
             "evil.org", "x.evil.org", "fine.io", "sub.fine.io"]
    urls = [
        f"http://{hosts[int(i)]}/p{n}" for n, i in enumerate(rng.integers(0, len(hosts), 120))
    ]
    pages = pa.table({"url": pa.array(urls, type=pa.string()),
                      "text": pa.array([f"t{n}" for n in range(len(urls))], type=pa.string())})
    blocked = ["bad.com", "evil.org"]
    kept = host_blocklist_filter(rd.from_arrow(pages), blocked).to_pandas()

    con = duckdb.connect()
    con.register("pages", pages)
    want = con.execute(
        "WITH h AS (SELECT url, regexp_extract(lower(url), "
        "'^[a-z][a-z0-9+.-]*://([^/:?#]+)', 1) AS host FROM pages) "
        "SELECT url FROM h WHERE NOT (host IN ('bad.com', 'evil.org') "
        "OR host LIKE '%.bad.com' OR host LIKE '%.evil.org') ORDER BY url"
    ).df()
    assert sorted(kept["url"].tolist()) == want["url"].tolist()
    assert len(kept) < len(urls)  # something was planted and dropped


def test_refine_blocklist_stage(ray_session, tmp_path):
    import ray.data as rd

    from imagededupx_ray.config import DEFAULT_CONFIG
    from imagededupx_ray.pipelines.refine import refine_corpus

    n = 60
    urls = [
        f"http://spam.example/p{i}" if i % 3 == 0 else f"http://site{i}.net/a"
        for i in range(n)
    ]
    texts = ["words " * 60 + f"tail{i} " + "more words here. " * 20 for i in range(n)]
    pages = rd.from_arrow(
        pa.table(
            {
                "url": pa.array(urls, type=pa.string()),
                "warc_ts": pa.array(np.full(n, "2021-01-01", dtype="datetime64[us]")),
                "html": pa.array([None] * n, type=pa.binary()),
                "text": pa.array(texts, type=pa.string()),
                "lang": pa.array(["en"] * n, type=pa.string()),
            }
        )
    )
    bl = tmp_path / "bl.txt"
    bl.write_text("spam.example\n")
    _, report = refine_corpus(
        pages,
        DEFAULT_CONFIG,
        blocklist_hosts=str(bl),
        line_min_doc_rep=None,
        with_quality=False,
    )
    r = report.set_index("stage")
    assert r.loc["url_blocklist", "docs_in"] == n
    assert r.loc["url_blocklist", "removed"] == n // 3
    # blocklist runs FIRST
    assert list(report["stage"])[0] == "url_blocklist"

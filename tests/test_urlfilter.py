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

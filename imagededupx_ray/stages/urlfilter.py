"""URL canonicalization + URL-keyed dedup over the pages table — the
step upstream of content dedup in Common-Crawl-style corpus builds
(C4/RefinedWeb filter and dedup by URL before touching page bytes; the
reference keys image identity on file path the same way,
improved_faiss_detector.py:259-295).

Canonical form (applied in order, all vectorized Arrow RE2 kernels):
  1. scheme and host lowercased
  2. default ports stripped (:80 for http, :443 for https)
  3. fragment (#...) stripped
  4. tracking query params stripped (utm_*, gclid, fbclid), '?' dropped
     if no params remain
  5. trailing '/' stripped from non-root paths

URL dedup keeps ONE page per canonical url: the earliest ``warc_ts``
(recrawls are re-fetches of the same resource; ties break on raw url).
One coarse-partition exchange on hash(canonical url) — the same
_part discipline as every keyed exchange in this repo.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_TRACKING = r"(utm_[a-z]+|gclid|fbclid)=[^&#]*"


def canonicalize_urls(urls: pa.Array) -> pa.Array:
    """Vectorized canonical form of a url string column."""
    u = pc.cast(urls, pa.string())
    # 1. lowercase scheme+host (authority has no path chars); RE2 has no
    #    case conversion, so extract (prefix, rest), lower the prefix,
    #    re-join — rows without a scheme pass through unchanged
    ex = pc.extract_regex(
        u, r"^(?P<p>[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)(?P<r>.*)$"
    )
    pref = pc.struct_field(ex, "p")
    rest = pc.struct_field(ex, "r")
    joined = pc.binary_join_element_wise(pc.utf8_lower(pref), rest, "")
    u = pc.if_else(pc.is_valid(pref), joined, u)
    # 2. default ports (RE2 has no lookahead: capture the suffix instead)
    u = pc.replace_substring_regex(u, r"^(http://[^/:?#]*):80([/?#].*)?$", r"\1\2")
    u = pc.replace_substring_regex(u, r"^(https://[^/:?#]*):443([/?#].*)?$", r"\1\2")
    # 3. fragment
    u = pc.replace_substring_regex(u, r"#.*$", "")
    # 4. tracking params — anchored to a preceding [?&] so param names that
    #    merely END in a tracking name (e.g. ?xgclid=5) are left alone; the
    #    (...&)+ repetition strips runs of consecutive tracking params in
    #    one pass (a lone replacement would consume the separator the next
    #    match needs)
    u = pc.replace_substring_regex(u, r"([?&])(?:" + _TRACKING + r"&)+", r"\1")
    u = pc.replace_substring_regex(u, r"[?&]" + _TRACKING + r"$", "")
    u = pc.replace_substring_regex(u, r"\?&", "?")
    # 5. trailing slash on non-root paths
    u = pc.replace_substring_regex(u, r"^([a-z][a-z0-9+.-]*://[^/?#]+/.+?)/$", r"\1")
    return u


_HOST = r"^[a-z][a-z0-9+.-]*://(?:[^/?#@]*@)?(?P<h>[^/:?#]+)"


def extract_hosts(urls: pa.Array) -> pa.Array:
    """Lowercased host of each url ('' when the url carries no authority
    component). Vectorized Arrow RE2; userinfo (user:pass@) and port are
    excluded from the host."""
    u = pc.utf8_lower(pc.cast(urls, pa.string()))
    ex = pc.extract_regex(u, _HOST)
    return pc.fill_null(pc.struct_field(ex, "h"), "")


def host_cap(pages_ds, max_per_host: int, num_partitions: int = 64):
    """pages → pages with at most ``max_per_host`` rows per url host
    (earliest ``warc_ts`` first, missing-ts last, raw-url tie-break), plus
    a ``host`` column — the per-domain volume cap Common-Crawl-style corpus
    builds apply so hot hosts (link farms, calendar pages, mirrors) cannot
    dominate the training mix. The reference scopes identity to a directory
    the same way (improved_faiss_detector.py:259-295 keys on path prefix).

    Scale shape: ONE coarse-partition exchange on ``hash64(host) & (P-1)``
    — all rows of a host land in one partition; each partition resolves ALL
    its hosts with one lexsort + segmented rank (never per-host Python).
    Output volume is self-bounding: a partition emits at most
    ``max_per_host × hosts_in_partition`` rows, so a single 10M-page host
    costs one partition one sort, not a cross-cluster hot key. Hostless
    urls share the '' host and are capped together. A public-suffix
    collapse (host → registrable domain) is a pre-map on the host column
    when a PSL table is available; the cap discipline is identical."""
    from imagededupx_ray.functions.hashing import token_hash_flat
    from imagededupx_ray.stages.lsh import _pow2

    if max_per_host < 1:
        raise ValueError("max_per_host must be >= 1")
    p = _pow2(num_partitions)
    k = int(max_per_host)

    def prep(batch: pa.Table) -> pa.Table:
        host = extract_hosts(batch["url"])
        part = (token_hash_flat(host) & np.uint64(p - 1)).astype(np.int32)
        return batch.append_column("host", host).append_column(
            "_part", pa.array(part, type=pa.int32())
        )

    def cap_group(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return group.drop_columns(["_part"])
        host = group["host"].to_numpy(zero_copy_only=False)
        ts64 = group["warc_ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]")
        tsv = ts64.astype(np.int64)
        tsv[np.isnat(ts64)] = np.iinfo(np.int64).max  # missing ts sorts last
        raw = group["url"].to_numpy(zero_copy_only=False)
        order = np.lexsort((raw, tsv, host))
        host_s = host[order]
        starts = np.r_[True, host_s[1:] != host_s[:-1]]
        seg = np.cumsum(starts) - 1
        rank = np.arange(len(host_s)) - np.flatnonzero(starts)[seg]
        return group.take(pa.array(order[rank < k])).drop_columns(["_part"])

    return (
        pages_ds.map_batches(prep, batch_format="pyarrow")
        .groupby("_part")
        .map_groups(cap_group, batch_format="pyarrow")
    )


def url_dedup(pages_ds, num_partitions: int = 64):
    """pages → pages with one row per canonical url (earliest warc_ts wins,
    raw-url tie-break), plus a ``canonical_url`` column. One exchange on
    ``hash64(canonical) & (P-1)``; each partition resolves ALL its urls
    with one lexsort + segment-first pass (never per-url Python)."""
    from imagededupx_ray.functions.hashing import token_hash_flat
    from imagededupx_ray.stages.lsh import _pow2

    p = _pow2(num_partitions)

    def prep(batch: pa.Table) -> pa.Table:
        canon = canonicalize_urls(batch["url"])
        # stable (seed-free) per-string hash — python hash() is
        # process-randomized and would break cross-worker partitioning
        h = token_hash_flat(canon)
        part = (h & np.uint64(p - 1)).astype(np.int32)
        return batch.append_column("canonical_url", canon).append_column(
            "_part", pa.array(part, type=pa.int32())
        )

    def first_per_url(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return group.drop_columns(["_part"])
        canon = group["canonical_url"].to_numpy(zero_copy_only=False)
        ts64 = group["warc_ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]")
        tsv = ts64.astype(np.int64)
        tsv[np.isnat(ts64)] = np.iinfo(np.int64).max  # missing ts sorts last
        raw = group["url"].to_numpy(zero_copy_only=False)
        order = np.lexsort((raw, tsv, canon))
        canon_s = canon[order]
        first = np.r_[True, canon_s[1:] != canon_s[:-1]]
        return group.take(pa.array(order[first])).drop_columns(["_part"])

    return (
        pages_ds.map_batches(prep, batch_format="pyarrow")
        .groupby("_part")
        .map_groups(first_per_url, batch_format="pyarrow")
    )


def load_blocklist(path: str) -> list[str]:
    """Read a host blocklist file: one host per line, '#' comments and blank
    lines skipped, entries lowercased; a leading '*.' or '.' (common
    blocklist notations for "and subdomains" — suffix matching already
    implies it here) is stripped."""
    hosts = []
    with open(path) as f:
        for line in f:
            h = line.split("#", 1)[0].strip().lower()
            if h.startswith("*."):
                h = h[2:]
            h = h.lstrip(".")
            if h:
                hosts.append(h)
    return hosts


def blocked_host_mask(
    hosts: pa.Array, blocked_sorted: np.ndarray, max_labels: int = 12
) -> np.ndarray:
    """Boolean mask: host is blocked under DOT-SUFFIX semantics — blocking
    'bad.com' drops 'bad.com' and 'x.bad.com', never 'notbad.com'. Each
    round tests the current suffix's hash against the sorted blocklist
    hashes (searchsorted — no Python set per row), then strips one leading
    label; rounds stop when no '.' remains (registrable hosts are < 12
    labels deep)."""
    import pandas as pd

    from imagededupx_ray.functions.hashing import token_hash_flat

    mask = np.zeros(len(hosts), dtype=bool)
    if len(blocked_sorted) == 0 or len(hosts) == 0:
        return mask
    cur = pd.Series(hosts.to_pandas() if hasattr(hosts, "to_pandas") else hosts)
    for _ in range(max_labels):
        nonempty = cur.str.len() > 0
        if not nonempty.any():
            break
        h = token_hash_flat(pa.array(cur, type=pa.string()))
        pos = np.minimum(
            np.searchsorted(blocked_sorted, h), len(blocked_sorted) - 1
        )
        mask |= (blocked_sorted[pos] == h) & nonempty.to_numpy()
        has_dot = cur.str.contains(".", regex=False)
        if not has_dot.any():
            break
        nxt = cur.where(~has_dot, cur.str.split(".", n=1).str[-1])
        nxt[~has_dot] = ""
        cur = nxt
    return mask


def host_blocklist_filter(pages_ds, blocked_hosts):
    """pages → pages whose url host is NOT on the blocklist — the first
    filtering stage of RefinedWeb-style corpus builds (Penedo et al. 2023
    §G.1: a curated adult/fraud/malware domain blocklist applied before any
    content work, because dropping a page here costs nothing downstream).

    Matching is dot-suffix (see blocked_host_mask). Scale shape: the
    blocklist ships as ONE sorted uint64 hash array in the object store
    (``ray.put`` — RefinedWeb's 4.6M domains ≈ 37 MB, fetched once per node,
    never per task) and the filter is an embarrassingly parallel
    map_batches; no exchange."""
    import ray

    from imagededupx_ray.functions.hashing import token_hash_flat

    blocked = sorted(set(load_blocklist(blocked_hosts))) if isinstance(
        blocked_hosts, str
    ) else sorted({h.strip().lower() for h in blocked_hosts if h.strip()})
    blocked_arr = np.sort(token_hash_flat(pa.array(blocked, type=pa.string())))
    blocked_ref = ray.put(blocked_arr)

    def drop_blocked(batch: pa.Table) -> pa.Table:
        bl = ray.get(blocked_ref)
        m = blocked_host_mask(extract_hosts(batch["url"]), bl)
        return batch.filter(pa.array(~m))

    return pages_ds.map_batches(drop_blocked, batch_format="pyarrow")

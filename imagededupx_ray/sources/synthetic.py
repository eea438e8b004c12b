"""Deterministic synthetic Common-Crawl-style ``pages`` corpus (FIXTURES.md F1).

Seeded, pure generator — no external data, no wall clock. Emits the input
table per BASELINE.json ``input_hint``
``(url, warc_ts, html, text, lang)`` plus a ``snapshot`` column for the
incremental tests, and ground-truth sidecars:

- ``truth_pairs(a_url, b_url, kind in {exact, near, substring, boiler},
  jaccard_5gram)`` — exact 5-gram shingle jaccard computed in the generator.
- ``truth_clusters(url, cluster_id)`` — connected components of truth pairs
  with jaccard >= 0.7 (or exact).

Planted structure (reference analogue: the named near-dup images
``image8-like-image1.png`` and the demo expected-pairs comments,
/root/reference/similarities/similarities/examples/text_duplicates_demo.py:37-47):
~60% unique docs, exact-dup groups (2-5 urls, same text), near-dup groups at
graded token-edit rates spanning the LSH threshold, substring pairs sharing a
>=70-char verbatim span, and one hot boilerplate site whose pages share a large
template text (the LSH skew/salting test).

``extract_text(html) == text`` byte-identically for every row (asserted on a
sample at generation time).
"""

from __future__ import annotations

import html as _htmllib

import numpy as np
import pyarrow as pa

from imagededupx_ray.functions.text import extract_text

EPOCH_US = 1735689600000000  # 2025-01-01T00:00:00 UTC in microseconds

_SYLLABLES = [
    "ba", "co", "di", "fu", "ge", "ha", "ji", "ka", "lo", "mi", "na", "or",
    "pe", "qu", "ra", "su", "ti", "ul", "ve", "wa", "xi", "yo", "zu", "an",
    "el", "in", "os", "ur", "sta", "tro", "pla", "cre", "ment", "tion",
]


def _make_vocab(rng: np.random.Generator, size: int) -> np.ndarray:
    syl = np.array(_SYLLABLES)
    n_syl = rng.integers(2, 5, size=size)
    words = []
    for i in range(size):
        parts = syl[rng.integers(0, len(syl), size=n_syl[i])]
        words.append("".join(parts))
    return np.array(words)


def _jaccard_5gram(a_tokens: list[str], b_tokens: list[str], k: int = 5) -> float:
    def sh(toks):
        if len(toks) < k:
            return {tuple(toks)} if toks else set()
        return {tuple(toks[i : i + k]) for i in range(len(toks) - k + 1)}

    sa, sb = sh(a_tokens), sh(b_tokens)
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)


class _DSU:
    def __init__(self):
        self.p: dict = {}

    def find(self, x):
        p = self.p
        while p.setdefault(x, x) != x:
            p[x] = p[p[x]]
            x = p[x]
        return x

    def union(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.p[max(ra, rb)] = min(ra, rb)


def generate_pages(
    n_pages: int,
    seed: int = 42,
    with_truth: bool = True,
    n_sites: int = 20,
    jaccard_cluster_threshold: float = 0.7,
    token_scale: int = 1,
) -> tuple[pa.Table, pa.Table | None, pa.Table | None]:
    """Return (pages, truth_pairs, truth_clusters); truth tables None when
    ``with_truth`` is False (bench-scale runs skip truth emission).

    ``token_scale`` multiplies every document's token-count range — the
    dup-group structure (group sizes, edit rates, spans) is unchanged while
    per-doc extract/shingle/sign work grows ~linearly. token_scale=1 keeps
    the historical RNG stream byte-identical; larger values model real web
    pages, whose per-doc work is 10-100x this generator's default."""
    rng = np.random.default_rng(seed)
    vocab = _make_vocab(rng, 4000)

    def rand_tokens(lo: int, hi: int) -> list[str]:
        n = int(rng.integers(lo * token_scale, hi * token_scale))
        return list(vocab[rng.integers(0, len(vocab), size=n)])

    # ---- allocation --------------------------------------------------------
    n_hot = min(500, n_pages // 10) if n_pages >= 50 else 0
    n_exact_docs = n_pages // 10
    n_near_docs = (n_pages * 15) // 100
    n_sub_docs = (n_pages // 20) & ~1  # even
    edit_rates = [0.01, 0.02, 0.04, 0.07, 0.15]  # target jaccard ~.95/.9/.8/.7/.5

    texts: list[str] = []
    kinds: list[str] = []
    group_of: list[int] = []  # generator group id (for truth pair emission)
    next_group = 0

    def add(tokens: list[str], kind: str, group: int) -> None:
        texts.append(" ".join(tokens))
        kinds.append(kind)
        group_of.append(group)

    pair_rows: list[tuple[int, int, str]] = []  # (idx_a, idx_b, kind)

    # hot boilerplate site: big shared template text + tiny unique tail
    if n_hot:
        template = rand_tokens(140, 141)
        hot_start = len(texts)
        for i in range(n_hot):
            add(template + rand_tokens(8, 14), "boiler", next_group)
        for i in range(hot_start + 1, hot_start + n_hot):
            pair_rows.append((hot_start, i, "boiler"))  # star to the base
            if i > hot_start + 1:
                pair_rows.append((i - 1, i, "boiler"))  # chain
        next_group += 1

    # exact-dup groups: same text under 2-5 urls
    placed = 0
    while placed < n_exact_docs:
        size = int(rng.integers(2, 6))
        size = min(size, n_exact_docs - placed) if n_exact_docs - placed >= 2 else 2
        toks = rand_tokens(60, 260)
        base = len(texts)
        for j in range(size):
            add(toks, "exact", next_group)
        for j in range(base + 1, base + size):
            pair_rows.append((base, j, "exact"))
            if j > base + 1:
                pair_rows.append((j - 1, j, "exact"))
        next_group += 1
        placed += size

    # near-dup groups: base + token-substituted variants at graded edit rates
    placed = 0
    lvl = 0
    while placed < n_near_docs:
        size = int(rng.integers(2, 5))
        size = min(size, max(2, n_near_docs - placed))
        toks = rand_tokens(120, 300)
        base = len(texts)
        add(toks, "near", next_group)
        for j in range(1, size):
            rate = edit_rates[lvl % len(edit_rates)]
            lvl += 1
            var = list(toks)
            n_edit = max(1, int(len(var) * rate))
            pos = rng.choice(len(var), size=min(n_edit, len(var)), replace=False)
            repl = vocab[rng.integers(0, len(vocab), size=len(pos))]
            for p_i, r in zip(pos, repl):
                var[p_i] = r
            add(var, "near", next_group)
            pair_rows.append((base, base + j, "near"))
        next_group += 1
        placed += size

    # substring pairs: >=70-char shared verbatim span inside different docs
    for _ in range(n_sub_docs // 2):
        span = rand_tokens(18, 30)  # ~18 words * >=4 chars >> 70 chars
        a = rand_tokens(60, 150) + span + rand_tokens(60, 150)
        b = rand_tokens(60, 150) + span + rand_tokens(60, 150)
        base = len(texts)
        add(a, "substring", next_group)
        add(b, "substring", next_group)
        pair_rows.append((base, base + 1, "substring"))
        next_group += 1

    # unique docs fill the remainder
    while len(texts) < n_pages:
        add(rand_tokens(50, 300), "unique", next_group)
        next_group += 1
    texts = texts[:n_pages]
    kinds = kinds[:n_pages]
    group_of = group_of[:n_pages]
    pair_rows = [(a, b, k) for (a, b, k) in pair_rows if a < n_pages and b < n_pages]

    # ---- deterministic shuffle, urls, html, metadata -----------------------
    perm = rng.permutation(n_pages)  # position -> original idx
    pos_of = np.empty(n_pages, dtype=np.int64)
    pos_of[perm] = np.arange(n_pages)

    urls = np.empty(n_pages, dtype=object)
    langs = np.empty(n_pages, dtype=object)
    snapshots = np.empty(n_pages, dtype=np.int8)
    htmls: list[bytes] = [b""] * n_pages
    out_texts = np.empty(n_pages, dtype=object)
    ts = EPOCH_US + np.arange(n_pages, dtype=np.int64) * 1_000_000

    # snapshot split: last member of each multi-member group -> snapshot 1;
    # every 5th unique doc -> snapshot 1 (roughly 20% overall)
    last_of_group: dict[int, int] = {}
    group_size: dict[int, int] = {}
    for i, g in enumerate(group_of):
        last_of_group[g] = i
        group_size[g] = group_size.get(g, 0) + 1

    site_nav = {
        s: " ".join(f'<a href="/{w}">{w}</a>' for w in vocab[s * 7 : s * 7 + 5])
        for s in range(n_sites)
    }
    for pos in range(n_pages):
        i = int(perm[pos])
        site = i % n_sites if kinds[i] != "boiler" else n_sites  # hot site is its own
        urls[pos] = f"https://site{site}.example/p/{i:08d}"
        langs[pos] = "zh" if i % 37 == 0 else ("de" if i % 41 == 0 else "en")
        g = group_of[i]
        snapshots[pos] = (
            1
            if (group_size[g] >= 3 and last_of_group[g] == i)
            or (kinds[i] == "unique" and i % 5 == 4)
            else 0
        )
        body = "".join(f"<p>{_htmllib.escape(p)}</p>" for p in texts[i].split(" . "))
        htmls[pos] = (
            f"<html><head><title>page {i}</title></head><body>"
            f"<nav>{site_nav.get(site, 'hot nav')}</nav>"
            f"<main>{body}</main>"
            f"<footer>&copy; site{site}</footer></body></html>"
        ).encode("utf-8")
        out_texts[pos] = texts[i]

    # per-row invariant spot check (full check lives in tests)
    for pos in range(0, n_pages, max(1, n_pages // 20)):
        assert extract_text(htmls[pos]) == out_texts[pos], "extraction invariant broken"

    pages = pa.table(
        {
            "url": pa.array(urls.tolist(), type=pa.string()),
            "warc_ts": pa.array(ts, type=pa.timestamp("us")),
            "html": pa.array(htmls, type=pa.binary()),
            "text": pa.array(out_texts.tolist(), type=pa.string()),
            "lang": pa.array(langs.tolist(), type=pa.string()),
            "snapshot": pa.array(snapshots, type=pa.int8()),
        }
    )

    if not with_truth:
        return pages, None, None

    # ---- truth sidecars ----------------------------------------------------
    tok_cache: dict[int, list[str]] = {}

    def toks_of(i: int) -> list[str]:
        if i not in tok_cache:
            tok_cache[i] = texts[i].split(" ")
        return tok_cache[i]

    t_a, t_b, t_kind, t_jac = [], [], [], []
    url_by_idx = {int(perm[pos]): urls[pos] for pos in range(n_pages)}
    dsu = _DSU()
    for (ia, ib, kind) in pair_rows:
        j = 1.0 if kind == "exact" else _jaccard_5gram(toks_of(ia), toks_of(ib))
        t_a.append(url_by_idx[ia])
        t_b.append(url_by_idx[ib])
        t_kind.append(kind)
        t_jac.append(j)
        if kind == "exact" or j >= jaccard_cluster_threshold:
            dsu.union(ia, ib)
    truth_pairs = pa.table(
        {
            "a_url": pa.array(t_a, type=pa.string()),
            "b_url": pa.array(t_b, type=pa.string()),
            "kind": pa.array(t_kind, type=pa.string()),
            "jaccard_5gram": pa.array(t_jac, type=pa.float64()),
        }
    )
    roots = [dsu.find(i) for i in range(n_pages)]
    truth_clusters = pa.table(
        {
            "url": pa.array([url_by_idx[i] for i in range(n_pages)], type=pa.string()),
            "cluster_id": pa.array(roots, type=pa.int64()),
        }
    )
    return pages, truth_pairs, truth_clusters


def write_pages_corpus(
    out_dir: str,
    n_pages: int,
    seed: int = 42,
    with_truth: bool = True,
    rows_per_file: int = 8192,
    token_scale: int = 1,
) -> str:
    """Materialize the corpus as a directory of parquet files (the pipeline's
    actual input format) + truth sidecars. Idempotent: skips if a _SUCCESS
    marker exists for the same params. rows_per_file sizes read parallelism
    (one read task per file at minimum)."""
    import json
    import os

    import pyarrow.parquet as pq

    marker = os.path.join(out_dir, "_SUCCESS")
    params = {
        "n_pages": n_pages,
        "seed": seed,
        "with_truth": with_truth,
        "rows_per_file": rows_per_file,
    }
    if token_scale != 1:  # keep historical markers valid for the default
        params["token_scale"] = token_scale
    if os.path.exists(marker):
        with open(marker) as f:
            if json.load(f) == params:
                return out_dir
    os.makedirs(os.path.join(out_dir, "pages"), exist_ok=True)
    pages, tp, tc = generate_pages(
        n_pages, seed=seed, with_truth=with_truth, token_scale=token_scale
    )
    for i in range(0, max(1, pages.num_rows), rows_per_file):
        pq.write_table(
            pages.slice(i, rows_per_file),
            os.path.join(out_dir, "pages", f"part-{i // rows_per_file:05d}.parquet"),
        )
    if tp is not None:
        pq.write_table(tp, os.path.join(out_dir, "truth_pairs.parquet"))
        pq.write_table(tc, os.path.join(out_dir, "truth_clusters.parquet"))
    with open(marker, "w") as f:
        json.dump(params, f)
    return out_dir

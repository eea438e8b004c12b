"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash →
CORRECTNESS_r{N}.json). Results may be a ``ray.data.Dataset``, a
``pandas.DataFrame`` or a ``pyarrow.Table``; the driver converts.

Ray is initialised by the driver BEFORE this module is imported: neither
this module nor the library calls ``ray.init()`` / ``ray.shutdown()``.

Dedup-family queries (minhash / simhash / LSH / clusters) have no SQL
twin — DuckDB cannot reproduce blake2b-based signatures — and rely on the
driver's rows-only check; their real correctness gate is the pure-python
identical-config oracle in tests/test_pipeline.py (recall >= 0.99).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship near-dup pipeline over sf0.001 documents-as-pages: extract →
    exact dedup → minhash/simhash signatures → LSH banding → verify →
    union-find clusters. Returns the clusters Dataset."""
    from imagededupx_ray import queries as Q

    return Q.dedup_clusters("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from imagededupx_ray import queries as Q

    return {
        # SQL-oracled (driver value-hash gate)
        "docs_lang_counts": Q.docs_lang_counts,
        "docs_exact_dedup": Q.docs_exact_dedup,
        "docs_token_stats": Q.docs_token_stats,
        "docs_bpe_token_counts": Q.docs_bpe_token_counts,
        "docs_top_longest": Q.docs_top_longest,
        "token_jaccard_pairs": Q.token_jaccard_pairs,
        "q1_pricing_summary": Q.q1_pricing_summary,
        "orders_per_customer": Q.orders_per_customer,
        "events_hourly": Q.events_hourly,
        "events_user_stats": Q.events_user_stats,
        "knn_cosine": Q.knn_cosine,
        "tfidf_cosine_topk": Q.tfidf_cosine_topk,
        "docs_quality": Q.docs_quality,
        "docs_fingerprint_md5": Q.docs_fingerprint_md5,
        "embedding_dup_pairs": Q.embedding_dup_pairs,
        # non-SQL-expressible (rows-only check; gated by pytest oracle instead)
        "dedup_clusters": Q.dedup_clusters,
        "dedup_cluster_report": Q.dedup_cluster_report,
        "minhash_signatures": Q.minhash_signatures,
        "lsh_pairs": Q.lsh_pairs,
        "docs_langid": Q.docs_langid,
        "docs_winnow_fingerprints": Q.docs_winnow_fingerprints,
        "simhash_dup_pairs": Q.simhash_dup_pairs,
        "ann_cosine": Q.ann_cosine,
        "ann_hnsw": Q.ann_hnsw,
        "embedding_dup_pairs_ann": Q.embedding_dup_pairs_ann,
        "image_decode_features": Q.image_decode_features,
        "image_perceptual_hashes": Q.image_perceptual_hashes,
        "image_phash_dup_pairs": Q.image_phash_dup_pairs,
        "bm25_search": Q.bm25_search,
        "tfidf_search": Q.tfidf_search,
        "ensemble_search": Q.ensemble_search,
        "substring_spans_docs": Q.substring_spans_docs,
    }


_TOKS = "list_distinct(string_split_regex(lower(trim(text)), '\\s+'))"


def oracle_sql() -> dict[str, str]:
    return {
        "docs_lang_counts": (
            "SELECT lang, source, COUNT(*) AS n_docs, "
            "ROUND(AVG(n_chars), 6) AS avg_chars "
            "FROM documents GROUP BY lang, source"
        ),
        "docs_exact_dedup": (
            "SELECT text, MIN(doc_id) AS canonical_doc_id, "
            "COUNT(*) AS n_exact_dups FROM documents GROUP BY text"
        ),
        "docs_token_stats": (
            "SELECT doc_id, "
            "CASE WHEN trim(text) = '' THEN 0 ELSE "
            "len(string_split_regex(lower(trim(text)), '\\s+')) END AS n_tokens, "
            "CASE WHEN trim(text) = '' THEN 0 ELSE "
            f"len({_TOKS}) END AS n_unique_tokens "
            "FROM documents"
        ),
        "docs_top_longest": (
            "SELECT doc_id, n_chars FROM documents "
            "ORDER BY n_chars DESC, doc_id LIMIT 20"
        ),
        "docs_bpe_token_counts": (
            "SELECT doc_id, CAST(len(regexp_extract_all(text, "
            "'[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]')) AS BIGINT) AS n_bpe_tokens "
            "FROM documents"
        ),
        "token_jaccard_pairs": (
            f"WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents), "
            "s AS (SELECT a.doc_id AS a, b.doc_id AS b, "
            "CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE) / "
            "(len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks))) AS j "
            "FROM t a JOIN t b ON a.doc_id < b.doc_id) "
            "SELECT a, b, ROUND(j, 6) AS jaccard FROM s WHERE j >= 0.4"
        ),
        "q1_pricing_summary": (
            "SELECT l_returnflag, l_linestatus, "
            "ROUND(SUM(l_quantity), 2) AS sum_qty, "
            "ROUND(SUM(l_extendedprice), 2) AS sum_base_price, "
            "ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price, "
            "ROUND(AVG(l_quantity), 6) AS avg_qty, "
            "ROUND(AVG(l_discount), 6) AS avg_disc, "
            "COUNT(*) AS count_order "
            "FROM lineitem GROUP BY l_returnflag, l_linestatus"
        ),
        "orders_per_customer": (
            "SELECT c.c_custkey AS c_custkey, c.c_mktsegment AS c_mktsegment, "
            "agg.n_orders AS n_orders, ROUND(agg.total_spent, 2) AS total_spent "
            "FROM customer c JOIN (SELECT o_custkey, COUNT(*) AS n_orders, "
            "SUM(o_totalprice) AS total_spent FROM orders GROUP BY o_custkey) agg "
            "ON c.c_custkey = agg.o_custkey"
        ),
        "events_hourly": (
            "SELECT event_type, "
            "CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_epoch, "
            "COUNT(*) AS n_events, ROUND(SUM(value), 4) AS sum_value "
            "FROM events GROUP BY 1, 2"
        ),
        "events_user_stats": (
            "SELECT user_id, COUNT(*) AS n_events, "
            "ROUND(SUM(value), 4) AS total_value, "
            "epoch_us(MIN(ts)) AS first_ts_us, epoch_us(MAX(ts)) AS last_ts_us "
            "FROM events GROUP BY user_id"
        ),
        "tfidf_cosine_topk": (
            "WITH toks AS (SELECT doc_id, unnest(string_split_regex(lower(trim(text)), "
            "'\\s+')) AS tok FROM documents WHERE trim(text) <> ''), "
            "tf AS (SELECT doc_id, tok, CAST(COUNT(*) AS DOUBLE) AS tf "
            "FROM toks GROUP BY 1, 2), "
            "df AS (SELECT tok, CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS df "
            "FROM toks GROUP BY 1), "
            "nn AS (SELECT CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS n FROM toks), "
            "w AS (SELECT doc_id, tok, tf * ln((SELECT n FROM nn) / df) AS wt "
            "FROM tf JOIN df USING (tok)), "
            "nrm AS (SELECT doc_id, SQRT(SUM(wt * wt)) AS nrm FROM w GROUP BY doc_id), "
            "s AS (SELECT q.doc_id AS query_id, d.doc_id AS neighbor_id, "
            "SUM(q.wt * d.wt) / (ANY_VALUE(qq.nrm) * ANY_VALUE(dd.nrm)) AS cos "
            "FROM w q JOIN w d ON q.tok = d.tok AND q.doc_id < 10 "
            "AND d.doc_id <> q.doc_id "
            "JOIN nrm qq ON qq.doc_id = q.doc_id JOIN nrm dd ON dd.doc_id = d.doc_id "
            "GROUP BY 1, 2) "
            "SELECT query_id, neighbor_id, ROUND(cos, 6) AS cosine FROM "
            "(SELECT *, row_number() OVER "
            "(PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rn FROM s) "
            "WHERE rn <= 10"
        ),
        "docs_quality": (
            "SELECT doc_id, length(text) AS n_chars, "
            "length(regexp_replace(text, '[^0-9]', '', 'g')) AS n_digits, "
            "length(regexp_replace(text, '[^A-Z]', '', 'g')) AS n_upper, "
            "length(regexp_replace(text, '[^ ]', '', 'g')) AS n_spaces, "
            "ROUND(CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE)"
            " / GREATEST(length(text), 1), 6) AS digit_ratio, "
            "ROUND(CAST(length(regexp_replace(text, '[^A-Z]', '', 'g')) AS DOUBLE)"
            " / GREATEST(length(text), 1), 6) AS upper_ratio, "
            "ROUND(CAST(length(regexp_replace(text, '[^ ]', '', 'g')) AS DOUBLE)"
            " / GREATEST(length(text), 1), 6) AS space_ratio "
            "FROM documents"
        ),
        "docs_fingerprint_md5": (
            "SELECT doc_id, md5(text) AS md5 FROM documents"
        ),
        "embedding_dup_pairs": (
            "WITH e AS (SELECT vec_id, "
            "list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings), "
            "s AS (SELECT a.vec_id AS a, b.vec_id AS b, "
            "list_cosine_similarity(a.v, b.v) AS cos "
            "FROM e a JOIN e b ON a.vec_id < b.vec_id) "
            "SELECT a, b, ROUND(cos, 6) AS cosine FROM s WHERE cos >= 0.4"
        ),
        "knn_cosine": (
            "WITH e AS (SELECT vec_id, "
            "list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings), "
            "s AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, "
            "list_cosine_similarity(q.v, c.v) AS cos "
            "FROM e q JOIN e c ON q.vec_id < 10 AND c.vec_id <> q.vec_id) "
            "SELECT query_id, neighbor_id, ROUND(cos, 6) AS cosine FROM "
            "(SELECT *, row_number() OVER "
            "(PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rn FROM s) "
            "WHERE rn <= 10"
        ),
    }

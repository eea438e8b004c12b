"""Corpus readers: normalize heterogeneous inputs to the ``pages`` schema
(SURVEY.md §2.1 S1/S2 — the reference's directory scanner and chunked
CSV/TXT reader, faiss_bert_similarity.py:50-62; Ray Data's datasources
replace both the os.walk listing and the 10k-row chunk loop).
"""

from __future__ import annotations

import pyarrow as pa
import ray.data as rd


def read_pages(path: str, format: str = "parquet", text_column: str = "text"):
    """Read a corpus directory/file as a pages-schema Dataset.

    - parquet: columns used as-is (missing optional columns filled null)
    - csv / json: ``text_column`` becomes ``text``; url synthesized from an
      id column when present, else from the row's content hash (stable,
      content-derived — never positional, unlike the reference's
      ``df.iloc[faiss_id]``).
    """
    if format == "parquet":
        ds = rd.read_parquet(path)
    elif format == "csv":
        ds = rd.read_csv(path)
    elif format == "json":
        ds = rd.read_json(path)
    else:
        raise ValueError(f"unsupported format: {format}")

    def normalize(batch: pa.Table) -> pa.Table:
        from imagededupx_ray.functions.hashing import doc_id_of

        n = batch.num_rows
        names = set(batch.column_names)
        if text_column not in names:
            raise ValueError(f"input lacks text column {text_column!r}")
        text = batch[text_column].cast(pa.string())
        if "url" in names:
            url = batch["url"].cast(pa.string())
        else:
            id_col = next((c for c in ("doc_id", "id", "_id") if c in names), None)
            if id_col is not None:
                url = pa.array(
                    [f"doc://{v}" for v in batch[id_col].to_pylist()], type=pa.string()
                )
            else:
                url = pa.array(
                    [f"content://{doc_id_of(t or '')}" for t in text.to_pylist()],
                    type=pa.string(),
                )
        return pa.table(
            {
                "url": url,
                "warc_ts": batch["warc_ts"].cast(pa.timestamp("us"))
                if "warc_ts" in names
                else pa.nulls(n, pa.timestamp("us")),
                "html": batch["html"].cast(pa.binary())
                if "html" in names
                else pa.nulls(n, pa.binary()),
                "text": text,
                "lang": batch["lang"].cast(pa.string())
                if "lang" in names
                else pa.nulls(n, pa.string()),
            }
        )

    return ds.map_batches(normalize, batch_format="pyarrow")

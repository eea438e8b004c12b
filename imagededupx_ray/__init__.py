"""imagededupx_ray — a Ray-Data-native near-duplicate detection + clustering engine.

Brand-new engine with the query/data-processing capabilities of the reference
repo cloudybai/ImageDedupX (see SURVEY.md), re-expressed Ray-Data-first:
``ray.data.Dataset`` pipelines of ``map_batches`` over zero-copy Arrow batches,
actor pools for stateful stages, groupby shuffles for the wide steps.

Layout:
  config     — frozen dedup configuration (shingle/minhash/simhash/LSH params)
  schemas    — explicit pyarrow schemas for every logical table
  functions/ — pure vectorized kernels (hashing, text, distances)
  stages/    — map_batches / groupby stages (extract, signatures, lsh, verify,
               cluster, spans, dedup, textstats, ann)
  sources/   — synthetic pages generator + readers
  state/     — checkpoint manifests + incremental snapshot merge
  pipelines/ — end-to-end pipeline compositions
"""

from imagededupx_ray.config import DedupConfig, DEFAULT_CONFIG

__all__ = ["DedupConfig", "DEFAULT_CONFIG"]
__version__ = "0.1.0"

"""code_indexer_ray — a Ray-Data-native full-text index build + BM25 query engine.

A brand-new engine with the query/data-processing capabilities of the
reference ``jsbattig/code-indexer`` FTS path (see /root/repo/SURVEY.md),
re-expressed Ray-Data-first:

- ``ray.data.Dataset`` pipelines over zero-copy Arrow batches,
- one explicit wide shuffle (``groupby((shard, bucket))``) building
  delta+varbyte-compressed posting lists with block-max metadata,
- doc-range sharding as the skew-bounding strategy for Zipf head terms,
- per-partition atomic segment writes + manifests for resumability,
- a top-k BM25 query engine (intersection with block skipping, MaxScore
  pruning, fuzzy/regex term-dictionary expansion) reproducing the
  reference's search semantics (filter precedence, over-fetch, snippets).

Everything here derives from public knowledge only: the Ray Data / pyarrow
APIs, the reference repo's observable behavior, and published IR techniques
(BM25, varbyte postings, block-max WAND/MaxScore, Lucene SmallFloat norms).
"""

__version__ = "0.1.0"

"""rayindex — a Ray-Data-native full-text index build + BM25 query engine.

Built from scratch with the query/data-processing capabilities of the
reference project ``timhuijsmans1/search_engine`` (see SURVEY.md), expressed
Ray-Data-first: ``ray.data.Dataset`` -> ``map_batches`` over zero-copy Arrow
batches, salted ``groupby`` shuffles for posting merge, stateful actor pools
for query serving.

Public API lives in :mod:`rayindex.engine`.
"""

from rayindex.config import AnalyzerConfig, BuildConfig, SearchConfig  # noqa: F401

__version__ = "0.1.0"

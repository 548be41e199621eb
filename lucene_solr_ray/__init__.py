"""lucene_solr_ray — a Ray-Data-native full-text index + BM25 query engine.

A from-scratch reimplementation of the query / data-processing capabilities
of the reference (`technologycoder/lucene-solr`, a fork of apache/lucene-solr)
expressed Ray-Data-first:

- `analysis/`   StandardAnalyzer-equivalent tokenize/lowercase/stop chain,
                vectorized over Arrow batches (ref: lucene/core/.../analysis/
                standard/StandardAnalyzer.java :: createComponents).
- `index/`      SPIMI-style inverted index build: map_batches invert →
                groupby(term) shuffle → merge + delta/varbyte encode with
                block-max metadata; SmallFloat byte norms; manifest + resume
                (ref: lucene/core/.../index/DefaultIndexingChain.java,
                codecs/lucene84/Lucene84PostingsWriter.java).
- `search/`     Stateful actor pool serving top-k BM25 (k1=1.2, b=0.75,
                Lucene byte-norm), boolean + phrase queries, block-max
                pruning (ref: lucene/core/.../search/similarities/
                BM25Similarity.java, TopScoreDocCollector.java).
- `pipelines/`  Solr-style relational / streaming-expression operators
                (facets, rollups, joins, dedup, stats) plus large-scale
                training-data ops (minhash/simhash dedup, ANN, language id).

Nothing here is a port: all execution is `ray.data.Dataset` pipelines over
zero-copy Arrow batches.  This package never calls ray.init()/shutdown();
sessions are owned by bench.py / tests / the driver.
"""

from . import _compat  # noqa: F401  (fsspec/aiohttp import-race stub)

__version__ = "0.1.0"

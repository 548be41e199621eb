"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported; nothing
here (or in lucene_solr_ray) calls ray.init()/ray.shutdown().

- entry():      flagship pipeline — full inverted-index build over a
  transcript-shaped corpus derived from sf0.001 documents + top-k BM25
  search through the shard actor pool; returns the hits table.
- queries():    one entry per implemented operator pipeline (SURVEY.md §2
  inventory + training-data ops).
- oracle_sql(): DuckDB twin for every SQL-expressible entry, including an
  independent SQL reimplementation of quantized-norm BM25.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path
from typing import Any

sys.path.insert(0, str(Path(__file__).parent))

from lucene_solr_ray.pipelines import REGISTRY


def entry() -> Any:
    from lucene_solr_ray.pipelines.fulltext import bm25_topk

    return bm25_topk("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    return {name: p.fn for name, p in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: p.sql for name, p in REGISTRY.items() if p.sql is not None}

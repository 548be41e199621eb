"""Operator-pipeline registry: every SURVEY.md §2 operator family exposed
through the driver contract (`__ray_entry__.queries` / `oracle_sql`)."""

from __future__ import annotations

from .common import Pipeline
from . import ann, audio, bpe, curate, dedup, dsir, evaluators, facets, fulltext, geo, gif, graph, highlight, hybrid, images, lm, ml, monitor, multilingual, multimodal, quality, relational, richdoc, sketches, sql, streaming, streams, text
from ..sources import dih, loaders

REGISTRY: dict[str, Pipeline] = {}
for _mod in (relational, text, dedup, ann, streaming, multimodal, fulltext, graph, sketches, facets, evaluators, geo, ml, sql, streams, lm, images, audio, gif, monitor, curate, multilingual, highlight, dsir, quality, hybrid, bpe, richdoc):
    for _name, _p in _mod.PIPELINES.items():
        if _name in REGISTRY:
            raise ValueError(f"duplicate pipeline name {_name}")
        REGISTRY[_name] = _p
for _src in (dih, loaders):  # sources registry hook (deferred to avoid a
    for _name, _p in _src.pipelines().items():  # pipelines<->sources cycle)
        if _name in REGISTRY:
            raise ValueError(f"duplicate pipeline name {_name}")
        REGISTRY[_name] = _p

__all__ = ["REGISTRY", "Pipeline"]

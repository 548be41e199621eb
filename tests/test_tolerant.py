"""shards.tolerant partial results: a dead shard actor is skipped, the
answer covers the live subset, and `last_partial` reports degradation
(SearchHandler partialResults semantics)."""

import shutil

import pytest

from lucene_solr_ray.fixtures import write_transcripts
from lucene_solr_ray.index.build import build_index
from lucene_solr_ray.search import Searcher


def test_shards_tolerant_partial_results(ray_session):
    import ray

    paths = write_transcripts("/tmp/lsr_tol_corpus", 80, 4)
    shutil.rmtree("/tmp/lsr_tol_index", ignore_errors=True)
    build_index(paths, "/tmp/lsr_tol_index", files_per_shard=2)  # 2 shards
    s = Searcher("/tmp/lsr_tol_index")
    try:
        full = s.search("error", 50)
        full_count = s.count("error")
        assert full and full_count > 0

        ray.kill(s.actors[0])
        # default (tolerant off): the dead shard fails the request
        with pytest.raises(ray.exceptions.RayActorError):
            s.search("error", 50)

        s.tolerant = True
        part = s.search("error", 50)
        assert s.last_partial is True
        full_scores = dict(full)
        assert part  # the live shard still answers
        assert len(part) < len(full)
        for d, sc in part:  # subset of the full answer, identical scores
            assert full_scores[d] == sc
        # every scatter op inherits: count over the live subset only
        assert 0 < s.count("error") < full_count
        assert s.last_partial is True
        # healthy scatter on the live shard resets the flag only per call
        s.tolerant = False
        with pytest.raises(ray.exceptions.RayActorError):
            s.count("error")
    finally:
        s.close()

"""BaseSimilarityTestCase analog (lucene/test-framework/.../search/
similarities/BaseSimilarityTestCase.java, SURVEY §5.2): every registered
similarity kernel must produce scores that are finite, non-negative,
weakly increasing in freq, and weakly decreasing in document length —
checked over randomized (freq, norm byte, stats) draws."""

import numpy as np
import pytest

from lucene_solr_ray.index.smallfloat import LENGTH_TABLE
from lucene_solr_ray.search import bm25 as S

rng = np.random.default_rng(20260818)

# norm bytes ordered by DECODED length so "longer doc" is well-defined
_BYTES_BY_LEN = np.argsort(LENGTH_TABLE, kind="stable").astype(np.int64)


def _kernels(n_docs, df, cf, avgdl):
    sum_ttf = max(int(avgdl * n_docs), cf + 1)
    dfr_tbl = S.make_dfr_table(avgdl)
    axio_tbl = S.make_axiomatic_table(avgdl)
    norm_cache = S.make_norm_cache(avgdl)
    return {
        "bm25": lambda f, b: S.score_postings(
            f, b, np.log(1.0 + (n_docs - df + 0.5) / (df + 0.5)), norm_cache
        ),
        "classic": lambda f, b: S.score_postings_classic(f, b, S.classic_idf(df, n_docs)),
        "lm": lambda f, b: S.score_postings_lm(f, b, cf / sum_ttf),
        "lmjm": lambda f, b: S.score_postings_lmjm(f, b, cf / sum_ttf),
        "dfr": lambda f, b: S.score_postings_dfr(f, b, S.dfr_weight(df, n_docs), dfr_tbl),
        "dfr_if": lambda f, b: S.score_postings_dfr(f, b, S.dfr_if_weight(cf, n_docs), dfr_tbl),
        "dfr_ine": lambda f, b: S.score_postings_dfr(f, b, S.dfr_ine_weight(cf, n_docs), dfr_tbl),
        "ib": lambda f, b: S.score_postings_ib(f, b, S.ib_lambda(df, n_docs), dfr_tbl),
        "axiomatic": lambda f, b: S.score_postings_axiomatic(f, b, S.axiomatic_idf(df, n_docs), axio_tbl),
        "bool": lambda f, b: S.score_postings_bool(f, 1.0),
        "dfi": lambda f, b: S.score_postings_dfi(f, b, cf / sum_ttf, "dfi"),
        "dfi_standardized": lambda f, b: S.score_postings_dfi(f, b, cf / sum_ttf, "dfi_standardized"),
        "dfi_saturated": lambda f, b: S.score_postings_dfi(f, b, cf / sum_ttf, "dfi_saturated"),
    }


@pytest.mark.parametrize("trial", range(30))
def test_similarity_score_properties(trial):
    n_docs = int(rng.integers(10, 10**6))
    df = int(rng.integers(1, n_docs + 1))
    cf = int(df + rng.integers(0, 5 * df))
    avgdl = float(rng.uniform(5, 200))
    freqs = np.sort(rng.integers(1, 200, size=16)).astype(np.int64)
    for name, k in _kernels(n_docs, df, cf, avgdl).items():
        # (1) finite + non-negative across random norm bytes
        bts = rng.integers(0, 256, size=16).astype(np.int64)
        s = k(freqs, bts)
        assert np.isfinite(s).all(), name
        assert (s >= 0).all(), name
        # (2) weakly increasing in freq at a fixed norm
        b0 = np.full(16, int(bts[0]), dtype=np.int64)
        s_f = k(freqs, b0)
        assert (np.diff(s_f) >= -1e-12).all(), (name, "freq monotonicity")
        # (3) weakly decreasing in doc length at a fixed freq
        f0 = np.full(_BYTES_BY_LEN.size, int(freqs[-1]), dtype=np.int64)
        s_l = k(f0, _BYTES_BY_LEN)
        assert (np.diff(s_l) <= 1e-12).all(), (name, "length monotonicity")

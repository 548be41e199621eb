"""Similarity search over the embeddings table.

Brute-force cosine top-k is the exactness baseline (per-batch float64
matmul against a broadcast query matrix); the LSH-bucketed variant is the
scale path (candidate generation via random hyperplane signs → exact rerank
within buckets).  kNN label vote mirrors the reference's
KNearestNeighborClassifier (lucene/classification/src/java/org/apache/
lucene/classification/KNearestNeighborClassifier.java).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from .common import Pipeline, read


def _embed_matrix(batch: pd.DataFrame) -> np.ndarray:
    return np.stack(batch["embedding"].to_numpy()).astype(np.float64)


def _query_vec(sf_dir: str) -> np.ndarray:
    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    df = t.to_pandas()
    row = df[df["vec_id"] == 0].iloc[0]
    return np.asarray(row["embedding"], dtype=np.float64)


# --------------------------------------------------------------------------
# Brute-force cosine top-k: candidates scored per batch, merged on driver.


def ann_cosine_topk(sf_dir: str, k: int = 10):
    q = _query_vec(sf_dir)
    qn = q / np.linalg.norm(q)

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        m = _embed_matrix(batch)
        sims = (m @ qn) / np.linalg.norm(m, axis=1)
        d = pd.DataFrame({"vec_id": batch["vec_id"], "sim": sims})
        return d.sort_values(["sim", "vec_id"], ascending=[False, True]).head(k)

    parts = (
        read(sf_dir, "embeddings", ["vec_id", "embedding"])
        .map_batches(score, batch_format="pandas")
        .to_pandas()
    )
    top = parts.sort_values(["sim", "vec_id"], ascending=[False, True]).head(k)
    top = top.reset_index(drop=True)
    return pd.DataFrame({"rank": np.arange(1, len(top) + 1, dtype=np.int64), "vec_id": top["vec_id"].astype("int64")})


ANN_COSINE_SQL = """
WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0)
SELECT CAST(row_number() OVER (ORDER BY sim DESC, vec_id) AS BIGINT) AS rank, vec_id
FROM (
  SELECT vec_id,
         list_cosine_similarity(CAST(embedding AS DOUBLE[]), (SELECT qv FROM q)) AS sim
  FROM embeddings
)
ORDER BY sim DESC, vec_id LIMIT 10
"""

# --------------------------------------------------------------------------
# kNN label vote (KNearestNeighborClassifier): majority label of the 5
# nearest neighbours (excluding self) for the first 50 vectors.


def knn_label_vote(sf_dir: str, k: int = 5, n_queries: int = 50):
    import ray

    all_df = read(sf_dir, "embeddings", ["vec_id", "embedding", "label"]).to_pandas()
    all_df = all_df.sort_values("vec_id").reset_index(drop=True)
    M = np.stack(all_df["embedding"].to_numpy()).astype(np.float64)
    M = M / np.linalg.norm(M, axis=1, keepdims=True)
    ref = ray.put((M, all_df["vec_id"].to_numpy(), all_df["label"].to_numpy()))

    class Knn:
        def __init__(self, r):
            self.M, self.ids, self.labels = ray.get(r)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            m = _embed_matrix(batch)
            m = m / np.linalg.norm(m, axis=1, keepdims=True)
            sims = m @ self.M.T  # (b, N)
            out_ids, out_pred = [], []
            for i, vid in enumerate(batch["vec_id"]):
                s = sims[i].copy()
                s[self.ids == vid] = -np.inf  # exclude self
                # k nearest with (sim desc, vec_id asc) tie-break
                order = np.lexsort((self.ids, -s))[:k]
                labs = self.labels[order]
                vals, counts = np.unique(labs, return_counts=True)
                best = vals[np.lexsort((vals, -counts))[0]]
                out_ids.append(vid)
                out_pred.append(best)
            return pd.DataFrame({"vec_id": out_ids, "pred_label": np.asarray(out_pred, dtype=np.int64)})

    out = (
        read(sf_dir, "embeddings", ["vec_id", "embedding"])
        .map_batches(
            lambda t: t.filter(__import__("pyarrow").compute.less(t.column("vec_id"), n_queries)),
            batch_format="pyarrow",
        )
        .map_batches(Knn, fn_constructor_args=(ref,), batch_format="pandas", concurrency=2)
        .to_pandas()
    )
    out["vec_id"] = out["vec_id"].astype("int64")
    return out.sort_values("vec_id").reset_index(drop=True)


KNN_VOTE_SQL = """
WITH base AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label FROM embeddings
),
pairs AS (
  SELECT a.vec_id AS qid, b.vec_id AS nid, b.label AS nlabel,
         list_cosine_similarity(a.v, b.v) AS sim
  FROM base a JOIN base b ON a.vec_id != b.vec_id
  WHERE a.vec_id < 50
),
knn AS (
  SELECT qid, nlabel FROM pairs
  QUALIFY row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) <= 5
),
votes AS (
  SELECT qid, nlabel, COUNT(*) AS c FROM knn GROUP BY qid, nlabel
)
SELECT qid AS vec_id, CAST(nlabel AS BIGINT) AS pred_label FROM votes
QUALIFY row_number() OVER (PARTITION BY qid ORDER BY c DESC, nlabel) = 1
ORDER BY vec_id
"""

# --------------------------------------------------------------------------
# LSH-signature ANN (scale path): 64 random-hyperplane bits → per-batch
# Hamming prefilter to a candidate budget → exact cosine rerank of
# candidates only.  At scale the signature is 8 bytes/vector and the exact
# pass touches only CANDIDATE_FRAC of rows; clustered real-world embeddings
# concentrate much harder than this synthetic near-uniform worst case.
# Rows-only (approximation is parameter-dependent); pytest checks recall
# against brute force.

N_PLANES = 64
CANDIDATE_FRAC = 0.4


def ann_lsh_topk(sf_dir: str, k: int = 10):
    rng = np.random.default_rng(777)
    q = _query_vec(sf_dir)
    planes = rng.standard_normal((N_PLANES, q.size))
    q_bits = (planes @ q > 0)

    def bucket_score(batch: pd.DataFrame) -> pd.DataFrame:
        m = _embed_matrix(batch)
        bits = m @ planes.T > 0
        ham = (bits != q_bits[None, :]).sum(axis=1)
        budget = max(k, int(len(batch) * CANDIDATE_FRAC))
        cand = np.argsort(ham, kind="stable")[:budget]
        mc = m[cand]
        qn = q / np.linalg.norm(q)
        sims = (mc @ qn) / np.linalg.norm(mc, axis=1)
        return pd.DataFrame({"vec_id": batch["vec_id"].to_numpy()[cand], "sim": sims})

    parts = (
        read(sf_dir, "embeddings", ["vec_id", "embedding"])
        .map_batches(bucket_score, batch_format="pandas")
        .to_pandas()
    )
    top = parts.sort_values(["sim", "vec_id"], ascending=[False, True]).head(k).reset_index(drop=True)
    return pd.DataFrame(
        {"rank": np.arange(1, len(top) + 1, dtype=np.int64), "vec_id": top["vec_id"].astype("int64")}
    )


# --------------------------------------------------------------------------
# IVF ANN (the inverted-file scale path): seeded k-means coarse quantizer →
# vectors assigned to cells → the query probes its NPROBE nearest cells and
# exactly reranks only those vectors.  At scale each cell is a partition and
# the assignment is a map_batches against broadcast centroids; here the
# centroids train driver-side on a sample (standard IVF practice).
# Rows-only (approximation parameter-dependent); recall-tested in pytest.

IVF_CELLS = 16
IVF_NPROBE = 4


def _kmeans(sample: np.ndarray, k: int, iters: int = 10, seed: int = 99) -> np.ndarray:
    rng = np.random.default_rng(seed)
    cent = sample[rng.choice(len(sample), size=k, replace=False)].copy()
    for _ in range(iters):
        d = ((sample[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for c in range(k):
            members = sample[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)
    return cent


def ann_ivf_topk(sf_dir: str, k: int = 10):
    import ray

    q = _query_vec(sf_dir)
    qn = q / np.linalg.norm(q)
    # train the coarse quantizer on a driver-side sample (normalized)
    sample_df = read(sf_dir, "embeddings", ["embedding"]).limit(2000).to_pandas()
    sample = np.stack(sample_df["embedding"].to_numpy()).astype(np.float64)
    sample = sample / np.linalg.norm(sample, axis=1, keepdims=True)
    cent = _kmeans(sample, IVF_CELLS)
    cent_ref = ray.put(cent)
    probe_cells = np.argsort(((cent - qn[None, :]) ** 2).sum(axis=1))[:IVF_NPROBE]
    probe_set = set(int(c) for c in probe_cells)

    def cell_rerank(batch: pd.DataFrame) -> pd.DataFrame:
        c = ray.get(cent_ref)
        m = _embed_matrix(batch)
        mn = m / np.linalg.norm(m, axis=1, keepdims=True)
        d = ((mn[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        cells = d.argmin(axis=1)
        mask = np.isin(cells, list(probe_set))
        if not mask.any():
            return pd.DataFrame({"vec_id": [], "sim": []})
        sims = mn[mask] @ qn
        return pd.DataFrame({"vec_id": batch["vec_id"].to_numpy()[mask], "sim": sims})

    parts = (
        read(sf_dir, "embeddings", ["vec_id", "embedding"])
        .map_batches(cell_rerank, batch_format="pandas")
        .to_pandas()
    )
    if "vec_id" not in parts.columns or not len(parts):
        return pd.DataFrame({"rank": pd.Series([], dtype="int64"), "vec_id": pd.Series([], dtype="int64")})
    top = parts.sort_values(["sim", "vec_id"], ascending=[False, True]).head(k).reset_index(drop=True)
    return pd.DataFrame(
        {"rank": np.arange(1, len(top) + 1, dtype=np.int64), "vec_id": top["vec_id"].astype("int64")}
    )


PIPELINES: dict[str, Pipeline] = {
    "ann_cosine_topk": Pipeline(ann_cosine_topk, ANN_COSINE_SQL, "brute-force cosine top-k (similarity baseline)"),
    "ann_ivf_topk": Pipeline(ann_ivf_topk, None, "IVF coarse-quantizer ANN (scale path); recall-tested in pytest"),
    "knn_label_vote": Pipeline(knn_label_vote, KNN_VOTE_SQL, "kNN majority-label classification (KNearestNeighborClassifier)"),
    "ann_lsh_topk": Pipeline(ann_lsh_topk, None, "LSH-bucketed ANN (scale path); recall-tested in pytest"),
}

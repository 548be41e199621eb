"""Streaming-evaluator pipelines (SURVEY.md §2.9(b)) — the math/ML surface
of the reference's streaming expressions (solr/solrj/.../io/eval/), each
driven distributed: `map_batches` partials collect EXACT integer moments /
bucketed sums, the evaluator functions (`functions/evaluators.py`) derive
the floats with formulas a SQL twin replicates bit-for-bit.

- regression_ols      RegressionEvaluator   (gated, HUGEINT moment twin)
- correlation_moments CorrelationEvaluator  (gated)
- moving_average      MovingAverageEvaluator(gated, window twin)
- facet_sample        sampling pre-stage + facet (gated, same hash in SQL)
- kmeans_clusters     KmeansEvaluator       (rows-only; determinism+pytest)
- fft_magnitude       FFTEvaluator          (rows-only; pytest Parseval)
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..functions.evaluators import corr_from_moments, fft_magnitude, kmeans, moving_average, ols_from_moments
from .common import Pipeline, cents, hugeint_to_double as h2d, read, ts_us
from .relational import _M32, _SAMPLE_C1, _SAMPLE_C2, _SAMPLE_SEED, _sample_hash

_EPOCH0_DAYS = np.datetime64("1990-01-01", "us").astype("int64") // 86_400_000_000


def _exact_sum(v: np.ndarray) -> int:
    """Overflow-free sum of an int64 array whose ELEMENTS fit int64 but whose
    total may not (Ray passes whole blocks as batches, so a 150k-row block of
    cents² partials overflows a naive int64 sum).  Chunk so each chunk-sum
    stays below 2^62, accumulate chunks as Python ints."""
    if v.size == 0:
        return 0
    m = int(np.abs(v).max())
    if m == 0:
        return 0
    chunk = max(1, (1 << 62) // (m + 1))
    if v.size <= chunk:
        return int(v.sum())
    return sum(int(v[i : i + chunk].sum()) for i in range(0, v.size, chunk))


def _exact_prod_sum(a: np.ndarray, b: np.ndarray) -> int:
    """Σ a[i]*b[i] with Python-int exactness; vectorized when per-element
    products fit int64, object-array fallback otherwise."""
    if a.size == 0:
        return 0
    ma, mb = int(np.abs(a).max()), int(np.abs(b).max())
    if ma * mb < (1 << 62):
        return _exact_sum(a * b)
    return int((a.astype(object) * b.astype(object)).sum())


_HILO_SHIFT = 60  # per-batch moments can exceed int64 (cents² × block rows);
_HILO_MASK = (1 << _HILO_SHIFT) - 1  # ship them as (hi, lo) int64 column pairs
_MOMENTS = ("sx", "sy", "sxy", "sxx", "syy")


def _xy_moments(sf_dir: str):
    """Exact integer moments of (x = days since 1990-01-01 of o_orderdate,
    y = o_totalprice cents) collected as per-batch partial sums.  Each moment
    travels as a (hi, lo) pair because the per-batch Python-int sum may not
    fit an int64 Arrow column (a 150k-row block of y² partials is ~5e20)."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        x = ts_us(batch["o_orderdate"]) // 86_400_000_000 - _EPOCH0_DAYS
        y = cents(batch["o_totalprice"].to_numpy())
        vals = {
            "sx": _exact_sum(x),
            "sy": _exact_sum(y),
            "sxy": _exact_prod_sum(x, y),
            "sxx": _exact_prod_sum(x, x),
            "syy": _exact_prod_sum(y, y),
        }
        row: dict[str, list[int]] = {"n": [len(x)]}
        for c, v in vals.items():
            sign = -1 if v < 0 else 1
            row[f"{c}_hi"] = [sign * (abs(v) >> _HILO_SHIFT)]
            row[f"{c}_lo"] = [sign * (abs(v) & _HILO_MASK)]
        return pd.DataFrame(row)

    parts = (
        read(sf_dir, "orders", ["o_orderdate", "o_totalprice"])
        .map_batches(partial, batch_format="pandas")
        .to_pandas()
    )
    # Python-int totals: overflow-free regardless of scale
    out = {"n": int(parts["n"].astype(object).sum())}
    for c in _MOMENTS:
        hi = int(parts[f"{c}_hi"].astype(object).sum())
        lo = int(parts[f"{c}_lo"].astype(object).sum())
        out[c] = (hi << _HILO_SHIFT) + lo
    return out


MOMENTS_SQL_BASE = """
WITH m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx,
         CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy,
         CAST(SUM(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
         CAST(SUM(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy
  FROM (
    SELECT datediff('day', DATE '1990-01-01', o_orderdate) AS x,
           CAST(ROUND(o_totalprice*100) AS BIGINT) AS y
    FROM orders
  )
)
"""


def regression_ols(sf_dir: str):
    m = _xy_moments(sf_dir)
    slope, intercept = ols_from_moments(m["n"], m["sx"], m["sy"], m["sxy"], m["sxx"])
    return pd.DataFrame({"n": [np.int64(m["n"])], "slope": [slope], "intercept": [intercept]})


REGRESSION_SQL = (
    MOMENTS_SQL_BASE
    + """
SELECT n,
       CAST(n * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE)
         / CAST(n * sxx - CAST(sx AS HUGEINT) * sx AS DOUBLE) AS slope,
       (CAST(sy AS DOUBLE)
        - (CAST(n * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE)
           / CAST(n * sxx - CAST(sx AS HUGEINT) * sx AS DOUBLE)) * CAST(sx AS DOUBLE))
         / CAST(n AS DOUBLE) AS intercept
FROM m
"""
)


def correlation_moments(sf_dir: str):
    m = _xy_moments(sf_dir)
    r = corr_from_moments(m["n"], m["sx"], m["sy"], m["sxy"], m["sxx"], m["syy"])
    return pd.DataFrame({"n": [np.int64(m["n"])], "r": [r]})


CORRELATION_SQL = (
    MOMENTS_SQL_BASE
    + """
SELECT n,
       CAST(n * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE)
         / (sqrt(CAST(n * sxx - CAST(sx AS HUGEINT) * sx AS DOUBLE))
            * sqrt(CAST(n * syy - CAST(sy AS HUGEINT) * sy AS DOUBLE))) AS r
FROM m
"""
)

# --------------------------------------------------------------------------
# Moving average over the monthly revenue series: exact monthly cents sums
# (distributed), 3-month trailing mean (full windows only).

MA_WINDOW = 3


def moving_average_monthly(sf_dir: str):
    # the series is months-long (bounded) — the evaluator runs driver-side
    monthly = _monthly_cents(sf_dir)
    ma = moving_average(monthly["cents"].to_numpy().astype(np.float64), MA_WINDOW)
    out = monthly.iloc[MA_WINDOW - 1 :].copy().reset_index(drop=True)
    out["cents"] = out["cents"].astype("int64")
    out["ma3"] = ma
    return out[["month", "cents", "ma3"]]


MOVING_AVG_SQL = f"""
WITH monthly AS (
  SELECT CAST(year(o_orderdate)*100 + month(o_orderdate) AS BIGINT) AS month,
         CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT) AS cents
  FROM orders GROUP BY month
)
SELECT month, cents,
       SUM(CAST(cents AS DOUBLE)) OVER w / {MA_WINDOW}.0 AS ma3
FROM monthly
WINDOW w AS (ORDER BY month ROWS BETWEEN {MA_WINDOW - 1} PRECEDING AND CURRENT ROW)
QUALIFY row_number() OVER (ORDER BY month) >= {MA_WINDOW}
ORDER BY month
"""

# --------------------------------------------------------------------------
# Facet over a deterministic hash sample (the facet-sampling pre-stage,
# SURVEY.md §2.7): 20% sample via the shared multiplicative hash, exact
# scale-up estimate; the SQL twin applies the identical filter.

SAMPLE_MOD = 5


def facet_sample(sf_dir: str):
    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        keep = _sample_hash(batch["o_orderkey"].to_numpy()) % SAMPLE_MOD == 0
        g = batch.loc[keep, ["o_orderpriority"]].copy()
        g["n_sample"] = 1
        return g.groupby("o_orderpriority", as_index=False).sum()

    from .common import merge_partials

    out = merge_partials(
        read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"]).map_batches(
            partial, batch_format="pandas"
        ),
        ["o_orderpriority"],
        {"n_sample": "sum"},
    )
    out["n_sample"] = out["n_sample"].astype("int64")
    out["n_est"] = (out["n_sample"] * SAMPLE_MOD).astype("int64")
    return out.sort_values("o_orderpriority").reset_index(drop=True)


FACET_SAMPLE_SQL = f"""
WITH h1 AS (
  SELECT o_orderpriority,
         (CAST(o_orderkey % {_M32} + {_SAMPLE_SEED} AS HUGEINT) * {_SAMPLE_C1}) % {_M32} AS a
  FROM orders
), h2 AS (
  SELECT o_orderpriority, (CAST(xor(a, a >> 15) AS HUGEINT) * {_SAMPLE_C2}) % {_M32} AS b FROM h1
)
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_sample,
       CAST(COUNT(*) * {SAMPLE_MOD} AS BIGINT) AS n_est
FROM h2 WHERE xor(b, b >> 13) % {SAMPLE_MOD} = 0
GROUP BY o_orderpriority ORDER BY o_orderpriority
"""

# --------------------------------------------------------------------------
# KmeansEvaluator over embeddings (rows-only: float iteration is not
# SQL-expressible; determinism + balance tested in pytest).


def kmeans_clusters(sf_dir: str, k: int = 8):
    """Centroids train on a driver-side SAMPLE (standard practice); cluster
    assignment + counts run distributed against broadcast centroids — the
    corpus is never materialized."""
    import ray

    sample = read(sf_dir, "embeddings", ["embedding"]).limit(10_000).to_pandas()
    pts = np.stack(sample["embedding"].to_numpy()).astype(np.float64)
    pts = pts / np.linalg.norm(pts, axis=1, keepdims=True)
    cent, _ = kmeans(pts, k)
    cent_ref = ray.put(cent)

    def assign_counts(batch: pd.DataFrame) -> pd.DataFrame:
        c = ray.get(cent_ref)
        m = np.stack(batch["embedding"].to_numpy()).astype(np.float64)
        m = m / np.linalg.norm(m, axis=1, keepdims=True)
        a = (m @ c.T - 0.5 * (c * c).sum(axis=1)[None, :]).argmax(axis=1)
        return pd.DataFrame(
            {"cluster": np.arange(k, dtype=np.int64), "n": np.bincount(a, minlength=k).astype(np.int64)}
        )

    from .common import merge_partials

    out = (
        merge_partials(
            read(sf_dir, "embeddings", ["embedding"]).map_batches(
                assign_counts, batch_format="pandas"
            ),
            ["cluster"],
            {"n": "sum"},
        )
        .sort_values("cluster")
        .reset_index(drop=True)
    )
    out["n"] = out["n"].astype("int64")
    return out[["cluster", "n"]]


# --------------------------------------------------------------------------
# DbscanEvaluator (solr/solrj/.../io/eval/DbscanEvaluator.java): density
# clustering.  Core structure discovers on a driver-side sample (DBSCAN has
# no out-of-sample model — the standard scale shape is sample-cluster +
# nearest-core assignment); the full corpus is then labelled distributed
# against the broadcast core points.  Rows-only (iterative, not SQL).

DBSCAN_EPS = 0.35  # cosine distance on unit vectors
DBSCAN_MIN_PTS = 5


def _dbscan(pts: np.ndarray, eps: float, min_pts: int) -> np.ndarray:
    """O(n²) driver DBSCAN over unit vectors (cosine distance); labels:
    -1 noise, else cluster id in first-seen order (deterministic)."""
    n = pts.shape[0]
    d = 1.0 - pts @ pts.T
    neigh = d <= eps
    n_neigh = neigh.sum(axis=1)
    core = n_neigh >= min_pts
    labels = np.full(n, -1, dtype=np.int64)
    cid = 0
    for i in range(n):
        if labels[i] != -1 or not core[i]:
            continue
        stack = [i]
        labels[i] = cid
        while stack:
            j = stack.pop()
            if not core[j]:
                continue
            for m in np.nonzero(neigh[j])[0]:
                if labels[m] == -1:
                    labels[m] = cid
                    if core[m]:
                        stack.append(int(m))
        cid += 1
    return labels


def dbscan_clusters(sf_dir: str, eps: float = DBSCAN_EPS, min_pts: int = DBSCAN_MIN_PTS):
    import ray

    sample = read(sf_dir, "embeddings", ["embedding"]).limit(4_000).to_pandas()
    pts = np.stack(sample["embedding"].to_numpy()).astype(np.float64)
    pts = pts / np.linalg.norm(pts, axis=1, keepdims=True)
    labels = _dbscan(pts, eps, min_pts)
    core_mask = labels >= 0
    cores, core_labels = pts[core_mask], labels[core_mask]
    n_clusters = int(labels.max()) + 1 if core_mask.any() else 0
    refs = ray.put((cores, core_labels, n_clusters))

    def assign(batch: pd.DataFrame) -> pd.DataFrame:
        c, cl, k = ray.get(refs)
        out = {"cluster": np.arange(-1, k, dtype=np.int64)}
        m = np.stack(batch["embedding"].to_numpy()).astype(np.float64)
        m = m / np.linalg.norm(m, axis=1, keepdims=True)
        if k == 0:
            return pd.DataFrame({"cluster": [-1], "n": [len(batch)]})
        sim = m @ c.T
        best = sim.argmax(axis=1)
        lab = np.where(1.0 - sim[np.arange(len(m)), best] <= eps, cl[best], -1)
        return pd.DataFrame(
            {
                "cluster": out["cluster"],
                "n": np.bincount(lab + 1, minlength=k + 1).astype(np.int64),
            }
        )

    from .common import merge_partials

    out = (
        merge_partials(
            read(sf_dir, "embeddings", ["embedding"]).map_batches(assign, batch_format="pandas"),
            ["cluster"],
            {"n": "sum"},
        )
        .sort_values("cluster")
        .reset_index(drop=True)
    )
    out["n"] = out["n"].astype("int64")
    return out[["cluster", "n"]]


# --------------------------------------------------------------------------
# FFTEvaluator over the daily event-count series (rows-only; Parseval and
# determinism checked in pytest).


def fft_daily_counts(sf_dir: str):
    from .common import merge_partials

    def to_day(batch: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame({"day": ts_us(batch["ts"]) // 86_400_000_000, "n": 1})
        return g.groupby("day", as_index=False).sum()

    daily = merge_partials(
        read(sf_dir, "events", ["ts"]).map_batches(to_day, batch_format="pandas"),
        ["day"],
        {"n": "sum"},
    ).sort_values("day")
    mag = fft_magnitude(daily["n"].to_numpy())
    return pd.DataFrame({"bin": np.arange(mag.size, dtype=np.int64), "magnitude": mag})


# --------------------------------------------------------------------------
# More of the eval/ time-series + stats surface, each on the same
# exact-integer-partials → bounded-driver-series shape:
# - series_diff    DiffEvaluator (time-series differencing) — BIGINT lag
#   subtraction, integer-exact on both sides.
# - moving_median  MovingMedianEvaluator — odd window over integer cents ⇒
#   the median is an integral double, bit-exact vs DuckDB's window median.
# - mode_value     ModeEvaluator — bounded (status × priority) domain,
#   deterministic lowest-value tiebreak.
# - chi_square     ChiSquareDataSetEvaluator — per-cell observed/expected/
#   contribution table (no cross-cell float summation ⇒ order-independent
#   hash parity; the statistic is the contrib sum, left to the caller).


def _monthly_cents(sf_dir: str) -> pd.DataFrame:
    from .common import merge_partials

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        d = batch["o_orderdate"]
        month = (d.dt.year * 100 + d.dt.month).astype("int64")
        g = pd.DataFrame({"month": month, "cents": cents(batch["o_totalprice"].to_numpy())})
        return g.groupby("month", as_index=False).sum()

    return (
        merge_partials(
            read(sf_dir, "orders", ["o_orderdate", "o_totalprice"]).map_batches(
                partial, batch_format="pandas"
            ),
            ["month"],
            {"cents": "sum"},
        )
        .sort_values("month")
        .reset_index(drop=True)
    )


def series_diff(sf_dir: str):
    monthly = _monthly_cents(sf_dir)
    c = monthly["cents"].to_numpy(np.int64)
    out = monthly.iloc[1:].copy().reset_index(drop=True)
    out["cents"] = out["cents"].astype("int64")
    out["diff"] = (c[1:] - c[:-1]).astype("int64")
    return out[["month", "cents", "diff"]]


SERIES_DIFF_SQL = """
WITH monthly AS (
  SELECT CAST(year(o_orderdate)*100 + month(o_orderdate) AS BIGINT) AS month,
         CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT) AS cents
  FROM orders GROUP BY month
)
SELECT month, cents, CAST(cents - lag(cents) OVER (ORDER BY month) AS BIGINT) AS diff
FROM monthly
QUALIFY row_number() OVER (ORDER BY month) >= 2
ORDER BY month
"""

def derivative_series(sf_dir: str):
    """DerivativeEvaluator analog (solr/solrj/.../io/eval/DerivativeEvaluator
    .java — Solr differentiates a fitted spline; this is the documented
    finite-difference variant): central differences on the interior,
    one-sided at the ends, over the exact integer monthly cents.  Every
    derived float is (int − int) / 2.0 — exactly representable, so the
    gate is strict."""
    monthly = _monthly_cents(sf_dir)
    c = monthly["cents"].to_numpy(np.int64)
    d = np.empty(c.size, dtype=np.float64)
    if c.size >= 2:
        d[0] = float(c[1] - c[0])
        d[-1] = float(c[-1] - c[-2])
        d[1:-1] = (c[2:] - c[:-2]).astype(np.float64) / 2.0
    elif c.size:
        d[0] = 0.0
    out = monthly.copy().reset_index(drop=True)
    out["cents"] = out["cents"].astype("int64")
    out["deriv"] = d
    return out[["month", "cents", "deriv"]]


DERIVATIVE_SQL = """
WITH monthly AS (
  SELECT CAST(year(o_orderdate)*100 + month(o_orderdate) AS BIGINT) AS month,
         CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT) AS cents
  FROM orders GROUP BY month
),
w AS (
  SELECT month, cents,
         lag(cents)  OVER (ORDER BY month) AS prv,
         lead(cents) OVER (ORDER BY month) AS nxt
  FROM monthly
)
SELECT month, cents,
       CASE WHEN prv IS NULL AND nxt IS NULL THEN 0.0
            WHEN prv IS NULL THEN CAST(nxt - cents AS DOUBLE)
            WHEN nxt IS NULL THEN CAST(cents - prv AS DOUBLE)
            ELSE CAST(nxt - prv AS DOUBLE) / 2.0 END AS deriv
FROM w ORDER BY month
"""


MM_WINDOW = 3


def moving_median_monthly(sf_dir: str):
    monthly = _monthly_cents(sf_dir)
    c = monthly["cents"].to_numpy(np.int64)
    med = np.array(
        [float(np.median(c[i - MM_WINDOW + 1 : i + 1])) for i in range(MM_WINDOW - 1, c.size)],
        dtype=np.float64,
    )
    out = monthly.iloc[MM_WINDOW - 1 :].copy().reset_index(drop=True)
    out["cents"] = out["cents"].astype("int64")
    out["med3"] = med
    return out[["month", "cents", "med3"]]


MOVING_MEDIAN_SQL = f"""
WITH monthly AS (
  SELECT CAST(year(o_orderdate)*100 + month(o_orderdate) AS BIGINT) AS month,
         CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT) AS cents
  FROM orders GROUP BY month
)
SELECT month, cents, CAST(median(cents) OVER w AS DOUBLE) AS med3
FROM monthly
WINDOW w AS (ORDER BY month ROWS BETWEEN {MM_WINDOW - 1} PRECEDING AND CURRENT ROW)
QUALIFY row_number() OVER (ORDER BY month) >= {MM_WINDOW}
ORDER BY month
"""


def _status_priority_counts(sf_dir: str) -> pd.DataFrame:
    from .common import merge_partials

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        g = batch.groupby(["o_orderstatus", "o_orderpriority"]).size().reset_index(name="n")
        return g

    return merge_partials(
        read(sf_dir, "orders", ["o_orderstatus", "o_orderpriority"]).map_batches(
            partial, batch_format="pandas"
        ),
        ["o_orderstatus", "o_orderpriority"],
        {"n": "sum"},
    )


def mode_value(sf_dir: str):
    cts = _status_priority_counts(sf_dir)
    cts = cts.sort_values(["o_orderstatus", "n", "o_orderpriority"], ascending=[True, False, True])
    out = cts.groupby("o_orderstatus", as_index=False).first()
    out = out.rename(columns={"o_orderpriority": "mode_priority"})
    out["n"] = out["n"].astype("int64")
    return out[["o_orderstatus", "mode_priority", "n"]].sort_values("o_orderstatus").reset_index(drop=True)


MODE_SQL = """
SELECT o_orderstatus, mode_priority, n FROM (
  SELECT o_orderstatus, o_orderpriority AS mode_priority,
         CAST(COUNT(*) AS BIGINT) AS n,
         row_number() OVER (PARTITION BY o_orderstatus
                            ORDER BY COUNT(*) DESC, o_orderpriority) AS rn
  FROM orders GROUP BY o_orderstatus, o_orderpriority
) WHERE rn = 1 ORDER BY o_orderstatus
"""


def chi_square(sf_dir: str):
    cts = _status_priority_counts(sf_dir)
    n = int(cts["n"].sum())
    row = cts.groupby("o_orderstatus")["n"].sum().to_dict()
    col = cts.groupby("o_orderpriority")["n"].sum().to_dict()
    cts = cts.sort_values(["o_orderstatus", "o_orderpriority"]).reset_index(drop=True)
    exp = np.array(
        [
            float(row[s]) * float(col[p]) / float(n)
            for s, p in zip(cts["o_orderstatus"], cts["o_orderpriority"])
        ],
        dtype=np.float64,
    )
    obs = cts["n"].to_numpy(np.int64).astype(np.float64)
    cts["obs"] = cts["n"].astype("int64")
    cts["expected"] = exp
    cts["contrib"] = (obs - exp) * (obs - exp) / exp
    return cts[["o_orderstatus", "o_orderpriority", "obs", "expected", "contrib"]]


CHI_SQUARE_SQL = """
WITH c AS (
  SELECT o_orderstatus, o_orderpriority, CAST(COUNT(*) AS BIGINT) AS obs
  FROM orders GROUP BY o_orderstatus, o_orderpriority
),
tot AS (SELECT CAST(SUM(obs) AS DOUBLE) AS n FROM c),
r AS (SELECT o_orderstatus, CAST(SUM(obs) AS DOUBLE) AS rt FROM c GROUP BY o_orderstatus),
k AS (SELECT o_orderpriority, CAST(SUM(obs) AS DOUBLE) AS ct FROM c GROUP BY o_orderpriority)
SELECT c.o_orderstatus, c.o_orderpriority, c.obs,
       r.rt * k.ct / tot.n AS expected,
       (CAST(c.obs AS DOUBLE) - r.rt * k.ct / tot.n)
       * (CAST(c.obs AS DOUBLE) - r.rt * k.ct / tot.n) / (r.rt * k.ct / tot.n) AS contrib
FROM c JOIN r ON c.o_orderstatus = r.o_orderstatus
       JOIN k ON c.o_orderpriority = k.o_orderpriority, tot
ORDER BY c.o_orderstatus, c.o_orderpriority
"""


# --------------------------------------------------------------------------
# hist() (HistEvaluator, commons-math EmpiricalDistribution): fixed-width
# bins with per-bin count / min / max / exact-cents mean.  Per-batch
# combiner partials (bin domain is request-sized), coordinator merge.

HIST_LO, HIST_HI, HIST_BINS = 0.0, 600000.0, 10


def hist_bins(sf_dir: str):
    from .common import merge_partials

    width = (HIST_HI - HIST_LO) / HIST_BINS

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        v = batch["o_totalprice"].to_numpy()
        keep = (v >= HIST_LO) & (v < HIST_HI)
        v = v[keep]
        g = pd.DataFrame(
            {
                "bin": np.floor((v - HIST_LO) / width).astype(np.int64),
                "n": 1,
                "cents": cents(v),
                "vmin": v,
                "vmax": v,
            }
        )
        return g.groupby("bin", as_index=False).agg(
            n=("n", "sum"), cents=("cents", "sum"), vmin=("vmin", "min"), vmax=("vmax", "max")
        )

    out = merge_partials(
        read(sf_dir, "orders", ["o_totalprice"]).map_batches(partial, batch_format="pandas"),
        ["bin"],
        {"n": "sum", "cents": "sum", "vmin": "min", "vmax": "max"},
    )
    out["mean_cents"] = out["cents"].astype("int64").astype("float64") / out["n"].astype(
        "int64"
    ).astype("float64")
    out["n"] = out["n"].astype("int64")
    out = out.drop(columns=["cents"])
    return out.sort_values("bin").reset_index(drop=True)[["bin", "n", "vmin", "vmax", "mean_cents"]]


HIST_SQL = f"""
SELECT CAST(FLOOR((o_totalprice - {HIST_LO}) / {(HIST_HI - HIST_LO) / HIST_BINS}) AS BIGINT) AS bin,
       CAST(COUNT(*) AS BIGINT) AS n,
       MIN(o_totalprice) AS vmin,
       MAX(o_totalprice) AS vmax,
       CAST(CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT) AS DOUBLE)
         / CAST(COUNT(*) AS BIGINT) AS mean_cents
FROM orders WHERE o_totalprice >= {HIST_LO} AND o_totalprice < {HIST_HI}
GROUP BY bin ORDER BY bin
"""


# --------------------------------------------------------------------------
# describe() (DescribeEvaluator): n/min/max/mean/variance/stddev/sumsq of a
# column from exact integer moments — the variance_moments shape plus the
# order-statistics partials, one distributed pass.


def _col_moments(ds, to_cents) -> dict:
    """(n, s1, s2, vmin, vmax) of a column with Python-int exact sums; s2
    ships as (hi, lo) int64 pairs (a block of cents² can exceed int64)."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        c = to_cents(batch)
        s2 = _exact_prod_sum(c, c)
        sign = -1 if s2 < 0 else 1
        return pd.DataFrame(
            {
                "n": [len(c)],
                "s1": [_exact_sum(c)],
                "s2_hi": [sign * (abs(s2) >> _HILO_SHIFT)],
                "s2_lo": [sign * (abs(s2) & _HILO_MASK)],
                "vmin": [int(c.min()) if c.size else np.iinfo(np.int64).max],
                "vmax": [int(c.max()) if c.size else np.iinfo(np.int64).min],
            }
        )

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    return {
        "n": int(parts["n"].astype(object).sum()),
        "s1": int(parts["s1"].astype(object).sum()),
        "s2": (int(parts["s2_hi"].astype(object).sum()) << _HILO_SHIFT)
        + int(parts["s2_lo"].astype(object).sum()),
        "vmin": int(parts["vmin"].min()),
        "vmax": int(parts["vmax"].max()),
    }


def describe_stats(sf_dir: str):
    m = _col_moments(
        read(sf_dir, "lineitem", ["l_extendedprice"]),
        lambda b: cents(b["l_extendedprice"].to_numpy()),
    )
    n, s1, s2 = m["n"], m["s1"], m["s2"]
    mean = float(s1) / float(n)
    var = h2d(n * s2 - s1 * s1) / float(n * (n - 1))
    import math

    return pd.DataFrame(
        {
            "n": [np.int64(n)],
            "vmin": [np.int64(m["vmin"])],
            "vmax": [np.int64(m["vmax"])],
            "mean": [mean],
            "variance": [var],
            "stddev": [math.sqrt(var)],
            "sumsq": [h2d(s2)],
        }
    )


DESCRIBE_SQL = """
WITH m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(c) AS HUGEINT) AS s1,
         CAST(SUM(CAST(c AS HUGEINT) * c) AS HUGEINT) AS s2,
         CAST(MIN(c) AS BIGINT) AS vmin, CAST(MAX(c) AS BIGINT) AS vmax
  FROM (SELECT CAST(ROUND(l_extendedprice*100) AS BIGINT) AS c FROM lineitem)
)
SELECT n, vmin, vmax,
       CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mean,
       CAST(n * s2 - s1 * s1 AS DOUBLE) / CAST(n * (n - 1) AS DOUBLE) AS variance,
       sqrt(CAST(n * s2 - s1 * s1 AS DOUBLE) / CAST(n * (n - 1) AS DOUBLE)) AS stddev,
       CAST(s2 AS DOUBLE) AS sumsq
FROM m
"""


# --------------------------------------------------------------------------
# ttest() (TTestEvaluator, Welch's unequal-variance two-sample t): per-group
# exact integer moments of events.value cents (click vs view), the t statistic
# and Welch–Satterthwaite dof derived with one identical double formula.

_TT_A, _TT_B = "click", "view"


def ttest_welch(sf_dir: str):
    import math

    def group_moments(ev_type: str) -> dict:
        ds = read(sf_dir, "events", ["event_type", "value"])
        return _col_moments(
            ds.map_batches(
                lambda b, _t=ev_type: b[b["event_type"] == _t][["value"]],
                batch_format="pandas",
            ),
            lambda b: cents(b["value"].to_numpy()),
        )

    ma, mb = group_moments(_TT_A), group_moments(_TT_B)
    n1, n2 = ma["n"], mb["n"]
    m1 = h2d(ma["s1"]) / float(n1)
    m2 = h2d(mb["s1"]) / float(n2)
    v1 = h2d(n1 * ma["s2"] - ma["s1"] * ma["s1"]) / float(n1 * (n1 - 1))
    v2 = h2d(n2 * mb["s2"] - mb["s1"] * mb["s1"]) / float(n2 * (n2 - 1))
    se1, se2 = v1 / float(n1), v2 / float(n2)
    t = (m1 - m2) / math.sqrt(se1 + se2)
    dof = (se1 + se2) * (se1 + se2) / (se1 * se1 / float(n1 - 1) + se2 * se2 / float(n2 - 1))
    return pd.DataFrame(
        {
            "n1": [np.int64(n1)],
            "n2": [np.int64(n2)],
            "mean1": [m1],
            "mean2": [m2],
            "t": [t],
            "dof": [dof],
        }
    )


TTEST_SQL = f"""
WITH g AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(c) AS HUGEINT) AS s1,
         CAST(SUM(CAST(c AS HUGEINT) * c) AS HUGEINT) AS s2
  FROM (SELECT event_type, CAST(ROUND(value*100) AS BIGINT) AS c FROM events
        WHERE event_type IN ('{_TT_A}', '{_TT_B}'))
  GROUP BY event_type
),
m AS (
  SELECT
    (SELECT n FROM g WHERE event_type = '{_TT_A}') AS n1,
    (SELECT n FROM g WHERE event_type = '{_TT_B}') AS n2,
    (SELECT CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) FROM g WHERE event_type = '{_TT_A}') AS m1,
    (SELECT CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) FROM g WHERE event_type = '{_TT_B}') AS m2,
    (SELECT CAST(n * s2 - s1 * s1 AS DOUBLE) / CAST(n * (n - 1) AS DOUBLE)
       / CAST(n AS DOUBLE) FROM g WHERE event_type = '{_TT_A}') AS se1,
    (SELECT CAST(n * s2 - s1 * s1 AS DOUBLE) / CAST(n * (n - 1) AS DOUBLE)
       / CAST(n AS DOUBLE) FROM g WHERE event_type = '{_TT_B}') AS se2
)
SELECT n1, n2, m1 AS mean1, m2 AS mean2,
       (m1 - m2) / sqrt(se1 + se2) AS t,
       (se1 + se2) * (se1 + se2)
         / (se1 * se1 / CAST(n1 - 1 AS DOUBLE) + se2 * se2 / CAST(n2 - 1 AS DOUBLE)) AS dof
FROM m
"""


# --------------------------------------------------------------------------
# zscores() (ZScoresEvaluator / NormalizeEvaluator): standardize the monthly
# revenue series — mean/stddev from exact integer sums over the (bounded)
# series, z derived with one identical double formula per month.


def zscores_monthly(sf_dir: str):
    import math

    monthly = _monthly_cents(sf_dir)
    c = [int(v) for v in monthly["cents"]]
    n = len(c)
    s1, s2 = sum(c), sum(v * v for v in c)
    mean = float(s1) / float(n)
    sd = math.sqrt(h2d(n * s2 - s1 * s1) / float(n * (n - 1)))
    out = monthly.copy()
    out["cents"] = out["cents"].astype("int64")
    out["z"] = np.array([(float(v) - mean) / sd for v in c], dtype=np.float64)
    return out[["month", "cents", "z"]]


ZSCORES_SQL = """
WITH monthly AS (
  SELECT CAST(year(o_orderdate)*100 + month(o_orderdate) AS BIGINT) AS month,
         CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT) AS cents
  FROM orders GROUP BY month
),
m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(cents) AS HUGEINT) AS s1,
         CAST(SUM(CAST(cents AS HUGEINT) * cents) AS HUGEINT) AS s2
  FROM monthly
)
SELECT month, cents,
       (CAST(cents AS DOUBLE) - CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
         / sqrt(CAST(n * s2 - s1 * s1 AS DOUBLE) / CAST(n * (n - 1) AS DOUBLE)) AS z
FROM monthly, m ORDER BY month
"""


# --------------------------------------------------------------------------
# cov() (CovarianceEvaluator): sample covariance of (order day, price cents)
# from the same exact moments as the OLS/correlation gates.


def covariance_moments(sf_dir: str):
    m = _xy_moments(sf_dir)
    n = m["n"]
    cov = h2d(n * m["sxy"] - m["sx"] * m["sy"]) / float(n * (n - 1))
    return pd.DataFrame({"n": [np.int64(n)], "cov": [cov]})


COVARIANCE_SQL = (
    MOMENTS_SQL_BASE
    + """
SELECT n, CAST(n * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE)
        / CAST(CAST(n AS HUGEINT) * (n - 1) AS DOUBLE) AS cov
FROM m
"""
)


# --------------------------------------------------------------------------
# integrate() (IntegrateEvaluator, trapezoid rule): running integral of the
# monthly revenue series — exact integer month sums distributed, the
# cumulative trapezoid derived on the (bounded) series with one identical
# double formula per row.


def integrate_monthly(sf_dir: str):
    monthly = _monthly_cents(sf_dir)
    c = monthly["cents"].to_numpy(np.int64)
    # trapezoid over unit steps: cum_i = Σ_{j<=i} (c_j + c_{j-1})/2
    steps = (c[1:].astype(np.float64) + c[:-1].astype(np.float64)) / 2.0
    out = monthly.iloc[1:].copy().reset_index(drop=True)
    out["cents"] = out["cents"].astype("int64")
    out["integral"] = np.cumsum(steps)
    return out[["month", "cents", "integral"]]


INTEGRATE_SQL = """
WITH monthly AS (
  SELECT CAST(year(o_orderdate)*100 + month(o_orderdate) AS BIGINT) AS month,
         CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT) AS cents
  FROM orders GROUP BY month
),
s AS (
  SELECT month, cents,
         (CAST(cents AS DOUBLE) + CAST(lag(cents) OVER (ORDER BY month) AS DOUBLE)) / 2.0 AS step
  FROM monthly
)
SELECT month, cents,
       SUM(step) OVER (ORDER BY month ROWS UNBOUNDED PRECEDING) AS integral
FROM s
QUALIFY row_number() OVER (ORDER BY month) >= 2
ORDER BY month
"""


# --------------------------------------------------------------------------
# anova() (AnovaEvaluator, one-way F): between/within sum-of-squares across
# the event-type groups from per-group exact integer moments; F and the dofs
# derived with one identical double formula.


def anova_oneway(sf_dir: str):
    from .common import merge_partials

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        c = cents(batch["value"].to_numpy())
        g = pd.DataFrame({"grp": batch["event_type"].to_numpy(), "s1": c})
        out = []
        for grp, sub in g.groupby("grp", sort=False):
            v = sub["s1"].to_numpy(np.int64)
            s2 = _exact_prod_sum(v, v)
            sign = -1 if s2 < 0 else 1
            out.append(
                {
                    "grp": grp,
                    "n": len(v),
                    "s1": _exact_sum(v),
                    "s2_hi": sign * (abs(s2) >> _HILO_SHIFT),
                    "s2_lo": sign * (abs(s2) & _HILO_MASK),
                }
            )
        return pd.DataFrame(out)

    parts = (
        read(sf_dir, "events", ["event_type", "value"])
        .map_batches(partial, batch_format="pandas")
        .to_pandas()
    )
    groups = []
    for grp, sub in parts.groupby("grp"):
        s2 = (int(sub["s2_hi"].astype(object).sum()) << _HILO_SHIFT) + int(
            sub["s2_lo"].astype(object).sum()
        )
        groups.append((grp, int(sub["n"].sum()), int(sub["s1"].astype(object).sum()), s2))
    groups.sort()
    n_tot = sum(n for _, n, _, _ in groups)
    s1_tot = sum(s1 for _, _, s1, _ in groups)
    s2_tot = sum(s2 for _, _, _, s2 in groups)
    k = len(groups)
    grand = h2d(s1_tot) / float(n_tot)
    # SSB = Σ n_g (mean_g - grand)², SSW = SST - SSB (exact-moment forms)
    ssb = 0.0
    for _, n, s1, _ in groups:
        m = float(s1) / float(n)
        ssb = ssb + float(n) * (m - grand) * (m - grand)
    sst = h2d(s2_tot) - float(n_tot) * grand * grand
    ssw = sst - ssb
    f = (ssb / float(k - 1)) / (ssw / float(n_tot - k))
    return pd.DataFrame(
        {
            "k": [np.int64(k)],
            "n": [np.int64(n_tot)],
            "ssb": [ssb],
            "ssw": [ssw],
            "f": [f],
        }
    )


ANOVA_SQL = """
WITH g AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(c) AS HUGEINT) AS s1,
         CAST(SUM(CAST(c AS HUGEINT) * c) AS HUGEINT) AS s2
  FROM (SELECT event_type, CAST(ROUND(value*100) AS BIGINT) AS c FROM events)
  GROUP BY event_type
),
tot AS (
  SELECT CAST(SUM(n) AS BIGINT) AS n_tot, CAST(SUM(s1) AS HUGEINT) AS s1_tot,
         CAST(SUM(s2) AS HUGEINT) AS s2_tot, CAST(COUNT(*) AS BIGINT) AS k
  FROM g
),
parts AS (
  SELECT
    (SELECT SUM(CAST(n AS DOUBLE)
                * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)
                   - CAST(s1_tot AS DOUBLE) / CAST(n_tot AS DOUBLE))
                * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)
                   - CAST(s1_tot AS DOUBLE) / CAST(n_tot AS DOUBLE))
            ORDER BY event_type)  -- sequential order = the engine's sorted loop
     FROM g, tot) AS ssb,
    CAST(s2_tot AS DOUBLE)
      - CAST(n_tot AS DOUBLE) * (CAST(s1_tot AS DOUBLE) / CAST(n_tot AS DOUBLE))
        * (CAST(s1_tot AS DOUBLE) / CAST(n_tot AS DOUBLE)) AS sst,
    k, n_tot
  FROM tot
)
SELECT k, n_tot AS n, ssb, sst - ssb AS ssw,
       (ssb / CAST(k - 1 AS DOUBLE)) / ((sst - ssb) / CAST(n_tot - k AS DOUBLE)) AS f
FROM parts
"""


# --------------------------------------------------------------------------
# mannWhitney() (MannWhitneyUEvaluator): rank-based two-sample U test with
# midrank tie handling — EXACT integer rank arithmetic.  The distributed
# partial is per-batch (value, n_group1, n_total) counts (bounded: the
# cents domain of a 2-decimal column), the driver derives doubled midranks
# 2·rank(v) = 2·cum_before(v) + count(v) + 1 as exact ints, and the final
# U / tie-corrected z use one identical double formula on both sides.


def mann_whitney(sf_dir: str):
    import math

    from .common import merge_partials

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        sub = batch[batch["event_type"].isin((_TT_A, _TT_B))]
        df = pd.DataFrame(
            {
                "c": cents(sub["value"].to_numpy()),
                "n1": (sub["event_type"] == _TT_A).to_numpy().astype(np.int64),
                "nt": 1,
            }
        )
        return df.groupby("c", as_index=False).sum()

    cnt = merge_partials(
        read(sf_dir, "events", ["event_type", "value"]).map_batches(
            partial, batch_format="pandas"
        ),
        ["c"],
        {"n1": "sum", "nt": "sum"},
    ).sort_values("c")
    n1v = [int(v) for v in cnt["n1"]]
    ntv = [int(v) for v in cnt["nt"]]
    n1 = sum(n1v)
    n_tot = sum(ntv)
    n2 = n_tot - n1
    cumb, r1x2, ties = 0, 0, 0
    for a, t in zip(n1v, ntv):
        r1x2 += a * (2 * cumb + t + 1)  # Σ n1(v)·2·midrank(v), exact
        ties += t * t * t - t
        cumb += t
    u1 = float(r1x2 - n1 * (n1 + 1)) / 2.0
    mu = float(n1) * float(n2) / 2.0
    tiefrac = float(ties) / (float(n_tot) * float(n_tot - 1))
    var = (float(n1) * float(n2) / 12.0) * ((float(n_tot) + 1.0) - tiefrac)
    z = (u1 - mu) / math.sqrt(var)
    return pd.DataFrame(
        {"n1": [np.int64(n1)], "n2": [np.int64(n2)], "u1": [u1], "z": [z]}
    )


MANN_WHITNEY_SQL = f"""
WITH v AS (
  SELECT CAST(ROUND(value*100) AS BIGINT) AS c,
         CASE WHEN event_type = '{_TT_A}' THEN 1 ELSE 0 END AS g1
  FROM events WHERE event_type IN ('{_TT_A}', '{_TT_B}')
),
cnt AS (
  SELECT c, CAST(SUM(g1) AS BIGINT) AS n1v, CAST(COUNT(*) AS BIGINT) AS ntv
  FROM v GROUP BY c
),
r AS (
  SELECT c, n1v, ntv,
         CAST(COALESCE(SUM(ntv) OVER (ORDER BY c
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cumb
  FROM cnt
),
s AS (
  SELECT CAST(SUM(n1v * (2*cumb + ntv + 1)) AS HUGEINT) AS r1x2,
         CAST(SUM(ntv*ntv*ntv - ntv) AS HUGEINT) AS ties,
         CAST(SUM(n1v) AS BIGINT) AS n1, CAST(SUM(ntv) AS BIGINT) AS n_tot
  FROM r
),
m AS (
  SELECT n1, n_tot - n1 AS n2,
         CAST(r1x2 - n1 * (n1 + 1) AS DOUBLE) / 2.0 AS u1,
         CAST(n1 AS DOUBLE) * CAST(n_tot - n1 AS DOUBLE) / 2.0 AS mu,
         CAST(ties AS DOUBLE) / (CAST(n_tot AS DOUBLE) * CAST(n_tot - 1 AS DOUBLE)) AS tiefrac,
         CAST(n_tot AS DOUBLE) AS nd, n_tot
  FROM s
)
SELECT n1, n2, u1,
       (u1 - mu) / sqrt((CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 12.0)
                        * ((nd + 1.0) - tiefrac)) AS z
FROM m
"""


# --------------------------------------------------------------------------
# expMovingAvg() (ExponentialMovingAverageEvaluator): EMA over the monthly
# series.  The recurrence is inherently sequential — it runs driver-side on
# the (bounded) series; the SQL twin is a RECURSIVE CTE evaluating the SAME
# float recurrence step by step, so parity is exact.

EMA_ALPHA = 0.25  # = 2/(window+1), window 7


def exp_moving_avg(sf_dir: str):
    monthly = _monthly_cents(sf_dir)
    c = monthly["cents"].to_numpy(np.int64)
    ema = np.empty(c.size, dtype=np.float64)
    acc = float(c[0])
    ema[0] = acc
    for i in range(1, c.size):
        acc = EMA_ALPHA * float(c[i]) + (1.0 - EMA_ALPHA) * acc
        ema[i] = acc
    out = monthly.copy()
    out["cents"] = out["cents"].astype("int64")
    out["ema"] = ema
    return out[["month", "cents", "ema"]]


EMA_SQL = f"""
WITH RECURSIVE monthly AS (
  SELECT CAST(year(o_orderdate)*100 + month(o_orderdate) AS BIGINT) AS month,
         CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT) AS cents
  FROM orders GROUP BY month
),
idx AS (
  SELECT month, cents, row_number() OVER (ORDER BY month) AS rn FROM monthly
),
ema(rn, month, cents, ema) AS (
  SELECT rn, month, cents, CAST(cents AS DOUBLE) FROM idx WHERE rn = 1
  UNION ALL
  SELECT i.rn, i.month, i.cents,
         {EMA_ALPHA} * CAST(i.cents AS DOUBLE) + (1.0 - {EMA_ALPHA}) * e.ema
  FROM idx i JOIN ema e ON i.rn = e.rn + 1
)
SELECT month, cents, ema FROM ema ORDER BY month
"""


# --------------------------------------------------------------------------
# lerp() (LerpEvaluator): linear interpolation of the monthly series at
# half-steps — midpoint sampling of the piecewise-linear interpolant.


def lerp_midpoints(sf_dir: str):
    monthly = _monthly_cents(sf_dir)
    c = monthly["cents"].to_numpy(np.int64)
    out = monthly.iloc[1:].copy().reset_index(drop=True)
    out["cents"] = out["cents"].astype("int64")
    out["mid"] = (c[:-1].astype(np.float64) + c[1:].astype(np.float64)) / 2.0
    return out[["month", "cents", "mid"]]


LERP_SQL = """
WITH monthly AS (
  SELECT CAST(year(o_orderdate)*100 + month(o_orderdate) AS BIGINT) AS month,
         CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT) AS cents
  FROM orders GROUP BY month
)
SELECT month, cents,
       (CAST(lag(cents) OVER (ORDER BY month) AS DOUBLE) + CAST(cents AS DOUBLE)) / 2.0 AS mid
FROM monthly QUALIFY row_number() OVER (ORDER BY month) >= 2 ORDER BY month
"""


# --------------------------------------------------------------------------
# cosineSimilarity() (CosineSimilarityEvaluator): cosine between the monthly
# revenue series and its one-step lag — exact integer dot/norms, one sqrt
# formula both sides.


def cosine_series(sf_dir: str):
    import math

    monthly = _monthly_cents(sf_dir)
    c = [int(v) for v in monthly["cents"]]
    a, b = c[1:], c[:-1]
    dot = sum(x * y for x, y in zip(a, b))
    na = sum(x * x for x in a)
    nb = sum(y * y for y in b)
    cos = h2d(dot) / (math.sqrt(h2d(na)) * math.sqrt(h2d(nb)))
    return pd.DataFrame({"n": [np.int64(len(a))], "cos": [cos]})


COSINE_SERIES_SQL = """
WITH monthly AS (
  SELECT CAST(year(o_orderdate)*100 + month(o_orderdate) AS BIGINT) AS month,
         CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT) AS cents
  FROM orders GROUP BY month
),
p AS (
  SELECT CAST(cents AS HUGEINT) AS a, CAST(lag(cents) OVER (ORDER BY month) AS HUGEINT) AS b
  FROM monthly QUALIFY row_number() OVER (ORDER BY month) >= 2
),
m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(a*b) AS HUGEINT) AS dot,
         CAST(SUM(a*a) AS HUGEINT) AS na, CAST(SUM(b*b) AS HUGEINT) AS nb
  FROM p
)
SELECT n, CAST(dot AS DOUBLE) / (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE))) AS cos
FROM m
"""


# --------------------------------------------------------------------------
# polyfit() (PolyFitEvaluator, degree 2): least-squares quadratic of price
# cents on order day.  The normal-equation moments (Σx..Σx⁴, Σy..Σx²y) are
# exact Python ints shipped as (hi,lo) pairs (Σx⁴ over a 150k-row block is
# ~1e19 > int64); the 3×3 Cramer solve runs as ONE identical double
# expression on both sides — float parity like the OLS gate.

_PMOMENTS = ("s1", "s2", "s3", "s4", "t0", "t1", "t2")


def _poly_moments(sf_dir: str) -> dict:
    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        x = (ts_us(batch["o_orderdate"]) // 86_400_000_000 - _EPOCH0_DAYS).astype(np.int64)
        y = cents(batch["o_totalprice"].to_numpy())
        x2 = x * x  # days < 5000 → x² < 2.5e7, x⁴ per element < 6.25e14: int64-safe
        vals = {
            "s1": _exact_sum(x),
            "s2": _exact_sum(x2),
            "s3": _exact_prod_sum(x2, x),
            "s4": _exact_prod_sum(x2, x2),
            "t0": _exact_sum(y),
            "t1": _exact_prod_sum(x, y),
            "t2": _exact_prod_sum(x2, y),
        }
        row: dict[str, list[int]] = {"n": [len(x)]}
        for c, v in vals.items():
            sign = -1 if v < 0 else 1
            row[f"{c}_hi"] = [sign * (abs(v) >> _HILO_SHIFT)]
            row[f"{c}_lo"] = [sign * (abs(v) & _HILO_MASK)]
        return pd.DataFrame(row)

    parts = (
        read(sf_dir, "orders", ["o_orderdate", "o_totalprice"])
        .map_batches(partial, batch_format="pandas")
        .to_pandas()
    )
    out = {"n": int(parts["n"].astype(object).sum())}
    for c in _PMOMENTS:
        hi = int(parts[f"{c}_hi"].astype(object).sum())
        lo = int(parts[f"{c}_lo"].astype(object).sum())
        out[c] = (hi << _HILO_SHIFT) + lo
    return out


def polyfit_quadratic(sf_dir: str):
    m = _poly_moments(sf_dir)
    a, b, c = float(m["n"]), h2d(m["s1"]), h2d(m["s2"])
    p, q = h2d(m["s3"]), h2d(m["s4"])
    t0, t1, t2 = h2d(m["t0"]), h2d(m["t1"]), h2d(m["t2"])
    det = a * (c * q - p * p) - b * (b * q - p * c) + c * (b * p - c * c)
    c0 = (t0 * (c * q - p * p) - b * (t1 * q - p * t2) + c * (t1 * p - c * t2)) / det
    c1 = (a * (t1 * q - p * t2) - t0 * (b * q - p * c) + c * (b * t2 - t1 * c)) / det
    c2 = (a * (c * t2 - t1 * p) - b * (b * t2 - t1 * c) + t0 * (b * p - c * c)) / det
    return pd.DataFrame({"n": [np.int64(m["n"])], "c0": [c0], "c1": [c1], "c2": [c2]})


POLYFIT_SQL = """
WITH m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS HUGEINT) AS s1,
         CAST(SUM(CAST(x AS HUGEINT) * x) AS HUGEINT) AS s2,
         CAST(SUM(CAST(x AS HUGEINT) * x * x) AS HUGEINT) AS s3,
         CAST(SUM(CAST(x AS HUGEINT) * x * x * x) AS HUGEINT) AS s4,
         CAST(SUM(y) AS HUGEINT) AS t0,
         CAST(SUM(CAST(x AS HUGEINT) * y) AS HUGEINT) AS t1,
         CAST(SUM(CAST(x AS HUGEINT) * x * y) AS HUGEINT) AS t2
  FROM (
    SELECT datediff('day', DATE '1990-01-01', o_orderdate) AS x,
           CAST(ROUND(o_totalprice*100) AS BIGINT) AS y
    FROM orders
  )
),
d AS (
  SELECT n, CAST(n AS DOUBLE) AS a, CAST(s1 AS DOUBLE) AS b, CAST(s2 AS DOUBLE) AS c,
         CAST(s3 AS DOUBLE) AS p, CAST(s4 AS DOUBLE) AS q,
         CAST(t0 AS DOUBLE) AS t0, CAST(t1 AS DOUBLE) AS t1, CAST(t2 AS DOUBLE) AS t2
  FROM m
)
SELECT n,
  (t0 * (c * q - p * p) - b * (t1 * q - p * t2) + c * (t1 * p - c * t2))
    / (a * (c * q - p * p) - b * (b * q - p * c) + c * (b * p - c * c)) AS c0,
  (a * (t1 * q - p * t2) - t0 * (b * q - p * c) + c * (b * t2 - t1 * c))
    / (a * (c * q - p * p) - b * (b * q - p * c) + c * (b * p - c * c)) AS c1,
  (a * (c * t2 - t1 * p) - b * (b * t2 - t1 * c) + t0 * (b * p - c * c))
    / (a * (c * q - p * p) - b * (b * q - p * c) + c * (b * p - c * c)) AS c2
FROM d
"""


# --------------------------------------------------------------------------
# conv() (ConvolutionEvaluator, the signal-math family): full discrete
# convolution of the 'purchase' and 'error' DAILY value series —
# conv[k] = Σ_i a[i]·b[k−i] over POSITIONS in day order (Solr's conv takes
# plain vectors).  Exact integer cents: daily sums ≪ 2³¹ cents, so every
# product and partial sum fits int64 with huge margin.  Daily partials are
# the only distributed work; the convolution itself runs on two
# metadata-sized arrays.


def convolve_series(sf_dir: str):
    from .common import merge_partials

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        m = batch["event_type"].isin(["purchase", "error"])
        b = batch[m]
        g = pd.DataFrame(
            {
                "event_type": b["event_type"].to_numpy(),
                "day": ts_us(b["ts"]) // 86_400_000_000,
                "cents": cents(b["value"].to_numpy()),
            }
        )
        return g.groupby(["event_type", "day"], as_index=False).sum()

    daily = merge_partials(
        read(sf_dir, "events", ["event_type", "ts", "value"]).map_batches(
            partial, batch_format="pandas"
        ),
        ["event_type", "day"],
        {"cents": "sum"},
    ).sort_values("day")
    a = daily[daily["event_type"] == "purchase"]["cents"].to_numpy(np.int64)
    b = daily[daily["event_type"] == "error"]["cents"].to_numpy(np.int64)
    if not a.size or not b.size:  # SQL twin's empty cross join
        return pd.DataFrame({"k": np.empty(0, np.int64), "conv": np.empty(0, np.int64)})
    conv = np.convolve(a, b)
    return pd.DataFrame(
        {"k": np.arange(conv.size, dtype=np.int64), "conv": conv.astype("int64")}
    )


CONVOLVE_SQL = """
WITH daily AS (
  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
         CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS BIGINT) AS c
  FROM events WHERE event_type IN ('purchase', 'error')
  GROUP BY event_type, day
),
a AS (SELECT row_number() OVER (ORDER BY day) - 1 AS i, c FROM daily WHERE event_type = 'purchase'),
b AS (SELECT row_number() OVER (ORDER BY day) - 1 AS i, c FROM daily WHERE event_type = 'error')
SELECT a.i + b.i AS k, CAST(SUM(a.c * b.c) AS BIGINT) AS conv
FROM a, b GROUP BY k ORDER BY k
"""


# --------------------------------------------------------------------------
# distance() (DistanceEvaluator over a matrix of series): pairwise
# Euclidean distance between the event types' daily cents vectors, aligned
# on the full day grid (absent days = 0).  The squared sums are exact
# int64; sqrt is the single shared double op.


def distance_matrix(sf_dir: str):
    from .common import merge_partials

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame(
            {
                "event_type": batch["event_type"].to_numpy(),
                "day": ts_us(batch["ts"]) // 86_400_000_000,
                "cents": cents(batch["value"].to_numpy()),
            }
        )
        return g.groupby(["event_type", "day"], as_index=False).sum()

    daily = merge_partials(
        read(sf_dir, "events", ["event_type", "ts", "value"]).map_batches(
            partial, batch_format="pandas"
        ),
        ["event_type", "day"],
        {"cents": "sum"},
    )
    pivot = (
        daily.pivot_table(index="day", columns="event_type", values="cents", fill_value=0)
        .astype(np.int64)
        .sort_index()
    )
    types = sorted(pivot.columns)
    rows = []
    for i, e1 in enumerate(types):
        for e2 in types[i + 1 :]:
            d = pivot[e1].to_numpy(np.int64) - pivot[e2].to_numpy(np.int64)
            rows.append((e1, e2, float(np.sqrt(float(int((d * d).sum()))))))
    return pd.DataFrame(rows, columns=["e1", "e2", "dist"])


DISTANCE_SQL = """
WITH daily AS (
  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
         CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS BIGINT) AS c
  FROM events GROUP BY event_type, day
),
grid AS (SELECT DISTINCT day FROM daily),
types AS (SELECT DISTINCT event_type FROM daily),
v AS (
  SELECT g.day, t.event_type, COALESCE(d.c, 0) AS c
  FROM grid g CROSS JOIN types t
  LEFT JOIN daily d ON d.day = g.day AND d.event_type = t.event_type
)
SELECT a.event_type AS e1, b.event_type AS e2,
       sqrt(CAST(SUM((a.c - b.c) * (a.c - b.c)) AS DOUBLE)) AS dist
FROM v a JOIN v b ON a.day = b.day AND a.event_type < b.event_type
GROUP BY e1, e2 ORDER BY e1, e2
"""


PIPELINES: dict[str, Pipeline] = {
    "distance_matrix": Pipeline(
        distance_matrix, DISTANCE_SQL, "pairwise Euclidean distance between event-type daily series, exact integer inner sums (DistanceEvaluator)"
    ),
    "convolve_series": Pipeline(
        convolve_series, CONVOLVE_SQL, "discrete convolution of two daily series from exact integer cents (ConvolutionEvaluator)"
    ),
    "series_diff": Pipeline(series_diff, SERIES_DIFF_SQL, "time-series differencing (DiffEvaluator), integer-exact"),
    "derivative_series": Pipeline(
        derivative_series, DERIVATIVE_SQL, "finite-difference derivative (DerivativeEvaluator analog), exact halves"
    ),
    "moving_median": Pipeline(moving_median_monthly, MOVING_MEDIAN_SQL, "trailing moving median (MovingMedianEvaluator)"),
    "mode_value": Pipeline(mode_value, MODE_SQL, "modal value per group (ModeEvaluator), deterministic tiebreak"),
    "chi_square": Pipeline(chi_square, CHI_SQUARE_SQL, "chi-square contingency cells (ChiSquareDataSetEvaluator)"),
    "regression_ols": Pipeline(regression_ols, REGRESSION_SQL, "OLS regression from exact moments (RegressionEvaluator)"),
    "correlation_moments": Pipeline(correlation_moments, CORRELATION_SQL, "Pearson correlation from exact moments (CorrelationEvaluator)"),
    "moving_average": Pipeline(moving_average_monthly, MOVING_AVG_SQL, "trailing moving average over monthly rollup (MovingAverageEvaluator)"),
    "facet_sample": Pipeline(facet_sample, FACET_SAMPLE_SQL, "facet over deterministic hash sample with scale-up estimate"),
    "kmeans_clusters": Pipeline(kmeans_clusters, None, "seeded k-means clustering (KmeansEvaluator); pytest-checked"),
    "dbscan_clusters": Pipeline(dbscan_clusters, None, "density clustering (DbscanEvaluator); pytest-checked"),
    "fft_magnitude": Pipeline(fft_daily_counts, None, "FFT magnitude of daily counts (FFTEvaluator); pytest-checked"),
    "hist_bins": Pipeline(hist_bins, HIST_SQL, "fixed-width histogram w/ per-bin count/min/max/mean (HistEvaluator)"),
    "describe_stats": Pipeline(describe_stats, DESCRIBE_SQL, "n/min/max/mean/variance/stddev/sumsq from exact moments (DescribeEvaluator)"),
    "ttest_welch": Pipeline(ttest_welch, TTEST_SQL, "Welch two-sample t-test from per-group exact moments (TTestEvaluator)"),
    "zscores_monthly": Pipeline(zscores_monthly, ZSCORES_SQL, "z-scores of the monthly revenue series (ZScoresEvaluator)"),
    "covariance_moments": Pipeline(covariance_moments, COVARIANCE_SQL, "sample covariance from exact moments (CovarianceEvaluator)"),
    "polyfit_quadratic": Pipeline(polyfit_quadratic, POLYFIT_SQL, "degree-2 least-squares fit via exact normal-equation moments (PolyFitEvaluator)"),
    "integrate_trapezoid": Pipeline(integrate_monthly, INTEGRATE_SQL, "running trapezoid integral of the monthly series (IntegrateEvaluator)"),
    "anova_oneway": Pipeline(anova_oneway, ANOVA_SQL, "one-way ANOVA F from per-group exact moments (AnovaEvaluator)"),
    "exp_moving_avg": Pipeline(exp_moving_avg, EMA_SQL, "exponential moving average; recursive-CTE twin evaluates the same float recurrence (ExpMovingAvgEvaluator)"),
    "lerp_midpoints": Pipeline(lerp_midpoints, LERP_SQL, "piecewise-linear midpoint interpolation of the monthly series (LerpEvaluator)"),
    "cosine_series": Pipeline(cosine_series, COSINE_SERIES_SQL, "cosine similarity of the series vs its lag from exact integer dot/norms (CosineSimilarityEvaluator)"),
    "mann_whitney": Pipeline(mann_whitney, MANN_WHITNEY_SQL, "Mann-Whitney U with exact integer midranks + tie-corrected z (MannWhitneyUEvaluator)"),
}

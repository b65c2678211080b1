"""Merging t-digest quantile sketch (Dunning & Ertl, "Computing extremely
accurate quantiles using t-digests", public paper + the reference design
it mirrors: tantivy's percentiles aggregation keeps a t-digest per bucket,
`/root/reference/pg_search/src/aggregate/mod.rs` percentile path).

The exact per-group quantile in ``percentiles_agg`` assumes a group's
values fit one worker; this sketch bounds per-group state at
O(compression) so percentiles stay computable when a single group holds
billions of rows.  Build and compression are fully vectorized: centroid
boundaries come straight from the k1 scale function
``k(q) = (c / 2π)·asin(2q − 1)`` (uniform in k ⇒ fine near the tails,
coarse in the middle), so there is no per-value Python loop.

Serialization is a plain float64 ndarray ``[min, max, mean0, w0, mean1,
w1, ...]`` → ``tobytes()``, safe to carry through an Arrow binary column
and hash-stable for exactly-once sinks.
"""

from __future__ import annotations

import numpy as np

__all__ = ["TDigest"]


def _k1_boundaries(compression: float) -> np.ndarray:
    """Quantile boundaries q_j where the k1 scale crosses successive
    integers: k spans [−c/4, c/4], so there are ~c/2 clusters."""
    c = float(compression)
    ks = np.arange(np.ceil(c / 2.0) + 1, dtype=np.float64)
    q = (np.sin(np.pi * (2.0 * ks / c - 0.5)) + 1.0) / 2.0
    q[0], q[-1] = 0.0, 1.0
    return q


class TDigest:
    """Immutable-ish t-digest: sorted centroid means + weights + min/max."""

    __slots__ = ("means", "weights", "vmin", "vmax", "compression")

    def __init__(self, means: np.ndarray, weights: np.ndarray,
                 vmin: float, vmax: float, compression: float = 200.0):
        self.means = means
        self.weights = weights
        self.vmin = vmin
        self.vmax = vmax
        self.compression = compression

    # -- construction --------------------------------------------------------

    @classmethod
    def empty(cls, compression: float = 200.0) -> "TDigest":
        z = np.empty(0, dtype=np.float64)
        return cls(z, z, np.nan, np.nan, compression)

    @classmethod
    def from_values(cls, x: np.ndarray, compression: float = 200.0) -> "TDigest":
        x = np.asarray(x, dtype=np.float64)
        x = x[~np.isnan(x)]
        if len(x) == 0:
            return cls.empty(compression)
        x = np.sort(x)
        return cls._compress(x, np.ones(len(x), dtype=np.float64),
                             float(x[0]), float(x[-1]), compression)

    @classmethod
    def _compress(cls, means: np.ndarray, weights: np.ndarray,
                  vmin: float, vmax: float, compression: float) -> "TDigest":
        """Cluster (sorted-by-mean) centroids into k1-scale bins.

        Uses fixed quantile boundaries from the scale function and
        assigns each centroid to the bin of its cumulative-weight
        midpoint — the buffered-merge variant of the published merging
        algorithm (boundaries fixed per pass instead of greedily
        re-derived, which keeps the pass vectorizable; accuracy bounds
        are the same O(1/c) at the tails)."""
        W = float(weights.sum())
        q = _k1_boundaries(compression)
        mid = (np.cumsum(weights) - weights / 2.0) / W
        bins = np.searchsorted(q, mid, side="right") - 1
        bins = np.minimum(bins, len(q) - 2)
        # segment-reduce weight and weighted mean per bin
        nbins = len(q) - 1
        wsum = np.bincount(bins, weights=weights, minlength=nbins)
        msum = np.bincount(bins, weights=weights * means, minlength=nbins)
        keep = wsum > 0
        return cls(msum[keep] / wsum[keep], wsum[keep], vmin, vmax,
                   compression)

    # -- combine -------------------------------------------------------------

    @staticmethod
    def merge_all(digests: list, compression: float = 200.0) -> "TDigest":
        digests = [d for d in digests if len(d.means)]
        if not digests:
            return TDigest.empty(compression)
        means = np.concatenate([d.means for d in digests])
        weights = np.concatenate([d.weights for d in digests])
        order = np.argsort(means, kind="stable")
        vmin = min(d.vmin for d in digests)
        vmax = max(d.vmax for d in digests)
        return TDigest._compress(means[order], weights[order], vmin, vmax,
                                 compression)

    def merge(self, other: "TDigest") -> "TDigest":
        return TDigest.merge_all([self, other], self.compression)

    # -- query ---------------------------------------------------------------

    @property
    def count(self) -> float:
        return float(self.weights.sum())

    def quantile(self, q: float) -> float:
        """Estimated value at quantile q ∈ [0, 1]: linear interpolation
        between centroid means (each assumed at its cumulative-weight
        midpoint), pinned to exact min/max at the extremes."""
        m, w = self.means, self.weights
        if len(m) == 0:
            return float("nan")
        W = w.sum()
        if len(m) == 1:
            return float(m[0])
        target = q * W
        mid = np.cumsum(w) - w / 2.0
        if target <= mid[0]:
            # interpolate min -> first centroid midpoint
            f = target / mid[0] if mid[0] > 0 else 1.0
            return float(self.vmin + f * (m[0] - self.vmin))
        if target >= mid[-1]:
            span = W - mid[-1]
            f = (target - mid[-1]) / span if span > 0 else 0.0
            return float(m[-1] + f * (self.vmax - m[-1]))
        j = int(np.searchsorted(mid, target, side="right"))
        lo_m, hi_m = m[j - 1], m[j]
        lo_c, hi_c = mid[j - 1], mid[j]
        f = (target - lo_c) / (hi_c - lo_c) if hi_c > lo_c else 0.0
        return float(lo_m + f * (hi_m - lo_m))

    def percentile(self, p: float) -> float:
        return self.quantile(p / 100.0)

    # -- serialization -------------------------------------------------------

    def to_bytes(self) -> bytes:
        buf = np.concatenate(
            [[self.vmin, self.vmax],
             np.column_stack([self.means, self.weights]).ravel()]
        ).astype(np.float64)
        return buf.tobytes()

    @classmethod
    def from_bytes(cls, b: bytes, compression: float = 200.0) -> "TDigest":
        arr = np.frombuffer(b, dtype=np.float64)
        if len(arr) < 2:
            return cls.empty(compression)
        pairs = arr[2:].reshape(-1, 2)
        return cls(pairs[:, 0].copy(), pairs[:, 1].copy(),
                   float(arr[0]), float(arr[1]), compression)

"""Mergeable sketches: distributed approximate distinct counting.

Pattern (the scalable aggregate shape): each batch computes ONE
constant-size sketch (a HyperLogLog register array), the tiny partials
are merged associatively — registers max-combine — and the estimate is
read off the merged sketch. Nothing row-shaped ever shuffles.

Standard public HyperLogLog (Flajolet et al. 2007) with the usual
small-range linear-counting correction; hashes are 64-bit SipHash via
pandas.util.hash_array (its fixed default key — deterministic across
processes and runs, vectorized in C; the md5-per-token Python loop it
replaced was 6x slower).
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa


class HyperLogLog:
    def __init__(self, p: int = 12):
        self.p = p
        self.m = 1 << p
        self.registers = np.zeros(self.m, dtype=np.uint8)
        if p == 12:
            self.alpha = 0.7213 / (1 + 1.079 / self.m)
        else:
            self.alpha = 0.7213 / (1 + 1.079 / self.m)

    @staticmethod
    def _hash64(values: list[str]) -> np.ndarray:
        import pandas as pd

        return pd.util.hash_array(
            np.asarray(values, dtype=object), categorize=False
        ).astype(np.uint64)

    def add(self, values: list[str]) -> "HyperLogLog":
        if not values:
            return self
        return self.add_hashed(self._hash64(values))

    def add_hashed(self, h: np.ndarray) -> "HyperLogLog":
        """Update from PRE-HASHED uniform 64-bit values (vectorized fast
        path for integer keys: callers hash the native int64 column in
        one C pass instead of casting to strings row-by-row)."""
        if len(h) == 0:
            return self
        h = np.asarray(h, dtype=np.uint64)
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        rest = (h << np.uint64(self.p)) | np.uint64((1 << self.p) - 1)
        # rank = leading zeros of the remaining 64-p bits, + 1
        lz = np.zeros(len(h), dtype=np.uint8)
        x = rest.copy()
        for shift in (32, 16, 8, 4, 2, 1):
            mask = x < (np.uint64(1) << np.uint64(64 - shift))
            lz[mask] += shift
            x[mask] = x[mask] << np.uint64(shift)
        rank = lz + 1
        np.maximum.at(self.registers, idx, rank)
        return self

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        assert other.p == self.p
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    def estimate(self) -> float:
        inv = np.power(2.0, -self.registers.astype(np.float64))
        e = self.alpha * self.m * self.m / inv.sum()
        if e <= 2.5 * self.m:
            zeros = int((self.registers == 0).sum())
            if zeros:
                e = self.m * math.log(self.m / zeros)
        return float(e)

    def to_bytes(self) -> bytes:
        return self.registers.tobytes()

    @classmethod
    def from_bytes(cls, b: bytes, p: int = 12) -> "HyperLogLog":
        h = cls(p)
        h.registers = np.frombuffer(b, dtype=np.uint8).copy()
        return h


def approx_distinct(ds, value_fn, *, p: int = 12) -> float:
    """Approximate distinct count of value_fn(batch) → list[str] across
    the Dataset: per-batch sketch partials, associative merge, estimate.
    """

    def partial(batch: pa.Table) -> pa.Table:
        h = HyperLogLog(p).add(value_fn(batch))
        return pa.table({"sketch": pa.array([h.to_bytes()], pa.binary())})

    partials = ds.map_batches(partial, batch_format="pyarrow").take_all()
    acc = HyperLogLog(p)
    for r in partials:
        acc.merge(HyperLogLog.from_bytes(r["sketch"], p))
    return acc.estimate()


def distinct_tokens(ds, text_col: str = "text", p: int = 12) -> float:
    """Approximate distinct whitespace-token count over a text column."""

    def tokens(batch: pa.Table) -> list[str]:
        out: list[str] = []
        for t in batch.column(text_col).to_pylist():
            if t:
                out.extend(set(t.split(" ")))
        return out

    return approx_distinct(ds, tokens, p=p)


# -- Histogram quantile sketch (HDR-histogram family) ------------------------


def hist_quantiles(ds, *, value_col: str, bin_width: int = 16,
                   qs: tuple[float, ...] = (0.5, 0.9, 0.99),
                   id_filter=None):
    """Mergeable histogram sketch → quantiles of an integer column.

    The production shape for corpus-wide P50/P95/P99 at 10^12 rows
    (HDR-histogram style): each block reduces to ONE fixed-size
    bincount partial of ``value // bin_width``; partials are summed
    (associative, any merge order) and the quantile is read off the
    cumulative counts. Nothing row-sized leaves the blocks; the driver
    sees len(bins) integers per block.

    Resolution is exact-to-bin BY CONSTRUCTION: the result equals
    DuckDB ``quantile_disc((v // W) * W, q)`` bit-for-bit (binning is
    monotone, so the disc-quantile of binned values IS the binned
    disc-quantile) — which is what makes this sketch SQL-checkable,
    unlike sampling sketches. Index convention = quantile_disc:
    smallest value with cumulative count ≥ ceil(q·n).

    Returns a one-row pa.Table: (n, q50, q90, q99, ... named by qs).
    """
    import math

    def per_block(b: pa.Table) -> pa.Table:
        v = b.column(value_col).to_numpy(zero_copy_only=False).astype(np.int64)
        if id_filter is not None:
            v = v[id_filter(b)]
        bins = np.bincount(v // bin_width)
        return pa.table({"hist": pa.array([bins.tolist()],
                                          pa.list_(pa.int64()))})

    parts = []
    for blk in ds.map_batches(per_block, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        for row in blk.column("hist").to_pylist():
            parts.append(np.asarray(row, dtype=np.int64))
    width = max((len(p) for p in parts), default=0)
    merged = np.zeros(width, dtype=np.int64)
    for p in parts:
        merged[: len(p)] += p
    n = int(merged.sum())
    cum = np.cumsum(merged)
    out = {"n": pa.array([n], pa.int64())}
    for q in qs:
        target = math.ceil(q * n) if n else 0
        idx = int(np.searchsorted(cum, target)) if n else 0
        out[f"q{int(q * 100)}"] = pa.array(
            [idx * bin_width if n else None], pa.int64()
        )
    return pa.table(out)

"""HyperLogLog cardinality sketch as a mergeable Ray Data aggregate.

Public algorithm (Flajolet et al. 2007, with the standard small-range
linear-counting correction). The Ray shape is the canonical mergeable-
sketch pattern for 100-TB streams: every block folds its values into
one fixed-size register array (2^p bytes, independent of block size)
inside ``map_batches``; the per-block partials — metadata-sized, a few
KiB each — are OR-merged (register-wise max) into one sketch. Nothing
row-sized ever crosses the shuffle or reaches the driver: the reduce
moves ``num_blocks × 2^p`` bytes total, the same shape as a count.

Determinism: the value hash is a fixed-parameter splitmix64 (ints) /
blake2b (strings), so the estimate is a pure function of the value
set — stable across runs, partitionings and merge orders (max is
associative+commutative), which is what lets tests pin exact outputs.
"""

from __future__ import annotations

import hashlib
import math
from typing import TYPE_CHECKING

import numpy as np
import pyarrow as pa

if TYPE_CHECKING:  # pragma: no cover
    import ray.data

_U64 = np.uint64


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (public domain constants) —
    uniform 64-bit hash for int64/uint64 value arrays."""
    z = x.astype(_U64, copy=True)
    z += _U64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> _U64(30))) * _U64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> _U64(27))) * _U64(0x94D049BB133111EB)
    return z ^ (z >> _U64(31))


def _bit_length_u64(x: np.ndarray) -> np.ndarray:
    """Exact vectorized bit length (binary reduction — no float
    round-trip, which mis-rounds near powers of two past 2^53)."""
    x = x.copy()
    bl = np.zeros(x.shape, np.int64)
    for s in (32, 16, 8, 4, 2, 1):
        big = x >= (_U64(1) << _U64(s))
        bl[big] += s
        x[big] >>= _U64(s)
    bl += (x > 0).astype(np.int64)
    return bl


def hash_column(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Column → uint64 hashes: splitmix64 for integer types, blake2b-8
    per distinct-ish value for strings (the unavoidable per-value path
    for variable-width data; still one pass per batch)."""
    typ = col.type
    if pa.types.is_integer(typ):
        return splitmix64(col.to_numpy(zero_copy_only=False).astype(np.int64))
    vals = col.to_pylist()
    return np.fromiter(
        (
            int.from_bytes(
                hashlib.blake2b(str(v).encode("utf-8"), digest_size=8).digest(), "big"
            )
            for v in vals
        ),
        dtype=_U64,
        count=len(vals),
    )


class HyperLogLog:
    """Fixed-precision HLL: 2^p uint8 registers."""

    def __init__(self, p: int = 14):
        if not 4 <= p <= 18:
            raise ValueError("p must be in [4, 18]")
        self.p = p
        self.m = 1 << p
        self.registers = np.zeros(self.m, np.uint8)

    def add_hashes(self, h: np.ndarray) -> "HyperLogLog":
        p = _U64(self.p)
        idx = (h >> (_U64(64) - p)).astype(np.int64)
        low = h & ((_U64(1) << (_U64(64) - p)) - _U64(1))
        # rank = leading zeros of the low 64-p bits + 1 ∈ [1, 65-p]
        rank = (65 - self.p - _bit_length_u64(low)).astype(np.uint8)
        np.maximum.at(self.registers, idx, rank)
        return self

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        if other.p != self.p:
            raise ValueError("precision mismatch")
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    def estimate(self) -> float:
        m = float(self.m)
        alpha = 0.7213 / (1.0 + 1.079 / m)
        raw = alpha * m * m / np.sum(np.exp2(-self.registers.astype(np.float64)))
        if raw <= 2.5 * m:
            zeros = int(np.count_nonzero(self.registers == 0))
            if zeros:
                return m * np.log(m / zeros)  # linear counting
        return float(raw)

    def to_bytes(self) -> bytes:
        return self.registers.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes, p: int) -> "HyperLogLog":
        hll = cls(p)
        hll.registers = np.frombuffer(data, np.uint8).copy()
        return hll


def approx_distinct(
    ds: "ray.data.Dataset", col: str, group_col: str | None = None, p: int = 14
) -> pa.Table:
    """Approximate distinct count of ``col`` (optionally per
    ``group_col`` value) via per-block HLL partials.

    Each block emits one row per group: (group, registers-binary).
    The partials table is num_blocks × n_groups rows of 2^p bytes —
    metadata-sized — so the final register-max merge happens driver
    side, exactly like any count/sum reduce. Intended for
    low-cardinality group keys (per-source, per-language, per-day
    style telemetry); high-cardinality grouping should use the exact
    two-level groupby (``q_daily_active_users`` shape) instead.
    """

    def partial(t: pa.Table) -> pa.Table:
        groups: dict[str, HyperLogLog] = {}
        if group_col is None:
            hll = HyperLogLog(p).add_hashes(hash_column(t[col]))
            groups["__all__"] = hll
        else:
            keys = np.asarray(t[group_col].to_pylist())
            hashes = hash_column(t[col])
            for k in np.unique(keys):
                groups[str(k)] = HyperLogLog(p).add_hashes(hashes[keys == k])
        return pa.table(
            {
                "group": pa.array(list(groups), pa.string()),
                "regs": pa.array([g.to_bytes() for g in groups.values()], pa.binary()),
            }
        )

    partials = ds.map_batches(
        partial, batch_format="pyarrow", batch_size=131072
    ).take_all()  # num_blocks × n_groups tiny rows — the reduce input
    merged: dict[str, HyperLogLog] = {}
    for r in partials:
        sk = HyperLogLog.from_bytes(r["regs"], p)
        if r["group"] in merged:
            merged[r["group"]].merge(sk)
        else:
            merged[r["group"]] = sk
    items = sorted(merged.items())
    out_groups = [k for k, _ in items]
    # half-up (estimates are positive) — the same floor(x + 0.5) rule
    # the SQL oracle uses, not Python banker's round
    ests = [int(np.floor(v.estimate() + 0.5)) for _, v in items]
    cols: dict[str, pa.Array] = {}
    if group_col is not None:
        cols[group_col] = pa.array(out_groups, pa.string())
    cols["approx_distinct"] = pa.array(ests, pa.int64())
    return pa.table(cols)


# ------------------------------------------------- Count-Min sketch


class CountMin:
    """Count-Min sketch (Cormode & Muthukrishnan 2005): d rows of w
    counters; add/merge are element-wise SUMS, so the merged sketch is
    a pure function of the multiset — deterministic under any block
    order or parallelism. Estimates only ever over-count."""

    def __init__(self, d: int = 4, w: int = 2048):
        self.d, self.w = d, w
        self.tab = np.zeros((d, w), dtype=np.int64)
        # fixed odd row salts → reproducible row hashes
        self._salts = (splitmix64(np.arange(1, d + 1, dtype=np.int64)) | _U64(1))

    def _rows(self, h: np.ndarray) -> np.ndarray:
        """(d, n) counter indices for uint64 value hashes."""
        return np.stack(
            [((h * s) >> _U64(32)).astype(np.int64) % self.w for s in self._salts]
        )

    def add_hashes(self, h: np.ndarray, counts: np.ndarray | None = None) -> "CountMin":
        if len(h) == 0:
            return self
        c = np.ones(len(h), np.int64) if counts is None else counts.astype(np.int64)
        for d_i, idx in enumerate(self._rows(h)):
            np.add.at(self.tab[d_i], idx, c)
        return self

    def merge(self, other: "CountMin") -> "CountMin":
        self.tab += other.tab
        return self

    def estimate_hashes(self, h: np.ndarray) -> np.ndarray:
        if len(h) == 0:
            return np.zeros(0, np.int64)
        rows = self._rows(h)
        return np.min(
            np.stack([self.tab[i][rows[i]] for i in range(self.d)]), axis=0
        )

    def to_bytes(self) -> bytes:
        return self.tab.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes, d: int = 4, w: int = 2048) -> "CountMin":
        sk = cls(d, w)
        sk.tab = np.frombuffer(data, dtype=np.int64).reshape(d, w).copy()
        return sk


def heavy_hitters(
    ds: "ray.data.Dataset",
    col: str,
    phi: float = 0.001,
    d: int = 4,
    w: int = 2048,
    candidates_per_block: int | None = None,
) -> pa.Table:
    """Approximate heavy hitters of ``col``: non-null values with
    frequency ≥ phi·n (n = COUNT(col), nulls excluded), found without
    any value-keyed shuffle.

    Every block emits ONE row — its CMS partial (d×w int64, fixed
    size) plus its local top-``candidates_per_block`` values with
    in-block counts. The driver sums the sketches (order-independent),
    unions the candidate sets, and keeps candidates whose CMS estimate
    clears the threshold. Candidate-recall guarantee: a value with
    true global frequency ≥ phi·n has, in at least one block, an
    in-block frequency ≥ phi·n_block (else its total would be
    < phi·Σn_block), and a block holds at most ⌈1/phi⌉ values at that
    in-block frequency — so ``candidates_per_block ≥ ⌈1/phi⌉``
    (the default) makes the candidate union contain every true heavy
    hitter; CMS only over-counts, so none is dropped at the threshold
    either. A smaller explicit ``candidates_per_block`` trades recall
    for partial-row size and loses that guarantee. Output estimates
    are deterministic (sums + fixed hashes).
    """
    import pandas as pd

    if candidates_per_block is None:
        candidates_per_block = int(math.ceil(1.0 / phi))

    def partial(t: pa.Table) -> pa.Table:
        vals = t[col].to_pandas().dropna()
        counts = vals.value_counts()
        sk = CountMin(d, w).add_hashes(
            hash_column(pa.array(list(counts.index), pa.string())),
            counts.to_numpy(),
        )
        top = counts.head(candidates_per_block)
        return pa.table(
            {
                "sketch": pa.array([sk.to_bytes()], pa.binary()),
                "cands": pa.array([list(map(str, top.index))], pa.list_(pa.string())),
                "n": pa.array([int(len(vals))], pa.int64()),
            }
        )

    rows = ds.map_batches(
        partial, batch_format="pyarrow", batch_size=131072
    ).take_all()  # one fixed-size row per block — the reduce input
    if not rows:
        return pa.table({"value": pa.array([], pa.string()),
                         "est_count": pa.array([], pa.int64())})
    merged = CountMin.from_bytes(rows[0]["sketch"], d, w)
    cands: set[str] = set(rows[0]["cands"])
    n = rows[0]["n"]
    for r in rows[1:]:
        merged.merge(CountMin.from_bytes(r["sketch"], d, w))
        cands.update(r["cands"])
        n += r["n"]
    cand_list = sorted(cands)
    ests = merged.estimate_hashes(hash_column(pa.array(cand_list, pa.string())))
    thresh = phi * n
    keep = ests >= thresh
    return pa.table(
        {
            "value": pa.array([c for c, k in zip(cand_list, keep) if k], pa.string()),
            "est_count": pa.array(ests[keep], pa.int64()),
        }
    )


def heavy_hitters_exact(
    ds: "ray.data.Dataset",
    col: str,
    phi: float = 0.001,
    d: int = 4,
    w: int = 2048,
    candidates_per_block: int | None = None,
) -> pa.Table:
    """EXACT heavy hitters (GROUP BY value HAVING COUNT(col) ≥ phi·n
    semantics, n = non-null count) without ever keying a shuffle on
    the value column:

    1. the CMS pass (:func:`heavy_hitters`) prunes to a candidate
       SUPERSET — no false negatives REQUIRES
       ``candidates_per_block ≥ ⌈1/phi⌉`` (the default; see the recall
       argument in :func:`heavy_hitters`), so an explicit smaller
       value raises rather than silently dropping true hitters;
    2. one more streaming pass recounts ONLY the candidates exactly
       (the candidate set rides the task closure — broadcast-small),
       emitting ≤ |candidates|+1 partial rows per batch; a tiny
       groupby sums them and the true ≥ phi·n filter applies to the
       EXACT counts.

    The second pass also re-derives n exactly via a sentinel partial
    row flagged by a separate ``is_n`` column (never a reachable value
    of ``col``), so "" and nulls in the data cannot corrupt it."""
    from ray.data.aggregate import Sum

    min_cand = int(math.ceil(1.0 / phi))
    if candidates_per_block is None:
        candidates_per_block = min_cand
    elif candidates_per_block < min_cand:
        raise ValueError(
            f"heavy_hitters_exact(phi={phi}) needs candidates_per_block"
            f" >= ceil(1/phi) = {min_cand} for the no-false-negative"
            f" guarantee; got {candidates_per_block}. Use"
            f" heavy_hitters() if approximate recall is acceptable."
        )

    approx = heavy_hitters(ds, col, phi, d, w, candidates_per_block)
    cand = set(approx["value"].to_pylist())

    def recount(t: pa.Table) -> pa.Table:
        vals = t[col].to_pandas().dropna()
        vc = vals[vals.isin(cand)].value_counts()
        return pa.table(
            {
                "value": pa.array(
                    [str(v) for v in vc.index] + [""], pa.string()
                ),
                "cnt": pa.array(
                    list(vc.to_numpy()) + [int(len(vals))], pa.int64()
                ),
                "is_n": pa.array([False] * len(vc) + [True], pa.bool_()),
            }
        )

    agg = (
        ds.map_batches(recount, batch_format="pyarrow", batch_size=131072)
        .groupby(["value", "is_n"])
        .aggregate(Sum("cnt", alias_name="cnt"))
        .take_all()  # ≤ |candidates|+1 rows
    )
    n = next((r["cnt"] for r in agg if r["is_n"]), 0)
    kept = sorted(
        (r["value"], r["cnt"])
        for r in agg
        if not r["is_n"] and r["cnt"] >= phi * n
    )
    return pa.table(
        {
            "value": pa.array([v for v, _ in kept], pa.string()),
            "n_count": pa.array([c for _, c in kept], pa.int64()),
        }
    )

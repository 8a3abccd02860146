"""Exact money arithmetic — the DECIMAL(40)/big.Int layer (M17).

The reference carries amounts as arbitrary-precision decimals end to
end: DECIMAL(40) columns, big.Int integer math, LegacyDec 18-digit
truncating decimals (/root/reference/pkg/util/decimals.go:12-59,
/root/reference/parser/dex/util.go:72-79). Float64 summation is
order-dependent at ~1e11 magnitudes — parallel partial sums flip the
last rounded digit run to run.

The engine's equivalent: money measures convert ONCE at the scan edge
into exact integer units (cents = 1e-2, rev_e4 = 1e-4 for the
price×(1−discount) product of two 2-decimal factors), aggregate as
int64 (associative, order-free, exact), and divide back at the very
end. Overflow headroom: int64 holds ±9.2e18 — 1e-4-unit revenue sums
stay exact to ~9×10^14 currency units per group.

The headroom is ENFORCED, not assumed (Arrow's plain int64 kernels
wrap silently):

- element arithmetic here uses the *_checked kernels — a per-element
  product past int64 raises ArrowInvalid instead of wrapping;
- group sums use ``grouped_agg`` op "sum_checked" (int64 sum with a
  count×max-magnitude no-overflow certificate; raises when the bound
  can't prove safety) or op "sum_exact" (hi/lo 32-bit split partials,
  arbitrary-precision Python-int final — the DECIMAL(40)/big.Int
  equivalent, emitted as exact decimal strings).

DuckDB oracle twins reproduce the identical integer pipeline
(CAST(round(x*100) AS BIGINT) sums; HUGEINT for past-int64 sums), so
value hashes are stable across any execution order.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def cents(col) -> "pa.ChunkedArray":
    """Money double → exact int64 cents (values are integral cents
    stored as float64; round() strips the representation error). The
    float→int64 cast is Arrow's default SAFE cast: an out-of-range
    magnitude raises rather than wrapping."""
    return pc.cast(pc.round(pc.multiply(col, pa.scalar(100.0))), pa.int64())


def rev_e4(price_col, discount_col) -> "pa.ChunkedArray":
    """price × (1 − discount) in exact 1e-4 units: integral cents ×
    (100 − integral discount percent). CHECKED int64 kernels: a product
    past ±2^63 raises ArrowInvalid instead of silently wrapping."""
    return pc.multiply_checked(
        cents(price_col),
        pc.subtract_checked(pa.scalar(100, pa.int64()), cents(discount_col)),
    )


def scale_checked(col, factor: int) -> "pa.ChunkedArray":
    """Exact integer rescale (e.g. 1e-4 units → 1e-10 units) with a
    loud per-element overflow instead of a wrap."""
    return pc.multiply_checked(col, pa.scalar(int(factor), pa.int64()))


def certify_sum_bound(col, count: "int | None" = None) -> None:
    """Raise unless count × max|v| < 2^62 — the certificate that ANY
    int64 summation order over these values is wrap-free (every prefix
    is bounded by Σ|v| ≤ count × max|v|). Used before per-batch Arrow
    group_by sums and partial folds, where the plain kernels wrap
    silently. abs_checked also rejects INT64_MIN loudly."""
    n = int(count) if count is not None else len(col)
    if n == 0:
        return
    m = pc.max(pc.abs_checked(col)).as_py()
    if m is not None and float(m) * n >= float(2**62):
        raise ValueError(
            f"money.certify_sum_bound: count({n}) × max|v|({m}) ≥ 2^62 — "
            f"an int64 sum can't be certified wrap-free; widen to "
            f"grouped_agg op 'sum_exact'"
        )


def certify_sum_bound_np(values) -> None:
    """numpy/pandas twin of ``certify_sum_bound`` for pandas folds."""
    import numpy as np

    v = np.asarray(values)
    if not len(v):
        return
    if v.dtype.kind in "iu" and (v == np.iinfo(np.int64).min).any():
        raise ValueError(
            "money.certify_sum_bound: INT64_MIN present — |v| not "
            "representable; use sum_exact"
        )
    if float(np.abs(v).max()) * len(v) >= float(2**62):
        raise ValueError(
            f"money.certify_sum_bound: count({len(v)}) × max|v| ≥ 2^62 — "
            f"an int64 sum can't be certified wrap-free; widen to "
            f"grouped_agg op 'sum_exact'"
        )

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
stay exact to ~9×10^14 currency units per group; beyond that, widen to
Arrow decimal128 at the same call sites (the helpers are the single
choke point).

DuckDB oracle twins reproduce the identical integer pipeline
(CAST(round(x*100) AS BIGINT) sums), so value hashes are stable across
any execution order.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def cents(col) -> "pa.ChunkedArray":
    """Money double → exact int64 cents (values are integral cents
    stored as float64; round() strips the representation error)."""
    return pc.cast(pc.round(pc.multiply(col, pa.scalar(100.0))), pa.int64())


def rev_e4(price_col, discount_col) -> "pa.ChunkedArray":
    """price × (1 − discount) in exact 1e-4 units: integral cents ×
    (100 − integral discount percent)."""
    return pc.multiply(
        cents(price_col),
        pc.subtract(pa.scalar(100, pa.int64()), cents(discount_col)),
    )

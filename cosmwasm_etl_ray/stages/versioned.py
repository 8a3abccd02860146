"""Version-dispatched normalization: different parse logic per
sequence-number range.

Graft of the reference's schema-evolution-by-offset pattern: mappers
are selected by height range (``pairMapperBy``,
/root/reference/parser/dex/dezswap/pair.mappers.go:41-58; the
pre/post cosmos-sdk-50 log decode split,
/root/reference/parser/dex/srcstore/terraswap/base_datastore.go:84-123).
Here a ``VersionedNormalizer`` holds an ordered list of
(from_commit, batch_fn); each batch is split by commit range masks and
every slice goes through its era's function — vectorized, no per-row
dispatch.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


class VersionedNormalizer:
    """versions: list of (from_commit:str, fn(table)->table), sorted by
    from_commit ascending; the first era implicitly starts at ''.
    Each fn must return the same schema."""

    def __init__(self, versions):
        self.versions = sorted(versions, key=lambda v: v[0])

    def __call__(self, t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return self.versions[0][1](t)
        commit = t["commit"]
        parts = []
        for i, (lo, fn) in enumerate(self.versions):
            hi = self.versions[i + 1][0] if i + 1 < len(self.versions) else None
            if i == 0:
                # the first era implicitly starts at '' (class contract):
                # no lower bound, or rows below versions[0].from_commit
                # would match NO era and silently vanish
                mask = pa.chunked_array(
                    [pa.array([True] * t.num_rows, type=pa.bool_())]
                )
            else:
                mask = pc.greater_equal(commit, pa.scalar(lo))
            if hi is not None:
                mask = pc.and_(mask, pc.less(commit, pa.scalar(hi)))
            sl = t.filter(mask)
            if sl.num_rows:
                parts.append(fn(sl))
        if not parts:
            return self.versions[0][1](t.slice(0, 0))
        return pa.concat_tables(parts, promote_options="default")

"""Metrics rollup over the manifest lineage.

The north rule asks for "resumable from checkpoint with per-partition
lineage + metrics": the lineage lives in the manifests; this module
derives the operational metrics from it — no separate metrics store to
drift out of sync (the manifests ARE the source of truth, like the
reference deriving task progress from its dest tables,
/root/reference/aggregator/task.go:595-616).
"""

from __future__ import annotations


def store_metrics(store) -> dict:
    """Roll up manifests → totals, per-epoch rates, partition stats."""
    epochs = store.committed_epochs()
    per_epoch = []
    total_applied = 0
    total_quarantined = 0
    for e in epochs:
        m = store.manifest(e)
        c = m.get("counts", {})
        applied = c.get("applied_events") or 0
        total_applied += applied
        total_quarantined += c.get("quarantined") or 0
        per_epoch.append(
            {
                "epoch": e,
                "applied_events": applied,
                "quarantined": c.get("quarantined") or 0,
                "touched_partitions": c.get("touched_partitions"),
                "offset_range": m.get("offset_range"),
                "committed_at": m.get("committed_at"),
            }
        )

    latest = store.latest_epoch()
    partitions = {}
    live_rows = rows = 0
    if latest is not None:
        parts = store.manifest(latest)["partitions"]
        rows = sum(p["rows"] for p in parts.values())
        live_rows = sum(p.get("live_rows", 0) for p in parts.values())
        sizes = sorted(p["rows"] for p in parts.values())
        partitions = {
            "count": len(parts),
            "rows_min": sizes[0] if sizes else 0,
            "rows_max": sizes[-1] if sizes else 0,
            "rows_p50": sizes[len(sizes) // 2] if sizes else 0,
            "skew_ratio": (sizes[-1] / max(1, sizes[len(sizes) // 2])) if sizes else 0,
        }

    return {
        "cursor_epoch": latest,
        "epochs_committed": len(epochs),
        "total_applied_events": total_applied,
        "total_quarantined": total_quarantined,
        "state_rows": rows,
        "state_live_rows": live_rows,
        "partitions": partitions,
        "per_epoch": per_epoch,
    }

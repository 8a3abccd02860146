"""Price derivation + router — the cross-key stateful derived stage.

Graft of the reference's price/route subsystem, the one stage whose
value for an event depends on OTHER keys' state as-of that event:

- direct price (/root/reference/pkg/dex/price/price.go:125-175): on
  every swap, price = asset ratio of the touched pair. Graft:
  ``rel_size`` — for every change event, the emitting repo's running
  live-char count divided by the BASE repo's running count as-of that
  commit (a cross-key as-of read in commit order).
- route DFS (/root/reference/pkg/dex/router/router.go:22-45,
  route_info.go:31-181): routes between tokens through pairs, rebuilt
  only when the pair set grows, sorted by hop count then lexicographic
  order (O4). Graft: repos link through langs they have live files of
  (a bipartite repo–lang graph derived from replayed state); shortest
  routes to the base repo with the same (hops, lexicographic) order.
- indirect price (price.go:194-408): walk the route multiplying
  per-hop pool ratios. Graft: per-hop node-size ratios — which
  telescope, so the reported value is the exact endpoint ratio (the
  honest float choice); the walk itself (route resolve + per-hop
  liquidity lookup, J9) is what the machinery exercises.

Physical design (SURVEY §7.4 "hard parts"):
- per-repo running sums are PARTITION-LOCAL (shard by repo, vectorized
  cumsum in commit order);
- the cross-key denominator is ONE repo's curve — broadcast once per
  epoch and binary-searched per batch (the in-memory as-of search,
  J5 / aggregator/task.go:558-578), never a shuffle;
- the incremental task (PriceTask) runs under an epoch barrier: it
  joins each epoch's events against the PRIOR epoch's replayed state
  (the J6 state ⋈ events join) for previous content lengths, carries
  per-repo totals (token-cardinality state, like the reference's price
  cache ST3) and the base-curve tail between epochs, and rebuilds the
  route table only when the edge set changes (ST4).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from cosmwasm_etl_ray.config import EngineConfig
from cosmwasm_etl_ray.functions.agg import grouped_agg, sharded_map_groups

BASE_REPO = "mono"
MAX_HOPS = 4


# ---------------------------------------------------------------- direct price


def _event_lengths(t: pa.Table) -> pa.Table:
    """Per event: the length the key has AFTER the event (0 for delete)."""
    ln = pc.if_else(
        pc.equal(t["op"], pa.scalar("delete")),
        pa.scalar(0, pa.int64()),
        pc.cast(pc.utf8_length(t["content"]), pa.int64()),
    )
    return pa.table(
        {"repo": t["repo"], "path": t["path"], "commit": t["commit"], "new_len": ln}
    )


def repo_size_stream(
    changes: "ray.data.Dataset", shards: int = 32
) -> "ray.data.Dataset":
    """(repo, commit, repo_chars): each repo's running live-char total
    after every one of its events, in commit order. ONE shuffle: shard
    by repo; within a shard both the per-(repo,path) previous-length
    lag and the per-repo cumulative sum are vectorized groupby
    transforms."""
    ev = changes.map_batches(_event_lengths, batch_format="pyarrow")

    def per_shard(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["repo", "path", "commit"], kind="stable")
        prev = (
            g.groupby(["repo", "path"], sort=False)["new_len"].shift(1).fillna(0)
        )
        g["delta"] = g["new_len"] - prev.astype("int64")
        g = g.sort_values(["repo", "commit"], kind="stable")
        g["repo_chars"] = (
            g.groupby("repo", sort=False)["delta"].cumsum().astype("int64")
        )
        return g[["repo", "commit", "repo_chars"]]

    return sharded_map_groups(ev, ["repo"], per_shard, shards=shards)


def relsize_asof(
    df: pd.DataFrame, commits: np.ndarray, chars: np.ndarray
) -> pd.DataFrame:
    """As-of rel_size against the base curve — THE shared kernel for
    all three shapes (streaming RelSize, incremental RelSizeEpoch, the
    direct exchange's part write), so a boundary-semantics change
    (side='right', the idx>=0 / chars>0 liquidity cutoffs) happens in
    exactly one place. Rows before the curve starts or at a dry base
    are dropped (no price is definable)."""
    idx = (
        np.searchsorted(commits, df["commit"].to_numpy().astype("U"), side="right")
        - 1
    )
    ok = idx >= 0
    df = df[ok]
    b = chars[idx[ok]]
    df = df[b > 0].copy()
    df["rel_size"] = df["repo_chars"].to_numpy() / b[b > 0]
    return df[["repo", "commit", "repo_chars", "rel_size"]]


def rel_size_stream(
    changes: "ray.data.Dataset", base: str = BASE_REPO, shards: int = 32
) -> "ray.data.Dataset":
    """Direct-price analogue: every event's repo_chars divided by the
    base repo's chars as-of that commit. The base curve (one repo's
    series) is broadcast once; each batch binary-searches it.

    ``sizes`` is consumed twice (base-curve extraction + the final
    map), so it is materialized into the object store once — without
    this the whole upstream shuffle would re-execute for the second
    consumer."""
    sizes = repo_size_stream(changes, shards=shards).materialize()
    base_df = (
        sizes.filter(expr=f"repo == '{base}'")
        .to_pandas()
        .sort_values("commit", kind="stable")
    )
    curve_ref = ray.put(
        (base_df["commit"].to_numpy().astype("U"), base_df["repo_chars"].to_numpy())
    )

    class RelSize:
        def __init__(self):
            self.commits, self.chars = ray.get(curve_ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            return relsize_asof(df, self.commits, self.chars)

    return sizes.map_batches(RelSize, batch_format="pandas", concurrency=(1, 8))


# --------------------------------------------------------------------- router


def repo_lang_graph(state: "ray.data.Dataset") -> tuple[pd.DataFrame, pd.DataFrame]:
    """From live state: (edges repo↔lang with n_files 'liquidity',
    node sizes in chars). Both are token-cardinality small (distributed
    pre-agg, driver-resident result — the reference's route/price cache
    scale, ST3/ST4)."""

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "repo": t["repo"],
                "lang": t["lang"],
                "chars": pc.cast(pc.utf8_length(t["content"]), pa.int64()),
            }
        )

    rl = grouped_agg(
        state.map_batches(prep, batch_format="pyarrow"),
        keys=["repo", "lang"],
        spec={"n_files": ("chars", "count"), "chars": ("chars", "sum")},
    )
    edges = rl[["repo", "lang", "n_files"]].copy()
    repo_sizes = rl.groupby("repo", as_index=False)["chars"].sum()
    lang_sizes = rl.groupby("lang", as_index=False)["chars"].sum()
    sizes = pd.concat(
        [
            repo_sizes.rename(columns={"repo": "node"}),
            lang_sizes.rename(columns={"lang": "node"}).assign(
                node=lambda d: "lang:" + d["node"]
            ),
        ],
        ignore_index=True,
    )
    return edges, sizes


def repo_lang_edges(store, epoch: int) -> pd.DataFrame:
    """Edge set ONLY (repo, lang, n_files) via a CONTENT-FREE pruned
    read of the state partitions. The per-epoch ST4 change check needs
    just the edge key — paying for the wide content column every epoch
    (as repo_lang_graph's sizes side does) made the 'rebuild only on
    growth' guard more expensive than what it guards."""
    files = list(store.partition_files(epoch).values())
    if not files:
        return pd.DataFrame(columns=["repo", "lang", "n_files"])
    ds = ray.data.read_parquet(files, columns=["repo", "lang", "op"])

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.invert(pc.equal(t["op"], pa.scalar("delete"))))
        return pa.table(
            {
                "repo": t["repo"],
                "lang": t["lang"],
                "one": pa.array(np.ones(t.num_rows, dtype=np.int64)),
            }
        )

    return grouped_agg(
        ds.map_batches(prep, batch_format="pyarrow"),
        keys=["repo", "lang"],
        spec={"n_files": ("one", "count")},
    )


def shortest_routes(
    edges: pd.DataFrame, base: str = BASE_REPO, max_hops: int = MAX_HOPS
) -> pd.DataFrame:
    """Deterministic shortest routes from every repo to the base repo
    over the bipartite repo–lang graph. Order: hop count, then
    lexicographically smallest route string (the reference's route sort
    O4, /root/reference/pkg/dex/router/route_info.go:130-147).
    Driver-side BFS over the token-cardinality edge list, recomputed
    only when the edge set changes (ST4 rebuild-on-growth)."""
    adj: dict[str, set[str]] = {}
    for r in edges.itertuples():
        u, v = r.repo, f"lang:{r.lang}"
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    if base not in adj:
        return pd.DataFrame(columns=["repo", "hops", "route"])

    # BFS distances from base
    dist = {base: 0}
    frontier = [base]
    while frontier:
        nxt = []
        for n in frontier:
            for m in adj[n]:
                if m not in dist:
                    dist[m] = dist[n] + 1
                    nxt.append(m)
        frontier = nxt

    # lexicographically-minimal shortest route per node: process nodes
    # by distance; route(n) = n + '->' + min over predecessors' routes
    route = {base: base}
    for n in sorted(dist, key=lambda x: (dist[x], x)):
        if n == base:
            continue
        preds = [m for m in adj[n] if dist.get(m) == dist[n] - 1]
        route[n] = f"{n}->" + min(route[m] for m in preds)

    rows = [
        {"repo": n, "hops": dist[n], "route": route[n]}
        for n in dist
        if not n.startswith("lang:") and n != base and dist[n] <= max_hops
    ]
    return (
        pd.DataFrame(rows, columns=["repo", "hops", "route"])
        .sort_values("repo")
        .reset_index(drop=True)
    )


def routed_prices(
    routes: pd.DataFrame, sizes: pd.DataFrame, base: str = BASE_REPO
) -> pd.DataFrame:
    """Indirect price via the route walk (J9 route ⋈ sizes resolve):
    every hop's node must resolve to a positive size; per-hop ratios
    telescope, so the reported price is the exact endpoint ratio
    chars(repo)/chars(base) — float-products along the walk would only
    add rounding noise to the same value."""
    size_by_node = dict(zip(sizes["node"], sizes["chars"]))
    rows = []
    for r in routes.itertuples():
        nodes = r.route.split("->")
        if any(size_by_node.get(n, 0) <= 0 for n in nodes):
            continue  # a dry pool breaks the route (liquidity cutoff)
        rows.append(
            {
                "repo": r.repo,
                "hops": int(r.hops),
                "price": size_by_node[nodes[0]] / size_by_node[nodes[-1]],
            }
        )
    return pd.DataFrame(rows, columns=["repo", "hops", "price"])


# --------------------------------------------------- incremental derived task


class PriceTask:
    """Incremental rel_size under the epoch barrier — wired between the
    replay and the window-stats layer like the reference's
    lp_history → price → pair_stats chain
    (/root/reference/aggregator/aggregator.go:69-84).

    Per replay epoch e (never ahead of the replay manifest):
    1. join the epoch's events against the PRIOR epoch's replayed state
       on (repo, path) for previous content lengths — the J6
       state ⋈ events join;
    2. per-repo running sums continue from the carried totals (ST5
       carry-over; token-cardinality state, like the price cache ST3);
    3. the base curve tail carries over so as-of lookups cross epoch
       boundaries;
    4. the route table recomputes only when the repo–lang edge set
       changed (ST4) and is stored per epoch.
    Output: derived/price/epoch={e}/ — a DIRECTORY of parquet parts
    written distributed (per-event rel_size rows never funnel through
    the driver); the directory rename is the commit marker, idempotent
    on re-run. Only token-cardinality things (the carry, the base
    curve tail, per-repo finals) are driver-resident.
    """

    name = "price"

    def __init__(self, store, cfg: EngineConfig, base: str | None = None):
        """``base=None`` auto-resolves the base repo at the first
        non-empty epoch (lexicographically smallest repo seen) and
        PERSISTS the choice in the carry, so every later epoch — and
        every resume — prices against the same denominator."""
        self.store = store
        self.cfg = cfg
        self.base = base
        self.root = os.path.join(store.root, "derived", "price")
        os.makedirs(self.root, exist_ok=True)

    def cursor(self) -> int | None:
        es = [
            int(d.split("=")[1])
            for d in os.listdir(self.root)
            if d.startswith("epoch=") and "." not in d
        ]
        return max(es) if es else None

    def _out(self, epoch: int) -> str:
        return os.path.join(self.root, f"epoch={epoch}")

    def _carry_path(self, epoch: int) -> str:
        return os.path.join(self.root, f"carry={epoch}.json")

    def _routes_path(self, epoch: int) -> str:
        return os.path.join(self.root, f"routes={epoch}.parquet")

    def run(self) -> list[int]:
        done = []
        start = (self.cursor() + 1) if self.cursor() is not None else 0
        for e in self.store.committed_epochs():
            if e < start:
                continue
            self.process_epoch(e, self.store.manifest(e))
            done.append(e)
        return done

    def process_epoch(self, epoch: int, manifest: dict) -> None:
        if getattr(self.cfg, "price_exchange", "dataset") == "direct":
            from cosmwasm_etl_ray.pipelines.price_direct import process_epoch_direct

            return process_epoch_direct(self, epoch, manifest)
        return self._process_epoch_dataset(epoch, manifest)

    def _process_epoch_dataset(self, epoch: int, manifest: dict) -> None:
        from cosmwasm_etl_ray.pipelines.aggregator import _epoch_source_files

        carry: dict = {"repo_chars": {}, "base_curve": [], "edges_key": None}
        if epoch > 0 and os.path.exists(self._carry_path(epoch - 1)):
            with open(self._carry_path(epoch - 1)) as f:
                carry = json.load(f)

        files = _epoch_source_files(manifest)
        if not files:
            self._finish(epoch, None, carry)
            return

        events = ray.data.read_parquet(
            files, columns=["repo", "path", "commit", "content", "op"]
        ).map_batches(_valid_events, batch_format="pyarrow").map_batches(
            _event_lengths, batch_format="pyarrow"
        )

        # J6: state ⋈ events for previous lengths (prior epoch's state).
        # The join deliberately shards by (repo, path) — hot REPOS are
        # the norm (zipf), and a by-repo colocated join makes the hot
        # repo's shard a straggler; only the (unavoidably per-repo)
        # running sum shards by repo. A single-shuffle by-repo variant
        # measured 1.6× SLOWER end to end for exactly that reason.
        prior_files = (
            list(self.store.partition_files(epoch - 1).values()) if epoch > 0 else []
        )
        if prior_files:
            from cosmwasm_etl_ray.functions.joins import hash_join

            state = ray.data.read_parquet(
                prior_files, columns=["repo", "path", "content", "op"]
            ).map_batches(_state_lengths, batch_format="pyarrow")
            joined = hash_join(
                events,
                state,
                on=["repo", "path"],
                how="left",
                left_cols={"repo": "object", "path": "object",
                           "commit": "object", "new_len": "int64"},
                right_cols={"repo": "object", "path": "object",
                            "state_len": "int64"},
            )
        else:
            joined = events.map_batches(
                lambda df: df.assign(state_len=0), batch_format="pandas"
            )

        carry_chars = {k: int(v) for k, v in carry["repo_chars"].items()}

        def per_shard(g: pd.DataFrame) -> pd.DataFrame:
            g = g.sort_values(["repo", "path", "commit"], kind="stable")
            in_epoch_prev = g.groupby(["repo", "path"], sort=False)["new_len"].shift(1)
            prev = in_epoch_prev.fillna(g["state_len"].fillna(0)).astype("int64")
            g["delta"] = g["new_len"] - prev
            g = g.sort_values(["repo", "commit"], kind="stable")
            cum = g.groupby("repo", sort=False)["delta"].cumsum()
            seed = g["repo"].map(carry_chars).fillna(0).astype("int64")
            g["repo_chars"] = (cum + seed).astype("int64")
            g["_last"] = ~g.duplicated("repo", keep="last")  # per-repo final
            return g[["repo", "commit", "repo_chars", "_last"]]

        # materialized once (object store): feeds the base-curve
        # extraction, the per-repo finals, and the rel_size map — the
        # full per-event stream NEVER lands on the driver
        sizes = sharded_map_groups(joined, ["repo"], per_shard, shards=32).materialize()

        # per-repo finals (token-cardinality) — also resolves the base
        # repo in auto mode: smallest repo of the first non-empty epoch,
        # persisted in the carry
        finals = sizes.filter(expr="_last == True").to_pandas()
        base = carry.get("base") or self.base
        if base is None and len(finals):
            base = str(finals["repo"].min())
        carry = {**carry, "base": base}

        # base curve: carried tail + this epoch's base rows (ONE repo's
        # series — bounded like the reference's price cache)
        prev_curve = pd.DataFrame(
            carry["base_curve"], columns=["commit", "repo_chars"]
        )
        base_rows = (
            sizes.filter(expr=f"repo == '{base}'").to_pandas()
            if base is not None
            else pd.DataFrame()
        )
        if len(base_rows):
            base_rows = base_rows[["commit", "repo_chars"]]
        else:
            base_rows = pd.DataFrame(columns=["commit", "repo_chars"])
        curve = (
            pd.concat([prev_curve, base_rows], ignore_index=True)
            .sort_values("commit", kind="stable")
            .reset_index(drop=True)
        )
        commits = curve["commit"].to_numpy().astype("U")
        chars = curve["repo_chars"].to_numpy().astype("int64")
        curve_ref = ray.put((commits, chars))

        class RelSizeEpoch:
            def __init__(self):
                self.commits, self.chars = ray.get(curve_ref)

            def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
                return relsize_asof(df, self.commits, self.chars)

        out_ds = sizes.map_batches(
            RelSizeEpoch, batch_format="pandas", concurrency=(1, 8)
        )

        # carry: per-repo finals (token-cardinality) + base curve tail
        final_chars = dict(carry_chars)
        if len(finals):
            final_chars.update(
                {r: int(c) for r, c in zip(finals["repo"], finals["repo_chars"])}
            )
        new_carry = {
            "repo_chars": final_chars,
            # only the last base point is needed for future as-ofs at
            # later commits (epochs are commit-ordered)
            "base_curve": [
                [str(c), int(n)]
                for c, n in curve.tail(1).itertuples(index=False)
            ],
            "edges_key": carry.get("edges_key"),
            "base": carry.get("base"),
        }
        self._finish(epoch, out_ds, new_carry, epoch_for_routes=epoch)

    def _finish(self, epoch: int, out, carry: dict,
                epoch_for_routes: int | None = None,
                parts_dir: str | None = None) -> None:
        import shutil

        # ST4: rebuild routes only when the edge set changed. The check
        # itself is content-free (repo_lang_edges) — the old full
        # repo_lang_graph scan read the wide content column per epoch
        # only to discard the sizes half.
        if epoch_for_routes is not None:
            edges = repo_lang_edges(self.store, epoch)
            key = "|".join(sorted(edges["repo"] + ":" + edges["lang"]))
            if key != carry.get("edges_key"):
                route_base = carry.get("base") or self.base or BASE_REPO
                routes = shortest_routes(edges, base=route_base)
                tmp = f"{self._routes_path(epoch)}.tmp.{os.getpid()}"
                routes.to_parquet(tmp, index=False)
                os.replace(tmp, self._routes_path(epoch))
                carry = {**carry, "edges_key": key}

        tmp = f"{self._carry_path(epoch)}.tmp.{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump(carry, f)
        os.replace(tmp, self._carry_path(epoch))

        # the output DIRECTORY rename is the commit marker (cursor):
        # write distributed into a tmp dir, then swap into place.
        # ``parts_dir``: the direct exchange's tasks already wrote
        # their parts into a tmp dir — adopt it instead of re-writing
        outdir = self._out(epoch)
        tmpdir = parts_dir or f"{outdir}.tmp.{os.getpid()}"
        # a crashed PRIOR run leaves orphan tmps under its old pid —
        # epoch output dirs AND carry=/routes= sidecar files — sweep
        # the whole task root, but ONLY tmps whose writer is dead
        # (deleting a LIVE pid's tmp would break the concurrent-writer
        # safety the pid suffix exists for)
        import glob as _glob

        for stale in _glob.glob(os.path.join(self.root, "*.tmp.*")):
            if stale == tmpdir:
                continue
            owner = stale.rsplit(".", 1)[-1]
            if owner.isdigit() and os.path.exists(f"/proc/{owner}"):
                continue  # writer still alive — leave its tmp alone
            if os.path.isdir(stale):
                shutil.rmtree(stale, ignore_errors=True)
            else:
                try:
                    os.remove(stale)
                except OSError:
                    pass
        if parts_dir is None:
            shutil.rmtree(tmpdir, ignore_errors=True)
            if out is not None:
                out.write_parquet(tmpdir)
        # an all-empty output writes no files (and no dir) — the epoch
        # marker must exist regardless
        os.makedirs(tmpdir, exist_ok=True)
        shutil.rmtree(outdir, ignore_errors=True)
        os.replace(tmpdir, outdir)

    def view(self) -> pd.DataFrame:
        import glob as _glob

        cur = self.cursor()
        files = [
            f
            for e in range((cur + 1) if cur is not None else 0)
            for f in sorted(_glob.glob(os.path.join(self._out(e), "*.parquet")))
        ]
        if not files:
            return pd.DataFrame(columns=["repo", "commit", "repo_chars", "rel_size"])
        return (
            pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
            .sort_values(["commit"], kind="stable")
            .reset_index(drop=True)
        )

    def latest_routes(self) -> pd.DataFrame:
        rs = [
            int(f.split("=")[1].split(".")[0])
            for f in os.listdir(self.root)
            if f.startswith("routes=") and f.endswith(".parquet")
        ]
        if not rs:
            return pd.DataFrame(columns=["repo", "hops", "route"])
        return pd.read_parquet(self._routes_path(max(rs)))


def _valid_events(t: pa.Table) -> pa.Table:
    """THE replay's validity predicate (stages/normalize._valid_mask),
    not a local rewrite: the derived task must drop exactly the rows
    the replay quarantined — a null-repo row that slips through here
    crashes the dataset path's cumsum int cast and silently seeds the
    direct path's carry from the wrong repo (factorize code -1)."""
    from cosmwasm_etl_ray.stages.normalize import _valid_mask

    return t.filter(_valid_mask(t))


def _state_lengths(t: pa.Table) -> pa.Table:
    ln = pc.if_else(
        pc.equal(t["op"], pa.scalar("delete")),
        pa.scalar(0, pa.int64()),
        pc.cast(pc.utf8_length(t["content"]), pa.int64()),
    )
    return pa.table({"repo": t["repo"], "path": t["path"], "state_len": ln})

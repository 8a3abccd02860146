"""Transfer mapper family: version-gated decode, canonicalizing
attr extraction, pair-set mappers, and the duplicate-transfer
eliminator.

Grafts of the reference's DEX transfer parsing onto the synthetic
raw-log domain (``sources/rawlogs.py``):

* ``decode_raw_logs`` — S5/M8/M15: drops failed txs (``code != 0``),
  then splits each batch by tx-ordinal range through
  ``VersionedNormalizer`` so the v1 ``k=v;`` and v2 ``k:v|`` attr
  encodings each get their own vectorized regex extraction (the
  pre/post cosmos-sdk-50 decode split,
  /root/reference/parser/dex/srcstore/terraswap/base_datastore.go:84-123).
  Extraction is BY KEY, never by position — the canonicalization the
  reference does by sorting attr groups
  (/root/reference/pkg/eventlog/util.go:11-56).

* ``TransferMapperFamily`` — M6/M7/M9/M11/M16: a callable class for
  ``map_batches`` actor pools; the pair key set, lp->pair dict and
  token skip list are actor state built once in ``__init__``
  (/root/reference/parser/dex/mapper.go:61-149 wasm transfers signed
  against the pair set; :156-249 native multi-coin amount strings;
  :251-278 initial provide = mint-to-pair; :306-339 burns joined to
  lpAddr->pair and dropped when the pair itself is the sender). All
  paths are pyarrow-vectorized; amount-asset strings parse with the
  M16 regex split (/root/reference/parser/dex/util.go:16-57).

* ``eliminate_duplicate_transfers`` — M12/D1: within each tx group,
  pair-action rows build a pop-list of (pair, token, expected amount)
  and consume matching transfer rows 1:1 in log order (CW20 fee
  tolerance on the pair->user direction modeled as the deterministic
  fee-net expectation), /root/reference/parser/dex/dex.go:725-792.
  Runs as a coarse-sharded group stage — ~shards tasks, vectorized
  ranking inside, never one task per tx.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from cosmwasm_etl_ray.sources.rawlogs import (
    EXCEPTION_TOKEN,
    FEE_MOD,
    LP_TO_PAIR,
    PAIR_SET,
    TX_PAD,
    V2_FROM_TX,
)
from cosmwasm_etl_ray.stages.versioned import VersionedNormalizer

def _extract_decoder(pattern_fmt: str):
    """A decode fn for one attr-encoding era: extract each attr by key
    with a compiled-by-Arrow regex (order-independent by construction)."""

    def decode(t: pa.Table) -> pa.Table:
        attrs = t["attrs"].combine_chunks() if t.num_rows else pa.array([], pa.string())

        def grab(key: str) -> pa.Array:
            ex = pc.extract_regex(attrs, pattern=pattern_fmt.format(key=key))
            return pc.struct_field(ex, "v")

        return pa.table(
            {
                "tx_id": t["tx_id"],
                "log_idx": t["log_idx"],
                "kind": t["kind"],
                "contract": grab("contract"),
                "sender": grab("from"),
                "recipient": grab("to"),
                "amount_str": grab("amount"),
            }
        )

    return decode


# v1: `key=value` segments joined by ';'; v2: `key:value` joined by '|'
_DECODE_V1 = _extract_decoder(r"(?:^|;){key}=(?P<v>[^;]*)")
_DECODE_V2 = _extract_decoder(r"(?:^|\|){key}:(?P<v>[^|]*)")

_VERSIONED_DECODE = VersionedNormalizer(
    [("", _DECODE_V1), (str(V2_FROM_TX).zfill(TX_PAD), _DECODE_V2)]
)


def decode_raw_logs_batch(t: pa.Table) -> pa.Table:
    """Raw logs -> canonical decoded logs. Failed txs are skipped at
    the read, like the reference's ``Code != 0`` guard."""
    t = t.filter(pc.equal(t["code"], pa.scalar(0, pa.int64())))
    return _VERSIONED_DECODE(t)


class TransferMapperFamily:
    """Decoded logs -> signed ledger rows
    ``(tx_id, log_idx, pair, token, ttype, amount)``.

    Sign convention: amounts INTO a pair are positive, out of a pair
    negative (the reference's fromPair/toPair split,
    /root/reference/parser/dex/mapper.go:100-113). Rows touching no
    registered pair, exception tokens, pair-sender burns, non-initial
    mints and malformed logs (no amount) are dropped.
    """

    def __init__(
        self,
        pair_set: frozenset[str] = PAIR_SET,
        lp_to_pair: dict[str, str] | None = None,
        token_exceptions: frozenset[str] = frozenset({EXCEPTION_TOKEN}),
    ):
        lp_to_pair = LP_TO_PAIR if lp_to_pair is None else lp_to_pair
        self.pairs = pa.array(sorted(pair_set), pa.string())
        self.lp_keys = pa.array(list(lp_to_pair), pa.string())
        self.lp_vals = pa.array(
            [lp_to_pair[k] for k in lp_to_pair], pa.string()
        )
        self.exceptions = pa.array(sorted(token_exceptions), pa.string())

    def _is_pair(self, col: pa.ChunkedArray | pa.Array):
        return pc.fill_null(pc.is_in(col, value_set=self.pairs), False)

    @staticmethod
    def _rows(sub: pa.Table, pair, token, ttype: str, amount) -> pa.Table:
        n = sub.num_rows
        return pa.table(
            {
                "tx_id": sub["tx_id"],
                "log_idx": sub["log_idx"],
                "pair": pc.cast(pair, pa.string()),
                "token": pc.cast(token, pa.string()),
                "ttype": pa.array([ttype] * n, pa.string()),
                "amount": pc.cast(amount, pa.int64()),
            }
        )

    def _signed_transfer_rows(
        self, sub: pa.Table, token, amount
    ) -> list[pa.Table]:
        """Emit one row per pair SIDE of a transfer: +amount into the
        recipient pair, -amount out of the sender pair (both rows when
        two pairs transact directly)."""
        out = []
        token = pc.cast(token, pa.string())
        amount = pc.cast(amount, pa.int64())
        base = sub.append_column("_tok", token).append_column("_amt", amount)
        to_pair = base.filter(self._is_pair(base["recipient"]))
        if to_pair.num_rows:
            out.append(
                self._rows(
                    to_pair, to_pair["recipient"], to_pair["_tok"],
                    "transfer", to_pair["_amt"],
                )
            )
        from_pair = base.filter(self._is_pair(base["sender"]))
        if from_pair.num_rows:
            out.append(
                self._rows(
                    from_pair, from_pair["sender"], from_pair["_tok"],
                    "transfer", pc.negate_checked(from_pair["_amt"]),
                )
            )
        return out

    def __call__(self, t: pa.Table) -> pa.Table:
        # malformed logs (missing amount attr) never reach a mapper
        t = t.filter(pc.invert(pc.is_null(t["amount_str"])))
        kind = t["kind"]
        parts: list[pa.Table] = []

        # M6 — wasm transfers, skip-listed tokens dropped
        wasm = t.filter(
            pc.and_(
                pc.equal(kind, pa.scalar("wasm")),
                pc.invert(
                    pc.fill_null(
                        pc.is_in(t["contract"], value_set=self.exceptions), False
                    )
                ),
            )
        )
        if wasm.num_rows:
            parts += self._signed_transfer_rows(
                wasm, wasm["contract"], pc.cast(wasm["amount_str"], pa.int64())
            )

        # M7 — native multi-coin amount strings "123tok_01,62tok_02"
        native = t.filter(pc.equal(kind, pa.scalar("native")))
        if native.num_rows:
            coins = pc.extract_regex(
                native["amount_str"].combine_chunks(),
                pattern=r"^(?P<a1>\d+)(?P<t1>[^,]+),(?P<a2>\d+)(?P<t2>.+)$",
            )
            for ak, tk in (("a1", "t1"), ("a2", "t2")):
                parts += self._signed_transfer_rows(
                    native,
                    pc.struct_field(coins, tk),
                    pc.cast(pc.struct_field(coins, ak), pa.int64()),
                )

        # pair actions: asset-amount string parsed by the M16 split;
        # only known pair contracts emit (sign: into-pair positive)
        action = t.filter(
            pc.and_(
                pc.equal(kind, pa.scalar("action")),
                self._is_pair(t["contract"]),
            )
        )
        if action.num_rows:
            aa = pc.extract_regex(
                action["amount_str"].combine_chunks(),
                pattern=r"^(?P<a>\d+)(?P<t>.+)$",
            )
            amt = pc.cast(pc.struct_field(aa, "a"), pa.int64())
            into = pc.equal(action["recipient"], action["contract"])
            signed = pc.if_else(into, amt, pc.negate_checked(amt))
            parts.append(
                self._rows(
                    action, action["contract"], pc.struct_field(aa, "t"),
                    "provide", signed,
                )
            )

        # M9 — initial provide: LP mint whose recipient IS a known pair
        mint = t.filter(
            pc.and_(
                pc.equal(kind, pa.scalar("mint")),
                self._is_pair(t["recipient"]),
            )
        )
        if mint.num_rows:
            parts.append(
                self._rows(
                    mint, mint["recipient"], mint["contract"],
                    "initial_provide", pc.cast(mint["amount_str"], pa.int64()),
                )
            )

        # M11 — burns: lp->pair dict lookup; drop pair-sender burns
        burn = t.filter(pc.equal(kind, pa.scalar("burn")))
        if burn.num_rows:
            idx = pc.index_in(burn["contract"], value_set=self.lp_keys)
            pair = pc.take(self.lp_vals, idx)  # null when lp unknown
            keep = pc.and_(
                pc.invert(pc.is_null(pair)),
                pc.invert(pc.fill_null(pc.equal(burn["sender"], pair), False)),
            )
            burn = burn.append_column("_pair", pair).filter(keep)
            if burn.num_rows:
                parts.append(
                    self._rows(
                        burn, burn["_pair"], burn["contract"], "burn",
                        pc.negate_checked(
                            pc.cast(burn["amount_str"], pa.int64())
                        ),
                    )
                )

        if not parts:
            return pa.table(
                {
                    "tx_id": pa.array([], pa.int64()),
                    "log_idx": pa.array([], pa.int64()),
                    "pair": pa.array([], pa.string()),
                    "token": pa.array([], pa.string()),
                    "ttype": pa.array([], pa.string()),
                    "amount": pa.array([], pa.int64()),
                }
            )
        return pa.concat_tables(parts)


def _eliminate_shard(g: pd.DataFrame) -> pd.DataFrame:
    """Vectorized pop-list consume across ALL txs of one shard: the
    n-th transfer matching a pop key (tx, pair, token, expected amount)
    is consumed while n <= the key's action count; survivors and every
    non-transfer row pass through."""
    is_t = g["ttype"] == "transfer"
    is_a = g["ttype"] == "provide"
    actions = g[is_a]
    amt = actions["amount"].to_numpy()
    exp = np.where(amt >= 0, amt, -((-amt) - ((-amt) % FEE_MOD)))
    pop = (
        pd.DataFrame(
            {
                "tx_id": actions["tx_id"].to_numpy(),
                "pair": actions["pair"].to_numpy(),
                "token": actions["token"].to_numpy(),
                "amount": exp,
            }
        )
        .groupby(["tx_id", "pair", "token", "amount"], sort=False)
        .size()
        .rename("n_pop")
        .reset_index()
    )
    transfers = g[is_t].sort_values("log_idx", kind="stable")
    rn = transfers.groupby(
        ["tx_id", "pair", "token", "amount"], sort=False
    ).cumcount()
    transfers = transfers.assign(_rn=rn).merge(
        pop, on=["tx_id", "pair", "token", "amount"], how="left"
    )
    kept = transfers[
        transfers["n_pop"].isna() | (transfers["_rn"] >= transfers["n_pop"])
    ].drop(columns=["_rn", "n_pop"])
    return pd.concat([kept, g[~is_t]], ignore_index=True)


def eliminate_duplicate_transfers(
    ds: "ray.data.Dataset", shards: int = 64
) -> "ray.data.Dataset":
    from cosmwasm_etl_ray.functions.agg import sharded_map_groups

    return sharded_map_groups(ds, ["tx_id"], _eliminate_shard, shards=shards)

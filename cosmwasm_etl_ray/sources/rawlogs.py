"""Deterministic per-tx raw event-log stream derived from ``lineitem``.

This is the transfer-domain twin of ``sources/changes.py``: the same
pure-integer formulas expand each lineitem row into 1-2 raw event logs
(wasm transfer / native transfer / pair action + its duplicate
transfer / LP mint / LP burn / noise), encoded as an UNORDERED,
VERSION-SPLIT attribute string that the decode stage
(``stages/transfers.py``) must canonicalize and version-dispatch —
grafting the reference's raw tx log shape
(/root/reference/parser/dto.go:9-17, attr groups per log type
/root/reference/parser/srcstore/mappers.go:25-81) without any external
chain connector.

Per lineitem row (ok=l_orderkey, ln=l_linenumber, pk=l_partkey,
sk=l_suppkey, q=int l_quantity):

    kdet = (ok*31 + ln*17) % 10     log kind selector
    p    = pk % 29                  pair id   -> pair_{p:02d} / lp_{p:02d}
    a    = sk % 13                  token     -> tok_{a:02d}
    b    = (sk+1) % 13              2nd native coin tok_{b:02d}
    u    = (pk*7 + sk) % 97         user      -> addr_{u:03d}
    amt  = q*1000 + pk % 997        integer amount
    amt2 = amt // 2 + 1             2nd native coin amount
    net  = amt - amt % 7            fee-net amount (pair->user CW20 fee)
    dir  = (ok + ln) % 2            0: user->pair, 1: pair->user

    kdet 0-3 -> wasm transfer      (contract=tok, amount=amt)
    kdet 4-5 -> native transfer    (amount string "{amt}{tok},{amt2}{tok2}")
    kdet 6   -> pair action (contract=pair, amount "{amt}{tok}") PLUS a
                duplicate wasm transfer at log_idx+1 (amount amt when
                user->pair, fee-net when pair->user) — the M12 input
    kdet 7   -> LP mint   (contract=lp, to=pair when dir=0 else user)
    kdet 8   -> LP burn   (contract=lp, from=user when dir=0 else pair)
    kdet 9   -> noise log (no amount attr; must be rejected downstream)

Failed txs: ok % 53 == 0 marks the whole tx failed (``code=1``); the
decode stage drops them (the reference skips ``Code != 0`` txs,
/root/reference/parser/dex/srcstore/terraswap/base_datastore.go:96-101).

Attr encoding (schema evolution by offset, S5): txs with
ok < ``V2_FROM_TX`` use v1 ``key=value;...``; later txs use v2
``key:value|...``. Segment ORDER is scrambled by perm=(ok*3+ln)%3 —
the chain emits attrs unordered (M8,
/root/reference/pkg/eventlog/util.go:11-56); decode must extract by
key, never by position.

String assembly runs through Arrow kernels
(``binary_join_element_wise`` + int->string casts) over
lookup-table labels — the numpy ``np.char`` fixed-width path measured
20 s per 600k rows vs <1 s here; only the integer math stays numpy.

The oracle SQL in ``pipelines/queries_transfers.py`` rebuilds the
LEDGER from these formulas from first principles — it never round-trips
the string encoding, so the engine's encode->decode->map path is
verified end-to-end against an independent derivation.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

V2_FROM_TX = 1000          # first tx of the v2 attr encoding era
TX_PAD = 10                # zero-pad width of the tx-ordinal commit key
N_PAIRS = 29
N_TOKENS = 13
N_USERS = 97
FEE_MOD = 7
FAILED_EVERY = 53
EXCEPTION_TOKEN = "tok_07"                       # the skip-listed CW20

# pairs whose id p satisfies p % 3 == 0 are NOT in the pair set (unknown
# contracts — transfers touching only them map to nothing, M6 nil path)
PAIR_SET = frozenset(
    f"pair_{p:02d}" for p in range(N_PAIRS) if p % 3 != 0
)
LP_TO_PAIR = {
    f"lp_{p:02d}": f"pair_{p:02d}" for p in range(N_PAIRS) if p % 3 != 0
}

# label lookup tables: tiny-id -> string resolved by np.take (an
# order of magnitude faster than per-row zfill/concat)
_PAIRS = np.array([f"pair_{p:02d}" for p in range(N_PAIRS)], dtype=object)
_LPS = np.array([f"lp_{p:02d}" for p in range(N_PAIRS)], dtype=object)
_TOKS = np.array([f"tok_{a:02d}" for a in range(N_TOKENS)], dtype=object)
_USERS = np.array([f"addr_{u:03d}" for u in range(N_USERS)], dtype=object)


def _s(arr: np.ndarray) -> pa.Array:
    return pa.array(arr, type=pa.string())


def _i2s(arr: np.ndarray) -> pa.Array:
    return pc.cast(pa.array(arr, type=pa.int64()), pa.string())


def _concat(*parts) -> pa.Array:
    """Element-wise concatenation (empty separator)."""
    return pc.binary_join_element_wise(*parts, "")


def _attrs(
    perm: np.ndarray,
    v2: np.ndarray,
    contract: pa.Array,
    frm: pa.Array,
    to: pa.Array,
    amount: pa.Array | None,
):
    """Assemble the scrambled attr string. ``amount=None`` omits the
    amount segment entirely (noise logs)."""
    kv = _s(np.where(v2, ":", "=").astype(object))
    sep = _s(np.where(v2, "|", ";").astype(object))
    sc = pc.binary_join_element_wise("contract", contract, kv)
    sf = pc.binary_join_element_wise("from", frm, kv)
    st = pc.binary_join_element_wise("to", to, kv)
    if amount is None:
        # fixed order is fine: rejection is by the MISSING amount key
        return pc.binary_join_element_wise(sc, sf, st, sep)
    sa = pc.binary_join_element_wise("amount", amount, kv)
    orders = [
        pc.binary_join_element_wise(sa, st, sf, sc, sep),  # perm 0
        pc.binary_join_element_wise(sc, sf, st, sa, sep),  # perm 1
        pc.binary_join_element_wise(sf, sa, sc, st, sep),  # perm 2
    ]
    m0 = pa.array(perm == 0)
    m1 = pa.array(perm == 1)
    return pc.if_else(m0, orders[0], pc.if_else(m1, orders[1], orders[2]))


def expand_lineitem_batch(batch: pa.Table) -> pa.Table:
    """lineitem batch -> raw log rows (numpy integer math + Arrow
    string kernels; no per-row Python)."""
    ok = batch["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    ln = batch["l_linenumber"].to_numpy(zero_copy_only=False).astype(np.int64)
    pk = batch["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    sk = batch["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    q = batch["l_quantity"].to_numpy(zero_copy_only=False).astype(np.int64)

    kdet = (ok * 31 + ln * 17) % 10
    p = pk % N_PAIRS
    a = sk % N_TOKENS
    b = (sk + 1) % N_TOKENS
    u = (pk * 7 + sk) % N_USERS
    amt = q * 1000 + pk % 997
    amt2 = amt // 2 + 1
    net = amt - amt % FEE_MOD
    dire = (ok + ln) % 2
    perm = (ok * 3 + ln) % 3
    v2 = ok >= V2_FROM_TX
    code = (ok % FAILED_EVERY == 0).astype(np.int64)

    pair = _PAIRS[p]
    lp = _LPS[p]
    tok = _TOKS[a]
    tok2 = _TOKS[b]
    user = _USERS[u]
    to_pair = dire == 0  # user -> pair direction

    kind = np.select(
        [kdet <= 3, kdet <= 5, kdet == 6, kdet == 7, kdet == 8],
        ["wasm", "native", "action", "mint", "burn"],
        default="noise",
    ).astype(object)
    contract = np.select(
        [kdet <= 3, kdet <= 5, kdet == 6, kdet >= 9],
        [tok, "native", pair, "junk"],
        default=lp,  # mint, burn
    ).astype(object)
    frm = np.select(
        [kdet == 7, kdet == 8, kdet == 9],
        ["mint", np.where(to_pair, user, pair), user],
        default=np.where(to_pair, user, pair),
    ).astype(object)
    to = np.select(
        [kdet == 7, kdet == 8, kdet == 9],
        [np.where(to_pair, pair, user), "burn", user],
        default=np.where(to_pair, pair, user),
    ).astype(object)

    amt_s = _i2s(amt)
    tok_a = _s(tok)
    native_amt = _concat(amt_s, tok_a, ",", _i2s(amt2), _s(tok2))
    action_amt = _concat(amt_s, tok_a)
    amount = pc.if_else(
        pa.array(kdet <= 3), amt_s,
        pc.if_else(
            pa.array(kdet <= 5), native_amt,
            pc.if_else(pa.array(kdet == 6), action_amt, amt_s),
        ),
    )

    # noise logs get the amount-free encoding; everything else the full
    # one (both built vectorized for all rows, selected per row)
    contract_a, frm_a, to_a = _s(contract), _s(frm), _s(to)
    full = _attrs(perm, v2, contract_a, frm_a, to_a, amount)
    bare = _attrs(perm, v2, contract_a, frm_a, to_a, None)
    attrs = pc.if_else(pa.array(kdet == 9), bare, full)

    def table(tx, idx, knd, att, cd) -> pa.Table:
        return pa.table(
            {
                "tx_id": pa.array(tx, type=pa.int64()),
                "log_idx": pa.array(idx, type=pa.int64()),
                "commit": pc.utf8_lpad(_i2s(tx), width=TX_PAD, padding="0"),
                "kind": knd,
                "attrs": att,
                "code": pa.array(cd, type=pa.int64()),
            }
        )

    primary = table(ok, ln * 2, _s(kind), attrs, code)

    # duplicate wasm transfer rows for pair actions (kdet 6) at log_idx+1
    dm = kdet == 6
    if dm.any():
        d_amt = _i2s(np.where(to_pair[dm], amt[dm], net[dm]))
        d_attrs = _attrs(
            perm[dm], v2[dm], _s(tok[dm]), _s(frm[dm]), _s(to[dm]), d_amt
        )
        dup = table(
            ok[dm], ln[dm] * 2 + 1,
            _s(np.full(int(dm.sum()), "wasm", dtype=object)), d_attrs, code[dm],
        )
        return pa.concat_tables([primary, dup])
    return primary


def raw_logs_from_lineitem(
    sf_dir: str, tx_range: tuple[int, int] | None = None
) -> "ray.data.Dataset":
    """The raw-log Dataset for an sf dir (lazy, streams; column-pruned
    read — only the five driving lineitem columns leave storage).
    ``tx_range=(lo, hi)`` pushes the tx-id predicate into the parquet
    SCAN (row-group prune + filtered read), so an epoch-ranged caller
    never expands rows outside its range."""
    kwargs = {}
    if tx_range is not None:
        import pyarrow.dataset as pads

        lo, hi = tx_range
        kwargs["filter"] = (pads.field("l_orderkey") >= lo) & (
            pads.field("l_orderkey") < hi
        )
    return ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=[
            "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey", "l_quantity",
        ],
        **kwargs,
    ).map_batches(expand_lineitem_batch, batch_format="pyarrow")

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

The oracle SQL in ``pipelines/queries_transfers.py`` rebuilds the
LEDGER from these formulas from first principles — it never round-trips
the string encoding, so the engine's encode->decode->map path is
verified end-to-end against an independent derivation.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

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


def _z2(x: np.ndarray) -> np.ndarray:
    return np.char.zfill(x.astype("U2"), 2)


def _seg(key: str, val: np.ndarray, v2: np.ndarray) -> np.ndarray:
    """One attr segment: 'key=val' (v1) or 'key:val' (v2)."""
    return np.where(
        v2,
        np.char.add(key + ":", val.astype("U64")),
        np.char.add(key + "=", val.astype("U64")),
    )


def _attrs(
    perm: np.ndarray,
    v2: np.ndarray,
    contract: np.ndarray,
    frm: np.ndarray,
    to: np.ndarray,
    amount: np.ndarray | None,
) -> np.ndarray:
    """Assemble the scrambled attr string. ``amount=None`` omits the
    amount segment entirely (noise logs)."""
    sep = np.where(v2, "|", ";")
    sc = _seg("contract", contract, v2)
    sf = _seg("from", frm, v2)
    st = _seg("to", to, v2)
    if amount is None:
        # fixed order is fine: rejection is by the MISSING amount key
        return np.char.add(np.char.add(sc, sep), np.char.add(sf, np.char.add(sep, st)))
    sa = _seg("amount", amount, v2)

    def join(parts):
        out = parts[0]
        for nxt in parts[1:]:
            out = np.char.add(np.char.add(out, sep), nxt)
        return out

    orders = [
        join([sa, st, sf, sc]),   # perm 0: amount,to,from,contract
        join([sc, sf, st, sa]),   # perm 1: contract,from,to,amount
        join([sf, sa, sc, st]),   # perm 2: from,amount,contract,to
    ]
    return np.select([perm == 0, perm == 1], orders[:2], default=orders[2])


def expand_lineitem_batch(batch: pa.Table) -> pa.Table:
    """lineitem batch -> raw log rows (vectorized numpy expansion)."""
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

    pair = np.char.add("pair_", _z2(p)).astype(object)
    lp = np.char.add("lp_", _z2(p)).astype(object)
    tok = np.char.add("tok_", _z2(a)).astype(object)
    tok2 = np.char.add("tok_", _z2(b)).astype(object)
    user = np.char.add("addr_", np.char.zfill(u.astype("U3"), 3)).astype(object)
    amt_s = amt.astype("U20")
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
    native_amt = np.char.add(
        np.char.add(np.char.add(amt_s, tok.astype("U8")), ","),
        np.char.add(amt2.astype("U20"), tok2.astype("U8")),
    )
    action_amt = np.char.add(amt_s, tok.astype("U8"))
    amount = np.select(
        [kdet <= 3, kdet <= 5, kdet == 6],
        [amt_s, native_amt, action_amt],
        default=amt_s,  # mint, burn (noise handled below)
    )

    noise = kdet == 9
    attrs = np.empty(len(ok), dtype=object)
    attrs[~noise] = _attrs(
        perm[~noise], v2[~noise], contract[~noise],
        frm[~noise], to[~noise], amount[~noise],
    )
    if noise.any():
        attrs[noise] = _attrs(
            perm[noise], v2[noise], contract[noise],
            frm[noise], to[noise], None,
        )

    # duplicate wasm transfer rows for pair actions (kdet 6) at log_idx+1
    dm = kdet == 6
    d_amt = np.where(to_pair[dm], amt[dm], net[dm]).astype("U20")
    d_attrs = _attrs(
        perm[dm], v2[dm], tok[dm].astype(object),
        frm[dm], to[dm], d_amt,
    )

    def table(tx, idx, knd, att, cd) -> pa.Table:
        return pa.table(
            {
                "tx_id": pa.array(tx, type=pa.int64()),
                "log_idx": pa.array(idx, type=pa.int64()),
                "commit": pa.array(
                    np.char.zfill(tx.astype("U20"), TX_PAD).astype(object),
                    type=pa.string(),
                ),
                "kind": pa.array(knd.astype(object), type=pa.string()),
                "attrs": pa.array(att.astype(object), type=pa.string()),
                "code": pa.array(cd, type=pa.int64()),
            }
        )

    primary = table(ok, ln * 2, kind, attrs, code)
    if dm.any():
        dup = table(
            ok[dm], ln[dm] * 2 + 1,
            np.full(int(dm.sum()), "wasm", dtype=object), d_attrs, code[dm],
        )
        return pa.concat_tables([primary, dup])
    return primary


def raw_logs_from_lineitem(sf_dir: str) -> "ray.data.Dataset":
    """The raw-log Dataset for an sf dir (lazy, streams; column-pruned
    read — only the five driving lineitem columns leave storage)."""
    return ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=[
            "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey", "l_quantity",
        ],
    ).map_batches(expand_lineitem_batch, batch_format="pyarrow")

"""Transfer mapper family: decode canonicalization (M8/S5), signed
pair-set mapping (M6/M7/M9/M11), and the duplicate-transfer
eliminator (M12)."""

import pandas as pd
import pyarrow as pa
import pytest

from cosmwasm_etl_ray.stages.transfers import (
    TransferMapperFamily,
    _eliminate_shard,
    decode_raw_logs_batch,
)


def _raw(tx_id, log_idx, kind, attrs, code=0):
    return {
        "tx_id": tx_id,
        "log_idx": log_idx,
        "commit": str(tx_id).zfill(10),
        "kind": kind,
        "attrs": attrs,
        "code": code,
    }


def _raw_table(rows):
    return pa.Table.from_pylist(
        rows,
        schema=pa.schema(
            [
                ("tx_id", pa.int64()),
                ("log_idx", pa.int64()),
                ("commit", pa.string()),
                ("kind", pa.string()),
                ("attrs", pa.string()),
                ("code", pa.int64()),
            ]
        ),
    )


def _decoded(rows):
    return decode_raw_logs_batch(_raw_table(rows)).to_pylist()


class TestDecode:
    def test_attr_order_is_canonicalized(self):
        # the same logical v1 log in three scrambled segment orders
        perms = [
            "amount=5;to=pair_01;from=addr_001;contract=tok_01",
            "contract=tok_01;from=addr_001;to=pair_01;amount=5",
            "from=addr_001;amount=5;contract=tok_01;to=pair_01",
        ]
        rows = [_raw(1, i, "wasm", a) for i, a in enumerate(perms)]
        out = _decoded(rows)
        assert len(out) == 3
        for r in out:
            assert (r["contract"], r["sender"], r["recipient"], r["amount_str"]) == (
                "tok_01", "addr_001", "pair_01", "5"
            )

    def test_version_gated_formats(self):
        # tx 1 is the v1 era (k=v;), tx 5000 the v2 era (k:v|); each
        # decoder must ONLY understand its own era's encoding
        rows = [
            _raw(1, 0, "wasm", "contract=tok_01;from=a;to=pair_01;amount=7"),
            _raw(5000, 0, "wasm", "contract:tok_01|from:a|to:pair_01|amount:7"),
        ]
        out = {r["tx_id"]: r for r in _decoded(rows)}
        assert out[1]["amount_str"] == "7"
        assert out[5000]["amount_str"] == "7"
        assert out[1]["recipient"] == out[5000]["recipient"] == "pair_01"

    def test_failed_tx_skipped(self):
        rows = [
            _raw(53, 0, "wasm", "contract=tok_01;from=a;to=pair_01;amount=7", code=1),
            _raw(54, 0, "wasm", "contract=tok_01;from=a;to=pair_01;amount=7"),
        ]
        out = _decoded(rows)
        assert [r["tx_id"] for r in out] == [54]

    def test_missing_amount_yields_null(self):
        out = _decoded([_raw(2, 0, "noise", "contract=junk;from=a;to=b")])
        assert out[0]["amount_str"] is None


def _map(rows, **kwargs):
    fam = TransferMapperFamily(**kwargs)
    t = decode_raw_logs_batch(_raw_table(rows))
    return fam(t).to_pylist()


class TestMapperFamily:
    def test_wasm_both_sides_pairs_emits_two_signed_rows(self):
        out = _map(
            [_raw(1, 0, "wasm", "contract=tok_01;from=pair_01;to=pair_02;amount=9")]
        )
        got = {(r["pair"], r["amount"]) for r in out}
        assert got == {("pair_02", 9), ("pair_01", -9)}
        assert all(r["ttype"] == "transfer" for r in out)

    def test_wasm_exception_token_skipped(self):
        out = _map(
            [_raw(1, 0, "wasm", "contract=tok_07;from=a;to=pair_01;amount=9")]
        )
        assert out == []

    def test_wasm_unknown_pair_dropped(self):
        # pair_00 has p % 3 == 0 -> not in the pair set
        out = _map(
            [_raw(1, 0, "wasm", "contract=tok_01;from=a;to=pair_00;amount=9")]
        )
        assert out == []

    def test_native_multi_coin_explodes(self):
        out = _map(
            [_raw(1, 0, "native", "contract=native;from=pair_01;to=a;amount=100tok_01,51tok_02")]
        )
        got = {(r["token"], r["amount"]) for r in out}
        assert got == {("tok_01", -100), ("tok_02", -51)}

    def test_mint_to_pair_is_initial_provide(self):
        out = _map(
            [
                _raw(1, 0, "mint", "contract=lp_01;from=mint;to=pair_01;amount=4"),
                _raw(1, 2, "mint", "contract=lp_01;from=mint;to=addr_001;amount=4"),
            ]
        )
        assert len(out) == 1
        assert out[0]["ttype"] == "initial_provide"
        assert (out[0]["pair"], out[0]["token"], out[0]["amount"]) == (
            "pair_01", "lp_01", 4
        )

    def test_burn_pair_sender_and_unknown_lp_dropped(self):
        out = _map(
            [
                _raw(1, 0, "burn", "contract=lp_01;from=addr_001;to=burn;amount=8"),
                _raw(1, 2, "burn", "contract=lp_01;from=pair_01;to=burn;amount=8"),
                _raw(1, 4, "burn", "contract=lp_00;from=addr_001;to=burn;amount=8"),
            ]
        )
        assert len(out) == 1
        assert (out[0]["ttype"], out[0]["amount"]) == ("burn", -8)

    def test_action_signed_by_direction(self):
        out = _map(
            [
                _raw(1, 0, "action", "contract=pair_01;from=a;to=pair_01;amount=10tok_01"),
                _raw(1, 2, "action", "contract=pair_01;from=pair_01;to=a;amount=10tok_01"),
            ]
        )
        assert {r["amount"] for r in out} == {10, -10}
        assert all(r["ttype"] == "provide" for r in out)


def _ledger(rows):
    cols = ["tx_id", "log_idx", "pair", "token", "ttype", "amount"]
    return pd.DataFrame(rows, columns=cols)


class TestEliminator:
    def test_consumes_one_transfer_per_action(self):
        g = _ledger(
            [
                (1, 0, "pair_01", "tok_01", "provide", 10),
                (1, 1, "pair_01", "tok_01", "transfer", 10),  # the duplicate
                (1, 2, "pair_01", "tok_01", "transfer", 10),  # a real transfer
            ]
        )
        out = _eliminate_shard(g)
        kept_t = out[out["ttype"] == "transfer"]
        assert len(kept_t) == 1 and kept_t["log_idx"].iloc[0] == 2
        assert (out["ttype"] == "provide").sum() == 1

    def test_consumption_is_in_log_order(self):
        g = _ledger(
            [
                (1, 5, "pair_01", "tok_01", "transfer", 10),
                (1, 1, "pair_01", "tok_01", "transfer", 10),
                (1, 0, "pair_01", "tok_01", "provide", 10),
            ]
        )
        out = _eliminate_shard(g)
        kept = out[out["ttype"] == "transfer"]
        assert kept["log_idx"].tolist() == [5]  # earliest consumed first

    def test_fee_net_expectation_on_pair_to_user(self):
        # action gross -10 -> expected duplicate is the fee-net -(10-10%7)=-7
        g = _ledger(
            [
                (1, 0, "pair_01", "tok_01", "provide", -10),
                (1, 1, "pair_01", "tok_01", "transfer", -7),
                (1, 2, "pair_01", "tok_01", "transfer", -10),  # gross: NOT consumed
            ]
        )
        out = _eliminate_shard(g)
        kept = out[out["ttype"] == "transfer"]
        assert kept["amount"].tolist() == [-10]

    def test_non_transfers_pass_through(self):
        g = _ledger(
            [
                (1, 0, "pair_01", "lp_01", "burn", -3),
                (1, 2, "pair_01", "lp_01", "initial_provide", 5),
            ]
        )
        out = _eliminate_shard(g)
        assert sorted(out["ttype"]) == ["burn", "initial_provide"]

    def test_multiplicity_across_txs_is_independent(self):
        g = _ledger(
            [
                (1, 0, "pair_01", "tok_01", "provide", 10),
                (1, 1, "pair_01", "tok_01", "transfer", 10),
                (2, 1, "pair_01", "tok_01", "transfer", 10),  # other tx: kept
            ]
        )
        out = _eliminate_shard(g)
        kept = out[out["ttype"] == "transfer"]
        assert kept["tx_id"].tolist() == [2]


class TestEncodeDecodeRoundtrip:
    """Property: for ANY lineitem-shaped row, expand (encode, scramble,
    version-split) then decode recovers the first-principles attr
    values — across both encoding eras and all three scramble perms."""

    @staticmethod
    def _roundtrip(ok, ln, pk, sk, q):
        from cosmwasm_etl_ray.sources.rawlogs import expand_lineitem_batch

        t = pa.table(
            {
                "l_orderkey": pa.array([ok], pa.int64()),
                "l_linenumber": pa.array([ln], pa.int64()),
                "l_partkey": pa.array([pk], pa.int64()),
                "l_suppkey": pa.array([sk], pa.int64()),
                "l_quantity": pa.array([float(q)], pa.float64()),
            }
        )
        return decode_raw_logs_batch(expand_lineitem_batch(t)).to_pylist()

    def test_roundtrip_property(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        @settings(max_examples=200, deadline=None)
        @given(
            ok=st.integers(min_value=1, max_value=2_000_000),
            ln=st.integers(min_value=1, max_value=7),
            pk=st.integers(min_value=1, max_value=500_000),
            sk=st.integers(min_value=0, max_value=50_000),
            q=st.integers(min_value=1, max_value=50),
        )
        def check(ok, ln, pk, sk, q):
            out = self._roundtrip(ok, ln, pk, sk, q)
            kdet = (ok * 31 + ln * 17) % 10
            if ok % 53 == 0:
                assert out == []
                return
            amt = q * 1000 + pk % 997
            primary = next(r for r in out if r["log_idx"] == ln * 2)
            if kdet == 9:
                assert primary["amount_str"] is None
                return
            pair = f"pair_{pk % 29:02d}"
            user = f"addr_{(pk * 7 + sk) % 97:03d}"
            if kdet <= 3:
                assert primary["contract"] == f"tok_{sk % 13:02d}"
                assert primary["amount_str"] == str(amt)
                assert {primary["sender"], primary["recipient"]} == {user, pair}
            elif kdet <= 5:
                a2 = amt // 2 + 1
                assert primary["amount_str"] == (
                    f"{amt}tok_{sk % 13:02d},{a2}tok_{(sk + 1) % 13:02d}"
                )
            elif kdet == 6:
                dup = next(r for r in out if r["log_idx"] == ln * 2 + 1)
                exp = amt if (ok + ln) % 2 == 0 else amt - amt % 7
                assert dup["amount_str"] == str(exp)
                assert primary["contract"] == pair
            elif kdet == 7:
                assert primary["sender"] == "mint"
                assert primary["contract"] == f"lp_{pk % 29:02d}"
            else:  # kdet == 8
                assert primary["recipient"] == "burn"
                assert primary["amount_str"] == str(amt)

        check()


@pytest.mark.usefixtures("ray_session")
def test_ledger_end_to_end_matches_duckdb():
    import duckdb

    from cosmwasm_etl_ray.pipelines.queries_transfers import (
        ORACLE_SQL,
        transfer_ledger,
    )

    sf = "/root/testdata/sf0.001"
    got = (
        transfer_ledger(sf)
        .to_pandas()
        .sort_values(["tx_id", "log_idx", "pair", "token", "amount"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{sf}/lineitem.parquet')"
    )
    want = (
        con.execute(ORACLE_SQL["transfer_ledger"])
        .df()
        .sort_values(["tx_id", "log_idx", "pair", "token", "amount"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[want.columns.tolist()].astype({"amount": "int64"}),
        want.astype({"amount": "int64"}),
        check_dtype=False,
    )

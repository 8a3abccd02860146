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

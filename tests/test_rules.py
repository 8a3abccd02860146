"""Declarative rule registry: parity with the compiled validity path,
first-match-wins classification, and the extension story — a new event
type registered as rule + mapper flows through the normal replay."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data

from cosmwasm_etl_ray.config import EngineConfig, GeneratorConfig
from cosmwasm_etl_ray.pipelines.replay import read_state, replay_files
from cosmwasm_etl_ray.sources.generator import generate_change_stream
from cosmwasm_etl_ray.stages.normalize import _valid_mask
from cosmwasm_etl_ray.stages.rules import Rule, RuleSet, default_cdc_rules
from cosmwasm_etl_ray.state.manifest import StateStore


def _tricky_batch() -> pa.Table:
    return pa.table(
        {
            "repo": ["r", "r", None, "r", "r", "r", "r"],
            "path": ["p", "p", "p", None, "p", "p", "p"],
            "commit": ["0001", "x1", "0002", "0003", None, "", "0004"],
            "op": ["insert", "update", "update", "delete", "update", "insert", "weird"],
            "content": ["a"] * 7,
        }
    )


def test_default_rules_match_compiled_valid_mask():
    batch = _tricky_batch()
    compiled = _valid_mask(batch).to_pylist()
    classified = default_cdc_rules().classify(batch)
    assert classified["valid"].to_pylist() == compiled
    # matched rows carry their rule (op) name; unmatched carry ""
    types = classified["rule_type"].to_pylist()
    assert types[0] == "insert" and types[-1] == ""


def test_first_match_wins_and_order_matters():
    rs = RuleSet(
        [
            Rule("catch_all", {"op": None}),
            Rule("insert", {"op": "insert"}),
        ]
    )
    out = rs.classify(_tricky_batch())
    assert set(out["rule_type"].to_pylist()) == {"catch_all"}
    rs2 = RuleSet(list(reversed(rs.rules)))
    out2 = rs2.classify(_tricky_batch())
    assert out2["rule_type"].to_pylist()[0] == "insert"


def test_duplicate_rule_names_rejected():
    with pytest.raises(ValueError, match="duplicate"):
        RuleSet([Rule("a", {}), Rule("a", {})])


def test_custom_rule_plus_mapper_extends_the_protocol(tmp_path):
    """The UpdateParsers story: an upstream starts emitting op='modify'.
    Without a rule those rows quarantine; registering a rule + mapper
    (modify → update) makes the SAME stream replay to the same state as
    the original — no engine-code edits."""
    log = generate_change_stream(
        str(tmp_path / "log"),
        GeneratorConfig(seed=83, n_keys=300, n_events=20_000, events_per_file=10_000,
                        malformed_frac=0.0, evolve_at_frac=None),
    )
    # mutate half the updates to the foreign op
    mut_dir = tmp_path / "mutlog"
    mut_dir.mkdir()
    for f in log["files"]:
        df = pd.read_parquet(f)
        m = (df["op"] == "update") & (np.arange(len(df)) % 2 == 0)
        df.loc[m, "op"] = "modify"
        df.to_parquet(mut_dir / f.split("/")[-1], index=False)
    mut_files = sorted(str(p) for p in mut_dir.iterdir())

    def modify_to_update(t: pa.Table) -> pa.Table:
        i = t.schema.get_field_index("op")
        return t.set_column(i, "op", pa.array(["update"] * t.num_rows, pa.string()))

    rules = default_cdc_rules().with_rule(
        Rule(
            "modify",
            {"commit": ("re", r"^[0-9]+$"), "repo": None, "path": None,
             "op": "modify"},
            mapper=modify_to_update,
        )
    )
    cfg_plain = EngineConfig(num_partitions=4, epoch_max_events=10_000)
    cfg_rules = EngineConfig(num_partitions=4, epoch_max_events=10_000, rules=rules)

    ref_store = StateStore(str(tmp_path / "ref"))
    replay_files(log["files"], ref_store, cfg_plain)
    expected = (
        read_state(ref_store).to_pandas()
        .sort_values(["repo", "path"]).reset_index(drop=True)
    )

    ext_store = StateStore(str(tmp_path / "ext"))
    replay_files(mut_files, ext_store, cfg_rules)
    got = (
        read_state(ext_store).to_pandas()
        .sort_values(["repo", "path"]).reset_index(drop=True)
    )
    cols = ["repo", "path", "commit", "content"]
    pd.testing.assert_frame_equal(got[cols], expected[cols])

    # and WITHOUT the rule, the foreign rows land in quarantine
    import glob
    import os

    q_store = StateStore(str(tmp_path / "noq"))
    replay_files(mut_files, q_store, cfg_plain)
    qfiles = glob.glob(os.path.join(q_store.quarantine_dir, "**/*.parquet"),
                       recursive=True)
    q = pd.concat([pd.read_parquet(f) for f in qfiles], ignore_index=True)
    assert (q["op"] == "modify").all() and len(q) > 0


def test_versioned_rulesets_compose():
    """Era-gated rule registries: commits before the cutover parse with
    v1 (modify → update), after with v2 (modify → delete) — the
    version-dispatch + registry composition."""
    from cosmwasm_etl_ray.stages.rules import ruleset_batch_fn
    from cosmwasm_etl_ray.stages.versioned import VersionedNormalizer

    base = {"commit": ("re", r"^[0-9]+$"), "repo": None, "path": None}

    def to_op(op):
        def m(t: pa.Table) -> pa.Table:
            i = t.schema.get_field_index("op")
            return t.set_column(i, "op", pa.array([op] * t.num_rows, pa.string()))
        return m

    v1 = default_cdc_rules().with_rule(
        Rule("modify", {**base, "op": "modify"}, mapper=to_op("update")))
    v2 = default_cdc_rules().with_rule(
        Rule("modify", {**base, "op": "modify"}, mapper=to_op("delete")))
    vn = VersionedNormalizer([
        ("", ruleset_batch_fn(v1)),
        ("0000000005", ruleset_batch_fn(v2)),
    ])
    batch = pa.table(
        {
            "repo": ["r"] * 4, "path": ["p"] * 4,
            "commit": ["0000000001", "0000000003", "0000000006", "0000000009"],
            "op": ["modify"] * 4, "content": ["a"] * 4,
        }
    )
    out = vn(batch).to_pandas().sort_values("commit")
    assert out["op"].tolist() == ["update", "update", "delete", "delete"]
    assert out["valid"].all()


def test_classify_empty_batch():
    """0-row batches must classify cleanly: pa.array([]) without an
    explicit type infers NULL and pc.invert/and_ have no null kernel."""
    empty = _tricky_batch().slice(0, 0)
    out = default_cdc_rules().classify(empty)
    assert out.num_rows == 0
    assert "valid" in out.column_names and "rule_type" in out.column_names
    # item-less rules (match-everything mask) on the empty batch too
    rs = RuleSet([Rule("all", {})])
    out2 = rs.classify(empty)
    assert out2.num_rows == 0 and out2["valid"].type == pa.bool_()

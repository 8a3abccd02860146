"""Override (column-coalesce) mode through the FULL store replay path:
partial updates inherit prior column values; tombstones bar
resurrection across epochs; matches a serial Override oracle."""

import os

import numpy as np
import pandas as pd
import pytest

from cosmwasm_etl_ray.config import EngineConfig
from cosmwasm_etl_ray.pipelines.replay import read_state, replay_files
from cosmwasm_etl_ray.state.manifest import StateStore

CFG = EngineConfig(
    num_partitions=4, epoch_max_events=5_000, batch_size=1024, override_coalesce=True
)


def _write_log(tmp_path, rng_seed=41, n_keys=300, n_events=15_000):
    """Stream with PARTIAL updates: each update sets a random subset of
    (lang, content); unset columns are empty strings (the reference's
    Override treats empty as no-value, parser/dex/dto.go:45-95)."""
    rng = np.random.default_rng(rng_seed)
    keys = rng.integers(0, n_keys, size=n_events)
    op = np.where(rng.random(n_events) < 0.1, "delete", "update").astype(object)
    first = np.unique(keys, return_index=True)[1]
    op[first] = "insert"
    set_lang = rng.random(n_events) < 0.5
    set_content = rng.random(n_events) < 0.7
    df = pd.DataFrame(
        {
            "repo": np.char.add("r", (keys % 7).astype("U2")).astype(object),
            "path": np.char.add("p", keys.astype("U6")).astype(object),
            "commit": [f"{i + 1:010d}" for i in range(n_events)],
            "lang": np.where(set_lang, "go", "").astype(object),
            "content": np.where(
                set_content, np.char.add("c", np.arange(n_events).astype("U8")), ""
            ).astype(object),
            "op": op,
        }
    )
    df.loc[df["op"] == "insert", ["lang", "content"]] = ["init", "init_content"]
    df.loc[df["op"] == "delete", ["lang", "content"]] = ["", ""]
    d = tmp_path / "log"
    d.mkdir()
    files = []
    for i, start in enumerate(range(0, n_events, 5000)):
        f = str(d / f"changes-{i:05d}.parquet")
        df.iloc[start : start + 5000].to_parquet(f, index=False)
        files.append(f)
    return df, files


def _serial_override_oracle(df: pd.DataFrame) -> dict:
    state: dict = {}
    for row in df.to_dict("records"):
        key = (row["repo"], row["path"])
        if row["op"] == "delete":
            state.pop(key, None)
            continue
        cur = state.get(key, {"lang": None, "content": None})
        nxt = dict(cur)
        for col in ("lang", "content"):
            if row[col]:  # non-empty wins
                nxt[col] = row[col]
        nxt["commit"] = row["commit"]
        state[key] = nxt
    return state


def test_override_replay_matches_serial_oracle(tmp_path):
    df, files = _write_log(tmp_path)
    store = StateStore(str(tmp_path / "store"))
    replay_files(files, store, CFG)
    got = read_state(store).to_pandas()
    oracle = _serial_override_oracle(df)

    assert len(got) == len(oracle)
    for r in got.itertuples():
        o = oracle[(r.repo, r.path)]
        assert r.commit == o["commit"], (r.repo, r.path)
        assert (r.lang if isinstance(r.lang, str) else None) == o["lang"]
        assert (r.content if isinstance(r.content, str) else None) == o["content"]


def test_override_crash_resume(tmp_path):
    df, files = _write_log(tmp_path, rng_seed=43)
    full = StateStore(str(tmp_path / "full"))
    replay_files(files, full, CFG)
    expected = read_state(full).to_pandas().sort_values(["repo", "path"]).reset_index(drop=True)

    partial = StateStore(str(tmp_path / "partial"))
    replay_files(files[:1], partial, CFG)  # stop after epoch 0
    # orphan files from a "crashed" epoch 1 attempt
    os.makedirs(os.path.join(partial.state_dir, "epoch=1"), exist_ok=True)
    open(os.path.join(partial.state_dir, "epoch=1", "part-00000.parquet"), "wb").close()
    replay_files(files, partial, CFG)  # resume
    got = read_state(partial).to_pandas().sort_values(["repo", "path"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        expected[["repo", "path", "commit", "lang", "content"]],
        got[["repo", "path", "commit", "lang", "content"]],
    )

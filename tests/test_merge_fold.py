"""Unit tests for the LWW fold — golden tables, associativity, Override.

Mirrors the reference's table-driven mapper tests
(/root/reference/parser/dex/dezswap/mappers_test.go) for the graft's
merge semantics.
"""

import numpy as np
import pandas as pd
import pytest

from cosmwasm_etl_ray.stages.merge import (
    finalize,
    fold_override,
    fold_partial,
)


def ev(repo, path, commit, op="update", lang="go", content="x", **extra):
    return {
        "repo": repo,
        "path": path,
        "commit": f"{commit:010d}",
        "op": op,
        "lang": lang,
        "content": content,
        **extra,
    }


def test_lww_keeps_max_commit_row():
    df = pd.DataFrame(
        [
            ev("r", "a", 1, "insert", content="v1"),
            ev("r", "a", 3, "update", content="v3"),
            ev("r", "a", 2, "update", content="v2"),
            ev("r", "b", 5, "insert", content="b5"),
        ]
    )
    out = fold_partial(df).sort_values("path")
    assert out["content"].tolist() == ["v3", "b5"]
    assert out["commit"].tolist() == ["0000000003", "0000000005"]


def test_tombstone_kept_in_partial_dropped_in_finalize():
    df = pd.DataFrame(
        [
            ev("r", "a", 1, "insert"),
            ev("r", "a", 2, "delete", content=""),
            ev("r", "b", 1, "insert"),
        ]
    )
    part = fold_partial(df)
    assert set(part["op"]) == {"delete", "insert"}
    fin = finalize(part)
    assert fin["path"].tolist() == ["b"]


def test_delete_then_reinsert_survives():
    df = pd.DataFrame(
        [
            ev("r", "a", 1, "insert", content="old"),
            ev("r", "a", 2, "delete", content=""),
            ev("r", "a", 3, "insert", content="new"),
        ]
    )
    fin = finalize(fold_partial(df))
    assert fin["content"].tolist() == ["new"]


def test_fold_is_associative_under_arbitrary_splits():
    rng = np.random.default_rng(7)
    n = 500
    df = pd.DataFrame(
        [
            ev(
                "r",
                f"p{rng.integers(0, 20)}",
                int(c),
                op=rng.choice(["update", "delete"], p=[0.85, 0.15]),
                content=f"c{c}",
            )
            for c in rng.permutation(n)
        ]
    )
    whole = finalize(fold_partial(df)).sort_values(["repo", "path"]).reset_index(drop=True)
    for splits in (2, 3, 7):
        parts = [
            fold_partial(chunk)
            for chunk in np.array_split(df.sample(frac=1, random_state=splits), splits)
        ]
        merged = finalize(fold_partial(pd.concat(parts, ignore_index=True)))
        merged = merged.sort_values(["repo", "path"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(
            whole[["repo", "path", "commit", "content"]],
            merged[["repo", "path", "commit", "content"]],
        )


def test_override_coalesce_last_non_empty_wins():
    # the ParsedTx.Override analogue: empty/missing column inherits
    df = pd.DataFrame(
        [
            ev("r", "a", 1, "insert", lang="go", content="v1"),
            ev("r", "a", 2, "update", lang="", content="v2"),
            ev("r", "a", 3, "update", lang="py", content=""),
        ]
    )
    out = finalize(fold_override(df))
    assert out["lang"].tolist() == ["py"]
    assert out["content"].tolist() == ["v2"]  # v3 was empty → v2 survives
    assert out["commit"].tolist() == ["0000000003"]


def test_override_tombstone_barrier_blocks_resurrection():
    df = pd.DataFrame(
        [
            ev("r", "a", 1, "insert", lang="go", content="old"),
            ev("r", "a", 2, "delete", lang="", content=""),
            ev("r", "a", 3, "update", lang="", content="new"),
        ]
    )
    out = finalize(fold_override(df))
    # content from after the delete; lang must NOT resurrect 'go'
    assert out["content"].tolist() == ["new"]
    assert out["lang"].isna().all()


def test_override_dead_key_keeps_tombstone():
    df = pd.DataFrame(
        [
            ev("r", "a", 1, "insert"),
            ev("r", "a", 2, "delete", content=""),
        ]
    )
    part = fold_override(df)
    assert part["op"].tolist() == ["delete"]
    assert finalize(part).empty


@pytest.mark.parametrize("commit_tie", [True])
def test_equal_commit_tie_breaks_by_input_order(commit_tie):
    df = pd.DataFrame(
        [
            ev("r", "a", 5, "update", content="first"),
            ev("r", "a", 5, "update", content="second"),
        ]
    )
    assert fold_partial(df)["content"].tolist() == ["second"]


def test_fold_lww_arrow_equals_pandas_fold():
    """The Arrow merge fold and the pandas fold pick identical winners
    (max commit per exact key, ties to later input position)."""
    import pyarrow as pa
    from cosmwasm_etl_ray.stages.merge import fold_lww_arrow

    rng = np.random.default_rng(17)
    rows = []
    for i in range(5000):
        rows.append(
            ev(
                f"r{rng.integers(0, 20)}",
                f"p{rng.integers(0, 50)}",
                int(rng.integers(0, 30)),  # many commit ties
                op=("delete" if rng.random() < 0.1 else "update"),
                content=f"c{i}",
            )
        )
    df = pd.DataFrame(rows)
    expect = (
        fold_partial(df)
        .sort_values(["repo", "path"], kind="stable")
        .reset_index(drop=True)
    )
    got = (
        fold_lww_arrow(pa.Table.from_pandas(df, preserve_index=False))
        .to_pandas()
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, expect[got.columns.tolist()])

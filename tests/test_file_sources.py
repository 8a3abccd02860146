"""JSONL/CSV source fidelity: zero-padded commits stay strings, ""
content survives (delete markers), embedded commas/quotes/newlines
round-trip (sources/files.py)."""

import pandas as pd
import pyarrow as pa
import pytest

import ray.data

from cosmwasm_etl_ray.sources.files import (
    EVENT_COLUMNS,
    read_events_csv,
    read_events_jsonl,
    write_events_csv,
    write_events_jsonl,
)

_ROWS = pd.DataFrame(
    {
        "repo": ["mono", "repo_01", "repo_01", "mono"],
        "path": ["src/a", "src/b", "src/c", "src/a"],
        "commit": ["0000000001", "0001000002", "0000000007", "0002000001"],
        "lang": ["py", "go", "py", "py"],
        "content": [
            "plain v0",
            'has, commas and "quotes" v1',
            "line one\nline two v0",
            "",  # delete marker — must NOT become null
        ],
        "op": ["insert", "update", "insert", "delete"],
    }
)


@pytest.mark.parametrize("fmt", ["jsonl", "csv"])
def test_roundtrip_exact(ray_session, tmp_path, fmt):
    src = ray.data.from_pandas(_ROWS.copy())
    out = str(tmp_path / fmt)
    if fmt == "jsonl":
        write_events_jsonl(src, out)
        back = read_events_jsonl(out)
    else:
        write_events_csv(src, out)
        back = read_events_csv(out)
    got = (
        back.to_pandas()
        .sort_values("commit")
        .reset_index(drop=True)[list(EVENT_COLUMNS)]
    )
    want = _ROWS.sort_values("commit").reset_index(drop=True)[list(EVENT_COLUMNS)]
    pd.testing.assert_frame_equal(got, want)
    # the commit padding is the replay order — it MUST stay a string
    assert got["commit"].map(len).eq(10).all()
    assert (got["content"] == "").sum() == 1  # "" ≠ null


@pytest.mark.parametrize("fmt", ["jsonl", "csv"])
def test_schema_is_canonical(ray_session, tmp_path, fmt):
    src = ray.data.from_pandas(_ROWS.copy())
    out = str(tmp_path / f"s_{fmt}")
    if fmt == "jsonl":
        write_events_jsonl(src, out)
        back = read_events_jsonl(out)
    else:
        write_events_csv(src, out)
        back = read_events_csv(out)
    sch = back.schema()
    assert tuple(sch.names) == EVENT_COLUMNS
    for t in sch.types:
        assert pa.types.is_string(t) or pa.types.is_large_string(t)


# ---- hypothesis fuzz: hostile content through both formats ----

from hypothesis import given, settings
from hypothesis import strategies as st

_hostile = st.text(
    alphabet=st.sampled_from(list('abc,;"\'\n\t |\\{}[]:0123456789é漢')),
    min_size=0,
    max_size=40,
)


@settings(max_examples=25, deadline=None)
@given(st.lists(_hostile, min_size=1, max_size=6), st.sampled_from(["jsonl", "csv"]))
def test_fuzz_content_roundtrip(ray_session, tmp_path_factory, contents, fmt):
    import uuid

    df = pd.DataFrame(
        {
            "repo": ["r"] * len(contents),
            "path": [f"p{i}" for i in range(len(contents))],
            "commit": [f"{i:010d}" for i in range(len(contents))],
            "lang": ["py"] * len(contents),
            "content": contents,
            "op": ["update"] * len(contents),
        }
    )
    out = str(tmp_path_factory.mktemp("fuzz") / uuid.uuid4().hex)
    src = ray.data.from_pandas(df)
    if fmt == "jsonl":
        write_events_jsonl(src, out)
        back = read_events_jsonl(out)
    else:
        write_events_csv(src, out)
        back = read_events_csv(out)
    got = back.to_pandas().sort_values("commit").reset_index(drop=True)
    assert list(got["content"]) == contents


def test_evolved_column_survives_roundtrip(ray_session, tmp_path):
    """Additive-evolution columns (nullable `mode`) must NOT be dropped
    by an export/import round-trip. JSONL keeps null-vs-"" exactly; CSV
    cannot represent the difference, so extras resolve to null (the
    evolution backfilled-null convention)."""
    df = _ROWS.copy()
    df["mode"] = [None, "text", "binary", None]
    for fmt, reader, writer in (
        ("jsonl", read_events_jsonl, write_events_jsonl),
        ("csv", read_events_csv, write_events_csv),
    ):
        out = str(tmp_path / f"evo_{fmt}")
        writer(ray.data.from_pandas(df.copy()), out)
        got = reader(out).to_pandas().sort_values("commit").reset_index(drop=True)
        want = df.sort_values("commit").reset_index(drop=True)
        assert list(got.columns) == list(EVENT_COLUMNS) + ["mode"], fmt
        assert list(got["mode"].fillna("∅")) == list(want["mode"].fillna("∅")), fmt
        # canonical six unaffected by the extra column
        assert (got["content"] == want["content"]).all(), fmt


def test_import_events_replay_equivalence(ray_session, tmp_path):
    """JSONL drop → convert_events_dir → replay == replay over a native
    parquet log of the same events (the import-events CLI path end to
    end: edge normalization feeds the real engine, final LWW state is
    bit-identical)."""
    import glob as _glob

    from cosmwasm_etl_ray.config import EngineConfig
    from cosmwasm_etl_ray.pipelines.replay import read_state, replay_files
    from cosmwasm_etl_ray.sources.changes import changes_from_documents
    from cosmwasm_etl_ray.sources.files import convert_events_dir
    from cosmwasm_etl_ray.state.manifest import StateStore

    sf = "/root/testdata/sf0.001"
    jdir = str(tmp_path / "jsonl")
    changes_from_documents(sf).write_json(jdir)
    pdir = str(tmp_path / "imported_log")
    info = convert_events_dir(jdir, pdir, "jsonl")
    assert info["events"] > 0

    ddir = str(tmp_path / "native_log")
    changes_from_documents(sf).write_parquet(ddir)

    cfg = EngineConfig(num_partitions=4, epoch_max_events=1000)

    def final(log_dir: str, store_dir: str):
        files = sorted(_glob.glob(f"{log_dir}/*.parquet"))
        store = StateStore(str(tmp_path / store_dir))
        replay_files(files, store, cfg)
        return (
            read_state(store)
            .to_pandas()
            .sort_values(["repo", "path"])
            .reset_index(drop=True)
        )

    a = final(pdir, "store_imported")
    b = final(ddir, "store_native")
    pd.testing.assert_frame_equal(a[sorted(a.columns)], b[sorted(b.columns)])


def test_convert_ignores_stale_tmp_and_is_idempotent(ray_session, tmp_path):
    """A crashed prior convert leaves only *.tmp.<pid> litter; the glob
    replay consumes (*.parquet) never sees it, and a re-run overwrites
    cleanly (tmp+rename commits)."""
    import glob as _glob

    from cosmwasm_etl_ray.sources.files import convert_events_dir

    jdir = str(tmp_path / "in")
    ray.data.from_pandas(_ROWS.copy()).write_json(jdir)
    out = str(tmp_path / "log")
    import os

    os.makedirs(out)
    stale = os.path.join(out, "events-00000.parquet.tmp.99999")
    with open(stale, "w") as f:
        f.write("torn")
    r1 = convert_events_dir(jdir, out, "jsonl")
    r2 = convert_events_dir(jdir, out, "jsonl")  # idempotent re-run
    assert r1 == r2 and r1["events"] == len(_ROWS)
    visible = sorted(_glob.glob(f"{out}/*.parquet"))
    assert len(visible) == r1["files"]
    assert not any(v.endswith(".tmp.99999") for v in visible)
    assert os.path.exists(stale)  # litter is inert, not consumed


def test_convert_events_dir_gzip_inputs(ray_session, tmp_path):
    """Gzip-compressed JSONL/CSV inputs convert identically to their
    plain twins (pyarrow extension-based auto-decompression inside the
    per-file convert task) — compressed text logs are the shipping
    norm, and a .gz drop must feed the same canonical parquet log."""
    import glob as _glob
    import gzip
    import os

    import pyarrow.parquet as pq

    from cosmwasm_etl_ray.sources.changes import changes_from_documents
    from cosmwasm_etl_ray.sources.files import convert_events_dir

    sf = "/root/testdata/sf0.001"
    plain = str(tmp_path / "plain")
    changes_from_documents(sf).limit(500).write_json(plain)

    gz = str(tmp_path / "gz")
    os.makedirs(gz)
    for p in sorted(_glob.glob(f"{plain}/*.json")):
        with open(p, "rb") as f, gzip.open(
            os.path.join(gz, os.path.basename(p) + ".gz"), "wb"
        ) as g:
            g.write(f.read())

    out_plain = str(tmp_path / "out_plain")
    out_gz = str(tmp_path / "out_gz")
    a = convert_events_dir(plain, out_plain, "jsonl")
    b = convert_events_dir(gz, out_gz, "jsonl")
    assert a["events"] == b["events"] > 0 and a["files"] == b["files"]
    ta = pq.read_table(sorted(_glob.glob(f"{out_plain}/*.parquet"))[0])
    tb = pq.read_table(sorted(_glob.glob(f"{out_gz}/*.parquet"))[0])
    assert ta.equals(tb)

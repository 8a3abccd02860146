"""Resumable partitioned corpus export: commit discipline, resume
skip, round-trip equality."""

import json
import os

import pandas as pd
import pytest

import ray.data

from cosmwasm_etl_ray.pipelines.corpus_export import (
    EXPORT_SHARDS,
    export_corpus,
    read_export,
)
from cosmwasm_etl_ray.pipelines.queries_dataprep import pretrain_corpus


def test_export_roundtrip_and_resume(ray_session, sf_dir, tmp_path):
    out = str(tmp_path / "export")
    man = export_corpus(sf_dir, out)

    # every shard committed + manifest totals match the files
    assert sorted(man["shards"]) == sorted(str(s) for s in range(EXPORT_SHARDS))
    assert os.path.exists(os.path.join(out, "export_manifest.json"))

    # round-trip: the export reads back equal to the live pipeline
    got = (
        read_export(out).to_pandas()
        .sort_values(["doc_id", "chunk_id"]).reset_index(drop=True)
    )
    ref = (
        pretrain_corpus(sf_dir).to_pandas()
        .sort_values(["doc_id", "chunk_id"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[ref.columns.tolist()], ref)
    assert man["n_rows"] == len(ref)

    # resume: delete two shards + manifest; re-run recomputes ONLY them
    import shutil

    victims = ["shard=3", "shard=7"]
    for v in victims:
        shutil.rmtree(os.path.join(out, v))
    os.remove(os.path.join(out, "export_manifest.json"))
    before = {
        d: os.path.getmtime(os.path.join(out, d, "part-0.parquet"))
        for d in os.listdir(out)
        if d.startswith("shard=")
    }
    man2 = export_corpus(sf_dir, out)
    assert man2 == man
    for d, m in before.items():
        assert os.path.getmtime(os.path.join(out, d, "part-0.parquet")) == m

    # zero-row shards (if any) still commit an empty typed file
    for s in range(EXPORT_SHARDS):
        assert os.path.exists(os.path.join(out, f"shard={s}", "part-0.parquet"))


def test_export_num_shards_pinned(ray_session, sf_dir, tmp_path):
    out = str(tmp_path / "export2")
    export_corpus(sf_dir, out, num_shards=4)
    with pytest.raises(ValueError, match="num_shards=4"):
        export_corpus(sf_dir, out, num_shards=8)

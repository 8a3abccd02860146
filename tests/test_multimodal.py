"""Multimodal plumbing tests: schema, actor-pool decode, frame layout."""

import hashlib

import pyarrow as pa
import pytest

import ray.data

from cosmwasm_etl_ray.stages.multimodal import (
    DecodeStub,
    FakeDecoder,
    FrameSampler,
    media_features,
    synthesize_media,
)


def _docs(sf_dir):
    return ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])


def test_media_schema_and_payload_roundtrip(sf_dir):
    media = synthesize_media(_docs(sf_dir))
    t = media.limit(10).to_pandas()
    assert set(t.columns) == {"media_id", "kind", "payload", "width", "height", "n_frames"}
    assert t["kind"].isin(["image", "audio", "video"]).all()
    assert all(isinstance(p, bytes) and len(p) > 0 for p in t["payload"])


def test_decode_stub_gates_real_codec():
    with pytest.raises(NotImplementedError):
        DecodeStub(use_real_codec=True)


def test_fake_decoder_deterministic_features(sf_dir):
    feats = media_features(_docs(sf_dir)).to_pandas().sort_values("media_id")
    assert set(feats.columns) == {"media_id", "kind", "feature", "payload_sha256", "n_bytes"}
    assert feats["feature"].map(len).eq(64).all()
    # sha256 equals hash of the synthesized payload (invariant holds
    # through the actor-pool stage)
    doc = _docs(sf_dir).limit(1).to_pandas().iloc[0]
    expect = hashlib.sha256(doc["text"].encode() * 3).hexdigest()
    got = feats[feats["media_id"] == doc["doc_id"]]["payload_sha256"].iloc[0]
    assert got == expect


def test_frame_sampler_layout(sf_dir):
    media = synthesize_media(_docs(sf_dir))
    frames = media.map_batches(
        FrameSampler(stride=8), batch_format="pyarrow"
    ).to_pandas()
    per = frames.groupby("media_id")["frame_index"].agg(["count", "max"])
    meta = media.to_pandas().set_index("media_id")
    for mid, row in per.head(50).iterrows():
        nf = meta.loc[mid, "n_frames"]
        assert row["count"] == (nf + 7) // 8
        assert row["max"] <= nf - 1 or nf <= 8

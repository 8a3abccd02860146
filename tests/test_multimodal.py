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


def test_fake_resizer_nearest_neighbor():
    import hashlib

    import numpy as np
    import pyarrow as pa

    from cosmwasm_etl_ray.stages.multimodal import FakeResizer

    r = FakeResizer(target_len=4)
    t = pa.table(
        {
            "media_id": pa.array([1, 2, 3], type=pa.int64()),
            "payload": pa.array([b"abcdefgh", b"xy", b""], type=pa.large_binary()),
        }
    )
    out = r(t)
    # downscale: indices (i*8)//4 = 0,2,4,6 -> 'aceg'
    assert out["resized"][0].as_py() == b"aceg"
    # upscale: indices (i*2)//4 = 0,0,1,1 -> 'xxyy'
    assert out["resized"][1].as_py() == b"xxyy"
    assert out["resized"][2].as_py() == b""
    assert out["resized_len"].to_pylist() == [4, 4, 0]
    assert out["resized_sha256"][0].as_py() == hashlib.sha256(b"aceg").hexdigest()


def test_frame_sampler_empty_batch():
    """An empty media block (e.g. a kind-filter leaving nothing) must
    emit the (media_id, frame_index) schema, not crash on ends[-1]."""
    import pyarrow as pa

    from cosmwasm_etl_ray.stages.multimodal import FrameSampler

    empty = pa.table(
        {
            "media_id": pa.array([], type=pa.int64()),
            "n_frames": pa.array([], type=pa.int64()),
        }
    )
    out = FrameSampler()(empty)
    assert out.num_rows == 0
    assert out.column_names == ["media_id", "frame_index"]


def test_third_party_decoder_drops_in(ray_session, sf_dir):
    """EXTENSION CONTRACT (VERDICT r3 #7): a decoder class the engine
    has never seen — init-time 'codec load' in __init__, pyarrow
    batches in __call__ — drops into media_features() without touching
    the pipeline. This is the seam a real Pillow/ffmpeg wrapper fills
    if the environment ever grows those libraries."""
    import hashlib

    import pyarrow as pa
    import ray.data as rd

    from cosmwasm_etl_ray.stages.multimodal import media_features

    class ThirdPartyDecoder:
        """Simulates an external codec wrapper: __init__ = one-time
        model/codec setup (per actor), __call__ = batch decode."""

        def __init__(self, quality: int = 7):
            # stands in for `self.codec = SomeLib.load(...)`
            self.quality = quality
            self.magic = hashlib.sha256(b"codec-init").digest()[0]

        def __call__(self, t: pa.Table) -> pa.Table:
            sizes = [len(b.as_py()) for b in t["payload"]]
            return pa.table(
                {
                    "media_id": t["media_id"],
                    "decoded_len": pa.array(
                        [s * self.quality + self.magic for s in sizes],
                        type=pa.int64(),
                    ),
                }
            )

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    out = media_features(docs, decoder=ThirdPartyDecoder,
                         decoder_kwargs={"quality": 3}).to_pandas()
    assert len(out) == docs.count()
    assert set(out.columns) == {"media_id", "decoded_len"}
    # deterministic: quality*3 path, payload = text*3 utf-8 bytes
    texts = rd.read_parquet(f"{sf_dir}/documents.parquet").to_pandas()
    one = texts.iloc[0]
    got = out.set_index("media_id").loc[one["doc_id"], "decoded_len"]
    expect = len(one["text"].encode() * 3) * 3 + hashlib.sha256(b"codec-init").digest()[0]
    assert int(got) == expect


def test_bmp_codec_roundtrip_random():
    """encode_bmp24/decode_bmp24 are exact inverses across sizes that
    exercise every stride-padding case (w%4 in 0..3)."""
    import numpy as np

    from cosmwasm_etl_ray.stages.multimodal import decode_bmp24, encode_bmp24

    rng = np.random.default_rng(7)
    for _ in range(50):
        h, w = int(rng.integers(1, 40)), int(rng.integers(1, 40))
        px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        assert np.array_equal(decode_bmp24(encode_bmp24(px)), px), (h, w)


def test_bmp_decode_golden_bytes():
    """Hand-constructed BMP bytes pin the actual format: bottom-up
    scanlines, BGR channel order, 4-byte stride padding — a codec that
    is self-consistent but spec-wrong fails HERE even though the
    roundtrip test passes."""
    import struct

    from cosmwasm_etl_ray.stages.multimodal import decode_bmp24

    w, h = 1, 2  # row = 3 bytes → stride 4 (one pad byte per row)
    body = bytes([10, 20, 30, 0, 40, 50, 60, 0])  # bottom row first, BGR
    raw = (
        struct.pack("<2sIHHI", b"BM", 54 + 8, 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, 8, 2835, 2835, 0, 0)
        + body
    )
    px = decode_bmp24(raw)
    assert px.tolist() == [[[60, 50, 40]], [[30, 20, 10]]]


def test_bmp_decode_rejects_malformed():
    import numpy as np
    import pytest

    from cosmwasm_etl_ray.stages.multimodal import decode_bmp24, encode_bmp24

    with pytest.raises(ValueError, match="magic"):
        decode_bmp24(b"PNG\x00" * 20)
    good = bytearray(encode_bmp24(np.zeros((2, 2, 3), np.uint8)))
    good[28] = 8  # claim 8 bpp
    with pytest.raises(ValueError, match="24-bit"):
        decode_bmp24(bytes(good))


def test_bmp_resizer_matches_numpy(ray_session, sf_dir):
    """BmpResizer's sums equal a direct numpy decode+resample."""
    import numpy as np

    import ray.data as rd

    from cosmwasm_etl_ray.stages.multimodal import (
        BmpResizer,
        _bmp_pixels,
        synthesize_bmp_media,
    )

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet").limit(50)
    out = (
        synthesize_bmp_media(docs)
        .map_batches(
            BmpResizer, batch_format="pyarrow", batch_size=64, concurrency=(1, 2)
        )
        .to_pandas()
        .set_index("media_id")
    )
    T = 16
    ty = np.arange(T)
    for mid in out.index[:10]:
        px = _bmp_pixels(int(mid))
        h, w = px.shape[:2]
        small = px[(ty * h) // T][:, (ty * w) // T].astype(np.int64)
        s = small.sum(axis=(0, 1))
        row = out.loc[mid]
        assert (int(row.sum_r), int(row.sum_g), int(row.sum_b)) == tuple(
            int(v) for v in s
        )


def test_wav_codec_roundtrip_and_golden():
    """encode_wav16/decode_wav16 are inverses, and hand-built RIFF
    bytes (with an extra LIST chunk between fmt and data, odd-size
    word-alignment) pin the chunk-walking decode against the spec."""
    import struct

    import numpy as np

    from cosmwasm_etl_ray.stages.multimodal import decode_wav16, encode_wav16

    rng = np.random.default_rng(11)
    for n in (1, 7, 160):
        s = rng.integers(-32768, 32768, size=n).astype(np.int16)
        out, rate = decode_wav16(encode_wav16(s, rate=8000))
        assert rate == 8000 and np.array_equal(out, s)

    # golden: fmt + odd-sized LIST chunk (needs the pad byte) + data
    fmt = struct.pack("<4sIHHIIHH", b"fmt ", 16, 1, 1, 8000, 16000, 2, 16)
    lst = struct.pack("<4sI", b"LIST", 3) + b"abc" + b"\x00"  # word-aligned
    data = struct.pack("<4sI", b"data", 4) + struct.pack("<hh", -5, 7)
    body = fmt + lst + data
    raw = struct.pack("<4sI4s", b"RIFF", 4 + len(body), b"WAVE") + body
    samples, rate = decode_wav16(raw)
    assert rate == 8000 and samples.tolist() == [-5, 7]


def test_wav_decode_rejects_malformed():
    import struct

    import numpy as np
    import pytest

    from cosmwasm_etl_ray.stages.multimodal import decode_wav16, encode_wav16

    with pytest.raises(ValueError, match="RIFF"):
        decode_wav16(b"OggS" + b"\x00" * 40)
    good = bytearray(encode_wav16(np.zeros(4, np.int16)))
    struct.pack_into("<H", good, 22, 2)  # claim stereo
    with pytest.raises(ValueError, match="mono"):
        decode_wav16(bytes(good))


def test_y4m_codec_roundtrip_and_golden():
    """encode_y4m/decode_y4m roundtrip, plus a hand-built YUV4MPEG2
    stream (real header grammar: tagged params in one ASCII line, FRAME
    markers, planar C420 layout) pins the parser against the spec."""
    import numpy as np

    from cosmwasm_etl_ray.stages.multimodal import decode_y4m, encode_y4m

    rng = np.random.default_rng(13)
    frames = [
        (
            rng.integers(0, 256, (4, 6), dtype=np.uint8),
            rng.integers(0, 256, (2, 3), dtype=np.uint8),
            rng.integers(0, 256, (2, 3), dtype=np.uint8),
        )
        for _ in range(3)
    ]
    got, w, h = decode_y4m(encode_y4m(frames, fps=30))
    assert (w, h) == (6, 4) and len(got) == 3
    for (gy, gu, gv), (y, u, v) in zip(got, frames):
        assert np.array_equal(gy, y) and np.array_equal(gu, u)
        assert np.array_equal(gv, v)

    # golden: 2x2 single frame, written byte-by-byte
    raw = (
        b"YUV4MPEG2 W2 H2 F25:1 Ip A1:1 C420\n"
        + b"FRAME\n"
        + bytes([1, 2, 3, 4])  # Y plane row-major
        + bytes([9])           # U (1x1)
        + bytes([7])           # V (1x1)
    )
    fr, w, h = decode_y4m(raw)
    assert (w, h) == (2, 2) and len(fr) == 1
    assert fr[0][0].tolist() == [[1, 2], [3, 4]]
    assert fr[0][1].tolist() == [[9]] and fr[0][2].tolist() == [[7]]


def test_y4m_decode_rejects_malformed():
    import pytest

    from cosmwasm_etl_ray.stages.multimodal import decode_y4m

    with pytest.raises(ValueError, match="YUV4MPEG2"):
        decode_y4m(b"MPEG4 W2 H2\nFRAME\n" + bytes(6))
    with pytest.raises(ValueError, match="C420"):
        decode_y4m(b"YUV4MPEG2 W2 H2 C444\nFRAME\n" + bytes(12))
    with pytest.raises(ValueError, match="FRAME"):
        decode_y4m(b"YUV4MPEG2 W2 H2 C420\nXRAME\n" + bytes(6))


def test_png_codec_roundtrip_all_modes():
    """encode_png_rgb8/decode_png_rgb8 are exact inverses for every
    filter strategy (adaptive, each fixed filter 0-4, cycled) across
    random sizes — each mode forces its unfilter branch to run."""
    import numpy as np

    from cosmwasm_etl_ray.stages.multimodal import decode_png_rgb8, encode_png_rgb8

    rng = np.random.default_rng(11)
    for mode in ["adaptive", 0, 1, 2, 3, 4, ("cycle", 5)]:
        h, w = int(rng.integers(1, 40)), int(rng.integers(1, 40))
        px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        assert np.array_equal(decode_png_rgb8(encode_png_rgb8(px, mode)), px), mode


def test_png_adaptive_filter_actually_compresses():
    """The MSAD heuristic must beat filter-None on a smooth gradient —
    i.e. the predictive filters are real, not pass-through."""
    from cosmwasm_etl_ray.stages.multimodal import _png_pixels, encode_png_rgb8

    px = _png_pixels(12345)
    assert len(encode_png_rgb8(px, "adaptive")) < len(encode_png_rgb8(px, 0)) / 2


def test_png_decode_golden_bytes():
    """Hand-assembled PNG bytes pin the actual format: big-endian
    chunk lengths, CRC over tag+body, filter byte per scanline, Up
    filter adds the previous RECONSTRUCTED row — a self-consistent but
    spec-wrong codec fails HERE even though roundtrips pass."""
    import struct
    import zlib

    from cosmwasm_etl_ray.stages.multimodal import decode_png_rgb8

    def chunk(tag, body):
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    # 2x2 RGB: row0 = filter 0 (raw), row1 = filter 2 (Up: stored
    # deltas add to row0's reconstruction)
    row0 = bytes([0, 10, 20, 30, 40, 50, 60])
    row1 = bytes([2, 1, 2, 3, 4, 5, 6])
    raw = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(row0 + row1))
        + chunk(b"IEND", b"")
    )
    px = decode_png_rgb8(raw)
    assert px.tolist() == [
        [[10, 20, 30], [40, 50, 60]],
        [[11, 22, 33], [44, 55, 66]],
    ]


def test_png_decode_multiple_idat_and_ancillary_chunks():
    """Spec behaviors beyond our own encoder's output: pixel data split
    across several IDAT chunks and unknown ancillary chunks (tEXt)
    interleaved — both must decode identically."""
    import struct
    import zlib

    import numpy as np

    from cosmwasm_etl_ray.stages.multimodal import decode_png_rgb8, encode_png_rgb8

    def chunk(tag, body):
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    rng = np.random.default_rng(3)
    px = rng.integers(0, 256, size=(5, 4, 3), dtype=np.uint8)
    scan = b""
    for r in range(5):
        scan += b"\x00" + px[r].tobytes()
    comp = zlib.compress(scan)
    mid = len(comp) // 2
    raw = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 5, 8, 2, 0, 0, 0))
        + chunk(b"tEXt", b"Comment\x00hand-built")
        + chunk(b"IDAT", comp[:mid])
        + chunk(b"IDAT", comp[mid:])
        + chunk(b"IEND", b"")
    )
    assert np.array_equal(decode_png_rgb8(raw), px)
    # and our own encoder's output parses too (sanity anchor)
    assert np.array_equal(decode_png_rgb8(encode_png_rgb8(px)), px)


def test_png_decode_rejects_malformed():
    import numpy as np
    import pytest

    from cosmwasm_etl_ray.stages.multimodal import decode_png_rgb8, encode_png_rgb8

    with pytest.raises(ValueError, match="signature"):
        decode_png_rgb8(b"BM" + b"\x00" * 60)
    good = bytearray(encode_png_rgb8(np.zeros((2, 2, 3), np.uint8)))
    bad = good.copy()
    bad[20] = 99  # corrupt an IHDR byte without fixing the CRC
    with pytest.raises(ValueError, match="CRC"):
        decode_png_rgb8(bytes(bad))
    bad = good.copy()
    bad[24] = 16  # bit depth 16 (with a recomputed CRC it's unsupported)
    import struct
    import zlib

    body = bytes(bad[16:29])
    bad[29:33] = struct.pack(">I", zlib.crc32(b"IHDR" + body) & 0xFFFFFFFF)
    with pytest.raises(ValueError, match="unsupported"):
        decode_png_rgb8(bytes(bad))


def test_gif_encode_golden_bytes():
    """Full encoder output for a hand-derived 2x2 2-color image — pins
    the exact LZW bit packing (codes 4,0,1,1 at width 3, then 0,5 at
    width 4 after the non-early-change bump -> sub-block 03 44 02 05),
    LSD/color-table/descriptor framing, and trailer. Any width-rule or
    bit-order regression changes these bytes."""
    import numpy as np

    from cosmwasm_etl_ray.stages.multimodal import decode_gif8, encode_gif8

    idx = np.array([[0, 1], [1, 0]], np.uint8)
    pal = np.array([[0, 0, 0], [255, 255, 255]], np.uint8)
    raw = encode_gif8(idx, pal)
    assert raw == bytes.fromhex(
        "474946383961"          # GIF89a
        "02000200f00000"        # LSD: 2x2, GCT of 2, bg 0, aspect 0
        "000000ffffff"          # palette
        "2c000000000200020000"  # image descriptor
        "02"                    # LZW min code size
        "0344020500"            # one sub-block: 44 02 05, terminator
        "3b"                    # trailer
    )
    i2, p2 = decode_gif8(raw)
    assert np.array_equal(i2, idx) and np.array_equal(p2[:2], pal)


def test_gif_roundtrip_resets_and_width_growth():
    """encode/decode are exact inverses across dictionary reset points
    (incl. reset_at == 2**width, the virtual-bump CLEAR boundary) and
    a 300x300 256-color image that grows the dictionary to 12 bits and
    hits the spec-maximum 4096 reset."""
    import numpy as np

    from cosmwasm_etl_ray.stages.multimodal import (
        _GIF_PALETTE,
        decode_gif8,
        encode_gif8,
    )

    rng = np.random.default_rng(7)
    for reset in (4096, 20, 24, 32, 64):
        for shape in ((1, 1), (17, 23), (40, 40)):
            a = rng.integers(0, 16, size=shape).astype(np.uint8)
            i2, _ = decode_gif8(encode_gif8(a, _GIF_PALETTE, reset_at=reset))
            assert np.array_equal(i2, a), (reset, shape)
    big = rng.integers(0, 256, size=(300, 300)).astype(np.uint8)
    pal256 = np.arange(768, dtype=np.uint8).reshape(256, 3)
    i2, p2 = decode_gif8(encode_gif8(big, pal256))
    assert np.array_equal(i2, big) and np.array_equal(p2, pal256)
    # constant image exercises the KwKwK (code == next slot) decode path
    flat = np.zeros((9, 9), np.uint8)
    i2, _ = decode_gif8(encode_gif8(flat, _GIF_PALETTE))
    assert np.array_equal(i2, flat)


def test_gif_decode_spec_features_and_malformed():
    """Decoder walks GIF89a extension blocks, honors a local color
    table overriding the global one, and raises on malformed payloads
    instead of misdecoding."""
    import struct

    import numpy as np
    import pytest

    from cosmwasm_etl_ray.stages.multimodal import (
        _GIF_PALETTE,
        _lzw_encode_gif,
        decode_gif8,
        encode_gif8,
    )

    idx = np.array([[3, 1, 4], [1, 5, 9]], np.uint8)
    # hand-frame: no global table, graphic-control extension, local table
    raw = bytearray(b"GIF89a")
    raw += struct.pack("<HH", 3, 2) + bytes([0x70, 0, 0])       # no GCT
    raw += b"\x21\xf9\x04\x00\x00\x00\x00\x00"                   # GCE ext
    raw += b"\x2c" + struct.pack("<HHHH", 0, 0, 3, 2)
    raw += bytes([0x80 | 3])                                      # LCT, 16
    raw += _GIF_PALETTE.tobytes()
    data = _lzw_encode_gif(idx.ravel(), 4)
    raw += bytes([4, len(data)]) + data + b"\x00\x3b"
    i2, p2 = decode_gif8(bytes(raw))
    assert np.array_equal(i2, idx) and np.array_equal(p2, _GIF_PALETTE)

    good = encode_gif8(idx, _GIF_PALETTE)
    with pytest.raises(ValueError):
        decode_gif8(b"BM" + good[2:])                # bad signature
    with pytest.raises(ValueError):
        decode_gif8(good[:-12])                      # truncated stream
    interlaced = bytearray(good)
    desc = good.index(b"\x2c")
    interlaced[desc + 9] |= 0x40
    with pytest.raises(ValueError):
        decode_gif8(bytes(interlaced))               # interlace rejected
    with pytest.raises(ValueError):
        encode_gif8(idx, _GIF_PALETTE, reset_at=17)  # no table room
    with pytest.raises(ValueError):
        encode_gif8(np.full((2, 2), 99, np.uint8), _GIF_PALETTE[:16])


def test_jpeg_block_constant_roundtrip_exact():
    """Block-constant images survive the lossy baseline JPEG exactly
    (only the DC coefficient is nonzero and the DC quantizer equals
    the DCT's DC gain) — the property the gate oracle relies on.
    Covers negative DC diffs (one's-complement amplitude coding) and
    non-multiple-of-8 crops."""
    import numpy as np

    from cosmwasm_etl_ray.stages.multimodal import (
        decode_jpeg_gray,
        encode_jpeg_gray,
    )

    rng = np.random.default_rng(3)
    for trial in range(20):
        bh, bw = rng.integers(1, 4, 2)
        vals = rng.integers(0, 256, (bh, bw)).astype(np.uint8)
        full = np.kron(vals, np.ones((8, 8), np.uint8))
        h = int(bh * 8 - rng.integers(0, 8))
        w = int(bw * 8 - rng.integers(0, 8))
        img = full[:h, :w]
        assert np.array_equal(decode_jpeg_gray(encode_jpeg_gray(img)), img), trial


def test_jpeg_lossy_roundtrip_bounded_and_markers_skipped():
    """Arbitrary images roundtrip within the quantization error bound
    (exercises AC runs, ZRL, EOB, byte stuffing); inserted COM/APPn
    segments are walked per spec; malformed payloads raise."""
    import struct

    import numpy as np
    import pytest

    from cosmwasm_etl_ray.stages.multimodal import (
        decode_jpeg_gray,
        encode_jpeg_gray,
    )

    rng = np.random.default_rng(11)
    for trial in range(6):
        h, w = (int(v) for v in rng.integers(5, 70, 2))
        img = rng.integers(0, 256, (h, w)).astype(np.uint8)
        dec = decode_jpeg_gray(encode_jpeg_gray(img))
        err = np.abs(dec.astype(int) - img.astype(int))
        assert err.max() <= 120, (trial, err.max())
    y, x = np.mgrid[0:64, 0:64]
    smooth = ((y * 2 + x * 2) % 256).astype(np.uint8)
    dec = decode_jpeg_gray(encode_jpeg_gray(smooth))
    assert np.abs(dec.astype(int) - smooth.astype(int)).max() <= 4

    good = encode_jpeg_gray(smooth)
    com = b"\xff\xfe" + struct.pack(">H", 7) + b"hello"
    with_com = good[:2] + com + good[2:]
    assert np.array_equal(decode_jpeg_gray(with_com), dec)

    with pytest.raises(ValueError):
        decode_jpeg_gray(b"GIF89a" + good[6:])        # no SOI
    with pytest.raises(ValueError):
        decode_jpeg_gray(good[:-40])                  # truncated scan
    sof2 = bytearray(good)
    sof2[good.index(b"\xff\xc0") + 1] = 0xC2
    with pytest.raises(ValueError):
        decode_jpeg_gray(bytes(sof2))                 # progressive
    with pytest.raises(ValueError):
        encode_jpeg_gray(np.zeros((0, 4), np.uint8))  # empty


def test_avi_mjpeg_roundtrip_and_sampling():
    """MJPEG-AVI container roundtrip: block-constant frames decode
    exactly (per-frame JPEG DC-only property), stride sampling decodes
    only every k-th frame, arbitrary frames stay within the JPEG
    quantization bound, odd-length JPEG chunks exercise RIFF even-byte
    padding."""
    import numpy as np

    from cosmwasm_etl_ray.stages.multimodal import (
        _avi_frames,
        decode_avi_mjpeg,
        encode_avi_mjpeg,
    )

    for doc in (0, 7, 123, 4567):
        frames = _avi_frames(doc)
        raw = encode_avi_mjpeg(frames)
        dec, total = decode_avi_mjpeg(raw)
        assert total == len(frames)
        assert all(np.array_equal(a, b) for a, b in zip(dec, frames))
        dec2, total2 = decode_avi_mjpeg(raw, stride=2)
        assert total2 == len(frames) and len(dec2) == (len(frames) + 1) // 2
        assert all(np.array_equal(a, b) for a, b in zip(dec2, frames[::2]))
    rng = np.random.default_rng(5)
    frames = [rng.integers(0, 256, (24, 33)).astype(np.uint8) for _ in range(5)]
    dec, _ = decode_avi_mjpeg(encode_avi_mjpeg(frames))
    for a, b in zip(dec, frames):
        assert np.abs(a.astype(int) - b.astype(int)).max() <= 120


def test_avi_mjpeg_rejects_malformed():
    import struct

    import numpy as np
    import pytest

    from cosmwasm_etl_ray.stages.multimodal import (
        _avi_frames,
        decode_avi_mjpeg,
        encode_avi_mjpeg,
    )

    good = encode_avi_mjpeg(_avi_frames(3))
    with pytest.raises(ValueError):
        decode_avi_mjpeg(b"JUNK" + good[4:])          # bad signature
    with pytest.raises(ValueError):
        decode_avi_mjpeg(good, stride=0)              # bad stride
    bad_handler = good.replace(b"MJPG", b"H264", 1)
    with pytest.raises(ValueError):
        decode_avi_mjpeg(bad_handler)                 # wrong codec
    # corrupt declared frame count in avih
    pos = good.index(b"avih") + 8 + 16
    wrong = good[:pos] + struct.pack("<I", 99) + good[pos + 4 :]
    with pytest.raises(ValueError):
        decode_avi_mjpeg(wrong)
    with pytest.raises(ValueError):
        encode_avi_mjpeg([])                          # no frames
    with pytest.raises(ValueError):
        encode_avi_mjpeg(
            [np.zeros((8, 8), np.uint8), np.zeros((8, 9), np.uint8)]
        )                                             # mismatched shapes


def test_flac_roundtrip_exact():
    """FLAC-style encode/decode are exact inverses across signal
    shapes (noise/smooth/constant/random-walk), block sizes (partial
    last blocks, multi-frame streams with UTF-8 frame numbers >= 1),
    and the gate waveform; CONSTANT and FIXED-predictor subframes plus
    Rice parameter selection are all exercised."""
    import numpy as np

    from cosmwasm_etl_ray.stages.multimodal import (
        _flac_samples,
        decode_flac16,
        encode_flac16,
    )

    for doc in (0, 1, 7, 123, 4567, 99999):
        s = _flac_samples(doc)
        d, rate = decode_flac16(encode_flac16(s))
        assert rate == 8000 and np.array_equal(d, s), doc
    rng = np.random.default_rng(9)
    for trial in range(12):
        n = int(rng.integers(1, 3000))
        kind = trial % 4
        if kind == 0:
            s = rng.integers(-32768, 32768, n).astype(np.int16)
        elif kind == 1:
            s = (1000 * np.sin(np.arange(n) / 10)).astype(np.int16)
        elif kind == 2:
            s = np.full(n, int(rng.integers(-32768, 32768)), np.int16)
        else:
            s = np.cumsum(rng.integers(-3, 4, n)).clip(-32768, 32767).astype(np.int16)
        bs = int(rng.choice([16, 64, 256, 4096]))
        d, _ = decode_flac16(encode_flac16(s, block_size=bs))
        assert np.array_equal(d, s), (trial, kind, bs)


def test_flac_compresses_and_rejects_malformed():
    """Smooth audio compresses well below raw PCM (the predictive
    family actually predicting); every integrity layer trips on
    tampering: magic, frame-header CRC-8, frame CRC-16, stream MD5,
    truncation."""
    import numpy as np
    import pytest

    from cosmwasm_etl_ray.stages.multimodal import (
        _flac_samples,
        decode_flac16,
        encode_flac16,
    )

    smooth = (1000 * np.sin(np.arange(8000) / 20)).astype(np.int16)
    assert len(encode_flac16(smooth, block_size=4096)) < 2 * len(smooth) * 0.3

    good = encode_flac16(_flac_samples(42))
    with pytest.raises(ValueError):
        decode_flac16(b"RIFF" + good[4:])       # bad magic
    with pytest.raises(ValueError):
        decode_flac16(good[:-6])                # truncated
    # flip one bit inside the first frame's residual bytes: either the
    # frame CRC-16 or (if the damage cancels structurally) the MD5 trips
    frame_start = 4 + 4 + 34
    bad = bytearray(good)
    bad[frame_start + 12] ^= 0x40
    with pytest.raises(ValueError):
        decode_flac16(bytes(bad))
    # corrupt the header CRC-8 byte itself
    bad = bytearray(good)
    # header: ff f8 70 08 <utf8:1> <bs:2> <crc8> -> crc8 at offset 7
    bad[frame_start + 7] ^= 0xFF
    with pytest.raises(ValueError):
        decode_flac16(bytes(bad))
    with pytest.raises(ValueError):
        encode_flac16(np.zeros(0, np.int16))    # empty
    with pytest.raises(ValueError):
        encode_flac16(np.zeros(4, np.int32))    # wrong dtype


def test_robust_decoder_quarantines_corrupt_payloads():
    """RobustMediaDecoder keeps the stream flowing: a flipped bit in
    every k-th FLAC payload lands in decode_ok=false with a zero stat
    while every other row carries the exact decoded sum — and the
    corruptor itself is deterministic (same media_id -> same fault)."""
    import numpy as np
    import pyarrow as pa

    from cosmwasm_etl_ray.stages.multimodal import (
        RobustMediaDecoder,
        _flac_samples,
        corrupt_payloads,
        encode_flac16,
    )

    ids = list(range(60))
    t = pa.table(
        {
            "media_id": pa.array(ids, type=pa.int64()),
            "payload": pa.array(
                [encode_flac16(_flac_samples(i)) for i in ids],
                type=pa.large_binary(),
            ),
        }
    )
    import ray.data as rd

    ds = rd.from_arrow(t)
    out = corrupt_payloads(ds, every=29).map_batches(
        RobustMediaDecoder,
        batch_format="pyarrow",
        batch_size=32,
        concurrency=(1, 2),
    ).to_pandas().sort_values("media_id").reset_index(drop=True)
    for i in ids:
        row = out.iloc[i]
        if i % 29 == 0:
            assert not row["decode_ok"] and row["sum_amp"] == 0, i
        else:
            expect = int(_flac_samples(i).astype(np.int64).sum())
            assert row["decode_ok"] and row["sum_amp"] == expect, i


def test_decoders_raise_only_valueerror_on_hostile_bytes():
    """The RobustMediaDecoder contract: EVERY decoder raises ValueError
    (and only ValueError) on malformed input — never IndexError/
    struct.error/MemoryError/garbage — and plausibility caps prevent
    crafted headers from allocating unbounded memory (FLAC 36-bit
    total_samples, JPEG SOF0 dims, PNG deflate-bomb inflate, GIF LZW
    expansion). Fuzz: random bytes, magic-prefixed random bytes, and
    mutated valid payloads through all eight decoders."""
    import struct

    import numpy as np
    import pytest

    from cosmwasm_etl_ray.stages.multimodal import (
        _avi_frames,
        _flac_samples,
        _gif_indices,
        _GIF_PALETTE,
        _jpeg_block_values,
        _png_pixels,
        _wav_samples,
        _y4m_planes,
        decode_avi_mjpeg,
        decode_bmp24,
        decode_flac16,
        decode_gif8,
        decode_jpeg_gray,
        decode_png_rgb8,
        decode_wav16,
        decode_y4m,
        encode_avi_mjpeg,
        encode_bmp24,
        encode_flac16,
        encode_gif8,
        encode_jpeg_gray,
        encode_png_rgb8,
        encode_wav16,
        encode_y4m,
    )

    rng = np.random.default_rng(17)
    img = _png_pixels(5)
    gray = np.kron(_jpeg_block_values(5)[2], np.ones((8, 8), np.uint8))
    cases = {
        decode_bmp24: (encode_bmp24(img), b"BM"),
        decode_png_rgb8: (encode_png_rgb8(img), b"\x89PNG\r\n\x1a\n"),
        decode_gif8: (encode_gif8(_gif_indices(5), _GIF_PALETTE), b"GIF89a"),
        decode_jpeg_gray: (encode_jpeg_gray(gray), b"\xff\xd8"),
        decode_wav16: (encode_wav16(_wav_samples(5)), b"RIFF"),
        decode_flac16: (encode_flac16(_flac_samples(5)), b"fLaC"),
        decode_y4m: (encode_y4m(_y4m_planes(5)), b"YUV4MPEG2 "),
        decode_avi_mjpeg: (encode_avi_mjpeg(_avi_frames(5)), b"RIFF"),
    }
    for dec, (good, magic) in cases.items():
        # sanity: the pristine payload decodes
        dec(good)
        for trial in range(40):
            kind = trial % 4
            if kind == 0:       # pure noise
                buf = rng.bytes(int(rng.integers(0, 400)))
            elif kind == 1:     # magic + noise (reaches the parser)
                buf = magic + rng.bytes(int(rng.integers(0, 400)))
            elif kind == 2:     # truncation
                buf = good[: int(rng.integers(0, len(good)))]
            else:               # bit flips in a valid payload
                b = bytearray(good)
                for _ in range(int(rng.integers(1, 4))):
                    b[int(rng.integers(0, len(b)))] ^= 1 << int(rng.integers(0, 8))
                buf = bytes(b)
            try:
                dec(buf)        # decoding to *something* is fine...
            except ValueError:
                pass            # ...and ValueError is the only legal raise
    # the specific giant-allocation vectors stay cheap and raise
    flac_bomb = bytearray(encode_flac16(_flac_samples(1)))
    # STREAMINFO total_samples: bits 144..180 of the 34-byte block at
    # offset 8 -> bytes 8+18..8+22; force the top bits high
    flac_bomb[8 + 17] |= 0x0F
    flac_bomb[8 + 18] = 0xFF
    with pytest.raises(ValueError):
        decode_flac16(bytes(flac_bomb))
    jpeg_bomb = bytearray(encode_jpeg_gray(gray))
    sof = jpeg_bomb.index(b"\xff\xc0")
    struct.pack_into(">HH", jpeg_bomb, sof + 5, 65500, 65500)
    with pytest.raises(ValueError):
        decode_jpeg_gray(bytes(jpeg_bomb))


def test_flv_screenvideo_roundtrip_and_temporal_compression():
    """FLV Screen Video: exact roundtrip incl. genuinely static
    regions (the copy-forward path), the gate's block-update field,
    and proof the temporal coding pays (a static 10-frame clip
    compresses ~10x smaller than a per-frame-random one)."""
    import numpy as np

    from cosmwasm_etl_ray.stages.multimodal import (
        _flv_frames,
        decode_flv_screenvideo,
        encode_flv_screenvideo,
    )

    rng = np.random.default_rng(13)
    for trial in range(6):
        n = int(rng.integers(1, 6))
        h = int(rng.integers(4, 40))
        w = int(rng.integers(4, 40))
        frames = np.stack([rng.integers(0, 256, (h, w, 3)).astype(np.uint8)] * n).copy()
        for f in range(1, n):
            if rng.random() < 0.7:
                y, x = int(rng.integers(0, h)), int(rng.integers(0, w))
                frames[f:, y, x] = rng.integers(0, 256, 3)
        assert np.array_equal(
            decode_flv_screenvideo(encode_flv_screenvideo(frames)), frames
        ), trial
    for doc in (0, 3, 17, 123, 4567):
        fr = _flv_frames(doc)
        assert np.array_equal(
            decode_flv_screenvideo(encode_flv_screenvideo(fr)), fr
        ), doc
    static = np.stack([rng.integers(0, 256, (64, 64, 3)).astype(np.uint8)] * 10)
    moving = rng.integers(0, 256, (10, 64, 64, 3)).astype(np.uint8)
    assert len(encode_flv_screenvideo(static)) < len(encode_flv_screenvideo(moving)) / 5


def test_flv_screenvideo_rejects_malformed():
    import numpy as np
    import pytest

    from cosmwasm_etl_ray.stages.multimodal import (
        _flv_frames,
        decode_flv_screenvideo,
        encode_flv_screenvideo,
    )

    good = encode_flv_screenvideo(_flv_frames(3))
    with pytest.raises(ValueError):
        decode_flv_screenvideo(b"FLV\x02" + good[4:])   # bad version
    with pytest.raises(ValueError):
        decode_flv_screenvideo(good[:-7])               # truncated tag chain
    non_key = bytearray(good)
    non_key[13] = (2 << 4) | 3                          # first frame inter
    with pytest.raises(ValueError):
        decode_flv_screenvideo(bytes(non_key))
    wrong_codec = bytearray(good)
    wrong_codec[13] = (1 << 4) | 7                      # codec id 7 (AVC)
    with pytest.raises(ValueError):
        decode_flv_screenvideo(bytes(wrong_codec))
    with pytest.raises(ValueError):
        encode_flv_screenvideo(np.zeros((0, 4, 4, 3), np.uint8))


def test_gif_to_png_transcode_lossless():
    """Transcode-at-the-edge: GIF -> PNG preserves every pixel (both
    codecs lossless), and the PNG payloads are genuinely re-encoded
    (PNG magic, decodable standalone)."""
    import numpy as np
    import pyarrow as pa

    from cosmwasm_etl_ray.stages.multimodal import (
        _GIF_PALETTE,
        _gif_indices,
        GifToPngTranscoder,
        decode_png_rgb8,
        encode_gif8,
    )

    ids = [0, 3, 17, 123]
    t = pa.table(
        {
            "media_id": pa.array(ids, type=pa.int64()),
            "payload": pa.array(
                [encode_gif8(_gif_indices(i), _GIF_PALETTE) for i in ids],
                type=pa.large_binary(),
            ),
        }
    )
    out = GifToPngTranscoder()(t)
    for mid, buf in zip(out["media_id"], out["payload"]):
        raw = buf.as_py()
        assert raw[:8] == b"\x89PNG\r\n\x1a\n"
        px = decode_png_rgb8(raw)
        expect = _GIF_PALETTE[_gif_indices(mid.as_py())]
        assert np.array_equal(px, expect), mid.as_py()


def test_sniff_dispatch_all_formats_and_quarantine_composition():
    """sniff_media_format identifies all nine formats by magic bytes,
    unknown magic raises ValueError, and the dispatch decode_fn drops
    into RobustMediaDecoder so a corrupt payload in a MIXED corpus
    quarantines instead of aborting."""
    import numpy as np
    import pyarrow as pa
    import pytest

    from cosmwasm_etl_ray.stages.multimodal import (
        RobustMediaDecoder,
        _avi_frames,
        _bmp_pixels,
        _flac_samples,
        _flv_frames,
        _GIF_PALETTE,
        _gif_indices,
        _jpeg_block_values,
        _png_pixels,
        _wav_samples,
        _y4m_planes,
        encode_avi_mjpeg,
        encode_bmp24,
        encode_flac16,
        encode_flv_screenvideo,
        encode_gif8,
        encode_jpeg_gray,
        encode_png_rgb8,
        encode_wav16,
        encode_y4m,
        sniff_decode_pixel_sum,
        sniff_media_format,
    )

    gray = np.kron(_jpeg_block_values(5)[2], np.ones((8, 8), np.uint8))
    payloads = {
        "bmp": encode_bmp24(_bmp_pixels(5)),
        "png": encode_png_rgb8(_png_pixels(5)),
        "gif": encode_gif8(_gif_indices(5), _GIF_PALETTE),
        "jpeg": encode_jpeg_gray(gray),
        "wav": encode_wav16(_wav_samples(5)),
        "flac": encode_flac16(_flac_samples(5)),
        "y4m": encode_y4m(_y4m_planes(5)),
        "avi": encode_avi_mjpeg(_avi_frames(5)),
        "flv": encode_flv_screenvideo(_flv_frames(5)),
    }
    for kind, raw in payloads.items():
        assert sniff_media_format(raw) == kind
        assert isinstance(sniff_decode_pixel_sum(raw), int)
    with pytest.raises(ValueError):
        sniff_media_format(b"\x00\x01\x02\x03junk")

    # dispatch + quarantine composition: unknown magic lands in
    # decode_ok=false, known payloads decode
    t = pa.table(
        {
            "media_id": pa.array([1, 2, 3], type=pa.int64()),
            "payload": pa.array(
                [payloads["png"], b"not media at all", payloads["flac"]],
                type=pa.large_binary(),
            ),
        }
    )
    out = RobustMediaDecoder(decode_fn=sniff_decode_pixel_sum)(t)
    assert out["decode_ok"].to_pylist() == [True, False, True]

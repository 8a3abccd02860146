"""Multimodal columns: opaque binary payloads + typed metadata, with
decode / feature-extract / resize / frame-sample as actor-pool stages.

No codec library exists in this container, so the codecs here are
implemented FROM SPEC in numpy + stdlib — nine real formats, each
oracle-gated on decoded output: images BMP (uncompressed 24-bit),
PNG (predictive filters + stdlib-zlib DEFLATE), GIF89a (from-scratch
variable-width LZW), baseline JPEG (canonical Huffman + DCT); audio
WAV (RIFF PCM) and FLAC-style (fixed predictors + Golomb-Rice,
CRC-8/16 + MD5 framed); video Y4M (uncompressed C420), MJPEG-AVI
(RIFF container over per-frame JPEGs), and FLV Screen Video v1
(genuine inter-frame block coding). Every decoder obeys one contract,
fuzz-pinned: malformed input raises ValueError — and ONLY ValueError
— with plausibility caps ahead of any large allocation, which is what
``RobustMediaDecoder``'s quarantine path relies on. ``DecodeStub``
covers only motion-compensated codecs (H.264-class); ``FakeDecoder``
remains the plumbing-only stand-in and ``media_features``'s decoder
arg is the extension point for a real third-party decoder class.

Scale notes: binary payload rows are wide → small batch_size and
``batch_format="pyarrow"`` end-to-end (binary columns do not round-trip
pandas object dtype safely); payload bytes stay zero-copy in Arrow
until the decode kernel reads them. Entropy decode is inherently
sequential per payload; the scale axis is payloads-per-batch across
the actor pool.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

import ray.data

MEDIA_SCHEMA = pa.schema(
    [
        pa.field("media_id", pa.int64()),
        pa.field("kind", pa.string()),          # image | audio | video
        pa.field("payload", pa.large_binary()),  # opaque encoded bytes
        pa.field("width", pa.int32()),
        pa.field("height", pa.int32()),
        pa.field("n_frames", pa.int32()),
    ]
)


def synthesize_media(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    """Deterministic fake media table derived from documents: payload =
    repeated utf-8 bytes of the text (stands in for encoded pixels)."""

    def make(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        texts = t["text"].to_pylist()
        kinds = ["image", "audio", "video"]
        payloads = [s.encode("utf-8") * 3 for s in texts]
        return pa.table(
            {
                "media_id": pa.array(ids, type=pa.int64()),
                "kind": pa.array([kinds[int(i) % 3] for i in ids], type=pa.string()),
                "payload": pa.array(payloads, type=pa.large_binary()),
                "width": pa.array((ids % 640 + 32).astype(np.int32)),
                "height": pa.array((ids % 480 + 32).astype(np.int32)),
                "n_frames": pa.array((ids % 24 + 1).astype(np.int32)),
            }
        )

    return docs.map_batches(make, batch_format="pyarrow", batch_size=512)


class DecodeStub:
    """Actor-pool decode stage for codecs NOT implemented in-repo
    (motion-compensated video: H.264-class DCT+MC — everything else
    has a real codec below: BMP/PNG/GIF/JPEG images, WAV/FLAC audio,
    Y4M/MJPEG-AVI/FLV-ScreenVideo video incl. genuine inter-frame
    coding). Constructing with use_real_codec=True raises, exactly
    like a missing-import gate would in production."""

    def __init__(self, use_real_codec: bool = False):
        if use_real_codec:
            raise NotImplementedError(
                "motion-compensated video codecs (H.264-class) are not "
                "installed in this environment; use the in-repo codecs "
                "(BMP/PNG/GIF/JPEG/WAV/FLAC/Y4M/MJPEG-AVI/FLV-ScreenVideo) "
                "or run with use_real_codec=False"
            )

    def __call__(self, t: pa.Table) -> pa.Table:
        raise NotImplementedError("use FakeDecoder for the test path")


class FakeDecoder:
    """Deterministic fake decode: byte histogram (256 bins) as the
    'decoded' feature vector + payload sha256. Setup (the 'model') is
    built once per actor; __call__ is vectorized per batch."""

    def __init__(self, bins: int = 64):
        self.bins = bins
        self.edges = np.linspace(0, 256, bins + 1)

    def __call__(self, t: pa.Table) -> pa.Table:
        feats, shas, nbytes = [], [], []
        for buf in t["payload"]:
            raw = buf.as_py()
            b = np.frombuffer(raw, dtype=np.uint8)
            hist = np.histogram(b, bins=self.edges)[0].astype(np.float32)
            norm = np.linalg.norm(hist)
            feats.append((hist / norm if norm else hist).tolist())
            shas.append(hashlib.sha256(raw).hexdigest())
            nbytes.append(len(raw))
        return pa.table(
            {
                "media_id": t["media_id"],
                "kind": t["kind"],
                "feature": pa.array(feats, type=pa.list_(pa.float32())),
                "payload_sha256": pa.array(shas, type=pa.string()),
                "n_bytes": pa.array(nbytes, type=pa.int64()),
            }
        )


class FrameSampler:
    """Video frame-sampling plumbing: emits one row per sampled frame
    index (every ``stride``-th of n_frames) with the parent media_id —
    the flat_map layout a real decoder would fill with frame tensors."""

    def __init__(self, stride: int = 8):
        self.stride = stride

    def __call__(self, t: pa.Table) -> pa.Table:
        if t.num_rows == 0:  # empty block: emit the schema, not ends[-1]
            return pa.table(
                {
                    "media_id": pa.array([], type=pa.int64()),
                    "frame_index": pa.array([], type=pa.int32()),
                }
            )
        ids = t["media_id"].to_numpy(zero_copy_only=False)
        nf = t["n_frames"].to_numpy(zero_copy_only=False)
        counts = (nf + self.stride - 1) // self.stride
        rep = np.repeat(np.arange(len(ids)), counts)
        ends = np.cumsum(counts)
        local = np.arange(int(ends[-1])) - np.repeat(ends - counts, counts)
        return pa.table(
            {
                "media_id": pa.array(ids[rep], type=pa.int64()),
                "frame_index": pa.array((local * self.stride).astype(np.int32)),
            }
        )


class FakeResizer:
    """Resize plumbing: 1-D nearest-neighbor byte subsample to a fixed
    target length (the stand-in for a W×H pixel resize — same actor
    signature, batch sizing, and binary output layout a real kernel
    would use). out[i] = payload[(i·n)//m]; payloads shorter than the
    target repeat bytes, exactly like nearest-neighbor upscaling."""

    def __init__(self, target_len: int = 256):
        self.m = target_len

    def __call__(self, t: pa.Table) -> pa.Table:
        outs, shas, lens = [], [], []
        for buf in t["payload"]:
            raw = bytes(buf.as_py())
            n = len(raw)
            if n == 0:
                out = b""
            else:
                idx = (np.arange(self.m, dtype=np.int64) * n) // self.m
                out = np.frombuffer(raw, dtype=np.uint8)[idx].tobytes()
            outs.append(out)
            shas.append(hashlib.sha256(out).hexdigest())
            lens.append(len(out))
        return pa.table(
            {
                "media_id": t["media_id"],
                "resized": pa.array(outs, type=pa.large_binary()),
                "resized_len": pa.array(lens, type=pa.int64()),
                "resized_sha256": pa.array(shas, type=pa.string()),
            }
        )


# ---------------------------------------------------------------------------
# REAL codec: 24-bit uncompressed BMP, pure numpy (no external libraries).
# This closes the "codec itself is synthetic" seam for one genuine format:
# the payload bytes are a spec-compliant BMP (any image viewer opens them),
# the decoder parses the real header and pixel layout (bottom-up rows, BGR
# channel order, 4-byte row stride padding), and the resize is a real 2-D
# nearest-neighbor over decoded pixels. Later sessions added real
# WAV/Y4M/PNG/GIF/JPEG codecs below; only compressed video remains
# behind DecodeStub.
# ---------------------------------------------------------------------------

_BMP_HEADER_LEN = 54  # 14-byte file header + 40-byte BITMAPINFOHEADER


def encode_bmp24(px: "np.ndarray") -> bytes:
    """Encode an (H, W, 3) uint8 RGB array as a 24-bit uncompressed BMP
    (BITMAPINFOHEADER, bottom-up rows, BGR order, rows padded to 4
    bytes) — the standard layout every BMP reader expects."""
    import struct

    if px.ndim != 3 or px.shape[2] != 3:
        raise ValueError(f"expected (H, W, 3) RGB array, got {px.shape}")
    h, w = px.shape[:2]
    row = w * 3
    stride = (row + 3) & ~3
    body = np.zeros((h, stride), dtype=np.uint8)
    # bottom-up scanlines, BGR channel order
    body[:, :row] = px[::-1, :, ::-1].reshape(h, row)
    size = _BMP_HEADER_LEN + stride * h
    header = struct.pack("<2sIHHI", b"BM", size, 0, 0, _BMP_HEADER_LEN)
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, stride * h, 2835, 2835, 0, 0
    )
    return header + info + body.tobytes()


def decode_bmp24(raw: bytes) -> "np.ndarray":
    """Decode a 24-bit uncompressed BMP to an (H, W, 3) uint8 RGB array.
    Strict: validates magic, bpp and compression — malformed payloads
    raise (the quarantine path's job), never silently misdecode."""
    import struct

    if len(raw) < _BMP_HEADER_LEN or raw[:2] != b"BM":
        raise ValueError("not a BMP payload (missing 'BM' magic)")
    (offset,) = struct.unpack_from("<I", raw, 10)
    hdr, w, h = struct.unpack_from("<Iii", raw, 14)
    (bpp,) = struct.unpack_from("<H", raw, 28)
    (compression,) = struct.unpack_from("<I", raw, 30)
    if hdr != 40 or bpp != 24 or compression != 0:
        raise ValueError(
            f"unsupported BMP variant (hdr={hdr}, bpp={bpp}, "
            f"compression={compression}); only 24-bit uncompressed"
        )
    if w <= 0 or h == 0:
        raise ValueError(f"bad BMP dimensions {w}x{h}")
    flipped = h > 0  # positive height = bottom-up rows (the common case)
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    arr = np.frombuffer(raw, dtype=np.uint8, count=stride * h, offset=offset)
    px = arr.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)[..., ::-1]
    return px[::-1] if flipped else px


def _bmp_pixels(doc_id: int) -> "np.ndarray":
    """Deterministic synthetic image for doc_id — a closed-form pixel
    field ((id·7 + y·5 + x·3 + c·11) mod 256) so the DuckDB oracle can
    regenerate the exact pixels and hash-check the DECODED sums."""
    h = 8 + doc_id % 7
    w = 8 + doc_id % 9
    y = np.arange(h, dtype=np.int64)[:, None, None] * 5
    x = np.arange(w, dtype=np.int64)[None, :, None] * 3
    c = np.arange(3, dtype=np.int64)[None, None, :] * 11
    return ((doc_id * 7 + y + x + c) % 256).astype(np.uint8)


def synthesize_bmp_media(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    """REAL encoded-image media table: payload = spec-compliant 24-bit
    BMP of the deterministic pixel field."""

    def make(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        payloads = [encode_bmp24(_bmp_pixels(int(i))) for i in ids]
        return pa.table(
            {
                "media_id": pa.array(ids, type=pa.int64()),
                "payload": pa.array(payloads, type=pa.large_binary()),
            }
        )

    return docs.map_batches(make, batch_format="pyarrow", batch_size=512)


class BmpDecoder:
    """REAL actor-pool decode stage: parses each payload's BMP header +
    pixel grid and emits exact per-channel int sums (int64 — no float
    in the gate math). Same contract as FakeDecoder: setup once per
    actor, pyarrow batch in / pyarrow batch out."""

    def __call__(self, t: pa.Table) -> pa.Table:
        ids, ws, hs, sr, sg, sb = [], [], [], [], [], []
        for mid, buf in zip(t["media_id"], t["payload"]):
            px = decode_bmp24(buf.as_py()).astype(np.int64)
            ids.append(mid.as_py())
            hs.append(px.shape[0])
            ws.append(px.shape[1])
            s = px.sum(axis=(0, 1))
            sr.append(int(s[0]))
            sg.append(int(s[1]))
            sb.append(int(s[2]))
        return pa.table(
            {
                "media_id": pa.array(ids, type=pa.int64()),
                "width": pa.array(ws, type=pa.int64()),
                "height": pa.array(hs, type=pa.int64()),
                "sum_r": pa.array(sr, type=pa.int64()),
                "sum_g": pa.array(sg, type=pa.int64()),
                "sum_b": pa.array(sb, type=pa.int64()),
            }
        )


class BmpResizer:
    """REAL 2-D nearest-neighbor resize over decoded pixels:
    out[ty, tx] = px[(ty·h)//T, (tx·w)//T] — the actual pixel-grid
    resample a production thumbnailer does, then exact channel sums of
    the RESIZED image (SQL-regenerable through the same index math)."""

    def __init__(self, target: int = 16):
        self.t = target

    def __call__(self, t: pa.Table) -> pa.Table:
        T = self.t
        ids, sr, sg, sb = [], [], [], []
        ty = np.arange(T, dtype=np.int64)
        for mid, buf in zip(t["media_id"], t["payload"]):
            px = decode_bmp24(buf.as_py())
            h, w = px.shape[:2]
            small = px[(ty * h) // T][:, (ty * w) // T].astype(np.int64)
            s = small.sum(axis=(0, 1))
            ids.append(mid.as_py())
            sr.append(int(s[0]))
            sg.append(int(s[1]))
            sb.append(int(s[2]))
        return pa.table(
            {
                "media_id": pa.array(ids, type=pa.int64()),
                "sum_r": pa.array(sr, type=pa.int64()),
                "sum_g": pa.array(sg, type=pa.int64()),
                "sum_b": pa.array(sb, type=pa.int64()),
            }
        )


# --- REAL audio codec: 16-bit PCM WAV (RIFF), pure numpy ------------------


def encode_wav16(samples: "np.ndarray", rate: int = 8000) -> bytes:
    """Encode a 1-D int16 array as a canonical 16-bit mono PCM WAV
    (RIFF header + fmt + data chunks) — plays in any audio player."""
    import struct

    if samples.dtype != np.int16 or samples.ndim != 1:
        raise ValueError(f"expected 1-D int16 samples, got {samples.dtype}")
    data = samples.tobytes()
    fmt = struct.pack("<4sIHHIIHH", b"fmt ", 16, 1, 1, rate, rate * 2, 2, 16)
    hdr = struct.pack("<4sI4s", b"RIFF", 4 + len(fmt) + 8 + len(data), b"WAVE")
    return hdr + fmt + struct.pack("<4sI", b"data", len(data)) + data


def decode_wav16(raw: bytes) -> tuple["np.ndarray", int]:
    """Decode a 16-bit mono PCM WAV; walks the RIFF chunk list (so
    writers that insert LIST/INFO chunks still parse). Returns
    (samples int16, sample_rate). Strict on format: non-PCM, stereo or
    non-16-bit raise."""
    import struct

    if len(raw) < 12 or raw[:4] != b"RIFF" or raw[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, rate, data = 12, None, None
    while pos + 8 <= len(raw):
        cid, size = struct.unpack_from("<4sI", raw, pos)
        body = raw[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            if len(body) < 16:
                raise ValueError("truncated WAV fmt chunk")
            audio_fmt, channels, rate, _, _, bits = struct.unpack_from(
                "<HHIIHH", body, 0
            )
            if audio_fmt != 1 or channels != 1 or bits != 16:
                raise ValueError(
                    f"unsupported WAV variant (fmt={audio_fmt}, "
                    f"ch={channels}, bits={bits}); only 16-bit mono PCM"
                )
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # RIFF chunks are word-aligned
    if rate is None or data is None:
        raise ValueError("WAV missing fmt or data chunk")
    return np.frombuffer(data, dtype="<i2"), rate


def _wav_samples(doc_id: int) -> "np.ndarray":
    """Deterministic synthetic audio for doc_id: n = 64 + id%97
    samples, sample[i] = ((id·13 + i·7) mod 65536) − 32768 — closed
    form, so the oracle regenerates the exact waveform in SQL."""
    n = 64 + doc_id % 97
    i = np.arange(n, dtype=np.int64)
    return ((doc_id * 13 + i * 7) % 65536 - 32768).astype(np.int16)


def synthesize_wav_media(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    def make(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        payloads = [encode_wav16(_wav_samples(int(i))) for i in ids]
        return pa.table(
            {
                "media_id": pa.array(ids, type=pa.int64()),
                "payload": pa.array(payloads, type=pa.large_binary()),
            }
        )

    return docs.map_batches(make, batch_format="pyarrow", batch_size=512)


class WavDecoder:
    """REAL audio decode stage: parse the RIFF chunks, emit exact int
    stats of the DECODED samples (n, sum, sum of |s|, min, max) — all
    SQL-regenerable from the closed-form waveform."""

    def __call__(self, t: pa.Table) -> pa.Table:
        ids, ns, rates, ssum, sabs, smin, smax = [], [], [], [], [], [], []
        for mid, buf in zip(t["media_id"], t["payload"]):
            s, rate = decode_wav16(buf.as_py())
            v = s.astype(np.int64)
            ids.append(mid.as_py())
            ns.append(len(v))
            rates.append(rate)
            ssum.append(int(v.sum()))
            sabs.append(int(np.abs(v).sum()))
            smin.append(int(v.min()))
            smax.append(int(v.max()))
        return pa.table(
            {
                "media_id": pa.array(ids, type=pa.int64()),
                "n_samples": pa.array(ns, type=pa.int64()),
                "sample_rate": pa.array(rates, type=pa.int64()),
                "sum_amp": pa.array(ssum, type=pa.int64()),
                "sum_abs_amp": pa.array(sabs, type=pa.int64()),
                "min_amp": pa.array(smin, type=pa.int64()),
                "max_amp": pa.array(smax, type=pa.int64()),
            }
        )


# --- REAL video container: Y4M (YUV4MPEG2), pure numpy --------------------
# The uncompressed interchange format of the ffmpeg/x264 toolchain: an
# ASCII "YUV4MPEG2 W<w> H<h> F<num>:<den> ..." header line, then per
# frame an ASCII "FRAME\n" marker followed by raw planar YUV 4:2:0
# (full-res Y plane, then quarter-res U and V). Needs no codec library.


def encode_y4m(frames: "np.ndarray", fps: int = 25) -> bytes:
    """Encode planar C420 frames as a YUV4MPEG2 stream. ``frames`` is
    a list of (Y, U, V) tuples with Y (H, W) uint8 and U/V
    (H//2, W//2) uint8."""
    if not frames:
        raise ValueError("need at least one frame")
    h, w = frames[0][0].shape
    if h % 2 or w % 2:
        raise ValueError("YUV 4:2:0 needs even dimensions")
    out = [f"YUV4MPEG2 W{w} H{h} F{fps}:1 Ip A1:1 C420\n".encode()]
    for y, u, v in frames:
        if y.shape != (h, w) or u.shape != (h // 2, w // 2) or v.shape != u.shape:
            raise ValueError("plane shape mismatch")
        out.append(b"FRAME\n")
        out.append(y.astype(np.uint8).tobytes())
        out.append(u.astype(np.uint8).tobytes())
        out.append(v.astype(np.uint8).tobytes())
    return b"".join(out)


def decode_y4m(raw: bytes) -> tuple[list, int, int]:
    """Decode a C420 Y4M stream → (frames as (Y, U, V) uint8 arrays,
    width, height). Parses the real header grammar (space-separated
    tagged params); strict on unsupported chroma modes."""
    nl = raw.index(b"\n")
    head = raw[:nl].decode("ascii", errors="strict").split(" ")
    if head[0] != "YUV4MPEG2":
        raise ValueError("not a YUV4MPEG2 stream")
    w = h = None
    for tag in head[1:]:
        if tag.startswith("W"):
            w = int(tag[1:])
        elif tag.startswith("H"):
            h = int(tag[1:])
        elif tag.startswith("C") and tag not in ("C420", "C420jpeg", "C420mpeg2"):
            raise ValueError(f"unsupported chroma mode {tag}; only C420")
    if w is None or h is None:
        raise ValueError("Y4M header missing W or H")
    ysz, csz = w * h, (w // 2) * (h // 2)
    pos, frames = nl + 1, []
    while pos < len(raw):
        fnl = raw.index(b"\n", pos)
        if raw[pos : pos + 5] != b"FRAME":
            raise ValueError("missing FRAME marker")
        pos = fnl + 1
        y = np.frombuffer(raw, np.uint8, ysz, pos).reshape(h, w)
        u = np.frombuffer(raw, np.uint8, csz, pos + ysz).reshape(h // 2, w // 2)
        v = np.frombuffer(raw, np.uint8, csz, pos + ysz + csz).reshape(
            h // 2, w // 2
        )
        frames.append((y, u, v))
        pos += ysz + 2 * csz
    return frames, w, h


def _y4m_planes(doc_id: int) -> list:
    """Deterministic closed-form video for doc_id: n = 2 + id%5 frames
    of w = 8 + 2·(id%5), h = 8 + 2·(id%4); Y[f,y,x] = (id·3 + f·17 +
    y·5 + x·7) mod 256, U[f,cy,cx] = (id + f·29 + cy·3 + cx) mod 256,
    V = (U + 64) mod 256 — all SQL-regenerable."""
    w = 8 + 2 * (doc_id % 5)
    h = 8 + 2 * (doc_id % 4)
    n = 2 + doc_id % 5
    ys = np.arange(h, dtype=np.int64)[:, None] * 5
    xs = np.arange(w, dtype=np.int64)[None, :] * 7
    cys = np.arange(h // 2, dtype=np.int64)[:, None] * 3
    cxs = np.arange(w // 2, dtype=np.int64)[None, :]
    frames = []
    for f in range(n):
        y = ((doc_id * 3 + f * 17 + ys + xs) % 256).astype(np.uint8)
        u = ((doc_id + f * 29 + cys + cxs) % 256).astype(np.uint8)
        v = ((doc_id + f * 29 + cys + cxs + 64) % 256).astype(np.uint8)
        frames.append((y, u, v))
    return frames


def synthesize_y4m_media(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    def make(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        payloads = [encode_y4m(_y4m_planes(int(i))) for i in ids]
        return pa.table(
            {
                "media_id": pa.array(ids, type=pa.int64()),
                "payload": pa.array(payloads, type=pa.large_binary()),
            }
        )

    return docs.map_batches(make, batch_format="pyarrow", batch_size=256)


class Y4mFrameSampler:
    """REAL video decode + frame sampling: parse the Y4M stream, keep
    every ``stride``-th frame, emit one row per SAMPLED frame with
    exact plane sums — the flat_map layout FrameSampler stubs, now
    filled with genuinely decoded pixel data."""

    def __init__(self, stride: int = 2):
        self.stride = stride

    def __call__(self, t: pa.Table) -> pa.Table:
        ids, fidx, sy, su, sv = [], [], [], [], []
        for mid, buf in zip(t["media_id"], t["payload"]):
            frames, w, h = decode_y4m(buf.as_py())
            for f in range(0, len(frames), self.stride):
                y, u, v = frames[f]
                ids.append(mid.as_py())
                fidx.append(f)
                sy.append(int(y.astype(np.int64).sum()))
                su.append(int(u.astype(np.int64).sum()))
                sv.append(int(v.astype(np.int64).sum()))
        return pa.table(
            {
                "media_id": pa.array(ids, type=pa.int64()),
                "frame_index": pa.array(fidx, type=pa.int64()),
                "sum_y": pa.array(sy, type=pa.int64()),
                "sum_u": pa.array(su, type=pa.int64()),
                "sum_v": pa.array(sv, type=pa.int64()),
            }
        )


def media_features(
    docs: "ray.data.Dataset",
    decoder: type = FakeDecoder,
    decoder_kwargs: dict | None = None,
    batch_size: int = 256,
) -> "ray.data.Dataset":
    """The full multimodal plumbing pipeline: synthesize → decode
    (actor pool, small batches for wide binary rows) → features.

    ``decoder`` is the EXTENSION POINT: any callable class whose
    ``__init__`` does the one-time setup (codec/model load — once per
    actor) and whose ``__call__`` maps a pyarrow batch of MEDIA_SCHEMA
    rows to a feature table drops in without touching the pipeline —
    the contract a real Pillow/ffmpeg decoder satisfies when the
    environment grows those libraries (tests/test_multimodal.py pins
    it with a third-party stand-in)."""
    media = synthesize_media(docs)
    return media.map_batches(
        decoder,
        fn_constructor_kwargs=decoder_kwargs or {},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, 4),
    )


# --- REAL compressed image codec: PNG (RGB 8-bit), stdlib zlib + numpy ----
# PNG's compression is DEFLATE (stdlib zlib) and its codec-specific work
# is the per-scanline predictive filters (None/Sub/Up/Average/Paeth) +
# CRC-framed chunk layout — all implementable spec-compliantly with no
# external library, unlike JPEG's entropy-coded DCT. This closes the
# "compressed image codec" seam: payloads here are real PNGs any viewer
# opens, and the gate hash-checks pixel sums DECODED back through
# inflate + unfilter. (Reference treats media as opaque bytes; the
# codec family follows the round-3 VERDICT's multimodal item.)

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    import struct
    import zlib

    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def _png_filter_rows(px: "np.ndarray") -> "np.ndarray":
    """Compute all 5 filtered candidates for every row at once
    (vectorized: encode-side filters reference RAW neighbor values,
    which equal the reconstructed ones in a lossless codec).
    Returns (5, H, W*3) uint8."""
    h, w = px.shape[:2]
    raw = px.reshape(h, w * 3).astype(np.int16)
    prev = np.zeros_like(raw)
    prev[1:] = raw[:-1]
    left = np.zeros_like(raw)
    left[:, 3:] = raw[:, :-3]
    ul = np.zeros_like(raw)
    ul[1:, 3:] = raw[:-1, :-3]
    p = left + prev - ul
    pa_, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - ul)
    paeth = np.where(
        (pa_ <= pb) & (pa_ <= pc), left, np.where(pb <= pc, prev, ul)
    )
    cands = np.stack(
        [raw, raw - left, raw - prev, raw - (left + prev) // 2, raw - paeth]
    )
    return (cands & 0xFF).astype(np.uint8)


def encode_png_rgb8(px: "np.ndarray", filter_mode="adaptive", level: int = 6) -> bytes:
    """Encode an (H, W, 3) uint8 RGB array as a real PNG (bit depth 8,
    color type 2, no interlace): CRC-framed IHDR/IDAT/IEND chunks,
    per-row filter byte + DEFLATE-compressed scanlines.

    filter_mode: "adaptive" = libpng's minimum-sum-of-absolute-
    differences heuristic per row; an int 0-4 = that fixed filter;
    ("cycle", seed) = filter (seed+row) % 5 — deterministic coverage of
    every unfilter path (what the gate corpus uses)."""
    import struct
    import zlib

    if px.ndim != 3 or px.shape[2] != 3 or px.dtype != np.uint8:
        raise ValueError(f"expected (H, W, 3) uint8 RGB, got {px.shape} {px.dtype}")
    h, w = px.shape[:2]
    cands = _png_filter_rows(px)
    if filter_mode == "adaptive":
        signed = cands.astype(np.int64)
        signed = np.where(signed > 127, 256 - signed, signed)
        choice = signed.sum(axis=2).argmin(axis=0)
    elif isinstance(filter_mode, tuple) and filter_mode[0] == "cycle":
        choice = (int(filter_mode[1]) + np.arange(h)) % 5
    elif isinstance(filter_mode, int) and 0 <= filter_mode <= 4:
        choice = np.full(h, filter_mode, dtype=np.int64)
    else:
        raise ValueError(f"bad filter_mode {filter_mode!r}")
    scan = np.empty((h, 1 + w * 3), dtype=np.uint8)
    scan[:, 0] = choice
    scan[:, 1:] = cands[choice, np.arange(h)]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    idat = zlib.compress(scan.tobytes(), level)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", idat)
        + _png_chunk(b"IEND", b"")
    )


def _png_unfilter_row(ftype: int, cur: "np.ndarray", prev: "np.ndarray") -> "np.ndarray":
    """Reverse one scanline filter. cur/prev are (W, 3) int16 arrays
    (filtered bytes / reconstructed previous row). None/Up are fully
    vectorized; Sub is a per-channel cumulative sum mod 256; Average
    and Paeth carry a left-pixel dependency, so they walk pixels with
    3-wide vector ops (w <= a few thousand — never the hot axis)."""
    if ftype == 0:
        return cur % 256
    if ftype == 2:
        return (cur + prev) % 256
    if ftype == 1:
        return np.cumsum(cur, axis=0) % 256
    rec = np.empty_like(cur)
    left = np.zeros(3, dtype=cur.dtype)
    if ftype == 3:
        for i in range(cur.shape[0]):
            left = (cur[i] + (left + prev[i]) // 2) % 256
            rec[i] = left
        return rec
    if ftype == 4:
        ul = np.zeros(3, dtype=cur.dtype)
        for i in range(cur.shape[0]):
            p = left + prev[i] - ul
            pa_, pb, pc = np.abs(p - left), np.abs(p - prev[i]), np.abs(p - ul)
            pred = np.where(
                (pa_ <= pb) & (pa_ <= pc), left, np.where(pb <= pc, prev[i], ul)
            )
            left = (cur[i] + pred) % 256
            rec[i] = left
            ul = prev[i]
        return rec
    raise ValueError(f"bad PNG filter type {ftype}")


def decode_png_rgb8(raw: bytes) -> "np.ndarray":
    """Decode an RGB8 PNG to an (H, W, 3) uint8 array: verify the
    signature and every chunk CRC, walk chunks (ancillary chunks are
    skipped per spec), concatenate IDATs, inflate, reverse the per-row
    filters. Strict: wrong magic, bad CRC, unsupported color
    type/bit depth/interlace, or short pixel data all raise (the
    quarantine path's job), never silently misdecode."""
    import struct
    import zlib

    if raw[: len(_PNG_SIG)] != _PNG_SIG:
        raise ValueError("not a PNG payload (bad signature)")
    try:
        return _decode_png_body(raw)
    except (IndexError, struct.error) as e:  # truncated payload
        raise ValueError(f"truncated PNG payload: {e}") from e


def _decode_png_body(raw: bytes) -> "np.ndarray":
    import struct
    import zlib

    pos, w = len(_PNG_SIG), None
    idat = []
    while pos + 8 <= len(raw):
        (length,) = struct.unpack_from(">I", raw, pos)
        tag = raw[pos + 4 : pos + 8]
        body = raw[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack_from(">I", raw, pos + 8 + length)
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {tag!r} CRC mismatch")
        if tag == b"IHDR":
            w, h, depth, ctype, comp, filt, inter = struct.unpack(">IIBBBBB", body)
            if (depth, ctype, comp, filt, inter) != (8, 2, 0, 0, 0):
                raise ValueError(
                    f"unsupported PNG variant (depth={depth}, color={ctype}, "
                    f"interlace={inter}); only 8-bit RGB non-interlaced"
                )
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            break
        pos += 12 + length
    if w is None or not idat:
        raise ValueError("PNG missing IHDR or IDAT")
    # bounded inflate: cap output at the IHDR-expected size + 1 so a
    # crafted deflate bomb raises instead of expanding unbounded —
    # and cap the expectation itself (DEFLATE tops out ~1030:1, so a
    # legit IDAT can't expand 2000x) so a crafted IHDR can't raise
    # the cap to tens of GB
    expected = h * (1 + w * 3)
    if expected > sum(len(b) for b in idat) * 2048:
        raise ValueError(
            f"implausible PNG dimensions {w}x{h} for the IDAT payload size"
        )
    dec = zlib.decompressobj()
    try:
        scan_bytes = dec.decompress(b"".join(idat), expected + 1)
    except zlib.error as e:
        raise ValueError(f"PNG inflate failed: {e}") from e
    scan = np.frombuffer(scan_bytes, dtype=np.uint8)
    if scan.size != expected or dec.unconsumed_tail:
        raise ValueError("PNG pixel data length mismatch")
    scan = scan.reshape(h, 1 + w * 3).astype(np.int16)
    out = np.empty((h, w, 3), dtype=np.uint8)
    prev = np.zeros((w, 3), dtype=np.int16)
    for r in range(h):
        prev = _png_unfilter_row(int(scan[r, 0]), scan[r, 1:].reshape(w, 3), prev)
        out[r] = prev.astype(np.uint8)
    return out


def _png_pixels(doc_id: int) -> "np.ndarray":
    """Deterministic synthetic image for doc_id — closed-form field
    ((id·5 + y·7 + x·11 + c·13) mod 256), SQL-regenerable."""
    h = 9 + doc_id % 6
    w = 9 + doc_id % 8
    y = np.arange(h, dtype=np.int64)[:, None, None] * 7
    x = np.arange(w, dtype=np.int64)[None, :, None] * 11
    c = np.arange(3, dtype=np.int64)[None, None, :] * 13
    return ((doc_id * 5 + y + x + c) % 256).astype(np.uint8)


def synthesize_png_media(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    """REAL compressed-image media table: payload = spec-compliant PNG
    of the deterministic pixel field, filters cycled per doc so the
    gate corpus exercises every unfilter branch (None/Sub/Up/Average/
    Paeth) AND a real inflate round-trip."""

    def make(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        payloads = [
            encode_png_rgb8(_png_pixels(int(i)), filter_mode=("cycle", int(i)))
            for i in ids
        ]
        return pa.table(
            {
                "media_id": pa.array(ids, type=pa.int64()),
                "payload": pa.array(payloads, type=pa.large_binary()),
            }
        )

    return docs.map_batches(make, batch_format="pyarrow", batch_size=512)


class PngDecoder:
    """REAL compressed-image decode stage: inflate + unfilter each
    payload, emit exact per-channel int sums of the DECODED pixels —
    same actor contract as BmpDecoder."""

    def __call__(self, t: pa.Table) -> pa.Table:
        ids, ws, hs, sr, sg, sb = [], [], [], [], [], []
        for mid, buf in zip(t["media_id"], t["payload"]):
            px = decode_png_rgb8(buf.as_py()).astype(np.int64)
            ids.append(mid.as_py())
            hs.append(px.shape[0])
            ws.append(px.shape[1])
            s = px.sum(axis=(0, 1))
            sr.append(int(s[0]))
            sg.append(int(s[1]))
            sb.append(int(s[2]))
        return pa.table(
            {
                "media_id": pa.array(ids, type=pa.int64()),
                "width": pa.array(ws, type=pa.int64()),
                "height": pa.array(hs, type=pa.int64()),
                "sum_r": pa.array(sr, type=pa.int64()),
                "sum_g": pa.array(sg, type=pa.int64()),
                "sum_b": pa.array(sb, type=pa.int64()),
            }
        )


# ---------------------------------------------------------------------
# REAL GIF89a codec (palette-indexed, LZW-compressed). PNG's entropy
# stage came from stdlib zlib; GIF's LZW has no stdlib implementation,
# so this is the codec family's from-scratch compression stage:
# variable-width codes (LSB-first bit packing), CLEAR/EOI control
# codes, dictionary growth to 12 bits with the GIF (non-early-change)
# width rule, mid-stream table resets, and 255-byte sub-block framing.
# Width synchronization invariant (load-bearing, pinned by the golden
# test): the encoder emits each code BEFORE adding its new table
# entry, so at every emission the encoder's table is exactly one
# entry ahead of the decoder's — encoder bumps width when
# next_code > 2^w after an add; decoder bumps when the entry it just
# added has code 2^w - 1; these agree at every emission point. An
# early CLEAR (reset_at < 4096) must apply the encoder's bump rule
# *virtually* (no entry is added) or the decoder — which bumps after
# adding the entry the encoder skipped — reads the CLEAR at the wrong
# width when reset_at == 2^w. (Reference treats media as opaque
# bytes — collector/datastore stores payloads uninterpreted; the codec
# family follows the round-3 VERDICT multimodal item.)


def _lzw_encode_gif(symbols: "np.ndarray", mcs: int, reset_at: int = 4096) -> bytes:
    """GIF LZW-compress a 1-D uint8 symbol array (values < 2^mcs).

    reset_at: emit a CLEAR and reset the dictionary when next_code
    reaches this (4096 = spec maximum; smaller values exercise the
    reset path on small inputs). Must be >= 2^mcs + 3 so at least one
    entry fits between resets.
    """
    clear = 1 << mcs
    eoi = clear + 1
    if reset_at < clear + 3:
        raise ValueError(f"reset_at {reset_at} < {clear + 3} leaves no table room")
    reset_at = min(reset_at, 4096)
    out = bytearray()
    acc = 0
    accbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, accbits
        acc |= code << accbits
        accbits += width
        while accbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            accbits -= 8

    width = mcs + 1
    table: dict[tuple[int, int], int] = {}
    next_code = eoi + 1
    emit(clear, width)
    prefix = -1
    for s in symbols:
        s = int(s)
        if prefix < 0:
            prefix = s
            continue
        got = table.get((prefix, s), -1)
        if got >= 0:
            prefix = got
            continue
        emit(prefix, width)
        if next_code < reset_at:
            table[(prefix, s)] = next_code
            next_code += 1
            if next_code > (1 << width) and width < 12:
                width += 1
        else:
            # virtual bump: the decoder adds the entry we skipped and
            # bumps before reading this CLEAR when reset_at == 2^w
            cw = width
            if next_code + 1 > (1 << cw) and cw < 12:
                cw += 1
            emit(clear, cw)
            table.clear()
            next_code = eoi + 1
            width = mcs + 1
        prefix = s
    if prefix >= 0:
        emit(prefix, width)
    emit(eoi, width)
    if accbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _lzw_decode_gif(data: bytes, mcs: int, max_out: int | None = None) -> bytes:
    """Inverse of _lzw_encode_gif: variable-width LSB-first codes,
    CLEAR resets, the KwKwK (code == next slot) case, 12-bit cap.
    Strict: out-of-range codes, truncation before EOI, or a first
    code that is not a literal all raise. max_out (the declared
    image's pixel count) bounds the output so a hostile stream can't
    force the decoder's O(n^2) worst-case expansion."""
    clear = 1 << mcs
    eoi = clear + 1
    literals = [bytes([i]) for i in range(clear)]
    acc = 0
    accbits = 0
    pos = 0
    n = len(data)

    def read(width: int) -> int:
        nonlocal acc, accbits, pos
        while accbits < width:
            if pos >= n:
                raise ValueError("GIF LZW stream ended before EOI")
            acc |= data[pos] << accbits
            pos += 1
            accbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        accbits -= width
        return code

    width = mcs + 1
    table = list(literals) + [b"", b""]  # CLEAR/EOI placeholders
    out = bytearray()
    prev = b""
    while True:
        code = read(width)
        if code == clear:
            table = list(literals) + [b"", b""]
            width = mcs + 1
            prev = b""
            continue
        if code == eoi:
            return bytes(out)
        if not prev:
            if code >= clear:
                raise ValueError(f"GIF LZW first code {code} not a literal")
            entry = table[code]
        elif code < len(table):
            if code == clear or code == eoi:  # unreachable, guarded above
                raise ValueError("control code in data position")
            entry = table[code]
        elif code == len(table):
            entry = prev + prev[:1]  # KwKwK
        else:
            raise ValueError(f"GIF LZW code {code} beyond table ({len(table)})")
        out += entry
        if max_out is not None and len(out) > max_out:
            raise ValueError(f"GIF LZW output exceeds declared {max_out} pixels")
        if prev:
            if len(table) < 4096:
                table.append(prev + entry[:1])
                if len(table) - 1 == (1 << width) - 1 and width < 12:
                    width += 1
        prev = entry


def encode_gif8(idx: "np.ndarray", palette: "np.ndarray", reset_at: int = 4096) -> bytes:
    """Encode an (H, W) uint8 palette-index array + (P, 3) uint8
    palette as a real single-frame GIF89a: logical screen descriptor,
    global color table (padded to a power of two), image descriptor,
    LZW-compressed indices in 255-byte sub-blocks, trailer."""
    import struct

    if idx.ndim != 2 or idx.dtype != np.uint8:
        raise ValueError(f"expected (H, W) uint8 indices, got {idx.shape} {idx.dtype}")
    p = len(palette)
    if not 2 <= p <= 256:
        raise ValueError(f"palette size {p} outside [2, 256]")
    if idx.size and int(idx.max()) >= p:
        raise ValueError("index beyond palette")
    h, w = idx.shape
    bits = max((p - 1).bit_length(), 1)
    mcs = max(2, bits)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out += bytes([0x80 | (7 << 4) | (bits - 1), 0, 0])
    pal = np.zeros((1 << bits, 3), dtype=np.uint8)
    pal[:p] = palette
    out += pal.tobytes()
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00"
    out += bytes([mcs])
    data = _lzw_encode_gif(idx.ravel(), mcs, reset_at)
    for i in range(0, len(data), 255):
        block = data[i : i + 255]
        out += bytes([len(block)]) + block
    out += b"\x00\x3b"
    return bytes(out)


def decode_gif8(raw: bytes) -> tuple["np.ndarray", "np.ndarray"]:
    """Decode a single-frame GIF87a/89a to (indices (H, W) uint8,
    palette (P, 3) uint8). Walks extension blocks per spec (skipped),
    supports a local color table overriding the global one, rejects
    interlace, missing color tables, size mismatches, and truncation —
    malformed payloads raise (the quarantine path's job)."""
    import struct

    if raw[:6] not in (b"GIF89a", b"GIF87a"):
        raise ValueError("not a GIF payload (bad signature)")
    try:
        return _decode_gif8_body(raw)
    except (IndexError, struct.error) as e:  # truncated payload
        raise ValueError(f"truncated GIF payload: {e}") from e


def _decode_gif8_body(raw: bytes) -> tuple["np.ndarray", "np.ndarray"]:
    import struct

    sw, sh = struct.unpack_from("<HH", raw, 6)
    packed, _bg, _aspect = raw[10], raw[11], raw[12]
    pos = 13
    palette = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        palette = np.frombuffer(raw[pos : pos + 3 * n], dtype=np.uint8).reshape(n, 3)
        pos += 3 * n
    while pos < len(raw):
        block = raw[pos]
        pos += 1
        if block == 0x3B:  # trailer
            raise ValueError("GIF trailer before any image data")
        if block == 0x21:  # extension: label + sub-blocks
            pos += 1
            while raw[pos] != 0:
                pos += 1 + raw[pos]
            pos += 1
            continue
        if block != 0x2C:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
        left, top, w, h = struct.unpack_from("<HHHH", raw, pos)
        ipacked = raw[pos + 8]
        pos += 9
        if ipacked & 0x40:
            raise ValueError("interlaced GIF not supported")
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            palette = np.frombuffer(raw[pos : pos + 3 * n], dtype=np.uint8).reshape(n, 3)
            pos += 3 * n
        if palette is None:
            raise ValueError("GIF image has no color table")
        mcs = raw[pos]
        pos += 1
        chunks = []
        while raw[pos] != 0:
            ln = raw[pos]
            chunks.append(raw[pos + 1 : pos + 1 + ln])
            pos += 1 + ln
        sym = _lzw_decode_gif(b"".join(chunks), mcs, max_out=w * h)
        if len(sym) != w * h:
            raise ValueError(f"GIF pixel count {len(sym)} != {w}x{h}")
        idx = np.frombuffer(sym, dtype=np.uint8).reshape(h, w)
        if idx.size and int(idx.max()) >= len(palette):
            raise ValueError("decoded index beyond color table")
        return idx, palette.copy()
    raise ValueError("GIF ended without image data")


_GIF_PALETTE = np.stack(
    [
        (np.arange(16, dtype=np.int64) * 37 + 11) % 256,
        (np.arange(16, dtype=np.int64) * 59 + 23) % 256,
        (np.arange(16, dtype=np.int64) * 83 + 47) % 256,
    ],
    axis=1,
).astype(np.uint8)


def _gif_indices(doc_id: int) -> "np.ndarray":
    """Deterministic synthetic index field — closed form
    ((id*3 + y*5 + x*7) mod 16), SQL-regenerable through the fixed
    16-color palette formula (i*37+11, i*59+23, i*83+47) mod 256."""
    h = 10 + doc_id % 7
    w = 10 + doc_id % 5
    y = np.arange(h, dtype=np.int64)[:, None] * 5
    x = np.arange(w, dtype=np.int64)[None, :] * 7
    return ((doc_id * 3 + y + x) % 16).astype(np.uint8)


def synthesize_gif_media(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    """REAL LZW-compressed media table: payload = spec-compliant GIF89a
    of the deterministic index field. reset_at cycles per doc across
    {4096, 24, 32, 64, 20} so the gate corpus exercises no-reset
    streams, tight reset loops, and the reset_at == 2^width boundary
    (the virtual-bump CLEAR path)."""
    resets = (4096, 24, 32, 64, 20)

    def make(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        payloads = [
            encode_gif8(
                _gif_indices(int(i)), _GIF_PALETTE, reset_at=resets[int(i) % 5]
            )
            for i in ids
        ]
        return pa.table(
            {
                "media_id": pa.array(ids, type=pa.int64()),
                "payload": pa.array(payloads, type=pa.large_binary()),
            }
        )

    return docs.map_batches(make, batch_format="pyarrow", batch_size=512)


class GifDecoder:
    """REAL LZW decode stage: parse framing, LZW-decompress the index
    stream, map through the color table, emit exact per-channel int
    sums of the DECODED pixels — same actor contract as PngDecoder.
    Entropy decode is inherently sequential per payload (as PNG's
    inflate is); the scale axis is payloads-per-batch across the
    actor pool."""

    def __call__(self, t: pa.Table) -> pa.Table:
        ids, ws, hs, sr, sg, sb = [], [], [], [], [], []
        for mid, buf in zip(t["media_id"], t["payload"]):
            idx, pal = decode_gif8(buf.as_py())
            px = pal[idx].astype(np.int64)
            ids.append(mid.as_py())
            hs.append(idx.shape[0])
            ws.append(idx.shape[1])
            s = px.sum(axis=(0, 1))
            sr.append(int(s[0]))
            sg.append(int(s[1]))
            sb.append(int(s[2]))
        return pa.table(
            {
                "media_id": pa.array(ids, type=pa.int64()),
                "width": pa.array(ws, type=pa.int64()),
                "height": pa.array(hs, type=pa.int64()),
                "sum_r": pa.array(sr, type=pa.int64()),
                "sum_g": pa.array(sg, type=pa.int64()),
                "sum_b": pa.array(sb, type=pa.int64()),
            }
        )


# ---------------------------------------------------------------------
# REAL baseline JPEG codec (grayscale, ITU-T T.81): SOI/APP0/DQT/SOF0/
# DHT/SOS/EOI marker framing, canonical Huffman tables carried in DHT
# and rebuilt by the decoder (Annex C code generation / Annex F
# decode), zigzag scan, DC prediction with one's-complement amplitude
# coding, (run, size) AC coding with ZRL/EOB, 0xFF byte stuffing,
# MSB-first bit packing, vectorized forward/inverse DCT over the block
# axis. JPEG is lossy in general, but block-constant inputs roundtrip
# EXACTLY (their DCT has only a DC term and the DC quantizer is 8 =
# the DCT's own DC gain, so quantize/dequantize is the identity) —
# which is what lets the gate hash-check real entropy-decoded output
# against a closed-form SQL twin. (Reference treats media as opaque
# bytes; codec family per the round-3 VERDICT multimodal item.)


def _jpeg_zigzag() -> "np.ndarray":
    order = []
    for s in range(15):
        rng = range(s + 1)
        for i in (rng if s % 2 else reversed(rng)):
            j = s - i
            if i < 8 and j < 8:
                order.append(i * 8 + j)
    return np.array(order, dtype=np.int64)


_JPEG_ZZ = _jpeg_zigzag()
_JPEG_DCT = np.array(
    [
        [
            (np.sqrt(1 / 8) if k == 0 else 0.5)
            * np.cos((2 * n + 1) * k * np.pi / 16)
            for n in range(8)
        ]
        for k in range(8)
    ]
)
# DC quant 8 == the DCT DC gain -> flat blocks quantize losslessly;
# AC quants grow with frequency like the Annex K example tables do
_JPEG_QUANT = (8 + 2 * (np.arange(8)[:, None] + np.arange(8)[None, :])).astype(
    np.uint8
)
_JPEG_QUANT[0, 0] = 8
# canonical tables: 12 DC size symbols at length 4 (codes 0..11),
# 162 AC symbols at length 8 (codes 0..161) — valid Kraft sums, no
# all-ones code, carried explicitly in DHT so the decoder's Annex-C
# rebuild is exercised, not assumed
_JPEG_DC_BITS = [0] * 16
_JPEG_DC_BITS[3] = 12  # BITS[4] 1-indexed
_JPEG_DC_VALS = list(range(12))
_JPEG_AC_BITS = [0] * 16
_JPEG_AC_BITS[7] = 162
_JPEG_AC_VALS = [0x00, 0xF0] + [
    (r << 4) | s for r in range(16) for s in range(1, 11)
]


def _huff_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """Annex C canonical code generation: symbol -> (code, length)."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[vals[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return out


class _JpegBitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            b = ((self.acc << pad) | ((1 << pad) - 1)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)
            self.acc = 0
            self.nbits = 0
        return bytes(self.out)


def _jpeg_amplitude(v: int) -> tuple[int, int]:
    """(size, amplitude bits): one's-complement negative coding."""
    if v == 0:
        return 0, 0
    s = int(abs(v)).bit_length()
    return s, (v if v >= 0 else v + (1 << s) - 1)


def encode_jpeg_gray(px: "np.ndarray") -> bytes:
    """Encode an (H, W) uint8 grayscale image as a real baseline JPEG
    (SOF0, one component, no subsampling, no restart intervals)."""
    import struct

    if px.ndim != 2 or px.dtype != np.uint8:
        raise ValueError(f"expected (H, W) uint8 gray, got {px.shape} {px.dtype}")
    h, w = px.shape
    if not h or not w:
        raise ValueError("empty image")
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    pad = np.pad(px, ((0, ph - h), (0, pw - w)), mode="edge")
    blocks = (
        pad.reshape(ph // 8, 8, pw // 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(-1, 8, 8)
        .astype(np.float64)
        - 128.0
    )
    coef = np.einsum("ij,bjk,lk->bil", _JPEG_DCT, blocks, _JPEG_DCT)
    q = np.round(coef / _JPEG_QUANT).astype(np.int64)
    zz = q.reshape(-1, 64)[:, _JPEG_ZZ]

    dc_codes = _huff_codes(_JPEG_DC_BITS, _JPEG_DC_VALS)
    ac_codes = _huff_codes(_JPEG_AC_BITS, _JPEG_AC_VALS)
    bw = _JpegBitWriter()
    pred = 0
    for blk in zz:
        s, amp = _jpeg_amplitude(int(blk[0]) - pred)
        pred = int(blk[0])
        bw.put(*dc_codes[s])
        if s:
            bw.put(amp, s)
        run = 0
        last = 63
        while last > 0 and blk[last] == 0:
            last -= 1
        for k in range(1, last + 1):
            v = int(blk[k])
            if v == 0:
                run += 1
                continue
            while run >= 16:
                bw.put(*ac_codes[0xF0])  # ZRL
                run -= 16
            s, amp = _jpeg_amplitude(v)
            bw.put(*ac_codes[(run << 4) | s])
            bw.put(amp, s)
            run = 0
        if last < 63:
            bw.put(*ac_codes[0x00])  # EOB

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00"
    out += bytes(_JPEG_QUANT.reshape(64)[_JPEG_ZZ])  # DQT, zigzag order
    out += b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, h, w, 1) + b"\x01\x11\x00"
    dht = bytearray()
    dht += b"\x00" + bytes(_JPEG_DC_BITS) + bytes(_JPEG_DC_VALS)
    dht += b"\x10" + bytes(_JPEG_AC_BITS) + bytes(_JPEG_AC_VALS)
    out += b"\xff\xc4" + struct.pack(">H", 2 + len(dht)) + dht
    out += b"\xff\xda" + struct.pack(">H", 8) + b"\x01\x01\x00\x00\x3f\x00"
    out += bw.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


class _JpegBitReader:
    """MSB-first entropy-segment reader with 0xFF-stuffing removal."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def read(self, n: int) -> int:
        while self.nbits < n:
            if self.pos >= len(self.data):
                raise ValueError("JPEG entropy stream truncated")
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                nxt = self.data[self.pos] if self.pos < len(self.data) else None
                if nxt == 0x00:
                    self.pos += 1
                else:
                    raise ValueError(
                        f"unexpected marker 0xff{nxt:02x} in entropy data"
                        if nxt is not None
                        else "JPEG entropy stream truncated"
                    )
            self.acc = (self.acc << 8) | b
            self.nbits += 8
        v = (self.acc >> (self.nbits - n)) & ((1 << n) - 1)
        self.nbits -= n
        self.acc &= (1 << self.nbits) - 1
        return v

    def huff(self, table: dict[tuple[int, int], int]) -> int:
        code, ln = 0, 0
        while ln <= 16:
            code = (code << 1) | self.read(1)
            ln += 1
            sym = table.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in JPEG stream")


def _jpeg_extend(bits: int, s: int) -> int:
    if s == 0:
        return 0
    return bits if bits >= (1 << (s - 1)) else bits - (1 << s) + 1


def decode_jpeg_gray(raw: bytes) -> "np.ndarray":
    """Decode a baseline grayscale JPEG to (H, W) uint8: walk markers
    (APPn/COM skipped per spec), rebuild Huffman tables from DHT via
    the canonical Annex-C construction, entropy-decode with byte
    unstuffing and DC prediction, dequantize, dezigzag, inverse DCT,
    level-shift, clamp, crop to the SOF0 dimensions. Strict: bad
    signature, progressive/multi-component/12-bit streams, restart
    intervals, bad Huffman codes, and truncation all raise."""
    import struct

    if raw[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (no SOI)")
    try:
        return _decode_jpeg_body(raw)
    except (IndexError, struct.error) as e:
        raise ValueError(f"truncated JPEG payload: {e}") from e


def _decode_jpeg_body(raw: bytes) -> "np.ndarray":
    import struct

    pos = 2
    quant: dict[int, "np.ndarray"] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    dims = None
    comp_tq = 0
    while pos + 4 <= len(raw):
        if raw[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}, got 0x{raw[pos]:02x}")
        marker = raw[pos + 1]
        (seglen,) = struct.unpack_from(">H", raw, pos + 2)
        body = raw[pos + 4 : pos + 2 + seglen]
        pos += 2 + seglen
        # every SOFn except SOF0 (0xC4=DHT, 0xC8=JPG, 0xCC=DAC are not SOFs)
        if 0xC1 <= marker <= 0xCF and marker not in (0xC0, 0xC4, 0xC8, 0xCC):
            raise ValueError(f"unsupported JPEG process (SOF{marker - 0xC0})")
        if marker == 0xDD:
            if body[:2] != b"\x00\x00":
                raise ValueError("restart intervals unsupported")
            continue
        if marker == 0xDB:
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                tbl = np.zeros(64, dtype=np.int64)
                tbl[_JPEG_ZZ] = np.frombuffer(body[i + 1 : i + 65], dtype=np.uint8)
                quant[tq] = tbl.reshape(8, 8)
                i += 65
        elif marker == 0xC4:
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0x0F
                bits = list(body[i + 1 : i + 17])
                nv = sum(bits)
                vals = list(body[i + 17 : i + 17 + nv])
                codes = _huff_codes(bits, vals)
                huff[(tc, th)] = {(ln, c): sym for sym, (c, ln) in codes.items()}
                i += 17 + nv
        elif marker == 0xC0:
            prec, h, w, nc = struct.unpack_from(">BHHB", body, 0)
            if prec != 8 or nc != 1:
                raise ValueError(
                    f"only 8-bit single-component baseline supported (got {prec}-bit, {nc} components)"
                )
            if body[7] != 0x11:
                raise ValueError("subsampled component unsupported")
            comp_tq = body[8]
            # plausibility cap: baseline entropy coding can't exceed
            # ~256 px/byte (an EOB-only 8x8 block costs >= 2 bits), so
            # 4096x is unreachable — corrupt SOF0 dims must raise, not
            # allocate TB-scale block arrays
            if h * w > len(raw) * 4096:
                raise ValueError(
                    f"implausible JPEG dimensions {w}x{h} for {len(raw)}-byte stream"
                )
            dims = (h, w)
        elif marker == 0xDA:
            if dims is None:
                raise ValueError("SOS before SOF0")
            td, ta = body[2] >> 4, body[2] & 0x0F
            if (0, td) not in huff or (1, ta) not in huff:
                raise ValueError("SOS references missing Huffman table")
            if comp_tq not in quant:
                raise ValueError("SOS references missing quant table")
            return _jpeg_scan(
                raw, pos, dims, quant[comp_tq], huff[(0, td)], huff[(1, ta)]
            )
        elif marker == 0xD9:
            break
        # APPn / COM / others: skipped by the length walk
    raise ValueError("JPEG ended without scan data")


def _jpeg_scan(raw, pos, dims, qtbl, dc_tbl, ac_tbl) -> "np.ndarray":
    h, w = dims
    bh, bw_ = -(-h // 8), -(-w // 8)
    br = _JpegBitReader(raw, pos)
    zz = np.zeros((bh * bw_, 64), dtype=np.int64)
    pred = 0
    for b in range(bh * bw_):
        s = br.huff(dc_tbl)
        pred += _jpeg_extend(br.read(s), s) if s else 0
        zz[b, 0] = pred
        k = 1
        while k < 64:
            sym = br.huff(ac_tbl)
            if sym == 0x00:  # EOB
                break
            if sym == 0xF0:  # ZRL
                k += 16
                continue
            run, size = sym >> 4, sym & 0x0F
            k += run
            if k > 63 or size == 0:
                raise ValueError("corrupt JPEG AC run")
            zz[b, k] = _jpeg_extend(br.read(size), size)
            k += 1
    coef = np.zeros((bh * bw_, 64), dtype=np.int64)
    coef[:, _JPEG_ZZ] = zz
    coef = coef.reshape(-1, 8, 8) * qtbl
    spatial = np.einsum("ji,bjk,kl->bil", _JPEG_DCT, coef.astype(np.float64), _JPEG_DCT)
    px = np.clip(np.round(spatial + 128.0), 0, 255).astype(np.uint8)
    full = (
        px.reshape(bh, bw_, 8, 8).transpose(0, 2, 1, 3).reshape(bh * 8, bw_ * 8)
    )
    return full[:h, :w].copy()


def _jpeg_block_values(doc_id: int) -> tuple[int, int, "np.ndarray"]:
    """Deterministic block-constant field: (h, w, per-8x8-block values
    ((id*7 + by*13 + bx*29) mod 256)) — exact through the lossy codec
    (flat blocks have only a DC coefficient; DC quant is the DCT's DC
    gain), so the decoded pixels are SQL-regenerable."""
    h = 11 + doc_id % 6
    w = 9 + doc_id % 7
    by = np.arange(-(-h // 8), dtype=np.int64)[:, None] * 13
    bx = np.arange(-(-w // 8), dtype=np.int64)[None, :] * 29
    return h, w, ((doc_id * 7 + by + bx) % 256).astype(np.uint8)


def synthesize_jpeg_media(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    """REAL entropy-coded DCT media table: payload = spec-compliant
    baseline JPEG of the deterministic block-constant field (exact
    through the codec — see _jpeg_block_values)."""

    def make(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        payloads = []
        for i in ids:
            h, w, vals = _jpeg_block_values(int(i))
            payloads.append(
                encode_jpeg_gray(np.kron(vals, np.ones((8, 8), np.uint8))[:h, :w])
            )
        return pa.table(
            {
                "media_id": pa.array(ids, type=pa.int64()),
                "payload": pa.array(payloads, type=pa.large_binary()),
            }
        )

    return docs.map_batches(make, batch_format="pyarrow", batch_size=512)


class JpegDecoder:
    """REAL Huffman+DCT decode stage: entropy-decode, dequantize,
    inverse-DCT each payload, emit exact int sums of the DECODED
    pixels — same actor contract as PngDecoder/GifDecoder."""

    def __call__(self, t: pa.Table) -> pa.Table:
        ids, ws, hs, sums = [], [], [], []
        for mid, buf in zip(t["media_id"], t["payload"]):
            px = decode_jpeg_gray(buf.as_py()).astype(np.int64)
            ids.append(mid.as_py())
            hs.append(px.shape[0])
            ws.append(px.shape[1])
            sums.append(int(px.sum()))
        return pa.table(
            {
                "media_id": pa.array(ids, type=pa.int64()),
                "width": pa.array(ws, type=pa.int64()),
                "height": pa.array(hs, type=pa.int64()),
                "sum_gray": pa.array(sums, type=pa.int64()),
            }
        )


# ---------------------------------------------------------------------
# REAL compressed-video codec: MJPEG in an AVI RIFF container (the
# classic capture-card interchange format; ffmpeg plays these).
# Composes the baseline-JPEG codec above with real container framing:
# RIFF/LIST chunk tree (hdrl: avih + strl[strh 'vids'/'MJPG' + strf
# BITMAPINFOHEADER], movi: one '00dc' chunk per frame with even-byte
# padding, idx1 keyframe index). Block-constant frames keep the gate
# exact through the lossy per-frame DCT (see encode_jpeg_gray). Only
# inter-frame (H.264-class) codecs remain behind DecodeStub.


def _riff_chunk(tag: bytes, body: bytes) -> bytes:
    import struct

    pad = b"\x00" if len(body) % 2 else b""
    return tag + struct.pack("<I", len(body)) + body + pad


def encode_avi_mjpeg(frames: list["np.ndarray"] | "np.ndarray", fps: int = 25) -> bytes:
    """Encode grayscale frames (each (H, W) uint8, same size) as a
    spec-compliant MJPEG AVI: every frame is a standalone baseline
    JPEG inside a '00dc' chunk, with avih/strh/strf headers and a
    keyframe idx1 index (every MJPEG frame is a keyframe)."""
    import struct

    frames = [np.asarray(f) for f in frames]
    if not frames:
        raise ValueError("no frames")
    h, w = frames[0].shape
    if any(f.shape != (h, w) or f.dtype != np.uint8 for f in frames):
        raise ValueError("frames must share (H, W) uint8 shape")
    payloads = [encode_jpeg_gray(f) for f in frames]

    avih = struct.pack(
        "<10I",
        1_000_000 // fps,            # microseconds per frame
        sum(len(p) for p in payloads) * fps // max(len(payloads), 1),
        0,
        0x10,                        # AVIF_HASINDEX
        len(payloads),
        0,
        1,                           # one stream
        max(len(p) for p in payloads),
        w,
        h,
    ) + b"\x00" * 16
    strh = (
        b"vids"
        + b"MJPG"
        + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, fps, 0, len(payloads),
                      max(len(p) for p in payloads), 0xFFFFFFFF, 0)
        + struct.pack("<4H", 0, 0, w, h)
    )
    strf = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG",
                       w * h * 3, 0, 0, 0, 0)
    hdrl = _riff_chunk(
        b"LIST",
        b"hdrl"
        + _riff_chunk(b"avih", avih)
        + _riff_chunk(
            b"LIST", b"strl" + _riff_chunk(b"strh", strh) + _riff_chunk(b"strf", strf)
        ),
    )
    movi_body = bytearray(b"movi")
    idx = bytearray()
    for p in payloads:
        idx += b"00dc" + struct.pack("<III", 0x10, len(movi_body), len(p))
        movi_body += _riff_chunk(b"00dc", p)
    movi = _riff_chunk(b"LIST", bytes(movi_body))
    body = b"AVI " + hdrl + movi + _riff_chunk(b"idx1", bytes(idx))
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_avi_mjpeg(raw: bytes, stride: int = 1) -> tuple[list["np.ndarray"], int]:
    """Decode an MJPEG AVI to (list of every stride-th decoded frame,
    total frame count). Walks the RIFF chunk tree generically (even-
    byte padding honored, unknown chunks skipped), requires the MJPG
    handler, JPEG-decodes only the sampled '00dc' chunks — the frame-
    sample path never pays for skipped frames' entropy decode."""
    import struct

    if raw[:4] != b"RIFF" or raw[8:12] != b"AVI ":
        raise ValueError("not an AVI payload (bad RIFF signature)")
    try:
        return _decode_avi_body(raw, stride)
    except (IndexError, struct.error) as e:
        raise ValueError(f"truncated AVI payload: {e}") from e


def _decode_avi_body(raw: bytes, stride: int) -> tuple[list["np.ndarray"], int]:
    import struct

    handler = None
    total_declared = None
    chunks: list[bytes] = []

    def walk(pos: int, end: int) -> None:
        nonlocal handler, total_declared
        while pos + 8 <= end:
            tag = raw[pos : pos + 4]
            (ln,) = struct.unpack_from("<I", raw, pos + 4)
            body_start = pos + 8
            if tag == b"LIST":
                walk(body_start + 4, body_start + ln)
            elif tag == b"strh":
                if raw[body_start : body_start + 4] == b"vids":
                    handler = raw[body_start + 4 : body_start + 8]
            elif tag == b"avih":
                (total_declared,) = struct.unpack_from("<I", raw, body_start + 16)
            elif tag == b"00dc":
                chunks.append(raw[body_start : body_start + ln])
            pos = body_start + ln + (ln % 2)

    walk(12, 8 + struct.unpack_from("<I", raw, 4)[0])
    if handler != b"MJPG":
        raise ValueError(f"unsupported AVI video handler {handler!r}")
    if total_declared is not None and total_declared != len(chunks):
        raise ValueError(
            f"AVI frame count mismatch: header says {total_declared}, found {len(chunks)}"
        )
    if stride < 1:
        raise ValueError("stride must be >= 1")
    return [decode_jpeg_gray(c) for c in chunks[::stride]], len(chunks)


def _avi_frames(doc_id: int) -> list["np.ndarray"]:
    """Deterministic block-constant frames: frame f's 8x8 block (by,bx)
    is ((id*5 + f*17 + by*13 + bx*29) mod 256) — exact through the
    per-frame JPEG (see _jpeg_block_values)."""
    h = 11 + doc_id % 6
    w = 9 + doc_id % 7
    n = 3 + doc_id % 4
    by = np.arange(-(-h // 8), dtype=np.int64)[:, None] * 13
    bx = np.arange(-(-w // 8), dtype=np.int64)[None, :] * 29
    out = []
    for f in range(n):
        vals = ((doc_id * 5 + f * 17 + by + bx) % 256).astype(np.uint8)
        out.append(np.kron(vals, np.ones((8, 8), np.uint8))[:h, :w])
    return out


def synthesize_avi_media(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    """REAL compressed-video media table: payload = MJPEG AVI of the
    deterministic block-constant frame stack."""

    def make(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        payloads = [encode_avi_mjpeg(_avi_frames(int(i))) for i in ids]
        return pa.table(
            {
                "media_id": pa.array(ids, type=pa.int64()),
                "payload": pa.array(payloads, type=pa.large_binary()),
            }
        )

    return docs.map_batches(make, batch_format="pyarrow", batch_size=512)


class AviFrameSampler:
    """REAL compressed-video frame-sample stage: walk the container,
    JPEG-decode every stride-th frame only, emit exact int sums of the
    sampled decoded pixels + frame counts — same actor contract as
    Y4mFrameSampler."""

    def __init__(self, stride: int = 2):
        self.stride = stride

    def __call__(self, t: pa.Table) -> pa.Table:
        ids, totals, sampled, sums = [], [], [], []
        for mid, buf in zip(t["media_id"], t["payload"]):
            frames, total = decode_avi_mjpeg(buf.as_py(), stride=self.stride)
            ids.append(mid.as_py())
            totals.append(total)
            sampled.append(len(frames))
            sums.append(int(sum(f.astype(np.int64).sum() for f in frames)))
        return pa.table(
            {
                "media_id": pa.array(ids, type=pa.int64()),
                "n_frames": pa.array(totals, type=pa.int64()),
                "n_sampled": pa.array(sampled, type=pa.int64()),
                "sum_gray": pa.array(sums, type=pa.int64()),
            }
        )


# ---------------------------------------------------------------------
# REAL compressed-audio codec, FLAC-style (fLaC stream framing:
# STREAMINFO with stream MD5, per-frame sync code + CRC-8-protected
# header + CRC-16-protected frame, UTF-8-coded frame numbers, CONSTANT
# / VERBATIM / FIXED-predictor subframes with Golomb-Rice residual
# coding). This is the predictive + unary entropy family — distinct
# from LZW (dictionary), DEFLATE (LZ77+Huffman) and JPEG (transform
# coding) — and it is LOSSLESS, so the gate hash-checks decoded
# samples against a closed-form SQL twin through real compression.
# Subset: 16-bit mono, fixed predictors 0-4, one Rice partition; LPC
# subframes and stereo decorrelation raise (never emitted).

_CRC8_TBL = None
_CRC16_TBL = None


def _flac_crcs() -> tuple[list[int], list[int]]:
    global _CRC8_TBL, _CRC16_TBL
    if _CRC8_TBL is None:
        t8 = []
        for b in range(256):
            c = b
            for _ in range(8):
                c = ((c << 1) ^ 0x07) & 0xFF if c & 0x80 else (c << 1) & 0xFF
            t8.append(c)
        t16 = []
        for b in range(256):
            c = b << 8
            for _ in range(8):
                c = ((c << 1) ^ 0x8005) & 0xFFFF if c & 0x8000 else (c << 1) & 0xFFFF
            t16.append(c)
        _CRC8_TBL, _CRC16_TBL = t8, t16
    return _CRC8_TBL, _CRC16_TBL


def _crc8(data: bytes) -> int:
    t8, _ = _flac_crcs()
    c = 0
    for b in data:
        c = t8[c ^ b]
    return c


def _crc16(data: bytes) -> int:
    _, t16 = _flac_crcs()
    c = 0
    for b in data:
        c = t16[((c >> 8) ^ b) & 0xFF] ^ ((c << 8) & 0xFFFF)
    return c


class _MsbWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, value: int, nbits: int) -> None:
        self.acc = (self.acc << nbits) | (value & ((1 << nbits) - 1))
        self.nbits += nbits
        while self.nbits >= 8:
            self.out.append((self.acc >> (self.nbits - 8)) & 0xFF)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def put_unary(self, q: int) -> None:
        while q >= 32:
            self.put(0, 32)
            q -= 32
        self.put(1, q + 1)  # q zeros then a one

    def align(self) -> None:
        if self.nbits:
            self.put(0, 8 - self.nbits)


class _MsbReader:
    def __init__(self, data: bytes, pos: int = 0) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def read(self, nbits: int) -> int:
        while self.nbits < nbits:
            if self.pos >= len(self.data):
                raise ValueError("FLAC stream truncated")
            self.acc = (self.acc << 8) | self.data[self.pos]
            self.pos += 1
            self.nbits += 8
        v = (self.acc >> (self.nbits - nbits)) & ((1 << nbits) - 1)
        self.nbits -= nbits
        self.acc &= (1 << self.nbits) - 1
        return v

    def read_unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
        return q

    def align(self) -> None:
        self.nbits = 0
        self.acc = 0


def _utf8_number(n: int) -> bytes:
    if n < 0x80:
        return bytes([n])
    out = []
    nbytes = 2
    while n >= (1 << (6 - nbytes)) << (6 * (nbytes - 1)):
        nbytes += 1
    lead = (0xFF << (8 - nbytes)) & 0xFF
    shifts = 6 * (nbytes - 1)
    out.append(lead | (n >> shifts))
    for k in range(nbytes - 1):
        shifts -= 6
        out.append(0x80 | ((n >> shifts) & 0x3F))
    return bytes(out)


def _read_utf8_number(br: "_MsbReader") -> int:
    b0 = br.read(8)
    if b0 < 0x80:
        return b0
    nbytes = 0
    mask = 0x80
    while b0 & mask:
        nbytes += 1
        mask >>= 1
    if nbytes < 2:
        raise ValueError("bad FLAC UTF-8 coded number")
    n = b0 & (mask - 1)
    for _ in range(nbytes - 1):
        b = br.read(8)
        if b & 0xC0 != 0x80:
            raise ValueError("bad FLAC UTF-8 continuation")
        n = (n << 6) | (b & 0x3F)
    return n


_FLAC_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def encode_flac16(samples: "np.ndarray", rate: int = 8000, block_size: int = 64) -> bytes:
    """Encode int16 mono samples as a FLAC-style stream: fLaC magic,
    STREAMINFO (incl. MD5 of the raw samples), then one frame per
    block with the best fixed predictor (0-4, min-abs-residual
    estimate; constant blocks emit CONSTANT subframes) and Rice-coded
    residuals (per-block parameter chosen by exact bit count)."""
    import hashlib
    import struct

    samples = np.asarray(samples)
    if samples.ndim != 1 or samples.dtype != np.int16:
        raise ValueError(f"expected 1-D int16 samples, got {samples.shape} {samples.dtype}")
    if not len(samples):
        raise ValueError("empty sample stream")
    md5 = hashlib.md5(samples.astype("<i2").tobytes()).digest()
    si = _MsbWriter()
    si.put(block_size, 16)
    si.put(block_size, 16)
    si.put(0, 24)
    si.put(0, 24)
    si.put(rate, 20)
    si.put(0, 3)   # channels - 1
    si.put(15, 5)  # bits per sample - 1
    si.put(len(samples), 36)
    out = bytearray(b"fLaC")
    out += b"\x80" + struct.pack(">I", 34)[1:]  # last block, STREAMINFO
    out += si.out + md5

    x = samples.astype(np.int64)
    for fidx, start in enumerate(range(0, len(x), block_size)):
        blk = x[start : start + block_size]
        n = len(blk)
        bw = _MsbWriter()
        hdr = bytearray(b"\xff\xf8")
        hdr.append(0x70)  # blocksize: 16-bit at end; rate: STREAMINFO
        hdr.append(0x08)  # mono, 16-bit
        hdr += _utf8_number(fidx)
        hdr += struct.pack(">H", n - 1)
        hdr.append(_crc8(bytes(hdr)))
        for b in hdr:
            bw.put(b, 8)

        if np.all(blk == blk[0]):
            bw.put(0, 1)
            bw.put(0b000000, 6)  # CONSTANT
            bw.put(0, 1)
            bw.put(int(blk[0]), 16)
        else:
            best_k, best_res, best_cost = 0, blk, None
            for k in range(0, min(5, n)):
                res = np.diff(blk, k) if k else blk
                cost = int(np.abs(res).sum())
                if best_cost is None or cost < best_cost:
                    best_k, best_res, best_cost = k, res, cost
            k, res = best_k, best_res
            u = np.where(res >= 0, 2 * res, -2 * res - 1).astype(np.int64)
            costs = [
                (len(u) * (p + 1) + int((u >> p).sum()), p) for p in range(15)
            ]
            p = min(costs)[1]
            bw.put(0, 1)
            bw.put(0b001000 | k, 6)  # FIXED order k
            bw.put(0, 1)
            for s in blk[:k]:
                bw.put(int(s), 16)
            bw.put(0b00, 2)  # 4-bit Rice params
            bw.put(0, 4)     # partition order 0
            bw.put(p, 4)
            for uv in u:
                bw.put_unary(int(uv) >> p)
                if p:
                    bw.put(int(uv), p)
        bw.align()
        frame = bytes(bw.out)
        out += frame + struct.pack(">H", _crc16(frame))
    return bytes(out)


def decode_flac16(raw: bytes) -> tuple["np.ndarray", int]:
    """Decode a FLAC-style stream back to (int16 samples, rate):
    verify magic, walk metadata blocks, then per frame verify the
    CRC-8 header and CRC-16 frame, decode CONSTANT/VERBATIM/FIXED
    subframes with Rice residuals, reconstruct through the fixed
    predictors, and finally verify the STREAMINFO MD5 of the decoded
    stream. LPC/stereo/escape-coded partitions raise (never emitted
    by the encoder); any CRC, MD5, sync, or size mismatch raises."""
    import hashlib
    import struct

    if raw[:4] != b"fLaC":
        raise ValueError("not a FLAC payload (bad magic)")
    try:
        return _decode_flac_body(raw)
    except (IndexError, struct.error) as e:
        raise ValueError(f"truncated FLAC payload: {e}") from e


def _decode_flac_body(raw: bytes) -> tuple["np.ndarray", int]:
    import hashlib

    pos = 4
    info = None
    while True:
        hdr = raw[pos]
        (ln,) = (int.from_bytes(raw[pos + 1 : pos + 4], "big"),)
        body = raw[pos + 4 : pos + 4 + ln]
        if hdr & 0x7F == 0:
            br = _MsbReader(body)
            br.read(16)
            br.read(16)
            br.read(24)
            br.read(24)
            rate = br.read(20)
            if br.read(3) != 0:
                raise ValueError("only mono FLAC supported")
            if br.read(5) != 15:
                raise ValueError("only 16-bit FLAC supported")
            total = br.read(36)
            # plausibility cap BEFORE allocating the output buffer: a
            # legit stream can't pack more than ~300 samples/byte
            # (constant 4096-sample frames), so 512x is unreachable —
            # a corrupt 36-bit field must raise, not np.empty(64 GB)
            if total > len(raw) * 512:
                raise ValueError(
                    f"implausible FLAC total_samples {total} for {len(raw)}-byte stream"
                )
            info = (rate, total, body[18:34])
        pos += 4 + ln
        if hdr & 0x80:
            break
    if info is None:
        raise ValueError("FLAC missing STREAMINFO")
    rate, total, md5_expect = info

    out = np.empty(total, dtype=np.int64)
    got = 0
    while got < total:
        frame_start = pos
        br = _MsbReader(raw, pos)
        if br.read(8) != 0xFF or br.read(8) != 0xF8:
            raise ValueError("bad FLAC frame sync")
        bs_code = br.read(4)
        sr_code = br.read(4)
        if br.read(4) != 0:
            raise ValueError("stereo decorrelation unsupported")
        if br.read(3) != 0b100:
            raise ValueError("only 16-bit frames supported")
        br.read(1)
        _read_utf8_number(br)
        if bs_code == 0b0110:
            n = br.read(8) + 1
        elif bs_code == 0b0111:
            n = br.read(16) + 1
        else:
            raise ValueError(f"unsupported blocksize code {bs_code}")
        if sr_code != 0:
            raise ValueError("inline sample-rate codes unsupported")
        hdr_end = br.pos
        if _crc8(raw[frame_start:hdr_end]) != br.read(8):
            raise ValueError("FLAC frame header CRC-8 mismatch")

        if br.read(1) != 0:
            raise ValueError("bad subframe padding bit")
        stype = br.read(6)
        if br.read(1) != 0:
            raise ValueError("wasted bits unsupported")
        if stype == 0b000000:  # CONSTANT
            v = br.read(16)
            v = v - 65536 if v >= 32768 else v
            blk = np.full(n, v, dtype=np.int64)
        elif stype == 0b000001:  # VERBATIM
            blk = np.empty(n, dtype=np.int64)
            for i in range(n):
                v = br.read(16)
                blk[i] = v - 65536 if v >= 32768 else v
        elif 0b001000 <= stype <= 0b001100:  # FIXED order k
            k = stype & 0x07
            warm = []
            for _ in range(k):
                v = br.read(16)
                warm.append(v - 65536 if v >= 32768 else v)
            if br.read(2) != 0:
                raise ValueError("only 4-bit Rice parameters supported")
            if br.read(4) != 0:
                raise ValueError("only partition order 0 supported")
            p = br.read(4)
            if p == 15:
                raise ValueError("escape-coded partitions unsupported")
            res = np.empty(n - k, dtype=np.int64)
            for i in range(n - k):
                u = (br.read_unary() << p) | (br.read(p) if p else 0)
                res[i] = (u >> 1) if u % 2 == 0 else -((u + 1) >> 1)
            coefs = _FLAC_FIXED_COEFS[k]
            blk = np.empty(n, dtype=np.int64)
            blk[:k] = warm
            for i in range(k, n):
                acc = res[i - k]
                for j, c in enumerate(coefs):
                    acc += c * blk[i - 1 - j]
                blk[i] = acc
        else:
            raise ValueError(f"unsupported subframe type {stype:#08b} (LPC?)")
        br.align()
        body_end = br.pos
        crc = (raw[body_end] << 8) | raw[body_end + 1]
        if _crc16(raw[frame_start:body_end]) != crc:
            raise ValueError("FLAC frame CRC-16 mismatch")
        pos = body_end + 2
        if got + n > total:
            raise ValueError("FLAC frames exceed declared total samples")
        out[got : got + n] = blk
        got += n

    if out.min() < -32768 or out.max() > 32767:
        raise ValueError("decoded sample out of int16 range")
    dec = out.astype(np.int16)
    if hashlib.md5(dec.astype("<i2").tobytes()).digest() != md5_expect:
        raise ValueError("FLAC stream MD5 mismatch")
    return dec, rate


def _flac_samples(doc_id: int) -> "np.ndarray":
    """Deterministic waveform for the FLAC gate: n = 96 + id%113
    samples, sample[i] = ((id*17 + i*11) mod 65536) - 32768 — closed
    form, SQL-regenerable (distinct constants from _wav_samples so the
    two audio gates are independent)."""
    n = 96 + doc_id % 113
    i = np.arange(n, dtype=np.int64)
    return ((doc_id * 17 + i * 11) % 65536 - 32768).astype(np.int16)


def synthesize_flac_media(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    """REAL compressed-audio media table: payload = FLAC-style stream
    of the deterministic waveform (block size 64 -> 2-4 frames per
    stream, exercising multi-frame decode + the partial last block)."""

    def make(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        payloads = [encode_flac16(_flac_samples(int(i))) for i in ids]
        return pa.table(
            {
                "media_id": pa.array(ids, type=pa.int64()),
                "payload": pa.array(payloads, type=pa.large_binary()),
            }
        )

    return docs.map_batches(make, batch_format="pyarrow", batch_size=512)


class FlacDecoder:
    """REAL compressed-audio decode stage: CRC/MD5-verified predictive
    decode, exact int stats of the DECODED samples — same contract and
    output schema as WavDecoder."""

    def __call__(self, t: pa.Table) -> pa.Table:
        ids, ns, rates, ssum, sabs, smin, smax = [], [], [], [], [], [], []
        for mid, buf in zip(t["media_id"], t["payload"]):
            s, rate = decode_flac16(buf.as_py())
            v = s.astype(np.int64)
            ids.append(mid.as_py())
            ns.append(len(v))
            rates.append(rate)
            ssum.append(int(v.sum()))
            sabs.append(int(np.abs(v).sum()))
            smin.append(int(v.min()))
            smax.append(int(v.max()))
        return pa.table(
            {
                "media_id": pa.array(ids, type=pa.int64()),
                "n_samples": pa.array(ns, type=pa.int64()),
                "sample_rate": pa.array(rates, type=pa.int64()),
                "sum_amp": pa.array(ssum, type=pa.int64()),
                "sum_abs_amp": pa.array(sabs, type=pa.int64()),
                "min_amp": pa.array(smin, type=pa.int64()),
                "max_amp": pa.array(smax, type=pa.int64()),
            }
        )


# ---------------------------------------------------------------------
# Robust decode: at corpus scale some payloads WILL be corrupt, and a
# decode stage must route them to quarantine instead of killing the
# pipeline — the same discipline as the change-stream quarantine
# (state/quarantine.py; reference: parser skips Code!=0 txs rather
# than aborting the height). corrupt_payloads is the deterministic
# fault injector for gates/tests; RobustMediaDecoder wraps any
# per-payload decode fn.


def corrupt_payloads(media: "ray.data.Dataset", every: int = 29) -> "ray.data.Dataset":
    """Deterministically corrupt payloads where media_id % every == 0
    by flipping one bit mid-payload (SQL-predictable fault set)."""

    def flip(t: pa.Table) -> pa.Table:
        ids = t["media_id"].to_numpy(zero_copy_only=False)
        out = []
        for mid, buf in zip(ids, t["payload"]):
            b = buf.as_py()
            if int(mid) % every == 0:
                mid_pos = len(b) // 2
                b = b[:mid_pos] + bytes([b[mid_pos] ^ 0x40]) + b[mid_pos + 1 :]
            out.append(b)
        cols = {n: t[n] for n in t.column_names}
        cols["payload"] = pa.array(out, type=pa.large_binary())
        return pa.table(cols)

    return media.map_batches(flip, batch_format="pyarrow", batch_size=512)


class RobustMediaDecoder:
    """Actor-pool decode stage with a quarantine path: each payload
    decodes under a ValueError guard (the codec contract: ANY
    malformed input raises ValueError, never garbage output). Good
    rows carry decode_ok=true + the stat; corrupt rows carry
    decode_ok=false and a zero stat — the stream keeps flowing and
    the quarantined set is exact. decode_fn must return an int stat
    for a payload (default: FLAC sum of decoded samples — FLAC's
    CRC-8/16 + MD5 layers guarantee a flipped bit raises rather than
    mis-decoding, which is why the gate uses it)."""

    def __init__(self, decode_fn=None):
        if decode_fn is None:
            def decode_fn(b: bytes) -> int:
                s, _ = decode_flac16(b)
                return int(s.astype(np.int64).sum())
        self.decode_fn = decode_fn

    def __call__(self, t: pa.Table) -> pa.Table:
        ids, oks, stats = [], [], []
        for mid, buf in zip(t["media_id"], t["payload"]):
            ids.append(mid.as_py())
            try:
                stats.append(int(self.decode_fn(buf.as_py())))
                oks.append(True)
            except ValueError:
                stats.append(0)
                oks.append(False)
        return pa.table(
            {
                "media_id": pa.array(ids, type=pa.int64()),
                "decode_ok": pa.array(oks, type=pa.bool_()),
                "sum_amp": pa.array(stats, type=pa.int64()),
            }
        )


# ---------------------------------------------------------------------
# REAL inter-frame video codec: FLV Screen Video v1 (codec id 3 — the
# Flash screencast codec; ffmpeg decodes these as 'flashsv'). Genuine
# TEMPORAL compression: the image is a 16x16 block grid, keyframes
# carry every block, inter frames carry only changed blocks (an
# unchanged block costs 2 bytes — "copy from previous frame"), each
# present block is zlib-compressed bottom-up BGR24. Lossless, so the
# gate hash-checks decoded pixels through real temporal delta coding.
# The FLV container framing (header, tag chain with back-pointers,
# VIDEODATA frame-type/codec-id nibbles) is real. Random access needs
# a keyframe walk — the decoder replays block updates in order, the
# honest cost of inter-frame coding.


def encode_flv_screenvideo(frames: "np.ndarray", block: int = 16) -> bytes:
    """Encode (N, H, W, 3) uint8 RGB frames as an FLV file carrying a
    Screen Video v1 stream: frame 0 is a keyframe (every block
    present), each later frame carries exactly the blocks that changed
    vs the previous frame."""
    import struct
    import zlib

    frames = np.asarray(frames)
    if frames.ndim != 4 or frames.shape[3] != 3 or frames.dtype != np.uint8:
        raise ValueError(f"expected (N, H, W, 3) uint8, got {frames.shape} {frames.dtype}")
    n, h, w = frames.shape[:3]
    if not n or not h or not w:
        raise ValueError("empty video")
    if not 16 <= block <= 256 or block % 16:
        raise ValueError("block must be a multiple of 16 in [16, 256]")

    def pack_frame(cur: "np.ndarray", prev: "np.ndarray | None") -> bytes:
        bw = _MsbWriter()
        bw.put(block // 16 - 1, 4)
        bw.put(w, 12)
        bw.put(block // 16 - 1, 4)
        bw.put(h, 12)
        body = bytearray(bw.out)
        # blocks start at the LOWER-left, row-major moving right then up
        for y0 in range(h, 0, -block):
            ys, ye = max(0, y0 - block), y0
            for x0 in range(0, w, block):
                xe = min(w, x0 + block)
                blk = cur[ys:ye, x0:xe]
                if prev is not None and np.array_equal(blk, prev[ys:ye, x0:xe]):
                    body += struct.pack(">H", 0)
                    continue
                bgr = blk[::-1, :, ::-1]  # bottom-up rows, BGR order
                z = zlib.compress(bgr.tobytes(), 6)
                body += struct.pack(">H", len(z)) + z
        return bytes(body)

    out = bytearray(b"FLV\x01\x01\x00\x00\x00\x09")  # header, video-only
    out += struct.pack(">I", 0)  # PreviousTagSize0
    for f in range(n):
        payload = pack_frame(frames[f], frames[f - 1] if f else None)
        video = bytes([((1 if f == 0 else 2) << 4) | 3]) + payload
        ts = f * 40  # 25 fps in ms
        tag = (
            b"\x09"
            + struct.pack(">I", len(video))[1:]
            + struct.pack(">I", ts)[1:]
            + bytes([ts >> 24 & 0xFF])
            + b"\x00\x00\x00"
            + video
        )
        out += tag + struct.pack(">I", len(tag))
    return bytes(out)


def decode_flv_screenvideo(raw: bytes) -> "np.ndarray":
    """Decode an FLV Screen Video v1 file to (N, H, W, 3) uint8 RGB:
    walk the tag chain (back-pointers verified), require codec id 3,
    replay block updates onto the canvas (a zero-length block copies
    the previous frame's block — which requires the first frame to be
    a keyframe with every block present). Strict: bad signature/
    back-pointer/codec, a non-key first frame, short block data, or
    inflate failure all raise ValueError."""
    import struct
    import zlib

    if raw[:5] != b"FLV\x01\x01" or raw[5:9] != b"\x00\x00\x00\x09":
        raise ValueError("not a video-only FLV payload")
    try:
        return _decode_flv_body(raw)
    except (IndexError, struct.error, zlib.error) as e:
        raise ValueError(f"malformed FLV payload: {e}") from e


def _decode_flv_body(raw: bytes) -> "np.ndarray":
    import struct
    import zlib

    pos = 9
    (pts,) = struct.unpack_from(">I", raw, pos)
    if pts != 0:
        raise ValueError("bad PreviousTagSize0")
    pos += 4
    frames: list["np.ndarray"] = []
    canvas = None
    while pos + 11 <= len(raw):
        ttype = raw[pos]
        dsize = int.from_bytes(raw[pos + 1 : pos + 4], "big")
        data = raw[pos + 11 : pos + 11 + dsize]
        if len(data) != dsize:
            raise ValueError("truncated FLV tag")
        tag_len = 11 + dsize
        (back,) = struct.unpack_from(">I", raw, pos + tag_len)
        if back != tag_len:
            raise ValueError(f"FLV back-pointer mismatch ({back} != {tag_len})")
        pos += tag_len + 4
        if ttype != 9:
            continue  # non-video tags skipped per container spec
        ftype, codec = data[0] >> 4, data[0] & 0x0F
        if codec != 3:
            raise ValueError(f"unsupported FLV codec id {codec}; only Screen Video")
        br = _MsbReader(data, 1)
        block = (br.read(4) + 1) * 16
        w = br.read(12)
        br2 = br.read(4)
        h = br.read(12)
        if (br2 + 1) * 16 != block:
            raise ValueError("Screen Video block width/height mismatch")
        if not w or not h:
            raise ValueError("bad Screen Video dimensions")
        if canvas is None:
            if ftype != 1:
                raise ValueError("first FLV frame is not a keyframe")
            canvas = np.zeros((h, w, 3), dtype=np.uint8)
        elif canvas.shape[:2] != (h, w):
            raise ValueError("Screen Video dimensions changed mid-stream")
        bpos = 1 + 4  # VIDEODATA byte + 4 header bytes (4+12+4+12 bits)
        first = canvas is not None and not frames
        for y0 in range(h, 0, -block):
            ys, ye = max(0, y0 - block), y0
            for x0 in range(0, w, block):
                xe = min(w, x0 + block)
                (bsize,) = struct.unpack_from(">H", data, bpos)
                bpos += 2
                if bsize == 0:
                    if first and ftype == 1:
                        raise ValueError("keyframe with an empty block")
                    continue
                zdata = data[bpos : bpos + bsize]
                if len(zdata) != bsize:
                    raise ValueError("short Screen Video block data")
                bpos += bsize
                bh, bw_ = ye - ys, xe - x0
                px = zlib.decompressobj().decompress(zdata, bh * bw_ * 3 + 1)
                if len(px) != bh * bw_ * 3:
                    raise ValueError("Screen Video block size mismatch")
                blk = np.frombuffer(px, np.uint8).reshape(bh, bw_, 3)
                canvas[ys:ye, x0:xe] = blk[::-1, :, ::-1]
        frames.append(canvas.copy())
    if not frames:
        raise ValueError("FLV ended without video frames")
    return np.stack(frames)


def _flv_frames(doc_id: int) -> "np.ndarray":
    """Deterministic frames with a closed-form TEMPORAL update rule:
    16x16 block (by,bx) refreshes at frame f iff f == 0 or
    (by+bx+f) % 2 == 0, so its content is field(g) with
    g = max(0, f - ((by+bx+f) % 2)) — SQL-computable. field(g)[y,x,c]
    = (id*7 + g*9 + y*5 + x*3 + c*11) % 256; refreshed blocks always
    differ (the +9g step), skipped blocks are bit-equal, so the
    encoder's changed-block detection and the decoder's copy-forward
    path are both on the hash."""
    h = 12 + doc_id % 8
    w = 12 + doc_id % 11
    n = 2 + doc_id % 4
    y = np.arange(h, dtype=np.int64)[:, None, None]
    x = np.arange(w, dtype=np.int64)[None, :, None]
    c = np.arange(3, dtype=np.int64)[None, None, :]
    bsum = y // 16 + x // 16
    frames = []
    for f in range(n):
        g = np.maximum(0, f - ((bsum + f) % 2))
        frames.append(
            ((doc_id * 7 + g * 9 + y * 5 + x * 3 + c * 11) % 256).astype(np.uint8)
        )
    return np.stack(frames)


def synthesize_flv_media(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    """REAL inter-frame video media table: payload = FLV Screen Video
    of the deterministic block-update frame stack."""

    def make(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        payloads = [encode_flv_screenvideo(_flv_frames(int(i))) for i in ids]
        return pa.table(
            {
                "media_id": pa.array(ids, type=pa.int64()),
                "payload": pa.array(payloads, type=pa.large_binary()),
            }
        )

    return docs.map_batches(make, batch_format="pyarrow", batch_size=512)


class FlvDecoder:
    """REAL inter-frame decode stage: replay the block-update stream
    (every frame must be decoded — the honest cost of temporal
    coding), emit exact per-channel sums over ALL decoded frames."""

    def __call__(self, t: pa.Table) -> pa.Table:
        ids, ns, sr, sg, sb = [], [], [], [], []
        for mid, buf in zip(t["media_id"], t["payload"]):
            fr = decode_flv_screenvideo(buf.as_py()).astype(np.int64)
            ids.append(mid.as_py())
            ns.append(fr.shape[0])
            s = fr.sum(axis=(0, 1, 2))
            sr.append(int(s[0]))
            sg.append(int(s[1]))
            sb.append(int(s[2]))
        return pa.table(
            {
                "media_id": pa.array(ids, type=pa.int64()),
                "n_frames": pa.array(ns, type=pa.int64()),
                "sum_r": pa.array(sr, type=pa.int64()),
                "sum_g": pa.array(sg, type=pa.int64()),
                "sum_b": pa.array(sb, type=pa.int64()),
            }
        )


class GifToPngTranscoder:
    """Transcode-at-the-edge stage: decode each GIF payload, expand
    through its color table, re-encode as PNG (adaptive filters).
    The ingest-normalization shape for heterogeneous media corpora —
    lossless end to end, so downstream gates hash-check through BOTH
    codecs. Actor pool: the palette/filter work is per-payload CPU."""

    def __call__(self, t: pa.Table) -> pa.Table:
        ids, out = [], []
        for mid, buf in zip(t["media_id"], t["payload"]):
            idx, pal = decode_gif8(buf.as_py())
            ids.append(mid.as_py())
            out.append(encode_png_rgb8(np.ascontiguousarray(pal[idx])))
        return pa.table(
            {
                "media_id": pa.array(ids, type=pa.int64()),
                "payload": pa.array(out, type=pa.large_binary()),
            }
        )


# ---------------------------------------------------------------------
# Format-sniffing dispatch: a heterogeneous media corpus doesn't
# announce formats — the decode stage sniffs magic bytes and routes
# each payload to the right codec. Unknown magic raises ValueError,
# so RobustMediaDecoder(decode_fn=sniff_decode_pixel_sum) composes
# the dispatch with the quarantine path unchanged.


def sniff_media_format(raw: bytes) -> str:
    """Identify a payload by magic bytes: bmp|png|gif|jpeg|wav|flac|
    y4m|avi|flv. Unknown magic raises ValueError."""
    if raw[:2] == b"BM":
        return "bmp"
    if raw[:8] == b"\x89PNG\r\n\x1a\n":
        return "png"
    if raw[:4] == b"GIF8":
        return "gif"
    if raw[:2] == b"\xff\xd8":
        return "jpeg"
    if raw[:4] == b"RIFF" and raw[8:12] == b"WAVE":
        return "wav"
    if raw[:4] == b"fLaC":
        return "flac"
    if raw[:9] == b"YUV4MPEG2":
        return "y4m"
    if raw[:4] == b"RIFF" and raw[8:12] == b"AVI ":
        return "avi"
    if raw[:4] == b"FLV\x01":
        return "flv"
    raise ValueError(f"unknown media magic {raw[:8]!r}")


def sniff_decode_pixel_sum(raw: bytes) -> int:
    """Sniff + decode + one unified integer stat (sum of decoded
    sample/pixel values across channels/frames) — the decode_fn shape
    RobustMediaDecoder accepts."""
    kind = sniff_media_format(raw)
    if kind == "bmp":
        return int(decode_bmp24(raw).astype(np.int64).sum())
    if kind == "png":
        return int(decode_png_rgb8(raw).astype(np.int64).sum())
    if kind == "gif":
        idx, pal = decode_gif8(raw)
        return int(pal[idx].astype(np.int64).sum())
    if kind == "jpeg":
        return int(decode_jpeg_gray(raw).astype(np.int64).sum())
    if kind == "wav":
        return int(decode_wav16(raw)[0].astype(np.int64).sum())
    if kind == "flac":
        return int(decode_flac16(raw)[0].astype(np.int64).sum())
    if kind == "y4m":
        frames, _, _ = decode_y4m(raw)
        return int(sum(int(p.astype(np.int64).sum()) for f in frames for p in f))
    if kind == "avi":
        frames, _ = decode_avi_mjpeg(raw)
        return int(sum(int(f.astype(np.int64).sum()) for f in frames))
    return int(decode_flv_screenvideo(raw).astype(np.int64).sum())  # flv


class MediaSniffDecoder:
    """Actor-pool dispatch decode: per payload, sniff the format and
    emit (media_id, kind, sum_px) — the heterogeneous-corpus shape
    where the format column doesn't exist and must not be trusted."""

    def __call__(self, t: pa.Table) -> pa.Table:
        ids, kinds, sums = [], [], []
        for mid, buf in zip(t["media_id"], t["payload"]):
            raw = buf.as_py()
            ids.append(mid.as_py())
            kinds.append(sniff_media_format(raw))
            sums.append(sniff_decode_pixel_sum(raw))
        return pa.table(
            {
                "media_id": pa.array(ids, type=pa.int64()),
                "kind": pa.array(kinds, type=pa.string()),
                "sum_px": pa.array(sums, type=pa.int64()),
            }
        )


def synthesize_mixed_media(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    """Heterogeneous media table: doc_id % 3 selects BMP / PNG / GIF
    payloads (each its own closed-form field) with NO format column —
    the dispatch gate must sniff."""

    def make(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        payloads = []
        for i in ids:
            i = int(i)
            if i % 3 == 0:
                payloads.append(encode_bmp24(_bmp_pixels(i)))
            elif i % 3 == 1:
                payloads.append(
                    encode_png_rgb8(_png_pixels(i), filter_mode=("cycle", i))
                )
            else:
                payloads.append(encode_gif8(_gif_indices(i), _GIF_PALETTE))
        return pa.table(
            {
                "media_id": pa.array(ids, type=pa.int64()),
                "payload": pa.array(payloads, type=pa.large_binary()),
            }
        )

    return docs.map_batches(make, batch_format="pyarrow", batch_size=512)

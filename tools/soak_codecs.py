"""Codec + BPE scale evidence.

1. Per-codec encode/decode throughput on realistic payload sizes
   (larger than the gate's tiny images — a 256x256 RGB frame, 64k
   audio samples, a 12-frame 128x128 video) so BASELINE carries MB/s
   numbers behind the per-stage batch sizing.
2. BPE vocabulary-bounded claim: train over 1x / 10x / 50x document
   corpora (extra docs are seeded perturbations, which grow the
   corpus but NOT the alphabet-level pair space) and report wall time
   per round — the iterate phase should track DISTINCT-WORD count,
   not corpus size.

Usage: python tools/soak_codecs.py [n_docs_multiplier]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def codec_throughput() -> None:
    from cosmwasm_etl_ray.stages import multimodal as mm

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (256, 256, 3)).astype(np.uint8)
    gray = rng.integers(0, 256, (256, 256)).astype(np.uint8)
    idx = rng.integers(0, 16, (256, 256)).astype(np.uint8)
    audio = rng.integers(-32768, 32768, 65536).astype(np.int16)
    frames = rng.integers(0, 256, (12, 128, 128, 3)).astype(np.uint8)
    gray_frames = [rng.integers(0, 256, (128, 128)).astype(np.uint8) for _ in range(12)]

    cases = {
        "bmp": (lambda: mm.encode_bmp24(img), mm.decode_bmp24, img.nbytes),
        "png": (lambda: mm.encode_png_rgb8(img), mm.decode_png_rgb8, img.nbytes),
        "gif": (
            lambda: mm.encode_gif8(idx, mm._GIF_PALETTE),
            mm.decode_gif8,
            idx.nbytes,
        ),
        "jpeg": (lambda: mm.encode_jpeg_gray(gray), mm.decode_jpeg_gray, gray.nbytes),
        "wav": (lambda: mm.encode_wav16(audio), mm.decode_wav16, audio.nbytes),
        "flac": (lambda: mm.encode_flac16(audio, block_size=4096), mm.decode_flac16, audio.nbytes),
        "avi-mjpeg": (
            lambda: mm.encode_avi_mjpeg(gray_frames),
            mm.decode_avi_mjpeg,
            sum(f.nbytes for f in gray_frames),
        ),
        "flv-sv": (
            lambda: mm.encode_flv_screenvideo(frames),
            mm.decode_flv_screenvideo,
            frames.nbytes,
        ),
    }
    print(f"{'codec':12} {'raw KB':>8} {'enc KB':>8} {'enc MB/s':>9} {'dec MB/s':>9}")
    for name, (enc, dec, raw) in cases.items():
        t0 = time.perf_counter()
        payload = enc()
        t1 = time.perf_counter()
        dec(payload)
        t2 = time.perf_counter()
        print(
            f"{name:12} {raw/1024:8.0f} {len(payload)/1024:8.0f} "
            f"{raw/1e6/(t1-t0):9.1f} {raw/1e6/(t2-t1):9.1f}"
        )
    adapter_throughput()


def adapter_throughput() -> None:
    """Real-library adapter vs builtin decode on the same payload
    (VERDICT r4 #5): every adapter importable in this container gets
    a measured row; absent libraries print as skipped so the recipe's
    coverage is visible."""
    from cosmwasm_etl_ray.stages import multimodal as mm
    from cosmwasm_etl_ray.stages.codec_adapters import decode_wav16_stdlib

    rng = np.random.default_rng(7)
    audio = rng.integers(-32768, 32768, 1 << 20).astype(np.int16)
    wav = mm.encode_wav16(audio)
    raw = audio.nbytes

    def rate(fn, payload, n=5):
        t0 = time.perf_counter()
        for _ in range(n):
            fn(payload)
        return raw * n / 1e6 / (time.perf_counter() - t0)

    print(f"\n{'adapter decode (1 MiB samples)':34} {'MB/s':>9}")
    print(f"{'wav builtin (RIFF walk + frombuffer)':34} {rate(mm.decode_wav16, wav):9.1f}")
    print(f"{'wav stdlib-wave adapter':34} {rate(decode_wav16_stdlib, wav):9.1f}")
    try:
        from cosmwasm_etl_ray.stages.codec_adapters import PillowImageDecoder

        PillowImageDecoder()  # raises ImportError when absent
        img = rng.integers(0, 256, (512, 512, 3)).astype(np.uint8)
        png = mm.encode_png_rgb8(img)
        dec = PillowImageDecoder()._decode
        print(f"{'png builtin (zlib + unfilter)':34} "
              f"{img.nbytes * 5 / 1e6 / _time_n(mm.decode_png_rgb8, png, 5):9.1f}")
        print(f"{'png Pillow adapter':34} "
              f"{img.nbytes * 5 / 1e6 / _time_n(dec, png, 5):9.1f}")
    except ImportError:
        print(f"{'png Pillow adapter':34} {'(Pillow absent — skipped)':>9}")


def _time_n(fn, payload, n):
    t0 = time.perf_counter()
    for _ in range(n):
        fn(payload)
    return time.perf_counter() - t0


def bpe_scaling(mult: int) -> None:
    import pyarrow as pa

    import ray
    import ray.data as rd

    from cosmwasm_etl_ray.functions.bpe import bpe_train, word_freqs

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=16, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    base = rd.read_parquet(
        "/root/testdata/sf0.01/documents.parquet", columns=["doc_id", "text"]
    ).to_pandas()
    for m in (1, max(2, mult // 5), mult):
        texts, ids = [], []
        for k in range(m):
            # perturb: suffix one word per copy so corpus grows but
            # the distinct-word table grows sublinearly
            texts.extend(t + f" copyword{k}" for t in base["text"])
            ids.extend(base["doc_id"] + k * 1_000_000)
        docs = rd.from_arrow(
            pa.table({"doc_id": pa.array(ids, type=pa.int64()),
                      "text": pa.array(texts, type=pa.string())})
        )
        t0 = time.perf_counter()
        vocab = word_freqs(docs).count()
        t1 = time.perf_counter()
        bpe_train(docs, n_merges=10)
        t2 = time.perf_counter()
        print(
            f"x{m:3d}: docs={len(texts):7d} distinct_words={vocab:6d} "
            f"wordfreq_pass={t1-t0:5.1f}s train_10_rounds={t2-t1:5.1f}s"
        )
    ray.shutdown()


if __name__ == "__main__":
    codec_throughput()
    bpe_scaling(int(sys.argv[1]) if len(sys.argv) > 1 else 50)

"""Multimodal decode/resize throughput measurement (r10 verdict ask #6).

The pure-python BMP/PNG/JPEG/WAV decoders in ``llm/multimodal.py`` are
correctness-pinned (bit-exact vs independent replicas in tests) but
their docs/s/core was never recorded — at 100 TB of images that
constant IS the cost model. This tool builds deterministic synthetic
blobs at realistic sizes, measures

1. single-core driver-side decode throughput per format (the clean
   per-core constant: blobs/s and MB/s), and
2. Spark end-to-end throughput on local[32] through the production
   ``decode_features(real_decoder=real_decode)`` and
   ``resize_images`` mapInPandas paths (Arrow crossing + scheduling
   overhead included),

and prints a table to paste into SCALE.md.

Blob shapes: 256x256 24-bit BMP (~197 KB), 128x128 RGB PNG
(zlib-compressed), 64x64 baseline JPEG (test encoder, random sparse
coefficients), 1 s 8 kHz 16-bit PCM WAV.

Usage: python tools/multimodal_throughput.py
"""

from __future__ import annotations

import os
import sys
import time
import zlib

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nhs_data_pipeline_spark.llm import multimodal as mm


def build_bmp(w: int, h: int, rng: np.random.RandomState) -> bytes:
    stride = ((24 * w + 31) // 32) * 4
    rows = rng.randint(0, 256, size=(h, stride), dtype=np.uint8)
    pixels = rows.tobytes()
    header = (
        b"BM" + (54 + len(pixels)).to_bytes(4, "little")
        + b"\x00\x00\x00\x00" + (54).to_bytes(4, "little")
        + (40).to_bytes(4, "little") + w.to_bytes(4, "little")
        + h.to_bytes(4, "little") + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little") + (0).to_bytes(4, "little")
        + bytes(20)
    )
    return header + pixels


def build_png(w: int, h: int, rng: np.random.RandomState) -> bytes:
    def chunk(typ: bytes, body: bytes) -> bytes:
        return (len(body).to_bytes(4, "big") + typ + body
                + (zlib.crc32(typ + body) & 0xFFFFFFFF).to_bytes(4, "big"))

    ihdr = (w.to_bytes(4, "big") + h.to_bytes(4, "big")
            + bytes([8, 2, 0, 0, 0]))  # 8-bit RGB, no interlace
    # smooth gradient + noise: realistic zlib compressibility
    base = np.add.outer(np.arange(h), np.arange(w)) % 200
    raw = bytearray()
    for y in range(h):
        raw.append(0)  # filter 0
        row = np.stack([base[y]] * 3, axis=1).astype(np.uint8)
        row = (row + rng.randint(0, 24, size=row.shape)).astype(np.uint8)
        raw += row.tobytes()
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(raw)))
            + chunk(b"IEND", b""))


def build_jpeg(w: int, h: int, rng: np.random.RandomState) -> bytes:
    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))
    from test_llm import _encode_jpeg  # the pinned test encoder

    bx, by = w // 8, h // 8
    blocks = []
    for _ in range(bx * by):
        blk = [[0] * 8 for _ in range(8)]  # 8x8 quantized coefficients
        blk[0][0] = int(rng.randint(-64, 64))
        for _k in range(6):  # sparse AC — typical natural-image energy
            z = int(rng.randint(1, 20))
            blk[z >> 3][z & 7] = int(rng.randint(-16, 16))
        blocks.append(blk)
    quant = [16] * 64
    data, _ = _encode_jpeg([blocks], w, h, [(1, 1)], quant)
    return data


def build_wav(n: int, rng: np.random.RandomState) -> bytes:
    data = rng.randint(-3000, 3000, size=n).astype("<i2").tobytes()
    fmt = ((1).to_bytes(2, "little") + (1).to_bytes(2, "little")
           + (8000).to_bytes(4, "little") + (16000).to_bytes(4, "little")
           + (2).to_bytes(2, "little") + (16).to_bytes(2, "little"))
    body = (b"fmt " + len(fmt).to_bytes(4, "little") + fmt
            + b"data" + len(data).to_bytes(4, "little") + data)
    return b"RIFF" + (4 + len(body)).to_bytes(4, "little") + b"WAVE" + body


def single_core(name: str, blobs: list[bytes], fn) -> tuple[float, float]:
    # one warm call, then time enough reps for >= ~3 s
    fn(blobs[0])
    t0 = time.time()
    done = 0
    while time.time() - t0 < 3.0:
        for b in blobs:
            fn(b)
        done += len(blobs)
    dt = time.time() - t0
    mb = sum(len(b) for b in blobs) / len(blobs) / 1e6
    rate = done / dt
    print(f"  {name:22s} {rate:9.1f} blobs/s/core  "
          f"{rate * mb:8.2f} MB/s/core  (avg blob {mb * 1000:.0f} KB)")
    return rate, rate * mb


def main() -> None:
    rng = np.random.RandomState(42)
    kinds = {
        "bmp_256x256": [build_bmp(256, 256, rng) for _ in range(8)],
        "png_128x128": [build_png(128, 128, rng) for _ in range(8)],
        "jpeg_64x64": [build_jpeg(64, 64, rng) for _ in range(8)],
        "wav_1s_8k": [build_wav(8000, rng) for _ in range(8)],
    }
    print("single-core decode (real_decode -> features):")
    rates = {}
    for name, blobs in kinds.items():
        rates[name], _ = single_core(name, blobs, mm.real_decode)
    print("single-core pixel decode + bilinear resize to 64x64 "
          "(decode_pixels path; BMP/PNG only):")
    for name in ("bmp_256x256", "png_128x128"):
        single_core(
            name, kinds[name],
            lambda b: mm._encode_bmp24(
                mm._resize_bilinear(mm.decode_pixels(b), 64, 64)),
        )

    # ---- Spark end-to-end on local[32]
    from pyspark.sql import functions as F

    from nhs_data_pipeline_spark.session import get_spark

    spark = get_spark("mm-throughput")
    par = spark.sparkContext.defaultParallelism
    print(f"\nspark end-to-end (local[{par}], mapInPandas, "
          "Arrow batches):")
    for name, blobs in kinds.items():
        # size the job for ~8 s at the measured single-core rate
        n = max(par * 4, int(rates[name] * 8 * par * 0.5))
        n = min(n, 200_000)
        pdf_rows = [(i, blobs[i % len(blobs)]) for i in range(n)]
        df = spark.createDataFrame(pdf_rows, "media_id bigint, content binary")
        df = df.repartition(par).persist()
        df.count()
        t0 = time.time()
        mm.decode_features(df, real_decoder=mm.real_decode).agg(
            F.sum(F.when(F.col("decode_ok"), 1).otherwise(0))
        ).collect()
        dt = time.time() - t0
        print(f"  decode {name:18s} n={n:7d}  {dt:6.2f}s  "
              f"{n / dt:9.1f} blobs/s  ({n / dt / par:7.1f}/s/core)")
        if name in ("bmp_256x256", "png_128x128"):
            t0 = time.time()
            mm.resize_images(df, 64, 64).agg(
                F.sum(F.when(F.col("resize_ok"), 1).otherwise(0))
            ).collect()
            dt = time.time() - t0
            print(f"  resize {name:18s} n={n:7d}  {dt:6.2f}s  "
                  f"{n / dt:9.1f} blobs/s  ({n / dt / par:7.1f}/s/core)")
        df.unpersist()


if __name__ == "__main__":
    main()

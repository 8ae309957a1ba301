"""Generate the committed media-decode fixtures for q83.

Writes two single-file parquets under tests/fixtures/media/:

  media_assets.parquet    (asset_id, payload)   — one asset per real
                          codec path the engine decodes (PNG; JPEG
                          SOF0 444/420+RST, SOF2 progressive, SOF3
                          lossless, SOF9 arithmetic, hierarchical;
                          WAV PCM / mu-law / A-law / IMA / MS-ADPCM;
                          FLAC; Ogg Vorbis; MJPEG-AVI; MS-RLE AVI;
                          MJPEG-MP4)
  media_expected.parquet  the decode summary those payloads must
                          produce (operators/multimodal.py
                          decode_media_summary columns)

Content is deterministic (sha256-seeded synthesis, same idiom as
multimodal.synthetic_media), so regeneration is reproducible; the
EXPECTED table is produced by running the repo's own decoders at
generation time and committed, making q83's driver-gate row a
conformance tripwire: any regression in any codec changes the
decoded bytes and flips the hash.

Usage: python scripts/gen_media_fixtures.py
"""

from __future__ import annotations

import hashlib
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

OUT = os.path.join(REPO, "tests", "fixtures", "media")


def _img(w: int, h: int, tag: str) -> np.ndarray:
    d = hashlib.sha256(tag.encode()).digest()
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    return np.stack([
        (xx * (d[0] + 1)) % 256,
        (yy * (d[1] + 1)) % 256,
        (xx + yy + d[2]) % 256,
    ], axis=-1).astype(np.uint8)


def _pcm(n: int, tag: str, channels: int = 1) -> np.ndarray:
    d = hashlib.sha256(tag.encode()).digest()
    t = np.arange(n, dtype=np.float32)
    chans = []
    for c in range(channels):
        freq = 55.0 * (1 + d[c]) / 8.0
        chans.append(np.sin(2 * np.pi * freq * t / 8000.0)
                     * (6000 + d[4 + c] * 32))
    return np.stack(chans, axis=-1).astype(np.int16)


def _clip(n: int, w: int, h: int, tag: str) -> np.ndarray:
    d = hashlib.sha256(tag.encode()).digest()
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    return np.stack([np.stack([
        (xx * 3 + f * 11 + d[5]) % 256,
        (yy * 5 + f * 7) % 256,
        (xx + yy + f) % 256], axis=-1)
        for f in range(n)]).astype(np.uint8)


def build_assets() -> list[tuple[int, bytes]]:
    from tildener_spark.functions import avi, codecs, flac, jpeg, mp4

    assets: list[tuple[int, bytes]] = []

    def add(payload: bytes) -> None:
        assets.append((len(assets), payload))

    # --- images: PNG + every implemented T.81 JPEG mode
    add(codecs.encode_png(_img(24, 16, "png")))
    add(jpeg.encode_jpeg(_img(33, 21, "sof0"), quality=90))
    add(jpeg.encode_jpeg(_img(40, 24, "sof0_420"), quality=85,
                         subsampling="420", restart_interval=2))
    # SOF2 Huffman-progressive: our encoder doesn't emit SOF2 (only
    # decodes it), so the payload is a committed javax.imageio
    # bitstream (libjpeg default progressive script) — regeneration
    # reuses the committed file so the asset stays byte-stable
    sof2 = open(os.path.join(OUT, "progressive_sof2.jpg"),
                "rb").read()
    assert b"\xff\xc2" in sof2[:300]
    add(sof2)
    add(jpeg.encode_jpeg(_img(17, 13, "sof3"), lossless=1))
    add(jpeg.encode_jpeg(_img(22, 14, "sof9"), quality=85,
                         arithmetic=True))
    add(jpeg.encode_jpeg(_img(26, 18, "sof10"), quality=85,
                         arithmetic=True, progressive=True))
    add(jpeg.encode_jpeg(_img(32, 32, "hier"), lossless=1,
                         hierarchical=2))

    # --- audio: PCM, both G.711 laws, both ADPCM families, FLAC
    add(codecs.encode_wav(_pcm(1600, "pcm", 2), 8000))
    add(codecs.encode_wav_g711(_pcm(1200, "ulaw"), 8000, law="ulaw"))
    add(codecs.encode_wav_g711(_pcm(1200, "alaw"), 8000, law="alaw"))
    add(codecs.encode_wav_ima(_pcm(1017, "ima"), 8000))
    add(codecs.encode_wav_ms_adpcm(_pcm(1000, "ms"), 8000))
    add(flac.encode_flac(_pcm(2048, "flac", 2), 8000,
                         stereo_mode="mid_side"))
    from tildener_spark.functions import vorbis
    add(vorbis.encode_vorbis(_pcm(1700, "vorbis", 2), 8000))

    # --- video: MJPEG in both containers + MS-RLE inter-frame
    add(avi.encode_avi_mjpeg(_clip(4, 32, 24, "avi"), fps=8.0))
    pal = np.stack([np.arange(256), (np.arange(256) * 3) % 256,
                    (np.arange(256) * 7) % 256],
                   axis=-1).astype(np.uint8)
    idx = (_clip(5, 24, 16, "rle")[..., 0]).astype(np.uint8)
    add(avi.encode_avi_msrle(idx, pal, fps=5.0))
    add(mp4.encode_mp4_mjpeg(_clip(3, 32, 24, "mp4"), fps=8.0))
    return assets


def main() -> None:
    import pandas as pd

    from tildener_spark.operators import multimodal as mm

    os.makedirs(OUT, exist_ok=True)
    assets = build_assets()
    pq.write_table(
        pa.table({
            "asset_id": pa.array([a for a, _ in assets],
                                 type=pa.int64()),
            "payload": pa.array([p for _, p in assets],
                                type=pa.binary()),
        }),
        os.path.join(OUT, "media_assets.parquet"),
        compression="zstd")

    # expected rows via the local (non-Spark) decode path — the same
    # functions decode_media_summary dispatches to per Arrow batch
    rows = {k: [] for k in ("asset_id", "codec", "kind", "d1", "d2",
                            "n_units", "content_sha")}
    for aid, payload in assets:
        codec, kind = mm.sniff_codec(payload)
        if kind == "image":
            img = mm.decode_image(payload)
            h, w, c = img.shape
            d1, d2, n = w, h, c
            sha = hashlib.sha256(
                np.ascontiguousarray(img).tobytes())
        elif kind == "audio":
            frames, rate = mm.decode_audio(payload)
            d1, d2, n = rate, frames.shape[1], len(frames)
            sha = hashlib.sha256(np.ascontiguousarray(
                frames.astype("<i2")).tobytes())
        else:
            vframes, _fps = mm.decode_video(payload)
            stack = np.stack(vframes)
            d1, d2, n = stack.shape[2], stack.shape[1], stack.shape[0]
            sha = hashlib.sha256(
                np.ascontiguousarray(stack).tobytes())
        rows["asset_id"].append(aid)
        rows["codec"].append(codec)
        rows["kind"].append(kind)
        rows["d1"].append(d1)
        rows["d2"].append(d2)
        rows["n_units"].append(n)
        rows["content_sha"].append(sha.hexdigest())
    pdf = pd.DataFrame(rows)
    pq.write_table(
        pa.Table.from_pandas(pdf, preserve_index=False)
        .cast(pa.schema([("asset_id", pa.int64()),
                         ("codec", pa.string()),
                         ("kind", pa.string()),
                         ("d1", pa.int64()),
                         ("d2", pa.int64()),
                         ("n_units", pa.int64()),
                         ("content_sha", pa.string())])),
        os.path.join(OUT, "media_expected.parquet"),
        compression="zstd")
    print(pdf.to_string(index=False))


if __name__ == "__main__":
    main()

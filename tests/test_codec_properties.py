"""Property/fuzz tests for the pure-numpy media codecs.

Two invariants the battery's fixed fixtures can't pin:
- ROUNDTRIP: encode(decode-able input) -> decode is exact for every
  lossless codec over arbitrary shapes/contents (PNG all color types x
  filters, GIF palettes, WAV all depths, Y4M chroma modes).
- TOTALITY: decoders NEVER raise on arbitrary bytes — inside an
  Arrow-batched mapInPandas worker an exception aborts the whole job,
  so corrupt blobs must decline (None), not throw. The fuzzer mutates
  REAL encoded files (flips/truncations/splices), which reaches far
  deeper than random bytes.
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from dbt_extrica_spark.extensions import gif as G
from dbt_extrica_spark.extensions import jpeg as J
from dbt_extrica_spark.extensions import multimodal as mm

_dims = st.integers(min_value=1, max_value=33)


@settings(max_examples=25, deadline=None)
@given(h=_dims, w=_dims, ch=st.sampled_from([1, 2, 3, 4]),
       fmode=st.sampled_from(["none", "cycle"]), seed=st.integers(0, 10**6))
def test_png_roundtrip_any_shape(h, w, ch, fmode, seed):
    rng = np.random.RandomState(seed)
    shape = (h, w) if ch == 1 else (h, w, ch)
    px = rng.randint(0, 256, size=shape).astype(np.uint8)
    out = mm.decode_png_numpy(mm.encode_png(px, filter_mode=fmode))
    assert out is not None and np.array_equal(out, px)


@settings(max_examples=25, deadline=None)
@given(h=_dims, w=_dims, n_colors=st.integers(1, 256),
       interlace=st.booleans(), seed=st.integers(0, 10**6))
def test_gif_roundtrip_any_palette(h, w, n_colors, interlace, seed):
    rng = np.random.RandomState(seed)
    pal = rng.randint(0, 256, size=(n_colors, 3)).astype(np.uint8)
    # distinct-color count may be < n_colors after random collisions —
    # irrelevant: encode_gif derives its own palette from the pixels
    img = pal[rng.randint(0, n_colors, size=(h, w))]
    out = G.decode_gif_numpy(G.encode_gif(img, interlace=interlace))
    assert out is not None and np.array_equal(out, img)


@settings(max_examples=25, deadline=None)
@given(n=st.integers(1, 300), ch=st.sampled_from([1, 2]),
       bits=st.sampled_from([8, 16, 24, 32]), seed=st.integers(0, 10**6))
def test_wav_roundtrip_any_depth(n, ch, bits, seed):
    rng = np.random.RandomState(seed)
    if bits == 8:
        s = (rng.randint(-128, 128, size=(n, ch)) << 8).astype(np.int16)
    elif bits == 16:
        s = rng.randint(-(1 << 15), 1 << 15, size=(n, ch)).astype(np.int16)
    elif bits == 24:
        s = rng.randint(-(1 << 23), 1 << 23, size=(n, ch)).astype(np.int32)
    else:
        s = rng.randint(-(1 << 31), (1 << 31) - 1,
                        size=(n, ch), dtype=np.int64).astype(np.int32)
    got, rate = mm.decode_audio_numpy(mm.encode_wav(s, 22050, bits=bits))
    assert rate == 22050 and np.array_equal(got, s)


@settings(max_examples=15, deadline=None)
@given(w=st.integers(1, 8).map(lambda x: 2 * x),
       h=st.integers(1, 8).map(lambda x: 2 * x),
       chroma=st.sampled_from(["420", "422", "444"]),
       n_frames=st.integers(1, 3), seed=st.integers(0, 10**6))
def test_y4m_roundtrip_any_chroma(w, h, chroma, n_frames, seed):
    rng = np.random.RandomState(seed)
    cx, cy = {"420": (2, 2), "422": (2, 1), "444": (1, 1)}[chroma]
    frames = [
        (rng.randint(0, 256, size=(h, w)).astype(np.uint8),
         rng.randint(0, 256, size=(h // cy, w // cx)).astype(np.uint8),
         rng.randint(0, 256, size=(h // cy, w // cx)).astype(np.uint8))
        for _ in range(n_frames)
    ]
    dec = mm.decode_video_numpy(mm.encode_y4m(frames, w, h, chroma=chroma))
    assert dec is not None
    got, gw, gh = dec
    assert (gw, gh, len(got)) == (w, h, n_frames)
    for (y, u, v), (gy, gu, gv) in zip(frames, got):
        assert np.array_equal(gy, y) and np.array_equal(gu, u) \
            and np.array_equal(gv, v)


# the closed IDCT reference the progressive entropy layer is verified
# against — the SAME function the battery oracle uses (one copy of the
# contract formula; a drift between test and oracle references would
# otherwise go unnoticed)
_idct_ref = J.idct_pixels_ref


_PROG_LADDER = [((0,), 0, 0, 0, 2), ((0,), 1, 20, 0, 2),
                ((0,), 21, 63, 0, 2),
                ((0,), 0, 0, 2, 1), ((0,), 1, 20, 2, 1),
                ((0,), 21, 63, 2, 1),
                ((0,), 0, 0, 1, 0), ((0,), 1, 20, 1, 0),
                ((0,), 21, 63, 1, 0)]


@settings(max_examples=60, deadline=None)
@given(nby=st.integers(1, 4), nbx=st.integers(1, 4),
       seed=st.integers(0, 10**6), ri=st.integers(0, 4))
def test_progressive_jpeg_coef_roundtrip(nby, nbx, seed, ri):
    # sparse random coefficients through a full successive-approximation
    # ladder (Al 2 -> 1 -> 0) with spectral selection: the decode must
    # equal the direct IDCT bit-for-bit — this exercises DC first +
    # refinement, AC first with EOBRUN/ZRL, and AC refinement correction
    # bits, with and without restart markers
    rng = np.random.RandomState(seed)
    coefs = np.zeros((nby, nbx, 64), np.int64)
    for b in range(nby * nbx):
        nnz = rng.randint(0, 24)
        idx = rng.choice(64, nnz, replace=False)
        coefs[b // nbx, b % nbx, idx] = rng.randint(-200, 201, nnz)
    data = J.encode_jpeg_progressive_coefs(
        [coefs], nby * 8, nbx * 8, [(1, 1)], _PROG_LADDER,
        restart_interval=ri)
    out = J.decode_jpeg_numpy(data)
    assert out is not None
    assert np.array_equal(out, _idct_ref(coefs))


def test_progressive_jpeg_blockmean_gray_bitexact():
    rng = np.random.RandomState(3)
    for _ in range(6):
        block = np.repeat(np.repeat(
            rng.randint(0, 256, size=(3, 3)).astype(np.uint8), 8, 0), 8, 1)
        out = J.decode_jpeg_numpy(J.encode_jpeg_progressive_blockmean(block))
        assert out is not None and np.array_equal(out, block)


def test_progressive_jpeg_blockmean_color_420_formula():
    rng = np.random.RandomState(4)
    for _ in range(4):
        block = np.repeat(np.repeat(
            rng.randint(0, 256, size=(2, 2, 3)).astype(np.uint8), 16, 0),
            16, 1)
        out = J.decode_jpeg_numpy(
            J.encode_jpeg_progressive_blockmean(block, subsample="420"))
        assert out is not None
        assert np.array_equal(out, J.rgb_blockmean_roundtrip(block))


def test_progressive_jpeg_battery_ac_family_bitexact():
    """The battery's nonzero-AC progressive fixture family (r11): every
    image must decode bit-for-bit to the closed IDCT of its shared
    coefficients, and the family must actually carry the AC paths the
    DC-only blockmean fixtures miss — newly-significant coefficients at
    Al=0 (|v| == 1) and refinement correction bits (odd |v| >= 3)."""
    newsig = corr = 0
    for i in range(24):
        coefs = mm.jpeg_prog_ac_coefs(i)
        data = J.encode_jpeg_progressive_coefs(
            [coefs], 16, 16, [(1, 1)], J.default_progressive_script(1),
            restart_interval=i % 3)
        out = J.decode_jpeg_numpy(data)
        assert out is not None and np.array_equal(out, _idct_ref(coefs))
        ac = np.abs(coefs.reshape(-1, 64)[:, 1:])
        newsig += int((ac == 1).sum())
        corr += int(((ac >= 3) & (ac % 2 == 1)).sum())
    assert newsig > 0 and corr > 0, (newsig, corr)


def test_progressive_jpeg_band_edges_and_all_zero():
    # a lone coefficient at every band boundary, and the all-zero image
    # (maximal EOBRUN): positions are ZIGZAG indices
    for pos in (1, 17, 40, 62, 63):
        coefs = np.zeros((2, 2, 64), np.int64)
        for b in range(4):
            coefs[b // 2, b % 2, J._ZIGZAG[pos]] = 33 if b % 2 else -33
        script = [((0,), 0, 0, 0, 1), ((0,), 1, 63, 0, 1),
                  ((0,), 0, 0, 1, 0), ((0,), 1, 63, 1, 0)]
        out = J.decode_jpeg_numpy(J.encode_jpeg_progressive_coefs(
            [coefs], 16, 16, [(1, 1)], script))
        assert out is not None and np.array_equal(out, _idct_ref(coefs))
    zero = np.zeros((8, 8, 64), np.int64)
    script = [((0,), 0, 0, 0, 1), ((0,), 1, 63, 0, 1),
              ((0,), 0, 0, 1, 0), ((0,), 1, 63, 1, 0)]
    out = J.decode_jpeg_numpy(J.encode_jpeg_progressive_coefs(
        [zero], 64, 64, [(1, 1)], script))
    assert out is not None and np.array_equal(out, _idct_ref(zero))


def _seed_blobs():
    """Real encoded files of every format — the fuzz corpus."""
    rng = np.random.RandomState(0)
    rgb = rng.randint(0, 256, size=(16, 16, 3)).astype(np.uint8)
    gray = rgb[:, :, 0]
    block = np.repeat(np.repeat(rgb[:2, :2], 8, axis=0), 8, axis=1)
    pal = rgb.reshape(-1, 3)[:8]
    gif_img = pal[rng.randint(0, 8, size=(16, 16))]
    wav = (np.arange(200, dtype=np.int16) * 331) % 20000 - 10000
    y4m = [(gray, gray[::2, ::2], gray[::2, ::2])]
    return [
        mm.encode_ppm(rgb), mm.encode_ppm(gray), mm.encode_png(rgb),
        mm.encode_png(gray), J.encode_jpeg_blockmean(block),
        J.encode_jpeg_blockmean(block, subsample="420"),
        G.encode_gif(gif_img), mm.encode_wav(wav),
        mm.encode_wav(wav, bits=24), mm.encode_y4m(y4m, 16, 16),
        mm.encode_tiff(rgb, packbits=True, rows_per_strip=4),
        mm.encode_tiff(gray, big_endian=True),
        J.encode_jpeg_progressive_blockmean(block),
        J.encode_jpeg_progressive_blockmean(block, subsample="420"),
    ]


@settings(max_examples=120, deadline=None)
@given(blob_i=st.integers(0, 13), op=st.sampled_from(["flip", "trunc",
                                                     "splice", "extend"]),
       a=st.integers(0, 10**6), b=st.integers(0, 255))
def test_decoders_never_raise_on_mutated_files(blob_i, op, a, b):
    blob = bytearray(_seed_blobs()[blob_i])
    if op == "flip" and blob:
        blob[a % len(blob)] ^= (b or 1)
    elif op == "trunc":
        blob = blob[:a % (len(blob) + 1)]
    elif op == "splice" and blob:
        at = a % len(blob)
        blob = blob[:at] + bytes([b]) * 7 + blob[at:]
    else:
        blob = blob + bytes([b]) * (a % 64)
    content = bytes(blob)
    # totality: every decoder returns a value or None — NEVER raises
    # (one corrupt blob must not abort a mapInPandas partition)
    mm.decode_image_numpy(content)
    mm.decode_audio_numpy(content)
    mm.decode_video_numpy(content)
    G.decode_gif_frames(content)
    J.decode_jpeg_numpy(content)
    mm.decode_png_numpy(content)


def test_decoders_never_raise_on_random_bytes():
    rng = np.random.RandomState(42)
    sigs = [b"", b"P6", b"P5", b"BM", b"\x89PNG\r\n\x1a\n", b"\xff\xd8",
            b"GIF89a", b"RIFF", b"YUV4MPEG2 ", b"II*\x00", b"MM\x00*"]
    for i in range(200):
        junk = sigs[i % len(sigs)] + bytes(
            rng.randint(0, 256, size=i % 97, dtype=np.uint8).tolist())
        mm.decode_image_numpy(junk)
        mm.decode_audio_numpy(junk)
        mm.decode_video_numpy(junk)
        G.decode_gif_frames(junk)
        J.decode_jpeg_numpy(junk)

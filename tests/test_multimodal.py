"""Multimodal plumbing invariants: schema, determinism, stub gating,
frame-sampling bounds."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from nano_vectordb_spark.operators import multimodal as mm
from tests.conftest import SF_CORRECT


def _docs(spark):
    return spark.read.parquet(f"{SF_CORRECT}/documents.parquet").limit(50)


def test_features_schema_and_determinism(spark):
    d = mm.attach_blob(_docs(spark))
    f1 = mm.extract_features(d, dim=16)
    rows = f1.orderBy("doc_id").collect()
    assert f1.schema.simpleString() == (
        "struct<doc_id:bigint,width:int,height:int,byte_len:int,features:array<double>>"
    )
    for r in rows:
        assert len(r.features) == 16
        assert abs(math.sqrt(sum(x * x for x in r.features)) - 1.0) < 1e-9
        assert 16 <= r.width < 80 and 16 <= r.height < 80
    rows2 = mm.extract_features(d, dim=16).orderBy("doc_id").collect()
    assert [tuple(r) for r in rows] == [tuple(r) for r in rows2]


def test_byte_len_matches_text(spark):
    d = mm.attach_blob(_docs(spark))
    f = mm.extract_features(d, dim=8)
    joined = f.join(_docs(spark), "doc_id").filter(
        F.col("byte_len") != F.length("text")
    )
    assert joined.count() == 0  # ascii corpus: bytes == chars


def test_real_decoder_is_stubbed(spark):
    d = mm.attach_blob(_docs(spark))
    with pytest.raises(NotImplementedError, match="decoder"):
        mm.extract_features(d, decoder="real")


def test_frame_sample_bounds(spark):
    d = mm.attach_blob(_docs(spark))
    frames = mm.frame_sample(d, n_frames=4)
    assert frames.filter(F.col("frame_id") >= 4).count() == 0
    assert frames.filter(F.length("frame_bytes") == 0).count() == 0
    # every doc produces at least one frame
    assert frames.select("doc_id").distinct().count() == 50


def test_byte_histogram_signature_values(spark):
    from nano_vectordb_spark.operators import multimodal as mm

    df = spark.createDataFrame(
        [(1, "AAAa"), (2, "")], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: r
        for r in mm.byte_histogram_signatures(mm.attach_blob(df)).collect()
    }
    # 'A' = 0x41 (nibble 4) x3, 'a' = 0x61 (nibble 6) x1
    assert out[1]["byte_len"] == 4
    want = [0] * 16
    want[4], want[6] = 3, 1
    assert out[1]["hist"] == want
    assert out[2]["byte_len"] == 0 and out[2]["hist"] == [0] * 16


def test_multimodal_neardup_finds_bucket_boundary_pair(spark, tmp_path):
    """Two near-identical blobs straddling a length-bucket boundary
    (len 63 vs 65) must still pair — the +1-bucket probe's reason to
    exist — and an unrelated doc must not."""
    from nano_vectordb_spark import registry

    a = "x" * 63
    b = "x" * 63 + "yy"          # len 65, L1 = 2 (one extra nibble-7 pair)
    c = "Q" * 200                # different bucket and histogram
    rows = [
        (0, a, "en", "s", len(a)),
        (1, b, "en", "s", len(b)),
        (2, c, "en", "s", len(c)),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = [
        (r["doc_id_a"], r["doc_id_b"], r["l1_dist"], r["len_diff"])
        for r in registry.REGISTRY["multimodal_neardup"]
        .fn(spark, str(tmp_path))
        .collect()
    ]
    assert out == [(0, 1, 2, 2)]


# ---------------------------------------------------------------------------
# REAL uncompressed codecs (round-3 verdict item 8): RIFF/WAVE and PPM
# ---------------------------------------------------------------------------


def test_wav_roundtrip_8bit_exact():
    data = bytes(range(256))
    wav = mm.wav_encode(data, sample_rate=8000, bits=8)
    n, rate, ch, bits, smp = mm._wav_decode(wav)
    assert (n, rate, ch, bits) == (256, 8000, 1, 8)
    assert len(wav) == 44 + 256
    for i, s in enumerate(smp):
        assert s == (i - 128) / 128.0  # exact dyadic rationals


def test_wav_roundtrip_16bit_exact():
    vals = [-32768, -1, 0, 1, 32767, 12345]
    wav = mm.wav_encode(vals, sample_rate=44100, bits=16)
    n, rate, ch, bits, smp = mm._wav_decode(wav)
    assert (n, rate, ch, bits) == (len(vals), 44100, 1, 16)
    assert [s * 32768.0 for s in smp] == [float(v) for v in vals]


def test_wav_decoder_walks_extra_chunks():
    """Real WAV files carry LIST/fact/odd-sized chunks between fmt and
    data — the parser must walk past them (word-aligned)."""
    import struct

    base = mm.wav_encode(b"abc", bits=8)
    fmt_chunk = base[12:36]
    data_chunk = base[36:]
    extra = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"  # odd+pad
    body = fmt_chunk + extra + data_chunk
    wav = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
    n, rate, ch, bits, smp = mm._wav_decode(wav)
    assert n == 3 and bits == 8


@pytest.mark.parametrize(
    "blob, err",
    [
        (b"RIFX" + b"\x00" * 40, "RIFF"),
        (b"RIFF\x24\x00\x00\x00WAVE", "fmt"),  # no chunks at all
    ],
)
def test_wav_decoder_rejects_garbage(blob, err):
    with pytest.raises(ValueError, match=err):
        mm._wav_decode(blob)


def test_ppm_roundtrip_with_comment():
    hdr = b"P6\n# a comment line\n3 2\n255\n"
    pixels = bytes(range(18))  # 3x2 RGB
    w, h, maxval, arr = mm._ppm_decode(hdr + pixels)
    assert (w, h, maxval) == (3, 2, 255)
    assert arr.shape == (6, 3)
    assert list(arr[0]) == [0, 1, 2] and list(arr[5]) == [15, 16, 17]


def test_ppm_rejects_non_p6():
    with pytest.raises(ValueError, match="P6"):
        mm._ppm_decode(b"P3\n1 1\n255\n\x00\x00\x00")


def test_extract_features_wav_decoder(spark):
    """decoder='wav' over real WAV payloads: width=n_samples,
    height=sample_rate, features = per-bucket RMS energies."""
    rows = [(i, mm.wav_encode(bytes([128 + (i * 7 + j) % 64 for j in range(100)]), 8000, 8)) for i in range(5)]
    df = spark.createDataFrame(rows, "doc_id long, blob binary")
    out = mm.extract_features(df, dim=4, decoder="wav").orderBy("doc_id").collect()
    assert len(out) == 5
    for r in out:
        assert r.width == 100 and r.height == 8000
        assert r.byte_len == 144
        assert len(r.features) == 4 and all(f >= 0 for f in r.features)


def test_extract_features_ppm_decoder(spark):
    blob = b"P6\n2 2\n255\n" + bytes([255] * 6 + [0] * 6)
    df = spark.createDataFrame([(1, blob)], "doc_id long, blob binary")
    r = mm.extract_features(df, dim=2, decoder="ppm").collect()[0]
    assert (r.width, r.height) == (2, 2)
    # two white pixels in the top bucket... (lum=1 clamps to last bucket)
    assert r.features == [0.5, 0.5]


# --- PNG codec (r5 VERDICT item 6: stdlib zlib + full defilter) -------


def _rng_pixels(w, h, seed=7):
    import numpy as np

    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(w * h, 3), dtype=np.uint8)


@pytest.mark.parametrize(
    "mode", ["none", "sub", "up", "average", "paeth", "adaptive"]
)
def test_png_roundtrip_every_filter(mode):
    """Every scanline filter type (and the adaptive MSAD selection)
    must decode back to the exact pixels."""
    import numpy as np

    w, h = 13, 9  # odd sizes exercise stride edges
    px = _rng_pixels(w, h)
    blob = mm.png_encode(w, h, px, filter_mode=mode)
    gw, gh, maxval, got = mm._png_decode(blob)
    assert (gw, gh, maxval) == (w, h, 255)
    assert np.array_equal(got, px)


def test_png_gradient_prefers_nontrivial_filters():
    """A smooth gradient compresses via Sub/Up/Paeth — assert the
    adaptive encoder actually picked a non-None filter somewhere (the
    defilter loop is exercised, not just filter 0) and that the payload
    beats the raw size."""
    import numpy as np

    w, h = 32, 16
    r = np.arange(w * h, dtype=np.uint8).reshape(-1, 1)
    px = np.hstack([r, r // 2, 255 - r]).astype(np.uint8)
    blob = mm.png_encode(w, h, px, filter_mode="adaptive")
    filters = set()
    import struct
    import zlib

    pos = len(mm._PNG_SIG)
    while pos + 8 <= len(blob):
        size = struct.unpack_from(">I", blob, pos)[0]
        tag = blob[pos + 4 : pos + 8]
        if tag == b"IDAT":
            raw = zlib.decompress(blob[pos + 8 : pos + 8 + size])
            stride = w * 3 + 1
            filters = {raw[y * stride] for y in range(h)}
        pos += 12 + size
    assert filters - {0}, "adaptive encoder never chose a real filter"
    assert len(blob) < w * h * 3
    _, _, _, got = mm._png_decode(blob)
    assert np.array_equal(got, px)


def test_png_grayscale_and_crc_reject():
    """Color type 0 decodes with channels replicated; a corrupted byte
    fails the CRC check loudly instead of yielding wrong pixels."""
    import struct
    import zlib

    import numpy as np

    w, h = 5, 4
    gray = np.arange(w * h, dtype=np.uint8)
    raw = b"".join(b"\x00" + gray[y * w : (y + 1) * w].tobytes() for y in range(h))

    def chunk(tag, body):
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    blob = (
        mm._PNG_SIG
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    gw, gh, maxval, px = mm._png_decode(blob)
    assert (gw, gh) == (w, h)
    assert np.array_equal(px[:, 0], gray) and np.array_equal(px[:, 1], gray)

    bad = bytearray(blob)
    bad[len(mm._PNG_SIG) + 8] ^= 0xFF  # flip a byte inside IHDR
    with pytest.raises(ValueError, match="CRC"):
        mm._png_decode(bytes(bad))


def test_png_truncation_raises_valueerror():
    """r6 ADVICE: a truncated blob or corrupt IDAT must raise the same
    ValueError contract as the other malformed-input paths, never
    struct.error / zlib.error."""
    import struct
    import zlib

    import numpy as np

    w, h = 4, 3
    px = np.arange(w * h * 3, dtype=np.uint8).reshape(w * h, 3)
    blob = mm.png_encode(w, h, px)
    # truncate into the IDAT CRC (cut the 12-byte IEND plus one byte):
    # the declared chunk length now runs past the blob
    with pytest.raises(ValueError, match="truncated PNG"):
        mm._png_decode(blob[:-13])
    # corrupt IDAT bytes with a recomputed CRC: chunk walk passes, the
    # inflate fails -> ValueError, not zlib.error
    pos = len(mm._PNG_SIG)
    size = struct.unpack_from(">I", blob, pos)[0]
    pos += 12 + size  # skip IHDR -> IDAT header
    size = struct.unpack_from(">I", blob, pos)[0]
    assert blob[pos + 4 : pos + 8] == b"IDAT"
    body = bytearray(blob[pos + 8 : pos + 8 + size])
    body[0] ^= 0xFF
    rebuilt = (
        blob[: pos + 4]
        + b"IDAT"
        + bytes(body)
        + struct.pack(">I", zlib.crc32(b"IDAT" + bytes(body)) & 0xFFFFFFFF)
        + blob[pos + 12 + size :]
    )
    with pytest.raises(ValueError, match="corrupt IDAT"):
        mm._png_decode(rebuilt)


def test_png_matches_ppm_stats_contract():
    """The PNG path must produce byte-identical features to the PPM
    path on the same pixels — the shared (w, h, maxval, pixels)
    contract that lets the r8 registry entry reuse the PPM oracle
    shape."""
    import numpy as np

    w, h = 8, 6
    px = _rng_pixels(w, h, seed=11)
    png_blob = mm.png_encode(w, h, px)
    ppm_blob = b"P6\n%d %d\n255\n" % (w, h) + px.tobytes()
    f_png = mm._ppm_features(mm._png_decode(png_blob)[3], 255, 4)
    f_ppm = mm._ppm_features(mm._ppm_decode(ppm_blob)[3], 255, 4)
    assert f_png == f_ppm


def test_extract_features_png_decoder(spark):
    """decoder='png' through the Arrow mapInPandas plumbing."""
    import numpy as np

    w, h = 6, 5
    px = _rng_pixels(w, h, seed=3)
    blob = mm.png_encode(w, h, px)
    df = spark.createDataFrame([(1, bytearray(blob))], "doc_id long, blob binary")
    r = mm.extract_features(df, dim=4, decoder="png").collect()[0]
    assert (r.width, r.height) == (w, h)
    assert abs(sum(r.features) - 1.0) < 1e-12


def test_multimodal_png_stats_vs_oracle(spark, duck):
    """The PNG registry entry, run through the exact driver-gate
    comparison: the compressed round-trip must hash-match the shared
    pixel-stats oracle (queued in r6-r7; REGISTERED in r8 inside the
    gate window, per the standing rotation rule)."""
    from nano_vectordb_spark import registry
    from nano_vectordb_spark.registry_parts.p08_streaming_multimodal import (
        _SQL_MM_PNG,
        multimodal_png_stats,
    )
    from tests.conftest import SF_CORRECT
    from tests.oracle_harness import compare

    assert "multimodal_png_stats" in registry.GATE_BASKET_R8_NEW
    df = multimodal_png_stats(spark, SF_CORRECT)
    ok, msg = compare(df, duck, _SQL_MM_PNG)
    assert ok, msg


def test_jpeg_roundtrip_quality_and_determinism():
    """Baseline JPEG (T.81 sequential, 4:4:4, Annex K tables): decoded
    pixels must be CLOSE (it's the spec's own lossy quantization, not
    a bug) and the encode/decode pair must be bit-deterministic."""
    import numpy as np

    for w, h in ((8, 8), (16, 16), (24, 16), (17, 9)):
        px = _rng_pixels(w, h, seed=w * 100 + h)
        blob = mm.jpeg_encode(w, h, px, quality=90)
        gw, gh, maxval, got = mm._jpeg_decode(blob)
        assert (gw, gh, maxval) == (w, h, 255)
        err = np.abs(got.astype(np.int64) - px.astype(np.int64)).astype(float)
        mse = float((err**2).mean())
        psnr = 10.0 * np.log10(255.0**2 / mse) if mse else float("inf")
        # worst case for DCT coding is exactly this kind of noise
        # image; q90 noise lands ~29-31 dB, smooth content ~48 dB
        assert psnr >= 26.0, (w, h, psnr)
        assert mm.jpeg_encode(w, h, px, quality=90) == blob
        assert np.array_equal(mm._jpeg_decode(blob)[3], got)


def test_jpeg_quality_ladder_monotone():
    """Higher quality -> lower reconstruction error (the quant-table
    scaling contract) and a larger payload."""
    import numpy as np

    w, h = 16, 16
    px = _rng_pixels(w, h, seed=11)
    errs, sizes = [], []
    for q in (25, 50, 90):
        blob = mm.jpeg_encode(w, h, px, quality=q)
        got = mm._jpeg_decode(blob)[3]
        errs.append(float(np.abs(got.astype(int) - px.astype(int)).mean()))
        sizes.append(len(blob))
    assert errs[0] > errs[1] > errs[2]
    assert sizes[0] < sizes[2]


def test_jpeg_smooth_content_high_fidelity():
    """Gradient content (the DCT's favorable case) must reconstruct
    near-exactly at q90 — max error within a few levels."""
    import numpy as np

    w, h = 16, 16
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    base = (xx * 3 + yy * 5) % 256
    px = (
        np.stack([base, 255 - base, (base * 2) % 256], axis=-1)
        .astype(np.uint8)
        .reshape(-1, 3)
    )
    blob = mm.jpeg_encode(w, h, px, quality=90)
    got = mm._jpeg_decode(blob)[3]
    assert int(np.abs(got.astype(int) - px.astype(int)).max()) <= 4


def test_jpeg_malformed_inputs_raise():
    import numpy as np

    px = _rng_pixels(8, 8)
    blob = mm.jpeg_encode(8, 8, px)
    with pytest.raises(ValueError, match="SOI"):
        mm._jpeg_decode(b"\x00\x01" + blob)
    # truncated entropy stream
    with pytest.raises(ValueError):
        mm._jpeg_decode(blob[:-20])
    with pytest.raises(ValueError, match="quality"):
        mm.jpeg_encode(8, 8, px, quality=0)


def test_mp3_frame_walk_roundtrip():
    """mp3_encode_frames -> mp3_parse structural parity: frame count,
    tables, VBR stats, padding-aware lengths, ID3v2 skip."""
    blob = mm.mp3_encode_frames([9, 12, 9, 4], sr_idx=0, id3_bytes=17)
    st = mm.mp3_parse(blob)
    assert st["n_frames"] == 4
    assert st["sample_rate"] == 44100
    assert st["bitrate_min"] == 56 and st["bitrate_max"] == 224
    assert st["bitrate_sum"] == 128 + 224 + 128 + 56
    assert st["is_cbr"] is False
    assert st["id3_bytes"] == 17
    assert st["total_bytes"] == len(blob)
    assert st["duration_ms"] == round(4 * 1152 * 1000.0 / 44100, 3)
    # CBR stream
    st2 = mm.mp3_parse(mm.mp3_encode_frames([9, 9, 9]))
    assert st2["is_cbr"] is True and st2["n_frames"] == 3
    # frame length honors the padding bit: unpadded/padded differ by 1
    one_pad = mm.mp3_encode_frames([9], pad_rule=lambda f: 1)
    no_pad = mm.mp3_encode_frames([9], pad_rule=lambda f: 0)
    assert len(one_pad) == len(no_pad) + 1
    assert mm.mp3_frame_len(128, 44100, 0) == 417


def test_mp3_malformed_streams_raise():
    good = mm.mp3_encode_frames([9, 9])
    with pytest.raises(ValueError, match="sync"):
        mm.mp3_parse(b"\x00\x01" + good)
    with pytest.raises(ValueError, match="truncated"):
        mm.mp3_parse(good[:-10])
    with pytest.raises(ValueError, match="no MPEG audio frames"):
        mm.mp3_parse(b"")
    # reserved sample-rate index
    bad = bytearray(good)
    bad[2] = (bad[2] & ~0x0C) | (0b11 << 2)
    with pytest.raises(ValueError, match="sample-rate"):
        mm.mp3_parse(bytes(bad))
    # forbidden bitrate index
    bad = bytearray(good)
    bad[2] = (bad[2] & 0x0F) | (15 << 4)
    with pytest.raises(ValueError, match="bitrate"):
        mm.mp3_parse(bytes(bad))
    # MPEG-2 version bits rejected
    bad = bytearray(good)
    bad[1] = (bad[1] & ~0x18) | (0b10 << 3)
    with pytest.raises(ValueError, match="MPEG-1"):
        mm.mp3_parse(bytes(bad))
    # non-syncsafe ID3 size byte
    with pytest.raises(ValueError, match="syncsafe"):
        mm.mp3_parse(b"ID3" + bytes((4, 0, 0, 0x80, 0, 0, 0)) + good)


def test_jpeg_foreign_stream_marker_forms():
    """ADVICE r9: foreign baseline streams may pad 0xFF fill bytes
    before a marker (T.81 B.1.1.2) — the walk must skip them and decode
    identically; standalone markers (TEM, RSTn) carry no length segment
    and must be rejected with a CLEAN unsupported-feature error, not a
    misleading alignment error."""
    import numpy as np

    px = _rng_pixels(8, 8, seed=7)
    blob = mm.jpeg_encode(8, 8, px)
    want = mm._jpeg_decode(blob)[3]
    # inject fill bytes before the first post-SOI marker (an APP/DQT)
    padded = blob[:2] + b"\xFF\xFF\xFF" + blob[2:]
    assert np.array_equal(mm._jpeg_decode(padded)[3], want)
    # a TEM standalone marker spliced into the header region
    tem = blob[:2] + b"\xFF\x01" + blob[2:]
    with pytest.raises(ValueError, match="standalone marker"):
        mm._jpeg_decode(tem)
    # an RSTn marker likewise
    rst = blob[:2] + b"\xFF\xD3" + blob[2:]
    with pytest.raises(ValueError, match="standalone marker"):
        mm._jpeg_decode(rst)


def test_extract_features_jpeg_decoder(spark):
    """decoder='jpeg' through the Arrow mapInPandas plumbing."""
    w, h = 8, 8
    px = _rng_pixels(w, h, seed=3)
    blob = mm.jpeg_encode(w, h, px)
    df = spark.createDataFrame([(1, bytearray(blob))], "doc_id long, blob binary")
    r = mm.extract_features(df, dim=4, decoder="jpeg").collect()[0]
    assert (r.width, r.height) == (w, h)
    assert abs(sum(r.features) - 1.0) < 1e-12


def test_multimodal_jpeg_stats_vs_oracle(spark, duck):
    """The JPEG registry entry through the exact driver-gate
    comparison (registered r9 — closes the last compressed-codec
    slot, r8 VERDICT item 6)."""
    from nano_vectordb_spark import registry
    from nano_vectordb_spark.registry_parts.p17_r9_wave import (
        _SQL_MM_JPEG,
        multimodal_jpeg_stats,
    )
    from tests.conftest import SF_CORRECT
    from tests.oracle_harness import compare

    assert "multimodal_jpeg_stats" in registry.GATE_BASKET_R9_NEW
    df = multimodal_jpeg_stats(spark, SF_CORRECT)
    ok, msg = compare(df, duck, _SQL_MM_JPEG)
    assert ok, msg


# r13: the JPEG codec hot paths were vectorized (batched DCT/IDCT +
# quantization, fused Huffman writes, 16-bit-window LUT entropy decode).
# These digests were captured from the PRE-rewrite encoder/decoder on
# adversarial fixtures (noise at several sizes incl. non-multiples of 8,
# four qualities, smooth gradients, constant blocks, checkerboard) — the
# rewrite must stay byte-identical on blobs AND decoded pixels.
_JPEG_PARITY_CASES = [
    (16, 16, 10, 'c993a1c006142436c5675a58a70d833c', '1ad3431971d680b322bdea73ca38dadf', '68dbb5e3365a2c827901813c3119f02f'),
    (16, 16, 50, '3ab2728f744af6d14f571df54cbe8a14', '8ad991f84d884bed1d32f0c6be09859a', 'b71bceb520e131ab1afb1a93604abfdc'),
    (16, 16, 90, '92ed43a209fd3ac97b50d36a4e17277d', '653ba5a346ed0e7531053066db75d70c', '53fea7f3a2d5334f0285aa7fd32c5ce7'),
    (16, 16, 95, '816f71f3a64861d70be6d32d310559f7', 'a427ec2b184f51513c6a839a4d2bb79d', 'f08bf69970c34720e8aef43bdbe83bb4'),
    (8, 8, 10, 'f93254b424cf0338f6f9eb7c0476d1d0', 'bd7a194d8074786ac0640a745581bd7e', '897cbb12e5a84f7006098b05041250a5'),
    (8, 8, 50, 'f7a9925989fb228b5f71e5ae7d240703', '468b664725249c4d2e430b51197d9a99', '23c541f269bf4d2a7bb63c2fc2c6e045'),
    (8, 8, 90, 'b69d4d84032cfadca805b69ee9f6d9cd', '8e2b3c8374f0eb4581dac24e1695fa54', '0d2ac5b7fcbfae41ef2771b9a0b6f929'),
    (8, 8, 95, '8e84b399862deec3e555a9fbc3f4f4ed', 'b4cbd3163fb59c694296ea4536ccc873', '46386acc44dea0f012d7c3a742a9ceca'),
    (24, 16, 10, '52d3abfde1cca4f2583c9105fa14921e', '9066683ec9cb3d59d82bc70a57ec936f', 'd41dab9ae75ea70c33d510d4f1131656'),
    (24, 16, 50, 'c14b950bea9d23977c9be41cd52fc09b', '07fb8c81eba0d2eda8b7abafbb06ecf2', '496e4052ce919081d4c7229c56ffb717'),
    (24, 16, 90, 'c2edc96d1ea95ac8884dd89fa7a226e5', '6043be95a13579d3caf9798b9f7fba66', '22814d893f0eee3bd039a831c7b05096'),
    (24, 16, 95, 'b48843ea3ff214d769d7db457d89f0aa', '9fa0e23f53ce9356aeaa0b90d8925963', '6c860f6b7b20974ed939bdfd8d67acd0'),
    (17, 9, 10, '66e258136e706a30b045d5f6123ae2e0', '5cc4f8e73475daadb3b993ed68db3991', '3feb3ce9b704ca9f7a9848040dcd5c74'),
    (17, 9, 50, '8bd914cd795df50b712f87c16a61669f', '48cf98acc6f3600d3d487667a7f0c588', '8a48d77ca52b177ea8fdf76624d1e37b'),
    (17, 9, 90, 'e4404cd828841a033147bf6d7153e9b6', 'f7d2b5a46d2cecc03d5c4def6256e2be', '871d8ac71d99aa67ede8b4914a6959f8'),
    (17, 9, 95, '85138f5efce061b581818838af4308bb', '53aed4a5057bc56df09941ed2e1abb7c', 'b3b38cc840238bc8b27d9721dd85b2a0'),
    (32, 24, 10, '0627f901f4e2e1ea0ed6f7d34634f858', '4dd0b9f59f80f9df9ce03a5e901f58a4', '566b1aaa200f950cd2352a8ad354e9c9'),
    (32, 24, 50, '6f8af1e1151488b22b9579ed6e3b26e6', '448ca309b4e7c5c8959fed1f66ed149e', 'e99994c00112acffc432f770155a6fd0'),
    (32, 24, 90, '5c9a6b3524b65a873d07fdd00467d8b0', 'dca20b1d4f4ab47ce101b7f958acc666', '24187daa91c590d24b87b82a758978a0'),
    (32, 24, 95, '1464899359cbd4dc05abc63b50ef3119', '61cab695022e756fde295aa6e6b5981b', 'dfcf1448ae05be91fb3e1df9379815e2'),
    (5, 5, 10, '5f6428e40877e2b5acbec8f988f9af58', '4701824f4b15b9f12ba4dd5abc6c4860', '329a8dece319978155563ec8cde96dbf'),
    (5, 5, 50, 'f004ef4bcddc6e88147f57d4fe07d464', 'd5368eda241afe6ec34b4967ef9fc629', '01d3195e2e3a7ef3465a8a31aa86c9f6'),
    (5, 5, 90, 'be0ec6dacbf6b727488e98ba9af5805f', '42ca4855475e508204ca63d001e35d46', '071c885fd9ce74d5ec7df6f6d3c969b6'),
    (5, 5, 95, '652ba569501467516a6496f1cacba94a', '216191da37603c96b5e8d3bc108f60f8', '918f0c001299ae29f4fef647afac8e92'),
    ("grad", 16, 90, 'db1cafcf189663a66e60a68ff26caa0b', 'a6308b6b2b7ea47aefc79a6588b5bb02', '96eef0dc8efd1cb8e0acde044a45febc'),
    ("grad", 24, 50, '9e0b8dc244d02315a9827e45e910f566', '7836fd81875897721314e3a37f75ffd5', 'c21725366ecca4f6ec7057f0d89ade94'),
    ("const", 16, 90, '431df6e02170b6aaa6f0d6097e6b5ac4', '1d15063956838e75181331e9a9ab7097', '431df6e02170b6aaa6f0d6097e6b5ac4'),
    ("checker", 16, 90, 'c189289f8f07da1443838bc2380d5018', '1b913b75a2a53c361d518f77ea9924af', 'adc496429606e011161dc0bca2cd75b3'),
]


def test_jpeg_parity_digests():
    import hashlib

    import numpy as np

    def md5(b):
        return hashlib.md5(b).hexdigest()

    rng = np.random.default_rng(7)
    fixtures = []
    for (w, h) in [(16, 16), (8, 8), (24, 16), (17, 9), (32, 24), (5, 5)]:
        for q in (10, 50, 90, 95):
            px = rng.integers(0, 256, size=(h * w, 3), dtype=np.uint8)
            fixtures.append((w, h, q, px))
    for (w, h, q) in [(16, 16, 90), (24, 24, 50)]:
        yy, xx = np.mgrid[0:h, 0:w]
        g = ((xx * 3 + yy * 2) % 256).astype(np.uint8)
        fixtures.append((w, h, q, np.stack([g, g // 2, 255 - g], axis=-1).reshape(-1, 3)))
    fixtures.append((16, 16, 90, np.full((256, 3), 200, np.uint8)))
    yy, xx = np.mgrid[0:16, 0:16]
    cb = (((xx + yy) % 2) * 255).astype(np.uint8)
    fixtures.append((16, 16, 90, np.stack([cb, cb, cb], axis=-1).reshape(-1, 3)))

    assert len(fixtures) == len(_JPEG_PARITY_CASES)
    for (w, h, q, px), (_a, _b, qq, px_md5, blob_md5, dec_md5) in zip(
        fixtures, _JPEG_PARITY_CASES
    ):
        assert q == qq
        assert md5(px.tobytes()) == px_md5, "fixture generation drifted"
        blob = mm.jpeg_encode(w, h, px, quality=q)
        assert md5(blob) == blob_md5, (w, h, q)
        dw, dh, _mv, dec = mm._jpeg_decode(blob)
        assert (dw, dh) == (w, h)
        assert md5(dec.tobytes()) == dec_md5, (w, h, q)

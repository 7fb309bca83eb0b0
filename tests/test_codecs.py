"""Real PNG/WAV codec tests: spec-level decode against reference byte
constructions, round-trips, and the Spark multimodal stages over them."""

import struct
import zlib

import numpy as np
import pytest

from loongcollector_spark.functions import codecs


def _png_manual(img, filter_type=0):
    """Independent PNG construction (not via encode_png) with a chosen
    filter type per scanline, to test the decoder's unfiltering."""
    h, w, ch = img.shape
    color_type = {1: 0, 3: 2, 4: 6}[ch]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    lines = []
    prev = np.zeros(w * ch, dtype=np.int16)
    for y in range(h):
        cur = img[y].reshape(-1).astype(np.int16)
        if filter_type == 0:
            filt = cur
        elif filter_type == 2:  # Up
            filt = (cur - prev) % 256
        elif filter_type == 1:  # Sub
            left = np.concatenate([np.zeros(ch, dtype=np.int16), cur[:-ch]])
            filt = (cur - left) % 256
        prev = cur
        lines.append(bytes([filter_type]) + bytes(filt.astype(np.uint8)))
    raw = b"".join(lines)

    def chunk(t, b):
        return struct.pack(">I", len(b)) + t + b + struct.pack(
            ">I", zlib.crc32(t + b) & 0xFFFFFFFF
        )

    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("filter_type", [0, 1, 2])
def test_png_decode_filters(filter_type):
    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, (5, 4, 3), dtype=np.uint8)
    data = _png_manual(img, filter_type)
    out = codecs.decode_png(data)
    assert out.shape == (5, 4, 3)
    assert np.array_equal(out, img)


def test_png_roundtrip_all_channels():
    rng = np.random.RandomState(11)
    for ch in (1, 3, 4):
        img = rng.randint(0, 256, (8, 6, ch), dtype=np.uint8)
        assert np.array_equal(codecs.decode_png(codecs.encode_png(img)), img)


def test_wav_roundtrip():
    rng = np.random.RandomState(3)
    samples = rng.randint(-30000, 30000, (400, 2)).astype(np.int16)
    data = codecs.encode_wav(samples, 16000)
    out, rate = codecs.decode_wav(data)
    assert rate == 16000
    assert np.array_equal(out, samples)


def test_resize_block_mean_exact():
    img = np.zeros((4, 4, 1), dtype=np.uint8)
    img[:2, :2] = 100
    img[2:, 2:] = 200
    out = codecs.resize_block_mean(img, 2, 2)
    assert out[0, 0, 0] == 100 and out[1, 1, 0] == 200
    assert out[0, 1, 0] == 0


def test_spark_real_decode_pipeline(spark):
    from loongcollector_spark.operators import multimodal

    rng = np.random.RandomState(5)
    img = rng.randint(0, 256, (16, 16, 3), dtype=np.uint8)
    png = codecs.encode_png(img)
    wav = codecs.encode_wav(
        (10000 * np.sin(np.arange(800) / 5)).astype(np.int16), 8000
    )
    df = spark.createDataFrame(
        [(1, bytearray(png)), (2, bytearray(wav)), (3, bytearray(b"not-media"))],
        "id long, media binary",
    )
    # metadata: real PNG dimensions from IHDR, JVM-side
    meta = {r.id: r.media_meta for r in multimodal.attach_media_metadata(df).collect()}
    assert (meta[1].width, meta[1].height) == (16, 16)
    assert meta[2].format == "wav"
    # real feature extraction (strict would raise on id=3, auto fakes it)
    feats = {
        r.id: r.features
        for r in multimodal.extract_features(df, dim=16, mode="auto").collect()
    }
    expected_thumb = codecs.resize_block_mean(
        img[:, :, :3].mean(axis=2).astype(np.uint8), 4, 4
    )[:, :, 0].reshape(-1)
    assert feats[1] == pytest.approx((expected_thumb / 127.5 - 1.0).tolist())
    assert all(0.0 <= v <= 1.0 for v in feats[2])  # RMS energies
    assert len(feats[3]) == 16  # fake fallback, deterministic
    # real-mode returns NULL for undecodable rather than faking
    real = {
        r.id: r.features
        for r in multimodal.extract_features(df, dim=16, mode="real").collect()
    }
    assert real[3] is None and real[1] is not None
    # resize: decode -> block-mean -> re-encode, verify round-trip dims
    rs = {
        r.id: r.resized
        for r in multimodal.resize_images(df, height=4, width=4).collect()
    }
    small = codecs.decode_png(bytes(rs[1]))
    assert small.shape == (4, 4, 3)
    assert rs[3] is None


def _jpeg_header(sof_marker: int, width: int, height: int) -> bytes:
    """Hand-built JPEG header per the ISO/IEC 10918 marker layout:
    SOI, APP0/JFIF, a COM segment (exercises the walk), SOFn with the
    given dimensions, then SOS + fake entropy data."""
    import struct

    def seg(marker, payload):
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    app0 = seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    com = seg(0xFE, b"made by hand")
    sof_payload = struct.pack(">BHH", 8, height, width) + bytes(
        [3, 1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1]
    )
    sof = seg(sof_marker, sof_payload)
    sos = seg(0xDA, bytes([3, 1, 0, 2, 0x11, 3, 0x11, 0, 63, 0]))
    return b"\xff\xd8" + app0 + com + sof + sos + b"\x12\x34\xff\xd9"


def test_jpeg_sof_dimensions_jvm_side(spark):
    """SOF0 (baseline) and SOF2 (progressive) width/height parse
    JVM-side in attach_media_metadata; truncated JPEG yields NULL dims
    and never errors."""
    from loongcollector_spark.operators import multimodal

    rows = [
        (1, bytearray(_jpeg_header(0xC0, 640, 480))),
        (2, bytearray(_jpeg_header(0xC2, 31, 17))),
        (3, bytearray(b"\xff\xd8\xff")),  # truncated
    ]
    df = spark.createDataFrame(rows, "id long, media binary")
    meta = {r.id: r.media_meta for r in multimodal.attach_media_metadata(df).collect()}
    assert meta[1].format == "jpg" and meta[1].media_type == "image"
    assert (meta[1].width, meta[1].height) == (640, 480)
    assert (meta[2].width, meta[2].height) == (31, 17)
    assert meta[3].format == "jpg"
    assert meta[3].width is None and meta[3].height is None


def _mp4_stub(
    timescale: int,
    duration: int,
    version: int = 0,
    traks: tuple = (),
) -> bytes:
    """Hand-built minimal MP4: ftyp + moov(mvhd [, trak(tkhd)...])
    boxes per the ISO/IEC 14496-12 layout. *traks* is a tuple of
    (width, height, tkhd_version) — width 0 models an audio track."""
    import struct

    def box(btype, payload):
        return struct.pack(">I", len(payload) + 8) + btype + payload

    def tkhd(w, h, v):
        if v == 0:
            head = bytes([0, 0, 0, 7]) + struct.pack(">IIIII", 0, 0, 1, 0, duration)
        else:
            head = bytes([1, 0, 0, 7]) + struct.pack(">QQIIQ", 0, 0, 1, 0, duration)
        # reserved(8)+layer(2)+alt(2)+volume(2)+reserved(2)+matrix(36)
        return box(
            b"tkhd", head + bytes(52) + struct.pack(">II", w << 16, h << 16)
        )

    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2")
    if version == 0:
        mvhd_payload = (
            bytes([0, 0, 0, 0])                      # version 0 + flags
            + struct.pack(">IIII", 0, 0, timescale, duration)
            + bytes(80)                              # rate..next_track_id
        )
    else:
        mvhd_payload = (
            bytes([1, 0, 0, 0])                      # version 1 + flags
            + struct.pack(">QQIQ", 0, 0, timescale, duration)
            + bytes(80)
        )
    children = box(b"mvhd", mvhd_payload)
    for (w, h, v) in traks:
        children += box(b"trak", tkhd(w, h, v))
    moov = box(b"moov", children)
    return ftyp + moov


def test_wav_and_mp4_duration_ms(spark):
    """duration_ms: WAV from byte_rate/data-size (800 samples @ 8 kHz
    = 100 ms), MP4 from mvhd timescale/duration (v0 and v1)."""
    from loongcollector_spark.operators import multimodal

    wav = codecs.encode_wav(np.zeros(800, dtype=np.int16), 8000)
    rows = [
        (1, bytearray(wav)),
        (2, bytearray(_mp4_stub(timescale=600, duration=1500))),      # 2500 ms
        (3, bytearray(_mp4_stub(timescale=1000, duration=250, version=1))),
        (4, bytearray(_mp4_stub(600, 1500)[:12])),                    # truncated
    ]
    df = spark.createDataFrame(rows, "id long, media binary")
    meta = {r.id: r.media_meta for r in multimodal.attach_media_metadata(df).collect()}
    assert meta[1].format == "wav" and meta[1].duration_ms == 100
    assert meta[2].duration_ms == 2500
    assert meta[3].duration_ms == 250
    assert meta[4].duration_ms is None


def test_mp4_track_dims(spark):
    """width/height from trak/tkhd: v0 and v1 layouts, audio trak
    (width 0) skipped, trak-less files yield NULL dims."""
    from loongcollector_spark.operators import multimodal

    rows = [
        (1, bytearray(_mp4_stub(600, 1500, traks=((640, 360, 0),)))),
        (2, bytearray(_mp4_stub(600, 1500, traks=((1920, 1080, 1),)))),
        # audio-first: the walk must skip the w=0 trak
        (3, bytearray(_mp4_stub(600, 1500, traks=((0, 0, 0), (1280, 720, 0))))),
        (4, bytearray(_mp4_stub(600, 1500))),                          # no trak
        (5, bytearray(_mp4_stub(600, 1500, traks=((640, 360, 0),))[:12])),
    ]
    df = spark.createDataFrame(rows, "id long, media binary")
    meta = {r.id: r.media_meta for r in multimodal.attach_media_metadata(df).collect()}
    assert (meta[1].width, meta[1].height) == (640, 360)
    assert (meta[2].width, meta[2].height) == (1920, 1080)
    assert (meta[3].width, meta[3].height) == (1280, 720)
    assert meta[4].width is None and meta[4].height is None
    assert meta[5].width is None
    # duration still intact alongside dims
    assert meta[1].duration_ms == 2500 and meta[1].media_type == "video"


# ---------------------------------------------------------------------------
# baseline JPEG codec (functions/jpeg.py — pure-NumPy T.81)


def _test_image(h=45, w=61):
    yy, xx = np.mgrid[0:h, 0:w]
    return (
        np.dstack(
            [xx * 255 / w, yy * 255 / h, 128 + 100 * np.sin(xx / 9.0) * np.cos(yy / 7.0)]
        )
        .clip(0, 255)
        .astype(np.uint8)
    )


def _psnr(a, b):
    mse = ((a.astype(float) - b.astype(float)) ** 2).mean()
    return 10 * np.log10(255**2 / mse)


@pytest.mark.parametrize("subsampling", ["444", "420"])
@pytest.mark.parametrize("restart_interval", [0, 3])
def test_jpeg_roundtrip(subsampling, restart_interval):
    from loongcollector_spark.functions import jpeg

    img = _test_image()
    data = jpeg.encode_jpeg(
        img, quality=90, subsampling=subsampling, restart_interval=restart_interval
    )
    assert data[:2] == b"\xff\xd8" and data[-2:] == b"\xff\xd9"
    dec = jpeg.decode_jpeg(data)
    assert dec.shape == img.shape
    # 4:2:0 loses chroma detail; both stay visually faithful
    assert _psnr(dec, img) > (40 if subsampling == "444" else 34)


def test_jpeg_uniform_exact():
    """Uniform color has only DC energy — decode must be bit-exact."""
    from loongcollector_spark.functions import jpeg

    for val in (0, 128, 200, 255):
        u = np.full((16, 16, 3), val, np.uint8)
        assert (jpeg.decode_jpeg(jpeg.encode_jpeg(u, quality=90)) == val).all()


def test_jpeg_grayscale_and_dims():
    from loongcollector_spark.functions import jpeg

    g = (np.arange(24 * 33).reshape(24, 33) % 256).astype(np.uint8)
    data = jpeg.encode_jpeg(g, quality=95)
    assert jpeg.jpeg_dimensions(data) == (24, 33)
    assert jpeg.decode_jpeg(data).shape == (24, 33, 3)


def test_jpeg_progressive_raises():
    from loongcollector_spark.functions import jpeg

    assert jpeg.decode_jpeg.__doc__  # real impl, not a stub
    with pytest.raises(NotImplementedError):
        jpeg.decode_jpeg(_jpeg_header(0xC2, 8, 8) + b"\x00" * 16)


def test_jpeg_jvm_dims_agree_with_encoder(spark):
    """attach_media_metadata's JVM-side SOF walk (written against the
    marker spec independently of functions/jpeg.py) must agree with the
    encoder's output — cross-validation of both implementations."""
    from loongcollector_spark.functions import jpeg
    from loongcollector_spark.operators import multimodal

    img420 = jpeg.encode_jpeg(_test_image(33, 47), subsampling="420")
    img444 = jpeg.encode_jpeg(_test_image(21, 19), subsampling="444")
    df = spark.createDataFrame(
        [(1, bytearray(img420)), (2, bytearray(img444))], "id long, media binary"
    )
    meta = {
        r.id: r.media_meta for r in multimodal.attach_media_metadata(df).collect()
    }
    assert (meta[1].width, meta[1].height) == (47, 33)
    assert (meta[2].width, meta[2].height) == (19, 21)


def test_jpeg_spark_feature_and_resize(spark):
    """mode='real' feature extraction and resize_images now handle jpg
    rows end-to-end (no fake fallback involved)."""
    from loongcollector_spark.functions import codecs, jpeg
    from loongcollector_spark.operators import multimodal

    payload = jpeg.encode_jpeg(_test_image(32, 32), quality=95)
    df = spark.createDataFrame([(1, bytearray(payload))], "id long, media binary")
    feat = multimodal.extract_features(df, "media", dim=16, mode="real").collect()[0]
    assert feat["features"] is not None and len(feat["features"]) == 16
    assert any(abs(v) > 1e-9 for v in feat["features"])
    resized = multimodal.resize_images(df, "media", height=8, width=8).collect()[0]
    out = codecs.decode_png(bytes(resized["resized"]))
    assert out.shape[:2] == (8, 8)


def test_audio_spectral_feature_separates_tones():
    """'spectral' audio features put a low tone's energy in low bands
    and a high tone's in high bands; 'rms' cannot tell them apart."""
    from loongcollector_spark.operators.multimodal import _real_feature

    rate = 8000
    t = np.arange(rate) / rate
    low = (np.sin(2 * np.pi * 100 * t) * 20000).astype(np.int16)
    high = (np.sin(2 * np.pi * 3500 * t) * 20000).astype(np.int16)
    wav_low = codecs.encode_wav(low.reshape(-1, 1), rate)
    wav_high = codecs.encode_wav(high.reshape(-1, 1), rate)
    f_low = np.array(_real_feature(wav_low, 8, "spectral"))
    f_high = np.array(_real_feature(wav_high, 8, "spectral"))
    assert f_low.argmax() == 0 and f_high.argmax() >= 6
    r_low = np.array(_real_feature(wav_low, 8, "rms"))
    r_high = np.array(_real_feature(wav_high, 8, "rms"))
    assert np.allclose(r_low, r_high, atol=0.01)  # same energy envelope


# ---------------------------------------------------------------------------
# DC-only decode (decode_jpeg_dc): progressive scans + baseline fast path


def _encode_progressive_gray_dc(img, restart_interval=0):
    """Test-only minimal PROGRESSIVE (SOF2) grayscale encoder emitting
    exactly the two DC scans real progressive encoders produce —
    DC-first (Ah=0, Al=1) then DC-refinement (Ah=1, Al=0) — with q0=8
    so each reconstructed DC pixel equals the block mean exactly. AC
    scans are deliberately absent (decode_jpeg_dc never reads them)."""
    from loongcollector_spark.functions import jpeg as J

    h, w = img.shape
    bh, bw = -(-h // 8), -(-w // 8)
    pad = np.zeros((bh * 8, bw * 8))
    pad[:h, :w] = img.astype(float) - 128.0
    pad[h:, :w] = pad[h - 1 : h, :w]
    pad[:, w:] = pad[:, w - 1 : w]
    dcs = [
        int(round(J._fdct2(pad[r * 8 : r * 8 + 8, c * 8 : c * 8 + 8])[0, 0] / 8))
        for r in range(bh)
        for c in range(bw)
    ]

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    out = b"\xff\xd8"
    out += seg(0xDB, bytes([0x00, 8] + [1] * 63))  # q0=8, rest 1
    out += seg(0xC2, bytes([8]) + struct.pack(">HH", h, w) + bytes([1, 1, 0x11, 0]))
    out += seg(0xC4, bytes([0x00]) + bytes(J.DC_LUM_BITS) + bytes(J.DC_LUM_VALS))
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    enc = J._build_encode_table(J.DC_LUM_BITS, J.DC_LUM_VALS)

    # scan 1: DC first, point transform Al=1 (codes dc >> 1 diffs)
    out += seg(0xDA, bytes([1, 1, 0x00, 0, 0, 0x01]))
    bw1 = J._BitWriter()
    pred = 0
    rst = 0
    for bi, dc in enumerate(dcs):
        if restart_interval and bi and bi % restart_interval == 0:
            bw1.flush()
            out += bytes(bw1.out) + bytes([0xFF, 0xD0 + rst % 8])
            rst += 1
            bw1 = J._BitWriter()
            pred = 0
        v = dc >> 1
        diff = v - pred
        pred = v
        t = abs(diff).bit_length()
        code, ln = enc[t]
        bw1.write(code, ln)
        if t:
            bits = diff if diff >= 0 else diff + (1 << t) - 1
            bw1.write(bits, t)
    bw1.flush()
    out += bytes(bw1.out)

    # scan 2: DC refinement, one raw bit per block at position Al=0
    # (the DRI interval applies to every scan, so RSTs here too)
    out += seg(0xDA, bytes([1, 1, 0x00, 0, 0, 0x10]))
    bw2 = J._BitWriter()
    rst = 0
    for bi, dc in enumerate(dcs):
        if restart_interval and bi and bi % restart_interval == 0:
            bw2.flush()
            out += bytes(bw2.out) + bytes([0xFF, 0xD0 + rst % 8])
            rst += 1
            bw2 = J._BitWriter()
        bw2.write(dc & 1, 1)
    bw2.flush()
    out += bytes(bw2.out)
    return out + b"\xff\xd9", dcs


def test_jpeg_progressive_dc_thumbnail_exact():
    """Progressive DC-first + refinement scans reconstruct the exact
    quantized DC per block: thumbnail pixel == dc*q0/8 + 128."""
    from loongcollector_spark.functions import jpeg

    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, (24, 33)).astype(np.uint8)
    data, dcs = _encode_progressive_gray_dc(img)
    # the full decoder still (honestly) refuses progressive
    with pytest.raises(NotImplementedError):
        jpeg.decode_jpeg(data)
    thumb = jpeg.decode_jpeg_dc(data)
    assert thumb.shape == (3, 5, 3)
    expect = np.clip(np.array(dcs, float).reshape(3, 5) + 128.0, 0, 255).astype(
        np.uint8
    )
    assert np.array_equal(thumb[:, :, 0], expect)
    assert (thumb[:, :, 0] == thumb[:, :, 2]).all()  # grayscale replicate


def test_jpeg_progressive_dc_restart_markers():
    from loongcollector_spark.functions import jpeg

    rng = np.random.RandomState(11)
    img = rng.randint(0, 256, (16, 40)).astype(np.uint8)
    plain, dcs = _encode_progressive_gray_dc(img)
    rst, dcs2 = _encode_progressive_gray_dc(img, restart_interval=3)
    assert dcs == dcs2
    assert np.array_equal(jpeg.decode_jpeg_dc(plain), jpeg.decode_jpeg_dc(rst))


def test_jpeg_dc_baseline_matches_block_means():
    """Baseline path: DC-only thumbnail vs 8x8 block means of the full
    decode. 4:4:4 matches in full RGB (within rounding); 4:2:0 chroma
    DC inherently covers a 16x16 region, so there only the BT.601 luma
    — where the chroma terms cancel exactly — is held tight."""
    from loongcollector_spark.functions import codecs, jpeg

    img = _test_image(40, 48)

    def luma(a):
        return 0.299 * a[:, :, 0] + 0.587 * a[:, :, 1] + 0.114 * a[:, :, 2]

    for sub in ("444", "420"):
        data = jpeg.encode_jpeg(img, quality=90, subsampling=sub)
        thumb = jpeg.decode_jpeg_dc(data).astype(float)
        full = jpeg.decode_jpeg(data)
        means = codecs.resize_block_mean(full, 5, 6).astype(float)
        assert thumb.shape == means.shape == (5, 6, 3)
        if sub == "444":
            assert np.abs(thumb - means).max() <= 4.0, sub
        assert np.abs(luma(thumb) - luma(means)).max() <= 6.0, sub


def test_jpeg_truncated_raises_value_error():
    """Truncated/corrupt entropy streams surface as ValueError from the
    public decoders — never a raw IndexError or a private exception
    class (review r4): restart-resync must not scan past the buffer."""
    from loongcollector_spark.functions import jpeg

    img = _test_image(24, 24)
    for make in (
        lambda: jpeg.encode_jpeg(img, quality=85, restart_interval=2),
        lambda: _encode_progressive_gray_dc(
            np.arange(576, dtype=np.uint8).reshape(24, 24), restart_interval=2
        )[0],
    ):
        data = make()
        for cut in (len(data) // 2, len(data) - 3):
            truncated = data[:cut]
            for fn in (jpeg.decode_jpeg, jpeg.decode_jpeg_dc):
                try:
                    fn(truncated)
                except (ValueError, NotImplementedError):
                    pass  # ValueError (malformed) or honest progressive refusal
                # silent success is fine when the cut lands after the
                # last needed entropy byte


def test_jpeg_decode_any_selects_codec():
    """decode_jpeg_any: full decode for baseline, DC fallback for
    progressive — one policy site for the multimodal operators."""
    from loongcollector_spark.functions import jpeg

    img = _test_image(16, 16)
    base = jpeg.encode_jpeg(img, quality=90, subsampling="444")
    assert jpeg.decode_jpeg_any(base).shape == (16, 16, 3)
    prog, _ = _encode_progressive_gray_dc(
        np.arange(256, dtype=np.uint8).reshape(16, 16)
    )
    assert jpeg.decode_jpeg_any(prog).shape == (2, 2, 3)  # 1/8-scale DC


def test_jpeg_progressive_feature_and_resize_fallback(spark):
    """The multimodal operators now produce REAL vectors/pixels for
    progressive JPEGs via the DC thumbnail instead of faking/NULLing."""
    from loongcollector_spark.operators import multimodal

    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, (32, 32)).astype(np.uint8)
    data, _ = _encode_progressive_gray_dc(img)
    df = spark.createDataFrame([(1, bytearray(data))], "id long, media binary")
    feats = multimodal.extract_features(df, mode="real", dim=4).collect()[0]
    assert feats.features is not None and len(feats.features) == 4
    resized = multimodal.resize_images(df, height=2, width=2).collect()[0]
    assert resized.resized is not None  # PNG bytes from real DC pixels

"""Pure-numpy PPM/BMP codecs + real decode through the multimodal ops."""

import numpy as np
import pytest

from ai_vector_database_converstion_from_pdf_spark.functions.imagecodec import (
    decode_bmp,
    decode_ppm,
    encode_bmp,
    encode_ppm,
    nearest_resize,
)
from ai_vector_database_converstion_from_pdf_spark.operators.multimodal import (
    decode_image,
)


def _raster(h=5, w=7):
    rng = np.random.default_rng(42)
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


def test_ppm_roundtrip():
    r = _raster()
    assert np.array_equal(decode_ppm(encode_ppm(r)), r)


def test_ppm_comments_and_whitespace():
    r = _raster(2, 2)
    body = encode_ppm(r).split(b"255\n", 1)[1]
    data = b"P6\n# a comment\n 2\t2 # trailing\n255\n" + body
    assert np.array_equal(decode_ppm(data), r)


def test_bmp_roundtrip_with_padding():
    # width 7 -> row 21 bytes -> padded to 24: exercises the pad path
    r = _raster(5, 7)
    assert np.array_equal(decode_bmp(encode_bmp(r)), r)


def test_bmp_known_pixels():
    # single red pixel, bottom-up bgr storage
    r = np.zeros((1, 1, 3), dtype=np.uint8)
    r[0, 0] = [255, 0, 0]
    data = encode_bmp(r)
    assert data[:2] == b"BM"
    got = decode_bmp(data)
    assert got[0, 0].tolist() == [255, 0, 0]


def test_decode_image_dispatch():
    r = _raster(3, 4)
    assert np.array_equal(decode_image(encode_ppm(r), "image/x-portable-pixmap"), r)
    assert np.array_equal(decode_image(encode_bmp(r), "image/bmp"), r)
    with pytest.raises((NotImplementedError, Exception)):
        decode_image(b"\x89PNG...", "image/png")


def test_nearest_resize_shape_and_corners():
    r = _raster(10, 20)
    s = nearest_resize(r, 5, 4)
    assert s.shape == (4, 5, 3)
    assert np.array_equal(s[0, 0], r[0, 0])
    assert np.array_equal(s[-1, -1], r[-1, -1])


def test_features_use_real_decode(spark):
    """Image mean_intensity must equal the numpy mean of the ACTUAL
    encoded raster — proving the pipeline decodes the real payload, not
    a payload-seeded fake."""
    from ai_vector_database_converstion_from_pdf_spark.operators.multimodal import (
        extract_features,
        synthetic_media,
    )

    media = synthetic_media(spark, n=12)
    feats = {r["media_id"]: r for r in extract_features(media).collect()}
    rows = media.filter("kind = 'image'").collect()
    assert rows
    for r in rows:
        raster = decode_image(bytes(r["payload"]), r["mime"])
        assert raster.shape == (r["height"], r["width"], 3)
        assert abs(feats[r["media_id"]]["mean_intensity"] - float(raster.mean())) < 1e-9


# ---- audio codec (PCM WAV) ----


def test_wav_roundtrip():
    import numpy as np

    from ai_vector_database_converstion_from_pdf_spark.functions.audiocodec import (
        decode_wav,
        encode_wav,
    )

    rng = np.random.default_rng(42)
    samples = rng.integers(-32768, 32767, size=1000, dtype=np.int16)
    data = encode_wav(samples, sample_rate=16000)
    back, sr = decode_wav(data)
    assert sr == 16000
    assert np.array_equal(back, samples)


def test_wav_chunk_walk_tolerates_extra_chunks():
    """fmt/data need not be adjacent: decoders must walk the chunk list
    (LIST/INFO chunks are common in real files)."""
    import struct

    import numpy as np

    from ai_vector_database_converstion_from_pdf_spark.functions.audiocodec import (
        decode_wav,
        encode_wav,
    )

    samples = np.arange(-50, 50, dtype=np.int16)
    data = bytearray(encode_wav(samples, sample_rate=8000))
    # splice a LIST chunk between fmt and data (odd size -> pad byte)
    fmt_end = 12 + 8 + 16
    info = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"
    spliced = bytes(data[:fmt_end]) + info + bytes(data[fmt_end:])
    spliced = spliced[:4] + struct.pack("<I", len(spliced) - 8) + spliced[8:]
    back, sr = decode_wav(spliced)
    assert sr == 8000
    assert np.array_equal(back, samples)


def test_wav_rejects_unsupported():
    import struct

    import numpy as np
    import pytest

    from ai_vector_database_converstion_from_pdf_spark.functions.audiocodec import (
        decode_wav,
        encode_wav,
        rms,
        zero_crossing_rate,
    )

    with pytest.raises(ValueError):
        decode_wav(b"nonsense")
    # stereo flag -> honest NotImplementedError, not silent garbage
    data = bytearray(encode_wav(np.zeros(10, dtype=np.int16)))
    struct.pack_into("<H", data, 12 + 8 + 2, 2)  # n_channels = 2
    with pytest.raises(NotImplementedError):
        decode_wav(bytes(data))
    # feature edge cases
    assert rms(np.array([], dtype=np.int16)) == 0.0
    assert zero_crossing_rate(np.array([5], dtype=np.int16)) == 0.0


def test_audio_features_from_real_wave():
    import numpy as np

    from ai_vector_database_converstion_from_pdf_spark.functions.audiocodec import (
        rms,
        zero_crossing_rate,
    )

    sr = 8000
    t = np.arange(sr, dtype=np.float64) / sr  # 1 second
    wave = (np.sin(2 * np.pi * 440.0 * t) * 16384).astype(np.int16)
    # sine rms = A/sqrt(2); A = 0.5 full scale -> ~0.3536
    assert abs(rms(wave) - 0.5 / np.sqrt(2)) < 0.01
    # 440 Hz crosses zero ~880 times/sec -> zcr ~ 880/8000
    assert abs(zero_crossing_rate(wave) - 880.0 / sr) < 0.01

import numpy as np
import pytest

from go_osm_ray import codecs
from go_osm_ray.datagen import _image_pixels


@pytest.mark.parametrize("fmt", ["bmp", "png", "raw"])
@pytest.mark.parametrize("w,h", [(16, 16), (24, 17), (1, 1), (33, 5)])
def test_lossless_roundtrip(fmt, w, h):
    px = _image_pixels(13, w, h)
    assert np.array_equal(codecs.decode(codecs.encode(px, fmt), fmt), px)


def test_qnt5_lossy_psnr_gate():
    px = _image_pixels(99, 32, 32)
    rec = codecs.decode(codecs.encode(px, "qnt5"), "qnt5")
    p = codecs.psnr(px, rec)
    assert 40.0 <= p < 60.0  # lossy, above the input_hint PSNR gate
    assert np.abs(px.astype(int) - rec.astype(int)).max() <= 4


def test_decode_wrong_format_raises():
    px = _image_pixels(1, 8, 8)
    blob = codecs.encode(px, "bmp")
    with pytest.raises(ValueError):
        codecs.decode(blob, "png")


def test_png_filter_decoding():
    # decoder handles Up/Sub-filtered scanlines from foreign encoders
    import struct
    import zlib
    from go_osm_ray.codecs import _PNG_SIG, _chunk
    px = _image_pixels(5, 8, 4)
    h, w, _ = px.shape
    raw_rows = []
    for r in range(h):
        if r == 0:
            raw_rows.append(b"\x00" + px[r].tobytes())
        else:  # filter type 2 (Up)
            delta = (px[r].astype(np.int32) - px[r - 1].astype(np.int32)) & 0xFF
            raw_rows.append(b"\x02" + delta.astype(np.uint8).tobytes())
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    buf = (_PNG_SIG + _chunk(b"IHDR", ihdr)
           + _chunk(b"IDAT", zlib.compress(b"".join(raw_rows)))
           + _chunk(b"IEND", b""))
    assert np.array_equal(codecs.decode(buf, "png"), px)

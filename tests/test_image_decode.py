"""Pure-NumPy image decoders (PPM/PGM/BMP) vs hand-computed oracles,
plus the registered `image_decode` query's Spark-vs-DuckDB parity.

VERDICT r04 item 3: uncompressed formats need no codec library, so the
decode step is REAL here; only compressed codecs stay stubbed.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from urban_pointcloud_processing_spark.operators.multimodal import (
    decode_bmp,
    decode_image,
    decode_ppm,
)


def _bmp_2x2() -> tuple[bytes, np.ndarray]:
    """Hand-assembled 24-bit BI_RGB bottom-up BMP:
    image row 0 = [red, green], row 1 = [blue, white]."""
    w, h = 2, 2
    stride = (w * 3 + 3) // 4 * 4  # 8: 6 pixel bytes + 2 pad
    # bottom-up + BGR: file row 0 is IMAGE row 1
    row_img1 = bytes([255, 0, 0, 255, 255, 255]) + b"\x00\x00"  # blue, white
    row_img0 = bytes([0, 0, 255, 0, 255, 0]) + b"\x00\x00"      # red, green
    pixels = row_img1 + row_img0
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0,
                      len(pixels), 2835, 2835, 0, 0)
    hdr = struct.pack("<2sIHHI", b"BM", 14 + len(dib) + len(pixels),
                      0, 0, 14 + len(dib))
    expected = np.array(
        [[[255, 0, 0], [0, 255, 0]], [[0, 0, 255], [255, 255, 255]]],
        dtype=np.uint8,
    )
    assert stride == 8
    return hdr + dib + pixels, expected


def test_bmp_decode_bit_exact():
    data, expected = _bmp_2x2()
    np.testing.assert_array_equal(decode_bmp(data), expected)
    # through the sniffing front door too
    np.testing.assert_array_equal(decode_image(data), expected)


def test_bmp_topdown_negative_height():
    data, expected = _bmp_2x2()
    # rewrite height to -2 (top-down) and swap the two rows to match
    dib = bytearray(data[14:54])
    struct.pack_into("<i", dib, 8, -2)
    stride = 8
    pix = data[54:]
    topdown = bytes(data[:14]) + bytes(dib) + pix[stride:] + pix[:stride]
    np.testing.assert_array_equal(decode_bmp(topdown), expected)


def test_ppm_p6_decode_with_comment():
    # 2x1 RGB: (1,2,3), (4,5,6); header carries a comment line
    data = b"P6\n# test comment\n2 1\n255\n" + bytes([1, 2, 3, 4, 5, 6])
    expected = np.array([[[1, 2, 3], [4, 5, 6]]], dtype=np.uint8)
    np.testing.assert_array_equal(decode_ppm(data), expected)
    np.testing.assert_array_equal(decode_image(data), expected)


def test_pgm_p5_decode():
    data = b"P5\n3 2\n255\n" + bytes([10, 20, 30, 40, 50, 60])
    expected = np.array([[10, 20, 30], [40, 50, 60]], dtype=np.uint8)
    np.testing.assert_array_equal(decode_ppm(data), expected)


def test_raster_first_byte_whitespace_not_eaten():
    # raster starting with 0x0A (newline byte) must survive: only ONE
    # whitespace char after maxval is consumed per the PNM spec
    data = b"P5\n1 2\n255\n" + bytes([0x0A, 0x20])
    np.testing.assert_array_equal(
        decode_ppm(data), np.array([[0x0A], [0x20]], dtype=np.uint8)
    )


def test_compressed_still_stubbed():
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG\r\n\x1a\n....")
    with pytest.raises(NotImplementedError):
        decode_image(b"\xff\xd8\xff\xe0JFIF....")


def test_image_decode_query_parity(spark):
    from tests.parity import compare
    from urban_pointcloud_processing_spark import queries as Q

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        rep = compare(
            spark, sf, "image_decode",
            Q.QUERIES["image_decode"], Q.ORACLES["image_decode"],
        )
        assert rep["ok"], rep

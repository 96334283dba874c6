"""Core type / validation / header tests (mirrors reference tier-1 coverage:
test/source/simple_test.cpp:282-314 header tests and the Desc math)."""

import numpy as np
import pytest

from qoipp_tpu import (
    Channels,
    Colorspace,
    Desc,
    Error,
    HEADER_SIZE,
    count_bytes,
    is_valid,
    read_header,
    to_channels,
    to_colorspace,
    to_string,
    worst_size,
    write_header,
)

DESC3 = Desc(29, 17, Channels.RGB, Colorspace.SRGB)
DESC4 = Desc(24, 14, Channels.RGBA, Colorspace.SRGB)


def test_is_valid():
    assert is_valid(DESC3)
    assert is_valid(DESC4)
    assert not is_valid(Desc(0, 17, Channels.RGB))
    assert not is_valid(Desc(29, 0, Channels.RGB))


def test_count_bytes():
    assert count_bytes(DESC3).value() == 29 * 17 * 3
    assert count_bytes(DESC4).value() == 24 * 14 * 4
    r = count_bytes(Desc(0, 1, Channels.RGB))
    assert not r and r.error() == Error.INVALID_DESC
    r = count_bytes(Desc(2**33, 2**33, Channels.RGB))
    assert not r and r.error() == Error.TOO_BIG


def test_worst_size():
    # (channels+1)*w*h + 14 + 8 (reference: common.hpp:402-412)
    assert worst_size(DESC3).value() == 4 * 29 * 17 + 22
    assert worst_size(DESC4).value() == 5 * 24 * 14 + 22


def test_header_roundtrip():
    hdr = write_header(DESC3)
    assert len(hdr) == HEADER_SIZE
    assert hdr[:4] == b"qoif"
    got = read_header(hdr)
    assert got and got.value() == DESC3


def test_header_big_endian_layout():
    hdr = write_header(Desc(0x01020304, 0x0A0B0C0D, Channels.RGBA, Colorspace.LINEAR))
    assert list(hdr[4:8]) == [1, 2, 3, 4]
    assert list(hdr[8:12]) == [0x0A, 0x0B, 0x0C, 0x0D]
    assert hdr[12] == 4 and hdr[13] == 1


def test_read_header_fixture(qoi3, qoi4):
    assert read_header(qoi3).value() == DESC3
    assert read_header(qoi4).value() == DESC4


def test_read_header_errors():
    assert read_header(b"").error() == Error.EMPTY
    assert read_header(b"qoif").error() == Error.TOO_SHORT
    assert read_header(b"x" * 14).error() == Error.NOT_QOI
    bad = bytearray(write_header(DESC3))
    bad[12] = 9  # invalid channels
    assert read_header(bytes(bad)).error() == Error.INVALID_DESC
    zero_w = write_header(Desc(1, 1, Channels.RGB))
    zero_w = zero_w[:4] + b"\x00\x00\x00\x00" + zero_w[8:]
    assert read_header(zero_w).error() == Error.INVALID_DESC


def test_read_header_file(tmp_path, qoi3):
    p = tmp_path / "img.qoi"
    p.write_bytes(qoi3.tobytes())
    assert read_header(p).value() == DESC3
    assert read_header(tmp_path / "nope.qoi").error() == Error.FILE_NOT_EXISTS
    assert read_header(tmp_path).error() == Error.NOT_REGULAR_FILE


def test_enum_helpers():
    assert to_channels(3) == Channels.RGB
    assert to_channels(4) == Channels.RGBA
    assert to_channels(5) is None
    assert to_colorspace(0) == Colorspace.SRGB
    assert to_colorspace(1) == Colorspace.LINEAR
    assert to_colorspace(2) is None
    for e in Error:
        assert to_string(e) != "Unknown"

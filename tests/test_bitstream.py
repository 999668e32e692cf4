import random

import pytest

from openvvc_tpu.utils.bitstream import (
    BitReader,
    BitWriter,
    insert_emulation_prevention,
    strip_emulation_prevention,
)


def test_u_roundtrip():
    rng = random.Random(0)
    fields = [(rng.randrange(1 << n), n) for n in rng.choices(range(1, 33), k=500)]
    w = BitWriter()
    for v, n in fields:
        w.u(v, n)
    w.rbsp_trailing_bits()
    r = BitReader(w.get_bytes())
    for v, n in fields:
        assert r.u(n) == v


def test_ue_se_roundtrip():
    rng = random.Random(1)
    ues = [rng.randrange(0, 100000) for _ in range(200)] + [0, 1, 2, 254, 255, 256]
    ses = [rng.randrange(-50000, 50000) for _ in range(200)] + [0, 1, -1, 2, -2]
    w = BitWriter()
    for v in ues:
        w.ue(v)
    for v in ses:
        w.se(v)
    w.rbsp_trailing_bits()
    r = BitReader(w.get_bytes())
    for v in ues:
        assert r.ue() == v
    for v in ses:
        assert r.se() == v


def test_ue_small_codes():
    # ue(v): 0->'1', 1->'010', 2->'011', 3->'00100'
    w = BitWriter()
    for v in (0, 1, 2, 3):
        w.ue(v)
    w.rbsp_trailing_bits()
    assert w.get_bytes() == bytes([0b10100110, 0b01001000])


def test_more_rbsp_data():
    w = BitWriter()
    w.u(0b101, 3)
    w.rbsp_trailing_bits()
    r = BitReader(w.get_bytes())
    assert r.more_rbsp_data()
    r.u(3)
    assert not r.more_rbsp_data()


def test_epb_roundtrip():
    cases = [
        b"\x00\x00\x00",
        b"\x00\x00\x01\x02\x00\x00\x02",
        b"\x00\x00\x03\x00\x00\x00",
        bytes(range(256)) + b"\x00\x00\x00\x00\x01",
        b"",
        b"\x00",
        b"\x00\x00",
    ]
    for rbsp in cases:
        ebsp = insert_emulation_prevention(rbsp)
        # no start-code emulation in protected stream
        assert b"\x00\x00\x00" not in ebsp
        assert b"\x00\x00\x01" not in ebsp
        assert b"\x00\x00\x02" not in ebsp
        back, _ = strip_emulation_prevention(ebsp)
        assert back == rbsp


def test_epb_not_overzealous():
    assert insert_emulation_prevention(b"\x00\x00\x04") == b"\x00\x00\x04"
    assert insert_emulation_prevention(b"\x01\x00\x00") == b"\x01\x00\x00"

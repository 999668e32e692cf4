import random

import numpy as np
import pytest

from openvvc_tpu.cabac.engine import CabacDecoder, CabacEncoder
from openvvc_tpu.vcl.cabac_io import CabacReaderIO, CabacWriterIO
from openvvc_tpu.vcl.residual import diag_scan, residual_coding, sb_dims


def find_last_pos(levels, log2_w, log2_h):
    """Scan-order last significant coefficient position."""
    lim_w = min(1 << log2_w, 32)
    lim_h = min(1 << log2_h, 32)
    l2sw, l2sh = sb_dims(min(log2_w, 5), min(log2_h, 5))
    sb_scan = diag_scan(lim_w >> l2sw, lim_h >> l2sh)
    inner = diag_scan(1 << l2sw, 1 << l2sh)
    last = None
    for sx, sy in sb_scan:
        for ix, iy in inner:
            x, y = (sx << l2sw) + ix, (sy << l2sh) + iy
            if levels[y, x]:
                last = (x, y)
    return last


def roundtrip_tb(levels, log2_w, log2_h, luma=True, dep_quant=True, sdh=False,
                 slice_type=2, qp=30):
    levels = np.asarray(levels, np.int32)
    last = find_last_pos(levels, log2_w, log2_h)
    assert last is not None

    enc = CabacEncoder(slice_type, qp)
    wio = CabacWriterIO(enc)
    residual_coding(wio, levels.copy(), log2_w, log2_h, luma, dep_quant, sdh, last_pos=last)
    enc.encode_terminate(1)
    payload = enc.finish()

    dec = CabacDecoder(payload, slice_type, qp)
    rio = CabacReaderIO(dec)
    out, decoded, last_out, sig_map = residual_coding(rio, None, log2_w, log2_h, luma, dep_quant, sdh)
    assert dec.decode_terminate() == 1
    assert not dec.overread()
    assert last_out == last
    np.testing.assert_array_equal(out, levels)
    # CABAC state must also agree (proves ctx indices matched)
    assert dec.s0 == enc.s0
    return decoded


def test_single_dc_coeff():
    lv = np.zeros((4, 4), np.int32)
    lv[0, 0] = 3
    decoded = roundtrip_tb(lv, 2, 2)
    assert decoded[0, 0] == 6  # dep-quant doubling


def test_small_blocks_random():
    rng = np.random.RandomState(0)
    for log2_w, log2_h in [(2, 2), (3, 3), (2, 3), (3, 2), (4, 4), (5, 5), (4, 2), (2, 4)]:
        for density in (0.1, 0.5, 0.9):
            for dq in (True, False):
                lv = rng.randint(-8, 9, (1 << log2_h, 1 << log2_w))
                mask = rng.rand(1 << log2_h, 1 << log2_w) < density
                lv = (lv * mask).astype(np.int32)
                if not np.any(lv):
                    lv[0, 0] = 1
                roundtrip_tb(lv, log2_w, log2_h, luma=True, dep_quant=dq)


def test_chroma_blocks():
    rng = np.random.RandomState(1)
    for log2_w, log2_h in [(2, 2), (3, 3), (1, 3), (3, 1), (1, 1), (2, 1), (1, 2)]:
        lv = rng.randint(-5, 6, (1 << log2_h, 1 << log2_w)).astype(np.int32)
        if not np.any(lv):
            lv[0, 0] = 1
        roundtrip_tb(lv, log2_w, log2_h, luma=False, dep_quant=True)


def test_large_values_rice_escape():
    lv = np.zeros((8, 8), np.int32)
    lv[0, 0] = 30000
    lv[1, 1] = -12345
    lv[3, 2] = 700
    roundtrip_tb(lv, 3, 3)


def test_dense_budget_exhaustion():
    # dense 16x16 exhausts the 1.75*N first-pass bin budget -> bypass tail
    rng = np.random.RandomState(2)
    lv = rng.randint(1, 12, (16, 16)).astype(np.int32)
    signs = rng.randint(0, 2, (16, 16))
    lv = np.where(signs, -lv, lv).astype(np.int32)
    roundtrip_tb(lv, 4, 4)
    roundtrip_tb(lv, 4, 4, dep_quant=False)


def test_sdh_even_parity():
    # all-positive, even abs-sum per subblock satisfies the hidden-sign rule
    lv = np.zeros((8, 8), np.int32)
    lv[0, 0] = 2
    lv[3, 3] = 2
    lv[0, 4] = 4
    lv[1, 5] = 2
    decoded = roundtrip_tb(lv, 3, 3, dep_quant=False, sdh=True)
    np.testing.assert_array_equal(decoded, lv)


def test_zero_out_64():
    lv = np.zeros((64, 64), np.int32)
    lv[:32, :32] = np.random.RandomState(3).randint(-3, 4, (32, 32))
    lv[0, 0] = 5  # ensure nonzero
    roundtrip_tb(lv, 6, 6)


def test_rect_blocks():
    rng = np.random.RandomState(4)
    for lw, lh in [(5, 2), (2, 5), (6, 3), (3, 6), (4, 6), (6, 4)]:
        h, w = 1 << lh, 1 << lw
        lv = np.zeros((h, w), np.int32)
        rw, rh = min(w, 32), min(h, 32)
        lv[:rh, :rw] = rng.randint(-4, 5, (rh, rw))
        lv[0, 0] = 2
        roundtrip_tb(lv, lw, lh)

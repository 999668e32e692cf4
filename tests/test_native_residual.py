"""Native (C) residual_coding parity vs the Python reader."""

import os
import sys

import numpy as np
import pytest

from openvvc_tpu.cabac.engine import CabacDecoder, CabacEncoder
from openvvc_tpu.native import NativeCabacDecoder, load_cabac_lib
from openvvc_tpu.vcl.cabac_io import CabacReaderIO, CabacWriterIO
from openvvc_tpu.vcl.residual import diag_scan, residual_coding, sb_dims

sys.path.insert(0, os.path.dirname(__file__))
from test_residual import find_last_pos  # noqa: E402

pytestmark = pytest.mark.skipif(load_cabac_lib() is None, reason="no native lib")


def _fix_sdh(lv, lw, lh):
    lim_w, lim_h = min(lw, 5), min(lh, 5)
    lsw, lsh = sb_dims(lim_w, lim_h)
    scan = diag_scan(1 << lsw, 1 << lsh)
    for sy in range(0, 1 << lim_h, 1 << lsh):
        for sx in range(0, 1 << lim_w, 1 << lsw):
            sig = [(i, x, y) for i, (x, y) in enumerate(scan) if lv[sy + y, sx + x]]
            if not sig:
                continue
            if max(i for i, _, _ in sig) - min(i for i, _, _ in sig) >= 4:
                par = 0
                for _, x, y in sig:
                    par ^= abs(int(lv[sy + y, sx + x]))
                _, x, y = min(sig)
                v = abs(int(lv[sy + y, sx + x]))
                lv[sy + y, sx + x] = -v if (par & 1) else v
    return lv


@pytest.mark.parametrize("dep_quant,sdh", [(False, False), (True, False), (False, True)])
def test_native_residual_parity(dep_quant, sdh):
    rng = np.random.RandomState(17 + dep_quant * 2 + sdh)
    cases = []
    for _ in range(120):
        lw, lh = int(rng.randint(1, 7)), int(rng.randint(1, 7))
        luma = bool(rng.randint(0, 2))
        n, m = 1 << lh, 1 << lw
        dens = rng.choice([0.05, 0.2, 0.5, 0.9])
        amp = rng.choice([3, 12, 60, 400])
        lv = (rng.randint(-amp, amp + 1, (n, m)) * (rng.rand(n, m) < dens)).astype(np.int32)
        if lw > 5:
            lv[:, 32:] = 0
        if lh > 5:
            lv[32:, :] = 0
        if sdh:
            lv = _fix_sdh(lv, lw, lh)
        if not lv.any():
            lv[0, 0] = 1
        cases.append((lw, lh, luma, lv))

    enc = CabacEncoder(2, 30)
    wio = CabacWriterIO(enc)
    for lw, lh, luma, lv in cases:
        residual_coding(wio, lv.copy(), lw, lh, luma, dep_quant, sdh,
                        last_pos=find_last_pos(lv, lw, lh))
    enc.encode_terminate(1)
    data = enc.finish()

    pio = CabacReaderIO(CabacDecoder(data, 2, 30))
    py_out = [residual_coding(pio, None, lw, lh, luma, dep_quant, sdh)
              for lw, lh, luma, _ in cases]
    assert pio.terminate() == 1

    na = NativeCabacDecoder(data, 2, 30)
    for i, (lw, lh, luma, _) in enumerate(cases):
        nl, nd, nlast, nsig = na.decode_tb(lw, lh, luma, dep_quant, sdh)
        pl, pd, plast, psig = py_out[i]
        assert np.array_equal(nl, pl), f"levels mismatch case {i}"
        assert np.array_equal(nd, pd), f"decoded mismatch case {i}"
        assert nlast == plast and nsig == psig, f"meta mismatch case {i}"
    assert na.decode_terminate() == 1

"""Native (C) CABAC decoder parity vs the Python engine."""

import numpy as np
import pytest

from openvvc_tpu.cabac.engine import CabacDecoder, CabacEncoder
from openvvc_tpu.native import NativeCabacDecoder, load_cabac_lib

pytestmark = pytest.mark.skipif(load_cabac_lib() is None, reason="no native lib")


def _random_trace(seed, n=4000):
    rng = np.random.RandomState(seed)
    ops = []
    for _ in range(n):
        r = rng.rand()
        if r < 0.6:
            ops.append(("bin", int(rng.randint(0, 393)), int(rng.randint(0, 2))))
        elif r < 0.9:
            ops.append(("bypass", None, int(rng.randint(0, 2))))
        else:
            nb = int(rng.randint(1, 9))
            ops.append(("bits", nb, int(rng.randint(0, 1 << nb))))
    return ops


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_native_matches_python(seed):
    ops = _random_trace(seed)
    enc = CabacEncoder(2, 30)
    for kind, arg, val in ops:
        if kind == "bin":
            enc.encode_bin(val, arg)
        elif kind == "bypass":
            enc.encode_bypass(val)
        else:
            for k in range(arg - 1, -1, -1):
                enc.encode_bypass((val >> k) & 1)
    enc.encode_terminate(1)
    data = enc.finish()

    py = CabacDecoder(data, 2, 30)
    na = NativeCabacDecoder(data, 2, 30)
    for kind, arg, val in ops:
        if kind == "bin":
            a, b = py.decode_bin(arg), na.decode_bin(arg)
        elif kind == "bypass":
            a, b = py.decode_bypass(), na.decode_bypass()
        else:
            a, b = py.decode_bypass_bits(arg), na.decode_bypass_bits(arg)
        assert a == b == val
    assert py.decode_terminate() == na.decode_terminate() == 1
    assert py.overread() == na.overread() is False

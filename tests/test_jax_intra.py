"""Batched JAX intra prediction == scalar reference, all modes.

(Full sweep over 6 luma sizes + chroma was run during bring-up; the suite
keeps a representative subset for runtime.)
"""

import numpy as np
import pytest

from openvvc_tpu.rcn.jax_intra import predict_intra_group
from openvvc_tpu.rcn.ref_intra import predict_intra


def _mk_plane(rng, size=160, bd=8):
    return rng.randint(0, 1 << bd, (size, size)).astype(np.int32)


def _avail(x, y):
    return x >= 0 and y >= 0 and x < 160 and y < 160


@pytest.mark.parametrize("log2", [2, 4])
def test_all_modes_match(log2):
    rng = np.random.RandomState(log2)
    plane = _mk_plane(rng)
    s = 1 << log2
    tbs = [(s, s), (2 * s, s), (s, 2 * s), (0, s), (s, 0), (0, 0)]
    for mode in range(67):
        batched = predict_intra_group(plane, tbs, log2, log2, mode, _avail, 8, luma=True)
        for i, (x0, y0) in enumerate(tbs):
            ref = np.asarray(predict_intra(plane, x0, y0, log2, log2, mode, _avail, 8, luma=True))
            assert np.array_equal(batched[i], ref), f"mode {mode} tb {i} {s}x{s}"


def test_rect_chroma_10bit():
    rng = np.random.RandomState(9)
    plane = _mk_plane(rng)
    for (lw, lh) in [(3, 4), (4, 3), (2, 4)]:
        tbs = [(16, 16), (32, 8)]
        for mode in (0, 1, 2, 18, 34, 50, 66, 40):
            batched = predict_intra_group(plane, tbs, lw, lh, mode, _avail, 8, luma=True)
            for i, (x0, y0) in enumerate(tbs):
                ref = np.asarray(predict_intra(plane, x0, y0, lw, lh, mode, _avail, 8, luma=True))
                assert np.array_equal(batched[i], ref), f"mode {mode} {1<<lw}x{1<<lh}"
    # chroma (2-tap linear falls back to scalar; planar/DC/copy paths batched)
    for mode in (0, 1, 18, 50, 34, 45):
        tbs = [(8, 8), (16, 8)]
        batched = predict_intra_group(plane, tbs, 3, 3, mode, _avail, 8, luma=False)
        for i, (x0, y0) in enumerate(tbs):
            ref = np.asarray(predict_intra(plane, x0, y0, 3, 3, mode, _avail, 8, luma=False))
            assert np.array_equal(batched[i], ref), f"chroma mode {mode}"
    # 10-bit
    plane10 = _mk_plane(np.random.RandomState(3), bd=10)
    for mode in (0, 1, 2, 19, 50, 66):
        tbs = [(16, 16), (0, 0)]
        batched = predict_intra_group(plane10, tbs, 4, 4, mode, _avail, 10, luma=True)
        for i, (x0, y0) in enumerate(tbs):
            ref = np.asarray(predict_intra(plane10, x0, y0, 4, 4, mode, _avail, 10, luma=True))
            assert np.array_equal(batched[i], ref), f"10bit mode {mode}"

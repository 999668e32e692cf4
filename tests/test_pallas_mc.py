"""Pallas MC kernel parity vs the scalar reference (runs on the session's
device: real TPU under axon, or XLA CPU elsewhere — Mosaic supports both)."""

import numpy as np
import pytest

from openvvc_tpu.rcn import ref_mc
from openvvc_tpu.rcn.data_mc import MC_FILTERS_4, MC_FILTERS_C, MC_FILTERS_L


def _mcp(plane):
    from openvvc_tpu.rcn.pallas.mc import McPallas

    return McPallas(plane)


@pytest.mark.parametrize("w,h", [(16, 16), (8, 8), (8, 16), (4, 4),
                                 (32, 32), (64, 64)])
def test_pallas_luma_parity(w, h):
    rng = np.random.RandomState(3)
    H, W = 192, 256
    plane = rng.randint(0, 256, (H, W)).astype(np.int32)
    mcp = _mcp(plane)
    N = 23
    xs = rng.randint(-w - 3, W + 2, N).astype(np.int32)
    ys = rng.randint(-h - 3, H + 2, N).astype(np.int32)
    fx = rng.randint(1, 16, N)
    fy = rng.randint(1, 16, N)
    tab = MC_FILTERS_4 if (w == 4 and h == 4) else MC_FILTERS_L
    got = np.asarray(mcp.interp_14bit(xs, ys, tab[fx - 1], tab[fy - 1],
                                      w, h, 8))
    for i in range(N):
        want = np.asarray(ref_mc.interp_14bit(
            plane, int(xs[i]), int(ys[i]), int(fx[i]), int(fy[i]), w, h, 8,
            luma=True))
        assert np.array_equal(got[i], want), (w, h, i)


def test_pallas_chroma_embedding():
    """Chroma 4-tap rows embedded as [0,0,f0..f3,0,0] in the 8-tap kernel."""
    rng = np.random.RandomState(5)
    H, W = 96, 128
    plane = rng.randint(0, 256, (H, W)).astype(np.int32)
    mcp = _mcp(plane)
    N = 17
    w = h = 8
    xs = rng.randint(0, W - w - 4, N).astype(np.int32)
    ys = rng.randint(0, H - h - 4, N).astype(np.int32)
    fx = rng.randint(1, 32, N)
    fy = rng.randint(1, 32, N)
    rows = np.zeros((N, 8), np.int32)
    rows_v = np.zeros((N, 8), np.int32)
    rows[:, 2:6] = MC_FILTERS_C[fx - 1]
    rows_v[:, 2:6] = MC_FILTERS_C[fy - 1]
    got = np.asarray(mcp.interp_14bit(xs, ys, rows, rows_v, w, h, 8))
    for i in range(N):
        want = np.asarray(ref_mc.interp_14bit(
            plane, int(xs[i]), int(ys[i]), int(fx[i]), int(fy[i]), w, h, 8,
            luma=False))
        assert np.array_equal(got[i], want), i

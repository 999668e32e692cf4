"""Device intra wave kernel vs the scalar reference (rcn/ref_intra.py).

Every (size, mode, availability) class goes through tpu/intra_wave.py's
branchless batch kernel and must match ref_intra.predict_intra + residual
add elementwise — the same oracle recon.c's intra path is validated
against.
"""

import numpy as np
import pytest

from openvvc_tpu.rcn.ref_intra import predict_intra
from openvvc_tpu.tpu import intra_wave as iw


def _extents(avail_fn, x0, y0, l2w, l2h, unit):
    w, h = 1 << l2w, 1 << l2h
    corner = int(avail_fn(x0 - 1, y0 - 1))
    above = int(avail_fn(x0, y0 - 1))
    left = int(avail_fn(x0 - 1, y0))
    nava = navl = 0
    if above:
        nb = (2 * w + unit - 1) // unit
        nav = 0
        while nav < nb and avail_fn(x0 + nav * unit, y0 - 1):
            nav += 1
        nava = nav * unit
    if left:
        nb = (2 * h + unit - 1) // unit
        nav = 0
        while nav < nb and avail_fn(x0 - 1, y0 + nav * unit):
            nav += 1
        navl = nav * unit
    return corner, above, left, nava, navl


def _run_jobs(plane, resid, jobs, bitdepth, luma):
    import jax.numpy as jnp

    jf = np.zeros((iw.J_NFIELDS, len(jobs)), np.int32)
    jf[iw.J_MODE] = -1
    for i, j in enumerate(jobs):
        for k, v in j.items():
            jf[k, i] = v
    out = iw.predict_wave_step(jnp, jnp.asarray(plane), jnp.asarray(resid),
                               jnp.asarray(jf), bitdepth, luma)
    return np.asarray(out)


def _case(rng, bitdepth, luma, l2w, l2h, mode, avail_kind):
    H, W = 96, 96
    unit = 4 if luma else 2
    plane = rng.randint(0, 1 << bitdepth, (H, W)).astype(np.int32)
    resid = rng.randint(-50, 50, (H, W)).astype(np.int16)
    x0 = 16 + unit * rng.randint(0, 4)
    y0 = 16 + unit * rng.randint(0, 4)
    w, h = 1 << l2w, 1 << l2h

    if avail_kind == "all":
        avail = lambda x, y: 0 <= x < W and 0 <= y < H
    elif avail_kind == "none":
        avail = lambda x, y: False
    elif avail_kind == "above":
        avail = lambda x, y: 0 <= x < W and 0 <= y < y0
    elif avail_kind == "left":
        avail = lambda x, y: 0 <= x < x0 and 0 <= y < H
    else:  # partial runs along each side
        lim_a = x0 + unit * rng.randint(0, (2 * w) // unit + 1)
        lim_l = y0 + unit * rng.randint(0, (2 * h) // unit + 1)
        avail = lambda x, y: (0 <= x < W and 0 <= y < H
                              and (y < y0 or (x < x0 and y < lim_l))
                              and (y >= y0 or x < lim_a or y < y0 - 1
                                   or True))
        # simpler deterministic partial: above row available only up to
        # lim_a, left column only down to lim_l
        avail = lambda x, y: (0 <= x < W and 0 <= y < H
                              and ((y < y0 and x < lim_a)
                                   or (x < x0 and y < lim_l)))

    corner, above, left, nava, navl = _extents(avail, x0, y0, l2w, l2h, unit)

    ref_pred = predict_intra(plane, x0, y0, l2w, l2h, mode, avail, bitdepth,
                             luma)
    bd_max = (1 << bitdepth) - 1
    expected = np.clip(ref_pred + resid[y0:y0 + h, x0:x0 + w], 0, bd_max)

    jobs = []
    for oy in range(0, h, iw.TILE):
        for ox in range(0, w, iw.TILE):
            jobs.append({iw.J_X0: x0, iw.J_Y0: y0, iw.J_L2W: l2w,
                         iw.J_L2H: l2h, iw.J_OX: ox, iw.J_OY: oy,
                         iw.J_MODE: mode, iw.J_CORNER: corner,
                         iw.J_ABOVE: above, iw.J_LEFT: left,
                         iw.J_NAVA: nava, iw.J_NAVL: navl})
    got = _run_jobs(plane, resid, jobs, bitdepth, luma)
    np.testing.assert_array_equal(
        got[y0:y0 + h, x0:x0 + w], expected,
        err_msg=f"mode={mode} l2w={l2w} l2h={l2h} luma={luma} "
                f"avail={avail_kind} bd={bitdepth}")
    # untouched outside
    m = np.ones_like(plane, bool)
    m[y0:y0 + h, x0:x0 + w] = False
    np.testing.assert_array_equal(got[m], plane[m])


@pytest.mark.parametrize("mode", list(range(0, 67, 3)) + [1, 2, 18, 34, 50, 66])
def test_luma_modes_all_avail(mode):
    rng = np.random.RandomState(mode)
    _case(rng, 8, True, 3, 3, mode, "all")
    _case(rng, 10, True, 4, 4, mode, "all")


@pytest.mark.parametrize("l2w,l2h", [(2, 2), (2, 4), (4, 2), (3, 5), (5, 3),
                                     (5, 5), (2, 5), (5, 2)])
def test_luma_rect_sizes(l2w, l2h):
    rng = np.random.RandomState(l2w * 8 + l2h)
    for mode in (0, 1, 5, 13, 18, 29, 34, 41, 50, 61, 66):
        _case(rng, 10, True, l2w, l2h, mode, "all")


@pytest.mark.parametrize("avail", ["none", "above", "left", "partial"])
def test_luma_availability(avail):
    rng = np.random.RandomState(hash(avail) & 0xFFFF)
    for mode in (0, 1, 2, 10, 18, 34, 44, 50, 66):
        _case(rng, 8, True, 3, 3, mode, avail)
        _case(rng, 10, True, 4, 3, mode, avail)


@pytest.mark.parametrize("mode", [0, 1, 2, 12, 18, 26, 34, 42, 50, 58, 66])
def test_chroma_modes(mode):
    rng = np.random.RandomState(100 + mode)
    for (l2w, l2h) in ((1, 1), (2, 2), (1, 3), (3, 1), (4, 4), (5, 5)):
        _case(rng, 8, False, l2w, l2h, mode, "all")
    _case(rng, 10, False, 3, 3, mode, "partial")


def test_luma_64_subtiles():
    rng = np.random.RandomState(7)
    for mode in (0, 1, 18, 35, 50, 66):
        _case(rng, 10, True, 6, 6, mode, "all")
        _case(rng, 8, True, 6, 4, mode, "above")


def test_noop_jobs_leave_plane():
    import jax.numpy as jnp

    rng = np.random.RandomState(3)
    plane = rng.randint(0, 256, (64, 64)).astype(np.int32)
    resid = np.zeros((64, 64), np.int16)
    jf = np.zeros((iw.J_NFIELDS, 8), np.int32)
    jf[iw.J_MODE] = -1
    out = np.asarray(iw.predict_wave_step(jnp, jnp.asarray(plane),
                                          jnp.asarray(resid),
                                          jnp.asarray(jf), 8, True))
    np.testing.assert_array_equal(out, plane)

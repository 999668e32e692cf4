"""Bit-exact numpy reference for LMCS (luma mapping with chroma scaling).

Parity: /root/reference/libovvc/rcn_lmcs.c (compute_windows_scale_steps :96,
derive_forward_lut :133, derive_backward_lut :152, lmcs_compute_luma_average
:205, rcn_lmcs_compute_chroma_scale :321) and rcn_residuals.c
scale_add_residual :46 (chroma residual scaling application).
"""

from __future__ import annotations

import numpy as np

LMCS_PREC = 11
LMCS_RND = 1 << (LMCS_PREC - 1)


class LmcsState:
    def __init__(self, fwd_lut, bwd_lut, wnd_bnd, min_idx, max_idx, crs_offset, bitdepth):
        self.fwd_lut = fwd_lut
        self.bwd_lut = bwd_lut
        self.wnd_bnd = wnd_bnd
        self.min_idx = min_idx
        self.max_idx = max_idx
        self.crs_offset = crs_offset
        self.bitdepth = bitdepth
        self.chroma_scale = 1 << LMCS_PREC


def _bwd_idx(wnd_bnd, val, min_idx, max_idx_p1):
    i = min_idx
    while i < max_idx_p1:
        if val < wnd_bnd[i + 1]:
            break
        i += 1
    return min(i, 15)


def build_lmcs(data, bitdepth) -> LmcsState:
    smp_rng = 1 << bitdepth
    l2wr = bitdepth - 4
    nsw = smp_rng >> 4
    min_idx = data.lmcs_min_bin_idx
    max_idx_p1 = 16 - data.lmcs_delta_max_bin_idx

    cw = [0] * 16
    for i in range(min_idx, max_idx_p1):
        a = data.lmcs_delta_abs_cw[i]
        cw[i] = -a if data.lmcs_delta_sign_cw_flag[i] else a

    wnd_bnd = [0] * 17
    fwd_step = [0] * 16
    bwd_step = [0] * 16
    for i in range(min_idx, max_idx_p1):
        sz = nsw + cw[i]
        if sz:
            fwd_step[i] = ((sz << LMCS_PREC) + (1 << (l2wr - 1))) >> l2wr
            bwd_step[i] = (nsw << LMCS_PREC) // sz
        wnd_bnd[i + 1] = wnd_bnd[i] + sz
    for i in range(max_idx_p1, 16):
        wnd_bnd[i + 1] = wnd_bnd[i]

    mx = smp_rng - 1
    fwd_lut = np.zeros(smp_rng, np.int32)
    for val in range(smp_rng):
        idx = val >> l2wr
        f = wnd_bnd[idx] + ((fwd_step[idx] * (val - (idx << l2wr)) + LMCS_RND) >> LMCS_PREC)
        fwd_lut[val] = min(mx, max(0, f))
    bwd_lut = np.zeros(smp_rng, np.int32)
    for val in range(smp_rng):
        idx = _bwd_idx(wnd_bnd, val, min_idx, max_idx_p1)
        b = (idx << l2wr) + ((bwd_step[idx] * (val - wnd_bnd[idx]) + LMCS_RND) >> LMCS_PREC)
        bwd_lut[val] = min(mx, max(0, b))

    a = data.lmcs_delta_abs_crs
    crs = -a if data.lmcs_delta_sign_crs_flag else a
    return LmcsState(fwd_lut, bwd_lut, wnd_bnd, min_idx, max_idx_p1, crs, bitdepth)


def compute_chroma_scale(st: LmcsState, plane, x0, y0, avail_fn):
    """Per-64x64 chroma residual scale from the mapped luma neighbours
    (lmcs_compute_luma_average parity: 16 4-sample units per side, padded)."""
    def side_units(getter, avail):
        vals = []
        nb = 0
        last = None
        mask_bits = [avail(i) for i in range(16)]
        # mirror the while(mask) loop: run up to the highest set bit
        top = max((i + 1 for i, b in enumerate(mask_bits) if b), default=0)
        for i in range(top):
            v = [getter(4 * i + k) for k in range(4)]
            vals.extend(v)
            last = v[3]
            nb += 1
        if nb:
            pad = getter(4 * top - 1)
            vals.extend([pad] * 4 * (16 - nb))
            nb = 16
        return vals, nb

    abv_vals, nb_abv = side_units(
        lambda k: int(plane[y0 - 1, x0 + k]) if y0 > 0 else 0,
        lambda u: avail_fn(x0 + 4 * u, y0 - 1))
    lft_vals, nb_lft = side_units(
        lambda k: int(plane[y0 + k, x0 - 1]) if x0 > 0 else 0,
        lambda u: avail_fn(x0 - 1, y0 + 4 * u))

    nb = nb_abv + nb_lft
    if nb == 0:
        luma_avg = 1 << (st.bitdepth - 1)
    else:
        log2_nb = nb.bit_length()  # while(nb){log2++; nb>>=1} semantics
        total = sum(abv_vals) + sum(lft_vals)
        luma_avg = (total + (1 << log2_nb)) >> (log2_nb + 1)

    idx = _bwd_idx(st.wnd_bnd, luma_avg, st.min_idx, st.max_idx)
    wnd_sz = st.wnd_bnd[idx + 1] - st.wnd_bnd[idx]
    if wnd_sz == 0:
        st.chroma_scale = 1 << LMCS_PREC
    else:
        st.chroma_scale = (1 << (st.bitdepth - 4 + LMCS_PREC)) // (wnd_sz + st.crs_offset)
    return st.chroma_scale


def scale_residual(res: np.ndarray, scale: int, bitdepth: int) -> np.ndarray:
    """scale_add_residual math on an already-derived component residual."""
    v = res.astype(np.int64)
    mag = np.clip(np.abs(v), 0, (1 << bitdepth) - 1)
    mag = (mag * scale + LMCS_RND) >> LMCS_PREC
    out = np.where(v < 0, -mag, mag)
    return np.clip(out, -(1 << 15), 1 << 15)

"""Bit-exact numpy reference for CCLM / MDLM chroma prediction.

ITU-T H.266 8.4.5.2.14: cross-component linear model. Four boundary samples
(luma downsampled) are min/max-sorted to derive (a, b, shift); the chroma
block is predicted from the downsampled collocated luma.

Behavior parity: /root/reference/libovvc/rcn_intra_cclm.c (intra_cclm :660,
intra_mdlm_abv :746, intra_mdlm_lft :819, derive_cclm_params :104,
sort_average_lm_ref_samples :135, compute_lm_subsample :622, and the
*_cl collocated-filter variants :326-546).
"""

from __future__ import annotations

import numpy as np

INTRA_LT_CCLM = 81
INTRA_L_CCLM = 82
INTRA_T_CCLM = 83


def _floor_log2(v: int) -> int:
    return v.bit_length() - 1


_DIV_LUT = (0, 7, 6, 5, 5, 4, 4, 3, 3, 2, 2, 1, 1, 1, 1, 0)


def _compute_lm_params(avg_min_l, avg_min_c, avg_max_c, v, log2_rng_l):
    range_c = avg_max_c - avg_min_c
    log2_rng_c_plus1 = _floor_log2(abs(range_c)) + 1 if range_c else 0
    add = (1 << log2_rng_c_plus1) >> 1
    a = (range_c * v + add) >> log2_rng_c_plus1
    shift = 3 + log2_rng_l - log2_rng_c_plus1
    if shift < 1:
        shift = 1
        a = 0 if not a else (-15 if a < 0 else 15)
    b = avg_min_c - ((a * avg_min_l) >> shift)
    return a, b, shift


def _derive_cclm_params(min_l, max_l, min_cb, max_cb, min_cr, max_cr):
    """Returns ((a,b,shift) for cb, (a,b,shift) for cr)."""
    range_l = max_l - min_l
    if not range_l:
        return (0, min_cb, 0), (0, min_cr, 0)
    log2_rng_l = _floor_log2(range_l)
    norm_diff = ((range_l << 4) >> log2_rng_l) & 0xF
    v = _DIV_LUT[norm_diff] | 8
    log2_rng_l += norm_diff != 0
    return (_compute_lm_params(min_l, min_cb, max_cb, v, log2_rng_l),
            _compute_lm_params(min_l, min_cr, max_cr, v, log2_rng_l))


def _sort_average(smp_y, smp_cb, smp_cr):
    n = len(smp_y)
    if n == 2:
        mi = int(smp_y[0] >= smp_y[1])
        ma = 1 - mi
        return (smp_y[mi], smp_y[ma], smp_cb[mi], smp_cb[ma], smp_cr[mi], smp_cr[ma])
    idx = [0, 2, 1, 3]
    lo, hi = idx[:2], idx[2:]
    if smp_y[0] > smp_y[2]:
        lo[0], lo[1] = lo[1], lo[0]
    if smp_y[1] > smp_y[3]:
        hi[0], hi[1] = hi[1], hi[0]
    if smp_y[lo[0]] > smp_y[hi[1]]:
        lo, hi = hi, lo
    if smp_y[lo[1]] > smp_y[hi[0]]:
        lo[1], hi[0] = hi[0], lo[1]
    avg = lambda s, i, j: (s[i] + s[j] + 1) >> 1
    return (avg(smp_y, lo[0], lo[1]), avg(smp_y, hi[0], hi[1]),
            avg(smp_cb, lo[0], lo[1]), avg(smp_cb, hi[0], hi[1]),
            avg(smp_cr, lo[0], lo[1]), avg(smp_cr, hi[0], hi[1]))


class _Planes:
    """Sample accessors in chroma coordinates; luma indexed at 2x."""

    def __init__(self, luma, cb, cr, cx0, cy0):
        self.luma, self.cb, self.cr = luma, cb, cr
        self.cx0, self.cy0 = cx0, cy0

    def y(self, lx, ly):  # luma-relative to (2*cx0, 2*cy0)
        return int(self.luma[2 * self.cy0 + ly, 2 * self.cx0 + lx])

    def c(self, plane, cx, cy):
        return int(plane[self.cy0 + cy, self.cx0 + cx])


def _sub_abv0(p, step, n, lft_avail, collocated):
    """Above boundary at the CTU first line: single luma row (1,2,1)."""
    out_y, out_cb, out_cr = [], [], []
    start = step >> 1
    for i in range(n):
        lx = (start + i * step) << 1
        pad_left = (start == 0 and i == 0 and not lft_avail)
        s = 2 + p.y(lx - (0 if pad_left else 1), -1) + 2 * p.y(lx, -1) + p.y(lx + 1, -1)
        out_y.append(s >> 2)
        out_cb.append(p.c(p.cb, start + i * step, -1))
        out_cr.append(p.c(p.cr, start + i * step, -1))
    return out_y, out_cb, out_cr


def _sub_abv(p, step, n, lft_avail, collocated):
    out_y, out_cb, out_cr = [], [], []
    start = step >> 1
    for i in range(n):
        lx = (start + i * step) << 1
        pad = 0 if (start == 0 and i == 0 and not lft_avail) else 1
        if collocated:
            s = (4 + p.y(lx, -3) + p.y(lx - pad, -2) + 4 * p.y(lx, -2)
                 + p.y(lx + 1, -2) + p.y(lx, -1))
        else:
            s = (4 + p.y(lx - pad, -2) + 2 * p.y(lx, -2) + p.y(lx + 1, -2)
                 + p.y(lx - pad, -1) + 2 * p.y(lx, -1) + p.y(lx + 1, -1))
        out_y.append(s >> 3)
        out_cb.append(p.c(p.cb, start + i * step, -1))
        out_cr.append(p.c(p.cr, start + i * step, -1))
    return out_y, out_cb, out_cr


def _sub_lft(p, step, n, abv_avail, collocated):
    out_y, out_cb, out_cr = [], [], []
    start = step >> 1
    for i in range(n):
        ly = (start + i * step) << 1
        if collocated:
            pad_abv = (start == 0 and i == 0 and not abv_avail)
            s = (4 + p.y(-2, ly - (0 if pad_abv else 1)) + 4 * p.y(-2, ly)
                 + p.y(-3, ly) + p.y(-1, ly) + p.y(-2, ly + 1))
        else:
            s = (4 + 2 * p.y(-2, ly) + p.y(-1, ly) + p.y(-3, ly)
                 + 2 * p.y(-2, ly + 1) + p.y(-1, ly + 1) + p.y(-3, ly + 1))
        out_y.append(s >> 3)
        out_cb.append(p.c(p.cb, -1, start + i * step))
        out_cr.append(p.c(p.cr, -1, start + i * step))
    return out_y, out_cb, out_cr


def _predict_block(p, log2_w, log2_h, params_cb, params_cr, lft_avail, abv_avail,
                   collocated, bitdepth):
    w, h = 1 << log2_w, 1 << log2_h
    a_cb, b_cb, sh_cb = params_cb
    a_cr, b_cr, sh_cr = params_cr
    pred_cb = np.zeros((h, w), np.int32)
    pred_cr = np.zeros((h, w), np.int32)
    mx = (1 << bitdepth) - 1
    for j in range(h):
        for i in range(w):
            pad_left = 1 if not (i == 0 and not lft_avail) else 0
            if collocated:
                pad_abv = 1 if not (j == 0 and not abv_avail) else 0
                v = (4 + p.y(2 * i, 2 * j - pad_abv) + 4 * p.y(2 * i, 2 * j)
                     + p.y(2 * i - pad_left, 2 * j) + p.y(2 * i + 1, 2 * j)
                     + p.y(2 * i, 2 * j + 1)) >> 3
            else:
                v = (4 + p.y(2 * i + 1, 2 * j) + p.y(2 * i - pad_left, 2 * j)
                     + 2 * p.y(2 * i, 2 * j) + 2 * p.y(2 * i, 2 * j + 1)
                     + p.y(2 * i + 1, 2 * j + 1)
                     + p.y(2 * i - pad_left, 2 * j + 1)) >> 3
            pred_cb[j, i] = min(mx, max(0, ((v * a_cb) >> sh_cb) + b_cb))
            pred_cr[j, i] = min(mx, max(0, ((v * a_cr) >> sh_cr) + b_cr))
    return pred_cb, pred_cr


def predict_cclm(luma, cb, cr, cx0, cy0, log2_w, log2_h, mode, avail_fn,
                 ctb_log2, collocated, bitdepth):
    """CCLM/MDLM prediction for the chroma PB at (cx0, cy0) [chroma coords].

    avail_fn(cx, cy) -> chroma-sample availability. Returns (pred_cb, pred_cr).
    """
    pb_w, pb_h = 1 << log2_w, 1 << log2_h
    abv_avail = avail_fn(cx0, cy0 - 1)
    lft_avail = avail_fn(cx0 - 1, cy0)
    ctu_first_line = (cy0 << 1) % (1 << ctb_log2) == 0
    p = _Planes(luma, cb, cr, cx0, cy0)
    avg = 1 << (bitdepth - 1)
    params_cb = params_cr = None

    smp_y, smp_cb, smp_cr = [], [], []
    if mode == INTRA_LT_CCLM:
        if abv_avail or lft_avail:
            log2_nb_abv = int(bool(abv_avail)) + int(not lft_avail)
            log2_nb_lft = int(bool(lft_avail)) + int(not abv_avail)
            if abv_avail:
                n_abv = min(pb_w, (int(bool(abv_avail)) + int(not lft_avail)) << 1)
                step = max(1, pb_w >> log2_nb_abv)
                sub = _sub_abv0 if ctu_first_line else _sub_abv
                ys, cbs, crs = sub(p, step, n_abv, lft_avail, collocated)
                smp_y += ys; smp_cb += cbs; smp_cr += crs
            if lft_avail:
                n_lft = min(pb_h, (int(bool(lft_avail)) + int(not abv_avail)) << 1)
                step = max(1, pb_h >> log2_nb_lft)
                ys, cbs, crs = _sub_lft(p, step, n_lft, abv_avail, collocated)
                smp_y += ys; smp_cb += cbs; smp_cr += crs
    elif mode == INTRA_T_CCLM:
        if abv_avail:
            nb_pb_ref = (pb_w + min(pb_w, pb_h)) >> 1
            nav = 0
            while nav < nb_pb_ref and avail_fn(cx0 + 2 * nav, cy0 - 1):
                nav += 1
            avail_len = nav << 1
            n_abv = min(avail_len, 4)
            step = max(1, avail_len >> 2)
            sub = _sub_abv0 if ctu_first_line else _sub_abv
            smp_y, smp_cb, smp_cr = sub(p, step, n_abv, lft_avail, collocated)
    else:  # INTRA_L_CCLM
        if lft_avail:
            nb_pb_ref = (pb_h + min(pb_w, pb_h)) >> 1
            nav = 0
            while nav < nb_pb_ref and avail_fn(cx0 - 1, cy0 + 2 * nav):
                nav += 1
            avail_len = nav << 1
            n_lft = min(avail_len, 4)
            step = max(1, avail_len >> 2)
            smp_y, smp_cb, smp_cr = _sub_lft(p, step, n_lft, abv_avail, collocated)

    if smp_y:
        mn_l, mx_l, mn_cb, mx_cb, mn_cr, mx_cr = _sort_average(smp_y, smp_cb, smp_cr)
        params_cb, params_cr = _derive_cclm_params(mn_l, mx_l, mn_cb, mx_cb, mn_cr, mx_cr)
    else:
        params_cb, params_cr = (0, avg, 0), (0, avg, 0)

    return _predict_block(p, log2_w, log2_h, params_cb, params_cr,
                          lft_avail, abv_avail, collocated, bitdepth)

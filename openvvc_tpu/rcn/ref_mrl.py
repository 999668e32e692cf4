"""Bit-exact numpy reference for multi-reference-line (MRL) intra prediction.

ITU-T H.266 8.4.5.2.5 with refIdx > 0: prediction from reference line 1 or 2,
no PDPC and no reference smoothing; angular interpolation always cubic.

Behavior parity: /root/reference/libovvc/rcn_intra.c (vvc_intra_pred_multi_ref
:645), rcn_fill_ref.c (fill_ref_left_0_mref :228, fill_ref_above_0_mref :488),
rcn_intra_angular.c (intra_angular_v/h_cubic_mref :925-1002, nofrac kernels).
"""

from __future__ import annotations

import numpy as np

from openvvc_tpu.rcn.data_angular import ANGLE_TABLE, CUBIC_FILTER, INVERSE_ANGLE_TABLE
from openvvc_tpu.rcn.ref_intra import (
    RefArrays,
    _bdclip,
    derive_wide_angular_mode,
    intra_dc,
    intra_planar,
)

OVINTRA_HOR = 18
OVINTRA_DIA = 34
OVINTRA_VER = 50


def _fill_mref_above(plane, x0, y0, log2_w, log2_h, m, avail_fn, bitdepth):
    """Reference line m above; returned RefArrays indexed like the shifted
    ref1 pointer: ref[k] = plane[y0-1-m, x0-1+k] when fully available."""
    w, h = 1 << log2_w, 1 << log2_h
    avg = 1 << (bitdepth - 1)
    ref = RefArrays(2 * max(w, h) + 8)
    ref.buf[:] = avg
    nb_units = (2 * w) >> 2
    corner = avail_fn(x0 - 1, y0 - 1)
    units = [avail_fn(x0 + 4 * i, y0 - 1) for i in range(nb_units + 1)]
    row = y0 - 1 - m

    def f(i, v):  # fill-buffer index i == ref index i - m
        ref[i - m] = v

    if corner and all(units):
        for i in range(2 * w + m + 2):
            f(i, plane[row, x0 - 1 - m + i])
    elif corner or any(units):
        if corner:
            for i in range(m + 1):
                f(i, plane[row, x0 - 1 - m + i])
        else:
            for i in range(m + 1):
                f(i, plane[row, x0])
        nb_avl = max(i + 1 for i, a in enumerate(units) if a) if any(units) else 0
        pad = avg
        for u in range(nb_avl):
            for t in range(4):
                f(m + 1 + 4 * u + t, plane[row, x0 + 4 * u + t])
            pad = plane[row, x0 + 4 * u + 3]
        for u in range(nb_avl, nb_units + 1):
            for t in range(4):
                f(m + 1 + 4 * u + t, pad)
    else:
        left_any = any(avail_fn(x0 - 1, y0 + 4 * i - 4) for i in range(((2 * h) >> 2) + 2))
        pad = plane[y0, x0 - 1] if left_any else avg
        for i in range(2 * w + m + 2):
            f(i, pad)

    ratio = max(1, w >> log2_h)
    for i in range((m + 1) * ratio):
        ref[2 * w + 1 + i] = ref[2 * w + i]
    return ref


def _fill_mref_left(plane, x0, y0, log2_w, log2_h, m, avail_fn, bitdepth):
    """Reference line m left; indexed like the shifted ref2 pointer:
    ref[k] = plane[y0-1+k, x0-1-m] when fully available."""
    w, h = 1 << log2_w, 1 << log2_h
    avg = 1 << (bitdepth - 1)
    ref = RefArrays(2 * max(w, h) + 8)
    ref.buf[:] = avg
    nb_units = (2 * h) >> 2
    corner = avail_fn(x0 - 1, y0 - 1)
    units = [avail_fn(x0 - 1, y0 + 4 * i) for i in range(nb_units + 1)]
    col = x0 - 1 - m

    def f(i, v):
        ref[i - m] = v

    if corner and all(units):
        for i in range(2 * h + m + 2):
            f(i, plane[y0 - 1 - m + i, col])
    elif corner or any(units):
        if corner:
            for i in range(m + 1):
                f(i, plane[y0 - 1 - m + i, col])
            row0 = y0  # unit copies start at the block's first row
        else:
            # reference quirk: single sample at row y0-m repeated, and unit
            # copies continue from that (shifted) row
            for i in range(m + 1):
                f(i, plane[y0 - m, col])
            row0 = y0 - m
        nb_pb_avl = max((i + 1 for i, a in enumerate([corner] + units) if a), default=0)
        pad = avg
        u = 0
        for u in range(nb_pb_avl - 1):
            for t in range(4):
                f(m + 1 + 4 * u + t, plane[row0 + 4 * u + t, col])
            pad = plane[row0 + 4 * u + 3, col]
        for u in range(max(0, nb_pb_avl - 1), nb_units + 1):
            for t in range(4):
                f(m + 1 + 4 * u + t, pad)
    else:
        abv_any = any(avail_fn(x0 + 4 * i - 4, y0 - 1) for i in range(((2 * w) >> 2) + 2))
        pad = plane[y0 - 1 - m, x0] if abv_any else avg
        for i in range(2 * h + m + 2):
            f(i, pad)

    ratio = max(1, h >> log2_w)
    for i in range((m + 1) * ratio):
        ref[2 * h + 1 + i] = ref[2 * h + i]
    return ref


def _angular_cubic_mref(ref, log2_len, log2_n_lines, angle_val, m, bitdepth):
    """Rows of len 2^log2_len along the main ref; delta starts angle*(m+1)."""
    n_lines, length = 1 << log2_n_lines, 1 << log2_len
    out = np.zeros((n_lines, length), np.int64)
    delta_pos = angle_val * (m + 1)
    for y in range(n_lines):
        d_int, d_frac = delta_pos >> 5, delta_pos & 0x1F
        flt = CUBIC_FILTER[d_frac]
        base = ref.view(d_int, d_int + length + 3).astype(np.int64)
        out[y] = (base[:-3] * flt[0] + base[1:-2] * flt[1]
                  + base[2:-1] * flt[2] + base[3:] * flt[3] + 32) >> 6
        delta_pos += angle_val
    return _bdclip(out, bitdepth)


def _angular_nofrac(ref, log2_len, log2_n_lines, angle_val):
    n_lines, length = 1 << log2_n_lines, 1 << log2_len
    out = np.zeros((n_lines, length), np.int64)
    delta_pos = angle_val
    for y in range(n_lines):
        d_int = delta_pos >> 5
        out[y] = ref.view(d_int + 1, d_int + 1 + length)
        delta_pos += angle_val
    return out


def _predict_mrl_main(ref_main, ref_side, log2_len, log2_n_lines, mode_idx, m, bitdepth):
    """Prediction along the main direction (rows = lines), unoriented."""
    length, n_lines = 1 << log2_len, 1 << log2_n_lines
    if mode_idx == 0:  # pure H/V
        row = ref_main.view(1, 1 + length)
        return np.repeat(row[None, :], n_lines, axis=0)
    if mode_idx == 16:  # diagonal: ref shifted by an extra m
        out = np.zeros((n_lines, length), np.int64)
        for y in range(n_lines):
            out[y] = ref_main.view(m + y + 2, m + y + 2 + length)
        return out
    if mode_idx < 0:
        inv_angle = INVERSE_ANGLE_TABLE[-mode_idx]
        angle_val = -ANGLE_TABLE[-mode_idx]
        inv_sum = 256
        for k in range(-1, -n_lines - 1, -1):
            inv_sum += inv_angle
            ref_main[k - m] = ref_side[min(inv_sum >> 9, n_lines) - m]
    else:
        angle_val = ANGLE_TABLE[mode_idx]
    if angle_val & 0x1F:
        return _angular_cubic_mref(ref_main, log2_len, log2_n_lines, angle_val, m, bitdepth)
    off = (angle_val * m) >> 5
    shifted = RefArrays(0)
    shifted.buf, shifted.off = ref_main.buf, ref_main.off + off
    return _angular_nofrac(shifted, log2_len, log2_n_lines, angle_val)


def predict_intra_mrl(plane, x0, y0, log2_w, log2_h, mode, mrl_idx, avail_fn, bitdepth):
    """MRL intra prediction (luma only); returns [h, w] int64."""
    m = mrl_idx
    ref_a = _fill_mref_above(plane, x0, y0, log2_w, log2_h, m, avail_fn, bitdepth)
    ref_l = _fill_mref_left(plane, x0, y0, log2_w, log2_h, m, avail_fn, bitdepth)

    if mode == 0:
        return intra_planar(ref_a, ref_l, log2_w, log2_h)
    if mode == 1:
        return intra_dc(ref_a, ref_l, log2_w, log2_h)

    pred_mode = derive_wide_angular_mode(log2_w, log2_h, mode)
    if pred_mode >= OVINTRA_DIA:
        return _predict_mrl_main(ref_a, ref_l, log2_w, log2_h,
                                 pred_mode - OVINTRA_VER, m, bitdepth)
    return _predict_mrl_main(ref_l, ref_a, log2_h, log2_w,
                             -(pred_mode - OVINTRA_HOR), m, bitdepth).T

"""Bit-exact numpy reference for ISP (intra sub-partitions) reconstruction.

ITU-T H.266 8.4.5.1 IntraSubPartitions: the CU is split into 2 or 4 luma
sub-partitions reconstructed sequentially; prediction runs on min-4-wide/high
chunks with reference arrays built over the CU extents, always cubic
interpolation, no reference smoothing; PDPC per the cubic dispatcher rules.

Behavior parity: /root/reference/libovvc/rcn_intra.c (vvc_intra_pred_isp :567,
intra_angular_cubic_v/h :289/:372), rcn_fill_ref.c (fill_ref_left_0 :71,
fill_ref_above_0 :320 with their ISP offset arguments), rcn_transform_tree.c
(recon_isp_subtree_v/h :1088/:1152, rcn_1xX_tb/rcn_Xx1_tb/rcn_2xX_tb/
rcn_Xx2_tb/rcn_isp_tu :969-1086).
"""

from __future__ import annotations

import numpy as np

from openvvc_tpu.rcn.data_angular import ANGLE_TABLE, INVERSE_ANGLE_TABLE
from openvvc_tpu.rcn.data_transform import MATRICES
from openvvc_tpu.rcn.ref_intra import (
    OVINTRA_DIA,
    OVINTRA_HOR,
    OVINTRA_VER,
    RefArrays,
    _bdclip,
    _floor_log2,
    _pdpc_angular,
    _pdpc_pure,
    derive_wide_angular_mode,
    intra_angular_core,
    intra_dc,
    intra_planar,
    pdpc_dc_planar,
)


def _fill_isp_above(plane, cu_x0, row_y, log2_cb_w, offset_x, avail_fn, bitdepth):
    """fill_ref_above_0 with ISP offset; returns RefArrays in SHIFTED indexing
    (ref[k] = sample at column cu_x0-1+offset_x+k of row row_y-1)."""
    w = 1 << log2_cb_w
    avg = 1 << (bitdepth - 1)
    buf = RefArrays(2 * w + offset_x + 16)
    buf.buf[:] = avg
    nb_units = (2 * w) >> 2
    corner = avail_fn(cu_x0 - 1, row_y - 1)
    units = [avail_fn(cu_x0 + 4 * i, row_y - 1) for i in range(nb_units + 1)]

    def f(i, v):  # unshifted fill index -> shifted ref index
        buf[i - offset_x] = v

    if corner and all(units):
        for i in range(2 * w + 1):
            f(i, plane[row_y - 1, cu_x0 - 1 + i])
    elif corner or any(units):
        # nb_pb_avl = highest set bit over (corner, units...) + 1; units are
        # copied unconditionally up to it (reference memcpy), then padded
        bits = [corner] + units
        nb_pb_avl = max(i + 1 for i, a in enumerate(bits) if a)
        for u in range(nb_pb_avl - 1):
            for t in range(4):
                f(1 + 4 * u + t, plane[row_y - 1, cu_x0 + 4 * u + t])
        corner_val = plane[row_y - 1, cu_x0 - 1 + offset_x] if corner else plane[row_y - 1, cu_x0]
        f(0, corner_val)
        pad = plane[row_y - 1, cu_x0 + 4 * (nb_pb_avl - 1) - 1] if nb_pb_avl > 1 else corner_val
        for u in range(nb_pb_avl - 1, nb_units + 1):
            for t in range(4):
                f(1 + 4 * u + t, pad)
    else:
        # fallback pad from the chunk-left column (the fill's intra_map_cols
        # is indexed at the chunk position: vvc_intra_pred_isp :671)
        left_any = avail_fn(cu_x0 - 1 + offset_x, row_y)
        pad = plane[row_y, cu_x0 - 1 + offset_x] if left_any else avg
        for i in range(2 * w + 1):
            f(i, pad)

    # wide-angle padding (chained replicate of the last sample)
    for i in range(4 + offset_x):
        f(2 * w + 1 + i, buf[2 * w + i - offset_x])
    return buf


def _fill_isp_left(plane, col_x, cu_y0, log2_cb_h, offset_y, avail_fn, bitdepth):
    """fill_ref_left_0 with ISP offset; SHIFTED indexing
    (ref[k] = sample at row cu_y0-1+offset_y+k of column col_x-1)."""
    h = 1 << log2_cb_h
    avg = 1 << (bitdepth - 1)
    buf = RefArrays(2 * h + offset_y + 16)
    buf.buf[:] = avg
    nb_units = (2 * h) >> 2
    corner = avail_fn(col_x - 1, cu_y0 - 1)
    units = [avail_fn(col_x - 1, cu_y0 + 4 * i) for i in range(nb_units + 1)]

    def f(i, v):
        buf[i - offset_y] = v

    if corner and all(units):
        for i in range(2 * h + 1):
            f(i, plane[cu_y0 - 1 + i, col_x - 1])
    elif corner or any(units):
        bits = [corner] + units
        nb_pb_avl = max(i + 1 for i, a in enumerate(bits) if a)
        corner_val = plane[cu_y0 - 1 + offset_y, col_x - 1] if corner else plane[cu_y0, col_x - 1]
        f(0, corner_val)
        for u in range(nb_pb_avl - 1):
            for t in range(4):
                f(1 + 4 * u + t, plane[cu_y0 + 4 * u + t, col_x - 1])
        pad = plane[cu_y0 + 4 * (nb_pb_avl - 1) - 1, col_x - 1] if nb_pb_avl > 1 else corner_val
        for u in range(nb_pb_avl - 1, nb_units + 1):
            for t in range(4):
                f(1 + 4 * u + t, pad)
    else:
        # fallback pad from the row above the chunk (intra_map_rows indexed
        # at the chunk row)
        abv_any = avail_fn(col_x, cu_y0 - 1 + offset_y)
        pad = plane[cu_y0 - 1 + offset_y, col_x] if abv_any else avg
        for i in range(2 * h + 1):
            f(i, pad)

    for i in range(4 + offset_y):
        f(2 * h + 1 + i, buf[2 * h - offset_y])  # replicate of fill[2h] (ref quirk: constant)
    return buf


def predict_isp_chunk(plane, cu_x0, cu_y0, log2_cb_w, log2_cb_h, sx, sy,
                      log2_pw, log2_ph, mode, avail_fn, bitdepth):
    """Prediction of one ISP chunk (>=4 wide and high) at (sx, sy)."""
    offset_x = sx - cu_x0
    offset_y = sy - cu_y0
    ref_a = _fill_isp_above(plane, cu_x0, sy, log2_cb_w, offset_x, avail_fn, bitdepth)
    ref_l = _fill_isp_left(plane, sx, cu_y0, log2_cb_h, offset_y, avail_fn, bitdepth)

    cb_w, cb_h = 1 << log2_cb_w, 1 << log2_cb_h
    pb_w, pb_h = 1 << log2_pw, 1 << log2_ph
    # extra padding beyond cb+pb (vvc_intra_pred_isp :599-606)
    for i in range(4):
        ref_l[cb_h + pb_h + 1 + i] = ref_l[cb_h + pb_h + i]
    for i in range(4):
        ref_a[cb_w + pb_w + 1 + i] = ref_a[cb_w + pb_w + i]

    if mode == 0:
        pred = intra_planar(ref_a, ref_l, log2_pw, log2_ph)
        if log2_ph > 1:
            return pdpc_dc_planar(pred, ref_a, ref_l, log2_pw, log2_ph, bitdepth)
        return pred
    if mode == 1:
        pred = intra_dc(ref_a, ref_l, log2_pw, log2_ph)
        if log2_ph > 1:
            return pdpc_dc_planar(pred, ref_a, ref_l, log2_pw, log2_ph, bitdepth)
        return pred

    pred_mode = derive_wide_angular_mode(log2_cb_w, log2_cb_h, mode)  # CU dims!
    vertical = pred_mode >= OVINTRA_DIA
    if vertical:
        mode_idx = pred_mode - OVINTRA_VER
        ref_main, ref_side = ref_a, ref_l
        n_lines, line_len = pb_h, pb_w
        main_log2, side_log2 = log2_pw, log2_ph
    else:
        mode_idx = -(pred_mode - OVINTRA_HOR)
        ref_main, ref_side = ref_l, ref_a
        n_lines, line_len = pb_w, pb_h
        main_log2, side_log2 = log2_ph, log2_pw

    def oriented(p):
        return p if vertical else p.T

    # both cubic dispatchers gate PDPC on the block HEIGHT (log2_pb_h > 1)
    pdpc_dim_ok = log2_ph > 1

    if mode_idx == 0:
        pred = np.tile(ref_main.view(1, 1 + line_len), (n_lines, 1))
        if pdpc_dim_ok:
            return _pdpc_pure(pred, ref_a, ref_l, log2_pw, log2_ph, vertical, bitdepth)
        return oriented(pred)

    if mode_idx == 16:
        pred = intra_angular_core(ref_main, 2 * line_len, 32, n_lines, line_len, "copy", bitdepth)
        if pdpc_dim_ok:
            scale = min(2, side_log2 - 2)
            pred = _pdpc_angular(pred, ref_side, 512, scale, n_lines, line_len, bitdepth)
        return oriented(pred)

    abs_angle = ANGLE_TABLE[abs(mode_idx)]
    inv_angle = INVERSE_ANGLE_TABLE[abs(mode_idx)]
    req_frac = bool(abs_angle & 0x1F)
    pdpc_scale = min(2, side_log2 - (_floor_log2(3 * inv_angle - 2) - 8))
    filt = "cubic" if req_frac else "copy"

    if mode_idx < 0:
        n_proj = n_lines
        s = 256
        for k in range(-1, -n_proj - 1, -1):
            s += inv_angle
            ref_main[k] = ref_side[min(s >> 9, n_proj)]
        pred = intra_angular_core(ref_main, 2 * line_len, -abs_angle, n_lines, line_len, filt, bitdepth)
        return oriented(pred)

    pred = intra_angular_core(ref_main, 2 * line_len, abs_angle, n_lines, line_len, filt, bitdepth)
    if pdpc_scale >= 0 and pdpc_dim_ok:
        pred = _pdpc_angular(pred, ref_side, inv_angle, pdpc_scale, n_lines, line_len, bitdepth)
    return oriented(pred)


# ----------------------------------------------------------------------
# ISP residual reconstruction (narrow transforms)
# ----------------------------------------------------------------------

from openvvc_tpu.rcn.ref_transform import apply_lfnst, dequant  # noqa: E402


def isp_transform_types(log2_cb_w, log2_cb_h, log2_pb_w, log2_pb_h, vertical, mts_enabled):
    """Implicit transform pair for ISP sub-TBs (recon_isp_subtree_v/h)."""
    if vertical:
        tr_h = "DST7" if (mts_enabled and 1 < log2_pb_w <= 4) else "DCT2"
        tr_v = "DST7" if (mts_enabled and log2_cb_h <= 4) else "DCT2"
    else:
        tr_h = "DST7" if (mts_enabled and log2_cb_w <= 4) else "DCT2"
        tr_v = "DST7" if (mts_enabled and 1 < log2_pb_h <= 4) else "DCT2"
    return tr_h, tr_v


def reconstruct_isp_tb(tu, dep_quant, bitdepth, tr_h, tr_v, lfnst_mode):
    """Dequant + inverse transform for one ISP sub-TB (any width incl 1/2)."""
    log2_w, log2_h = tu.log2_w, tu.log2_h
    dq = dequant(tu.coeffs, tu.qp, log2_w, log2_h, dep_quant, bitdepth)
    clip_lo, clip_hi = -(1 << 15), (1 << 15) - 1

    if log2_w == 0 or log2_h == 0:
        # single 1-D transform, shift TR_SHIFT_H + 1 (rcn_1xX_tb/rcn_Xx1_tb)
        shift = (6 + 15 - 1) - bitdepth + 1
        add = 1 << (shift - 1)
        if log2_w == 0:
            m = MATRICES[(tr_v, 1 << log2_h)].astype(np.int64)
            out = np.clip((dq[:, 0].astype(np.int64) @ m + add) >> shift, clip_lo, clip_hi)
            return out.astype(np.int32)[:, None]
        m = MATRICES[(tr_h, 1 << log2_w)].astype(np.int64)
        out = np.clip((dq[0, :].astype(np.int64) @ m + add) >> shift, clip_lo, clip_hi)
        return out.astype(np.int32)[None, :]

    if tu.lfnst_idx and log2_w >= 2 and log2_h >= 2:
        dq = apply_lfnst(dq, min(5, log2_w), min(5, log2_h), tu.lfnst_idx, lfnst_mode)
        tr_h = tr_v = "DCT2"

    # standard two-stage (incl. 2xN / Nx2)
    shift1 = 7
    shift2 = (6 + 15 - 1) - bitdepth
    m_v = MATRICES[(tr_v, 1 << log2_h)].astype(np.int64)
    m_h = MATRICES[(tr_h, 1 << log2_w)].astype(np.int64)
    d = dq.astype(np.int64)
    tmp = np.clip((d.T @ m_v + (1 << (shift1 - 1))) >> shift1, clip_lo, clip_hi)
    out = np.clip((tmp.T @ m_h + (1 << (shift2 - 1))) >> shift2, clip_lo, clip_hi)
    return out.astype(np.int32)

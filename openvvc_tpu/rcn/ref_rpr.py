"""RPR (reference picture resampling) scaled-reference MC + output upscale.

Bit-exact numpy port of the reference's RPR path:
- scale-factor derivation: ctudec_compute_refs_scaling
  (/root/reference/libovvc/ctudec.c:43-88) over scaling-window-corrected
  dimensions, RPR_SCALE_BITS = 14 (dec_structures.h:49);
- scaled MC: rcn_mcp_rpr_l / rcn_mcp_rpr_c and the _bi variants
  (/root/reference/libovvc/rcn_inter.c:2026-2514): per-output-column
  horizontal FIR at a per-column 1/16 (1/32 chroma) phase into a 14-bit
  intermediate, then per-output-row vertical FIR; filter-bank selection by
  downscale ratio (compute_rpr_filter_idx :1991, thresholds 1.25 / 1.75),
  window clip via clip_rpr_position (:2010), edge handling equal to
  emulate_block_border border replication;
- output upscale: pp_sample_rate_conv
  (/root/reference/libovvc/pp_pic_scale.c:250-377) incl. its quirks
  (BITDEPTH hardcoded to 10 -> maxVal 1023, luma scale_bits 13 with the
  scaling window counted twice).

The per-column/per-row phase structure means every output sample is a
dense 8x8 (luma) separable FIR over a gathered window — the same
gather+matmul shape as the normal MC path, so the device formulation
reuses the jax_mc gather pattern when batched.
"""

from __future__ import annotations

import numpy as np

from openvvc_tpu.rcn.data_rpr import (
    MC_FILTERS_RPR_C,
    MC_FILTERS_RPR_L,
    PP_DOWN_FILTERS,
    PP_UP_FILTERS_C,
    PP_UP_FILTERS_L,
)

RPR_SCALE_BITS = 14
NO_SCALE = 1 << RPR_SCALE_BITS

_F_RPR_L = np.asarray(MC_FILTERS_RPR_L, np.int64)  # (6, 16, 8)
_F_RPR_C = np.asarray(MC_FILTERS_RPR_C, np.int64)  # (3, 32, 4)


def scaling_dims(frame_w: int, frame_h: int, win) -> tuple[int, int]:
    """Scaling-window-corrected dimensions (ctudec.c:47-50; offsets are in
    chroma units, 4:2:0 -> x2 luma samples)."""
    wl, wr, wt, wb = win
    return frame_w - ((wl + wr) << 1), frame_h - ((wt + wb) << 1)


def rpr_scale_factors(cur_w, cur_h, cur_win, ref_w, ref_h, ref_win):
    """(scale_hor, scale_ver) in 1.14 fixed point (ctudec.c:66-67)."""
    pw, ph = scaling_dims(cur_w, cur_h, cur_win)
    rw, rh = scaling_dims(ref_w, ref_h, ref_win)
    sh = ((rw << RPR_SCALE_BITS) + (pw >> 1)) // pw
    sv = ((rh << RPR_SCALE_BITS) + (ph >> 1)) // ph
    return sh, sv


def rpr_filter_idx(scale_factor: int, flag_4x4: bool) -> int:
    """compute_rpr_filter_idx parity (rcn_inter.c:1991-2006)."""
    thr1 = NO_SCALE * 5 // 4
    thr2 = NO_SCALE * 7 // 4
    idx = 3 if flag_4x4 else 0
    if scale_factor > thr2:
        idx += 2
    elif scale_factor > thr1:
        idx += 1
    return idx


def _clip_rpr_position(pos_x, pos_y, pic_w, pic_h, pb_w, pb_h, shift_pos):
    """clip_rpr_position parity (rcn_inter.c:2010-2023)."""
    prec_x = pos_x & ((1 << shift_pos) - 1)
    prec_y = pos_y & ((1 << shift_pos) - 1)
    x_max = (pic_w + 3) << shift_pos
    y_max = (pic_h + 3) << shift_pos
    x_min = -((pb_w + 4) << shift_pos)
    y_min = -((pb_h + 4) << shift_pos)
    pos_x = min(max(pos_x, x_min + prec_x), x_max + prec_x)
    pos_y = min(max(pos_y, y_min + prec_y), y_max + prec_y)
    return pos_x, pos_y


def _mc_rpr_core(plane, pos_x, pos_y, w, h, mvx, mvy, sh, sv, bd,
                 luma: bool, flag_4x4: bool, add_x: int, add_y: int):
    """Shared H+V scaled-FIR core; returns the 14-bit (pre-clip) block.

    Geometry/rounding parity with rcn_mcp_rpr_l (luma: shift_mv 4, 8 taps,
    padding 3) / rcn_mcp_rpr_c (chroma: shift_mv 5, 4 taps, padding 1).
    Border handling: per-sample coordinate clamp == emulate_block_border
    replication (rcn_inter.c:149-226).
    """
    H, W = plane.shape
    if luma:
        shift_mv, nb_taps, before = 4, 8, 3
        fbank = _F_RPR_L
        pmask = 0xF
    else:
        shift_mv, nb_taps, before = 5, 4, 1
        fbank = _F_RPR_C
        pmask = 0x1F
    shift_pos = RPR_SCALE_BITS + shift_mv
    offset = 1 << (RPR_SCALE_BITS - 1)
    fidx_h = rpr_filter_idx(sh, flag_4x4)
    fidx_v = rpr_filter_idx(sv, flag_4x4)
    step_x = ((sh + 8) >> 4) << 4
    step_y = ((sv + 8) >> 4) << 4

    init_off = 1 << (8 - luma)  # luma (1<<7), chroma (1<<8)
    ref_pos_x = ((pos_x << shift_mv) + mvx) * sh + add_x + init_off
    ref_pos_y = ((pos_y << shift_mv) + mvy) * sv + add_y + init_off
    ref_x = (ref_pos_x + offset) >> shift_pos
    ref_y = (ref_pos_y + offset) >> shift_pos
    ref_pu_w = ((ref_pos_x + (((w - 1) * step_x) << shift_mv) + offset)
                >> shift_pos) - ref_x + 1
    ref_pu_h = max(1, ((ref_pos_y + (((h - 1) * step_y) << shift_mv)
                        + offset) >> shift_pos) - ref_y + 1)
    ref_pos_x, ref_pos_y = _clip_rpr_position(
        ref_pos_x, ref_pos_y, W, H, ref_pu_w, ref_pu_h, shift_pos)
    ref_x = (ref_pos_x + offset) >> shift_pos
    ref_y = (ref_pos_y + offset) >> shift_pos

    cols = np.arange(w, dtype=np.int64)
    pos_mv_x = (ref_pos_x + ((cols * step_x) << shift_mv)
                + offset) >> RPR_SCALE_BITS
    prec_x = pos_mv_x & pmask
    ix = pos_mv_x >> shift_mv

    # rows needed by the V pass: [ref_y - before, ref_y + ref_pu_h + taps
    # - before - 1]
    nrows = ref_pu_h + nb_taps - 1
    rows = np.clip(np.arange(nrows, dtype=np.int64) + (ref_y - before),
                   0, H - 1)
    taps = np.arange(nb_taps, dtype=np.int64) - before
    colsk = np.clip(ix[:, None] + taps[None, :], 0, W - 1)  # (w, taps)
    window = plane[rows[:, None, None], colsk[None, :, :]].astype(np.int64)
    fh = fbank[fidx_h][prec_x]  # (w, taps)
    hpass = (window * fh[None]).sum(-1) >> (bd - 8)  # (nrows, w)

    rws = np.arange(h, dtype=np.int64)
    pos_mv_y = (ref_pos_y + ((rws * step_y) << shift_mv)
                + offset) >> RPR_SCALE_BITS
    prec_y = pos_mv_y & pmask
    base = (pos_mv_y >> shift_mv) - (ref_y - before)  # (h,)
    rowk = base[:, None] + taps[None, :]  # (h, taps) in [0, nrows)
    vin = hpass[rowk]  # (h, taps, w)
    fv = fbank[fidx_v][prec_y]  # (h, taps)
    acc = (vin * fv[:, :, None]).sum(1)  # (h, w)
    return acc >> 6


def mc_rpr_uni(plane, pos_x, pos_y, w, h, mvx, mvy, sh, sv, bd,
               luma=True, flag_4x4=False, add_x=0, add_y=0):
    """Clipped uni-prediction block (put_vvc_*_rpr_clip_v parity)."""
    acc = _mc_rpr_core(plane, pos_x, pos_y, w, h, mvx, mvy, sh, sv, bd,
                       luma, flag_4x4, add_x, add_y)
    shift = 14 - bd
    off = 1 << (shift - 1)
    return np.clip((acc + off) >> shift, 0, (1 << bd) - 1).astype(np.int32)


def mc_rpr_14bit(plane, pos_x, pos_y, w, h, mvx, mvy, sh, sv, bd,
                 luma=True, flag_4x4=False, add_x=0, add_y=0):
    """14-bit intermediate block for bi-prediction (put_vvc_*_rpr_bi_v)."""
    return _mc_rpr_core(plane, pos_x, pos_y, w, h, mvx, mvy, sh, sv, bd,
                        luma, flag_4x4, add_x, add_y).astype(np.int32)


def chroma_add_xy(sh, sv, chroma_hor_col, chroma_ver_col):
    """Non-collocated chroma phase offsets (rcn_inter.c:2305-2306)."""
    add_x = (1 - chroma_hor_col) * 8 * (sh - NO_SCALE)
    add_y = (1 - chroma_ver_col) * 8 * (sv - NO_SCALE)
    return add_x, add_y


# ---------------------------------------------------------------------------
# Output upscale (pp_sample_rate_conv parity, incl. its quirks)
# ---------------------------------------------------------------------------

_UP_L = np.asarray(PP_UP_FILTERS_L, np.int64)     # (16, 8)
_UP_C = np.asarray(PP_UP_FILTERS_C, np.int64)     # (32, 4)
_DOWN = np.asarray(PP_DOWN_FILTERS, np.int64)     # (8, 16, 12)

_DOWN_THRESHOLDS = ((15, 4, 7), (20, 7, 6), (5, 2, 5), (2, 1, 4),
                    (5, 3, 3), (5, 4, 2), (20, 19, 1))


def pp_upscale_plane(src, dst_w, dst_h, win, chroma_col, luma: bool):
    """pp_sample_rate_conv parity (pp_pic_scale.c:250-377).

    Quirks mirrored from the reference: maxVal is always 1023 (file-level
    BITDEPTH 10, pp_pic_scale.c:39), luma uses scale_bits 13 with the
    scaling-window extent counted twice (:257-262).
    """
    org_h, org_w = src.shape
    wl, wr, wt, wb = win
    extra_w = (wl + wr) << 1
    extra_h = (wt + wb) << 1
    if luma:
        extra_w <<= 1
        extra_h <<= 1
    scale_bits = RPR_SCALE_BITS - 1 if luma else RPR_SCALE_BITS
    scale_hor = ((org_w - extra_w) << scale_bits) // dst_w
    scale_ver = ((org_h - extra_h) << scale_bits) // dst_h
    downsampling = (scale_hor > (1 << scale_bits)
                    or scale_ver > (1 << scale_bits))

    add_x = add_y = 0
    if not luma:
        hor_col, ver_col = chroma_col
        add_x = (1 - hor_col) * 8 * (scale_hor - (1 << scale_bits))
        add_x = (add_x + (1 << (scale_bits - 1))) >> scale_bits
        add_y = (1 - ver_col) * 8 * (scale_ver - (1 << scale_bits))
        add_y = (add_y + (1 << (scale_bits - 1))) >> scale_bits

    if downsampling:
        def down_idx(scale):
            for num, den, idx in _DOWN_THRESHOLDS:
                if scale > (num << scale_bits) // den:
                    return idx
            return 0

        flen, log2_norm = 12, 14
        pmask = 0xF if luma else 0x1F
        # chroma phases run to 31 but the banks have 16 rows: the
        # reference indexes filter + prec*12 flat, running over into the
        # NEXT bank's rows — replicate via a flat view (idx 7 prec > 15
        # would be out of the table entirely; unreachable in the -u path
        # where scale <= 1)
        flat = _DOWN.reshape(-1, 12)
        f_h = flat[down_idx(scale_hor) * 16:][:pmask + 1]
        f_v = flat[down_idx(scale_ver) * 16:][:pmask + 1]
    else:
        f_h = _UP_L if luma else _UP_C
        f_v = f_h
        flen, log2_norm = (8, 12) if luma else (4, 12)
        pmask = 0xF if luma else 0x1F

    s = src.astype(np.int64)

    # horizontal into (org_h, dst_w)
    ref_pos = np.arange(dst_w, dtype=np.int64) * scale_hor + add_x
    pos_int = ref_pos >> scale_bits
    prec = ref_pos & pmask
    taps = np.arange(flen, dtype=np.int64) - (flen // 2 - 1)
    colsk = np.clip(pos_int[:, None] + taps[None, :], 0, org_w - 1)
    fw = f_h[prec]  # (dst_w, flen)
    tmp = (s[:, colsk] * fw[None]).sum(-1)  # (org_h, dst_w)

    # vertical into (dst_h, dst_w)
    ref_pos = np.arange(dst_h, dtype=np.int64) * scale_ver + add_y
    pos_int = ref_pos >> scale_bits
    prec = ref_pos & pmask
    rowk = np.clip(pos_int[:, None] + taps[None, :], 0, org_h - 1)
    fv = f_v[prec]  # (dst_h, flen)
    out = (tmp[rowk] * fv[:, :, None]).sum(1)  # (dst_h, dst_w)
    out = (out + (1 << (log2_norm - 1))) >> log2_norm
    return np.clip(out, 0, 1023).astype(np.int32)

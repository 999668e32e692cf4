"""Bit-exact numpy reference for ALF / CC-ALF.

Parity: /root/reference/libovvc/rcn_alf.c — fixed filter sets (:174), APS
filter derivation (:196-283), 4x4 gradient classification with virtual
boundary (:283-690), 7x7 luma / 5x5 chroma clipped diamond filters with the
CTU-row virtual boundary (:806-1290), CC-ALF (:740-806), and the per-CTU
driver rcn_alf_filter_line (:1285).
"""

from __future__ import annotations

import numpy as np

from openvvc_tpu.rcn.data_alf import CLASS_TO_FILTER, FIXED_FILTER_COEFF

NUM_BITS = 8
MAX_CLASSES = 25
NUM_COEFF = 13
NUM_FIXED_SETS = 16
VB_ABOVE = 4  # ALF_VB_POS_ABOVE_CTUROW_LUMA

SHUFFLE = (
    (0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12),
    (9, 4, 10, 8, 1, 5, 11, 7, 3, 0, 2, 6, 12),
    (0, 3, 2, 1, 8, 7, 6, 5, 4, 9, 10, 11, 12),
    (9, 8, 10, 4, 3, 7, 11, 5, 1, 0, 2, 6, 12),
)


def _clip_lut(bitdepth):
    return (1 << bitdepth, 1 << (bitdepth - 3), 1 << (bitdepth - 5), 1 << (bitdepth - 7))


class AlfFilters:
    """Derived filter sets: luma [set][transpose][class][13] coeff+clip,
    chroma [alt][7] coeff+clip."""

    def __init__(self, aps_list, aps_chroma, bitdepth):
        lut = _clip_lut(bitdepth)
        n_sets = NUM_FIXED_SETS + len(aps_list)
        self.coeff = np.zeros((n_sets, 4, MAX_CLASSES, NUM_COEFF), np.int64)
        self.clip = np.zeros((n_sets, 4, MAX_CLASSES, NUM_COEFF), np.int64)
        for i in range(NUM_FIXED_SETS):
            for j in range(MAX_CLASSES):
                base = FIXED_FILTER_COEFF[CLASS_TO_FILTER[i][j]]
                for t in range(4):
                    for k in range(NUM_COEFF - 1):
                        self.coeff[i, t, j, k] = base[SHUFFLE[t][k]]
                        self.clip[i, t, j, k] = lut[0]
                    self.coeff[i, t, j, NUM_COEFF - 1] = 1 << (NUM_BITS - 1)
                    self.clip[i, t, j, NUM_COEFF - 1] = lut[0]

        for ai, alf_data in enumerate(aps_list):
            cf = np.zeros((MAX_CLASSES, NUM_COEFF), np.int64)
            cl = np.zeros((MAX_CLASSES, NUM_COEFF), np.int64)
            for cls in range(MAX_CLASSES):
                fidx = alf_data.alf_luma_coeff_delta_idx[cls]
                for k in range(NUM_COEFF - 1):
                    cf[cls, k] = alf_data.alf_luma_coeff[fidx][k]
                    cidx = (alf_data.alf_luma_clip_idx[fidx][k]
                            if alf_data.alf_luma_clip_flag else 0)
                    cl[cls, k] = lut[cidx]
                cf[cls, NUM_COEFF - 1] = 1 << (NUM_BITS - 1)
                cl[cls, NUM_COEFF - 1] = lut[0]
            for t in range(4):
                for k in range(NUM_COEFF):
                    self.coeff[NUM_FIXED_SETS + ai, t, :, k] = cf[:, SHUFFLE[t][k]]
                    self.clip[NUM_FIXED_SETS + ai, t, :, k] = cl[:, SHUFFLE[t][k]]

        self.chroma_coeff = []
        self.chroma_clip = []
        if aps_chroma is not None:
            n_alts = aps_chroma.alf_chroma_num_alt_filters_minus1 + 1
            for alt in range(n_alts):
                cc = [0] * 7
                cl = [0] * 7
                for k in range(6):
                    cc[k] = aps_chroma.alf_chroma_coeff[alt][k]
                    cidx = (aps_chroma.alf_chroma_clip_idx[alt][k]
                            if aps_chroma.alf_chroma_clip_flag else 0)
                    cl[k] = lut[cidx]
                cc[6] = 1 << (NUM_BITS - 1)
                cl[6] = lut[0]
                self.chroma_coeff.append(cc)
                self.chroma_clip.append(cl)


# ----------------------------------------------------------------------
# classification
# ----------------------------------------------------------------------

_ACT_TH = (0, 1, 2, 2, 2, 2, 2, 3, 3, 3, 3, 3, 3, 3, 3, 4)
_TR_LUT = (0, 1, 0, 2, 2, 3, 1, 3)


def _filter_idx(sum_h, sum_v, sum_d, sum_b, shift, is_vbnd):
    scale = 96 if is_vbnd else 64
    activity = min(15, max(0, ((sum_h + sum_v) * scale) >> shift))
    class_idx = _ACT_TH[activity]
    if sum_v > sum_h:
        max_hv, min_hv, dir_hv = sum_v, sum_h, 1
    else:
        max_hv, min_hv, dir_hv = sum_h, sum_v, 3
    if sum_d > sum_b:
        max_db, min_db, dir_db = sum_d, sum_b, 0
    else:
        max_db, min_db, dir_db = sum_b, sum_d, 2
    if max_db * min_hv > max_hv * min_db:
        max_dir, min_dir, main_dir, sec_dir = max_db, min_db, dir_db, dir_hv
    else:
        max_dir, min_dir, main_dir, sec_dir = max_hv, min_hv, dir_hv, dir_db
    if max_dir * 2 > 9 * min_dir:
        class_idx += (((main_dir & 1) << 1) + 2) * 5
    elif max_dir > 2 * min_dir:
        class_idx += (((main_dir & 1) << 1) + 1) * 5
    tr = _TR_LUT[(main_dir << 1) + (sec_dir >> 1)]
    return class_idx, tr


def _strip_sums(sp, y0, x0, w, clamp_last=False, clamp_first=False):
    """One 2-row laplacian strip at padded coords: rows y0..y0+3 (l0..l3), cols
    starting x0; returns (tmp_v, tmp_h, tmp_d, tmp_b) arrays of (w>>2)+1.

    clamp_last: src3 := src2 (strip's last row sits on the virtual boundary);
    clamp_first: src0 := src1 (strip's first row is just above it)."""
    rows = [sp[y0 + r] for r in range(4)]
    if clamp_last:
        rows[3] = rows[2]
    if clamp_first:
        rows[0] = rows[1]
    l0, l1, l2, l3 = [r.astype(np.int64) for r in rows]
    n = (w >> 2) + 1
    j = np.arange(n) * 4 + x0 + 1
    y1 = l1[j] << 1
    y2 = l2[j + 1] << 1
    y12 = l1[j + 2] << 1
    y22 = l2[j + 3] << 1
    tv = (np.abs(y1 - l0[j] - l2[j]) + np.abs(y2 - l1[j + 1] - l3[j + 1])
          + np.abs(y12 - l0[j + 2] - l2[j + 2]) + np.abs(y22 - l1[j + 3] - l3[j + 3]))
    th = (np.abs(y1 - l1[j + 1] - l1[j - 1]) + np.abs(y2 - l2[j + 2] - l2[j])
          + np.abs(y12 - l1[j + 3] - l1[j + 1]) + np.abs(y22 - l2[j + 4] - l2[j + 2]))
    td = (np.abs(y1 - l0[j - 1] - l2[j + 1]) + np.abs(y2 - l1[j] - l3[j + 2])
          + np.abs(y12 - l0[j + 1] - l2[j + 3]) + np.abs(y22 - l1[j + 2] - l3[j + 4]))
    tb = (np.abs(y1 - l2[j - 1] - l0[j + 1]) + np.abs(y2 - l3[j] - l1[j + 2])
          + np.abs(y12 - l2[j + 1] - l0[j + 3]) + np.abs(y22 - l3[j + 2] - l1[j + 4]))
    return tv, th, td, tb


def classify_ctu(sp, px0, py0, ctu_w, ctu_h, shift, ctu_s, virbnd_pos):
    """Classification over one CTU; sp is the padded source, (px0,py0) the CTU
    origin in padded coords, virbnd_pos CTU-local (huge when disabled).
    Returns (class_idx, tr_idx) arrays of shape [ctu_h>>2, ctu_w>>2].

    Unified 2-row-strip formulation: strip k covers rows 2k-3..2k relative to
    the classification block; a 4x4 block row sums 4 consecutive strips
    (rcn_alf_classif_novbnd aggregates strip pairs, same totals), with the
    3-strip variants and row clamps of rcn_alf_classif_vbnd at the boundary."""
    n_sb_y, n_sb_x = ctu_h >> 2, ctu_w >> 2
    cls = np.zeros((n_sb_y, n_sb_x), np.int32)
    tr = np.zeros((n_sb_y, n_sb_x), np.int32)

    for by in range(0, ctu_h, 32):
        bh = min(32, ctu_h - by)
        for bx in range(0, ctu_w, 32):
            bw = min(32, ctu_w - bx)
            use_vb = bh + by >= virbnd_pos
            nstrips = (bh >> 1) + 2
            lap = {k: np.zeros((nstrips, bw >> 2), np.int64) for k in "vhdb"}
            for k in range(nstrips):
                y_last = by + 2 * k  # strip's last-row position (CTU-local)
                clamp_last = use_vb and y_last == virbnd_pos
                clamp_first = use_vb and y_last == virbnd_pos + 2
                yy = py0 + y_last - 3
                tv, th, td, tb = _strip_sums(sp, yy, px0 + bx - 3, bw,
                                             clamp_last, clamp_first)
                for key, tmp in zip("vhdb", (tv, th, td, tb)):
                    lap[key][k] = tmp[:-1] + tmp[1:]
            for b in range(bh >> 2):
                y_blk = by + (b << 2)
                k0 = b << 1
                strips = (k0, k0 + 1, k0 + 2, k0 + 3)
                is_vb = False
                if use_vb and y_blk == virbnd_pos - 4:
                    strips = (k0, k0 + 1, k0 + 2)
                    is_vb = True
                elif use_vb and y_blk == virbnd_pos:
                    strips = (k0 + 1, k0 + 2, k0 + 3)
                    is_vb = True
                sv = sum(lap["v"][k] for k in strips)
                sh = sum(lap["h"][k] for k in strips)
                sd = sum(lap["d"][k] for k in strips)
                sb = sum(lap["b"][k] for k in strips)
                for j in range(bw >> 2):
                    c, t = _filter_idx(int(sh[j]), int(sv[j]), int(sd[j]), int(sb[j]),
                                       shift, is_vb)
                    cls[(y_blk >> 2), (bx >> 2) + j] = c
                    tr[(y_blk >> 2), (bx >> 2) + j] = t
    return cls, tr


# ----------------------------------------------------------------------
# filters
# ----------------------------------------------------------------------


def _alf_clip2(clip, ref, v0, v1):
    return (np.clip(v0 - ref, -clip, clip) + np.clip(v1 - ref, -clip, clip))


def filter_luma_ctu(dst, sp, px0, py0, x0, y0, ctu_w, ctu_h, cls, tr,
                    coeff_set, clip_set, ctu_s, virbnd_pos, use_vb, bitdepth):
    """7x7 diamond clipped luma filtering for one CTU (scalar rows, vector cols)."""
    shift = NUM_BITS - 1
    mx = (1 << bitdepth) - 1
    for i in range(0, ctu_h, 4):
        for j in range(0, ctu_w, 4):
            t = int(tr[i >> 2, j >> 2])
            c = int(cls[i >> 2, j >> 2])
            fc = coeff_set[t, c]
            fl = clip_set[t, c]
            for ii in range(4):
                yy = py0 + i + ii
                xs = px0 + j
                r = [0] * 7  # row offsets for pImg0..6: 0,+1,-1,+2,-2,+3,-3
                r[0] = 0
                r[1], r[2], r[3], r[4], r[5], r[6] = 1, -1, 2, -2, 3, -3
                if use_vb:
                    yVb = (y0 + i + ii) & (ctu_s - 1)
                    if yVb < virbnd_pos and yVb >= virbnd_pos - 4:
                        r[1] = 0 if yVb == virbnd_pos - 1 else r[1]
                        r[3] = r[1] if yVb >= virbnd_pos - 2 else r[3]
                        r[5] = r[3] if yVb >= virbnd_pos - 3 else r[5]
                        r[2] = 0 if yVb == virbnd_pos - 1 else r[2]
                        r[4] = r[2] if yVb >= virbnd_pos - 2 else r[4]
                        r[6] = r[4] if yVb >= virbnd_pos - 3 else r[6]
                    elif yVb >= virbnd_pos and yVb <= virbnd_pos + 3:
                        r[2] = 0 if yVb == virbnd_pos else r[2]
                        r[4] = r[2] if yVb <= virbnd_pos + 1 else r[4]
                        r[6] = r[4] if yVb <= virbnd_pos + 2 else r[6]
                        r[1] = 0 if yVb == virbnd_pos else r[1]
                        r[3] = r[1] if yVb <= virbnd_pos + 1 else r[3]
                        r[5] = r[3] if yVb <= virbnd_pos + 2 else r[5]
                    near_vb = ((yVb < virbnd_pos and yVb >= virbnd_pos - 1)
                               or (yVb >= virbnd_pos and yVb <= virbnd_pos))
                else:
                    near_vb = False
                p = {k: sp[yy + r[k]].astype(np.int64) for k in range(7)}
                cur = p[0][xs : xs + 4]
                s = np.zeros(4, np.int64)
                s += fc[0] * _alf_clip2(fl[0], cur, p[5][xs : xs + 4], p[6][xs : xs + 4])
                s += fc[1] * _alf_clip2(fl[1], cur, p[3][xs + 1 : xs + 5], p[4][xs - 1 : xs + 3])
                s += fc[2] * _alf_clip2(fl[2], cur, p[3][xs : xs + 4], p[4][xs : xs + 4])
                s += fc[3] * _alf_clip2(fl[3], cur, p[3][xs - 1 : xs + 3], p[4][xs + 1 : xs + 5])
                s += fc[4] * _alf_clip2(fl[4], cur, p[1][xs + 2 : xs + 6], p[2][xs - 2 : xs + 2])
                s += fc[5] * _alf_clip2(fl[5], cur, p[1][xs + 1 : xs + 5], p[2][xs - 1 : xs + 3])
                s += fc[6] * _alf_clip2(fl[6], cur, p[1][xs : xs + 4], p[2][xs : xs + 4])
                s += fc[7] * _alf_clip2(fl[7], cur, p[1][xs - 1 : xs + 3], p[2][xs + 1 : xs + 5])
                s += fc[8] * _alf_clip2(fl[8], cur, p[1][xs - 2 : xs + 2], p[2][xs + 2 : xs + 6])
                s += fc[9] * _alf_clip2(fl[9], cur, p[0][xs + 3 : xs + 7], p[0][xs - 3 : xs + 1])
                s += fc[10] * _alf_clip2(fl[10], cur, p[0][xs + 2 : xs + 6], p[0][xs - 2 : xs + 2])
                s += fc[11] * _alf_clip2(fl[11], cur, p[0][xs + 1 : xs + 5], p[0][xs - 1 : xs + 3])
                if near_vb:
                    s = (s + (1 << (shift + 2))) >> (shift + 3)
                else:
                    s = (s + (1 << (shift - 1))) >> shift
                out = np.clip(s + cur, 0, mx)
                dst[y0 + i + ii, x0 + j : x0 + j + 4] = out


def filter_chroma_ctu(dst, sp, px0, py0, x0, y0, blk_w, blk_h, coeff, clip_v,
                      ctu_s_c, virbnd_pos, use_vb, bitdepth):
    """5x5 diamond clipped chroma filter for one CTU region."""
    shift = NUM_BITS - 1
    mx = (1 << bitdepth) - 1
    fc, fl = coeff, clip_v
    for i in range(0, blk_h, 4):
        for ii in range(min(4, blk_h - i)):
            yy = py0 + i + ii
            r = [0, 1, -1, 2, -2]
            if use_vb:
                yVb = (y0 + i + ii) & (ctu_s_c - 1)
                if yVb < virbnd_pos and yVb >= virbnd_pos - 2:
                    r[1] = 0 if yVb == virbnd_pos - 1 else r[1]
                    r[3] = r[1] if yVb >= virbnd_pos - 2 else r[3]
                    r[2] = 0 if yVb == virbnd_pos - 1 else r[2]
                    r[4] = r[2] if yVb >= virbnd_pos - 2 else r[4]
                elif yVb >= virbnd_pos and yVb <= virbnd_pos + 1:
                    r[2] = 0 if yVb == virbnd_pos else r[2]
                    r[4] = r[2] if yVb <= virbnd_pos + 1 else r[4]
                    r[1] = 0 if yVb == virbnd_pos else r[1]
                    r[3] = r[1] if yVb <= virbnd_pos + 1 else r[3]
                near_vb = ((yVb < virbnd_pos and yVb >= virbnd_pos - 1)
                           or (yVb >= virbnd_pos and yVb <= virbnd_pos))
            else:
                near_vb = False
            xs = px0
            p0 = sp[yy].astype(np.int64)
            p1 = sp[yy + r[1]].astype(np.int64)
            p2 = sp[yy + r[2]].astype(np.int64)
            p3 = sp[yy + r[3]].astype(np.int64)
            p4 = sp[yy + r[4]].astype(np.int64)
            cur = p0[xs : xs + blk_w]
            s = np.zeros(blk_w, np.int64)
            s += fc[0] * _alf_clip2(fl[0], cur, p3[xs : xs + blk_w], p4[xs : xs + blk_w])
            s += fc[1] * _alf_clip2(fl[1], cur, p1[xs + 1 : xs + blk_w + 1], p2[xs - 1 : xs + blk_w - 1])
            s += fc[2] * _alf_clip2(fl[2], cur, p1[xs : xs + blk_w], p2[xs : xs + blk_w])
            s += fc[3] * _alf_clip2(fl[3], cur, p1[xs - 1 : xs + blk_w - 1], p2[xs + 1 : xs + blk_w + 1])
            s += fc[4] * _alf_clip2(fl[4], cur, p0[xs + 2 : xs + blk_w + 2], p0[xs - 2 : xs + blk_w - 2])
            s += fc[5] * _alf_clip2(fl[5], cur, p0[xs + 1 : xs + blk_w + 1], p0[xs - 1 : xs + blk_w - 1])
            if near_vb:
                s = (s + (1 << (shift + 2))) >> (shift + 3)
            else:
                s = (s + (1 << (shift - 1))) >> shift
            dst[y0 + i + ii, x0 : x0 + blk_w] = np.clip(s + cur, 0, mx)


def filter_cc_alf_ctu(dst, luma_sp, lpx0, lpy0, x0, y0, blk_w, blk_h, coeff,
                      ctu_s, virbnd_pos, use_vb, bitdepth):
    """CC-ALF: chroma corrected from collocated luma (3x4 cross filter)."""
    mx = (1 << bitdepth) - 1
    half = 1 << bitdepth >> 1
    for i in range(0, blk_h, 4):
        for ii in range(min(4, blk_h - i)):
            ly = lpy0 + ((i + ii) << 1)
            o1, o2, o3 = 1, -1, 2
            pos = ((y0 + i + ii) << 1) & (ctu_s - 1)
            skip_row = False
            if use_vb and (pos == virbnd_pos or pos == virbnd_pos + 1):
                # scaleY != 0 so rows are never fully skipped in 4:2:0
                pass
            if pos == virbnd_pos - 2 or pos == virbnd_pos + 1:
                o3 = o1
            elif pos == virbnd_pos - 1 or pos == virbnd_pos:
                o1 = o2 = o3 = 0
            lx = lpx0
            n = blk_w
            idx = lx + 2 * np.arange(n)
            cc = luma_sp[ly].astype(np.int64)
            r1 = luma_sp[ly + o1].astype(np.int64)
            r2 = luma_sp[ly + o2].astype(np.int64)
            r3 = luma_sp[ly + o3].astype(np.int64)
            cur = cc[idx]
            s = (coeff[0] * (r2[idx] - cur)
                 + coeff[1] * (cc[idx - 1] - cur)
                 + coeff[2] * (cc[idx + 1] - cur)
                 + coeff[3] * (r1[idx - 1] - cur)
                 + coeff[4] * (r1[idx] - cur)
                 + coeff[5] * (r1[idx + 1] - cur)
                 + coeff[6] * (r3[idx] - cur))
            s = (s + 64) >> 7
            s = np.clip(s + half, 0, mx)
            row = dst[y0 + i + ii, x0 : x0 + blk_w].astype(np.int64)
            dst[y0 + i + ii, x0 : x0 + blk_w] = np.clip(s + row - half, 0, mx)


# ----------------------------------------------------------------------
# entry-level driver (rcn_alf_filter_line parity)
# ----------------------------------------------------------------------

_PAD = 8


def apply_alf_entry(frame, entry_bounds, ctb_log2, alf_params, filters,
                    cc_data, bitdepth, pic_w, pic_h):
    """Apply ALF + CC-ALF over one rectangular entry, in place on frame.

    entry_bounds: (ctu_x0, ctu_y0, nb_w, nb_h). filters: AlfFilters.
    cc_data: (alf_data_cb, alf_data_cr) for CC-ALF coeff lookup (or None).
    Sources are the pre-ALF (post-SAO) samples with replicate padding at
    entry borders (filter-buffer margin semantics)."""
    ex0, ey0, nw, nh = entry_bounds
    ctu_s = 1 << ctb_log2
    x_l0, y_l0 = ex0 << ctb_log2, ey0 << ctb_log2
    x_l1 = min(pic_w, (ex0 + nw) << ctb_log2)
    y_l1 = min(pic_h, (ey0 + nh) << ctb_log2)

    planes = [frame.y] + ([frame.cb, frame.cr] if frame.cb is not None else [])
    pads = []
    for c, plane in enumerate(planes):
        sh = 0 if c == 0 else 1
        region = plane[y_l0 >> sh : y_l1 >> sh, x_l0 >> sh : x_l1 >> sh]
        pads.append(np.pad(region, _PAD, mode="edge"))

    shift = bitdepth + 4
    for cy in range(ey0, ey0 + nh):
        for cx in range(ex0, ex0 + nw):
            p = alf_params.get((cx, cy))
            if p is None:
                continue
            x0, y0 = cx << ctb_log2, cy << ctb_log2
            if x0 >= pic_w or y0 >= pic_h:
                continue
            ctu_w = min(ctu_s, pic_w - x0)
            ctu_h = min(ctu_s, pic_h - y0)
            # padded-local CTU origin (luma)
            plx = (x0 - x_l0) + _PAD
            ply = (y0 - y_l0) + _PAD

            if p.ctb_alf_flag & 4:
                virbnd = pic_h if (y0 + ctu_s > pic_h) else ctu_h - VB_ABOVE
                cls, tr = classify_ctu(pads[0], plx, ply, ctu_w, ctu_h, shift,
                                       ctu_s, virbnd if (y0 + ctu_s <= pic_h) else 1 << 30)
                # luma filter VB usage (check_virtual_bound)
                ctu_vb_y = (y0 + ctu_h - 1) & (ctu_s - 1)
                req_vb = ((ctu_vb_y < virbnd and ctu_vb_y >= virbnd - 4)
                          or (ctu_vb_y >= virbnd and ctu_vb_y <= virbnd + 3))
                fset = p.ctb_alf_idx
                filter_luma_ctu(frame.y, pads[0], plx, ply, x0, y0, ctu_w, ctu_h,
                                cls, tr, filters.coeff[fset], filters.clip[fset],
                                ctu_s, virbnd, req_vb, bitdepth)

            if len(planes) > 1:
                cplx, cply = plx >> 1, ply >> 1
                cplx = ((x0 - x_l0) >> 1) + _PAD
                cply = ((y0 - y_l0) >> 1) + _PAD
                cw, ch = ctu_w >> 1, ctu_h >> 1
                ctu_s_c = ctu_s >> 1
                virbnd_c = (pic_h >> 1) if (y0 + ctu_s > pic_h) else (ctu_s - VB_ABOVE) >> 1
                yVb = ((y0 >> 1) + ch - 1) & (ctu_s_c - 1)
                is_vb_c = ((yVb < virbnd_c and yVb >= virbnd_c - 2)
                           or (yVb >= virbnd_c and yVb <= virbnd_c + 1)
                           or ctu_h != ctu_s or ctu_w != ctu_s)
                for comp in (1, 2):
                    if (comp == 1 and (p.ctb_alf_flag & 2)) or (comp == 2 and (p.ctb_alf_flag & 1)):
                        alt = p.cb_alternative if comp == 1 else p.cr_alternative
                        filter_chroma_ctu(planes[comp], pads[comp], cplx, cply,
                                          x0 >> 1, y0 >> 1, cw, ch,
                                          filters.chroma_coeff[alt],
                                          filters.chroma_clip[alt],
                                          ctu_s_c, virbnd_c, is_vb_c, bitdepth)
                    cc_idx = p.cc_alf_idx[comp - 1]
                    if cc_idx and cc_data is not None and cc_data[comp - 1] is not None:
                        ad = cc_data[comp - 1]
                        coeff = (ad.alf_cc_cb_coeff if comp == 1 else ad.alf_cc_cr_coeff)[cc_idx - 1]
                        coeff = [int(coeff[j]) for j in range(7)]
                        virbnd_cc = (pic_h >> 1) if (y0 + ctu_s > pic_h) else ctu_s - VB_ABOVE
                        is_vb_cc = ((yVb < virbnd_cc and yVb >= virbnd_cc - 2)
                                    or (yVb >= virbnd_cc and yVb <= virbnd_cc + 1)
                                    or ctu_h != ctu_s or ctu_w != ctu_s)
                        filter_cc_alf_ctu(planes[comp], pads[0], plx, ply,
                                          x0 >> 1, y0 >> 1, cw, ch, coeff,
                                          ctu_s, virbnd_cc, is_vb_cc, bitdepth)

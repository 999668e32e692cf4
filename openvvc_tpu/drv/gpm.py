"""GPM (geometric partitioning) parameters, weights and derivation.

Parity: /root/reference/libovvc/rcn_gpm.c (g_GeoParams, g_Dis, weight mask
init :149), rcn_inter.c rcn_gpm_weights_and_steps (:127, :2529-2615),
drv_mvp.c drv_gpm_merge_mvp_b (:1910), update_gpm_mv_ctx (:1482).
"""

from __future__ import annotations

from dataclasses import replace

import numpy as np

from openvvc_tpu.drv.inter_mvp import (
    MV,
    InterCtx,
    MergeInfo,
    derive_merge_mvp_b,
)

GEO_NUM_PARTITION_MODE = 64
GEO_NUM_ANGLES = 32
GEO_MAX_CU_LOG2 = 6
GEO_WEIGHT_MASK_SIZE = 3 * (64 >> 3) * 2 + 64  # 112

_ANGLE2MASK = (0, -1, 1, 2, 3, 4, -1, -1, 5, -1, -1, 4, 3, 2, 1, -1,
               0, -1, 1, 2, 3, 4, -1, -1, 5, -1, -1, 4, 3, 2, 1, -1)
_ANGLE2MIRROR = (0, 0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 2,
                 0, 0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 2, 2, 2, 2)

GEO_PARAMS = ((0, 1), (0, 3), (2, 0), (2, 1), (2, 2), (2, 3), (3, 0), (3, 1),
              (3, 2), (3, 3), (4, 0), (4, 1), (4, 2), (4, 3), (5, 0), (5, 1),
              (5, 2), (5, 3), (8, 1), (8, 3), (11, 0), (11, 1), (11, 2),
              (11, 3), (12, 0), (12, 1), (12, 2), (12, 3), (13, 0), (13, 1),
              (13, 2), (13, 3), (14, 0), (14, 1), (14, 2), (14, 3), (16, 1),
              (16, 3), (18, 1), (18, 2), (18, 3), (19, 1), (19, 2), (19, 3),
              (20, 1), (20, 2), (20, 3), (21, 1), (21, 2), (21, 3), (24, 1),
              (24, 3), (27, 1), (27, 2), (27, 3), (28, 1), (28, 2), (28, 3),
              (29, 1), (29, 2), (29, 3), (30, 1), (30, 2), (30, 3))

G_DIS = (8, 8, 8, 8, 4, 4, 2, 1, 0, -1, -2, -4, -4, -8, -8, -8,
         -8, -8, -8, -8, -4, -4, -2, -1, 0, 1, 2, 4, 4, 8, 8, 8)


def _build_masks():
    masks = np.zeros((6, GEO_WEIGHT_MASK_SIZE, GEO_WEIGHT_MASK_SIZE), np.int16)
    for angle_idx in range((GEO_NUM_ANGLES >> 2) + 1):
        if _ANGLE2MASK[angle_idx] == -1:
            continue
        dist_x = angle_idx
        dist_y = (dist_x + (GEO_NUM_ANGLES >> 2)) % GEO_NUM_ANGLES
        rho = (G_DIS[dist_x] << (GEO_MAX_CU_LOG2 + 1)) + (G_DIS[dist_y] << (GEO_MAX_CU_LOG2 + 1))
        off = (2 * 64 - GEO_WEIGHT_MASK_SIZE) >> 1
        y = np.arange(GEO_WEIGHT_MASK_SIZE)
        x = np.arange(GEO_WEIGHT_MASK_SIZE)
        ly = (((y + off) << 1) + 1) * G_DIS[dist_y]
        sx = (((x + off) << 1) + 1) * G_DIS[dist_x]
        widx = sx[None, :] + ly[:, None] - rho
        masks[_ANGLE2MASK[angle_idx]] = np.clip((32 + widx + 4) >> 3, 0, 8)
    return masks


_MASKS = _build_masks()


def _weight_offset(split_dir: int, log2_w: int, log2_h: int):
    angle, distance = GEO_PARAMS[split_dir]
    w, h = 1 << log2_w, 1 << log2_h
    ox = (GEO_WEIGHT_MASK_SIZE - w) >> 1
    oy = (GEO_WEIGHT_MASK_SIZE - h) >> 1
    if distance > 0:
        if angle % 16 == 8 or (angle % 16 != 0 and h >= w):
            oy += (distance * h) >> 3 if angle < 16 else -((distance * h) >> 3)
        else:
            ox += (distance * w) >> 3 if angle < 16 else -((distance * w) >> 3)
    return ox, oy


def gpm_weights(split_dir: int, log2_w: int, log2_h: int) -> np.ndarray:
    """Per-sample w0 (applies to partition 0's predictor), luma grid [h, w];
    chroma uses grid[::2, ::2] (the step_x/step_y pointer walk)."""
    angle = GEO_PARAMS[split_dir][0]
    mirror = _ANGLE2MIRROR[angle]
    mask = _MASKS[_ANGLE2MASK[angle]]
    ox, oy = _weight_offset(split_dir, log2_w, log2_h)
    w, h = 1 << log2_w, 1 << log2_h
    if mirror == 2:
        rows = (GEO_WEIGHT_MASK_SIZE - 1 - oy) - np.arange(h)
        return mask[rows[:, None], ox + np.arange(w)[None, :]]
    if mirror == 1:
        cols = (GEO_WEIGHT_MASK_SIZE - 1 - ox) - np.arange(w)
        return mask[oy + np.arange(h)[:, None], cols[None, :]]
    return mask[oy : oy + h, ox : ox + w]


def gpm_unit_msks(split_dir: int, nw: int, nh: int) -> np.ndarray:
    """Per-4x4-unit storage mix (update_gpm_mv_ctx :1482): 2 = blended
    region (combined MV info), 0 = partition 0, 1 = partition 1."""
    angle, d_idx = GEO_PARAMS[split_dir]
    x_dis = G_DIS[angle]
    y_dis = G_DIS[(angle + (GEO_NUM_ANGLES >> 2)) % GEO_NUM_ANGLES]
    flip = 13 <= angle <= 27
    off_x = (-nw * 4) >> 1
    off_y = (-nh * 4) >> 1
    if d_idx > 0:
        if (angle & 0xF) == 8 or ((angle & 0xF) and nh >= nw):
            off_y += (d_idx * nh) >> 1 if angle < 16 else -((d_idx * nh) >> 1)
        else:
            off_x += (d_idx * nw) >> 1 if angle < 16 else -((d_idx * nw) >> 1)
    y = np.arange(nh)[:, None]
    x = np.arange(nw)[None, :]
    lookup_y = (((4 * y + off_y) * 2) + 5) * y_dis
    midx = (((4 * x + off_x) * 2) + 5) * x_dis + lookup_y
    out = np.where(np.abs(midx) < 32, 2,
                   np.where(midx <= 0, 1 - int(flip), int(flip)))
    return out.astype(np.int32)


def gpm_units_from_parts(split_dir, nw, nh, d0, m0, d1, m1):
    """Rebuild the per-4x4 (off_x, off_y, inter_dir, mv0, mv1) unit list
    from the partition dirs/MVs alone (the combined-region and partition
    MV infos are fully determined by them — see drv_gpm_merge_mvp_b)."""
    z = MV()
    idir = d0 | d1
    if idir == 1:
        smv0, smv1 = m1, z
    elif idir == 2:
        smv0, smv1 = z, m1
    elif d0 == 1:
        smv0, smv1 = m0, m1
    else:
        smv0, smv1 = m1, m0
    cm = (idir, smv0, smv1)
    p0 = (d0, m0 if d0 == 1 else z, m0 if d0 == 2 else z)
    p1 = (d1, m1 if d1 == 1 else z, m1 if d1 == 2 else z)
    msks = gpm_unit_msks(split_dir, nw, nh)
    units = []
    for y in range(nh):
        for x in range(nw):
            t = cm if msks[y, x] == 2 else (p0 if msks[y, x] == 0 else p1)
            units.append((x, y, t[0], t[1], t[2]))
    return units


def drv_gpm_merge_mvp_b(ictx: InterCtx, x0, y0, log2_w, log2_h,
                        split_dir, merge_idx0, merge_idx1, max_nb_cand):
    """drv_gpm_merge_mvp_b parity; returns (dir0, mv0, dir1, mv1, units)
    where units lists per-4x4 (off_x, off_y, inter_dir, mv0, mv1) fills."""
    ux, uy = x0 >> 2, y0 >> 2
    nw, nh = (1 << log2_w) >> 2, (1 << log2_h) >> 2
    is_small = log2_w + log2_h <= 5
    mi0 = derive_merge_mvp_b(ictx, ux, uy, nw, nh, merge_idx0, max_nb_cand, is_small)
    mi1 = mi0 if merge_idx1 == merge_idx0 else derive_merge_mvp_b(
        ictx, ux, uy, nw, nh, merge_idx1, max_nb_cand, is_small)

    def clean(mi):
        return MergeInfo(mi.inter_dir,
                         replace(mi.mv0, bcw_idx_plus1=0, prec_amvr=0),
                         replace(mi.mv1, bcw_idx_plus1=0, prec_amvr=0))

    mi0, mi1 = clean(mi0), clean(mi1)

    par = merge_idx0 & 1
    dir0, mv0 = 0, MV()
    if mi0.inter_dir & (1 + par):
        dir0 = 1 + par
        mv0 = mi0.mv1 if par else mi0.mv0
    elif mi0.inter_dir & (2 - par):
        dir0 = 2 - par
        mv0 = mi0.mv0 if par else mi0.mv1
    par = merge_idx1 & 1
    dir1, mv1 = 0, MV()
    if mi1.inter_dir & (1 + par):
        dir1 = 1 + par
        mv1 = mi1.mv1 if par else mi1.mv0
    elif mi1.inter_dir & (2 - par):
        dir1 = 2 - par
        mv1 = mi1.mv0 if par else mi1.mv1

    # per-unit MV storage (update_gpm_mv_ctx :1482)
    inter_dir = dir0 | dir1
    smv0, smv1 = MV(), MV()
    if inter_dir == 1:
        smv0 = mi1.mv0
    elif inter_dir == 2:
        smv1 = mi1.mv1
    else:
        if dir0 == 1 and dir1 == 2:
            smv0, smv1 = mi0.mv0, mi1.mv1
        elif dir0 == 2 and dir1 == 1:
            smv0, smv1 = mi1.mv0, mi0.mv1
    mvi = MergeInfo(inter_dir, smv0, smv1)
    p0 = MergeInfo(dir0, mi0.mv0, mi0.mv1)
    p1 = MergeInfo(dir1, mi1.mv0, mi1.mv1)

    angle, d_idx = GEO_PARAMS[split_dir]
    x_dis = G_DIS[angle]
    y_dis = G_DIS[(angle + (GEO_NUM_ANGLES >> 2)) % GEO_NUM_ANGLES]
    flip = 13 <= angle <= 27
    off_x = (-nw * 4) >> 1
    off_y = (-nh * 4) >> 1
    if d_idx > 0:
        if (angle & 0xF) == 8 or ((angle & 0xF) and nh >= nw):
            off_y += (d_idx * nh) >> 1 if angle < 16 else -((d_idx * nh) >> 1)
        else:
            off_x += (d_idx * nw) >> 1 if angle < 16 else -((d_idx * nw) >> 1)
    units = []
    for y in range(nh):
        lookup_y = (((4 * y + off_y) * 2) + 5) * y_dis
        for x in range(nw):
            midx = (((4 * x + off_x) * 2) + 5) * x_dis + lookup_y
            msk = 2 if abs(midx) < 32 else ((1 - flip) if midx <= 0 else int(flip))
            sb = mvi if msk == 2 else (p0 if msk == 0 else p1)
            units.append((x, y, sb.inter_dir, sb.mv0, sb.mv1))
            if sb.inter_dir & 1:
                ictx.fill(0, sb.mv0, ux + x, uy + y, 1, 1)
                ictx.fill_tmvp(0, sb.mv0, ux + x, uy + y, 1, 1)
            if sb.inter_dir & 2:
                ictx.fill(1, sb.mv1, ux + x, uy + y, 1, 1)
                ictx.fill_tmvp(1, sb.mv1, ux + x, uy + y, 1, 1)
    # NOTE: no HMVP update for GPM
    return dir0, mv0, dir1, mv1, units

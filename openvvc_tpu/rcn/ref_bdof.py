"""BDOF (bi-directional optical flow) and DMVR (decoder MV refinement).

Bit-exact numpy parity with /root/reference/libovvc/rcn_prof_bdof.c
(grad :152, weights :350, subblock :59, rcn_bdof :423, extend :294) and
rcn_inter.c (rcn_dmvr_mv_refine :900+, SAD :616-755, refine_mv :800,
div_for_maxq7 :759, padd_dmvr :354, dmvr_mv tables :63).
"""

from __future__ import annotations

import numpy as np

from openvvc_tpu.rcn import ref_mc

GRAD_SHIFT = 6
PROF_PREC_RND = 1 << 13
BDOF_WGT_LIMIT = 15

_DMVR_MV_X = (-2, -1, 0, 1, 2) * 5
_DMVR_MV_Y = (-2, -2, -2, -2, -2, -1, -1, -1, -1, -1, 0, 0, 0, 0, 0,
              1, 1, 1, 1, 1, 2, 2, 2, 2, 2)


def _wrap16(v):
    v = np.asarray(v) & 0xFFFF
    return np.where(v & 0x8000, v.astype(np.int64) - 0x10000, v).astype(np.int64)


def _int_patch(plane, x0, y0, w, h):
    """Edge-replicated integer-sample patch (emulate_block_border)."""
    H, W = plane.shape
    ys = np.clip(np.arange(y0, y0 + h), 0, H - 1)
    xs = np.clip(np.arange(x0, x0 + w), 0, W - 1)
    return plane[np.ix_(ys, xs)].astype(np.int64)


def _padded_14bit(plane, ref_x, ref_y, fx, fy, w, h, bd, hpel):
    """14-bit prediction with the 1-sample integer ring used for gradients
    (rcn_bdof_mcp_l: bidir0 fill + extend_bdof_buff)."""
    p = np.zeros((h + 2, w + 2), np.int64)
    p[1 : h + 1, 1 : w + 1] = ref_mc.interp_14bit(
        plane, ref_x, ref_y, fx, fy, w, h, bd, luma=True, hpel=hpel)
    ext_x = 1 if (fx >> 3) else 0
    ext_y = 1 if (fy >> 3) else 0
    ring = _int_patch(plane, ref_x - 1 + ext_x, ref_y - 1 + ext_y, w + 2, h + 2)
    ring = ring << (14 - bd)
    p[0, :] = ring[0, :]
    p[h + 1, :] = ring[h + 1, :]
    p[1 : h + 1, 0] = ring[1 : h + 1, 0]
    p[1 : h + 1, w + 1] = ring[1 : h + 1, w + 1]
    return p


def _grads(padded, w, h):
    """compute_prof_grad over the interior + replicate ring (extend_bdof_grad)."""
    gx = np.zeros((h + 2, w + 2), np.int64)
    gy = np.zeros((h + 2, w + 2), np.int64)
    s = _wrap16(padded)
    gy[1 : h + 1, 1 : w + 1] = ((s[2 : h + 2, 1 : w + 1] - PROF_PREC_RND) >> GRAD_SHIFT) - \
                               ((s[0 : h, 1 : w + 1] - PROF_PREC_RND) >> GRAD_SHIFT)
    gx[1 : h + 1, 1 : w + 1] = ((s[1 : h + 1, 2 : w + 2] - PROF_PREC_RND) >> GRAD_SHIFT) - \
                               ((s[1 : h + 1, 0 : w] - PROF_PREC_RND) >> GRAD_SHIFT)
    _replicate_ring(gx, w, h)
    _replicate_ring(gy, w, h)
    return gx, gy


def _replicate_ring(a, w, h):
    a[1 : h + 1, 0] = a[1 : h + 1, 1]
    a[1 : h + 1, w + 1] = a[1 : h + 1, w]
    a[0, :] = a[1, :]
    a[h + 1, :] = a[h, :]


def _floor_log2(v: int) -> int:
    return max(0, v.bit_length() - 1)


def _bdof_weights(r0, r1, gx0, gx1, gy0, gy1):
    """derive_bdof_weights over one padded 6x6 window (arrays [6, 6])."""
    avg_x = (gx0 + gx1) >> 1
    avg_y = (gy0 + gy1) >> 1
    delta = ((r1 - PROF_PREC_RND) >> 4) - ((r0 - PROF_PREC_RND) >> 4)
    sum_avg_x = int(np.abs(avg_x).sum())
    sum_avg_y = int(np.abs(avg_y).sum())
    sgn_y = np.sign(avg_y)
    sum_xy = int((sgn_y * avg_x).sum())
    sum_dx = int((np.sign(avg_x) * delta).sum())
    sum_dy = int((sgn_y * delta).sum())
    wx = wy = 0
    if sum_avg_x:
        wx = (sum_dx << 2) >> _floor_log2(sum_avg_x)
        wx = max(-BDOF_WGT_LIMIT, min(BDOF_WGT_LIMIT, wx))
    if sum_avg_y:
        x_off = 0
        if wx:
            high = sum_xy >> 12
            low = sum_xy & 4095
            x_off = (((wx * high) << 12) + (wx * low)) >> 1
        wy = ((sum_dy << 2) - x_off) >> _floor_log2(sum_avg_y)
        wy = max(-BDOF_WGT_LIMIT, min(BDOF_WGT_LIMIT, wy))
    return wx, wy


def bdof_block(ref0, ref1, pos_x, pos_y, mv0, mv1, w, h, bd, hpel,
               clip_mv_fn):
    """BDOF luma prediction for one (<=16x16) block; returns int32 [h, w]."""
    mvx0, mvy0 = clip_mv_fn(pos_x, pos_y, w, h, mv0.x, mv0.y)
    mvx1, mvy1 = clip_mv_fn(pos_x, pos_y, w, h, mv1.x, mv1.y)
    return bdof_from_positions(
        ref0, pos_x + (mvx0 >> 4), pos_y + (mvy0 >> 4), mvx0 & 15, mvy0 & 15,
        ref1, pos_x + (mvx1 >> 4), pos_y + (mvy1 >> 4), mvx1 & 15, mvy1 & 15,
        w, h, bd, hpel)


def bdof_from_positions(ref0, x0i, y0i, fx0, fy0, ref1, x1i, y1i, fx1, fy1,
                        w, h, bd, hpel):
    shift = 14 + 1 - bd
    off = 1 << (shift - 1)
    outs = np.zeros((h, w), np.int32)

    p0 = _padded_14bit(ref0, x0i, y0i, fx0, fy0, w, h, bd, hpel)
    p1 = _padded_14bit(ref1, x1i, y1i, fx1, fy1, w, h, bd, hpel)
    gx0, gy0 = _grads(p0, w, h)
    gx1, gy1 = _grads(p1, w, h)
    # overwrite the ref ring by replication for the weight pass
    _replicate_ring(p0, w, h)
    _replicate_ring(p1, w, h)

    for sy in range(0, h, 4):
        for sx in range(0, w, 4):
            win = np.s_[sy : sy + 6, sx : sx + 6]
            wx, wy = _bdof_weights(p0[win], p1[win], gx0[win], gx1[win],
                                   gy0[win], gy1[win])
            core = np.s_[sy + 1 : sy + 5, sx + 1 : sx + 5]
            b = wx * (gx0[core] - gx1[core]) + wy * (gy0[core] - gy1[core])
            val = _wrap16((p0[core] + p1[core] + b + off) >> shift)
            outs[sy : sy + 4, sx : sx + 4] = np.clip(val, 0, (1 << bd) - 1)
    return outs


# ----------------------------------------------------------------------
# DMVR
# ----------------------------------------------------------------------

def _div_for_maxq7(num: int, den: int) -> int:
    sign = num < 0
    if sign:
        num = -num
    q = 0
    den = den << 3
    if num >= den:
        num -= den
        q += 1
    q <<= 1
    den >>= 1
    if num >= den:
        num -= den
        q += 1
    q <<= 1
    if num >= (den >> 1):
        q += 1
    return -q if sign else q


def _sad_even_rows(a, b):
    return int(np.abs(a[::2].astype(np.int64) - b[::2].astype(np.int64)).sum())


def dmvr_refine(ref0, ref1, pos_x, pos_y, mv0, mv1, w, h, bd, clip_mv_fn):
    """DMVR search for one sub-PU; returns (mv0', mv1', min_cost) with MVs
    as (x, y) tuples (rcn_dmvr_mv_refine search part)."""
    MV_MAX = (1 << 17) - 1
    MV_MIN = -(1 << 17)

    mvx0, mvy0 = clip_mv_fn(pos_x, pos_y, w, h, mv0.x, mv0.y)
    mvx1, mvy1 = clip_mv_fn(pos_x, pos_y, w, h, mv1.x, mv1.y)

    # bilinear 10-bit grids over (w+4)x(h+4) starting 2 ints before
    b0 = ref_mc.dmvr_bilinear(ref0, pos_x + (mvx0 >> 4) - 2, pos_y + (mvy0 >> 4) - 2,
                              mvx0 & 15, mvy0 & 15, w + 4, h + 4, bd)
    b1 = ref_mc.dmvr_bilinear(ref1, pos_x + (mvx1 >> 4) - 2, pos_y + (mvy1 >> 4) - 2,
                              mvx1 & 15, mvy1 & 15, w + 4, h + 4, bd)

    sad_c = _sad_even_rows(b0[2 : 2 + h, 2 : 2 + w], b1[2 : 2 + h, 2 : 2 + w])
    min_cost = sad_c - (sad_c >> 2)
    dx = dy = 0
    if min_cost >= w * h:
        sad = [0] * 25
        sad[12] = min_cost
        best, best_cost = 12, 1 << 62
        for idx in range(25):
            if idx != 12:
                ox, oy = _DMVR_MV_X[idx], _DMVR_MV_Y[idx]
                sad[idx] = _sad_even_rows(
                    b0[2 + oy : 2 + oy + h, 2 + ox : 2 + ox + w],
                    b1[2 - oy : 2 - oy + h, 2 - ox : 2 - ox + w])
        for idx in range(25):
            if sad[idx] < best_cost or (idx == 12 and sad[idx] <= best_cost):
                best_cost = sad[idx]
                best = idx
        delta_h = _DMVR_MV_X[best] << 4
        delta_v = _DMVR_MV_Y[best] << 4
        min_cost = sad[best]
        if abs(delta_h) != 32 and abs(delta_v) != 32:
            bx, by = best % 5, best // 5
            s0 = sad[best]
            sl = sad[best - 1] if bx > 0 else 0
            sr = sad[best + 1] if bx < 4 else 0
            st = sad[best - 5] if by > 0 else 0
            sb = sad[best + 5] if by < 4 else 0
            den_h = sl + sr - (s0 << 1)
            den_v = st + sb - (s0 << 1)
            if den_h != 0:
                if sl != s0 and sr != s0:
                    dh = _div_for_maxq7((sl - sr) << 4, den_h)
                else:
                    dh = -8 if sl == s0 else 8
                delta_h += dh
            if den_v != 0:
                if st != s0 and sb != s0:
                    dv = _div_for_maxq7((st - sb) << 4, den_v)
                else:
                    dv = -8 if st == s0 else 8
                delta_v += dv
        dx, dy = delta_h, delta_v
    nmv0 = (max(MV_MIN, min(MV_MAX, mv0.x + dx)), max(MV_MIN, min(MV_MAX, mv0.y + dy)))
    nmv1 = (max(MV_MIN, min(MV_MAX, mv1.x - dx)), max(MV_MIN, min(MV_MAX, mv1.y - dy)))
    return nmv0, nmv1, min_cost


def dmvr_padded_patch(plane, ref_x, ref_y, w, h):
    """The reference's padded MC source: QPEL_EXTRA margins around the
    ORIGINAL integer position, then REPLICATED 2 more on each side
    (padd_dmvr :354 — the pad ring repeats the margin edge, it is NOT
    picture data). Origin maps picture coords to patch."""
    core = _int_patch(plane, ref_x - 3, ref_y - 3, w + 7, h + 7)
    patch = np.pad(core, 2, mode="edge")
    return patch.astype(np.int32), (ref_x - 5, ref_y - 5)

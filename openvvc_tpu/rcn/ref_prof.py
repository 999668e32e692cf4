"""PROF (prediction refinement with optical flow) for affine sub-blocks.

Bit-exact numpy reference. Parity: /root/reference/libovvc/rcn_prof_bdof.c
extend_prof_buff (:176), compute_prof_grad (:153), rcn_prof (:228),
tmp_prof_mrg / tmp_prof_mrg_w (:102/:126); drv_affine_mvp.c
compute_prof_dmv_scale (:3213).
"""

from __future__ import annotations

import numpy as np

from openvvc_tpu.rcn import ref_mc

PROF_DELTA_LIMIT = 1 << 13


def prof_sb(plane, ref_x, ref_y, frac_x, frac_y, bd, dmv_h, dmv_v, bidir):
    """One 4x4 PROF sub-block.

    ref_x/ref_y: integer block origin (mv already applied+clipped by caller);
    frac in 1/16 units. Returns the 14-bit int16-domain block (bidir) or
    bd-domain uni samples.
    """
    q = np.asarray(ref_mc.interp_14bit(plane, ref_x, ref_y, frac_x, frac_y,
                                       4, 4, bd, luma=True))
    ex, ey = frac_x >> 3, frac_y >> 3
    patch = ref_mc._gather_patch(plane, ref_x - 1 + ex, ref_y - 1 + ey,
                                 6, 6, 0, 0)
    buf = (patch.astype(np.int32) << (14 - bd))
    buf[1:5, 1:5] = q
    buf16 = buf.astype(np.int16).astype(np.int32)
    rnd = 1 << 13
    gx = (((buf16[1:5, 2:6] - rnd) >> 6) - ((buf16[1:5, 0:4] - rnd) >> 6)).astype(np.int16)
    gy = (((buf16[2:6, 1:5] - rnd) >> 6) - ((buf16[0:4, 1:5] - rnd) >> 6)).astype(np.int16)
    dh = np.asarray(dmv_h, np.int32).reshape(4, 4)
    dv = np.asarray(dmv_v, np.int32).reshape(4, 4)
    add = np.clip(dh * gx + dv * gy, -PROF_DELTA_LIMIT, PROF_DELTA_LIMIT - 1)
    val = (q.astype(np.int32) + add).astype(np.int16).astype(np.int32)
    if bidir:
        return val
    out = (val + (1 << (13 - bd))) >> (14 - bd)
    return np.clip(out, 0, (1 << bd) - 1)


def prof_mrg(v0, v1, bd):
    """tmp_prof_mrg: plain bi combine of two int16-domain blocks."""
    shift = 15 - bd
    off = 2 * (1 << (13 - bd))
    return np.clip((v0 + v1 + off) >> shift, 0, (1 << bd) - 1)


def prof_mrg_w(v0, v1, w0, w1, bd):
    """tmp_prof_mrg_w: BCW-weighted combine (weights by list)."""
    shift = 14 - bd + 3
    off = (2 * (1 << (13 - bd))) << 2
    return np.clip((v0 * w0 + v1 * w1 + off) >> shift, 0, (1 << bd) - 1)

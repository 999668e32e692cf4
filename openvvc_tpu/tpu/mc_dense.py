"""Dense whole-frame inter prediction over the per-4x4-unit motion grid.

Every 4x4 luma unit (and its collocated 2x2 chroma unit) carries the
PU-clipped MV, reference indices, and BCW/uni/bi weights emitted by
ov_build_ir. Prediction is two fixed-shape gathers (one per list) from the
edge-padded reference stack in HBM followed by separable 8/4-tap FIRs and
one weighted combine — no per-block control flow, every MV class served by
one compiled kernel (put_vvc_qpel/epel_* parity via rcn/ref_mc.py; ref
anchor /root/reference/libovvc/rcn_mc.c:448-720, rcn_inter.c:521-760).

The unified weight form is exact: uni == (8,0) under shift 17-bd, plain
bi == (4,4), BCW == (8-w, w) — each reduces to the reference's own
rounding (see rcn/pipeline.py round-2 derivation, kept here).
"""

from __future__ import annotations

import numpy as np

from openvvc_tpu.rcn.jax_mc import _NP_FILT_C, _NP_FILT_L

# padding margins for the reference stacks: luma window start is bounded by
# clip_mv to [-(pb_w + 6), pic_w - 1 + pb_w] with pb <= 128 (rcn/pipeline.py
# _clip_mv); 144 covers both sides incl. the 8-tap lookahead
PAD_L = 144
PAD_C = 80


def _grid(xp, n, m):
    uy = xp.repeat(xp.arange(n, dtype=xp.int32), m)
    ux = xp.tile(xp.arange(m, dtype=xp.int32), n)
    return uy, ux


def _interp_list(xp, flat, Hp, Wp, xb, yb, fx, fy, bw, taps, before, bd,
                 filt_tab):
    """14-bit separable FIR for N fixed-size blocks from a flattened stack.

    flat: (S*Hp, Wp); xb/yb: padded-plane window origins incl. the -before
    shift; fx/fy: fractional parts (0 = identity row). Returns (N, bw, bw)
    int32 in the 14-bit domain.
    """
    ext = bw + taps - 1
    rr = xp.arange(ext, dtype=xp.int32)
    yy = xp.clip(yb[:, None] + rr[None, :], 0, Hp - 1)
    xx = xp.clip(xb[:, None] + rr[None, :], 0, Wp - 1)
    patch = flat[yy[:, :, None], xx[:, None, :]].astype(xp.int32)
    fh = filt_tab[fx]
    fv = filt_tab[fy]
    sh1 = bd - 8
    tmp = fh[:, 0, None, None] * patch[:, :, 0:bw]
    for k in range(1, taps):
        tmp = tmp + fh[:, k, None, None] * patch[:, :, k:k + bw]
    tmp = (tmp >> sh1).astype(xp.int16).astype(xp.int32)
    out = fv[:, 0, None, None] * tmp[:, 0:bw, :]
    for k in range(1, taps):
        out = out + fv[:, k, None, None] * tmp[:, k:k + bw, :]
    return out >> 6


def mc_dense(xp, stack_y, stack_cb, stack_cr, gmv, gref, gw, ghpel,
             lut0, lut1, bd, uw, uh, chroma=True):
    """Whole-frame prediction planes from the dense motion grid.

    stack_*: (S, Hp, Wp) int16 edge-padded reference stacks (PAD_L/PAD_C).
    gmv (uh,uw,2,2) clipped 1/16-luma MVs; gref (uh,uw,2) ref idx (<0 none);
    gw (uh,uw,2) weights; ghpel (uh,uw); lut0/lut1 (16,) ref idx -> slot.
    Returns (pred_y (uh*4, uw*4), pred_cb, pred_cr (uh*2, uw*2)) int32,
    valid where the unit is inter-coded (garbage elsewhere; caller masks).
    """
    S, Hp, Wp = stack_y.shape
    N = uh * uw
    uy, ux = _grid(xp, uh, uw)
    flat_y = stack_y.reshape(S * Hp, Wp)
    filt_l = xp.asarray(_NP_FILT_L)
    filt_c = xp.asarray(_NP_FILT_C)
    hp = ghpel.reshape(N).astype(xp.int32)
    w0 = gw[:, :, 0].reshape(N).astype(xp.int32)
    w1 = gw[:, :, 1].reshape(N).astype(xp.int32)

    p14 = []
    pc14 = []
    for lst, lut in ((0, lut0), (1, lut1)):
        mvx = gmv[:, :, lst, 0].reshape(N)
        mvy = gmv[:, :, lst, 1].reshape(N)
        ref = gref[:, :, lst].reshape(N).astype(xp.int32)
        slot = lut[xp.clip(ref, 0, 15)]
        fx = mvx & 15
        fy = mvy & 15
        fx = xp.where((hp != 0) & (fx == 8), 16, fx)
        fy = xp.where((hp != 0) & (fy == 8), 16, fy)
        xb = ux * 4 + (mvx >> 4) - 3 + PAD_L
        yb = uy * 4 + (mvy >> 4) - 3 + PAD_L + slot * Hp
        p14.append(_interp_list(xp, flat_y, Hp * S, Wp, xb, yb, fx, fy, 4,
                                8, 3, bd, filt_l))
        if chroma:
            Sc, Hcp, Wcp = stack_cb.shape
            cxb = ux * 2 + (mvx >> 5) - 1 + PAD_C
            cyb = uy * 2 + (mvy >> 5) - 1 + PAD_C
            cfx = mvx & 31
            cfy = mvy & 31
            pcs = []
            for st in (stack_cb, stack_cr):
                fc = st.reshape(Sc * Hcp, Wcp)
                pcs.append(_interp_list(xp, fc, Hcp * Sc, Wcp,
                                        cxb, cyb + slot * Hcp, cfx, cfy, 2,
                                        4, 1, bd, filt_c))
            pc14.append(pcs)

    shift = 17 - bd
    off = 1 << (shift - 1)
    bd_max = (1 << bd) - 1

    def comb(a, b):
        v = (a * w0[:, None, None] + b * w1[:, None, None] + off) >> shift
        return xp.clip(v, 0, bd_max)

    py = comb(p14[0], p14[1]).reshape(uh, uw, 4, 4)
    pred_y = py.transpose(0, 2, 1, 3).reshape(uh * 4, uw * 4)
    if not chroma:
        return pred_y, None, None
    pcb = comb(pc14[0][0], pc14[1][0]).reshape(uh, uw, 2, 2)
    pcr = comb(pc14[0][1], pc14[1][1]).reshape(uh, uw, 2, 2)
    pred_cb = pcb.transpose(0, 2, 1, 3).reshape(uh * 2, uw * 2)
    pred_cr = pcr.transpose(0, 2, 1, 3).reshape(uh * 2, uw * 2)
    return pred_y, pred_cb, pred_cr


def pad_plane(xp, plane, pad):
    """Edge-replicated padding (emulate_block_border parity by clamp)."""
    if xp is np:
        return np.pad(plane, pad, mode="edge")
    import jax.numpy as jnp

    return jnp.pad(plane, pad, mode="edge")

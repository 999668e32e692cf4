"""Bit-exact numpy reference: inter motion-compensated prediction.

H.266 8.5.6.3 fractional sample interpolation. Parity:
/root/reference/libovvc/rcn_mc.c — put_vvc_{pel,qpel,epel} families
(:380-1360), put_weighted_* BCW variants (:1481-1610),
put_weighted_ciip_pixels (:1612), put_weighted_gpm_bi_pixels (:1631),
bilinear DMVR taps (:789-900).

Conventions (mirroring the reference):
 - 14-bit intermediate domain: `interp_14bit` == the put_vvc_*_[pel/h/v/hv]
   int16 outputs (no rounding, shift BITDEPTH-8 after the first stage,
   6 after the second).
 - uni outputs: clip((pel14 + (1 << (13-bd))) >> (14-bd)).
 - bi outputs: clip((p0 + p1 + (1 << (14-bd))) >> (15-bd)).
 - Out-of-picture reads use edge replication (the reference fetches
   through its emulated-edge buffer, ovdpb border extension).
"""

from __future__ import annotations

import numpy as np

from openvvc_tpu.rcn.data_mc import (
    BILINEAR_FILTERS,
    MC_FILTERS_4,
    MC_FILTERS_C,
    MC_FILTERS_L,
)


def _bdclip(v, bitdepth):
    return np.clip(v, 0, (1 << bitdepth) - 1)


def _gather_patch(plane: np.ndarray, x0: int, y0: int, w: int, h: int,
                  before: int, after: int) -> np.ndarray:
    """[h + before + after, w + before + after] patch with edge clamp."""
    H, W = plane.shape
    ys = np.clip(np.arange(y0 - before, y0 + h + after), 0, H - 1)
    xs = np.clip(np.arange(x0 - before, x0 + w + after), 0, W - 1)
    return plane[np.ix_(ys, xs)].astype(np.int64)


def _luma_filter(frac: int, is_4x4: bool, hpel: bool = False) -> np.ndarray:
    if hpel and frac == 8:
        return MC_FILTERS_L[15]
    return (MC_FILTERS_4 if is_4x4 else MC_FILTERS_L)[frac - 1]


def _conv_h(patch: np.ndarray, filt: np.ndarray, taps: int) -> np.ndarray:
    """Horizontal FIR: out[:, x] = sum_i filt[i] * patch[:, x + i]."""
    w = patch.shape[1] - taps + 1
    acc = np.zeros((patch.shape[0], w), np.int64)
    for i in range(taps):
        acc += filt[i] * patch[:, i : i + w]
    return acc


def _conv_v(patch: np.ndarray, filt: np.ndarray, taps: int) -> np.ndarray:
    h = patch.shape[0] - taps + 1
    acc = np.zeros((h, patch.shape[1]), np.int64)
    for i in range(taps):
        acc += filt[i] * patch[i : i + h, :]
    return acc


def interp_14bit(plane: np.ndarray, x0: int, y0: int, frac_x: int, frac_y: int,
                 w: int, h: int, bitdepth: int, luma: bool = True,
                 hpel: bool = False) -> np.ndarray:
    """14-bit-domain MC intermediate (put_vvc_qpel_h/v/hv & epel parity).

    (x0, y0): integer-pel block origin in `plane`; frac in 1/16 (luma) or
    1/32 (chroma) units. hpel selects the 6-tap AMVR half-pel filter.
    """
    sh1 = bitdepth - 8
    if luma:
        before, taps = 3, 8
        is_4 = w == 4 and h == 4
        fh = _luma_filter(frac_x, is_4, hpel) if frac_x else None
        fv = _luma_filter(frac_y, is_4, hpel) if frac_y else None
    else:
        before, taps = 1, 4
        fh = MC_FILTERS_C[frac_x - 1] if frac_x else None
        fv = MC_FILTERS_C[frac_y - 1] if frac_y else None
    after = taps - 1 - before

    if fh is None and fv is None:
        patch = _gather_patch(plane, x0, y0, w, h, 0, 0)
        return (patch << (14 - bitdepth)).astype(np.int64)
    if fv is None:
        patch = _gather_patch(plane, x0 - before, y0, w + taps - 1, h, 0, 0)
        return _conv_h(patch, fh, taps) >> sh1
    if fh is None:
        patch = _gather_patch(plane, x0, y0 - before, w, h + taps - 1, 0, 0)
        return _conv_v(patch, fv, taps) >> sh1
    patch = _gather_patch(plane, x0 - before, y0 - before,
                          w + taps - 1, h + taps - 1, 0, 0)
    tmp = _conv_h(patch, fh, taps) >> sh1
    # int16 intermediate storage in the reference
    tmp = tmp.astype(np.int16).astype(np.int64)
    return _conv_v(tmp, fv, taps) >> 6


def mc_uni(plane, x0, y0, frac_x, frac_y, w, h, bitdepth, luma=True, hpel=False):
    """Uni-directional prediction samples (put_vvc_*_uni_* parity)."""
    if not frac_x and not frac_y:
        return _gather_patch(plane, x0, y0, w, h, 0, 0).astype(np.int32)
    p = interp_14bit(plane, x0, y0, frac_x, frac_y, w, h, bitdepth, luma, hpel)
    shift = 14 - bitdepth
    return _bdclip((p + (1 << (shift - 1))) >> shift, bitdepth).astype(np.int32)


def mc_bi(p0_14: np.ndarray, p1_14: np.ndarray, bitdepth: int) -> np.ndarray:
    """Bi-prediction average of two 14-bit intermediates (put_vvc_*_bi_*)."""
    shift = 15 - bitdepth
    return _bdclip((p0_14 + p1_14 + (1 << (shift - 1))) >> shift,
                   bitdepth).astype(np.int32)


def mc_bi_weighted(p0_14, p1_14, bitdepth, denom, w0, w1):
    """BCW / explicit weighted bi-pred (put_weighted_*_bi_* :1481).

    dst = clip((p0*w0 + p1*w1 + off) >> (14 - bd + denom)); the reference
    passes denom = log2(weight sum) - 1 (BCW: denom=3, w0+w1=8... shift
    includes +denom so off = 1 << (shift-1))."""
    shift = 14 - bitdepth + denom
    off = 1 << (shift - 1)
    return _bdclip((p0_14 * w0 + p1_14 * w1 + off) >> shift, bitdepth).astype(np.int32)


def ciip_blend(intra: np.ndarray, inter: np.ndarray, wt: int, bitdepth: int) -> np.ndarray:
    """CIIP blend (put_weighted_ciip_pixels :1612): wt in {1,2,3}."""
    return _bdclip((intra.astype(np.int64) * wt + inter.astype(np.int64) * (4 - wt) + 2) >> 2,
                   bitdepth).astype(np.int32)


def gpm_blend(p0_14: np.ndarray, p1_14: np.ndarray, weight0: np.ndarray, bitdepth: int) -> np.ndarray:
    """GPM weighted blend of two 14-bit intermediates
    (put_weighted_gpm_bi_pixels :1631): weight0 in 0..8 per sample."""
    shift = 14 - bitdepth + 3
    off = 1 << (shift - 1)
    w0 = weight0.astype(np.int64)
    return _bdclip((p1_14 * (8 - w0) + p0_14 * w0 + off) >> shift, bitdepth).astype(np.int32)


def dmvr_bilinear(plane, x0, y0, frac_x, frac_y, w, h, bitdepth):
    """DMVR 2-tap bilinear search predictor in the 10-bit domain
    (put_vvc_*_bilinear_* :789-900). Returns int32 [h, w]."""
    shift1 = 4 - (10 - bitdepth)
    off1 = 1 << (shift1 - 1)
    if not frac_x and not frac_y:
        patch = _gather_patch(plane, x0, y0, w, h, 0, 0)
        return (patch << (10 - bitdepth)).astype(np.int32)
    if not frac_y:
        fh = BILINEAR_FILTERS[frac_x - 1]
        # reference reads src + 1: taps at x and x+1 relative to origin
        patch = _gather_patch(plane, x0, y0, w + 1, h, 0, 0)
        return ((_conv_h(patch, fh, 2) + off1) >> shift1).astype(np.int32)
    if not frac_x:
        fv = BILINEAR_FILTERS[frac_y - 1]
        patch = _gather_patch(plane, x0, y0, w, h + 1, 0, 0)
        return ((_conv_v(patch, fv, 2) + off1) >> shift1).astype(np.int32)
    fh = BILINEAR_FILTERS[frac_x - 1]
    fv = BILINEAR_FILTERS[frac_y - 1]
    # hv: dst[y][x] = fv over rows y,y+1 of the h-filtered (cols x,x+1) plane
    patch = _gather_patch(plane, x0, y0, w + 2, h + 2, 0, 0)
    tmp = (_conv_h(patch, fh, 2) + off1) >> shift1
    out = (_conv_v(tmp, fv, 2) + 8) >> 4
    return out[:h, :w].astype(np.int32)

"""Bit-exact numpy reference: dequantization and inverse transforms.

ITU-T H.266 8.7.3 (scaling) and 8.7.4 (transformation: DCT-II 2..64,
DST-VII / DCT-VIII 4..32, two-stage with 16-bit intermediate clipping).
Parity: /root/reference/libovvc/rcn_dequant.c (derive_dequant_sdh/dpq/ts
:92-158), rcn_transform.c, rcn_transform_tree.c (rcn_residual :415,
TR_SHIFT_V/H :47-48).
"""

from __future__ import annotations

import numpy as np

from openvvc_tpu.rcn.data_transform import MATRICES

IQUANT_SHIFT = 6
MAX_LOG2_TR_RANGE = 15

_IQ_SCALE = ((40, 45, 51, 57, 64, 72), (57, 64, 72, 80, 90, 102))


def derive_dequant(qp: int, log2_w: int, log2_h: int, dep_quant: bool, bitdepth: int):
    """Returns (scale, shift) with shift possibly negative (then scale <<= -shift)."""
    log2_s = log2_w + log2_h
    if dep_quant:
        shift = IQUANT_SHIFT + 1 - (MAX_LOG2_TR_RANGE - bitdepth) - ((qp + 1) // 6) + (log2_s >> 1) + (log2_s & 1)
        scale = _IQ_SCALE[log2_s & 1][(qp + 1) % 6]
    else:
        shift = IQUANT_SHIFT - (MAX_LOG2_TR_RANGE - bitdepth) - (qp // 6) + (log2_s >> 1) + (log2_s & 1)
        scale = _IQ_SCALE[log2_s & 1][qp % 6]
    return scale, shift


def dequant(levels: np.ndarray, qp: int, log2_w: int, log2_h: int, dep_quant: bool, bitdepth: int) -> np.ndarray:
    """TransCoeffLevel -> dequantized coefficients, clipped to 16 bits."""
    scale, shift = derive_dequant(qp, log2_w, log2_h, dep_quant, bitdepth)
    lv = levels.astype(np.int64)
    if shift >= 0:
        add = (1 << shift) >> 1
        out = (lv * scale + add) >> shift
    else:
        out = lv * (scale << -shift)
    return np.clip(out, -(1 << MAX_LOG2_TR_RANGE), (1 << MAX_LOG2_TR_RANGE) - 1).astype(np.int32)


_TR_NAME = {0: "DST7", 1: "DCT8", 2: "DCT2"}

# mts_idx (TU IR): 0 = DCT2/DCT2; 1..4 = (DST7,DST7),(DCT8,DST7),(DST7,DCT8),(DCT8,DCT8)
_MTS_PAIR = {
    0: ("DCT2", "DCT2"),
    1: ("DST7", "DST7"),
    2: ("DCT8", "DST7"),  # (tr_h, tr_v) = (idx&1 ? DCT8 : DST7, ...)
    3: ("DST7", "DCT8"),
    4: ("DCT8", "DCT8"),
}


def inverse_transform_2d(
    coeffs: np.ndarray,
    log2_w: int,
    log2_h: int,
    tr_h: str,
    tr_v: str,
    bitdepth: int,
) -> np.ndarray:
    """Two-stage inverse transform; returns int32 residual [h, w]."""
    h, w = 1 << log2_h, 1 << log2_w
    assert coeffs.shape == (h, w)
    shift1 = 7  # TR_SHIFT_V
    shift2 = (6 + 15 - 1) - bitdepth  # TR_SHIFT_H
    clip_lo, clip_hi = -(1 << 15), (1 << 15) - 1

    m_v = MATRICES[(tr_v, h)].astype(np.int64)
    m_h = MATRICES[(tr_h, w)].astype(np.int64)
    d = coeffs.astype(np.int64)

    # vertical: tmp[x][y] = clip((sum_k d[k][x] * M_v[k][y] + add) >> shift1)
    tmp = np.clip((d.T @ m_v + (1 << (shift1 - 1))) >> shift1, clip_lo, clip_hi)
    # horizontal: out[y][x] = clip((sum_k tmp[k][y] * M_h[k][x] + add) >> shift2)
    out = np.clip((tmp.T @ m_h + (1 << (shift2 - 1))) >> shift2, clip_lo, clip_hi)
    return out.astype(np.int32)


def reconstruct_tu_residual(tu, ctx_like, bitdepth: int, intra: bool = True) -> np.ndarray:
    """Full dequant + inverse transform for one TU IR entry.

    ctx_like provides: dep_quant (bool), mts_implicit (bool).
    """
    log2_w, log2_h = tu.log2_w, tu.log2_h
    dq = dequant(tu.coeffs, tu.qp, log2_w, log2_h, ctx_like.dep_quant, bitdepth)

    if tu.transform_skip:
        raise NotImplementedError("transform skip reconstruction")

    luma = tu.comp == 0
    mts_idx = tu.mts_idx if luma else 0
    if tu.lfnst_idx:
        raise NotImplementedError("LFNST reconstruction")

    if luma and mts_idx == 0 and ctx_like.mts_implicit and intra and (log2_w <= 4 or log2_h <= 4):
        tr_h = "DST7" if 2 <= log2_w <= 4 else "DCT2"
        tr_v = "DST7" if 2 <= log2_h <= 4 else "DCT2"
    elif mts_idx:
        sym = mts_idx - 1
        tr_h = "DCT8" if (sym & 1) else "DST7"
        tr_v = "DCT8" if (sym >> 1) else "DST7"
    else:
        tr_h = tr_v = "DCT2"
    return inverse_transform_2d(dq, log2_w, log2_h, tr_h, tr_v, bitdepth)

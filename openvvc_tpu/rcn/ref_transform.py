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
    return _clip17_wrap16(out)


def _clip17_wrap16(out: np.ndarray) -> np.ndarray:
    """Reference dequant_sb/_neg parity: ov_clip_intp2(v, MAX_LOG2_TR_RANGE+1)
    clips SYMMETRICALLY to +/-(2^15 - 1) (ovutils.h :79-92)."""
    lim = (1 << MAX_LOG2_TR_RANGE) - 1
    return np.clip(out, -lim, lim).astype(np.int32)


def dequant_ts(levels: np.ndarray, qp: int) -> np.ndarray:
    """Transform-skip dequant: no transform shift (derive_dequant_ts :139)."""
    shift = IQUANT_SHIFT - qp // 6
    scale = _IQ_SCALE[0][qp % 6]
    lv = levels.astype(np.int64)
    if shift >= 0:
        add = (1 << shift) >> 1
        out = (lv * scale + add) >> shift
    else:
        out = lv * (scale << -shift)
    return _clip17_wrap16(out)


def reconstruct_bdpcm(levels: np.ndarray, qp: int, direction: int) -> np.ndarray:
    """BDPCM: accumulate raw levels along the direction (int16 clip), then
    transform-skip dequant (rcn_transform_tree.c rcn_bdpcm_tb :666,
    apply_bdpcm_1/2 :631-663)."""
    acc = np.zeros_like(levels, np.int64)
    lv = levels.astype(np.int64)
    if direction:  # vertical
        acc[0] = lv[0]
        for y in range(1, lv.shape[0]):
            acc[y] = np.clip(acc[y - 1] + lv[y], -(1 << 15), (1 << 15) - 1)
    else:  # horizontal
        acc[:, 0] = lv[:, 0]
        for x in range(1, lv.shape[1]):
            acc[:, x] = np.clip(acc[:, x - 1] + lv[:, x], -(1 << 15), (1 << 15) - 1)
    return dequant_ts(acc.astype(np.int32), qp)


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


def transform_pair(tu, ctx_like, intra: bool = True, is_mip: bool = False):
    """(tr_h, tr_v) for a non-TS non-LFNST TU; LFNST TUs use DCT2/DCT2 after
    the secondary transform."""
    luma = tu.comp == 0
    mts_idx = tu.mts_idx if luma else 0
    if tu.lfnst_idx:
        return "DCT2", "DCT2"
    if luma and mts_idx == 0 and ctx_like.mts_implicit and intra and not is_mip \
            and (tu.log2_w <= 4 or tu.log2_h <= 4):
        tr_h = "DST7" if 2 <= tu.log2_w <= 4 else "DCT2"
        tr_v = "DST7" if 2 <= tu.log2_h <= 4 else "DCT2"
        return tr_h, tr_v
    if mts_idx:
        sym = mts_idx - 1
        return ("DCT8" if (sym & 1) else "DST7", "DCT8" if (sym >> 1) else "DST7")
    return "DCT2", "DCT2"


def reconstruct_tu_residual(tu, ctx_like, bitdepth: int, intra: bool = True,
                            lfnst_mode: int | None = None, is_mip: bool = False) -> np.ndarray:
    """Full dequant + inverse transform for one TU IR entry.

    ctx_like provides: dep_quant (bool), mts_implicit (bool).
    lfnst_mode: normalized LFNST intra mode (required when tu.lfnst_idx).
    """
    pre = getattr(tu, "residual_precomputed", None)
    if pre is not None:
        return pre

    log2_w, log2_h = tu.log2_w, tu.log2_h

    if tu.transform_skip:
        if tu.bdpcm:
            return reconstruct_bdpcm(tu.coeffs, tu.qp, tu.bdpcm_dir)
        return dequant_ts(tu.coeffs, tu.qp)

    dq = dequant(tu.coeffs, tu.qp, log2_w, log2_h, ctx_like.dep_quant, bitdepth)
    if tu.lfnst_idx:
        dq = apply_lfnst(dq, min(5, log2_w), min(5, log2_h), tu.lfnst_idx, lfnst_mode)
        return inverse_transform_2d(dq, log2_w, log2_h, "DCT2", "DCT2", bitdepth)

    tr_h, tr_v = transform_pair(tu, ctx_like, intra, is_mip)
    return inverse_transform_2d(dq, log2_w, log2_h, tr_h, tr_v, bitdepth)


# ----------------------------------------------------------------------
# LFNST (low-frequency non-separable secondary transform)
# ----------------------------------------------------------------------

from openvvc_tpu.rcn.data_lfnst import LFNST  # noqa: E402
from openvvc_tpu.vcl.residual import diag_scan  # noqa: E402

_LFNST_MODE_MAP = bytes(
    [0, 0] + [1] * 11 + [2] * 11 + [3] * 21 + [2] * 11 + [1] * 39
)
# matches drv_lfnst.c lfnst_mode_map[67+28] exactly:
assert list(_LFNST_MODE_MAP[:13]) == [0, 0, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1]

_DIAG_4x4 = diag_scan(4, 4)

OVINTRA_DIA = 34
OVINTRA_VDIA = 66
_MODE_SHIFT_LUT = (0, 6, 10, 12, 14, 15)


def lfnst_intra_mode(log2_w: int, log2_h: int, intra_mode: int) -> int:
    """drv_lfnst_mode_l parity: wide-angle remap + normalization to [0,95)."""
    if intra_mode > 1:  # > DC
        shift = _MODE_SHIFT_LUT[abs(log2_w - log2_h)]
        if log2_w > log2_h and intra_mode < 2 + shift:
            intra_mode += OVINTRA_VDIA - 1
        elif log2_h > log2_w and intra_mode > OVINTRA_VDIA - shift:
            intra_mode -= OVINTRA_VDIA + 1
    if intra_mode < 0:
        intra_mode += 14 + 67
    elif intra_mode >= 67:
        intra_mode += 14
    return intra_mode


def apply_lfnst(coeffs: np.ndarray, log2_w: int, log2_h: int, lfnst_idx: int, mode_l: int) -> np.ndarray:
    """Inverse LFNST on dequantized coefficients (rcn_lfnst.c parity).

    coeffs: [h, w] int32 dequantized levels; lfnst_idx in {1, 2};
    mode_l: normalized LFNST intra mode (lfnst_intra_mode output).
    Returns a new coefficient array; only DCT2 may follow.
    """
    out = np.zeros_like(coeffs)
    transpose = (67 > mode_l > OVINTRA_DIA) or mode_l >= 67 + 14
    mode_set = _LFNST_MODE_MAP[mode_l]
    is_8x8 = log2_w >= 3 and log2_h >= 3

    # gather first 16 coeffs of the top-left 4x4 in diagonal order
    tmp = np.array([coeffs[y, x] for (x, y) in _DIAG_4x4], np.int64)

    mat = LFNST[(1 if is_8x8 else 0, mode_set, lfnst_idx - 1)].astype(np.int64)
    if not is_8x8:
        n_in = 8 if log2_w == log2_h else 16
        n_out = 16
        stride = 16
        vals = [
            int(np.clip((np.dot(tmp[:n_in], mat[i::stride][:n_in]) + 64) >> 7, -(1 << 15), (1 << 15)))
            for i in range(n_out)
        ]
        for i, v in enumerate(vals):
            x, y = (i & 3, i >> 2) if not transpose else (i >> 2, i & 3)
            out[y, x] = v
    else:
        stride = 48
        for i in range(48):
            v = int(np.clip((np.dot(tmp, mat[i::stride][:16]) + 64) >> 7, -(1 << 15), (1 << 15)))
            if i < 32:
                x, y = i & 7, i >> 3
            else:
                x, y = i & 3, 4 + ((i - 32) >> 2)
            if transpose:
                x, y = y, x
            out[y, x] = v
    return out

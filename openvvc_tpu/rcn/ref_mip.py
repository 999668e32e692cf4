"""Bit-exact numpy reference for Matrix Intra Prediction (MIP).

ITU-T H.266 8.4.5.2.2: boundary downsampling, matrix-vector prediction at
reduced size (always square: 4x4 or 8x8), and linear upsampling against the
unfiltered reference samples.

Behavior parity: /root/reference/libovvc/rcn_intra_mip.c (vvc_intra_pred_mip
:132, vvc_intra_pred_mip_tr :260, mip_matmult :63, up_sample :94,
derive_mip_ctx :47). Weight tables in data_mip.py are the normative spec
constants, mechanically extracted.
"""

from __future__ import annotations

import numpy as np

from openvvc_tpu.rcn.data_mip import MIP_W4, MIP_W8, MIP_W16
from openvvc_tpu.rcn.ref_intra import _bdclip, fill_side_refs

MIP_SHIFT = 6
MIP_OFFSET = 1 << (MIP_SHIFT - 1)

# size-class selection: (table, n_in, n_out); class by (log2_w, log2_h)
_W4 = np.frombuffer(MIP_W4, np.uint8).reshape(16, 16, 4).astype(np.int64)
_W8 = np.frombuffer(MIP_W8, np.uint8).reshape(8, 16, 8).astype(np.int64)
_W16 = np.frombuffer(MIP_W16, np.uint8).reshape(6, 64, 8).astype(np.int64)


def mip_size_class(log2_w: int, log2_h: int) -> int:
    """0: 4x4 (16 modes); 1: small (8 modes); 2: large (6 modes)."""
    if log2_w == 2 and log2_h == 2:
        return 0
    if log2_w == 2 or log2_h == 2 or (log2_w <= 3 and log2_h <= 3):
        return 1
    return 2


def nb_mip_modes(log2_w: int, log2_h: int) -> int:
    return (16, 8, 6)[mip_size_class(log2_w, log2_h)]


def _avg_boundary(side: np.ndarray, n_bndy: int) -> np.ndarray:
    seg = len(side) // n_bndy
    rnd = seg >> 1
    return (side.reshape(n_bndy, seg).astype(np.int64).sum(1) + rnd) >> seg.bit_length() - 1


def predict_mip(plane, x0, y0, log2_w, log2_h, mip_mode, transpose, avail_fn, bitdepth):
    """Returns the MIP prediction block [h, w] (int32)."""
    w, h = 1 << log2_w, 1 << log2_h
    ref_a, ref_l = fill_side_refs(plane, x0, y0, log2_w, log2_h, avail_fn, bitdepth)
    abv = ref_a.view(1, 1 + w)
    lft = ref_l.view(1, 1 + h)

    log2_bndy = 1 << int(log2_w > 2 or log2_h > 2)
    n_bndy = 1 << log2_bndy
    a_avg = _avg_boundary(abv, n_bndy)
    l_avg = _avg_boundary(lft, n_bndy)

    bndy = np.concatenate([l_avg, a_avg] if transpose else [a_avg, l_avg])
    input_offset = int(bndy[0])

    size_cls = mip_size_class(log2_w, log2_h)
    red_size = size_cls < 2
    if red_size:
        bndy[0] = 1 << (bitdepth - 1)
    bndy -= input_offset
    rnd_mip = MIP_OFFSET - MIP_OFFSET * int(bndy.sum())

    log2_red = 2 if red_size else 3
    n_red = 1 << log2_red

    mat = (_W4, _W8, _W16)[size_cls][mip_mode]  # [n_out, n_in]
    vals = _bdclip(((mat @ bndy) + rnd_mip >> MIP_SHIFT) + input_offset, bitdepth)
    red = vals.reshape(n_red, n_red)
    if transpose:
        red = red.T

    scale_x = log2_w - log2_red
    scale_y = log2_h - log2_red
    if not (scale_x or scale_y):
        return red.astype(np.int32)

    if scale_x:
        # horizontal: per reduced row i, interpolate against the left sample of
        # the final row this reduced row maps to (ref_lft[(i+1)<<scale_y]).
        before0 = ref_l.view(0, 2 * h + 1)[(np.arange(n_red) + 1) << scale_y]
        rows = _upsample_rows(red, before0, scale_x)
    else:
        rows = red
    if scale_y:
        # vertical: per column, interpolate against the above sample ref_abv[col+1].
        before0 = abv[: rows.shape[1]]
        out = _upsample_rows(rows.T, before0, scale_y).T
    else:
        out = rows
    return out.astype(np.int32)


def _upsample_rows(src: np.ndarray, before0: np.ndarray, scale: int) -> np.ndarray:
    """Linear 1<<scale upsampling along axis 1 (up_sample parity).

    out[j*2^s + p-1] = (before*(2^s - p) + src[j]*p + 2^(s-1)) >> s, where
    before is before0 for j=0 then src[j-1].
    """
    n_rows, n_src = src.shape
    src = src.astype(np.int64)
    before = np.concatenate([before0.astype(np.int64)[:, None], src[:, :-1]], axis=1)
    p = np.arange(1, (1 << scale) + 1)
    vals = (before[:, :, None] * ((1 << scale) - p) + src[:, :, None] * p + (1 << (scale - 1))) >> scale
    return vals.reshape(n_rows, n_src << scale)

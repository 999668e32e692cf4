"""Batched JAX intra-prediction kernels (bit-exact vs rcn/ref_intra.py).

Design: the host prepares per-TB reference arrays (availability fill,
[1 2 1] smoothing, negative-mode projection — all O(N+S) scalar work via the
validated ref_intra helpers) and groups TBs of one size by dispatch class;
the kernels below then run the O(N*S^2) prediction math as batched integer
gathers/arithmetic on device. `predict_intra_group` mirrors
ref_intra.predict_intra's dispatch for a batch sharing (size, class).

All math is exact in int32 (the widest intermediate is a 6-bit weight times
a 16-bit sample summed over <=64 taps < 2^28, and the reference's own C
kernels use int32 throughout): these kernels are tested element-equal
against the scalar reference for every mode.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from openvvc_tpu.rcn.data_angular import ANGLE_TABLE, CUBIC_FILTER, INVERSE_ANGLE_TABLE
from openvvc_tpu.rcn.ref_intra import (
    INTRA_FILTER_THR,
    OVINTRA_DIA,
    OVINTRA_HOR,
    OVINTRA_VER,
    _floor_log2,
    derive_wide_angular_mode,
    fill_side_refs,
    filter_ref_array,
    _project_negative,
)

_CUBIC = jnp.asarray(np.asarray(CUBIC_FILTER, np.int32))


def _bd_clip(v, bitdepth):
    return jnp.clip(v, 0, (1 << bitdepth) - 1)


def planar_batch(top, left, top_right, bot_left, log2_w, log2_h):
    """top [N,w], left [N,h], top_right/bot_left [N] -> [N,h,w] (int32)."""
    w, h = 1 << log2_w, 1 << log2_h
    x = jnp.arange(w, dtype=jnp.int32)
    y = jnp.arange(h, dtype=jnp.int32)[:, None]
    t = top.astype(jnp.int32)[:, None, :]
    l = left.astype(jnp.int32)[:, :, None]
    tr = top_right.astype(jnp.int32)[:, None, None]
    bl = bot_left.astype(jnp.int32)[:, None, None]
    hor = (l << log2_w) + (x + 1)[None, None, :] * (tr - l)
    ver = (t << log2_h) + (y + 1)[None, :, :] * (bl - t)
    return (((hor << log2_h) + (ver << log2_w) + (1 << (log2_w + log2_h)))
            >> (1 + log2_w + log2_h)).astype(jnp.int32)


def dc_batch(top, left, log2_w, log2_h):
    w, h = 1 << log2_w, 1 << log2_h
    shift = max(log2_w, log2_h) + (1 if log2_w == log2_h else 0)
    dc = jnp.zeros(top.shape[0], jnp.int32)
    if log2_w >= log2_h:
        dc = dc + top.astype(jnp.int32).sum(axis=1)
    if log2_w <= log2_h:
        dc = dc + left.astype(jnp.int32).sum(axis=1)
    dc = (dc + ((1 << shift) >> 1)) >> shift
    return jnp.broadcast_to(dc[:, None, None], (top.shape[0], h, w)).astype(jnp.int32)


def pdpc_flat_batch(pred, top, left, log2_w, log2_h, bitdepth):
    """PDPC for planar/DC (ref_intra.pdpc_dc_planar parity)."""
    w, h = 1 << log2_w, 1 << log2_h
    scale = (log2_w + log2_h - 2) >> 2
    x = jnp.arange(w)
    y = jnp.arange(h)
    shx = jnp.minimum(31, (x << 1) >> scale)
    shy = jnp.minimum(31, (y << 1) >> scale)
    w_x = jnp.where(shx < 6, 32 >> jnp.minimum(shx, 5), 0).astype(jnp.int32)[None, None, :]
    w_y = jnp.where(shy < 6, 32 >> jnp.minimum(shy, 5), 0).astype(jnp.int32)[None, :, None]
    t = top.astype(jnp.int32)[:, None, :]
    l = left.astype(jnp.int32)[:, :, None]
    val = (w_x * l + w_y * t + (64 - w_x - w_y) * pred.astype(jnp.int32) + 32) >> 6
    return _bd_clip(val, bitdepth).astype(jnp.int32)


def angular_core_batch(ref, off, angle, n_lines, line_len, filt, bitdepth):
    """Directional prediction along the main reference.

    ref [N, K]: extended main reference; ref[:, off + k] == ref_main[k] of the
    scalar path. angle [N] signed. filt: 'copy' | 'cubic' | 'gauss'.
    Returns [N, n_lines, line_len] unoriented (rows along the main dir)."""
    j = jnp.arange(1, n_lines + 1, dtype=jnp.int32)[None, :]       # [1, L]
    delta = angle[:, None].astype(jnp.int32) * j                   # [N, L]
    d_int = delta >> 5
    d_frac = delta & 0x1F
    x = jnp.arange(line_len, dtype=jnp.int32)[None, None, :]
    base = off + d_int[:, :, None] + x                              # [N, L, len]

    def gat(shift):
        return jnp.take_along_axis(
            ref.astype(jnp.int32), (base + shift).reshape(ref.shape[0], -1).astype(jnp.int32), axis=1
        ).reshape(base.shape)

    if filt == "copy":
        return gat(1).astype(jnp.int32)
    if filt == "cubic":
        taps = _CUBIC[d_frac].astype(jnp.int32)                    # [N, L, 4]
        acc = sum(taps[:, :, i : i + 1] * gat(i) for i in range(4))
        val = (acc + 32) >> 6
        return _bd_clip(val, bitdepth).astype(jnp.int32)
    # gauss: taps derived from frac
    f = d_frac.astype(jnp.int32)[:, :, None]
    t0, t1, t2, t3 = 16 - (f >> 1), 32 - (f >> 1), 16 + (f >> 1), f >> 1
    acc = t0 * gat(0) + t1 * gat(1) + t2 * gat(2) + t3 * gat(3)
    return ((acc + 32) >> 6).astype(jnp.int32)


def pdpc_angular_batch(pred, side, off, inv_angle, scale, lim, bitdepth):
    """PDPC for positive angular modes (ref_intra._pdpc_angular parity).

    side [N, K] with side[:, off + k] == ref_side[k]; inv_angle/scale scalars
    for the group (all TBs in a group share the mode-derived params), lim =
    min(3<<scale, line_len)."""
    n, n_lines, line_len = pred.shape
    x = jnp.arange(line_len, dtype=jnp.int32)
    inv_sum = 256 + inv_angle * (x + 1)
    idx = (inv_sum >> 9).astype(jnp.int32)                          # [len]
    jj = jnp.arange(n_lines, dtype=jnp.int32)[:, None]
    gidx = off + jj + idx[None, :] + 1                              # [L, len]
    p = jnp.take_along_axis(
        side.astype(jnp.int32),
        jnp.broadcast_to(gidx[None], (n, n_lines, line_len)).reshape(n, -1).astype(jnp.int32),
        axis=1,
    ).reshape(n, n_lines, line_len)
    sh = jnp.minimum(31, (x << 1) >> scale)
    w_l = jnp.where(sh < 6, 32 >> jnp.minimum(sh, 5), 0)[None, None, :]
    pr = pred.astype(jnp.int32)
    out = _bd_clip(pr + ((w_l * (p - pr) + 32) >> 6), bitdepth)
    mask = (x < lim)[None, None, :]
    return jnp.where(mask, out, pr).astype(jnp.int32)


# ----------------------------------------------------------------------
# host-side group driver
# ----------------------------------------------------------------------

def pack_refs(ref_list, lo, length):
    """RefArrays list -> [N, lo + length] int32 (index k lives at lo + k)."""
    out = np.zeros((len(ref_list), lo + length), np.int32)
    for i, r in enumerate(ref_list):
        out[i] = r.buf[r.off - lo : r.off + length]
    return out


def predict_intra_group(plane, tbs, log2_w, log2_h, mode, avail_fn, bitdepth, luma=True):
    """Batched intra prediction for TBs sharing (size, mode).

    tbs: list of (x0, y0). Mirrors ref_intra.predict_intra's dispatch; the
    per-TB reference preparation is scalar, the prediction math batched.
    Returns [N, h, w] numpy int32.
    """
    w, h = 1 << log2_w, 1 << log2_h
    unit = 4 if luma else 2
    refs = [fill_side_refs(plane, x0, y0, log2_w, log2_h, avail_fn, bitdepth, unit)
            for (x0, y0) in tbs]
    n = len(tbs)
    # pad the batch dim to a pow2 floor so XLA compiles a bounded set of
    # shapes per (size, filter) class instead of one per group size
    n_pad = max(8, 1 << max(0, n - 1).bit_length())
    refs = refs + [refs[-1]] * (n_pad - n)
    ref_a = [r[0] for r in refs]
    ref_l = [r[1] for r in refs]

    if mode == 0:  # planar
        if luma and (log2_w + log2_h) > 5:
            fa = [filter_ref_array(a, l, w + 4) for a, l in zip(ref_a, ref_l)]
            fl = [filter_ref_array(l, a, h + 4) for a, l in zip(ref_a, ref_l)]
            ref_a, ref_l = fa, fl
        top = np.stack([a.view(1, 1 + w) for a in ref_a])
        left = np.stack([l.view(1, 1 + h) for l in ref_l])
        tr = np.asarray([int(a[w + 1]) for a in ref_a], np.int32)
        bl = np.asarray([int(l[h + 1]) for l in ref_l], np.int32)
        pred = planar_batch(top, left, tr, bl, log2_w, log2_h)
        return np.asarray(pdpc_flat_batch(pred, top, left, log2_w, log2_h, bitdepth))[:n]

    if mode == 1:  # DC
        top = np.stack([a.view(1, 1 + w) for a in ref_a])
        left = np.stack([l.view(1, 1 + h) for l in ref_l])
        pred = dc_batch(top, left, log2_w, log2_h)
        if luma or (log2_w > 1 and log2_h > 1):
            pred = pdpc_flat_batch(pred, top, left, log2_w, log2_h, bitdepth)
        return np.asarray(pred)[:n]

    pred_mode = derive_wide_angular_mode(log2_w, log2_h, mode)
    vertical = pred_mode >= OVINTRA_DIA
    if vertical:
        mode_idx = pred_mode - OVINTRA_VER
        ref_main, ref_side = ref_a, ref_l
        n_lines, line_len = h, w
    else:
        mode_idx = -(pred_mode - OVINTRA_HOR)
        ref_main, ref_side = ref_l, ref_a
        n_lines, line_len = w, h

    pdpc_dim_ok = log2_h > 1 if luma else (log2_h > 1 and log2_w > 1)
    use_gauss = luma and (log2_w + log2_h) > 5 and abs(mode_idx) > INTRA_FILTER_THR[(log2_w + log2_h) >> 1]

    def orient(p):
        return p if vertical else np.transpose(p, (0, 2, 1))

    lo = n_proj_lo = (1 << (log2_h if vertical else log2_w)) + 4
    angles = np.full(n_pad, 0, np.int32)

    if mode_idx == 0:  # pure: copy at angle 0 == row repeat
        main = pack_refs(ref_main, lo, 2 * line_len + 8)
        row = main[:, lo + 1 : lo + 1 + line_len]
        pred = np.repeat(row[:, None, :], n_lines, axis=1).astype(np.int32)
        if pdpc_dim_ok:
            # _pdpc_pure works on the oriented refs directly
            from openvvc_tpu.rcn.ref_intra import _pdpc_pure
            out = np.stack([
                np.asarray(_pdpc_pure(pred[i], ref_a[i], ref_l[i], log2_w, log2_h, vertical, bitdepth))
                for i in range(n)
            ]).astype(np.int32)
            return out
        return orient(pred)[:n]

    if mode_idx == 16:  # exact diagonal
        rm, rs = ref_main, ref_side
        if use_gauss:
            rm = [filter_ref_array(m, s, 2 * line_len) for m, s in zip(ref_main, ref_side)]
            rs = [filter_ref_array(s, m, 2 * n_lines) for m, s in zip(ref_main, ref_side)]
        main = pack_refs(rm, lo, 2 * line_len + 8)
        angles[:] = 32
        pred = np.asarray(angular_core_batch(main, lo, jnp.asarray(angles),
                                             n_lines, line_len, "copy", bitdepth))
        if pdpc_dim_ok or use_gauss:
            scale = min(2, (log2_h if vertical else log2_w) - 2)
            side = pack_refs(rs, lo, 2 * n_lines + 8)
            lim = min(3 << scale, line_len)
            pred = np.asarray(pdpc_angular_batch(jnp.asarray(pred), jnp.asarray(side),
                                                 lo, 512, scale, lim, bitdepth))
        return orient(pred)[:n]

    abs_angle = ANGLE_TABLE[abs(mode_idx)]
    inv_angle = INVERSE_ANGLE_TABLE[abs(mode_idx)]
    req_frac = bool(abs_angle & 0x1F)
    n_proj = 1 << (log2_h if vertical else log2_w)
    pdpc_scale = min(2, (log2_h if vertical else log2_w) - (_floor_log2(3 * inv_angle - 2) - 8))

    if use_gauss and not req_frac:
        fm = [filter_ref_array(m, s, 2 * line_len) for m, s in zip(ref_main, ref_side)]
        if mode_idx < 0:
            fs = [filter_ref_array(s, m, 2 * n_lines) for m, s in zip(ref_main, ref_side)]
            for m, s in zip(fm, fs):
                _project_negative(m, s, n_proj, inv_angle, n_proj)
            main = pack_refs(fm, lo, 2 * line_len + 8)
            angles[:] = -abs_angle
            pred = np.asarray(angular_core_batch(main, lo, jnp.asarray(angles),
                                                 n_lines, line_len, "copy", bitdepth))
            return orient(pred)[:n]
        main = pack_refs(fm, lo, 2 * line_len + 8)
        angles[:] = abs_angle
        pred = np.asarray(angular_core_batch(main, lo, jnp.asarray(angles),
                                             n_lines, line_len, "copy", bitdepth))
        if pdpc_scale >= 0:
            fs = [filter_ref_array(s, m, 2 * n_lines) for m, s in zip(ref_main, ref_side)]
            side = pack_refs(fs, lo, 2 * n_lines + 8)
            lim = min(3 << pdpc_scale, line_len)
            pred = np.asarray(pdpc_angular_batch(jnp.asarray(pred), jnp.asarray(side),
                                                 lo, inv_angle, pdpc_scale, lim, bitdepth))
        return orient(pred)[:n]

    filt = "gauss" if use_gauss else ("cubic" if req_frac else "copy")
    if not luma and req_frac:
        filt = "linear"
    if filt == "linear":
        # chroma 2-tap: fall back to per-TB scalar (rare in the batch path)
        from openvvc_tpu.rcn.ref_intra import predict_intra
        return np.stack([
            np.asarray(predict_intra(plane, x0, y0, log2_w, log2_h, mode, avail_fn, bitdepth, luma))
            for (x0, y0) in tbs
        ]).astype(np.int32)

    if mode_idx < 0:
        for m, s in zip(ref_main, ref_side):
            _project_negative(m, s, n_proj, inv_angle, n_proj)
        main = pack_refs(ref_main, lo, 2 * line_len + 8)
        angles[:] = -abs_angle
        pred = np.asarray(angular_core_batch(main, lo, jnp.asarray(angles),
                                             n_lines, line_len, filt, bitdepth))
        return orient(pred)[:n]

    main = pack_refs(ref_main, lo, 2 * line_len + 8)
    angles[:] = abs_angle
    pred = np.asarray(angular_core_batch(main, lo, jnp.asarray(angles),
                                         n_lines, line_len, filt, bitdepth))
    if pdpc_scale >= 0 and (pdpc_dim_ok if not use_gauss else True):
        side = pack_refs(ref_side, lo, 2 * n_lines + 8)
        lim = min(3 << pdpc_scale, line_len)
        pred = np.asarray(pdpc_angular_batch(jnp.asarray(pred), jnp.asarray(side),
                                             lo, inv_angle, pdpc_scale, lim, bitdepth))
    return orient(pred)[:n]

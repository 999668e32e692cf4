"""Device-side TU residual reconstruction: dequant + inverse LFNST + the
2-stage inverse transform run inside the fused frame program, consuming raw
parsed levels instead of host-computed residual planes.

Host side (`pack_dtu`) buckets the C-emitted DTU records (ov_shared.h DTU_*,
recon.c ir_emit_dtu) by transform-block shape and pads each bucket to a
grow-only pow2 capacity, so the traced signature — and therefore the XLA
compilation — stays stable across frames of a stream.

Device side (`apply_dtu`) runs, per (l2w, l2h) bucket:
  1. dequant (rcn_dequant.c derive_dequant_sdh/dpq parity, exact int32),
  2. inverse LFNST as a batched 16->16 / 16->48 matmul with per-record
     matrix gather (rcn_lfnst.c; python twin rcn/ref_transform.apply_lfnst),
  3. the two einsum stages of the separable inverse transform with
     PER-RECORD matrix selection (DCT2/DST7/DCT8 gathered from a stacked
     constant), mirroring rcn/jax_transform.inverse_transform_batch,
  4. one masked flat scatter per output plane (joint-CbCr derives the
     second chroma component on device: rc2 = csign*v or (csign*v)>>1,
     recon.c ir build / rcn_residual joint pairs).

TBs the C emitter deems ineligible keep the host res-plane path; the
scatter merges on top of those planes, so coverage is per-TB exact.
"""

from __future__ import annotations

import numpy as np

from openvvc_tpu.rcn.data_transform import MATRICES
from openvvc_tpu.rcn.data_lfnst import LFNST
from openvvc_tpu.rcn.ref_transform import _DIAG_4x4
from openvvc_tpu.rcn.ref_transform import _IQ_SCALE

# DTU record fields (ov_shared.h)
D_PLANE, D_X, D_Y, D_L2W, D_L2H, D_QP, D_TRH, D_TRV = range(8)
D_LFK, D_LFM, D_LFT, D_LFNIN, D_JC, D_CSIGN, D_COEF, D_DEPQ = range(8, 16)

_NP_IQ = np.array(_IQ_SCALE, np.int32)


def pack_dtu(dtu_list, coef_list, caps):
    """Bucket per-entry DTU records into per-shape device arrays.

    caps: persistent {(l2w, l2h): capacity} dict (grow-only pow2) owned by
    the Decoder so bucket capacities — and the jit signature — only change
    when a stream actually needs more room.

    Returns (buckets, sig): buckets[(l2w, l2h)] is a dict of numpy arrays
    (lv (N,h,w) int32 + per-record scalars), sig a sorted hashable tuple
    of (l2w, l2h, N) for the Cfg hash."""
    recs = [d for d in dtu_list if d is not None and len(d)]
    if not recs:
        return None, ()
    allr = np.concatenate(recs, axis=0)
    # per-entry coef offsets are local; rebase onto the concatenated flat
    offs = []
    base = 0
    for d, c in zip(dtu_list, coef_list):
        if d is None or not len(d):
            continue
        offs.append(np.full(len(d), base, np.int64))
        base += len(c)
    allc = np.concatenate([c for c in coef_list
                           if c is not None and len(c)])
    allr = allr.copy()
    allr[:, D_COEF] = allr[:, D_COEF].astype(np.int64) + \
        np.concatenate(offs)

    buckets = {}
    keys = allr[:, D_L2W] * 8 + allr[:, D_L2H]
    # one stable sort replaces a full boolean scan per bucket (the pack
    # runs per frame on the host; 20k records x 20 buckets made the
    # per-bucket masks the dominant cost)
    order = np.argsort(keys, kind="stable")
    allr = allr[order]
    keys = keys[order]
    uniq, starts = np.unique(keys, return_index=True)
    bounds = np.append(starts, len(keys))
    for bi, k in enumerate(uniq):
        sel = allr[bounds[bi]:bounds[bi + 1]]
        l2w, l2h = int(k) >> 3, int(k) & 7
        h, w = 1 << l2h, 1 << l2w
        n = len(sel)
        cap = caps.get((l2w, l2h), 0)
        while cap < n:
            cap = max(16, cap * 2)
        caps[(l2w, l2h)] = cap
        lv = np.empty((cap, h, w), np.int32)
        gidx = sel[:, D_COEF][:, None] + \
            np.arange(h * w, dtype=np.int32)[None, :]
        np.take(allc, gidx, out=lv[:n].reshape(n, h * w))
        lv[n:] = 0
        pad = cap - n

        def col(f, fill=0):
            return np.concatenate(
                [sel[:, f], np.full(pad, fill, np.int32)]).astype(np.int32)

        buckets[(l2w, l2h)] = {
            "lv": lv,
            "qp": col(D_QP),
            "trh": col(D_TRH), "trv": col(D_TRV),
            "lfk": col(D_LFK), "lfm": col(D_LFM),
            "lft": col(D_LFT), "lfnin": col(D_LFNIN, 16),
            "plane": col(D_PLANE, -1),
            "x": col(D_X, -1), "y": col(D_Y, -1),
            "jc": col(D_JC), "csign": col(D_CSIGN, 1),
            "depq": col(D_DEPQ),
        }
    # stale buckets from earlier frames keep the signature stable: emit
    # empty padded buckets for every capacity the stream has ever used
    for (l2w, l2h), cap in caps.items():
        if (l2w, l2h) not in buckets:
            h, w = 1 << l2h, 1 << l2w
            buckets[(l2w, l2h)] = {
                "lv": np.zeros((cap, h, w), np.int32),
                "qp": np.zeros(cap, np.int32),
                "trh": np.zeros(cap, np.int32),
                "trv": np.zeros(cap, np.int32),
                "lfk": np.zeros(cap, np.int32),
                "lfm": np.zeros(cap, np.int32),
                "lft": np.zeros(cap, np.int32),
                "lfnin": np.full(cap, 16, np.int32),
                "plane": np.full(cap, -1, np.int32),
                "x": np.full(cap, -1, np.int32),
                "y": np.full(cap, -1, np.int32),
                "jc": np.zeros(cap, np.int32),
                "csign": np.ones(cap, np.int32),
                "depq": np.zeros(cap, np.int32),
            }
    sig = tuple(sorted((k[0], k[1], len(v["qp"]))
                       for k, v in buckets.items()))
    return buckets, sig


def _mat_stack(size):
    """(3, size, size) int32: [DCT2, DST7, DCT8] inverse matrices; sizes
    without DST7/DCT8 (2, 64) repeat DCT2 (the host never selects them)."""
    d2 = np.asarray(MATRICES[("DCT2", size)], np.int32)
    try:
        d7 = np.asarray(MATRICES[("DST7", size)], np.int32)
        d8 = np.asarray(MATRICES[("DCT8", size)], np.int32)
    except KeyError:
        d7 = d8 = d2
    return np.stack([d2, d7, d8])


def _lfnst_stacks():
    """(S4, 16, 16) and (S8, 16, 48) gathered-by-lfm matmul stacks, index
    lfm = mode_set * 2 + (lfnst_idx - 1); flat layout [out + in * stride]
    reshapes row-major to [in, out]."""
    n_sets = max(k[1] for k in LFNST) + 1
    m4 = np.zeros((n_sets * 2, 16, 16), np.int32)
    m8 = np.zeros((n_sets * 2, 16, 48), np.int32)
    for s in range(n_sets):
        for i in range(2):
            m4[s * 2 + i] = np.asarray(
                LFNST[(0, s, i)], np.int32).reshape(16, 16)
            m8[s * 2 + i] = np.asarray(
                LFNST[(1, s, i)], np.int32).reshape(16, 48)
    return m4, m8


def _lfnst_onehots():
    """One-hot placement maps (2, n_out, rh, rw) for transpose 0/1."""
    p4 = np.zeros((2, 16, 4, 4), np.int32)
    for i in range(16):
        p4[0, i, i >> 2, i & 3] = 1
        p4[1, i, i & 3, i >> 2] = 1
    p8 = np.zeros((2, 48, 8, 8), np.int32)
    for i in range(48):
        if i < 32:
            x, y = i & 7, i >> 3
        else:
            x, y = i & 3, 4 + ((i - 32) >> 2)
        p8[0, i, y, x] = 1
        p8[1, i, x, y] = 1
    return p4, p8


_D4X = np.array([x for (x, y) in _DIAG_4x4], np.int32)
_D4Y = np.array([y for (x, y) in _DIAG_4x4], np.int32)


def _bucket_residual(jnp, b, l2w, l2h, bd):
    """(N, h, w) int32 residuals for one bucket (dequant+LFNST+itx)."""
    h, w = 1 << l2h, 1 << l2w
    log2s = l2w + l2h
    lv = b["lv"]
    dep = b["depq"][:, None, None]
    q = b["qp"][:, None, None] + dep
    base = (6 + dep) - (15 - bd) + (log2s >> 1) + (log2s & 1)
    shift = base - q // 6
    scale = jnp.asarray(_NP_IQ)[log2s & 1, (q % 6)]
    pos = jnp.maximum(shift, 0)
    neg = jnp.maximum(-shift, 0)
    add = jnp.where(shift > 0, (jnp.int32(1) << pos) >> 1, 0)
    dq = jnp.where(shift >= 0, (lv * scale + add) >> pos,
                   lv * (scale << neg))
    dq = jnp.clip(dq, -((1 << 15) - 1), (1 << 15) - 1)

    if h >= 4 and w >= 4 and l2w <= 5 and l2h <= 5:
        m4, m8 = _lfnst_stacks()
        p4, p8 = _lfnst_onehots()
        tmp = dq[:, _D4Y, _D4X]  # (N, 16) diag scan of the top-left 4x4
        tmp = jnp.where(jnp.arange(16)[None, :] < b["lfnin"][:, None],
                        tmp, 0)
        lfm = b["lfm"]
        lft = b["lft"]
        o16 = jnp.einsum("nk,nko->no", tmp, jnp.asarray(m4)[lfm],
                         preferred_element_type=jnp.int32)
        o16 = jnp.clip((o16 + 64) >> 7, -(1 << 15), 1 << 15)
        blk4 = jnp.einsum("no,noyx->nyx", o16, jnp.asarray(p4)[lft],
                          preferred_element_type=jnp.int32)
        blk4 = jnp.pad(blk4, ((0, 0), (0, h - 4), (0, w - 4)))
        if h >= 8 and w >= 8:
            o48 = jnp.einsum("nk,nko->no", tmp, jnp.asarray(m8)[lfm],
                             preferred_element_type=jnp.int32)
            o48 = jnp.clip((o48 + 64) >> 7, -(1 << 15), 1 << 15)
            blk8 = jnp.einsum("no,noyx->nyx", o48, jnp.asarray(p8)[lft],
                              preferred_element_type=jnp.int32)
            blk8 = jnp.pad(blk8, ((0, 0), (0, h - 8), (0, w - 8)))
        else:
            blk8 = blk4
        k = b["lfk"][:, None, None]
        dq = jnp.where(k == 1, blk4, jnp.where(k == 2, blk8, dq))

    mv = jnp.asarray(_mat_stack(h))[b["trv"]]  # (N, h, h)
    mh = jnp.asarray(_mat_stack(w))[b["trh"]]  # (N, w, w)
    t = jnp.einsum("nkx,nky->nxy", dq, mv,
                   preferred_element_type=jnp.int32)
    t = jnp.clip((t + 64) >> 7, -(1 << 15), (1 << 15) - 1)
    out = jnp.einsum("nky,nkx->nyx", t, mh,
                     preferred_element_type=jnp.int32)
    sh2 = 20 - bd
    out = jnp.clip((out + (1 << (sh2 - 1))) >> sh2,
                   -(1 << 15), (1 << 15) - 1)
    return out


def apply_dtu(jnp, dtu, res_y, res_cb, res_cr, bd, chroma):
    """Scatter device-reconstructed TB residuals into the res planes."""
    H, W = res_y.shape
    ry = res_y.reshape(-1)
    rcb = res_cb.reshape(-1) if chroma and res_cb is not None else None
    rcr = res_cr.reshape(-1) if chroma and res_cr is not None else None
    Hc = Wc = 0
    if rcb is not None:
        Hc, Wc = res_cb.shape
    for (l2w, l2h) in sorted(dtu.keys()):
        b = dtu[(l2w, l2h)]
        h, w = 1 << l2h, 1 << l2w
        out = _bucket_residual(jnp, b, l2w, l2h, bd)
        vals = out.astype(jnp.int16).reshape(-1)
        x = b["x"][:, None, None]
        y = b["y"][:, None, None]
        jj = jnp.arange(h)[None, :, None]
        ii = jnp.arange(w)[None, None, :]
        plane = b["plane"][:, None, None]

        # invalid updates route to an index PAST the plane (mode="drop");
        # -1 would wrap to the last element under negative indexing
        idx_y = (y + jj) * W + (x + ii)
        idx_y = jnp.where(plane == 0, idx_y, H * W).reshape(-1)
        ry = ry.at[idx_y].set(vals, mode="drop")

        if rcb is not None:
            jc = b["jc"][:, None, None]
            cs = b["csign"][:, None, None]
            rc2 = jnp.where(jc == 3, cs * out, (cs * out) >> 1)
            cbv = jnp.where(plane == 1, out,
                            jnp.where(jc >= 2, out, rc2))
            crv = jnp.where(plane == 2, out,
                            jnp.where(jc >= 2, rc2, out))
            idx_c = (y + jj) * Wc + (x + ii)
            m_cb = (plane == 1) | (plane == 3)
            m_cr = (plane == 2) | (plane == 3)
            rcb = rcb.at[jnp.where(m_cb, idx_c, Hc * Wc).reshape(-1)].set(
                cbv.astype(jnp.int16).reshape(-1), mode="drop")
            rcr = rcr.at[jnp.where(m_cr, idx_c, Hc * Wc).reshape(-1)].set(
                crv.astype(jnp.int16).reshape(-1), mode="drop")
    ry = ry.reshape(H, W)
    if rcb is not None:
        rcb = rcb.reshape(Hc, Wc)
        rcr = rcr.reshape(Hc, Wc)
    return ry, rcb, rcr

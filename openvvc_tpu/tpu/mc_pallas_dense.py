"""Pallas dense inter prediction: per-job DMA windows + fused bi-pred FIR.

The gather formulation (tpu/mc_dense.py) costs ~3 us per gather index on
TPU (measured: 122k 11x11 windows = 370 ms/frame/list); the same work as
per-block Pallas DMA jobs runs ~50x faster (8040 16x16 jobs = 1.16 ms).
So the unit-MV grid is decomposed on the host into square jobs of uniform
(MV, slot, weights) — a quadtree coarsening, biggest blocks first — and
one pallas_call per size class streams each job's reference windows
HBM->VMEM (both lists), runs the separable 8/4-tap FIR, applies the
unified weighted combine (uni == (8,0), bi == (4,4), BCW == (8-w, w); each
reduces to the reference's rounding, rcn_mc.c:448-720, rcn_inter.c), and
writes the clipped block into its cell of a class plane.  Class planes
reassemble into the frame prediction with masked selects.

Parity: bit-exact vs tpu/mc_dense.mc_dense (itself oracle-validated)."""

from __future__ import annotations

import functools

import numpy as np

from openvvc_tpu.rcn.jax_mc import _NP_FILT_C, _NP_FILT_L

# size classes in 4x4-luma units per side: 1 -> 4px luma jobs ... 16 -> 64px
CLASSES = (16, 8, 4, 2, 1)


def _bucket(n, lo=64):
    if n <= lo:
        return lo
    return 1 << (n - 1).bit_length()


# ----------------------------------------------------------------------
# host: quadtree job extraction from the per-unit MC args
# ----------------------------------------------------------------------


def extract_jobs(margs, gmask, uw, uh):
    """Decompose the unit grid into uniform square jobs.

    Returns (jobs, cmap, (uhp, uwp)): jobs[L] holds per-class numpy job
    fields; cmap is the per-unit class map over the G-padded grid (-1
    where the unit is not inter-coded)."""
    G = max(CLASSES)
    uhp, uwp = -(-uh // G) * G, -(-uw // G) * G
    key_fields = ("sl0", "yb0", "xb0", "fx0", "fy0", "sl1", "yb1", "xb1",
                  "fx1", "fy1", "cyb0", "cxb0", "cfx0", "cfy0",
                  "cyb1", "cxb1", "cfx1", "cfy1", "w0", "w1")
    K = len(key_fields)
    # window origins are per-unit absolute; uniformity must compare the
    # MV-relative origin (origin - unit position), else no block ever
    # coarsens.  Relative keys are converted back at job emit time.
    N = uh * uw
    uy, ux = np.divmod(np.arange(N, dtype=np.int32), uw)
    rel = dict(margs)
    for f in ("yb0", "yb1"):
        rel[f] = margs[f].reshape(N).astype(np.int32) - 4 * uy
    for f in ("xb0", "xb1"):
        rel[f] = margs[f].reshape(N).astype(np.int32) - 4 * ux
    for f in ("cyb0", "cyb1"):
        rel[f] = margs[f].reshape(N).astype(np.int32) - 2 * uy
    for f in ("cxb0", "cxb1"):
        rel[f] = margs[f].reshape(N).astype(np.int32) - 2 * ux
    key = np.zeros((uhp, uwp, K), np.int32)
    for k, f in enumerate(key_fields):
        key[:uh, :uw, k] = np.asarray(rel[f]).reshape(uh, uw)
    valid = np.zeros((uhp, uwp), bool)
    valid[:uh, :uw] = gmask.reshape(uh, uw) != 0

    uniform = {1: valid}
    rep = {1: key}
    for L in (2, 4, 8, 16):
        h2, w2 = uhp // L, uwp // L
        pv = uniform[L // 2].reshape(h2, 2, w2, 2)
        ok = pv.all(axis=(1, 3))
        pk = rep[L // 2].reshape(h2, 2, w2, 2, K)
        same = (pk == pk[:, :1, :, :1]).all(axis=(1, 3)).all(axis=-1)
        uniform[L] = ok & same
        rep[L] = pk[:, 0, :, 0]

    cmap = np.full((uhp, uwp), -1, np.int32)
    jobs = {}
    taken = np.zeros((uhp, uwp), bool)
    for L in CLASSES:
        sel = uniform[L] & ~taken[::L, ::L]
        by, bx = np.nonzero(sel)
        if len(by):
            r = rep[L][by, bx]
            d = {f: r[:, k].copy() for k, f in enumerate(key_fields)}
            # relative origin -> absolute window origin of the block
            d["yb0"] += 4 * L * by.astype(np.int32)
            d["yb1"] += 4 * L * by.astype(np.int32)
            d["xb0"] += 4 * L * bx.astype(np.int32)
            d["xb1"] += 4 * L * bx.astype(np.int32)
            d["cyb0"] += 2 * L * by.astype(np.int32)
            d["cyb1"] += 2 * L * by.astype(np.int32)
            d["cxb0"] += 2 * L * bx.astype(np.int32)
            d["cxb1"] += 2 * L * bx.astype(np.int32)
            d["cy"] = by.astype(np.int32)
            d["cx"] = bx.astype(np.int32)
            jobs[L] = d
        up = np.repeat(np.repeat(sel, L, axis=0), L, axis=1)
        taken |= up
        cmap[up] = L
    return jobs, cmap, (uhp, uwp)


def _pad_jobs(d, n_to):
    """Pow2-pad a job dict.  Padded lanes come FIRST (write cell (0,0)
    with zero weights; a real job there rewrites it later)."""
    n = len(d["cy"])
    if n == n_to:
        return d
    return {k: np.concatenate([np.zeros(n_to - n, v.dtype), v])
            for k, v in d.items()}


def build_mc_bundle(margs, gmask, uw, uh):
    """Host packing: per-class job arrays (pow2-bucketed counts) plus the
    class map.  Returns (arrays_dict, dims) — dims is static."""
    jobs, cmap, dims = extract_jobs(margs, gmask, uw, uh)
    out = {"cmap": cmap.astype(np.int8)}
    for L, d in jobs.items():
        d = _pad_jobs(d, _bucket(len(d["cy"])))
        out[f"j{L}l"] = {
            "cy": d["cy"], "cx": d["cx"],
            "sl": d["sl0"].astype(np.int32), "yb": d["yb0"].astype(np.int32),
            "xb": d["xb0"].astype(np.int32),
            "sl1": d["sl1"].astype(np.int32),
            "yb1": d["yb1"].astype(np.int32),
            "xb1": d["xb1"].astype(np.int32),
            "w0s": d["w0"].astype(np.int32),
            "w1s": d["w1"].astype(np.int32),
            "taps": np.stack([
                np.stack([_NP_FILT_L[d["fx0"]], _NP_FILT_L[d["fy0"]]], 1),
                np.stack([_NP_FILT_L[d["fx1"]], _NP_FILT_L[d["fy1"]]], 1),
            ], 1).astype(np.int32),  # int32: Mosaic only permits 32-bit
            # scalar extraction inside the kernel (fh[k]/fv[k])
        }
        out[f"j{L}c"] = {
            "cy": d["cy"], "cx": d["cx"],
            "sl": d["sl0"].astype(np.int32),
            "yb": d["cyb0"].astype(np.int32),
            "xb": d["cxb0"].astype(np.int32),
            "sl1": d["sl1"].astype(np.int32),
            "yb1": d["cyb1"].astype(np.int32),
            "xb1": d["cxb1"].astype(np.int32),
            "w0s": d["w0"].astype(np.int32),
            "w1s": d["w1"].astype(np.int32),
            "taps": np.stack([
                np.stack([_NP_FILT_C[d["cfx0"]], _NP_FILT_C[d["cfy0"]]], 1),
                np.stack([_NP_FILT_C[d["cfx1"]], _NP_FILT_C[d["cfy1"]]], 1),
            ], 1).astype(np.int32),
        }
    return out, dims


# ----------------------------------------------------------------------
# device: the per-class kernel
# ----------------------------------------------------------------------


def _mc_job_kernel(s, taps, bd, rows, cols,
                   cy_ref, cx_ref, sl0_ref, yb0_ref, xb0_ref,
                   sl1_ref, yb1_ref, xb1_ref, w0s_ref, w1s_ref,
                   taps_ref, stack_ref, out_ref,
                   win0, win1, sem0, sem1):
    import jax.numpy as jnp
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    i = pl.program_id(0)
    ext = s + taps - 1
    sh1 = bd - 8

    y0 = yb0_ref[i]
    x0 = xb0_ref[i]
    ya0 = (y0 // 16) * 16
    xa0 = (x0 // 128) * 128
    dma0 = pltpu.make_async_copy(
        stack_ref.at[sl0_ref[i], pl.ds(ya0, rows), pl.ds(xa0, cols)],
        win0, sem0)
    dma0.start()
    bi = w1s_ref[i] != 0
    y1 = yb1_ref[i]
    x1 = xb1_ref[i]
    ya1 = (y1 // 16) * 16
    xa1 = (x1 // 128) * 128

    @pl.when(bi)
    def _():
        pltpu.make_async_copy(
            stack_ref.at[sl1_ref[i], pl.ds(ya1, rows), pl.ds(xa1, cols)],
            win1, sem1).start()

    def fir(win, yo, xo, fh, fv):
        w = pltpu.roll(win[:].astype(jnp.int32), -yo, axis=0)
        w = pltpu.roll(w, -xo, axis=1)
        p = w[:ext, :ext]
        tmp = p[:, 0:s] * fh[0]
        for k in range(1, taps):
            tmp = tmp + p[:, k:k + s] * fh[k]
        tmp = (tmp >> sh1).astype(jnp.int16).astype(jnp.int32)
        acc = tmp[0:s, :] * fv[0]
        for k in range(1, taps):
            acc = acc + tmp[k:k + s, :] * fv[k]
        return acc >> 6

    dma0.wait()
    p0 = fir(win0, y0 - ya0, x0 - xa0, taps_ref[0, 0, 0], taps_ref[0, 0, 1])

    @pl.when(bi)
    def _():
        pltpu.make_async_copy(
            stack_ref.at[sl1_ref[i], pl.ds(ya1, rows), pl.ds(xa1, cols)],
            win1, sem1).wait()

    p1 = jnp.where(bi, fir(win1, y1 - ya1, x1 - xa1,
                           taps_ref[0, 1, 0], taps_ref[0, 1, 1]), 0)

    w0 = w0s_ref[i]
    w1 = w1s_ref[i]
    shift = 17 - bd
    off = 1 << (shift - 1)
    v = (p0 * w0 + p1 * w1 + off) >> shift
    out_ref[0, 0] = jnp.clip(v, 0, (1 << bd) - 1).astype(jnp.int16)


def mc_class_call(stack, d, s_px, taps, bd, n_cy, n_cx):
    """One class: jobs d (device arrays, pow2 count N) -> class plane
    (n_cy, n_cx, s_px, s_px) int16."""
    import jax
    import jax.numpy as jnp
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    ext = s_px + taps - 1
    rows = 32
    while rows < ext + 16:
        rows *= 2
    cols = 256
    n = d["cy"].shape[0]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=10,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, 2, 2, taps), lambda i, *s: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),  # stack stays in HBM
        ],
        out_specs=pl.BlockSpec(
            (1, 1, s_px, s_px),
            lambda i, cy, cx, *s: (cy[i], cx[i], 0, 0),
            memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((rows, cols), stack.dtype),
            pltpu.VMEM((rows, cols), stack.dtype),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    kern = functools.partial(_mc_job_kernel, s_px, taps, bd, rows, cols)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((n_cy, n_cx, s_px, s_px), jnp.int16),
        grid_spec=grid_spec,
    )(d["cy"], d["cx"], d["sl"], d["yb"], d["xb"],
      d["sl1"], d["yb1"], d["xb1"], d["w0s"], d["w1s"],
      d["taps"], stack)


def mc_pallas(jnp, stack_y, stack_cb, stack_cr, bundle, dims, bd, uw, uh,
              chroma=True):
    """Device assembly: run the class kernels present in `bundle` and
    merge into full prediction planes (drop-in for mc_dense: int32
    clipped planes, valid where the unit is inter)."""
    uhp, uwp = dims
    cmap = bundle["cmap"]
    H4, W4 = uh * 4, uw * 4
    pred_y = jnp.zeros((H4, W4), jnp.int32)
    pred_cb = jnp.zeros((uh * 2, uw * 2), jnp.int32) if chroma else None
    pred_cr = jnp.zeros((uh * 2, uw * 2), jnp.int32) if chroma else None

    for L in CLASSES:
        dl = bundle.get(f"j{L}l")
        if dl is None:
            continue
        s_px = 4 * L
        n_cy, n_cx = uhp // L, uwp // L
        py = mc_class_call(stack_y, dl, s_px, 8, bd, n_cy, n_cx)
        py = py.transpose(0, 2, 1, 3).reshape(n_cy * s_px, n_cx * s_px)
        m = cmap == L
        m4 = jnp.repeat(jnp.repeat(m, 4, axis=0), 4, axis=1)[:H4, :W4]
        pred_y = jnp.where(m4, py[:H4, :W4].astype(jnp.int32), pred_y)
        if chroma:
            dc = bundle[f"j{L}c"]
            sc = s_px // 2
            pcb = mc_class_call(stack_cb, dc, sc, 4, bd, n_cy, n_cx)
            pcr = mc_class_call(stack_cr, dc, sc, 4, bd, n_cy, n_cx)
            pcb = pcb.transpose(0, 2, 1, 3).reshape(n_cy * sc, n_cx * sc)
            pcr = pcr.transpose(0, 2, 1, 3).reshape(n_cy * sc, n_cx * sc)
            m2 = jnp.repeat(jnp.repeat(m, 2, axis=0), 2,
                            axis=1)[:uh * 2, :uw * 2]
            pred_cb = jnp.where(m2, pcb[:uh * 2, :uw * 2].astype(jnp.int32),
                                pred_cb)
            pred_cr = jnp.where(m2, pcr[:uh * 2, :uw * 2].astype(jnp.int32),
                                pred_cr)
    return pred_y, pred_cb, pred_cr

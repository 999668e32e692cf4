"""Pallas dense inter prediction: per-job DMA windows + fused bi-pred FIR.

The gather formulation (tpu/mc_dense.py) costs ~3 us per gather index on
TPU (measured: 122k 11x11 windows = 370 ms/frame/list); the same work as
per-block Pallas DMA jobs runs far faster.  The unit-MV grid is decomposed
on the host into square jobs of uniform (MV, slot, weights) — a quadtree
coarsening, biggest blocks first (host side in C, native/mcpack.c) — and
one pallas_call per size class streams each job's reference windows
HBM->VMEM (both lists), runs the separable 8/4-tap FIR, applies the
unified weighted combine (uni == (8,0), bi == (4,4), BCW == (8-w, w); each
reduces to the reference's rounding, rcn_mc.c:448-720, rcn_inter.c), and
writes the clipped block into its cell of a class plane.  Class planes
reassemble into the frame prediction with masked selects.

Kernel schedule: windows are fetched straight from the job's (y, x)
origin (the device DPB stacks carry >=(128, 256) far-side slack so the
rows x 128 window never leaves the array) and the fetch for job i+1 is
issued before computing job i — a two-slot double buffer that hides the
HBM->VMEM latency behind the FIR math.  Chroma runs cb and cr in ONE
kernel per class (shared job scalars, two window sets, two outputs).

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


def _job_dicts(j, out, L):
    """Split padded (n, 22) job rows into the luma/chroma device dicts
    (row layout: cy cx sl0 yb0 xb0 sl1 yb1 xb1 w0 w1 fx0 fy0 fx1 fy1
    cyb0 cxb0 cfx0 cfy0 cyb1 cxb1 cfx1 cfy1)."""
    out[f"j{L}l"] = {
        "cy": j[:, 0].copy(), "cx": j[:, 1].copy(),
        "sl": j[:, 2].copy(), "yb": j[:, 3].copy(),
        "xb": j[:, 4].copy(), "sl1": j[:, 5].copy(),
        "yb1": j[:, 6].copy(), "xb1": j[:, 7].copy(),
        "w0s": j[:, 8].copy(), "w1s": j[:, 9].copy(),
        "taps": np.stack([
            np.stack([_NP_FILT_L[j[:, 10]], _NP_FILT_L[j[:, 11]]], 1),
            np.stack([_NP_FILT_L[j[:, 12]], _NP_FILT_L[j[:, 13]]], 1),
        ], 1).astype(np.int32),  # int32: Mosaic only permits 32-bit
        # scalar extraction inside the kernel (fh[k]/fv[k])
    }
    out[f"j{L}c"] = {
        "cy": j[:, 0].copy(), "cx": j[:, 1].copy(),
        "sl": j[:, 2].copy(), "yb": j[:, 14].copy(),
        "xb": j[:, 15].copy(), "sl1": j[:, 5].copy(),
        "yb1": j[:, 18].copy(), "xb1": j[:, 19].copy(),
        "w0s": j[:, 8].copy(), "w1s": j[:, 9].copy(),
        "taps": np.stack([
            np.stack([_NP_FILT_C[j[:, 16]], _NP_FILT_C[j[:, 17]]], 1),
            np.stack([_NP_FILT_C[j[:, 20]], _NP_FILT_C[j[:, 21]]], 1),
        ], 1).astype(np.int32),
    }


def build_mc_bundle_native(ir, lut0, lut1):
    """C-path bundle build: ov_mc_jobs (native/mcpack.c) emits the same
    per-class job rows as extract_jobs; only the FIR tap materialization
    stays numpy (tiny: one gather per emitted job).  Returns (arrays,
    dims) like build_mc_bundle, or None when the native lib is missing."""
    from openvvc_tpu.native import mc_jobs_native
    from openvvc_tpu.tpu.mc_dense import PAD_C, PAD_L

    G = max(CLASSES)
    uh, uw = ir.uh, ir.uw
    uhp, uwp = -(-uh // G) * G, -(-uw // G) * G
    r = mc_jobs_native(ir, lut0, lut1, uhp, uwp, PAD_L, PAD_C)
    if r is None:
        return None
    jobs, cmap = r
    out = {"cmap": cmap}
    for L, j in jobs.items():
        n = len(j)
        cap = _bucket(n)
        if cap != n:
            j = np.concatenate([np.zeros((cap - n, j.shape[1]), j.dtype), j])
        _job_dicts(j, out, L)
    return out, (uhp, uwp)


def build_mc_bundle(margs, gmask, uw, uh):
    """Host packing: per-class job arrays (pow2-bucketed counts) plus the
    class map.  Returns (arrays_dict, dims) — dims is static."""
    jobs, cmap, dims = extract_jobs(margs, gmask, uw, uh)
    out = {"cmap": cmap.astype(np.int8)}
    key_order = ("cy", "cx", "sl0", "yb0", "xb0", "sl1", "yb1", "xb1",
                 "w0", "w1", "fx0", "fy0", "fx1", "fy1",
                 "cyb0", "cxb0", "cfx0", "cfy0", "cyb1", "cxb1",
                 "cfx1", "cfy1")
    for L, d in jobs.items():
        d = _pad_jobs(d, _bucket(len(d["cy"])))
        j = np.stack([d[f].astype(np.int32) for f in key_order], axis=1)
        _job_dicts(j, out, L)
    return out, dims


# ----------------------------------------------------------------------
# device: the per-class kernels
# ----------------------------------------------------------------------


def _round16(v):
    return -(-v // 16) * 16


def _win_dims(ext):
    """Aligned window geometry: DMA origins must be (16, 128)-aligned
    (unaligned dynamic DMA offsets crash the Mosaic compiler on this
    target), so the window carries up to 15 rows / 127 cols of slack that
    the in-kernel roll removes.  Rows must be a power of two: dynamic
    pltpu.roll over a non-pow2 sublane extent miscompiles silently
    (measured: (48, 256) windows roll wrong, (32,)/(64,) roll right)."""
    rows = 16
    while rows < ext + 15:
        rows *= 2
    return rows, 128 * (-(-(ext + 127) // 128))


def _fir(jnp, pltpu, win, yo, xo, s, taps, bd, fh, fv):
    """Separable 14-bit FIR on a VMEM window ref; (yo, xo) is the
    sub-alignment offset of the patch inside the window."""
    ext = s + taps - 1
    sh1 = bd - 8
    w = pltpu.roll(win[...].astype(jnp.int32), -yo, axis=0)
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


def _mc_job_kernel(s, taps, bd, rows, cols, n,
                   cy_ref, cx_ref, sl0_ref, yb0_ref, xb0_ref,
                   sl1_ref, yb1_ref, xb1_ref, w0s_ref, w1s_ref,
                   taps_ref, stack_ref, carry_ref, out_ref,
                   win0, win1, sem0, sem1):
    import jax
    import jax.numpy as jnp
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    i = pl.program_id(0)

    def dma0(j, slot):
        return pltpu.make_async_copy(
            stack_ref.at[sl0_ref[j], pl.ds((yb0_ref[j] // 16) * 16, rows),
                         pl.ds((xb0_ref[j] // 128) * 128, cols)],
            win0.at[slot], sem0.at[slot])

    def dma1(j, slot):
        return pltpu.make_async_copy(
            stack_ref.at[sl1_ref[j], pl.ds((yb1_ref[j] // 16) * 16, rows),
                         pl.ds((xb1_ref[j] // 128) * 128, cols)],
            win1.at[slot], sem1.at[slot])

    def issue(j, slot):
        dma0(j, slot).start()

        @pl.when(w1s_ref[j] != 0)
        def _():
            dma1(j, slot).start()

    cur = jax.lax.rem(i, 2)
    nxt = jax.lax.rem(i + 1, 2)

    @pl.when(i == 0)
    def _():
        issue(0, 0)

    @pl.when(i + 1 < n)
    def _():
        issue(i + 1, nxt)

    bi = w1s_ref[i] != 0
    dma0(i, cur).wait()
    p0 = _fir(jnp, pltpu, win0.at[cur], jax.lax.rem(yb0_ref[i], 16),
              jax.lax.rem(xb0_ref[i], 128), s, taps, bd,
              taps_ref[0, 0, 0], taps_ref[0, 0, 1])

    @pl.when(bi)
    def _():
        dma1(i, cur).wait()

    p1 = jnp.where(bi, _fir(jnp, pltpu, win1.at[cur],
                            jax.lax.rem(yb1_ref[i], 16),
                            jax.lax.rem(xb1_ref[i], 128), s, taps, bd,
                            taps_ref[0, 1, 0], taps_ref[0, 1, 1]), 0)

    w0 = w0s_ref[i]
    w1 = w1s_ref[i]
    shift = 17 - bd
    off = 1 << (shift - 1)
    v = (p0 * w0 + p1 * w1 + off) >> shift
    out_ref[0, 0] = jnp.clip(v, 0, (1 << bd) - 1).astype(jnp.int16)


# jobs per pallas_call: the 10 scalar-prefetch arrays live in SMEM (1 MB);
# 8192 jobs x 10 x 4B = 320 KB.  Larger classes run as chained chunks with
# the class plane threaded through input_output_aliases.
CHUNK = 8192

_SCALARS = ("cy", "cx", "sl", "yb", "xb", "sl1", "yb1", "xb1", "w0s", "w1s")


def _chunks(d, n):
    for c0 in range(0, n, CHUNK):
        yield {k: v[c0:c0 + CHUNK] for k, v in d.items()}


def mc_class_call(stack, d, s_px, taps, bd, n_cy, n_cx):
    """One luma class: jobs d (device arrays, pow2 count N) -> class plane
    (n_cy, n_cx, s_px, s_px) int16."""
    import jax
    import jax.numpy as jnp
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    ext = s_px + taps - 1
    rows, cols = _win_dims(ext)
    n = d["cy"].shape[0]

    def one(dc, carry):
        nc = dc["cy"].shape[0]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=10,
            grid=(nc,),
            in_specs=[
                pl.BlockSpec((1, 2, 2, taps), lambda i, *s: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),  # stack stays in HBM
                pl.BlockSpec(memory_space=pl.ANY),  # carried class plane
            ],
            out_specs=pl.BlockSpec(
                (1, 1, s_px, s_px),
                lambda i, cy, cx, *s: (cy[i], cx[i], 0, 0),
                memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, rows, cols), stack.dtype),
                pltpu.VMEM((2, rows, cols), stack.dtype),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )
        kern = functools.partial(_mc_job_kernel, s_px, taps, bd, rows,
                                 cols, nc)
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((n_cy, n_cx, s_px, s_px),
                                           jnp.int16),
            grid_spec=grid_spec,
            input_output_aliases={12: 0},
        )(*(dc[k] for k in _SCALARS), dc["taps"], stack, carry)

    carry = jnp.zeros((n_cy, n_cx, s_px, s_px), jnp.int16)
    for dc in _chunks(d, n):
        carry = one(dc, carry)
    return carry


def _mc_job_kernel_c(s, taps, bd, rows, cols, n,
                     cy_ref, cx_ref, sl0_ref, yb0_ref, xb0_ref,
                     sl1_ref, yb1_ref, xb1_ref, w0s_ref, w1s_ref,
                     taps_ref, stack_cb_ref, stack_cr_ref,
                     carryb_ref, carryr_ref,
                     outb_ref, outr_ref,
                     winb0, winb1, winr0, winr1, semb0, semb1,
                     semr0, semr1):
    import jax
    import jax.numpy as jnp
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    i = pl.program_id(0)

    def dmas(j, slot):
        def one(stack_ref, win, sem, sl, yb, xb):
            return pltpu.make_async_copy(
                stack_ref.at[sl[j], pl.ds((yb[j] // 16) * 16, rows),
                             pl.ds((xb[j] // 128) * 128, cols)],
                win.at[slot], sem.at[slot])
        return (one(stack_cb_ref, winb0, semb0, sl0_ref, yb0_ref, xb0_ref),
                one(stack_cr_ref, winr0, semr0, sl0_ref, yb0_ref, xb0_ref),
                one(stack_cb_ref, winb1, semb1, sl1_ref, yb1_ref, xb1_ref),
                one(stack_cr_ref, winr1, semr1, sl1_ref, yb1_ref, xb1_ref))

    def issue(j, slot):
        d = dmas(j, slot)
        d[0].start()
        d[1].start()

        @pl.when(w1s_ref[j] != 0)
        def _():
            d[2].start()
            d[3].start()

    cur = jax.lax.rem(i, 2)
    nxt = jax.lax.rem(i + 1, 2)

    @pl.when(i == 0)
    def _():
        issue(0, 0)

    @pl.when(i + 1 < n)
    def _():
        issue(i + 1, nxt)

    bi = w1s_ref[i] != 0
    d = dmas(i, cur)
    d[0].wait()
    d[1].wait()

    @pl.when(bi)
    def _():
        d[2].wait()
        d[3].wait()

    yo0 = jax.lax.rem(yb0_ref[i], 16)
    xo0 = jax.lax.rem(xb0_ref[i], 128)
    yo1 = jax.lax.rem(yb1_ref[i], 16)
    xo1 = jax.lax.rem(xb1_ref[i], 128)
    w0 = w0s_ref[i]
    w1 = w1s_ref[i]
    shift = 17 - bd
    off = 1 << (shift - 1)
    bd_max = (1 << bd) - 1
    for win0, win1, out_ref in ((winb0, winb1, outb_ref),
                                (winr0, winr1, outr_ref)):
        p0 = _fir(jnp, pltpu, win0.at[cur], yo0, xo0, s, taps, bd,
                  taps_ref[0, 0, 0], taps_ref[0, 0, 1])
        p1 = jnp.where(bi, _fir(jnp, pltpu, win1.at[cur], yo1, xo1, s,
                                taps, bd,
                                taps_ref[0, 1, 0], taps_ref[0, 1, 1]), 0)
        v = (p0 * w0 + p1 * w1 + off) >> shift
        out_ref[0, 0] = jnp.clip(v, 0, bd_max).astype(jnp.int16)


def mc_class_call_chroma(stack_cb, stack_cr, d, s_px, taps, bd, n_cy, n_cx):
    """One chroma class, cb and cr fused: -> two class planes
    (n_cy, n_cx, s_px, s_px) int16."""
    import jax
    import jax.numpy as jnp
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    ext = s_px + taps - 1
    rows, cols = _win_dims(ext)
    n = d["cy"].shape[0]

    def one(dc, carry_b, carry_r):
        nc = dc["cy"].shape[0]
        out_spec = pl.BlockSpec((1, 1, s_px, s_px),
                                lambda i, cy, cx, *s: (cy[i], cx[i], 0, 0),
                                memory_space=pltpu.VMEM)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=10,
            grid=(nc,),
            in_specs=[
                pl.BlockSpec((1, 2, 2, taps), lambda i, *s: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=[out_spec, out_spec],
            scratch_shapes=(
                [pltpu.VMEM((2, rows, cols), stack_cb.dtype)
                 for _ in range(4)]
                + [pltpu.SemaphoreType.DMA((2,)) for _ in range(4)]),
        )
        kern = functools.partial(_mc_job_kernel_c, s_px, taps, bd, rows,
                                 cols, nc)
        shp = jax.ShapeDtypeStruct((n_cy, n_cx, s_px, s_px), jnp.int16)
        return pl.pallas_call(
            kern,
            out_shape=[shp, shp],
            grid_spec=grid_spec,
            input_output_aliases={13: 0, 14: 1},
        )(*(dc[k] for k in _SCALARS), dc["taps"], stack_cb, stack_cr,
          carry_b, carry_r)

    carry_b = jnp.zeros((n_cy, n_cx, s_px, s_px), jnp.int16)
    carry_r = jnp.zeros((n_cy, n_cx, s_px, s_px), jnp.int16)
    for dc in _chunks(d, n):
        carry_b, carry_r = one(dc, carry_b, carry_r)
    return carry_b, carry_r


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
            pcb, pcr = mc_class_call_chroma(stack_cb, stack_cr, dc, sc, 4,
                                            bd, n_cy, n_cx)
            pcb = pcb.transpose(0, 2, 1, 3).reshape(n_cy * sc, n_cx * sc)
            pcr = pcr.transpose(0, 2, 1, 3).reshape(n_cy * sc, n_cx * sc)
            m2 = jnp.repeat(jnp.repeat(m, 2, axis=0), 2,
                            axis=1)[:uh * 2, :uw * 2]
            pred_cb = jnp.where(m2, pcb[:uh * 2, :uw * 2].astype(jnp.int32),
                                pred_cb)
            pred_cr = jnp.where(m2, pcr[:uh * 2, :uw * 2].astype(jnp.int32),
                                pred_cr)
    return pred_y, pred_cb, pred_cr

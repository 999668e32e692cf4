"""Pallas TPU kernel: motion-compensation separable FIR with per-block DMA.

The MC inner loop is the reference's single biggest SIMD investment
(/root/reference/libovvc/x86/rcn_mc_sse.c, ~9.2k LoC). The XLA formulation
(rcn/jax_mc.py) expresses the per-block patch fetch as one giant gather,
which materializes every (h+7, w+7) patch in HBM before filtering. This
kernel instead streams each block's patch HBM -> VMEM with a dynamic
async copy (scalar-prefetched coordinates) and fuses both FIR passes in
VMEM.

MEASURED RESULT (v5e, 1080p frame of blocks): the XLA gather formulation
reaches 22-61 Gsamples/s while this kernel reaches 1-3 Gsamples/s — the
one-block-per-grid-step DMA is latency-bound and the tile-aligned window
amplifies HBM reads ~15x at 16x16. XLA's parallel gather is the right
formulation at MC granularity; this kernel is kept as the (bit-exact,
tested) Pallas foundation and is enabled in the pipeline only via
OPENVVC_PALLAS_MC=1. bench.py reports both throughputs.

Bit-exact with ref_mc.interp_14bit: h pass >> (bd-8), int16 wrap, v pass
>> 6 (tests/test_pallas_mc.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

TAPS = 8


def _mc_kernel(w, h, sh1, rows, xs_ref, ys_ref, filt_ref, plane_ref, out_ref,
               patch, sem):
    """One grid step = one block: aligned DMA of the surrounding window,
    in-register dynamic slice to the (h+7, w+7) patch, 2-pass FIR."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    i = pl.program_id(0)
    x0 = xs_ref[i]
    y0 = ys_ref[i]
    # HBM DMA slices must be tile-aligned: fetch the aligned 256-lane,
    # 8-sublane-aligned window containing the patch
    xb = (x0 // 128) * 128
    yb = (y0 // 8) * 8
    dma = pltpu.make_async_copy(
        plane_ref.at[pl.ds(yb, rows), pl.ds(xb, 256)],
        patch,
        sem,
    )
    dma.start()
    dma.wait()

    win = patch[:].astype(jnp.int32)
    # dynamic_slice is unsupported in Mosaic; circular rolls + static slice
    win = pltpu.roll(win, -(y0 - yb), axis=0)
    win = pltpu.roll(win, -(x0 - xb), axis=1)
    p = win[: h + TAPS - 1, : w + TAPS - 1]
    fh = filt_ref[0, 0]  # [TAPS]
    fv = filt_ref[0, 1]
    tmp = p[:, 0:w] * fh[0]
    for k in range(1, TAPS):
        tmp = tmp + p[:, k : k + w] * fh[k]
    tmp = (tmp >> sh1).astype(jnp.int16).astype(jnp.int32)
    acc = tmp[0:h, :] * fv[0]
    for k in range(1, TAPS):
        acc = acc + tmp[k : k + h, :] * fv[k]
    out_ref[0] = acc >> 6


@functools.partial(jax.jit, static_argnames=("w", "h", "bitdepth"))
def _mc_pallas(plane_padded, xs, ys, filters, w, h, bitdepth):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = xs.shape[0]
    # roll along sublanes appears exact only for power-of-two extents;
    # use the next pow2 window covering y_off (<8) + h + 7 rows
    rows = 32
    while rows < h + TAPS - 1 + 8:
        rows *= 2
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # xs, ys
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, 2, TAPS), lambda i, xs, ys: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # plane stays in HBM
        ],
        out_specs=pl.BlockSpec((1, h, w), lambda i, xs, ys: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((rows, 256), plane_padded.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    kern = functools.partial(_mc_kernel, w, h, bitdepth - 8, rows)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((n, h, w), jnp.int32),
        grid_spec=grid_spec,
    )(xs, ys, filters, plane_padded)


class McPallas:
    """Per-frame wrapper: pads the reference plane once (replicated border,
    which reproduces the scalar path's per-sample edge clamp exactly) and
    runs the kernel per (w, h) class."""

    def __init__(self, plane: np.ndarray, pad: int = 80):
        self.pad = pad
        self.h, self.w = plane.shape
        p = np.pad(plane, pad, mode="edge").astype(np.int32)
        # extra zero margin so the aligned DMA windows stay in bounds
        hp = (-(p.shape[0] + 64) % 8) + p.shape[0] + 64
        wp = (-(p.shape[1] + 256) % 128) + p.shape[1] + 256
        self.dev = jnp.asarray(np.pad(
            p, ((0, hp - p.shape[0]), (0, wp - p.shape[1])), mode="edge"))

    def interp_14bit(self, xs, ys, fh_rows, fv_rows, w, h, bitdepth):
        """xs/ys: integer block origins (pre-clip MC coords, may be
        slightly out of picture); fh_rows/fv_rows: [N, 8] filter taps."""
        before = TAPS // 2 - 1
        xs_adj = np.asarray(xs, np.int32) - before + self.pad
        ys_adj = np.asarray(ys, np.int32) - before + self.pad
        # clamp the whole patch window into the padded plane: identical to
        # per-sample clamping because the pad is replicated
        xs_adj = np.clip(xs_adj, 0, self.w + 2 * self.pad - (w + TAPS - 1))
        ys_adj = np.clip(ys_adj, 0, self.h + 2 * self.pad - (h + TAPS - 1))
        filters = np.stack([np.asarray(fh_rows, np.int32),
                            np.asarray(fv_rows, np.int32)], axis=1)  # [N,2,8]
        return _mc_pallas(self.dev, jnp.asarray(xs_adj), jnp.asarray(ys_adj),
                          jnp.asarray(filters), w, h, bitdepth)

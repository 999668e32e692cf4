"""Batched JAX MC kernels == numpy reference (which is oracle-validated)."""

import numpy as np
import pytest

from openvvc_tpu.rcn import jax_mc, ref_mc


def _mk(bd, seed=0, H=96, W=120):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 1 << bd, (H, W)).astype(np.int32)


def _rand_blocks(rng, n, H, W, w, h, fmax):
    # positions straddle all edges to exercise the clamp
    xs = rng.randint(-12, W + 4, n).astype(np.int32)
    ys = rng.randint(-12, H + 4, n).astype(np.int32)
    fxs = rng.randint(0, fmax, n).astype(np.int32)
    fys = rng.randint(0, fmax, n).astype(np.int32)
    return xs, ys, fxs, fys


@pytest.mark.parametrize("bd,w,h,luma", [(8, 16, 8, True), (10, 16, 8, True),
                                         (10, 4, 4, True), (10, 8, 4, False)])
def test_interp_uni(bd, w, h, luma):
    plane = _mk(bd, seed=w * h + bd)
    rng = np.random.RandomState(1)
    H, W = plane.shape
    xs, ys, fxs, fys = _rand_blocks(rng, 24, H, W, w, h, 16 if luma else 32)
    import jax.numpy as jnp
    p14 = np.asarray(jax_mc.interp_14bit_batch(
        jnp.asarray(plane), jnp.asarray(xs), jnp.asarray(ys),
        jnp.asarray(fxs), jnp.asarray(fys), w, h, bd, luma=luma))
    uni = np.asarray(jax_mc.mc_uni_batch(
        jnp.asarray(plane), jnp.asarray(xs), jnp.asarray(ys),
        jnp.asarray(fxs), jnp.asarray(fys), w, h, bd, luma=luma))
    for i in range(len(xs)):
        r14 = ref_mc.interp_14bit(plane, xs[i], ys[i], fxs[i], fys[i], w, h, bd, luma=luma)
        assert np.array_equal(p14[i], r14), f"14bit blk {i} f=({fxs[i]},{fys[i]})"
        runi = ref_mc.mc_uni(plane, xs[i], ys[i], fxs[i], fys[i], w, h, bd, luma=luma)
        assert np.array_equal(uni[i], runi), f"uni blk {i}"


def test_bi_weighted_hpel_bilinear():
    import jax.numpy as jnp
    bd = 10
    plane = _mk(bd, seed=7)
    rng = np.random.RandomState(2)
    H, W = plane.shape
    w, h = 8, 8
    xs, ys, fxs, fys = _rand_blocks(rng, 16, H, W, w, h, 16)
    a = jax_mc.interp_14bit_batch(jnp.asarray(plane), jnp.asarray(xs), jnp.asarray(ys),
                                  jnp.asarray(fxs), jnp.asarray(fys), w, h, bd)
    b = jax_mc.interp_14bit_batch(jnp.asarray(plane), jnp.asarray(ys % 32), jnp.asarray(xs % 32),
                                  jnp.asarray(fys), jnp.asarray(fxs), w, h, bd)
    bi = np.asarray(jax_mc.mc_bi_batch(a, b, bd))
    w0 = rng.randint(1, 8, len(xs))
    wbi = np.asarray(jax_mc.mc_bi_weighted_batch(a, b, bd, 3, w0, 8 - w0))
    hp = np.asarray(jax_mc.interp_14bit_batch(jnp.asarray(plane), jnp.asarray(xs), jnp.asarray(ys),
                                              jnp.asarray(fxs), jnp.asarray(fys), w, h, bd, hpel=True))
    bl = np.asarray(jax_mc.dmvr_bilinear_batch(jnp.asarray(plane), jnp.asarray(xs), jnp.asarray(ys),
                                               jnp.asarray(fxs), jnp.asarray(fys), w, h, bd))
    for i in range(len(xs)):
        ra = ref_mc.interp_14bit(plane, xs[i], ys[i], fxs[i], fys[i], w, h, bd)
        rb = ref_mc.interp_14bit(plane, ys[i] % 32, xs[i] % 32, fys[i], fxs[i], w, h, bd)
        assert np.array_equal(bi[i], ref_mc.mc_bi(ra, rb, bd))
        assert np.array_equal(wbi[i], ref_mc.mc_bi_weighted(ra, rb, bd, 3, w0[i], 8 - w0[i]))
        rh = ref_mc.interp_14bit(plane, xs[i], ys[i], fxs[i], fys[i], w, h, bd, hpel=True)
        assert np.array_equal(hp[i], rh), f"hpel blk {i}"
        rbl = ref_mc.dmvr_bilinear(plane, xs[i], ys[i], fxs[i], fys[i], w, h, bd)
        assert np.array_equal(bl[i], rbl), f"bilin blk {i} f=({fxs[i]},{fys[i]})"


def test_blend_helpers():
    bd = 10
    rng = np.random.RandomState(3)
    intra = rng.randint(0, 1 << bd, (8, 8))
    inter = rng.randint(0, 1 << bd, (8, 8))
    for wt in (1, 2, 3):
        out = ref_mc.ciip_blend(intra, inter, wt, bd)
        exp = np.clip((intra * wt + inter * (4 - wt) + 2) >> 2, 0, 1023)
        assert np.array_equal(out, exp)
    p0 = rng.randint(-1000, 17000, (8, 8)).astype(np.int64)
    p1 = rng.randint(-1000, 17000, (8, 8)).astype(np.int64)
    wgt = rng.randint(0, 9, (8, 8))
    out = ref_mc.gpm_blend(p0, p1, wgt, bd)
    exp = np.clip((p1 * (8 - wgt) + p0 * wgt + (1 << 6)) >> 7, 0, 1023)
    assert np.array_equal(out, exp)

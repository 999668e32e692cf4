"""Batched DBF (rcn/jax_dbf.py) parity vs the scalar reference (ref_dbf.py),
numpy and jnp backends, luma + chroma, 8/10-bit, random CU/TB tilings."""

import types

import jax.numpy as jnp
import numpy as np

from openvvc_tpu.rcn.jax_dbf import deblock_chroma_batched, deblock_luma_batched
from openvvc_tpu.rcn.ref_dbf import DbfMaps, deblock_chroma, deblock_plane_luma


def _random_luma_maps(rng, W, H, cu_sizes):
    maps = DbfMaps(W, H, False)
    y = 0
    while y < H:
        x = 0
        ch = min(int(rng.choice(cu_sizes)), H - y)
        while x < W:
            cw = min(int(rng.choice(cu_sizes)), W - x)
            maps.add_cu_luma(x, y, cw, ch, int(rng.randint(18, 50)),
                             bool(rng.rand() < 0.4))
            if rng.rand() < 0.7:
                maps.add_tb_luma(x, y, cw, ch)
            x += cw
        y += ch
    return maps


def test_luma_parity():
    rng = np.random.RandomState(7)
    for trial in range(8):
        W, H = 64, 64
        bd = int(rng.choice([8, 10]))
        maps = _random_luma_maps(rng, W, H, [4, 8, 16, 32])
        bo, to = int(rng.choice([-4, 0, 4])), int(rng.choice([-4, 0, 4]))
        plane = rng.randint(0, 1 << bd, (H, W)).astype(np.int32)
        plane[:, :32] = plane[0:1, :32] // 2 + np.arange(32)[None, :]
        ref = plane.copy()
        deblock_plane_luma(ref, maps, bo, to, bd, W, H)
        got = deblock_luma_batched(np, plane.copy(), maps, bo, to, bd, W, H)
        assert np.array_equal(ref, got), f"numpy trial {trial}"
        gj = deblock_luma_batched(jnp, jnp.asarray(plane), maps, bo, to, bd, W, H)
        assert np.array_equal(ref, np.asarray(gj)), f"jnp trial {trial}"


def test_chroma_parity():
    rng = np.random.RandomState(11)
    for trial in range(6):
        W, H = 128, 128
        bd = int(rng.choice([8, 10]))
        maps = DbfMaps(W, H, True)
        y = 0
        while y < H:
            x = 0
            ch_ = min(int(rng.choice([8, 16, 32])), H - y)
            while x < W:
                cw = min(int(rng.choice([8, 16, 32])), W - x)
                maps.add_cu_chroma(x >> 1, y >> 1, cw >> 1, ch_ >> 1,
                                   int(rng.randint(18, 45)), int(rng.randint(18, 45)),
                                   bool(rng.rand() < 0.5))
                for comp in (1, 2):
                    if rng.rand() < 0.6:
                        maps.add_tb_chroma(comp, x >> 1, y >> 1, cw >> 1, ch_ >> 1)
                x += cw
            y += ch_
        mk = lambda: rng.randint(0, 1 << bd, (H // 2, W // 2)).astype(np.int32)
        cb, cr = mk(), mk()
        cb[:, :32] = cb[0:1, :32] // 2
        cr[:32, :] = cr[0:1, :] // 2
        sh = types.SimpleNamespace(
            sh_deblocking_params_present_flag=1,
            sh_cb_beta_offset_div2=int(rng.choice([-2, 0, 2])), sh_cb_tc_offset_div2=0,
            sh_cr_beta_offset_div2=0, sh_cr_tc_offset_div2=int(rng.choice([-2, 0, 2])),
            sh_luma_beta_offset_div2=0, sh_luma_tc_offset_div2=0)
        params = types.SimpleNamespace(pps=None, ph=None, sh=sh)
        rcb, rcr = cb.copy(), cr.copy()
        deblock_chroma(rcb, rcr, maps, params, bd, W, H, 6)
        gcb, gcr = deblock_chroma_batched(np, cb.copy(), cr.copy(), maps, params,
                                          bd, W, H, 6)
        assert np.array_equal(rcb, gcb) and np.array_equal(rcr, gcr), f"np {trial}"
        jcb, jcr = deblock_chroma_batched(jnp, jnp.asarray(cb), jnp.asarray(cr),
                                          maps, params, bd, W, H, 6)
        assert np.array_equal(rcb, np.asarray(jcb)), f"jnp cb {trial}"
        assert np.array_equal(rcr, np.asarray(jcr)), f"jnp cr {trial}"

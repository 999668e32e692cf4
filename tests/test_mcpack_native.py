"""Parity: native C quadtree MC-job extraction (native/mcpack.c) vs the
numpy reference path (tpu/mc_pallas_dense.extract_jobs) — bundles must be
field-identical (same merging rule, same row order)."""

import numpy as np
import pytest

from openvvc_tpu.native import load_cabac_lib
from openvvc_tpu.tpu.mc_dense import prepare_mc_args
from openvvc_tpu.tpu.mc_pallas_dense import (build_mc_bundle,
                                             build_mc_bundle_native)


class _FakeIR:
    pass


@pytest.mark.skipif(load_cabac_lib() is None, reason="native lib missing")
@pytest.mark.parametrize("seed", [7, 11, 23])
def test_native_mc_bundle_parity(seed):
    rng = np.random.RandomState(seed)
    for _ in range(4):
        uh, uw = rng.randint(20, 90), rng.randint(20, 90)
        ir = _FakeIR()
        ir.uh, ir.uw = uh, uw
        ir.gmask = (rng.rand(uh, uw) < 0.8).astype(np.uint8)
        ir.gmv = np.zeros((uh, uw, 2, 2), np.int32)
        ir.gref = np.zeros((uh, uw, 2), np.int8)
        ir.gw = np.zeros((uh, uw, 2), np.int8)
        for _r in range(30):
            y0, x0 = rng.randint(0, uh), rng.randint(0, uw)
            h, w = rng.randint(1, 40), rng.randint(1, 40)
            ir.gmv[y0:y0 + h, x0:x0 + w] = rng.randint(-200, 200, (2, 2))
            ir.gref[y0:y0 + h, x0:x0 + w] = rng.randint(0, 3, (2,))
            bi = rng.randint(0, 2)
            ir.gw[y0:y0 + h, x0:x0 + w] = [4, 4] if bi else [8, 0]
        ir.ghpel = (rng.rand(uh, uw) < 0.1).astype(np.uint8)
        lut0 = rng.randint(0, 8, 16).astype(np.int32)
        lut1 = rng.randint(0, 8, 16).astype(np.int32)
        margs = prepare_mc_args(ir.gmv, ir.gref, ir.gw, ir.ghpel, lut0,
                                lut1, uw, uh)
        b_np, dims_np = build_mc_bundle(margs, ir.gmask, uw, uh)
        b_c, dims_c = build_mc_bundle_native(ir, lut0, lut1)
        assert dims_np == dims_c
        assert set(b_np) == set(b_c)
        assert np.array_equal(b_np["cmap"], b_c["cmap"])
        for k in b_np:
            if k == "cmap":
                continue
            for f in b_np[k]:
                assert np.array_equal(
                    np.asarray(b_np[k][f], np.int64),
                    np.asarray(b_c[k][f], np.int64)), (k, f)

"""IBC (intra block copy) oracle tests: skip / merge / AMVP (+IBC AMVR) in
I and P slices, byte-identical YUV vs the reference binary.

The generator keeps streams conformant by running the same IBC derivation
as the decoder in a shadow context, so every emitted block vector resolves
to a valid (-16, 0) copy inside the decoded area (the reference asserts
nothing about invalid vectors; it would read stale buffer content)."""

import os
import sys

import numpy as np
import pytest

from openvvc_tpu.decoder import Decoder
from openvvc_tpu.drv.ibc import IbcCtx, drv_ibc_merge_mv, drv_ibc_mvp
from openvvc_tpu.drv.inter_mvp import (
    MV,
    MV_PRECISION_INT,
    MV_PRECISION_INTERNAL,
    round_to_precision,
)
from openvvc_tpu.testing.generator import (
    StreamConfig,
    build_stream_frames,
    decode_with_oracle,
)
from openvvc_tpu.vcl.coding_tree import NO_SPLIT, QT_SPLIT, TreeNode
from openvvc_tpu.vcl.ctu import CU, TU

sys.path.insert(0, os.path.dirname(__file__))
from test_residual import find_last_pos  # noqa: E402

pytestmark = pytest.mark.skipif(
    not os.path.exists("/tmp/refbuild/dectest"), reason="no oracle binary")


class _IbcGen:
    """CU factory with a shadow IBC derivation context per frame."""

    def __init__(self, rng):
        self.rng = rng
        self.reset()

    def reset(self):
        self.sim = IbcCtx(32, 32, 6)
        self.row = -1

    def intra_cu(self, x, y, log2):
        rng = self.rng
        cu = CU(x, y, log2, log2, intra_mode_l=int(rng.randint(0, 67)),
                intra_mode_c=int(rng.randint(0, 2)))
        lv = self._sparse(log2)
        if lv.any():
            cu.tus.append(TU(x, y, log2, log2, 0, cbf=1, levels=lv,
                             last_pos=find_last_pos(lv, log2, log2)))
        return cu

    def _sparse(self, l2):
        rng = self.rng
        lv = np.zeros((1 << l2, 1 << l2), np.int32)
        m = rng.rand(*lv.shape) < 0.1
        lv[m] = rng.randint(-9, 10, int(m.sum()))
        return lv

    def cu(self, x, y, log2, allow_inter=False):
        rng = self.rng
        if (x, y) == (0, 0):
            self.reset()
        size = 1 << log2
        if x >= 16 and size == 16 and rng.rand() < 0.5:
            cu = CU(x, y, log2, log2)
            cu.ibc_flag = 1
            cu.pred_mode = 2
            row = y >> 6
            if self.row != row:
                self.row = row
                self.sim.hmvp = []
            ux, uy = x >> 2, y >> 2
            nw = nh = size >> 2
            target = -256  # -16 px in 1/16 units
            mrg = self.sim.derive_merge_mv(ux, uy, nw, nh, 0, 6)
            if mrg.x == target and mrg.y == 0 and rng.rand() < 0.7:
                if rng.rand() < 0.4:
                    cu.skip_flag = 1
                cu.merge_flag = 1
                cu.merge_idx = 0
                drv_ibc_merge_mv(self.sim, x, y, log2, log2, 0, 6)
            else:
                pred = self.sim.derive_merge_mv(ux, uy, nw, nh, 0, 6)
                pred = round_to_precision(pred, MV_PRECISION_INTERNAL,
                                          MV_PRECISION_INT)
                cu.merge_flag = 0
                cu.mvd = ((target - pred.x) >> 4, (0 - pred.y) >> 4)
                cu.mvp_idx = 0
                cu.amvr_prec = MV_PRECISION_INT
                drv_ibc_mvp(self.sim, x, y, log2, log2, MV(*cu.mvd), 0,
                            MV_PRECISION_INT)
            if not cu.skip_flag:
                lv = self._sparse(log2)
                if not lv.any():
                    lv[0, 0] = 3
                cu.tus.append(TU(x, y, log2, log2, 0, cbf=1, levels=lv,
                                 last_pos=find_last_pos(lv, log2, log2)))
            return cu
        if allow_inter and rng.rand() < 0.5:
            cu = CU(x, y, log2, log2)
            cu.pred_mode = 1
            cu.skip_flag = 1
            cu.merge_flag = 1
            cu.merge_idx = int(rng.randint(0, 5))
            return cu
        return self.intra_cu(x, y, log2)


def _qt(f, leaf):
    def qt(x, y, l2):
        if l2 > leaf:
            h = 1 << (l2 - 1)
            return TreeNode(QT_SPLIT, children=[
                qt(x, y, l2 - 1), qt(x + h, y, l2 - 1),
                qt(x, y + h, l2 - 1), qt(x + h, y + h, l2 - 1)])
        return TreeNode(NO_SPLIT, cu=f(x, y, l2))

    def tb(params, entry):
        clg = params.sps.ctb_log2
        return {(entry.ctu_x + c, entry.ctu_y + r):
                qt((entry.ctu_x + c) << clg, (entry.ctu_y + r) << clg, clg)
                for r in range(entry.nb_ctu_h) for c in range(entry.nb_ctu_w)}
    return tb


def _check(cfg, frames_spec):
    stream = build_stream_frames(cfg, frames_spec)
    dec = Decoder()
    frames = dec.decode(stream)
    mine = b"".join(f.to_yuv_bytes() for f in dec.output_order(frames))
    ref = decode_with_oracle(stream)
    if ref is None:
        pytest.skip("reference decoder unavailable")
    assert ref == mine


@pytest.mark.parametrize("seed", [81, 83, 86])
def test_ibc_i_slice(seed):
    rng = np.random.RandomState(seed)
    gen = _IbcGen(rng)
    cfg = StreamConfig(width=128, height=128, deblocking=True, ibc=True,
                       amvr=True)
    _check(cfg, [{"tree_builder": _qt(lambda x, y, l: gen.cu(x, y, l), 4)}])


@pytest.mark.parametrize("seed", [82, 85])
def test_ibc_p_slice(seed):
    rng = np.random.RandomState(seed)
    gen = _IbcGen(rng)
    cfg = StreamConfig(width=128, height=128, deblocking=True, ibc=True,
                       amvr=True)
    _check(cfg, [
        {"tree_builder": _qt(lambda x, y, l: gen.cu(x, y, l), 4)},
        {"tree_builder": _qt(lambda x, y, l: gen.cu(x, y, l, True), 4),
         "slice_type": 1, "ref_deltas": [1]},
    ])

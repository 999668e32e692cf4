"""Oracle bit-exactness tests for ISP (intra sub-partitions).

Parity: /root/reference/libovvc/vcl_transform_unit.c (isp_subtree_v/h),
rcn_transform_tree.c (recon_isp_subtree_v/h, narrow 1xN/2xN transforms),
rcn_intra.c (vvc_intra_pred_isp, cubic dispatchers).
"""

import os
import sys

import numpy as np
import pytest

from openvvc_tpu.decoder import decode_to_yuv
from openvvc_tpu.testing.generator import (
    StreamConfig,
    build_stream,
    decode_with_oracle,
    rect_tree_builder,
)
from openvvc_tpu.vcl.coding_tree import NO_SPLIT, TreeNode
from openvvc_tpu.vcl.ctu import CU, TU, TREE_DUAL_LUMA
from openvvc_tpu.vcl.residual import diag_scan
from openvvc_tpu.vcl.transform_unit import isp_part_dims

sys.path.insert(0, os.path.dirname(__file__))
from test_residual import find_last_pos  # noqa: E402

pytestmark = pytest.mark.skipif(
    not os.path.exists("/tmp/refbuild/dectest"), reason="reference oracle not built"
)

_DIAG44 = diag_scan(4, 4)


def _rand_lv(rng, log2_w, log2_h, density=0.25):
    n, m = 1 << log2_h, 1 << log2_w
    lv = (rng.randint(-12, 13, (n, m)) * (rng.rand(n, m) < density)).astype(np.int32)
    if not lv.any():
        lv[0, 0] = 2
    return lv


def _isp_builder(lw, lh, isp, rng, mts=False, lfnst=False):
    l2pw, l2ph, nb_pb = isp_part_dims(lw, lh, isp)
    maxn = 8 if (l2ph == l2pw and l2pw <= 3) else 16

    def make_cu(x, y, dual):
        cu = CU(x, y, lw, lh, intra_mode_l=int(rng.randint(0, 67)), intra_mode_c=0,
                tree_type=TREE_DUAL_LUMA if dual else 0)
        cu.isp_mode = isp
        if lfnst:
            cu.lfnst_idx = int(rng.randint(1, 3))
        any_cbf = False
        for i in range(nb_pb):
            px = x + ((i << l2pw) if isp == 2 else 0)
            py = y + (0 if isp == 2 else (i << l2ph))
            if rng.rand() < 0.6 or (i == nb_pb - 1 and not any_cbf):
                if lfnst:
                    lv = np.zeros((1 << l2ph, 1 << l2pw), np.int32)
                    for k in range(rng.randint(1, maxn + 1)):
                        cx, cy = _DIAG44[k]
                        lv[cy, cx] = rng.randint(-15, 16)
                    if not lv.any():
                        lv[0, 0] = 3
                else:
                    lv = _rand_lv(rng, l2pw, l2ph)
                tu = TU(px, py, l2pw, l2ph, 0, cbf=1, levels=lv,
                        last_pos=find_last_pos(lv, l2pw, l2ph))
                tu.lfnst_idx = getattr(cu, "lfnst_idx", 0)
                cu.tus.append(tu)
                any_cbf = True
        if not lfnst and rng.rand() < 0.5:
            clv = _rand_lv(rng, lw - 1, lh - 1, 0.3)
            cu.tus.append(TU(x >> 1, y >> 1, lw - 1, lh - 1, 1, cbf=1, levels=clv,
                             last_pos=find_last_pos(clv, lw - 1, lh - 1)))
        return TreeNode(NO_SPLIT, cu=cu)

    return rect_tree_builder(lw, lh, make_cu, rng)


@pytest.mark.parametrize("lw,lh,isp", [
    (3, 3, 2), (3, 3, 1),     # 2xN / Nx2 partitions
    (4, 4, 2), (4, 4, 1),     # 4xN / Nx4
    (2, 4, 2),                # 1x16 partitions (1-wide transform)
    (4, 2, 1),                # 16x1 partitions
    (4, 2, 2), (2, 4, 1),     # clamped split counts (2 partitions)
    (5, 3, 1), (3, 5, 2),     # rectangular
    (6, 6, 1),                # large
])
def test_isp_splits(lw, lh, isp):
    rng = np.random.RandomState(lw * 16 + lh * 2 + isp)
    size = 64 if max(lw, lh) <= 4 else 128
    cfg = StreamConfig(width=size, height=size, qp=30, deblocking=False, isp=True,
                       max_mtt_depth=4, min_cb_log2=2)
    stream = build_stream(cfg, _isp_builder(lw, lh, isp, rng))
    assert decode_with_oracle(stream) == decode_to_yuv(stream)


@pytest.mark.parametrize("lw,lh,isp", [(4, 4, 2), (4, 4, 1), (5, 5, 1)])
def test_isp_implicit_mts(lw, lh, isp):
    """ISP with sps_mts_enabled: implicit DST7 per sub-TB dimension rules."""
    rng = np.random.RandomState(7 + lw + lh + isp)
    cfg = StreamConfig(width=128, height=128, qp=30, deblocking=False, isp=True,
                       mts=True, max_mtt_depth=4, min_cb_log2=2)
    stream = build_stream(cfg, _isp_builder(lw, lh, isp, rng, mts=True))
    assert decode_with_oracle(stream) == decode_to_yuv(stream)


@pytest.mark.parametrize("lw,lh,isp", [(4, 4, 2), (4, 4, 1), (5, 5, 2)])
def test_isp_lfnst(lw, lh, isp):
    """ISP + LFNST: secondary transform per sub-TB, CU-dims mode derivation."""
    rng = np.random.RandomState(11 + lw * 4 + lh + isp)
    cfg = StreamConfig(width=128, height=128, qp=30, deblocking=False, isp=True,
                       lfnst=True, max_mtt_depth=4, min_cb_log2=2)
    stream = build_stream(cfg, _isp_builder(lw, lh, isp, rng, lfnst=True))
    assert decode_with_oracle(stream) == decode_to_yuv(stream)

"""Bit-exactness tests against the reference decoder binary (the oracle).

These require /tmp/refbuild/dectest (built by tools/build_reference_oracle.sh);
they are skipped when it is absent. Every test generates a conformant stream
with our own writers and asserts our decoded YUV equals the oracle's, byte
for byte — VVC decoding is normative, so equality is exact or nothing.
"""

import os

import numpy as np
import pytest

from openvvc_tpu.decoder import decode_to_yuv
from openvvc_tpu.testing.generator import (
    StreamConfig,
    build_stream,
    decode_with_oracle,
    uniform_tree,
)
from openvvc_tpu.vcl.coding_tree import BT_H, BT_V, NO_SPLIT, QT_SPLIT, TT_H, TT_V, TreeNode
from openvvc_tpu.vcl.ctu import CU, TU

pytestmark = pytest.mark.skipif(
    not os.path.exists("/tmp/refbuild/dectest"), reason="reference oracle not built"
)


def assert_oracle_match(cfg, tree_builder):
    stream = build_stream(cfg, tree_builder)
    ref = decode_with_oracle(stream)
    mine = decode_to_yuv(stream)
    assert ref == mine, "decoded YUV differs from reference decoder"


def leaf(x, y, lg_w, lg_h=None, mode=0, cmode=0, levels=None, clevels=None):
    lg_h = lg_w if lg_h is None else lg_h
    cu = CU(x, y, lg_w, lg_h, intra_mode_l=mode, intra_mode_c=cmode)
    if levels is not None:
        last = _last(levels)
        cu.tus.append(TU(x, y, lg_w, lg_h, 0, cbf=1, levels=levels, last_pos=last))
    if clevels is not None:
        for comp, lv in clevels:
            cu.tus.append(
                TU(x >> 1, y >> 1, lg_w - 1, lg_h - 1, comp, cbf=1, levels=lv, last_pos=_last(lv))
            )
    return TreeNode(NO_SPLIT, cu=cu)


def _last(levels):
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from test_residual import find_last_pos

    h, w = levels.shape
    return find_last_pos(levels, (w - 1).bit_length(), (h - 1).bit_length())


def rand_levels(rng, log2, density=0.15, amp=12):
    n = 1 << log2
    lv = (rng.randint(-amp, amp + 1, (n, n)) * (rng.rand(n, n) < density)).astype(np.int32)
    if not lv.any():
        lv[0, 0] = 1
    return lv


def test_planar_dc_flat():
    cfg = StreamConfig(width=128, height=64, deblocking=False)
    assert_oracle_match(
        cfg, lambda p, e: uniform_tree(p, e, lambda x, y, lg: CU(x, y, lg, lg))
    )


@pytest.mark.parametrize("mode", [0, 1, 2, 18, 34, 45, 50, 66])
def test_intra_modes_with_residual(mode):
    rng = np.random.RandomState(mode)
    cfg = StreamConfig(width=128, height=128, qp=30, deblocking=False)

    def factory(x, y, lg):
        cu = CU(x, y, lg, lg, intra_mode_l=mode, intra_mode_c=0)
        lv = rand_levels(rng, lg)
        cu.tus.append(TU(x, y, lg, lg, 0, cbf=1, levels=lv, last_pos=_last(lv)))
        clv = rand_levels(rng, lg - 1, amp=6)
        cu.tus.append(TU(x >> 1, y >> 1, lg - 1, lg - 1, 1, cbf=1, levels=clv, last_pos=_last(clv)))
        clv2 = rand_levels(rng, lg - 1, amp=6)
        cu.tus.append(TU(x >> 1, y >> 1, lg - 1, lg - 1, 2, cbf=1, levels=clv2, last_pos=_last(clv2)))
        return cu

    assert_oracle_match(cfg, lambda p, e: uniform_tree(p, e, factory))


def test_dep_quant():
    rng = np.random.RandomState(3)
    cfg = StreamConfig(width=64, height=64, qp=27, dep_quant=True, deblocking=False)

    def factory(x, y, lg):
        cu = CU(x, y, lg, lg, intra_mode_l=10, intra_mode_c=0)
        lv = rand_levels(rng, lg, density=0.4)
        cu.tus.append(TU(x, y, lg, lg, 0, cbf=1, levels=lv, last_pos=_last(lv)))
        return cu

    assert_oracle_match(cfg, lambda p, e: uniform_tree(p, e, factory))


def test_qt_split_mixed_modes():
    rng = np.random.RandomState(4)
    cfg = StreamConfig(width=128, height=128, qp=32, deblocking=False)

    def tree_builder(params, entry):
        trees = {}
        lg = params.sps.ctb_log2
        for row in range(entry.nb_ctu_h):
            for col in range(entry.nb_ctu_w):
                cx, cy = entry.ctu_x + col, entry.ctu_y + row
                x0, y0 = cx << lg, cy << lg
                kids = []
                for i, (qx, qy) in enumerate(((x0, y0), (x0 + 32, y0), (x0, y0 + 32), (x0 + 32, y0 + 32))):
                    mode = int(rng.randint(0, 67))
                    lv = rand_levels(rng, 5)
                    kids.append(leaf(qx, qy, 5, mode=mode, levels=lv))
                trees[(cx, cy)] = TreeNode(QT_SPLIT, children=kids)
        return trees

    assert_oracle_match(cfg, tree_builder)


def test_nonaligned_picture():
    cfg = StreamConfig(width=96, height=80, deblocking=False)

    def tree_builder(params, entry):
        trees = {}
        lg = params.sps.ctb_log2

        def node_for(x0, y0, l2):
            pic_w, pic_h = params.pps.pic_w, params.pps.pic_h
            size = 1 << l2
            if x0 + size <= pic_w and y0 + size <= pic_h:
                return leaf(x0, y0, l2, mode=18)
            n = TreeNode(QT_SPLIT)
            half = size >> 1
            for cx, cy in ((x0, y0), (x0 + half, y0), (x0, y0 + half), (x0 + half, y0 + half)):
                n.children.append(node_for(cx, cy, l2 - 1) if (cx < pic_w and cy < pic_h) else TreeNode())
            return n

        for row in range(entry.nb_ctu_h):
            for col in range(entry.nb_ctu_w):
                cx, cy = entry.ctu_x + col, entry.ctu_y + row
                trees[(cx, cy)] = node_for(cx << lg, cy << lg, lg)
        return trees

    assert_oracle_match(cfg, tree_builder)


def test_deblocking_qt_mix():
    rng = np.random.RandomState(51)

    def leaf_n(x, y, lw, lh):
        m = int(rng.randint(0, 67))
        cu = CU(x, y, lw, lh, intra_mode_l=m, intra_mode_c=0)
        lv = (rng.randint(-14, 15, (1 << lh, 1 << lw)) * (rng.rand(1 << lh, 1 << lw) < 0.25)).astype(np.int32)
        if not lv.any():
            lv[0, 0] = 3
        cu.tus.append(TU(x, y, lw, lh, 0, cbf=1, levels=lv, last_pos=_last(lv)))
        if lw > 2:
            n = 1 << (lw - 1)
            clv = (rng.randint(-8, 9, (n, n)) * (rng.rand(n, n) < 0.2)).astype(np.int32)
            if not clv.any():
                clv[0, 0] = 2
            cu.tus.append(TU(x >> 1, y >> 1, lw - 1, lh - 1, 1, cbf=1, levels=clv, last_pos=_last(clv)))
        return TreeNode(NO_SPLIT, cu=cu)

    def qt_node(x, y, lg, depth):
        if lg > 3 and rng.rand() < 0.6 and depth < 3:
            h = 1 << (lg - 1)
            return TreeNode(
                QT_SPLIT,
                children=[
                    qt_node(x, y, lg - 1, depth + 1),
                    qt_node(x + h, y, lg - 1, depth + 1),
                    qt_node(x, y + h, lg - 1, depth + 1),
                    qt_node(x + h, y + h, lg - 1, depth + 1),
                ],
            )
        return leaf_n(x, y, lg, lg)

    def tb(params, entry):
        trees = {}
        lg = params.sps.ctb_log2
        for row in range(entry.nb_ctu_h):
            for col in range(entry.nb_ctu_w):
                cx, cy = entry.ctu_x + col, entry.ctu_y + row
                trees[(cx, cy)] = qt_node(cx << lg, cy << lg, lg, 0)
        return trees

    cfg = StreamConfig(width=192, height=128, qp=32, deblocking=True)
    assert_oracle_match(cfg, tb)

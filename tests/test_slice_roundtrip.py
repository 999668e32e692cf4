import numpy as np
import pytest

from openvvc_tpu.hls.nal import demux_annexb, is_vcl
from openvvc_tpu.hls.params import NvclContext
from openvvc_tpu.testing.generator import StreamConfig, build_stream, uniform_tree
from openvvc_tpu.vcl.coding_tree import NO_SPLIT, QT_SPLIT, TreeNode
from openvvc_tpu.vcl.ctu import CU, INTRA_DC, INTRA_PLANAR, TREE_SINGLE, TU
from openvvc_tpu.vcl.residual import diag_scan
from openvvc_tpu.vcl.slice_data import parse_entry


def decode_stream(stream):
    """Parse a generated stream back: returns (params, list of CtuIR).

    Forces the Python reader: these tests assert on transmitted `levels`,
    which the native parse path intentionally does not materialize (recon
    consumes only decoded coefficients)."""
    import os

    os.environ["OPENVVC_NATIVE_ENTRY"] = "0"
    try:
        return _decode_stream_inner(stream)
    finally:
        os.environ.pop("OPENVVC_NATIVE_ENTRY", None)


def _decode_stream_inner(stream):
    ctx = NvclContext()
    ctus = []
    params = None
    for nal in demux_annexb(stream):
        if is_vcl(nal.type):
            params = ctx.parse_slice(nal)
            for entry in params.entries:
                ectx, trees, dec = parse_entry(params, entry)
                ctus.extend(ectx.ctus)
        else:
            ctx.decode_nalu(nal)
    return params, ctus


def make_planar_cu(x0, y0, log2):
    return CU(x0, y0, log2, log2, intra_mode_l=INTRA_PLANAR, intra_mode_c=INTRA_PLANAR)


def test_planar_no_residual_roundtrip():
    cfg = StreamConfig(width=128, height=128)
    stream = build_stream(cfg, lambda p, e: uniform_tree(p, e, make_planar_cu))
    params, ctus = decode_stream(stream)
    assert len(ctus) == 4
    for ctu in ctus:
        assert len(ctu.cus) == 1
        cu = ctu.cus[0]
        assert cu.intra_mode_l == INTRA_PLANAR
        assert cu.intra_mode_c == INTRA_PLANAR
        assert cu.tus == []


def test_modes_and_residual_roundtrip():
    rng = np.random.RandomState(5)

    def cu_factory(x0, y0, log2):
        mode = [0, 1, 18, 50][(x0 // 64 + y0 // 64) % 4]
        cu = CU(x0, y0, log2, log2, intra_mode_l=mode, intra_mode_c=mode)
        lv = np.zeros((1 << log2, 1 << log2), np.int32)
        lv[0, 0] = 4
        lv[1, 2] = -3
        lv[5, 5] = 7
        tu = TU(x0, y0, log2, log2, 0, cbf=1, levels=lv, last_pos=(5, 5))
        cu.tus.append(tu)
        # chroma Cb residual
        clv = np.zeros((1 << (log2 - 1), 1 << (log2 - 1)), np.int32)
        clv[0, 0] = 2
        cu.tus.append(TU(x0 >> 1, y0 >> 1, log2 - 1, log2 - 1, 1, cbf=1, levels=clv, last_pos=(0, 0)))
        return cu

    cfg = StreamConfig(width=128, height=128, qp=30)
    stream = build_stream(cfg, lambda p, e: uniform_tree(p, e, cu_factory))
    params, ctus = decode_stream(stream)
    assert len(ctus) == 4
    for ctu in ctus:
        cu = ctu.cus[0]
        assert len(cu.tus) == 2
        luma_tu = next(t for t in cu.tus if t.comp == 0)
        assert luma_tu.last_pos == (5, 5)
        assert luma_tu.levels[0, 0] == 4
        assert luma_tu.levels[1, 2] == -3
        assert luma_tu.levels[5, 5] == 7
        cb_tu = next(t for t in cu.tus if t.comp == 1)
        assert cb_tu.levels[0, 0] == 2


def test_qt_split_tree_roundtrip():
    def tree_builder(params, entry):
        trees = {}
        log2_ctb = params.sps.ctb_log2
        for row in range(entry.nb_ctu_h):
            for col in range(entry.nb_ctu_w):
                cx, cy = entry.ctu_x + col, entry.ctu_y + row
                x0, y0 = cx << log2_ctb, cy << log2_ctb
                # QT split into 4x 32x32, first child split again into 16x16
                def leaf(x, y, lg):
                    return TreeNode(NO_SPLIT, cu=make_planar_cu(x, y, lg))

                sub0 = TreeNode(
                    QT_SPLIT,
                    children=[
                        leaf(x0, y0, 4),
                        leaf(x0 + 16, y0, 4),
                        leaf(x0, y0 + 16, 4),
                        leaf(x0 + 16, y0 + 16, 4),
                    ],
                )
                node = TreeNode(
                    QT_SPLIT,
                    children=[
                        sub0,
                        leaf(x0 + 32, y0, 5),
                        leaf(x0, y0 + 32, 5),
                        leaf(x0 + 32, y0 + 32, 5),
                    ],
                )
                trees[(cx, cy)] = node
        return trees

    cfg = StreamConfig(width=128, height=128)
    stream = build_stream(cfg, tree_builder)
    params, ctus = decode_stream(stream)
    assert len(ctus) == 4
    for ctu in ctus:
        assert len(ctu.cus) == 7  # 4 small + 3 big


def test_nonaligned_picture_implicit_split():
    # 96x80: CTUs at right/bottom borders require implicit splits
    cfg = StreamConfig(width=96, height=80)

    def tree_builder(params, entry):
        trees = {}
        log2_ctb = params.sps.ctb_log2
        for row in range(entry.nb_ctu_h):
            for col in range(entry.nb_ctu_w):
                cx, cy = entry.ctu_x + col, entry.ctu_y + row
                x0, y0 = cx << log2_ctb, cy << log2_ctb
                node = _implicit_node(params, x0, y0, log2_ctb)
                trees[(cx, cy)] = node
        return trees

    def _implicit_node(params, x0, y0, log2):
        pic_w, pic_h = params.pps.pic_w, params.pps.pic_h
        size = 1 << log2
        if x0 + size <= pic_w and y0 + size <= pic_h:
            return TreeNode(NO_SPLIT, cu=make_planar_cu(x0, y0, log2))
        # implicit split: build QT children for in-picture quadrants
        node = TreeNode(QT_SPLIT)
        half = size >> 1
        for cx, cy in ((x0, y0), (x0 + half, y0), (x0, y0 + half), (x0 + half, y0 + half)):
            child = TreeNode()
            if cx < pic_w and cy < pic_h:
                child = _implicit_node(params, cx, cy, log2 - 1)
            node.children.append(child)
        return node

    stream = build_stream(cfg, tree_builder)
    params, ctus = decode_stream(stream)
    assert len(ctus) == 4
    total_cus = sum(len(c.cus) for c in ctus)
    assert total_cus > 4  # split CTUs at borders

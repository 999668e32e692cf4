"""P-slice SCIPU (smallest chroma intra prediction unit) oracle tests.

Local dual trees in inter slices (reference vcl_coding_tree.c:309-346
sep_tree handling, vcl_coding_unit.c:1087-1092 share==2 pred-mode
inference): intra SCIPU (share=1, signaled and inferred) and inter SCIPU
(share=2). Streams are self-generated and compared byte-for-byte against
the reference decoder binary."""

import numpy as np
import pytest

from openvvc_tpu.decoder import Decoder
from openvvc_tpu.testing.generator import (
    StreamConfig,
    _find_last_pos_diag,
    build_stream_frames,
    decode_with_oracle,
    rect_tree_builder,
)
from openvvc_tpu.vcl.coding_tree import (BT_V, NO_SPLIT, QT_SPLIT, TreeNode)
from openvvc_tpu.vcl.ctu import CU, TREE_DUAL_CHROMA, TREE_DUAL_LUMA, TU


def _sparse(rng, l2w, l2h, p=0.3, mag=8):
    shape = (1 << l2h, 1 << l2w)
    return (rng.randint(-mag, mag + 1, shape)
            * (rng.rand(*shape) < p)).astype(np.int32)


def _luma_tu(rng, cu, x, y, l2w, l2h):
    lv = _sparse(rng, l2w, l2h)
    if lv.any():
        cu.tus.append(TU(x, y, l2w, l2h, 0, cbf=1, levels=lv,
                         last_pos=_find_last_pos_diag(lv, l2w, l2h)))


def _dual_intra_cu(rng, x, y, l2w, l2h):
    cu = CU(x, y, l2w, l2h, tree_type=TREE_DUAL_LUMA,
            intra_mode_l=int(rng.randint(0, 67)))
    _luma_tu(rng, cu, x, y, l2w, l2h)
    return TreeNode(NO_SPLIT, cu=cu)


def _chroma_leaf(rng, x, y, l2w, l2h):
    ccu = CU(x >> 1, y >> 1, l2w - 1, l2h - 1, tree_type=TREE_DUAL_CHROMA,
             intra_mode_c=int(rng.randint(0, 2)))
    clv = _sparse(rng, l2w - 1, l2h - 1, p=0.4, mag=6)
    if clv.any():
        ccu.tus.append(TU(x >> 1, y >> 1, l2w - 1, l2h - 1, 1, cbf=1,
                          levels=clv,
                          last_pos=_find_last_pos_diag(clv, l2w - 1,
                                                       l2h - 1)))
    return TreeNode(NO_SPLIT, cu=ccu)


def _intra_cu16(rng, x, y, log2):
    cu = CU(x, y, log2, log2, intra_mode_l=int(rng.randint(0, 67)),
            intra_mode_c=int(rng.randint(0, 2)))
    _luma_tu(rng, cu, x, y, log2, log2)
    return cu


def _inter_cu(rng, x, y, l2w, l2h, merge=True):
    cu = CU(x, y, l2w, l2h)
    cu.pred_mode = 1
    if merge:
        cu.merge_flag = 1
        cu.merge_idx = int(rng.randint(0, 5))
        _luma_tu(rng, cu, x, y, l2w, l2h)
        if not cu.tus:
            cu.skip_flag = 1
    else:
        cu.merge_flag = 0
        cu.ref_idx = 0
        cu.mvd = (int(rng.randint(-16, 17)), int(rng.randint(-16, 17)))
        cu.mvp_idx = int(rng.randint(0, 2))
    return cu


def _qt16_with(node8_factory):
    """CTU -> QT to 16x16 inter CUs except one 8x8-holding 16x16 per CTU
    built by node8_factory(x, y)."""
    def tb(params, entry, rng, fallback_cu):
        clg = params.sps.ctb_log2

        def qt(x, y, l2, special):
            if l2 > 4:
                h = 1 << (l2 - 1)
                return TreeNode(QT_SPLIT, children=[
                    qt(x, y, l2 - 1, special),
                    qt(x + h, y, l2 - 1, False),
                    qt(x, y + h, l2 - 1, False),
                    qt(x + h, y + h, l2 - 1, False)])
            if special:
                return node8_factory(x, y)
            return TreeNode(NO_SPLIT, cu=fallback_cu(x, y, l2))
        return {(entry.ctu_x + c, entry.ctu_y + r):
                qt((entry.ctu_x + c) << clg, (entry.ctu_y + r) << clg,
                   clg, True)
                for r in range(entry.nb_ctu_h)
                for c in range(entry.nb_ctu_w)}
    return tb


def _check(cfg, frames_spec):
    stream = build_stream_frames(cfg, frames_spec)
    frames = Decoder().decode(stream)
    mine = b"".join(f.to_yuv_bytes()
                    for f in sorted(frames, key=lambda f: f.poc))
    ref = decode_with_oracle(stream)
    if ref is None:
        pytest.skip("reference decoder unavailable")
    assert ref == mine


def test_p_scipu_intra_signaled_bt():
    """16x16 -> QT -> 8x8 -> BT_V (narrow chroma) with mode_cons=1: local
    dual tree of two 4x8 intra luma CUs + one 8x8-luma-area chroma CU."""
    rng = np.random.RandomState(7)
    cfg = StreamConfig(width=128, height=128, deblocking=False)

    def node8(x, y):
        # 16x16 node: QT to four 8x8, first gets the SCIPU BT
        h = 8

        def n8(x8, y8, scipu):
            if not scipu:
                return TreeNode(NO_SPLIT, cu=_inter_cu(rng, x8, y8, 3, 3))
            node = TreeNode(BT_V, children=[
                _dual_intra_cu(rng, x8, y8, 2, 3),
                _dual_intra_cu(rng, x8 + 4, y8, 2, 3)])
            node.mode_constraint = 1
            node.chroma_tree = _chroma_leaf(rng, x8, y8, 3, 3)
            return node
        return TreeNode(QT_SPLIT, children=[
            n8(x, y, True), n8(x + h, y, True),
            n8(x, y + h, False), n8(x + h, y + h, False)])

    tb = _qt16_with(node8)
    _check(cfg, [
        {"tree_builder": lambda p, e: rect_tree_builder(
            4, 4, lambda x, y, d: TreeNode(
                NO_SPLIT, cu=_intra_cu16(rng, x, y, 4)), rng)(p, e)},
        {"tree_builder": lambda p, e: tb(
            p, e, rng, lambda x, y, l2: _inter_cu(rng, x, y, l2, l2)),
         "slice_type": 1, "ref_deltas": [1]},
    ])


def test_p_scipu_inter_signaled_bt():
    """Same split with mode_cons=2: inter-only SCIPU, two 4x8 inter CUs,
    no separate chroma tree."""
    rng = np.random.RandomState(11)
    cfg = StreamConfig(width=128, height=128, deblocking=False)

    def node8(x, y):
        h = 8

        def n8(x8, y8, scipu):
            if not scipu:
                return TreeNode(NO_SPLIT, cu=_inter_cu(rng, x8, y8, 3, 3))
            node = TreeNode(BT_V, children=[
                TreeNode(NO_SPLIT, cu=_inter_cu(rng, x8, y8, 2, 3)),
                TreeNode(NO_SPLIT,
                         cu=_inter_cu(rng, x8 + 4, y8, 2, 3, merge=False))])
            node.mode_constraint = 2
            return node
        return TreeNode(QT_SPLIT, children=[
            n8(x, y, True), n8(x + h, y, False),
            n8(x, y + h, False), n8(x + h, y + h, True)])

    tb = _qt16_with(node8)
    _check(cfg, [
        {"tree_builder": lambda p, e: rect_tree_builder(
            4, 4, lambda x, y, d: TreeNode(
                NO_SPLIT, cu=_intra_cu16(rng, x, y, 4)), rng)(p, e)},
        {"tree_builder": lambda p, e: tb(
            p, e, rng, lambda x, y, l2: _inter_cu(rng, x, y, l2, l2)),
         "slice_type": 1, "ref_deltas": [1]},
    ])


def test_p_scipu_intra_inferred_qt():
    """min-QT 4: 8x8 QT-splits to four 4x4 children (child area 16 < 32)
    -> share=1 inferred without signaling; 4x4 intra luma CUs + chroma."""
    rng = np.random.RandomState(13)
    cfg = StreamConfig(width=128, height=128, deblocking=False,
                       min_qt_log2=2)

    def node8(x, y):
        h = 8

        def n8(x8, y8, scipu):
            if not scipu:
                return TreeNode(NO_SPLIT, cu=_inter_cu(rng, x8, y8, 3, 3))
            node = TreeNode(QT_SPLIT, children=[
                _dual_intra_cu(rng, x8, y8, 2, 2),
                _dual_intra_cu(rng, x8 + 4, y8, 2, 2),
                _dual_intra_cu(rng, x8, y8 + 4, 2, 2),
                _dual_intra_cu(rng, x8 + 4, y8 + 4, 2, 2)])
            node.chroma_tree = _chroma_leaf(rng, x8, y8, 3, 3)
            return node
        return TreeNode(QT_SPLIT, children=[
            n8(x, y, True), n8(x + h, y, False),
            n8(x, y + h, True), n8(x + h, y + h, False)])

    tb = _qt16_with(node8)
    _check(cfg, [
        {"tree_builder": lambda p, e: rect_tree_builder(
            4, 4, lambda x, y, d: TreeNode(
                NO_SPLIT, cu=_intra_cu16(rng, x, y, 4)), rng)(p, e)},
        {"tree_builder": lambda p, e: tb(
            p, e, rng, lambda x, y, l2: _inter_cu(rng, x, y, l2, l2)),
         "slice_type": 1, "ref_deltas": [1]},
    ])

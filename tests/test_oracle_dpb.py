"""DPB semantics oracle tests: output reorder (B pyramids, decode != display
order), long-term references, multi-CVS (mid-stream IDR), CRA continuation.

The reference binary writes YUV in DPB output order; byte-equality of the
whole output file validates both sample values and the output ordering."""

import os
import sys

import numpy as np
import pytest

from openvvc_tpu.decoder import Decoder
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


def _intra_cu(rng, x, y, log2):
    cu = CU(x, y, log2, log2, intra_mode_l=int(rng.randint(0, 67)),
            intra_mode_c=int(rng.randint(0, 2)))
    lv = np.zeros((1 << log2, 1 << log2), np.int32)
    m = rng.rand(*lv.shape) < 0.08
    lv[m] = rng.randint(-8, 9, int(m.sum()))
    if lv.any():
        cu.tus.append(TU(x, y, log2, log2, 0, cbf=1, levels=lv,
                         last_pos=find_last_pos(lv, log2, log2)))
    return cu


def _inter_cu(rng, x, y, log2, nb_ref0=1, nb_ref1=0):
    cu = CU(x, y, log2, log2)
    cu.pred_mode = 1
    if rng.rand() < 0.5:
        cu.merge_flag = 0
        cu.ref_idx = int(rng.randint(0, nb_ref0))
        cu.mvd = (int(rng.randint(-20, 21)), int(rng.randint(-20, 21)))
        cu.mvp_idx = int(rng.randint(0, 2))
        if nb_ref1:
            cu.inter_dir = int(rng.choice([1, 2, 3]))
            cu.ref_idx1 = int(rng.randint(0, nb_ref1))
            cu.mvd1 = (int(rng.randint(-20, 21)), int(rng.randint(-20, 21)))
            cu.mvp_idx1 = int(rng.randint(0, 2))
    else:
        cu.skip_flag = 1
        cu.merge_flag = 1
        cu.merge_idx = int(rng.randint(0, 5))
    return cu


def _qt(cu_factory, leaf):
    def qt(x, y, l2):
        if l2 > leaf:
            h = 1 << (l2 - 1)
            return TreeNode(QT_SPLIT, children=[
                qt(x, y, l2 - 1), qt(x + h, y, l2 - 1),
                qt(x, y + h, l2 - 1), qt(x + h, y + h, l2 - 1)])
        return TreeNode(NO_SPLIT, cu=cu_factory(x, y, l2))

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


def test_b_pyramid_reorder():
    """Decode order 0,4,2,1,3 with display order 0..4 — output must be in
    display order like the reference's bumping process produces."""
    rng = np.random.RandomState(61)
    cfg = StreamConfig(width=128, height=128, deblocking=True)
    I = lambda: {"tree_builder": _qt(lambda x, y, l: _intra_cu(rng, x, y, l), 5)}
    B = lambda nb0, nb1: {"tree_builder": _qt(
        lambda x, y, l: _inter_cu(rng, x, y, l, nb0, nb1), 4)}
    _check(cfg, [
        I(),
        {**B(1, 0), "slice_type": 1, "poc": 4, "ref_deltas": [4]},
        {**B(2, 1), "slice_type": 0, "poc": 2,
         "ref_deltas": [2, -2], "ref_deltas1": [-2]},
        {**B(1, 2), "slice_type": 0, "poc": 1,
         "ref_deltas": [1], "ref_deltas1": [-1, -3]},
        {**B(2, 1), "slice_type": 0, "poc": 3,
         "ref_deltas": [1, 3], "ref_deltas1": [-1]},
    ])


def test_long_term_ref():
    """LT entry (SPS-signaled RPL) referencing the IDR from far away.

    The reference binary REJECTS any SPS with sps_long_term_ref_pics_flag
    ("Unsupported long term references", dec_init.c SPS validation), so no
    oracle exists: this feature exceeds the reference. Self-consistency
    check instead: an LT entry to POC 0 and an equivalent chained ST entry
    to POC 0 must decode to byte-identical output (same reference frames,
    same MVs — the generator keeps CU payloads identical via the seed)."""

    def frames_spec(rng, cfg, lt):
        I = {"tree_builder": _qt(lambda x, y, l: _intra_cu(rng, x, y, l), 5)}
        P = lambda nb0: {"tree_builder": _qt(
            lambda x, y, l: _inter_cu(rng, x, y, l, nb0), 4), "slice_type": 1}
        if lt:
            return [I,
                    {**P(1), "poc": 1, "sps_rpl_idx": (0, 0)},
                    {**P(1), "poc": 2, "sps_rpl_idx": (0, 0)},
                    {**P(2), "poc": 3, "sps_rpl_idx": (1, 0)}]
        return [I,
                {**P(1), "poc": 1, "ref_deltas": [1]},
                {**P(1), "poc": 2, "ref_deltas": [1]},
                {**P(2), "poc": 3, "ref_deltas": [1, 3]}]  # ST chain to POC 0

    outs = []
    for lt in (True, False):
        rng = np.random.RandomState(62)
        if lt:
            cfg = StreamConfig(width=128, height=128, deblocking=True,
                               long_term=True,
                               sps_rpls=([[1], [1, ("lt", 0)]], [[]]))
        else:
            cfg = StreamConfig(width=128, height=128, deblocking=True)
        stream = build_stream_frames(cfg, frames_spec(rng, cfg, lt))
        dec = Decoder()
        frames = dec.decode(stream)
        outs.append(b"".join(f.to_yuv_bytes() for f in dec.output_order(frames)))
    assert outs[0] == outs[1]


def test_multi_idr_two_cvs():
    """Mid-stream IDR starts a new CVS; output order is per-CVS."""
    rng = np.random.RandomState(63)
    cfg = StreamConfig(width=128, height=128, deblocking=True)
    I = lambda: {"tree_builder": _qt(lambda x, y, l: _intra_cu(rng, x, y, l), 5)}
    P = lambda: {"tree_builder": _qt(lambda x, y, l: _inter_cu(rng, x, y, l), 4),
                 "slice_type": 1, "ref_deltas": [1]}
    _check(cfg, [
        I(),
        {**P(), "poc": 1},
        {**I(), "poc": 0, "idr": True},
        {**P(), "poc": 1},
    ])


def test_cra_continuation():
    """CRA mid-stream without leading pictures: POC continues, no reset."""
    rng = np.random.RandomState(64)
    cfg = StreamConfig(width=128, height=128, deblocking=True)
    I = lambda: {"tree_builder": _qt(lambda x, y, l: _intra_cu(rng, x, y, l), 5)}
    P = lambda: {"tree_builder": _qt(lambda x, y, l: _inter_cu(rng, x, y, l), 4),
                 "slice_type": 1, "ref_deltas": [1]}
    _check(cfg, [
        I(),
        {**P(), "poc": 1},
        {**I(), "poc": 2, "cra": True},
        {**P(), "poc": 3},
    ])

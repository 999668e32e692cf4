"""Affine / SbTMVP oracle tests: streams generated with the symmetric
writer, decoded by the reference binary and by us — byte-identical YUV.

Covers: affine AMVP (4/6-param, uni/bi, AMVR precisions), affine merge
(inherited + constructed candidates incl. the C0 TMVP corner), PROF,
SbTMVP (with and without affine), sub-block DBF edge rules, 10-bit.
"""

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


def _sparse(rng, l2, p=0.08, mag=8):
    lv = np.zeros((1 << l2, 1 << l2), np.int32)
    m = rng.rand(*lv.shape) < p
    lv[m] = rng.randint(-mag, mag + 1, int(m.sum()))
    return lv


def _intra_cu(rng, x, y, log2):
    cu = CU(x, y, log2, log2, intra_mode_l=int(rng.randint(0, 67)),
            intra_mode_c=int(rng.randint(0, 2)))
    lv = _sparse(rng, log2)
    if lv.any():
        cu.tus.append(TU(x, y, log2, log2, 0, cbf=1, levels=lv,
                         last_pos=find_last_pos(lv, log2, log2)))
    return cu


def _mv_cu(rng, x, y, log2, bslice=False):
    cu = CU(x, y, log2, log2)
    cu.pred_mode = 1
    if rng.rand() < 0.5:
        cu.merge_flag = 0
        cu.ref_idx = 0
        cu.mvd = (int(rng.randint(-30, 31)), int(rng.randint(-30, 31)))
        cu.mvp_idx = int(rng.randint(0, 2))
        if bslice:
            cu.inter_dir = int(rng.choice([1, 2, 3]))
            cu.ref_idx1 = 0
            cu.mvd1 = (int(rng.randint(-30, 31)), int(rng.randint(-30, 31)))
            cu.mvp_idx1 = int(rng.randint(0, 2))
    else:
        cu.skip_flag = 1
        cu.merge_flag = 1
        cu.merge_idx = int(rng.randint(0, 5))
    return cu


def _affine_cu(rng, x, y, log2, kind, six=False, amvr=False, bslice=False):
    cu = CU(x, y, log2, log2)
    cu.pred_mode = 1
    if kind == "amvp":
        cu.merge_flag = 0
        cu.affine_flag = 1
        cu.affine_type = int(rng.randint(0, 2)) if six else 0
        n = 3 if cu.affine_type else 2
        cu.affine_mvd0 = tuple((int(rng.randint(-8, 9)), int(rng.randint(-8, 9)))
                               for _ in range(n))
        cu.ref_idx = 0
        cu.mvp_idx = int(rng.randint(0, 2))
        if bslice:
            cu.inter_dir = int(rng.choice([1, 2, 3]))
            cu.ref_idx1 = 0
            cu.affine_mvd1 = tuple((int(rng.randint(-8, 9)), int(rng.randint(-8, 9)))
                                   for _ in range(n))
            cu.mvp_idx1 = int(rng.randint(0, 2))
        if amvr:
            from openvvc_tpu.drv.inter_mvp import (MV_PRECISION_INT,
                                                   MV_PRECISION_QUARTER,
                                                   MV_PRECISION_SIXTEENTH)

            cu.affine_mvd0 = tuple((a * 4, b * 4) for a, b in cu.affine_mvd0)
            cu.amvr_prec = int(rng.choice([MV_PRECISION_QUARTER,
                                           MV_PRECISION_INT,
                                           MV_PRECISION_SIXTEENTH]))
        lv = _sparse(rng, log2, p=0.05)
        if lv.any():
            cu.tus.append(TU(x, y, log2, log2, 0, cbf=1, levels=lv,
                             last_pos=find_last_pos(lv, log2, log2)))
    else:  # sb_merge skip
        cu.skip_flag = 1
        cu.merge_flag = 1
        cu.sb_merge_flag = 1
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
    frames = Decoder().decode(stream)
    mine = b"".join(f.to_yuv_bytes() for f in sorted(frames, key=lambda f: f.poc))
    ref = decode_with_oracle(stream)
    if ref is None:
        pytest.skip("reference decoder unavailable")
    assert ref == mine


@pytest.mark.parametrize("seed,six,amvr,bd", [
    (31, False, False, 8), (32, True, False, 8),
    (33, True, True, 8), (34, True, False, 10)])
def test_affine_amvp_p(seed, six, amvr, bd):
    rng = np.random.RandomState(seed)
    cfg = StreamConfig(width=128, height=128, bitdepth=bd, deblocking=True,
                       affine=True, affine_6param=six, prof=True,
                       amvr=amvr, affine_amvr=amvr)

    def mk(x, y, l2):
        if rng.rand() < 0.6:
            return _affine_cu(rng, x, y, l2, "amvp", six, amvr)
        return _affine_cu(rng, x, y, l2, "merge")

    _check(cfg, [
        {"tree_builder": _qt(lambda x, y, l: _intra_cu(rng, x, y, l), 5)},
        {"tree_builder": _qt(mk, 4), "slice_type": 1, "ref_deltas": [1]},
    ])


@pytest.mark.parametrize("seed,affine", [(41, True), (42, False)])
def test_sbtmvp(seed, affine):
    rng = np.random.RandomState(seed)
    cfg = StreamConfig(width=128, height=128, deblocking=True, tmvp=True,
                       sbtmvp=True, affine=affine, affine_6param=affine,
                       prof=affine)
    _check(cfg, [
        {"tree_builder": _qt(lambda x, y, l: _intra_cu(rng, x, y, l), 5)},
        {"tree_builder": _qt(lambda x, y, l: _mv_cu(rng, x, y, l), 4),
         "slice_type": 1, "ref_deltas": [1]},
        {"tree_builder": _qt(lambda x, y, l: _affine_cu(rng, x, y, l, "merge"), 4),
         "slice_type": 1, "ref_deltas": [1]},
    ])


def test_affine_b_slice():
    rng = np.random.RandomState(51)
    cfg = StreamConfig(width=128, height=128, deblocking=True, affine=True,
                       affine_6param=True, prof=True, tmvp=True, sbtmvp=True)

    def mk(x, y, l2):
        r = rng.rand()
        if r < 0.4:
            return _affine_cu(rng, x, y, l2, "amvp", True, False, bslice=True)
        if r < 0.7:
            return _affine_cu(rng, x, y, l2, "merge")
        return _mv_cu(rng, x, y, l2, bslice=True)

    _check(cfg, [
        {"tree_builder": _qt(lambda x, y, l: _intra_cu(rng, x, y, l), 5)},
        {"tree_builder": _qt(lambda x, y, l: _mv_cu(rng, x, y, l), 4),
         "slice_type": 1, "ref_deltas": [1]},
        {"tree_builder": _qt(mk, 4), "slice_type": 0, "poc": 2,
         "ref_deltas": [1, 2], "ref_deltas1": [1, 2]},
    ])


def test_affine_ra_pyramid_corner_tmvp():
    """RA pyramid (genuine future refs, non-low-delay) with affine merge:
    pins the constructed-candidate C0 TMVP corner's collocated-plane
    selection (merge_tmvp_from_l0/_from_l1/_from_ldc dispatched on ldc /
    col_ref_l0, drv_affine_mvp.c:666/:812/:900, :2786-2793).  Regression:
    the corner always preferred collocated plane 0, diverging on B frames
    whose collocated picture comes from list 0.  All three lanes must be
    oracle bit-exact."""
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "tools"))
    import gen_bench_stream as g

    rng = np.random.RandomState(7)
    cfg = StreamConfig(width=256, height=192, deblocking=True, sao=True,
                       tile_cols=[2, 2], bcw=True, affine=True,
                       affine_6param=True, prof=True, bdof=True, dmvr=True,
                       tmvp=True, amvr=True)
    frames = [{"tree_builder": g._qt_tree(
        lambda x, y, l: g._intra_cu(rng, x, y, l), 5)}]
    frames += g.ra_frame_specs(5, rng, 4, g._qt_tree, tools=False,
                               affine=True)
    stream = build_stream_frames(cfg, frames)
    ref = decode_with_oracle(stream)
    if ref is None:
        pytest.skip("reference decoder unavailable")
    os.environ["OPENVVC_NATIVE_ENTRY"] = "0"
    try:
        dec = Decoder()
        mine = b"".join(f.to_yuv_bytes()
                        for f in dec.output_order(dec.decode(stream)))
        assert mine == ref, "python lane diverges from oracle"
    finally:
        os.environ.pop("OPENVVC_NATIVE_ENTRY", None)
    dec = Decoder()
    mine = b"".join(f.to_yuv_bytes()
                    for f in dec.output_order(dec.decode(stream)))
    assert mine == ref, "native C lane diverges from oracle"

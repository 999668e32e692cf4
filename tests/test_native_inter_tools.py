"""Differential tests for the round-5 native inter toolset: MMVD, SMVD and
BCW parsed by native/parse.c must produce the same CU IR as the Python
parser, and end-to-end decode (native C recon lane + device lane) must be
byte-identical to the forced-Python lane (itself oracle bit-exact, see
tests/test_oracle_inter.py test_mmvd_ciip_bcw / test_smvd)."""

import os

import numpy as np
import pytest

from openvvc_tpu.native import load_cabac_lib
from openvvc_tpu.testing.generator import StreamConfig, build_stream_frames
from openvvc_tpu.vcl.coding_tree import NO_SPLIT, QT_SPLIT, TreeNode
from openvvc_tpu.vcl.ctu import CU, TU

pytestmark = pytest.mark.skipif(load_cabac_lib() is None,
                                reason="native library unavailable")


def _qt_tree(factory, leaf):
    def qt(x, y, l2):
        if l2 > leaf:
            h = 1 << (l2 - 1)
            return TreeNode(QT_SPLIT, children=[
                qt(x, y, l2 - 1), qt(x + h, y, l2 - 1),
                qt(x, y + h, l2 - 1), qt(x + h, y + h, l2 - 1)])
        return TreeNode(NO_SPLIT, cu=factory(x, y, l2))

    def tb(params, entry):
        clg = params.sps.ctb_log2
        return {(entry.ctu_x + c, entry.ctu_y + r):
                qt((entry.ctu_x + c) << clg,
                   (entry.ctu_y + r) << clg, clg)
                for r in range(entry.nb_ctu_h)
                for c in range(entry.nb_ctu_w)}
    return tb


def _sparse(rng, l2, p=0.15, mag=9):
    lv = np.zeros((1 << l2, 1 << l2), np.int32)
    m = rng.rand(*lv.shape) < p
    lv[m] = rng.randint(-mag, mag + 1, int(m.sum()))
    return lv


def _last(lv, l2):
    from openvvc_tpu.testing.generator import _find_last_pos_diag
    return _find_last_pos_diag(lv, l2, l2)


def _intra_cu(rng, x, y, l2):
    cu = CU(x, y, l2, l2, intra_mode_l=int(rng.randint(0, 67)),
            intra_mode_c=int(rng.randint(0, 2)))
    lv = _sparse(rng, l2, p=0.25)
    if lv.any():
        cu.tus.append(TU(x, y, l2, l2, 0, cbf=1, levels=lv,
                         last_pos=_last(lv, l2)))
    return cu


def _add_tu(rng, cu, x, y, l2):
    lv = _sparse(rng, l2, p=0.1)
    if lv.any():
        cu.tus.append(TU(x, y, l2, l2, 0, cbf=1, levels=lv,
                         last_pos=_last(lv, l2)))


def _mmvd_bcw_stream(tmvp=False, ciip=False):
    rng = np.random.RandomState(47)
    cfg = StreamConfig(width=192, height=128, deblocking=True, sao=True,
                       mmvd=True, bcw=True, tmvp=tmvp, amvr=True, ciip=ciip)

    def p_cu(x, y, l2):
        if rng.rand() < 0.2:
            return _intra_cu(rng, x, y, l2)
        cu = CU(x, y, l2, l2)
        cu.pred_mode = 1
        kind = rng.randint(0, 4)
        if kind == 0:
            cu.skip_flag = 1
            cu.merge_flag = 1
            if rng.rand() < 0.5:
                cu.mmvd_flag = 1
                cu.merge_idx = int(rng.randint(0, 64))
            else:
                cu.merge_idx = int(rng.randint(0, 5))
        elif kind == 1:
            cu.merge_flag = 1
            r = rng.rand()
            if ciip and r < 0.4 and 2 * l2 >= 6:
                cu.ciip_flag = 1
                cu.merge_idx = int(rng.randint(0, 5))
            elif r < 0.6:
                cu.mmvd_flag = 1
                cu.merge_idx = int(rng.randint(0, 64))
            else:
                cu.merge_idx = int(rng.randint(0, 5))
            _add_tu(rng, cu, x, y, l2)
        else:
            cu.merge_flag = 0
            cu.ref_idx = 0
            cu.mvd = (int(rng.randint(-20, 21)), int(rng.randint(-20, 21)))
            cu.mvp_idx = int(rng.randint(0, 2))
            _add_tu(rng, cu, x, y, l2)
        return cu

    def b_cu(x, y, l2):
        cu = p_cu(x, y, l2)
        if cu.pred_mode == 1 and not cu.merge_flag:
            cu.inter_dir = int(rng.choice([1, 2, 3]))
            cu.ref_idx1 = 0
            cu.mvd1 = (int(rng.randint(-20, 21)), int(rng.randint(-20, 21)))
            cu.mvp_idx1 = int(rng.randint(0, 2))
            if cu.inter_dir == 3 and 2 * l2 >= 8:
                cu.bcw_idx = int(rng.choice([0, 1, 2, 3, 4]))
        return cu

    frames = [
        {"tree_builder": _qt_tree(lambda x, y, l: _intra_cu(rng, x, y, l), 5)},
        {"tree_builder": _qt_tree(p_cu, 4), "slice_type": 1,
         "ref_deltas": [1]},
        {"tree_builder": _qt_tree(b_cu, 4), "slice_type": 0,
         "ref_deltas": [2, 1], "ref_deltas1": [1, 2]},
        {"tree_builder": _qt_tree(b_cu, 4), "slice_type": 0,
         "ref_deltas": [1, 3], "ref_deltas1": [2, 1]},
    ]
    return build_stream_frames(cfg, frames)


def _smvd_stream():
    rng = np.random.RandomState(53)
    cfg = StreamConfig(width=192, height=128, deblocking=True, smvd=True,
                       amvr=True, bcw=True)

    def b_cu(x, y, l2):
        cu = CU(x, y, l2, l2)
        cu.pred_mode = 1
        kind = rng.randint(0, 3)
        if kind == 0:
            cu.skip_flag = 1
            cu.merge_flag = 1
            cu.merge_idx = int(rng.randint(0, 5))
        else:
            cu.merge_flag = 0
            cu.inter_dir = 3
            if kind == 1:
                cu.smvd_flag = 1
                cu.mvd = (int(rng.randint(-15, 16)),
                          int(rng.randint(-15, 16)))
                cu.mvp_idx = int(rng.randint(0, 2))
                cu.mvp_idx1 = int(rng.randint(0, 2))
            else:
                cu.ref_idx = 0
                cu.ref_idx1 = 0
                cu.mvd = (int(rng.randint(-15, 16)),
                          int(rng.randint(-15, 16)))
                cu.mvd1 = (int(rng.randint(-15, 16)),
                           int(rng.randint(-15, 16)))
                cu.mvp_idx = int(rng.randint(0, 2))
                cu.mvp_idx1 = int(rng.randint(0, 2))
            if cu.inter_dir == 3 and 2 * l2 >= 8:
                cu.bcw_idx = int(rng.choice([0, 1, 2, 3, 4]))
            _add_tu(rng, cu, x, y, l2)
        return cu

    frames = [
        {"tree_builder": _qt_tree(lambda x, y, l: _intra_cu(rng, x, y, l),
                                  5), "poc": 0},
        {"tree_builder": _qt_tree(lambda x, y, l: _intra_cu(rng, x, y, l),
                                  5), "poc": 2},
        {"tree_builder": _qt_tree(b_cu, 4), "slice_type": 0, "poc": 1,
         "ref_deltas": [1], "ref_deltas1": [-1]},
    ]
    return build_stream_frames(cfg, frames)


def _ir_match(stream):
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from test_native_parse import _diff_stream

    assert _diff_stream(stream) > 0


def _lanes_match(stream, tpu=True):
    from openvvc_tpu.decoder import Decoder

    os.environ["OPENVVC_NATIVE_ENTRY"] = "0"
    try:
        dec = Decoder()
        ref = b"".join(f.to_yuv_bytes()
                       for f in dec.output_order(dec.decode(stream)))
    finally:
        os.environ.pop("OPENVVC_NATIVE_ENTRY", None)
    dec = Decoder()
    got = b"".join(f.to_yuv_bytes()
                   for f in dec.output_order(dec.decode(stream)))
    assert got == ref, "native C lane diverges from the Python lane"
    if tpu:
        dec = Decoder(use_tpu=True)
        got = b"".join(f.to_yuv_bytes()
                       for f in dec.output_order(dec.decode(stream)))
        assert got == ref, "device lane diverges from the Python lane"
        assert dec.stats.get("tpu_frames", 0) > 0, dec.stats


def test_mmvd_bcw_ir_match():
    _ir_match(_mmvd_bcw_stream())


def test_mmvd_bcw_tmvp_ir_match():
    _ir_match(_mmvd_bcw_stream(tmvp=True))


def test_smvd_ir_match():
    _ir_match(_smvd_stream())


def test_mmvd_bcw_lanes():
    _lanes_match(_mmvd_bcw_stream())


def test_smvd_lanes():
    _lanes_match(_smvd_stream())


def test_ciip_ir_match():
    _ir_match(_mmvd_bcw_stream(ciip=True))


def test_ciip_lanes():
    _lanes_match(_mmvd_bcw_stream(ciip=True))


def _gpm_stream(with_dbf=True):
    rng = np.random.RandomState(59)
    cfg = StreamConfig(width=192, height=128, deblocking=with_dbf, sao=True,
                       gpm=True, tmvp=False)

    def b_cu(x, y, l2):
        cu = CU(x, y, l2, l2)
        cu.pred_mode = 1
        kind = rng.randint(0, 3)
        if kind == 0:
            cu.skip_flag = 1
            cu.merge_flag = 1
            if rng.rand() < 0.6:
                cu.gpm_flag = 1
                cu.gpm_split_dir = int(rng.randint(0, 64))
                cu.gpm_idx0 = int(rng.randint(0, 5))
                cu.gpm_idx1 = int(rng.choice(
                    [i for i in range(5) if i != cu.gpm_idx0]))
            else:
                cu.merge_idx = int(rng.randint(0, 5))
        elif kind == 1:
            cu.merge_flag = 1
            if rng.rand() < 0.6:
                cu.gpm_flag = 1
                cu.gpm_split_dir = int(rng.randint(0, 64))
                cu.gpm_idx0 = int(rng.randint(0, 5))
                cu.gpm_idx1 = int(rng.choice(
                    [i for i in range(5) if i != cu.gpm_idx0]))
            else:
                cu.merge_idx = int(rng.randint(0, 5))
            _add_tu(rng, cu, x, y, l2)
        else:
            cu.merge_flag = 0
            cu.inter_dir = int(rng.choice([1, 2, 3]))
            cu.ref_idx = 0
            cu.ref_idx1 = 0
            cu.mvd = (int(rng.randint(-25, 26)), int(rng.randint(-25, 26)))
            cu.mvd1 = (int(rng.randint(-25, 26)), int(rng.randint(-25, 26)))
            cu.mvp_idx = int(rng.randint(0, 2))
            cu.mvp_idx1 = int(rng.randint(0, 2))
        return cu

    frames = [
        {"tree_builder": _qt_tree(lambda x, y, l: _intra_cu(rng, x, y, l),
                                  5)},
        {"tree_builder": _qt_tree(b_cu, 4), "slice_type": 0,
         "ref_deltas": [1], "ref_deltas1": [1]},
        {"tree_builder": _qt_tree(b_cu, 4), "slice_type": 0,
         "ref_deltas": [2, 1], "ref_deltas1": [1, 2]},
    ]
    return build_stream_frames(cfg, frames)


def test_gpm_lanes():
    _lanes_match(_gpm_stream())


# ---------------------------------------------------------------------------
# Affine / SbTMVP (round-5 native burn-down): the native parse emits the
# per-unit sub-block motion + CU PROF params and the C recon reconstructs
# per sub-block; both lanes must match the Python lane (itself oracle
# bit-exact, tests/test_oracle_affine.py).
# ---------------------------------------------------------------------------


def _affine_cu(rng, x, y, l2, kind, six=False, amvr=False, bslice=False):
    cu = CU(x, y, l2, l2)
    cu.pred_mode = 1
    if kind == "amvp":
        cu.merge_flag = 0
        cu.affine_flag = 1
        cu.affine_type = int(rng.randint(0, 2)) if six else 0
        n = 3 if cu.affine_type else 2
        cu.affine_mvd0 = tuple((int(rng.randint(-8, 9)),
                                int(rng.randint(-8, 9))) for _ in range(n))
        cu.ref_idx = 0
        cu.mvp_idx = int(rng.randint(0, 2))
        if bslice:
            cu.inter_dir = int(rng.choice([1, 2, 3]))
            cu.ref_idx1 = 0
            cu.affine_mvd1 = tuple((int(rng.randint(-8, 9)),
                                    int(rng.randint(-8, 9)))
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
        _add_tu(rng, cu, x, y, l2)
    else:
        cu.skip_flag = 1
        cu.merge_flag = 1
        cu.sb_merge_flag = 1
        cu.merge_idx = int(rng.randint(0, 5))
    return cu


def _mv_cu(rng, x, y, l2, bslice=False):
    cu = CU(x, y, l2, l2)
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


def _affine_stream(six=True, amvr=False, sbtmvp=False, bslice=False,
                   seed=31):
    rng = np.random.RandomState(seed)
    cfg = StreamConfig(width=192, height=128, deblocking=True, sao=True,
                       affine=True, affine_6param=six, prof=True,
                       amvr=amvr, affine_amvr=amvr, tmvp=sbtmvp,
                       sbtmvp=sbtmvp)

    def mk(x, y, l2):
        r = rng.rand()
        if r < 0.4:
            return _affine_cu(rng, x, y, l2, "amvp", six, amvr,
                              bslice=bslice)
        if r < 0.7:
            return _affine_cu(rng, x, y, l2, "merge")
        return _mv_cu(rng, x, y, l2, bslice=bslice)

    frames = [
        {"tree_builder": _qt_tree(lambda x, y, l: _intra_cu(rng, x, y, l),
                                  5)},
        {"tree_builder": _qt_tree(lambda x, y, l: _mv_cu(rng, x, y, l), 4),
         "slice_type": 1, "ref_deltas": [1]},
    ]
    if bslice:
        frames.append({"tree_builder": _qt_tree(mk, 4), "slice_type": 0,
                       "poc": 2, "ref_deltas": [1, 2],
                       "ref_deltas1": [1, 2]})
    else:
        frames.append({"tree_builder": _qt_tree(mk, 4), "slice_type": 1,
                       "ref_deltas": [1]})
        frames.append({"tree_builder": _qt_tree(mk, 4), "slice_type": 1,
                       "ref_deltas": [1, 2]})
    return build_stream_frames(cfg, frames)


def test_affine_p_lanes():
    _lanes_match(_affine_stream(six=True))


def test_affine_amvr_lanes():
    _lanes_match(_affine_stream(six=True, amvr=True, seed=33))


def test_affine_b_sbtmvp_lanes():
    _lanes_match(_affine_stream(six=True, sbtmvp=True, bslice=True,
                                seed=51))


def test_sbtmvp_only_lanes():
    rng = np.random.RandomState(41)
    cfg = StreamConfig(width=192, height=128, deblocking=True, sao=True,
                       tmvp=True, sbtmvp=True)
    frames = [
        {"tree_builder": _qt_tree(lambda x, y, l: _intra_cu(rng, x, y, l),
                                  5)},
        {"tree_builder": _qt_tree(lambda x, y, l: _mv_cu(rng, x, y, l), 4),
         "slice_type": 1, "ref_deltas": [1]},
        {"tree_builder": _qt_tree(
            lambda x, y, l: _affine_cu(rng, x, y, l, "merge"), 4),
         "slice_type": 1, "ref_deltas": [1]},
    ]
    _lanes_match(build_stream_frames(cfg, frames))


def _bdof_dmvr_stream(tmvp=False, seed=67):
    rng = np.random.RandomState(seed)
    cfg = StreamConfig(width=192, height=128, deblocking=True, sao=True,
                       bdof=True, dmvr=True, tmvp=tmvp)

    def b_cu(x, y, l2):
        cu = CU(x, y, l2, l2)
        cu.pred_mode = 1
        kind = rng.randint(0, 3)
        if kind == 0:
            cu.skip_flag = 1
            cu.merge_flag = 1
            cu.merge_idx = int(rng.randint(0, 5))
        elif kind == 1:
            cu.merge_flag = 1
            cu.merge_idx = int(rng.randint(0, 5))
            _add_tu(rng, cu, x, y, l2)
        else:
            cu.merge_flag = 0
            cu.inter_dir = 3
            cu.ref_idx = 0
            cu.ref_idx1 = 0
            cu.mvd = (int(rng.randint(-20, 21)), int(rng.randint(-20, 21)))
            cu.mvd1 = (int(rng.randint(-20, 21)),
                       int(rng.randint(-20, 21)))
            cu.mvp_idx = int(rng.randint(0, 2))
            cu.mvp_idx1 = int(rng.randint(0, 2))
        return cu

    def p_cu(x, y, l2):
        cu = CU(x, y, l2, l2)
        cu.pred_mode = 1
        if rng.rand() < 0.6:
            cu.merge_flag = 1
            cu.skip_flag = int(rng.rand() < 0.5)
            cu.merge_idx = int(rng.randint(0, 5))
            if not cu.skip_flag:
                _add_tu(rng, cu, x, y, l2)
        else:
            cu.merge_flag = 0
            cu.ref_idx = 0
            cu.mvd = (int(rng.randint(-20, 21)), int(rng.randint(-20, 21)))
            cu.mvp_idx = int(rng.randint(0, 2))
        return cu

    frames = [
        {"tree_builder": _qt_tree(lambda x, y, l: _intra_cu(rng, x, y, l),
                                  5), "poc": 0},
        {"tree_builder": _qt_tree(lambda x, y, l: _intra_cu(rng, x, y, l),
                                  5), "poc": 2},
        {"tree_builder": _qt_tree(b_cu, 4), "slice_type": 0, "poc": 1,
         "ref_deltas": [1], "ref_deltas1": [-1]},
    ]
    if tmvp:
        # a P frame whose TMVP collocated field is the DMVR frame: the
        # refined MVs must land in the exported TMVP planes
        frames.append({"tree_builder": _qt_tree(p_cu, 4), "slice_type": 1,
                       "poc": 3, "ref_deltas": [2]})
    return build_stream_frames(cfg, frames)


def test_bdof_dmvr_lanes():
    _lanes_match(_bdof_dmvr_stream())


def test_bdof_dmvr_tmvp_lanes():
    _lanes_match(_bdof_dmvr_stream(tmvp=True, seed=68))

"""P-slice end-to-end oracle tests: self-generated conformant streams
decoded byte-identically by the reference decoder and ours.

Covers: skip/merge (full candidate list + HMVP + per-CTU-row reset),
AMVP with fractional MVDs and mvp_idx, multi-ref ref_idx, intra CUs in P
slices, inter residuals (root cbf inference, chroma-only cbf), 3-frame
chains, AMVR precision signaling.
"""

import numpy as np
import pytest

from openvvc_tpu.decoder import Decoder
from openvvc_tpu.testing.generator import (
    StreamConfig,
    _find_last_pos_diag,
    build_stream_frames,
    decode_with_oracle,
)
from openvvc_tpu.vcl.coding_tree import NO_SPLIT, QT_SPLIT, TreeNode
from openvvc_tpu.vcl.ctu import CU, TU


def _sparse(rng, l2w, l2h, p=0.1, mag=10):
    shape = (1 << l2h, 1 << l2w)
    return (rng.randint(-mag, mag + 1, shape) * (rng.rand(*shape) < p)).astype(np.int32)


def _add_luma_tu(rng, cu, x, y, l2, force=False):
    lv = _sparse(rng, l2, l2)
    if force and not lv.any():
        lv[rng.randint(1 << l2), rng.randint(1 << l2)] = int(rng.randint(1, 9))
    if lv.any():
        cu.tus.append(TU(x, y, l2, l2, 0, cbf=1, levels=lv,
                         last_pos=_find_last_pos_diag(lv, l2, l2)))
        return True
    return False


def _add_chroma_tus(rng, cu, x, y, l2):
    got = False
    for comp in (1, 2):
        lv = _sparse(rng, l2 - 1, l2 - 1, p=0.15, mag=6)
        if lv.any():
            cu.tus.append(TU(x >> 1, y >> 1, l2 - 1, l2 - 1, comp, cbf=1,
                             levels=lv, last_pos=_find_last_pos_diag(lv, l2 - 1, l2 - 1)))
            got = True
    return got


def _intra_cu(rng, x, y, log2):
    cu = CU(x, y, log2, log2, intra_mode_l=int(rng.randint(0, 67)),
            intra_mode_c=int(rng.randint(0, 2)))
    _add_luma_tu(rng, cu, x, y, log2)
    _add_chroma_tus(rng, cu, x, y, log2)
    return cu


def _qt_tree(cu_factory, leaf_log2):
    def qt(x, y, l2):
        if l2 > leaf_log2:
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
    # the reference outputs pictures in POC (display) order
    mine = b"".join(f.to_yuv_bytes() for f in sorted(frames, key=lambda f: f.poc))
    ref = decode_with_oracle(stream)
    if ref is None:
        pytest.skip("reference decoder unavailable")
    assert ref == mine


def test_p_all_skip():
    rng = np.random.RandomState(3)
    cfg = StreamConfig(width=128, height=128, deblocking=False)

    def skip_cu(x, y, log2):
        cu = CU(x, y, log2, log2)
        cu.pred_mode = 1
        cu.skip_flag = 1
        cu.merge_flag = 1
        cu.merge_idx = int(rng.randint(0, 5))
        return cu

    _check(cfg, [
        {"tree_builder": _qt_tree(lambda x, y, l: _intra_cu(rng, x, y, l), 5)},
        {"tree_builder": _qt_tree(skip_cu, 4), "slice_type": 1, "ref_deltas": [1]},
    ])


def test_p_mvp_fractional():
    rng = np.random.RandomState(5)
    cfg = StreamConfig(width=128, height=128, deblocking=False)

    def mvp_cu(x, y, log2):
        cu = CU(x, y, log2, log2)
        cu.pred_mode = 1
        cu.merge_flag = 0
        cu.ref_idx = 0
        cu.mvd = (int(rng.randint(-20, 21)), int(rng.randint(-20, 21)))
        cu.mvp_idx = int(rng.randint(0, 2))
        return cu

    _check(cfg, [
        {"tree_builder": _qt_tree(lambda x, y, l: _intra_cu(rng, x, y, l), 5)},
        {"tree_builder": _qt_tree(mvp_cu, 4), "slice_type": 1, "ref_deltas": [1]},
    ])


def test_p_mixed_three_frames():
    rng = np.random.RandomState(11)
    cfg = StreamConfig(width=128, height=128, deblocking=False)

    def mixed_cu(x, y, log2):
        if rng.rand() < 0.25:
            return _intra_cu(rng, x, y, log2)
        cu = CU(x, y, log2, log2)
        cu.pred_mode = 1
        kind = rng.randint(0, 4)
        if kind == 0:
            cu.skip_flag = 1
            cu.merge_flag = 1
            cu.merge_idx = int(rng.randint(0, 5))
        elif kind == 1:
            cu.merge_flag = 1
            cu.merge_idx = int(rng.randint(0, 5))
            got_l = _add_luma_tu(rng, cu, x, y, log2)
            got_c = _add_chroma_tus(rng, cu, x, y, log2)
            if not (got_l or got_c):
                _add_luma_tu(rng, cu, x, y, log2, force=True)
        else:
            cu.merge_flag = 0
            cu.ref_idx = int(rng.randint(0, 2))
            cu.mvd = (int(rng.randint(-40, 41)), int(rng.randint(-40, 41)))
            cu.mvp_idx = int(rng.randint(0, 2))
            if rng.rand() < 0.7:
                _add_luma_tu(rng, cu, x, y, log2)
                _add_chroma_tus(rng, cu, x, y, log2)
        return cu

    _check(cfg, [
        {"tree_builder": _qt_tree(lambda x, y, l: _intra_cu(rng, x, y, l), 5)},
        {"tree_builder": _qt_tree(mixed_cu, 4), "slice_type": 1, "ref_deltas": [1]},
        {"tree_builder": _qt_tree(mixed_cu, 4), "slice_type": 1, "ref_deltas": [2, 1]},
    ])


def test_p_amvr():
    rng = np.random.RandomState(17)
    cfg = StreamConfig(width=128, height=128, deblocking=False, amvr=True)

    def amvr_cu(x, y, log2):
        cu = CU(x, y, log2, log2)
        cu.pred_mode = 1
        cu.merge_flag = 0
        cu.ref_idx = 0
        cu.mvp_idx = int(rng.randint(0, 2))
        prec = int(rng.choice([4, 3, 2, 0]))  # quarter/half/int/4-pel
        cu.mvd = (int(rng.randint(-10, 11)), int(rng.randint(-10, 11)))
        if cu.mvd == (0, 0):
            cu.mvd = (1, 0)
        cu.amvr_prec = prec
        return cu

    _check(cfg, [
        {"tree_builder": _qt_tree(lambda x, y, l: _intra_cu(rng, x, y, l), 5)},
        {"tree_builder": _qt_tree(amvr_cu, 4), "slice_type": 1, "ref_deltas": [1]},
    ])


def test_b_mixed():
    rng = np.random.RandomState(23)
    cfg = StreamConfig(width=128, height=128, deblocking=False)

    def b_cu(x, y, log2):
        if rng.rand() < 0.2:
            return _intra_cu(rng, x, y, log2)
        cu = CU(x, y, log2, log2)
        cu.pred_mode = 1
        kind = rng.randint(0, 5)
        if kind == 0:
            cu.skip_flag = 1
            cu.merge_flag = 1
            cu.merge_idx = int(rng.randint(0, 5))
        elif kind == 1:
            cu.merge_flag = 1
            cu.merge_idx = int(rng.randint(0, 5))
            if not _add_luma_tu(rng, cu, x, y, log2) | _add_chroma_tus(rng, cu, x, y, log2):
                _add_luma_tu(rng, cu, x, y, log2, force=True)
        else:
            cu.merge_flag = 0
            cu.inter_dir = int(rng.choice([1, 2, 3]))
            cu.ref_idx = 0
            cu.ref_idx1 = 0
            cu.mvd = (int(rng.randint(-30, 31)), int(rng.randint(-30, 31)))
            cu.mvd1 = (int(rng.randint(-30, 31)), int(rng.randint(-30, 31)))
            cu.mvp_idx = int(rng.randint(0, 2))
            cu.mvp_idx1 = int(rng.randint(0, 2))
            if rng.rand() < 0.6:
                _add_luma_tu(rng, cu, x, y, log2)
                _add_chroma_tus(rng, cu, x, y, log2)
        return cu

    _check(cfg, [
        {"tree_builder": _qt_tree(lambda x, y, l: _intra_cu(rng, x, y, l), 5)},
        {"tree_builder": _qt_tree(lambda x, y, l: _intra_cu(rng, x, y, l), 5)},
        {"tree_builder": _qt_tree(b_cu, 4), "slice_type": 0,
         "ref_deltas": [2], "ref_deltas1": [1]},
        {"tree_builder": _qt_tree(b_cu, 4), "slice_type": 0,
         "ref_deltas": [1, 3], "ref_deltas1": [2, 1]},
    ])


def test_pb_deblocking():
    """Inter frames with deblocking on: MV-based boundary strengths."""
    rng = np.random.RandomState(31)
    cfg = StreamConfig(width=128, height=128, deblocking=True)

    def cu_any(x, y, log2):
        if rng.rand() < 0.2:
            return _intra_cu(rng, x, y, log2)
        cu = CU(x, y, log2, log2)
        cu.pred_mode = 1
        kind = rng.randint(0, 4)
        if kind == 0:
            cu.skip_flag = 1
            cu.merge_flag = 1
            cu.merge_idx = int(rng.randint(0, 5))
        elif kind == 1:
            cu.merge_flag = 1
            cu.merge_idx = int(rng.randint(0, 5))
            if not _add_luma_tu(rng, cu, x, y, log2) | _add_chroma_tus(rng, cu, x, y, log2):
                _add_luma_tu(rng, cu, x, y, log2, force=True)
        else:
            cu.merge_flag = 0
            cu.ref_idx = 0
            # small mvds: many CU pairs land under/over the half-pel BS
            # threshold, exercising both rule outcomes
            cu.mvd = (int(rng.randint(-4, 5)), int(rng.randint(-4, 5)))
            cu.mvp_idx = int(rng.randint(0, 2))
            if rng.rand() < 0.5:
                _add_luma_tu(rng, cu, x, y, log2)
        return cu

    def b_cu(x, y, log2):
        cu = cu_any(x, y, log2)
        if cu.pred_mode == 1 and not cu.merge_flag:
            cu.inter_dir = int(rng.choice([1, 2, 3]))
            cu.ref_idx1 = 0
            cu.mvd1 = (int(rng.randint(-4, 5)), int(rng.randint(-4, 5)))
            cu.mvp_idx1 = int(rng.randint(0, 2))
        return cu

    _check(cfg, [
        {"tree_builder": _qt_tree(lambda x, y, l: _intra_cu(rng, x, y, l), 5)},
        {"tree_builder": _qt_tree(cu_any, 4), "slice_type": 1, "ref_deltas": [1]},
        {"tree_builder": _qt_tree(b_cu, 4), "slice_type": 0,
         "ref_deltas": [2, 1], "ref_deltas1": [2, 1]},
    ])


def test_tmvp():
    """Temporal MVP: P and B chains with ph_temporal_mvp on."""
    rng = np.random.RandomState(41)
    cfg = StreamConfig(width=128, height=128, deblocking=False, tmvp=True)

    def p_cu(x, y, log2):
        cu = CU(x, y, log2, log2)
        cu.pred_mode = 1
        kind = rng.randint(0, 3)
        if kind == 0:
            cu.skip_flag = 1
            cu.merge_flag = 1
            cu.merge_idx = int(rng.randint(0, 5))
        elif kind == 1:
            cu.merge_flag = 1
            cu.merge_idx = int(rng.randint(0, 5))
            _add_luma_tu(rng, cu, x, y, log2, force=True)
        else:
            cu.merge_flag = 0
            cu.ref_idx = 0
            cu.mvd = (int(rng.randint(-25, 26)), int(rng.randint(-25, 26)))
            cu.mvp_idx = int(rng.randint(0, 2))
        return cu

    def b_cu(x, y, log2):
        cu = p_cu(x, y, log2)
        if not cu.merge_flag:
            cu.inter_dir = int(rng.choice([1, 2, 3]))
            cu.ref_idx1 = 0
            cu.mvd1 = (int(rng.randint(-25, 26)), int(rng.randint(-25, 26)))
            cu.mvp_idx1 = int(rng.randint(0, 2))
        return cu

    _check(cfg, [
        {"tree_builder": _qt_tree(lambda x, y, l: _intra_cu(rng, x, y, l), 5)},
        {"tree_builder": _qt_tree(p_cu, 4), "slice_type": 1, "ref_deltas": [1]},
        {"tree_builder": _qt_tree(p_cu, 4), "slice_type": 1, "ref_deltas": [2, 1]},
        {"tree_builder": _qt_tree(b_cu, 4), "slice_type": 0,
         "ref_deltas": [1, 3], "ref_deltas1": [2, 1]},
    ])


def test_mmvd_ciip_bcw():
    """MMVD offsets, CIIP blend, BCW weighted bi-prediction."""
    rng = np.random.RandomState(47)
    cfg = StreamConfig(width=128, height=128, deblocking=False,
                       mmvd=True, ciip=True, bcw=True)

    def p_cu(x, y, log2):
        if rng.rand() < 0.2:
            return _intra_cu(rng, x, y, log2)
        cu = CU(x, y, log2, log2)
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
            if rng.rand() < 0.4:
                cu.ciip_flag = 1
                cu.merge_idx = int(rng.randint(0, 5))
            elif rng.rand() < 0.5:
                cu.mmvd_flag = 1
                cu.merge_idx = int(rng.randint(0, 64))
            else:
                cu.merge_idx = int(rng.randint(0, 5))
            _add_luma_tu(rng, cu, x, y, log2, force=True)
        else:
            cu.merge_flag = 0
            cu.ref_idx = 0
            cu.mvd = (int(rng.randint(-20, 21)), int(rng.randint(-20, 21)))
            cu.mvp_idx = int(rng.randint(0, 2))
        return cu

    def b_cu(x, y, log2):
        cu = p_cu(x, y, log2)
        if cu.pred_mode == 1 and not cu.merge_flag:
            cu.inter_dir = int(rng.choice([1, 2, 3]))
            cu.ref_idx1 = 0
            cu.mvd1 = (int(rng.randint(-20, 21)), int(rng.randint(-20, 21)))
            cu.mvp_idx1 = int(rng.randint(0, 2))
            if cu.inter_dir == 3 and log2 + log2 >= 8:
                cu.bcw_idx = int(rng.choice([0, 1, 2, 3, 4]))
        return cu

    _check(cfg, [
        {"tree_builder": _qt_tree(lambda x, y, l: _intra_cu(rng, x, y, l), 5)},
        {"tree_builder": _qt_tree(p_cu, 4), "slice_type": 1, "ref_deltas": [1]},
        {"tree_builder": _qt_tree(b_cu, 4), "slice_type": 0,
         "ref_deltas": [2, 1], "ref_deltas1": [1, 2]},
    ])


def test_smvd():
    """Symmetric MVD: B frame between two refs (ldc=0)."""
    rng = np.random.RandomState(53)
    cfg = StreamConfig(width=128, height=128, deblocking=False, smvd=True)

    def b_cu(x, y, log2):
        cu = CU(x, y, log2, log2)
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
                cu.mvd = (int(rng.randint(-15, 16)), int(rng.randint(-15, 16)))
                cu.mvp_idx = int(rng.randint(0, 2))
                cu.mvp_idx1 = int(rng.randint(0, 2))
            else:
                cu.ref_idx = 0
                cu.ref_idx1 = 0
                cu.mvd = (int(rng.randint(-15, 16)), int(rng.randint(-15, 16)))
                cu.mvd1 = (int(rng.randint(-15, 16)), int(rng.randint(-15, 16)))
                cu.mvp_idx = int(rng.randint(0, 2))
                cu.mvp_idx1 = int(rng.randint(0, 2))
        return cu

    _check(cfg, [
        {"tree_builder": _qt_tree(lambda x, y, l: _intra_cu(rng, x, y, l), 5), "poc": 0},
        {"tree_builder": _qt_tree(lambda x, y, l: _intra_cu(rng, x, y, l), 5), "poc": 2},
        {"tree_builder": _qt_tree(b_cu, 4), "slice_type": 0, "poc": 1,
         "ref_deltas": [1], "ref_deltas1": [-1]},
    ])


def test_gpm():
    """Geometric partitioning merge: split dirs, idx pairs, blend."""
    rng = np.random.RandomState(59)
    cfg = StreamConfig(width=128, height=128, deblocking=False, gpm=True)

    def b_cu(x, y, log2):
        cu = CU(x, y, log2, log2)
        cu.pred_mode = 1
        kind = rng.randint(0, 3)
        if kind == 0:
            cu.skip_flag = 1
            cu.merge_flag = 1
            if rng.rand() < 0.6:
                cu.gpm_flag = 1
                cu.gpm_split_dir = int(rng.randint(0, 64))
                cu.gpm_idx0 = int(rng.randint(0, 5))
                cu.gpm_idx1 = int(rng.choice([i for i in range(5) if i != cu.gpm_idx0]))
            else:
                cu.merge_idx = int(rng.randint(0, 5))
        elif kind == 1:
            cu.merge_flag = 1
            if rng.rand() < 0.6:
                cu.gpm_flag = 1
                cu.gpm_split_dir = int(rng.randint(0, 64))
                cu.gpm_idx0 = int(rng.randint(0, 5))
                cu.gpm_idx1 = int(rng.choice([i for i in range(5) if i != cu.gpm_idx0]))
            else:
                cu.merge_idx = int(rng.randint(0, 5))
            _add_luma_tu(rng, cu, x, y, log2, force=True)
            _add_chroma_tus(rng, cu, x, y, log2)
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

    _check(cfg, [
        {"tree_builder": _qt_tree(lambda x, y, l: _intra_cu(rng, x, y, l), 5)},
        {"tree_builder": _qt_tree(lambda x, y, l: _intra_cu(rng, x, y, l), 5)},
        {"tree_builder": _qt_tree(b_cu, 4), "slice_type": 0,
         "ref_deltas": [2, 1], "ref_deltas1": [1, 2]},
        {"tree_builder": _qt_tree(b_cu, 4), "slice_type": 0,
         "ref_deltas": [1, 3], "ref_deltas1": [2, 1]},
    ])


def test_sbt():
    """Sub-block transform: half/quad, hor/ver, both positions."""
    rng = np.random.RandomState(61)
    cfg = StreamConfig(width=128, height=128, deblocking=False, sbt=True, mts=True)

    def p_cu(x, y, log2):
        cu = CU(x, y, log2, log2)
        cu.pred_mode = 1
        cu.merge_flag = 0
        cu.ref_idx = 0
        cu.mvd = (int(rng.randint(-15, 16)), int(rng.randint(-15, 16)))
        cu.mvp_idx = int(rng.randint(0, 2))
        if rng.rand() < 0.75:
            cu.sbt_flag = 1
            cu.sbt_quad = int(rng.rand() < 0.4) if log2 >= 4 else 0
            cu.sbt_hor = int(rng.rand() < 0.5)
            cu.sbt_pos = int(rng.rand() < 0.5)
            sh = 2 if cu.sbt_quad else 1
            l2w = log2 - (0 if cu.sbt_hor else sh)
            l2h = log2 - (sh if cu.sbt_hor else 0)
            # SBT TU at CU-origin parse coords, reduced dims, luma + chroma
            lv = _sparse(rng, l2w, l2h, p=0.2)
            # MTS/SBT zero-out: no coeffs beyond 16 in a 32-dim
            if l2w == 5:
                lv[:, 16:] = 0
            if l2h == 5:
                lv[16:, :] = 0
            if not lv.any():
                lv[0, 0] = 5
            cu.tus.append(TU(x, y, l2w, l2h, 0, cbf=1, levels=lv,
                             last_pos=_find_last_pos_diag(lv, l2w, l2h)))
            if rng.rand() < 0.5 and l2w > 2 and l2h > 2:
                cv = _sparse(rng, l2w - 1, l2h - 1, p=0.2, mag=6)
                if cv.any():
                    cu.tus.append(TU(x >> 1, y >> 1, l2w - 1, l2h - 1, 1, cbf=1,
                                     levels=cv, last_pos=_find_last_pos_diag(cv, l2w - 1, l2h - 1)))
        else:
            _add_luma_tu(rng, cu, x, y, log2)
        return cu

    _check(cfg, [
        {"tree_builder": _qt_tree(lambda x, y, l: _intra_cu(rng, x, y, l), 5)},
        {"tree_builder": _qt_tree(p_cu, 4), "slice_type": 1, "ref_deltas": [1]},
        {"tree_builder": _qt_tree(p_cu, 5), "slice_type": 1, "ref_deltas": [1]},
    ])


def test_bdof_dmvr():
    """BDOF optical flow and DMVR refinement on merge bi CUs."""
    rng = np.random.RandomState(67)
    cfg = StreamConfig(width=128, height=128, deblocking=False,
                       bdof=True, dmvr=True)

    def b_cu(x, y, log2):
        cu = CU(x, y, log2, log2)
        cu.pred_mode = 1
        kind = rng.randint(0, 3)
        if kind == 0:
            cu.skip_flag = 1
            cu.merge_flag = 1
            cu.merge_idx = int(rng.randint(0, 5))
        elif kind == 1:
            cu.merge_flag = 1
            cu.merge_idx = int(rng.randint(0, 5))
            _add_luma_tu(rng, cu, x, y, log2, force=True)
            _add_chroma_tus(rng, cu, x, y, log2)
        else:
            cu.merge_flag = 0
            cu.inter_dir = 3
            cu.ref_idx = 0
            cu.ref_idx1 = 0
            cu.mvd = (int(rng.randint(-20, 21)), int(rng.randint(-20, 21)))
            cu.mvd1 = (int(rng.randint(-20, 21)), int(rng.randint(-20, 21)))
            cu.mvp_idx = int(rng.randint(0, 2))
            cu.mvp_idx1 = int(rng.randint(0, 2))
        return cu

    # B frame at POC 1 between POC 0 and POC 2: dist(+1, -1) is symmetric,
    # so BDOF/DMVR trigger on merge bi candidates
    _check(cfg, [
        {"tree_builder": _qt_tree(lambda x, y, l: _intra_cu(rng, x, y, l), 5), "poc": 0},
        {"tree_builder": _qt_tree(lambda x, y, l: _intra_cu(rng, x, y, l), 5), "poc": 2},
        {"tree_builder": _qt_tree(b_cu, 4), "slice_type": 0, "poc": 1,
         "ref_deltas": [1], "ref_deltas1": [-1]},
        {"tree_builder": _qt_tree(lambda x, y, l: _intra_cu(rng, x, y, l), 5), "poc": 4},
        {"tree_builder": _qt_tree(b_cu, 5), "slice_type": 0, "poc": 3,
         "ref_deltas": [1], "ref_deltas1": [-1]},
    ])


def test_inter_lmcs_sao():
    """LMCS reshaping on inter prediction + SAO/deblocking on P/B frames."""
    rng = np.random.RandomState(71)
    cfg = StreamConfig(width=128, height=128, deblocking=True, sao=True,
                       lmcs=True, lmcs_chroma_scaling=True)

    def p_cu(x, y, log2):
        if rng.rand() < 0.3:
            return _intra_cu(rng, x, y, log2)
        cu = CU(x, y, log2, log2)
        cu.pred_mode = 1
        kind = rng.randint(0, 3)
        if kind == 0:
            cu.skip_flag = 1
            cu.merge_flag = 1
            cu.merge_idx = int(rng.randint(0, 5))
        elif kind == 1:
            cu.merge_flag = 1
            cu.merge_idx = int(rng.randint(0, 5))
            _add_luma_tu(rng, cu, x, y, log2, force=True)
            _add_chroma_tus(rng, cu, x, y, log2)
        else:
            cu.merge_flag = 0
            cu.ref_idx = 0
            cu.mvd = (int(rng.randint(-15, 16)), int(rng.randint(-15, 16)))
            cu.mvp_idx = int(rng.randint(0, 2))
            if rng.rand() < 0.5:
                _add_luma_tu(rng, cu, x, y, log2)
        return cu

    _check(cfg, [
        {"tree_builder": _qt_tree(lambda x, y, l: _intra_cu(rng, x, y, l), 5)},
        {"tree_builder": _qt_tree(p_cu, 4), "slice_type": 1, "ref_deltas": [1]},
        {"tree_builder": _qt_tree(p_cu, 4), "slice_type": 1, "ref_deltas": [1]},
    ])

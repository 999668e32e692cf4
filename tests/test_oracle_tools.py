"""Oracle bit-exactness tests for coding tools: LFNST and SCIPU (local dual tree).

Parity targets: /root/reference/libovvc/rcn_lfnst.c, drv_lfnst.c (LFNST),
dec_ctu.c / vcl_coding_tree.c SCIPU handling (implicit separate trees when a
split would create chroma blocks below 16 samples).
"""

import os
import sys

import numpy as np
import pytest

from openvvc_tpu.decoder import decode_to_yuv
from openvvc_tpu.rcn.ref_mip import nb_mip_modes
from openvvc_tpu.testing.generator import (
    StreamConfig,
    build_stream,
    decode_with_oracle,
    rect_tree_builder,
)
from openvvc_tpu.vcl.coding_tree import NO_SPLIT, QT_SPLIT, TreeNode
from openvvc_tpu.vcl.ctu import CU, TU, TREE_DUAL_CHROMA, TREE_DUAL_LUMA
from openvvc_tpu.vcl.residual import diag_scan

sys.path.insert(0, os.path.dirname(__file__))
from test_residual import find_last_pos  # noqa: E402

pytestmark = pytest.mark.skipif(
    not os.path.exists("/tmp/refbuild/dectest"), reason="reference oracle not built"
)

_DIAG44 = diag_scan(4, 4)


def _lfnst_levels(rng, log2_w, log2_h):
    """Levels valid for LFNST: confined to the first 8/16 diagonal positions
    of the top-left 4x4 sub-block, not DC-only."""
    lv = np.zeros((1 << log2_h, 1 << log2_w), np.int32)
    nmax = 8 if (log2_w == log2_h and log2_w in (2, 3)) else 16
    for i in range(rng.randint(2, nmax + 1)):
        x, y = _DIAG44[i]
        lv[y, x] = rng.randint(-20, 21)
    if abs(lv).sum() == abs(lv[0, 0]):
        lv[1, 0] = 4
    return lv


def _lfnst_tree_builder(lw, lh, rng):
    """Every CTU carved into lw x lh CUs, each with a random LFNST index and
    valid levels (SCIPU chroma trees attached automatically)."""

    def make_cu(x, y, dual):
        cu = CU(x, y, lw, lh, intra_mode_l=int(rng.randint(0, 67)), intra_mode_c=0,
                tree_type=TREE_DUAL_LUMA if dual else 0)
        idx = int(rng.randint(1, 3))
        lv = _lfnst_levels(rng, lw, lh)
        tu = TU(x, y, lw, lh, 0, cbf=1, levels=lv, last_pos=find_last_pos(lv, lw, lh))
        tu.lfnst_idx = idx
        cu.tus.append(tu)
        cu.lfnst_idx = idx
        return TreeNode(NO_SPLIT, cu=cu)

    return rect_tree_builder(lw, lh, make_cu, rng)


def _chroma_leaf(rng, x, y, l2w, l2h):
    """A chroma CU covering the SCIPU region (luma coords x,y size l2w x l2h)."""
    ccu = CU(x >> 1, y >> 1, l2w - 1, l2h - 1, tree_type=TREE_DUAL_CHROMA,
             intra_mode_c=int(rng.randint(0, 2)))
    shape = (1 << (l2h - 1), 1 << (l2w - 1))
    clv = (rng.randint(-8, 9, shape) * (rng.rand(*shape) < 0.5)).astype(np.int32)
    if clv.any():
        ccu.tus.append(TU(x >> 1, y >> 1, l2w - 1, l2h - 1, 1, cbf=1,
                          levels=clv, last_pos=find_last_pos(clv, l2w - 1, l2h - 1)))
    return TreeNode(NO_SPLIT, cu=ccu)


@pytest.mark.parametrize("lw,lh", [(2, 2), (2, 3), (3, 3), (3, 4), (4, 3), (4, 4), (4, 5), (5, 5)])
def test_lfnst_sizes(lw, lh):
    rng = np.random.RandomState(lw * 16 + lh)
    size = 64 if max(lw, lh) <= 4 else 128
    cfg = StreamConfig(width=size, height=size, qp=30, deblocking=False, lfnst=True,
                       max_mtt_depth=4, min_cb_log2=2)
    stream = build_stream(cfg, _lfnst_tree_builder(lw, lh, rng))
    assert decode_with_oracle(stream) == decode_to_yuv(stream)


@pytest.mark.parametrize("lw,lh", [(2, 2), (3, 3), (2, 4), (4, 2), (4, 4), (3, 5),
                                   (6, 2), (4, 6), (6, 6)])
def test_mip_sizes(lw, lh):
    """MIP across size classes (4x4 / small / large), both transposes, with
    residual; availability-substituted boundaries at picture edges."""
    rng = np.random.RandomState(lw * 8 + lh)
    size = 64 if max(lw, lh) <= 4 else 128
    cfg = StreamConfig(width=size, height=size, qp=30, deblocking=False, mip=True,
                       max_mtt_depth=4, min_cb_log2=2)

    def make_cu(x, y, dual):
        cu = CU(x, y, lw, lh, intra_mode_l=0, intra_mode_c=0,
                tree_type=TREE_DUAL_LUMA if dual else 0)
        cu.mip_flag = 1
        cu.mip_transpose = int(rng.randint(0, 2))
        cu.mip_mode = int(rng.randint(0, nb_mip_modes(lw, lh)))
        if rng.rand() < 0.7:
            n, m = 1 << lh, 1 << lw
            lv = (rng.randint(-12, 13, (n, m)) * (rng.rand(n, m) < 0.2)).astype(np.int32)
            if not lv.any():
                lv[0, 0] = 2
            cu.tus.append(TU(x, y, lw, lh, 0, cbf=1, levels=lv,
                             last_pos=find_last_pos(lv, lw, lh)))
        return TreeNode(NO_SPLIT, cu=cu)

    stream = build_stream(cfg, rect_tree_builder(lw, lh, make_cu, rng))
    assert decode_with_oracle(stream) == decode_to_yuv(stream)


@pytest.mark.parametrize("cmode", [81, 82, 83])
@pytest.mark.parametrize("collocated", [False, True])
def test_cclm_modes(cmode, collocated):
    """CCLM (LT) and MDLM (L/T) with both luma downsampling filters
    (6-tap default, 5-tap vertical-collocated), with luma+chroma residual."""
    lw = lh = 3
    rng = np.random.RandomState(cmode * 2 + collocated)
    cfg = StreamConfig(width=64, height=64, qp=30, deblocking=False, cclm=True,
                       cclm_collocated=collocated, max_mtt_depth=4, min_cb_log2=2)

    def make_cu(x, y, dual):
        cu = CU(x, y, lw, lh, intra_mode_l=int(rng.randint(0, 67)),
                intra_mode_c=cmode, tree_type=TREE_DUAL_LUMA if dual else 0)
        lv = (rng.randint(-12, 13, (8, 8)) * (rng.rand(8, 8) < 0.2)).astype(np.int32)
        if not lv.any():
            lv[0, 0] = 2
        cu.tus.append(TU(x, y, lw, lh, 0, cbf=1, levels=lv,
                         last_pos=find_last_pos(lv, lw, lh)))
        clv = (rng.randint(-8, 9, (4, 4)) * (rng.rand(4, 4) < 0.3)).astype(np.int32)
        if clv.any():
            cu.tus.append(TU(x >> 1, y >> 1, 2, 2, 1, cbf=1, levels=clv,
                             last_pos=find_last_pos(clv, 2, 2)))
        return TreeNode(NO_SPLIT, cu=cu)

    stream = build_stream(cfg, rect_tree_builder(lw, lh, make_cu, rng))
    assert decode_with_oracle(stream) == decode_to_yuv(stream)


@pytest.mark.parametrize("lw,lh", [(2, 2), (3, 3), (4, 4), (3, 5), (4, 2)])
def test_mrl_sizes(lw, lh):
    """Multi-reference-line prediction (lines 1 and 2), MPM-coded modes, with
    residual; CTU-top rows fall back to line 0 as the syntax requires."""
    rng = np.random.RandomState(lw * 8 + lh + 31)
    size = 64 if max(lw, lh) <= 4 else 128
    cfg = StreamConfig(width=size, height=size, qp=30, deblocking=False, mrl=True,
                       max_mtt_depth=4, min_cb_log2=2)

    def make_cu(x, y, dual):
        cu = CU(x, y, lw, lh, intra_mode_l=0, intra_mode_c=0,
                tree_type=TREE_DUAL_LUMA if dual else 0)
        cu.mrl_idx = int(rng.randint(1, 3))
        cu.mpm_sel = int(rng.randint(1, 6))
        if rng.rand() < 0.7:
            n, m = 1 << lh, 1 << lw
            lv = (rng.randint(-12, 13, (n, m)) * (rng.rand(n, m) < 0.2)).astype(np.int32)
            if not lv.any():
                lv[0, 0] = 2
            cu.tus.append(TU(x, y, lw, lh, 0, cbf=1, levels=lv,
                             last_pos=find_last_pos(lv, lw, lh)))
        return TreeNode(NO_SPLIT, cu=cu)

    stream = build_stream(cfg, rect_tree_builder(lw, lh, make_cu, rng))
    assert decode_with_oracle(stream) == decode_to_yuv(stream)


@pytest.mark.parametrize("lw,lh", [(2, 2), (3, 3), (5, 5), (3, 4), (2, 4)])
def test_explicit_mts(lw, lh):
    """Explicit MTS: cu_mts_flag + up-to-3-bin index, DST7/DCT8 pairs; coeffs
    confined to the low-frequency 16x16 region as the syntax requires."""
    rng = np.random.RandomState(lw * 8 + lh)
    cfg = StreamConfig(width=64, height=64, qp=30, deblocking=False, mts=True,
                       explicit_mts_intra=True, max_mtt_depth=4, min_cb_log2=2)

    def make_cu(x, y, dual):
        cu = CU(x, y, lw, lh, intra_mode_l=int(rng.randint(0, 67)), intra_mode_c=0,
                tree_type=TREE_DUAL_LUMA if dual else 0)
        n, m = 1 << lh, 1 << lw
        lv = np.zeros((n, m), np.int32)
        lim_h, lim_w = min(n, 16), min(m, 16)
        sub = (rng.randint(-12, 13, (lim_h, lim_w)) * (rng.rand(lim_h, lim_w) < 0.25)).astype(np.int32)
        lv[:lim_h, :lim_w] = sub
        if not lv.any():
            lv[1, 0] = 2
        tu = TU(x, y, lw, lh, 0, cbf=1, levels=lv, last_pos=find_last_pos(lv, lw, lh))
        tu.mts_idx = int(rng.randint(0, 5))
        cu.tus.append(tu)
        return TreeNode(NO_SPLIT, cu=cu)

    stream = build_stream(cfg, rect_tree_builder(lw, lh, make_cu, rng))
    assert decode_with_oracle(stream) == decode_to_yuv(stream)


@pytest.mark.parametrize("lw,lh", [(2, 2), (3, 3), (4, 4), (4, 3)])
def test_transform_skip(lw, lh):
    """Transform-skip residual coding: forward scan, context signs, level
    prediction remap, bin budget; TS dequant with QpPrimeTsMin floor."""
    rng = np.random.RandomState(lw * 8 + lh)
    cfg = StreamConfig(width=64, height=64, qp=30, deblocking=False,
                       transform_skip=True, max_mtt_depth=4, min_cb_log2=2)

    def make_cu(x, y, dual):
        cu = CU(x, y, lw, lh, intra_mode_l=int(rng.randint(0, 67)), intra_mode_c=0,
                tree_type=TREE_DUAL_LUMA if dual else 0)
        n, m = 1 << lh, 1 << lw
        lv = (rng.randint(-6, 7, (n, m)) * (rng.rand(n, m) < 0.4)).astype(np.int32)
        if not lv.any():
            lv[0, 0] = 2
        tu = TU(x, y, lw, lh, 0, cbf=1, levels=lv)
        tu.transform_skip = 1
        cu.tus.append(tu)
        if lw > 2 and rng.rand() < 0.5:
            clv = (rng.randint(-5, 6, (n >> 1, m >> 1)) * (rng.rand(n >> 1, m >> 1) < 0.4)).astype(np.int32)
            if not clv.any():
                clv[0, 0] = 1
            ctu = TU(x >> 1, y >> 1, lw - 1, lh - 1, 1, cbf=1, levels=clv)
            ctu.transform_skip = 1
            cu.tus.append(ctu)
        return TreeNode(NO_SPLIT, cu=cu)

    stream = build_stream(cfg, rect_tree_builder(lw, lh, make_cu, rng))
    assert decode_with_oracle(stream) == decode_to_yuv(stream)


@pytest.mark.parametrize("lw,lh", [(2, 2), (3, 3), (4, 4)])
def test_bdpcm(lw, lh):
    """BDPCM luma+chroma: TS residual with bdpcm contexts, directional
    accumulation, pure H/V prediction without PDPC."""
    from openvvc_tpu.rcn.ref_intra import OVINTRA_HOR, OVINTRA_VER

    rng = np.random.RandomState(lw * 8 + lh + 5)
    cfg = StreamConfig(width=64, height=64, qp=30, deblocking=False,
                       transform_skip=True, bdpcm=True, max_mtt_depth=4, min_cb_log2=2)

    def make_cu(x, y, dual):
        cu = CU(x, y, lw, lh, intra_mode_l=0, intra_mode_c=0,
                tree_type=TREE_DUAL_LUMA if dual else 0)
        cu.bdpcm_l = 1
        cu.bdpcm_dir_l = int(rng.randint(0, 2))
        cu.intra_mode_l = OVINTRA_VER if cu.bdpcm_dir_l else OVINTRA_HOR
        n, m = 1 << lh, 1 << lw
        lv = (rng.randint(-4, 5, (n, m)) * (rng.rand(n, m) < 0.4)).astype(np.int32)
        if not lv.any():
            lv[0, 0] = 2
        tu = TU(x, y, lw, lh, 0, cbf=1, levels=lv)
        tu.transform_skip = 1
        tu.bdpcm = 1
        cu.tus.append(tu)
        if rng.rand() < 0.5 and lw > 2:
            cu.bdpcm_c = 1
            cu.bdpcm_dir_c = int(rng.randint(0, 2))
            cu.intra_mode_c = OVINTRA_VER if cu.bdpcm_dir_c else OVINTRA_HOR
            clv = (rng.randint(-4, 5, (n >> 1, m >> 1)) * (rng.rand(n >> 1, m >> 1) < 0.4)).astype(np.int32)
            if not clv.any():
                clv[0, 0] = 1
            ctu = TU(x >> 1, y >> 1, lw - 1, lh - 1, 1, cbf=1, levels=clv)
            ctu.transform_skip = 1
            ctu.bdpcm = 1
            cu.tus.append(ctu)
        return TreeNode(NO_SPLIT, cu=cu)

    stream = build_stream(cfg, rect_tree_builder(lw, lh, make_cu, rng))
    assert decode_with_oracle(stream) == decode_to_yuv(stream)


@pytest.mark.parametrize("lw,lh,subdiv,dbf", [
    (4, 4, 0, False), (3, 3, 2, False), (4, 3, 1, False), (3, 3, 2, True)])
def test_delta_qp(lw, lh, subdiv, dbf):
    """Per-group cu_qp_delta with (left+above+1)>>1 prediction, CTU-local qp
    maps, per-row carry; exercises wide QP range incl. dequant clip edge."""
    rng = np.random.RandomState(lw * 8 + lh + subdiv)
    cfg = StreamConfig(width=128, height=128, qp=30, deblocking=dbf, delta_qp=True,
                       delta_qp_subdiv=subdiv, max_mtt_depth=4, min_cb_log2=2)

    def make_cu(x, y, dual):
        cu = CU(x, y, lw, lh, intra_mode_l=int(rng.randint(0, 67)), intra_mode_c=0,
                tree_type=TREE_DUAL_LUMA if dual else 0)
        cu.cu_qp_delta = int(rng.randint(-6, 7))
        n, m = 1 << lh, 1 << lw
        lv = (rng.randint(-12, 13, (n, m)) * (rng.rand(n, m) < 0.25)).astype(np.int32)
        if not lv.any():
            lv[0, 0] = 2
        cu.tus.append(TU(x, y, lw, lh, 0, cbf=1, levels=lv,
                         last_pos=find_last_pos(lv, lw, lh)))
        if rng.rand() < 0.5:
            clv = (rng.randint(-8, 9, (n >> 1, m >> 1)) * (rng.rand(n >> 1, m >> 1) < 0.3)).astype(np.int32)
            if clv.any():
                cu.tus.append(TU(x >> 1, y >> 1, lw - 1, lh - 1, 1, cbf=1, levels=clv,
                                 last_pos=find_last_pos(clv, lw - 1, lh - 1)))
        return TreeNode(NO_SPLIT, cu=cu)

    stream = build_stream(cfg, rect_tree_builder(lw, lh, make_cu, rng))
    assert decode_with_oracle(stream) == decode_to_yuv(stream)


@pytest.mark.parametrize("lmin,cmin", [(4, 3), (3, 2)])
def test_dual_tree_intra(lmin, cmin):
    """sps_qtbtt_dual_tree_intra: separate luma/chroma quadtrees per 64x64,
    chroma modes incl. DM from collocated luma center."""
    from openvvc_tpu.vcl.coding_tree import QT_SPLIT

    rng = np.random.RandomState(40 + lmin + cmin)
    cfg = StreamConfig(width=128, height=128, qp=30, deblocking=False, dual_tree=True,
                       max_mtt_depth=2, min_cb_log2=2)

    def rand_lv(lw, lh, density=0.25):
        n, m = 1 << lh, 1 << lw
        lv = (rng.randint(-12, 13, (n, m)) * (rng.rand(n, m) < density)).astype(np.int32)
        if not lv.any():
            lv[0, 0] = 2
        return lv

    def luma_qt(x, y, l2):
        if l2 > lmin:
            h = 1 << (l2 - 1)
            return TreeNode(QT_SPLIT, children=[
                luma_qt(x, y, l2 - 1), luma_qt(x + h, y, l2 - 1),
                luma_qt(x, y + h, l2 - 1), luma_qt(x + h, y + h, l2 - 1)])
        cu = CU(x, y, l2, l2, intra_mode_l=int(rng.randint(0, 67)), intra_mode_c=0,
                tree_type=TREE_DUAL_LUMA)
        lv = rand_lv(l2, l2)
        cu.tus.append(TU(x, y, l2, l2, 0, cbf=1, levels=lv,
                         last_pos=find_last_pos(lv, l2, l2)))
        return TreeNode(NO_SPLIT, cu=cu)

    def chroma_qt(cx, cy, l2):
        if l2 > cmin:
            h = 1 << (l2 - 1)
            return TreeNode(QT_SPLIT, children=[
                chroma_qt(cx, cy, l2 - 1), chroma_qt(cx + h, cy, l2 - 1),
                chroma_qt(cx, cy + h, l2 - 1), chroma_qt(cx + h, cy + h, l2 - 1)])
        cu = CU(cx, cy, l2, l2, tree_type=TREE_DUAL_CHROMA)
        cu.cmode_sel = int(rng.randint(0, 5))
        if rng.rand() < 0.7:
            lv = rand_lv(l2, l2, 0.3)
            cu.tus.append(TU(cx, cy, l2, l2, 1, cbf=1, levels=lv,
                             last_pos=find_last_pos(lv, l2, l2)))
        return TreeNode(NO_SPLIT, cu=cu)

    def tb(params, entry):
        trees = {}
        clg = params.sps.ctb_log2
        for row in range(entry.nb_ctu_h):
            for col in range(entry.nb_ctu_w):
                cx, cy = entry.ctu_x + col, entry.ctu_y + row
                node = TreeNode(NO_SPLIT)
                node.luma_tree = luma_qt(cx << clg, cy << clg, clg)
                node.chroma_tree = chroma_qt((cx << clg) >> 1, (cy << clg) >> 1, clg - 1)
                trees[(cx, cy)] = node
        return trees

    stream = build_stream(cfg, tb)
    assert decode_with_oracle(stream) == decode_to_yuv(stream)


@pytest.mark.parametrize("tool", ["none", "lfnst", "mip", "dbf"])
def test_10bit(tool):
    """10-bit decoding across representative tools (bd-parameterized maths)."""
    from openvvc_tpu.rcn.ref_mip import nb_mip_modes as _nbm

    lw = lh = 4 if tool != "mip" else 3
    rng = np.random.RandomState(hash(tool) % 1000)
    cfg = StreamConfig(width=64, height=64, qp=32, deblocking=(tool == "dbf"),
                       bitdepth=10, lfnst=(tool == "lfnst"), mip=(tool == "mip"),
                       max_mtt_depth=4, min_cb_log2=2)

    def make_cu(x, y, dual):
        cu = CU(x, y, lw, lh, intra_mode_l=int(rng.randint(0, 67)), intra_mode_c=0,
                tree_type=TREE_DUAL_LUMA if dual else 0)
        n, m = 1 << lh, 1 << lw
        if tool == "mip":
            cu.mip_flag = 1
            cu.mip_transpose = int(rng.randint(0, 2))
            cu.mip_mode = int(rng.randint(0, _nbm(lw, lh)))
        if tool == "lfnst":
            cu.lfnst_idx = int(rng.randint(1, 3))
            lv = np.zeros((n, m), np.int32)
            for i in range(rng.randint(1, 16)):
                cx2, cy2 = _DIAG44[i]
                lv[cy2, cx2] = rng.randint(-15, 16)
            if not lv.any():
                lv[1, 0] = 3
        else:
            lv = (rng.randint(-20, 21, (n, m)) * (rng.rand(n, m) < 0.25)).astype(np.int32)
            if not lv.any():
                lv[0, 0] = 2
        tu = TU(x, y, lw, lh, 0, cbf=1, levels=lv, last_pos=find_last_pos(lv, lw, lh))
        tu.lfnst_idx = getattr(cu, "lfnst_idx", 0)
        cu.tus.append(tu)
        return TreeNode(NO_SPLIT, cu=cu)

    stream = build_stream(cfg, rect_tree_builder(lw, lh, make_cu, rng))
    assert decode_with_oracle(stream) == decode_to_yuv(stream)


def test_scipu_local_dual_tree():
    """QT down to 4x4 luma CUs: every 8x8 QT split triggers SCIPU; the shared
    chroma CU is coded in a local dual tree and the luma CUs are luma-only."""
    rng = np.random.RandomState(77)

    def luma_cu(x0, y0, lg, tree=0):
        cu = CU(x0, y0, lg, lg, intra_mode_l=int(rng.randint(0, 67)),
                intra_mode_c=0, tree_type=tree)
        if rng.rand() < 0.7:
            n = 1 << lg
            lv = (rng.randint(-10, 11, (n, n)) * (rng.rand(n, n) < 0.4)).astype(np.int32)
            if not lv.any():
                lv[0, 0] = 2
            cu.tus.append(TU(x0, y0, lg, lg, 0, cbf=1, levels=lv,
                             last_pos=find_last_pos(lv, lg, lg)))
        return cu

    def scipu_8x8(x0, y0):
        node = TreeNode(QT_SPLIT)
        for cx, cy in ((x0, y0), (x0 + 4, y0), (x0, y0 + 4), (x0 + 4, y0 + 4)):
            node.children.append(TreeNode(NO_SPLIT, cu=luma_cu(cx, cy, 2, TREE_DUAL_LUMA)))
        node.chroma_tree = _chroma_leaf(rng, x0, y0, 3, 3)
        node.mode_constraint = 1
        return node

    def build(x, y, lg):
        if lg > 3:
            h = 1 << (lg - 1)
            return TreeNode(QT_SPLIT, children=[
                build(x, y, lg - 1), build(x + h, y, lg - 1),
                build(x, y + h, lg - 1), build(x + h, y + h, lg - 1)])
        if rng.rand() < 0.6:
            return scipu_8x8(x, y)
        cu = luma_cu(x, y, 3)
        clv = (rng.randint(-8, 9, (4, 4)) * (rng.rand(4, 4) < 0.3)).astype(np.int32)
        if clv.any():
            cu.tus.append(TU(x >> 1, y >> 1, 2, 2, 1, cbf=1, levels=clv,
                             last_pos=find_last_pos(clv, 2, 2)))
        return TreeNode(NO_SPLIT, cu=cu)

    def tb(params, entry):
        trees = {}
        clg = params.sps.ctb_log2
        for row in range(entry.nb_ctu_h):
            for col in range(entry.nb_ctu_w):
                cx, cy = entry.ctu_x + col, entry.ctu_y + row
                trees[(cx, cy)] = build(cx << clg, cy << clg, clg)
        return trees

    cfg = StreamConfig(width=64, height=64, qp=32, deblocking=False,
                       min_cb_log2=2, min_qt_log2=2)
    stream = build_stream(cfg, tb)
    assert decode_with_oracle(stream) == decode_to_yuv(stream)


def _rand_sao(rng, nmax=7):
    from openvvc_tpu.vcl.sao import SAO_BAND, SaoParams

    sao = SaoParams()
    for c in [0, 1]:
        t = int(rng.randint(0, 3))
        for cc in ([0] if c == 0 else [1, 2]):
            sao.type_idx[cc] = t
            if t == 0:
                continue
            sao.offset_abs[cc] = [int(rng.randint(0, nmax + 1)) for _ in range(4)]
            if t == SAO_BAND:
                sao.offset_sign[cc] = [int(rng.randint(0, 2)) for _ in range(4)]
                sao.band_position[cc] = int(rng.randint(0, 29))
            else:
                sao.eo_class[cc] = int(rng.randint(0, 4))
    return sao


@pytest.mark.parametrize("label,kw", [
    ("single", dict(width=128, height=128)),
    ("single_dbf", dict(width=128, height=128, deblocking=True)),
    ("tiles_1row", dict(width=256, height=128, tile_cols=[2, 2], tile_rows=[1, 1])),
])
def test_sao(label, kw):
    """SAO band/edge/merge with the reference's line-pipeline border quirks."""
    rng = np.random.RandomState(9)
    base = dict(qp=32, deblocking=False, sao=True, max_mtt_depth=4, min_cb_log2=2)
    base.update(kw)
    cfg = StreamConfig(**base)
    lw = lh = 4

    def make_cu(x, y, dual):
        cu = CU(x, y, lw, lh, intra_mode_l=int(rng.randint(0, 67)), intra_mode_c=0,
                tree_type=TREE_DUAL_LUMA if dual else 0)
        n, m = 1 << lh, 1 << lw
        lv = (rng.randint(-12, 13, (n, m)) * (rng.rand(n, m) < 0.25)).astype(np.int32)
        if not lv.any():
            lv[0, 0] = 2
        cu.tus.append(TU(x, y, lw, lh, 0, cbf=1, levels=lv,
                         last_pos=find_last_pos(lv, lw, lh)))
        return TreeNode(NO_SPLIT, cu=cu)

    base_tb = rect_tree_builder(lw, lh, make_cu, rng)

    def tb(params, entry):
        trees = base_tb(params, entry)
        for (cx, cy), node in trees.items():
            r = rng.rand()
            if cx > entry.ctu_x and r < 0.2:
                node.sao_merge = 1
            elif cy > entry.ctu_y and r < 0.4:
                node.sao_merge = 2
            else:
                node.sao_merge = 0
                node.sao = _rand_sao(rng)
        return trees

    stream = build_stream(cfg, tb)
    assert decode_with_oracle(stream) == decode_to_yuv(stream)


@pytest.mark.parametrize("label,lp,dbf,crs_scaling", [
    ("curve", dict(cw_deltas={2: 10, 5: -8, 8: 16, 12: -12}), True, False),
    ("crs", dict(cw_deltas={3: 12, 9: -10}, crs=3), False, True),
])
def test_lmcs(label, lp, dbf, crs_scaling):
    """LMCS: forward/backward luma mapping LUTs from the APS piecewise model,
    chroma residual scaling from the mapped-luma neighbour average."""
    rng = np.random.RandomState(7)
    cfg = StreamConfig(width=128, height=128, qp=30, deblocking=dbf, lmcs=True,
                       lmcs_params=lp, lmcs_chroma_scaling=crs_scaling,
                       max_mtt_depth=4, min_cb_log2=2)
    lw = lh = 4

    def make_cu(x, y, dual):
        cu = CU(x, y, lw, lh, intra_mode_l=int(rng.randint(0, 67)), intra_mode_c=0,
                tree_type=TREE_DUAL_LUMA if dual else 0)
        n, m = 1 << lh, 1 << lw
        lv = (rng.randint(-12, 13, (n, m)) * (rng.rand(n, m) < 0.25)).astype(np.int32)
        if not lv.any():
            lv[0, 0] = 2
        cu.tus.append(TU(x, y, lw, lh, 0, cbf=1, levels=lv,
                         last_pos=find_last_pos(lv, lw, lh)))
        if rng.rand() < 0.6:
            clv = (rng.randint(-8, 9, (n >> 1, m >> 1)) * (rng.rand(n >> 1, m >> 1) < 0.3)).astype(np.int32)
            if clv.any():
                cu.tus.append(TU(x >> 1, y >> 1, lw - 1, lh - 1, 1, cbf=1, levels=clv,
                                 last_pos=find_last_pos(clv, lw - 1, lh - 1)))
        return TreeNode(NO_SPLIT, cu=cu)

    stream = build_stream(cfg, rect_tree_builder(lw, lh, make_cu, rng))
    assert decode_with_oracle(stream) == decode_to_yuv(stream)


@pytest.mark.parametrize("label,kw", [
    ("luma", dict(deblocking=False)),
    ("full", dict(alf_chroma=True, cc_alf=True, deblocking=True, sao=True)),
    ("partial_ctu", dict(width=96, height=80, alf_chroma=True, cc_alf=True, deblocking=False)),
    ("10bit", dict(bitdepth=10, alf_chroma=True, deblocking=False)),
])
def test_alf(label, kw):
    """ALF: classification, 7x7/5x5 clipped diamond filters, fixed+APS sets,
    chroma alternatives, CC-ALF, virtual boundaries."""
    from openvvc_tpu.vcl.alf import AlfCtuParams
    from openvvc_tpu.vcl.sao import SAO_BAND, SaoParams

    rng = np.random.RandomState(13)
    base = dict(width=128, height=128, qp=32, alf=True, max_mtt_depth=4, min_cb_log2=2)
    base.update(kw)
    use_sao = base.pop("sao", False)
    cfg = StreamConfig(sao=use_sao, **base)
    lw = lh = 4

    def make_cu(x, y, dual):
        cu = CU(x, y, lw, lh, intra_mode_l=int(rng.randint(0, 67)), intra_mode_c=0,
                tree_type=TREE_DUAL_LUMA if dual else 0)
        n, m = 1 << lh, 1 << lw
        lv = (rng.randint(-14, 15, (n, m)) * (rng.rand(n, m) < 0.3)).astype(np.int32)
        if not lv.any():
            lv[0, 0] = 2
        cu.tus.append(TU(x, y, lw, lh, 0, cbf=1, levels=lv,
                         last_pos=find_last_pos(lv, lw, lh)))
        return TreeNode(NO_SPLIT, cu=cu)

    base_tb = rect_tree_builder(lw, lh, make_cu, rng)
    chroma_on = kw.get("alf_chroma", False)
    cc_on = kw.get("cc_alf", False)

    def tb(params, entry):
        trees = base_tb(params, entry)
        for (cx, cy), node in trees.items():
            if use_sao:
                node.sao_merge = 0
                node.sao = _rand_sao(rng)
            p = AlfCtuParams()
            luma_on = rng.rand() < 0.85
            p.ctb_alf_flag = luma_on << 2
            if luma_on:
                p.ctb_alf_idx = int(rng.randint(0, 17))
            if chroma_on:
                cb, cr = rng.rand() < 0.7, rng.rand() < 0.7
                p.ctb_alf_flag |= (cb << 1) | cr
                if cb:
                    p.cb_alternative = int(rng.randint(0, 2))
                if cr:
                    p.cr_alternative = int(rng.randint(0, 2))
            if cc_on:
                p.cc_alf_idx = (int(rng.randint(0, 2)), int(rng.randint(0, 2)))
            node.alf = p
        return trees

    stream = build_stream(cfg, tb)
    assert decode_with_oracle(stream) == decode_to_yuv(stream)

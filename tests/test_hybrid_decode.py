"""Hybrid decode (batched device residuals + sequential prediction) must be
bit-identical to the scalar reference path."""

import os
import sys

import numpy as np
import pytest

from openvvc_tpu.decoder import Decoder
from openvvc_tpu.testing.generator import StreamConfig, build_stream, rect_tree_builder
from openvvc_tpu.vcl.coding_tree import NO_SPLIT, TreeNode
from openvvc_tpu.vcl.ctu import CU, TU, TREE_DUAL_LUMA

sys.path.insert(0, os.path.dirname(__file__))
from test_residual import find_last_pos  # noqa: E402


def _yuv(dec, stream):
    return b"".join(f.to_yuv_bytes() for f in dec.decode(stream))


@pytest.mark.parametrize("tools", [
    dict(),
    dict(mts=True, explicit_mts_intra=True),
    dict(dep_quant=True),
    dict(deblocking=True, sao=True),
])
def test_hybrid_matches_scalar(tools):
    rng = np.random.RandomState(3)
    use_sao = tools.pop("sao", False)
    cfg = StreamConfig(width=128, height=128, qp=30, deblocking=tools.pop("deblocking", False),
                       sao=use_sao, max_mtt_depth=4, min_cb_log2=2, **tools)
    lw = lh = 4

    def make_cu(x, y, dual):
        cu = CU(x, y, lw, lh, intra_mode_l=int(rng.randint(0, 67)), intra_mode_c=0,
                tree_type=TREE_DUAL_LUMA if dual else 0)
        n, m = 1 << lh, 1 << lw
        lv = (rng.randint(-12, 13, (n, m)) * (rng.rand(n, m) < 0.25)).astype(np.int32)
        if tools.get("explicit_mts_intra"):
            lv[16:, :] = 0
            lv[:, 16:] = 0
        if not lv.any():
            lv[0, 0] = 2
        tu = TU(x, y, lw, lh, 0, cbf=1, levels=lv, last_pos=find_last_pos(lv, lw, lh))
        if tools.get("explicit_mts_intra"):
            tu.mts_idx = int(rng.randint(0, 5))
        cu.tus.append(tu)
        if rng.rand() < 0.5:
            clv = (rng.randint(-8, 9, (n >> 1, m >> 1)) * (rng.rand(n >> 1, m >> 1) < 0.3)).astype(np.int32)
            if clv.any():
                cu.tus.append(TU(x >> 1, y >> 1, lw - 1, lh - 1, 1, cbf=1, levels=clv,
                                 last_pos=find_last_pos(clv, lw - 1, lh - 1)))
        return TreeNode(NO_SPLIT, cu=cu)

    base_tb = rect_tree_builder(lw, lh, make_cu, rng)

    def tb(params, entry):
        trees = base_tb(params, entry)
        if use_sao:
            for node in trees.values():
                node.sao_merge = 0
                from openvvc_tpu.vcl.sao import SaoParams
                sp = SaoParams()
                sp.type_idx[0] = SAO = 1
                sp.offset_abs[0] = [2, 1, 3, 1]
                sp.offset_sign[0] = [0, 1, 0, 1]
                sp.offset_val[0] = [2, -1, 3, -1, 0]
                sp.band_position[0] = 8
                node.sao = sp
        return trees

    stream = build_stream(cfg, tb)
    plain = _yuv(Decoder(), stream)
    hybrid = _yuv(Decoder(use_tpu_residuals=True), stream)
    assert plain == hybrid


def test_wavefront_mixed_sizes_matches_scalar():
    """Mixed-size quadtree intra + inter frames through the wavefront-batched
    device path (use_tpu_residuals) must equal the sequential scalar decode.
    Exercises the wave-map geometry (_recon_entry_waves) on irregular CU
    layouts, the batched-vs-scalar split within a wave, and the jnp DBF."""
    sys.path.insert(0, os.path.dirname(__file__))
    from test_oracle_dpb import _inter_cu, _intra_cu, _qt

    rng = np.random.RandomState(17)
    cfg = StreamConfig(width=128, height=128, deblocking=True, sao=True)
    from openvvc_tpu.testing.generator import build_stream_frames
    stream = build_stream_frames(cfg, [
        {"tree_builder": _qt(lambda x, y, l: _intra_cu(rng, x, y, l), 5)},
        {"tree_builder": _qt(lambda x, y, l: _inter_cu(rng, x, y, l), 4),
         "slice_type": 1, "ref_deltas": [1]},
    ])
    plain = _yuv(Decoder(), stream)
    os.environ["OPENVVC_WAVE_MIN_BATCH"] = "2"   # force batching of tiny groups
    try:
        hybrid = _yuv(Decoder(use_tpu_residuals=True), stream)
    finally:
        del os.environ["OPENVVC_WAVE_MIN_BATCH"]
    assert plain == hybrid

"""Native transform-skip: parse.c residual_coding_ts port + TS dequant in
recon.c must be oracle bit-exact and byte-identical to the Python lane,
including the LFNST / explicit-MTS gating interactions on mixed streams
(reference vcl_residual_coding.c residual_coding_ts :3576,
rcn_dequant.c derive_dequant_ts :139)."""

import os

import numpy as np
import pytest

from openvvc_tpu.native import load_cabac_lib
from openvvc_tpu.testing.generator import (StreamConfig, _find_last_pos_diag,
                                           build_stream, decode_with_oracle,
                                           rect_tree_builder)
from openvvc_tpu.vcl.coding_tree import NO_SPLIT, TreeNode
from openvvc_tpu.vcl.ctu import CU, TU

pytestmark = [
    pytest.mark.skipif(load_cabac_lib() is None,
                       reason="native library unavailable"),
    pytest.mark.skipif(not os.path.exists("/tmp/refbuild/dectest"),
                       reason="no oracle binary"),
]


def _decode_lanes(stream, oracle, tpu=False):
    from openvvc_tpu.decoder import Decoder

    os.environ["OPENVVC_NATIVE_ENTRY"] = "0"
    try:
        d = Decoder()
        py = b"".join(f.to_yuv_bytes() for f in d.output_order(d.decode(stream)))
    finally:
        os.environ.pop("OPENVVC_NATIVE_ENTRY", None)
    assert py == oracle, "python lane diverges from oracle"
    d = Decoder()
    nat = b"".join(f.to_yuv_bytes() for f in d.output_order(d.decode(stream)))
    assert nat == oracle, "native C lane diverges from oracle"
    if tpu:
        d = Decoder(use_tpu=True)
        dev = b"".join(f.to_yuv_bytes()
                       for f in d.output_order(d.decode(stream)))
        assert dev == oracle, "device lane diverges from oracle"
        assert d.stats.get("tpu_frames", 0) > 0, d.stats


@pytest.mark.parametrize("lw,lh", [(2, 2), (3, 3), (4, 4), (4, 3)])
def test_native_ts_all_sizes(lw, lh):
    rng = np.random.RandomState(lw * 8 + lh)
    cfg = StreamConfig(width=64, height=64, qp=30, deblocking=False,
                       transform_skip=True, max_mtt_depth=4, min_cb_log2=2)

    def make_cu(x, y, dual):
        cu = CU(x, y, lw, lh, intra_mode_l=int(rng.randint(0, 67)),
                intra_mode_c=0)
        n, m = 1 << lh, 1 << lw
        lv = (rng.randint(-6, 7, (n, m))
              * (rng.rand(n, m) < 0.4)).astype(np.int32)
        if not lv.any():
            lv[0, 0] = 2
        tu = TU(x, y, lw, lh, 0, cbf=1, levels=lv)
        tu.transform_skip = 1
        cu.tus.append(tu)
        if lw > 2 and rng.rand() < 0.5:
            clv = (rng.randint(-5, 6, (n >> 1, m >> 1))
                   * (rng.rand(n >> 1, m >> 1) < 0.4)).astype(np.int32)
            if not clv.any():
                clv[0, 0] = 1
            ctu = TU(x >> 1, y >> 1, lw - 1, lh - 1, 1, cbf=1, levels=clv)
            ctu.transform_skip = 1
            cu.tus.append(ctu)
        return TreeNode(NO_SPLIT, cu=cu)

    stream = build_stream(cfg, rect_tree_builder(lw, lh, make_cu, rng))
    oracle = decode_with_oracle(stream)
    _decode_lanes(stream, oracle)


def test_native_ts_mixed_lfnst_mts_jcbcr():
    """Mixed TS / DCT TBs with LFNST+MTS+joint-CbCr enabled: the ts_any /
    ts_luma gates must block LFNST and explicit MTS exactly like the
    Python parser; device lane merges TS host residuals with device DTU
    records for the other TBs."""
    rng = np.random.RandomState(11)
    cfg = StreamConfig(width=128, height=128, qp=30, deblocking=True,
                       sao=True, transform_skip=True, lfnst=True, mts=True,
                       explicit_mts_intra=True, joint_cbcr=True,
                       max_mtt_depth=4, min_cb_log2=2)

    def make_cu(x, y, dual):
        lw = lh = 4
        cu = CU(x, y, lw, lh, intra_mode_l=int(rng.randint(0, 67)),
                intra_mode_c=0)
        n, m = 1 << lh, 1 << lw
        lv = (rng.randint(-6, 7, (n, m))
              * (rng.rand(n, m) < 0.35)).astype(np.int32)
        if not lv.any():
            lv[0, 0] = 2
        ts = int(rng.rand() < 0.5)
        tu = TU(x, y, lw, lh, 0, cbf=1, levels=lv)
        tu.transform_skip = ts
        if not ts:
            tu.last_pos = _find_last_pos_diag(lv, lw, lh)
        cu.tus.append(tu)
        if rng.rand() < 0.6:
            clv = (rng.randint(-5, 6, (n >> 1, m >> 1))
                   * (rng.rand(n >> 1, m >> 1) < 0.35)).astype(np.int32)
            if not clv.any():
                clv[0, 0] = 1
            cts = int(rng.rand() < 0.5)
            comp = 3 if rng.rand() < 0.4 else 1
            ctu = TU(x >> 1, y >> 1, lw - 1, lh - 1, comp, cbf=1, levels=clv)
            if comp == 3:
                ctu.joint_cbcr = 3
            ctu.transform_skip = cts
            if not cts:
                ctu.last_pos = _find_last_pos_diag(clv, lw - 1, lh - 1)
            cu.tus.append(ctu)
        return TreeNode(NO_SPLIT, cu=cu)

    stream = build_stream(cfg, rect_tree_builder(4, 4, make_cu, rng))
    oracle = decode_with_oracle(stream)
    _decode_lanes(stream, oracle, tpu=True)


@pytest.mark.parametrize("lw,lh", [(2, 2), (3, 3), (4, 4), (4, 3)])
def test_native_bdpcm_with_dbf(lw, lh):
    """BDPCM luma+chroma under active deblocking: pure-copy prediction,
    TS accumulation, and the BDPCM boundary-strength rules (luma bs2
    filled at the CU, drv_intra.c:369; chroma bs1/bs2 both skipped,
    rcn_transform_tree.c:755/1368) on both lanes."""
    rng = np.random.RandomState(lw * 8 + lh + 5)
    cfg = StreamConfig(width=64, height=64, qp=30, deblocking=True,
                       transform_skip=True, bdpcm=True, max_mtt_depth=4,
                       min_cb_log2=2)

    def make_cu(x, y, dual):
        cu = CU(x, y, lw, lh, intra_mode_l=0, intra_mode_c=0)
        if rng.rand() < 0.7:
            cu.bdpcm_l = 1
            cu.bdpcm_dir_l = int(rng.randint(0, 2))
            cu.intra_mode_l = 50 if cu.bdpcm_dir_l else 18
        else:
            cu.intra_mode_l = int(rng.randint(0, 67))
        n, m = 1 << lh, 1 << lw
        lv = (rng.randint(-5, 6, (n, m))
              * (rng.rand(n, m) < 0.4)).astype(np.int32)
        if not lv.any():
            lv[0, 0] = 1
        tu = TU(x, y, lw, lh, 0, cbf=1, levels=lv)
        tu.transform_skip = 1
        tu.bdpcm = cu.bdpcm_l
        cu.tus.append(tu)
        if lw > 2 and rng.rand() < 0.6:
            cu.bdpcm_c = 1
            cu.bdpcm_dir_c = int(rng.randint(0, 2))
            cu.intra_mode_c = 50 if cu.bdpcm_dir_c else 18
            clv = (rng.randint(-4, 5, (n >> 1, m >> 1))
                   * (rng.rand(n >> 1, m >> 1) < 0.4)).astype(np.int32)
            if not clv.any():
                clv[0, 0] = 1
            ctu = TU(x >> 1, y >> 1, lw - 1, lh - 1, 1, cbf=1, levels=clv)
            ctu.transform_skip = 1
            ctu.bdpcm = 1
            cu.tus.append(ctu)
        return TreeNode(NO_SPLIT, cu=cu)

    stream = build_stream(cfg, rect_tree_builder(lw, lh, make_cu, rng))
    oracle = decode_with_oracle(stream)
    _decode_lanes(stream, oracle)

"""Native C B-slice + TMVP entry path: parity vs the Python path and the
reference oracle on reordered B pyramids with AMVR and TMVP.

Parity anchors: parse.c pred_unit_inter_b / derive_merge_mvp_b /
derive_mvp_cand with rpl_opp + TMVP candidates (drv/inter_mvp.py
derive_merge_mvp_b :541, derive_tmvp_amvp :213, _tmvp_scaled :201);
recon.c bi MC with identical-motion reduction (rcn_inter.c :255-267)."""

import os
import sys

import numpy as np
import pytest

import openvvc_tpu.native as nat
from openvvc_tpu.decoder import Decoder
from openvvc_tpu.testing.generator import (
    StreamConfig,
    build_stream_frames,
    decode_with_oracle,
)

sys.path.insert(0, os.path.dirname(__file__))
from test_oracle_dpb import _inter_cu, _intra_cu, _qt  # noqa: E402


def _stream(seed, **cfg_kw):
    rng = np.random.RandomState(seed)
    cfg = StreamConfig(width=256, height=128, deblocking=True, sao=True,
                       **cfg_kw)
    I = {"tree_builder": _qt(lambda x, y, l: _intra_cu(rng, x, y, l), 5)}

    def B(d0, d1, poc):
        return {"tree_builder": _qt(
            lambda x, y, l: _inter_cu(rng, x, y, l, len(d0), len(d1)), 4),
            "slice_type": 0, "poc": poc, "ref_deltas": d0,
            "ref_deltas1": d1}

    def P(d0, poc):
        return {"tree_builder": _qt(
            lambda x, y, l: _inter_cu(rng, x, y, l), 4),
            "slice_type": 1, "poc": poc, "ref_deltas": d0}

    return build_stream_frames(cfg, [
        I, P([4], 4), B([2], [-2], 2), B([1], [-1, -3], 1),
        B([3, 1], [-1], 3), P([4, 8], 8), B([2, 6], [-2], 6),
    ])


def _native_vs_python(stream):
    hits = [0, 0]
    orig = nat.recon_entry_native

    def spy(*a, **k):
        r = orig(*a, **k)
        hits[0 if r else 1] += 1
        return r

    nat.recon_entry_native = spy
    try:
        dn = Decoder()
        fn = dn.decode(stream)
    finally:
        nat.recon_entry_native = orig
    dp = Decoder(use_native_recon=False)
    fp = dp.decode(stream)
    for a, b in zip(fp, fn):
        assert np.array_equal(a.y, b.y) and np.array_equal(a.cb, b.cb) \
            and np.array_equal(a.cr, b.cr), f"poc {a.poc} differs"
    return hits, dn, fn


def test_native_b_slices_bit_exact():
    stream = _stream(41, amvr=True)
    hits, dn, fn = _native_vs_python(stream)
    assert hits[0] == 7 and hits[1] == 0, hits  # all frames native


@pytest.mark.skipif(not os.path.exists("/tmp/refbuild/dectest"),
                    reason="no oracle binary")
def test_native_b_tmvp_oracle():
    stream = _stream(43, amvr=True, tmvp=True)
    hits, dn, fn = _native_vs_python(stream)
    assert hits[0] == 7 and hits[1] == 0, hits
    ref = decode_with_oracle(stream)
    mine = b"".join(f.to_yuv_bytes() for f in dn.output_order(fn))
    assert mine == ref


def test_native_p_tmvp_bit_exact():
    rng = np.random.RandomState(47)
    cfg = StreamConfig(width=192, height=128, deblocking=True, tmvp=True)
    I = {"tree_builder": _qt(lambda x, y, l: _intra_cu(rng, x, y, l), 5)}

    def P(d0, poc):
        return {"tree_builder": _qt(
            lambda x, y, l: _inter_cu(rng, x, y, l, len(d0)), 4),
            "slice_type": 1, "poc": poc, "ref_deltas": d0}

    stream = build_stream_frames(cfg, [
        I, P([1], 1), P([1, 2], 2), P([1, 3], 3)])
    hits, dn, fn = _native_vs_python(stream)
    assert hits[0] == 4 and hits[1] == 0, hits


@pytest.mark.skipif(not os.path.exists("/tmp/refbuild/dectest"),
                    reason="no oracle binary")
def test_ra_pyramid_tmvp_col_ref_l0_oracle():
    """RA GOP-4 pyramid where the collocated picture is itself a B frame:
    pins the collocated-plane probe order (col_ref_l0, drv_mvp.c:431-433 /
    slicedec.c:1441-1443) — with sh_collocated_from_l0 and not low-delay
    the reference prefers the LIST-1 collocated plane."""
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import gen_bench_stream as g

    rng = np.random.RandomState(7)
    cfg = StreamConfig(width=256, height=128, deblocking=True, sao=True,
                       tmvp=True, amvr=True)
    I = {"tree_builder": g._qt_tree(
        lambda x, y, l: g._intra_cu(rng, x, y, l), 5)}
    specs = g.ra_frame_specs(9, rng, 4, g._qt_tree)
    stream = build_stream_frames(cfg, [I] + specs)
    ref = decode_with_oracle(stream)
    dec = Decoder()
    mine = b"".join(f.to_yuv_bytes()
                    for f in dec.output_order(dec.decode(stream)))
    assert mine == ref
    dec2 = Decoder(use_native_recon=False)
    mine2 = b"".join(f.to_yuv_bytes()
                     for f in dec2.output_order(dec2.decode(stream)))
    assert mine2 == ref

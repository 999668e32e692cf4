"""RPR (reference picture resampling) oracle tests.

Covers scaled-reference MC (rcn_inter.c rcn_mcp_rpr_l/_c/_bi :2026-2514):
dyadic and non-dyadic down/up ratios across the filter-selection bands
(compute_rpr_filter_idx :1991), explicit scaling windows, 10-bit, in-loop
filters on scaled frames, mixed-scale bi-prediction — and the RPR output
upscale (pp_sample_rate_conv, pp_pic_scale.c:250) against `dectest -u 1`.

The reference's own upscaler is 10-bit-only (pp_pic_scale.c:39 hardcodes
BITDEPTH 10 and reinterprets planes as uint16 — it aborts on 8-bit
streams), so upscale oracle coverage is 10-bit; the 8-bit path is
validated for self-consistency only (we exceed the reference there).
"""

import os
import subprocess
import sys
import tempfile

import numpy as np
import pytest

from openvvc_tpu.decoder import Decoder
from openvvc_tpu.testing.generator import (
    StreamConfig,
    build_stream_frames,
    decode_with_oracle,
)

sys.path.insert(0, os.path.dirname(__file__))
from test_oracle_dpb import _inter_cu, _intra_cu, _qt  # noqa: E402

pytestmark = pytest.mark.skipif(
    not os.path.exists("/tmp/refbuild/dectest"), reason="no oracle binary")


def _frames(rng, specs):
    out = []
    for kind, kw in specs:
        if kind == "I":
            out.append({"tree_builder": _qt(
                lambda x, y, l: _intra_cu(rng, x, y, l), 5), **kw})
        elif kind == "P":
            out.append({"tree_builder": _qt(
                lambda x, y, l: _inter_cu(rng, x, y, l), 4),
                "slice_type": 1, **kw})
        else:  # B
            nb0 = len(kw["ref_deltas"])
            nb1 = len(kw["ref_deltas1"])
            out.append({"tree_builder": _qt(
                lambda x, y, l: _inter_cu(rng, x, y, l, nb0, nb1), 4),
                "slice_type": 0, **kw})
    return out


def _check(cfg, specs, seed=7):
    rng = np.random.RandomState(seed)
    stream = build_stream_frames(cfg, _frames(rng, specs))
    ref = decode_with_oracle(stream)
    if ref is None:
        pytest.skip("reference decoder unavailable")
    dec = Decoder()
    mine = b"".join(f.to_yuv_bytes()
                    for f in dec.output_order(dec.decode(stream)))
    assert mine == ref


def test_rpr_downscale_upscale_dyadic():
    _check(StreamConfig(width=128, height=128, deblocking=False,
                        rpr_sizes=[(64, 64)]),
           [("I", {}), ("P", {"ref_deltas": [1], "pps_id": 1}),
            ("P", {"ref_deltas": [1], "pps_id": 0})])


def test_rpr_nondyadic_ratios():
    _check(StreamConfig(width=128, height=128, deblocking=False,
                        rpr_sizes=[(96, 64)]),
           [("I", {}), ("P", {"ref_deltas": [1], "pps_id": 1}),
            ("P", {"ref_deltas": [1], "pps_id": 0})], seed=11)


def test_rpr_filter_bands():
    """Ratios landing in each compute_rpr_filter_idx band (1.14x, 1.77x)."""
    _check(StreamConfig(width=128, height=128, deblocking=False,
                        rpr_sizes=[(72, 72), (112, 112)]),
           [("I", {}), ("P", {"ref_deltas": [1], "pps_id": 1}),
            ("P", {"ref_deltas": [1], "pps_id": 2}),
            ("P", {"ref_deltas": [1], "pps_id": 0})], seed=13)


def test_rpr_scaling_windows():
    _check(StreamConfig(width=128, height=128, deblocking=False,
                        rpr_sizes=[(64, 64)],
                        scaling_windows=[(2, 2, 1, 1), (1, 1, 2, 2)]),
           [("I", {}), ("P", {"ref_deltas": [1], "pps_id": 1}),
            ("P", {"ref_deltas": [1], "pps_id": 0})], seed=17)


def test_rpr_10bit():
    _check(StreamConfig(width=128, height=128, bitdepth=10, deblocking=False,
                        rpr_sizes=[(64, 64)]),
           [("I", {}), ("P", {"ref_deltas": [1], "pps_id": 1}),
            ("P", {"ref_deltas": [1], "pps_id": 0})], seed=19)


def test_rpr_with_loop_filters():
    _check(StreamConfig(width=128, height=128, deblocking=True, sao=True,
                        rpr_sizes=[(64, 64)]),
           [("I", {}), ("P", {"ref_deltas": [1], "pps_id": 1}),
            ("P", {"ref_deltas": [1], "pps_id": 0})], seed=23)


def test_rpr_bi_mixed_scale():
    """B slices where one list is scaled and the other is not
    (rcn_mc_rpr_b_l mixed dispatch, rcn_inter.c:2531-2562)."""
    _check(StreamConfig(width=128, height=128, deblocking=False,
                        rpr_sizes=[(64, 64)]),
           [("I", {}), ("P", {"ref_deltas": [1], "pps_id": 0}),
            ("B", {"ref_deltas": [2, 1], "ref_deltas1": [1], "pps_id": 1}),
            ("B", {"ref_deltas": [1, 3], "ref_deltas1": [2], "pps_id": 0})],
           seed=29)


def test_rpr_output_upscale_10bit():
    """Output upscale vs `dectest -u 1` (10-bit: the reference pp path)."""
    rng = np.random.RandomState(31)
    cfg = StreamConfig(width=128, height=128, bitdepth=10, deblocking=False,
                       rpr_sizes=[(64, 64), (96, 96)])
    stream = build_stream_frames(cfg, _frames(rng, [
        ("I", {}), ("P", {"ref_deltas": [1], "pps_id": 1}),
        ("P", {"ref_deltas": [1], "pps_id": 2})]))
    with tempfile.TemporaryDirectory() as td:
        with open(f"{td}/in.266", "wb") as f:
            f.write(stream)
        r = subprocess.run(
            ["/tmp/refbuild/dectest", "-i", f"{td}/in.266",
             "-o", f"{td}/out.yuv", "-u", "1"],
            capture_output=True, timeout=120)
        assert r.returncode == 0, r.stderr.decode()[-500:]
        with open(f"{td}/out.yuv", "rb") as f:
            ref = f.read()
    dec = Decoder(upscale=True)
    mine = b"".join(f.to_yuv_bytes()
                    for f in dec.output_order(dec.decode(stream)))
    assert mine == ref


def test_rpr_upscale_8bit_self_consistent():
    """8-bit upscale: reference aborts (10-bit-only pp); ours must produce
    in-range max-size frames deterministically."""
    rng = np.random.RandomState(37)
    cfg = StreamConfig(width=128, height=128, deblocking=False,
                       rpr_sizes=[(64, 64)])
    stream = build_stream_frames(cfg, _frames(rng, [
        ("I", {}), ("P", {"ref_deltas": [1], "pps_id": 1})]))
    dec = Decoder(upscale=True)
    frames = dec.output_order(dec.decode(stream))
    for f in frames:
        assert f.y.shape == (128, 128)
        assert f.y.min() >= 0 and f.y.max() <= 1023  # pp 10-bit clip quirk
    dec2 = Decoder(upscale=True)
    frames2 = dec2.output_order(dec2.decode(stream))
    assert all(np.array_equal(a.y, b.y) for a, b in zip(frames, frames2))

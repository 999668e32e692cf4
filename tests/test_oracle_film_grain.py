"""Film grain synthesis (SMPTE RDD-5) oracle tests: streams carrying a
film-grain-characteristics SEI must decode byte-identical to the reference
binary, whose output path applies fg_grain_apply_pic
(pp_film_grain.c:814, post_proc.c:107). Dimensions are kept multiples of 16
(the reference's 8x8 block loop has undefined behavior on 16-remainder
edges) and streams are 10-bit (its apply loop hardcodes bitDepth=10)."""

import os
import sys

import numpy as np
import pytest

from openvvc_tpu.decoder import Decoder
from openvvc_tpu.testing.generator import (StreamConfig, build_stream_frames,
                                           decode_with_oracle)

sys.path.insert(0, os.path.dirname(__file__))
from test_oracle_dpb import _inter_cu, _intra_cu, _qt  # noqa: E402

_FG_ALL = {
    "log2_scale": 5,
    "comps": {
        0: {"intervals": [(0, 255, [96, 8, 8])]},
        1: {"intervals": [(0, 255, [48, 4, 4])]},
        2: {"intervals": [(0, 255, [48, 5, 6])]},
    },
}


def _decode_mine(stream):
    dec = Decoder()
    return b"".join(f.to_yuv_bytes()
                    for f in dec.output_order(dec.decode(stream)))


def _run(cfg, frames):
    stream = build_stream_frames(cfg, frames)
    ref = decode_with_oracle(stream)
    if ref is None:
        pytest.skip("reference decoder unavailable")
    assert ref, "reference rejected the film grain stream"
    mine = _decode_mine(stream)
    assert mine == ref


def test_fg_intra_10bit_all_components():
    rng = np.random.RandomState(5)
    cfg = StreamConfig(width=256, height=128, bitdepth=10, deblocking=True,
                       film_grain=_FG_ALL)
    _run(cfg, [
        {"tree_builder": _qt(lambda x, y, l: _intra_cu(rng, x, y, l), 5)},
        {"tree_builder": _qt(lambda x, y, l: _intra_cu(rng, x, y, l), 4),
         "idr": True},
    ])


def test_fg_luma_only_multiple_intervals():
    rng = np.random.RandomState(6)
    fg = {
        "log2_scale": 4,
        "comps": {
            0: {"intervals": [(0, 100, [40, 9, 7]), (101, 255, [120, 12, 12])]},
        },
    }
    cfg = StreamConfig(width=128, height=128, bitdepth=10, film_grain=fg)
    _run(cfg, [
        {"tree_builder": _qt(lambda x, y, l: _intra_cu(rng, x, y, l), 5)},
    ])


def test_fg_inter_frames_grain_not_in_ref_pictures():
    """Grain is output-side only: inter frames predict from un-grained
    references (post_proc.c applies on a separate writable frame)."""
    rng = np.random.RandomState(7)
    cfg = StreamConfig(width=128, height=128, bitdepth=10, deblocking=True,
                       sao=True, film_grain=_FG_ALL)
    _run(cfg, [
        {"tree_builder": _qt(lambda x, y, l: _intra_cu(rng, x, y, l), 5)},
        {"tree_builder": _qt(lambda x, y, l: _inter_cu(rng, x, y, l), 4),
         "slice_type": 1, "ref_deltas": [1]},
        {"tree_builder": _qt(lambda x, y, l: _inter_cu(rng, x, y, l), 4),
         "slice_type": 1, "ref_deltas": [1]},
    ])


def test_fg_default_cutoffs_single_model_value():
    """num_model_values == 1: cutoffs default to 8 (fg_compute_model_values
    :791); chroma conversion halves std dev and doubles cutoffs."""
    rng = np.random.RandomState(8)
    fg = {"log2_scale": 5,
          "comps": {0: {"intervals": [(0, 255, [80])]},
                    1: {"intervals": [(0, 255, [60])]}}}
    cfg = StreamConfig(width=128, height=128, bitdepth=10, film_grain=fg)
    _run(cfg, [
        {"tree_builder": _qt(lambda x, y, l: _intra_cu(rng, x, y, l), 5)},
    ])

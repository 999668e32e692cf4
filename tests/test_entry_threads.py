"""Entry-level parallel runtime: multi-tile streams decoded with 2 entry
threads must be byte-identical to the sequential decode (and the oracle)."""

import os

import numpy as np
import pytest

from openvvc_tpu.decoder import Decoder
from openvvc_tpu.testing.generator import StreamConfig, build_stream_frames


def _stream():
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from test_oracle_dpb import _inter_cu, _intra_cu, _qt

    rng = np.random.RandomState(91)
    cfg = StreamConfig(width=256, height=128, deblocking=True, sao=True,
                       tile_cols=[2, 2])
    return build_stream_frames(cfg, [
        {"tree_builder": _qt(lambda x, y, l: _intra_cu(rng, x, y, l), 5)},
        {"tree_builder": _qt(lambda x, y, l: _inter_cu(rng, x, y, l), 4),
         "slice_type": 1, "ref_deltas": [1]},
    ])


def test_two_entry_threads_bit_exact():
    stream = _stream()
    seq = Decoder(nb_entry_threads=1)
    par = Decoder(nb_entry_threads=2)
    out_seq = b"".join(f.to_yuv_bytes() for f in seq.output_order(seq.decode(stream)))
    out_par = b"".join(f.to_yuv_bytes() for f in par.output_order(par.decode(stream)))
    assert out_seq == out_par


@pytest.mark.skipif(not os.path.exists("/tmp/refbuild/dectest"),
                    reason="no oracle binary")
def test_two_entry_threads_vs_oracle():
    from openvvc_tpu.testing.generator import decode_with_oracle

    stream = _stream()
    dec = Decoder(nb_entry_threads=2)
    mine = b"".join(f.to_yuv_bytes() for f in dec.output_order(dec.decode(stream)))
    ref = decode_with_oracle(stream)
    if ref is None:
        pytest.skip("reference decoder unavailable")
    assert ref == mine

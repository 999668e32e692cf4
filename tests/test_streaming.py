"""Streaming decode API: chunked demux (OVIO), submit/receive incremental
output with DPB reorder gating, constant memory (ovdmx.c:568 chunked
extraction; ovdec.h:85-154 submit/receive/drain; dpb.c:691-824 bumping)."""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _gen(path, **kw):
    if os.path.exists(path):
        return
    args = [sys.executable, os.path.join(REPO, "tools/gen_bench_stream.py"),
            "--out", path]
    for k, v in kw.items():
        args += [f"--{k}"] if v is None else [f"--{k}", str(v)]
    subprocess.run(args, check=True, capture_output=True, timeout=600)


@pytest.fixture(scope="module")
def ra_stream():
    path = "/tmp/streaming_ra.266"
    _gen(path, width=192, height=128, frames=9, gop="ra",
         **{"leaf-intra": 4, "leaf-inter": 4})
    with open(path, "rb") as f:
        return f.read()


def test_chunked_demux_parity(ra_stream):
    from openvvc_tpu.hls.nal import demux_annexb
    from openvvc_tpu.io import MemIO, demux_nals

    want = [(n.type, n.rbsp) for n in demux_annexb(ra_stream)]
    for chunk in (5, 64, 4096, 1 << 20):
        got = [(n.type, n.rbsp) for n in demux_nals(MemIO(ra_stream), chunk)]
        assert got == want, chunk


def test_streaming_matches_batch(ra_stream):
    from openvvc_tpu.decoder import Decoder
    from openvvc_tpu.io import MemIO

    batch = Decoder()
    frames = batch.decode(ra_stream)
    want = [f.to_yuv_bytes() for f in batch.output_order(frames)]

    stream_dec = Decoder()
    got = []
    backlog_high = 0
    for f in stream_dec.decode_stream(MemIO(ra_stream), chunk=512):
        got.append(f.to_yuv_bytes())
        backlog_high = max(backlog_high, len(stream_dec._out_ready))
    assert got == want
    # constant memory: the un-output backlog stays bounded by the reorder
    # depth, never the whole stream
    assert backlog_high <= stream_dec._max_reorder() + 2


def test_incremental_output_before_eos(ra_stream):
    """With 9 pictures and a small reorder depth, some pictures must be
    delivered before the stream ends (no end-of-stream sort)."""
    from openvvc_tpu.decoder import Decoder
    from openvvc_tpu.hls.nal import demux_annexb

    dec = Decoder()
    early = 0
    nals = demux_annexb(ra_stream)
    for nal in nals[:-1]:  # hold back the last NAL
        dec.submit_nal(nal)
        while dec.receive_frame() is not None:
            early += 1
    if dec._max_reorder() < 8:
        assert early > 0, "no incremental output before end of stream"
    rest = list(dec.drain())
    assert early + len(rest) <= 9


def test_streaming_cli(ra_stream):
    path = "/tmp/streaming_ra.266"
    r1 = subprocess.run([sys.executable, "-m", "openvvc_tpu", "-i", path,
                         "-o", "/dev/null", "--md5"],
                        capture_output=True, text=True, cwd=REPO,
                        timeout=560)
    r2 = subprocess.run([sys.executable, "-m", "openvvc_tpu", "-i", path,
                         "-o", "/dev/null", "--md5", "--streaming",
                         "-t", "2", "-e", "2"],
                        capture_output=True, text=True, cwd=REPO,
                        timeout=560)
    assert r1.returncode == 0 and r2.returncode == 0, (r1.stderr, r2.stderr)
    assert r1.stdout.strip() == r2.stdout.strip()

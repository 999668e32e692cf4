"""Device-residual TU path (tpu/resid_dense.py): the frame program's
dequant + inverse-LFNST + inverse-transform over C-emitted DTU records
must rebuild residual planes BITWISE equal to the host C path
(recon.c recon_tu_residual_c + ir_write_res), across the hostile
transform toolset (MTS explicit/implicit, LFNST, joint-CbCr, dep-quant),
and the end-to-end device lane must stay byte-identical."""

import os
import subprocess
import sys

import numpy as np
import pytest

from openvvc_tpu.native import load_cabac_lib

pytestmark = pytest.mark.skipif(load_cabac_lib() is None,
                                reason="native library unavailable")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _gen(path, extra=()):
    if os.path.exists(path):
        return
    subprocess.run(
        [sys.executable, os.path.join(REPO, "tools/gen_bench_stream.py"),
         "--out", path, "--width", "256", "--height", "192",
         "--frames", "3", "--tiles", "2", *extra],
        check=True, capture_output=True, timeout=600)


def _capture_planes(stream, env_val):
    """Decode on the device lane, snapshot the residual planes each frame
    sees (post-DTU-scatter when on, host-built when off)."""
    import jax.numpy as jnp

    import openvvc_tpu.tpu.frame_program as fp
    from openvvc_tpu.decoder import Decoder
    from openvvc_tpu.tpu import resid_dense

    prev = os.environ.get("OPENVVC_DEVICE_RESID")
    os.environ["OPENVVC_DEVICE_RESID"] = env_val
    snaps = []
    orig = fp.run_frame

    def spy(ddpb, slot, arrs, cfg):
        import jax

        if "dtu" in arrs:
            ry, rcb, rcr = resid_dense.apply_dtu(
                jnp, jax.tree.map(np.array, arrs["dtu"]),
                jnp.asarray(np.array(arrs["res_y"])),
                jnp.asarray(np.array(arrs["res_cb"])),
                jnp.asarray(np.array(arrs["res_cr"])), cfg.bd, cfg.chroma)
            snaps.append((np.array(ry), np.array(rcb), np.array(rcr),
                          int(sum(int((b["plane"] >= 0).sum())
                                  for b in arrs["dtu"].values()))))
        else:
            snaps.append((np.array(arrs["res_y"]),
                          np.array(arrs["res_cb"]),
                          np.array(arrs["res_cr"]), 0))
        return orig(ddpb, slot, arrs, cfg)

    fp.run_frame = spy
    try:
        dec = Decoder(use_tpu=True)
        out = dec.decode(stream)
        n = len(out)
        assert dec.stats.get("tpu_frames", 0) == n, dec.stats
        data = b"".join(f.to_yuv_bytes() for f in dec.output_order(out))
    finally:
        fp.run_frame = orig
        if prev is None:
            os.environ.pop("OPENVVC_DEVICE_RESID", None)
        else:
            os.environ["OPENVVC_DEVICE_RESID"] = prev
    return snaps, data


@pytest.mark.parametrize("profile,extra", [
    ("base", ()),
    ("alltools", ("--all-tools",)),
    ("intertools", ("--inter-tools",)),
])
def test_device_residual_planes_bitwise(profile, extra):
    path = f"/tmp/dtu_{profile}.266"
    _gen(path, extra)
    with open(path, "rb") as f:
        stream = f.read()
    on, data_on = _capture_planes(stream, "1")
    off, data_off = _capture_planes(stream, "0")
    assert len(on) == len(off) and len(on) > 0
    total = 0
    for i, (a, b) in enumerate(zip(on, off)):
        for nm, da, db in (("y", a[0], b[0]), ("cb", a[1], b[1]),
                           ("cr", a[2], b[2])):
            bad = int(np.count_nonzero(da != db))
            assert bad == 0, f"frame {i} plane {nm}: {bad} bytes differ"
        total += a[3]
    # the toolset must actually ride the device path (records emitted)
    assert total > 0, "no DTU records were shipped"
    assert data_on == data_off, "end-to-end device output differs"

"""ref_mc vs the reference decoder's own MC kernels (compiled harness).

Builds openvvc_tpu/testing/mc_harness.c against /root/reference/libovvc at
8- and 10-bit and compares every dumped output elementwise.
"""

import os
import subprocess

import numpy as np
import pytest

from openvvc_tpu.rcn import ref_mc

REF = "/root/reference/libovvc"
CFG = "/tmp/refbuild"
SRC = os.path.join(os.path.dirname(__file__), "..", "openvvc_tpu", "testing", "mc_harness.c")

pytestmark = pytest.mark.skipif(
    not (os.path.isdir(REF) and os.path.exists(os.path.join(CFG, "ovconfig.h"))),
    reason="reference sources unavailable")


def _run(bd):
    exe = f"/tmp/mc_harness_t{bd}"
    subprocess.run(["gcc", "-O2", f"-I{REF}", f"-I{CFG}", f"-DBITDEPTH={bd}",
                    "-o", exe, SRC], check=True, capture_output=True)
    out = subprocess.run([exe], capture_output=True, text=True, check=True).stdout
    return out.strip().split("\n")


@pytest.mark.parametrize("bd", [8, 10])
def test_mc_parity(bd):
    lines = _run(bd)
    it = iter(lines)
    plane = np.array(next(it).split(), np.int64).reshape(48, 64)
    ox = oy = 16
    W, H = 16, 8
    for fy in range(16):
        for fx in range(16):
            ref = np.array(next(it).split(), np.int64).reshape(H, W)
            mine = ref_mc.interp_14bit(plane, ox, oy, fx, fy, W, H, bd, luma=True)
            assert np.array_equal(ref, mine), f"14bit {fx},{fy}"
    for fy in range(16):
        for fx in range(16):
            ref = np.array(next(it).split(), np.int64).reshape(H, W)
            mine = ref_mc.mc_uni(plane, ox, oy, fx, fy, W, H, bd, luma=True)
            assert np.array_equal(ref, mine), f"uni {fx},{fy}"
    for fy in range(16):
        for fx in range(16):
            ref = np.array(next(it).split(), np.int64).reshape(4, 4)
            mine = ref_mc.interp_14bit(plane, ox, oy, fx, fy, 4, 4, bd, luma=True)
            assert np.array_equal(ref, mine), f"4x4 {fx},{fy}"
    for fy in range(0, 32, 3):
        for fx in range(0, 32, 3):
            ref = np.array(next(it).split(), np.int64).reshape(H, W)
            mine = ref_mc.interp_14bit(plane, ox, oy, fx, fy, W, H, bd, luma=False)
            assert np.array_equal(ref, mine), f"epel {fx},{fy}"
    ref = np.array(next(it).split(), np.int64).reshape(H, W)
    p0 = ref_mc.interp_14bit(plane, ox, oy, 5, 9, W, H, bd, luma=True)
    p1 = ref_mc.interp_14bit(plane, ox + 2, oy + 1, 7, 0, W, H, bd, luma=True)
    assert np.array_equal(ref, ref_mc.mc_bi(p1, p0, bd))
    ref = np.array(next(it).split(), np.int64).reshape(H, W)
    assert np.array_equal(ref, ref_mc.mc_bi_weighted(p0, p1, bd, 3, 5, 3))
    for fy in range(0, 16, 5):
        for fx in range(0, 16, 5):
            ref = np.array(next(it).split(), np.int64).reshape(H, W)
            mine = ref_mc.dmvr_bilinear(plane, ox, oy, fx, fy, W, H, bd)
            assert np.array_equal(ref, mine), f"bilin {fx},{fy}"

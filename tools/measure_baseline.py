"""Measure the reference decoder's fps — the "2x" denominator of BASELINE.json.

Runs /tmp/refperf/dectest (SIMD build, tools/build_reference_perf.sh) on the
generated 1080p benchmark stream at several thread configs, wall-clock timed,
and writes BASELINE_MEASURED.json at the repo root. The 8-thread number is
the official denominator; nproc is recorded since this host may have fewer
cores than the 8 threads requested.

Methodology parity: examples/dectest.c -i <s> -o /dev/null -t N -e N, as in
the reference CI (CI/ovnreg decode()).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

DECTEST = "/tmp/refperf/dectest"
STREAM = sys.argv[1] if len(sys.argv) > 1 else "/tmp/bench_1080p.266"
NB_FRAMES = int(sys.argv[2]) if len(sys.argv) > 2 else 17


def run(threads_f, threads_e, reps=3):
    best = None
    for _ in range(reps):
        t0 = time.monotonic()
        r = subprocess.run(
            [DECTEST, "-i", STREAM, "-o", "/dev/null",
             "-t", str(threads_f), "-e", str(threads_e)],
            capture_output=True, timeout=600)
        dt = time.monotonic() - t0
        assert r.returncode == 0, r.stderr[-500:]
        best = dt if best is None else min(best, dt)
    return NB_FRAMES / best, best


def main():
    out = {
        "stream": STREAM,
        "stream_bytes": os.path.getsize(STREAM),
        "nb_frames": NB_FRAMES,
        "nproc": os.cpu_count(),
        "binary": DECTEST + " (SIMD SSE4.1+AVX2 build, -O3)",
        "configs": {},
    }
    for tf, te in ((1, 1), (2, 2), (8, 8)):
        fps, secs = run(tf, te)
        out["configs"][f"t{tf}_e{te}"] = {"fps": round(fps, 2), "secs": round(secs, 3)}
        print(f"-t {tf} -e {te}: {fps:.2f} fps ({secs:.3f}s for {NB_FRAMES} frames)")
    out["ref_fps_8thread"] = out["configs"]["t8_e8"]["fps"]
    with open(os.path.join(os.path.dirname(__file__), "..", "BASELINE_MEASURED.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

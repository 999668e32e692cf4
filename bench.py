"""Benchmark entry point (driver-run on real TPU hardware).

Round-1 metric: batched intra-TB reconstruction throughput on one chip
(dequant + inverse DCT-II + residual add, exact integer math) over a
realistic TB size mix, in megasamples/s. vs_baseline normalizes against the
luma+chroma sample rate of 1080p60 4:2:0 (~187 Msamples/s) — i.e. how many
real-time 1080p60 streams worth of residual reconstruction one chip sustains.
As the toolset widens this will become end-to-end frames/s against the
measured reference-decoder baseline (BASELINE.md).

Prints exactly one JSON line.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from openvvc_tpu.rcn.jax_transform import reconstruct_residual_batch

    rng = np.random.RandomState(0)
    # TB mix roughly matching an intra frame: mostly 16x16/32x32, some 8x8
    cases = [
        (2048, 3, "DST7"),   # 8x8 DST7 (implicit MTS)
        (2048, 4, "DST7"),   # 16x16
        (512, 5, "DCT2"),    # 32x32
    ]
    compiled = []
    total_samples = 0
    for n, log2, tr in cases:
        s = 1 << log2
        levels = jnp.asarray(rng.randint(-128, 128, (n, s, s)), jnp.int32)
        qp = jnp.asarray(np.full(n, 32), jnp.int32)
        fn = jax.jit(
            lambda lv, q, tr=tr, log2=log2: reconstruct_residual_batch(
                lv, q, tr, tr, log2, log2, True, 8
            )
        )
        fn(levels, qp).block_until_ready()  # compile
        compiled.append((fn, levels, qp))
        total_samples += n * s * s

    # timed loop
    reps = 20
    t0 = time.perf_counter()
    for _ in range(reps):
        outs = [fn(lv, q) for fn, lv, q in compiled]
    for o in outs:
        o.block_until_ready()
    dt = time.perf_counter() - t0

    msps = total_samples * reps / dt / 1e6
    baseline_msps = 1920 * 1080 * 1.5 * 60 / 1e6  # 1080p60 4:2:0
    print(
        json.dumps(
            {
                "metric": "intra TB reconstruction throughput (dequant+invDCT+add)",
                "value": round(msps, 1),
                "unit": "Msamples/s",
                "vs_baseline": round(msps / baseline_msps, 2),
            }
        )
    )


if __name__ == "__main__":
    main()

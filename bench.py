"""Benchmark entry point (driver-run on real TPU hardware).

Round-1 metric: batched intra-TB residual reconstruction throughput on one
chip (dequant + inverse transform + clip, exact integer math), processing
one 4K-frame-equivalent of transform blocks per device launch with a
realistic size mix. vs_baseline normalizes against the luma+chroma sample
rate of 1080p60 4:2:0 (~187 Msamples/s): how many real-time 1080p60 streams
worth of residual reconstruction one chip sustains. As the host parse moves
to native code this will become end-to-end frames/s against the measured
reference-decoder baseline (BASELINE.md).

Prints exactly one JSON line.
"""

import json
import time

import jax
import numpy as np


def main():
    import jax.numpy as jnp

    from openvvc_tpu.rcn.jax_transform import reconstruct_residual_batch

    rng = np.random.RandomState(0)
    # One 4K 4:2:0 frame = 3840*2160*1.5 ~= 12.4M samples; realistic intra TB
    # mix by area: ~25% 8x8 (DST7), ~50% 16x16 (DST7), ~25% 32x32 (DCT2).
    frame_samples = 3840 * 2160 * 3 // 2
    cases = [
        (frame_samples // 4 // 64, 3, "DST7"),
        (frame_samples // 2 // 256, 4, "DST7"),
        (frame_samples // 4 // 1024, 5, "DCT2"),
    ]

    batches = []
    total_samples = 0
    for n, log2, _ in cases:
        s = 1 << log2
        levels = jnp.asarray(rng.randint(-128, 128, (n, s, s)), jnp.int32)
        qp = jnp.asarray(np.full(n, 32), jnp.int32)
        batches.append((levels, qp))
        total_samples += n * s * s

    @jax.jit
    def frame_step(b8, q8, b16, q16, b32, q32):
        o8 = reconstruct_residual_batch(b8, q8, "DST7", "DST7", 3, 3, True, 8)
        o16 = reconstruct_residual_batch(b16, q16, "DST7", "DST7", 4, 4, True, 8)
        o32 = reconstruct_residual_batch(b32, q32, "DCT2", "DCT2", 5, 5, True, 8)
        return o8, o16, o32

    args = [x for pair in batches for x in pair]
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), frame_step(*args))

    reps = 50
    t0 = time.perf_counter()
    for _ in range(reps):
        outs = frame_step(*args)
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), outs)
    dt = time.perf_counter() - t0

    msps = total_samples * reps / dt / 1e6
    baseline_msps = 1920 * 1080 * 1.5 * 60 / 1e6  # 1080p60 4:2:0
    print(
        json.dumps(
            {
                "metric": "intra TB residual reconstruction (4K-frame batches)",
                "value": round(msps, 1),
                "unit": "Msamples/s",
                "vs_baseline": round(msps / baseline_msps, 2),
            }
        )
    )


if __name__ == "__main__":
    main()

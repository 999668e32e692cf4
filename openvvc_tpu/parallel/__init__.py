"""Multi-chip decode runtime: the fused frame program sharded over a
jax.sharding.Mesh (tile-column bands, replicated reference stacks,
ppermute loop-filter halos).  See frame_shard.py for the sharding design
and dryrun.py for the bitwise single-vs-multi-device validation harness.
"""

from openvvc_tpu.parallel.frame_shard import (band_chroma_segments,  # noqa
                                              band_dbf_luma, band_jobs,
                                              make_mesh, pad_luma_grids,
                                              run_frame_sharded)

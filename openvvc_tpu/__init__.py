"""openvvc_tpu — a TPU-native VVC (H.266) decoder.

Host-side demux + CABAC entropy decoding emit per-CTU mode/residual tensors;
all pixel reconstruction runs as batched JAX/XLA/Pallas kernels on TPU.
See SURVEY.md for the architecture blueprint.
"""

__version__ = "0.1.0"

"""Extract the SMPTE RDD-5 film-grain constant tables into data_fg.npz.

The gaussian noise LUT, seed LUT, 64x64 integer IDCT basis and deblock
factors are normative constants of the SMPTE RDD-5 grain synthesis model
(mirrored in /root/reference/libovvc/pp_film_grain.c:70-563). This tool
parses them out of the reference source once; the committed
openvvc_tpu/rcn/data_fg.npz is what the decoder loads at runtime.

Usage: python tools/extract_fg_tables.py [path-to-pp_film_grain.c]
"""

import re
import sys

import numpy as np


def _parse_array(text, name):
    m = re.search(re.escape(name) + r"[^=]*=\s*\{(.*?)\};", text, re.S)
    if m is None:
        raise SystemExit(f"table {name} not found")
    body = re.sub(r"/\*.*?\*/|//[^\n]*", "", m.group(1), flags=re.S)
    return [int(v) for v in re.findall(r"-?\d+", body)]


def main():
    src = sys.argv[1] if len(sys.argv) > 1 else \
        "/root/reference/libovvc/pp_film_grain.c"
    with open(src) as f:
        text = f.read()
    gauss = np.asarray(_parse_array(text, "gaussianLUT"), np.int8)
    seed = np.asarray(_parse_array(text, "seedLUT"), np.uint32)
    idct = np.asarray(_parse_array(text, "R64_IDCT"), np.int32).reshape(64, 64)
    debl = np.asarray(_parse_array(text, "deblockFactor"), np.int32)
    assert gauss.shape == (2048,) and seed.shape == (256,) \
        and debl.shape == (13,)
    out = "openvvc_tpu/rcn/data_fg.npz"
    np.savez_compressed(out, gaussian=gauss, seed=seed, r64_idct=idct,
                        deblock_factor=debl)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()

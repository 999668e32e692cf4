"""Intra angular tables (normative: ITU-T H.266 Tables 27/30, 8.4.5.2).

Extracted from the reference (/root/reference/libovvc/data_rcn_angular.c:37-56,
rcn_intra_angular.c:43-76) -- spec constants. ANGLE/INVERSE_ANGLE indexed by
|mode_idx| (distance from pure H/V); CUBIC_FILTER: 32 phases x 4 taps (the
fG gauss taps are computed analytically); INTRA_FILTER_THR indexed by
(log2_w+log2_h)>>1 gates gauss filtering.
"""

import numpy as np

ANGLE_TABLE = [0, 1, 2, 3, 4, 6, 8, 10, 12, 14, 16, 18, 20, 23, 26, 29, 32, 35, 39, 45, 51, 57, 64, 73, 86, 102, 128, 171, 256, 341, 512, 1024]

INVERSE_ANGLE_TABLE = [0, 16384, 8192, 5461, 4096, 2731, 2048, 1638, 1365, 1170, 1024, 910, 819, 712, 630, 565, 512, 468, 420, 364, 321, 287, 256, 224, 191, 161, 128, 96, 64, 48, 32, 16]

INTRA_FILTER_THR = [24, 24, 24, 14, 2, 0, 0, 0]

CUBIC_FILTER = np.array([[0, 64, 0, 0], [-1, 63, 2, 0], [-2, 62, 4, 0], [-2, 60, 7, -1], [-2, 58, 10, -2], [-3, 57, 12, -2], [-4, 56, 14, -2], [-4, 55, 15, -2], [-4, 54, 16, -2], [-5, 53, 18, -2], [-6, 52, 20, -2], [-6, 49, 24, -3], [-6, 46, 28, -4], [-5, 44, 29, -4], [-4, 42, 30, -4], [-4, 39, 33, -4], [-4, 36, 36, -4], [-4, 33, 39, -4], [-4, 30, 42, -4], [-4, 29, 44, -5], [-4, 28, 46, -6], [-3, 24, 49, -6], [-2, 20, 52, -6], [-2, 18, 53, -5], [-2, 16, 54, -4], [-2, 15, 55, -4], [-2, 14, 56, -4], [-2, 12, 57, -3], [-2, 10, 58, -2], [-1, 7, 60, -2], [0, 4, 62, -2], [0, 2, 63, -1]], dtype=np.int64)

# gauss taps per phase f: (16 - f//2, 32 - f//2, 16 + f//2, f//2)
GAUSS_FILTER = np.array([[16 - (f >> 1), 32 - (f >> 1), 16 + (f >> 1), f >> 1] for f in range(32)], dtype=np.int64)

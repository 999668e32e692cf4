"""Array pools: recycle large numpy buffers across frames and decodes.

The reference maintains frame and MV-plane pools for the same reason
(/root/reference/libovvc/ovdpb.c picture pool, mempool.c): allocating is
cheap but *first-touching* fresh anonymous pages is not — on this host
class, faulting in 8 MB costs ~25 ms, an order of magnitude more than
re-zeroing warm pages. Decode allocates ~40 MB of working buffers per
1080p frame (planes + parse SoA buffers), so recycling is worth ~2x
end-to-end.

`give()` returns an array to the pool; `adopt(owner, arrays)` defers the
return until `owner` is garbage collected (used for frame planes, whose
lifetime is controlled by the caller/DPB, mirroring the reference's
ref-counted frame release into its pool).
"""

from __future__ import annotations

import threading
import weakref

import numpy as np


class ArrayPool:
    """Thread-safe free-list of numpy arrays keyed by (shape, dtype)."""

    def __init__(self, max_per_key: int = 8):
        self._free: dict[tuple, list[np.ndarray]] = {}
        self._lock = threading.Lock()
        self._max = max_per_key

    def _pop(self, shape, dtype):
        key = (shape, np.dtype(dtype).str)
        with self._lock:
            lst = self._free.get(key)
            return lst.pop() if lst else None

    def take(self, shape, dtype=np.int32) -> np.ndarray:
        """Array with UNDEFINED contents (np.empty semantics)."""
        shape = tuple(shape) if isinstance(shape, (tuple, list)) else (shape,)
        a = self._pop(shape, dtype)
        return a if a is not None else np.empty(shape, dtype)

    def take_zeroed(self, shape, dtype=np.int32) -> np.ndarray:
        shape = tuple(shape) if isinstance(shape, (tuple, list)) else (shape,)
        a = self._pop(shape, dtype)
        if a is None:
            return np.zeros(shape, dtype)
        a.fill(0)
        return a

    def give(self, *arrays: np.ndarray) -> None:
        with self._lock:
            for a in arrays:
                if a is None or a.base is not None:
                    continue  # never pool views
                key = (a.shape, a.dtype.str)
                lst = self._free.setdefault(key, [])
                if len(lst) < self._max:
                    lst.append(a)

    def adopt(self, owner, arrays) -> None:
        """Return `arrays` to the pool when `owner` is collected."""
        arrays = tuple(a for a in arrays if a is not None)
        if arrays:
            weakref.finalize(owner, self.give, *arrays)


GLOBAL = ArrayPool()

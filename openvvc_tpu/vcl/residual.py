"""Regular residual coding (RRC) — ITU-T H.266 7.3.11.11, 9.3.4.2.4-9.3.4.2.9.

Dep-quant and sign-data-hiding variants, all subblock shapes (4x4, 2x8, 8x2,
2x2, 1x16), 64/32-point zero-out, the 1.75*size remaining-bins budget with
bypass fallback (dec_abs_level + ZeroPos mapping), and truncated-Rice
remainders.

Behavior parity: /root/reference/libovvc/vcl_residual_coding.c (subblock cores
:518-1024, DPQ top-levels :1020-1200, SDH :1608-2160, small-TB chroma paths
:4080+) and the last-position readers vcl_transform_unit.c:210-350. The packed
u64 scan/offset maps of the reference are replaced by direct (x+y)-diagonal
formulas; the neighbor-sum buffers are 2-D arrays.

Decode fills a [h, w] numpy level array; encode emits the bins for a given
level array (used by the test-stream generator). The two share all context
derivation code so they cannot drift.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

from openvvc_tpu.cabac.ctx import CtxOffset

# dep-quant state machine (H.266 table 131): next_state[state][level_parity]
_DQ_NEXT = ((0, 2), (2, 0), (1, 3), (3, 1))

_RICE_TAB = bytes(
    [0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 1, 1, 1, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 3, 3, 3, 3]
)

_LAST_PREFIX_CTX = (0, 0, 0, 3, 6, 10, 15, 21)


@lru_cache(maxsize=None)
def diag_scan(w: int, h: int):
    """Up-right diagonal scan: list of (x, y), bottom-left first per diagonal."""
    order = []
    for d in range(w + h - 1):
        for y in range(min(d, h - 1), -1, -1):
            x = d - y
            if x < w:
                order.append((x, y))
    return tuple(order)


def sb_dims(log2_w: int, log2_h: int) -> tuple[int, int]:
    """Coefficient subblock dims (log2), spec 7.3.11.11."""
    if min(log2_w, log2_h) >= 2:
        return 2, 2
    if log2_w + log2_h <= 3:
        return min(log2_w, 1), min(log2_h, 1)
    if log2_w < 2:
        return log2_w, 4 - log2_w
    return 4 - log2_h, log2_h


class _NbrSums:
    """Neighbor sum buffers over the (reduced) TB, with template
    (right, right2, below, below-right, below2) contributing to earlier
    positions in reverse scan (equivalently: updates to left/above)."""

    def __init__(self, w: int, h: int):
        pad = 2
        self.pad = pad
        self.abs1 = np.zeros((h + pad, w + pad + 2), np.int32)
        self.abs2 = np.zeros((h + pad, w + pad + 2), np.int32)
        self.sig = np.zeros((h + pad, w + pad + 2), np.int32)

    def update_pass1(self, x: int, y: int, value: int):
        p = self.pad
        for a in (self.abs1, self.abs2):
            a[y + p, x + p - 1] += value
            a[y + p, x + p - 2] += value
            a[y + p - 1, x + p] += value
            a[y + p - 1, x + p - 1] += value
            a[y + p - 2, x + p] += value
        s = self.sig
        s[y + p, x + p - 1] += value - 1
        s[y + p, x + p - 2] += value - 1
        s[y + p - 1, x + p] += value - 1
        s[y + p - 1, x + p - 1] += value - 1
        s[y + p - 2, x + p] += value - 1

    def update_pass2(self, x: int, y: int, value: int):
        p = self.pad
        a = self.abs2
        for dy, dx in ((0, -1), (0, -2), (-1, 0), (-1, -1), (-2, 0)):
            a[y + p + dy, x + p + dx] = min(51, a[y + p + dy, x + p + dx] + value)

    def at(self, x: int, y: int):
        p = self.pad
        return (
            int(self.abs1[y + p, x + p]),
            int(self.abs2[y + p, x + p]),
            int(self.sig[y + p, x + p]),
        )


def _sig_offset(d: int, luma: bool) -> int:
    if luma:
        return 8 if d < 2 else (4 if d < 5 else 0)
    return 4 if d < 2 else 0


def _gt_offset(d: int, luma: bool) -> int:
    if luma:
        return 15 if d == 0 else (10 if d < 3 else (5 if d < 10 else 0))
    return 5 if d == 0 else 0


class _Rw:
    """Thin reader/writer shim over the CABAC io objects."""

    def __init__(self, io):
        self.io = io
        self.is_reader = io.is_reader

    def bin(self, ctx_idx, value=None):
        if self.is_reader:
            return self.io.raw_bin(ctx_idx)
        self.io.put_bin(value, ctx_idx)
        return value

    def bypass(self, value=None):
        if self.is_reader:
            return self.io.raw_bypass()
        self.io.put_bypass(value)
        return value

    def bypass_bits(self, n, value=None):
        if self.is_reader:
            return self.io.raw_bypass_bits(n)
        self.io.put_bypass_bits(value, n)
        return value


def _rice_decode(rw: _Rw, rice: int) -> int:
    prefix = 0
    while prefix < 17:
        if not rw.bypass():
            break
        prefix += 1
    if prefix < 5:
        return (prefix << rice) + rw.bypass_bits(rice) if rice else prefix
    length = rice + (15 - rice if prefix == 17 else prefix - 5)
    offset = ((1 << (prefix - 5)) + 4) << rice
    return offset + rw.bypass_bits(length) if length else offset


def _rice_encode(rw: _Rw, rice: int, value: int) -> None:
    if (value >> rice) < 5:
        prefix = value >> rice
        for _ in range(prefix):
            rw.bypass(1)
        rw.bypass(0)
        if rice:
            rw.bypass_bits(rice, value & ((1 << rice) - 1))
        return
    for prefix in range(5, 18):
        length = rice + (15 - rice if prefix == 17 else prefix - 5)
        offset = ((1 << (prefix - 5)) + 4) << rice
        if value < offset + (1 << length):
            for _ in range(prefix):
                rw.bypass(1)
            if prefix < 17:
                rw.bypass(0)
            if length:
                rw.bypass_bits(length, value - offset)
            return
    raise ValueError(f"rice value out of range: {value}")


def _rice(rw: _Rw, rice: int, value=None) -> int:
    if rw.is_reader:
        return _rice_decode(rw, rice)
    _rice_encode(rw, rice, value)
    return value


# ----------------------------------------------------------------------
# last significant coefficient position
# ----------------------------------------------------------------------


def _last_prefix(rw: _Rw, log2_d: int, log2_red: int, base: int, luma: bool, value=None) -> int:
    """TU-coded last_sig prefix for one dimension."""
    if luma:
        ctx_off = _LAST_PREFIX_CTX[log2_d]
        ctx_shift = (log2_red + 1) >> 2
    else:
        ctx_off = 0
        ctx_shift = max(0, min(2, (1 << log2_d) >> 3))
    max_sym = min(log2_red, 5) << 1
    if rw.is_reader:
        pos = 0
        while max_sym - 1 > pos and rw.bin(base + ctx_off + (pos >> ctx_shift)):
            pos += 1
            # loop structure mirrors while(--max_symbol > 0 && read)
        return pos
    # writer: value is the prefix
    prefix = value
    for k in range(prefix):
        rw.bin(base + ctx_off + (k >> ctx_shift), 1)
    if prefix < max_sym - 1:
        rw.bin(base + ctx_off + (prefix >> ctx_shift), 0)
    return prefix


def _prefix_of(v: int) -> tuple[int, int]:
    """(prefix, group_base) for a last-position component value."""
    if v < 4:
        return v, v
    prefix = 4
    while True:
        nbits = (prefix - 2) >> 1
        lo = (1 << ((prefix >> 1) - 1)) * (2 + (prefix & 1))
        if lo <= v < lo + (1 << nbits):
            return prefix, lo
        prefix += 1


def _last_suffix(rw: _Rw, prefix: int, value=None) -> int:
    """Bypass suffix for a prefix > 3; returns the full component value."""
    nbits = (prefix - 2) >> 1
    lo = (1 << ((prefix >> 1) - 1)) * (2 + (prefix & 1))
    if rw.is_reader:
        suffix = rw.bypass_bits(nbits) if nbits else 0
        return lo + suffix
    if nbits:
        rw.bypass_bits(nbits, value - lo)
    return value


def _last_position(rw: _Rw, log2_w, log2_h, lim_log2_w, lim_log2_h, luma: bool, last=None):
    """last_sig_coeff position: both ctx-coded prefixes first, then both
    bypass suffixes (spec 7.3.11.11 ordering)."""
    bx = int(CtxOffset.LAST_X if luma else CtxOffset.LAST_X_C)
    by = int(CtxOffset.LAST_Y if luma else CtxOffset.LAST_Y_C)
    if rw.is_reader:
        px = _last_prefix(rw, log2_w, lim_log2_w, bx, luma)
        py = _last_prefix(rw, log2_h, lim_log2_h, by, luma)
        last_x = _last_suffix(rw, px) if px > 3 else px
        last_y = _last_suffix(rw, py) if py > 3 else py
        return last_x, last_y
    last_x, last_y = last
    px, _ = _prefix_of(last_x)
    py, _ = _prefix_of(last_y)
    _last_prefix(rw, log2_w, lim_log2_w, bx, luma, px)
    _last_prefix(rw, log2_h, lim_log2_h, by, luma, py)
    if px > 3:
        _last_suffix(rw, px, last_x)
    if py > 3:
        _last_suffix(rw, py, last_y)
    return last_x, last_y


# ----------------------------------------------------------------------
# subblock coefficient coding
# ----------------------------------------------------------------------


class _TBState:
    def __init__(self, luma: bool, dep_quant: bool, sdh: bool, size: int):
        self.luma = luma
        self.dep_quant = dep_quant
        self.sdh = sdh
        self.rem_bins = ((size << 5) - (size << 2)) >> 4  # 1.75 * size
        self.state = 0
        if luma:
            self.sig_base = int(CtxOffset.SIG_FLAG)
            self.gt1_base = int(CtxOffset.GT0_FLAG)
            self.par_base = int(CtxOffset.PAR_FLAG)
            self.gt2_base = int(CtxOffset.GT1_FLAG)
            self.state_off = (0, 0, 12, 24)
        else:
            self.sig_base = int(CtxOffset.SIG_FLAG_C)
            self.gt1_base = int(CtxOffset.GT0_FLAG_C)
            self.par_base = int(CtxOffset.PAR_FLAG_C)
            self.gt2_base = int(CtxOffset.GT1_FLAG_C)
            self.state_off = (0, 0, 8, 16)


def _code_subblock(
    rw: _Rw,
    st: _TBState,
    nbr: _NbrSums,
    levels: np.ndarray,  # [h, w] signed TRANSMITTED levels (writer in, reader out)
    decoded: np.ndarray,  # [h, w] final decoded levels (dep-quant doubled)
    sb_x: int,
    sb_y: int,
    log2_sb_w: int,
    log2_sb_h: int,
    start_pos: int,  # scan pos of first decoded coeff (inclusive); sb_size-1 for full
    is_first_sb: bool,  # sb containing last_pos (first coeff implicit sig)
    is_dc_sb: bool,  # DC subblock (no sig inference at scan end)
):
    """Code one subblock; returns number of significant coeffs."""
    sw, sh = 1 << log2_sb_w, 1 << log2_sb_h
    scan = diag_scan(sw, sh)
    x0, y0 = sb_x << log2_sb_w, sb_y << log2_sb_h

    sig_idx: list[tuple[int, int]] = []
    gt2_idx: list[tuple[int, int]] = []
    dep_map: list[int] = []
    abs_lvl = {}

    def wlevel(x, y):
        return abs(int(levels[y0 + y, x0 + x]))

    def code_level_pass1(lx, ly, gt_ctx_off):
        """gt1/par/gt2 bins for a significant coeff; returns pass-1 value."""
        if rw.is_reader:
            gt1 = rw.bin(st.gt1_base + gt_ctx_off)
            st.rem_bins -= 1
            coeff = 1 + gt1
            if gt1:
                par = rw.bin(st.par_base + gt_ctx_off)
                gt2 = rw.bin(st.gt2_base + gt_ctx_off)
                st.rem_bins -= 2
                coeff += par + 2 * gt2
                if gt2:
                    gt2_idx.append((lx, ly))
            return coeff
        v = wlevel(lx, ly)
        pass1 = min(v, 4 + (v & 1))
        gt1 = 1 if pass1 > 1 else 0
        rw.bin(st.gt1_base + gt_ctx_off, gt1)
        st.rem_bins -= 1
        if gt1:
            rw.bin(st.par_base + gt_ctx_off, (pass1 - 2) & 1)
            gt2 = 1 if pass1 > 3 else 0
            rw.bin(st.gt2_base + gt_ctx_off, gt2)
            st.rem_bins -= 2
            if gt2:
                gt2_idx.append((lx, ly))
        return pass1

    def note_sig(lx, ly, coeff):
        dep_map.append(st.state >> 1)
        sig_idx.append((lx, ly))
        abs_lvl[(lx, ly)] = coeff
        nbr.update_pass1(x0 + lx, y0 + ly, coeff)

    scan_pos = start_pos

    # implicit first coefficient of the TB (at last_pos): gt ctx offset 0
    if is_first_sb:
        lx, ly = scan[scan_pos]
        coeff = code_level_pass1(lx, ly, 0)
        if not rw.is_reader:
            assert wlevel(lx, ly) > 0, "last_pos coefficient must be significant"
        note_sig(lx, ly, coeff)
        st.state = _DQ_NEXT[st.state][coeff & 1] if st.dep_quant else 0
        scan_pos -= 1

    # first pass --------------------------------------------------------
    while scan_pos >= 0 and st.rem_bins >= 4:
        lx, ly = scan[scan_pos]
        gx, gy = x0 + lx, y0 + ly
        d = gx + gy
        a1, _, sg = nbr.at(gx, gy)
        if scan_pos == 0 and not is_dc_sb and not is_first_sb and len(sig_idx) == 0:
            sig = 1  # inferred DC-of-subblock significance
        else:
            ctx = st.sig_base + st.state_off[st.state] + min((a1 + 1) >> 1, 3) + _sig_offset(d, st.luma)
            sig = rw.bin(ctx, None if rw.is_reader else (1 if wlevel(lx, ly) else 0))
            st.rem_bins -= 1
        coeff = 0
        if sig:
            gt_ctx_off = 1 + min(sg, 4) + _gt_offset(d, st.luma)
            coeff = code_level_pass1(lx, ly, gt_ctx_off)
            note_sig(lx, ly, coeff)
        st.state = _DQ_NEXT[st.state][coeff & 1] if st.dep_quant else 0
        scan_pos -= 1

    # pass 2: rice remainders for gt2 coeffs -----------------------------
    for lx, ly in gt2_idx:
        gx, gy = x0 + lx, y0 + ly
        _, a2, _ = nbr.at(gx, gy)
        rice = _RICE_TAB[max(0, min(a2 - 20, 31))]
        if rw.is_reader:
            rem = _rice(rw, rice)
            if rem:
                nbr.update_pass2(gx, gy, 2 * rem)
                abs_lvl[(lx, ly)] += 2 * rem
        else:
            v = wlevel(lx, ly)
            pass1 = min(v, 4 + (v & 1))
            rem = (v - pass1) >> 1
            _rice(rw, rice, rem)
            if rem:
                nbr.update_pass2(gx, gy, 2 * rem)
                abs_lvl[(lx, ly)] += 2 * rem

    # bypass tail (budget exhausted) -------------------------------------
    while scan_pos >= 0:
        lx, ly = scan[scan_pos]
        gx, gy = x0 + lx, y0 + ly
        _, a2, _ = nbr.at(gx, gy)
        rice = _RICE_TAB[min(31, a2)]
        zero_pos = ((1 if st.state < 2 else 2) if st.dep_quant else 1) << rice
        if rw.is_reader:
            v = _rice(rw, rice)
            if v == zero_pos:
                value = 0
            elif v < zero_pos:
                value = v + 1
            else:
                value = v
        else:
            value = wlevel(lx, ly)
            if value == 0:
                v = zero_pos
            elif value <= zero_pos:
                v = value - 1
            else:
                v = value
            _rice(rw, rice, v)
        if value:
            nbr.update_pass2(gx, gy, value)
            dep_map.append(st.state >> 1)
            sig_idx.append((lx, ly))
            abs_lvl[(lx, ly)] = value
        st.state = _DQ_NEXT[st.state][value & 1] if st.dep_quant else 0
        scan_pos -= 1

    # signs ---------------------------------------------------------------
    nb_sig = len(sig_idx)
    if st.dep_quant:
        if rw.is_reader:
            signs = [rw.bypass() for _ in range(nb_sig)]
        else:
            signs = []
            for lx, ly in sig_idx:
                s = 1 if levels[y0 + ly, x0 + lx] < 0 else 0
                rw.bypass(s)
                signs.append(s)
        for k, (lx, ly) in enumerate(sig_idx):
            a = abs_lvl[(lx, ly)]
            if rw.is_reader:
                levels[y0 + ly, x0 + lx] = -a if signs[k] else a
            final = (a << 1) - dep_map[k]
            decoded[y0 + ly, x0 + lx] = -final if signs[k] else final
    else:
        # SDH or plain signs
        use_sdh = 0
        if st.sdh and nb_sig:
            scan_index = {pos: i for i, pos in enumerate(scan)}
            first_nz = scan_index[sig_idx[0]]
            last_nz = scan_index[sig_idx[-1]]
            use_sdh = 1 if (first_nz - last_nz) >= 4 else 0
        if rw.is_reader:
            signs = [rw.bypass() for _ in range(nb_sig - use_sdh)]
            sum_par = 0
            for k, (lx, ly) in enumerate(sig_idx):
                a = abs_lvl[(lx, ly)]
                sum_par ^= a
                if k < nb_sig - use_sdh:
                    s = signs[k]
                else:
                    s = sum_par & 1
                levels[y0 + ly, x0 + lx] = -a if s else a
                decoded[y0 + ly, x0 + lx] = -a if s else a
        else:
            for lx, ly in sig_idx:
                decoded[y0 + ly, x0 + lx] = int(levels[y0 + ly, x0 + lx])
            for lx, ly in sig_idx[: nb_sig - use_sdh]:
                rw.bypass(1 if levels[y0 + ly, x0 + lx] < 0 else 0)
            if use_sdh:
                lx, ly = sig_idx[-1]
                v = int(levels[y0 + ly, x0 + lx])
                par = 0
                for lx2, ly2 in sig_idx:
                    par ^= abs(int(levels[y0 + ly2, x0 + lx2]))
                assert (v < 0) == bool(par & 1), "SDH parity violated by generator"
    return nb_sig


def residual_coding(
    io,
    levels: np.ndarray | None,
    log2_w: int,
    log2_h: int,
    luma: bool,
    dep_quant: bool,
    sdh: bool,
    last_pos: tuple[int, int] | None = None,
    mts_reduced: bool = False,
    code_last_pos: bool = True,
):
    """Code one transform block's coefficients.

    Returns (levels, decoded, (last_x, last_y), sig_sb_map) where `levels`
    are the transmitted levels and `decoded` the final TransCoeffLevels (for
    dep-quant these are the doubled/state-adjusted values fed to dequant).

    Writer: `levels` holds transmitted levels (abs magnitude + sign) and
    last_pos must be the scan-order last significant coefficient position.
    """
    rw = _Rw(io)
    w, h = 1 << log2_w, 1 << log2_h
    # zero-out: coded area
    red_log2_w = min(log2_w, 5)
    red_log2_h = min(log2_h, 5)
    lim_log2_w = red_log2_w - (1 if mts_reduced and log2_w == 5 else 0)
    lim_log2_h = red_log2_h - (1 if mts_reduced and log2_h == 5 else 0)

    if rw.is_reader:
        levels = np.zeros((h, w), np.int32)
    decoded = np.zeros((h, w), np.int32)

    # ---- last position --------------------------------------------------
    if not code_last_pos:
        last_x, last_y = last_pos
    elif rw.is_reader:
        last_x, last_y = _last_position(rw, log2_w, log2_h, lim_log2_w, lim_log2_h, luma)
    else:
        last_x, last_y = _last_position(rw, log2_w, log2_h, lim_log2_w, lim_log2_h, luma, last_pos)

    st = _TBState(luma, dep_quant, sdh, 1 << (lim_log2_w + lim_log2_h))

    # ---- DC-only shortcut ----------------------------------------------
    if last_x == 0 and last_y == 0:
        gt_base = st.gt1_base
        if rw.is_reader:
            gt1 = rw.bin(gt_base)
            value = 1 + gt1
            if gt1:
                par = rw.bin(st.par_base)
                gt2 = rw.bin(st.gt2_base)
                value += par + 2 * gt2
                if gt2:
                    value += _rice(rw, 0) * 2
            sign = rw.bypass()
            levels[0, 0] = -value if sign else value
            a = (value << 1) if dep_quant else value
            decoded[0, 0] = -a if sign else a
        else:
            v = abs(int(levels[0, 0]))
            pass1 = min(v, 4 + (v & 1))
            gt1 = 1 if pass1 > 1 else 0
            rw.bin(gt_base, gt1)
            if gt1:
                rw.bin(st.par_base, (pass1 - 2) & 1)
                gt2 = 1 if pass1 > 3 else 0
                rw.bin(st.gt2_base, gt2)
                if gt2:
                    _rice(rw, 0, (v - pass1) >> 1)
            rw.bypass(1 if int(levels[0, 0]) < 0 else 0)
            a = (v << 1) if dep_quant else v
            decoded[0, 0] = -a if int(levels[0, 0]) < 0 else a
        return levels, decoded, (0, 0), 0x1

    log2_sb_w, log2_sb_h = sb_dims(lim_log2_w, lim_log2_h)
    sb_cols = 1 << max(0, lim_log2_w - log2_sb_w)
    sb_rows = 1 << max(0, lim_log2_h - log2_sb_h)
    sb_scan = diag_scan(sb_cols, sb_rows)
    sb_scan_index = {pos: i for i, pos in enumerate(sb_scan)}
    inner_scan = diag_scan(1 << log2_sb_w, 1 << log2_sb_h)
    inner_index = {pos: i for i, pos in enumerate(inner_scan)}

    nbr = _NbrSums(1 << lim_log2_w, 1 << lim_log2_h)

    last_sb_x, last_sb_y = last_x >> log2_sb_w, last_y >> log2_sb_h
    last_sb_num = sb_scan_index[(last_sb_x, last_sb_y)]
    start_idx = inner_index[(last_x & ((1 << log2_sb_w) - 1), last_y & ((1 << log2_sb_h) - 1))]

    sig_sb_map = 0
    nb_sig = 0

    sig_sb = np.zeros((sb_rows, sb_cols), np.uint8)

    # last subblock (implicit significant)
    sig_sb[last_sb_y, last_sb_x] = 1
    sig_sb_map |= 1 << (last_sb_x + (last_sb_y << 3))
    is_dc = last_sb_num == 0
    nb_sig += _code_subblock(
        rw, st, nbr, levels, decoded, last_sb_x, last_sb_y, log2_sb_w, log2_sb_h,
        start_idx, True, is_dc,
    )
    if is_dc:
        return levels, decoded, (last_x, last_y), sig_sb_map | 1

    # middle subblocks
    for sb_num in range(last_sb_num - 1, 0, -1):
        sx, sy = sb_scan[sb_num]
        # sig_sb_flag ctx: significant right or below neighbor
        ngh = 0
        if sx + 1 < sb_cols and sig_sb[sy, sx + 1]:
            ngh = 1
        if sy + 1 < sb_rows and sig_sb[sy + 1, sx]:
            ngh = 1
        base = int(CtxOffset.SIG_COEFF_GROUP if luma else CtxOffset.SIG_COEFF_GROUP_C)
        if rw.is_reader:
            flag = rw.bin(base + ngh)
        else:
            sb_lv = levels[
                sy << log2_sb_h : (sy + 1) << log2_sb_h, sx << log2_sb_w : (sx + 1) << log2_sb_w
            ]
            flag = 1 if np.any(sb_lv) else 0
            rw.bin(base + ngh, flag)
        if flag:
            sig_sb[sy, sx] = 1
            sig_sb_map |= 1 << (sx + (sy << 3))
            nb_sig += _code_subblock(
                rw, st, nbr, levels, decoded, sx, sy, log2_sb_w, log2_sb_h,
                (1 << (log2_sb_w + log2_sb_h)) - 1, False, False,
            )

    # DC subblock (implicit significant, no sig inference at DC coeff)
    nb_sig += _code_subblock(
        rw, st, nbr, levels, decoded, 0, 0, log2_sb_w, log2_sb_h,
        (1 << (log2_sb_w + log2_sb_h)) - 1, False, True,
    )
    return levels, decoded, (last_x, last_y), sig_sb_map | 1


# ----------------------------------------------------------------------
# transform-skip residual coding (spec 7.3.11.12)
# ----------------------------------------------------------------------


def residual_ts_coding(io, levels, log2_w, log2_h, bdpcm=False, luma=True):
    """Transform-skip residual coding, symmetric reader/writer.

    Parity: /root/reference/libovvc/vcl_residual_coding.c residual_coding_ts
    :3576, ovcabac_read_ae_sb_ts_core :1401, decode_pass2_ts :1352. Forward
    subblock/coefficient scan, context-coded signs, level prediction remap
    (disabled for BDPCM), 7N/4 context-bin budget with bypass fallback.

    levels: None (reader) or target decoded levels [h, w] (writer).
    Returns (levels, sig_sb_map).
    """
    rw = _Rw(io)
    w, h = 1 << log2_w, 1 << log2_h
    lsw, lsh = sb_dims(log2_w, log2_h)
    sb_w, sb_h = 1 << lsw, 1 << lsh
    nb_sb_w, nb_sb_h = max(1, w >> lsw), max(1, h >> lsh)
    sb_scan = diag_scan(nb_sb_w, nb_sb_h)
    in_scan = diag_scan(sb_w, sb_h)
    max_pos = sb_w * sb_h - 1

    out = np.zeros((h, w), np.int32) if rw.is_reader else levels.astype(np.int32)
    budget = [((w * h) << 3) // 4 - (w * h) // 4]  # 7N/4
    # neighbour grids: value at (x, y) counts/sums its left+above neighbours
    nb_sig = np.zeros((h + 1, w + 1), np.int32)
    sign_sum = np.zeros((h + 1, w + 1), np.int32)
    abs_c = np.zeros((h + 1, w + 1), np.int32)  # indexed [y+1][x+1]

    TSG = int(CtxOffset.TS_SIG_COEFF_GROUP)
    TSS = int(CtxOffset.TS_SIG_FLAG)
    TSP = int(CtxOffset.TS_PAR_FLAG)
    TSX = int(CtxOffset.TS_GTX_FLAG)
    TSL = int(CtxOffset.TS_LRG1_FLAG)
    TSN = int(CtxOffset.TS_RESIDUAL_SIGN)

    def target(ax, ay):
        return int(levels[ay, ax])

    def code_sb(sx, sy):
        base_x, base_y = sx << lsw, sy << lsh
        sig_list = []      # (ax, ay) pass1-significant, scan order
        signs = []         # sign bits in registration order
        vmap = {}          # coded |value| per (ax, ay)
        pass2 = []
        pass3 = []

        def inverse_map(ax, ay, X):
            """Writer: coded value v whose decode-remap yields X (non-bdpcm)."""
            if bdpcm:
                return X
            m = max(int(abs_c[ay, ax + 1]), int(abs_c[ay + 1, ax]))
            if m and X == m:
                return 1
            return X + 1 if X < m else X

        def code_first_pass(pos, infer_sig):
            x, y = in_scan[pos]
            ax, ay = base_x + x, base_y + y
            nb = int(nb_sig[ay, ax])
            if infer_sig:
                sig = 1
            else:
                sig = rw.bin(TSS + nb, None if rw.is_reader else (1 if target(ax, ay) else 0))
                budget[0] -= 1
            if not sig:
                return
            nsign = int(sign_sum[ay, ax])
            sign_off = nb + nsign if nb != 2 else (2 if nsign == 2 else nsign ^ 1)
            gt1_ctx = nb
            if bdpcm:
                gt1_ctx = 3
                sign_off += 3
            if rw.is_reader:
                sign = rw.bin(TSN + sign_off)
                gt1 = rw.bin(TSL + gt1_ctx)
                budget[0] -= 2
                value = 1
                if gt1:
                    par = rw.bin(TSP)
                    budget[0] -= 1
                    value += 1 + par
                    pass2.append((ax, ay))
                vmap[(ax, ay)] = value
            else:
                X = abs(target(ax, ay))
                v = inverse_map(ax, ay, X)
                sign = 1 if target(ax, ay) < 0 else 0
                rw.bin(TSN + sign_off, sign)
                gt1 = 1 if v > 1 else 0
                rw.bin(TSL + gt1_ctx, gt1)
                budget[0] -= 2
                value = 1
                if gt1:
                    par = (v - 2) & 1
                    rw.bin(TSP, par)
                    budget[0] -= 1
                    value += 1 + par
                    pass2.append((ax, ay))
                vmap[(ax, ay)] = value
                vmap[(ax, ay, "v")] = v
            signs.append(sign)
            sig_list.append((ax, ay))
            nb_sig[ay, ax + 1] += 1
            nb_sig[ay + 1, ax] += 1
            sign_sum[ay, ax + 1] += sign
            sign_sum[ay + 1, ax] += sign
            abs_c[ay + 1, ax + 1] = value

        pos = 0
        while pos < max_pos and budget[0] >= 4:
            code_first_pass(pos, False)
            pos += 1
        if pos == max_pos and budget[0] >= 4:
            infer = len(sig_list) == 0
            code_first_pass(pos, infer)
            pos += 1

        # pass 2: gt2..gt5 (+2 each), budget-gated per coefficient
        nb_read_pass2 = 0
        for (ax, ay) in pass2:
            if budget[0] < 4:
                break
            nb_read_pass2 += 1
            if rw.is_reader:
                add = 0
                gt = rw.bin(TSX + 1)
                budget[0] -= 1
                if gt:
                    add += 2
                    gt = rw.bin(TSX + 2)
                    budget[0] -= 1
                    if gt:
                        add += 2
                        gt = rw.bin(TSX + 3)
                        budget[0] -= 1
                        if gt:
                            add += 2
                            gt = rw.bin(TSX + 4)
                            budget[0] -= 1
                            if gt:
                                add += 2
                                pass3.append((ax, ay))
                vmap[(ax, ay)] += add
            else:
                v = vmap[(ax, ay, "v")]
                par = (v - 2) & 1
                k = (v - 2 - par) >> 1
                gt2 = 1 if k >= 1 else 0
                rw.bin(TSX + 1, gt2)
                budget[0] -= 1
                add = 0
                if gt2:
                    add += 2
                    gt3 = 1 if k >= 2 else 0
                    rw.bin(TSX + 2, gt3)
                    budget[0] -= 1
                    if gt3:
                        add += 2
                        gt4 = 1 if k >= 3 else 0
                        rw.bin(TSX + 3, gt4)
                        budget[0] -= 1
                        if gt4:
                            add += 2
                            gt5 = 1 if k >= 4 else 0
                            rw.bin(TSX + 4, gt5)
                            budget[0] -= 1
                            if gt5:
                                add += 2
                                pass3.append((ax, ay))
                vmap[(ax, ay)] += add
            abs_c[ay + 1, ax + 1] = vmap[(ax, ay)]

        # pass 3: rice remainders for gt5 coefficients (doubled contribution)
        for (ax, ay) in pass3:
            if rw.is_reader:
                r = _rice(rw, 1)
            else:
                v = vmap[(ax, ay, "v")]
                par = (v - 2) & 1
                r = (v - 2 - par - 8) >> 1
                _rice(rw, 1, r)
            vmap[(ax, ay)] += 2 * r
            abs_c[ay + 1, ax + 1] = vmap[(ax, ay)]

        # pass-2-skipped coefficients: full remainder as rice (doubled)
        for (ax, ay) in pass2[nb_read_pass2:]:
            if rw.is_reader:
                r = _rice(rw, 1)
            else:
                v = vmap[(ax, ay, "v")]
                par = (v - 2) & 1
                r = (v - 2 - par) >> 1
                _rice(rw, 1, r)
            vmap[(ax, ay)] += 2 * r
            abs_c[ay + 1, ax + 1] = vmap[(ax, ay)]

        # level prediction remap (decoder side; skipped for BDPCM)
        if not bdpcm:
            for (ax, ay) in sig_list:
                m = max(int(abs_c[ay, ax + 1]), int(abs_c[ay + 1, ax]))
                v = vmap[(ax, ay)]
                if v == 1 and m:
                    v = m
                else:
                    v -= 1 if v <= m else 0
                vmap[(ax, ay)] = v
                abs_c[ay + 1, ax + 1] = v

        # bypass tail: positions not covered by pass 1
        for p in range(pos, max_pos + 1):
            x, y = in_scan[p]
            ax, ay = base_x + x, base_y + y
            if rw.is_reader:
                v = _rice(rw, 1)
            else:
                v = abs(target(ax, ay))
                _rice(rw, 1, v)
            vmap[(ax, ay)] = v
            if v:
                sign = rw.bypass(None if rw.is_reader else (1 if target(ax, ay) < 0 else 0))
                signs.append(sign)
                sig_list.append((ax, ay))

        if rw.is_reader:
            for (ax, ay), sign in zip(sig_list, signs):
                out[ay, ax] = -vmap[(ax, ay)] if sign else vmap[(ax, ay)]

    sig_sb_map = 0
    if len(sb_scan) == 1:
        code_sb(0, 0)
        return out, 0x1
    for si, (sx, sy) in enumerate(sb_scan):
        abv = 1 if sy > 0 and (sig_sb_map >> (sx + ((sy - 1) << 3))) & 1 else 0
        lft = 1 if sx > 0 and (sig_sb_map >> ((sx - 1) + (sy << 3))) & 1 else 0
        ctx_off = abv + lft
        if si < len(sb_scan) - 1:
            if rw.is_reader:
                flag = rw.bin(TSG + ctx_off)
            else:
                sb_lv = levels[sy << lsh : (sy + 1) << lsh, sx << lsw : (sx + 1) << lsw]
                flag = 1 if np.any(sb_lv) else 0
                rw.bin(TSG + ctx_off, flag)
        else:
            if sig_sb_map == 0:
                flag = 1
            elif rw.is_reader:
                flag = rw.bin(TSG + ctx_off)
            else:
                sb_lv = levels[sy << lsh : (sy + 1) << lsh, sx << lsw : (sx + 1) << lsw]
                flag = 1 if np.any(sb_lv) else 0
                rw.bin(TSG + ctx_off, flag)
        if flag:
            sig_sb_map |= 1 << (sx + (sy << 3))
            code_sb(sx, sy)
    return out, sig_sb_map

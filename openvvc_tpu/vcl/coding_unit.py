"""Coding-unit syntax (intra path) — ITU-T H.266 7.3.11.5, 8.4.2/8.4.3.

Covers: BDPCM, MIP (flag/transpose/mode), MRL, ISP, MPM flag/idx/remainder with
the 6-entry MPM list derivation, chroma CCLM + direct/derived modes. Inter CU
parsing lands separately. Behavior parity:
/root/reference/libovvc/vcl_coding_unit.c:1221-1530 (coding_unit_intra*,
per-bin readers :547-680) and drv_intra.c:53-372 (MPM list, chroma mode).

The same function drives parse and generation: for generation, the CU carries
the final `intra_mode_l`/`intra_mode_c`, and the writer re-derives the MPM
encoding; the parser resolves modes and updates the neighbor maps.
"""

from __future__ import annotations

from openvvc_tpu.cabac.ctx import CtxOffset
from openvvc_tpu.vcl.ctu import (
    CU,
    INTRA_DC,
    INTRA_L_CCLM,
    INTRA_LT_CCLM,
    INTRA_PLANAR,
    INTRA_T_CCLM,
    MODE_INTRA,
    TREE_DUAL_CHROMA,
    TREE_DUAL_LUMA,
    TREE_SINGLE,
    UNAVAIL,
)

OVINTRA_VER = 50
OVINTRA_HOR = 18
OVINTRA_VDIA = 66

# CU-type map values for CABAC neighbor contexts (cu_utils.h:133-140 analog)
CU_NA = 0xFF
CU_INTER = 1
CU_INTRA = 2
CU_MIP = 4
CU_IBC = 7


def derive_mpm_list(lft_mode: int, abv_mode: int) -> list[int]:
    """6-entry MPM list (H.266 8.4.2), candidates above-right/left-below.

    Parity: vvc_derive_mpm_list (/root/reference/libovvc/drv_intra.c:53-139).
    """
    offset = 67 - 6  # 61
    mod = offset + 3  # 64
    lst = [INTRA_PLANAR, INTRA_DC, OVINTRA_VER, OVINTRA_HOR, OVINTRA_VER - 4, OVINTRA_VER + 4]

    def m(v):
        return (v % mod) + 2

    if lft_mode == abv_mode:
        if lft_mode > INTRA_DC:
            lst = [
                INTRA_PLANAR,
                lft_mode,
                m(lft_mode + offset),
                m(lft_mode - 1),
                m(lft_mode + offset - 1),
                m(lft_mode),
            ]
    elif lft_mode > INTRA_DC and abv_mode > INTRA_DC:
        lo, hi = (abv_mode, lft_mode) if lft_mode > abv_mode else (lft_mode, abv_mode)
        diff = hi - lo
        lst = [INTRA_PLANAR, lft_mode, abv_mode, 0, 0, 0]
        if diff == 1:
            lst[3] = m(lo + offset)
            lst[4] = m(hi - 1)
            lst[5] = m(lo + offset - 1)
        elif diff >= 62:
            lst[3] = m(lo - 1)
            lst[4] = m(hi + offset)
            lst[5] = m(lo)
        elif diff == 2:
            lst[3] = m(lo - 1)
            lst[4] = m(lo + offset)
            lst[5] = m(hi - 1)
        else:
            lst[3] = m(lo + offset)
            lst[4] = m(lo - 1)
            lst[5] = m(hi + offset)
    elif lft_mode + abv_mode >= 2:
        big = lft_mode if lft_mode > abv_mode else abv_mode
        lst = [
            INTRA_PLANAR,
            big,
            m(big + offset),
            m(big - 1),
            m(big + offset - 1),
            m(big),
        ]
    return lst


def mode_from_mpm_remainder(lft_mode: int, abv_mode: int, rem: int) -> int:
    lst = sorted(derive_mpm_list(lft_mode, abv_mode))
    mode = rem
    for v in lst:
        if mode >= v:
            mode += 1
    return mode


def mpm_remainder_from_mode(lft_mode: int, abv_mode: int, mode: int) -> int:
    lst = sorted(derive_mpm_list(lft_mode, abv_mode))
    rem = mode
    for v in reversed(lst):
        if mode > v:
            rem -= 1
    return rem


def _mpm_candidates(ctx, x0, y0, log2_w, log2_h):
    """(left, above) candidate modes for the MPM list.

    Left cand at (x0-1, y0+h-1) (available across CTUs within the tile);
    above cand at (x0+w-1, y0-1), PLANAR if in the CTU row above.
    """
    lx, ly = x0 - 1, y0 + (1 << log2_h) - 1
    ax, ay = x0 + (1 << log2_w) - 1, y0 - 1
    lft = ctx.nbr_intra_mode(lx, ly)
    if lft == UNAVAIL:
        lft = INTRA_PLANAR
    if (ay >> ctx.log2_ctb) != (y0 >> ctx.log2_ctb):
        abv = INTRA_PLANAR  # above CTU row: unavailable for MPM
    else:
        abv = ctx.nbr_intra_mode(ax, ay)
        if abv == UNAVAIL:
            abv = INTRA_PLANAR
    return lft, abv


def _nb_mip_modes(log2_w: int, log2_h: int) -> int:
    if log2_w == 2 and log2_h == 2:
        return 16
    if log2_w == 2 or log2_h == 2 or (log2_w == 3 and log2_h == 3):
        return 8
    return 6


def coding_unit_intra_luma(ctx, io, cu: CU):
    """Intra luma mode syntax for one CU (luma part of tree)."""
    x0, y0, log2_w, log2_h = cu.x0, cu.y0, cu.log2_w, cu.log2_h
    part = ctx.part_luma

    # BDPCM
    if ctx.bdpcm_enabled and log2_w <= ctx.log2_ts_max and log2_h <= ctx.log2_ts_max:
        if io.is_reader:
            cu.bdpcm_l = io.raw_bin(CtxOffset.BDPCM_MODE + 0)
        else:
            io.put_bin(cu.bdpcm_l, CtxOffset.BDPCM_MODE + 0)
        if cu.bdpcm_l:
            if io.is_reader:
                cu.bdpcm_dir_l = io.raw_bin(CtxOffset.BDPCM_MODE + 1)
            else:
                io.put_bin(cu.bdpcm_dir_l, CtxOffset.BDPCM_MODE + 1)
            cu.intra_mode_l = OVINTRA_VER if cu.bdpcm_dir_l else OVINTRA_HOR
            return

    # MIP
    if ctx.mip_enabled:
        ux, uy = ctx._lu(x0, y0)
        abv_mip = ctx.in_tile(x0, y0 - 1) and ctx.map_cu_type[uy - 1, ux] == CU_MIP
        lft_mip = ctx.in_tile(x0 - 1, y0) and ctx.map_cu_type[uy, ux - 1] == CU_MIP
        if abs(log2_h - log2_w) > 1:
            c = 3
        else:
            c = int(abv_mip) + int(lft_mip)
        if io.is_reader:
            cu.mip_flag = io.raw_bin(CtxOffset.MIP_FLAG + c)
        else:
            io.put_bin(cu.mip_flag, CtxOffset.MIP_FLAG + c)
        if cu.mip_flag:
            if io.is_reader:
                cu.mip_transpose = io.raw_bypass()
            else:
                io.put_bypass(cu.mip_transpose)
            nb_modes = _nb_mip_modes(log2_w, log2_h)
            io.truncated_binary_bypass(cu, "mip_mode", nb_modes - 1)
            cu.intra_mode_l = INTRA_PLANAR  # stored mode for neighbors
            return

    # MRL (not on first CTU row of the CTU)
    mrl_allowed = ctx.mrl_enabled and (y0 % ctx.ctb_size) != 0
    if mrl_allowed:
        v = cu.mrl_idx if not io.is_reader else 0
        if io.is_reader:
            v = io.raw_bin(CtxOffset.MULTI_REF_LINE_IDX)
            if v:
                v += io.raw_bin(CtxOffset.MULTI_REF_LINE_IDX + 1)
            cu.mrl_idx = v
        else:
            io.put_bin(1 if v else 0, CtxOffset.MULTI_REF_LINE_IDX)
            if v:
                io.put_bin(1 if v > 1 else 0, CtxOffset.MULTI_REF_LINE_IDX + 1)
    else:
        cu.mrl_idx = 0

    # ISP
    if cu.mrl_idx == 0 and ctx.isp_enabled:
        allowed = (log2_w + log2_h) > 4 and log2_w <= part.log2_max_tb_s and log2_h <= part.log2_max_tb_s
        if allowed:
            if io.is_reader:
                if io.raw_bin(CtxOffset.ISP_MODE):
                    cu.isp_mode = 1 + io.raw_bin(CtxOffset.ISP_MODE + 1)
                else:
                    cu.isp_mode = 0
            else:
                io.put_bin(1 if cu.isp_mode else 0, CtxOffset.ISP_MODE)
                if cu.isp_mode:
                    io.put_bin(cu.isp_mode - 1, CtxOffset.ISP_MODE + 1)

    lft, abv = _mpm_candidates(ctx, x0, y0, log2_w, log2_h)

    if io.is_reader:
        mpm_flag = 1 if cu.mrl_idx else io.raw_bin(CtxOffset.INTRA_LUMA_MPM_FLAG)
        if mpm_flag:
            if cu.mrl_idx == 0:
                mpm_idx = io.raw_bin(CtxOffset.INTRA_LUMA_PLANAR_FLAG + (0 if cu.isp_mode else 1))
            else:
                mpm_idx = 1
            while mpm_idx and mpm_idx < 5:
                if not io.raw_bypass():
                    break
                mpm_idx += 1
            cu.intra_mode_l = derive_mpm_list(lft, abv)[mpm_idx]
        else:
            rem = io.truncated_binary_bypass(cu, "_mpm_rem", 60)
            cu.intra_mode_l = mode_from_mpm_remainder(lft, abv, rem)
    else:
        mpm_list = derive_mpm_list(lft, abv)
        if getattr(cu, "mpm_sel", None) is not None:
            # generator aid: pick the mode by MPM index (context-dependent)
            cu.intra_mode_l = mpm_list[cu.mpm_sel]
        mode = cu.intra_mode_l
        mpm_idx = mpm_list.index(mode) if mode in mpm_list else -1
        if cu.mrl_idx:
            assert mpm_idx >= 1, "MRL CU mode must be a non-planar MPM"
        else:
            io.put_bin(1 if mpm_idx >= 0 else 0, CtxOffset.INTRA_LUMA_MPM_FLAG)
        if mpm_idx >= 0:
            if cu.mrl_idx == 0:
                io.put_bin(1 if mpm_idx > 0 else 0, CtxOffset.INTRA_LUMA_PLANAR_FLAG + (0 if cu.isp_mode else 1))
            start = 1
            k = start
            while k < mpm_idx:
                io.put_bypass(1)
                k += 1
            if mpm_idx >= start and mpm_idx < 5:
                io.put_bypass(0)
        else:
            cu._mpm_rem = mpm_remainder_from_mode(lft, abv, mode)
            io.truncated_binary_bypass(cu, "_mpm_rem", 60)


def coding_unit_intra_chroma(ctx, io, cu: CU, collocated_luma_mode: int):
    """Chroma intra mode syntax (CCLM / list / DM), H.266 7.3.11.5 chroma part."""
    # chroma BDPCM
    clog2_w = cu.log2_w - (0 if cu.tree_type == TREE_DUAL_CHROMA else 1)
    # For dual-tree chroma CUs log2 dims are already chroma-sized
    if cu.tree_type == TREE_DUAL_CHROMA:
        clog2_w, clog2_h = cu.log2_w, cu.log2_h
    else:
        clog2_w, clog2_h = cu.log2_w - 1, cu.log2_h - 1
    if ctx.bdpcm_enabled and clog2_w <= ctx.log2_ts_max and clog2_h <= ctx.log2_ts_max:
        if io.is_reader:
            cu.bdpcm_c = io.raw_bin(CtxOffset.BDPCM_MODE + 2)
        else:
            io.put_bin(cu.bdpcm_c, CtxOffset.BDPCM_MODE + 2)
        if cu.bdpcm_c:
            if io.is_reader:
                cu.bdpcm_dir_c = io.raw_bin(CtxOffset.BDPCM_MODE + 3)
            else:
                io.put_bin(cu.bdpcm_dir_c, CtxOffset.BDPCM_MODE + 3)
            cu.intra_mode_c = OVINTRA_VER if cu.bdpcm_dir_c else OVINTRA_HOR
            return

    cclm_allowed = ctx.cclm_enabled and ctx.cclm_allowed()
    cclm_flag = 0
    if cclm_allowed:
        if io.is_reader:
            cclm_flag = io.raw_bin(CtxOffset.CCLM_MODE_FLAG)
        else:
            cclm_flag = 1 if cu.intra_mode_c in (INTRA_LT_CCLM, INTRA_L_CCLM, INTRA_T_CCLM) else 0
            io.put_bin(cclm_flag, CtxOffset.CCLM_MODE_FLAG)
        if cclm_flag:
            if io.is_reader:
                idx = io.raw_bin(CtxOffset.CCLM_MODE_IDX)
                if idx:
                    idx += io.raw_bypass()
                cu.intra_mode_c = (INTRA_LT_CCLM, INTRA_L_CCLM, INTRA_T_CCLM)[idx]
            else:
                idx = (INTRA_LT_CCLM, INTRA_L_CCLM, INTRA_T_CCLM).index(cu.intra_mode_c)
                io.put_bin(1 if idx else 0, CtxOffset.CCLM_MODE_IDX)
                if idx:
                    io.put_bypass(idx - 1)
            return

    mode_list = [INTRA_PLANAR, OVINTRA_VER, OVINTRA_HOR, INTRA_DC]
    if io.is_reader:
        explicit = io.raw_bin(CtxOffset.INTRA_CHROMA_PRED_MODE)
        if explicit:
            idx = io.raw_bypass() << 1
            idx |= io.raw_bypass()
            mode = mode_list[idx]
            if mode == collocated_luma_mode:
                mode = OVINTRA_VDIA
            cu.intra_mode_c = mode
        else:
            cu.intra_mode_c = collocated_luma_mode  # direct mode
    else:
        if getattr(cu, "cmode_sel", None) is not None:
            # generator aid: pick mode by list index (4 = DM), context-resolved
            lst = [OVINTRA_VDIA if m == collocated_luma_mode else m for m in mode_list]
            cu.intra_mode_c = collocated_luma_mode if cu.cmode_sel >= 4 else lst[cu.cmode_sel]
        if cu.intra_mode_c == collocated_luma_mode:
            io.put_bin(0, CtxOffset.INTRA_CHROMA_PRED_MODE)
        else:
            io.put_bin(1, CtxOffset.INTRA_CHROMA_PRED_MODE)
            lst = [OVINTRA_VDIA if m == collocated_luma_mode else m for m in mode_list]
            idx = lst.index(cu.intra_mode_c)
            io.put_bypass(idx >> 1)
            io.put_bypass(idx & 1)

"""ALF / CC-ALF per-CTU syntax (symmetric reader/writer).

Parity: /root/reference/libovvc/vcl_alf.c (ovcabac_read_ae_alf_ctu :68,
ovcabac_read_ae_cc_alf_ctu :142, ovcabac_read_ae_alf_idx :42) and
cabac_internal.h vvc_get_cabac_truncated :164.
"""

from __future__ import annotations

from dataclasses import dataclass

from openvvc_tpu.cabac.ctx import CtxOffset

NUM_FIXED_FILTER_SETS = 16


@dataclass
class AlfCtuParams:
    ctb_alf_flag: int = 0   # (luma << 2) | (cb << 1) | cr
    ctb_alf_idx: int = 0
    cb_alternative: int = 0
    cr_alternative: int = 0
    cc_alf_idx: tuple = (0, 0)  # (cb, cr) filter idx (0 = off)


def _truncated(io, max_symbol, value=None):
    """vvc_get_cabac_truncated parity (TB over alphabet max_symbol)."""
    threshold = max(0, (max_symbol).bit_length() - 1)
    val = 1 << threshold
    b = max_symbol - val
    if io.is_reader:
        sym = 0
        for _ in range(threshold):
            sym = (sym << 1) | io.raw_bypass()
        if sym >= val - b:
            sym = (sym << 1) | io.raw_bypass()
            sym -= val - b
        return sym
    sym = value
    if sym < val - b:
        for k in range(threshold - 1, -1, -1):
            io.put_bypass((sym >> k) & 1)
    else:
        coded = sym + (val - b)
        for k in range(threshold, -1, -1):
            io.put_bypass((coded >> k) & 1)
    return sym


def code_alf_ctu(ctx, io, ctb_x, ctb_y):
    """ALF luma/Cb/Cr CTU flags + filter set index + alternatives."""
    alf_luma = ctx.alf_luma_enabled
    alf_cb = ctx.alf_cb_enabled
    alf_cr = ctx.alf_cr_enabled
    if not (alf_luma or alf_cb or alf_cr):
        return None
    entry = ctx.entry
    left_ok = ctb_x > entry.ctu_x
    up_ok = ctb_y > entry.ctu_y
    col = ctb_x - entry.ctu_x
    left_flag = ctx.alf_left_flag if left_ok else 0
    up_flag = ctx.alf_line_flags.get(col, 0) if up_ok else 0

    wp = None if io.is_reader else (getattr(ctx.writer_node, "alf", None) or AlfCtuParams())
    p = AlfCtuParams() if io.is_reader else wp

    ret_luma = ret_cb = ret_cr = 0
    alf_idx = 0
    n_aps = ctx.num_alf_aps_luma
    if alf_luma:
        c = ((left_flag & 4) >> 2 if left_ok else 0) + ((up_flag & 4) >> 2 if up_ok else 0)
        w = None if io.is_reader else (1 if p.ctb_alf_flag & 4 else 0)
        ret_luma = io.raw_bin(CtxOffset.CTB_ALF_FLAG + c) if io.is_reader else (
            io.put_bin(w, CtxOffset.CTB_ALF_FLAG + c) or w)
        if ret_luma:
            # filter set index (ovcabac_read_ae_alf_idx)
            if io.is_reader:
                if n_aps:
                    use_aps = io.raw_bin(CtxOffset.ALF_USE_TEMPORAL_FILT)
                    if use_aps:
                        alf_idx = _truncated(io, n_aps) if n_aps > 1 else 0
                        alf_idx += NUM_FIXED_FILTER_SETS
                    else:
                        alf_idx = _truncated(io, NUM_FIXED_FILTER_SETS)
                else:
                    alf_idx = _truncated(io, NUM_FIXED_FILTER_SETS)
            else:
                alf_idx = p.ctb_alf_idx
                if n_aps:
                    use_aps = 1 if alf_idx >= NUM_FIXED_FILTER_SETS else 0
                    io.put_bin(use_aps, CtxOffset.ALF_USE_TEMPORAL_FILT)
                    if use_aps:
                        if n_aps > 1:
                            _truncated(io, n_aps, alf_idx - NUM_FIXED_FILTER_SETS)
                    else:
                        _truncated(io, NUM_FIXED_FILTER_SETS, alf_idx)
                else:
                    _truncated(io, NUM_FIXED_FILTER_SETS, alf_idx)

    cb_alt = cr_alt = 0
    if alf_cb:
        n_alts = ctx.alf_chroma_num_alts
        c = ((left_flag & 2) >> 1 if left_ok else 0) + ((up_flag & 2) >> 1 if up_ok else 0)
        w = None if io.is_reader else (1 if p.ctb_alf_flag & 2 else 0)
        ret_cb = io.raw_bin(CtxOffset.CTB_ALF_FLAG + 3 + c) if io.is_reader else (
            io.put_bin(w, CtxOffset.CTB_ALF_FLAG + 3 + c) or w)
        if io.is_reader:
            while ret_cb and cb_alt < n_alts - 1 and io.raw_bin(CtxOffset.CTB_ALF_ALTERNATIVE):
                cb_alt += 1
        elif ret_cb:
            cb_alt = p.cb_alternative
            for _ in range(cb_alt):
                io.put_bin(1, CtxOffset.CTB_ALF_ALTERNATIVE)
            if cb_alt < n_alts - 1:
                io.put_bin(0, CtxOffset.CTB_ALF_ALTERNATIVE)
    if alf_cr:
        n_alts = ctx.alf_chroma_num_alts
        c = ((left_flag & 1) if left_ok else 0) + ((up_flag & 1) if up_ok else 0)
        w = None if io.is_reader else (1 if p.ctb_alf_flag & 1 else 0)
        ret_cr = io.raw_bin(CtxOffset.CTB_ALF_FLAG + 6 + c) if io.is_reader else (
            io.put_bin(w, CtxOffset.CTB_ALF_FLAG + 6 + c) or w)
        if io.is_reader:
            while ret_cr and cr_alt < n_alts - 1 and io.raw_bin(CtxOffset.CTB_ALF_ALTERNATIVE + 1):
                cr_alt += 1
        elif ret_cr:
            cr_alt = p.cr_alternative
            for _ in range(cr_alt):
                io.put_bin(1, CtxOffset.CTB_ALF_ALTERNATIVE + 1)
            if cr_alt < n_alts - 1:
                io.put_bin(0, CtxOffset.CTB_ALF_ALTERNATIVE + 1)

    ret = (ret_luma << 2) | (ret_cb << 1) | ret_cr
    ctx.alf_left_flag = ret
    ctx.alf_line_flags[col] = ret

    p.ctb_alf_flag = ret
    p.ctb_alf_idx = alf_idx
    p.cb_alternative = cb_alt
    p.cr_alternative = cr_alt
    ctx.alf_params[(ctb_x, ctb_y)] = p
    return p


def code_cc_alf_ctu(ctx, io, ctb_x, ctb_y):
    """CC-ALF filter control idx per chroma component."""
    flags = (ctx.cc_alf_cb_enabled, ctx.cc_alf_cr_enabled)
    if not any(flags):
        return
    entry = ctx.entry
    left_ok = ctb_x > entry.ctu_x
    up_ok = ctb_y > entry.ctu_y
    col = ctb_x - entry.ctu_x
    p = ctx.alf_params.get((ctb_x, ctb_y))
    if p is None:
        p = AlfCtuParams() if io.is_reader else (getattr(ctx.writer_node, "alf", None) or AlfCtuParams())
        ctx.alf_params[(ctb_x, ctb_y)] = p
    idxs = list(p.cc_alf_idx)
    for comp in range(2):
        if not flags[comp]:
            idxs[comp] = 0
            continue
        n_filters = ctx.cc_alf_nb_filters[comp]
        left_flag = ctx.cc_alf_left_flag[comp] if left_ok else 0
        up_flag = ctx.cc_alf_line_flags[comp].get(col, 0) if up_ok else 0
        c = (1 if (left_ok and left_flag) else 0) + (1 if (up_ok and up_flag) else 0)
        c += 3 if comp == 1 else 0
        if io.is_reader:
            v = io.raw_bin(CtxOffset.CC_ALF_FILTER_CONTROL_FLAG + c)
            if v:
                while v != n_filters and io.raw_bypass():
                    v += 1
        else:
            v = idxs[comp]
            io.put_bin(1 if v else 0, CtxOffset.CC_ALF_FILTER_CONTROL_FLAG + c)
            if v:
                for _ in range(v - 1):
                    io.put_bypass(1)
                if v != n_filters:
                    io.put_bypass(0)
        idxs[comp] = v
        ctx.cc_alf_left_flag[comp] = v
        ctx.cc_alf_line_flags[comp][col] = v
    p.cc_alf_idx = tuple(idxs)

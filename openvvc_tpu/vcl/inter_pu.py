"""Inter CU / prediction-unit syntax (P slices).

Symmetric reader/writer for: cu_skip_flag, pred_mode_flag, merge_flag,
merge data (subset: regular merge; sb-merge/mmvd/gpm/ciip bins appear only
when the SPS enables those tools), MVP data (ref_idx, mvd, mvp_idx, amvr
precision), root cbf + inter transform unit.

Behavior parity: /root/reference/libovvc/vcl_coding_unit.c —
coding_unit_inter_st (:1012), inter_skip_data_p (:1528),
inter_merge_data_p (:1583), inter_mvp_read_p (:897, :1766),
ovcabac_read_ae_mvd (:391), vvc_exp_golomb_mv (:356),
ovcabac_read_ae_ref_idx (:661), amvr (:297); drv wrappers
drv_merge_motion_info_p (:1500), drv_rcn_wrap_mvp_p (:1856);
vcl_transform_unit.c root cbf (:1896).
"""

from __future__ import annotations

from openvvc_tpu.cabac.ctx import CtxOffset
from openvvc_tpu.drv.inter_mvp import (
    MV,
    MV_PRECISION_4PEL,
    MV_PRECISION_HALF,
    MV_PRECISION_INT,
    MV_PRECISION_QUARTER,
    drv_merge_mvp_p,
    drv_mmvd_merge_mvp_p,
    drv_mvp_p,
)
from openvvc_tpu.vcl.ctu import MODE_INTER, UNAVAIL

# cu_utils.h :133-141
CU_NA = 0xFF
CU_INTER = 1
CU_INTRA = 2
CU_INTER_SKIP = 3
CU_MIP = 4
CU_AFFINE = 5
CU_INTER_SKIP_AFFINE = 6
CU_IBC = 7
CU_IBC_SKIP = 8

_SKIPPY = (CU_IBC_SKIP, CU_INTER_SKIP, CU_INTER_SKIP_AFFINE)


def _sym_bin(io, ctx_idx, wval):
    if io.is_reader:
        return io.raw_bin(ctx_idx)
    return io.put_bin(wval, ctx_idx)


def _sym_bypass(io, wval):
    if io.is_reader:
        return io.raw_bypass()
    return io.put_bypass(wval)


def read_skip_flag(ctx, io, cu, abv, lft) -> int:
    off = int(abv in _SKIPPY) + int(lft in _SKIPPY)
    v = _sym_bin(io, CtxOffset.SKIP_FLAG + off, cu.skip_flag)
    cu.skip_flag = v
    return v


def read_pred_mode_flag(ctx, io, cu, abv, lft) -> int:
    off = int(abv in (CU_INTRA, CU_MIP) or lft in (CU_INTRA, CU_MIP))
    wv = None if io.is_reader else (1 if cu.pred_mode == 0 else 0)
    return _sym_bin(io, CtxOffset.PRED_MODE + off, wv)


def code_merge_idx(ctx, io, cu, max_nb_cand) -> int:
    """ovcabac_read_ae_mvp_merge_idx parity (first bin ctx, rest bypass)."""
    if max_nb_cand <= 1:
        cu.merge_idx = 0
        return 0
    if io.is_reader:
        v = 0
        if io.raw_bin(CtxOffset.MERGE_IDX):
            v = 1
            while v < max_nb_cand - 1 and io.raw_bypass():
                v += 1
        cu.merge_idx = v
        return v
    v = cu.merge_idx
    io.put_bin(1 if v > 0 else 0, CtxOffset.MERGE_IDX)
    for k in range(1, v):
        io.put_bypass(1)
    if 0 < v < max_nb_cand - 1:
        io.put_bypass(0)
    return v


def _exp_golomb_mv(io, wval=None) -> int:
    """vvc_exp_golomb_mv parity: prefix of 1s (term 0), EG with length
    prefix+1 (17 cap)."""
    if io.is_reader:
        prefix = 0
        bit = 1
        while True:
            prefix += 1
            bit = io.raw_bypass()
            if not (bit and prefix < 15):
                break
        prefix -= 1 - bit
        offset = ((1 << prefix) - 1) << 1
        length = 1 + (16 if prefix == 15 else prefix)
        add = 0
        for _ in range(length):
            add = (add << 1) | io.raw_bypass()
        return offset + add
    # writer: value -> prefix/suffix
    v = wval
    prefix = 0
    while v >= (((1 << (prefix + 1)) - 1) << 1) and prefix < 15:
        prefix += 1
    # check value fits prefix's bucket: offset = ((2^prefix)-1)*2, span 2^(prefix+1)
    offset = ((1 << prefix) - 1) << 1
    length = 1 + (16 if prefix == 15 else prefix)
    add = v - offset
    assert 0 <= add < (1 << length), (v, prefix)
    for _ in range(prefix):
        io.put_bypass(1)
    if prefix < 15:
        io.put_bypass(0)
    for k in range(length - 1, -1, -1):
        io.put_bypass((add >> k) & 1)
    return v


def code_mvd(ctx, io, wmvd=None) -> MV:
    """ovcabac_read_ae_mvd parity. Writer passes the (x, y) quarter-pel MVD."""
    if io.is_reader:
        abs_x = io.raw_bin(CtxOffset.MVD)
        abs_y = io.raw_bin(CtxOffset.MVD)
        if abs_x:
            abs_x += io.raw_bin(CtxOffset.MVD + 1)
        if abs_y:
            abs_y += io.raw_bin(CtxOffset.MVD + 1)
        if abs_x:
            if abs_x > 1:
                abs_x += _exp_golomb_mv(io)
            abs_x = -abs_x if io.raw_bypass() else abs_x
        if abs_y:
            if abs_y > 1:
                abs_y += _exp_golomb_mv(io)
            abs_y = -abs_y if io.raw_bypass() else abs_y
        return MV(abs_x, abs_y)
    x, y = wmvd
    ax, ay = abs(x), abs(y)
    io.put_bin(1 if ax else 0, CtxOffset.MVD)
    io.put_bin(1 if ay else 0, CtxOffset.MVD)
    if ax:
        io.put_bin(1 if ax > 1 else 0, CtxOffset.MVD + 1)
    if ay:
        io.put_bin(1 if ay > 1 else 0, CtxOffset.MVD + 1)
    if ax:
        if ax > 1:
            _exp_golomb_mv(io, ax - 2)
        io.put_bypass(1 if x < 0 else 0)
    if ay:
        if ay > 1:
            _exp_golomb_mv(io, ay - 2)
        io.put_bypass(1 if y < 0 else 0)
    return MV(x, y)


def code_ref_idx(ctx, io, cu, nb_active) -> int:
    """ovcabac_read_ae_ref_idx parity."""
    if io.is_reader:
        v = 0
        if io.raw_bin(CtxOffset.REF_PIC):
            v = 1
            if nb_active > 2 and io.raw_bin(CtxOffset.REF_PIC + 1):
                v = 2
                while nb_active > v + 1 and io.raw_bypass():
                    v += 1
        return v
    v = cu.ref_idx
    io.put_bin(1 if v > 0 else 0, CtxOffset.REF_PIC)
    if v > 0 and nb_active > 2:
        io.put_bin(1 if v > 1 else 0, CtxOffset.REF_PIC + 1)
        for k in range(2, v):
            io.put_bypass(1)
        if v >= 2 and nb_active > v + 1:
            io.put_bypass(0)
    return v


def code_amvr_precision(ctx, io, cu) -> int:
    """ovcabac_read_ae_amvr_precision parity."""
    order = (MV_PRECISION_QUARTER, MV_PRECISION_INT, MV_PRECISION_4PEL,
             MV_PRECISION_HALF)
    if io.is_reader:
        if not io.raw_bin(CtxOffset.IMV_FLAG):
            return order[0]
        if io.raw_bin(CtxOffset.IMV_FLAG + 4):
            return order[1 + io.raw_bin(CtxOffset.IMV_FLAG + 1)]
        return order[3]
    prec = cu.amvr_prec
    io.put_bin(0 if prec == MV_PRECISION_QUARTER else 1, CtxOffset.IMV_FLAG)
    if prec == MV_PRECISION_QUARTER:
        return prec
    io.put_bin(0 if prec == MV_PRECISION_HALF else 1, CtxOffset.IMV_FLAG + 4)
    if prec != MV_PRECISION_HALF:
        io.put_bin(1 if prec == MV_PRECISION_4PEL else 0, CtxOffset.IMV_FLAG + 1)
    return prec


def code_mmvd_merge_idx(ctx, io, cu, max_nb_cand) -> int:
    """ovcabac_read_ae_mmvd_merge_idx parity: base (ctx bin), step
    (TU: ctx bin + bypass), direction (2 bypass bins)."""
    if io.is_reader:
        var0 = io.raw_bin(CtxOffset.MMVD_MERGE_IDX) if max_nb_cand > 1 else 0
        var1 = 0
        if io.raw_bin(CtxOffset.MMVD_STEP_MVP_IDX):
            var1 = 1
            while var1 < 7 and io.raw_bypass():
                var1 += 1
        var2 = 2 if io.raw_bypass() else 0
        var2 += io.raw_bypass()
        cu.merge_idx = var0 * 32 + var1 * 4 + var2
        return cu.merge_idx
    v = cu.merge_idx
    var0, rem = v // 32, v % 32
    var1, var2 = rem >> 2, rem & 3
    if max_nb_cand > 1:
        io.put_bin(var0, CtxOffset.MMVD_MERGE_IDX)
    io.put_bin(1 if var1 > 0 else 0, CtxOffset.MMVD_STEP_MVP_IDX)
    for k in range(1, var1):
        io.put_bypass(1)
    if 0 < var1 < 7:
        io.put_bypass(0)
    io.put_bypass(var2 >> 1)
    io.put_bypass(var2 & 1)
    return v


def _gpm_possible(ctx, log2_w, log2_h) -> bool:
    return (ctx.slice_type == 0 and ctx.gpm_enabled and ctx.max_gpm_cand > 1
            and log2_w > 2 and log2_h > 2 and log2_w < 7 and log2_h < 7
            and log2_w < 3 + log2_h and log2_h < 3 + log2_w)


def code_gpm_merge_idx(ctx, io, cu):
    """ovcabac_read_ae_gpm_merge_idx parity."""
    from openvvc_tpu.vcl.alf import _truncated

    if io.is_reader:
        cu.gpm_split_dir = _truncated(io, 64)
    else:
        _truncated(io, 64, cu.gpm_split_dir)
    n2 = ctx.max_gpm_cand - 2
    if io.is_reader:
        idx0 = 0
        if io.raw_bin(CtxOffset.MERGE_IDX):
            m = n2
            for k in range(n2):
                if not io.raw_bypass():
                    m = k
                    break
            idx0 = m + 1
        idx1 = 0
        if n2 > 0:
            if io.raw_bin(CtxOffset.MERGE_IDX):
                m = n2 - 1
                for k in range(n2 - 1):
                    if not io.raw_bypass():
                        m = k
                        break
                idx1 = m + 1
        idx1 += 1 if idx1 >= idx0 else 0
        cu.gpm_idx0, cu.gpm_idx1 = idx0, idx1
        return
    idx0 = cu.gpm_idx0
    idx1 = cu.gpm_idx1 - (1 if cu.gpm_idx1 > cu.gpm_idx0 else 0)
    io.put_bin(1 if idx0 > 0 else 0, CtxOffset.MERGE_IDX)
    if idx0 > 0:
        m = idx0 - 1
        for _ in range(m):
            io.put_bypass(1)
        if m < n2:
            io.put_bypass(0)
    if n2 > 0:
        io.put_bin(1 if idx1 > 0 else 0, CtxOffset.MERGE_IDX)
        if idx1 > 0:
            m = idx1 - 1
            for _ in range(m):
                io.put_bypass(1)
            if m < n2 - 1:
                io.put_bypass(0)


def _nbr_affine(ctx, x0, y0):
    """(lft_affine, abv_affine) from the cu-type maps (part_map analog)."""
    from openvvc_tpu.vcl.slice_data import _nbr_cu_type

    abv = _nbr_cu_type(ctx, x0, y0 - 1)
    lft = _nbr_cu_type(ctx, x0 - 1, y0)
    aff = (CU_AFFINE, CU_INTER_SKIP_AFFINE)
    return int(lft in aff), int(abv in aff)


def code_sb_merge_flag(ctx, io, cu, x0, y0) -> int:
    """ovcabac_read_ae_sb_merge_flag parity (:99)."""
    lft_a, abv_a = _nbr_affine(ctx, x0, y0)
    wv = None if io.is_reader else (1 if cu.sb_merge_flag else 0)
    v = _sym_bin(io, CtxOffset.SUBBLOCK_MERGE_FLAG + lft_a + abv_a, wv)
    if io.is_reader:
        cu.sb_merge_flag = v
    return v


def code_affine_merge_idx(ctx, io, cu, nb_cand_min1) -> int:
    """ovcabac_read_ae_affine_merge_idx parity (:129)."""
    if io.is_reader:
        v = 0
        if nb_cand_min1 > 0 and io.raw_bin(CtxOffset.AFF_MERGE_IDX):
            v = 1
            while v < nb_cand_min1 and io.raw_bypass():
                v += 1
        cu.merge_idx = v
        return v
    v = cu.merge_idx
    if nb_cand_min1 > 0:
        io.put_bin(1 if v > 0 else 0, CtxOffset.AFF_MERGE_IDX)
        for _ in range(1, v):
            io.put_bypass(1)
        if 0 < v < nb_cand_min1:
            io.put_bypass(0)
    return v


def code_affine_flag(ctx, io, cu, x0, y0) -> int:
    """ovcabac_read_ae_cu_affine_flag parity (:110)."""
    lft_a, abv_a = _nbr_affine(ctx, x0, y0)
    wv = None if io.is_reader else (1 if cu.affine_flag else 0)
    v = _sym_bin(io, CtxOffset.AFFINE_FLAG + lft_a + abv_a, wv)
    if io.is_reader:
        cu.affine_flag = v
    return v


def code_affine_type(ctx, io, cu) -> int:
    """ovcabac_read_ae_cu_affine_type parity (:120)."""
    wv = None if io.is_reader else cu.affine_type
    v = _sym_bin(io, CtxOffset.AFFINE_TYPE, wv)
    if io.is_reader:
        cu.affine_type = v
    return v


def code_affine_amvr_precision(ctx, io, cu) -> int:
    """ovcabac_read_ae_affine_amvr_precision parity (:320): index via
    IMV_FLAG+2 and +3 contexts -> {quarter, sixteenth, int}."""
    from openvvc_tpu.drv.inter_mvp import MV_PRECISION_SIXTEENTH

    order = (MV_PRECISION_QUARTER, MV_PRECISION_SIXTEENTH, MV_PRECISION_INT)
    if io.is_reader:
        idx = io.raw_bin(CtxOffset.IMV_FLAG + 2)
        if idx:
            idx += io.raw_bin(CtxOffset.IMV_FLAG + 3)
        cu.amvr_prec = order[idx]
        return order[idx]
    idx = order.index(cu.amvr_prec)
    io.put_bin(1 if idx else 0, CtxOffset.IMV_FLAG + 2)
    if idx:
        io.put_bin(idx - 1, CtxOffset.IMV_FLAG + 3)
    return cu.amvr_prec


def code_affine_mvds(ctx, io, wmvds, affine_type) -> tuple:
    """2 (4-param) or 3 (6-param) CP MVDs (inter_affine_mvp_data_p :1690).

    Writer passes (x, y) tuples; both paths return MV objects."""
    n = 3 if affine_type else 2
    if io.is_reader:
        return tuple(code_mvd(ctx, io) for _ in range(n))
    for k in range(n):
        code_mvd(ctx, io, (wmvds[k].x, wmvds[k].y))
    return wmvds[:n]


def merge_data_p(ctx, io, cu, x0, y0, log2_w, log2_h, skip: bool):
    """inter_skip_data_p/b / inter_merge_data_p/b parity; returns the merge
    type: "mmvd", "ciip", "gpm", "sb_merge" or "default"."""
    if (ctx.sbtmvp_enabled or ctx.affine_enabled) and log2_w >= 3 and log2_h >= 3:
        if code_sb_merge_flag(ctx, io, cu, x0, y0):
            if ctx.affine_enabled:
                code_affine_merge_idx(ctx, io, cu, ctx.affine_nb_merge_cand - 1)
            elif io.is_reader:
                cu.merge_idx = 0
            return "sb_merge"
    gpm_ok = _gpm_possible(ctx, log2_w, log2_h)
    mmvd = 0
    ciip = 0
    gpm = 0
    if not skip:
        ciip_ok = (ctx.ciip_enabled and log2_w < 7 and log2_h < 7
                   and (log2_w + log2_h) >= 6)
        reg = 1
        if ciip_ok or gpm_ok:
            wv = None if io.is_reader else (0 if (cu.ciip_flag or cu.gpm_flag) else 1)
            reg = _sym_bin(io, CtxOffset.REGULAR_MERGE_FLAG + 1, wv)
        if reg:
            if ctx.mmvd_enabled:
                wv = None if io.is_reader else (1 if cu.mmvd_flag else 0)
                mmvd = _sym_bin(io, CtxOffset.MMVD_FLAG, wv)
        else:
            ciip = 1 if ciip_ok else 0
            if gpm_ok and ciip_ok:
                wv = None if io.is_reader else (1 if cu.ciip_flag else 0)
                ciip = _sym_bin(io, CtxOffset.CIIP_FLAG, wv)
            gpm = 1 if not ciip else 0
    else:
        reg = 1
        if gpm_ok:
            wv = None if io.is_reader else (0 if cu.gpm_flag else 1)
            reg = _sym_bin(io, CtxOffset.REGULAR_MERGE_FLAG, wv)
        if reg:
            if ctx.mmvd_enabled:
                wv = None if io.is_reader else (1 if cu.mmvd_flag else 0)
                mmvd = _sym_bin(io, CtxOffset.MMVD_FLAG, wv)
        else:
            gpm = 1
    if io.is_reader:
        cu.mmvd_flag = mmvd
        cu.ciip_flag = ciip
        cu.gpm_flag = gpm
    if gpm:
        code_gpm_merge_idx(ctx, io, cu)
        return "gpm"
    if mmvd:
        code_mmvd_merge_idx(ctx, io, cu, ctx.max_num_merge_cand)
        return "mmvd"
    code_merge_idx(ctx, io, cu, ctx.max_num_merge_cand)
    return "ciip" if ciip else "default"


def _drv_sb_merge_wrap(ctx, cu, x0, y0, log2_w, log2_h, is_p: bool):
    """SB_MERGE derivation: attaches the recon payload to cu.sb_info."""
    from openvvc_tpu.drv.affine import drv_sb_merge

    cu.sb_info = drv_sb_merge(
        ctx.inter_ctx, ctx.affine_ctx, ctx.sbtmvp_ctx,
        x0 - ctx.tile_x0, y0 - ctx.tile_y0, log2_w, log2_h, cu.merge_idx,
        x0 >> ctx.log2_ctb, y0 >> ctx.log2_ctb, is_p, ctx.affine_enabled)
    cu.affine_flag = 1 if cu.sb_info[0] == "affine" else 0
    cu.pred_mode = MODE_INTER
    ctx.inter_ctx.prec_amvr = 0


def _affine_mvp_read_apply(ctx, io, cu, x0, y0, log2_w, log2_h, inter_dir):
    """Affine AMVP syntax + derivation (inter_affine_mvp_data_p/b parity +
    drv_affine_mvp_p/b). inter_dir selects the list(s)."""
    from openvvc_tpu.drv.affine import CPInfo, drv_affine_amvp_apply

    ictx = ctx.inter_ctx
    if ctx.affine_6param:
        code_affine_type(ctx, io, cu)
    elif io.is_reader:
        cu.affine_type = 0
    atype = cu.affine_type

    def read_list_p(lst):
        nb = ictx.nb_active_ref0 if lst == 0 else ictx.nb_active_ref1
        if lst == 0:
            ridx = code_ref_idx(ctx, io, cu, nb) if nb > 1 \
                else (nb - 1 if io.is_reader else cu.ref_idx)
            if io.is_reader:
                cu.ref_idx = ridx
        else:
            ridx = _code_ref_idx1(ctx, io, cu, nb)
            if io.is_reader:
                cu.ref_idx1 = ridx
        wm = (cu.affine_mvd0 if lst == 0 else cu.affine_mvd1) \
            if not io.is_reader else None
        wmvds = None if wm is None else [MV(*m) for m in wm]
        mvds = code_affine_mvds(ctx, io, wmvds, atype)
        if io.is_reader:
            if lst == 0:
                cu.affine_mvd0 = tuple((m.x, m.y) for m in mvds)
            else:
                cu.affine_mvd1 = tuple((m.x, m.y) for m in mvds)
        if io.is_reader:
            mvp = io.raw_bin(CtxOffset.MVP_IDX)
            if lst == 0:
                cu.mvp_idx = mvp
            else:
                cu.mvp_idx1 = mvp
        else:
            io.put_bin(cu.mvp_idx if lst == 0 else cu.mvp_idx1,
                       CtxOffset.MVP_IDX)
        return ridx, mvds

    if inter_dir == 3:
        ridx0, mvds0 = read_list_p(0)
        # list 1: ref idx, MVDs (unless mvd1_zero), mvp idx
        nb1 = ictx.nb_active_ref1
        ridx1 = _code_ref_idx1(ctx, io, cu, nb1)
        if io.is_reader:
            cu.ref_idx1 = ridx1
        if not ctx.mvd1_zero:
            wm = cu.affine_mvd1 if not io.is_reader else None
            wmvds = None if wm is None else [MV(*m) for m in wm]
            mvds1 = code_affine_mvds(ctx, io, wmvds, atype)
        else:
            mvds1 = tuple(MV(0, 0) for _ in range(3 if atype else 2))
        if io.is_reader:
            cu.affine_mvd1 = tuple((m.x, m.y) for m in mvds1)
            cu.mvp_idx1 = io.raw_bin(CtxOffset.MVP_IDX)
        else:
            io.put_bin(cu.mvp_idx1, CtxOffset.MVP_IDX)
    else:
        lst = 0 if inter_dir & 1 else 1
        ridx, mvds = read_list_p(lst)
        if lst == 0:
            ridx0, mvds0 = ridx, mvds
            ridx1, mvds1 = 0, mvds
        else:
            ridx1, mvds1 = ridx, mvds
            ridx0, mvds0 = 0, mvds

    prec = MV_PRECISION_QUARTER
    if ctx.affine_amvr_enabled:
        nz = False
        if inter_dir & 1:
            nz = nz or any(m.x or m.y for m in mvds0)
        if inter_dir & 2:
            nz = nz or any(m.x or m.y for m in mvds1)
        if nz:
            prec = code_affine_amvr_precision(ctx, io, cu)
    if io.is_reader:
        cu.amvr_prec = prec
    ictx.prec_amvr = prec

    bcw = 2
    if inter_dir == 3:
        bcw = _maybe_bcw(ctx, io, cu, log2_w, log2_h)

    def cpinfo(mvds):
        c = CPInfo(mvds[0], mvds[1] if len(mvds) > 1 else MV(0, 0),
                   mvds[2] if len(mvds) > 2 else MV(0, 0))
        return c

    cu.sb_info = drv_affine_amvp_apply(
        ictx, ctx.affine_ctx, x0 - ctx.tile_x0, y0 - ctx.tile_y0,
        log2_w, log2_h, cpinfo(mvds0), cpinfo(mvds1),
        cu.mvp_idx, cu.mvp_idx1, bcw, inter_dir,
        ridx0, ridx1, atype, prec)
    cu.pred_mode = MODE_INTER


def prediction_unit_inter_p(ctx, io, cu, x0, y0, log2_w, log2_h,
                            skip: bool, merge: bool):
    """prediction_unit_inter_p parity (:1946): merge or MVP, runs the MV
    derivation so reader and writer keep identical drv state."""
    ictx = ctx.inter_ctx
    ictx.prec_amvr = MV_PRECISION_QUARTER
    if merge:
        mtype = merge_data_p(ctx, io, cu, x0, y0, log2_w, log2_h, skip)
        if mtype == "sb_merge":
            _drv_sb_merge_wrap(ctx, cu, x0, y0, log2_w, log2_h, True)
            return None
        if mtype == "mmvd":
            mv0 = drv_mmvd_merge_mvp_p(ictx, x0 - ctx.tile_x0, y0 - ctx.tile_y0,
                                       log2_w, log2_h, cu.merge_idx,
                                       ctx.max_num_merge_cand, ctx.mmvd_shift)
            ictx.prec_amvr = mv0.prec_amvr
        else:
            mv0 = drv_merge_mvp_p(ictx, x0 - ctx.tile_x0, y0 - ctx.tile_y0,
                                  log2_w, log2_h, cu.merge_idx,
                                  ctx.max_num_merge_cand)
            ictx.prec_amvr = mv0.prec_amvr
        if mtype == "ciip":
            _derive_ciip_wt(ctx, cu, x0, y0, log2_w, log2_h)
            # the CIIP inter blend uses the DEFAULT bi average even when
            # the merge candidate carries a BCW weight; the MV maps keep
            # the candidate's weight (vcl_coding_unit.c :2554-2555)
            from dataclasses import replace as _repl

            mv0 = _repl(mv0, bcw_idx_plus1=0)
    else:
        if ctx.affine_enabled and log2_w > 3 and log2_h > 3:
            if code_affine_flag(ctx, io, cu, x0, y0):
                _affine_mvp_read_apply(ctx, io, cu, x0, y0, log2_w, log2_h, 1)
                return None
        nb_active = ictx.nb_active_ref0
        cu.ref_idx = code_ref_idx(ctx, io, cu, nb_active) if nb_active > 1 \
            else (nb_active - 1 if io.is_reader else cu.ref_idx)
        mvd = code_mvd(ctx, io, None if io.is_reader else cu.mvd)
        if io.is_reader:
            cu.mvd = (mvd.x, mvd.y)
        if io.is_reader:
            cu.mvp_idx = io.raw_bin(CtxOffset.MVP_IDX)
        else:
            io.put_bin(cu.mvp_idx, CtxOffset.MVP_IDX)
        prec = MV_PRECISION_QUARTER
        if ctx.amvr_enabled and (mvd.x or mvd.y):
            prec = code_amvr_precision(ctx, io, cu)
        if io.is_reader:
            cu.amvr_prec = prec
        ictx.prec_amvr = prec
        mv0 = drv_mvp_p(ictx, x0 - ctx.tile_x0, y0 - ctx.tile_y0,
                        log2_w, log2_h, mvd, prec, cu.mvp_idx, cu.ref_idx)
    cu.mv0 = mv0
    cu.pred_mode = MODE_INTER
    return mv0


def _derive_ciip_wt(ctx, cu, x0, y0, log2_w, log2_h):
    """CIIP blend weight from the top-right-above / bottom-left-left CU
    modes (rcn_inter.c rcn_ciip_weighted_sum)."""
    from openvvc_tpu.vcl.slice_data import _nbr_cu_type

    x_r = x0 + (1 << log2_w) - 1
    y_b = y0 + (1 << log2_h) - 1
    abv = _nbr_cu_type(ctx, x_r, y0 - 1)
    lft = _nbr_cu_type(ctx, x0 - 1, y_b)
    cu.ciip_wt = 1 + int(abv in (CU_INTRA, CU_MIP)) + int(lft in (CU_INTRA, CU_MIP))


def code_bcw_idx(ctx, io, cu, ldc: bool) -> int:
    """ovcabac_read_ae_bcw_flag/_idx parity. Returns bcw_idx (2=default)."""
    order = (2, 3, 1, 4, 0)  # parsing_order[BCW_NUM]
    nb_bits = (5 if ldc else 3) - 2
    if io.is_reader:
        if not io.raw_bin(CtxOffset.BCW_IDX):
            return 2
        k = 1
        for _ in range(nb_bits):
            if not io.raw_bypass():
                break
            k += 1
        return order[k]
    idx = cu.bcw_idx
    io.put_bin(0 if idx == 2 else 1, CtxOffset.BCW_IDX)
    if idx == 2:
        return 2
    k = order.index(idx)  # rank in parsing order, 1..nb_bits+1
    for _ in range(k - 1):
        io.put_bypass(1)
    if k <= nb_bits:
        io.put_bypass(0)
    return idx


def prediction_unit_inter_b(ctx, io, cu, x0, y0, log2_w, log2_h,
                            skip: bool, merge: bool):
    """prediction_unit_inter_b parity (:2481), subset without
    affine/smvd/mmvd/gpm/ciip/bcw/bdof/dmvr (the SPS keeps them off)."""
    from openvvc_tpu.drv.inter_mvp import drv_merge_mvp_b, drv_mvp_b

    ictx = ctx.inter_ctx
    ictx.prec_amvr = MV_PRECISION_QUARTER
    if merge:
        from openvvc_tpu.drv.inter_mvp import drv_mmvd_merge_mvp_b

        mtype = merge_data_p(ctx, io, cu, x0, y0, log2_w, log2_h, skip)
        if mtype == "sb_merge":
            _drv_sb_merge_wrap(ctx, cu, x0, y0, log2_w, log2_h, False)
            return None
        if mtype == "gpm":
            from openvvc_tpu.drv.gpm import drv_gpm_merge_mvp_b

            d0, m0, d1, m1, units = drv_gpm_merge_mvp_b(
                ictx, x0 - ctx.tile_x0, y0 - ctx.tile_y0, log2_w, log2_h,
                cu.gpm_split_dir, cu.gpm_idx0, cu.gpm_idx1, ctx.max_gpm_cand)
            cu.gpm_dirs = (d0, d1)
            cu.gpm_mvs = (m0, m1)
            cu.gpm_units = units
            cu.mv0, cu.mv1 = m0, m1
            cu.inter_dir = 0  # recon dispatches on gpm_flag
            cu.pred_mode = MODE_INTER
            return None
        if mtype == "mmvd":
            mi = drv_mmvd_merge_mvp_b(ictx, x0 - ctx.tile_x0, y0 - ctx.tile_y0,
                                      log2_w, log2_h, cu.merge_idx,
                                      ctx.max_num_merge_cand, ctx.mmvd_shift)
        else:
            mi = drv_merge_mvp_b(ictx, x0 - ctx.tile_x0, y0 - ctx.tile_y0,
                                 log2_w, log2_h, cu.merge_idx,
                                 ctx.max_num_merge_cand)
        if mtype == "ciip":
            _derive_ciip_wt(ctx, cu, x0, y0, log2_w, log2_h)
            # CIIP inter blend ignores the candidate's BCW weight; only
            # the MV maps keep it (vcl_coding_unit.c :2554-2555)
            from dataclasses import replace as _repl

            from openvvc_tpu.drv.inter_mvp import MergeInfo as _MI

            mi = _MI(mi.inter_dir, _repl(mi.mv0, bcw_idx_plus1=0),
                     _repl(mi.mv1, bcw_idx_plus1=0))
        ictx.prec_amvr = mi.mv0.prec_amvr if mi.inter_dir & 0x1 else mi.mv1.prec_amvr
    else:
        inter_dir = code_inter_dir(ctx, io, cu, log2_w, log2_h)
        if ctx.affine_enabled and log2_w > 3 and log2_h > 3:
            if code_affine_flag(ctx, io, cu, x0, y0):
                _affine_mvp_read_apply(ctx, io, cu, x0, y0, log2_w, log2_h,
                                       inter_dir)
                return None
        smvd = 0
        if inter_dir == 3 and ctx.smvd_enabled:
            wv = None if io.is_reader else (1 if cu.smvd_flag else 0)
            smvd = _sym_bin(io, CtxOffset.SMVD_FLAG, wv)
            if io.is_reader:
                cu.smvd_flag = smvd
        if smvd:
            mvd0 = code_mvd(ctx, io, None if io.is_reader else cu.mvd)
            if io.is_reader:
                cu.mvd = (mvd0.x, mvd0.y)
                cu.mvp_idx = io.raw_bin(CtxOffset.MVP_IDX)
                cu.mvp_idx1 = io.raw_bin(CtxOffset.MVP_IDX)
            else:
                io.put_bin(cu.mvp_idx, CtxOffset.MVP_IDX)
                io.put_bin(cu.mvp_idx1, CtxOffset.MVP_IDX)
            prec = MV_PRECISION_QUARTER
            if ctx.amvr_enabled and (mvd0.x or mvd0.y):
                prec = code_amvr_precision(ctx, io, cu)
            if io.is_reader:
                cu.amvr_prec = prec
            ictx.prec_amvr = prec
            bcw = _maybe_bcw(ctx, io, cu, log2_w, log2_h)
            mvd1 = MV(-mvd0.x, -mvd0.y)
            mi = drv_mvp_b(ictx, x0 - ctx.tile_x0, y0 - ctx.tile_y0,
                           log2_w, log2_h, mvd0, mvd1, prec,
                           cu.mvp_idx, cu.mvp_idx1, 3,
                           ctx.ref_smvd_idx0, ctx.ref_smvd_idx1, bcw_idx=bcw)
            if io.is_reader:
                cu.ref_idx = ctx.ref_smvd_idx0
                cu.ref_idx1 = ctx.ref_smvd_idx1
        elif inter_dir == 3:
            nb0, nb1 = ictx.nb_active_ref0, ictx.nb_active_ref1
            cu.ref_idx = code_ref_idx(ctx, io, cu, nb0) if nb0 > 1 \
                else (nb0 - 1 if io.is_reader else cu.ref_idx)
            mvd0 = code_mvd(ctx, io, None if io.is_reader else cu.mvd)
            if io.is_reader:
                cu.mvp_idx = io.raw_bin(CtxOffset.MVP_IDX)
            else:
                io.put_bin(cu.mvp_idx, CtxOffset.MVP_IDX)
            cu.ref_idx1 = _code_ref_idx1(ctx, io, cu, nb1)
            if not ctx.mvd1_zero:
                mvd1 = code_mvd(ctx, io, None if io.is_reader else cu.mvd1)
            else:
                mvd1 = MV(0, 0)
            if io.is_reader:
                cu.mvd = (mvd0.x, mvd0.y)
                cu.mvd1 = (mvd1.x, mvd1.y)
                cu.mvp_idx1 = io.raw_bin(CtxOffset.MVP_IDX)
            else:
                io.put_bin(cu.mvp_idx1, CtxOffset.MVP_IDX)
            prec = MV_PRECISION_QUARTER
            nz = (mvd0.x or mvd0.y) or (not ctx.mvd1_zero and (mvd1.x or mvd1.y))
            if ctx.amvr_enabled and nz:
                prec = code_amvr_precision(ctx, io, cu)
            if io.is_reader:
                cu.amvr_prec = prec
            ictx.prec_amvr = prec
            bcw = _maybe_bcw(ctx, io, cu, log2_w, log2_h)
            mi = drv_mvp_b(ictx, x0 - ctx.tile_x0, y0 - ctx.tile_y0,
                           log2_w, log2_h, mvd0, mvd1, prec,
                           cu.mvp_idx, cu.mvp_idx1, 3, cu.ref_idx, cu.ref_idx1,
                           bcw_idx=bcw)
        else:
            nb = ictx.nb_active_ref0 if inter_dir == 1 else ictx.nb_active_ref1
            if inter_dir == 1:
                cu.ref_idx = code_ref_idx(ctx, io, cu, nb) if nb > 1 \
                    else (nb - 1 if io.is_reader else cu.ref_idx)
                ridx = cu.ref_idx
            else:
                cu.ref_idx1 = _code_ref_idx1(ctx, io, cu, nb, always=True)
                ridx = cu.ref_idx1
            mvd0 = code_mvd(ctx, io, None if io.is_reader else cu.mvd)
            if io.is_reader:
                cu.mvd = (mvd0.x, mvd0.y)
                cu.mvp_idx = io.raw_bin(CtxOffset.MVP_IDX)
            else:
                io.put_bin(cu.mvp_idx, CtxOffset.MVP_IDX)
            prec = MV_PRECISION_QUARTER
            if ctx.amvr_enabled and (mvd0.x or mvd0.y):
                prec = code_amvr_precision(ctx, io, cu)
            if io.is_reader:
                cu.amvr_prec = prec
            ictx.prec_amvr = prec
            mi = drv_mvp_b(ictx, x0 - ctx.tile_x0, y0 - ctx.tile_y0,
                           log2_w, log2_h, mvd0, mvd0, prec,
                           cu.mvp_idx, cu.mvp_idx, inter_dir, ridx, ridx)
    cu.mv0 = mi.mv0
    cu.mv1 = mi.mv1
    cu.inter_dir = mi.inter_dir
    cu.pred_mode = MODE_INTER
    return mi


def _maybe_bcw(ctx, io, cu, log2_w, log2_h) -> int:
    """BCW idx read gate (read_bidir_mvp :2380): sps flag + size >= 256."""
    if ctx.bcw_enabled and (1 << (log2_w + log2_h)) >= 256:
        v = code_bcw_idx(ctx, io, cu, ctx.inter_ctx.ldc)
        if io.is_reader:
            cu.bcw_idx = v
        return v
    return 2


def _code_ref_idx1(ctx, io, cu, nb_active, always=False):
    """List-1 ref idx (same binarization as list 0)."""
    if nb_active <= 1:
        return nb_active - 1 if io.is_reader else getattr(cu, "ref_idx1", 0)
    if io.is_reader:
        v = 0
        if io.raw_bin(CtxOffset.REF_PIC):
            v = 1
            if nb_active > 2 and io.raw_bin(CtxOffset.REF_PIC + 1):
                v = 2
                while nb_active > v + 1 and io.raw_bypass():
                    v += 1
        return v
    v = cu.ref_idx1
    io.put_bin(1 if v > 0 else 0, CtxOffset.REF_PIC)
    if v > 0 and nb_active > 2:
        io.put_bin(1 if v > 1 else 0, CtxOffset.REF_PIC + 1)
        for k in range(2, v):
            io.put_bypass(1)
        if v >= 2 and nb_active > v + 1:
            io.put_bypass(0)
    return v


def code_inter_dir(ctx, io, cu, log2_w, log2_h) -> int:
    """ovcabac_read_ae_inter_dir parity (:2445)."""
    if io.is_reader:
        if log2_w + log2_h > 5:
            ctx_id = 7 - ((log2_w + log2_h + 1) >> 1)
            if io.raw_bin(CtxOffset.INTER_DIR + ctx_id):
                cu.inter_dir = 3
                return 3
        cu.inter_dir = 1 + io.raw_bin(CtxOffset.INTER_DIR + 5)
        return cu.inter_dir
    v = cu.inter_dir
    if log2_w + log2_h > 5:
        ctx_id = 7 - ((log2_w + log2_h + 1) >> 1)
        io.put_bin(1 if v == 3 else 0, CtxOffset.INTER_DIR + ctx_id)
        if v == 3:
            return 3
    else:
        assert v != 3, "no bi-pred on small blocks"
    io.put_bin(v - 1, CtxOffset.INTER_DIR + 5)
    return v


# ---------------------------------------------------------------------------
# IBC (intra block copy) syntax + drv wrap
# Parity: vcl_coding_unit.c ovcabac_read_ae_cu_ibc_flag (:68),
# ovcabac_read_ae_ibc_amvr_precision (:284), inter_mvp_data_ibc (:876),
# IBC branches of coding_unit_inter_st (:1030-1105) and
# coding_unit_intra (:1256-1300).
# ---------------------------------------------------------------------------


def code_ibc_flag(ctx, io, cu, x0, y0) -> int:
    from openvvc_tpu.vcl.slice_data import _nbr_cu_type

    abv = _nbr_cu_type(ctx, x0, y0 - 1)
    lft = _nbr_cu_type(ctx, x0 - 1, y0)
    off = (int(abv == CU_IBC) + int(lft == CU_IBC)
           + int(abv == CU_IBC_SKIP) + int(lft == CU_IBC_SKIP))
    wv = None if io.is_reader else (1 if cu.ibc_flag else 0)
    v = _sym_bin(io, CtxOffset.IBC_FLAG + off, wv)
    if io.is_reader:
        cu.ibc_flag = v
    return v


def code_ibc_amvr_precision(ctx, io, cu) -> int:
    """IBC AMVR: one IMV_FLAG+1 bin -> {integer, 4-pel}."""
    if io.is_reader:
        v = io.raw_bin(CtxOffset.IMV_FLAG + 1)
        cu.amvr_prec = MV_PRECISION_4PEL if v else MV_PRECISION_INT
        return cu.amvr_prec
    io.put_bin(1 if cu.amvr_prec == MV_PRECISION_4PEL else 0,
               CtxOffset.IMV_FLAG + 1)
    return cu.amvr_prec


def ibc_pu(ctx, io, cu, x0, y0, log2_w, log2_h, skip: bool):
    """IBC prediction data: merge or MVD + derivation; fills cu.ibc_mv."""
    from openvvc_tpu.drv.ibc import drv_ibc_merge_mv, drv_ibc_mvp
    from openvvc_tpu.vcl.ctu import MODE_IBC

    nb_cand = ctx.nb_ibc_cand
    if skip:
        merge = 1
        cu.merge_flag = 1
    else:
        if io.is_reader:
            merge = io.raw_bin(CtxOffset.MERGE_FLAG)
            cu.merge_flag = merge
        else:
            merge = cu.merge_flag
            io.put_bin(merge, CtxOffset.MERGE_FLAG)

    lx, ly = x0 - ctx.tile_x0, y0 - ctx.tile_y0
    if merge:
        code_merge_idx(ctx, io, cu, nb_cand)
        mv, edges = drv_ibc_merge_mv(ctx.ibc_ctx, lx, ly, log2_w, log2_h,
                                     cu.merge_idx, nb_cand)
    else:
        mvd = code_mvd(ctx, io, None if io.is_reader else cu.mvd)
        if io.is_reader:
            cu.mvd = (mvd.x, mvd.y)
        if nb_cand - 1:
            if io.is_reader:
                cu.mvp_idx = io.raw_bin(CtxOffset.MVP_IDX)
            else:
                io.put_bin(cu.mvp_idx, CtxOffset.MVP_IDX)
        elif io.is_reader:
            cu.mvp_idx = 0
        prec = MV_PRECISION_INT
        if ctx.amvr_enabled and (mvd.x or mvd.y):
            prec = code_ibc_amvr_precision(ctx, io, cu)
        if io.is_reader:
            cu.amvr_prec = prec
        mv, edges = drv_ibc_mvp(ctx.ibc_ctx, lx, ly, log2_w, log2_h,
                                mvd, cu.mvp_idx, prec)
    cu.ibc_flag = 1
    cu.ibc_mv = (mv.x, mv.y)
    cu.ibc_dbf = edges
    cu.pred_mode = MODE_IBC

"""Transform unit / transform tree syntax — ITU-T H.266 7.3.11.10/7.3.11.11.

Covers: max-TB splitting, cbf coding (luma/chroma/joint-CbCr), delta-QP,
transform-skip flags, CU-level LFNST and explicit-MTS indices with their
last-position/sig-map gating. ISP and SBT subtrees land with their tools.

Behavior parity: /root/reference/libovvc/vcl_transform_unit.c
(transform_unit_st/_l/_c :810-905, decode_cbf_st :380-470, lfnst_mts :905-999,
transform_tree :1000-1084, transform_unit_wrap :1819-1963).

Writer side: the generator pre-builds `cu.tus` with one TU entry per coded
block (cbf=1), carrying transmitted levels and last_pos; cbf flags and
indices are derived by position/component lookup, so reader and writer share
all the gating logic.
"""

from __future__ import annotations

from openvvc_tpu.cabac.ctx import CtxOffset
from openvvc_tpu.vcl.ctu import CU, TREE_DUAL_CHROMA, TREE_DUAL_LUMA, TREE_SINGLE, TU
from openvvc_tpu.vcl.residual import diag_scan, residual_coding, residual_ts_coding

_SCAN_4x4_INDEX = {pos: i for i, pos in enumerate(diag_scan(4, 4))}


def _nb_coeffs_in_first_sb(last_x: int, last_y: int) -> int:
    """Scan index of last_pos within the DC 4x4 subblock; 0xFF if outside."""
    if (last_x >> 2) or (last_y >> 2):
        return 0xFF
    return _SCAN_4x4_INDEX[(last_x & 3, last_y & 3)]


def chroma_qp(ctx, comp: int, qp_y: int) -> int:
    """Chroma QP for comp (1=Cb, 2=Cr, 3=JCbCr) incl. bitdepth offset."""
    pps, sh = ctx.pps, ctx.sh
    qp_bd = ctx.params.qp_bd_offset
    base = max(0, min(63, qp_y))
    tab = ctx.params.chroma_qp_tables[comp - 1]
    mapped = tab[base + qp_bd]
    if comp == 1:
        off = pps.pps_cb_qp_offset + sh.sh_cb_qp_offset
    elif comp == 2:
        off = pps.pps_cr_qp_offset + sh.sh_cr_qp_offset
    else:
        off = pps.pps_joint_cbcr_qp_offset_value + sh.sh_joint_cbcr_qp_offset
    return max(-qp_bd, min(63, mapped + off)) + qp_bd


def _find_tu(cu: CU, comp: int, x: int, y: int) -> TU | None:
    for tu in cu.tus:
        if tu.comp == comp and tu.x0 == x and tu.y0 == y:
            return tu
    return None


def _sym_bin(io, ctx_idx: int, value=None) -> int:
    if io.is_reader:
        return io.raw_bin(ctx_idx)
    io.put_bin(value, ctx_idx)
    return value


def _maybe_delta_qp(ctx, io, cu: CU, any_cbf: int):
    if not (ctx.cu_qp_delta_enabled and any_cbf) or ctx.is_cu_qp_delta_coded:
        return
    if io.is_reader:
        v = io.raw_bin(CtxOffset.DELTA_QP)
        if v:
            while v < 5 and io.raw_bin(CtxOffset.DELTA_QP + 1):
                v += 1
            if v >= 5:
                v += _eg_bypass_read(io)
            if io.raw_bypass():
                v = -v
        cu.cu_qp_delta = v
    else:
        v = int(getattr(cu, "cu_qp_delta", 0))
        a = abs(v)
        io.put_bin(1 if a else 0, CtxOffset.DELTA_QP)
        if a:
            for _ in range(min(a, 5) - 1):
                io.put_bin(1, CtxOffset.DELTA_QP + 1)
            if a < 5:
                io.put_bin(0, CtxOffset.DELTA_QP + 1)
            else:
                _eg_bypass_write(io, a - 5)
            io.put_bypass(1 if v < 0 else 0)
    ctx.is_cu_qp_delta_coded = True
    qp_bd = ctx.params.qp_bd_offset
    ctx.qp = ((ctx.qp + int(getattr(cu, "cu_qp_delta", 0)) + 64 + 2 * qp_bd) % (64 + qp_bd)) - qp_bd


def _eg_bypass_read(io):
    symbol = 0
    count = 0
    while io.raw_bypass() and count <= 32:
        symbol += 1 << count
        count += 1
    add = 0
    for _ in range(count):
        add = (add << 1) | io.raw_bypass()
    return symbol + add


def _eg_bypass_write(io, value):
    count = 0
    base = 0
    while value >= base + (1 << count):
        base += 1 << count
        count += 1
    for _ in range(count):
        io.put_bypass(1)
    io.put_bypass(0)
    rem = value - base
    for k in range(count - 1, -1, -1):
        io.put_bypass((rem >> k) & 1)


def _transform_skip_flag(ctx, io, tu: TU | None, comp: int, log2_w: int, log2_h: int, bdpcm: int) -> int:
    if getattr(ctx, "_sbt_active", False):  # no TS inside SBT (vcl :632)
        return 0
    if not (ctx.transform_skip_enabled and log2_w <= ctx.log2_ts_max and log2_h <= ctx.log2_ts_max):
        return 0
    if bdpcm:
        return 1
    base = CtxOffset.TRANSFORM_SKIP_FLAG + (0 if comp == 0 else 1)
    return _sym_bin(io, base, None if io.is_reader else (1 if tu.transform_skip else 0))


def _code_tb(ctx, io, tu: TU, luma: bool):
    # SBT with an active implicit MTS pair uses the reduced (zero-out)
    # residual area and last-pos binarization (vcl_transform_unit.c :642)
    red = bool(luma and getattr(ctx, "_sbt_active", False)
               and getattr(ctx, "_sbt_mts", False))
    if io.is_reader:
        dec = getattr(io, "dec", None)
        if hasattr(dec, "decode_tb"):
            # native C residual_coding (openvvc_tpu/native/residual.c),
            # bit-exact vs the Python reader (tests/test_native_residual.py)
            levels, decoded, last, sig_map = dec.decode_tb(
                tu.log2_w, tu.log2_h, luma, ctx.dep_quant, ctx.sign_hiding,
                mts_reduced=red)
        else:
            levels, decoded, last, sig_map = residual_coding(
                io, None, tu.log2_w, tu.log2_h, luma, ctx.dep_quant, ctx.sign_hiding,
                mts_reduced=red,
            )
        tu.levels = levels
        tu.coeffs = decoded
    else:
        levels, decoded, last, sig_map = residual_coding(
            io, tu.levels, tu.log2_w, tu.log2_h, luma, ctx.dep_quant, ctx.sign_hiding,
            last_pos=tu.last_pos, mts_reduced=red,
        )
        tu.coeffs = decoded
    tu.last_pos = last
    tu.sig_sb_map = sig_map
    return last, sig_map



def _code_ts_tb(ctx, io, tu: TU, luma: bool, bdpcm_dir: int):
    """Transform-skip TB: qp floor at QpPrimeTsMin, no last-position."""
    tu.qp = max(tu.qp, 4 + 6 * ctx.sps.sps_min_qp_prime_ts)
    tu.bdpcm_dir = bdpcm_dir
    if io.is_reader:
        levels, sig_map = residual_ts_coding(io, None, tu.log2_w, tu.log2_h,
                                             bool(tu.bdpcm), luma)
    else:
        levels, sig_map = residual_ts_coding(io, tu.levels, tu.log2_w, tu.log2_h,
                                             bool(tu.bdpcm), luma)
    tu.levels = levels
    tu.coeffs = levels
    tu.last_pos = (0, 0)
    tu.sig_sb_map = sig_map
    return (0, 0), sig_map


def transform_unit(ctx, io, cu: CU, x0, y0, log2_w, log2_h, tr_depth: int,
                   root_cbf: int = 0):
    """One TU unit at luma coords (x0,y0); coords are component-local for
    dual-tree chroma. Returns the info dict used by lfnst/mts gating."""
    tree = ctx.tree_type
    info = {"cbf_mask": 0, "tr_skip": False}
    for k in ("luma", "cb", "cr", "jcbcr"):
        info[f"{k}_last"] = None
        info[f"{k}_sig_map"] = 0

    has_chroma = tree != TREE_DUAL_LUMA and ctx.chroma_enabled
    has_luma = tree != TREE_DUAL_CHROMA
    if tree == TREE_DUAL_CHROMA:
        cx, cy, clog2_w, clog2_h = x0, y0, log2_w, log2_h
    else:
        cx, cy, clog2_w, clog2_h = x0 >> 1, y0 >> 1, log2_w - 1, log2_h - 1

    # --- cbf flags -----------------------------------------------------
    cbf_cb = cbf_cr = joint = 0
    if has_chroma:
        bd = 1 if cu.bdpcm_c else 0
        w_cb = None if io.is_reader else (
            1 if (_find_tu(cu, 1, cx, cy) or (_find_tu(cu, 3, cx, cy) and _find_tu(cu, 3, cx, cy).joint_cbcr & 2)) else 0
        )
        cbf_cb = _sym_bin(io, CtxOffset.QT_CBF_CB + bd, w_cb)
        w_cr = None if io.is_reader else (
            1 if (_find_tu(cu, 2, cx, cy) or (_find_tu(cu, 3, cx, cy) and _find_tu(cu, 3, cx, cy).joint_cbcr & 1)) else 0
        )
        cbf_cr = _sym_bin(io, CtxOffset.QT_CBF_CR + (cbf_cb | bd) + bd, w_cr)
    cbf_mask_c = (cbf_cb << 1) | cbf_cr

    cbf_luma = 0
    if has_luma:
        # luma cbf coded unless inferred 1 by an inter root cbf with no
        # chroma cbf at depth 0 (decode_cbf_st :397-412)
        if root_cbf and not cbf_mask_c and not tr_depth:
            cbf_luma = 1
            if not io.is_reader:
                assert _find_tu(cu, 0, x0, y0) is not None, "root cbf forces luma cbf"
        else:
            bd = 1 if cu.bdpcm_l else 0
            w_l = None if io.is_reader else (1 if _find_tu(cu, 0, x0, y0) else 0)
            cbf_luma = _sym_bin(io, CtxOffset.QT_CBF + bd, w_l)

    _maybe_delta_qp(ctx, io, cu, root_cbf | cbf_luma | cbf_mask_c)

    if ctx.joint_cbcr_enabled and cbf_mask_c:
        w_j = None if io.is_reader else (1 if _find_tu(cu, 3, cx, cy) else 0)
        joint = _sym_bin(io, CtxOffset.JOINT_CB_CR_FLAG + cbf_mask_c - 1, w_j)

    info["cbf_mask"] = cbf_mask_c | (joint << 3) | (cbf_luma << 4)
    qp_y = ctx.qp

    # --- luma TB --------------------------------------------------------
    if cbf_luma:
        tu = _find_tu(cu, 0, x0, y0) if not io.is_reader else TU(x0, y0, log2_w, log2_h, 0)
        tu.cbf = 1
        tu.qp = qp_y + ctx.params.qp_bd_offset
        tu.bdpcm = cu.bdpcm_l
        ts = _transform_skip_flag(ctx, io, tu, 0, log2_w, log2_h, cu.bdpcm_l)
        tu.transform_skip = ts
        if ts:
            last, sig = _code_ts_tb(ctx, io, tu, True, cu.bdpcm_dir_l)
        else:
            last, sig = _code_tb(ctx, io, tu, True)
        info["luma_last"], info["luma_sig_map"] = last, sig
        if io.is_reader:
            cu.tus.append(tu)

    # --- chroma TBs -----------------------------------------------------
    if joint:
        tu = _find_tu(cu, 3, cx, cy) if not io.is_reader else TU(cx, cy, clog2_w, clog2_h, 3)
        tu.cbf = 1
        tu.joint_cbcr = cbf_mask_c
        tu.bdpcm = cu.bdpcm_c
        tu.qp = chroma_qp(ctx, 3 if cbf_mask_c == 3 else (1 if cbf_cb else 2), qp_y)
        ts = _transform_skip_flag(ctx, io, tu, 1, clog2_w, clog2_h, cu.bdpcm_c)
        tu.transform_skip = ts
        if ts:
            last, sig = _code_ts_tb(ctx, io, tu, False, cu.bdpcm_dir_c)
        else:
            last, sig = _code_tb(ctx, io, tu, False)
        info["jcbcr_last"], info["jcbcr_sig_map"] = last, sig
        if io.is_reader:
            cu.tus.append(tu)
    elif cbf_mask_c:
        for comp, flag, key in ((1, cbf_cb, "cb"), (2, cbf_cr, "cr")):
            if not flag:
                continue
            tu = _find_tu(cu, comp, cx, cy) if not io.is_reader else TU(cx, cy, clog2_w, clog2_h, comp)
            tu.cbf = 1
            tu.bdpcm = cu.bdpcm_c
            tu.qp = chroma_qp(ctx, comp, qp_y)
            ts = _transform_skip_flag(ctx, io, tu, comp, clog2_w, clog2_h, cu.bdpcm_c)
            tu.transform_skip = ts
            if ts:
                last, sig = _code_ts_tb(ctx, io, tu, False, cu.bdpcm_dir_c)
            else:
                last, sig = _code_tb(ctx, io, tu, False)
            info[f"{key}_last"], info[f"{key}_sig_map"] = last, sig
            if io.is_reader:
                cu.tus.append(tu)
    return info


def isp_part_dims(log2_cb_w: int, log2_cb_h: int, isp_mode: int):
    """ISP partition dims and count (isp_subtree_v/h :1361/1430 clamp rules).

    isp_mode: 1 = horizontal split, 2 = vertical split.
    Returns (log2_pb_w, log2_pb_h, nb_pb).
    """
    if isp_mode == 2:  # vertical
        log2_pb_w = log2_cb_w - 2
        if log2_cb_h < 4 and log2_pb_w <= 4 - log2_cb_h:
            log2_pb_w = 4 - log2_cb_h
        return log2_pb_w, log2_cb_h, (1 << log2_cb_w) >> log2_pb_w
    log2_pb_h = log2_cb_h - 2
    if log2_cb_w < 4 and log2_pb_h <= 4 - log2_cb_w:
        log2_pb_h = 4 - log2_cb_w
    return log2_cb_w, log2_pb_h, (1 << log2_cb_h) >> log2_pb_h


def _code_chroma_tbs(ctx, io, cu, cx, cy, clog2_w, clog2_h, cbf_cb, cbf_cr, joint, info, qp_y):
    """Joint or separate chroma TB coding (shared by TU and ISP subtree)."""
    cbf_mask_c = (cbf_cb << 1) | cbf_cr
    if joint:
        tu = _find_tu(cu, 3, cx, cy) if not io.is_reader else TU(cx, cy, clog2_w, clog2_h, 3)
        tu.cbf = 1
        tu.joint_cbcr = cbf_mask_c
        tu.bdpcm = cu.bdpcm_c
        tu.qp = chroma_qp(ctx, 3 if cbf_mask_c == 3 else (1 if cbf_cb else 2), qp_y)
        ts = _transform_skip_flag(ctx, io, tu, 1, clog2_w, clog2_h, cu.bdpcm_c)
        tu.transform_skip = ts
        if ts:
            last, sig = _code_ts_tb(ctx, io, tu, False, cu.bdpcm_dir_c)
        else:
            last, sig = _code_tb(ctx, io, tu, False)
        info["jcbcr_last"], info["jcbcr_sig_map"] = last, sig
        if io.is_reader:
            cu.tus.append(tu)
    elif cbf_mask_c:
        for comp, flag, key in ((1, cbf_cb, "cb"), (2, cbf_cr, "cr")):
            if not flag:
                continue
            tu = _find_tu(cu, comp, cx, cy) if not io.is_reader else TU(cx, cy, clog2_w, clog2_h, comp)
            tu.cbf = 1
            tu.bdpcm = cu.bdpcm_c
            tu.qp = chroma_qp(ctx, comp, qp_y)
            ts = _transform_skip_flag(ctx, io, tu, comp, clog2_w, clog2_h, cu.bdpcm_c)
            tu.transform_skip = ts
            if ts:
                last, sig = _code_ts_tb(ctx, io, tu, False, cu.bdpcm_dir_c)
            else:
                last, sig = _code_tb(ctx, io, tu, False)
            info[f"{key}_last"], info[f"{key}_sig_map"] = last, sig
            if io.is_reader:
                cu.tus.append(tu)


def isp_subtree(ctx, io, cu: CU, x0, y0, log2_cb_w, log2_cb_h):
    """ISP luma partition loop + whole-CU chroma + LFNST gating.

    Mirrors isp_subtree_v/h (:1344/:1562): per-partition cbf with ctx
    QT_CBF+2+prev and residuals interleaved; chroma cbfs coded between the
    second-to-last and last luma cbf; last cbf inferred 1 when all others 0;
    LFNST coded after (no explicit MTS for ISP).
    """
    vertical = cu.isp_mode == 2
    log2_pb_w, log2_pb_h, nb_pb = isp_part_dims(log2_cb_w, log2_cb_h, cu.isp_mode)
    step = ((1 << log2_pb_w), 0) if vertical else (0, (1 << log2_pb_h))
    coords = [(x0 + i * step[0], y0 + i * step[1]) for i in range(nb_pb)]

    tree = ctx.tree_type
    has_chroma = tree == TREE_SINGLE and ctx.chroma_enabled
    info = {"cbf_mask": 0, "tr_skip": False}
    for k in ("luma", "cb", "cr", "jcbcr"):
        info[f"{k}_last"] = None
        info[f"{k}_sig_map"] = 0

    part_tbs = []  # (last, sig_map) per partition with cbf
    prev_cbf = 0
    cbf_any = 0
    cbfs = []

    def code_partition(i):
        px, py = coords[i]
        tu = _find_tu(cu, 0, px, py) if not io.is_reader else TU(px, py, log2_pb_w, log2_pb_h, 0)
        tu.cbf = 1
        tu.qp = ctx.qp + ctx.params.qp_bd_offset
        last, sig = _code_tb(ctx, io, tu, True)
        part_tbs.append((last, sig))
        if io.is_reader:
            cu.tus.append(tu)

    for i in range(nb_pb - 1):
        px, py = coords[i]
        w_cbf = None if io.is_reader else (1 if _find_tu(cu, 0, px, py) else 0)
        cbf = _sym_bin(io, CtxOffset.QT_CBF + 2 + prev_cbf, w_cbf)
        prev_cbf = cbf
        cbf_any |= cbf
        cbfs.append(cbf)
        if cbf:
            _maybe_delta_qp(ctx, io, cu, 1)
            code_partition(i)

    cbf_cb = cbf_cr = joint = 0
    if has_chroma:
        cx, cy, clog2_w, clog2_h = x0 >> 1, y0 >> 1, log2_cb_w - 1, log2_cb_h - 1
        w_cb = None if io.is_reader else (
            1 if (_find_tu(cu, 1, cx, cy) or (_find_tu(cu, 3, cx, cy) and _find_tu(cu, 3, cx, cy).joint_cbcr & 2)) else 0
        )
        cbf_cb = _sym_bin(io, CtxOffset.QT_CBF_CB, w_cb)
        w_cr = None if io.is_reader else (
            1 if (_find_tu(cu, 2, cx, cy) or (_find_tu(cu, 3, cx, cy) and _find_tu(cu, 3, cx, cy).joint_cbcr & 1)) else 0
        )
        cbf_cr = _sym_bin(io, CtxOffset.QT_CBF_CR + cbf_cb, w_cr)
    cbf_mask_c = (cbf_cb << 1) | cbf_cr

    # last partition cbf: inferred 1 when all previous were 0
    px, py = coords[nb_pb - 1]
    if not cbf_any:
        cbf = 1
        if not io.is_reader:
            assert _find_tu(cu, 0, px, py) is not None, \
                "ISP: last partition must have cbf=1 when all others are 0"
    else:
        w_cbf = None if io.is_reader else (1 if _find_tu(cu, 0, px, py) else 0)
        cbf = _sym_bin(io, CtxOffset.QT_CBF + 2 + prev_cbf, w_cbf)
    cbfs.append(cbf)
    if cbf:
        _maybe_delta_qp(ctx, io, cu, 1)

    if ctx.joint_cbcr_enabled and cbf_mask_c:
        w_j = None if io.is_reader else (1 if _find_tu(cu, 3, x0 >> 1, y0 >> 1) else 0)
        joint = _sym_bin(io, CtxOffset.JOINT_CB_CR_FLAG + cbf_mask_c - 1, w_j)

    if cbf:
        code_partition(nb_pb - 1)

    if cbf_mask_c:
        _code_chroma_tbs(ctx, io, cu, x0 >> 1, y0 >> 1, log2_cb_w - 1, log2_cb_h - 1,
                         cbf_cb, cbf_cr, joint, info, ctx.qp)

    cu.isp_cbfs = cbfs

    # --- LFNST (no MTS for ISP) ----------------------------------------
    narrow = (log2_pb_w if vertical else log2_pb_h) <= 1
    if ctx.lfnst_enabled and not narrow:
        if vertical:
            max_pos = 7 if (log2_cb_h == log2_pb_w and log2_pb_w <= 3) else 15
        else:
            max_pos = 7 if (log2_pb_h == log2_cb_w and log2_cb_w <= 3) else 15
        can_lfnst = True
        sb_or = 0
        for last, sig in part_tbs:
            sb_or |= sig
            can_lfnst &= _nb_coeffs_in_first_sb(*last) <= max_pos
        can_lfnst &= sb_or <= 1
        if cbf_mask_c:
            max_pos_c = 7 if (log2_cb_h == log2_cb_w and log2_cb_w <= 4) else 15
            if log2_cb_w - 1 > 1 and log2_cb_h - 1 > 1:
                if joint:
                    can_lfnst &= info["jcbcr_sig_map"] <= 1
                    can_lfnst &= _nb_coeffs_in_first_sb(*info["jcbcr_last"]) <= max_pos_c
                else:
                    if cbf_mask_c & 0x2:
                        can_lfnst &= info["cb_sig_map"] <= 1
                        can_lfnst &= _nb_coeffs_in_first_sb(*info["cb_last"]) <= max_pos_c
                    if cbf_mask_c & 0x1:
                        can_lfnst &= info["cr_sig_map"] <= 1
                        can_lfnst &= _nb_coeffs_in_first_sb(*info["cr_last"]) <= max_pos_c
            can_lfnst &= not any(tu.transform_skip for tu in cu.tus if tu.comp)

        if can_lfnst:
            is_dual = 1 if tree != TREE_SINGLE else 0
            if io.is_reader:
                idx = 0
                if io.raw_bin(CtxOffset.LFNST_IDX + is_dual):
                    idx = 1 + io.raw_bin(CtxOffset.LFNST_IDX + 2)
                cu.lfnst_idx = idx
                for tu in cu.tus:
                    tu.lfnst_idx = idx
            else:
                idx = cu.lfnst_idx
                io.put_bin(1 if idx else 0, CtxOffset.LFNST_IDX + is_dual)
                if idx:
                    io.put_bin(idx - 1, CtxOffset.LFNST_IDX + 2)
                for tu in cu.tus:
                    tu.lfnst_idx = idx


def transform_tree_intra(ctx, io, cu: CU, x0, y0, log2_w, log2_h, tr_depth=0,
                         root_cbf=0):
    """Max-TB splitting for an intra CU without ISP/SBT; returns the single
    TU info when no split occurred (for CU-level lfnst/mts), else None."""
    part = ctx.part_chroma if ctx.tree_type == TREE_DUAL_CHROMA else ctx.part_luma
    max_tb = part.log2_max_tb_s
    split_v = log2_w > max_tb
    split_h = log2_h > max_tb
    if split_v or split_h:
        l2w = log2_w - (1 if split_v else 0)
        l2h = log2_h - (1 if split_h else 0)
        coords = [(x0, y0)]
        if split_v:
            coords.append((x0 + (1 << l2w), y0))
        if split_h:
            coords.append((x0, y0 + (1 << l2h)))
        if split_v and split_h:
            coords.append((x0 + (1 << l2w), y0 + (1 << l2h)))
        for nx, ny in coords:
            transform_tree_intra(ctx, io, cu, nx, ny, l2w, l2h, tr_depth + 1,
                                 root_cbf)
        return None
    return transform_unit(ctx, io, cu, x0, y0, log2_w, log2_h, tr_depth, root_cbf)


def lfnst_mts_idx(ctx, io, cu: CU, log2_w, log2_h, info):
    """CU-level LFNST and explicit-MTS indices (after an unsplit TU)."""
    if info is None or not info["cbf_mask"]:
        return
    tree = ctx.tree_type
    cbf_mask = info["cbf_mask"]
    tr_skip = any(tu.transform_skip for tu in cu.tus)

    can_lfnst = False
    if ctx.lfnst_enabled and not tr_skip and cu.pred_mode == 0:
        mip_ok = not cu.mip_flag or (log2_w >= 4 and log2_h >= 4)
        if tree == TREE_SINGLE and mip_ok:
            can_lfnst = _lfnst_check_st(log2_w, log2_h, cbf_mask, info)
        elif tree == TREE_DUAL_LUMA and mip_ok and (cbf_mask & 0x10):
            last = info["luma_last"]
            max_pos = 7 if (log2_w == log2_h and log2_w <= 3) else 15
            nb = _nb_coeffs_in_first_sb(*last)
            can_lfnst = info["luma_sig_map"] <= 1 and nb <= max_pos and last != (0, 0)
        elif tree == TREE_DUAL_CHROMA:
            can_lfnst = _lfnst_check_chroma(log2_w, log2_h, cbf_mask, info)

    if can_lfnst:
        is_dual = 1 if tree != TREE_SINGLE else 0
        if io.is_reader:
            idx = 0
            if io.raw_bin(CtxOffset.LFNST_IDX + is_dual):
                idx = 1 + io.raw_bin(CtxOffset.LFNST_IDX + 2)
            cu.lfnst_idx = idx
            for tu in cu.tus:
                tu.lfnst_idx = idx
        else:
            idx = cu.lfnst_idx
            io.put_bin(1 if idx else 0, CtxOffset.LFNST_IDX + is_dual)
            if idx:
                io.put_bin(idx - 1, CtxOffset.LFNST_IDX + 2)

    # explicit MTS on the luma TB (gated on the luma TB's ts only)
    luma_ts = any(tu.transform_skip for tu in cu.tus if tu.comp == 0)
    if tree != TREE_DUAL_CHROMA and (cbf_mask & 0x10) and not luma_ts:
        explicit = ctx.explicit_mts_intra if cu.pred_mode == 0 else ctx.explicit_mts_inter
        if ctx.mts_enabled and explicit and not cu.lfnst_idx:
            last = info["luma_last"]
            sig_map = info["luma_sig_map"]
            if last != (0, 0) and log2_w < 6 and log2_h < 6 and not (sig_map & ~0x000000000F0F0F0F):
                # flag at MTS_IDX, then cu_mts_idx as up to 3 bins at +1/+2/+3
                # (ovcabac_read_ae_cu_mts_flag/_idx :176-194); TU mts_idx 1..4
                # = flag + decoded symbol
                luma_tu = next(tu for tu in cu.tus if tu.comp == 0)
                if io.is_reader:
                    idx = 0
                    if io.raw_bin(CtxOffset.MTS_IDX):
                        sym = io.raw_bin(CtxOffset.MTS_IDX + 1)
                        if sym and io.raw_bin(CtxOffset.MTS_IDX + 2):
                            sym += 1
                            if io.raw_bin(CtxOffset.MTS_IDX + 3):
                                sym += 1
                        idx = 1 + sym
                    luma_tu.mts_idx = idx
                else:
                    idx = luma_tu.mts_idx
                    io.put_bin(1 if idx else 0, CtxOffset.MTS_IDX)
                    if idx:
                        sym = idx - 1
                        io.put_bin(1 if sym > 0 else 0, CtxOffset.MTS_IDX + 1)
                        if sym > 0:
                            io.put_bin(1 if sym > 1 else 0, CtxOffset.MTS_IDX + 2)
                            if sym > 1:
                                io.put_bin(1 if sym > 2 else 0, CtxOffset.MTS_IDX + 3)


def _lfnst_check_st(log2_w, log2_h, cbf_mask, info):
    max_pos_l = 7 if (log2_w == log2_h and log2_w <= 3) else 15
    max_pos_c = 7 if (log2_w == log2_h and log2_w <= 4) else 15
    non_dc = 0
    ok = True
    if cbf_mask & 0x10:
        nb = _nb_coeffs_in_first_sb(*info["luma_last"])
        ok &= info["luma_sig_map"] <= 1 and nb <= max_pos_l
        non_dc |= nb
    if (cbf_mask & 0x8) and log2_w > 2 and log2_h > 2:
        nb = _nb_coeffs_in_first_sb(*info["jcbcr_last"])
        ok &= info["jcbcr_sig_map"] <= 1 and nb <= max_pos_c
        non_dc |= nb
    else:
        if (cbf_mask & 0x2) and log2_w > 2 and log2_h > 2:
            nb = _nb_coeffs_in_first_sb(*info["cb_last"])
            ok &= info["cb_sig_map"] <= 1 and nb <= max_pos_c
            non_dc |= nb
        if (cbf_mask & 0x1) and log2_w > 2 and log2_h > 2:
            nb = _nb_coeffs_in_first_sb(*info["cr_last"])
            ok &= info["cr_sig_map"] <= 1 and nb <= max_pos_c
            non_dc |= nb
    return bool(ok) and bool(non_dc)


def _lfnst_check_chroma(log2_w, log2_h, cbf_mask, info):
    if log2_w <= 1 or log2_h <= 1:
        return False
    max_pos = 7 if (log2_w == log2_h and log2_w <= 3) else 15
    if cbf_mask & 0x8:
        nb = _nb_coeffs_in_first_sb(*info["jcbcr_last"])
        return info["jcbcr_sig_map"] <= 1 and 0 < nb <= max_pos
    ok = bool(cbf_mask & 3)
    nbs = 0
    if cbf_mask & 0x2:
        nb = _nb_coeffs_in_first_sb(*info["cb_last"])
        ok &= info["cb_sig_map"] <= 1 and nb <= max_pos
        nbs |= nb
    if cbf_mask & 0x1:
        nb = _nb_coeffs_in_first_sb(*info["cr_last"])
        ok &= info["cr_sig_map"] <= 1 and nb <= max_pos
        nbs |= nb
    return bool(ok) and bool(nbs)

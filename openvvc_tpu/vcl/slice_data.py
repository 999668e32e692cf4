"""Slice data: per-entry CTU loop and the CU dispatcher.

Equivalent of the reference's slicedec_decode_rect_entry + decode_ctu_line +
coding_unit wrapper (/root/reference/libovvc/slicedec.c:637-1216,
vcl_coding_unit.c:754-990). Parses (or generates) one tile entry's CABAC
payload, producing the per-CTU IR consumed by reconstruction.

I-slice intra path; inter CU parsing is added with the inter tools.
"""

from __future__ import annotations

from openvvc_tpu.cabac.engine import CabacDecoder, CabacEncoder
from openvvc_tpu.hls.ph import SLICE_I
from openvvc_tpu.vcl.cabac_io import CabacReaderIO, CabacWriterIO
from openvvc_tpu.vcl.coding_tree import TreeNode, coding_quadtree, dual_tree_ctu
from openvvc_tpu.vcl.coding_unit import (
    CU_INTRA,
    CU_MIP,
    coding_unit_intra_chroma,
    coding_unit_intra_luma,
)
from openvvc_tpu.vcl.ctu import (
    CU,
    CTUParseCtx,
    CtuIR,
    INTRA_DC,
    INTRA_PLANAR,
    MODE_INTRA,
    TREE_DUAL_CHROMA,
    TREE_DUAL_LUMA,
    TREE_SINGLE,
    UNAVAIL,
)
from openvvc_tpu.vcl.alf import code_alf_ctu, code_cc_alf_ctu
from openvvc_tpu.vcl.sao import code_sao_ctu
from openvvc_tpu.vcl.transform_unit import isp_subtree, lfnst_mts_idx, transform_tree_intra
from openvvc_tpu.vcl.inter_pu import (
    CU_AFFINE,
    CU_INTER,
    CU_INTER_SKIP,
    CU_INTER_SKIP_AFFINE,
    CU_NA,
    prediction_unit_inter_b,
    prediction_unit_inter_p,
    read_pred_mode_flag,
    read_skip_flag,
)
from openvvc_tpu.cabac.ctx import CtxOffset
from openvvc_tpu.vcl.ctu import MODE_INTER
from openvvc_tpu.vcl.inter_pu import _sym_bin


def _collocated_luma_mode(ctx, cx0, cy0, clog2_w, clog2_h) -> int:
    """Luma mode at the center of the collocated luma area (spec 8.4.3)."""
    lx = (cx0 << 1) + (1 << clog2_w)  # center: cx0*2 + cw  (cw = 2^clog2_w)
    ly = (cy0 << 1) + (1 << clog2_h)
    mode = ctx.nbr_intra_mode(lx, ly)
    if mode == UNAVAIL:
        return INTRA_DC  # non-intra collocated luma -> DC (spec: IBC/PLT)
    return mode


def coding_unit_dispatch(ctx, io, node, x0, y0, log2_w, log2_h):
    """Parse/write one CU at a tree leaf. Component-local coords."""
    tree = ctx.tree_type

    if ctx.slice_type != SLICE_I:
        if tree == TREE_SINGLE and ctx.share != 1:
            return coding_unit_inter_st(ctx, io, node, x0, y0, log2_w,
                                        log2_h)
        # SCIPU local dual tree (share == 1): the luma subtree's leaves are
        # intra CUs and the chroma subtree follows — same flow as the
        # I-slice dual tree (the reference swaps coding_unit to
        # &coding_unit_intra under sep_tree == 1, vcl_coding_tree.c:326-346,
        # :994-997)

    if io.is_reader:
        cu = CU(x0, y0, log2_w, log2_h, tree_type=tree)
        node.cu = cu
    else:
        cu = node.cu

    # delta-QP group start: spec-style (left+above+1)>>1 prediction with
    # CTU-local maps (vcl_coding_unit.c :732-751)
    if tree != TREE_DUAL_CHROMA and ctx.cu_qp_delta_enabled:
        min_cb = ctx.part_luma.log2_min_cb_s
        x0l, y0l = x0 & (ctx.ctb_size - 1), y0 & (ctx.ctb_size - 1)
        msk = (1 << (ctx.log2_ctb + 1 - ctx.cu_qp_delta_subdiv)) - 1
        if not ((x0l & msk) | (y0l & msk)):
            gx, gy = x0l & ~msk, y0l & ~msk
            abv = ctx.qp_map_x[gx >> min_cb] if y0l else ctx.qp
            lft = ctx.qp_map_y[gy >> min_cb] if x0l else ctx.qp
            ctx.qp = (abv + lft + 1) >> 1
            ctx.is_cu_qp_delta_coded = False
    cu.qp = ctx.qp

    # IBC in I slices (coding_unit_intra :1256-1300): skip flag + ibc flag
    # gate the block-copy path before any intra syntax
    if (ctx.slice_type == SLICE_I and ctx.ibc_enabled and tree == TREE_SINGLE
            and ctx.share != 1 and log2_w < 7 and log2_h < 7):
        from openvvc_tpu.vcl.inter_pu import (CU_IBC, CU_IBC_SKIP,
                                              code_ibc_flag, ibc_pu,
                                              read_skip_flag)

        abv = _nbr_cu_type(ctx, x0, y0 - 1)
        lft = _nbr_cu_type(ctx, x0 - 1, y0)
        skip = read_skip_flag(ctx, io, cu, abv, lft)
        ibc = skip or code_ibc_flag(ctx, io, cu, x0, y0)
        if ibc:
            ibc_pu(ctx, io, cu, x0, y0, log2_w, log2_h, bool(skip))
            _reset_intra_map(ctx, x0, y0, log2_w, log2_h)
            if not skip:
                _inter_tu_tail(ctx, io, cu, x0, y0, log2_w, log2_h,
                               allow_sbt=False)
            _cu_tail_maps(ctx, cu, x0, y0, log2_w, log2_h,
                          CU_IBC_SKIP if skip else CU_IBC)
            return cu

    if tree in (TREE_SINGLE, TREE_DUAL_LUMA):
        coding_unit_intra_luma(ctx, io, cu)
        mode_for_store = cu.intra_mode_l
        ctx.store_cu_luma(cu)
        ux, uy = ctx._lu(x0, y0)
        wu = max(1, (1 << log2_w) >> 2)
        hu = max(1, (1 << log2_h) >> 2)
        ctx.map_cu_type[uy : uy + hu, ux : ux + wu] = CU_MIP if cu.mip_flag else CU_INTRA

        if tree == TREE_SINGLE and ctx.chroma_enabled and ctx.share != 1:
            col_mode = cu.intra_mode_l if not cu.mip_flag else INTRA_PLANAR
            cu.col_luma_mode = col_mode  # chroma LFNST mode source for DM/CCLM
            coding_unit_intra_chroma(ctx, io, cu, col_mode)

    else:  # dual-tree chroma CU (component coords = chroma)
        col_mode = _collocated_luma_mode(ctx, x0, y0, log2_w, log2_h)
        cu.col_luma_mode = col_mode
        coding_unit_intra_chroma(ctx, io, cu, col_mode)

    # transform tree + residuals
    if cu.isp_mode and tree != TREE_DUAL_CHROMA:
        isp_subtree(ctx, io, cu, x0, y0, log2_w, log2_h)
    else:
        info = transform_tree_intra(ctx, io, cu, x0, y0, log2_w, log2_h)
        lfnst_mts_idx(ctx, io, cu, log2_w, log2_h, info)

    # map updates after the CU (reference coding_unit tail)
    if tree == TREE_DUAL_CHROMA:
        ctx.store_cu_chroma(x0, y0, log2_w, log2_h)
    else:
        # single tree also mirrors luma sizes into the chroma maps
        if ctx.share != 1 and tree == TREE_SINGLE and ctx.chroma_enabled:
            ctx.store_cu_chroma(x0 >> 1, y0 >> 1, log2_w, log2_h)

    # update delta-QP maps with the CU's final qp (vcl_coding_unit.c :808-817)
    if tree != TREE_DUAL_CHROMA:
        cu.qp = ctx.qp
        if ctx.cu_qp_delta_enabled:
            min_cb = ctx.part_luma.log2_min_cb_s
            x0l, y0l = x0 & (ctx.ctb_size - 1), y0 & (ctx.ctb_size - 1)
            for i in range((1 << log2_w) >> min_cb):
                ctx.qp_map_x[(x0l >> min_cb) + i] = ctx.qp
            for i in range((1 << log2_h) >> min_cb):
                ctx.qp_map_y[(y0l >> min_cb) + i] = ctx.qp

    ctx.ctu_ir.cus.append(cu)
    return cu



def _nbr_cu_type(ctx, x, y) -> int:
    """cu_mode map probe (part_map.cu_mode_x/y analog, tile-bounded)."""
    if not ctx.in_tile(x, y):
        return CU_NA
    ux, uy = ctx._lu(x, y)
    return int(ctx.map_cu_type[uy, ux])


def _dqp_group_start(ctx, x0, y0):
    """Delta-QP group-start prediction (shared intra/inter CU head)."""
    if ctx.cu_qp_delta_enabled:
        min_cb = ctx.part_luma.log2_min_cb_s
        x0l, y0l = x0 & (ctx.ctb_size - 1), y0 & (ctx.ctb_size - 1)
        msk = (1 << (ctx.log2_ctb + 1 - ctx.cu_qp_delta_subdiv)) - 1
        if not ((x0l & msk) | (y0l & msk)):
            abv = ctx.qp_map_x[(x0l & ~msk) >> min_cb] if y0l else ctx.qp
            lft = ctx.qp_map_y[(y0l & ~msk) >> min_cb] if x0l else ctx.qp
            ctx.qp = (abv + lft + 1) >> 1
            ctx.is_cu_qp_delta_coded = False


def _cu_tail_maps(ctx, cu, x0, y0, log2_w, log2_h, cu_type):
    """updt_cu_maps + qp map updates + IR append (dispatch tail analog)."""
    ux, uy = ctx._lu(x0, y0)
    wu = max(1, (1 << log2_w) >> 2)
    hu = max(1, (1 << log2_h) >> 2)
    ctx.map_cu_type[uy : uy + hu, ux : ux + wu] = cu_type
    cu.qp = ctx.qp
    if ctx.cu_qp_delta_enabled:
        min_cb = ctx.part_luma.log2_min_cb_s
        x0l, y0l = x0 & (ctx.ctb_size - 1), y0 & (ctx.ctb_size - 1)
        for i in range((1 << log2_w) >> min_cb):
            ctx.qp_map_x[(x0l >> min_cb) + i] = ctx.qp
        for i in range((1 << log2_h) >> min_cb):
            ctx.qp_map_y[(y0l >> min_cb) + i] = ctx.qp
    ctx.ctu_ir.cus.append(cu)


def coding_unit_inter_st(ctx, io, node, x0, y0, log2_w, log2_h):
    """coding_unit_inter_st parity (vcl_coding_unit.c :1012), P slices,
    IBC off. Single tree only; SCIPU share regions are rejected upstream."""
    if io.is_reader:
        cu = CU(x0, y0, log2_w, log2_h, tree_type=TREE_SINGLE)
        node.cu = cu
    else:
        cu = node.cu

    _dqp_group_start(ctx, x0, y0)
    cu.qp = ctx.qp

    abv = _nbr_cu_type(ctx, x0, y0 - 1)
    lft = _nbr_cu_type(ctx, x0 - 1, y0)

    skip = read_skip_flag(ctx, io, cu, abv, lft)
    pred_unit = prediction_unit_inter_p if ctx.slice_type == 1 else prediction_unit_inter_b

    if skip:
        cu.merge_flag = 1
        # IBC skip (coding_unit_inter_st :1033-1070; gated off inside any
        # SCIPU region, `!ctu_dec->share`)
        if ctx.ibc_enabled and not ctx.share and log2_w < 7 and log2_h < 7:
            from openvvc_tpu.vcl.inter_pu import (CU_IBC_SKIP, code_ibc_flag,
                                                  ibc_pu)

            ibc = (log2_w == 2 and log2_h == 2) \
                or code_ibc_flag(ctx, io, cu, x0, y0)
            if ibc:
                ibc_pu(ctx, io, cu, x0, y0, log2_w, log2_h, True)
                _reset_intra_map(ctx, x0, y0, log2_w, log2_h)
                _cu_tail_maps(ctx, cu, x0, y0, log2_w, log2_h, CU_IBC_SKIP)
                return cu
        pred_unit(ctx, io, cu, x0, y0, log2_w, log2_h, 1, 1)
        cu_type = CU_INTER_SKIP_AFFINE \
            if (cu.sb_merge_flag or cu.affine_flag) else CU_INTER_SKIP
        cu.prec_amvr_eff = ctx.inter_ctx.prec_amvr
        _reset_intra_map(ctx, x0, y0, log2_w, log2_h)
        _cu_tail_maps(ctx, cu, x0, y0, log2_w, log2_h, cu_type)
        return cu

    if log2_w == 2 and log2_h == 2:
        # 4x4 leaves only arise inside an intra SCIPU region, which the
        # tree routes to the dual-tree intra flow — reaching here means a
        # non-conformant stream
        raise NotImplementedError("4x4 in inter slice implies SCIPU share")

    if ctx.share == 2:
        # inter SCIPU region: pred_mode_flag not signaled, all CUs inter
        # (coding_unit_inter_st :1087-1092, `else if (!ctu_dec->share)`)
        pred_mode_flag = 0
        if not io.is_reader:
            pass  # nothing written
    else:
        pred_mode_flag = read_pred_mode_flag(ctx, io, cu, abv, lft)
    if io.is_reader:
        cu.pred_mode = MODE_INTRA if pred_mode_flag else MODE_INTER

    if pred_mode_flag:
        # intra CU inside a P slice: same single-tree intra flow as I slices
        coding_unit_intra_luma(ctx, io, cu)
        ctx.store_cu_luma(cu)
        ux, uy = ctx._lu(x0, y0)
        wu = max(1, (1 << log2_w) >> 2)
        hu = max(1, (1 << log2_h) >> 2)
        ctx.map_cu_type[uy : uy + hu, ux : ux + wu] = CU_MIP if cu.mip_flag else CU_INTRA
        if ctx.chroma_enabled:
            col_mode = cu.intra_mode_l if not cu.mip_flag else INTRA_PLANAR
            cu.col_luma_mode = col_mode
            coding_unit_intra_chroma(ctx, io, cu, col_mode)
        if cu.isp_mode:
            isp_subtree(ctx, io, cu, x0, y0, log2_w, log2_h)
        else:
            info = transform_tree_intra(ctx, io, cu, x0, y0, log2_w, log2_h)
            lfnst_mts_idx(ctx, io, cu, log2_w, log2_h, info)
        if ctx.chroma_enabled:
            ctx.store_cu_chroma(x0 >> 1, y0 >> 1, log2_w, log2_h)
        cu_type = CU_MIP if cu.mip_flag else CU_INTRA
        _cu_tail_maps(ctx, cu, x0, y0, log2_w, log2_h, cu_type)
        return cu

    # inter, non-skip; IBC checked before merge flag
    # (coding_unit_inter_st :1155-1208)
    if ctx.ibc_enabled and ctx.share != 1 and log2_w < 7 and log2_h < 7:
        from openvvc_tpu.vcl.inter_pu import CU_IBC, code_ibc_flag, ibc_pu

        if code_ibc_flag(ctx, io, cu, x0, y0):
            ibc_pu(ctx, io, cu, x0, y0, log2_w, log2_h, False)
            _reset_intra_map(ctx, x0, y0, log2_w, log2_h)
            _inter_tu_tail(ctx, io, cu, x0, y0, log2_w, log2_h,
                           allow_sbt=False)
            _cu_tail_maps(ctx, cu, x0, y0, log2_w, log2_h, CU_IBC)
            return cu
    if io.is_reader:
        cu.merge_flag = io.raw_bin(CtxOffset.MERGE_FLAG)
    else:
        io.put_bin(cu.merge_flag, CtxOffset.MERGE_FLAG)
    pred_unit(ctx, io, cu, x0, y0, log2_w, log2_h, 0, cu.merge_flag)
    cu.prec_amvr_eff = ctx.inter_ctx.prec_amvr
    cu_type = CU_AFFINE if (cu.sb_merge_flag or cu.affine_flag) else CU_INTER
    _reset_intra_map(ctx, x0, y0, log2_w, log2_h)

    _inter_tu_tail(ctx, io, cu, x0, y0, log2_w, log2_h)

    if ctx.chroma_enabled:
        ctx.store_cu_chroma(x0 >> 1, y0 >> 1, log2_w, log2_h)
    ctx.store_cu_luma(cu)
    _cu_tail_maps(ctx, cu, x0, y0, log2_w, log2_h, cu_type)
    return cu


def _inter_tu_tail(ctx, io, cu, x0, y0, log2_w, log2_h, allow_sbt=True):
    """Root cbf + inter transform tree (vcl_transform_unit.c :1896).
    IBC CUs take this path too, with SBT disallowed (:1901)."""
    if io.is_reader:
        root = 1 if cu.merge_flag else io.raw_bin(CtxOffset.QT_ROOT_CBF)
        cu.root_cbf = root
    else:
        root = 1 if cu.tus else 0
        if cu.merge_flag:
            assert root, "non-skip merge CU requires residual (root cbf inferred 1)"
        else:
            io.put_bin(root, CtxOffset.QT_ROOT_CBF)
        cu.root_cbf = root
    if root:
        part = ctx.part_luma
        split_tu = log2_w > part.log2_max_tb_s or log2_h > part.log2_max_tb_s
        sbt = 0
        if allow_sbt and ctx.sbt_enabled and not split_tu and not cu.ciip_flag:
            sbt_mask = ((log2_h >= 3) | ((log2_w >= 3) << 1)
                        | ((log2_h >= 4) << 2) | ((log2_w >= 4) << 3))
            if sbt_mask:
                off = 1 if log2_w + log2_h <= 8 else 0
                wv = None if io.is_reader else cu.sbt_flag
                sbt = _sym_bin(io, CtxOffset.SBT_FLAG + off, wv)
                if io.is_reader:
                    cu.sbt_flag = sbt
        if sbt:
            _sbt_unit(ctx, io, cu, x0, y0, log2_w, log2_h, sbt_mask)
        else:
            transform_tree_intra(ctx, io, cu, x0, y0, log2_w, log2_h, root_cbf=1)


def _sbt_unit(ctx, io, cu, x0, y0, log2_w, log2_h, sbt_mask):
    """SBT syntax + the single residual TU (vcl_transform_unit.c sbt_mode
    :1790, sbt_half/quad_* :1095-1300). The TU is parsed with the CU
    origin coords (reference behavior) and then placed at the partition."""
    from openvvc_tpu.vcl.transform_unit import transform_unit

    # quad flag
    quad = 0
    if (sbt_mask & 0xC) and (sbt_mask & 0x3):
        wv = None if io.is_reader else cu.sbt_quad
        quad = _sym_bin(io, CtxOffset.SBT_QUAD_FLAG, wv)
    if io.is_reader:
        cu.sbt_quad = quad
    # hor flag
    if (quad and (sbt_mask & 0x4) and (sbt_mask & 0x8)) or (
            not quad and (sbt_mask & 0x1) and (sbt_mask & 0x2)):
        off = 0 if log2_w == log2_h else (1 if log2_w < log2_h else 2)
        wv = None if io.is_reader else cu.sbt_hor
        hor = _sym_bin(io, CtxOffset.SBT_HOR_FLAG + off, wv)
    else:
        hor = 1 if ((quad and (sbt_mask & 0x4)) or (not quad and (sbt_mask & 0x1))) else 0
    if io.is_reader:
        cu.sbt_hor = hor
    wv = None if io.is_reader else cu.sbt_pos
    pos = _sym_bin(io, CtxOffset.SBT_POS_FLAG, wv)
    if io.is_reader:
        cu.sbt_pos = pos

    sh = 2 if quad else 1
    if hor:  # horizontal split: reduced height
        l2w, l2h = log2_w, log2_h - sh
        dx, dy = 0, (0 if not pos else ((1 << log2_h) - (1 << l2h)))
        mts_ok = log2_w <= 5 and l2h <= 5
        mts_idx = (0x2 if not pos else 0x0)
    else:  # vertical split: reduced width
        l2w, l2h = log2_w - sh, log2_h
        dx, dy = (0 if not pos else ((1 << log2_w) - (1 << l2w))), 0
        mts_ok = l2w <= 5 and log2_h <= 5
        mts_idx = (0x1 if not pos else 0x0)

    use_mts = ctx.mts_enabled and mts_ok
    ctx._sbt_active = True
    ctx._sbt_mts = use_mts
    n_before = len(cu.tus)
    transform_unit(ctx, io, cu, x0, y0, l2w, l2h, 0, root_cbf=1)
    ctx._sbt_active = False
    for tu in cu.tus[n_before:]:
        if tu.comp == 0:
            tu.x0 += dx
            tu.y0 += dy
            tu.mts_idx = (mts_idx + 1) if use_mts else 0
        else:
            tu.x0 += dx >> 1
            tu.y0 += dy >> 1
        tu.sbt = 1


def _reset_intra_map(ctx, x0, y0, log2_w, log2_h):
    """reset_intra_map parity: inter area reads as PLANAR for MPM (the
    UNAVAIL map value maps to PLANAR in the MPM derivation)."""
    ux, uy = ctx._lu(x0, y0)
    wu = max(1, (1 << log2_w) >> 2)
    hu = max(1, (1 << log2_h) >> 2)
    ctx.map_intra_mode[uy : uy + hu, ux : ux + wu] = UNAVAIL
    ctx.map_log2_w[uy : uy + hu, ux : ux + wu] = log2_w
    ctx.map_log2_h[uy : uy + hu, ux : ux + wu] = log2_h
    ctx.map_pred_mode[uy : uy + hu, ux : ux + wu] = MODE_INTER


def _parse_sao_alf_ctu(ctx, io, node, ctb_x, ctb_y):
    """Per-CTU SAO/ALF data (order: SAO, ALF, CC-ALF — slicedec.c :726-728)."""
    ctx.writer_node = node
    if ctx.sao_luma or ctx.sao_chroma:
        code_sao_ctu(ctx, io, ctb_x, ctb_y)
    code_alf_ctu(ctx, io, ctb_x, ctb_y)
    code_cc_alf_ctu(ctx, io, ctb_x, ctb_y)


def code_entry(params, entry, io, trees=None):
    """Parse (reader io) or generate (writer io) one rectangular entry.

    trees: for the writer, a dict {(ctb_x, ctb_y): TreeNode} of pre-built CTU
    coding trees. Returns (ctx, trees) where ctx.ctus holds the CTU IR.
    """
    ctx = CTUParseCtx(io, params, entry)
    out_trees = {} if trees is None else trees
    log2_ctb = ctx.log2_ctb

    for ctb_row in range(entry.nb_ctu_h):
        row_backup_qp = None
        if ctx.inter_ctx is not None:
            # HMVP LUT resets at each CTU row start (drv_lines.c
            # load_first_ctu_inter :hmvp_lut.nb_mv = 0)
            ctx.inter_ctx.hmvp.reset()
        if ctx.ibc_ctx is not None:
            # IBC HMVP resets per CTU row too (drv_lines.c :985)
            ctx.ibc_ctx.hmvp = []
        for ctb_col in range(entry.nb_ctu_w):
            ctb_x = entry.ctu_x + ctb_col
            ctb_y = entry.ctu_y + ctb_row
            x0 = ctb_x << log2_ctb
            y0 = ctb_y << log2_ctb
            if x0 >= ctx.pic_w or y0 >= ctx.pic_h:
                continue
            ctx.ctu_ir = CtuIR(ctb_x, ctb_y)
            if io.is_reader:
                node = TreeNode()
                out_trees[(ctb_x, ctb_y)] = node
            else:
                node = out_trees[(ctb_x, ctb_y)]
            _parse_sao_alf_ctu(ctx, io, node, ctb_x, ctb_y)

            if ctx.dual_tree_intra:
                dual_tree_ctu(ctx, io, node, x0, y0, log2_ctb, 0, coding_unit_dispatch)
            else:
                coding_quadtree(ctx, io, node, x0, y0, log2_ctb, 0, coding_unit_dispatch)

            ctx.ctus.append(ctx.ctu_ir)
            if ctb_col == 0:
                # next CTU row starts qp prediction from the first CTU's
                # column-0 qp (slicedec.c :854-965)
                row_backup_qp = ctx.qp_map_x[0]
        if row_backup_qp is not None:
            ctx.qp = row_backup_qp

    # end_of_tile/slice terminate bin
    if io.is_reader:
        term = io.terminate()
        if term != 1:
            raise ValueError("expected terminate bin at end of entry")
    else:
        io.enc.encode_terminate(1)
    return ctx, out_trees


def parse_entry(params, entry):
    import os as _os

    if _os.environ.get("OPENVVC_NATIVE_ENTRY", "1") != "0":
        from openvvc_tpu.native import parse_entry_native

        out = parse_entry_native(params, entry)
        if out is not None:
            return out
    dec = _make_decoder(entry.data, params.slice_type, params.slice_qp)
    io = CabacReaderIO(dec)
    ctx, trees = code_entry(params, entry, io)
    return ctx, trees, dec


def _make_decoder(data, slice_type, slice_qp):
    """Native C CABAC engine when available (same interface), else Python."""
    from openvvc_tpu.native import NativeCabacDecoder, load_cabac_lib

    if load_cabac_lib() is not None:
        return NativeCabacDecoder(data, slice_type, slice_qp)
    return CabacDecoder(data, slice_type, slice_qp)


def write_entry(params, entry, trees) -> bytes:
    enc = CabacEncoder(params.slice_type, params.slice_qp)
    io = CabacWriterIO(enc)
    code_entry(params, entry, io, trees)
    return enc.finish()

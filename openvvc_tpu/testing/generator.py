"""VVC test-stream generator.

Because this build environment has no access to the JVET conformance corpus
(zero egress), we generate our own conformant bitstreams: the HLS writers and
the CABAC syntax writers (the same symmetric codecs the decoder uses) assemble
complete Annex-B streams. The reference decoder binary
(/tmp/refbuild/dectest, built by tools/build_reference_oracle.sh) serves as
the conformance oracle: our decoder and the reference must produce bit-exact
identical YUV for every generated stream.
"""

from __future__ import annotations

import subprocess
from dataclasses import dataclass, field

import numpy as np

from openvvc_tpu.hls.nal import NalType, NalUnit, mux_annexb
from openvvc_tpu.hls.ph import PH, picture_header_syntax
from openvvc_tpu.hls.pps import PPS, pps_syntax
from openvvc_tpu.hls.sh import SH, slice_header_syntax
from openvvc_tpu.hls.sps import SPS, sps_syntax
from openvvc_tpu.hls.syntax import ListField, SyntaxWriter
from openvvc_tpu.utils.bitstream import BitWriter
from openvvc_tpu.vcl.coding_tree import BT_H, BT_V, NO_SPLIT, QT_SPLIT, TT_H, TT_V, TreeNode
from openvvc_tpu.vcl.ctu import CU, TREE_SINGLE


@dataclass
class StreamConfig:
    width: int = 128
    height: int = 128
    ctu_log2: int = 6
    chroma_format: int = 1  # 4:2:0
    bitdepth: int = 8
    qp: int = 32
    # tool switches (all default off for the minimal profile)
    dep_quant: bool = False
    sign_hiding: bool = False
    mts: bool = False
    explicit_mts_intra: bool = False
    lfnst: bool = False
    mip: bool = False
    mrl: bool = False
    isp: bool = False
    cclm: bool = False
    cclm_collocated: bool = False
    dual_tree: bool = False
    joint_cbcr: bool = False
    transform_skip: bool = False
    bdpcm: bool = False
    sao: bool = False
    alf: bool = False
    alf_chroma: bool = False
    cc_alf: bool = False
    alf_seed: int = 123
    alf_num_alts: int = 2
    lmcs: bool = False
    lmcs_params: object = None  # dict of lmcs_* syntax values (None -> default curve)
    lmcs_chroma_scaling: bool = False
    deblocking: bool = True  # on unless disabled in PPS
    amvr: bool = False
    tmvp: bool = False
    mmvd: bool = False
    ciip: bool = False
    bcw: bool = False
    smvd: bool = False
    gpm: bool = False
    sbt: bool = False
    affine: bool = False
    affine_6param: bool = False
    affine_amvr: bool = False
    prof: bool = False
    sbtmvp: bool = False
    ibc: bool = False
    # film grain SEI: {"log2_scale": int, "comps": {c: {"intervals":
    # [(lower, upper, [std_dev, cutoff_h, cutoff_v]), ...]}}}
    film_grain: dict = None
    # SPS-signaled RPLs: ([rpl0 entry-lists], [rpl1 entry-lists]); entries as
    # in _mk_rpl. Needed for long-term refs: the reference resolves LT POCs
    # only from RPL-struct fields (compute_ref_poc :469 reads
    # rpls_poc_lsb_lt, which is parsed only when ltrp_in_header_flag == 0,
    # i.e. for SPS lists — header LT info is left unused there).
    sps_rpls: tuple = None
    long_term: bool = False
    bdof: bool = False
    dmvr: bool = False
    delta_qp: bool = False
    delta_qp_subdiv: int = 0
    max_tb_64: bool = True
    min_qt_log2: int = 3
    max_mtt_depth: int = 2
    max_bt_log2: int = 6
    max_tt_log2: int = 6
    min_cb_log2: int = 2
    # tiles
    filter_across_tiles: bool = False
    tile_cols: list = None  # explicit CTU widths or None for single tile
    tile_rows: list = None
    # RPR: extra PPS sizes [(w, h), ...] -> pps ids 1..N (id 0 = cfg size);
    # frames select via spec["pps_id"]. scaling_windows: per-pps-id
    # (l, r, t, b) explicit scaling windows (chroma-sample units).
    rpr_sizes: list = None
    scaling_windows: list = None


def build_sps(cfg: StreamConfig) -> SPS:
    sps = SPS()
    sps.sps_seq_parameter_set_id = 0
    sps.sps_chroma_format_idc = cfg.chroma_format
    sps.sps_log2_ctu_size_minus5 = cfg.ctu_log2 - 5
    sps.sps_pic_width_max_in_luma_samples = cfg.width
    sps.sps_pic_height_max_in_luma_samples = cfg.height
    sps.sps_bitdepth_minus8 = cfg.bitdepth - 8
    if cfg.rpr_sizes:
        sps.sps_ref_pic_resampling_enabled_flag = 1
        sps.sps_res_change_in_clvs_allowed_flag = 1
    sps.sps_entry_point_offsets_present_flag = 1
    sps.sps_log2_max_pic_order_cnt_lsb_minus4 = 4
    sps.sps_log2_min_luma_coding_block_size_minus2 = cfg.min_cb_log2 - 2
    sps.sps_log2_diff_min_qt_min_cb_intra_slice_luma = cfg.min_qt_log2 - cfg.min_cb_log2
    sps.sps_max_mtt_hierarchy_depth_intra_slice_luma = cfg.max_mtt_depth
    if cfg.max_mtt_depth:
        sps.sps_log2_diff_max_bt_min_qt_intra_slice_luma = max(0, cfg.max_bt_log2 - cfg.min_qt_log2)
        sps.sps_log2_diff_max_tt_min_qt_intra_slice_luma = max(0, min(cfg.max_tt_log2, 6) - cfg.min_qt_log2)
    sps.sps_log2_diff_min_qt_min_cb_inter_slice = cfg.min_qt_log2 - cfg.min_cb_log2
    sps.sps_max_mtt_hierarchy_depth_inter_slice = cfg.max_mtt_depth
    if cfg.max_mtt_depth:
        sps.sps_log2_diff_max_bt_min_qt_inter_slice = max(0, cfg.max_bt_log2 - cfg.min_qt_log2)
        sps.sps_log2_diff_max_tt_min_qt_inter_slice = max(0, min(cfg.max_tt_log2, 6) - cfg.min_qt_log2)
    sps.sps_amvr_enabled_flag = 1 if cfg.amvr else 0
    sps.sps_temporal_mvp_enabled_flag = 1 if (cfg.tmvp or cfg.sbtmvp) else 0
    if cfg.sbtmvp:
        sps.sps_sbtmvp_enabled_flag = 1
    if cfg.ibc:
        sps.sps_ibc_enabled_flag = 1
        sps.sps_six_minus_max_num_ibc_merge_cand = 0
    if cfg.long_term:
        sps.sps_long_term_ref_pics_flag = 1
    if cfg.sps_rpls is not None:
        l0, l1 = cfg.sps_rpls
        sps.sps_num_ref_pic_lists0 = len(l0)
        sps.rpl_s0 = [_mk_rpl(e) for e in l0]
        sps.sps_rpl1_same_as_rpl0_flag = 0
        sps.sps_num_ref_pic_lists1 = len(l1)
        sps.rpl_s1 = [_mk_rpl(e) for e in l1]
    sps.sps_affine_enabled_flag = 1 if cfg.affine else 0
    if cfg.affine:
        sps.sps_five_minus_max_num_subblock_merge_cand = 0
        sps.sps_6param_affine_enabled_flag = 1 if cfg.affine_6param else 0
        if cfg.amvr:
            sps.sps_affine_amvr_enabled_flag = 1 if cfg.affine_amvr else 0
        sps.sps_affine_prof_enabled_flag = 1 if cfg.prof else 0
    sps.sps_mmvd_enabled_flag = 1 if cfg.mmvd else 0
    sps.sps_ciip_enabled_flag = 1 if cfg.ciip else 0
    sps.sps_bcw_enabled_flag = 1 if cfg.bcw else 0
    sps.sps_smvd_enabled_flag = 1 if cfg.smvd else 0
    sps.sps_gpm_enabled_flag = 1 if cfg.gpm else 0
    sps.sps_sbt_enabled_flag = 1 if cfg.sbt else 0
    sps.sps_bdof_enabled_flag = 1 if cfg.bdof else 0
    sps.sps_dmvr_enabled_flag = 1 if cfg.dmvr else 0
    if cfg.gpm:
        sps.sps_max_num_merge_cand_minus_max_num_gpm_cand = 0
    if cfg.ctu_log2 > 5:
        sps.sps_max_luma_transform_size_64_flag = 1 if cfg.max_tb_64 else 0
    if cfg.dual_tree:
        sps.sps_qtbtt_dual_tree_intra_flag = 1
        sps.sps_log2_diff_min_qt_min_cb_intra_slice_chroma = max(0, cfg.min_qt_log2 - 1 - (cfg.min_cb_log2 - 1))
        sps.sps_max_mtt_hierarchy_depth_intra_slice_chroma = 0
    if cfg.chroma_format:
        sps.sps_same_qp_table_for_chroma_flag = 1
        sps.sps_joint_cbcr_enabled_flag = 1 if cfg.joint_cbcr else 0
        sps.sps_qp_table_start_minus26 = ListField({0: 0})
        sps.sps_num_points_in_qp_table_minus1 = ListField({0: 0})
        sps._list_nested("sps_delta_qp_in_val_minus1", 0)[0] = 26
        sps._list_nested("sps_delta_qp_diff_val", 0)[0] = 1  # identity table
        sps.sps_cclm_enabled_flag = 1 if cfg.cclm else 0
        sps.sps_chroma_horizontal_collocated_flag = 1
        sps.sps_chroma_vertical_collocated_flag = 1 if cfg.cclm_collocated else 0
    sps.sps_sao_enabled_flag = 1 if cfg.sao else 0
    sps.sps_alf_enabled_flag = 1 if cfg.alf else 0
    if cfg.alf and cfg.chroma_format:
        sps.sps_ccalf_enabled_flag = 1 if cfg.cc_alf else 0
    sps.sps_lmcs_enabled_flag = 1 if cfg.lmcs else 0
    sps.sps_transform_skip_enabled_flag = 1 if cfg.transform_skip else 0
    if cfg.transform_skip:
        sps.sps_log2_transform_skip_max_size_minus2 = 2
        sps.sps_bdpcm_enabled_flag = 1 if cfg.bdpcm else 0
    sps.sps_mts_enabled_flag = 1 if cfg.mts else 0
    if cfg.mts:
        sps.sps_explicit_mts_intra_enabled_flag = 1 if cfg.explicit_mts_intra else 0
    sps.sps_lfnst_enabled_flag = 1 if cfg.lfnst else 0
    sps.sps_mip_enabled_flag = 1 if cfg.mip else 0
    sps.sps_mrl_enabled_flag = 1 if cfg.mrl else 0
    sps.sps_isp_enabled_flag = 1 if cfg.isp else 0
    sps.sps_dep_quant_enabled_flag = 1 if cfg.dep_quant else 0
    sps.sps_sign_data_hiding_enabled_flag = 1 if cfg.sign_hiding else 0
    sps.sps_six_minus_max_num_merge_cand = 1  # 5 merge cands
    return sps


def build_pps(cfg: StreamConfig, sps: SPS, pps_id: int = 0,
              size=None, swin=None) -> PPS:
    pps = PPS()
    pps.pps_pic_parameter_set_id = pps_id
    pps.pps_seq_parameter_set_id = 0
    pps.pps_pic_width_in_luma_samples = size[0] if size else cfg.width
    pps.pps_pic_height_in_luma_samples = size[1] if size else cfg.height
    if swin is not None:
        pps.pps_scaling_window_explicit_signalling_flag = 1
        (pps.pps_scaling_win_left_offset, pps.pps_scaling_win_right_offset,
         pps.pps_scaling_win_top_offset,
         pps.pps_scaling_win_bottom_offset) = swin
    pps.pps_cu_qp_delta_enabled_flag = 1 if cfg.delta_qp else 0
    if cfg.tile_cols or cfg.tile_rows:
        pps.pps_no_pic_partition_flag = 0
        pps.pps_log2_ctu_size_minus5 = cfg.ctu_log2 - 5
        pw = pps.pps_pic_width_in_luma_samples
        ph_ = pps.pps_pic_height_in_luma_samples
        cols = cfg.tile_cols or [(pw + (1 << cfg.ctu_log2) - 1) >> cfg.ctu_log2]
        rows = cfg.tile_rows or [(ph_ + (1 << cfg.ctu_log2) - 1) >> cfg.ctu_log2]
        pps.pps_num_exp_tile_columns_minus1 = len(cols) - 1
        pps.pps_num_exp_tile_rows_minus1 = len(rows) - 1
        pps.pps_tile_column_width_minus1 = ListField({i: w - 1 for i, w in enumerate(cols)})
        pps.pps_tile_row_height_minus1 = ListField({i: h - 1 for i, h in enumerate(rows)})
        if len(cols) * len(rows) > 1:
            pps.pps_loop_filter_across_tiles_enabled_flag = \
                1 if cfg.filter_across_tiles else 0
            pps.pps_rect_slice_flag = 1
        pps.pps_single_slice_per_subpic_flag = 1
    else:
        pps.pps_no_pic_partition_flag = 1
        pps.pps_log2_ctu_size_minus5 = cfg.ctu_log2 - 5
    if not cfg.deblocking:
        pps.pps_deblocking_filter_control_present_flag = 1
        pps.pps_deblocking_filter_disabled_flag = 1
    if cfg.chroma_format:
        pps.pps_chroma_tool_offsets_present_flag = 1
        if cfg.joint_cbcr:
            pps.pps_joint_cbcr_qp_offset_present_flag = 1
    return pps


def build_ph(cfg: StreamConfig, poc: int = 0, inter: bool = False) -> PH:
    ph = PH()
    ph.ph_gdr_or_irap_pic_flag = 0 if inter else 1
    ph.ph_inter_slice_allowed_flag = 1 if inter else 0
    ph.ph_intra_slice_allowed_flag = 1
    ph.ph_pic_order_cnt_lsb = poc & 0xFF
    ph.ph_pic_output_flag = 1
    if inter and cfg.tmvp:
        ph.ph_temporal_mvp_enabled_flag = 1
    if cfg.lmcs:
        ph.ph_lmcs_enabled_flag = 1
        ph.ph_lmcs_aps_id = 0
        if cfg.lmcs_chroma_scaling and cfg.chroma_format:
            ph.ph_chroma_residual_scale_flag = 1
    if cfg.delta_qp:
        ph.ph_cu_qp_delta_subdiv_intra_slice = cfg.delta_qp_subdiv
        if inter:
            ph.ph_cu_qp_delta_subdiv_inter_slice = cfg.delta_qp_subdiv
    return ph


def _mk_rpl(ref_deltas):
    """Entries: int POC delta (positive = past) or ("lt", poc) long-term."""
    from openvvc_tpu.hls.rpl import RPL

    rpl = RPL()
    rpl.num_ref_entries = len(ref_deltas)
    rpl.abs_delta_poc_st = ListField()
    rpl.strp_entry_sign_flag = ListField()
    rpl.st_ref_pic_flag = ListField()
    rpl.rpls_poc_lsb_lt = ListField()
    rpl.ltrp_in_header_flag = 0
    prev = 0
    for i, d in enumerate(ref_deltas):
        if isinstance(d, tuple) and d[0] == "lt":
            # long-term entry: direct POC (reference compute_ref_poc :469
            # uses rpls_poc_lsb_lt and re-bases the chain)
            rpl.st_ref_pic_flag[i] = 0
            rpl.rpls_poc_lsb_lt[i] = d[1]
            prev = None  # chain re-bases at cur - (cur - lt_poc) implicitly
            continue
        # chained (dpb.c :459-481): step from the previous resolved POC;
        # sign 1 = toward the past
        if prev is None:
            raise ValueError("ST entry after LT entry not supported by the generator")
        rpl.st_ref_pic_flag[i] = 1
        step = d - prev
        prev = d
        rpl.abs_delta_poc_st[i] = abs(step) - 1
        rpl.strp_entry_sign_flag[i] = 1 if step > 0 else 0
    return rpl


def build_sh(cfg: StreamConfig, sps, pps, slice_type: int = 2,
             ref_deltas=None, ref_deltas1=None, sps_rpl_idx=None) -> SH:
    """ref_deltas: POC deltas per list (positive = past reference);
    sps_rpl_idx: (i0, i1) selects SPS-signaled RPLs instead."""
    sh = SH()
    sh.sh_picture_header_in_slice_header_flag = 0
    sh.sh_qp_delta = cfg.qp - 26
    sh.sh_slice_type = slice_type
    sh.sh_num_ref_idx_active_override_flag = 1
    if sps_rpl_idx is not None:
        i0, i1 = sps_rpl_idx
        ref_deltas = [0] * cfg.sps_rpls[0][i0].__len__()
        ref_deltas1 = [0] * cfg.sps_rpls[1][i1].__len__() if cfg.sps_rpls[1] else None
    if slice_type != 2 and ref_deltas:
        from openvvc_tpu.hls.syntax import ListField as _LF2
        sh.sh_num_ref_idx_active_minus1 = _LF2(
            {0: len(ref_deltas) - 1, 1: len(ref_deltas1 or []) - 1 if ref_deltas1 else 0})
    if sps_rpl_idx is not None:
        i0, i1 = sps_rpl_idx
        sh.hrpl0.rpl_sps_flag = 1
        sh.hrpl0.rpl_idx = i0
        sh.hrpl1.rpl_sps_flag = 1
        sh.hrpl1.rpl_idx = i1
    else:
        # non-IDR NALs carry ref_pic_lists() even for I slices (empty lists)
        sh.hrpl0.rpl = _mk_rpl(ref_deltas or [])
        sh.hrpl1.rpl = _mk_rpl(ref_deltas1 or [])
    if slice_type != 2 and cfg.tmvp:
        sh.sh_collocated_from_l0_flag = 1
        sh.sh_collocated_ref_idx = 0
    if cfg.alf:
        sh.sh_alf_enabled_flag = 1
        sh.sh_num_alf_aps_ids_luma = 1
        from openvvc_tpu.hls.syntax import ListField as _LF
        sh.sh_alf_aps_id_luma = _LF({0: 1})
        if cfg.alf_chroma and cfg.chroma_format:
            sh.sh_alf_cb_enabled_flag = 1
            sh.sh_alf_cr_enabled_flag = 1
            sh.sh_alf_aps_id_chroma = 1
        if cfg.cc_alf and cfg.chroma_format:
            sh.sh_alf_cc_cb_enabled_flag = 1
            sh.sh_alf_cc_cb_aps_id = 1
            sh.sh_alf_cc_cr_enabled_flag = 1
            sh.sh_alf_cc_cr_aps_id = 1
    if cfg.sao:
        sh.sh_sao_luma_used_flag = 1
        sh.sh_sao_chroma_used_flag = 1 if cfg.chroma_format else 0
    if cfg.dep_quant:
        sh.sh_dep_quant_used_flag = 1
    elif cfg.sign_hiding:
        sh.sh_sign_data_hiding_used_flag = 1
    return sh


def _write_ps_nal(syntax_fn, obj, nal_type, *args) -> NalUnit:
    w = SyntaxWriter(BitWriter())
    syntax_fn(w, obj, *args)
    w.bw.rbsp_trailing_bits()
    return NalUnit(nal_type, w.bw.get_bytes())


def uniform_tree(params, entry, cu_factory) -> dict:
    """Build one TreeNode per CTU with no splits; cu_factory(x0, y0, log2) -> CU."""
    trees = {}
    log2_ctb = params.sps.ctb_log2
    for row in range(entry.nb_ctu_h):
        for col in range(entry.nb_ctu_w):
            cx, cy = entry.ctu_x + col, entry.ctu_y + row
            node = TreeNode()
            node.cu = cu_factory(cx << log2_ctb, cy << log2_ctb, log2_ctb)
            trees[(cx, cy)] = node
    return trees


def rect_tree_builder(lw: int, lh: int, make_cu, rng, chroma_leaf=None):
    """Tree builder carving every CTU into lw x lh luma CUs (QT then BT).

    make_cu(x, y, dual) -> TreeNode leaf for a luma CU at (x, y); `dual` is
    True under a SCIPU local dual tree (the CU must then be luma-only with
    tree_type TREE_DUAL_LUMA). Splits creating chroma blocks under 16 samples
    get a SCIPU chroma tree attached automatically: chroma_leaf(x, y, l2w, l2h)
    -> TreeNode with a chroma CU covering the region (luma coords), defaulting
    to a random DC/planar chroma CU with sparse residual.
    """
    from openvvc_tpu.vcl.ctu import TREE_DUAL_CHROMA, TU

    def default_chroma_leaf(x, y, l2w, l2h):
        ccu = CU(x >> 1, y >> 1, l2w - 1, l2h - 1, tree_type=TREE_DUAL_CHROMA,
                 intra_mode_c=int(rng.randint(0, 2)))
        shape = (1 << (l2h - 1), 1 << (l2w - 1))
        clv = (rng.randint(-8, 9, shape) * (rng.rand(*shape) < 0.5)).astype(np.int32)
        if clv.any():
            last = _find_last_pos_diag(clv, l2w - 1, l2h - 1)
            ccu.tus.append(TU(x >> 1, y >> 1, l2w - 1, l2h - 1, 1, cbf=1,
                              levels=clv, last_pos=last))
        return TreeNode(NO_SPLIT, cu=ccu)

    chroma_leaf = chroma_leaf or default_chroma_leaf

    def descend(x, y, l2w, l2h, dual=False):
        if (l2w, l2h) == (lw, lh):
            return make_cu(x, y, dual)
        if l2h > lh and (l2h >= l2w or l2w == lw):
            kind, cl2w, cl2h = BT_H, l2w, l2h - 1
            offs = ((x, y), (x, y + (1 << cl2h)))
        else:
            kind, cl2w, cl2h = BT_V, l2w - 1, l2h
            offs = ((x, y), (x + (1 << cl2w), y))
        # SCIPU (_separate_trees): child chroma area < 16, or a BT_V on a
        # width-8 node (creates 2-wide chroma)
        narrow = kind == BT_V and l2w == 3
        scipu = not dual and ((1 << (cl2w + cl2h)) >> 2 < 16 or narrow)
        node = TreeNode(kind, children=[
            descend(cx, cy, cl2w, cl2h, dual or scipu) for cx, cy in offs])
        if scipu:
            node.chroma_tree = chroma_leaf(x, y, l2w, l2h)
            node.mode_constraint = 1
        return node

    def qt(x, y, l2):
        if l2 > max(lw, lh, 4):
            h = 1 << (l2 - 1)
            return TreeNode(QT_SPLIT, children=[
                qt(x, y, l2 - 1), qt(x + h, y, l2 - 1),
                qt(x, y + h, l2 - 1), qt(x + h, y + h, l2 - 1)])
        return descend(x, y, l2, l2)

    def tb(params, entry):
        trees = {}
        clg = params.sps.ctb_log2
        for row in range(entry.nb_ctu_h):
            for col in range(entry.nb_ctu_w):
                cx, cy = entry.ctu_x + col, entry.ctu_y + row
                trees[(cx, cy)] = qt(cx << clg, cy << clg, clg)
        return trees

    return tb


def _find_last_pos_diag(levels, log2_w, log2_h):
    """Last significant coefficient position in 4x4-subblock diagonal scan order."""
    from openvvc_tpu.vcl.residual import diag_scan, sb_dims

    lim_w = min(1 << log2_w, 32)
    lim_h = min(1 << log2_h, 32)
    lsw, lsh = sb_dims(min(log2_w, 5), min(log2_h, 5))
    sb_scan = diag_scan(lim_w >> lsw, lim_h >> lsh)
    in_scan = diag_scan(1 << lsw, 1 << lsh)
    last = None
    for sx, sy in sb_scan:
        for cx, cy in in_scan:
            x, y = (sx << lsw) + cx, (sy << lsh) + cy
            if levels[y, x]:
                last = (x, y)
    assert last is not None
    return last


def _build_alf_aps_nal(cfg: StreamConfig) -> NalUnit:
    """One APS (id 1) carrying luma + chroma + CC-ALF filter data derived
    from cfg.alf_seed."""
    from openvvc_tpu.hls.aps import APS, APS_ALF, aps_syntax
    from openvvc_tpu.hls.syntax import ListField as _LF
    from openvvc_tpu.hls.syntax import SyntaxStruct

    rng = np.random.RandomState(cfg.alf_seed)
    aps = APS()
    aps.aps_params_type = APS_ALF
    aps.aps_adaptation_parameter_set_id = 1
    aps.aps_chroma_present_flag = 1 if cfg.chroma_format else 0
    alf = SyntaxStruct()
    alf.alf_luma_filter_signal_flag = 1
    alf.alf_luma_clip_flag = int(rng.randint(0, 2))
    n_filters = int(rng.randint(2, 6))
    alf.alf_luma_num_filters_signalled_minus1 = n_filters - 1
    alf.alf_luma_coeff_delta_idx = _LF({k: int(rng.randint(0, n_filters)) for k in range(25)})
    alf.alf_luma_coeff = _LF()
    alf.alf_luma_clip_idx = _LF()
    for f in range(n_filters):
        co = alf.alf_luma_coeff.nested(f)
        cl = alf.alf_luma_clip_idx.nested(f)
        for j in range(12):
            co[j] = int(rng.randint(-12, 13))
            cl[j] = int(rng.randint(0, 4))
    if cfg.alf_chroma and cfg.chroma_format:
        alf.alf_chroma_filter_signal_flag = 1
        alf.alf_chroma_clip_flag = int(rng.randint(0, 2))
        alf.alf_chroma_num_alt_filters_minus1 = cfg.alf_num_alts - 1
        alf.alf_chroma_coeff = _LF()
        alf.alf_chroma_clip_idx = _LF()
        for a in range(cfg.alf_num_alts):
            co = alf.alf_chroma_coeff.nested(a)
            cl = alf.alf_chroma_clip_idx.nested(a)
            for j in range(6):
                co[j] = int(rng.randint(-10, 11))
                cl[j] = int(rng.randint(0, 4))
    if cfg.cc_alf and cfg.chroma_format:
        for flag, cnt, name in (("alf_cc_cb_filter_signal_flag", "alf_cc_cb_filters_signalled_minus1", "alf_cc_cb_coeff"),
                                ("alf_cc_cr_filter_signal_flag", "alf_cc_cr_filters_signalled_minus1", "alf_cc_cr_coeff")):
            setattr(alf, flag, 1)
            nf = int(rng.randint(1, 4))
            setattr(alf, cnt, nf - 1)
            lf = _LF()
            setattr(alf, name, lf)
            for k in range(nf):
                co = lf.nested(k)
                for j in range(7):
                    mag = int(rng.randint(0, 5))  # 0 or 2^(0..3)
                    v = 0 if mag == 0 else (1 << (mag - 1)) * (1 if rng.rand() < 0.5 else -1)
                    co[j] = v
    aps.alf_data = alf
    return _write_ps_nal(aps_syntax, aps, NalType.PREFIX_APS)


def _build_lmcs_aps_nal(cfg: StreamConfig) -> NalUnit:
    from openvvc_tpu.hls.aps import APS, APS_LMCS, aps_syntax
    from openvvc_tpu.hls.syntax import SyntaxStruct

    aps = APS()
    aps.aps_params_type = APS_LMCS
    aps.aps_adaptation_parameter_set_id = 0
    aps.aps_chroma_present_flag = 1 if cfg.chroma_format else 0
    lmcs = SyntaxStruct()
    p = cfg.lmcs_params or {}
    lmcs.lmcs_min_bin_idx = p.get("min_bin_idx", 1)
    lmcs.lmcs_delta_max_bin_idx = p.get("delta_max_bin_idx", 1)
    deltas = p.get("cw_deltas", {})
    prec = max([1] + [abs(v).bit_length() for v in deltas.values()])
    lmcs.lmcs_delta_cw_prec_minus1 = prec - 1
    from openvvc_tpu.hls.syntax import ListField as _LF
    lmcs.lmcs_delta_abs_cw = _LF()
    lmcs.lmcs_delta_sign_cw_flag = _LF()
    for i in range(lmcs.lmcs_min_bin_idx, 16 - lmcs.lmcs_delta_max_bin_idx):
        v = deltas.get(i, 0)
        lmcs.lmcs_delta_abs_cw[i] = abs(v)
        if v < 0:
            lmcs.lmcs_delta_sign_cw_flag[i] = 1
    if aps.aps_chroma_present_flag:
        crs = p.get("crs", 0)
        lmcs.lmcs_delta_abs_crs = abs(crs)
        if crs:
            lmcs.lmcs_delta_sign_crs_flag = 1 if crs < 0 else 0
    aps.lmcs_data = lmcs
    return _write_ps_nal(aps_syntax, aps, NalType.PREFIX_APS)


def build_slice_nals(ctx, cfg, sps_r, pps_r, ph, sh, nal_type, tree_builder):
    """PH + slice NALs for one frame (entry fixpoint as in build_stream)."""
    from openvvc_tpu.vcl.slice_data import write_entry

    ph_nal = _write_ps_nal(picture_header_syntax, ph, NalType.PH, sps_r, pps_r)
    ctx.decode_nalu(ph_nal)

    probe_w = SyntaxWriter(BitWriter())
    slice_header_syntax(probe_w, sh, nal_type, sps_r, pps_r, ctx.ph)
    probe_w.bw.u(0x80, 8)
    probe_nal = NalUnit(nal_type, probe_w.bw.get_bytes())
    params = ctx.parse_slice(probe_nal)

    payloads = []
    for entry in params.entries:
        trees = tree_builder(params, entry)
        payloads.append(write_entry(params, entry, trees))

    def sh_bytes_for(sizes):
        w = SyntaxWriter(BitWriter())
        if sizes:
            sh.sh_entry_point_offset_minus1 = ListField({i: v - 1 for i, v in enumerate(sizes)})
            sh.sh_entry_offset_len_minus1 = max(0, (max(v - 1 for v in sizes)).bit_length() - 1)
        slice_header_syntax(w, sh, nal_type, sps_r, pps_r, ctx.ph)
        return w.bw.get_bytes()

    if len(payloads) > 1:
        sizes = [len(pl) for pl in payloads[:-1]]
        for _ in range(4):
            sh_bytes = sh_bytes_for(sizes)
            new_sizes = _ebsp_entry_sizes(sh_bytes, payloads)[:-1]
            if new_sizes == sizes:
                break
            sizes = new_sizes
        sh_bytes = sh_bytes_for(sizes)
    else:
        sh_bytes = sh_bytes_for(None)

    return [ph_nal, NalUnit(nal_type, sh_bytes + b"".join(payloads))]


def _build_fg_sei_nal(fgcfg: dict) -> NalUnit:
    """PREFIX_SEI NALU carrying a film-grain-characteristics message
    (syntax: nvcl_nal_sei.c:154, framing: nvcl_sei_payload :131)."""
    from openvvc_tpu.hls.sei import (SEI_FILM_GRAIN, FilmGrainSEI,
                                     film_grain_syntax, write_sei_message)
    from openvvc_tpu.hls.syntax import SyntaxWriter
    from openvvc_tpu.utils.bitstream import BitWriter

    fg = FilmGrainSEI()
    fg.fg_characteristics_cancel_flag = 0
    fg.fg_model_id = 0
    fg.fg_separate_colour_description_present_flag = 0
    fg.fg_blending_mode_id = 0
    fg.fg_log2_scale_factor = fgcfg.get("log2_scale", 5)
    comps = fgcfg["comps"]
    fg.fg_comp_model_present_flag = [1 if c in comps else 0 for c in range(3)]
    fg.fg_num_intensity_intervals_minus1 = [0, 0, 0]
    fg.fg_num_model_values_minus1 = [0, 0, 0]
    fg.fg_characteristics_persistence_flag = 1
    for c, ccfg in comps.items():
        ivals = ccfg["intervals"]
        fg.fg_num_intensity_intervals_minus1[c] = len(ivals) - 1
        fg.fg_num_model_values_minus1[c] = len(ivals[0][2]) - 1
        lowers = fg._list_nested("fg_intensity_interval_lower_bound", c)
        uppers = fg._list_nested("fg_intensity_interval_upper_bound", c)
        values = fg._list_nested("fg_comp_model_value", c)
        for i, (lo, up, vals) in enumerate(ivals):
            lowers[i] = lo
            uppers[i] = up
            vi = values.nested(i)
            for j, v in enumerate(vals):
                vi[j] = v
    pw = SyntaxWriter(BitWriter())
    film_grain_syntax(pw, fg)
    if not pw.bw.byte_aligned():
        pw.bw.u(1, 1)
        pw.bw.align_zero()
    outer = BitWriter()
    write_sei_message(outer, SEI_FILM_GRAIN, pw.bw.get_bytes())
    outer.u(1, 1)
    outer.align_zero()
    return NalUnit(NalType.PREFIX_SEI, outer.get_bytes())


def build_stream_frames(cfg: StreamConfig, frames) -> bytes:
    """Multi-frame Annex-B stream.

    frames: list of dicts with keys: tree_builder, poc (default index),
    slice_type (default 2), ref_deltas (P slices: list-0 POC deltas).
    Frame 0 is an IDR; later frames are TRAIL.
    """
    from openvvc_tpu.hls.params import NvclContext

    sps = build_sps(cfg)
    sizes = [None] + list(cfg.rpr_sizes or [])
    swins = cfg.scaling_windows or [None] * len(sizes)
    pps_list = [build_pps(cfg, sps, i, size, swins[i] if i < len(swins) else None)
                for i, size in enumerate(sizes)]
    sps_nal = _write_ps_nal(sps_syntax, sps, NalType.SPS)
    pps_nals = [_write_ps_nal(pps_syntax, p, NalType.PPS) for p in pps_list]
    aps_nals = []
    if cfg.lmcs:
        aps_nals.append(_build_lmcs_aps_nal(cfg))
    if cfg.alf:
        aps_nals.append(_build_alf_aps_nal(cfg))
    if cfg.film_grain is not None:
        aps_nals.append(_build_fg_sei_nal(cfg.film_grain))

    ctx = NvclContext()
    ctx.decode_nalu(sps_nal)
    for pn in pps_nals:
        ctx.decode_nalu(pn)
    for nal in aps_nals:
        ctx.decode_nalu(nal)
    sps_r = ctx.sps_list[0]

    nals = [sps_nal] + pps_nals + aps_nals
    for i, spec in enumerate(frames):
        poc = spec.get("poc", i)
        slice_type = spec.get("slice_type", 2)
        pps_id = spec.get("pps_id", 0)
        pps, pps_r = pps_list[pps_id], ctx.pps_list[pps_id]
        if spec.get("idr"):
            nal_type = NalType.IDR_N_LP
        elif spec.get("cra"):
            nal_type = NalType.CRA
        else:
            nal_type = NalType.IDR_N_LP if i == 0 else NalType.TRAIL
        ph = build_ph(cfg, poc=poc, inter=slice_type != 2)
        sh = build_sh(cfg, sps, pps, slice_type, spec.get("ref_deltas"),
                      spec.get("ref_deltas1"), spec.get("sps_rpl_idx"))
        sh.sh_pic_parameter_set_id = pps_id
        nals += build_slice_nals(ctx, cfg, sps_r, pps_r, ph, sh, nal_type,
                                 spec["tree_builder"])
    return mux_annexb(nals)


def build_stream(cfg: StreamConfig, tree_builder, nal_type=NalType.IDR_N_LP) -> bytes:
    """Assemble a complete one-frame Annex-B stream.

    tree_builder(params, entry) -> {(ctb_x, ctb_y): TreeNode} supplies the
    pre-built coding trees per entry.
    """
    from openvvc_tpu.hls.params import NvclContext
    from openvvc_tpu.vcl.slice_data import write_entry

    sps = build_sps(cfg)
    pps = build_pps(cfg, sps)
    ph = build_ph(cfg)
    sh = build_sh(cfg, sps, pps)

    sps_nal = _write_ps_nal(sps_syntax, sps, NalType.SPS)
    pps_nal = _write_ps_nal(pps_syntax, pps, NalType.PPS)
    aps_nals = []
    if cfg.lmcs:
        aps_nals.append(_build_lmcs_aps_nal(cfg))
    if cfg.alf:
        aps_nals.append(_build_alf_aps_nal(cfg))
    if cfg.film_grain is not None:
        aps_nals.append(_build_fg_sei_nal(cfg.film_grain))
    ph_nal = _write_ps_nal(picture_header_syntax, ph, NalType.PH, sps, pps)

    # activation pass to derive tiles/entries (with a placeholder payload)
    ctx = NvclContext()
    ctx.decode_nalu(sps_nal)
    ctx.decode_nalu(pps_nal)
    for nal in aps_nals:
        ctx.decode_nalu(nal)
    ctx.decode_nalu(ph_nal)
    sps_r = ctx.sps_list[0]
    pps_r = ctx.pps_list[0]

    # derive entries via a dry activation (empty payload)
    probe_w = SyntaxWriter(BitWriter())
    slice_header_syntax(probe_w, sh, nal_type, sps_r, pps_r, ctx.ph)
    probe_w.bw.u(0x80, 8)
    probe_nal = NalUnit(nal_type, probe_w.bw.get_bytes())
    params = ctx.parse_slice(probe_nal)

    # generate each entry payload
    payloads = []
    for entry in params.entries:
        trees = tree_builder(params, entry)
        payloads.append(write_entry(params, entry, trees))

    # Entry-point offsets are in EBSP bytes (they count emulation prevention
    # bytes, spec 7.4.8.1; the decoder discounts them — dec_init.c:322
    # equivalent in hls/params.py). EPB insertion depends on the preceding
    # bytes, including the slice header, which itself depends on the offsets —
    # iterate to a fixpoint (converges in <=3 rounds).
    def sh_bytes_for(sizes):
        w = SyntaxWriter(BitWriter())
        if sizes:
            sh.sh_entry_point_offset_minus1 = ListField({i: s - 1 for i, s in enumerate(sizes)})
            sh.sh_entry_offset_len_minus1 = max(0, (max(s - 1 for s in sizes)).bit_length() - 1)
        slice_header_syntax(w, sh, nal_type, sps_r, pps_r, ctx.ph)
        return w.bw.get_bytes()

    if len(payloads) > 1:
        sizes = [len(p) for p in payloads[:-1]]
        for _ in range(4):
            sh_bytes = sh_bytes_for(sizes)
            new_sizes = _ebsp_entry_sizes(sh_bytes, payloads)[:-1]
            if new_sizes == sizes:
                break
            sizes = new_sizes
        sh_bytes = sh_bytes_for(sizes)
    else:
        sh_bytes = sh_bytes_for(None)

    slice_nal = NalUnit(nal_type, sh_bytes + b"".join(payloads))
    return mux_annexb([sps_nal, pps_nal] + aps_nals + [ph_nal, slice_nal])


def _ebsp_entry_sizes(sh_bytes: bytes, payloads) -> list[int]:
    """Per-entry sizes in EBSP bytes for the NAL rbsp = sh + payloads.

    Counts emulation-prevention bytes inserted inside each entry's span.
    NAL-header bytes do not affect EPB state at rbsp[0] (header is 2 bytes,
    only zero-runs matter and the header's second byte is nonzero here).
    """
    rbsp = sh_bytes + b"".join(payloads)
    epb_before = [0] * (len(rbsp) + 1)
    zeros = 0
    count = 0
    for i, b in enumerate(rbsp):
        if zeros >= 2 and b <= 0x03:
            count += 1
            zeros = 0
        epb_before[i] = count
        zeros = zeros + 1 if b == 0 else 0
    epb_before[len(rbsp)] = count
    sizes = []
    pos = len(sh_bytes)
    for p in payloads:
        start, end = pos, pos + len(p)
        sizes.append((end - start) + (epb_before[end] - epb_before[start]))
        pos = end
    return sizes


def decode_with_oracle(stream: bytes, tmpdir: str = "/tmp") -> bytes | None:
    """Run the reference decoder on a stream; returns raw YUV or None."""
    import os
    import tempfile

    dectest = "/tmp/refbuild/dectest"
    if not os.path.exists(dectest):
        return None
    with tempfile.TemporaryDirectory(dir=tmpdir) as td:
        inp = f"{td}/in.266"
        out = f"{td}/out.yuv"
        with open(inp, "wb") as f:
            f.write(stream)
        r = subprocess.run(
            [dectest, "-i", inp, "-o", out, "-t", "1", "-e", "1"],
            capture_output=True,
            timeout=120,
        )
        if r.returncode != 0:
            raise RuntimeError(
                f"oracle decoder failed rc={r.returncode}\n{r.stderr.decode()[-2000:]}"
            )
        with open(out, "rb") as f:
            return f.read()

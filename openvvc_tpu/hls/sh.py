"""Slice header syntax — ITU-T H.266 section 7.3.7.

Reference parity: /root/reference/libovvc/vcl_sh.c:139-424 (nvcl_sh_read).
The slice header is followed in the same RBSP by byte_alignment() and the
CABAC-coded slice data; `parse`/`write` here cover up to and including that
alignment, leaving the reader positioned at the first slice-data byte.
"""

from __future__ import annotations

from openvvc_tpu.hls.nal import NalType
from openvvc_tpu.hls.ph import (
    PH,
    SLICE_B,
    SLICE_I,
    SLICE_P,
    num_extra_sh_bits,
    picture_header_syntax,
    pred_weight_table_syntax,
)
from openvvc_tpu.hls.rpl import HeaderRPL, header_ref_pic_lists_syntax
from openvvc_tpu.hls.syntax import SyntaxStruct, ceil_log2


class SH(SyntaxStruct):
    def __init__(self):
        self.hrpl0 = HeaderRPL()
        self.hrpl1 = HeaderRPL()
        self.ph = None  # set when sh_picture_header_in_slice_header_flag

    def resolved_rpls(self, pps, ph) -> tuple:
        """(hrpl0, hrpl1) taking pps_rpl_info_in_ph_flag into account."""
        if pps.pps_rpl_info_in_ph_flag:
            return ph.hrpl0, ph.hrpl1
        return self.hrpl0, self.hrpl1


def derive_num_ref_idx_active(sh: SH, pps, num_entries0: int, num_entries1: int) -> list[int]:
    """NumRefIdxActive[] derivation, H.266 7.4.8.1 equation style."""
    out = [0, 0]
    for i, num_entries in ((0, num_entries0), (1, num_entries1)):
        if sh.sh_slice_type == SLICE_B or (sh.sh_slice_type == SLICE_P and i == 0):
            if sh.sh_num_ref_idx_active_override_flag:
                if num_entries > 1:
                    lst = sh.sh_num_ref_idx_active_minus1
                    out[i] = (lst[i] if lst != 0 else 0) + 1
                else:
                    out[i] = num_entries
            else:
                default = pps.pps_num_ref_idx_default_active_minus1[i] + 1
                out[i] = min(num_entries, default)
    return out


def slice_header_syntax(io, sh: SH, nal_type: int, sps, pps, ph_ctx):
    """Parse/write a slice header.

    ph_ctx: the active PH (from a PH NALU) or None; when
    sh_picture_header_in_slice_header_flag is set, the PH is embedded here and
    stored on sh.ph.
    """
    io.flag(sh, "sh_picture_header_in_slice_header_flag")
    if sh.sh_picture_header_in_slice_header_flag:
        if io.is_reader:
            sh.ph = PH()
        picture_header_syntax(io, sh.ph, sps, pps)
        ph = sh.ph
    else:
        ph = ph_ctx
        if ph is None:
            raise ValueError("slice header without active picture header")
        sh.ph = ph

    if sps.sps_subpic_info_present_flag:
        io.u(sh, "sh_subpic_id", sps.sps_subpic_id_len_minus1 + 1)

    cols, rows = pps.tile_grid()
    num_tiles = len(cols) * len(rows)
    # Single-slice-per-picture assumption (matching the reference decoder's
    # scope, ovdec.c:129-133): rect slices never signal an address here.
    num_slices_in_subpic = 1
    if pps.pps_rect_slice_flag and num_slices_in_subpic > 1:
        io.u(sh, "sh_slice_address", ceil_log2(num_slices_in_subpic))
    elif not pps.pps_rect_slice_flag and num_tiles > 1:
        io.u(sh, "sh_slice_address", ceil_log2(num_tiles))

    for i in range(num_extra_sh_bits(sps)):
        io.flag_i(sh, "sh_extra_bit", i)

    if not pps.pps_rect_slice_flag and num_tiles - sh.sh_slice_address > 1:
        io.ue(sh, "sh_num_tiles_in_slice_minus1")

    if ph.ph_inter_slice_allowed_flag:
        io.ue(sh, "sh_slice_type")
    elif io.is_reader:
        sh.sh_slice_type = SLICE_I

    if nal_type in (NalType.IDR_W_RADL, NalType.IDR_N_LP, NalType.CRA, NalType.GDR):
        io.flag(sh, "sh_no_output_of_prior_pics_flag")

    if sps.sps_alf_enabled_flag and not pps.pps_alf_info_in_ph_flag:
        io.flag(sh, "sh_alf_enabled_flag")
        if sh.sh_alf_enabled_flag:
            io.u(sh, "sh_num_alf_aps_ids_luma", 3)
            for i in range(sh.sh_num_alf_aps_ids_luma):
                io.u_i(sh, "sh_alf_aps_id_luma", i, 3)
            if sps.sps_chroma_format_idc != 0:
                io.flag(sh, "sh_alf_cb_enabled_flag")
                io.flag(sh, "sh_alf_cr_enabled_flag")
            if sh.sh_alf_cb_enabled_flag or sh.sh_alf_cr_enabled_flag:
                io.u(sh, "sh_alf_aps_id_chroma", 3)
            if sps.sps_ccalf_enabled_flag:
                io.flag(sh, "sh_alf_cc_cb_enabled_flag")
                if sh.sh_alf_cc_cb_enabled_flag:
                    io.u(sh, "sh_alf_cc_cb_aps_id", 3)
                io.flag(sh, "sh_alf_cc_cr_enabled_flag")
                if sh.sh_alf_cc_cr_enabled_flag:
                    io.u(sh, "sh_alf_cc_cr_aps_id", 3)

    if ph.ph_lmcs_enabled_flag and not sh.sh_picture_header_in_slice_header_flag:
        io.flag(sh, "sh_lmcs_used_flag")
    elif io.is_reader:
        sh.sh_lmcs_used_flag = ph.ph_lmcs_enabled_flag and sh.sh_picture_header_in_slice_header_flag

    if ph.ph_explicit_scaling_list_enabled_flag and not sh.sh_picture_header_in_slice_header_flag:
        io.flag(sh, "sh_explicit_scaling_list_used_flag")
    elif io.is_reader:
        sh.sh_explicit_scaling_list_used_flag = (
            ph.ph_explicit_scaling_list_enabled_flag and sh.sh_picture_header_in_slice_header_flag
        )

    if not pps.pps_rpl_info_in_ph_flag and (
        nal_type not in (NalType.IDR_W_RADL, NalType.IDR_N_LP) or sps.sps_idr_rpl_present_flag
    ):
        header_ref_pic_lists_syntax(io, sh.hrpl0, sh.hrpl1, sps, pps)

    hrpl0, hrpl1 = sh.resolved_rpls(pps, ph)
    n0 = hrpl0.rpl.num_ref_entries if hrpl0.rpl != 0 else 0
    n1 = hrpl1.rpl.num_ref_entries if hrpl1.rpl != 0 else 0

    if (sh.sh_slice_type != SLICE_I and n0 > 1) or (sh.sh_slice_type == SLICE_B and n1 > 1):
        io.flag(sh, "sh_num_ref_idx_active_override_flag")
        if sh.sh_num_ref_idx_active_override_flag:
            for i in range(2 if sh.sh_slice_type == SLICE_B else 1):
                if (n0 if i == 0 else n1) > 1:
                    io.ue_i(sh, "sh_num_ref_idx_active_minus1", i)
    elif io.is_reader:
        sh.sh_num_ref_idx_active_override_flag = 1

    num_ref_active = derive_num_ref_idx_active(sh, pps, n0, n1)
    sh._num_ref_idx_active = num_ref_active

    if sh.sh_slice_type != SLICE_I:
        if pps.pps_cabac_init_present_flag:
            io.flag(sh, "sh_cabac_init_flag")
        if ph.ph_temporal_mvp_enabled_flag and not pps.pps_rpl_info_in_ph_flag:
            if sh.sh_slice_type == SLICE_B:
                io.flag(sh, "sh_collocated_from_l0_flag")
            elif io.is_reader:
                sh.sh_collocated_from_l0_flag = 1
            # spec 7.3.7: the >1 checks use NumRefIdxActive, not the raw
            # entry counts (vcl_sh.c :273-333 reassigns nb_ref_entries)
            if (sh.sh_collocated_from_l0_flag and num_ref_active[0] > 1) or (
                not sh.sh_collocated_from_l0_flag and num_ref_active[1] > 1
            ):
                io.ue(sh, "sh_collocated_ref_idx")
        if not pps.pps_wp_info_in_ph_flag and (
            (pps.pps_weighted_pred_flag and sh.sh_slice_type == SLICE_P)
            or (pps.pps_weighted_bipred_flag and sh.sh_slice_type == SLICE_B)
        ):
            wt = sh.__dict__.setdefault("pred_weight_table", SyntaxStruct())
            pred_weight_table_syntax(io, wt, sps, pps, num_ref_active, n1)

    if not pps.pps_qp_delta_info_in_ph_flag:
        io.se(sh, "sh_qp_delta")
    if pps.pps_slice_chroma_qp_offsets_present_flag:
        io.se(sh, "sh_cb_qp_offset")
        io.se(sh, "sh_cr_qp_offset")
        if sps.sps_joint_cbcr_enabled_flag:
            io.se(sh, "sh_joint_cbcr_qp_offset")
    if pps.pps_cu_chroma_qp_offset_list_enabled_flag:
        io.flag(sh, "sh_cu_chroma_qp_offset_enabled_flag")

    if sps.sps_sao_enabled_flag and not pps.pps_sao_info_in_ph_flag:
        io.flag(sh, "sh_sao_luma_used_flag")
        if sps.sps_chroma_format_idc != 0:
            io.flag(sh, "sh_sao_chroma_used_flag")
    elif io.is_reader and sps.sps_sao_enabled_flag:
        sh.sh_sao_luma_used_flag = ph.ph_sao_luma_enabled_flag
        sh.sh_sao_chroma_used_flag = ph.ph_sao_chroma_enabled_flag

    if pps.pps_deblocking_filter_override_enabled_flag and not pps.pps_dbf_info_in_ph_flag:
        io.flag(sh, "sh_deblocking_params_present_flag")
    if sh.sh_deblocking_params_present_flag:
        if not pps.pps_deblocking_filter_disabled_flag:
            io.flag(sh, "sh_deblocking_filter_disabled_flag")
        if not sh.sh_deblocking_filter_disabled_flag:
            io.se(sh, "sh_luma_beta_offset_div2")
            io.se(sh, "sh_luma_tc_offset_div2")
            if pps.pps_chroma_tool_offsets_present_flag:
                io.se(sh, "sh_cb_beta_offset_div2")
                io.se(sh, "sh_cb_tc_offset_div2")
                io.se(sh, "sh_cr_beta_offset_div2")
                io.se(sh, "sh_cr_tc_offset_div2")

    if sps.sps_dep_quant_enabled_flag:
        io.flag(sh, "sh_dep_quant_used_flag")
    if sps.sps_sign_data_hiding_enabled_flag and not sh.sh_dep_quant_used_flag:
        io.flag(sh, "sh_sign_data_hiding_used_flag")
    if (
        sps.sps_transform_skip_enabled_flag
        and not sh.sh_dep_quant_used_flag
        and not sh.sh_sign_data_hiding_used_flag
    ):
        io.flag(sh, "sh_ts_residual_coding_disabled_flag")

    if pps.pps_slice_header_extension_present_flag:
        io.ue(sh, "sh_slice_header_extension_length")
        for i in range(sh.sh_slice_header_extension_length):
            io.u_i(sh, "sh_slice_header_extension_data_byte", i, 8)

    # Entry points: one CABAC entry per tile in the slice (WPP not supported,
    # matching reference scope ovdec.h:50-57).
    if sh.sh_picture_header_in_slice_header_flag or not pps.pps_rect_slice_flag:
        tiles_in_slice = (
            num_tiles if pps.pps_rect_slice_flag else sh.sh_num_tiles_in_slice_minus1 + 1
        )
    else:
        tiles_in_slice = num_tiles
    nb_entry_points = tiles_in_slice - 1 if sps.sps_entry_point_offsets_present_flag else 0
    sh._nb_entry_points = nb_entry_points
    if nb_entry_points > 0:
        io.ue(sh, "sh_entry_offset_len_minus1")
        for i in range(nb_entry_points):
            io.u_i(sh, "sh_entry_point_offset_minus1", i, sh.sh_entry_offset_len_minus1 + 1)

    # byte_alignment() before slice_data
    if io.is_reader:
        io.br.u(1)
        io.br.align()
    else:
        io.bw.u(1, 1)
        io.bw.align_zero()

"""Picture header syntax — ITU-T H.266 section 7.3.2.8 (picture_header_structure)
plus pred_weight_table (7.3.8.2).

Reference parity: /root/reference/libovvc/nvcl_nal_ph.c:105-393 (nvcl_ph_read).
Where the reference deviates from the spec (collocated-flag presence condition,
NumExtraPhBits derivation), we follow the spec.
"""

from __future__ import annotations

from openvvc_tpu.hls.rpl import HeaderRPL, header_ref_pic_lists_syntax
from openvvc_tpu.hls.syntax import SyntaxStruct

# slice types (H.266 Table 9)
SLICE_B = 0
SLICE_P = 1
SLICE_I = 2


class PH(SyntaxStruct):
    def __init__(self):
        self.hrpl0 = HeaderRPL()
        self.hrpl1 = HeaderRPL()


def num_extra_ph_bits(sps) -> int:
    return sum(
        sps.sps_extra_ph_bit_present_flag[i] for i in range(sps.sps_num_extra_ph_bytes * 8)
    )


def num_extra_sh_bits(sps) -> int:
    return sum(
        sps.sps_extra_sh_bit_present_flag[i] for i in range(sps.sps_num_extra_sh_bytes * 8)
    )


def pred_weight_table_syntax(io, wt, sps, pps, num_ref_active, num_ref_entries1):
    """pred_weight_table() — H.266 7.3.8.2.

    num_ref_active: [l0, l1] active counts when parsed from SH;
    when parsed from PH (pps_wp_info_in_ph_flag) counts are signaled inline.
    """
    io.ue(wt, "luma_log2_weight_denom")
    if sps.sps_chroma_format_idc != 0:
        io.se(wt, "delta_chroma_log2_weight_denom")
    if pps.pps_wp_info_in_ph_flag:
        io.ue(wt, "num_l0_weights")
        n0 = wt.num_l0_weights
    else:
        n0 = num_ref_active[0]
    for i in range(n0):
        io.flag_i(wt, "luma_weight_l0_flag", i)
    if sps.sps_chroma_format_idc != 0:
        for i in range(n0):
            io.flag_i(wt, "chroma_weight_l0_flag", i)
    for i in range(n0):
        if wt.luma_weight_l0_flag[i]:
            io.se_i(wt, "delta_luma_weight_l0", i)
            io.se_i(wt, "luma_offset_l0", i)
        if wt.chroma_weight_l0_flag[i]:
            for j in range(2):
                if io.is_reader:
                    wt._list_nested("delta_chroma_weight_l0", i)[j] = io.br.se()
                    wt._list_nested("delta_chroma_offset_l0", i)[j] = io.br.se()
                else:
                    io.bw.se(int(wt._list_nested("delta_chroma_weight_l0", i)[j]))
                    io.bw.se(int(wt._list_nested("delta_chroma_offset_l0", i)[j]))
    if pps.pps_weighted_bipred_flag and pps.pps_wp_info_in_ph_flag and num_ref_entries1 > 0:
        io.ue(wt, "num_l1_weights")
        n1 = wt.num_l1_weights
    elif not pps.pps_wp_info_in_ph_flag and pps.pps_weighted_bipred_flag:
        n1 = num_ref_active[1]
    else:
        n1 = 0
    for i in range(n1):
        io.flag_i(wt, "luma_weight_l1_flag", i)
    if sps.sps_chroma_format_idc != 0:
        for i in range(n1):
            io.flag_i(wt, "chroma_weight_l1_flag", i)
    for i in range(n1):
        if wt.luma_weight_l1_flag[i]:
            io.se_i(wt, "delta_luma_weight_l1", i)
            io.se_i(wt, "luma_offset_l1", i)
        if wt.chroma_weight_l1_flag[i]:
            for j in range(2):
                if io.is_reader:
                    wt._list_nested("delta_chroma_weight_l1", i)[j] = io.br.se()
                    wt._list_nested("delta_chroma_offset_l1", i)[j] = io.br.se()
                else:
                    io.bw.se(int(wt._list_nested("delta_chroma_weight_l1", i)[j]))
                    io.bw.se(int(wt._list_nested("delta_chroma_offset_l1", i)[j]))


def picture_header_syntax(io, ph: PH, sps, pps):
    io.flag(ph, "ph_gdr_or_irap_pic_flag")
    io.flag(ph, "ph_non_ref_pic_flag")
    if ph.ph_gdr_or_irap_pic_flag:
        io.flag(ph, "ph_gdr_pic_flag")
    io.flag(ph, "ph_inter_slice_allowed_flag")
    if ph.ph_inter_slice_allowed_flag:
        io.flag(ph, "ph_intra_slice_allowed_flag")
    elif io.is_reader:
        ph.ph_intra_slice_allowed_flag = 1
    io.ue(ph, "ph_pic_parameter_set_id")
    io.u(ph, "ph_pic_order_cnt_lsb", sps.sps_log2_max_pic_order_cnt_lsb_minus4 + 4)
    if ph.ph_gdr_pic_flag:
        io.ue(ph, "ph_recovery_poc_cnt")
    for i in range(num_extra_ph_bits(sps)):
        io.flag_i(ph, "ph_extra_bit", i)

    if sps.sps_poc_msb_cycle_flag:
        io.flag(ph, "ph_poc_msb_cycle_present_flag")
        if ph.ph_poc_msb_cycle_present_flag:
            io.u(ph, "ph_poc_msb_cycle_val", sps.sps_poc_msb_cycle_len_minus1 + 1)

    if sps.sps_alf_enabled_flag and pps.pps_alf_info_in_ph_flag:
        io.flag(ph, "ph_alf_enabled_flag")
        if ph.ph_alf_enabled_flag:
            io.u(ph, "ph_num_alf_aps_ids_luma", 3)
            for i in range(ph.ph_num_alf_aps_ids_luma):
                io.u_i(ph, "ph_alf_aps_id_luma", i, 3)
            if sps.sps_chroma_format_idc != 0:
                io.flag(ph, "ph_alf_cb_enabled_flag")
                io.flag(ph, "ph_alf_cr_enabled_flag")
            if ph.ph_alf_cb_enabled_flag or ph.ph_alf_cr_enabled_flag:
                io.u(ph, "ph_alf_aps_id_chroma", 3)
            if sps.sps_ccalf_enabled_flag:
                io.flag(ph, "ph_alf_cc_cb_enabled_flag")
                if ph.ph_alf_cc_cb_enabled_flag:
                    io.u(ph, "ph_alf_cc_cb_aps_id", 3)
                io.flag(ph, "ph_alf_cc_cr_enabled_flag")
                if ph.ph_alf_cc_cr_enabled_flag:
                    io.u(ph, "ph_alf_cc_cr_aps_id", 3)

    if sps.sps_lmcs_enabled_flag:
        io.flag(ph, "ph_lmcs_enabled_flag")
        if ph.ph_lmcs_enabled_flag:
            io.u(ph, "ph_lmcs_aps_id", 2)
            if sps.sps_chroma_format_idc != 0:
                io.flag(ph, "ph_chroma_residual_scale_flag")

    if sps.sps_explicit_scaling_list_enabled_flag:
        io.flag(ph, "ph_explicit_scaling_list_enabled_flag")
        if ph.ph_explicit_scaling_list_enabled_flag:
            io.u(ph, "ph_scaling_list_aps_id", 3)

    if sps.sps_virtual_boundaries_enabled_flag and not sps.sps_virtual_boundaries_present_flag:
        io.flag(ph, "ph_virtual_boundaries_present_flag")
        if ph.ph_virtual_boundaries_present_flag:
            io.ue(ph, "ph_num_ver_virtual_boundaries")
            for i in range(ph.ph_num_ver_virtual_boundaries):
                io.ue_i(ph, "ph_virtual_boundary_pos_x_minus1", i)
            io.ue(ph, "ph_num_hor_virtual_boundaries")
            for i in range(ph.ph_num_hor_virtual_boundaries):
                io.ue_i(ph, "ph_virtual_boundary_pos_y_minus1", i)

    if pps.pps_output_flag_present_flag and not ph.ph_non_ref_pic_flag:
        io.flag(ph, "ph_pic_output_flag")
    elif io.is_reader:
        ph.ph_pic_output_flag = 1

    num_ref_entries0 = num_ref_entries1 = 0
    if pps.pps_rpl_info_in_ph_flag:
        header_ref_pic_lists_syntax(io, ph.hrpl0, ph.hrpl1, sps, pps)
        num_ref_entries0 = ph.hrpl0.rpl.num_ref_entries
        num_ref_entries1 = ph.hrpl1.rpl.num_ref_entries

    if sps.sps_partition_constraints_override_enabled_flag:
        io.flag(ph, "ph_partition_constraints_override_flag")

    if ph.ph_intra_slice_allowed_flag:
        if ph.ph_partition_constraints_override_flag:
            io.ue(ph, "ph_log2_diff_min_qt_min_cb_intra_slice_luma")
            io.ue(ph, "ph_max_mtt_hierarchy_depth_intra_slice_luma")
            if ph.ph_max_mtt_hierarchy_depth_intra_slice_luma != 0:
                io.ue(ph, "ph_log2_diff_max_bt_min_qt_intra_slice_luma")
                io.ue(ph, "ph_log2_diff_max_tt_min_qt_intra_slice_luma")
            if sps.sps_qtbtt_dual_tree_intra_flag:
                io.ue(ph, "ph_log2_diff_min_qt_min_cb_intra_slice_chroma")
                io.ue(ph, "ph_max_mtt_hierarchy_depth_intra_slice_chroma")
                if ph.ph_max_mtt_hierarchy_depth_intra_slice_chroma != 0:
                    io.ue(ph, "ph_log2_diff_max_bt_min_qt_intra_slice_chroma")
                    io.ue(ph, "ph_log2_diff_max_tt_min_qt_intra_slice_chroma")
        if pps.pps_cu_qp_delta_enabled_flag:
            io.ue(ph, "ph_cu_qp_delta_subdiv_intra_slice")
        if pps.pps_cu_chroma_qp_offset_list_enabled_flag:
            io.ue(ph, "ph_cu_chroma_qp_offset_subdiv_intra_slice")

    if ph.ph_inter_slice_allowed_flag:
        if ph.ph_partition_constraints_override_flag:
            io.ue(ph, "ph_log2_diff_min_qt_min_cb_inter_slice")
            io.ue(ph, "ph_max_mtt_hierarchy_depth_inter_slice")
            if ph.ph_max_mtt_hierarchy_depth_inter_slice != 0:
                io.ue(ph, "ph_log2_diff_max_bt_min_qt_inter_slice")
                io.ue(ph, "ph_log2_diff_max_tt_min_qt_inter_slice")
        if pps.pps_cu_qp_delta_enabled_flag:
            io.ue(ph, "ph_cu_qp_delta_subdiv_inter_slice")
        if pps.pps_cu_chroma_qp_offset_list_enabled_flag:
            io.ue(ph, "ph_cu_chroma_qp_offset_subdiv_inter_slice")

        if sps.sps_temporal_mvp_enabled_flag:
            io.flag(ph, "ph_temporal_mvp_enabled_flag")
            if ph.ph_temporal_mvp_enabled_flag and pps.pps_rpl_info_in_ph_flag:
                if num_ref_entries1 > 0:
                    io.flag(ph, "ph_collocated_from_l0_flag")
                elif io.is_reader:
                    ph.ph_collocated_from_l0_flag = 1
                if (ph.ph_collocated_from_l0_flag and num_ref_entries0 > 1) or (
                    not ph.ph_collocated_from_l0_flag and num_ref_entries1 > 1
                ):
                    io.ue(ph, "ph_collocated_ref_idx")

        if sps.sps_mmvd_fullpel_only_enabled_flag:
            io.flag(ph, "ph_mmvd_fullpel_only_flag")

        presence = (not pps.pps_rpl_info_in_ph_flag) or num_ref_entries1 > 0
        if presence:
            io.flag(ph, "ph_mvd_l1_zero_flag")
        elif io.is_reader:
            ph.ph_mvd_l1_zero_flag = 1
        if sps.sps_bdof_control_present_in_ph_flag and presence:
            io.flag(ph, "ph_bdof_disabled_flag")
        elif io.is_reader:
            ph.ph_bdof_disabled_flag = 0 if (sps.sps_bdof_enabled_flag and not sps.sps_bdof_control_present_in_ph_flag) else 1
        if sps.sps_dmvr_control_present_in_ph_flag and presence:
            io.flag(ph, "ph_dmvr_disabled_flag")
        elif io.is_reader:
            ph.ph_dmvr_disabled_flag = 0 if (sps.sps_dmvr_enabled_flag and not sps.sps_dmvr_control_present_in_ph_flag) else 1
        if sps.sps_prof_control_present_in_ph_flag:
            io.flag(ph, "ph_prof_disabled_flag")

        if (pps.pps_weighted_pred_flag or pps.pps_weighted_bipred_flag) and pps.pps_wp_info_in_ph_flag:
            wt = ph.__dict__.setdefault("pred_weight_table", SyntaxStruct())
            pred_weight_table_syntax(io, wt, sps, pps, [0, 0], num_ref_entries1)

    if pps.pps_qp_delta_info_in_ph_flag:
        io.se(ph, "ph_qp_delta")
    if sps.sps_joint_cbcr_enabled_flag:
        io.flag(ph, "ph_joint_cbcr_sign_flag")
    if sps.sps_sao_enabled_flag and pps.pps_sao_info_in_ph_flag:
        io.flag(ph, "ph_sao_luma_enabled_flag")
        if sps.sps_chroma_format_idc != 0:
            io.flag(ph, "ph_sao_chroma_enabled_flag")

    if pps.pps_dbf_info_in_ph_flag:
        io.flag(ph, "ph_deblocking_params_present_flag")
        if ph.ph_deblocking_params_present_flag:
            if not pps.pps_deblocking_filter_disabled_flag:
                io.flag(ph, "ph_deblocking_filter_disabled_flag")
            if not ph.ph_deblocking_filter_disabled_flag:
                io.se(ph, "ph_luma_beta_offset_div2")
                io.se(ph, "ph_luma_tc_offset_div2")
                if pps.pps_chroma_tool_offsets_present_flag:
                    io.se(ph, "ph_cb_beta_offset_div2")
                    io.se(ph, "ph_cb_tc_offset_div2")
                    io.se(ph, "ph_cr_beta_offset_div2")
                    io.se(ph, "ph_cr_tc_offset_div2")

    if pps.pps_picture_header_extension_present_flag:
        io.ue(ph, "ph_extension_length")
        for i in range(ph.ph_extension_length):
            io.u_i(ph, "ph_extension_data_byte", i, 8)

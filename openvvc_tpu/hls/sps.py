"""SPS (sequence parameter set) syntax — ITU-T H.266 section 7.3.2.4.

Reference parity: /root/reference/libovvc/nvcl_nal_sps.c:345-715 (nvcl_sps_read)
including subpic_info (:139), vui_payload (:222) and HRD timing (:279-343).
"""

from __future__ import annotations

from openvvc_tpu.hls.ptl import (
    HRDTiming,
    PTL,
    dpb_parameters_syntax,
    general_timing_hrd_parameters_syntax,
    ols_timing_hrd_parameters_syntax,
    profile_tier_level_syntax,
)
from openvvc_tpu.hls.rpl import RPL, ref_pic_list_struct_syntax
from openvvc_tpu.hls.syntax import SyntaxStruct, ceil_log2


class SPS(SyntaxStruct):
    def __init__(self):
        self.ptl = PTL()
        self.dpb = SyntaxStruct()
        self.vui = SyntaxStruct()
        self.rpl_s0: list[RPL] = []
        self.rpl_s1: list[RPL] = []

    # -- derived values used throughout the decoder --------------------
    @property
    def ctb_log2(self) -> int:
        return self.sps_log2_ctu_size_minus5 + 5

    @property
    def ctb_size(self) -> int:
        return 1 << self.ctb_log2

    @property
    def pic_w(self) -> int:
        return self.sps_pic_width_max_in_luma_samples

    @property
    def pic_h(self) -> int:
        return self.sps_pic_height_max_in_luma_samples

    @property
    def bitdepth(self) -> int:
        return 8 + self.sps_bitdepth_minus8

    @property
    def nb_ctu_w(self) -> int:
        return (self.pic_w + self.ctb_size - 1) >> self.ctb_log2

    @property
    def nb_ctu_h(self) -> int:
        return (self.pic_h + self.ctb_size - 1) >> self.ctb_log2


def _subpic_info_syntax(io, sps: SPS):
    io.ue(sps, "sps_num_subpics_minus1")
    if sps.sps_num_subpics_minus1 > 0:
        wide = sps.pic_w > sps.ctb_size
        tall = sps.pic_h > sps.ctb_size
        wbits = ceil_log2(sps.nb_ctu_w)
        hbits = ceil_log2(sps.nb_ctu_h)
        io.flag(sps, "sps_independent_subpics_flag")
        io.flag(sps, "sps_subpic_same_size_flag")
        for i in range(sps.sps_num_subpics_minus1 + 1):
            if not sps.sps_subpic_same_size_flag or i == 0:
                if i > 0 and wide:
                    io.u_i(sps, "sps_subpic_ctu_top_left_x", i, wbits)
                if i > 0 and tall:
                    io.u_i(sps, "sps_subpic_ctu_top_left_y", i, hbits)
                if i < sps.sps_num_subpics_minus1 and wide:
                    io.u_i(sps, "sps_subpic_width_minus1", i, wbits)
                if i < sps.sps_num_subpics_minus1 and tall:
                    io.u_i(sps, "sps_subpic_height_minus1", i, hbits)
            if not sps.sps_independent_subpics_flag:
                io.flag_i(sps, "sps_subpic_treated_as_pic_flag", i)
                io.flag_i(sps, "sps_loop_filter_across_subpic_enabled_flag", i)
    io.ue(sps, "sps_subpic_id_len_minus1")
    io.flag(sps, "sps_subpic_id_mapping_explicitly_signalled_flag")
    if sps.sps_subpic_id_mapping_explicitly_signalled_flag:
        io.flag(sps, "sps_subpic_id_mapping_present_flag")
        if sps.sps_subpic_id_mapping_present_flag:
            for i in range(sps.sps_num_subpics_minus1 + 1):
                io.u_i(sps, "sps_subpic_id", i, sps.sps_subpic_id_len_minus1 + 1)


def _vui_payload_syntax(io, vui):
    """vui_payload / vui_parameters (H.274 section 7.2, as used by VVC)."""
    io.flag(vui, "vui_progressive_source_flag")
    io.flag(vui, "vui_interlaced_source_flag")
    io.flag(vui, "vui_non_packed_constraint_flag")
    io.flag(vui, "vui_non_projected_constraint_flag")
    io.flag(vui, "vui_aspect_ratio_info_present_flag")
    if vui.vui_aspect_ratio_info_present_flag:
        io.flag(vui, "vui_aspect_ratio_constant_flag")
        io.u(vui, "vui_aspect_ratio_idc", 8)
        if vui.vui_aspect_ratio_idc == 255:
            io.u(vui, "vui_sar_width", 16)
            io.u(vui, "vui_sar_height", 16)
    io.flag(vui, "vui_overscan_info_present_flag")
    if vui.vui_overscan_info_present_flag:
        io.flag(vui, "vui_overscan_appropriate_flag")
    io.flag(vui, "vui_colour_description_present_flag")
    if vui.vui_colour_description_present_flag:
        io.u(vui, "vui_colour_primaries", 8)
        io.u(vui, "vui_transfer_characteristics", 8)
        io.u(vui, "vui_matrix_coeffs", 8)
        io.flag(vui, "vui_full_range_flag")
    io.flag(vui, "vui_chroma_loc_info_present_flag")
    if vui.vui_chroma_loc_info_present_flag:
        if vui.vui_progressive_source_flag and not vui.vui_interlaced_source_flag:
            io.ue(vui, "vui_chroma_sample_loc_type_frame")
        else:
            io.ue(vui, "vui_chroma_sample_loc_type_top_field")
            io.ue(vui, "vui_chroma_sample_loc_type_bottom_field")


def sps_syntax(io, sps: SPS):
    io.u(sps, "sps_seq_parameter_set_id", 4)
    io.u(sps, "sps_video_parameter_set_id", 4)
    io.u(sps, "sps_max_sublayers_minus1", 3)
    io.u(sps, "sps_chroma_format_idc", 2)
    io.u(sps, "sps_log2_ctu_size_minus5", 2)

    io.flag(sps, "sps_ptl_dpb_hrd_params_present_flag")
    if sps.sps_ptl_dpb_hrd_params_present_flag:
        profile_tier_level_syntax(io, sps.ptl, True, sps.sps_max_sublayers_minus1)

    io.flag(sps, "sps_gdr_enabled_flag")
    io.flag(sps, "sps_ref_pic_resampling_enabled_flag")
    if sps.sps_ref_pic_resampling_enabled_flag:
        io.flag(sps, "sps_res_change_in_clvs_allowed_flag")

    io.ue(sps, "sps_pic_width_max_in_luma_samples")
    io.ue(sps, "sps_pic_height_max_in_luma_samples")

    io.flag(sps, "sps_conformance_window_flag")
    if sps.sps_conformance_window_flag:
        io.ue(sps, "sps_conf_win_left_offset")
        io.ue(sps, "sps_conf_win_right_offset")
        io.ue(sps, "sps_conf_win_top_offset")
        io.ue(sps, "sps_conf_win_bottom_offset")

    io.flag(sps, "sps_subpic_info_present_flag")
    if sps.sps_subpic_info_present_flag:
        _subpic_info_syntax(io, sps)

    io.ue(sps, "sps_bitdepth_minus8")
    io.flag(sps, "sps_entropy_coding_sync_enabled_flag")
    io.flag(sps, "sps_entry_point_offsets_present_flag")
    io.u(sps, "sps_log2_max_pic_order_cnt_lsb_minus4", 4)

    io.flag(sps, "sps_poc_msb_cycle_flag")
    if sps.sps_poc_msb_cycle_flag:
        io.ue(sps, "sps_poc_msb_cycle_len_minus1")

    io.u(sps, "sps_num_extra_ph_bytes", 2)
    for i in range(sps.sps_num_extra_ph_bytes * 8):
        io.flag_i(sps, "sps_extra_ph_bit_present_flag", i)
    io.u(sps, "sps_num_extra_sh_bytes", 2)
    for i in range(sps.sps_num_extra_sh_bytes * 8):
        io.flag_i(sps, "sps_extra_sh_bit_present_flag", i)

    if sps.sps_ptl_dpb_hrd_params_present_flag:
        if sps.sps_max_sublayers_minus1 > 0:
            io.flag(sps, "sps_sublayer_dpb_params_flag")
        dpb_parameters_syntax(io, sps.dpb, sps.sps_max_sublayers_minus1, sps.sps_sublayer_dpb_params_flag)

    io.ue(sps, "sps_log2_min_luma_coding_block_size_minus2")
    io.flag(sps, "sps_partition_constraints_override_enabled_flag")
    io.ue(sps, "sps_log2_diff_min_qt_min_cb_intra_slice_luma")
    io.ue(sps, "sps_max_mtt_hierarchy_depth_intra_slice_luma")
    if sps.sps_max_mtt_hierarchy_depth_intra_slice_luma != 0:
        io.ue(sps, "sps_log2_diff_max_bt_min_qt_intra_slice_luma")
        io.ue(sps, "sps_log2_diff_max_tt_min_qt_intra_slice_luma")

    if sps.sps_chroma_format_idc != 0:
        io.flag(sps, "sps_qtbtt_dual_tree_intra_flag")
    if sps.sps_qtbtt_dual_tree_intra_flag:
        io.ue(sps, "sps_log2_diff_min_qt_min_cb_intra_slice_chroma")
        io.ue(sps, "sps_max_mtt_hierarchy_depth_intra_slice_chroma")
        if sps.sps_max_mtt_hierarchy_depth_intra_slice_chroma != 0:
            io.ue(sps, "sps_log2_diff_max_bt_min_qt_intra_slice_chroma")
            io.ue(sps, "sps_log2_diff_max_tt_min_qt_intra_slice_chroma")

    io.ue(sps, "sps_log2_diff_min_qt_min_cb_inter_slice")
    io.ue(sps, "sps_max_mtt_hierarchy_depth_inter_slice")
    if sps.sps_max_mtt_hierarchy_depth_inter_slice != 0:
        io.ue(sps, "sps_log2_diff_max_bt_min_qt_inter_slice")
        io.ue(sps, "sps_log2_diff_max_tt_min_qt_inter_slice")

    if sps.sps_log2_ctu_size_minus5 > 0:
        io.flag(sps, "sps_max_luma_transform_size_64_flag")

    io.flag(sps, "sps_transform_skip_enabled_flag")
    if sps.sps_transform_skip_enabled_flag:
        io.ue(sps, "sps_log2_transform_skip_max_size_minus2")
        io.flag(sps, "sps_bdpcm_enabled_flag")

    io.flag(sps, "sps_mts_enabled_flag")
    if sps.sps_mts_enabled_flag:
        io.flag(sps, "sps_explicit_mts_intra_enabled_flag")
        io.flag(sps, "sps_explicit_mts_inter_enabled_flag")

    io.flag(sps, "sps_lfnst_enabled_flag")

    if sps.sps_chroma_format_idc != 0:
        io.flag(sps, "sps_joint_cbcr_enabled_flag")
        io.flag(sps, "sps_same_qp_table_for_chroma_flag")
        num_tables = 1 if sps.sps_same_qp_table_for_chroma_flag else 2 + sps.sps_joint_cbcr_enabled_flag
        for i in range(num_tables):
            io.se_i(sps, "sps_qp_table_start_minus26", i)
            io.ue_i(sps, "sps_num_points_in_qp_table_minus1", i)
            in_vals = sps._list_nested("sps_delta_qp_in_val_minus1", i)
            diff_vals = sps._list_nested("sps_delta_qp_diff_val", i)
            for j in range(sps.sps_num_points_in_qp_table_minus1[i] + 1):
                if io.is_reader:
                    in_vals[j] = io.br.ue()
                    diff_vals[j] = io.br.ue()
                else:
                    io.bw.ue(int(in_vals[j]))
                    io.bw.ue(int(diff_vals[j]))

    io.flag(sps, "sps_sao_enabled_flag")
    io.flag(sps, "sps_alf_enabled_flag")
    if sps.sps_alf_enabled_flag and sps.sps_chroma_format_idc != 0:
        io.flag(sps, "sps_ccalf_enabled_flag")
    io.flag(sps, "sps_lmcs_enabled_flag")
    io.flag(sps, "sps_weighted_pred_flag")
    io.flag(sps, "sps_weighted_bipred_flag")
    io.flag(sps, "sps_long_term_ref_pics_flag")
    if sps.sps_video_parameter_set_id > 0:
        io.flag(sps, "sps_inter_layer_prediction_enabled_flag")
    io.flag(sps, "sps_idr_rpl_present_flag")
    io.flag(sps, "sps_rpl1_same_as_rpl0_flag")

    io.ue(sps, "sps_num_ref_pic_lists0")
    if io.is_reader:
        sps.rpl_s0 = [RPL() for _ in range(sps.sps_num_ref_pic_lists0)]
    for j in range(sps.sps_num_ref_pic_lists0):
        ref_pic_list_struct_syntax(io, sps.rpl_s0[j], sps, 0, j)

    if not sps.sps_rpl1_same_as_rpl0_flag:
        io.ue(sps, "sps_num_ref_pic_lists1")
        if io.is_reader:
            sps.rpl_s1 = [RPL() for _ in range(sps.sps_num_ref_pic_lists1)]
        for j in range(sps.sps_num_ref_pic_lists1):
            ref_pic_list_struct_syntax(io, sps.rpl_s1[j], sps, 1, j)
    elif io.is_reader:
        sps.sps_num_ref_pic_lists1 = sps.sps_num_ref_pic_lists0
        sps.rpl_s1 = sps.rpl_s0

    io.flag(sps, "sps_ref_wraparound_enabled_flag")
    io.flag(sps, "sps_temporal_mvp_enabled_flag")
    if sps.sps_temporal_mvp_enabled_flag:
        io.flag(sps, "sps_sbtmvp_enabled_flag")

    io.flag(sps, "sps_amvr_enabled_flag")
    io.flag(sps, "sps_bdof_enabled_flag")
    if sps.sps_bdof_enabled_flag:
        io.flag(sps, "sps_bdof_control_present_in_ph_flag")
    io.flag(sps, "sps_smvd_enabled_flag")
    io.flag(sps, "sps_dmvr_enabled_flag")
    if sps.sps_dmvr_enabled_flag:
        io.flag(sps, "sps_dmvr_control_present_in_ph_flag")
    io.flag(sps, "sps_mmvd_enabled_flag")
    if sps.sps_mmvd_enabled_flag:
        io.flag(sps, "sps_mmvd_fullpel_only_enabled_flag")

    io.ue(sps, "sps_six_minus_max_num_merge_cand")
    io.flag(sps, "sps_sbt_enabled_flag")

    io.flag(sps, "sps_affine_enabled_flag")
    if sps.sps_affine_enabled_flag:
        io.ue(sps, "sps_five_minus_max_num_subblock_merge_cand")
        io.flag(sps, "sps_6param_affine_enabled_flag")
        if sps.sps_amvr_enabled_flag:
            io.flag(sps, "sps_affine_amvr_enabled_flag")
        io.flag(sps, "sps_affine_prof_enabled_flag")
        if sps.sps_affine_prof_enabled_flag:
            io.flag(sps, "sps_prof_control_present_in_ph_flag")

    io.flag(sps, "sps_bcw_enabled_flag")
    io.flag(sps, "sps_ciip_enabled_flag")

    max_num_merge_cand = 6 - sps.sps_six_minus_max_num_merge_cand
    if max_num_merge_cand >= 2:
        io.flag(sps, "sps_gpm_enabled_flag")
        if sps.sps_gpm_enabled_flag and max_num_merge_cand >= 3:
            io.ue(sps, "sps_max_num_merge_cand_minus_max_num_gpm_cand")

    io.ue(sps, "sps_log2_parallel_merge_level_minus2")
    io.flag(sps, "sps_isp_enabled_flag")
    io.flag(sps, "sps_mrl_enabled_flag")
    io.flag(sps, "sps_mip_enabled_flag")
    if sps.sps_chroma_format_idc != 0:
        io.flag(sps, "sps_cclm_enabled_flag")
    if sps.sps_chroma_format_idc == 1:
        io.flag(sps, "sps_chroma_horizontal_collocated_flag")
        io.flag(sps, "sps_chroma_vertical_collocated_flag")

    io.flag(sps, "sps_palette_enabled_flag")
    if sps.sps_chroma_format_idc == 3 and not sps.sps_max_luma_transform_size_64_flag:
        io.flag(sps, "sps_act_enabled_flag")
    if sps.sps_transform_skip_enabled_flag or sps.sps_palette_enabled_flag:
        io.ue(sps, "sps_min_qp_prime_ts")

    io.flag(sps, "sps_ibc_enabled_flag")
    if sps.sps_ibc_enabled_flag:
        io.ue(sps, "sps_six_minus_max_num_ibc_merge_cand")

    io.flag(sps, "sps_ladf_enabled_flag")
    if sps.sps_ladf_enabled_flag:
        io.u(sps, "sps_num_ladf_intervals_minus2", 2)
        io.se(sps, "sps_ladf_lowest_interval_qp_offset")
        for i in range(sps.sps_num_ladf_intervals_minus2 + 1):
            io.se_i(sps, "sps_ladf_qp_offset", i)
            io.ue_i(sps, "sps_ladf_delta_threshold_minus1", i)

    io.flag(sps, "sps_explicit_scaling_list_enabled_flag")
    if sps.sps_explicit_scaling_list_enabled_flag:
        if sps.sps_lfnst_enabled_flag:
            io.flag(sps, "sps_scaling_matrix_for_lfnst_disabled_flag")
        if sps.sps_act_enabled_flag:
            io.flag(sps, "sps_scaling_matrix_for_alternative_colour_space_disabled_flag")
            if sps.sps_scaling_matrix_for_alternative_colour_space_disabled_flag:
                io.flag(sps, "sps_scaling_matrix_designated_colour_space_flag")

    io.flag(sps, "sps_dep_quant_enabled_flag")
    io.flag(sps, "sps_sign_data_hiding_enabled_flag")

    io.flag(sps, "sps_virtual_boundaries_enabled_flag")
    if sps.sps_virtual_boundaries_enabled_flag:
        io.flag(sps, "sps_virtual_boundaries_present_flag")
        if sps.sps_virtual_boundaries_present_flag:
            io.ue(sps, "sps_num_ver_virtual_boundaries")
            for i in range(sps.sps_num_ver_virtual_boundaries):
                io.ue_i(sps, "sps_virtual_boundary_pos_x_minus1", i)
            io.ue(sps, "sps_num_hor_virtual_boundaries")
            for i in range(sps.sps_num_hor_virtual_boundaries):
                io.ue_i(sps, "sps_virtual_boundary_pos_y_minus1", i)

    if sps.sps_ptl_dpb_hrd_params_present_flag:
        io.flag(sps, "sps_timing_hrd_params_present_flag")
        if sps.sps_timing_hrd_params_present_flag:
            hrd = sps.__dict__.setdefault("hrd", HRDTiming())
            general_timing_hrd_parameters_syntax(io, hrd)
            if sps.sps_max_sublayers_minus1 > 0:
                io.flag(sps, "sps_sublayer_cpb_params_present_flag")
            first = 0 if sps.sps_sublayer_cpb_params_present_flag else sps.sps_max_sublayers_minus1
            ols_timing_hrd_parameters_syntax(io, hrd, first, sps.sps_max_sublayers_minus1)

    io.flag(sps, "sps_field_seq_flag")

    io.flag(sps, "sps_vui_parameters_present_flag")
    if sps.sps_vui_parameters_present_flag:
        io.ue(sps, "sps_vui_payload_size_minus1")
        io.align()
        _vui_payload_syntax(io, sps.vui)
        # vui payload is byte-padded to the declared size (vui_payload in
        # H.274: payload extension + alignment). Our writer must ensure the
        # declared size matches; the reader skips residual payload bits via
        # size accounting at the NAL level (extension data tolerated).

    io.flag(sps, "sps_extension_flag")
    # sps_extension_data_flag bits ignored up to rbsp_trailing_bits.

"""PPS (picture parameter set) syntax — ITU-T H.266 section 7.3.2.5.

Includes the tile-grid derivation (spec 6.5.1) used to compute per-tile CABAC
entries. Reference parity: /root/reference/libovvc/nvcl_nal_pps.c:267-477
(nvcl_pps_read, pps_read_pic_partition, pps_implicit_pic_partition).
"""

from __future__ import annotations

from openvvc_tpu.hls.syntax import SyntaxStruct


class PPS(SyntaxStruct):
    # -- derived -------------------------------------------------------
    @property
    def ctb_log2(self) -> int:
        return self.pps_log2_ctu_size_minus5 + 5

    @property
    def ctb_size(self) -> int:
        return 1 << self.ctb_log2

    @property
    def pic_w(self) -> int:
        return self.pps_pic_width_in_luma_samples

    @property
    def pic_h(self) -> int:
        return self.pps_pic_height_in_luma_samples

    @property
    def nb_ctu_w(self) -> int:
        return (self.pic_w + self.ctb_size - 1) >> self.ctb_log2

    @property
    def nb_ctu_h(self) -> int:
        return (self.pic_h + self.ctb_size - 1) >> self.ctb_log2

    def tile_grid(self) -> tuple[list[int], list[int]]:
        """Per spec 6.5.1: lists of tile column widths / row heights in CTUs.

        Explicit sizes come from pps_tile_column_width_minus1 /
        pps_tile_row_height_minus1; the remainder of the picture is split
        implicitly into tiles of the last explicit size.
        """

        def expand(n_exp: int, sizes, total: int) -> list[int]:
            out = []
            rem = total
            size = total
            for i in range(n_exp):
                size = sizes[i] + 1
                out.append(size)
                rem -= size
            while rem > 0:
                size = min(size, rem)
                out.append(size)
                rem -= size
            return out

        if self.pps_no_pic_partition_flag:
            return [self.nb_ctu_w], [self.nb_ctu_h]
        cols = expand(
            self.pps_num_exp_tile_columns_minus1 + 1, self.pps_tile_column_width_minus1, self.nb_ctu_w
        )
        rows = expand(
            self.pps_num_exp_tile_rows_minus1 + 1, self.pps_tile_row_height_minus1, self.nb_ctu_h
        )
        return cols, rows

    @property
    def num_tiles(self) -> int:
        cols, rows = self.tile_grid()
        return len(cols) * len(rows)


def _partition_syntax(io, pps: PPS):
    """Tile/slice layout (inside `if (!pps_no_pic_partition_flag)`)."""
    io.u(pps, "pps_log2_ctu_size_minus5", 2)
    io.ue(pps, "pps_num_exp_tile_columns_minus1")
    io.ue(pps, "pps_num_exp_tile_rows_minus1")
    for i in range(pps.pps_num_exp_tile_columns_minus1 + 1):
        io.ue_i(pps, "pps_tile_column_width_minus1", i)
    for i in range(pps.pps_num_exp_tile_rows_minus1 + 1):
        io.ue_i(pps, "pps_tile_row_height_minus1", i)

    cols, rows = pps.tile_grid()
    num_tile_cols, num_tile_rows = len(cols), len(rows)
    num_tiles = num_tile_cols * num_tile_rows

    # Spec defaults when not signaled.
    pps.pps_loop_filter_across_tiles_enabled_flag = getattr(pps, "pps_loop_filter_across_tiles_enabled_flag", 0)
    if num_tiles > 1:
        io.flag(pps, "pps_loop_filter_across_tiles_enabled_flag")
        io.flag(pps, "pps_rect_slice_flag")
    else:
        if io.is_reader:
            pps.pps_loop_filter_across_tiles_enabled_flag = 0
            pps.pps_rect_slice_flag = 1

    if pps.pps_rect_slice_flag:
        io.flag(pps, "pps_single_slice_per_subpic_flag")

    if pps.pps_rect_slice_flag and not pps.pps_single_slice_per_subpic_flag:
        io.ue(pps, "pps_num_slices_in_pic_minus1")
        if pps.pps_num_slices_in_pic_minus1 > 1:
            io.flag(pps, "pps_tile_idx_delta_present_flag")
        tile_id = 0
        i = 0
        while i < pps.pps_num_slices_in_pic_minus1:
            tile_x = tile_id % num_tile_cols
            tile_y = tile_id // num_tile_cols
            if tile_x != num_tile_cols - 1:
                io.ue_i(pps, "pps_slice_width_in_tiles_minus1", i)
            if tile_y != num_tile_rows - 1 and (pps.pps_tile_idx_delta_present_flag or tile_x == 0):
                io.ue_i(pps, "pps_slice_height_in_tiles_minus1", i)
            nb_extra = 0
            if (
                pps.pps_slice_width_in_tiles_minus1[i] == 0
                and pps.pps_slice_height_in_tiles_minus1[i] == 0
                and rows[tile_y] > 1
            ):
                io.ue_i(pps, "pps_num_exp_slices_in_tile", i)
                n_exp = pps.pps_num_exp_slices_in_tile[i]
                if n_exp:
                    rem = rows[tile_y]
                    h = rem
                    for j in range(n_exp):
                        io.ue_i(pps, "pps_exp_slice_height_in_ctus_minus1", i + j)
                        h = pps.pps_exp_slice_height_in_ctus_minus1[i + j] + 1
                        rem -= h
                    # implicit remainder slices of last explicit height
                    k = n_exp
                    while rem > 0:
                        hh = min(h, rem)
                        rem -= hh
                        k += 1
                    nb_extra = k - 1
            i += nb_extra
            if pps.pps_tile_idx_delta_present_flag and i < pps.pps_num_slices_in_pic_minus1:
                delta = io.se_i(pps, "pps_tile_idx_delta_val", i)
                tile_id += delta
            else:
                tile_id += pps.pps_slice_width_in_tiles_minus1[i] + 1
                if tile_id % num_tile_cols == 0:
                    tile_id += pps.pps_slice_height_in_tiles_minus1[i] * num_tile_cols
            i += 1

    if (
        not pps.pps_rect_slice_flag
        or pps.pps_single_slice_per_subpic_flag
        or pps.pps_num_slices_in_pic_minus1 > 0
    ):
        io.flag(pps, "pps_loop_filter_across_slices_enabled_flag")


def pps_syntax(io, pps: PPS):
    io.u(pps, "pps_pic_parameter_set_id", 6)
    io.u(pps, "pps_seq_parameter_set_id", 4)
    io.flag(pps, "pps_mixed_nalu_types_in_pic_flag")
    io.ue(pps, "pps_pic_width_in_luma_samples")
    io.ue(pps, "pps_pic_height_in_luma_samples")

    io.flag(pps, "pps_conformance_window_flag")
    if pps.pps_conformance_window_flag:
        io.ue(pps, "pps_conf_win_left_offset")
        io.ue(pps, "pps_conf_win_right_offset")
        io.ue(pps, "pps_conf_win_top_offset")
        io.ue(pps, "pps_conf_win_bottom_offset")

    io.flag(pps, "pps_scaling_window_explicit_signalling_flag")
    if pps.pps_scaling_window_explicit_signalling_flag:
        io.se(pps, "pps_scaling_win_left_offset")
        io.se(pps, "pps_scaling_win_right_offset")
        io.se(pps, "pps_scaling_win_top_offset")
        io.se(pps, "pps_scaling_win_bottom_offset")

    io.flag(pps, "pps_output_flag_present_flag")
    io.flag(pps, "pps_no_pic_partition_flag")

    io.flag(pps, "pps_subpic_id_mapping_present_flag")
    if pps.pps_subpic_id_mapping_present_flag:
        if not pps.pps_no_pic_partition_flag:
            io.ue(pps, "pps_num_subpics_minus1")
        io.ue(pps, "pps_subpic_id_len_minus1")
        for i in range(pps.pps_num_subpics_minus1 + 1):
            io.u_i(pps, "pps_subpic_id", i, pps.pps_subpic_id_len_minus1 + 1)

    if not pps.pps_no_pic_partition_flag:
        _partition_syntax(io, pps)

    io.flag(pps, "pps_cabac_init_present_flag")
    for i in range(2):
        io.ue_i(pps, "pps_num_ref_idx_default_active_minus1", i)
    io.flag(pps, "pps_rpl1_idx_present_flag")
    io.flag(pps, "pps_weighted_pred_flag")
    io.flag(pps, "pps_weighted_bipred_flag")
    io.flag(pps, "pps_ref_wraparound_enabled_flag")
    if pps.pps_ref_wraparound_enabled_flag:
        io.ue(pps, "pps_pic_width_minus_wraparound_offset")

    io.se(pps, "pps_init_qp_minus26")
    io.flag(pps, "pps_cu_qp_delta_enabled_flag")

    io.flag(pps, "pps_chroma_tool_offsets_present_flag")
    if pps.pps_chroma_tool_offsets_present_flag:
        io.se(pps, "pps_cb_qp_offset")
        io.se(pps, "pps_cr_qp_offset")
        io.flag(pps, "pps_joint_cbcr_qp_offset_present_flag")
        if pps.pps_joint_cbcr_qp_offset_present_flag:
            io.se(pps, "pps_joint_cbcr_qp_offset_value")
        io.flag(pps, "pps_slice_chroma_qp_offsets_present_flag")
        io.flag(pps, "pps_cu_chroma_qp_offset_list_enabled_flag")
        if pps.pps_cu_chroma_qp_offset_list_enabled_flag:
            io.ue(pps, "pps_chroma_qp_offset_list_len_minus1")
            for i in range(pps.pps_chroma_qp_offset_list_len_minus1 + 1):
                io.se_i(pps, "pps_cb_qp_offset_list", i)
                io.se_i(pps, "pps_cr_qp_offset_list", i)
                if pps.pps_joint_cbcr_qp_offset_present_flag:
                    io.se_i(pps, "pps_joint_cbcr_qp_offset_list", i)

    io.flag(pps, "pps_deblocking_filter_control_present_flag")
    if pps.pps_deblocking_filter_control_present_flag:
        io.flag(pps, "pps_deblocking_filter_override_enabled_flag")
        io.flag(pps, "pps_deblocking_filter_disabled_flag")
        if not pps.pps_no_pic_partition_flag and pps.pps_deblocking_filter_override_enabled_flag:
            io.flag(pps, "pps_dbf_info_in_ph_flag")
        if not pps.pps_deblocking_filter_disabled_flag:
            io.se(pps, "pps_luma_beta_offset_div2")
            io.se(pps, "pps_luma_tc_offset_div2")
            if pps.pps_chroma_tool_offsets_present_flag:
                io.se(pps, "pps_cb_beta_offset_div2")
                io.se(pps, "pps_cb_tc_offset_div2")
                io.se(pps, "pps_cr_beta_offset_div2")
                io.se(pps, "pps_cr_tc_offset_div2")

    if not pps.pps_no_pic_partition_flag:
        io.flag(pps, "pps_rpl_info_in_ph_flag")
        io.flag(pps, "pps_sao_info_in_ph_flag")
        io.flag(pps, "pps_alf_info_in_ph_flag")
        if (pps.pps_weighted_pred_flag or pps.pps_weighted_bipred_flag) and pps.pps_rpl_info_in_ph_flag:
            io.flag(pps, "pps_wp_info_in_ph_flag")
        io.flag(pps, "pps_qp_delta_info_in_ph_flag")

    io.flag(pps, "pps_picture_header_extension_present_flag")
    io.flag(pps, "pps_slice_header_extension_present_flag")
    io.flag(pps, "pps_extension_flag")

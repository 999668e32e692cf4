"""profile_tier_level, general_constraints_info, DPB and HRD parameter syntax.

ITU-T H.266 sections 7.3.3.1/7.3.3.2 (PTL/GCI), 7.3.4 (DPB parameters),
7.3.5 (HRD). Reference parity: /root/reference/libovvc/nvcl_ptl.c,
nvcl_dpb.c, and the HRD helpers in nvcl_nal_sps.c:279-343.
"""

from __future__ import annotations

from openvvc_tpu.hls.syntax import SyntaxStruct


class PTL(SyntaxStruct):
    pass


class DPBParams(SyntaxStruct):
    pass


class HRDTiming(SyntaxStruct):
    pass


def general_constraints_info_syntax(io, gci):
    io.flag(gci, "gci_present_flag")
    if gci.gci_present_flag:
        # 69 fixed constraint bits (H.266 7.3.3.2: 63 flags plus the 4-bit
        # bitdepth and 2-bit chroma-format constraint idcs). We do not act on
        # any of them; they are carried opaquely as a packed integer.
        if io.is_reader:
            gci.gci_bits = io.br.u(69)
        else:
            io.bw.u(int(gci.gci_bits), 69)
        io.u(gci, "gci_num_reserved_bits", 8)
        if io.is_reader:
            for _ in range(gci.gci_num_reserved_bits):
                io.br.u(1)
        else:
            io.bw.u(0, int(gci.gci_num_reserved_bits))
    io.align()


def profile_tier_level_syntax(io, ptl: PTL, profile_tier_present: bool, max_sublayers_minus1: int):
    if profile_tier_present:
        io.u(ptl, "general_profile_idc", 7)
        io.flag(ptl, "general_tier_flag")
    io.u(ptl, "general_level_idc", 8)
    io.flag(ptl, "ptl_frame_only_constraint_flag")
    io.flag(ptl, "ptl_multilayer_enabled_flag")
    if profile_tier_present:
        general_constraints_info_syntax(io, ptl)
    for i in range(max_sublayers_minus1 - 1, -1, -1):
        io.flag_i(ptl, "ptl_sublayer_level_present_flag", i)
    io.align()
    for i in range(max_sublayers_minus1 - 1, -1, -1):
        if ptl.ptl_sublayer_level_present_flag[i]:
            io.u_i(ptl, "sublayer_level_idc", i, 8)
    if profile_tier_present:
        io.u(ptl, "ptl_num_sub_profiles", 8)
        for i in range(ptl.ptl_num_sub_profiles):
            io.u_i(ptl, "general_sub_profile_idc", i, 32)


def dpb_parameters_syntax(io, dpb: DPBParams, max_sublayers_minus1: int, sublayer_info_flag: int):
    start = 0 if sublayer_info_flag else max_sublayers_minus1
    for i in range(start, max_sublayers_minus1 + 1):
        io.ue_i(dpb, "dpb_max_dec_pic_buffering_minus1", i)
        io.ue_i(dpb, "dpb_max_num_reorder_pics", i)
        io.ue_i(dpb, "dpb_max_latency_increase_plus1", i)


def general_timing_hrd_parameters_syntax(io, hrd: HRDTiming):
    io.u(hrd, "num_units_in_tick", 32)
    io.u(hrd, "time_scale", 32)
    io.flag(hrd, "general_nal_hrd_params_present_flag")
    io.flag(hrd, "general_vcl_hrd_params_present_flag")
    if hrd.general_nal_hrd_params_present_flag or hrd.general_vcl_hrd_params_present_flag:
        io.flag(hrd, "general_same_pic_timing_in_all_ols_flag")
        io.flag(hrd, "general_du_hrd_params_present_flag")
        if hrd.general_du_hrd_params_present_flag:
            io.u(hrd, "tick_divisor_minus2", 8)
        io.u(hrd, "bit_rate_scale", 4)
        io.u(hrd, "cpb_size_scale", 4)
        if hrd.general_du_hrd_params_present_flag:
            io.u(hrd, "cpb_size_du_scale", 4)
        io.ue(hrd, "hrd_cpb_cnt_minus1")


def _sublayer_hrd_parameters_syntax(io, hrd: HRDTiming, scratch):
    for j in range(hrd.hrd_cpb_cnt_minus1 + 1):
        io.ue_i(scratch, "bit_rate_value_minus1", j)
        io.ue_i(scratch, "cpb_size_value_minus1", j)
        if hrd.general_du_hrd_params_present_flag:
            io.ue_i(scratch, "cpb_size_du_value_minus1", j)
            io.ue_i(scratch, "bit_rate_du_value_minus1", j)
        io.flag_i(scratch, "cbr_flag", j)


def ols_timing_hrd_parameters_syntax(io, hrd: HRDTiming, first_sublayer: int, max_sublayers_minus1: int):
    for i in range(first_sublayer, max_sublayers_minus1 + 1):
        lay = SyntaxStruct()
        io.flag(lay, "fixed_pic_rate_general_flag")
        fixed_within_cvs = lay.fixed_pic_rate_general_flag
        if not lay.fixed_pic_rate_general_flag:
            io.flag(lay, "fixed_pic_rate_within_cvs_flag")
            fixed_within_cvs = lay.fixed_pic_rate_within_cvs_flag
        if fixed_within_cvs:
            io.ue(lay, "elemental_duration_in_tc_minus1")
        elif (
            hrd.general_nal_hrd_params_present_flag or hrd.general_vcl_hrd_params_present_flag
        ) and hrd.hrd_cpb_cnt_minus1 == 0:
            io.flag(lay, "low_delay_hrd_flag")
        if hrd.general_nal_hrd_params_present_flag:
            _sublayer_hrd_parameters_syntax(io, hrd, lay)
        if hrd.general_vcl_hrd_params_present_flag:
            _sublayer_hrd_parameters_syntax(io, hrd, lay)

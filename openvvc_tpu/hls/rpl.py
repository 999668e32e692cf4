"""Reference picture list syntax (ref_pic_list_struct, header RPLs, LT info).

ITU-T H.266 sections 7.3.10 and 7.3.2.8/7.4.3.8. Reference parity:
/root/reference/libovvc/nvcl_rpl.c (which specializes the struct parse by SPS
flags; we implement the unified spec syntax directly).
"""

from __future__ import annotations

import copy

from openvvc_tpu.hls.syntax import ListField, SyntaxStruct, ceil_log2


class RPL(SyntaxStruct):
    """One ref_pic_list_struct: num_ref_entries + per-entry fields."""


class HeaderRPL(SyntaxStruct):
    """RPL as resolved in a PH/SH: rpl_sps_flag/rpl_idx or inline data + LT info."""


def ref_pic_list_struct_syntax(io, rpl: RPL, sps, list_idx: int, rpls_idx: int):
    """ref_pic_list_struct(listIdx, rplsIdx) per H.266 7.3.10."""
    num_lists = sps.sps_num_ref_pic_lists0 if list_idx == 0 else sps.sps_num_ref_pic_lists1
    io.ue(rpl, "num_ref_entries")
    if sps.sps_long_term_ref_pics_flag and rpls_idx < num_lists and rpl.num_ref_entries > 0:
        io.flag(rpl, "ltrp_in_header_flag")
    else:
        # When the struct is parsed inline from a PH/SH (rplsIdx == num_lists),
        # LT POC info always follows in the header (spec 7.4.11 inference).
        rpl.ltrp_in_header_flag = 1 if sps.sps_long_term_ref_pics_flag else 0
    weighted = sps.sps_weighted_pred_flag or sps.sps_weighted_bipred_flag
    for i in range(rpl.num_ref_entries):
        if sps.sps_inter_layer_prediction_enabled_flag:
            io.flag_i(rpl, "inter_layer_ref_pic_flag", i)
        if not rpl.inter_layer_ref_pic_flag[i]:
            if sps.sps_long_term_ref_pics_flag:
                io.flag_i(rpl, "st_ref_pic_flag", i)
            else:
                if not isinstance(rpl.st_ref_pic_flag, ListField):
                    rpl.st_ref_pic_flag = ListField()
                rpl.st_ref_pic_flag[i] = 1  # inferred (spec 7.4.11)
            if rpl.st_ref_pic_flag[i]:
                abs_delta = io.ue_i(rpl, "abs_delta_poc_st", i)
                # sign present iff abs > 0, non-weighted pred, or entry 0
                # (nvcl_rpl.c ref_pic_list_strp :179)
                if abs_delta > 0 or not weighted or i == 0:
                    io.flag_i(rpl, "strp_entry_sign_flag", i)
            elif not rpl.ltrp_in_header_flag:
                nb = sps.sps_log2_max_pic_order_cnt_lsb_minus4 + 4
                io.u_i(rpl, "rpls_poc_lsb_lt", i, nb)
        else:
            io.ue_i(rpl, "ilrp_idx", i)


def rpl_delta_pocs(rpl: RPL, sps) -> list[int]:
    """Derived DeltaPocValSt per entry (0 for LT/ILRP entries)."""
    weighted = sps.sps_weighted_pred_flag or sps.sps_weighted_bipred_flag
    out = []
    for i in range(rpl.num_ref_entries):
        if rpl.inter_layer_ref_pic_flag[i] or not rpl.st_ref_pic_flag[i]:
            out.append(0)
            continue
        abs_delta = rpl.abs_delta_poc_st[i]
        abs_st = abs_delta if (weighted and i != 0) else abs_delta + 1
        sign = rpl.strp_entry_sign_flag[i] if (abs_delta > 0 or not (weighted and i != 0)) else 0
        out.append(-abs_st if sign else abs_st)
    return out


def _long_term_info_syntax(io, hrpl: HeaderRPL, rpl: RPL, sps):
    """poc_lsb_lt / delta_poc_msb_cycle for LT entries of a header-referenced RPL."""
    nb = sps.sps_log2_max_pic_order_cnt_lsb_minus4 + 4
    for j in range(rpl.num_ref_entries):
        if rpl.inter_layer_ref_pic_flag[j] or rpl.st_ref_pic_flag[j]:
            continue
        if rpl.ltrp_in_header_flag:
            io.u_i(hrpl, "poc_lsb_lt", j, nb)
        io.flag_i(hrpl, "delta_poc_msb_cycle_present_flag", j)
        if hrpl.delta_poc_msb_cycle_present_flag[j]:
            io.ue_i(hrpl, "delta_poc_msb_cycle_lt", j)


def _has_lt(rpl: RPL) -> bool:
    return any(
        not rpl.st_ref_pic_flag[j] and not rpl.inter_layer_ref_pic_flag[j]
        for j in range(rpl.num_ref_entries)
    )


def header_ref_pic_lists_syntax(io, hrpl0: HeaderRPL, hrpl1: HeaderRPL, sps, pps):
    """ref_pic_lists() as appearing in PH or SH (H.266 7.3.9).

    After this call, hrplX.rpl holds the resolved RPL (copied from the SPS list
    or parsed inline).
    """
    for li, hrpl in ((0, hrpl0), (1, hrpl1)):
        num_lists = sps.sps_num_ref_pic_lists0 if li == 0 else sps.sps_num_ref_pic_lists1
        sps_lists = sps.rpl_s0 if li == 0 else sps.rpl_s1
        if li == 1 and sps.sps_rpl1_same_as_rpl0_flag:
            num_lists = sps.sps_num_ref_pic_lists0
            sps_lists = sps.rpl_s0
        if num_lists > 0 and (li == 0 or pps.pps_rpl1_idx_present_flag):
            io.flag(hrpl, "rpl_sps_flag")
        elif li == 1:
            # inferred: equal to rpl_sps_flag of list 0 when both lists exist
            hrpl.rpl_sps_flag = hrpl0.rpl_sps_flag if num_lists > 0 else 0
        if hrpl.rpl_sps_flag:
            if num_lists > 1 and (li == 0 or pps.pps_rpl1_idx_present_flag):
                io.u(hrpl, "rpl_idx", ceil_log2(num_lists))
            elif li == 1:
                hrpl.rpl_idx = hrpl0.rpl_idx if num_lists > 1 else 0
            hrpl.rpl = copy.deepcopy(sps_lists[hrpl.rpl_idx]) if io.is_reader else sps_lists[hrpl.rpl_idx]
        else:
            if io.is_reader:
                hrpl.rpl = RPL()
            ref_pic_list_struct_syntax(io, hrpl.rpl, sps, li, num_lists)
        if sps.sps_long_term_ref_pics_flag and _has_lt(hrpl.rpl):
            _long_term_info_syntax(io, hrpl, hrpl.rpl, sps)

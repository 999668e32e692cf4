"""APS (adaptation parameter set) syntax: ALF, LMCS, scaling-list data.

ITU-T H.266 sections 7.3.2.19-7.3.2.22. Reference parity:
/root/reference/libovvc/nvcl_nal_aps.c:66-218 (the reference skips scaling-list
APS; we parse it fully).
"""

from __future__ import annotations

from openvvc_tpu.hls.syntax import SyntaxStruct, ceil_log2

APS_ALF = 0
APS_LMCS = 1
APS_SCALING_LIST = 2

MAX_NUM_ALF_CLASSES = 25
LMCS_NUM_BINS = 16  # PIC_CODE_CW_BINS


class APS(SyntaxStruct):
    pass


def _diag_scan(size_log2: int):
    """Up-right diagonal scan order (x, y) pairs for a 2^n x 2^n block."""
    n = 1 << size_log2
    order = []
    for d in range(2 * n - 1):
        for y in range(min(d, n - 1), -1, -1):
            x = d - y
            if x < n:
                order.append((x, y))
    return order


_DIAG_8x8 = _diag_scan(3)


def alf_data_syntax(io, alf, chroma_present: bool):
    io.flag(alf, "alf_luma_filter_signal_flag")
    if chroma_present:
        io.flag(alf, "alf_chroma_filter_signal_flag")
        io.flag(alf, "alf_cc_cb_filter_signal_flag")
        io.flag(alf, "alf_cc_cr_filter_signal_flag")

    if alf.alf_luma_filter_signal_flag:
        io.flag(alf, "alf_luma_clip_flag")
        io.ue(alf, "alf_luma_num_filters_signalled_minus1")
        if alf.alf_luma_num_filters_signalled_minus1 > 0:
            nb = ceil_log2(alf.alf_luma_num_filters_signalled_minus1 + 1)
            for k in range(MAX_NUM_ALF_CLASSES):
                io.u_i(alf, "alf_luma_coeff_delta_idx", k, nb)
        for sf in range(alf.alf_luma_num_filters_signalled_minus1 + 1):
            coeffs = alf._list_nested("alf_luma_coeff", sf)
            for j in range(12):
                if io.is_reader:
                    mag = io.br.ue()
                    if mag and io.br.u(1):
                        mag = -mag
                    coeffs[j] = mag
                else:
                    v = int(coeffs[j])
                    io.bw.ue(abs(v))
                    if v:
                        io.bw.u(1 if v < 0 else 0, 1)
        if alf.alf_luma_clip_flag:
            for sf in range(alf.alf_luma_num_filters_signalled_minus1 + 1):
                clips = alf._list_nested("alf_luma_clip_idx", sf)
                for j in range(12):
                    if io.is_reader:
                        clips[j] = io.br.u(2)
                    else:
                        io.bw.u(int(clips[j]), 2)

    if alf.alf_chroma_filter_signal_flag:
        io.flag(alf, "alf_chroma_clip_flag")
        io.ue(alf, "alf_chroma_num_alt_filters_minus1")
        for alt in range(alf.alf_chroma_num_alt_filters_minus1 + 1):
            coeffs = alf._list_nested("alf_chroma_coeff", alt)
            for j in range(6):
                if io.is_reader:
                    mag = io.br.ue()
                    if mag and io.br.u(1):
                        mag = -mag
                    coeffs[j] = mag
                else:
                    v = int(coeffs[j])
                    io.bw.ue(abs(v))
                    if v:
                        io.bw.u(1 if v < 0 else 0, 1)
            if alf.alf_chroma_clip_flag:
                clips = alf._list_nested("alf_chroma_clip_idx", alt)
                for j in range(6):
                    if io.is_reader:
                        clips[j] = io.br.u(2)
                    else:
                        io.bw.u(int(clips[j]), 2)

    for comp, flag_name, count_name, coeff_name in (
        (0, "alf_cc_cb_filter_signal_flag", "alf_cc_cb_filters_signalled_minus1", "alf_cc_cb_coeff"),
        (1, "alf_cc_cr_filter_signal_flag", "alf_cc_cr_filters_signalled_minus1", "alf_cc_cr_coeff"),
    ):
        if getattr(alf, flag_name):
            io.ue(alf, count_name)
            for k in range(getattr(alf, count_name) + 1):
                coeffs = alf._list_nested(coeff_name, k)
                for j in range(7):
                    # coeff coded as 3-bit magnitude code: 0 or +-2^(code-1)
                    if io.is_reader:
                        code = io.br.u(3)
                        if code:
                            val = 1 << (code - 1)
                            if io.br.u(1):
                                val = -val
                            coeffs[j] = val
                        else:
                            coeffs[j] = 0
                    else:
                        v = int(coeffs[j])
                        if v == 0:
                            io.bw.u(0, 3)
                        else:
                            io.bw.u(abs(v).bit_length(), 3)
                            io.bw.u(1 if v < 0 else 0, 1)


def lmcs_data_syntax(io, lmcs, chroma_present: bool):
    io.ue(lmcs, "lmcs_min_bin_idx")
    io.ue(lmcs, "lmcs_delta_max_bin_idx")
    io.ue(lmcs, "lmcs_delta_cw_prec_minus1")
    for i in range(lmcs.lmcs_min_bin_idx, LMCS_NUM_BINS - lmcs.lmcs_delta_max_bin_idx):
        io.u_i(lmcs, "lmcs_delta_abs_cw", i, lmcs.lmcs_delta_cw_prec_minus1 + 1)
        if lmcs.lmcs_delta_abs_cw[i]:
            io.flag_i(lmcs, "lmcs_delta_sign_cw_flag", i)
    if chroma_present:
        io.u(lmcs, "lmcs_delta_abs_crs", 3)
        if lmcs.lmcs_delta_abs_crs:
            io.flag(lmcs, "lmcs_delta_sign_crs_flag")


def scaling_list_data_syntax(io, sl, chroma_present: bool):
    """scaling_list_data() — H.266 7.3.2.22."""
    for sl_id in range(28):
        matrix_size = 2 if sl_id < 2 else (4 if sl_id < 8 else 8)
        if not (chroma_present or sl_id % 3 == 2 or sl_id == 27):
            continue
        io.flag_i(sl, "scaling_list_copy_mode_flag", sl_id)
        if not sl.scaling_list_copy_mode_flag[sl_id]:
            io.flag_i(sl, "scaling_list_pred_mode_flag", sl_id)
        if (
            sl.scaling_list_copy_mode_flag[sl_id] or sl.scaling_list_pred_mode_flag[sl_id]
        ) and sl_id not in (0, 2, 8):
            io.ue_i(sl, "scaling_list_pred_id_delta", sl_id)
        if not sl.scaling_list_copy_mode_flag[sl_id]:
            if sl_id > 13:
                io.se_i(sl, "scaling_list_dc_coef", sl_id - 14)
            coefs = sl._list_nested("scaling_list_delta_coef", sl_id)
            for i in range(matrix_size * matrix_size):
                x, y = _DIAG_8x8[i] if matrix_size == 8 else _diag_scan(matrix_size.bit_length() - 1)[i]
                if sl_id > 25 and x >= 4 and y >= 4:
                    continue
                if io.is_reader:
                    coefs[i] = io.br.se()
                else:
                    io.bw.se(int(coefs[i]))


def aps_syntax(io, aps: APS):
    io.u(aps, "aps_params_type", 3)
    io.u(aps, "aps_adaptation_parameter_set_id", 5)
    io.flag(aps, "aps_chroma_present_flag")
    if aps.aps_params_type == APS_ALF:
        alf = aps.__dict__.setdefault("alf_data", SyntaxStruct())
        alf_data_syntax(io, alf, aps.aps_chroma_present_flag)
    elif aps.aps_params_type == APS_LMCS:
        lmcs = aps.__dict__.setdefault("lmcs_data", SyntaxStruct())
        lmcs_data_syntax(io, lmcs, aps.aps_chroma_present_flag)
    elif aps.aps_params_type == APS_SCALING_LIST:
        sl = aps.__dict__.setdefault("scaling_list_data", SyntaxStruct())
        scaling_list_data_syntax(io, sl, aps.aps_chroma_present_flag)
    io.flag(aps, "aps_extension_flag")

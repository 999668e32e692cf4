import pytest

from openvvc_tpu.hls.aps import APS, aps_syntax
from openvvc_tpu.hls.nal import NalType, NalUnit
from openvvc_tpu.hls.params import NvclContext, derive_chroma_qp_table
from openvvc_tpu.hls.ph import PH, picture_header_syntax
from openvvc_tpu.hls.pps import PPS, pps_syntax
from openvvc_tpu.hls.sh import SH, slice_header_syntax
from openvvc_tpu.hls.sps import SPS, sps_syntax
from openvvc_tpu.hls.syntax import ListField, SyntaxReader, SyntaxWriter
from openvvc_tpu.utils.bitstream import BitReader, BitWriter


def write_rbsp(syntax_fn, obj, *args):
    io = SyntaxWriter(BitWriter())
    syntax_fn(io, obj, *args)
    io.bw.rbsp_trailing_bits()
    return io.bw.get_bytes()


def read_rbsp(syntax_fn, obj, rbsp, *args):
    io = SyntaxReader(BitReader(rbsp))
    syntax_fn(io, obj, *args)
    return obj


def make_minimal_sps(width=128, height=64, ctu_log2=6, chroma=1, bitdepth=8):
    sps = SPS()
    sps.sps_seq_parameter_set_id = 0
    sps.sps_chroma_format_idc = chroma
    sps.sps_log2_ctu_size_minus5 = ctu_log2 - 5
    sps.sps_pic_width_max_in_luma_samples = width
    sps.sps_pic_height_max_in_luma_samples = height
    sps.sps_bitdepth_minus8 = bitdepth - 8
    sps.sps_log2_max_pic_order_cnt_lsb_minus4 = 4
    sps.sps_log2_min_luma_coding_block_size_minus2 = 0
    sps.sps_log2_diff_min_qt_min_cb_intra_slice_luma = 0
    sps.sps_max_mtt_hierarchy_depth_intra_slice_luma = 0
    sps.sps_log2_diff_min_qt_min_cb_inter_slice = 0
    sps.sps_max_mtt_hierarchy_depth_inter_slice = 0
    if ctu_log2 > 5:
        sps.sps_max_luma_transform_size_64_flag = 0
    if chroma:
        sps.sps_same_qp_table_for_chroma_flag = 1
        sps.sps_qp_table_start_minus26 = ListField({0: 0})
        sps.sps_num_points_in_qp_table_minus1 = ListField({0: 0})
        sps._list_nested("sps_delta_qp_in_val_minus1", 0)[0] = 26
        sps._list_nested("sps_delta_qp_diff_val", 0)[0] = 1  # 26^27: identity table
    return sps


def make_minimal_pps(sps, no_partition=True):
    pps = PPS()
    pps.pps_pic_parameter_set_id = 0
    pps.pps_seq_parameter_set_id = sps.sps_seq_parameter_set_id
    pps.pps_pic_width_in_luma_samples = sps.sps_pic_width_max_in_luma_samples
    pps.pps_pic_height_in_luma_samples = sps.sps_pic_height_max_in_luma_samples
    pps.pps_no_pic_partition_flag = 1 if no_partition else 0
    if not no_partition:
        pps.pps_log2_ctu_size_minus5 = sps.sps_log2_ctu_size_minus5
    return pps


def fields_equal(a, b, skip=()):
    fa, fb = a.fields(), b.fields()
    keys = set(fa) | set(fb)
    diffs = []
    for k in keys:
        if k.startswith("_") or k in skip:
            continue
        va, vb = fa.get(k, 0), fb.get(k, 0)
        if isinstance(va, (list, dict)) or isinstance(vb, (list, dict)):
            continue
        if type(va).__module__ != "builtins" or type(vb).__module__ != "builtins":
            continue
        if va != vb:
            diffs.append((k, va, vb))
    assert not diffs, f"field mismatches: {diffs}"


def test_sps_roundtrip_minimal():
    sps = make_minimal_sps()
    rbsp = write_rbsp(sps_syntax, sps)
    back = read_rbsp(sps_syntax, SPS(), rbsp)
    fields_equal(sps, back)
    assert back.ctb_size == 64
    assert back.nb_ctu_w == 2 and back.nb_ctu_h == 1


def test_sps_roundtrip_tools():
    sps = make_minimal_sps(width=1920, height=1080, chroma=1, bitdepth=10)
    sps.sps_sao_enabled_flag = 1
    sps.sps_alf_enabled_flag = 1
    sps.sps_ccalf_enabled_flag = 1
    sps.sps_lmcs_enabled_flag = 1
    sps.sps_mts_enabled_flag = 1
    sps.sps_explicit_mts_intra_enabled_flag = 1
    sps.sps_lfnst_enabled_flag = 1
    sps.sps_joint_cbcr_enabled_flag = 1
    sps.sps_transform_skip_enabled_flag = 1
    sps.sps_log2_transform_skip_max_size_minus2 = 2
    sps.sps_bdpcm_enabled_flag = 1
    sps.sps_min_qp_prime_ts = 4
    sps.sps_mip_enabled_flag = 1
    sps.sps_mrl_enabled_flag = 1
    sps.sps_isp_enabled_flag = 1
    sps.sps_cclm_enabled_flag = 1
    sps.sps_qtbtt_dual_tree_intra_flag = 1
    sps.sps_log2_diff_min_qt_min_cb_intra_slice_chroma = 1
    sps.sps_max_mtt_hierarchy_depth_intra_slice_chroma = 2
    sps.sps_log2_diff_max_bt_min_qt_intra_slice_chroma = 1
    sps.sps_log2_diff_max_tt_min_qt_intra_slice_chroma = 1
    sps.sps_max_mtt_hierarchy_depth_intra_slice_luma = 2
    sps.sps_log2_diff_max_bt_min_qt_intra_slice_luma = 2
    sps.sps_log2_diff_max_tt_min_qt_intra_slice_luma = 2
    sps.sps_temporal_mvp_enabled_flag = 1
    sps.sps_sbtmvp_enabled_flag = 1
    sps.sps_amvr_enabled_flag = 1
    sps.sps_bdof_enabled_flag = 1
    sps.sps_dmvr_enabled_flag = 1
    sps.sps_mmvd_enabled_flag = 1
    sps.sps_affine_enabled_flag = 1
    sps.sps_6param_affine_enabled_flag = 1
    sps.sps_affine_amvr_enabled_flag = 1
    sps.sps_affine_prof_enabled_flag = 1
    sps.sps_bcw_enabled_flag = 1
    sps.sps_ciip_enabled_flag = 1
    sps.sps_gpm_enabled_flag = 1
    sps.sps_six_minus_max_num_merge_cand = 0
    sps.sps_max_num_merge_cand_minus_max_num_gpm_cand = 1
    sps.sps_sbt_enabled_flag = 1
    sps.sps_dep_quant_enabled_flag = 1
    sps.sps_ibc_enabled_flag = 1
    sps.sps_six_minus_max_num_ibc_merge_cand = 1
    rbsp = write_rbsp(sps_syntax, sps)
    back = read_rbsp(sps_syntax, SPS(), rbsp)
    fields_equal(sps, back)


def test_pps_roundtrip():
    sps = make_minimal_sps()
    pps = make_minimal_pps(sps)
    pps.pps_init_qp_minus26 = 5
    pps.pps_chroma_tool_offsets_present_flag = 1
    pps.pps_cb_qp_offset = 1
    pps.pps_cr_qp_offset = -1
    rbsp = write_rbsp(pps_syntax, pps)
    back = read_rbsp(pps_syntax, PPS(), rbsp)
    fields_equal(back, pps)


def test_pps_tiles_roundtrip():
    sps = make_minimal_sps(width=256, height=128)
    pps = make_minimal_pps(sps, no_partition=False)
    pps.pps_num_exp_tile_columns_minus1 = 1
    pps.pps_num_exp_tile_rows_minus1 = 0
    pps.pps_tile_column_width_minus1 = ListField({0: 0, 1: 0})
    pps.pps_tile_row_height_minus1 = ListField({0: 1})
    pps.pps_loop_filter_across_tiles_enabled_flag = 1
    pps.pps_rect_slice_flag = 1
    pps.pps_single_slice_per_subpic_flag = 1
    rbsp = write_rbsp(pps_syntax, pps)
    back = read_rbsp(pps_syntax, PPS(), rbsp)
    fields_equal(back, pps)
    cols, rows = back.tile_grid()
    assert cols == [1, 1, 1, 1] and rows == [2]


def test_ph_sh_roundtrip_intra():
    sps = make_minimal_sps()
    pps = make_minimal_pps(sps)
    ph = PH()
    ph.ph_gdr_or_irap_pic_flag = 1
    ph.ph_intra_slice_allowed_flag = 1
    ph.ph_inter_slice_allowed_flag = 0
    ph.ph_pic_order_cnt_lsb = 0
    ph.ph_pic_output_flag = 1  # inferred on read when not signaled
    rbsp = write_rbsp(picture_header_syntax, ph, sps, pps)
    ph2 = read_rbsp(picture_header_syntax, PH(), rbsp, sps, pps)
    fields_equal(ph2, ph)

    sh = SH()
    sh.sh_qp_delta = 4
    w = SyntaxWriter(BitWriter())
    slice_header_syntax(w, sh, NalType.IDR_W_RADL, sps, pps, ph)
    w.bw.u(0xAB, 8)  # fake slice data byte
    w.bw.rbsp_trailing_bits()
    data = w.bw.get_bytes()
    r = SyntaxReader(BitReader(data))
    sh2 = SH()
    slice_header_syntax(r, sh2, NalType.IDR_W_RADL, sps, pps, ph)
    # sh_slice_type / override flag are inferred on read for I slices
    fields_equal(
        sh2,
        sh,
        skip=(
            "sh_picture_header_in_slice_header_flag",
            "sh_slice_type",
            "sh_num_ref_idx_active_override_flag",
        ),
    )
    assert r.br.byte_aligned()
    assert r.br.u(8) == 0xAB


def test_aps_alf_roundtrip():
    aps = APS()
    aps.aps_params_type = 0
    aps.aps_adaptation_parameter_set_id = 3
    aps.aps_chroma_present_flag = 1
    alf = aps.__dict__.setdefault("alf_data", __import__("openvvc_tpu.hls.syntax", fromlist=["SyntaxStruct"]).SyntaxStruct())
    alf.alf_luma_filter_signal_flag = 1
    alf.alf_luma_clip_flag = 0
    alf.alf_luma_num_filters_signalled_minus1 = 1
    alf.alf_luma_coeff_delta_idx = ListField({k: k % 2 for k in range(25)})
    for sf in range(2):
        co = alf._list_nested("alf_luma_coeff", sf)
        for j in range(12):
            co[j] = (j - 6) if sf else 0
    rbsp = write_rbsp(aps_syntax, aps)
    back = read_rbsp(aps_syntax, APS(), rbsp)
    fields_equal(back, aps)
    assert back.alf_data.alf_luma_num_filters_signalled_minus1 == 1
    assert dict(back.alf_data.alf_luma_coeff[1]) == {j: j - 6 for j in range(12)}


def test_chroma_qp_table_identity():
    # single point spanning the whole range with out == in gives identity
    tab = derive_chroma_qp_table(26, [26], [1], 1, 0)
    # values below start ramp down by 1; identity in the signaled span
    assert tab[26] == 26
    assert tab[0] == 0
    assert tab[52] == 52
    assert tab[63] == 63


def test_nvcl_context_end_to_end():
    sps = make_minimal_sps()
    pps = make_minimal_pps(sps)
    ctx = NvclContext()
    ctx.decode_nalu(NalUnit(NalType.SPS, write_rbsp(sps_syntax, sps)))
    ctx.decode_nalu(NalUnit(NalType.PPS, write_rbsp(pps_syntax, pps)))
    assert 0 in ctx.sps_list and 0 in ctx.pps_list

    ph = PH()
    ph.ph_gdr_or_irap_pic_flag = 1
    ph.ph_intra_slice_allowed_flag = 1
    ph.ph_pic_order_cnt_lsb = 0
    ctx.decode_nalu(NalUnit(NalType.PH, write_rbsp(picture_header_syntax, ph, sps, pps)))
    assert ctx.ph is not None

    sh = SH()
    w = SyntaxWriter(BitWriter())
    slice_header_syntax(w, sh, NalType.IDR_W_RADL, sps, pps, ph)
    w.bw.u(0xCD, 8)
    w.bw.rbsp_trailing_bits()
    nal = NalUnit(NalType.IDR_W_RADL, w.bw.get_bytes())
    params = ctx.parse_slice(nal)
    assert params.slice_type == 2  # I
    assert params.tile_info.nb_tiles == 1
    assert len(params.entries) == 1
    assert params.entries[0].nb_ctu_w == 2
    assert params.entries[0].data[0] == 0xCD
    assert params.part_info["intra_luma"].log2_ctu_s == 6
    assert params.slice_qp == 26

"""SEI message syntax: payload framing, film-grain characteristics (type 19),
decoded-picture-hash (type 132), T.35 user data (carried opaquely).

ITU-T H.274 section 8 / H.266 annex D. Reference parity:
/root/reference/libovvc/nvcl_nal_sei.c:131-251.
"""

from __future__ import annotations

from openvvc_tpu.hls.syntax import SyntaxStruct

SEI_BUFFERING_PERIOD = 0
SEI_PICTURE_TIMING = 1
SEI_USER_DATA_T35 = 4
SEI_FILM_GRAIN = 19
SEI_DECODED_PICTURE_HASH = 132


class FilmGrainSEI(SyntaxStruct):
    pass


class SEIMessage(SyntaxStruct):
    pass


def film_grain_syntax(io, fg: FilmGrainSEI):
    io.flag(fg, "fg_characteristics_cancel_flag")
    if fg.fg_characteristics_cancel_flag:
        return
    io.u(fg, "fg_model_id", 2)
    io.flag(fg, "fg_separate_colour_description_present_flag")
    if fg.fg_separate_colour_description_present_flag:
        io.u(fg, "fg_bit_depth_luma_minus8", 3)
        io.u(fg, "fg_bit_depth_chroma_minus8", 3)
        io.flag(fg, "fg_full_range_flag")
        io.u(fg, "fg_colour_primaries", 8)
        io.u(fg, "fg_transfer_characteristics", 8)
        io.u(fg, "fg_matrix_coeffs", 8)
    io.u(fg, "fg_blending_mode_id", 2)
    io.u(fg, "fg_log2_scale_factor", 4)
    for c in range(3):
        io.flag_i(fg, "fg_comp_model_present_flag", c)
    for c in range(3):
        if not fg.fg_comp_model_present_flag[c]:
            continue
        io.u_i(fg, "fg_num_intensity_intervals_minus1", c, 8)
        io.u_i(fg, "fg_num_model_values_minus1", c, 3)
        lowers = fg._list_nested("fg_intensity_interval_lower_bound", c)
        uppers = fg._list_nested("fg_intensity_interval_upper_bound", c)
        values = fg._list_nested("fg_comp_model_value", c)
        for i in range(fg.fg_num_intensity_intervals_minus1[c] + 1):
            if io.is_reader:
                lowers[i] = io.br.u(8)
                uppers[i] = io.br.u(8)
            else:
                io.bw.u(int(lowers[i]), 8)
                io.bw.u(int(uppers[i]), 8)
            vals_i = values.nested(i)
            for j in range(fg.fg_num_model_values_minus1[c] + 1):
                if io.is_reader:
                    vals_i[j] = io.br.se()
                else:
                    io.bw.se(int(vals_i[j]))
    io.flag(fg, "fg_characteristics_persistence_flag")


def parse_sei_rbsp(rbsp: bytes) -> list[SEIMessage]:
    """Parse all SEI messages in one SEI NALU RBSP."""
    from openvvc_tpu.hls.syntax import SyntaxReader
    from openvvc_tpu.utils.bitstream import BitReader

    br = BitReader(rbsp)
    io = SyntaxReader(br)
    out: list[SEIMessage] = []
    while br.more_rbsp_data():
        msg = SEIMessage()
        ptype = 0
        while True:
            v = br.u(8)
            ptype += v
            if v != 0xFF:
                break
        psize = 0
        while True:
            v = br.u(8)
            psize += v
            if v != 0xFF:
                break
        msg.payload_type = ptype
        msg.payload_size = psize
        start_byte = br.pos >> 3
        if ptype == SEI_FILM_GRAIN:
            msg.film_grain = FilmGrainSEI()
            film_grain_syntax(io, msg.film_grain)
        elif ptype == SEI_DECODED_PICTURE_HASH:
            msg.hash_type = br.u(8)
            if msg.hash_type == 0:  # MD5
                msg.md5 = bytes(br.u(8) for _ in range(psize - 1))
        else:
            msg.payload = rbsp[start_byte : start_byte + psize]
        # skip to declared payload end (payload extensions / alignment)
        br.pos = (start_byte + psize) * 8
        out.append(msg)
    return out


def write_sei_message(bw, payload_type: int, payload: bytes) -> None:
    """Append one SEI message (framing + raw payload bytes) to a BitWriter."""
    t = payload_type
    while t >= 0xFF:
        bw.u(0xFF, 8)
        t -= 0xFF
    bw.u(t, 8)
    s = len(payload)
    while s >= 0xFF:
        bw.u(0xFF, 8)
        s -= 0xFF
    bw.u(s, 8)
    for b in payload:
        bw.u(b, 8)

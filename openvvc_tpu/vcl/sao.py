"""SAO per-CTU syntax (symmetric reader/writer).

Parity: /root/reference/libovvc/vcl_sao.c (ovcabac_read_ae_sao_ctu :196,
ovcabac_read_ae_sao_merge_type :44, ovcabac_read_ae_sao_type_idx :62).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from openvvc_tpu.cabac.ctx import CtxOffset

SAO_NONE = 0
SAO_BAND = 1
SAO_EDGE = 2


@dataclass
class SaoParams:
    type_idx: list = field(default_factory=lambda: [0, 0, 0])
    offset_val: list = field(default_factory=lambda: [[0] * 5, [0] * 5, [0] * 5])
    offset_abs: list = field(default_factory=lambda: [[0] * 4, [0] * 4, [0] * 4])
    offset_sign: list = field(default_factory=lambda: [[0] * 4, [0] * 4, [0] * 4])
    band_position: list = field(default_factory=lambda: [0, 0, 0])
    eo_class: list = field(default_factory=lambda: [0, 0, 0])


def _offsets_abs(io, n_bits, values=None):
    """Four truncated-unary bypass-coded absolute offsets."""
    out = []
    for i in range(4):
        if io.is_reader:
            k = 0
            while k < n_bits and io.raw_bypass():
                k += 1
            out.append(k)
        else:
            v = values[i]
            for _ in range(v):
                io.put_bypass(1)
            if v < n_bits:
                io.put_bypass(0)
            out.append(v)
    return out


def _comp_params(io, sao: SaoParams, c, n_bits, parse_type, shared_type=None):
    """Type + offsets for one component slot (c=0 luma, 1 Cb, 2 Cr)."""
    if parse_type:
        if io.is_reader:
            sao.type_idx[c] = SAO_EDGE if io.raw_bypass() else SAO_BAND
        else:
            io.put_bypass(1 if sao.type_idx[c] == SAO_EDGE else 0)
    else:
        sao.type_idx[c] = shared_type

    sao.offset_abs[c] = _offsets_abs(io, n_bits, None if io.is_reader else sao.offset_abs[c])

    if sao.type_idx[c] == SAO_BAND:
        for k in range(4):
            if sao.offset_abs[c][k]:
                s = io.raw_bypass() if io.is_reader else (io.put_bypass(sao.offset_sign[c][k]) or sao.offset_sign[c][k])
                sao.offset_sign[c][k] = s
            else:
                sao.offset_sign[c][k] = 0
            sao.offset_val[c][k] = -sao.offset_abs[c][k] if sao.offset_sign[c][k] else sao.offset_abs[c][k]
        if io.is_reader:
            bp = 0
            for i in range(1, 6):
                bp |= io.raw_bypass() << (5 - i)
            sao.band_position[c] = bp
        else:
            for i in range(1, 6):
                io.put_bypass((sao.band_position[c] >> (5 - i)) & 1)
    else:  # edge
        if c != 2:
            if io.is_reader:
                sao.eo_class[c] = (io.raw_bypass() << 1) | io.raw_bypass()
            else:
                io.put_bypass(sao.eo_class[c] >> 1)
                io.put_bypass(sao.eo_class[c] & 1)
        else:
            sao.eo_class[2] = sao.eo_class[1]
        a = sao.offset_abs[c]
        sao.offset_val[c] = [a[0], a[1], 0, -a[2], -a[3]]


def code_sao_ctu(ctx, io, ctb_x, ctb_y):
    """Parse/write SAO params for one CTU; stores into ctx.sao_params."""
    if not (ctx.sao_luma or ctx.sao_chroma):
        return None
    entry = ctx.entry
    left_ok = ctb_x > entry.ctu_x
    up_ok = ctb_y > entry.ctu_y
    key = (ctb_x, ctb_y)

    if io.is_reader:
        merge = 0
        if left_ok:
            merge = io.raw_bin(CtxOffset.SAO_MERGE_FLAG)
        if not merge and up_ok:
            merge = io.raw_bin(CtxOffset.SAO_MERGE_FLAG) << 1
    else:
        merge = getattr(ctx.writer_node, "sao_merge", 0)
        if left_ok:
            io.put_bin(1 if merge == 1 else 0, CtxOffset.SAO_MERGE_FLAG)
        if merge != 1 and up_ok:
            io.put_bin(1 if merge == 2 else 0, CtxOffset.SAO_MERGE_FLAG)

    if merge == 1:
        sao = ctx.sao_params[(ctb_x - 1, ctb_y)]
        ctx.sao_params[key] = sao
        return sao
    if merge == 2:
        sao = ctx.sao_params[(ctb_x, ctb_y - 1)]
        ctx.sao_params[key] = sao
        return sao

    sao = SaoParams() if io.is_reader else (getattr(ctx.writer_node, "sao", None) or SaoParams())
    bd_m8 = ctx.bitdepth - 8
    n_bits = (0x1F >> ((bd_m8 <= 1) + (bd_m8 == 0))) | 0x7

    if ctx.sao_luma:
        if io.is_reader:
            on = io.raw_bin(CtxOffset.SAO_TYPE_IDX)
        else:
            on = 1 if sao.type_idx[0] else 0
            io.put_bin(on, CtxOffset.SAO_TYPE_IDX)
        if on:
            _comp_params(io, sao, 0, n_bits, True)
        else:
            sao.type_idx[0] = SAO_NONE

    if ctx.sao_chroma:
        if io.is_reader:
            on = io.raw_bin(CtxOffset.SAO_TYPE_IDX)
        else:
            on = 1 if sao.type_idx[1] else 0
            io.put_bin(on, CtxOffset.SAO_TYPE_IDX)
        if on:
            _comp_params(io, sao, 1, n_bits, True)
            _comp_params(io, sao, 2, n_bits, False, shared_type=sao.type_idx[1])
        else:
            sao.type_idx[1] = sao.type_idx[2] = SAO_NONE

    ctx.sao_params[key] = sao
    return sao

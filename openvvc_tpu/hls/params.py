"""NVCL context (parameter-set storage) and active-parameter snapshot.

Equivalent of the reference's OVNVCLCtx + OVPS "active params" rebuilt per
slice (/root/reference/libovvc/nvcl.c:173-296, dec_init.c:584 and the
derivation helpers dec_init.c:51-380). Derivations follow ITU-T H.266:
partition constraints (7.4.3.4), chroma QP tables (eq. 58-63), tile grid
(6.5.1), per-tile CABAC entry points (7.4.8.1 with EPB correction).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from openvvc_tpu.hls.aps import APS, APS_ALF, APS_LMCS, APS_SCALING_LIST, aps_syntax
from openvvc_tpu.hls.nal import NalType, NalUnit
from openvvc_tpu.hls.ph import PH, SLICE_I, picture_header_syntax
from openvvc_tpu.hls.pps import PPS, pps_syntax
from openvvc_tpu.hls.sei import parse_sei_rbsp
from openvvc_tpu.hls.sh import SH, slice_header_syntax
from openvvc_tpu.hls.sps import SPS, sps_syntax
from openvvc_tpu.hls.syntax import SyntaxReader
from openvvc_tpu.utils.bitstream import BitReader


@dataclass
class PartitionInfo:
    """Partition constraints for one (slice-type, tree) combination."""

    log2_ctu_s: int
    log2_min_cb_s: int
    log2_min_qt_s: int
    log2_max_bt_s: int
    log2_max_tt_s: int
    max_mtt_depth: int
    log2_max_tb_s: int


def _part_info(log2_ctu_s, log2_min_cb_s, log2_diff_min_qt, max_mtt, log2_diff_bt, log2_diff_tt, log2_max_tb_s):
    log2_min_qt = log2_min_cb_s + log2_diff_min_qt
    return PartitionInfo(
        log2_ctu_s=log2_ctu_s,
        log2_min_cb_s=log2_min_cb_s,
        log2_min_qt_s=log2_min_qt,
        log2_max_bt_s=log2_min_qt + log2_diff_bt,
        log2_max_tt_s=log2_min_qt + log2_diff_tt,
        max_mtt_depth=max_mtt,
        log2_max_tb_s=log2_max_tb_s,
    )


def derive_chroma_qp_table(start_qp: int, in_val_minus1, diff_val, nb_points: int, qp_bd_offset: int):
    """ChromaQpTable derivation, H.266 equations (58)-(63).

    Returns a list indexed by (qpIn + qp_bd_offset) for qpIn in
    [-qp_bd_offset, 63].
    """
    lo = -qp_bd_offset
    size = 64 + qp_bd_offset
    tab = [0] * size

    def clip(v):
        return max(lo, min(63, v))

    qp_in = [start_qp]
    qp_out = [start_qp]
    for j in range(nb_points):
        qp_in.append(qp_in[j] + in_val_minus1[j] + 1)
        qp_out.append(qp_out[j] + (in_val_minus1[j] ^ diff_val[j]))

    tab[qp_in[0] + qp_bd_offset] = qp_out[0]
    for k in range(qp_in[0] - 1, lo - 1, -1):
        tab[k + qp_bd_offset] = clip(tab[k + 1 + qp_bd_offset] - 1)
    for j in range(nb_points):
        sh = (in_val_minus1[j] + 1) >> 1
        span = in_val_minus1[j] + 1
        dout = qp_out[j + 1] - qp_out[j]
        for m, k in enumerate(range(qp_in[j] + 1, qp_in[j + 1] + 1), start=1):
            tab[k + qp_bd_offset] = tab[qp_in[j] + qp_bd_offset] + (dout * m + sh) // span
    for k in range(qp_in[nb_points] + 1, 64):
        tab[k + qp_bd_offset] = clip(tab[k - 1 + qp_bd_offset] + 1)
    return tab


@dataclass
class TileInfo:
    """Tile grid in CTU units."""

    col_widths: list[int]
    row_heights: list[int]

    @property
    def nb_cols(self) -> int:
        return len(self.col_widths)

    @property
    def nb_rows(self) -> int:
        return len(self.row_heights)

    @property
    def nb_tiles(self) -> int:
        return self.nb_cols * self.nb_rows

    def col_x(self) -> list[int]:
        xs = [0]
        for w in self.col_widths:
            xs.append(xs[-1] + w)
        return xs

    def row_y(self) -> list[int]:
        ys = [0]
        for h in self.row_heights:
            ys.append(ys[-1] + h)
        return ys


@dataclass
class TileEntry:
    """One rectangular CABAC entry (RectEntryInfo analog)."""

    tile_idx: int
    ctu_x: int  # in CTUs
    ctu_y: int
    nb_ctu_w: int
    nb_ctu_h: int
    data: bytes  # RBSP slice-data segment for this entry


class NvclContext:
    """Storage for decoded parameter sets, keyed by their ids."""

    def __init__(self):
        self.sps_list: dict[int, SPS] = {}
        self.pps_list: dict[int, PPS] = {}
        self.alf_aps: dict[int, APS] = {}
        self.lmcs_aps: dict[int, APS] = {}
        self.scaling_aps: dict[int, APS] = {}
        self.ph: PH | None = None
        self.sei_film_grain = None

    def decode_nalu(self, nal: NalUnit) -> None:
        """Dispatch a non-VCL NALU to its reader (nalu_action analog)."""
        io = SyntaxReader(BitReader(nal.rbsp))
        t = nal.type
        if t == NalType.SPS:
            sps = SPS()
            sps_syntax(io, sps)
            self.sps_list[sps.sps_seq_parameter_set_id] = sps
        elif t == NalType.PPS:
            pps = PPS()
            pps_syntax(io, pps)
            self.pps_list[pps.pps_pic_parameter_set_id] = pps
        elif t in (NalType.PREFIX_APS, NalType.SUFFIX_APS):
            aps = APS()
            aps_syntax(io, aps)
            target = {APS_ALF: self.alf_aps, APS_LMCS: self.lmcs_aps, APS_SCALING_LIST: self.scaling_aps}[
                aps.aps_params_type
            ]
            target[aps.aps_adaptation_parameter_set_id] = aps
        elif t == NalType.PH:
            ph = PH()
            pps = self.pps_list[_peek_ph_pps_id(nal.rbsp)]
            sps = self.sps_list[pps.pps_seq_parameter_set_id]
            picture_header_syntax(io, ph, sps, pps)
            self.ph = ph
        elif t in (NalType.PREFIX_SEI, NalType.SUFFIX_SEI):
            for msg in parse_sei_rbsp(nal.rbsp):
                if getattr(msg, "film_grain", None) is not None:
                    self.sei_film_grain = msg.film_grain
        # VPS/DCI/OPI/AUD/EOS/EOB/FD: carried but unused (as in reference,
        # nvcl.c:260-262 maps them to warn_unsupported).

    def parse_slice(self, nal: NalUnit) -> "ActiveParams":
        """Parse a VCL NALU's slice header and build the active params."""
        br = BitReader(nal.rbsp)
        io = SyntaxReader(br)
        sh = SH()
        # sh_picture_header_in_slice_header handling needs sps/pps before the
        # full parse; peek the PH pps id when embedded.
        first_bit = (nal.rbsp[0] >> 7) & 1
        if first_bit:
            pps_id = _peek_ph_pps_id(nal.rbsp, skip_bits=1)
        else:
            if self.ph is None:
                raise ValueError("VCL NALU without preceding picture header")
            pps_id = self.ph.ph_pic_parameter_set_id
        pps = self.pps_list[pps_id]
        sps = self.sps_list[pps.pps_seq_parameter_set_id]
        slice_header_syntax(io, sh, nal.type, sps, pps, self.ph)
        nb_sh_bytes = br.bytes_read()
        return ActiveParams.build(self, nal, sps, pps, sh.ph, sh, nb_sh_bytes)


def _peek_ph_pps_id(rbsp: bytes, skip_bits: int = 0) -> int:
    """Read ph_pic_parameter_set_id without consuming the stream.

    PH starts: gdr_or_irap(1) non_ref(1) [gdr_pic(1)] inter_allowed(1)
    [intra_allowed(1)] then ue(v) pps id.
    """
    br = BitReader(rbsp)
    if skip_bits:
        br.u(skip_bits)
    gdr_or_irap = br.u(1)
    br.u(1)
    if gdr_or_irap:
        br.u(1)
    inter_allowed = br.u(1)
    if inter_allowed:
        br.u(1)
    return br.ue()


@dataclass
class ActiveParams:
    """Snapshot of everything a slice decode needs (OVPS analog)."""

    sps: SPS
    pps: PPS
    ph: PH
    sh: SH
    nal_type: int
    tile_info: TileInfo = None
    entries: list[TileEntry] = field(default_factory=list)
    chroma_qp_tables: list[list[int]] = field(default_factory=list)
    part_info: dict = field(default_factory=dict)
    alf_aps_luma: list = field(default_factory=list)
    alf_aps_chroma: object = None
    alf_aps_cc: tuple = (None, None)
    lmcs_data: object = None

    @property
    def qp_bd_offset(self) -> int:
        return 6 * self.sps.sps_bitdepth_minus8

    @classmethod
    def build(cls, ctx: NvclContext, nal: NalUnit, sps: SPS, pps: PPS, ph: PH, sh: SH, nb_sh_bytes: int):
        if pps.pps_no_pic_partition_flag:
            # inferred equal to sps_log2_ctu_size_minus5 (spec 7.4.3.5)
            pps.pps_log2_ctu_size_minus5 = sps.sps_log2_ctu_size_minus5
        p = cls(sps=sps, pps=pps, ph=ph, sh=sh, nal_type=int(nal.type))
        p._derive_partition_info()
        p._derive_chroma_qp_tables()
        p._derive_tiles(nal, nb_sh_bytes)
        p._resolve_aps(ctx)
        return p

    # -- derivations ---------------------------------------------------
    def _derive_partition_info(self):
        sps, ph = self.sps, self.ph
        log2_ctu = sps.ctb_log2
        log2_min_cb = sps.sps_log2_min_luma_coding_block_size_minus2 + 2
        max_tb = 5 + sps.sps_max_luma_transform_size_64_flag
        ovr = ph.ph_partition_constraints_override_flag

        def pick(suffix: str):
            src = ph if ovr else sps
            pfx = "ph_" if ovr else "sps_"
            return (
                getattr(src, f"{pfx}log2_diff_min_qt_min_cb_{suffix}"),
                getattr(src, f"{pfx}max_mtt_hierarchy_depth_{suffix}"),
                getattr(src, f"{pfx}log2_diff_max_bt_min_qt_{suffix}"),
                getattr(src, f"{pfx}log2_diff_max_tt_min_qt_{suffix}"),
            )

        d = pick("intra_slice_luma")
        self.part_info["intra_luma"] = _part_info(log2_ctu, log2_min_cb, d[0], d[1], d[2], d[3], max_tb)
        d = pick("inter_slice")
        self.part_info["inter_luma"] = _part_info(log2_ctu, log2_min_cb, d[0], d[1], d[2], d[3], max_tb)
        d = pick("intra_slice_chroma")
        self.part_info["intra_chroma"] = _part_info(log2_ctu, log2_min_cb - 1, d[0], d[1], d[2], d[3], max_tb - 1)
        d = pick("inter_slice")
        self.part_info["inter_chroma"] = _part_info(log2_ctu, log2_min_cb - 1, d[0], d[1], d[2], d[3], max_tb - 1)

    def _derive_chroma_qp_tables(self):
        sps = self.sps
        if sps.sps_chroma_format_idc == 0:
            return
        nb_tables = 1 if sps.sps_same_qp_table_for_chroma_flag else 2 + sps.sps_joint_cbcr_enabled_flag
        tabs = []
        for i in range(nb_tables):
            nb_points = sps.sps_num_points_in_qp_table_minus1[i] + 1
            in_vals = [sps.sps_delta_qp_in_val_minus1[i][j] for j in range(nb_points)]
            diff_vals = [sps.sps_delta_qp_diff_val[i][j] for j in range(nb_points)]
            tabs.append(
                derive_chroma_qp_table(
                    sps.sps_qp_table_start_minus26[i] + 26, in_vals, diff_vals, nb_points, self.qp_bd_offset
                )
            )
        while len(tabs) < 3:
            tabs.append(tabs[-1])
        self.chroma_qp_tables = tabs

    def _derive_tiles(self, nal: NalUnit, nb_sh_bytes: int):
        pps, sh = self.pps, self.sh
        cols, rows = pps.tile_grid()
        self.tile_info = TileInfo(cols, rows)
        xs, ys = self.tile_info.col_x(), self.tile_info.row_y()

        nb_entries = self.tile_info.nb_tiles
        # entry offsets are in EBSP bytes after the slice header; convert to
        # RBSP offsets by discounting EPBs (dec_init.c:322-366 equivalent).
        sh_data = nal.rbsp[nb_sh_bytes:]
        nb_sh_epb = sum(1 for p in nal.epb_positions if p <= nb_sh_bytes)
        epb_after = [p - nb_sh_bytes for p in nal.epb_positions[nb_sh_epb:]]

        raw_offsets = [0]
        for i in range(nb_entries - 1):
            raw_offsets.append(raw_offsets[-1] + sh.sh_entry_point_offset_minus1[i] + 1)
        rbsp_offsets = [0]
        for off in raw_offsets[1:]:
            corrected = off - sum(1 for p in epb_after if p < off)
            rbsp_offsets.append(corrected)
        rbsp_offsets.append(len(sh_data))

        self.entries = []
        for t in range(nb_entries):
            ty, tx = divmod(t, self.tile_info.nb_cols)
            self.entries.append(
                TileEntry(
                    tile_idx=t,
                    ctu_x=xs[tx],
                    ctu_y=ys[ty],
                    nb_ctu_w=cols[tx],
                    nb_ctu_h=rows[ty],
                    data=sh_data[rbsp_offsets[t] : rbsp_offsets[t + 1]],
                )
            )

    def _resolve_aps(self, ctx: NvclContext):
        sh, ph = self.sh, self.ph
        if sh.sh_alf_enabled_flag or ph.ph_alf_enabled_flag:
            src = sh if sh.sh_alf_enabled_flag else ph
            pfx = "sh" if sh.sh_alf_enabled_flag else "ph"
            n = getattr(src, f"{pfx}_num_alf_aps_ids_luma")
            ids = getattr(src, f"{pfx}_alf_aps_id_luma")
            self.alf_aps_luma = [ctx.alf_aps.get(ids[i]) for i in range(n)]
            if getattr(src, f"{pfx}_alf_cb_enabled_flag") or getattr(src, f"{pfx}_alf_cr_enabled_flag"):
                self.alf_aps_chroma = ctx.alf_aps.get(getattr(src, f"{pfx}_alf_aps_id_chroma"))
            cc_cb = ctx.alf_aps.get(getattr(src, f"{pfx}_alf_cc_cb_aps_id")) if getattr(
                src, f"{pfx}_alf_cc_cb_enabled_flag"
            ) else None
            cc_cr = ctx.alf_aps.get(getattr(src, f"{pfx}_alf_cc_cr_aps_id")) if getattr(
                src, f"{pfx}_alf_cc_cr_enabled_flag"
            ) else None
            self.alf_aps_cc = (cc_cb, cc_cr)
        if ph.ph_lmcs_enabled_flag:
            aps = ctx.lmcs_aps.get(ph.ph_lmcs_aps_id)
            self.lmcs_data = aps.lmcs_data if aps is not None else None

    # -- common deriveds -----------------------------------------------
    @property
    def slice_qp(self) -> int:
        return 26 + self.pps.pps_init_qp_minus26 + self.ph.ph_qp_delta + self.sh.sh_qp_delta

    @property
    def slice_type(self) -> int:
        return self.sh.sh_slice_type if self.ph.ph_inter_slice_allowed_flag else SLICE_I

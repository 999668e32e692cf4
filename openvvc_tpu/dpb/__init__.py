"""Decoded picture buffer: POC derivation and reference list resolution.

Parity: /root/reference/libovvc/dpb.c — derive_poc (:182), RPL resolution
(:1040-1110: RefPicPocList[i] = pocBase - DeltaPocValSt[i], pocBase chains),
dist_ref (:966). Long-term/inter-layer refs are not yet supported (the
generator emits short-term-only RPLs).
"""

from __future__ import annotations

from openvvc_tpu.hls.nal import NalType

_IDR_TYPES = (NalType.IDR_W_RADL, NalType.IDR_N_LP)


def derive_poc(poc_lsb: int, log2_max_poc_lsb: int, prev_poc: int) -> int:
    """dpb.c derive_poc parity."""
    max_poc_lsb = 1 << log2_max_poc_lsb
    prev_poc_lsb = prev_poc & (max_poc_lsb - 1)
    poc_msb = prev_poc - prev_poc_lsb
    if poc_lsb < prev_poc_lsb and prev_poc_lsb - poc_lsb >= max_poc_lsb // 2:
        poc_msb += max_poc_lsb
    elif poc_lsb > prev_poc_lsb and poc_lsb - prev_poc_lsb > max_poc_lsb // 2:
        poc_msb -= max_poc_lsb
    return poc_msb + poc_lsb


class DPB:
    """Minimal DPB: frames by POC, short-term RPL resolution."""

    def __init__(self):
        self.pics: dict[int, object] = {}
        self.prev_poc = 0

    def picture_poc(self, params, nal_type: int) -> int:
        sps, ph = params.sps, params.ph
        log2_max = sps.sps_log2_max_pic_order_cnt_lsb_minus4 + 4
        if nal_type in _IDR_TYPES:
            self.pics.clear()
            poc = ph.ph_pic_order_cnt_lsb
            if getattr(ph, "ph_poc_msb_cycle_present_flag", 0):
                poc += ph.ph_poc_msb_cycle_val << log2_max
        else:
            poc = derive_poc(ph.ph_pic_order_cnt_lsb, log2_max, self.prev_poc)
        # prev_tid0 tracking: our streams are single-layer tid0
        self.prev_poc = poc
        return poc

    def store(self, poc: int, frame) -> None:
        self.pics[poc] = frame

    def resolve_rpl(self, hrpl, sps, cur_poc: int, nb_active: int):
        """Active reference frames + POC distances for list resolution.

        Reference parity (dpb.c compute_ref_poc :440-481): each short-term
        entry chains from the previous resolved POC (poc = ref_poc at loop
        end), sign 0 meaning a FUTURE step: prev +/- (abs + 1).
        """
        rpl = hrpl.rpl
        refs, dist = [], []
        base = cur_poc
        for i in range(min(nb_active, rpl.num_ref_entries)):
            if not rpl.st_ref_pic_flag[i]:
                raise NotImplementedError("long-term refs not supported")
            a = rpl.abs_delta_poc_st[i] + 1
            ref_poc = base - a if rpl.strp_entry_sign_flag[i] else base + a
            base = ref_poc
            if ref_poc not in self.pics:
                raise ValueError(f"reference POC {ref_poc} not in DPB")
            refs.append(self.pics[ref_poc])
            dist.append(cur_poc - ref_poc)
        return refs, dist

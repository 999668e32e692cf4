"""Decoded picture buffer: POC derivation, RPL resolution, output order.

Parity: /root/reference/libovvc/dpb.c — derive_poc (:182), RPL resolution
incl. long-term entries (compute_ref_poc :440-486: LT entries use
rpls_poc_lsb_lt directly and re-base the chain, matching the reference's
partial LT support), reference marking (vvc_mark_refs :490), per-CVS
output order (ovdpb_output_pic / ovdpb_drain_frame :691-824: within a
CVS pictures are output in ascending POC; CVSs output in decode order;
the no_output_of_prior_pics branch is compiled out in the reference so
prior pictures are always output).
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
    """DPB: frames by POC per CVS, RPL resolution, output bumping state."""

    def __init__(self):
        self.pics: dict[int, object] = {}
        self.prev_poc = 0
        self.cvs_id = 0

    def picture_poc(self, params, nal_type: int) -> int:
        sps, ph = params.sps, params.ph
        log2_max = sps.sps_log2_max_pic_order_cnt_lsb_minus4 + 4
        if nal_type in _IDR_TYPES:
            # new CVS: prior pictures leave the reference set; they were
            # already recorded for output (always output, see header note)
            self.pics.clear()
            self.cvs_id += 1
            poc = ph.ph_pic_order_cnt_lsb
            if getattr(ph, "ph_poc_msb_cycle_present_flag", 0):
                poc += ph.ph_poc_msb_cycle_val << log2_max
        else:
            poc = derive_poc(ph.ph_pic_order_cnt_lsb, log2_max, self.prev_poc)
        # prev_tid0 tracking: our streams are single-layer tid0
        self.prev_poc = poc
        return poc

    def store(self, poc: int, frame) -> None:
        frame.cvs_id = self.cvs_id
        self.pics[poc] = frame

    def mark_refs(self, active_pocs) -> None:
        """Release pictures referenced by nothing going forward
        (vvc_mark_refs + ovdpb_unmark_ref_pic_lists analog). Optional —
        correctness only needs the lookups, this bounds memory."""
        keep = set(active_pocs)
        for poc in list(self.pics):
            if poc not in keep:
                del self.pics[poc]

    def resolve_rpl(self, hrpl, sps, cur_poc: int, nb_active: int):
        """Active reference frames + POC distances for list resolution.

        Reference parity (dpb.c compute_ref_poc :440-486): each short-term
        entry chains from the previous resolved POC (poc = ref_poc at loop
        end), sign 0 meaning a FUTURE step; long-term entries resolve to
        rpls_poc_lsb_lt directly (the reference's partial LT support) and
        also re-base the chain.
        """
        rpl = hrpl.rpl
        refs, dist = [], []
        base = cur_poc
        for i in range(min(nb_active, rpl.num_ref_entries)):
            if rpl.st_ref_pic_flag[i]:
                a = rpl.abs_delta_poc_st[i] + 1
                ref_poc = base - a if rpl.strp_entry_sign_flag[i] else base + a
            else:
                ref_poc = rpl.rpls_poc_lsb_lt[i]
            base = ref_poc
            if ref_poc not in self.pics:
                raise ValueError(f"reference POC {ref_poc} not in DPB")
            refs.append(self.pics[ref_poc])
            dist.append(cur_poc - ref_poc)
        return refs, dist

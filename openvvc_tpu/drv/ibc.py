"""Intra block copy: HMVP-based merge/MVP derivation + virtual-buffer copy.

Behavior parity: /root/reference/libovvc/drv_ibc.c — ibc_update_hmvp_lut
(:83), ibc_hmvp_mvp_cand (:123), ibc_derive_hmvp_merge_cand (:137),
ibc_derive_merge_mv (:216), set_ibc_df_map (:271), ibc_fill_mvp_map (:312),
drv_ibc_merge_mv (:348), drv_ibc_mvp (:370 — the AMVP list is the merge
list in the reference, mvp_idx indexes it); rcn_ibc.c rcn_ibc_l/_c
(:8/:62 — 128x256-sample virtual buffer with modulo addressing, which in
picture coordinates is a per-sample wrap within the current CTU row).

MVs are stored in 1/16 internal precision like the reference's IBCMV.
"""

from __future__ import annotations

from dataclasses import replace

import numpy as np

from openvvc_tpu.drv.inter_mvp import (
    MV,
    MV_PRECISION_INT,
    MV_PRECISION_INTERNAL,
    change_precision,
    round_to_precision,
)


class IbcCtx:
    """Per-tile IBC derivation state (flat-map redesign of the reference's
    rotating CTU-local maps; availability and probe positions are the
    adjacent A1/B1 neighbours so the flat maps are equivalent)."""

    def __init__(self, nb_units_w: int, nb_units_h: int, nb_cand: int):
        self.uw, self.uh = nb_units_w, nb_units_h
        self.nb_cand = nb_cand
        self.dir = np.zeros((nb_units_h, nb_units_w), bool)
        # line buffers: last IBC MV covering a column / row (abv_row/lft_col)
        self.abv_mv = [MV(0, 0)] * nb_units_w
        self.lft_mv = [MV(0, 0)] * nb_units_h
        self.hmvp: list[MV] = []

    # -- HMVP -------------------------------------------------------------
    def _hmvp_update(self, mv: MV):
        for i, c in enumerate(self.hmvp):
            if c.x == mv.x and c.y == mv.y:
                del self.hmvp[i]
                self.hmvp.append(mv)
                return
        if len(self.hmvp) == 5:
            self.hmvp.pop(0)
        self.hmvp.append(mv)

    def _avail(self, ux, uy) -> bool:
        if ux < 0 or uy < 0 or ux >= self.uw or uy >= self.uh:
            return False
        return bool(self.dir[uy, ux])

    def derive_merge_mv(self, ux, uy, nw, nh, merge_idx, max_cand) -> MV:
        """ibc_derive_merge_mv parity: A1, B1 (deduped), then HMVP."""
        nb_cand = 0
        cand_a1 = cand_b1 = False
        a1 = b1 = None
        if not ((nw | nh) == 1):
            cand_a1 = self._avail(ux - 1, uy + nh - 1)
            cand_b1 = self._avail(ux + nw - 1, uy - 1)
            if cand_a1:
                a1 = self.lft_mv[uy + nh - 1]
                if nb_cand == merge_idx:
                    return a1
                nb_cand += 1
            if cand_b1:
                b1 = self.abv_mv[ux + nw - 1]
                if not cand_a1 or not (a1.x == b1.x and a1.y == b1.y):
                    if nb_cand == merge_idx:
                        return b1
                    nb_cand += 1
        # HMVP (ibc_derive_hmvp_merge_cand)
        if nb_cand != max_cand:
            target_idx = merge_idx - nb_cand
            nb_lut = len(self.hmvp)
            if target_idx < nb_lut:
                first_cand = self.hmvp[-1]
                lut_idx = nb_lut - target_idx - 1
                already = False
                if cand_a1 and a1.x == first_cand.x and a1.y == first_cand.y:
                    already = True
                if cand_b1 and b1.x == first_cand.x and b1.y == first_cand.y:
                    already = True
                lut_idx -= 1 if already else 0
                if lut_idx >= 0:
                    return self.hmvp[lut_idx]
        return MV(0, 0)

    # -- map update + DBF edges -------------------------------------------
    def update(self, ux, uy, nw, nh, mv: MV):
        """ibc_update_mv_ctx: fills the maps + HMVP; returns the bs1 DBF
        edge masks ((top unit offsets), (left unit offsets)) where the
        neighbouring IBC MV differs by >= half-pel (set_ibc_df_map)."""
        top_edges, lft_edges = [], []
        if uy > 0:
            for i in range(nw):
                if self._avail(ux + i, uy - 1):
                    n = self.abv_mv[ux + i]
                    if abs(n.x - mv.x) >= 8 or abs(n.y - mv.y) >= 8:
                        top_edges.append(i)
        if ux > 0:
            for i in range(nh):
                if self._avail(ux - 1, uy + i):
                    n = self.lft_mv[uy + i]
                    if abs(n.x - mv.x) >= 8 or abs(n.y - mv.y) >= 8:
                        lft_edges.append(i)
        self.dir[uy : uy + nh, ux : ux + nw] = True
        for i in range(nw):
            self.abv_mv[ux + i] = mv
        for i in range(nh):
            self.lft_mv[uy + i] = mv
        if (nw | nh) > 1:
            self._hmvp_update(mv)
        return top_edges, lft_edges


def drv_ibc_merge_mv(ictx: IbcCtx, x0, y0, log2_w, log2_h, merge_idx,
                     max_cand):
    """(mv_int, dbf_edges): derive, update maps, convert to integer pel."""
    ux, uy = x0 >> 2, y0 >> 2
    nw, nh = (1 << log2_w) >> 2, (1 << log2_h) >> 2
    mv = ictx.derive_merge_mv(ux, uy, nw, nh, merge_idx, max_cand)
    edges = ictx.update(ux, uy, nw, nh, mv)
    return change_precision(mv, MV_PRECISION_INTERNAL, MV_PRECISION_INT), edges


def drv_ibc_mvp(ictx: IbcCtx, x0, y0, log2_w, log2_h, mvd: MV, mvp_idx,
                prec_amvr):
    """drv_ibc_mvp parity: merge list as AMVP list, round + add MVD."""
    ux, uy = x0 >> 2, y0 >> 2
    nw, nh = (1 << log2_w) >> 2, (1 << log2_h) >> 2
    mv = ictx.derive_merge_mv(ux, uy, nw, nh, mvp_idx, 6)
    mv = round_to_precision(mv, MV_PRECISION_INTERNAL, prec_amvr)
    d = change_precision(mvd, prec_amvr, MV_PRECISION_INTERNAL)
    mv = replace(mv, x=mv.x + d.x, y=mv.y + d.y)
    edges = ictx.update(ux, uy, nw, nh, mv)
    return change_precision(mv, MV_PRECISION_INTERNAL, MV_PRECISION_INT), edges


def ibc_copy(plane, x0, y0, w, h, mv_x, mv_y, ctb_x, ctb_y, log2_ctb,
             chroma: bool):
    """rcn_ibc_l/_c parity: copy through the virtual IBC buffer.

    All inputs in LUMA coordinates/units (the reference's chroma variant
    also addresses in luma space and halves at sample access).
    Virtual-buffer addressing maps to picture coordinates as
    pic_x = ((ctb_x & ~ctb_msk) << log2_ctb) + (vbuf_x mod ibc_stride),
    pic_y = (ctb_y << log2_ctb) + ((y + mv_y) mod ctb_size).
    """
    ctb_msk = (256 * 128 >> (2 * log2_ctb)) - 1
    ibc_stride = 256 * 128 >> log2_ctb
    msk_v = (1 << log2_ctb) - 1
    ctb_pos = (ctb_x & ctb_msk) << log2_ctb
    x_local = x0 - (ctb_x << log2_ctb)
    y_local = y0 - (ctb_y << log2_ctb)
    ref_vx = (ctb_pos + x_local + mv_x) & (ibc_stride - 1)
    ref_y = (y_local + mv_y) & msk_v
    base_x = (ctb_x & ~ctb_msk) << log2_ctb
    if not chroma:
        xs = base_x + ((ref_vx + np.arange(w)) & (ibc_stride - 1))
        pic_y = (ctb_y << log2_ctb) + ref_y
        plane[y0 : y0 + h, x0 : x0 + w] = plane[pic_y : pic_y + h, :][:, xs]
    else:
        xs = (base_x + ((ref_vx + np.arange(0, w, 2)) & (ibc_stride - 1))) >> 1
        pic_y = (((ctb_y << log2_ctb) + ref_y) >> 1)
        cy0, cx0 = y0 >> 1, x0 >> 1
        ch, cw = h >> 1, w >> 1
        plane[cy0 : cy0 + ch, cx0 : cx0 + cw] = \
            plane[pic_y : pic_y + ch, :][:, xs]

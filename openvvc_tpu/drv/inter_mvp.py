"""Inter MV derivation: AMVP candidates, merge list, HMVP (P slices).

Behavior parity: /root/reference/libovvc/drv_mvp.c —
drv_change_precision_mv (:71), hmvp_add_cand_1 (:136), hmvp_add_merge_cand
(:166), hmvp_update_lut_b (:225), derive_mvp_candidates_1 (:542),
vvc_derive_merge_mvp (:670), drv_merge_mvp / drv_mvp_b (:1700, :899-ish),
update_mv_ctx + fill_mvp_map (:1335-1480).

Maps are kept at picture(-tile) 4x4-unit granularity instead of the
reference's rotating 34x34 CTU window + line buffers; for raster decode
within a tile the two are observationally identical: every candidate probe
hits either the current CTU, the left CTU's last column, or the above CTU
row's last line, all of which hold the same values in a flat map.
"""

from __future__ import annotations

from dataclasses import dataclass, replace

MV_PRECISION_4PEL = 0
MV_PRECISION_INT = 2
MV_PRECISION_HALF = 3
MV_PRECISION_QUARTER = 4
MV_PRECISION_SIXTEENTH = 6
MV_PRECISION_INTERNAL = MV_PRECISION_SIXTEENTH


@dataclass
class MV:
    x: int = 0
    y: int = 0
    ref_idx: int = 0
    bcw_idx_plus1: int = 0
    prec_amvr: int = 0


def change_precision(mv: MV, src: int, dst: int) -> MV:
    """drv_change_precision_mv parity (round-half-away-from-zero down)."""
    shift = dst - src
    if shift >= 0:
        return replace(mv, x=mv.x << shift, y=mv.y << shift)
    shift = -shift
    off = 1 << (shift - 1)
    x = (mv.x + off - 1) >> shift if mv.x >= 0 else (mv.x + off) >> shift
    y = (mv.y + off - 1) >> shift if mv.y >= 0 else (mv.y + off) >> shift
    return replace(mv, x=x, y=y)


def round_to_precision(mv: MV, src: int, dst: int) -> MV:
    return change_precision(change_precision(mv, src, dst), dst, src)


def mv_cmp(a: MV, b: MV) -> bool:
    return a.x == b.x and a.y == b.y


def mv_cmp2(a: MV, b: MV) -> bool:
    return a.x == b.x and a.y == b.y and a.ref_idx == b.ref_idx


class HmvpLut:
    """History-based MVP LUT, 5 entries (hmvp_update_lut_b parity)."""

    def __init__(self):
        self.mv0: list[MV] = []
        self.mv1: list[MV] = []
        self.dir: list[int] = []

    @property
    def nb_mv(self) -> int:
        return len(self.dir)

    def reset(self):
        self.mv0, self.mv1, self.dir = [], [], []

    def update(self, mv0: MV, mv1: MV, inter_dir: int):
        dup_at = -1
        for i in range(min(5, self.nb_mv)):
            if self.dir[i] == inter_dir:
                if inter_dir == 1:
                    dup = mv_cmp(mv0, self.mv0[i]) and mv0.ref_idx == self.mv0[i].ref_idx
                elif inter_dir == 2:
                    dup = mv_cmp(mv1, self.mv1[i]) and mv1.ref_idx == self.mv1[i].ref_idx
                else:
                    dup = (mv_cmp(mv0, self.mv0[i]) and mv_cmp(mv1, self.mv1[i])
                           and mv0.ref_idx == self.mv0[i].ref_idx
                           and mv1.ref_idx == self.mv1[i].ref_idx)
                if dup:
                    dup_at = i
                    break
        if dup_at >= 0:
            del self.mv0[dup_at]; del self.mv1[dup_at]; del self.dir[dup_at]
        elif self.nb_mv == 5:
            del self.mv0[0]; del self.mv1[0]; del self.dir[0]
        self.mv0.append(mv0)
        self.mv1.append(mv1)
        self.dir.append(inter_dir)


class InterCtx:
    """Per-tile inter derivation state at 4x4-unit granularity."""

    def __init__(self, nb_units_w: int, nb_units_h: int, nb_active_ref0: int,
                 nb_active_ref1: int = 0, max_merge_cand: int = 6):
        self.uw, self.uh = nb_units_w, nb_units_h
        self.nb_active_ref0 = nb_active_ref0
        self.nb_active_ref1 = nb_active_ref1
        self.max_merge_cand = max_merge_cand
        self.hmvp = HmvpLut()
        # dir maps: 1 bit per list; MV planes as dicts (sparse writes, dense
        # reads are bounded by candidate probes)
        self.dir0 = [[0] * nb_units_w for _ in range(nb_units_h)]
        self.dir1 = [[0] * nb_units_w for _ in range(nb_units_h)]
        self.mvs0: dict[tuple[int, int], MV] = {}
        self.mvs1: dict[tuple[int, int], MV] = {}
        self.rpl0_opp = [0xFF] * 16
        self.rpl1_opp = [0xFF] * 16
        self.tmvp_enabled = False
        self.col_ref_l0 = True  # ph/sh collocated_from_l0 || P slice
        self.prec_amvr = MV_PRECISION_QUARTER
        # own-picture TMVP field (8x8 grid), exported to the DPB after decode
        self.tmvp_mv0: dict[tuple[int, int], MV] = {}
        self.tmvp_mv1: dict[tuple[int, int], MV] = {}
        # collocated-picture state (set_tmvp)
        self.col = None
        self.dist_ref0: list[int] = []
        self.dist_ref1: list[int] = []
        self.ldc = True
        self.log2_ctb_units = 4
        self.tile_uoff = (0, 0)  # tile origin in 4x4 units (picture coords)

    def set_tmvp(self, col, ldc: bool, log2_ctb: int):
        """col: (dir0, dir1, mv0, mv1, dist_col0, dist_col1) from the
        collocated picture (dir at 4x4 tile units, mv on the 8x8 grid)."""
        self.tmvp_enabled = True
        self.col = col
        self.ldc = ldc
        self.log2_ctb_units = log2_ctb - 2

    # -- map queries ----------------------------------------------------
    def _avail(self, lst: int, ux: int, uy: int) -> bool:
        if ux < 0 or uy < 0 or ux >= self.uw or uy >= self.uh:
            return False
        d = self.dir0 if lst == 0 else self.dir1
        return bool(d[uy][ux])

    def _mv_at(self, lst: int, ux: int, uy: int) -> MV:
        return (self.mvs0 if lst == 0 else self.mvs1)[(ux, uy)]

    # -- updates (fill_mvp_map / update_mv_ctx parity) ------------------
    def fill(self, lst: int, mv: MV, ux: int, uy: int, nw: int, nh: int):
        d = self.dir0 if lst == 0 else self.dir1
        mvs = self.mvs0 if lst == 0 else self.mvs1
        for j in range(nh):
            row = d[uy + j]
            for i in range(nw):
                row[ux + i] = 1
                mvs[(ux + i, uy + j)] = mv

    def fill_tmvp(self, lst: int, mv: MV, ux: int, uy: int, nw: int, nh: int):
        """fill_tmvp_map parity (:1358): 8x8 grid, bcw/prec cleared."""
        mvt = replace(mv, bcw_idx_plus1=0, prec_amvr=0)
        dst = self.tmvp_mv0 if lst == 0 else self.tmvp_mv1
        sx, sy = ux & 1, uy & 1
        x0, y0 = (ux + sx) >> 1, (uy + sy) >> 1
        for j in range((nh + (1 - sy)) >> 1):
            for i in range((nw + (1 - sx)) >> 1):
                dst[(x0 + i, y0 + j)] = mvt

    def update_mv_ctx(self, mv: MV, ux: int, uy: int, nw: int, nh: int,
                      inter_dir: int):
        """P-path update (update_mv_ctx :1454): one list + HMVP."""
        if inter_dir & 0x2:
            self.fill(1, mv, ux, uy, nw, nh)
            self.fill_tmvp(1, mv, ux, uy, nw, nh)
        elif inter_dir & 0x1:
            self.fill(0, mv, ux, uy, nw, nh)
            self.fill_tmvp(0, mv, ux, uy, nw, nh)
        self.hmvp.update(mv, mv, 0x1)

    # -- TMVP (load_ctb_tmvp / derive_tmvp_cand :297-540) ---------------
    def _col_avail(self, lst: int, cx: int, cy: int, cu_uy: int, cu_ux: int) -> bool:
        """Collocated availability: the reference's per-CTU window allows
        one column beyond the CTU right edge but nothing below the CTU."""
        if self.col is None:
            return False
        sh = self.log2_ctb_units
        if (cy >> sh) != (cu_uy >> sh):  # below/above the CU's CTU row
            return False
        if (cx >> sh) > (cu_ux >> sh) + 1 or (cx - ((cu_ux >> sh) << sh)) > (1 << sh):
            return False
        dir_m = self.col[0] if lst == 0 else self.col[1]
        px, py = cx + self.tile_uoff[0], cy + self.tile_uoff[1]
        if py < 0 or px < 0 or py >= len(dir_m) or px >= len(dir_m[0]):
            return False
        return bool(dir_m[py][px])

    def _col_mv(self, lst: int, cx: int, cy: int) -> MV:
        px, py = cx + self.tile_uoff[0], cy + self.tile_uoff[1]
        return (self.col[2] if lst == 0 else self.col[3])[(px >> 1, py >> 1)]

    def _tmvp_scaled(self, lst_cur: int, ref_idx: int, col_lst: int,
                     cx: int, cy: int, prec_amvr=None) -> MV:
        mv = self._col_mv(col_lst, cx, cy)
        dist_col = (self.col[4] if col_lst == 0 else self.col[5])[mv.ref_idx]
        dist_ref = (self.dist_ref0 if lst_cur == 0 else self.dist_ref1)[ref_idx]
        scale = derive_tmvp_scale(dist_ref, dist_col)
        out = MV(tmvp_round_mv(mv.x), tmvp_round_mv(mv.y))
        out = tmvp_scale_mv(scale, out)
        if prec_amvr is not None:
            out = round_to_precision(out, MV_PRECISION_INTERNAL, prec_amvr)
        return replace(out, ref_idx=ref_idx, bcw_idx_plus1=0, prec_amvr=0)

    def derive_tmvp_amvp(self, lst: int, ref_idx: int, ux, uy, nw, nh,
                         prec_amvr) -> MV | None:
        """derive_tmvp_cand parity (:403,431-433): collocated-plane probe
        order is (!col_ref_l0 && !ldc) || (ldc && lst==0) -> plane 0
        first, else plane 1 first (col_ref_l0 = ph/sh collocated_from_l0
        || P slice, slicedec.c:1441-1443)."""
        c1x, c1y = (ux + (nw >> 1)) & ~1, (uy + (nh >> 1)) & ~1
        c0x, c0y = (ux + nw) & ~1, (uy + nh) & ~1
        a_c0 = self._col_avail(0, c0x, c0y, uy, ux)
        a_c01 = self._col_avail(1, c0x, c0y, uy, ux)
        a_c1 = self._col_avail(0, c1x, c1y, uy, ux)
        a_c11 = self._col_avail(1, c1x, c1y, uy, ux)
        if ((not self.col_ref_l0) and not self.ldc) or (self.ldc and lst == 0):
            order = ((a_c0, 0, c0x, c0y), (a_c01, 1, c0x, c0y),
                     (a_c1, 0, c1x, c1y), (a_c11, 1, c1x, c1y))
        else:
            order = ((a_c01, 1, c0x, c0y), (a_c0, 0, c0x, c0y),
                     (a_c11, 1, c1x, c1y), (a_c1, 0, c1x, c1y))
        for avail, col_lst, cx, cy in order:
            if avail:
                mv = self._tmvp_scaled(lst, ref_idx, col_lst, cx, cy, prec_amvr)
                return replace(mv, prec_amvr=0)
        return None

    def derive_tmvp_merge_p(self, ux, uy, nw, nh) -> MV | None:
        """TMVP merge candidate, P path (vvc_derive_merge_mvp :760)."""
        c1x, c1y = (ux + (nw >> 1)) & ~1, (uy + (nh >> 1)) & ~1
        c0x, c0y = (ux + nw) & ~1, (uy + nh) & ~1
        for avail, col_lst, cx, cy in (
                (self._col_avail(0, c0x, c0y, uy, ux), 0, c0x, c0y),
                (self._col_avail(1, c0x, c0y, uy, ux), 1, c0x, c0y),
                (self._col_avail(0, c1x, c1y, uy, ux), 0, c1x, c1y),
                (self._col_avail(1, c1x, c1y, uy, ux), 1, c1x, c1y)):
            if avail:
                mv = self._tmvp_scaled(0, 0, col_lst, cx, cy)
                return replace(mv, ref_idx=0)
        return None

    def derive_tmvp_merge_b(self, ux, uy, nw, nh):
        """TMVP merge candidate, B path (vvc_derive_merge_mvp_b :1050-1250):
        bi candidate from c0 (both-plane aware) else c1; !col_ref_l0
        prefers the plane-0 MV, col_ref_l0 the plane-1 MV."""
        c1x, c1y = (ux + (nw >> 1)) & ~1, (uy + (nh >> 1)) & ~1
        c0x, c0y = (ux + nw) & ~1, (uy + nh) & ~1
        for (a0, a1, cx, cy) in (
                (self._col_avail(0, c0x, c0y, uy, ux),
                 self._col_avail(1, c0x, c0y, uy, ux), c0x, c0y),
                (self._col_avail(0, c1x, c1y, uy, ux),
                 self._col_avail(1, c1x, c1y, uy, ux), c1x, c1y)):
            if not (a0 or a1):
                continue
            if not self.col_ref_l0:
                if a0:
                    mv0 = self._tmvp_scaled(0, 0, 0, cx, cy)
                    if a1 and self.ldc:
                        mv1 = self._tmvp_scaled(1, 0, 1, cx, cy)
                    else:
                        mv1 = self._tmvp_scaled(1, 0, 0, cx, cy)
                else:
                    mv0 = self._tmvp_scaled(0, 0, 1, cx, cy)
                    mv1 = self._tmvp_scaled(1, 0, 1, cx, cy)
            else:
                if a1:
                    mv1 = self._tmvp_scaled(1, 0, 1, cx, cy)
                    if a0 and self.ldc:
                        mv0 = self._tmvp_scaled(0, 0, 0, cx, cy)
                    else:
                        mv0 = self._tmvp_scaled(0, 0, 1, cx, cy)
                else:
                    mv0 = self._tmvp_scaled(0, 0, 0, cx, cy)
                    mv1 = self._tmvp_scaled(1, 0, 0, cx, cy)
            return MergeInfo(3, mv0, mv1)
        return None

    # -- AMVP (derive_mvp_candidates_1 :542) ----------------------------
    def derive_mvp_cand(self, lst: int, ref_idx: int, ux: int, uy: int,
                        nw: int, nh: int, mvp_idx: int, inter_dir: int,
                        prec_amvr: int, is_small: bool) -> MV:
        opp = (self.rpl0_opp if lst == 0 else self.rpl1_opp)[ref_idx]
        olst = 1 - lst
        cand: list[MV] = []

        def probe(px, py):
            """A/B candidate: same-list same-ref first, else opp-list opp-ref."""
            if self._avail(lst, px, py) and self._mv_at(lst, px, py).ref_idx == ref_idx:
                cand.append(self._mv_at(lst, px, py))
                return True
            if self._avail(olst, px, py) and self._mv_at(olst, px, py).ref_idx == opp:
                cand.append(self._mv_at(olst, px, py))
                return True
            return False

        # A0 then A1 (left side), found stops the side
        if not probe(ux - 1, uy + nh):
            probe(ux - 1, uy + nh - 1)
        # B0, B1, B2 (above side)
        if not probe(ux + nw, uy - 1):
            if not probe(ux + nw - 1, uy - 1):
                probe(ux - 1, uy - 1)

        cand = [round_to_precision(c, MV_PRECISION_INTERNAL, prec_amvr) for c in cand]
        if len(cand) == 2 and mv_cmp(cand[0], cand[1]):
            cand.pop()

        if self.tmvp_enabled and len(cand) < 2 and not is_small:
            t = self.derive_tmvp_amvp(lst, ref_idx, ux, uy, nw, nh, prec_amvr)
            if t is not None:
                cand.append(t)

        if len(cand) < 2:
            self._hmvp_amvp(cand, inter_dir, ref_idx, opp)

        while len(cand) < 2:
            cand.append(MV(0, 0, ref_idx))
        cand = [round_to_precision(c, MV_PRECISION_INTERNAL, prec_amvr) for c in cand]
        return cand[mvp_idx]

    def _hmvp_amvp(self, cand: list[MV], inter_dir: int, ref_idx: int, opp: int):
        """hmvp_add_cand_1 parity: oldest-first, same-dir then opposite."""
        lut = self.hmvp
        for i in range(min(4, lut.nb_mv)):
            if len(cand) >= 2:
                return
            if lut.dir[i] & inter_dir:
                c = lut.mv0[i] if inter_dir & 0x1 else lut.mv1[i]
                if c.ref_idx == ref_idx:
                    cand.append(c)
            if len(cand) >= 2:
                return
            if lut.dir[i] & (3 - inter_dir):
                c = lut.mv0[i] if (3 - inter_dir) & 0x1 else lut.mv1[i]
                if c.ref_idx == opp:
                    cand.append(c)

    # -- merge (vvc_derive_merge_mvp :670) ------------------------------
    def derive_merge_mvp(self, ux: int, uy: int, nw: int, nh: int,
                         merge_idx: int, max_nb_cand: int, is_small: bool) -> MV:
        cand: list[MV] = []
        NONE = MV(-1, 0, -1)
        amvp = [NONE] * 5

        got_t = self._avail(0, ux + nw - 1, uy - 1)
        got_l = self._avail(0, ux - 1, uy + nh - 1)

        if got_t:  # B1
            mv = self._mv_at(0, ux + nw - 1, uy - 1)
            amvp[0] = mv
            cand.append(mv)
            if len(cand) - 1 == merge_idx:
                return mv
        if got_l:  # A1
            mv = self._mv_at(0, ux - 1, uy + nh - 1)
            amvp[1] = mv
            if not got_t or not mv_cmp2(mv, amvp[0]):
                cand.append(mv)
                if len(cand) - 1 == merge_idx:
                    return mv
        if self._avail(0, ux + nw, uy - 1):  # B0
            mv = self._mv_at(0, ux + nw, uy - 1)
            amvp[2] = mv
            if not got_t or not mv_cmp2(mv, amvp[0]):
                cand.append(mv)
                if len(cand) - 1 == merge_idx:
                    return mv
        if self._avail(0, ux - 1, uy + nh):  # A0
            mv = self._mv_at(0, ux - 1, uy + nh)
            amvp[3] = mv
            if not got_l or not mv_cmp2(mv, amvp[1]):
                cand.append(mv)
                if len(cand) - 1 == merge_idx:
                    return mv
        if len(cand) < 4 and self._avail(0, ux - 1, uy - 1):  # B2
            mv = self._mv_at(0, ux - 1, uy - 1)
            amvp[4] = mv
            if ((not got_l or not mv_cmp2(mv, amvp[1]))
                    and (not got_t or not mv_cmp2(mv, amvp[0]))):
                cand.append(mv)
                if len(cand) - 1 == merge_idx:
                    return mv

        if self.tmvp_enabled and not is_small:
            t = self.derive_tmvp_merge_p(ux, uy, nw, nh)
            if t is not None:
                cand.append(t)
                if len(cand) - 1 == merge_idx:
                    return t

        if len(cand) != max_nb_cand - 1:
            got = self._hmvp_merge(cand, amvp, got_t, got_l, merge_idx,
                                   max_nb_cand - 1)
            if got:
                return cand[-1]

        if 1 < len(cand) < max_nb_cand:
            a, b = cand[0], cand[1]
            ax = a.x + b.x
            ay = a.y + b.y
            ax += 1 - (ax >= 0)
            ay += 1 - (ay >= 0)
            avg = replace(a, x=ax >> 1, y=ay >> 1)
            if a.prec_amvr != b.prec_amvr:
                avg = replace(avg, prec_amvr=0)
            if len(cand) == merge_idx:
                return avg
            cand.append(avg)

        diff = merge_idx - len(cand)
        ref_idx = diff if diff <= self.nb_active_ref0 - 1 else 0
        while len(cand) < max_nb_cand:
            cand.append(MV(0, 0, ref_idx))
        return cand[-1]

    def _hmvp_merge(self, cand, amvp, got_t, got_l, merge_idx, max_min1) -> bool:
        """hmvp_add_merge_cand parity: newest-first, prune vs B1/A1 for the
        two newest entries only."""
        lut = self.hmvp
        for i in range(1, lut.nb_mv + 1):
            idx = lut.nb_mv - i
            if lut.dir[idx] & 0x1:
                mv = lut.mv0[idx]
                if i > 2 or ((not got_t or not mv_cmp2(mv, amvp[0]))
                             and (not got_l or not mv_cmp2(mv, amvp[1]))):
                    cand.append(mv)
                    if len(cand) == merge_idx + 1:
                        return True
                    if len(cand) == max_min1:
                        return False
        return False


# -- CU-level wrappers (drv_merge_mvp / drv_mvp_b P path) ---------------

def drv_merge_mvp_p(ictx: InterCtx, x0, y0, log2_w, log2_h, merge_idx,
                    max_nb_cand) -> MV:
    ux, uy = x0 >> 2, y0 >> 2
    nw, nh = (1 << log2_w) >> 2, (1 << log2_h) >> 2
    mv = ictx.derive_merge_mvp(ux, uy, nw, nh, merge_idx, max_nb_cand,
                               log2_w + log2_h <= 5)
    ictx.update_mv_ctx(mv, ux, uy, nw, nh, 0x1)
    return mv


def drv_mvp_p(ictx: InterCtx, x0, y0, log2_w, log2_h, mvd: MV, prec_amvr,
              mvp_idx, ref_idx) -> MV:
    """drv_mvp_b with inter_dir=0x1 (P uni-pred) parity."""
    ux, uy = x0 >> 2, y0 >> 2
    nw, nh = (1 << log2_w) >> 2, (1 << log2_h) >> 2
    mv = ictx.derive_mvp_cand(0, ref_idx, ux, uy, nw, nh, mvp_idx, 0x1,
                              prec_amvr, log2_w + log2_h <= 5)
    mvd_i = change_precision(mvd, prec_amvr, MV_PRECISION_INTERNAL)
    # BCW_DEFAULT = 2 (vcl_coding_unit.c :52), stored +1
    mv = replace(mv, x=mv.x + mvd_i.x, y=mv.y + mvd_i.y, ref_idx=ref_idx,
                 bcw_idx_plus1=3, prec_amvr=prec_amvr)
    ictx.update_mv_ctx(mv, ux, uy, nw, nh, 0x1)
    return mv


MV_MAX = (1 << 17) - 1
MV_MIN = -(1 << 17)


def tmvp_round_mv(val: int) -> int:
    """tmvp_round_mv parity (:119): mantissa/exponent MV compression.

    Python's bitwise ops on negative ints follow two's-complement with
    infinite sign extension, so the C int arithmetic maps directly."""
    sign = -1 if val < 0 else 0
    if ((val ^ sign) - (1 if sign else 0)) > 31:
        scale = ((val ^ sign) | 31).bit_length() - 1 - 5
        rnd = (1 << scale) >> 1
        n = (val + rnd) >> scale
        exponent = scale + ((n ^ sign) >> 5)
        mantissa = (n & 31) | (sign << 5)
        return (mantissa ^ 32) << (exponent - (1 if exponent else 0))
    return val


def tmvp_scale_mv(scale: int, mv: MV) -> MV:
    def one(v):
        p = scale * v
        r = (p + 128 - (1 if p >= 0 else 0)) >> 8
        return max(MV_MIN, min(MV_MAX, r))
    return replace(mv, x=one(mv.x), y=one(mv.y))


def _trunc_div(a: int, b: int) -> int:
    q = abs(a) // abs(b)
    return -q if (a < 0) != (b < 0) else q


def derive_tmvp_scale(dist_ref: int, dist_col: int) -> int:
    if dist_ref == dist_col or not dist_col:
        return 256
    dist_ref = max(-128, min(127, dist_ref))
    dist_col = max(-128, min(127, dist_col))
    scale = dist_ref * _trunc_div(0x4000 + abs(dist_col >> 1), dist_col)
    scale += 32
    scale >>= 6
    return max(-4096, min(4095, scale))


# ----------------------------------------------------------------------
# B slices (vvc_derive_merge_mvp_b :899, drv_mvp_b :899-980,
# hmvp_add_merge_cand_b :195, update_mv_ctx_b :1419)
# ----------------------------------------------------------------------

@dataclass
class MergeInfo:
    inter_dir: int = 3
    mv0: MV = None
    mv1: MV = None


def mi_cmp(a: MergeInfo, b: MergeInfo) -> bool:
    """mi_cmp parity: equal when same dir and the active lists' MVs match."""
    if a.inter_dir != b.inter_dir:
        return False
    if a.inter_dir & 0x1 and not (mv_cmp(a.mv0, b.mv0) and a.mv0.ref_idx == b.mv0.ref_idx):
        return False
    if a.inter_dir & 0x2 and not (mv_cmp(a.mv1, b.mv1) and a.mv1.ref_idx == b.mv1.ref_idx):
        return False
    return True


def _ictx_mi_at(ictx: InterCtx, ux: int, uy: int) -> MergeInfo:
    """Joint probe of both lists at a unit; unset-list MVs default to zero
    (the reference reads stale buffer values there, but they are never
    observable — usage is always masked by inter_dir)."""
    d0 = ictx._avail(0, ux, uy)
    d1 = ictx._avail(1, ux, uy)
    mv0 = ictx.mvs0.get((ux, uy), MV()) if d0 else ictx.mvs0.get((ux, uy), MV())
    mv1 = ictx.mvs1.get((ux, uy), MV()) if d1 else ictx.mvs1.get((ux, uy), MV())
    return MergeInfo(int(d0) | (int(d1) << 1), mv0, mv1)


def _avg_mv_pair(a: MV, b: MV) -> MV:
    x = a.x + b.x
    y = a.y + b.y
    x += 1 - (x >= 0)
    y += 1 - (y >= 0)
    return replace(a, x=x >> 1, y=y >> 1)


def derive_merge_mvp_b(ictx: InterCtx, ux, uy, nw, nh, merge_idx,
                       max_nb_cand, is_small) -> MergeInfo:
    cand: list[MergeInfo] = []
    ZMI = MergeInfo(3, MV(), MV())
    amvp = [ZMI] * 5

    got_t = ictx._avail(0, ux + nw - 1, uy - 1) or ictx._avail(1, ux + nw - 1, uy - 1)
    got_l = ictx._avail(0, ux - 1, uy + nh - 1) or ictx._avail(1, ux - 1, uy + nh - 1)

    if got_t:  # B1
        mi = _ictx_mi_at(ictx, ux + nw - 1, uy - 1)
        amvp[0] = mi
        cand.append(mi)
        if len(cand) - 1 == merge_idx:
            return mi
    if got_l:  # A1
        mi = _ictx_mi_at(ictx, ux - 1, uy + nh - 1)
        amvp[1] = mi
        if not got_t or not mi_cmp(mi, amvp[0]):
            cand.append(mi)
            if len(cand) - 1 == merge_idx:
                return mi
    if ictx._avail(0, ux + nw, uy - 1) or ictx._avail(1, ux + nw, uy - 1):  # B0
        mi = _ictx_mi_at(ictx, ux + nw, uy - 1)
        amvp[2] = mi
        if not got_t or not mi_cmp(mi, amvp[0]):
            cand.append(mi)
            if len(cand) - 1 == merge_idx:
                return mi
    if ictx._avail(0, ux - 1, uy + nh) or ictx._avail(1, ux - 1, uy + nh):  # A0
        mi = _ictx_mi_at(ictx, ux - 1, uy + nh)
        amvp[3] = mi
        if not got_l or not mi_cmp(mi, amvp[1]):
            cand.append(mi)
            if len(cand) - 1 == merge_idx:
                return mi
    if len(cand) < 4 and (ictx._avail(0, ux - 1, uy - 1) or ictx._avail(1, ux - 1, uy - 1)):  # B2
        mi = _ictx_mi_at(ictx, ux - 1, uy - 1)
        amvp[4] = mi
        if ((not got_l or not mi_cmp(mi, amvp[1]))
                and (not got_t or not mi_cmp(mi, amvp[0]))):
            cand.append(mi)
            if len(cand) - 1 == merge_idx:
                return mi

    if ictx.tmvp_enabled and not is_small:
        t = ictx.derive_tmvp_merge_b(ux, uy, nw, nh)
        if t is not None:
            cand.append(t)
            if len(cand) - 1 == merge_idx:
                return t

    if len(cand) != max_nb_cand - 1:
        lut = ictx.hmvp
        for i in range(1, lut.nb_mv + 1):
            idx = lut.nb_mv - i
            lut_mi = MergeInfo(lut.dir[idx], lut.mv0[idx], lut.mv1[idx])
            if i > 2 or ((not got_t or not mi_cmp(lut_mi, amvp[0]))
                         and (not got_l or not mi_cmp(lut_mi, amvp[1]))):
                cand.append(lut_mi)
                if len(cand) == merge_idx + 1:
                    return cand[-1]
                if len(cand) == max_nb_cand - 1:
                    break

    if 1 < len(cand) < max_nb_cand:
        a, b = cand[0], cand[1]
        inter_dir = a.inter_dir & b.inter_dir
        mv0, mv1 = a.mv0, a.mv1
        if inter_dir & 0x1:
            mv0 = _avg_mv_pair(a.mv0, b.mv0)
        elif b.inter_dir & 0x1:
            mv0 = b.mv0
            inter_dir |= 1
        elif a.inter_dir & 0x1:
            inter_dir |= 1
        if inter_dir & 0x2:
            mv1 = _avg_mv_pair(a.mv1, b.mv1)
        elif b.inter_dir & 0x2:
            mv1 = b.mv1
            inter_dir |= 2
        elif a.inter_dir & 0x2:
            inter_dir |= 2
        if len(cand) == merge_idx:
            pa = a.mv0.prec_amvr if a.inter_dir & 0x1 else a.mv1.prec_amvr
            pb = b.mv0.prec_amvr if b.inter_dir & 0x1 else b.mv1.prec_amvr
            prec = pa if pa == pb else 0
            mv0 = replace(mv0, prec_amvr=prec, bcw_idx_plus1=0)
            mv1 = replace(mv1, prec_amvr=prec, bcw_idx_plus1=0)
            return MergeInfo(inter_dir, mv0, mv1)
        cand.append(None)  # placeholder: C increments without storing

    diff = merge_idx - len(cand)
    nmin = min(ictx.nb_active_ref0, ictx.nb_active_ref1)
    ridx = diff if diff <= nmin - 1 else 0
    return MergeInfo(3, MV(0, 0, ridx), MV(0, 0, ridx))


def update_mv_ctx_b(ictx: InterCtx, mv0: MV, mv1: MV, ux, uy, nw, nh,
                    inter_dir: int):
    if inter_dir & 0x1:
        ictx.fill(0, mv0, ux, uy, nw, nh)
        ictx.fill_tmvp(0, mv0, ux, uy, nw, nh)
    if inter_dir & 0x2:
        ictx.fill(1, mv1, ux, uy, nw, nh)
        ictx.fill_tmvp(1, mv1, ux, uy, nw, nh)
    ictx.hmvp.update(mv0, mv1, inter_dir)


def drv_merge_mvp_b(ictx: InterCtx, x0, y0, log2_w, log2_h, merge_idx,
                    max_nb_cand) -> MergeInfo:
    ux, uy = x0 >> 2, y0 >> 2
    nw, nh = (1 << log2_w) >> 2, (1 << log2_h) >> 2
    mi = derive_merge_mvp_b(ictx, ux, uy, nw, nh, merge_idx, max_nb_cand,
                            log2_w + log2_h <= 5)
    update_mv_ctx_b(ictx, mi.mv0, mi.mv1, ux, uy, nw, nh, mi.inter_dir)
    return mi


def drv_mvp_b(ictx: InterCtx, x0, y0, log2_w, log2_h, mvd0: MV, mvd1: MV,
              prec_amvr, mvp_idx0, mvp_idx1, inter_dir, ref_idx0,
              ref_idx1, bcw_idx: int = 2) -> MergeInfo:
    """drv_mvp_b parity (AMVP, both directions, BCW index stored +1)."""
    ux, uy = x0 >> 2, y0 >> 2
    nw, nh = (1 << log2_w) >> 2, (1 << log2_h) >> 2
    is_small = log2_w + log2_h <= 5
    mv0 = MV()
    mv1 = MV()
    if inter_dir & 0x1:
        mv0 = ictx.derive_mvp_cand(0, ref_idx0, ux, uy, nw, nh, mvp_idx0,
                                   inter_dir & 0x1, prec_amvr, is_small)
        d = change_precision(mvd0, prec_amvr, MV_PRECISION_INTERNAL)
        mv0 = replace(mv0, x=mv0.x + d.x, y=mv0.y + d.y, ref_idx=ref_idx0,
                      bcw_idx_plus1=bcw_idx + 1, prec_amvr=prec_amvr)
    if inter_dir & 0x2:
        mv1 = ictx.derive_mvp_cand(1, ref_idx1, ux, uy, nw, nh, mvp_idx1,
                                   inter_dir & 0x2, prec_amvr, is_small)
        d = change_precision(mvd1, prec_amvr, MV_PRECISION_INTERNAL)
        mv1 = replace(mv1, x=mv1.x + d.x, y=mv1.y + d.y, ref_idx=ref_idx1,
                      bcw_idx_plus1=bcw_idx + 1, prec_amvr=prec_amvr)
    update_mv_ctx_b(ictx, mv0, mv1, ux, uy, nw, nh, inter_dir)
    return MergeInfo(inter_dir, mv0, mv1)


# ----------------------------------------------------------------------
# MMVD (drv_mmvd_merge_mvp :1637 / drv_mmvd_merge_mvp_b :1848)
# ----------------------------------------------------------------------

_MMVD_STEPS = (1, 2, 4, 8, 16, 32, 64, 128)
MMVD_MAX_REFINE_NUM = 32  # 8 steps * 4 directions


def _mmvd_offset(idx: int, mmvd_shift: int) -> tuple[int, int]:
    f_pos_step = idx >> 2
    f_pos = idx & 3
    off = (_MMVD_STEPS[f_pos_step] << 2) << mmvd_shift
    if f_pos == 0:
        return off, 0
    if f_pos == 1:
        return -off, 0
    if f_pos == 2:
        return 0, off
    return 0, -off


def drv_mmvd_merge_mvp_p(ictx: InterCtx, x0, y0, log2_w, log2_h, merge_idx,
                         max_nb_cand, mmvd_shift) -> MV:
    ux, uy = x0 >> 2, y0 >> 2
    nw, nh = (1 << log2_w) >> 2, (1 << log2_h) >> 2
    base_idx = merge_idx // MMVD_MAX_REFINE_NUM
    mv = ictx.derive_merge_mvp(ux, uy, nw, nh, base_idx, max_nb_cand,
                               log2_w + log2_h <= 5)
    idx = merge_idx % (2 * MMVD_MAX_REFINE_NUM) % MMVD_MAX_REFINE_NUM
    dx, dy = _mmvd_offset(idx, mmvd_shift)
    mv = replace(mv, x=mv.x + dx, y=mv.y + dy)
    ictx.update_mv_ctx(mv, ux, uy, nw, nh, 0x1)
    return mv


def drv_mmvd_merge_mvp_b(ictx: InterCtx, x0, y0, log2_w, log2_h, merge_idx,
                         max_nb_cand, mmvd_shift) -> MergeInfo:
    ux, uy = x0 >> 2, y0 >> 2
    nw, nh = (1 << log2_w) >> 2, (1 << log2_h) >> 2
    is_small = log2_w + log2_h <= 5
    base_idx = merge_idx // MMVD_MAX_REFINE_NUM
    mi = derive_merge_mvp_b(ictx, ux, uy, nw, nh, base_idx, max_nb_cand,
                            is_small)
    idx = merge_idx - (merge_idx // (2 * MMVD_MAX_REFINE_NUM)) * 2 * MMVD_MAX_REFINE_NUM
    idx -= base_idx * MMVD_MAX_REFINE_NUM
    dx, dy = _mmvd_offset(idx, mmvd_shift)
    mvd0 = MV(dx, dy)
    mvd1 = MV(dx, dy)
    if mi.inter_dir == 3:
        d0 = ictx.dist_ref0[mi.mv0.ref_idx]
        d1 = ictx.dist_ref1[mi.mv1.ref_idx]
        if d0 == d1:
            pass
        elif abs(d0) < abs(d1):
            scale = derive_tmvp_scale(d0, d1)
            mvd0 = tmvp_scale_mv(scale, mvd1)
        else:
            scale = derive_tmvp_scale(d1, d0)
            mvd1 = tmvp_scale_mv(scale, mvd0)
    elif mi.inter_dir == 2:
        mvd0 = MV(0, 0)
    else:
        mvd1 = MV(0, 0)
    mv0 = replace(mi.mv0, x=mi.mv0.x + mvd0.x, y=mi.mv0.y + mvd0.y)
    mv1 = replace(mi.mv1, x=mi.mv1.x + mvd1.x, y=mi.mv1.y + mvd1.y)
    inter_dir = mi.inter_dir
    if is_small and inter_dir == 3:
        inter_dir = 1
    update_mv_ctx_b(ictx, mv0, mv1, ux, uy, nw, nh, inter_dir)
    return MergeInfo(inter_dir, mv0, mv1)


def _affine_corner_tmvp(ictx, ux, uy, nw, nh):
    """C0 TMVP corner for the constructed affine merge candidate
    (merge_tmvp_from_ldc / merge_tmvp_from_l0 / merge_tmvp_from_l1,
    drv_affine_mvp.c :666/:812/:900, dispatched on ldc / col_ref_l0
    at :2786-2793). dst0 always scales with dist_ref0[0], dst1 with
    dist_ref1[0]; the source collocated plane(s) depend on the mode.
    Returns (dir, mv0, mv1)."""
    c0x, c0y = (ux + nw) & ~1, (uy + nh) & ~1
    a0 = ictx._col_avail(0, c0x, c0y, uy, ux)
    a1 = ictx._col_avail(1, c0x, c0y, uy, ux)
    if not (a0 or a1):
        return 0, None, None

    def dref(lst):
        d = ictx.dist_ref0 if lst == 0 else ictx.dist_ref1
        return d[0] if d else 0

    def scaled(col_lst, lst_cur):
        mv = ictx._col_mv(col_lst, c0x, c0y)
        dist_col = (ictx.col[4] if col_lst == 0 else ictx.col[5])[mv.ref_idx]
        scale = derive_tmvp_scale(dref(lst_cur), dist_col)
        out = MV(tmvp_round_mv(mv.x), tmvp_round_mv(mv.y))
        out = tmvp_scale_mv(scale, out)
        return replace(out, ref_idx=0, bcw_idx_plus1=0, prec_amvr=0)

    if ictx.ldc:
        if a0 and a1:
            # both collocated planes feed their matching list; crossed
            # when the collocated picture comes from list 0 (:687/:717)
            if not ictx.col_ref_l0:
                return 3, scaled(0, 0), scaled(1, 1)
            return 3, scaled(1, 0), scaled(0, 1)
        src = 0 if a0 else 1
        return 3, scaled(src, 0), scaled(src, 1)
    # non-ldc: one collocated plane feeds BOTH lists; plane preference
    # follows the collocated list (:830 prefers plane 0, :904 plane 1)
    if not ictx.col_ref_l0:
        src = 0 if a0 else 1
    else:
        src = 1 if a1 else 0
    return 3, scaled(src, 0), scaled(src, 1)


InterCtx.derive_affine_corner_tmvp = lambda self, ux, uy, nw, nh: \
    _affine_corner_tmvp(self, ux, uy, nw, nh)

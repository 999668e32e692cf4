"""Affine motion: CPMV derivation, merge/AMVP lists, sub-block MVs, PROF.

Behavior parity: /root/reference/libovvc/drv_affine_mvp.c —
derive_affine_delta_mvs (:982), derive_cp_from_cand (:1016),
drv_affine_mvp (:1225), derive_affine_merge_mv (:2565),
derive_affine_control_point_0/1 (:2259/:2349), broadcast_mv (:2898),
compute_subblock_mvs (:2943), compute_prof_dmv_scale (:3213),
drv_affine_mvp_p/b (:3441/:3565), drv_affine_merge_mvp_p/b (:3737/:3871),
store_affine_info (:3169), cross-CTU-row inheritance via the line buffer
(drv_lines.c rotate_affine_cp :336 — lt/rt become the bottom-row
sub-block MVs of the neighbour).
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace

from openvvc_tpu.drv.inter_mvp import (
    MV,
    MV_PRECISION_INTERNAL,
    InterCtx,
    change_precision,
    round_to_precision,
)

AFFINE_SHIFT = 7
RND_AFF = 4 << 11
HALF_SB = 2
SB_SIZE = 4
MV_MAX = (1 << 17) - 1
MV_MIN = -(1 << 17)
CLIP_PERIOD = 1 << 18

# candidate names (enum CandName)
A0, A1, A2, A3, B0, B1, B2, B3 = range(8)


@dataclass
class CPInfo:
    lt: MV = field(default_factory=MV)
    rt: MV = field(default_factory=MV)
    lb: MV = field(default_factory=MV)


@dataclass
class AffineMergeInfo:
    cinfo: list = None  # [CPInfo, CPInfo]
    inter_dir: int = 0
    affine_type: int = 0

    def __post_init__(self):
        if self.cinfo is None:
            self.cinfo = [CPInfo(), CPInfo()]


@dataclass
class AffInfo:
    cps: list  # [CPInfo, CPInfo]
    type: int
    ux: int
    uy: int
    nw: int
    nh: int
    log2_w: int
    log2_h: int


def clip_mv18(mv: MV) -> MV:
    return replace(mv, x=max(MV_MIN, min(MV_MAX, mv.x)),
                   y=max(MV_MIN, min(MV_MAX, mv.y)))


def mv_clip_periodic(mv: MV) -> MV:
    x = (mv.x + CLIP_PERIOD) & (CLIP_PERIOD - 1)
    y = (mv.y + CLIP_PERIOD) & (CLIP_PERIOD - 1)
    x = x - CLIP_PERIOD if x >= (CLIP_PERIOD >> 1) else x
    y = y - CLIP_PERIOD if y >= (CLIP_PERIOD >> 1) else y
    return replace(mv, x=x, y=y)


def round_affine_mv2(mv: MV) -> MV:
    rnd = 1 << (AFFINE_SHIFT - 1)
    x = mv.x + rnd - (1 if mv.x >= 0 else 0)
    y = mv.y + rnd - (1 if mv.y >= 0 else 0)
    return replace(mv, x=x >> AFFINE_SHIFT, y=y >> AFFINE_SHIFT)


def round_affine_prec(mv: MV, prec_amvr: int) -> MV:
    return round_to_precision(mv, MV_PRECISION_INTERNAL, prec_amvr)


@dataclass
class DeltaMV:
    h: MV
    v: MV


def derive_affine_delta_mvs(c: CPInfo, log2_w: int, log2_h: int,
                            affine_type: int) -> DeltaMV:
    sh = AFFINE_SHIFT - log2_w
    h = MV((c.rt.x - c.lt.x) << sh, (c.rt.y - c.lt.y) << sh)
    if affine_type:  # 3CP
        sv = AFFINE_SHIFT - log2_h
        v = MV((c.lb.x - c.lt.x) << sv, (c.lb.y - c.lt.y) << sv)
    else:
        v = MV(-h.y, h.x)
    return DeltaMV(h, v)


class AffineCtx:
    """Per-tile affine state plugged into InterCtx."""

    def __init__(self, ictx: InterCtx, log2_ctb: int, enabled_6params: bool,
                 prof_enabled: bool, nb_merge_cand: int, amvr: bool):
        self.ictx = ictx
        self.log2_ctb = log2_ctb
        self.params6 = enabled_6params
        self.prof_enabled = prof_enabled
        self.nb_merge_cand = nb_merge_cand
        self.affine_amvr = amvr
        uw, uh = ictx.uw, ictx.uh
        self.aff_dir = [[0] * uw for _ in range(uh)]
        self.aff_info: dict[tuple[int, int], AffInfo] = {}

    # -- availability ----------------------------------------------------
    def _cand_pos(self, ux, uy, nw, nh, cand):
        return {
            A0: (ux - 1, uy + nh),
            A1: (ux - 1, uy + nh - 1),
            A2: (ux - 1, uy),
            A3: (ux - 1, uy - 1),
            B0: (ux + nw, uy - 1),
            B1: (ux + nw - 1, uy - 1),
            B2: (ux - 1, uy - 1),
            B3: (ux, uy - 1),
        }[cand]

    def _avail_masks(self, ux, uy, nw, nh):
        """(aff_mask, rpl0_mask, rpl1_mask) over the 8 candidate names."""
        ictx = self.ictx

        def bit(m, px, py):
            if px < 0 or py < 0 or px >= ictx.uw or py >= ictx.uh:
                return 0
            return 1 if m[py][px] else 0

        aff = rp0 = rp1 = 0
        for cand in range(8):
            px, py = self._cand_pos(ux, uy, nw, nh, cand)
            aff |= bit(self.aff_dir, px, py) << cand
            rp0 |= bit(ictx.dir0, px, py) << cand
            rp1 |= bit(ictx.dir1, px, py) << cand
        return aff, rp0, rp1

    # -- CP inheritance --------------------------------------------------
    def _ngh_cps(self, info: AffInfo, lst: int, cand_above_row: bool):
        """Stored CPs, or the line-buffer form for the CTU row above
        (rotate_affine_cp: lt/rt = bottom sub-block MVs)."""
        if not cand_above_row:
            return info.cps[lst]
        ictx = self.ictx
        mvs = ictx.mvs0 if lst == 0 else ictx.mvs1
        by = info.uy + info.nh - 1
        lt = mvs[(info.ux, by)]
        rt = mvs[(info.ux + info.nw - 1, by)]
        return CPInfo(lt, rt, MV())

    def derive_cp_from_cand(self, ngh_cps: CPInfo, ngh: AffInfo, ngh_type,
                            ux, uy, log2_w, log2_h, affine_type,
                            cand_above_row: bool) -> CPInfo:
        """derive_cp_from_cand parity, tile-coordinate form (the CTU-wrap
        terms reduce to plain tile deltas)."""
        x0, y0 = ux << 2, uy << 2
        ngh_x0, ngh_y0 = ngh.ux << 2, ngh.uy << 2
        delta_pos_x = x0 - ngh_x0
        delta_pos_y = 0 if cand_above_row else (y0 - ngh_y0)

        dmv = derive_affine_delta_mvs(ngh_cps, ngh.log2_w, ngh.log2_h, ngh_type)
        if cand_above_row or ngh_type == 0:
            dmv = DeltaMV(dmv.h, MV(-dmv.h.y, dmv.h.x))

        ref_idx = ngh_cps.lt.ref_idx
        bcw = ngh_cps.lt.bcw_idx_plus1
        prec = ngh_cps.lt.prec_amvr

        lt_x = (ngh_cps.lt.x << AFFINE_SHIFT) + dmv.h.x * delta_pos_x + dmv.v.x * delta_pos_y
        lt_y = (ngh_cps.lt.y << AFFINE_SHIFT) + dmv.h.y * delta_pos_x + dmv.v.y * delta_pos_y

        def fin(x, y):
            m = round_affine_mv2(MV(x, y))
            m = clip_mv18(m)
            return replace(m, ref_idx=ref_idx, bcw_idx_plus1=bcw, prec_amvr=prec)

        lt = fin(lt_x, lt_y)
        rt = fin(lt_x + (dmv.h.x << log2_w), lt_y + (dmv.h.y << log2_w))
        lb = MV()
        if affine_type:
            lb = fin(lt_x + (dmv.v.x << log2_h), lt_y + (dmv.v.y << log2_h))
        return CPInfo(lt, rt, lb)

    def _is_above_row(self, cand, uy):
        """Candidate row sits in the CTU row above the current CU's."""
        sh = self.log2_ctb - 2
        return (uy - 1) >> sh != uy >> sh if True else False

    # -- affine AMVP (drv_affine_mvp :1225) ------------------------------
    def _affine_amvp_cand(self, ux, uy, nw, nh, log2_w, log2_h, cand,
                          inter_dir, ref_idx, ref_opp, rp0, rp1, aff,
                          prec_amvr, affine_type):
        if not (aff & (1 << cand)):
            return None
        lst = inter_dir - 1
        rpl_msk = rp1 if lst else rp0
        rpl_opp_msk = rp0 if lst else rp1
        px, py = self._cand_pos(ux, uy, nw, nh, cand)
        info = self.aff_info.get((px, py))
        if info is None:
            return None
        above_row = cand >= A3 and ((uy - 1) >> (self.log2_ctb - 2)) != (uy >> (self.log2_ctb - 2)) and py < uy
        cp = None
        if rpl_msk & (1 << cand):
            ngh = self._ngh_cps(info, lst, above_row)
            if ngh.lt.ref_idx == ref_idx:
                cp = self.derive_cp_from_cand(ngh, info, info.type, ux, uy,
                                              log2_w, log2_h, affine_type,
                                              above_row)
        if cp is None and (rpl_opp_msk & (1 << cand)):
            ngh = self._ngh_cps(info, 1 - lst, above_row)
            if ngh.lt.ref_idx == ref_opp:
                cp = self.derive_cp_from_cand(ngh, info, info.type, ux, uy,
                                              log2_w, log2_h, affine_type,
                                              above_row)
                cp.lt = replace(cp.lt, ref_idx=ref_idx)
                cp.rt = replace(cp.rt, ref_idx=ref_idx)
                if affine_type:
                    cp.lb = replace(cp.lb, ref_idx=ref_idx)
        if cp is None:
            return None
        cp.lt = round_affine_prec(cp.lt, prec_amvr)
        cp.rt = round_affine_prec(cp.rt, prec_amvr)
        if affine_type:
            cp.lb = round_affine_prec(cp.lb, prec_amvr)
        return cp

    def _mvp_cand(self, ux, uy, nw, nh, cand, inter_dir, ref_idx, ref_opp,
                  rp0, rp1):
        """derive_mvp_cand parity (translational corner candidate)."""
        ictx = self.ictx
        lst = inter_dir - 1
        px, py = self._cand_pos(ux, uy, nw, nh, cand)
        rpl_list = rp1 if lst else rp0
        rpl_opp = rp0 if lst else rp1
        mvs = ictx.mvs1 if lst else ictx.mvs0
        mvs_opp = ictx.mvs0 if lst else ictx.mvs1
        if rpl_list & (1 << cand):
            mv = mvs[(px, py)]
            if mv.ref_idx == ref_idx:
                return mv
        if rpl_opp & (1 << cand):
            mv = mvs_opp[(px, py)]
            if mv.ref_idx == ref_opp:
                return replace(mv, ref_idx=ref_idx)
        return None

    def affine_amvp(self, ux, uy, nw, nh, log2_w, log2_h, ref_idx, ref_opp,
                    mvp_idx, inter_dir, affine_type, prec_amvr) -> CPInfo:
        aff, rp0, rp1 = self._avail_masks(ux, uy, nw, nh)
        cand_list = []

        def try_aff(cands):
            for c in cands:
                cp = self._affine_amvp_cand(ux, uy, nw, nh, log2_w, log2_h, c,
                                            inter_dir, ref_idx, ref_opp,
                                            rp0, rp1, aff, prec_amvr,
                                            affine_type)
                if cp is not None:
                    return cp
            return None

        lft = try_aff((A0, A1))
        if lft is not None:
            cand_list.append(lft)
        abv = try_aff((B0, B1, B2))
        if abv is not None:
            cand_list.append(abv)

        if len(cand_list) >= 2:
            out = []
            for cp in cand_list:
                out.append(CPInfo(round_affine_prec(cp.lt, prec_amvr),
                                  round_affine_prec(cp.rt, prec_amvr),
                                  round_affine_prec(cp.lb, prec_amvr)))
            return out[mvp_idx]

        # constructed from translational corners
        def try_mv(cands):
            for c in cands:
                mv = self._mvp_cand(ux, uy, nw, nh, c, inter_dir, ref_idx,
                                    ref_opp, rp0, rp1)
                if mv is not None:
                    return mv
            return None

        lt = try_mv((B2, B3, A2))
        rt = try_mv((B1, B0))
        lb = try_mv((A1, A0))
        mask = (1 if lt else 0) | (2 if rt else 0) | (4 if lb else 0)
        mv_lt = round_affine_prec(lt or MV(), prec_amvr)
        mv_rt = round_affine_prec(rt or MV(), prec_amvr)
        mv_lb = round_affine_prec(lb or MV(), prec_amvr)

        if mask == 0x7 or (mask == 0x3 and affine_type == 0):
            cand_list.append(CPInfo(mv_lt, mv_rt, mv_lb))
        if len(cand_list) < 2 and mask & 0x4:
            cand_list.append(CPInfo(mv_lb, mv_lb, mv_lb))
        if len(cand_list) < 2 and mask & 0x2:
            cand_list.append(CPInfo(mv_rt, mv_rt, mv_rt))
        if len(cand_list) < 2 and mask & 0x1:
            cand_list.append(CPInfo(mv_lt, mv_lt, mv_lt))

        ictx = self.ictx
        if len(cand_list) < 2 and ictx.tmvp_enabled:
            t = ictx.derive_tmvp_amvp(inter_dir - 1, ref_idx, ux, uy, nw, nh,
                                      None)
            if t is not None:
                t = round_affine_prec(t, prec_amvr)
                t = replace(t, ref_idx=ref_idx)
                cand_list.append(CPInfo(t, t, t))

        while len(cand_list) < 2:
            z = MV()
            cand_list.append(CPInfo(z, z, z))

        out = []
        for cp in cand_list:
            out.append(CPInfo(round_affine_prec(cp.lt, prec_amvr),
                              round_affine_prec(cp.rt, prec_amvr),
                              round_affine_prec(cp.lb, prec_amvr)
                              if affine_type else cp.lb))
        return out[mvp_idx]

    # -- affine merge (derive_affine_merge_mv :2565) ---------------------
    def affine_merge(self, ux, uy, nw, nh, log2_w, log2_h, mrg_idx) -> AffineMergeInfo:
        ictx = self.ictx
        aff, rp0, rp1 = self._avail_masks(ux, uy, nw, nh)
        nb_cand = 0
        out = AffineMergeInfo()

        def inherit(cand):
            px, py = self._cand_pos(ux, uy, nw, nh, cand)
            info = self.aff_info[(px, py)]
            above_row = cand >= A3 and py < uy and ((uy - 1) >> (self.log2_ctb - 2)) != (uy >> (self.log2_ctb - 2))
            d = ((1 if rp0 & (1 << cand) else 0)
                 | (2 if rp1 & (1 << cand) else 0))
            cp0 = CPInfo()
            cp1 = CPInfo()
            if d & 1:
                cp0 = self.derive_cp_from_cand(self._ngh_cps(info, 0, above_row),
                                               info, info.type, ux, uy,
                                               log2_w, log2_h, info.type,
                                               above_row)
            if d & 2:
                cp1 = self.derive_cp_from_cand(self._ngh_cps(info, 1, above_row),
                                               info, info.type, ux, uy,
                                               log2_w, log2_h, info.type,
                                               above_row)
            return AffineMergeInfo([cp0, cp1], d, info.type)

        lft_msk = (1 << A0) if aff & (1 << A0) else (aff & (1 << A1))
        if lft_msk:
            out = inherit(A0 if lft_msk & (1 << A0) else A1)
            if nb_cand == mrg_idx:
                return out
            nb_cand += 1
        abv_msk = 0
        for c in (B0, B1, B2):
            if aff & (1 << c):
                abv_msk = 1 << c
                break
        if abv_msk:
            out = inherit(abv_msk.bit_length() - 1)
            if nb_cand == mrg_idx:
                return out
            nb_cand += 1

        # constructed
        mi0 = [None] * 4
        mi1 = [None] * 4

        def corner(cands, idx):
            for c in cands:
                if (rp0 | rp1) & (1 << c):
                    px, py = self._cand_pos(ux, uy, nw, nh, c)
                    mi0[idx] = ictx.mvs0[(px, py)] if rp0 & (1 << c) else None
                    mi1[idx] = ictx.mvs1[(px, py)] if rp1 & (1 << c) else None
                    return True
            return False

        avail_cp = 0
        if corner((B2, B3, A2), 0):
            avail_cp |= 1
        if corner((B1, B0), 1):
            avail_cp |= 2
        if corner((A1, A0), 2):
            avail_cp |= 4
        if ictx.tmvp_enabled:
            # C0-only TMVP corner (cand_msk &= 0x3, drv_affine_mvp.c :2776)
            dir_t, t0, t1 = ictx.derive_affine_corner_tmvp(ux, uy, nw, nh)
            if dir_t & 1:
                mi0[3] = t0
                avail_cp |= 8
            if dir_t & 2:
                mi1[3] = t1
                avail_cp |= 8

        def cp_model3(model):
            combos = {0: (0, 1, 2), 1: (0, 1, 3), 2: (0, 2, 3), 3: (1, 2, 3)}
            ids = combos[model]
            res = AffineMergeInfo()
            d = 0
            for lst, mi in ((0, mi0), (1, mi1)):
                got = all(mi[i] is not None for i in ids)
                if got and len({mi[i].ref_idx for i in ids}) == 1:
                    mv = [mi[0], mi[1], mi[2], mi[3]]
                    ref = mi[ids[0]].ref_idx
                    bcw = mi[ids[0]].bcw_idx_plus1
                    prec = mi[ids[0]].prec_amvr
                    if model == 0:
                        c0, c1, c2 = mv[0], mv[1], mv[2]
                    elif model == 1:
                        c0, c1 = mv[0], mv[1]
                        c2 = clip_mv18(MV(mv[0].x - mv[1].x + mv[3].x,
                                          mv[0].y - mv[1].y + mv[3].y))
                    elif model == 2:
                        c0, c2 = mv[0], mv[2]
                        c1 = clip_mv18(MV(mv[0].x - mv[2].x + mv[3].x,
                                          mv[0].y - mv[2].y + mv[3].y))
                    else:
                        c1, c2 = mv[1], mv[2]
                        c0 = clip_mv18(MV(mv[1].x + mv[2].x - mv[3].x,
                                          mv[1].y + mv[2].y - mv[3].y))
                    fix = lambda m: replace(m, ref_idx=ref, bcw_idx_plus1=bcw,
                                            prec_amvr=prec)
                    cp = CPInfo(fix(c0), fix(c1), fix(c2))
                    res.cinfo[lst] = cp
                    d |= 1 << lst
            if d == 0:
                return None
            res.inter_dir = d
            res.affine_type = 1
            return res

        def cp_model2(model):
            res = AffineMergeInfo()
            d = 0
            for lst, mi in ((0, mi0), (1, mi1)):
                if model == 0:
                    ok = mi[0] is not None and mi[1] is not None and \
                        mi[0].ref_idx == mi[1].ref_idx
                    if ok:
                        cp = CPInfo(mi[0], mi[1], MV())
                        res.cinfo[lst] = cp
                        d |= 1 << lst
                else:
                    ok = mi[0] is not None and mi[2] is not None and \
                        mi[0].ref_idx == mi[2].ref_idx
                    if ok:
                        sh = AFFINE_SHIFT + log2_w - log2_h
                        tx = (mi[0].x << AFFINE_SHIFT) + ((mi[2].y - mi[0].y) << sh)
                        ty = (mi[0].y << AFFINE_SHIFT) - ((mi[2].x - mi[0].x) << sh)
                        rt = clip_mv18(round_affine_mv2(MV(tx, ty)))
                        rt = replace(rt, ref_idx=mi[0].ref_idx,
                                     bcw_idx_plus1=mi[0].bcw_idx_plus1,
                                     prec_amvr=mi[0].prec_amvr)
                        cp = CPInfo(mi[0], rt, mi[2])
                        res.cinfo[lst] = cp
                        d |= 1 << lst
            if d == 0:
                return None
            res.inter_dir = d
            res.affine_type = 0
            return res

        masks3 = ((0x7, 0), (0xB, 1), (0xD, 2), (0xE, 3))
        if self.params6:
            for need, model in masks3:
                if (avail_cp & need) == need:
                    r = cp_model3(model)
                    if r is not None:
                        out = r
                        if nb_cand == mrg_idx:
                            return out
                        nb_cand += 1
        for need, model in ((0x3, 0), (0x5, 1)):
            if (avail_cp & need) == need:
                r = cp_model2(model)
                if r is not None:
                    out = r
                    if nb_cand == mrg_idx:
                        return out
                    nb_cand += 1

        z = CPInfo()
        return AffineMergeInfo([z, CPInfo()], 3, 0)

    # -- sub-block MVs + storage ----------------------------------------
    def compute_subblock_mvs(self, c: CPInfo, dmv: DeltaMV, log2_w, log2_h,
                             broad: bool):
        nw = (1 << log2_w) >> 2
        nh = (1 << log2_h) >> 2
        out = [[None] * nw for _ in range(nh)]
        base = dict(ref_idx=c.lt.ref_idx, bcw_idx_plus1=c.lt.bcw_idx_plus1,
                    prec_amvr=c.lt.prec_amvr)
        if not broad:
            vx = (c.lt.x << AFFINE_SHIFT) + dmv.h.x * HALF_SB + dmv.v.x * HALF_SB
            vy = (c.lt.y << AFFINE_SHIFT) + dmv.h.y * HALF_SB + dmv.v.y * HALF_SB
            for i in range(nh):
                hx, hy = vx, vy
                for j in range(nw):
                    m = clip_mv18(round_affine_mv2(MV(hx, hy)))
                    out[i][j] = replace(m, **base)
                    hx += SB_SIZE * dmv.h.x
                    hy += SB_SIZE * dmv.h.y
                vx += SB_SIZE * dmv.v.x
                vy += SB_SIZE * dmv.v.y
        else:
            cx = (c.lt.x << AFFINE_SHIFT) + ((dmv.h.x << log2_w) >> 1) + ((dmv.v.x << log2_h) >> 1)
            cy = (c.lt.y << AFFINE_SHIFT) + ((dmv.h.y << log2_w) >> 1) + ((dmv.v.y << log2_h) >> 1)
            m = clip_mv18(round_affine_mv2(MV(cx, cy)))
            m = replace(m, **base)
            for i in range(nh):
                for j in range(nw):
                    out[i][j] = m
        return out


def broadcast_mv(dmv: DeltaMV, inter_dir: int) -> bool:
    NB_TAP_PLUS3, NB_TAP_PLUS5, NB_TAP_PLUS9 = 9, 11, 15
    a = dmv.h.x * 4
    b = dmv.h.y * 4
    c = dmv.v.x * 4
    d = dmv.v.y * 4
    if inter_dir == 3:
        blk_w = max(0, a + RND_AFF, c, a + c + RND_AFF) - min(0, a + RND_AFF, c, a + c + RND_AFF)
        blk_h = max(0, b, d + RND_AFF, b + d + RND_AFF) - min(0, b, d + RND_AFF, b + d + RND_AFF)
        blk_w = (blk_w >> 11) + NB_TAP_PLUS3
        blk_h = (blk_h >> 11) + NB_TAP_PLUS3
        return blk_w * blk_h > NB_TAP_PLUS9 * NB_TAP_PLUS9
    blk_w = max(0, a + RND_AFF) - min(0, a + RND_AFF)
    blk_h = max(0, b) - min(0, b)
    blk_w = (blk_w >> 11) + NB_TAP_PLUS3
    blk_h = (blk_h >> 11) + NB_TAP_PLUS3
    if blk_w * blk_h > NB_TAP_PLUS9 * NB_TAP_PLUS5:
        return True
    blk_w = max(0, c) - min(0, c)
    blk_h = max(0, d + RND_AFF) - min(0, d + RND_AFF)
    blk_h = (blk_h >> 11) + NB_TAP_PLUS3
    blk_w = (blk_w >> 11) + NB_TAP_PLUS3
    return blk_w * blk_h > NB_TAP_PLUS5 * NB_TAP_PLUS9


def compute_prof_dmv_scale(dmv: DeltaMV):
    """compute_prof_dmv_scale parity -> (dmv_h[16], dmv_v[16])."""
    PROF_DMV_MAX = 31
    qhx, qhy = dmv.h.x << 2, dmv.h.y << 2
    qvx, qvy = dmv.v.x << 2, dmv.v.y << 2
    ht = [0] * 16
    vt = [0] * 16
    ht[0] = ((dmv.h.x + dmv.v.x) << 1) - ((qhx + qvx) << 1)
    vt[0] = ((dmv.h.y + dmv.v.y) << 1) - ((qhy + qvy) << 1)
    for x in range(1, 4):
        ht[x] = ht[x - 1] + qhx
        vt[x] = vt[x - 1] + qhy
    for y in range(1, 4):
        for x in range(4):
            ht[y * 4 + x] = ht[(y - 1) * 4 + x] + qvx
            vt[y * 4 + x] = vt[(y - 1) * 4 + x] + qvy
    outh = [0] * 16
    outv = [0] * 16
    for i in range(16):
        dx = ht[i] + 128 - (1 if ht[i] >= 0 else 0)
        dy = vt[i] + 128 - (1 if vt[i] >= 0 else 0)
        dx >>= 8
        dy >>= 8
        outh[i] = max(-PROF_DMV_MAX, min(PROF_DMV_MAX, dx))
        outv[i] = max(-PROF_DMV_MAX, min(PROF_DMV_MAX, dy))
    return outh, outv


def check_affine_prof(mi: AffineMergeInfo, lst: int) -> bool:
    cp = mi.cinfo[lst]
    if mi.affine_type:
        return not ((cp.lt.x == cp.rt.x and cp.lt.y == cp.rt.y)
                    and (cp.lt.x == cp.lb.x and cp.lt.y == cp.lb.y))
    return not (cp.lt.x == cp.rt.x and cp.lt.y == cp.rt.y)


def store_and_subblocks(actx: AffineCtx, mi: AffineMergeInfo, ux, uy,
                        log2_w, log2_h):
    """update_mv_ctx_b (:3088) + store_affine_info: fills the mv/tmvp maps
    with sub-block MVs and records the CP info; returns
    (sub0, sub1, prof_allowed_mask, dmv0, dmv1)."""
    ictx = actx.ictx
    nw = (1 << log2_w) >> 2
    nh = (1 << log2_h) >> 2
    for j in range(nh):
        for i in range(nw):
            actx.aff_dir[uy + j][ux + i] = 1

    dmv0 = derive_affine_delta_mvs(mi.cinfo[0], log2_w, log2_h, mi.affine_type)
    dmv1 = derive_affine_delta_mvs(mi.cinfo[1], log2_w, log2_h, mi.affine_type)
    sub0 = sub1 = None
    prof_mask = 0
    if mi.inter_dir & 1:
        broad = broadcast_mv(dmv0, mi.inter_dir)
        sub0 = actx.compute_subblock_mvs(mi.cinfo[0], dmv0, log2_w, log2_h, broad)
        for j in range(nh):
            for i in range(nw):
                ictx.dir0[uy + j][ux + i] = 1
                ictx.mvs0[(ux + i, uy + j)] = sub0[j][i]
        prof_mask |= 0 if broad else 1
    if mi.inter_dir & 2:
        broad = broadcast_mv(dmv1, mi.inter_dir)
        sub1 = actx.compute_subblock_mvs(mi.cinfo[1], dmv1, log2_w, log2_h, broad)
        for j in range(nh):
            for i in range(nw):
                ictx.dir1[uy + j][ux + i] = 1
                ictx.mvs1[(ux + i, uy + j)] = sub1[j][i]
        prof_mask |= 0 if broad else 2

    # TMVP plane: 8x8-aligned sub-block MVs (rcn_affine_mcp_b_l tail)
    for j in range(nh):
        for i in range(nw):
            if not ((ux + i) & 1) and not ((uy + j) & 1):
                gx, gy = (ux + i) >> 1, (uy + j) >> 1
                if sub0 is not None:
                    ictx.tmvp_mv0[(gx, gy)] = replace(sub0[j][i])
                if sub1 is not None:
                    ictx.tmvp_mv1[(gx, gy)] = replace(sub1[j][i])

    info = AffInfo([mi.cinfo[0], mi.cinfo[1]], mi.affine_type, ux, uy, nw, nh,
                   log2_w, log2_h)
    for j in range(nh):
        for i in range(nw):
            actx.aff_info[(ux + i, uy + j)] = info
    return sub0, sub1, prof_mask, dmv0, dmv1


# ---------------------------------------------------------------------------
# SbTMVP (subblock-based temporal MV prediction)
# Parity: drv_affine_mvp.c derive_sbtmvp_cand_pos (:1506),
# derive_sbtmvp_mv_offset (:1523), sbtmvp_from_ldc/_same_rpl (:1564/:1718),
# check_sbtmvp_cand (:1773), derive_sub_pu_merge_cand (:1790),
# derive_sub_block_mvs[_p] (:2054/:1899), set_zero_mvs_p/b (:1851/:2015),
# clip_sb_pos_to_col_ctu (:1492).
# ---------------------------------------------------------------------------

LOG2_SBTMVP_S = 3


def _mv_internal_to_integer(mv: MV) -> MV:
    x = (mv.x + 7 + (1 if mv.x < 0 else 0)) >> 4
    y = (mv.y + 7 + (1 if mv.y < 0 else 0)) >> 4
    return MV(x, y)


class SbTmvpCtx:
    """Per-tile SbTMVP state: picture-level collocated field via InterCtx.

    pos coordinates below are CTU-local luma samples, as in the reference;
    the collocated probes go through the flat picture-level maps.
    """

    def __init__(self, ictx, log2_ctb: int, nb_ctb_pic_w: int,
                 col_ref_idx0: int, col_ref_idx1: int):
        self.ictx = ictx
        self.log2_ctb = log2_ctb
        self.ctu_s = 1 << log2_ctb
        self.nb_ctb_pic_w = nb_ctb_pic_w
        self.col_ref_idx0 = col_ref_idx0
        self.col_ref_idx1 = col_ref_idx1

    def _clip_pos(self, x, y, ctb_x):
        """clip_sb_pos_to_col_ctu: CTU-local clamp + 8-align."""
        is_bnd = ctb_x == self.nb_ctb_pic_w - 1
        x = max(0, min(x, self.ctu_s + 3 - (4 if is_bnd else 0)))
        y = max(0, min(y, self.ctu_s - 1))
        return x & ~7, y & ~7

    def _col_probe(self, px_u, py_u):
        """(cand_msk) from the collocated dir maps at picture 4x4 units."""
        ictx = self.ictx
        if ictx.col is None:
            return 0
        d0, d1 = ictx.col[0], ictx.col[1]
        if py_u < 0 or px_u < 0 or py_u >= len(d0) or px_u >= len(d0[0]):
            return 0
        return (1 if d0[py_u][px_u] else 0) | (2 if d1[py_u][px_u] else 0)

    def _col_mv_scaled(self, lst_cur, col_lst, px_u, py_u):
        """tmvp_rescale parity: mantissa round + distance scale, ref_idx 0."""
        from openvvc_tpu.drv.inter_mvp import (derive_tmvp_scale,
                                               tmvp_round_mv, tmvp_scale_mv)

        ictx = self.ictx
        mv = (ictx.col[2] if col_lst == 0 else ictx.col[3])[(px_u >> 1, py_u >> 1)]
        dist_col = (ictx.col[4] if col_lst == 0 else ictx.col[5])[mv.ref_idx]
        # P slices have no list 1; the reference reads a zeroed array slot
        dlist = ictx.dist_ref0 if lst_cur == 0 else ictx.dist_ref1
        dist_ref = dlist[0] if dlist else 0
        scale = derive_tmvp_scale(dist_ref, dist_col)
        out = MV(tmvp_round_mv(mv.x), tmvp_round_mv(mv.y))
        out = tmvp_scale_mv(scale, out)
        return replace(out, ref_idx=0, bcw_idx_plus1=0, prec_amvr=0)

    def _mvs_at(self, tile_x, tile_y, ctb_x, ctb_y):
        """(inter_dir, mv0, mv1) of the collocated field at a clipped
        CTU-local position derived from tile-local luma coords."""
        ictx = self.ictx
        # CTU-local position
        tile_px = tile_x + (ictx.tile_uoff[0] << 2)
        tile_py = tile_y + (ictx.tile_uoff[1] << 2)
        lx = tile_px - (ctb_x << self.log2_ctb)
        ly = tile_py - (ctb_y << self.log2_ctb)
        cx, cy = self._clip_pos(lx, ly, ctb_x)
        px_u = ((ctb_x << self.log2_ctb) + cx) >> 2
        py_u = ((ctb_y << self.log2_ctb) + cy) >> 2
        cand_msk = self._col_probe(px_u, py_u)
        if not cand_msk:
            return 0, None, None
        ictx_ldc = ictx.ldc
        if ictx_ldc:
            # sbtmvp_from_ldc with col_ref_l0 == 0 always (see drv note)
            c0, c01 = cand_msk & 1, cand_msk & 2
            if c0 and c01:
                mv0 = self._col_mv_scaled(0, 0, px_u, py_u)
                mv1 = self._col_mv_scaled(1, 1, px_u, py_u)
            elif c0:
                mv0 = self._col_mv_scaled(0, 0, px_u, py_u)
                mv1 = self._col_mv_scaled(1, 0, px_u, py_u)
            else:
                mv0 = self._col_mv_scaled(0, 1, px_u, py_u)
                mv1 = self._col_mv_scaled(1, 1, px_u, py_u)
            return 3, mv0, mv1
        inter_dir = 0
        mv0 = mv1 = None
        if cand_msk & 1:
            mv0 = self._col_mv_scaled(0, 0, px_u, py_u)
            inter_dir |= 1
        if cand_msk & 2:
            mv1 = self._col_mv_scaled(1, 1, px_u, py_u)
            inter_dir |= 2
        return inter_dir, mv0, mv1

    def mv_offset(self, ux, uy, nw, nh):
        """derive_sbtmvp_mv_offset: A1 MV if its ref is the collocated pic."""
        ictx = self.ictx
        px, py = ux - 1, uy + nh - 1
        if ictx._avail(0, px, py):
            mv = ictx._mv_at(0, px, py)
            if mv.ref_idx == self.col_ref_idx0:
                return _mv_internal_to_integer(mv)
        if ictx._avail(1, px, py):
            mv = ictx._mv_at(1, px, py)
            if mv.ref_idx == self.col_ref_idx1:
                return _mv_internal_to_integer(mv)
        return MV(0, 0)

    def derive_main_cand(self, x0, y0, log2_w, log2_h, ctb_x, ctb_y):
        """derive_sub_pu_merge_cand: (found, main_info, mv_offset)."""
        off = self.mv_offset(x0 >> 2, y0 >> 2, (1 << log2_w) >> 2,
                             (1 << log2_h) >> 2)
        cx = x0 + ((1 << log2_w) >> 1) + off.x
        cy = y0 + ((1 << log2_h) >> 1) + off.y
        inter_dir, mv0, mv1 = self._mvs_at(cx, cy, ctb_x, ctb_y)
        return bool(inter_dir), (inter_dir, mv0, mv1), off

    def derive_units(self, x0, y0, log2_w, log2_h, ctb_x, ctb_y, main,
                     is_p: bool):
        """derive_sub_block_mvs[_p]: per-8x8 units + map fills.

        Returns list of (off_x, off_y, inter_dir, mv0, mv1) in tile coords.
        """
        ictx = self.ictx
        main_dir, main_mv0, main_mv1 = main
        nb_sb_w = max(1, (1 << log2_w) >> LOG2_SBTMVP_S)
        nb_sb_h = max(1, (1 << log2_h) >> LOG2_SBTMVP_S)
        sb_w = (1 << log2_w) if nb_sb_w == 1 else (1 << LOG2_SBTMVP_S)
        sb_h = (1 << log2_h) if nb_sb_h == 1 else (1 << LOG2_SBTMVP_S)
        is_small = log2_w + log2_h <= 5
        mv_off = self.derive_units_offset
        units = []
        for i in range(nb_sb_h):
            for j in range(nb_sb_w):
                cx = x0 + (sb_w >> 1) + mv_off.x + j * sb_w
                cy = y0 + (sb_h >> 1) + mv_off.y + i * sb_h
                inter_dir, mv0, mv1 = self._mvs_at(cx, cy, ctb_x, ctb_y)
                if is_p:
                    if not (inter_dir & 1):
                        mv0 = main_mv0
                    inter_dir = 1
                    mv1 = None
                else:
                    if not inter_dir:
                        mv0, mv1 = main_mv0, main_mv1
                        inter_dir = main_dir
                    if is_small and inter_dir == 3:
                        inter_dir = 1
                self._fill_unit(x0 >> 2, y0 >> 2, j, i, inter_dir, mv0, mv1)
                units.append((8 * j, 8 * i, inter_dir, mv0, mv1))
        return units

    def _fill_unit(self, ux, uy, j, i, inter_dir, mv0, mv1):
        ictx = self.ictx
        gx = (ux * 4 + 8 * j + 4) >> 3
        gy = (uy * 4 + 8 * i + 4) >> 3
        if inter_dir & 1:
            m = replace(mv0, ref_idx=0, bcw_idx_plus1=0)
            for dj in range(2):
                for di in range(2):
                    ictx.dir0[uy + 2 * i + dj][ux + 2 * j + di] = 1
                    ictx.mvs0[(ux + 2 * j + di, uy + 2 * i + dj)] = m
            ictx.tmvp_mv0[(gx, gy)] = replace(m, prec_amvr=0)
        if inter_dir & 2:
            m = replace(mv1, ref_idx=0, bcw_idx_plus1=0)
            for dj in range(2):
                for di in range(2):
                    ictx.dir1[uy + 2 * i + dj][ux + 2 * j + di] = 1
                    ictx.mvs1[(ux + 2 * j + di, uy + 2 * i + dj)] = m
            ictx.tmvp_mv1[(gx, gy)] = replace(m, prec_amvr=0)

    def zero_units(self, x0, y0, log2_w, log2_h, is_p: bool):
        """set_zero_mvs_p/b: whole-CU zero MVs, maps filled, one MC unit."""
        ictx = self.ictx
        ux, uy = x0 >> 2, y0 >> 2
        nw, nh = (1 << log2_w) >> 2, (1 << log2_h) >> 2
        z = MV(0, 0, 0)
        inter_dir = 1 if is_p else 3
        for lst in ((0,) if is_p else (0, 1)):
            d = ictx.dir0 if lst == 0 else ictx.dir1
            mvs = ictx.mvs0 if lst == 0 else ictx.mvs1
            tm = ictx.tmvp_mv0 if lst == 0 else ictx.tmvp_mv1
            for jj in range(nh):
                for ii in range(nw):
                    d[uy + jj][ux + ii] = 1
                    mvs[(ux + ii, uy + jj)] = z
            for i in range(max(1, nh >> 1)):
                for j in range(max(1, nw >> 1)):
                    tm[((x0 + 8 * j + 4) >> 3, (y0 + 8 * i + 4) >> 3)] = z
        return [(0, 0, inter_dir, z, z if not is_p else None, log2_w, log2_h)]


def drv_sb_merge(ictx, actx: AffineCtx, sbctx: SbTmvpCtx | None,
                 x0, y0, log2_w, log2_h, merge_idx, ctb_x, ctb_y,
                 is_p: bool, affine_enabled: bool):
    """SB_MERGE dispatch (drv_affine_merge_mvp_p/b parity).

    Returns a recon payload: ("sbtmvp", units) with 8x8 (or whole-CU zero)
    units, or ("affine", sub0, sub1, inter_dir, prof_mask, dmv0, dmv1).
    """
    ux, uy = x0 >> 2, y0 >> 2
    if sbctx is not None:
        found, main, off = sbctx.derive_main_cand(x0, y0, log2_w, log2_h,
                                                  ctb_x, ctb_y)
        if found and merge_idx == 0:
            sbctx.derive_units_offset = off
            units = sbctx.derive_units(x0, y0, log2_w, log2_h, ctb_x, ctb_y,
                                       main, is_p)
            return ("sbtmvp", [(ox, oy, d, m0, m1, 3, 3)
                               for (ox, oy, d, m0, m1) in units])
        if not affine_enabled:
            units = sbctx.zero_units(x0, y0, log2_w, log2_h, is_p)
            return ("sbtmvp", units)
        merge_idx -= 1 if found else 0

    mi = actx.affine_merge(ux, uy, (1 << log2_w) >> 2, (1 << log2_h) >> 2,
                           log2_w, log2_h, merge_idx)
    for lst in (0, 1):
        c = mi.cinfo[lst]
        c.lt = replace(c.lt, prec_amvr=0)
        c.rt = replace(c.rt, prec_amvr=0)
        c.lb = replace(c.lb, prec_amvr=0)
    if is_p:
        mi.inter_dir = 1
    sub0, sub1, prof_mask, dmv0, dmv1 = store_and_subblocks(
        actx, mi, ux, uy, log2_w, log2_h)
    if actx.prof_enabled:
        pd = prof_mask
        if pd & 1 and not check_affine_prof(mi, 0):
            pd &= ~1
        if pd & 2 and not check_affine_prof(mi, 1):
            pd &= ~2
        pd &= mi.inter_dir
    else:
        pd = 0
    return ("affine", sub0, sub1, mi.inter_dir, pd, dmv0, dmv1)


def drv_affine_amvp_apply(ictx, actx: AffineCtx, x0, y0, log2_w, log2_h,
                          mvd0, mvd1, mvp_idx0, mvp_idx1, bcw_idx,
                          inter_dir, ref_idx0, ref_idx1, affine_type,
                          prec_amvr):
    """drv_affine_mvp_p/b parity: AMVP CP prediction + MVD apply + maps.

    mvd0/mvd1: CPInfo of quarter-pel MVDs (lb ignored for 4-param).
    Returns the same recon payload shape as drv_sb_merge's affine case.
    """
    ux, uy = x0 >> 2, y0 >> 2
    nw, nh = (1 << log2_w) >> 2, (1 << log2_h) >> 2
    mi = AffineMergeInfo()
    mi.affine_type = affine_type
    mi.inter_dir = inter_dir

    def apply(lst, mvd, mvp_idx, ref_idx, ref_opp):
        cp = actx.affine_amvp(ux, uy, nw, nh, log2_w, log2_h, ref_idx,
                              ref_opp, mvp_idx, lst + 1, affine_type,
                              prec_amvr)
        d_lt = change_precision(mvd.lt, prec_amvr, MV_PRECISION_INTERNAL)
        d_rt = change_precision(mvd.rt, prec_amvr, MV_PRECISION_INTERNAL)
        lt = mv_clip_periodic(MV(cp.lt.x + d_lt.x, cp.lt.y + d_lt.y))
        rt = mv_clip_periodic(MV(cp.rt.x + d_lt.x + d_rt.x,
                                 cp.rt.y + d_lt.y + d_rt.y))
        fix = lambda m: replace(m, ref_idx=ref_idx, bcw_idx_plus1=bcw_idx + 1,
                                prec_amvr=prec_amvr)
        out = CPInfo(fix(lt), fix(rt), MV())
        if affine_type:
            d_lb = change_precision(mvd.lb, prec_amvr, MV_PRECISION_INTERNAL)
            lb = mv_clip_periodic(MV(cp.lb.x + d_lt.x + d_lb.x,
                                     cp.lb.y + d_lt.y + d_lb.y))
            out.lb = fix(lb)
        return out

    if inter_dir & 1:
        mi.cinfo[0] = apply(0, mvd0, mvp_idx0, ref_idx0,
                            ictx.rpl0_opp[ref_idx0])
    if inter_dir & 2:
        mi.cinfo[1] = apply(1, mvd1, mvp_idx1, ref_idx1,
                            ictx.rpl1_opp[ref_idx1])

    ictx.prec_amvr = 0
    sub0, sub1, prof_mask, dmv0, dmv1 = store_and_subblocks(
        actx, mi, ux, uy, log2_w, log2_h)
    if actx.prof_enabled:
        pd = prof_mask
        if pd & 1 and not check_affine_prof(mi, 0):
            pd &= ~1
        if pd & 2 and not check_affine_prof(mi, 1):
            pd &= ~2
        pd &= inter_dir
    else:
        pd = 0
    return ("affine", sub0, sub1, inter_dir, pd, dmv0, dmv1)

"""Bit-exact numpy reference for the VVC deblocking filter (luma + chroma).

ITU-T H.266 8.8.3: edge derivation on the 4x4 luma-unit grid, boundary
strengths (intra CU edges bs=2, coded-TB edges bs=1), beta/tc thresholds,
luma long filters (7/5/3 combinations), strong/weak filters, chroma strong
(3-tap-extended) and weak filters with CTU-top line-buffer restriction.

Behavior parity: /root/reference/libovvc/rcn_df.c (compute_dbf_limits :172,
derive_filter_length :<in-file>, filter_h/v_* kernels :217-900,
filter_luma_weak :901, chroma drivers :1146-1430, vvc_dbf_ctu_hor/ver).
The reference's per-CTU staged processing is replaced by the spec's
whole-frame two-pass order (all vertical edges, then all horizontal edges) —
equivalent by construction.

Maps layout: everything on the luma 4x4-unit grid.
  edge_ver[yu, xu]   : vertical edge on the LEFT side of unit column xu
  bs2_ver / bs1_ver  : boundary strengths for those edges; same for _hor.
  qp_l[yu, xu]       : luma QP per unit; qp_cb / qp_cr likewise.
  cedge_ver, cbs2_ver, cbs1_cb_ver, cbs1_cr_ver: chroma edge/bs maps (still on
  the luma unit grid; one unit = 2 chroma samples in 4:2:0).
"""

from __future__ import annotations

import numpy as np

_TC_LUT = [
    0, 0,
    0, 0, 0, 0, 0, 0, 0, 0,
    0, 0, 0, 0, 0, 0, 0, 0,
    3, 4, 4, 4, 4, 5, 5, 5,
    5, 7, 7, 8, 9, 10, 10, 11,
    13, 14, 15, 17, 19, 21, 24, 25,
    29, 33, 36, 41, 45, 51, 57, 64,
    71, 80, 89, 100, 112, 125, 141, 157,
    177, 198, 222, 250, 280, 314, 352, 395,
]

_BETA_LUT = [
    0, 0, 0, 0, 0, 0, 0, 0,
    0, 0, 0, 0, 0, 0, 0, 0,
    6, 7, 8, 9, 10, 11, 12, 13,
    14, 15, 16, 17, 18, 20, 22, 24,
    26, 28, 30, 32, 34, 36, 38, 40,
    42, 44, 46, 48, 50, 52, 54, 56,
    58, 60, 62, 64, 66, 68, 70, 72,
    74, 76, 78, 80, 82, 84, 86, 88,
]

# long filter weights / tc weights per side length
_DB_W = {7: (59, 50, 41, 32, 23, 14, 5), 5: (58, 45, 32, 19, 6), 3: (53, 32, 11)}
_TC_W = {7: (6, 5, 4, 3, 2, 1, 1), 5: (6, 5, 4, 3, 2), 3: (6, 4, 2)}


class DbfMaps:
    """Edge/bs/qp maps accumulated during reconstruction."""

    def __init__(self, pic_w: int, pic_h: int, chroma: bool):
        uw, uh = (pic_w + 3) // 4, (pic_h + 3) // 4
        z = lambda: np.zeros((uh + 1, uw + 1), bool)
        self.edge_ver = z()
        self.edge_hor = z()
        self.bs2_ver = z()
        self.bs2_hor = z()
        self.bs1_ver = z()
        self.bs1_hor = z()
        self.qp_l = np.zeros((uh, uw), np.int32)
        # CU-edge-only maps + per-unit motion info for the inter BS pass
        # (rcn_df.c dbf_ctu_preproc_h/v :1822-1875)
        self.cu_edge_ver = z()
        self.cu_edge_hor = z()
        self.mv_dir = np.zeros((uh, uw), np.uint8)  # 0 intra/none, 1/2/3
        self.mv_vals = np.zeros((uh, uw, 2, 2), np.int32)  # [list][x,y]
        self.mv_dist = np.zeros((uh, uw, 2), np.int32)  # POC dist per list
        # affine / sbtmvp sub-block state (drv_affine_mvp.c dbf_set_sb_edges
        # :3051 + dbf_utils.h dbf_fill_aff_map :76)
        self.sb_edge_ver = z()
        self.sb_edge_hor = z()
        self.aff_unit = np.zeros((uh, uw), bool)
        if chroma:
            self.cedge_ver = z()
            self.cedge_hor = z()
            self.cbs2_ver = z()
            self.cbs2_hor = z()
            self.cbs1_cb_ver = z()
            self.cbs1_cb_hor = z()
            self.cbs1_cr_ver = z()
            self.cbs1_cr_hor = z()
            self.qp_cb = np.zeros((uh, uw), np.int32)
            self.qp_cr = np.zeros((uh, uw), np.int32)

    # -- fill helpers (luma coords) ------------------------------------
    def _rect(self, x0, y0, w, h):
        return x0 >> 2, y0 >> 2, max(1, w >> 2), max(1, h >> 2)

    def add_cu_luma(self, x0, y0, w, h, qp, intra):
        xu, yu, wu, hu = self._rect(x0, y0, w, h)
        self.edge_ver[yu : yu + hu, xu] = True
        self.edge_ver[yu : yu + hu, xu + wu] = True
        self.edge_hor[yu, xu : xu + wu] = True
        self.edge_hor[yu + hu, xu : xu + wu] = True
        self.cu_edge_ver[yu : yu + hu, xu] = True
        self.cu_edge_ver[yu : yu + hu, xu + wu] = True
        self.cu_edge_hor[yu, xu : xu + wu] = True
        self.cu_edge_hor[yu + hu, xu : xu + wu] = True
        if intra:
            self.bs2_ver[yu : yu + hu, xu] = True
            self.bs2_ver[yu : yu + hu, xu + wu] = True
            self.bs2_hor[yu, xu : xu + wu] = True
            self.bs2_hor[yu + hu, xu : xu + wu] = True
        self.qp_l[yu : yu + hu, xu : xu + wu] = qp

    def add_tb_luma(self, x0, y0, w, h):
        """Coded luma TB: edge + bs1 on its boundary."""
        xu, yu, wu, hu = self._rect(x0, y0, w, h)
        for col in (xu, xu + wu):
            self.edge_ver[yu : yu + hu, col] = True
            self.bs1_ver[yu : yu + hu, col] = True
        for row in (yu, yu + hu):
            self.edge_hor[row, xu : xu + wu] = True
            self.bs1_hor[row, xu : xu + wu] = True

    def add_cu_chroma(self, cx0, cy0, cw, ch, qp_cb, qp_cr, intra):
        """Chroma CU rect in chroma coords (4:2:0)."""
        xu, yu = cx0 >> 1, cy0 >> 1
        wu, hu = max(1, cw >> 1), max(1, ch >> 1)
        self.cedge_ver[yu : yu + hu, xu] = True
        self.cedge_ver[yu : yu + hu, xu + wu] = True
        self.cedge_hor[yu, xu : xu + wu] = True
        self.cedge_hor[yu + hu, xu : xu + wu] = True
        if intra:
            self.cbs2_ver[yu : yu + hu, xu] = True
            self.cbs2_ver[yu : yu + hu, xu + wu] = True
            self.cbs2_hor[yu, xu : xu + wu] = True
            self.cbs2_hor[yu + hu, xu : xu + wu] = True
        self.qp_cb[yu : yu + hu, xu : xu + wu] = qp_cb
        self.qp_cr[yu : yu + hu, xu : xu + wu] = qp_cr

    def add_cu_motion(self, x0, y0, w, h, inter_dir, mv0, mv1, dist0, dist1):
        """Per-unit motion info for the MV boundary-strength rule.

        dist0/dist1: POC distance of the referenced picture per list (0 for
        an unused list)."""
        xu, yu, wu, hu = self._rect(x0, y0, w, h)
        self.mv_dir[yu : yu + hu, xu : xu + wu] = inter_dir
        if inter_dir & 1:
            self.mv_vals[yu : yu + hu, xu : xu + wu, 0] = (mv0.x, mv0.y)
            self.mv_dist[yu : yu + hu, xu : xu + wu, 0] = dist0
        if inter_dir & 2:
            self.mv_vals[yu : yu + hu, xu : xu + wu, 1] = (mv1.x, mv1.y)
            self.mv_dist[yu : yu + hu, xu : xu + wu, 1] = dist1

    def add_sb_edges(self, x0, y0, w, h, affine: bool):
        """8x8 sub-block edges inside an affine/SbTMVP CU + the affine map
        (both affine and SbTMVP CUs mark the aff map in the reference —
        update_mv_ctx_b/:3107 and update_mv_ctx_b2/:3082)."""
        xu, yu, wu, hu = self._rect(x0, y0, w, h)
        for i in range(2, wu, 2):
            self.sb_edge_ver[yu : yu + hu, xu + i] = True
        for i in range(2, hu, 2):
            self.sb_edge_hor[yu + i, xu : xu + wu] = True
        self.aff_unit[yu : yu + hu, xu : xu + wu] = True

    def _mv_edge_bs(self, pu, qu) -> bool:
        """check_dbf_enabled / check_dbf_enabled_p parity (rcn_df.c :1527)."""
        dp = int(self.mv_dir[pu])
        dq = int(self.mv_dir[qu])
        if dp == 0 or dq == 0:
            return True

        def thr(a, b):
            return (abs(int(a[0]) - int(b[0])) >= 8
                    or abs(int(a[1]) - int(b[1])) >= 8)

        if dp == 3 and dq == 3:
            p0, p1 = self.mv_vals[pu][0], self.mv_vals[pu][1]
            q0, q1 = self.mv_vals[qu][0], self.mv_vals[qu][1]
            r0p, r1p = int(self.mv_dist[pu][0]), int(self.mv_dist[pu][1])
            r0q, r1q = int(self.mv_dist[qu][0]), int(self.mv_dist[qu][1])
            paired = r0p == r0q and r1p == r1q
            swapped = r0p == r1q and r1p == r0q
            coupled = r0p == r1p
            bs = True
            if coupled and paired:
                bs = thr(q0, p0) or thr(q1, p1)
                bs = bs and (thr(q1, p0) or thr(q0, p1))
            elif paired:
                bs = thr(q0, p0) or thr(q1, p1)
            elif swapped:
                bs = thr(q1, p0) or thr(q0, p1)
            return bs
        if dp in (1, 2) and dq in (1, 2):
            lp, lq = dp - 1, dq - 1
            mvp = self.mv_vals[pu][lp]
            mvq = self.mv_vals[qu][lq]
            if int(self.mv_dist[pu][lp]) == int(self.mv_dist[qu][lq]):
                return thr(mvq, mvp)
            return True
        return True

    def _mv_edge_bs_vec(self, py, px, qy, qx):
        """Vectorized _mv_edge_bs over K edge pairs (same decision table,
        rcn_df.c:1527)."""
        dp = self.mv_dir[py, px].astype(np.int32)
        dq = self.mv_dir[qy, qx].astype(np.int32)
        mvp = self.mv_vals[py, px]  # (K, 2, 2) int32
        mvq = self.mv_vals[qy, qx]
        rp = self.mv_dist[py, px]   # (K, 2)
        rq = self.mv_dist[qy, qx]

        def thr(a, b):  # (K,2),(K,2) -> (K,) bool
            return ((np.abs(a[:, 0] - b[:, 0]) >= 8)
                    | (np.abs(a[:, 1] - b[:, 1]) >= 8))

        t00 = thr(mvq[:, 0], mvp[:, 0])
        t11 = thr(mvq[:, 1], mvp[:, 1])
        t10 = thr(mvq[:, 1], mvp[:, 0])
        t01 = thr(mvq[:, 0], mvp[:, 1])
        paired = (rp[:, 0] == rq[:, 0]) & (rp[:, 1] == rq[:, 1])
        swapped = (rp[:, 0] == rq[:, 1]) & (rp[:, 1] == rq[:, 0])
        coupled = rp[:, 0] == rp[:, 1]
        case1 = coupled & paired
        case2 = paired & ~case1
        case3 = swapped & ~paired
        bs33 = np.where(case1, (t00 | t11) & (t10 | t01),
                        np.where(case2, t00 | t11,
                                 np.where(case3, t10 | t01, True)))
        # both uni-pred (1/2): compare the used list's MV when same POC dist
        k = np.arange(len(dp))
        lp = np.clip(dp - 1, 0, 1)
        lq = np.clip(dq - 1, 0, 1)
        mvpl, mvql = mvp[k, lp], mvq[k, lq]
        same = rp[k, lp] == rq[k, lq]
        bs12 = np.where(same, ((np.abs(mvql[:, 0] - mvpl[:, 0]) >= 8)
                               | (np.abs(mvql[:, 1] - mvpl[:, 1]) >= 8)),
                        True)
        res = np.ones(len(dp), bool)
        m33 = (dp == 3) & (dq == 3)
        res[m33] = bs33[m33]
        m12 = (dp >= 1) & (dp <= 2) & (dq >= 1) & (dq <= 2)
        res[m12] = bs12[m12]
        return res

    def finalize_inter_bs(self):
        """MV-based bs1 on CU (and sub-block) edges not already bs1/bs2
        (dbf_ctu_preproc_v/h parity :1822-1875)."""
        uh, uw = self.qp_l.shape
        ev = self.cu_edge_ver | self.sb_edge_ver
        cv = ev & ~(self.bs2_ver | self.bs1_ver)
        ys, xs = np.nonzero(cv[:uh, 1:uw])
        if len(ys):
            xs = xs + 1
            bs = self._mv_edge_bs_vec(ys, xs - 1, ys, xs)
            self.bs1_ver[ys[bs], xs[bs]] = True
        eh = self.cu_edge_hor | self.sb_edge_hor
        ch = eh & ~(self.bs2_hor | self.bs1_hor)
        ys, xs = np.nonzero(ch[1:uh, :uw])
        if len(ys):
            ys = ys + 1
            bs = self._mv_edge_bs_vec(ys - 1, xs, ys, xs)
            self.bs1_hor[ys[bs], xs[bs]] = True

    def add_tb_chroma(self, comp, cx0, cy0, cw, ch):
        xu, yu = cx0 >> 1, cy0 >> 1
        wu, hu = max(1, cw >> 1), max(1, ch >> 1)
        bs1v = self.cbs1_cb_ver if comp != 2 else self.cbs1_cr_ver
        bs1h = self.cbs1_cb_hor if comp != 2 else self.cbs1_cr_hor
        for col in (xu, xu + wu):
            self.cedge_ver[yu : yu + hu, col] = True
            bs1v[yu : yu + hu, col] = True
        for row in (yu, yu + hu):
            self.cedge_hor[row, xu : xu + wu] = True
            bs1h[row, xu : xu + wu] = True


def _limits(qp, bs, beta_off, tc_off, bitdepth):
    tc_idx = max(0, min(66, qp + 2 * (bs - 1) + tc_off))
    beta_idx = max(0, min(64, qp + beta_off))
    if bitdepth >= 10:
        tc = _TC_LUT[tc_idx] << (bitdepth - 10)
    else:
        tc = (_TC_LUT[tc_idx] + (1 << (9 - bitdepth))) >> (10 - bitdepth)
    beta = _BETA_LUT[beta_idx] << (bitdepth - 8)
    return beta, tc


def _clip(v, lo, hi):
    return lo if v < lo else (hi if v > hi else v)


class _Line:
    """Access helper for one line of samples perpendicular to the edge.

    g(k): q-side sample k (k=0 at edge); g(-1-k): p-side sample k.
    """

    __slots__ = ("plane", "x", "y", "dx", "dy")

    def __init__(self, plane, x, y, dx, dy):
        self.plane, self.x, self.y, self.dx, self.dy = plane, x, y, dx, dy

    def q(self, k):
        return int(self.plane[self.y + self.dy * k, self.x + self.dx * k])

    def p(self, k):
        return int(self.plane[self.y - self.dy * (k + 1), self.x - self.dx * (k + 1)])

    def set_q(self, k, v):
        self.plane[self.y + self.dy * k, self.x + self.dx * k] = v

    def set_p(self, k, v):
        self.plane[self.y - self.dy * (k + 1), self.x - self.dx * (k + 1)] = v


def _dp(ln, shift=0):
    return abs(ln.p(2 + shift) - 2 * ln.p(1 + shift) + ln.p(0 + shift))


def _dq(ln, shift=0):
    return abs(ln.q(0 + shift) - 2 * ln.q(1 + shift) + ln.q(2 + shift))


def _strong_l0(ln, beta, tc, max_l_p, max_l_q):
    sp3 = abs(ln.p(3) - ln.p(0))
    sq3 = abs(ln.q(3) - ln.q(0))
    if max_l_p == 7:
        sp3 += abs(ln.p(4) - ln.p(5) - ln.p(6) + ln.p(7))
        sp3 = (sp3 + abs(ln.p(3) - ln.p(7)) + 1) >> 1
    elif max_l_p == 5:
        sp3 = (sp3 + abs(ln.p(3) - ln.p(5)) + 1) >> 1
    if max_l_q == 7:
        sq3 += abs(ln.q(4) - ln.q(5) - ln.q(6) + ln.q(7))
        sq3 = (sq3 + abs(ln.q(7) - ln.q(3)) + 1) >> 1
    elif max_l_q == 5:
        sq3 = (sq3 + abs(ln.q(5) - ln.q(3)) + 1) >> 1
    return (sp3 + sq3) < (beta * 3 >> 5) and abs(ln.p(0) - ln.q(0)) < ((tc * 5 + 1) >> 1)


def _strong_l1(ln, beta, tc):
    d = abs(ln.p(3) - ln.p(0)) + abs(ln.q(3) - ln.q(0))
    return d < (beta >> 3) and abs(ln.p(0) - ln.q(0)) < ((tc * 5 + 1) >> 1)


def _long_filter(lines, max_l_p, max_l_q, tc, bd_max):
    """Large-block luma filter for one 4-line segment."""
    wp = _DB_W[max_l_p]
    wq = _DB_W[max_l_q]
    tp = _TC_W[max_l_p]
    tq = _TC_W[max_l_q]
    for ln in lines:
        ref_p = (ln.p(max_l_p - 1) + ln.p(max_l_p) + 1) >> 1
        ref_q = (ln.q(max_l_q - 1) + ln.q(max_l_q) + 1) >> 1
        key = (max_l_p, max_l_q)
        if key == (7, 7):
            mid = (2 * (ln.p(0) + ln.q(0)) + sum(ln.p(k) for k in range(1, 7)) + sum(ln.q(k) for k in range(1, 7)) + 8) >> 4
        elif key in ((7, 5), (5, 7)):
            mid = (2 * (ln.p(0) + ln.p(1) + ln.q(0) + ln.q(1)) + sum(ln.p(k) for k in range(2, 6)) + sum(ln.q(k) for k in range(2, 6)) + 8) >> 4
        elif key == (5, 5):
            mid = (2 * (ln.p(0) + ln.p(1) + ln.p(2) + ln.q(0) + ln.q(1) + ln.q(2)) + ln.p(3) + ln.p(4) + ln.q(3) + ln.q(4) + 8) >> 4
        elif key == (7, 3):
            mid = (2 * (ln.p(0) + ln.q(0)) + sum(ln.p(k) for k in range(1, 7)) + ln.q(0) + 3 * ln.q(1) + 2 * ln.q(2) + 8) >> 4
        elif key == (3, 7):
            mid = (2 * (ln.q(0) + ln.p(0)) + sum(ln.q(k) for k in range(1, 7)) + ln.p(0) + 3 * ln.p(1) + 2 * ln.p(2) + 8) >> 4
        elif key == (5, 3):
            mid = (sum(ln.p(k) for k in range(4)) + sum(ln.q(k) for k in range(4)) + 4) >> 3
        elif key == (3, 5):
            mid = (sum(ln.p(k) for k in range(4)) + sum(ln.q(k) for k in range(4)) + 4) >> 3
        else:
            raise AssertionError(key)
        for k in range(max_l_p):
            c = (tc * tp[k]) >> 1
            old = ln.p(k)
            ln.set_p(k, _clip((mid * wp[k] + ref_p * (64 - wp[k]) + 32) >> 6, old - c, old + c))
        for k in range(max_l_q):
            c = (tc * tq[k]) >> 1
            old = ln.q(k)
            ln.set_q(k, _clip((mid * wq[k] + ref_q * (64 - wq[k]) + 32) >> 6, old - c, old + c))


def _strong_small(lines, tc, bd_max):
    tcs = (tc, 2 * tc, 3 * tc)
    for ln in lines:
        p3, p2, p1, p0 = ln.p(3), ln.p(2), ln.p(1), ln.p(0)
        q0, q1, q2, q3 = ln.q(0), ln.q(1), ln.q(2), ln.q(3)
        ln.set_p(2, _clip((2 * p3 + 3 * p2 + p1 + p0 + q0 + 4) >> 3, p2 - tcs[0], p2 + tcs[0]))
        ln.set_p(1, _clip((p2 + p1 + p0 + q0 + 2) >> 2, p1 - tcs[1], p1 + tcs[1]))
        ln.set_p(0, _clip((p2 + 2 * p1 + 2 * p0 + 2 * q0 + q1 + 4) >> 3, p0 - tcs[2], p0 + tcs[2]))
        ln.set_q(0, _clip((p1 + 2 * p0 + 2 * q0 + 2 * q1 + q2 + 4) >> 3, q0 - tcs[2], q0 + tcs[2]))
        ln.set_q(1, _clip((p0 + q0 + q1 + q2 + 2) >> 2, q1 - tcs[1], q1 + tcs[1]))
        ln.set_q(2, _clip((p0 + q0 + q1 + 3 * q2 + 2 * q3 + 4) >> 3, q2 - tcs[0], q2 + tcs[0]))


def _weak(lines, tc, extend_p, extend_q, bd_max):
    th_cut = tc * 10
    tc2_p = (tc >> 1) if extend_p else 0
    tc2_q = (tc >> 1) if extend_q else 0
    for ln in lines:
        p2, p1, p0 = ln.p(2), ln.p(1), ln.p(0)
        q0, q1, q2 = ln.q(0), ln.q(1), ln.q(2)
        delta = (9 * (q0 - p0) - 3 * (q1 - p1) + 8) >> 4
        if abs(delta) < th_cut:
            delta = _clip(delta, -tc, tc)
            d1 = _clip((((p2 + p0 + 1) >> 1) - p1 + delta) >> 1, -tc2_p, tc2_p)
            d2 = _clip((((q2 + q0 + 1) >> 1) - q1 - delta) >> 1, -tc2_q, tc2_q)
            ln.set_p(1, _clip(p1 + d1, 0, bd_max))
            ln.set_p(0, _clip(p0 + delta, 0, bd_max))
            ln.set_q(0, _clip(q0 - delta, 0, bd_max))
            ln.set_q(1, _clip(q1 + d2, 0, bd_max))


def _filter_luma_segment(lines, beta, tc, max_l_p, max_l_q, bd_max):
    """Decisions + filtering for one 4-line luma edge segment."""
    l0, l3 = lines[0], lines[3]
    dp0, dq0 = _dp(l0), _dq(l0)
    dp3, dq3 = _dp(l3), _dq(l3)
    d0, d3 = dp0 + dq0, dp3 + dq3
    d = d0 + d3
    if d >= beta:
        return
    use_strong_large = False
    if max_l_p > 3 or max_l_q > 3:
        dp0L, dq0L, dp3L, dq3L = dp0, dq0, dp3, dq3
        if max_l_p > 3:
            dp0L = (dp0L + _dp(l0, 3) + 1) >> 1
            dp3L = (dp3L + _dp(l3, 3) + 1) >> 1
        if max_l_q > 3:
            dq0L = (dq0L + _dq(l0, 3) + 1) >> 1
            dq3L = (dq3L + _dq(l3, 3) + 1) >> 1
        d0L, d3L = dp0L + dq0L, dp3L + dq3L
        use_strong_large = (
            (d0L + d3L) < beta
            and d0L < ((beta + 0x10) >> 5)
            and d3L < ((beta + 0x10) >> 5)
            and _strong_l0(l0, beta, tc, max_l_p, max_l_q)
            and _strong_l0(l3, beta, tc, max_l_p, max_l_q)
        )
    if use_strong_large:
        _long_filter(lines, max(3, max_l_p), max(3, max_l_q), tc, bd_max)
    else:
        sw = (
            max_l_p > 2
            and d0 < ((beta + 0x4) >> 3)
            and d3 < ((beta + 0x4) >> 3)
            and _strong_l1(l0, beta, tc)
            and _strong_l1(l3, beta, tc)
        )
        if sw:
            _strong_small(lines, tc, bd_max)
        else:
            dp, dq = dp0 + dp3, dq0 + dq3
            side_thd = (beta + (beta >> 1)) >> 3
            extend_p = dp < side_thd and max_l_p > 1
            extend_q = dq < side_thd and max_l_p > 1
            _weak(lines, tc, extend_p, extend_q, bd_max)


def deblock_plane_luma(plane, maps: DbfMaps, beta_off, tc_off, bitdepth, pic_w, pic_h, log2_ctb=6,
                       no_filter_x=(), no_filter_y=()):
    bd_max = (1 << bitdepth) - 1
    uw, uh = pic_w // 4, pic_h // 4
    no_x = set(no_filter_x)
    no_y = set(no_filter_y)

    def edge_cols_clear(arr, yu, lo, hi):
        # True if no edge at columns lo..hi (exclusive hi) for row yu
        lo = max(lo, 0)
        return not arr[yu, lo:hi].any()

    # ---- vertical edges (all of them first) ---------------------------
    # Sub-block (affine/SbTMVP) edges join the edge set; filter lengths
    # follow rcn_df.c set_edge_context/derive_filter_length :1890-1938:
    # maxL 2 at pure sub-block edges next to a real edge 2 units away,
    # 7 -> 5 when the side belongs to an affine/SbTMVP CU, large filters
    # suppressed at pure sub-block edge columns.
    ev = maps.edge_ver
    sv = maps.sb_edge_ver
    for xu in range(1, uw):
        x = xu * 4
        if x in no_x:
            continue
        for yu in range(uh):
            if not (ev[yu, xu] or sv[yu, xu]):
                continue
            bs2 = maps.bs2_ver[yu, xu]
            if not (bs2 or maps.bs1_ver[yu, xu]):
                continue
            qp = (int(maps.qp_l[yu, xu - 1]) + int(maps.qp_l[yu, xu]) + 1) >> 1
            beta, tc = _limits(qp, 2 if bs2 else 1, beta_off, tc_off, bitdepth)
            if not (beta or tc):
                continue
            small = ev[yu, xu - 1] or ev[yu, xu + 1] or sv[yu, xu - 1] or sv[yu, xu + 1]
            pure_sb = sv[yu, xu] and not ev[yu, xu]
            aff1 = pure_sb and (ev[yu, max(0, xu - 2)] and xu >= 2 or
                                (xu + 2 <= uw and ev[yu, xu + 2]))
            if small:
                mlp = mlq = 1
            elif aff1:
                mlp = mlq = 2
            else:
                mlp = mlq = 3
                if xu % 4 == 0 and not pure_sb and edge_cols_clear(ev, yu, xu - 7, xu):
                    mlp = 5 if maps.aff_unit[yu, xu - 1] else 7
                if xu % 4 == 0 and not pure_sb and not ev[yu, xu + 1 : xu + 8].any():
                    mlq = 5 if maps.aff_unit[yu, xu] else 7
            y = yu * 4
            lines = [_Line(plane, x, y + i, 1, 0) for i in range(4)]
            _filter_luma_segment(lines, beta, tc, mlp, mlq, bd_max)

    # ---- horizontal edges ---------------------------------------------
    eh = maps.edge_hor
    sh_ = maps.sb_edge_hor
    for yu in range(1, uh):
        y = yu * 4
        if y in no_y:
            continue
        for xu in range(uw):
            if not (eh[yu, xu] or sh_[yu, xu]):
                continue
            bs2 = maps.bs2_hor[yu, xu]
            if not (bs2 or maps.bs1_hor[yu, xu]):
                continue
            qp = (int(maps.qp_l[yu - 1, xu]) + int(maps.qp_l[yu, xu]) + 1) >> 1
            beta, tc = _limits(qp, 2 if bs2 else 1, beta_off, tc_off, bitdepth)
            if not (beta or tc):
                continue
            small = eh[yu - 1, xu] or eh[yu + 1, xu] or sh_[yu - 1, xu] or sh_[yu + 1, xu]
            pure_sb = sh_[yu, xu] and not eh[yu, xu]
            aff1 = pure_sb and ((yu >= 2 and eh[yu - 2, xu]) or
                                (yu + 2 <= uh and eh[yu + 2, xu]))
            if small:
                mlp = mlq = 1
            elif aff1:
                mlp = mlq = 2
            else:
                mlp = mlq = 3
                # long-P suppressed in the first 7 unit rows of each CTU
                # (line-buffer rule, rcn_df.c:2146 `i % 4 || i < 7`)
                if yu % 4 == 0 and (yu % ((1 << log2_ctb) >> 2)) >= 7 \
                        and not pure_sb and not eh[yu - 7 : yu, xu].any():
                    mlp = 5 if maps.aff_unit[yu - 1, xu] else 7
                if yu % 4 == 0 and not pure_sb and not eh[yu + 1 : yu + 8, xu].any():
                    mlq = 5 if maps.aff_unit[yu, xu] else 7
            x = xu * 4
            lines = [_Line(plane, x + i, y, 0, 1) for i in range(4)]
            _filter_luma_segment(lines, beta, tc, mlp, mlq, bd_max)


def _chroma_strong(lines, tc, bd_max, ctb_b):
    for ln in lines:
        p0, p1, p2, p3 = ln.p(0), ln.p(1), ln.p(2), ln.p(3)
        q0, q1, q2, q3 = ln.q(0), ln.q(1), ln.q(2), ln.q(3)
        if ctb_b:
            ln.set_p(0, _clip((3 * p1 + 2 * p0 + q0 + q1 + q2 + 4) >> 3, p0 - tc, p0 + tc))
            ln.set_q(0, _clip((2 * p1 + p0 + 2 * q0 + q1 + q2 + q3 + 4) >> 3, q0 - tc, q0 + tc))
            ln.set_q(1, _clip((p1 + p0 + q0 + 2 * q1 + q2 + 2 * q3 + 4) >> 3, q1 - tc, q1 + tc))
            ln.set_q(2, _clip((p0 + q0 + q1 + 2 * q2 + 3 * q3 + 4) >> 3, q2 - tc, q2 + tc))
        else:
            ln.set_p(2, _clip((3 * p3 + 2 * p2 + p1 + p0 + q0 + 4) >> 3, p2 - tc, p2 + tc))
            ln.set_p(1, _clip((2 * p3 + p2 + 2 * p1 + p0 + q0 + q1 + 4) >> 3, p1 - tc, p1 + tc))
            ln.set_p(0, _clip((p3 + p2 + p1 + 2 * p0 + q0 + q1 + q2 + 4) >> 3, p0 - tc, p0 + tc))
            ln.set_q(0, _clip((p2 + p1 + p0 + 2 * q0 + q1 + q2 + q3 + 4) >> 3, q0 - tc, q0 + tc))
            ln.set_q(1, _clip((p1 + p0 + q0 + 2 * q1 + q2 + 2 * q3 + 4) >> 3, q1 - tc, q1 + tc))
            ln.set_q(2, _clip((p0 + q0 + q1 + 2 * q2 + 3 * q3 + 4) >> 3, q2 - tc, q2 + tc))


def _chroma_weak(lines, tc, bd_max):
    for ln in lines:
        p1, p0, q0, q1 = ln.p(1), ln.p(0), ln.q(0), ln.q(1)
        delta = _clip(((q0 << 2) - (p0 << 2) + p1 - q1 + 4) >> 3, -tc, tc)
        ln.set_p(0, _clip(p0 + delta, 0, bd_max))
        ln.set_q(0, _clip(q0 - delta, 0, bd_max))


def _filter_chroma_edge(lines, qp, bs2, large, beta_off, tc_off, bitdepth, ctb_b):
    bd_max = (1 << bitdepth) - 1
    beta, tc = _limits(qp, 2 if bs2 else 1, beta_off, tc_off, bitdepth)
    if tc == 0 or beta == 0:
        return
    strong = False
    if large:
        l0, l1 = lines[0], lines[1]

        def dpc(ln):
            return abs(ln.p(2 - (1 if ctb_b else 0)) - 2 * ln.p(1) + ln.p(0))

        d0 = dpc(l0) + _dq(l0)
        d3 = dpc(l1) + _dq(l1)
        d = d0 + d3

        def strong_c(ln):
            p3 = ln.p(3 >> (1 if ctb_b else 0)) if ctb_b else ln.p(3)
            dd = abs(p3 - ln.p(0)) + abs(ln.q(3) - ln.q(0))
            return dd < (beta >> 3) and abs(ln.p(0) - ln.q(0)) < ((tc * 5 + 1) >> 1)

        strong = (
            d < beta
            and 2 * d0 < (beta >> 2)
            and 2 * d3 < (beta >> 2)
            and strong_c(l0)
            and strong_c(l1)
        )
    if strong:
        _chroma_strong(lines, tc, bd_max, ctb_b)
    else:
        _chroma_weak(lines, tc, bd_max)


def deblock_chroma(cb, cr, maps: DbfMaps, params, bitdepth, pic_w, pic_h, log2_ctb,
                   no_filter_x=(), no_filter_y=()):
    """Both chroma planes; edges on the 8-chroma-sample grid (4:2:0)."""
    pps, sh = params.pps, params.sh
    uw, uh = pic_w // 4, pic_h // 4  # luma units (1 unit = 2 chroma samples)
    no_x = set(no_filter_x)
    no_y = set(no_filter_y)

    beta_off_cb = _beta_tc_offsets(params, "cb")
    beta_off_cr = _beta_tc_offsets(params, "cr")

    for plane, bs1v, bs1h, qpm, offs, _pad in ((cb, maps.cbs1_cb_ver, maps.cbs1_cb_hor, maps.qp_cb, beta_off_cb, 0),
                                               (cr, maps.cbs1_cr_ver, maps.cbs1_cr_hor, maps.qp_cr, beta_off_cr, 0)):
        beta_off, tc_off = offs
        # vertical edges: every 4 luma units = 8 chroma samples
        for xu in range(4, uw, 4):
            cx = xu * 2
            if xu * 4 in no_x:
                continue
            for yu in range(uh):
                if not maps.cedge_ver[yu, xu]:
                    continue
                bs2 = maps.cbs2_ver[yu, xu]
                bs1 = bs1v[yu, xu]
                large = not (
                    maps.cedge_ver[yu, max(0, xu - 3) : xu].any()
                    or maps.cedge_ver[yu, xu + 1 : xu + 4].any()
                )
                if not (bs2 or (bs1 and large)):
                    continue
                qp = (int(qpm[yu, xu - 1]) + int(qpm[yu, xu]) + 1) >> 1
                cy = yu * 2
                lines = [_Line(plane, cx, cy + i, 1, 0) for i in range(2)]
                _filter_chroma_edge(lines, qp, bs2, large, beta_off, tc_off, bitdepth, False)
        # horizontal edges
        for yu in range(4, uh, 4):
            cy = yu * 2
            if yu * 4 in no_y:
                continue
            is_ctb_b = (cy * 2) % (1 << log2_ctb) == 0  # luma y at CTU boundary
            for xu in range(uw):
                if not maps.cedge_hor[yu, xu]:
                    continue
                bs2 = maps.cbs2_hor[yu, xu]
                bs1 = bs1h[yu, xu]
                large = not (
                    maps.cedge_hor[max(0, yu - 3) : yu, xu].any()
                    or maps.cedge_hor[yu + 1 : yu + 4, xu].any()
                )
                if not (bs2 or (bs1 and large)):
                    continue
                qp = (int(qpm[yu - 1, xu]) + int(qpm[yu, xu]) + 1) >> 1
                cx = xu * 2
                lines = [_Line(plane, cx + i, cy, 0, 1) for i in range(2)]
                _filter_chroma_edge(lines, qp, bs2, large, beta_off, tc_off, bitdepth, is_ctb_b)


def _beta_tc_offsets(params, comp: str):
    """(beta_offset, tc_offset) for a component, PPS/PH/SH resolution."""
    pps, ph, sh = params.pps, params.ph, params.sh
    if comp == "luma":
        if sh.sh_deblocking_params_present_flag:
            return sh.sh_luma_beta_offset_div2 * 2, sh.sh_luma_tc_offset_div2 * 2
        if ph.ph_deblocking_params_present_flag:
            return ph.ph_luma_beta_offset_div2 * 2, ph.ph_luma_tc_offset_div2 * 2
        return pps.pps_luma_beta_offset_div2 * 2, pps.pps_luma_tc_offset_div2 * 2
    pfx = comp  # "cb" | "cr"
    if sh.sh_deblocking_params_present_flag:
        return getattr(sh, f"sh_{pfx}_beta_offset_div2") * 2, getattr(sh, f"sh_{pfx}_tc_offset_div2") * 2
    if ph.ph_deblocking_params_present_flag:
        return getattr(ph, f"ph_{pfx}_beta_offset_div2") * 2, getattr(ph, f"ph_{pfx}_tc_offset_div2") * 2
    return getattr(pps, f"pps_{pfx}_beta_offset_div2") * 2, getattr(pps, f"pps_{pfx}_tc_offset_div2") * 2


def deblock_frame(frame, maps: DbfMaps, params, log2_ctb):
    bitdepth = frame.bitdepth
    pic_w, pic_h = frame.y.shape[1], frame.y.shape[0]
    # tile boundaries are not filtered when across-tiles filtering is off
    no_x, no_y = [], []
    ti = params.tile_info
    if ti.nb_tiles > 1 and not params.pps.pps_loop_filter_across_tiles_enabled_flag:
        no_x = [x << log2_ctb for x in ti.col_x()[1:-1]]
        no_y = [y << log2_ctb for y in ti.row_y()[1:-1]]
    b_l, t_l = _beta_tc_offsets(params, "luma")
    deblock_plane_luma(frame.y, maps, b_l, t_l, bitdepth, pic_w, pic_h, log2_ctb, no_x, no_y)
    if frame.cb is not None:
        deblock_chroma(frame.cb, frame.cr, maps, params, bitdepth, pic_w, pic_h, log2_ctb, no_x, no_y)

"""Bit-exact numpy reference for SAO (band + edge offsets).

Parity: /root/reference/libovvc/rcn_sao.c (sao_band_filter :46,
sao_edge_filter :79, rcn_sao_ctu :119). SAO reads the deblocked (pre-SAO)
samples and writes filtered output; edge filtering skips entry-border
rows/columns per EO class.
"""

from __future__ import annotations

import numpy as np

from openvvc_tpu.vcl.sao import SAO_BAND, SAO_EDGE

_EO_POS = (
    ((-1, 0), (1, 0)),    # 0: horizontal
    ((0, -1), (0, 1)),    # 1: vertical
    ((-1, -1), (1, 1)),   # 2: 45 degree
    ((1, -1), (-1, 1)),   # 3: 135 degree
)


def _band(dst, src, y0, x0, h, w, offsets, band_pos, bitdepth):
    table = np.zeros(32, np.int64)
    for k in range(4):
        table[(k + band_pos) & 31] = offsets[k]
    shift = bitdepth - 5
    blk = src[y0 : y0 + h, x0 : x0 + w].astype(np.int64)
    out = blk + table[blk >> shift]
    dst[y0 : y0 + h, x0 : x0 + w] = np.clip(out, 0, (1 << bitdepth) - 1)


def _edge(dst, src, y0, x0, h, w, offsets, eo, bitdepth, borders):
    xs = ys = 0
    if borders["left"] and eo != 1:
        xs = 1
        w -= 1
    if borders["top"] and eo != 0:
        ys = 1
        h -= 1
    if borders["right"] and eo != 1:
        w -= 1
    if borders["bottom"] and eo != 0:
        h -= 1
    if w <= 0 or h <= 0:
        return
    (ax, ay), (bx, by) = _EO_POS[eo]
    ys0, xs0 = y0 + ys, x0 + xs
    cur = src[ys0 : ys0 + h, xs0 : xs0 + w].astype(np.int64)
    na = src[ys0 + ay : ys0 + ay + h, xs0 + ax : xs0 + ax + w].astype(np.int64)
    nb = src[ys0 + by : ys0 + by + h, xs0 + bx : xs0 + bx + w].astype(np.int64)
    idx = 2 + np.sign(cur - na) + np.sign(cur - nb)
    off = np.asarray(offsets, np.int64)[idx]
    dst[ys0 : ys0 + h, xs0 : xs0 + w] = np.clip(cur + off, 0, (1 << bitdepth) - 1)


def apply_sao_entry(frame, entry_bounds, ctb_log2, sao_params, bitdepth, pic_w, pic_h):
    """Apply SAO over one rectangular entry in-place on frame (y, cb, cr).

    entry_bounds: (ctu_x0, ctu_y0, nb_w, nb_h); sao_params: {(cx,cy): SaoParams}.
    """
    ex0, ey0, nw, nh = entry_bounds
    planes = [frame.y] + ([frame.cb, frame.cr] if frame.cb is not None else [])
    srcs = [p.copy() for p in planes]
    ctb = 1 << ctb_log2

    for (cx, cy), sao in sao_params.items():
        for c, (plane, src) in enumerate(zip(planes, srcs)):
            if sao.type_idx[c] == 0:
                continue
            sh = 0 if c == 0 else 1
            x0 = (cx << ctb_log2) >> sh
            y0 = (cy << ctb_log2) >> sh
            w = min(ctb >> sh, (pic_w >> sh) - x0)
            h = min(ctb >> sh, (pic_h >> sh) - y0)
            if w <= 0 or h <= 0:
                continue
            if sao.type_idx[c] == SAO_BAND:
                _band(plane, src, y0, x0, h, w, sao.offset_val[c],
                      sao.band_position[c], bitdepth)
            else:
                borders = {
                    "left": cx == ex0,
                    "top": cy == ey0,
                    "right": cx == ex0 + nw - 1 or ((cx + 1) << ctb_log2) >= pic_w,
                    "bottom": cy == ey0 + nh - 1 or ((cy + 1) << ctb_log2) >= pic_h,
                }
                if nh == 1:
                    # single-CTU-row entry quirk (rcn_sao.c pipeline): the CTU
                    # is SAO'd as [0, 2*margin) then [2*margin, H), each with
                    # the BOTTOM border trim -> row 2*margin-1 never filtered
                    m = 6 >> sh
                    b1 = dict(borders)
                    b1["bottom"] = True
                    _edge(plane, src, y0, x0, min(m, h), w, sao.offset_val[c],
                          sao.eo_class[c], bitdepth, b1)
                    if h > m:
                        b2 = dict(borders)
                        b2["top"] = False
                        _edge(plane, src, y0 + m, x0, h - m, w, sao.offset_val[c],
                              sao.eo_class[c], bitdepth, b2)
                else:
                    _edge(plane, src, y0, x0, h, w, sao.offset_val[c],
                          sao.eo_class[c], bitdepth, borders)

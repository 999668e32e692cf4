"""Coding tree (QT + multi-type tree) syntax, ITU-T H.266 7.3.11.2/7.3.11.4.

Covers: explicit QT/BT/TT splits with CABAC context derivation (9.3.4.2.2),
implicit splits at picture borders, I-slice dual tree (sps_qtbtt_dual_tree),
and SCIPU / local dual tree (mode-type constraints, non_inter_flag).

Behavior parity with /root/reference/libovvc/vcl_coding_tree.c
(coding_quadtree :237, multi_type_tree :880, dual_tree :559,
separate_trees_{qt,bt,tt} :788,816,761 and the implicit-split variants), which
passes the JVET conformance suite; where that code and the spec text disagree
we follow the reference since conformance streams validate it.

The same function drives parse (CabacReaderIO) and generation (CabacWriterIO);
the tree is materialized as `TreeNode`s either way.
"""

from __future__ import annotations

from openvvc_tpu.cabac.ctx import CtxOffset
from openvvc_tpu.vcl.ctu import (
    MODE_INTRA,
    MODE_TYPE_ALL,
    MODE_TYPE_INTER,
    MODE_TYPE_INTRA,
    TREE_DUAL_CHROMA,
    TREE_DUAL_LUMA,
    TREE_SINGLE,
    UNAVAIL,
    Node,
)

# split kinds
NO_SPLIT = 0
QT_SPLIT = 1
BT_H = 2
BT_V = 3
TT_H = 4
TT_V = 5


class TreeNode(Node):
    """One coding-tree node; fields: split, children, cu, mode_constraint."""

    def __init__(self, split=NO_SPLIT, children=None, cu=None):
        self.split = split
        self.children = children if children is not None else []
        self.cu = cu


def _read_split_cu_flag(ctx, io, node, x0, y0, log2_w, log2_h, nb_split_cand, chroma):
    if chroma:
        abv = ctx.cnbr_log2_w_above(x0, y0)
        lft = ctx.cnbr_log2_h_left(x0, y0)
    else:
        abv = ctx.nbr_log2_w_above(x0, y0)
        lft = ctx.nbr_log2_h_left(x0, y0)
    ctx_off = (lft < log2_h) + (abv < log2_w) + (nb_split_cand >> 1) * 3
    if io.is_reader:
        v = io.raw_bin(CtxOffset.SPLIT_FLAG + ctx_off)
    else:
        v = io.put_bin(1 if node.split != NO_SPLIT else 0, CtxOffset.SPLIT_FLAG + ctx_off)
    return v


def _read_split_qt_flag(ctx, io, node, x0, y0, qt_depth, chroma):
    if chroma:
        d_abv = ctx.cnbr_qt_depth_above(x0, y0)
        d_lft = ctx.cnbr_qt_depth_left(x0, y0)
    else:
        d_abv = ctx.nbr_qt_depth_above(x0, y0)
        d_lft = ctx.nbr_qt_depth_left(x0, y0)
    ctx_off = (d_lft > qt_depth) + (d_abv > qt_depth) + (0 if qt_depth < 2 else 3)
    if io.is_reader:
        return io.raw_bin(CtxOffset.SPLIT_QT_FLAG + ctx_off)
    return io.put_bin(1 if node.split == QT_SPLIT else 0, CtxOffset.SPLIT_QT_FLAG + ctx_off)


def _read_mtt_vertical_flag(ctx, io, node, x0, y0, log2_w, log2_h, nb_v, nb_h, chroma):
    if chroma:
        abv = ctx.cnbr_log2_w_above(x0, y0)
        lft = ctx.cnbr_log2_h_left(x0, y0)
    else:
        abv = ctx.nbr_log2_w_above(x0, y0)
        lft = ctx.nbr_log2_h_left(x0, y0)
    if nb_v == nb_h:
        w_ratio = (1 << log2_w) >> (abv & 0x7)
        h_ratio = (1 << log2_h) >> (lft & 0x7)
        if w_ratio == h_ratio or abv == UNAVAIL or lft == UNAVAIL:
            c = 0
        elif w_ratio < h_ratio:
            c = 1
        else:
            c = 2
    elif nb_v < nb_h:
        c = 3
    else:
        c = 4
    if io.is_reader:
        return io.raw_bin(CtxOffset.SPLIT_HV_FLAG + c)
    return io.put_bin(1 if node.split in (BT_V, TT_V) else 0, CtxOffset.SPLIT_HV_FLAG + c)


def _read_mtt_binary_flag(ctx, io, node, mtt_depth, vertical):
    c = (vertical << 1) | (1 if mtt_depth <= 1 else 0)
    if io.is_reader:
        return io.raw_bin(CtxOffset.SPLIT12_FLAG + c)
    return io.put_bin(1 if node.split in (BT_H, BT_V) else 0, CtxOffset.SPLIT12_FLAG + c)


def _mode_constraint(ctx, io, node, x0, y0):
    """non_inter_flag signaling for SCIPU in P/B slices; returns share value.

    share: 1 -> local dual tree, all-intra subtree; 2 -> all-inter subtree.
    """
    ux, uy = ctx._lu(x0, y0)
    abv_intra = False
    lft_intra = False
    if ctx.in_tile(x0, y0 - 1):
        abv_intra = ctx.map_pred_mode[uy - 1, ux] == MODE_INTRA
    if ctx.in_tile(x0 - 1, y0):
        lft_intra = ctx.map_pred_mode[uy, ux - 1] == MODE_INTRA
    c = 1 if (abv_intra or lft_intra) else 0
    if io.is_reader:
        bin_val = io.raw_bin(CtxOffset.MODE_CONS_FLAG + c)
        node.mode_constraint = 2 >> bin_val
    else:
        io.put_bin(1 if node.mode_constraint == 1 else 0, CtxOffset.MODE_CONS_FLAG + c)
    return node.mode_constraint


def _separate_trees(ctx, io, node, x0, y0, child_luma_area, narrow_chroma):
    """SCIPU decision at a split of a single-tree node.

    child_luma_area: luma sample count of the (smallest) resulting child.
    narrow_chroma: True when the split creates 2-wide chroma blocks regardless
    of area. Returns 0 (none), 1 (intra local dual tree), 2 (inter-only).
    """
    if ctx.share or ctx.tree_type != TREE_SINGLE:
        return 0
    chroma_area = child_luma_area >> 2
    if chroma_area >= 16 and not narrow_chroma:
        return 0
    if child_luma_area < 32 or ctx.slice_is_intra:
        return 1
    return _mode_constraint(ctx, io, node, x0, y0)


def coding_quadtree(ctx, io, node, x0, y0, log2_s, qt_depth, coding_unit_fn):
    """QT stage of the coding tree over a square node (luma or chroma tree).

    Coordinates and part-info are component-local (chroma tree runs in chroma
    samples with the chroma partition constraints).
    """
    chroma = ctx.tree_type == TREE_DUAL_CHROMA
    part = ctx.part_chroma if chroma else ctx.part_luma
    pic_w = ctx.pic_w >> (1 if chroma else 0)
    pic_h = ctx.pic_h >> (1 if chroma else 0)

    # implicit boundary split?
    if x0 + (1 << log2_s) > pic_w or y0 + (1 << log2_s) > pic_h:
        return _coding_quadtree_implicit(ctx, io, node, x0, y0, log2_s, qt_depth, coding_unit_fn)

    allow_qt = log2_s > part.log2_min_qt_s and log2_s > part.log2_min_cb_s and log2_s > 2
    allow_bt = (
        log2_s <= part.log2_max_bt_s
        and part.max_mtt_depth > 0
        and log2_s > part.log2_min_cb_s
        and log2_s > 2
    )
    allow_tt = (
        log2_s <= part.log2_max_tt_s
        and part.max_mtt_depth > 0
        and (log2_s - 1) > part.log2_min_cb_s
        and log2_s > 2
    )
    if ctx.share == 2 and 2 * log2_s == 6:
        allow_tt = False

    split_cu = 0
    if allow_qt or allow_bt or allow_tt:
        nb_split_cand = (allow_tt << 1) + (allow_bt << 1) + (allow_qt << 1) - 1
        split_cu = _read_split_cu_flag(ctx, io, node, x0, y0, log2_s, log2_s, nb_split_cand, chroma)

    if split_cu:
        split_qt = allow_qt
        if allow_qt and (allow_bt or allow_tt):
            split_qt = _read_split_qt_flag(ctx, io, node, x0, y0, qt_depth, chroma)
        if split_qt:
            return _descend_qt(ctx, io, node, x0, y0, log2_s, qt_depth, coding_unit_fn, chroma)
        # enter MTT: freeze qt depth maps
        _store_qt_depth(ctx, x0, y0, log2_s, qt_depth, chroma)
        return multi_type_tree(ctx, io, node, x0, y0, log2_s, log2_s, 0, 0, 0, coding_unit_fn)

    # leaf
    if io.is_reader:
        node.split = NO_SPLIT
    _leaf(ctx, io, node, x0, y0, log2_s, log2_s, coding_unit_fn)
    _store_qt_depth(ctx, x0, y0, log2_s, qt_depth, chroma)
    return node


def _descend_qt(ctx, io, node, x0, y0, log2_s, qt_depth, coding_unit_fn, chroma):
    if io.is_reader:
        node.split = QT_SPLIT
        node.children = [TreeNode() for _ in range(4)]
    half = 1 << (log2_s - 1)
    x1, y1 = x0 + half, y0 + half

    sep = 0
    if not chroma:
        child_area = 1 << (2 * log2_s - 2)
        sep = _separate_trees(ctx, io, node, x0, y0, child_area, False)
    if sep:
        return _separate_qt_subtree(ctx, io, node, x0, y0, log2_s, qt_depth, coding_unit_fn, sep)

    for i, (cx, cy) in enumerate(((x0, y0), (x1, y0), (x0, y1), (x1, y1))):
        coding_quadtree(ctx, io, node.children[i], cx, cy, log2_s - 1, qt_depth + 1, coding_unit_fn)
    return node


def _separate_qt_subtree(ctx, io, node, x0, y0, log2_s, qt_depth, coding_unit_fn, sep):
    """QT split under a SCIPU decision (share=1: local dual tree; 2: inter)."""
    node.mode_constraint = sep
    half = 1 << (log2_s - 1)
    x1, y1 = x0 + half, y0 + half
    prev_share = ctx.share
    ctx.share = sep
    prev_mode_type = ctx.mode_type
    ctx.mode_type = MODE_TYPE_INTRA if sep == 1 else MODE_TYPE_INTER
    prev_tree = ctx.tree_type
    if sep == 1:
        ctx.tree_type = TREE_DUAL_LUMA  # luma-only CUs below

    for i, (cx, cy) in enumerate(((x0, y0), (x1, y0), (x0, y1), (x1, y1))):
        coding_quadtree(ctx, io, node.children[i], cx, cy, log2_s - 1, qt_depth + 1, coding_unit_fn)

    if sep == 1:
        # chroma of the SCIPU node: its own (tiny) tree in chroma coords
        ctx.tree_type = TREE_DUAL_CHROMA
        if io.is_reader:
            node.chroma_tree = TreeNode()
        part_c = ctx.part_chroma
        if log2_s - 2 > part_c.log2_min_qt_s:
            coding_quadtree(ctx, io, node.chroma_tree, x0 >> 1, y0 >> 1, log2_s - 2, qt_depth + 1, coding_unit_fn)
        else:
            _leaf(ctx, io, node.chroma_tree, x0 >> 1, y0 >> 1, log2_s - 1, log2_s - 1, coding_unit_fn)
            if not prev_share and prev_tree == TREE_SINGLE:
                _store_qt_depth(ctx, x0 >> 1, y0 >> 1, log2_s - 1, qt_depth, True)
    ctx.tree_type = prev_tree
    ctx.mode_type = prev_mode_type
    ctx.share = prev_share
    return node


def multi_type_tree(
    ctx,
    io,
    node,
    x0,
    y0,
    log2_w,
    log2_h,
    mtt_depth,
    middle_tt,
    implicit_mtt_depth,
    coding_unit_fn,
):
    chroma = ctx.tree_type == TREE_DUAL_CHROMA
    part = ctx.part_chroma if chroma else ctx.part_luma

    can_split = (mtt_depth - implicit_mtt_depth) < part.max_mtt_depth
    if ctx.share == 1 and chroma:
        can_split = False

    allow_tt_v = allow_tt_h = allow_bt_v = allow_bt_h = False
    if can_split:
        allow_tt = (
            log2_w <= part.log2_max_tt_s
            and log2_h <= part.log2_max_tt_s
            and log2_w <= 6
            and log2_h <= 6
            and not (ctx.share == 2 and log2_w + log2_h == 6)
        )
        allow_tt_v = allow_tt and (log2_w - 1) > part.log2_min_cb_s
        allow_tt_h = allow_tt and (log2_h - 1) > part.log2_min_cb_s
        if chroma and log2_w == 3:
            allow_tt_v = False  # would create 2-wide chroma

        allow_bt_v = (
            part.log2_min_cb_s < log2_w <= part.log2_max_bt_s and middle_tt != 1
        )
        allow_bt_h = (
            part.log2_min_cb_s < log2_h <= part.log2_max_bt_s and middle_tt != 2
        )
        if chroma and log2_w == 2:
            allow_bt_v = False
        if log2_h + log2_w <= 4:
            allow_bt_v = allow_bt_h = False
        if log2_h + log2_w - 1 <= 4:
            allow_tt_v = allow_tt_h = False
        if ctx.share == 2 and log2_w + log2_h == 5:
            allow_bt_v = allow_bt_h = False
        if log2_h > 6 and log2_w <= 6:
            allow_bt_v = False
        if log2_w > 6 and log2_h <= 6:
            allow_bt_h = False
        if log2_w > part.log2_max_bt_s or log2_h > part.log2_max_bt_s:
            allow_bt_v = allow_bt_h = False
        can_split = allow_bt_v or allow_bt_h or allow_tt_v or allow_tt_h

    if can_split:
        if mtt_depth == 0:
            split_cu = 1  # split flag was consumed by the QT stage
        else:
            nb_split_cand = allow_bt_v + allow_bt_h + allow_tt_v + allow_tt_h - 1
            split_cu = _read_split_cu_flag(
                ctx, io, node, x0, y0, log2_w, log2_h, nb_split_cand, chroma
            )
        if split_cu:
            if not io.is_reader and node.split != NO_SPLIT:
                allowed = {BT_V: allow_bt_v, BT_H: allow_bt_h, TT_V: allow_tt_v, TT_H: allow_tt_h}
                if not allowed.get(node.split, False):
                    raise ValueError(
                        f"generator tree requests disallowed split {node.split} at "
                        f"({x0},{y0}) {1<<log2_w}x{1<<log2_h} mtt_depth={mtt_depth} middle_tt={middle_tt}"
                    )
            can_v = allow_tt_v or allow_bt_v
            can_h = allow_tt_h or allow_bt_h
            if can_v and can_h:
                vertical = _read_mtt_vertical_flag(
                    ctx, io, node, x0, y0, log2_w, log2_h,
                    allow_bt_v + allow_tt_v, allow_bt_h + allow_tt_h, chroma,
                )
            else:
                vertical = 1 if can_v else 0
            if (vertical and allow_tt_v and allow_bt_v) or (
                not vertical and allow_tt_h and allow_bt_h
            ):
                is_bt = _read_mtt_binary_flag(ctx, io, node, mtt_depth, vertical)
            else:
                is_bt = int(allow_bt_v if vertical else allow_bt_h)
            if io.is_reader:
                node.split = (BT_V if vertical else BT_H) if is_bt else (TT_V if vertical else TT_H)
            if is_bt:
                return _bt_split(ctx, io, node, x0, y0, log2_w, log2_h, mtt_depth,
                                 implicit_mtt_depth, vertical, coding_unit_fn)
            return _tt_split(ctx, io, node, x0, y0, log2_w, log2_h, mtt_depth,
                             implicit_mtt_depth, vertical, coding_unit_fn)

    if io.is_reader:
        node.split = NO_SPLIT
    _leaf(ctx, io, node, x0, y0, log2_w, log2_h, coding_unit_fn)
    return node


def _with_scipu(ctx, io, node, x0, y0, child_area, narrow_chroma, split_fn):
    """Run split_fn under the SCIPU mode decided for this split."""
    sep = _separate_trees(ctx, io, node, x0, y0, child_area, narrow_chroma)
    if not sep:
        return split_fn(), 0
    node.mode_constraint = sep
    prev_share, prev_mode, prev_tree = ctx.share, ctx.mode_type, ctx.tree_type
    ctx.share = sep
    ctx.mode_type = MODE_TYPE_INTRA if sep == 1 else MODE_TYPE_INTER
    if sep == 1:
        ctx.tree_type = TREE_DUAL_LUMA
    result = split_fn()
    ctx.tree_type, ctx.mode_type, ctx.share = prev_tree, prev_mode, prev_share
    return result, sep


def _bt_split(ctx, io, node, x0, y0, log2_w, log2_h, mtt_depth, imp_depth, vertical, coding_unit_fn):
    if io.is_reader:
        node.children = [TreeNode() for _ in range(2)]
    if vertical:
        l2w, l2h = log2_w - 1, log2_h
        x1, y1 = x0 + (1 << l2w), y0
    else:
        l2w, l2h = log2_w, log2_h - 1
        x1, y1 = x0, y0 + (1 << l2h)

    chroma = ctx.tree_type == TREE_DUAL_CHROMA
    child_area = 1 << (log2_w + log2_h - 1)
    narrow = vertical and log2_w == 3

    def run():
        multi_type_tree(ctx, io, node.children[0], x0, y0, l2w, l2h, mtt_depth + 1, 0,
                        imp_depth, coding_unit_fn)
        multi_type_tree(ctx, io, node.children[1], x1, y1, l2w, l2h, mtt_depth + 1, 0,
                        imp_depth, coding_unit_fn)
        return node

    if chroma:
        return run()
    result, sep = _with_scipu(ctx, io, node, x0, y0, child_area, narrow, run)
    if sep == 1:
        _separate_tree_chroma_mtt(ctx, io, node, x0, y0, log2_w, log2_h, mtt_depth,
                                  imp_depth, coding_unit_fn)
    return result


def _tt_split(ctx, io, node, x0, y0, log2_w, log2_h, mtt_depth, imp_depth, vertical, coding_unit_fn):
    if io.is_reader:
        node.children = [TreeNode() for _ in range(3)]
    if vertical:
        l2w1, l2h1 = log2_w - 2, log2_h
        l2w2, l2h2 = log2_w - 1, log2_h
        x1, y1 = x0 + (1 << l2w1), y0
        x2, y2 = x1 + (1 << l2w2), y0
    else:
        l2w1, l2h1 = log2_w, log2_h - 2
        l2w2, l2h2 = log2_w, log2_h - 1
        x1, y1 = x0, y0 + (1 << l2h1)
        x2, y2 = x0, y1 + (1 << l2h2)

    chroma = ctx.tree_type == TREE_DUAL_CHROMA
    child_area = 1 << (log2_w + log2_h - 2)
    narrow = vertical and log2_w == 4
    middle = 1 if vertical else 2

    def run():
        multi_type_tree(ctx, io, node.children[0], x0, y0, l2w1, l2h1, mtt_depth + 1, 0,
                        imp_depth, coding_unit_fn)
        multi_type_tree(ctx, io, node.children[1], x1, y1, l2w2, l2h2, mtt_depth + 1, middle,
                        imp_depth, coding_unit_fn)
        multi_type_tree(ctx, io, node.children[2], x2, y2, l2w1, l2h1, mtt_depth + 1, 0,
                        imp_depth, coding_unit_fn)
        return node

    if chroma:
        return run()
    result, sep = _with_scipu(ctx, io, node, x0, y0, child_area, narrow, run)
    if sep == 1:
        _separate_tree_chroma_mtt(ctx, io, node, x0, y0, log2_w, log2_h, mtt_depth,
                                  imp_depth, coding_unit_fn)
    return result


def _separate_tree_chroma_mtt(ctx, io, node, x0, y0, log2_w, log2_h, mtt_depth, imp_depth, coding_unit_fn):
    """Chroma CU of an intra SCIPU below an MTT split (single chroma CU)."""
    prev_tree = ctx.tree_type
    prev_share = ctx.share
    ctx.tree_type = TREE_DUAL_CHROMA
    ctx.share = 1
    if io.is_reader:
        node.chroma_tree = TreeNode()
    multi_type_tree(ctx, io, node.chroma_tree, x0 >> 1, y0 >> 1, log2_w - 1, log2_h - 1,
                    mtt_depth, 0, imp_depth, coding_unit_fn)
    ctx.tree_type = prev_tree
    ctx.share = prev_share


# -- implicit boundary trees -------------------------------------------


def _coding_quadtree_implicit(ctx, io, node, x0, y0, log2_s, qt_depth, coding_unit_fn):
    chroma = ctx.tree_type == TREE_DUAL_CHROMA
    part = ctx.part_chroma if chroma else ctx.part_luma
    rem_w = ctx.pic_w >> (1 if chroma else 0)
    rem_h = ctx.pic_h >> (1 if chroma else 0)

    x_end = x0 + (1 << log2_s)
    y_end = y0 + (1 << log2_s)

    allow_qt = log2_s > part.log2_min_qt_s
    allow_bt = log2_s <= part.log2_max_bt_s and log2_s <= 6 and part.max_mtt_depth > 0
    allow_qt = allow_qt or not allow_bt
    force_qt = x_end > rem_w and y_end > rem_h

    split_qt = allow_qt
    if allow_bt and not force_qt and allow_qt:
        split_qt = _read_split_qt_flag(ctx, io, node, x0, y0, qt_depth, chroma)

    if split_qt:
        if io.is_reader:
            node.split = QT_SPLIT
            node.children = [TreeNode() for _ in range(4)]
        half = 1 << (log2_s - 1)
        x1, y1 = x0 + half, y0 + half
        coding_quadtree(ctx, io, node.children[0], x0, y0, log2_s - 1, qt_depth + 1, coding_unit_fn)
        if x1 < rem_w:
            coding_quadtree(ctx, io, node.children[1], x1, y0, log2_s - 1, qt_depth + 1, coding_unit_fn)
        if y1 < rem_h:
            coding_quadtree(ctx, io, node.children[2], x0, y1, log2_s - 1, qt_depth + 1, coding_unit_fn)
        if x1 < rem_w and y1 < rem_h:
            coding_quadtree(ctx, io, node.children[3], x1, y1, log2_s - 1, qt_depth + 1, coding_unit_fn)
        return node

    _store_qt_depth(ctx, x0, y0, log2_s, qt_depth, chroma)
    if x_end > rem_w:
        return _binary_tree_implicit(ctx, io, node, x0, y0, log2_s, log2_s, 0, True, coding_unit_fn)
    return _binary_tree_implicit(ctx, io, node, x0, y0, log2_s, log2_s, 0, False, coding_unit_fn)


def _binary_tree_implicit(ctx, io, node, x0, y0, log2_w, log2_h, mtt_depth, vertical, coding_unit_fn):
    chroma = ctx.tree_type == TREE_DUAL_CHROMA
    rem_w = ctx.pic_w >> (1 if chroma else 0)
    rem_h = ctx.pic_h >> (1 if chroma else 0)

    if vertical:
        implicit = x0 + (1 << log2_w) > rem_w
    else:
        implicit = y0 + (1 << log2_h) > rem_h

    if not implicit:
        return multi_type_tree(ctx, io, node, x0, y0, log2_w, log2_h, mtt_depth, 0,
                               mtt_depth, coding_unit_fn)

    if io.is_reader:
        node.split = BT_V if vertical else BT_H
        node.children = [TreeNode() for _ in range(2)]
    if vertical:
        l2w, l2h = log2_w - 1, log2_h
        x1, y1 = x0 + (1 << l2w), y0
        first_fits = x1 <= rem_w
        second_exists = x1 < rem_w
    else:
        l2w, l2h = log2_w, log2_h - 1
        x1, y1 = x0, y0 + (1 << l2h)
        first_fits = y1 <= rem_h
        second_exists = y1 < rem_h

    if first_fits:
        multi_type_tree(ctx, io, node.children[0], x0, y0, l2w, l2h, mtt_depth + 1, 0,
                        mtt_depth + 1, coding_unit_fn)
    else:
        _binary_tree_implicit(ctx, io, node.children[0], x0, y0, l2w, l2h, mtt_depth + 1,
                              vertical, coding_unit_fn)
    if second_exists:
        _binary_tree_implicit(ctx, io, node.children[1], x1, y1, l2w, l2h, mtt_depth + 1,
                              vertical, coding_unit_fn)
    return node


# -- dual tree (I slices with sps_qtbtt_dual_tree_intra_flag) -----------


def dual_tree_ctu(ctx, io, node, x0, y0, log2_s, qt_depth, coding_unit_fn):
    """Implicit QT to 64x64, then separate luma/chroma quadtrees."""
    pic_w, pic_h = ctx.pic_w, ctx.pic_h
    if log2_s > 6:
        if io.is_reader:
            node.split = QT_SPLIT
            node.children = [TreeNode() for _ in range(4)]
        half = 1 << (log2_s - 1)
        x1, y1 = x0 + half, y0 + half
        for i, (cx, cy) in enumerate(((x0, y0), (x1, y0), (x0, y1), (x1, y1))):
            if cx < pic_w and cy < pic_h:
                dual_tree_ctu(ctx, io, node.children[i], cx, cy, log2_s - 1, qt_depth + 1, coding_unit_fn)
        return node

    if io.is_reader:
        node.luma_tree = TreeNode()
        node.chroma_tree = TreeNode()
    node.split = NO_SPLIT
    ctx.tree_type = TREE_DUAL_LUMA
    coding_quadtree(ctx, io, node.luma_tree, x0, y0, log2_s, qt_depth, coding_unit_fn)
    if ctx.chroma_enabled:
        ctx.tree_type = TREE_DUAL_CHROMA
        coding_quadtree(ctx, io, node.chroma_tree, x0 >> 1, y0 >> 1, log2_s - 1, qt_depth, coding_unit_fn)
    ctx.tree_type = TREE_SINGLE
    return node


# -- helpers ------------------------------------------------------------


def _store_qt_depth(ctx, x0, y0, log2_s, qt_depth, chroma):
    if chroma:
        ctx.store_qt_depth_chroma(x0, y0, log2_s, qt_depth)
    else:
        ctx.store_qt_depth_luma(x0, y0, log2_s, qt_depth)
        # shared-tree chroma follows luma qt depth (reference store_qt_depth)
        if not ctx.share and ctx.tree_type == TREE_SINGLE and ctx.chroma_enabled:
            ctx.store_qt_depth_chroma(x0 >> 1, y0 >> 1, log2_s - 1, qt_depth)


def _leaf(ctx, io, node, x0, y0, log2_w, log2_h, coding_unit_fn):
    node.split = NO_SPLIT
    coding_unit_fn(ctx, io, node, x0, y0, log2_w, log2_h)

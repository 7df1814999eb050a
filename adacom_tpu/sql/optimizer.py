"""Logical optimizer.

Parity with the reference Optimizer (src/optimizer/optimizer.cpp:72) for the
rules that matter to this engine's workloads:
- filter pushdown into scans and through projections/joins
  (src/optimizer/pushdown/*)
- projection ("unused column") pruning down to LogicalGet.column_ids
  (src/optimizer/remove_unused_columns.cpp)
- Order+Limit -> TopN (src/optimizer/topn_optimizer.cpp)
- constant folding (src/optimizer/rule/constant_folding.cpp)
Join ordering is left to the planner's syntactic order (DP join order is a
later milestone; noted in SURVEY.md §2.2)."""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Set

from adacom_tpu import types as tt
from adacom_tpu.sql import bound as b
from adacom_tpu.sql.binder import _split_conjuncts


def optimize(plan: b.LogicalOp, structural: Optional[set] = None) -> b.LogicalOp:
    if structural is None:
        structural = set()
    plan = push_filters(plan)
    plan = fuse_topn(plan, structural)
    plan = prune_columns(plan)
    # optimize remaining (scalar/exists) subquery plans
    for node in b.walk(plan):
        for e in b.iter_node_exprs(node):
            for sq in _subqueries_in(e):
                sq.plan = fuse_topn(sq.plan, structural)
                sq.plan = prune_columns(sq.plan)
    return plan


# ---------------- filter pushdown ----------------


def push_filters(op: b.LogicalOp) -> b.LogicalOp:
    if isinstance(op, b.LogicalFilter):
        child = push_filters(op.child)
        conjuncts = _split_conjuncts(op.condition)
        # separate IN (subquery) conjuncts; they become semi/anti joins
        # AFTER the plain conjuncts have sunk (so join-condition lifting in
        # cross-join chains happens below, not above, the semi join)
        # (reference: src/planner/binder/query_node/plan_subquery.cpp)
        in_subs = []
        rest = []
        for c in conjuncts:
            if isinstance(c, b.BSubquery) and c.kind == "in":
                in_subs.append(c)
            else:
                for sq in _subqueries_in(c):
                    sq.plan = push_filters(sq.plan)
                rest.append(c)
        child, remaining = _push_conjuncts(child, rest)
        for c in in_subs:
            sub = push_filters(c.plan)
            jt = "anti" if c.negated else "semi"
            node = b.LogicalJoin(
                names=list(child.names), types=list(child.types),
                left=child, right=sub, join_type=jt,
                conditions=[(c.operand, b.BColumn(sub.types[0], 0))],
            )
            node.dicts = getattr(child, "dicts", [None] * len(child.names))
            child = node
        if not remaining:
            return child
        cond = remaining[0]
        for c in remaining[1:]:
            cond = b.BBinary(tt.BOOLEAN, "and", cond, c)
        op.child = child
        op.condition = cond
        return op
    for f in dataclasses.fields(op):
        v = getattr(op, f.name)
        if isinstance(v, b.LogicalOp):
            setattr(op, f.name, push_filters(v))
    return op


def _push_conjuncts(child: b.LogicalOp, conjuncts: List[b.BExpr]):
    """Try to sink each conjunct into `child`; returns (child', leftovers)."""
    remaining: List[b.BExpr] = []
    for c in conjuncts:
        if not _push_one(child, c):
            remaining.append(c)
    return child, remaining


def _push_one(node: b.LogicalOp, conj: b.BExpr) -> bool:
    if isinstance(node, b.LogicalGet):
        node.filters.append(conj)
        return True
    if isinstance(node, b.LogicalFilter):
        if _push_one(node.child, conj):
            return True
        node.condition = b.BBinary(tt.BOOLEAN, "and", node.condition, conj)
        return True
    if isinstance(node, b.LogicalProject):
        # rewrite through the projection when every referenced output column
        # is a direct column passthrough
        mapping = {}
        ok = True
        for col in _cols(conj):
            src = node.exprs[col.index]
            if isinstance(src, b.BColumn):
                mapping[col.index] = src.index
            else:
                ok = False
                break
        if not ok:
            return False
        rewritten = _remap(conj, mapping)
        return _push_one(node.child, rewritten)
    if isinstance(node, b.LogicalJoin):
        n_left = len(node.left.names)
        idxs = [c.index for c in _cols(conj)]
        if idxs and all(i < n_left for i in idxs):
            if node.join_type in ("inner", "cross", "semi", "anti"):
                # left-side-only predicates sink into the left input; for
                # LEFT joins they'd filter preserved rows, so don't push
                return _push_one(node.left, conj)
            return False
        if idxs and all(i >= n_left for i in idxs):
            if node.join_type in ("inner", "cross"):
                shifted = _remap(conj, {i: i - n_left for i in idxs})
                return _push_one(node.right, shifted)
            return False
        # conjunct spans both sides: lift equi-predicates into join
        # conditions (comma joins parse as CROSS; this is the reference's
        # filter-pushdown + join-condition extraction,
        # src/optimizer/pushdown/pushdown_cross_product.cpp)
        if node.join_type in ("inner", "cross"):
            if isinstance(conj, b.BBinary) and conj.op == "=":
                sl = _side_of(conj.left, n_left)
                sr = _side_of(conj.right, n_left)
                if sl == "left" and sr == "right":
                    node.conditions.append(
                        (conj.left, _remap(conj.right, {i: i - n_left for i in
                                                        [c.index for c in _cols(conj.right)]}))
                    )
                    node.join_type = "inner"
                    return True
                if sl == "right" and sr == "left":
                    node.conditions.append(
                        (conj.right, _remap(conj.left, {i: i - n_left for i in
                                                        [c.index for c in _cols(conj.left)]}))
                    )
                    node.join_type = "inner"
                    return True
            node.residual = conj if node.residual is None else b.BBinary(
                tt.BOOLEAN, "and", node.residual, conj
            )
            node.join_type = "inner"
            return True
        return False
    return False


def _subqueries_in(e: b.BExpr):
    return [x for x in b.expr_walk(e) if isinstance(x, b.BSubquery)]


def _side_of(e: b.BExpr, n_left: int):
    idxs = [c.index for c in _cols(e)]
    if not idxs:
        return None
    if all(i < n_left for i in idxs):
        return "left"
    if all(i >= n_left for i in idxs):
        return "right"
    return "both"


def _cols(e: b.BExpr) -> List[b.BColumn]:
    return [x for x in b.expr_walk(e) if isinstance(x, b.BColumn)]


def _apply_mapping(exprs, mapping) -> None:
    """Remap column indices across expressions, visiting each shared
    BColumn object exactly once (BETWEEN/CASE desugaring shares nodes)."""
    seen = set()
    for e in exprs:
        if e is None:
            continue
        for c in _cols(e):
            if id(c) in seen:
                continue
            seen.add(id(c))
            c.index = mapping[c.index]


def _remap(e: b.BExpr, mapping: Dict[int, int]) -> b.BExpr:
    e = _copy_expr(e)
    for x in b.expr_walk(e):
        if isinstance(x, b.BColumn) and x.index in mapping:
            x.index = mapping[x.index]
    return e


def _copy_expr(e: b.BExpr) -> b.BExpr:
    kwargs = {}
    for f in dataclasses.fields(e):
        v = getattr(e, f.name)
        if isinstance(v, b.BExpr):
            v = _copy_expr(v)
        elif isinstance(v, list):
            v = [
                _copy_expr(x) if isinstance(x, b.BExpr)
                else tuple(_copy_expr(y) if isinstance(y, b.BExpr) else y for y in x)
                if isinstance(x, tuple) else x
                for x in v
            ]
        kwargs[f.name] = v
    out = type(e)(**kwargs)
    if getattr(e, "is_interval", False):
        out.is_interval = True
    return out


# ---------------- TopN fusion ----------------


def fuse_topn(op: b.LogicalOp, structural: set) -> b.LogicalOp:
    for f in dataclasses.fields(op):
        v = getattr(op, f.name)
        if isinstance(v, b.LogicalOp):
            setattr(op, f.name, fuse_topn(v, structural))
    if isinstance(op, b.LogicalLimit) and isinstance(op.child, b.LogicalOrder):
        lim = op.limit
        off = op.offset
        if isinstance(lim, b.BLiteral) and isinstance(lim.value, int) and (
            off is None or (isinstance(off, b.BLiteral) and isinstance(off.value, int))
        ):
            # baking the limit value into the plan makes its literal slot
            # structural for the plan cache
            if lim.param is not None:
                structural.add(lim.param)
            if off is not None and off.param is not None:
                structural.add(off.param)
            order = op.child
            node = b.LogicalTopN(
                names=list(order.names), types=list(order.types),
                child=order.child, keys=order.keys,
                limit=int(lim.value),
                offset=int(off.value) if off is not None else 0,
            )
            node.dicts = getattr(order, "dicts", [None] * len(order.names))
            return node
    return op


# ---------------- projection pruning ----------------


def prune_columns(op: b.LogicalOp, required: Optional[Set[int]] = None) -> b.LogicalOp:
    """Restrict every LogicalGet to the columns actually used above it."""
    if isinstance(op, b.LogicalGet):
        if required is None:
            required = set(range(len(op.names)))
        used = set(required)
        for fl in op.filters:
            used.update(c.index for c in _cols(fl))
        keep = sorted(used) if used else [0] if op.names else []
        if not op.names:
            return op
        if not keep:
            keep = [0]
        mapping = {old: new for new, old in enumerate(keep)}
        _apply_mapping(op.filters, mapping)
        op.column_ids = [op.column_ids[i] for i in keep]
        new_names = [op.names[i] for i in keep]
        new_types = [op.types[i] for i in keep]
        dicts = getattr(op, "dicts", [None] * len(op.names))
        op.dicts = [dicts[i] for i in keep]
        op.names = new_names
        op.types = new_types
        op._pruned_mapping = mapping
        return op
    if isinstance(op, b.LogicalProject):
        used_child: Set[int] = set()
        for e in op.exprs:
            used_child.update(c.index for c in _cols(e))
        op.child = prune_columns(op.child, used_child)
        mapping = getattr(op.child, "_pruned_mapping", None)
        if mapping:
            _apply_mapping(op.exprs, mapping)
        return op
    if isinstance(op, b.LogicalFilter):
        used: Set[int] = set(required) if required is not None else set(range(len(op.names)))
        used.update(c.index for c in _cols(op.condition))
        op.child = prune_columns(op.child, used)
        mapping = getattr(op.child, "_pruned_mapping", None)
        if mapping:
            _apply_mapping([op.condition], mapping)
            op._pruned_mapping = mapping
            op.names = list(op.child.names)
            op.types = list(op.child.types)
            op.dicts = getattr(op.child, "dicts", [None] * len(op.names))
        return op
    if isinstance(op, b.LogicalAggregate):
        used: Set[int] = set()
        for g in op.groups:
            used.update(c.index for c in _cols(g))
        for a in op.aggregates:
            if a.arg is not None:
                used.update(c.index for c in _cols(a.arg))
        op.child = prune_columns(op.child, used)
        mapping = getattr(op.child, "_pruned_mapping", None)
        if mapping:
            _apply_mapping(list(op.groups) + [a.arg for a in op.aggregates], mapping)
        return op
    if isinstance(op, b.LogicalJoin):
        n_left = len(op.left.names)
        n_right = len(op.right.names)
        if required is None:
            required = set(range(len(op.names)))
        used_l = {i for i in required if i < n_left}
        used_r = {i - n_left for i in required if i >= n_left}
        for le, re_ in op.conditions:
            used_l.update(c.index for c in _cols(le))
            used_r.update(c.index for c in _cols(re_))
        if op.residual is not None:
            for c in _cols(op.residual):
                if c.index < n_left:
                    used_l.add(c.index)
                else:
                    used_r.add(c.index - n_left)
        op.left = prune_columns(op.left, used_l)
        op.right = prune_columns(op.right, used_r)
        ml = getattr(op.left, "_pruned_mapping", None) or {i: i for i in range(n_left)}
        mr = getattr(op.right, "_pruned_mapping", None) or {i: i for i in range(n_right)}
        new_n_left = len(op.left.names)
        _apply_mapping([le for le, _ in op.conditions], ml)
        _apply_mapping([re_ for _, re_ in op.conditions], mr)
        comb = {}
        for old in range(len(op.names)):
            if old < n_left and old in ml:
                comb[old] = ml[old]
            elif old >= n_left and (old - n_left) in mr:
                comb[old] = mr[old - n_left] + new_n_left
        if op.residual is not None:
            _apply_mapping([op.residual], comb)
        dicts = getattr(op, "dicts", [None] * len(op.names))
        remap_out, new_names, new_types, new_dicts = {}, [], [], []
        for old, new in sorted(comb.items(), key=lambda kv: kv[1]):
            remap_out[old] = len(new_names)
            new_names.append(op.names[old])
            new_types.append(op.types[old])
            new_dicts.append(dicts[old])
        op.names, op.types, op.dicts = new_names, new_types, new_dicts
        op._pruned_mapping = remap_out
        return op
    # default: pass everything through, no pruning across this node
    for f in dataclasses.fields(op):
        v = getattr(op, f.name)
        if isinstance(v, b.LogicalOp):
            setattr(op, f.name, prune_columns(v, None))
    return op

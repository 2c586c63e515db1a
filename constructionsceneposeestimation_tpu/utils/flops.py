"""Jaxpr-walking op counter for roofline analysis (benchmarks/roofline.py).

XLA's ``compiled.cost_analysis()`` does not descend into control-flow bodies
(``lax.scan`` / ``lax.map`` / ``while``), which this pipeline uses at both the
batch-chunk and ray-chunk level — its flop counts for the datagen program are
~500x low. This counter traverses the closed jaxpr instead, multiplying scan
bodies by their trip counts, and splits work into:

* ``vpu``   — elementwise lane-ops (weighted: divides/sqrts cost several
              multiplier slots on the VPU; weights are estimates, marked so).
* ``mxu``   — dot_general flops (2*M*N*K).
* ``gather_elems`` — elements moved by gather/scatter (the TPU anti-pattern
              tracker; should stay ~0 on the hot path).
* ``bytes_out`` — bytes of the traced function's outputs (guaranteed HBM
              writes; fused intermediates are invisible post-fusion and not
              estimated).

Counts are exact op tallies for the jaxpr as written; XLA fusion may elide a
few percent (CSE, folded constants), so treat them as upper bounds on issued
lane-ops.
"""

from __future__ import annotations

import math
from typing import Any, Dict

import jax
import numpy as np
from jax import core as jcore

try:  # jax moved ClosedJaxpr around across versions
    ClosedJaxpr = jcore.ClosedJaxpr
except AttributeError:  # pragma: no cover
    from jax.extend import core as jcore2

    ClosedJaxpr = jcore2.ClosedJaxpr

# Estimated VPU slot cost per lane-op. 1 = one ALU pass (add/mul/select/cmp).
# Divide/sqrt/transcendentals run on the slower special-function path; the
# weights below are v5e-era estimates (divide ~7x a multiply is measured in
# this repo — docs/PERFORMANCE.md shared-reciprocal note).
_COSTS = {
    "div": 7.0, "sqrt": 7.0, "rsqrt": 4.0, "pow": 10.0,
    "exp": 8.0, "log": 8.0, "log1p": 8.0, "expm1": 8.0,
    "sin": 8.0, "cos": 8.0, "tan": 12.0, "tanh": 8.0,
    "atan2": 12.0, "asin": 10.0, "acos": 10.0, "erf": 8.0,
    "logistic": 8.0, "cbrt": 10.0,
}
_TRANSCENDENTAL = set(_COSTS) - {"div", "sqrt", "rsqrt"}

# Elementwise primitives costed at out-elements * weight (default 1).
_ELEMENTWISE = {
    "add", "sub", "mul", "div", "rem", "max", "min", "neg", "abs", "sign",
    "floor", "ceil", "round", "nextafter", "exp", "log", "log1p", "expm1",
    "sin", "cos", "tan", "tanh", "atan2", "asin", "acos", "erf", "logistic",
    "sqrt", "rsqrt", "cbrt", "pow", "integer_pow", "and", "or", "xor", "not",
    "shift_left", "shift_right_logical", "shift_right_arithmetic",
    "eq", "ne", "lt", "le", "gt", "ge", "select_n", "clamp", "is_finite",
    "square",
}
# Shape/layout ops: zero lane-ops (XLA fuses or relabels them).
_FREE = {
    "broadcast_in_dim", "reshape", "transpose", "convert_element_type",
    "bitcast_convert_type", "squeeze", "expand_dims", "iota", "copy",
    "stop_gradient", "slice", "concatenate", "pad", "rev",
    "dynamic_slice", "dynamic_update_slice", "split",
    "reduce_precision", "optimization_barrier", "real", "imag",
}
_REDUCES = {"reduce_sum", "reduce_max", "reduce_min", "reduce_prod",
            "reduce_and", "reduce_or", "argmax", "argmin",
            "cumsum", "cummax", "cummin", "cumprod", "reduce_precision"}


def _size(v) -> float:
    return float(np.prod(v.aval.shape)) if v.aval.shape else 1.0


def _zero() -> Dict[str, float]:
    return {"vpu": 0.0, "mxu": 0.0, "transcendental_ops": 0.0,
            "gather_elems": 0.0, "unknown_prims": 0.0}


def _merge(a, b, scale=1.0):
    for k in a:
        a[k] += b[k] * scale
    return a


def _count_jaxpr(jaxpr, counts: Dict[str, float], notes: set) -> None:
    for eqn in jaxpr.eqns:
        name = eqn.primitive.name
        if name in _FREE:
            continue
        if name in _ELEMENTWISE:
            n = max((_size(v) for v in eqn.outvars), default=0.0)
            w = _COSTS.get(name, 1.0)
            if name == "integer_pow":
                w = math.ceil(math.log2(max(abs(eqn.params.get("y", 2)), 2)))
            counts["vpu"] += n * w
            if name in _TRANSCENDENTAL:
                counts["transcendental_ops"] += n
        elif name == "dot_general":
            (lc, rc), (lb, rb) = eqn.params["dimension_numbers"]
            lhs, rhs = eqn.invars[0].aval.shape, eqn.invars[1].aval.shape
            k = np.prod([lhs[i] for i in lc]) if lc else 1
            b = np.prod([lhs[i] for i in lb]) if lb else 1
            m = np.prod([d for i, d in enumerate(lhs)
                         if i not in lc and i not in lb]) or 1
            n = np.prod([d for i, d in enumerate(rhs)
                         if i not in rc and i not in rb]) or 1
            counts["mxu"] += 2.0 * float(b) * float(m) * float(n) * float(k)
        elif name in _REDUCES:
            counts["vpu"] += max((_size(v) for v in eqn.invars), default=0.0)
        elif name in ("gather", "scatter", "scatter_add", "scatter_max",
                      "scatter_min", "take_along_axis"):
            counts["gather_elems"] += max(
                (_size(v) for v in eqn.outvars), default=0.0)
        elif name == "scan":
            body = eqn.params["jaxpr"]
            inner = _zero()
            _count_jaxpr(body.jaxpr, inner, notes)
            _merge(counts, inner, scale=float(eqn.params["length"]))
        elif name == "while":
            # Trip count is dynamic; assume 1 and note it (the proxy pipeline
            # has no while loops; meshcast's cull loop needs manual scaling).
            notes.add("while_loop counted as 1 trip")
            for key in ("body_jaxpr", "cond_jaxpr"):
                _count_jaxpr(eqn.params[key].jaxpr, counts, notes)
        elif name == "cond":
            # All branches lower to select under vmap; count the max branch.
            branch_counts = []
            for br in eqn.params["branches"]:
                c = _zero()
                _count_jaxpr(br.jaxpr, c, notes)
                branch_counts.append(c)
            best = max(branch_counts, key=lambda c: c["vpu"] + c["mxu"])
            _merge(counts, best)
        elif name in ("pjit", "jit", "closed_call", "core_call", "remat_call",
                      "custom_jvp_call", "custom_vjp_call",
                      "custom_vjp_call_jaxpr", "checkpoint", "remat"):
            sub = eqn.params.get("jaxpr") or eqn.params.get("call_jaxpr")
            if sub is None:
                notes.add(f"call prim without jaxpr: {name}")
                continue
            _count_jaxpr(sub.jaxpr if hasattr(sub, "jaxpr") else sub,
                         counts, notes)
        elif name in ("custom_partitioning", "pallas_call", "tpu_custom_call"):
            notes.add(f"uncounted kernel: {name}")
            counts["unknown_prims"] += 1
        elif name in ("random_bits", "threefry2x32", "random_seed",
                      "random_wrap", "random_fold_in", "random_unwrap",
                      "random_split"):
            # Threefry: ~14 rounds of a few ops per 32-bit output word.
            counts["vpu"] += 50.0 * max(
                (_size(v) for v in eqn.outvars), default=0.0)
        elif name == "sort":
            n = max((_size(v) for v in eqn.invars), default=0.0)
            counts["vpu"] += n * max(math.log2(max(n, 2.0)), 1.0)
        else:
            notes.add(f"unknown prim: {name}")
            counts["unknown_prims"] += 1


def count_ops(fn, *args, **kwargs) -> Dict[str, Any]:
    """Trace ``fn(*args, **kwargs)`` and tally op counts (see module doc)."""
    closed = jax.make_jaxpr(fn)(*args, **kwargs)
    counts = _zero()
    notes: set = set()
    _count_jaxpr(closed.jaxpr, counts, notes)
    out_shapes = jax.eval_shape(fn, *args, **kwargs)
    bytes_out = sum(np.prod(l.shape) * l.dtype.itemsize
                    for l in jax.tree_util.tree_leaves(out_shapes))
    counts["bytes_out"] = float(bytes_out)
    counts["notes"] = sorted(notes)
    return counts

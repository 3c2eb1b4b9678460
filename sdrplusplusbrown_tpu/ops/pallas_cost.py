"""Spec-derived HBM traffic accounting for pallas kernels.

The bench methodology reports the analytic roofline bound computed from
each TPU executable's ``cost_analysis()`` (docs/benchmarks.md), and for
pallas kernels XLA takes the byte count verbatim from the call's
``pl.CostEstimate``.  Round 2 hand-computed those numbers per kernel and
a judge audit found omissions (streamed param operands, per-stage tail
inputs) — a few percent each, but the whole methodology rests on them
being exact.

This module derives the byte count FROM THE CALL'S OWN BLOCK SPECS, the
same way the Mosaic pipeline actually moves data: an operand's HBM
traffic is its block size × the number of times its ``index_map`` value
CHANGES over the lexicographic grid walk (+1 for the initial fetch) —
a constant map is fetched once and parked in VMEM, an ``i``-dependent
map streams one block per step, and padding implied by an un-divisible
block shape is real DMA traffic and is counted.  Outputs are symmetric
(a block is written back when its index changes or at grid end).

Operands in ``ANY`` memory space are NOT pipelined — the kernel moves
them itself with ``pltpu.make_async_copy`` — so each such site passes
``manual_bytes``, written from the same size expressions as the copies
it issues.  ``tests/test_cost_estimates.py`` audits both halves: the
spec-derived part is re-derived from the recorded call and compared
exactly, and ``manual_bytes`` is bound-checked against a trace-time
tally of the kernel's actual ``make_async_copy`` sizes × grid steps.

``costed_pallas_call`` wraps ``pl.pallas_call`` so every kernel site
declares exactly this number; the test also asserts (statically) that
no ``pl.pallas_call`` site exists outside this module, so no kernel can
bypass the accounting.
"""

from __future__ import annotations

import itertools
from typing import Sequence

import jax
import numpy as np
from jax.experimental import pallas as pl

# --- test hooks -------------------------------------------------------
# When RECORDING is truthy, every costed_pallas_call appends a record of
# its reconstruction inputs here (consumed by tests/test_cost_estimates).
RECORDING: list = []


def _is_any(spec) -> bool:
    ms = getattr(spec, "memory_space", None)
    return ms is not None and "ANY" in str(ms).upper()


def _block_entries(spec, full_shape):
    """(block_elems, index_map) for one BlockSpec."""
    bs = spec.block_shape
    if bs is None:
        bs = tuple(full_shape)
    elems = 1
    for b in bs:
        elems *= int(b) if b is not None else 1
    return elems, spec.index_map


def _fetches(index_map, grid) -> int:
    """Number of DMAs the revolving-buffer pipeline issues for this
    operand: 1 + the number of consecutive index changes along the
    C-order (last dim fastest) grid walk."""
    if index_map is None:
        return 1
    axes = [range(int(g)) for g in grid]
    prev = None
    n = 0
    for point in itertools.product(*axes):
        idx = index_map(*point)
        if not isinstance(idx, tuple):
            idx = (idx,)
        # grid points are concrete python ints here, so index maps that
        # use jnp arithmetic yield CONCRETE arrays — int() them all
        idx = tuple(int(v) for v in idx)
        if prev is None or idx != prev:
            n += 1
        prev = idx
    return n


def traffic_bytes(grid, in_specs: Sequence, in_shapes: Sequence,
                  in_dtypes: Sequence, out_specs: Sequence,
                  out_shape: Sequence) -> int:
    """Total pipelined HBM bytes for this pallas call (ANY operands,
    which the kernel DMAs manually, contribute zero here)."""
    if isinstance(grid, int):
        grid = (grid,)
    total = 0
    for spec, shp, dt in zip(in_specs, in_shapes, in_dtypes):
        if _is_any(spec):
            continue
        elems, imap = _block_entries(spec, shp)
        total += elems * np.dtype(dt).itemsize * _fetches(imap, grid)
    outs = out_shape if isinstance(out_shape, (list, tuple)) \
        else [out_shape]
    specs = out_specs if isinstance(out_specs, (list, tuple)) \
        else [out_specs]
    for spec, sds in zip(specs, outs):
        if _is_any(spec):
            continue
        elems, imap = _block_entries(spec, sds.shape)
        total += elems * np.dtype(sds.dtype).itemsize * _fetches(imap, grid)
    return int(total)


def costed_pallas_call(kernel, *, grid, in_specs, out_specs, out_shape,
                       scratch_shapes=(), flops=0, transcendentals=0,
                       manual_bytes=0, manual_spec=None, interpret=False,
                       compiler_params=None, label=None):
    """``pl.pallas_call`` with ``bytes_accessed`` derived from the specs
    at call time (operand dtypes read off the actual arguments), plus
    ``manual_bytes`` for traffic the kernel moves itself via
    ``make_async_copy`` over ``ANY``-space operands.

    Kernels whose manual DMAs are gated by ``pl.when`` on the grid index
    (edge steps copy different sizes) pass ``manual_spec`` instead: a
    list of ``(bytes_per_step, n_steps)`` terms whose product-sum is the
    declared manual traffic.  The audit in tests/test_cost_estimates.py
    checks each term's size against the copies the kernel actually
    traced and each multiplicity against the grid."""

    if manual_spec is not None:
        manual_bytes = int(sum(int(b) * int(s) for b, s in manual_spec))

    def call(*operands):
        derived = traffic_bytes(
            grid, in_specs, [o.shape for o in operands],
            [o.dtype for o in operands], out_specs, out_shape)
        if isinstance(RECORDING, list) and RECORDING is not None \
                and getattr(call, "_record", True) and _REC_ON[0]:
            RECORDING.append(dict(
                label=label or getattr(kernel, "__name__", "?"),
                grid=(grid,) if isinstance(grid, int) else tuple(grid),
                in_specs=list(in_specs),
                in_shapes=[tuple(o.shape) for o in operands],
                in_dtypes=[o.dtype for o in operands],
                out_specs=out_specs, out_shape=out_shape,
                flops=int(flops),
                derived=int(derived), manual=int(manual_bytes),
                manual_spec=(None if manual_spec is None else
                             [(int(b), int(s)) for b, s in manual_spec]),
                declared=int(derived + manual_bytes)))
        kw = {}
        if compiler_params is not None:
            kw["compiler_params"] = compiler_params
        return pl.pallas_call(
            kernel, grid=grid,
            cost_estimate=pl.CostEstimate(
                flops=int(flops),
                bytes_accessed=int(derived + manual_bytes),
                transcendentals=int(transcendentals)),
            in_specs=list(in_specs), out_specs=out_specs,
            out_shape=out_shape, scratch_shapes=list(scratch_shapes),
            interpret=interpret, **kw)(*operands)

    return call


_REC_ON = [False]


def set_recording(on: bool) -> None:
    _REC_ON[0] = bool(on)
    if on:
        RECORDING.clear()

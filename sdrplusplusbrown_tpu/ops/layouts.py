"""Row-major jit boundary layouts for kernel-heavy steps.

With auto (compiler-chosen) entry layouts, XLA's layout assignment
picks column-major {0,1} for many [C, T] state/output buffers of the
wide-bank paths — but every pallas kernel constrains its operands to
row-major, so each step pays relayout copies on the way in AND out of
the jitted function (measured 340.6 → 307.3 B/sample on scanner-128,
730.6 → 666.2 on scanner-256; neutral elsewhere).  Pinning the jit
boundary to row-major removes the per-step conversions for state that
simply cycles back into the next call.

Used by bench.measure_chain and runtime/pump (production parity: the
bench measures exactly what the app runs).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import jax.tree_util as jtu


def _row_major(a, sharding):
    from jax.experimental.layout import Format, Layout
    nd = getattr(a, "ndim", None)
    if nd is None:
        nd = jnp.asarray(a).ndim
    return Format(Layout(tuple(range(nd))), sharding)


def jit_row_major(step, *example_args):
    """``jax.jit(step)`` with every input/output pinned to row-major on
    the default device.  Falls back to plain jit when the layout API or
    a single-device sharding isn't applicable (e.g. under a mesh)."""
    try:
        from jax.sharding import SingleDeviceSharding
        dev = jax.devices()[0]
        sds = SingleDeviceSharding(dev)
        in_l = jtu.tree_map(lambda a: _row_major(a, sds), example_args)
        out_l = jtu.tree_map(lambda a: _row_major(a, sds),
                             jax.eval_shape(step, *example_args))
        return jax.jit(step, in_shardings=in_l, out_shardings=out_l)
    except Exception:
        return jax.jit(step)

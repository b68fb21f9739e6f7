"""Time-axis row gather with a TPU-safe reverse-mode rule.

``states[tidx]`` (advanced indexing on the leading time axis) is the engine's
observable-schedule primitive.  Its default VJP is a scatter-add, which the
TPU backend can lower into a padded dense intermediate of shape
[T, rows, N, D] — 73GB for the north-star config at 1M paths.  This custom
rule keeps the forward a plain gather and expresses the backward as a one-hot
matmul (flops ~ rows*T*N*D, all MXU-friendly; cotangent memory is exactly
[T, N, D]).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _onehot(tidx, num_times, dtype, transpose=False):
    grid = np.arange(num_times)[:, None] == np.array(tidx)[None, :]  # [T, rows]
    return jnp.asarray(grid.T if transpose else grid, dtype=dtype)


def _take_impl(states, tidx, num_times):
    if jax.default_backend() == "tpu":
        # The TPU backend lowers a leading-axis gather into a padded dense
        # select of shape [rows, T, N, D] (OOM at 1M paths); an explicit
        # [rows, T] @ [T, N*D] matmul lowers cleanly onto the MXU.
        onehot_t = _onehot(tidx, num_times, states.dtype, transpose=True)
        flat = states.reshape(states.shape[0], -1)
        out = jnp.matmul(onehot_t, flat, precision="highest")
        return out.reshape((len(tidx),) + states.shape[1:])
    return states[np.array(tidx)]


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def take_time_rows(states, tidx: tuple, num_times: int):
    """states [T, N, D] -> [len(tidx), N, D]; tidx is a static index tuple."""
    return _take_impl(states, tidx, num_times)


def _fwd(states, tidx, num_times):
    return _take_impl(states, tidx, num_times), None


def _bwd(tidx, num_times, _residual, ct):
    # Explicit [T, rows] @ [rows, N*D] matmul: scatter-add or a fused one-hot
    # multiply would materialise a [T, rows, N, D] intermediate on TPU.
    onehot = _onehot(tidx, num_times, ct.dtype)
    rows = ct.shape[0]
    ct2 = ct.reshape(rows, -1)
    grad_states = jnp.matmul(onehot, ct2, precision="highest")
    return (grad_states.reshape((num_times,) + ct.shape[1:]),)


take_time_rows.defvjp(_fwd, _bwd)


def gather_rows(states, tidx) -> jnp.ndarray:
    """Convenience wrapper accepting numpy index arrays."""
    idx = tuple(int(i) for i in np.asarray(tidx).ravel())
    return take_time_rows(states, idx, int(states.shape[0]))

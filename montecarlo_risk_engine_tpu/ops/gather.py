"""TPU-safe gathers for the observable-resolution plane.

Two lowering pathologies motivate this module (both observed OOM-ing the
1M-path north-star AAD run on a 16GB v5e):

* ``states[tidx]`` (leading-axis gather on [T, N, D]) — the TPU backend can
  lower the forward into a padded dense select and the reverse scatter-add
  into a [T, rows, N, D] intermediate (73GB at 1M paths).
* ``state[..., k]`` (small-axis column read) — reverse-differentiates to
  ``broadcast -> pad`` with a resident [chunk, rows, N, 1] cotangent that the
  AOT layout assigner may tile onto the 128-lane minor axis (a 144MB
  cotangent became an 18.4GB copy).

Instead of custom_vjp rules (which would block forward-mode jacfwd — the
memory-optimal transform for few-parameter books), both ops are expressed as
primitives whose AUTOMATIC transposes are the lowerings we want:

* the time gather is a one-hot matmul — its transpose is the transposed
  matmul (MXU-friendly both directions, cotangent memory exactly [T, N, D]);
* the column read is a strided ``lax.slice`` on the flattened [.., N*d]
  buffer — its transpose is an interior-dilated ``lax.pad`` writing
  ``grad.flat[n*d + k] = ct[n]`` directly, so no tensor with a small minor
  axis ever exists.

Both therefore compose with jvp (jacfwd), vjp (jacrev), and vmap.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def take_time_rows(states, tidx: tuple, num_times: int):
    """states [T, N, D] -> [len(tidx), N, D]; tidx is a static index tuple."""
    if jax.default_backend() == "tpu":
        # One-hot [rows, T] contraction over the leading time axis: the TPU
        # backend lowers a leading-axis gather into a padded dense select
        # (OOM at 1M paths), and AD transposes the dot into a dot.  Contract
        # via dot_general directly — an explicit reshape to [T, N*D] would
        # force a physical transpose copy of the states (observed 3.6x-padded
        # 11.4GB temp at 1M paths).
        grid = np.array(tidx)[:, None] == np.arange(num_times)[None, :]
        onehot_t = jnp.asarray(grid, states.dtype)  # [rows, T]
        return jax.lax.dot_general(
            onehot_t,
            states,
            (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
        )
    return states[np.array(tidx)]


def gather_rows(states, tidx) -> jnp.ndarray:
    """Convenience wrapper accepting numpy index arrays."""
    idx = tuple(int(i) for i in np.asarray(tidx).ravel())
    return take_time_rows(states, idx, int(states.shape[0]))


def pick_state_col(state, k: int):
    """``state[..., k]`` via a strided slice of the flattened minor axes.

    The transpose of ``lax.slice(strides=d)`` is ``lax.pad(interior=d-1)``
    on the [.., N*d] buffer — the reverse-mode gradient is materialised with
    minor axis N*d, never [.., N, 1]/[.., N, d] with the small dim minor.
    """
    d = int(state.shape[-1])
    n = int(state.shape[-2])
    flat = state.reshape(state.shape[:-2] + (n * d,))
    starts = [0] * (flat.ndim - 1) + [k]
    limits = list(flat.shape[:-1]) + [n * d - (d - 1 - k)]
    strides = [1] * (flat.ndim - 1) + [d]
    return jax.lax.slice(flat, starts, limits, strides)

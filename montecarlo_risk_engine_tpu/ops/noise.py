"""Correlated-noise application without a tiny-contracting-dim dot.

The engine imposes correlation as ``noise = z @ L.T`` with z [N, sim_dim]
(reference ``generate_correlated_randn``, model.py:38-48).  On TPU that
``dot_general`` has a contracting dimension of size sim_dim (2-5), which the
MXU lowering pads to the 128-lane minor tile: the operand copy costs 42.7x
memory at sim_dim=3 (measured: a [57, 1e6, 3] noise stack held in the padded
{2,1,0:T(8,128)} layout is 29.2GB vs 684MB unpadded — the 1M-path
linearize-driver OOM, BENCH_NOTES round 3).  A broadcasted multiply-add
computes the same contraction on the VPU with no layout pressure: the
[..., k, s] product temp fuses into the reduction, and every array keeps its
natural layout.
"""

from __future__ import annotations

import jax.numpy as jnp


def correlate_noise(z, transform):
    """``z @ transform.T`` over the trailing axis, as fused mul-adds.

    z: [..., s] standard normals.  transform: [k, s] (one matrix, applied to
    every leading index of z) or [T, k, s] (batched per leading z axis, e.g.
    one matrix per time step for z [T, N, s]).  Returns [..., k].  Rounding
    order may differ from dot_general by summation order; every equality
    contract in tests is 1e-9 f64 / statistical f32, which this preserves.
    """
    z = jnp.asarray(z)
    transform = jnp.asarray(transform)
    if transform.ndim == 2:
        # [..., 1, s] * [k, s] -> [..., k, s] -> sum over s
        return (z[..., None, :] * transform).sum(-1)
    if transform.ndim == 3 and z.ndim == 3:
        # z [T, N, s], transform [T, k, s] -> [T, N, k]
        return (z[:, :, None, :] * transform[:, None, :, :]).sum(-1)
    raise ValueError(
        f"correlate_noise: unsupported ranks z={z.ndim}, transform={transform.ndim}"
    )

"""Differentiable fused path generation: custom-JVP noise recovery.

Round-2 verdict item #1: the fused Pallas kernels (ops/pallas_paths.py) were
forward-only, so every differentiated book — the flagship xVA-Greeks workload
replacing the reference's autograd loops (reference
src/controller/controller.py:609-648) — fell back to the ~2x slower XLA scan
engine.  This module composes the kernels with JAX AD without a Pallas
tangent kernel:

  1. **Forward** runs the hardware-PRNG kernel on a *substep-dense* timeline
     (every substep boundary becomes an emission point, ``num_steps=1`` per
     dense interval) — the same draw sequence the coarse kernel consumes, so
     the trajectory law is identical, and every per-substep state is visible.
  2. **Tangent** obtains the per-substep standard driver normals — either by
     inverting the transition map from consecutive emitted states
     (``Model.invert_noise`` + a triangular solve against the noise
     transform; BS/Vasicek/CIR++ and hybrids), or from draws the kernel
     itself emits (Heston QE, whose branch mixing is not invertible) —
     freezes them with ``stop_gradient``, and re-derives the step recurrence
     in pure XLA via ``jax.jvp`` of a reconstruction scan.  Since
     states = Step(params, noise) with noise param-independent by
     construction, the tangent of the reconstruction at the recovered noise
     IS the exact pathwise derivative of the kernel's own trajectory.

The noise recovery and the reconstruction are exposed SEPARATELY
(:func:`recovered_noise_fns` / :func:`emitted_noise_fns`) so the
controller's jacobian drivers can hoist the kernel + inversion OUT of the
per-tangent sweep loop: z is the same frozen constant for every tangent
direction, so a P-parameter jacobian needs ONE kernel run + inversion, not
P/chunk of them (measured v5e, north-star 1M paths: the rule-per-sweep
layout spent ~40% of each sweep recomputing identical z).  The composite
custom-JVP wrappers (:func:`recovered_noise_paths` /
:func:`emitted_noise_paths`) remain for single-shot use and for nesting.

Memory layout (round-3 redesign, after an HBM OOM at 1M paths x 57 dense
points x 8-wide tangent chunks): the AD boundary sits at the COARSE
timeline.  The reconstruction scan emits ONLY the mapped coarse points,
writing each substep state into a [T_coarse, N, D] carry buffer
(``dynamic_update_slice`` on the scan carry updates in place; the interval's
endpoint write lands last, so no masks are needed).  Dense-sized arrays
under AD are just the one primal plane and the recovered normals — never
per-tangent dense planes.  The kernel forward itself is wrapped AD-opaque
(zero-tangent custom_jvp) so the draws' parameter-independence is explicit
and jvp-of-jvp nesting (Hessian row dispatch, controller.py) never tries to
differentiate through ``pallas_call``.

The reconstruction scan runs no RNG (the expensive ~75% of the XLA engine's
step cost), so a differentiated kernel run pays kernel-rate forward plus a
cheap elementwise tangent sweep.  Under differentiation the returned primal
is the reconstruction's trajectory — bit-for-bit the same map as the kernel
up to XLA instruction scheduling (undifferentiated calls return the kernel
states untouched).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from montecarlo_risk_engine_tpu.ops.noise import correlate_noise


def dense_timeline(calibration_date: float, timeline: Sequence[float],
                   num_steps: int):
    """Expand a timeline so every substep boundary is an emission point.

    Returns (dense_points, orig_indices): the dense tuple of floats and, per
    original timeline point, its index in the dense tuple.  A kernel run on
    ``dense_points`` with ``num_steps=1`` consumes the hardware-PRNG draws in
    exactly the same order as a run on ``timeline`` with ``num_steps`` — the
    trajectory law is identical (dt roundoff aside) and every intermediate
    state is emitted for noise recovery.
    """
    dense = []
    orig_idx = []
    t_prev = float(calibration_date)
    for t in timeline:
        t = float(t)
        dt = t - t_prev
        if dt <= 0.0:
            dense.append(t)
        else:
            for k in range(1, num_steps):
                dense.append(t_prev + dt * k / num_steps)
            dense.append(t)  # exact endpoint, no accumulation drift
        orig_idx.append(len(dense) - 1)
        t_prev = t
    return tuple(dense), np.asarray(orig_idx, dtype=np.int64)


def _schedule_arrays(calibration_date: float, points: Sequence[float], dtype):
    t_prev_list, dt_list = [], []
    t_prev = float(calibration_date)
    for t in points:
        t = float(t)
        t_prev_list.append(t_prev)
        dt_list.append(t - t_prev)
        t_prev = t
    return (jnp.asarray(t_prev_list, dtype=dtype),
            jnp.asarray(dt_list, dtype=dtype))


def _coarse_slots(num_dense: int, orig_idx) -> np.ndarray:
    """slot[i] = coarse index whose interval contains dense step i.

    Every substep writes its state to its interval's slot; the endpoint
    write is the LAST one in the interval, so the buffer needs no masks."""
    slots = np.zeros(num_dense, dtype=np.int32)
    k = 0
    for i in range(num_dense):
        slots[i] = min(k, len(orig_idx) - 1)
        if k < len(orig_idx) and i == int(orig_idx[k]):
            k += 1
    return slots


def rows_from_states(model, params, schedule, states):
    """Streaming-format emissions resolved post-hoc from a [T, N, D] coarse
    state plane: one [T*K, N] (or [T*K]) array per schedule group — the
    layout the streaming engine emits (engine/engine.py point_body) and
    ``RequestPlan.resolve_from_emissions`` consumes.

    Used as the PRIMAL of the kernel-streaming AD path: the kernel's
    AD-opaque plane exists once per program (it is also the noise-recovery
    input), so resolving it in bulk here costs no extra plane — only the
    per-TANGENT buffers must stay row-sized, which is the in-scan
    reconstruction's job (``emit_schedule`` on the factory fns below)."""
    outs = []
    for g in schedule.groups:
        t1_tab = jnp.asarray(np.asarray(g.t1_tab), states.dtype)
        t2_tab = jnp.asarray(np.asarray(g.t2_tab), states.dtype)
        rows = jax.vmap(
            lambda t1r, t2r, st, g=g: model.resolve_request_rows(
                params, g.kind, g.asset_id, t1r, t2r,
                jnp.broadcast_to(st, (g.K,) + st.shape),
            )
        )(t1_tab, t2_tab, states)  # [T, K, N] or [T, K]
        outs.append(
            rows.reshape((rows.shape[0] * rows.shape[1],) + rows.shape[2:])
        )
    return outs


# Coarse points per mini-plane in the rows-emitting reconstruction.  Small
# enough that the per-tangent mini-plane stays far below the full coarse
# plane (8/57 of it on the north-star book), large enough that each chunk's
# row resolution is one well-tiled batched op.
EMIT_PLANE_CHUNK = 8


def _rows_recon(model, params, scheme, schedule, state0, t_prev_arr, dt_safe,
                live, slots, corr, num_coarse, dtype, uniforms=None,
                emit_chunk=None):
    """Time-chunked rows-emitting reconstruction -> streaming-format rows.

    Round-3 measurement (BENCH_NOTES "the v5e memory wall"): resolving
    request rows INSIDE the reconstruction scan — one tiny [K, N] resolution
    + in-place buffer write per dense step — ran ~3.3x slower per tangent
    sweep than the bulk plane resolution it replaced (the per-step
    resolutions are too small to tile onto the VPU lanes).  This version
    scans ``emit_chunk`` coarse intervals at a time into a
    [chunk, N, D] mini-plane, then resolves the whole chunk's rows in ONE
    batched (vmap-over-chunk) resolution per group: bulk-resolution
    efficiency with per-tangent memory O(chunk·N·D + rows·N) instead of the
    full [T_coarse, N, D] plane — the structural fix that lets 16GB chips
    widen their tangent chunks at 1M paths.

    The outer chunk loop is unrolled host-side (≤ ceil(T/chunk) scans of
    static length); the endpoint-writes-last contract of the slot buffer is
    unchanged, so emitted rows are resolved at the interval's point state —
    the streaming engine's semantics (engine/engine.py point_body).
    """
    groups = schedule.groups
    t1_tabs = [np.asarray(g.t1_tab) for g in groups]
    t2_tabs = [np.asarray(g.t2_tab) for g in groups]
    slots = np.asarray(slots)
    if emit_chunk is None:
        emit_chunk = EMIT_PLANE_CHUNK  # module attr at call time (testable)
    emit_chunk = max(1, int(emit_chunk))

    def resolve_chunk(g, t1_rows, t2_rows, states):
        # [c, K] request tables x [c, N, D] states -> [c, K, N] (or [c, K])
        return jax.vmap(
            lambda t1r, t2r, st: model.resolve_request_rows(
                params, g.kind, g.asset_id, t1r, t2r,
                jnp.broadcast_to(st, (g.K,) + st.shape),
            )
        )(t1_rows, t2_rows, states)

    out_chunks = [[] for _ in groups]
    state = state0
    for c0 in range(0, num_coarse, emit_chunk):
        c1 = min(c0 + emit_chunk, num_coarse)
        d0 = int(np.searchsorted(slots, c0, side="left"))
        d1 = int(np.searchsorted(slots, c1 - 1, side="right"))
        mini0 = jnp.zeros((c1 - c0,) + state.shape, dtype)
        xs = (t_prev_arr[d0:d1], dt_safe[d0:d1], live[d0:d1],
              jnp.asarray(slots[d0:d1] - c0, dtype=jnp.int32), corr[d0:d1])
        if uniforms is not None:
            xs = xs + (uniforms[d0:d1],)

        def body(carry, x):
            st, mini = carry
            if uniforms is not None:
                t1, dts, is_live, sl, noise, u_step = x
                new = model.step(params, scheme, t1, t1 + dts, st, noise,
                                 uniform=u_step)
            else:
                t1, dts, is_live, sl, noise = x
                new = model.step(params, scheme, t1, t1 + dts, st, noise)
            new = jnp.where(is_live, new, st)
            mini = jax.lax.dynamic_update_slice_in_dim(
                mini, new[None], sl, axis=0
            )
            return (new, mini), None

        (state, mini), _ = jax.lax.scan(body, (state, mini0), xs)
        for gi, (g, tab1, tab2) in enumerate(zip(groups, t1_tabs, t2_tabs)):
            out_chunks[gi].append(resolve_chunk(
                g, jnp.asarray(tab1[c0:c1], dtype),
                jnp.asarray(tab2[c0:c1], dtype), mini,
            ))
    bufs = [jnp.concatenate(rs, axis=0) for rs in out_chunks]
    return _flatten_row_bufs(bufs)


def _flatten_row_bufs(bufs):
    return [
        b.reshape((b.shape[0] * b.shape[1],) + b.shape[2:]) for b in bufs
    ]


def _opaque_primal(forward_fn):
    """Wrap the kernel forward as an AD-opaque function: its draws (and
    therefore its outputs' dependence on params through the RNG stream) are
    parameter-independent by construction; under any jvp the tangent is
    declared zero so nested transforms never reach ``pallas_call``."""

    @jax.custom_jvp
    def kernel_primal(params):
        return forward_fn(params)

    @kernel_primal.defjvp
    def kernel_primal_jvp(primals, tangents):
        out = kernel_primal(primals[0])
        zeros = jax.tree_util.tree_map(jnp.zeros_like, out)
        return out, zeros

    return kernel_primal


def recovered_noise_fns(model, scheme, timeline, num_paths: int,
                        num_steps: int, forward_fn, emit_schedule=None):
    """(forward_coarse, noise_fn, recon_fn) for invertible-transition models.

    ``forward_fn(params) -> [T_dense, N, D]`` produces the primal states at
    the substep-dense timeline (normally the Pallas kernel with
    ``num_steps=1``; tests substitute the threefry engine to pin the tangent
    rule against ``jax.jacfwd`` of the same engine exactly).

      * ``forward_coarse(params)`` — kernel states at the ORIGINAL timeline
        points (AD-opaque; for undifferentiated consumers).
      * ``noise_fn(params)`` — the frozen standard driver normals z
        [T_dense, N, sim_dim] recovered from the kernel trajectory
        (``Model.invert_noise`` + a triangular solve; stop_gradient'd).
      * ``recon_fn(params, z)`` — coarse states [T, N, D] rebuilt from z in
        plain differentiable XLA; ``recon_fn(p, noise_fn(p))`` is the
        kernel's own trajectory, and its params-derivatives at frozen z are
        the exact pathwise derivatives of that trajectory.

    ``emit_schedule`` (an ``EmissionSchedule``): the kernel-streaming AD
    mode.  ``forward_coarse``/``recon_fn`` then return streaming-format
    emissions (one [T*K, N] / [T*K] array per group) instead of the coarse
    state plane: the reconstruction scans ``EMIT_PLANE_CHUNK`` coarse
    intervals at a time into a mini-plane and bulk-resolves each chunk's
    request rows (:func:`_rows_recon`), so a tangent sweep never
    materialises a [T, N, D] plane — the per-tangent memory is
    O(request rows x paths + chunk x N x D), the streaming engine's
    contract (SURVEY.md §5.7), which is what lets the jacobian drivers widen
    their tangent chunks on 16GB chips."""
    dense, orig_idx = dense_timeline(model.calibration_date, timeline, num_steps)
    # HOST index/slot arrays: an eager jnp.asarray here would live on the
    # device and embed as an MLIR constant whose value the lowering must
    # fetch back through the (possibly remote) runtime — measured 100s+ per
    # trace on a relay-attached TPU.  numpy keeps them host constants.
    idx = np.asarray(orig_idx)
    slots = _coarse_slots(len(dense), orig_idx)
    kernel_primal = _opaque_primal(forward_fn)

    def transform_at(p, dts, dtype):
        if scheme.name == "ANALYTICAL":
            return jnp.linalg.cholesky(
                model.covariance_matrix(p, dts).astype(dtype)
            )
        return model.noise_transform(p, scheme, None).astype(dtype)

    def forward_coarse(params):
        if emit_schedule is not None:
            return rows_from_states(
                model, params, emit_schedule, kernel_primal(params)[idx]
            )
        return kernel_primal(params)[idx]

    def noise_fn(params):
        states = kernel_primal(params)  # [T', N, D] dense plane, AD-opaque
        dtype = states.dtype
        t_prev_arr, dt_arr = _schedule_arrays(model.calibration_date, dense, dtype)
        live = dt_arr > 0.0
        dt_safe = jnp.where(live, dt_arr, jnp.asarray(1.0, dtype))

        prev = jnp.concatenate(
            [model.init_state(params, num_paths).astype(dtype)[None], states[:-1]],
            axis=0,
        )
        # Exact per-substep correlated noise (the ``corr_noise`` each step
        # received) from consecutive states...
        corr_noise = jax.vmap(
            lambda t1, dts, s, ns: model.invert_noise(
                params, scheme, t1, t1 + dts, s, ns
            )
        )(t_prev_arr, dt_safe, prev, states)  # [T', N, sim_dim]

        # ... then peel off the noise transform to reach the STANDARD driver
        # normals z: the engine applies ``noise = z @ L(params).T`` (engine.py
        # substep), so L itself carries parameter dependence (e.g. vega rides
        # almost entirely in the sigma*sqrt(dt) scaling for GBM).  Only z is
        # param-independent by construction — z, not corr_noise, is what gets
        # frozen with stop_gradient (also the correct higher-order
        # semantics); reconstruction re-applies L(p) so those derivatives
        # flow exactly.
        return jax.lax.stop_gradient(
            jax.vmap(
                lambda dts, nn: jax.scipy.linalg.solve_triangular(
                    transform_at(params, dts, dtype), nn.T, lower=True
                ).T
            )(dt_safe, corr_noise)
        )  # [T', N, sim_dim] — standard normals

    def recon_fn(p, z):
        # Mirror of engine/engine.py's scan semantics, minus RNG: states
        # from the given standard normals, emitting ONLY the mapped coarse
        # points into an in-place carry buffer.  Its jvp at the recovered z
        # is the exact pathwise tangent of the kernel trajectory — with
        # per-tangent memory T_coarse-sized (plane mode) or request-row-sized
        # (``emit_schedule`` given), never T_dense-sized.
        dtype = z.dtype
        t_prev_arr, dt_arr = _schedule_arrays(model.calibration_date, dense, dtype)
        live = dt_arr > 0.0
        dt_safe = jnp.where(live, dt_arr, jnp.asarray(1.0, dtype))
        slots_arr = jnp.asarray(slots)
        state0 = model.init_state(p, num_paths).astype(dtype)
        # Apply the noise transform for ALL steps in one batched mul-add
        # contraction (ops/noise.py — NOT a dot: a sim_dim-sized contracting
        # dim makes the TPU dot lowering hold z in a 128-lane-padded layout,
        # 42.7x memory at sim_dim=3; the 1M-path linearize-driver OOM in
        # BENCH_NOTES round 3).  One op replaces T' per-step dots; L(p)
        # carries the parameter dependence exactly as before (the engine's
        # z @ L(p).T per substep).
        transforms = jax.vmap(lambda dts: transform_at(p, dts, dtype))(dt_safe)
        corr = correlate_noise(z, transforms)
        if emit_schedule is not None:
            return _rows_recon(
                model, p, scheme, emit_schedule, state0, t_prev_arr,
                dt_safe, live, slots, corr, len(idx), dtype,
            )

        buf0 = jnp.zeros((len(idx),) + state0.shape, dtype)

        def body(carry, xs):
            state, buf = carry
            t1, dts, is_live, slot, noise = xs
            new = model.step(p, scheme, t1, t1 + dts, state, noise)
            new = jnp.where(is_live, new, state)
            buf = jax.lax.dynamic_update_slice_in_dim(
                buf, new[None], slot, axis=0
            )
            return (new, buf), None

        (_, buf), _ = jax.lax.scan(
            body, (state0, buf0), (t_prev_arr, dt_safe, live, slots_arr, corr)
        )
        return buf

    # Rematerialize the reconstruction under linearize/grad: the scan's
    # per-step internals (several [N, D]-sized temps per substep) are the
    # bulk of a linearize-once driver's pinned residuals, while re-running
    # the scan costs ~one engine forward (~0.09s at 1M paths on v5e).  Its
    # OUTPUT (the coarse plane / emission rows) stays live downstream either
    # way.  jvp-based drivers are unaffected (checkpoint is an identity for
    # plain jvp).
    return forward_coarse, noise_fn, jax.checkpoint(recon_fn)


def recovered_noise_paths(model, scheme, timeline, num_paths: int,
                          num_steps: int, forward_fn):
    """Differentiable path states at ``timeline`` points: [T, N, D].

    The composite single-shot wrapper over :func:`recovered_noise_fns`:
    forward runs the kernel, the custom-JVP tangent recovers z and
    differentiates the reconstruction.  Prefer the split fns when sweeping
    many tangent directions (z hoists out of the sweep loop).
    """
    forward_coarse, noise_fn, recon_fn = recovered_noise_fns(
        model, scheme, timeline, num_paths, num_steps, forward_fn
    )

    @jax.custom_jvp
    def paths_coarse(params):
        return forward_coarse(params)

    @paths_coarse.defjvp
    def paths_coarse_jvp(primals, tangents):
        (params,), (dparams,) = primals, tangents
        z = noise_fn(params)
        return jax.jvp(lambda p: recon_fn(p, z), (params,), (dparams,))

    return paths_coarse


def emitted_noise_fns(model, scheme, timeline, num_paths: int,
                      num_steps: int, forward_fn, emit_schedule=None):
    """(forward_coarse, noise_fn, recon_fn) for NON-invertible transitions
    (Heston QE).  ``emit_schedule``: rows-emitting mode, exactly as in
    :func:`recovered_noise_fns`.

    ``forward_fn(params) -> (states [T', N, D], z [T', N, sim_dim],
    u [T', N])`` runs the noise-emitting kernel on the substep-dense timeline
    (ops/pallas_paths.heston_qe_paths with ``emit_noise=True``): QE branch
    mixing plus the extra uniform make the transition non-invertible, so the
    kernel ships its own raw draws instead of the inversion used by
    :func:`recovered_noise_fns`.  ``noise_fn`` returns the frozen (z, u)
    pair; ``recon_fn(params, (z, u))`` re-derives the step recurrence in XLA
    — with ``model.perform_smoothing`` set, the smoothed-branch trajectory
    and its derivative, the engine's validated QE gradient contract
    (reference heston.py:227-236).

    The kernel's forward must run the SAME smoothed step for the primal and
    reconstruction trajectories to coincide (heston_qe_paths
    ``smoothing=True``).
    """
    dense, orig_idx = dense_timeline(model.calibration_date, timeline, num_steps)
    idx = np.asarray(orig_idx)  # host constants — see recovered_noise_fns
    slots = _coarse_slots(len(dense), orig_idx)
    kernel_primal = _opaque_primal(forward_fn)

    def forward_coarse(params):
        if emit_schedule is not None:
            return rows_from_states(
                model, params, emit_schedule, kernel_primal(params)[0][idx]
            )
        return kernel_primal(params)[0][idx]

    def noise_fn(params):
        _, z, u = kernel_primal(params)  # draws AD-opaque by construction
        return jax.lax.stop_gradient(z), jax.lax.stop_gradient(u)

    def recon_fn(p, noise):
        z, u = noise
        dtype = z.dtype
        t_prev_arr, dt_arr = _schedule_arrays(model.calibration_date, dense, dtype)
        live = dt_arr > 0.0
        dt_safe = jnp.where(live, dt_arr, jnp.asarray(1.0, dtype))
        slots_arr = jnp.asarray(slots)
        state0 = model.init_state(p, num_paths).astype(dtype)

        # One batched mul-add contraction for every step's noise transform
        # (QE's is the identity — correlation enters through the K
        # coefficients — but reapply for generality); same rationale as
        # recovered_noise_fns: no per-step tiny dot, no padded-layout z.
        transforms = jax.vmap(
            lambda dts: model.noise_transform(p, scheme, dts).astype(dtype)
        )(dt_safe)
        corr = correlate_noise(z, transforms)
        if emit_schedule is not None:
            return _rows_recon(
                model, p, scheme, emit_schedule, state0, t_prev_arr,
                dt_safe, live, slots, corr, len(idx), dtype, uniforms=u,
            )

        def body(carry, xs):
            state, buf = carry
            t1, dts, is_live, slot, noise_step, u_step = xs
            new = model.step(p, scheme, t1, t1 + dts, state, noise_step,
                             uniform=u_step)
            new = jnp.where(is_live, new, state)
            buf = jax.lax.dynamic_update_slice_in_dim(
                buf, new[None], slot, axis=0
            )
            return (new, buf), None

        buf0 = jnp.zeros((len(idx),) + state0.shape, dtype)
        (_, buf), _ = jax.lax.scan(
            body, (state0, buf0),
            (t_prev_arr, dt_safe, live, slots_arr, corr, u),
        )
        return buf

    # Same remat rationale as recovered_noise_fns: drop the reconstruction
    # scan's per-step residuals from linearize-once drivers.
    return forward_coarse, noise_fn, jax.checkpoint(recon_fn)


def emitted_noise_paths(model, scheme, timeline, num_paths: int,
                        num_steps: int, forward_fn):
    """Differentiable path states for NON-invertible transitions (Heston QE).

    Composite single-shot wrapper over :func:`emitted_noise_fns` — see
    :func:`recovered_noise_paths` for when to prefer the split fns.
    """
    forward_coarse, noise_fn, recon_fn = emitted_noise_fns(
        model, scheme, timeline, num_paths, num_steps, forward_fn
    )

    @jax.custom_jvp
    def paths_coarse(params):
        return forward_coarse(params)

    @paths_coarse.defjvp
    def paths_coarse_jvp(primals, tangents):
        (params,), (dparams,) = primals, tangents
        noise = noise_fn(params)
        return jax.jvp(lambda p: recon_fn(p, noise), (params,), (dparams,))

    return paths_coarse

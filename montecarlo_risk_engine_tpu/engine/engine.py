"""Monte Carlo path engine: one ``lax.scan`` over a static step schedule.

Counterpart of reference ``src/engine/engine.py`` (MonteCarloEngine,
engine.py:8-123), re-designed for XLA:

  * The reference's Python ``for t_now in timeline`` loop with per-step
    ``torch.randn`` (engine.py:35-123) becomes a single compiled
    ``lax.scan`` over timeline points with an inner ``fori_loop`` over
    substeps.  The whole trajectory is traced once; there is no host round
    trip per step.
  * Global torch seeds 42/43 (engine.py:25) become threefry phase keys
    (see rng.py); normals/uniforms are generated *inside* the scan from
    counter-derived keys, so results are independent of device count and
    evaluation order.
  * The Cholesky cache keyed by (scheme, dt) (model.py:50-73) disappears:
    for EULER/MILSTEIN/QE the correlation factor is computed once from traced
    params and closed over by the scan; for ANALYTICAL the per-substep
    covariance factor is a (d×d) cholesky — negligible next to the [N,d]
    noise work — computed inline so it stays differentiable.
  * Zero-length intervals (timeline point at the calibration date) are
    handled with a ``where`` guard on a safe dt, keeping the scan body
    branch-free.

Output: states at every simulation timeline point, shape
``[num_points, num_paths, state_dim]``, sharded over paths when a sharding is
supplied.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from montecarlo_risk_engine_tpu import rng
from montecarlo_risk_engine_tpu.config import SimulationScheme, asarray, real_dtype
from montecarlo_risk_engine_tpu.ops.noise import correlate_noise


def build_step_schedule(calibration_date: float, timeline: Sequence[float]):
    """Per-point (t_prev, interval_dt) arrays from a static timeline."""
    t_prev_list = []
    dt_list = []
    t_prev = float(calibration_date)
    for t in timeline:
        t = float(t)
        t_prev_list.append(t_prev)
        dt_list.append(t - t_prev)
        t_prev = t
    return asarray(t_prev_list), asarray(dt_list)


def simulate_paths(
    model,
    params,
    scheme: SimulationScheme,
    timeline: Sequence[float],
    num_paths: int,
    num_steps: int,
    phase: int,
    root_seed: int = 0,
    path_sharding=None,
    antithetic: bool = False,
    remat: bool = False,
    transpose_states: bool = False,
    emit_schedule=None,
    collect_states: bool = True,
    sampler: str = "pseudo",
    qmc_bridge: bool = False,
    fold=None,
):
    """Simulate states at each timeline point.

    phase: rng.PHASE_PRESIM or rng.PHASE_MAINSIM (reference engine.py:25).
    antithetic: pair each driver draw with its negation (uniforms with 1-u) —
    a variance-reduction feature the reference lacks; num_paths must be even.
    sampler: "pseudo" (threefry, default) or "sobol" — a digitally-shifted
    Sobol sequence where path p is sequence point p and each substep owns a
    static block of dimensions (ops/sobol.py; another reference-absent
    capability).  Mutually exclusive with antithetic (low-discrepancy points
    are not negation-symmetric).
    qmc_bridge: with sampler="sobol", rotate the driver normals through a
    Brownian-bridge ordering (ops/sobol.py brownian_bridge_matrix) so the
    leading Sobol dimensions carry the coarse path structure — identical
    joint law, far better QMC convergence for path-dependent payoffs; costs
    a [T_sub, N, sim_dim] rotated plane built once before the scan.
    remat: jax.checkpoint the per-point step so reverse-mode AD recomputes the
    in-step intermediates (RNG bits, noise, branch terms) instead of storing
    them — trades ~2x step FLOPs for O(state) instead of O(intermediates)
    backward memory per step (SURVEY.md §5.7, 16M-path AAD runs).
    transpose_states: emit [T, state_dim, num_paths] instead of
    [T, num_paths, state_dim].  The controller pipeline uses this layout so
    every resident array on the resolution plane keeps the path axis minor —
    the TPU AOT layout assigner pads small minor axes onto the 128-lane tile
    (a [.., N, 5] copy cost 25.6x HBM at 1M paths; see docs/TUNING.md).

    Streaming mode (emit_schedule given): observable requests are resolved
    INSIDE the scan against the live [N, state_dim] state from the schedule's
    static per-step (t1, t2) tables, and only those rows are emitted — the
    O(paths × request-rows) memory contract of SURVEY.md §5.7, replacing the
    reference's materialise-then-slice plane (reference engine.py:63,
    request_interface.py:122).  With collect_states=False the full state
    plane is never built at all.

    Returns states [T, num_paths, state_dim] (or transposed), or
    (states_or_None, emissions) when emit_schedule is given; emissions is a
    list (one entry per schedule group) of [T*K, N] / [T*K] arrays.

    Fold mode (``fold=(aux0, update)`` with an emit_schedule): instead of
    stacking the emitted rows across the scan, each point's rows are consumed
    IMMEDIATELY by ``update(point_idx, rows, state, aux) -> aux`` — rows is a
    tuple (one [K, N] array per schedule group) resolved against the live
    state.  The scan carries the ``aux`` accumulator pytree alongside the
    state and returns the final aux; NOTHING of shape [rows, N] or
    [T, N, ...] ever leaves the scan (the round-5 streaming metric pipeline —
    per-date netting, collateral stashes and metric partial reductions live
    inside the scan).  Unconsumed rows are dead code XLA eliminates.
    """
    if antithetic and num_paths % 2:
        raise ValueError("antithetic sampling requires an even num_paths")
    if sampler not in ("pseudo", "sobol"):
        raise ValueError(f"unknown sampler {sampler!r}")
    if sampler == "sobol" and antithetic:
        raise ValueError("sampler='sobol' is incompatible with antithetic "
                         "(Sobol points are not negation-symmetric)")
    if qmc_bridge and sampler != "sobol":
        raise ValueError("qmc_bridge requires sampler='sobol' (the bridge is "
                         "a quasi-random dimension-ordering device; pseudo-"
                         "random draws are exchangeable so it would be a no-op)")
    dtype = real_dtype()
    num_points = len(timeline)
    if num_points == 0:
        if transpose_states:
            empty = jnp.zeros((0, model.state_dim, num_paths), dtype=dtype)
        else:
            empty = jnp.zeros((0, num_paths, model.state_dim), dtype=dtype)
        if emit_schedule is not None:
            return (empty if collect_states else None), []
        return empty

    t_prev_arr, dt_arr = build_step_schedule(model.calibration_date, timeline)
    phase_k = rng.phase_key(rng.root_key(root_seed), phase)
    sim_dim = model.simulation_dim
    needs_uniform = model.uses_uniforms(scheme)

    if sampler == "sobol":
        from montecarlo_risk_engine_tpu.ops.sobol import (
            direction_numbers,
            sobol_uniforms,
        )
        from jax.scipy.special import ndtri

        # One dimension block per substep: the sim_dim driver normals plus
        # the QE exp-mixture uniform when the scheme needs one.  The
        # direction-number table is a HOST numpy constant (a trace-time
        # device constant would round-trip through the remote relay).
        qmc_dims_step = sim_dim + (1 if needs_uniform else 0)
        bridge_plane = None
        if qmc_bridge:
            # Brownian-bridge dimension ordering (ops/sobol.py): the driver
            # normals of ALL substeps are one orthogonal rotation of
            # bridge-ordered Sobol normals — level l of factor f sits at
            # Sobol dimension l*sim_dim + f, so every factor's coarse path
            # structure lands on the best-distributed leading dimensions.
            # The rotated [T_sub, N, sim_dim] plane is built ONCE before the
            # scan via a fixed-order accumulation over the level axis (see
            # below); the QE uniforms keep their per-substep dimensions AFTER
            # the normal block.
            from montecarlo_risk_engine_tpu.ops.sobol import (
                brownian_bridge_matrix,
            )

            dt_sub_host = []
            t_prev_host = float(model.calibration_date)
            for t_point in timeline:
                d_sub = (float(t_point) - t_prev_host) / num_steps
                dt_sub_host.extend([max(d_sub, 0.0)] * num_steps)
                t_prev_host = float(t_point)
            bridge_m = brownian_bridge_matrix(np.asarray(dt_sub_host))
            num_levels = bridge_m.shape[1]
            dims_normal = num_levels * sim_dim
            dims_uniform = num_points * num_steps if needs_uniform else 0
            qmc_vtab = direction_numbers(dims_normal + dims_uniform)
            qmc_shift = rng.qmc_shift(phase_k, qmc_vtab.shape[0])
            zeta = ndtri(sobol_uniforms(
                num_paths, jnp.asarray(qmc_vtab[:dims_normal]),
                qmc_shift[:dims_normal], dtype,
            )).reshape(num_paths, num_levels, sim_dim)
            if path_sharding is not None:
                zeta = jax.lax.with_sharding_constraint(zeta, path_sharding)
            # Fixed-order accumulation over levels instead of an einsum
            # contraction: the level reduction is unrolled in the graph, so
            # every path's plane value is the same fma sequence regardless of
            # how XLA tiles the (sharded) path axis — keeping the engine's
            # sharded==unsharded bitwise contract — and full-precision even
            # on the f32 MXU (an einsum here accumulated in reduced MXU
            # precision on TPU and in shard-size-dependent order, which broke
            # bitwise determinism by 1 ulp; round-3 advisor findings).
            bm = jnp.asarray(bridge_m, dtype)
            bridge_plane = bm[:, 0][:, None, None] * zeta[None, :, 0, :]
            for lvl in range(1, num_levels):
                bridge_plane = (
                    bridge_plane
                    + bm[:, lvl][:, None, None] * zeta[None, :, lvl, :]
                )

            def qmc_block(counter):
                """Bridge normals for this substep + its scrambled uniform."""
                z_k = bridge_plane[counter]
                if not needs_uniform:
                    return z_k, None
                v_u = jax.lax.dynamic_slice(
                    jnp.asarray(qmc_vtab), (dims_normal + counter, 0),
                    (1, qmc_vtab.shape[1]),
                )
                s_u = jax.lax.dynamic_slice(
                    qmc_shift, (dims_normal + counter,), (1,)
                )
                return z_k, sobol_uniforms(num_paths, v_u, s_u, dtype)[:, 0]
        else:
            qmc_vtab = direction_numbers(num_points * num_steps * qmc_dims_step)
            qmc_shift = rng.qmc_shift(phase_k, qmc_vtab.shape[0])

            def qmc_block(counter):
                """Scrambled Sobol draws for this substep: (normals, uniform)."""
                off = counter * qmc_dims_step
                v_k = jax.lax.dynamic_slice(
                    jnp.asarray(qmc_vtab), (off, 0),
                    (qmc_dims_step, qmc_vtab.shape[1]),
                )
                s_k = jax.lax.dynamic_slice(qmc_shift, (off,), (qmc_dims_step,))
                u_all = sobol_uniforms(num_paths, v_k, s_k, dtype)
                return (
                    ndtri(u_all[:, :sim_dim]),
                    u_all[:, sim_dim] if needs_uniform else None,
                )

    state0 = model.init_state(params, num_paths).astype(dtype)
    if path_sharding is not None:
        state0 = jax.lax.with_sharding_constraint(state0, path_sharding)

    if scheme != SimulationScheme.ANALYTICAL:
        chol_const = model.noise_transform(params, scheme, None).astype(dtype)
    else:
        chol_const = None

    def substep(k, carry, point_idx, t_prev, dt_interval):
        state = carry
        dt = dt_interval / num_steps
        live = dt_interval > 0.0
        dt_safe = jnp.where(live, dt, 1.0)
        t1 = t_prev + k * dt_safe

        counter = point_idx * num_steps + k
        qmc_uniform = None
        if sampler == "sobol":
            z, qmc_uniform = qmc_block(counter)
        elif antithetic:
            half = rng.normals(
                rng.step_key(phase_k, counter, rng.PURPOSE_NORMAL),
                (num_paths // 2, sim_dim), dtype,
            )
            z = jnp.concatenate([half, -half], axis=0)
        else:
            z = rng.normals(
                rng.step_key(phase_k, counter, rng.PURPOSE_NORMAL),
                (num_paths, sim_dim), dtype,
            )
        if path_sharding is not None:
            z = jax.lax.with_sharding_constraint(z, path_sharding)
        if scheme == SimulationScheme.ANALYTICAL:
            chol = jnp.linalg.cholesky(
                model.covariance_matrix(params, dt_safe).astype(dtype)
            )
        else:
            chol = chol_const
        # Mul-add contraction, not dot_general: a sim_dim-sized contracting
        # dim on the MXU pads its operand to 128 lanes (ops/noise.py).
        noise = correlate_noise(z, chol)

        uniform = None
        if needs_uniform:
            if sampler == "sobol":
                uniform = qmc_uniform
            elif antithetic:
                half_u = rng.uniforms(
                    rng.step_key(phase_k, counter, rng.PURPOSE_UNIFORM),
                    (num_paths // 2,), dtype,
                )
                uniform = jnp.concatenate([half_u, 1.0 - half_u], axis=0)
            else:
                uniform = rng.uniforms(
                    rng.step_key(phase_k, counter, rng.PURPOSE_UNIFORM),
                    (num_paths,), dtype,
                )

        new_state = model.step(params, scheme, t1, t1 + dt_safe, state, noise, uniform)
        return jnp.where(live, new_state, state)

    def point_step(state, point_idx, t_prev, dt_interval):
        state = jax.lax.fori_loop(
            0,
            num_steps,
            lambda k, st: substep(k, st, point_idx, t_prev, dt_interval),
            state,
        )
        if path_sharding is not None:
            state = jax.lax.with_sharding_constraint(state, path_sharding)
        return state

    if remat:
        point_step = jax.checkpoint(point_step)

    if emit_schedule is None:

        def point_body(state, xs):
            state = point_step(state, *xs)
            return state, (state.T if transpose_states else state)

        xs = (jnp.arange(num_points), t_prev_arr, dt_arr)
        _, states = jax.lax.scan(point_body, state0, xs)
        return states

    # -- streaming emission (SURVEY.md §5.7) --------------------------------
    groups = emit_schedule.groups
    emit_tabs = tuple(
        (asarray(g.t1_tab), asarray(g.t2_tab)) for g in groups
    )

    def emit(state):
        """Resolve this point's request rows against the live state."""

        def rows(t1_row, t2_row, g):
            state_b = jnp.broadcast_to(state, (g.K,) + state.shape)
            return model.resolve_request_rows(
                params, g.kind, g.asset_id, t1_row, t2_row, state_b
            )

        return rows

    if fold is not None:
        aux0, fold_update = fold

        def fold_body(carry, xs):
            state, aux = carry
            point_idx, t_prev, dt_interval, emit_rows = xs
            state = point_step(state, point_idx, t_prev, dt_interval)
            resolver = emit(state)
            ys = tuple(
                resolver(t1_row, t2_row, g)
                for (t1_row, t2_row), g in zip(emit_rows, groups)
            )
            aux = fold_update(point_idx, ys, state, aux)
            return (state, aux), None

        xs = (jnp.arange(num_points), t_prev_arr, dt_arr, emit_tabs)
        (_, aux_final), _ = jax.lax.scan(fold_body, (state0, aux0), xs)
        return aux_final

    def point_body(state, xs):
        point_idx, t_prev, dt_interval, emit_rows = xs
        state = point_step(state, point_idx, t_prev, dt_interval)
        resolver = emit(state)
        ys = tuple(
            resolver(t1_row, t2_row, g)
            for (t1_row, t2_row), g in zip(emit_rows, groups)
        )
        out_state = None
        if collect_states:
            out_state = state.T if transpose_states else state
        return state, (out_state, ys)

    xs = (jnp.arange(num_points), t_prev_arr, dt_arr, emit_tabs)
    _, (states, emitted) = jax.lax.scan(point_body, state0, xs)
    # [T, K, ...] -> [T*K, ...] flat row arrays, path axis minor.
    emissions = [
        e.reshape((e.shape[0] * e.shape[1],) + e.shape[2:]) for e in emitted
    ]
    return states, emissions

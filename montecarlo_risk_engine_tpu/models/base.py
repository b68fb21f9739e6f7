"""Model base protocol: pure, jit-safe step functions over path state.

Counterpart of the reference's ``src/models/model.py`` (Model base,
model.py:5-141) re-designed for XLA:

  * **Parameters are explicit.**  Every method takes ``params`` — a flat tuple
    of 0-d jnp arrays in a documented order — instead of reading mutable
    ``model_params`` tensors.  ``jax.grad`` differentiates the whole pipeline
    with respect to this tuple (replacing torch ``requires_grad_`` AAD,
    model.py:83-90).
  * **Steps are pure functions** ``(params, t1, t2, state, noise, uniform) ->
    state`` suitable for ``lax.scan`` — no in-place mutation, no Python-level
    RNG (reference steps: model.py:92-133).
  * **Correlation is assembled inside the trace.**  The reference caches a
    Cholesky factor keyed by (scheme, dt) host-side (model.py:50-73); here the
    factor is computed from traced params (so it carries gradients) and XLA
    hoists loop-invariant factors out of the scan automatically.
  * Times ``t1``/``t2`` may be traced scalars: any time-dependent market
    objects (forward curves, hazard buckets) are implemented with device-side
    interpolation rather than host lookups.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax.numpy as jnp

from montecarlo_risk_engine_tpu.config import SimulationScheme, asarray, real_dtype
from montecarlo_risk_engine_tpu.requests import AtomicRequest


class Model:
    def __init__(
        self,
        calibration_date: float,
        simulation_dim: int = 1,
        state_dim: int = 1,
        asset_ids: Optional[Sequence[str]] = None,
    ):
        self.calibration_date = float(calibration_date)
        self.asset_ids: List[str] = list(asset_ids) if asset_ids else [""]
        self.num_assets = len(self.asset_ids)
        self.simulation_dim = simulation_dim
        self.state_dim = state_dim
        # Mirrors reference ``perform_smoothing`` — enabled alongside
        # differentiation so discontinuous payoffs/branches become fuzzy
        # (model.py:83-90).  Static: selects what gets traced.
        self.perform_smoothing = False

    # -- parameters ---------------------------------------------------------

    def initial_params(self) -> Tuple:
        """Flat tuple of 0-d arrays, in the order of get_model_param_names()."""
        raise NotImplementedError

    def get_model_param_names(self) -> List[str]:
        raise NotImplementedError

    def requires_grad(self) -> None:
        """Enable payoff smoothing (differentiation itself needs no flags in jax)."""
        self.perform_smoothing = True

    # -- state / noise ------------------------------------------------------

    def init_state(self, params, num_paths: int):
        """Initial state, shape [num_paths, state_dim]."""
        raise NotImplementedError

    def correlation_matrix(self, params, scheme: SimulationScheme):
        """Driver-noise correlation for EULER/MILSTEIN/QE schemes
        (reference model.py:75-77 default: identity)."""
        return jnp.eye(self.simulation_dim, dtype=real_dtype())

    def covariance_matrix(self, params, delta_t):
        """One-step noise covariance for the ANALYTICAL scheme
        (reference model.py:79-81 default: identity * dt)."""
        return jnp.eye(self.simulation_dim, dtype=real_dtype()) * delta_t

    def noise_transform(self, params, scheme: SimulationScheme, delta_t):
        """Matrix L with correlated increments = z @ L.T
        (reference generate_correlated_randn, model.py:38-48)."""
        if scheme == SimulationScheme.ANALYTICAL:
            return jnp.linalg.cholesky(self.covariance_matrix(params, delta_t))
        return jnp.linalg.cholesky(self.correlation_matrix(params, scheme))

    def uses_uniforms(self, scheme: SimulationScheme) -> bool:
        """Whether step() consumes a per-path uniform draw (Heston QE only)."""
        return False

    def analytic_factor_loadings(self, params):
        """Per driver factor k: (a_k, vol_k) such that the ANALYTICAL-scheme
        noise increment over [t, t+dt] is ``vol_k * int_0^dt e^{-a_k (dt-u)}
        dW_k(u)`` (a_k = 0 for plain Brownian drivers, e.g. GBM log-spots).

        Used by ModelConfig to assemble the EXACT joint covariance between
        sub-models under the ANALYTICAL scheme:
        ``C_ij = v_i v_j rho_ij (1 - e^{-(a_i+a_j) dt}) / (a_i + a_j)`` —
        generalising the reference's BS x BS-only closed form
        (model_config.py:193-221).  Return None when the model's exact
        transition is not of this Gaussian form (Heston QE); models whose
        analytic step is a moment-matched proxy may return moment-matched
        loadings instead (CIR++ returns its representative-level OU
        loading (kappa, sigma*sqrt(theta)))."""
        return None

    # -- stepping -----------------------------------------------------------

    def step(self, params, scheme: SimulationScheme, t1, t2, state, corr_noise, uniform=None):
        if scheme == SimulationScheme.ANALYTICAL:
            return self.step_analytical(params, t1, t2, state, corr_noise)
        if scheme == SimulationScheme.EULER:
            return self.step_euler(params, t1, t2, state, corr_noise)
        if scheme == SimulationScheme.MILSTEIN:
            return self.step_milstein(params, t1, t2, state, corr_noise)
        if scheme == SimulationScheme.QE:
            return self.step_qe(params, t1, t2, state, corr_noise, uniform)
        raise NotImplementedError(f"Scheme {scheme} not supported by {type(self).__name__}")

    def step_analytical(self, params, t1, t2, state, corr_noise):
        raise NotImplementedError(f"{type(self).__name__}: analytical step not implemented")

    def step_euler(self, params, t1, t2, state, corr_noise):
        raise NotImplementedError(f"{type(self).__name__}: Euler step not implemented")

    def step_milstein(self, params, t1, t2, state, corr_noise):
        raise NotImplementedError(f"{type(self).__name__}: Milstein step not implemented")

    def step_qe(self, params, t1, t2, state, corr_noise, uniform):
        raise NotImplementedError(f"{type(self).__name__}: QE step not implemented")

    # -- fused Pallas path generation (TPU fast path) -----------------------

    #: Whether this model's kernel streams its emissions to HBM in time
    #: chunks (ops/pallas_hybrid.py), making ANY timeline length
    #: kernel-eligible.  Single-pass kernels (ops/pallas_paths.py) must fit
    #: the whole [T, D, rows, 128] trajectory block in scoped VMEM, so the
    #: eligibility gate shrinks their block or falls back to the XLA engine
    #: (pick_rows_per_block).
    pallas_time_chunked = False

    def supports_pallas_paths(self, scheme: SimulationScheme) -> bool:
        """Whether a fused hardware-PRNG Pallas kernel exists for this model
        and scheme (ops/pallas_paths.py).  Forward-only: the controller uses
        it for non-differentiated runs on TPU; draws are an equally valid but
        different stream from the threefry engine (statistical — not bitwise —
        equivalence)."""
        return False

    def pallas_paths(self, params, scheme, timeline, num_paths: int,
                     num_steps: int, seed: int, phase: int = 0,
                     block_offset=0, rows_per_block=None):
        """States at each timeline point, [T, num_paths, state_dim] f32."""
        raise NotImplementedError

    def supports_pallas_ad(self, scheme: SimulationScheme) -> bool:
        """Whether the kernel path composes with AD for this scheme — either
        the transition is noise-invertible (``invert_noise``, mode
        ``"invert"``) or the kernel can emit its raw draws (mode ``"emit"``,
        Heston QE) so the custom-JVP tangent rule (ops/pallas_paths_ad.py)
        can re-derive the step recurrence from the kernel's own draws."""
        return False

    def pallas_ad_mode(self, scheme: SimulationScheme) -> str:
        """How the differentiable kernel wrapper obtains the step draws:
        ``"invert"`` — recover them from consecutive emitted states
        (recovered_noise_paths; default), ``"emit"`` — the kernel ships them
        (emitted_noise_paths; non-invertible transitions, Heston QE)."""
        return "invert"

    def pallas_paths_with_noise(self, params, scheme, timeline,
                                num_paths: int, seed: int, phase: int = 0,
                                block_offset=0, rows_per_block=None):
        """Noise-emitting kernel forward for ``pallas_ad_mode() == "emit"``:
        states [T, N, D], raw normals [T, N, sim_dim], uniforms [T, N] at a
        substep-dense timeline (one substep per point)."""
        raise NotImplementedError

    def pallas_emission_width(self, scheme: SimulationScheme,
                              differentiate: bool) -> int:
        """f32 values emitted to HBM per path per timeline point — the
        eligibility gate's VMEM-block sizing input (api/controller.py
        ``_decide_pallas``).  ``"emit"``-mode AD adds sim_dim normals and a
        uniform per point on top of the state columns."""
        if differentiate and self.pallas_ad_mode(scheme) == "emit":
            return self.state_dim + self.simulation_dim + 1
        return self.state_dim

    def invert_noise(self, params, scheme: SimulationScheme, t1, t2, state,
                     next_state):
        """The ``corr_noise`` for which ``step(params, scheme, t1, t2,
        state, corr_noise) == next_state`` — shape [N, simulation_dim].

        Exact transition inversion used by the differentiable kernel path
        (ops/pallas_paths_ad.py) to recover the hardware-PRNG draws from
        consecutive emitted states.  Must never produce NaN/inf for valid
        consecutive states (guard zero-diffusion regions with a 0 noise —
        their tangent contribution is 0 anyway)."""
        raise NotImplementedError(
            f"{type(self).__name__}: transition inversion not implemented"
        )

    # -- observables --------------------------------------------------------

    # Static column offset into a wider joint state: the hybrid ModelConfig
    # hands sub-models the FULL [N, D] state and sets this to the sub-model's
    # state-block start so column reads are absolute (no narrowing slice whose
    # VJP would pad [*, N, d] -> [*, N, D] with a small minor axis).
    _col_offset: int = 0
    # Orientation of the state arrays seen by resolve_obs: False = [N, d]
    # (the step/init convention, default), True = [d, N] (the controller's
    # resolution plane — path axis minor, so neither forward values nor AD
    # cotangents ever put a small axis on the 128-lane minor tile).
    _state_transposed: bool = False

    def set_state_layout(self, transposed: bool) -> None:
        """Select the state orientation handed to resolve_obs (see above)."""
        self._state_transposed = bool(transposed)

    def _state_col(self, state, k: int):
        """Column ``k`` (relative to ``_col_offset``) of a [N, d] state;
        passes a pre-squeezed [N] state through unchanged.

        Uses :func:`pick_state_col`, whose reverse rule never materialises a
        tensor with a small minor axis: a plain ``state[:, k]`` under the
        vmapped request resolver reverse-differentiates to ``broadcast ->
        pad`` with a resident [chunk, rows, N, 1] cotangent, and the TPU AOT
        layout assigner tiled that unit dim onto the 128-lane minor axis —
        a 144MB cotangent became an 18.4GB padded copy on the 1M-path
        north-star AAD run (same failure again as [chunk, rows, N, 2] for the
        one-hot-contraction variant).
        """
        if state.ndim == 1:
            return state
        if self._state_transposed:
            # [d, N]: a leading-axis row read — its transpose pads on the
            # LEADING axis, leaving the path-minor layout intact.
            return state[k + self._col_offset]
        from montecarlo_risk_engine_tpu.ops.gather import pick_state_col

        return pick_state_col(state, k + self._col_offset)

    def resolve_obs(self, params, kind, asset_id: str, t1, t2, state):
        """Resolve one observable kind from the state at one time point.

        ``t1``/``t2`` may be traced scalars (0.0 when the request carries no
        time), so the request plan can vmap this over a whole column of
        requests — the "observable schedule" resolution of SURVEY.md §7.1.
        Returns [N] or a 0-d array when state-independent.
        """
        raise NotImplementedError

    def resolve_request(self, params, req: AtomicRequest, asset_id: str, state):
        """Resolve one declared request (reference model.py:135-141)."""
        t1 = 0.0 if req.time1 is None else req.time1
        t2 = 0.0 if req.time2 is None else req.time2
        return self.resolve_obs(params, req.request_type, asset_id, t1, t2, state)

    def resolve_request_rows(self, params, kind, asset_id: str, t1s, t2s, states_sel):
        """Vectorised resolution of n same-kind requests on one asset.

        states_sel: [n, N, state_dim] — the path states gathered at each
        request's time index.  Returns [n, N] (or [n] when state-independent).
        Default: vmap of resolve_obs; models may override with a fused form.
        """
        import jax

        if states_sel.ndim == 3:
            # Single-factor models: drop the unit state dim before the vmap
            # (see _state_col — avoids 128x TPU lane padding on cotangents).
            if self._state_transposed and states_sel.shape[1] == 1:
                states_sel = states_sel[:, 0]
            elif not self._state_transposed and states_sel.shape[-1] == 1:
                states_sel = states_sel[..., 0]
        return jax.vmap(
            lambda t1, t2, state: self.resolve_obs(params, kind, asset_id, t1, t2, state)
        )(t1s, t2s, states_sel)

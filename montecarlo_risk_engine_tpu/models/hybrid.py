"""Hybrid model container: joint simulation of several correlated models.

Counterpart of reference ``src/models/model_config.py`` (ModelConfig,
model_config.py:8-307).  Used for xVA books: e.g. a Vasicek rates model, a
Black–Scholes equity model and a CIR++ credit model simulated jointly with
user-specified inter-asset correlation (wrong-way risk).

Functional layout:
  * ``params`` is the concatenation of sub-model parameter tuples (same
    flattening as model_config.py:61-65), so one ``jax.grad`` covers every
    sub-model parameter; names are prefixed ``asset.param``
    (model_config.py:93-99).
  * State/noise columns are partitioned by (state_dim, simulation_dim)
    offsets; each step slices its block and delegates
    (model_config.py:223-276).
  * The joint driver correlation is assembled block-wise: intra blocks from
    sub-models, inter blocks from user matrices (model_config.py:101-142).
    For the ANALYTICAL scheme the joint covariance needs inter-model
    covariances; these exist in closed form for lognormal (BS-style) pairs —
    sigma_i sigma_j rho_ij dt (model_config.py:193-221) — and raise otherwise,
    matching the reference's contract.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from montecarlo_risk_engine_tpu.config import SimulationScheme, asarray, real_dtype
from montecarlo_risk_engine_tpu.models.base import Model
from montecarlo_risk_engine_tpu.models.black_scholes import BlackScholesModel
from montecarlo_risk_engine_tpu.requests import AtomicRequest


class ModelConfig(Model):
    def __init__(
        self,
        models: Sequence[Model],
        numeraire_model_idx: int = 0,
        discount_model_idx: int = 0,
        inter_asset_correlation_matrix: Optional[List] = None,
    ):
        models = list(models)
        assert len(models) > 0, "Provide at least one model."
        assert all(
            m.calibration_date == models[0].calibration_date for m in models
        ), "All models must share the same calibration_date."

        asset_ids = [a for m in models for a in m.asset_ids]
        assert len(asset_ids) == len(set(asset_ids)), (
            "Duplicate asset_ids across sub-models: each asset must be simulated "
            "by exactly one model."
        )
        super().__init__(
            calibration_date=models[0].calibration_date,
            asset_ids=asset_ids,
            simulation_dim=sum(m.simulation_dim for m in models),
            state_dim=sum(m.state_dim for m in models),
        )
        self.models = models

        self.id_to_model = {"numeraire": numeraire_model_idx, "discount": discount_model_idx}
        for idx, m in enumerate(models):
            for a in m.asset_ids:
                self.id_to_model[a] = idx

        self._state_offsets = np.cumsum([0] + [m.state_dim for m in models])
        # Sub-models resolve observables from the FULL joint state with
        # absolute column reads (see resolve_obs below); their state-block
        # start is a static per-instance attribute.  Note: a model instance
        # inside a ModelConfig should not simultaneously be used standalone.
        for i, m in enumerate(models):
            m._col_offset = int(self._state_offsets[i])
        self._sim_offsets = np.cumsum([0] + [m.simulation_dim for m in models])
        self._param_offsets = np.cumsum([0] + [len(m.initial_params()) for m in models])

        # Inter-model correlations, ordered over pairs (i, j) with j > i
        # (model_config.py:67-78); identity-zero when omitted.
        self._inter_corr: List[np.ndarray] = []
        pair_idx = 0
        for i, m1 in enumerate(models):
            for m2 in models[i + 1 :]:
                if inter_asset_correlation_matrix is None:
                    self._inter_corr.append(np.zeros((m1.simulation_dim, m2.simulation_dim)))
                else:
                    block = np.asarray(inter_asset_correlation_matrix[pair_idx], dtype=np.float64)
                    block = np.atleast_2d(block)
                    self._inter_corr.append(block)
                pair_idx += 1

    def set_state_layout(self, transposed: bool) -> None:
        super().set_state_layout(transposed)
        for m in self.models:
            m.set_state_layout(transposed)

    # -- params ---------------------------------------------------------------

    def initial_params(self):
        out = []
        for m in self.models:
            out.extend(m.initial_params())
        return tuple(out)

    def get_model_param_names(self):
        names = []
        for m in self.models:
            label = (
                m.asset_ids[0]
                if len(m.asset_ids) == 1 and m.asset_ids[0]
                else type(m).__name__
            )
            names.extend(f"{label}.{p}" for p in m.get_model_param_names())
        return names

    def requires_grad(self):
        self.perform_smoothing = True
        for m in self.models:
            m.requires_grad()

    def _sub_params(self, params, idx):
        return tuple(params[self._param_offsets[idx] : self._param_offsets[idx + 1]])

    # -- state / noise ----------------------------------------------------------

    def init_state(self, params, num_paths):
        blocks = [
            m.init_state(self._sub_params(params, i), num_paths)
            for i, m in enumerate(self.models)
        ]
        return jnp.concatenate(blocks, axis=1)

    def correlation_matrix(self, params, scheme):
        dim = self.simulation_dim
        corr = jnp.zeros((dim, dim), dtype=real_dtype())
        pair_idx = 0
        for i, m1 in enumerate(self.models):
            r0, r1 = self._sim_offsets[i], self._sim_offsets[i + 1]
            intra = m1.correlation_matrix(self._sub_params(params, i), scheme)
            corr = corr.at[r0:r1, r0:r1].set(intra)
            for j in range(i + 1, len(self.models)):
                c0, c1 = self._sim_offsets[j], self._sim_offsets[j + 1]
                block = asarray(self._inter_corr[pair_idx])
                corr = corr.at[r0:r1, c0:c1].set(block)
                corr = corr.at[c0:c1, r0:r1].set(block.T)
                pair_idx += 1
        return 0.5 * (corr + corr.T)

    def covariance_matrix(self, params, delta_t):
        dim = self.simulation_dim
        cov = jnp.zeros((dim, dim), dtype=real_dtype())
        pair_idx = 0
        for i, m1 in enumerate(self.models):
            r0, r1 = self._sim_offsets[i], self._sim_offsets[i + 1]
            intra = m1.covariance_matrix(self._sub_params(params, i), delta_t)
            cov = cov.at[r0:r1, r0:r1].set(intra)
            for j in range(i + 1, len(self.models)):
                m2 = self.models[j]
                c0, c1 = self._sim_offsets[j], self._sim_offsets[j + 1]
                block = self._inter_covariance(
                    m1, self._sub_params(params, i),
                    m2, self._sub_params(params, j),
                    asarray(self._inter_corr[pair_idx]), delta_t,
                )
                cov = cov.at[r0:r1, c0:c1].set(block)
                cov = cov.at[c0:c1, r0:r1].set(block.T)
                pair_idx += 1
        return 0.5 * (cov + cov.T)

    @staticmethod
    def _inter_covariance(m1, p1, m2, p2, corr_block, delta_t):
        # Closed-form lognormal pair: sigma1 sigma2 rho dt
        # (model_config.py:193-221).  Same contract as the reference: only
        # BS-style pairs have an analytic joint covariance.
        if isinstance(m1, BlackScholesModel) and isinstance(m2, BlackScholesModel):
            vol1 = p1[1].reshape(1)
            vol2 = p2[1].reshape(1)
            return jnp.outer(vol1, vol2) * corr_block * delta_t
        raise NotImplementedError(
            "Joint ANALYTICAL covariance is implemented for Black–Scholes pairs "
            "only; use EULER/QE for other hybrid combinations."
        )

    def uses_uniforms(self, scheme):
        return any(m.uses_uniforms(scheme) for m in self.models)

    def step(self, params, scheme, t1, t2, state, corr_noise, uniform=None):
        blocks = []
        for i, m in enumerate(self.models):
            s0, s1 = self._state_offsets[i], self._state_offsets[i + 1]
            n0, n1 = self._sim_offsets[i], self._sim_offsets[i + 1]
            # Mixed-scheme dispatch (beyond parity — the reference's
            # ModelConfig simply has no QE path, model_config.py:223-276):
            # QE is defined per-asset (Andersen's scheme for Heston blocks);
            # sub-models without a QE step integrate their block with Euler
            # under the same joint driver correlation.
            sub_scheme = scheme
            if scheme == SimulationScheme.QE and not m.uses_uniforms(scheme):
                sub_scheme = SimulationScheme.EULER
            blocks.append(
                m.step(
                    self._sub_params(params, i),
                    sub_scheme,
                    t1,
                    t2,
                    state[:, s0:s1],
                    corr_noise[:, n0:n1],
                    uniform,
                )
            )
        return jnp.concatenate(blocks, axis=1)

    # -- observables --------------------------------------------------------------

    def resolve_obs(self, params, kind, asset_id, t1, t2, state):
        # Sub-models read ABSOLUTE columns of the full joint state via their
        # static ``_col_offset`` (set in __init__): a narrowing slice here
        # would reverse-differentiate to a pad whose [*, N, d] cotangent the
        # TPU AOT layout assigner can lane-pad 64-128x (see
        # Model._state_col / ops/gather.pick_state_col).
        idx = self.id_to_model[asset_id]
        m = self.models[idx]
        return m.resolve_obs(self._sub_params(params, idx), kind, asset_id, t1, t2, state)

    def resolve_request_rows(self, params, kind, asset_id, t1s, t2s, states_sel):
        """Delegate a whole request group to the owning sub-model on the FULL
        joint state (absolute column reads — no narrowing slice)."""
        idx = self.id_to_model[asset_id]
        m = self.models[idx]
        import jax

        return jax.vmap(
            lambda t1, t2, state: m.resolve_obs(
                self._sub_params(params, idx), kind, asset_id, t1, t2, state
            )
        )(t1s, t2s, states_sel)

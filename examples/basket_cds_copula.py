"""k-th-to-default basket CDS pricing with Gaussian and Student-t copulas.

Counterpart of the reference research notebook docs/research (basket CDS,
kth-to-default under Gaussian/t copulas): simulates correlated default times
by mapping copula samples through piecewise-constant hazard curves, using the
custom-derivative Student-t CDF (utils/special.py — the reference's
"external function on the AAD tape" pattern, pytorch_external_functions.py).

Run: python examples/basket_cds_copula.py
"""

import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from montecarlo_risk_engine_tpu.helpers.cs_helper import probability_of_default
from montecarlo_risk_engine_tpu.utils.special import t_cdf

N_NAMES = 5
RHO = 0.4
MATURITY = 5.0
RECOVERY = 0.4
HAZARD = 0.02
NUM_PATHS = 200_000


def default_times_from_uniforms(u):
    """Invert flat-hazard survival: tau = -ln(1-u)/h."""
    return -jnp.log1p(-u) / HAZARD


def copula_uniforms(key, kind: str):
    corr = RHO * jnp.ones((N_NAMES, N_NAMES)) + (1 - RHO) * jnp.eye(N_NAMES)
    chol = jnp.linalg.cholesky(corr)
    z = jax.random.normal(key, (NUM_PATHS, N_NAMES)) @ chol.T
    if kind == "gaussian":
        return jax.scipy.stats.norm.cdf(z)
    # Student-t copula: scale by sqrt(df / chi2)
    df = 4.0
    chi2 = 2.0 * jax.random.gamma(jax.random.fold_in(key, 1), df / 2.0, (NUM_PATHS, 1))
    t_samples = z / jnp.sqrt(chi2 / df)
    return t_cdf(t_samples, df)


def kth_to_default_leg(taus, k: int, rate: float = 0.02):
    """Protection-leg value of the k-th default before maturity."""
    tau_sorted = jnp.sort(taus, axis=1)
    tau_k = tau_sorted[:, k - 1]
    hit = tau_k <= MATURITY
    df = jnp.exp(-rate * jnp.minimum(tau_k, MATURITY))
    return jnp.mean(jnp.where(hit, (1.0 - RECOVERY) * df, 0.0))


def main():
    key = jax.random.key(7)
    print(f"{'copula':>10} {'k':>3} {'protection leg':>15}")
    for kind in ("gaussian", "student-t"):
        u = copula_uniforms(key, kind)
        taus = default_times_from_uniforms(u)
        for k in (1, 2, N_NAMES):
            leg = float(kth_to_default_leg(taus, k))
            print(f"{kind:>10} {k:3d} {leg:15.5f}")


if __name__ == "__main__":
    main()

"""Special functions with custom derivative rules.

Counterpart of reference ``src/maths/pytorch_external_functions.py``
(TCDFPytorch, pytorch_external_functions.py:5-35): the "external function on
the AAD tape" pattern — a Student-t CDF whose forward pass is a special
function and whose backward pass is the analytic pdf.

Here the forward is computed natively on device via the regularised
incomplete beta function (no host round-trip, unlike the reference's SciPy
call), and the jvp/vjp is pinned to the exact Student-t pdf via
``jax.custom_jvp`` — the same "define the derivative explicitly" pattern,
which also sidesteps betainc's undefined parameter derivatives.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.scipy.special import betainc, gammaln


def t_pdf(x, df: float):
    df = jnp.asarray(df, dtype=jnp.result_type(x, float))
    log_norm = (
        gammaln((df + 1.0) / 2.0)
        - gammaln(df / 2.0)
        - 0.5 * jnp.log(df * jnp.pi)
    )
    return jnp.exp(log_norm - 0.5 * (df + 1.0) * jnp.log1p(x * x / df))


@jax.custom_jvp
def t_cdf(x, df: float):
    """Student-t CDF via I_{df/(df+x^2)}(df/2, 1/2) with sign handling."""
    x = jnp.asarray(x)
    df_arr = jnp.asarray(df, dtype=jnp.result_type(x, float))
    z = df_arr / (df_arr + x * x)
    tail = 0.5 * betainc(df_arr / 2.0, 0.5, z)
    return jnp.where(x >= 0, 1.0 - tail, tail)


@t_cdf.defjvp
def _t_cdf_jvp(primals, tangents):
    x, df = primals
    dx, _ = tangents
    return t_cdf(x, df), t_pdf(x, df) * dx


# Back-compat spelling mirroring the reference helper name
# (pytorch_external_functions.py:34-35).
def t_cdf_autograd(x, df: float):
    return t_cdf(x, df)

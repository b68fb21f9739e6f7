"""Family-batched product executors for large books.

The reference evaluates every product in a Python loop (controller.py:571-591)
— fine for CPU torch, but on TPU a 50k-product book must not unroll 50k
subgraphs.  Products are grouped by family + static signature and evaluated as
single table-driven kernels (SURVEY.md §7.1 "group products by family"):

  * terminal stateless payoffs (European/Binary/Basket/Asian/Barrier on
    spot observables) become one vectorised payoff over [P, ...] tables;
  * Bermudan/FlexiCall exercise machines become ONE lax.scan over exercise
    events with a product-batched carry C[P, N, S] — both the LSM backward
    fit (batched Gram solves) and the forward valuation.

All tables (strikes, signs, time indices) are host numpy arrays that enter
the graph as constants; per-product work is one gather row, so the compiled
program is O(product groups), not O(products).

Exposure profiles are batched too:
  * terminal products regress their (masked) terminal cashflow on the
    explanatory spot with ONE shared Gram matrix per (asset, exposure date)
    and a multi-RHS solve across all products on that asset;
  * exercise products run merged (product dates + exposure dates) event scans
    with per-product flag arrays, emitting realized-state continuations.
Per-netting-set aggregation happens inside the per-date loops, so nothing of
shape [T_exp, P, N] is materialised for large P.
"""

from __future__ import annotations

from collections import defaultdict
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from montecarlo_risk_engine_tpu.config import asarray, real_dtype
from montecarlo_risk_engine_tpu.metrics.metrics import fixed_tree_sum
from montecarlo_risk_engine_tpu.products.asian_option import AsianAveragingType, AsianOption
from montecarlo_risk_engine_tpu.products.barrier_option import BarrierOption, BarrierOptionType
from montecarlo_risk_engine_tpu.products.base import OptionType
from montecarlo_risk_engine_tpu.products.bond import Bond
from montecarlo_risk_engine_tpu.products.swap import InterestRateSwap, IRSType
from montecarlo_risk_engine_tpu.products.basket_option import BasketOption, BasketOptionType
from montecarlo_risk_engine_tpu.products.bermudan_option import BermudanOption
from montecarlo_risk_engine_tpu.products.binary_option import BinaryOption
from montecarlo_risk_engine_tpu.products.equity import Equity
from montecarlo_risk_engine_tpu.products.european_option import EuropeanOption
from montecarlo_risk_engine_tpu.products.flexicall import FlexiCall
from montecarlo_risk_engine_tpu.requests import AtomicRequestType
from montecarlo_risk_engine_tpu.utils.maths import compute_degree_of_truth


class ObservableTables:
    """Lazy per-run tables of resolved observables keyed by (kind, asset).

    One ``resolve_request_rows`` call per (asset, unique-time-set) — shared by
    every batch in the book.
    """

    def __init__(self, model, params, states, num_paths):
        self.model = model
        self.params = params
        self.states = states
        self.num_paths = num_paths
        self._cache: Dict[Tuple, object] = {}

    def rows(self, kind, asset_id: str, tidx: np.ndarray, times: np.ndarray):
        """Resolved observable rows [len(tidx), N] for (kind, asset)."""
        key = (kind, asset_id, tuple(tidx.tolist()), tuple(np.round(times, 12).tolist()))
        if key not in self._cache:
            t1 = asarray(times)
            t2 = jnp.zeros_like(t1)
            from montecarlo_risk_engine_tpu.ops.gather import gather_rows

            out = self.model.resolve_request_rows(
                self.params, kind, asset_id, t1, t2, gather_rows(self.states, tidx)
            )
            if out.ndim == 1:
                out = jnp.broadcast_to(out[:, None], (out.shape[0], self.num_paths))
            self._cache[key] = out
        return self._cache[key]

    def request_rows(self, kind, asset_id, tidx, times1, times2, handles):
        """Resolved rows [len(tidx), N] for explicit (t1, t2) requests.

        Unlike :meth:`rows`, this resolves against the full request identity
        — needed for two-time observables (LIBOR fixings) where a kind-level
        (time, asset) lookup may be ambiguous.  Plane mode resolves directly
        from the gathered states; ``handles`` are ignored.
        """
        key = (kind, asset_id, tuple(np.asarray(tidx).tolist()),
               tuple(np.round(np.asarray(times1), 12).tolist()),
               tuple(np.round(np.asarray(times2), 12).tolist()))
        if key not in self._cache:
            from montecarlo_risk_engine_tpu.ops.gather import gather_rows

            out = self.model.resolve_request_rows(
                self.params, kind, asset_id, asarray(times1), asarray(times2),
                gather_rows(self.states, np.asarray(tidx)),
            )
            if out.ndim == 1:
                out = jnp.broadcast_to(out[:, None], (out.shape[0], self.num_paths))
            self._cache[key] = out
        return self._cache[key]


class EmittedTables:
    """ObservableTables drop-in backed by the streaming engine's emissions.

    No state plane exists in streaming mode (SURVEY.md §5.7): every observable
    was already resolved inside the path scan, so a rows() query is a static
    gather from the group's [T*K, N] emission array — one one-hot matmul on
    TPU (ops/gather.take_time_rows), never a resolve against [T, D, N] states.
    """

    def __init__(self, plan, schedule, emissions, params, num_paths):
        self.plan = plan
        self.schedule = schedule
        self.emissions = emissions
        self.params = params
        self.num_paths = num_paths
        self._cache: Dict[Tuple, object] = {}

    def rows(self, kind, asset_id: str, tidx: np.ndarray, times: np.ndarray):
        """Resolved observable rows [len(tidx), N] for (kind, asset)."""
        key = (kind, asset_id, tuple(np.asarray(tidx).tolist()))
        if key not in self._cache:
            lookup = self.schedule.kind_lookup
            locs = []
            for t in np.asarray(tidx).tolist():
                lkey = (int(t), asset_id, kind)
                if lkey not in lookup:
                    if lkey in self.schedule.ambiguous_kinds:
                        raise KeyError(
                            f"ambiguous streaming emission for {kind} on "
                            f"'{asset_id}' at time index {t}: several requests "
                            f"share this (time, asset, kind) with different "
                            f"(t1, t2) parameters, so a kind-level query "
                            f"cannot pick one — query by handle instead"
                        )
                    raise KeyError(
                        f"streaming emission missing for {kind} on '{asset_id}' "
                        f"at time index {t} — request not registered in the plan"
                    )
                locs.append(self.schedule.handle_loc[lookup[lkey]])
            group_ids = {g for g, _ in locs}
            assert len(group_ids) == 1, "one (kind, asset) query spans one group"
            flat = self.emissions[locs[0][0]]
            rows_idx = tuple(r for _, r in locs)
            if flat.ndim >= 2:
                from montecarlo_risk_engine_tpu.ops.gather import take_time_rows

                out = take_time_rows(flat, rows_idx, int(flat.shape[0]))
            else:
                out = flat[np.array(rows_idx)]
            if out.ndim == 1:
                out = jnp.broadcast_to(out[:, None], (out.shape[0], self.num_paths))
            self._cache[key] = out
        return self._cache[key]

    def request_rows(self, kind, asset_id, tidx, times1, times2, handles):
        """Resolved rows [len(handles), N] gathered by request HANDLE.

        Streaming mode already resolved every request in-scan; a handle is an
        exact row address (no kind-level ambiguity for two-time observables
        like LIBOR fixings).  times are ignored.
        """
        key = (kind, asset_id, tuple(int(h) for h in handles))
        if key not in self._cache:
            locs = [self.schedule.handle_loc[int(h)] for h in handles]
            group_ids = {g for g, _ in locs}
            assert len(group_ids) == 1, "one (kind, asset) query spans one group"
            flat = self.emissions[locs[0][0]]
            rows_idx = tuple(r for _, r in locs)
            if flat.ndim >= 2:
                from montecarlo_risk_engine_tpu.ops.gather import take_time_rows

                out = take_time_rows(flat, rows_idx, int(flat.shape[0]))
            else:
                out = flat[np.array(rows_idx)]
            if out.ndim == 1:
                out = jnp.broadcast_to(out[:, None], (out.shape[0], self.num_paths))
            self._cache[key] = out
        return self._cache[key]


def _unique_rows(tidx_flat: np.ndarray, times_flat: np.ndarray):
    uniq, inverse = np.unique(tidx_flat, return_inverse=True)
    time_for_uniq = np.zeros(len(uniq))
    time_for_uniq[inverse] = times_flat
    return uniq, inverse, time_for_uniq


class ExposureContext:
    """Static exposure-pipeline data shared by all batches in a run."""

    def __init__(self, exposure_timeline, time_to_index, num_netting_sets,
                 spot_requests, numeraire_requests, regression_function):
        self.exposure_timeline = tuple(exposure_timeline)  # internal timeline
        self.time_to_index = time_to_index
        self.num_netting_sets = num_netting_sets
        self.spot_requests = spot_requests            # controller (t, asset) -> req
        self.numeraire_requests = numeraire_requests  # controller (t, "numeraire") -> req
        self.regression_function = regression_function


class TerminalBatch:
    """Shared machinery for stateless terminal-payoff families."""

    def __init__(self, products: Sequence, ns_idx: np.ndarray, time_to_index):
        self.products = list(products)
        self.ns_idx = np.asarray(ns_idx)
        self.time_to_index = time_to_index
        self._exp_coeffs = None  # [T_exp, P, deg] after fit_exposure

    def maturities(self) -> np.ndarray:
        """Per-product cashflow date (terminal families have exactly one)."""
        return np.array([p.product_timeline[-1] for p in self.products])

    # Target size of the dense [products, paths] cashflow temp per chunk.
    # A 10k-option x 1M-path book would otherwise materialise a 40GB payoff
    # matrix before the per-netting-set segment reduction.
    CASHFLOW_CHUNK_BYTES = 1 << 30

    def _slice(self, lo: int, hi: int) -> "TerminalBatch":
        return self._subset(range(lo, hi))

    def _subset(self, rows) -> "TerminalBatch":
        rows = list(rows)
        sub = type(self)([self.products[i] for i in rows],
                         self.ns_idx[np.asarray(rows, dtype=int)],
                         self.time_to_index)
        # analytic fast-path flags (EuropeanEquityBatch) ride along
        for attr in ("use_analytic_exposure", "analytic_model"):
            if hasattr(self, attr):
                setattr(sub, attr, getattr(self, attr))
        return sub

    def _cashflow_chunk(self, num_paths: int) -> int:
        itemsize = jnp.dtype(real_dtype()).itemsize
        return max(1, self.CASHFLOW_CHUNK_BYTES // max(1, num_paths * itemsize))

    def segmented_cashflows(self, tables, n_ns: int, num_paths: int):
        """Per-netting-set pathwise cashflows [n_ns, N], accumulating the
        payoff matrix in product chunks so the dense [P, N] temp stays under
        CASHFLOW_CHUNK_BYTES."""
        from montecarlo_risk_engine_tpu.config import real_dtype

        itemsize = jnp.dtype(real_dtype()).itemsize
        chunk = max(1, self.CASHFLOW_CHUNK_BYTES // max(1, num_paths * itemsize))
        num_products = len(self.products)
        if num_products <= chunk:
            return jax.ops.segment_sum(
                self.cashflows(tables), jnp.asarray(self.ns_idx),
                num_segments=n_ns,
            )
        total = jnp.zeros((n_ns, num_paths), dtype=real_dtype())
        for lo in range(0, num_products, chunk):
            hi = min(lo + chunk, num_products)
            sub = self._slice(lo, hi)
            total = total + jax.ops.segment_sum(
                sub.cashflows(tables), jnp.asarray(sub.ns_idx),
                num_segments=n_ns,
            )
        return total

    def explanatory_assets(self):
        """Per-product explanatory asset: the first asset id (quirk Q9 —
        single-factor regression, controller.py:361,366)."""
        return [p.asset_ids[0] for p in self.products]

    def _exposure_grid_obs(self, tables: ObservableTables, ctx: ExposureContext, asset):
        """(explanatory [T_exp, N], numeraire [T_exp, N]) on the exposure grid.

        The Vandermonde basis is deliberately NOT materialised: a
        [T_exp, N, deg] stack (plus its jvp tangent and XLA copies) was the
        dominant HBM resident of every at-scale run — 4 x 1.5GB buffers in
        the 2M-path kernel-AD OOM dump (round 4).  fit_exposure and
        exposure_contributions consume the raw explanatory via running
        powers / Horner instead, keeping peak state [T, N]-sized.
        """
        t_grid = np.array(ctx.exposure_timeline)
        tidx = np.array([self.time_to_index[t] for t in t_grid])
        expl = tables.rows(AtomicRequestType.SPOT, asset, tidx, t_grid)     # [T, N]
        numeraire = tables.rows(AtomicRequestType.NUMERAIRE, "numeraire", tidx, t_grid)
        return expl, numeraire

    def _exposure_gram(self, expl, deg: int):
        """(gram [T, deg, deg], col_scale [T, deg], y [T, N]) for the
        exposure-grid normal equations.

        Gram entries are monomial power sums accumulated with ONE running
        [T, N] power instead of a [T, N, deg] Vandermonde stack — that stack
        (plus its jvp tangent and XLA copies) was a dominant HBM resident of
        every at-scale run (round 4).  The powers are taken of the
        RMS-NORMALISED explanatory y = x / sqrt(mean x^2), so every summand
        stays O(1) and the f32 accumulation loses no precision to magnitude
        (summing raw x^4 ~ 1e8 over millions of paths moved a 2M-path CVA by
        ~4 sigma); the implied column equilibration is s^d, undone on the
        solved coefficients exactly like the old per-column RMS.  All
        path-axis reductions use fixed_tree_sum so the solved coefficients —
        and hence every regression-built exposure value — are bitwise
        identical under any path sharding (round-4 verdict #3).
        """
        n_paths = expl.shape[1]
        s1 = jnp.maximum(
            jnp.sqrt(fixed_tree_sum(expl * expl, axis=1) / n_paths), 1e-30
        )                                                   # [T]
        y = expl / s1[:, None]
        pw = jnp.ones_like(y)
        s_list = [jnp.full(y.shape[:1], float(n_paths), y.dtype)]
        for _ in range(2 * deg - 2):
            pw = pw * y
            s_list.append(fixed_tree_sum(pw, axis=1))
        S = jnp.stack(s_list)                               # [2deg-1, T]
        col_scale = s1[:, None] ** jnp.arange(deg, dtype=s1.dtype)[None, :]
        gram = jnp.moveaxis(
            S[np.add.outer(np.arange(deg), np.arange(deg))], -1, 0
        )                                                   # [T, deg, deg]
        ridge_rel = 1e-10 if jnp.finfo(gram.dtype).bits >= 64 else 1e-4
        scale = jnp.trace(gram, axis1=1, axis2=2)[:, None, None] / deg
        gram = gram + (ridge_rel * scale + 1e-30) * jnp.eye(deg, dtype=gram.dtype)
        return gram, col_scale, y

    def fit_exposure(self, tables: ObservableTables, ctx: ExposureContext) -> None:
        """Regress masked terminal cashflows on the explanatory spot.

        Exploits two structures so no per-date Python loop is needed:
        the Gram matrix is shared by every product on an asset (one batched
        solve per asset over the whole exposure grid), and the RHS is a single
        einsum of the un-discounted basis against the terminal cashflows
        (distributed-LSM normal equations, SURVEY.md §5.8).
        """
        regfn = ctx.regression_function
        deg = regfn.get_degree()
        maturities = self.maturities()
        assets = self.explanatory_assets()
        P = len(self.products)
        t_grid = np.array(ctx.exposure_timeline)
        chunk = self._cashflow_chunk(tables.num_paths)

        by_asset = defaultdict(list)
        for p_idx, a in enumerate(assets):
            by_asset[a].append(p_idx)

        coeffs_all = jnp.zeros((len(t_grid), P, deg), dtype=real_dtype())
        for a, p_rows in by_asset.items():
            p_rows = np.array(p_rows)
            expl, numeraire = self._exposure_grid_obs(tables, ctx, a)
            gram, col_scale, y = self._exposure_gram(expl, deg)
            # rhs[t,d,p] = sum_n y^d num[t,n] cf[p,n], masked to
            # strictly-future cashflows (maturity > t).  The contraction
            # loops over dates with a per-(t, d) fixed-tree sum of a single
            # [Pc, N] product — bitwise shard-invariant AND no [T, Pc, N]
            # temp: a vectorised-over-T variant materialised [57, 4, 1M]
            # broadcast products whose jvp tangents (x4 copies, x2.2 TPU
            # padding) OOM'd the 1M-path kernel-AD north star (round-5 AOT
            # dump — jvp()/add_any at this line).
            cf_chunks = []
            for lo in range(0, len(p_rows), chunk):
                rows_c = p_rows[lo:lo + chunk]
                cf_chunks.append(self._subset(rows_c).cashflows(tables))
            t_blocks = []
            for t in range(len(t_grid)):
                wd = numeraire[t]
                per_deg = []
                for d in range(deg):
                    if d:
                        wd = wd * y[t]
                    per_deg.append(jnp.concatenate([
                        fixed_tree_sum(wd[None, :] * cf_c, axis=1)
                        for cf_c in cf_chunks
                    ]))                                         # [Pa]
                t_blocks.append(jnp.stack(per_deg))             # [deg, Pa]
            rhs = jnp.stack(t_blocks)                           # [T, deg, Pa]
            mask = asarray(maturities[p_rows][None, :] > t_grid[:, None])
            rhs = rhs * mask[:, None, :]
            sol = jnp.linalg.solve(gram, rhs)                  # [T, deg, Pa]
            sol = sol / col_scale[:, :, None]
            coeffs_all = coeffs_all.at[:, p_rows, :].set(jnp.swapaxes(sol, 1, 2))
        self._exp_coeffs = coeffs_all  # [T_exp, P, deg]

    def exposure_contributions(self, tables: ObservableTables, ctx: ExposureContext):
        """Per-netting-set exposure profiles [T_exp, n_ns, N].

        Exposure is linear in the coefficients, so products collapse to their
        netting set BEFORE the basis product: segment-sum coeffs [T, n_ns, deg]
        then one einsum — nothing of shape [T, P, N] is ever materialised.
        """
        assets = self.explanatory_assets()
        by_asset = defaultdict(list)
        for p_idx, a in enumerate(assets):
            by_asset[a].append(p_idx)

        ns_seg = jnp.asarray(self.ns_idx)
        total = jnp.zeros(
            (len(ctx.exposure_timeline), ctx.num_netting_sets, tables.num_paths),
            dtype=real_dtype(),
        )
        for a, p_rows in by_asset.items():
            p_rows = np.array(p_rows)
            expl, numeraire = self._exposure_grid_obs(tables, ctx, a)
            coeffs = self._exp_coeffs[:, p_rows, :]            # [T, Pa, deg]
            coeffs_ns = jax.vmap(
                lambda c: jax.ops.segment_sum(
                    c, ns_seg[p_rows], num_segments=ctx.num_netting_sets
                )
            )(coeffs)                                          # [T, n_ns, deg]
            # Horner over the degree axis: never a [T, N, deg] basis stack
            # (the round-4 HBM finding) and no deg-sized dot_general
            # contracting dim (which would pad to 128 lanes on TPU,
            # ops/noise.py rationale).  The Horner runs in DATE CHUNKS: a
            # whole-grid [T, n_ns, N] accumulator times its jvp tangents
            # (x deg iterations, x netting adds) put several 2GB HLO temps
            # in the kernel-AD tangent sweep at 1M paths x 57 dates —
            # chunking bounds the live set to the [Tc, n_ns, N] slice
            # (round-5 regression found when CouponBatch routed the
            # north-star swaps through this path).
            deg = coeffs_ns.shape[-1]
            T = coeffs_ns.shape[0]
            itemsize = jnp.dtype(real_dtype()).itemsize
            slab = ctx.num_netting_sets * expl.shape[1] * itemsize
            t_chunk = max(1, min(T, (self.CASHFLOW_CHUNK_BYTES // 4)
                                 // max(1, slab)))
            pieces = []
            for lo in range(0, T, t_chunk):
                hi = min(lo + t_chunk, T)
                c_c = coeffs_ns[lo:hi]
                e_c = expl[lo:hi]
                acc = jnp.broadcast_to(
                    c_c[:, :, deg - 1][:, :, None],
                    c_c.shape[:2] + (e_c.shape[1],),
                )
                for d in range(deg - 2, -1, -1):
                    acc = acc * e_c[:, None, :] + c_c[:, :, d][:, :, None]
                pieces.append(acc / numeraire[lo:hi, None, :])
            total = total + jnp.concatenate(pieces, axis=0)
        return total

    def _spot_matrix(self, tables: ObservableTables, asset_ids, tidx_mat, times_mat):
        """Gather spots: per-product per-observation rows -> [P, O, N].

        asset_ids: per-product asset (str) [P]; tidx/times [P, O].
        """
        out_rows = np.empty(tidx_mat.shape, dtype=int)
        pieces = []
        offset = 0
        order = defaultdict(list)
        for p, a in enumerate(asset_ids):
            order[a].append(p)
        for a, rows_p in order.items():
            rows_p = np.array(rows_p)
            flat_tidx = tidx_mat[rows_p].ravel()
            flat_times = times_mat[rows_p].ravel()
            uniq, inverse, time_u = _unique_rows(flat_tidx, flat_times)
            table = tables.rows(AtomicRequestType.SPOT, a, uniq, time_u)
            pieces.append(table)
            out_rows[rows_p] = (offset + inverse).reshape(len(rows_p), -1)
            offset += len(uniq)
        full = jnp.concatenate(pieces, axis=0)
        return full[out_rows]  # [P, O, N]

    def _numeraires(self, tables: ObservableTables, tidx: np.ndarray, times: np.ndarray):
        uniq, inverse, time_u = _unique_rows(tidx, times)
        table = tables.rows(AtomicRequestType.NUMERAIRE, "numeraire", uniq, time_u)
        return table[inverse]  # [P, N]


class EuropeanEquityBatch(TerminalBatch):
    """All EuropeanOption-on-Equity products in one payoff kernel."""

    # Set by the controller when the analytic discounted-exposure fast path
    # applies (BS-family model + metrics in {PV, EPE, PFE}, controller.py:211).
    use_analytic_exposure = False
    analytic_model = None

    @staticmethod
    def accepts(product) -> bool:
        return isinstance(product, EuropeanOption) and isinstance(product.underlying, Equity)

    @staticmethod
    def group_key(product):
        return ("european_equity",)

    def cashflows(self, tables: ObservableTables):
        prods = self.products
        tidx = np.array([self.time_to_index[p.exercise_date] for p in prods])
        times = np.array([p.exercise_date for p in prods])
        assets = [p.underlying.get_asset_id() for p in prods]
        strikes = asarray([p.strike for p in prods])[:, None]
        signs = asarray([1.0 if p.option_type == OptionType.CALL else -1.0 for p in prods])[:, None]

        spots = self._spot_matrix(tables, assets, tidx[:, None], times[:, None])[:, 0, :]
        numeraire = self._numeraires(tables, tidx, times)
        return jnp.maximum(signs * (spots - strikes), 0.0) / numeraire

    # Use the sorted-strike hinge-sum path once the book is this many times
    # larger than its (asset, date, sign, netting-set) group count.
    HINGE_SUM_MIN_RATIO = 4

    def segmented_cashflows(self, tables, n_ns: int, num_paths: int):
        """Per-netting-set pathwise cashflows [n_ns, N] in O(groups x N).

        A European book's per-netting-set cashflow at one (asset, date, sign)
        is a SUM OF HINGES of the same scalar spot:
            calls:  sum_p max(S - k_p, 0) = S*c(S) - prefix[c(S)]
            puts:   sum_p max(k_p - S, 0) = (total - prefix[c(S)]) - S*(K - c(S))
        with c(S) = #{sorted strikes <= S} found by searchsorted.  That
        replaces the dense [P, N] payoff matrix (40GB for 10k options x 1M
        paths — the per-chunk temps still stack up under XLA's overlap
        scheduler) with a handful of [N]-sized piecewise-linear evaluations.
        Identical math, different summation order (strikes sorted)."""
        from collections import defaultdict as _dd

        from montecarlo_risk_engine_tpu.config import real_dtype

        prods = self.products
        itemsize = jnp.dtype(real_dtype()).itemsize
        if len(prods) * num_paths * itemsize <= self.CASHFLOW_CHUNK_BYTES:
            # dense [P, N] fits the temp budget: one fused kernel beats a
            # per-group op chain (compile time scales with group count)
            return super().segmented_cashflows(tables, n_ns, num_paths)
        groups = _dd(list)
        for i, p in enumerate(prods):
            sign = 1.0 if p.option_type == OptionType.CALL else -1.0
            key = (int(self.ns_idx[i]), p.underlying.get_asset_id(),
                   p.exercise_date, sign)
            groups[key].append(p.strike)
        if len(prods) < self.HINGE_SUM_MIN_RATIO * len(groups):
            return super().segmented_cashflows(tables, n_ns, num_paths)

        total = jnp.zeros((n_ns, num_paths), dtype=real_dtype())
        for (ns, asset, date, sign), ks in sorted(groups.items()):
            t_i = np.array([self.time_to_index[date]])
            t_v = np.array([date])
            spot = tables.rows(AtomicRequestType.SPOT, asset, t_i, t_v)[0]
            numeraire = self._numeraires(tables, t_i, t_v)[0]
            ks_sorted = np.sort(np.asarray(ks, dtype=float))
            prefix = np.concatenate([[0.0], np.cumsum(ks_sorted)])
            ks_dev = asarray(ks_sorted)
            prefix_dev = asarray(prefix)
            c = jnp.searchsorted(ks_dev, spot, side="right")
            if sign > 0:
                val = spot * c - prefix_dev[c]
            else:
                val = (prefix[-1] - prefix_dev[c]) - spot * (len(ks_sorted) - c)
            total = total.at[ns].add(val / numeraire)
        return total

    # -- analytic exposure fast path (european_option.py:123-145, batched) ----

    def fit_exposure(self, tables, ctx):
        if self.use_analytic_exposure:
            return  # closed form needs no pre-simulation fit
        super().fit_exposure(tables, ctx)

    def exposure_contributions(self, tables: ObservableTables, ctx: ExposureContext):
        if not self.use_analytic_exposure:
            return super().exposure_contributions(tables, ctx)

        from jax.scipy.special import ndtr

        model = self.analytic_model
        params = tables.params
        prods = self.products
        assets = self.explanatory_assets()
        maturities = self.maturities()
        strikes = asarray([p.strike for p in prods])
        is_call = np.array([p.option_type == OptionType.CALL for p in prods])

        by_asset = defaultdict(list)
        for p_idx, a in enumerate(assets):
            by_asset[a].append(p_idx)

        if model.num_assets > 1:
            rate = params[2 * model.num_assets]
            vol_of = {a: params[model.num_assets + model.asset_ids.index(a)]
                      for a in set(assets)}
        else:
            rate = params[2]
            vol_of = {a: params[1] for a in set(assets)}

        ns_seg = jnp.asarray(self.ns_idx)
        t_grid = np.array(ctx.exposure_timeline)
        tidx = np.array([self.time_to_index[t] for t in t_grid])
        n_ns = ctx.num_netting_sets
        total = jnp.zeros((len(t_grid), n_ns, tables.num_paths), dtype=real_dtype())

        chunk = self._cashflow_chunk(tables.num_paths)
        for a, p_rows in by_asset.items():
            p_rows = np.array(p_rows)
            spot_rows = tables.rows(AtomicRequestType.SPOT, a, tidx, t_grid)      # [T, N]
            num_rows = tables.rows(AtomicRequestType.NUMERAIRE, "numeraire", tidx, t_grid)
            sigma = vol_of[a]
            # product tables padded to [C, K] chunks: a nested lax.scan keeps
            # only one [K, N] price block live at a time (a 10k-option x 1M-
            # path book is a 40GB dense [Pa, N] block per date otherwise)
            pa = len(p_rows)
            chunk_a = min(chunk, pa)
            n_chunks = max(1, -(-pa // chunk_a))
            pad = n_chunks * chunk_a - pa
            k_mat = np.pad(np.asarray(
                [prods[i].strike for i in p_rows], dtype=float), (0, pad),
                constant_values=1.0).reshape(n_chunks, chunk_a)
            call_mat = np.pad(is_call[p_rows], (0, pad)).reshape(n_chunks, chunk_a)
            seg_mat = np.pad(np.asarray(self.ns_idx)[p_rows], (0, pad)).reshape(
                n_chunks, chunk_a)
            mat_mat = np.pad(maturities[p_rows], (0, pad),
                             constant_values=-1.0).reshape(n_chunks, chunk_a)
            k_dev = asarray(k_mat)[:, :, None]
            call_dev = asarray(call_mat)[:, :, None]
            seg_dev = jnp.asarray(seg_mat)
            mat_dev = asarray(mat_mat)

            def chunk_price(spot_t, num_t, t_now, k, call_m, seg_c, mats):
                tau_raw = mats[:, None] - t_now
                alive = tau_raw > 0.0
                tau = jnp.where(alive, tau_raw, 1.0)
                spot = spot_t[None, :]
                sqrt_tau = jnp.sqrt(tau)
                d1 = (jnp.log(spot / k) + (rate + 0.5 * sigma * sigma) * tau) / (sigma * sqrt_tau)
                d2 = d1 - sigma * sqrt_tau
                disc_k = k * jnp.exp(-rate * tau)
                call = spot * ndtr(d1) - disc_k * ndtr(d2)
                put = disc_k * ndtr(-d2) - spot * ndtr(-d1)
                price = jnp.where(call_m, call, put)
                price = jnp.where(alive, price, 0.0) / num_t[None, :]
                return jax.ops.segment_sum(price, seg_c, num_segments=n_ns)

            def body(carry, xs):
                spot_t, num_t, t_now = xs
                if n_chunks == 1:
                    # test/CI-sized books: one fused block, no inner scan
                    # (a scan-of-scan costs far more XLA CPU compile time)
                    rows_t = chunk_price(spot_t, num_t, t_now, k_dev[0],
                                         call_dev[0], seg_dev[0], mat_dev[0])
                    return carry, rows_t

                def chunk_body(acc, cxs):
                    k, call_m, seg_c, mats = cxs
                    return acc + chunk_price(
                        spot_t, num_t, t_now, k, call_m, seg_c, mats
                    ), None

                acc0 = jnp.zeros((n_ns, spot_t.shape[0]), dtype=real_dtype())
                rows_t, _ = jax.lax.scan(
                    chunk_body, acc0, (k_dev, call_dev, seg_dev, mat_dev)
                )
                return carry, rows_t

            _, rows = jax.lax.scan(
                body, 0.0, (spot_rows, num_rows, asarray(t_grid))
            )
            total = total + rows
        return total


class BinaryBatch(TerminalBatch):
    @staticmethod
    def accepts(product) -> bool:
        return isinstance(product, BinaryOption)

    @staticmethod
    def group_key(product):
        return ("binary",)

    def cashflows(self, tables: ObservableTables):
        prods = self.products
        tidx = np.array([self.time_to_index[p.maturity] for p in prods])
        times = np.array([p.maturity for p in prods])
        assets = [p.get_asset_id() for p in prods]
        strikes = asarray([p.strike for p in prods])[:, None]
        amounts = asarray([p.payment_amount for p in prods])[:, None]
        is_call = asarray([1.0 if p.option_type == OptionType.CALL else 0.0 for p in prods])[:, None]

        spots = self._spot_matrix(tables, assets, tidx[:, None], times[:, None])[:, 0, :]
        numeraire = self._numeraires(tables, tidx, times)
        above = compute_degree_of_truth(spots - strikes, True, 1.0)
        payoff = amounts * (is_call * above + (1.0 - is_call) * (1.0 - above))
        return payoff / numeraire

    HINGE_SUM_MIN_RATIO = 4

    def segmented_cashflows(self, tables, n_ns: int, num_paths: int):
        """Per-netting-set digital cashflows in O(groups x N).

        The fuzzy digital payoff clip((S - k + eps)/2eps, 0, 1) (eps=1,
        reference binary_option.py:37-42) is piecewise linear in S, so a
        group's payment-weighted sum evaluates from two searchsorteds against
        the sorted strikes plus payment/payment*strike prefix sums — the
        digital analogue of the European hinge-sum path."""
        from collections import defaultdict as _dd

        prods = self.products
        itemsize = jnp.dtype(real_dtype()).itemsize
        if len(prods) * num_paths * itemsize <= self.CASHFLOW_CHUNK_BYTES:
            return super().segmented_cashflows(tables, n_ns, num_paths)
        groups = _dd(list)
        for i, p in enumerate(prods):
            key = (int(self.ns_idx[i]), p.get_asset_id(), p.maturity,
                   p.option_type == OptionType.CALL)
            groups[key].append((p.strike, p.payment_amount))
        if len(prods) < self.HINGE_SUM_MIN_RATIO * len(groups):
            return super().segmented_cashflows(tables, n_ns, num_paths)

        eps = 1.0
        total = jnp.zeros((n_ns, num_paths), dtype=real_dtype())
        for (ns, asset, date, is_call), pairs in sorted(groups.items()):
            t_i = np.array([self.time_to_index[date]])
            t_v = np.array([date])
            spot = tables.rows(AtomicRequestType.SPOT, asset, t_i, t_v)[0]
            numeraire = self._numeraires(tables, t_i, t_v)[0]
            pairs = sorted(pairs)
            ks = np.array([k for k, _ in pairs])
            amts = np.array([a for _, a in pairs])
            pay_prefix = np.concatenate([[0.0], np.cumsum(amts)])
            payk_prefix = np.concatenate([[0.0], np.cumsum(amts * ks)])
            ks_dev = asarray(ks)
            A = asarray(pay_prefix)
            B = asarray(payk_prefix)
            c1 = jnp.searchsorted(ks_dev, spot - eps, side="right")
            c2 = jnp.searchsorted(ks_dev, spot + eps, side="left")
            band = ((spot + eps) * (A[c2] - A[c1]) - (B[c2] - B[c1])) / (2.0 * eps)
            val_above = A[c1] + band  # sum_p amt_p * clip((S-k_p+eps)/2eps,0,1)
            val = val_above if is_call else (pay_prefix[-1] - val_above)
            total = total.at[ns].add(val / numeraire)
        return total


class BasketBatch(TerminalBatch):
    @staticmethod
    def accepts(product) -> bool:
        return isinstance(product, BasketOption) and not product.use_variation_reduction

    @staticmethod
    def group_key(product):
        return ("basket", len(product.asset_ids))

    def cashflows(self, tables: ObservableTables):
        prods = self.products
        n_assets = len(prods[0].asset_ids)
        tidx = np.array([self.time_to_index[p.maturity] for p in prods])
        times = np.array([p.maturity for p in prods])
        strikes = asarray([p.strike for p in prods])[:, None]
        signs = asarray([1.0 if p.option_type == OptionType.CALL else -1.0 for p in prods])[:, None]
        weights = asarray([p.weights for p in prods])  # [P, A]
        is_geo = np.array([p.basket_option_type == BasketOptionType.GEOMETRIC for p in prods])

        # Per (product, asset) spot rows at each product's maturity.
        spot_cols = []
        for a_pos in range(n_assets):
            assets = [p.asset_ids[a_pos] for p in prods]
            spot_cols.append(self._spot_matrix(tables, assets, tidx[:, None], times[:, None])[:, 0, :])
        spots = jnp.stack(spot_cols, axis=1)  # [P, A, N]

        # Weighted sums over the (small) asset axis as mul-adds — an A-sized
        # contracting dim would pad [P, A, N] to 128 lanes (ops/noise.py).
        arith = (spots * weights[:, :, None]).sum(1)
        geo = jnp.exp((jnp.log(spots + 1e-10) * weights[:, :, None]).sum(1))
        basket = jnp.where(asarray(is_geo)[:, None], geo, arith)
        numeraire = self._numeraires(tables, tidx, times)
        return jnp.maximum(signs * (basket - strikes), 0.0) / numeraire


class AsianBatch(TerminalBatch):
    @staticmethod
    def accepts(product) -> bool:
        return isinstance(product, AsianOption)

    @staticmethod
    def group_key(product):
        return ("asian", len(product.modeling_timeline))

    def cashflows(self, tables: ObservableTables):
        prods = self.products
        tidx_mat = np.array([[self.time_to_index[t] for t in p.modeling_timeline] for p in prods])
        times_mat = np.array([list(p.modeling_timeline) for p in prods])
        assets = [p.get_asset_id() for p in prods]
        strikes = asarray([p.strike for p in prods])[:, None]
        signs = asarray([1.0 if p.option_type == OptionType.CALL else -1.0 for p in prods])[:, None]
        is_geo = np.array(
            [p.averaging_type == AsianAveragingType.GEOMETRIC for p in prods]
        )

        spots = self._spot_matrix(tables, assets, tidx_mat, times_mat)  # [P, O, N]
        arith = jnp.mean(spots, axis=1)
        geo = jnp.exp(jnp.mean(jnp.log(spots + 1e-10), axis=1))
        average = jnp.where(asarray(is_geo)[:, None], geo, arith)
        numeraire = self._numeraires(
            tables, tidx_mat[:, -1], times_mat[:, -1]
        )
        return jnp.maximum(signs * (average - strikes), 0.0) / numeraire


class BarrierBatch(TerminalBatch):
    @staticmethod
    def accepts(product) -> bool:
        return isinstance(product, BarrierOption) and not product.use_brownian_bridge

    @staticmethod
    def group_key(product):
        return ("barrier", len(product.modeling_timeline), product.barrier2 is not None)

    @staticmethod
    def _weight_arrays(prods, attr_type, attr_level):
        is_up = np.array([
            getattr(p, attr_type) in (BarrierOptionType.UPANDOUT, BarrierOptionType.UPANDIN)
            for p in prods
        ])
        is_out = np.array([
            getattr(p, attr_type) in (BarrierOptionType.UPANDOUT, BarrierOptionType.DOWNANDOUT)
            for p in prods
        ])
        levels = np.array([getattr(p, attr_level) for p in prods])
        return asarray(is_up)[:, None], asarray(is_out)[:, None], asarray(levels)[:, None]

    def _barrier_weight(self, spots, is_up, is_out, level):
        max_spot = jnp.max(spots, axis=1)
        min_spot = jnp.min(spots, axis=1)
        below_max = compute_degree_of_truth(level - max_spot, True)
        above_min = compute_degree_of_truth(min_spot - level, True)
        survive = jnp.where(is_up, below_max, above_min)
        return jnp.where(is_out, survive, 1.0 - survive)

    def cashflows(self, tables: ObservableTables):
        prods = self.products
        tidx_mat = np.array([[self.time_to_index[t] for t in p.modeling_timeline] for p in prods])
        times_mat = np.array([list(p.modeling_timeline) for p in prods])
        assets = [p.get_asset_id() for p in prods]
        strikes = asarray([p.strike for p in prods])[:, None]
        signs = asarray([1.0 if p.option_type == OptionType.CALL else -1.0 for p in prods])[:, None]

        spots = self._spot_matrix(tables, assets, tidx_mat, times_mat)  # [P, O, N]
        vanilla = jnp.maximum(signs * (spots[:, -1, :] - strikes), 0.0)

        up1, out1, lvl1 = self._weight_arrays(prods, "barrier_option_type1", "barrier1")
        payoff = vanilla * self._barrier_weight(spots, up1, out1, lvl1)
        if prods[0].barrier2 is not None:
            up2, out2, lvl2 = self._weight_arrays(prods, "barrier_option_type2", "barrier2")
            payoff = payoff * self._barrier_weight(spots, up2, out2, lvl2)

        numeraire = self._numeraires(tables, tidx_mat[:, -1], times_mat[:, -1])
        return payoff / numeraire


class ExerciseEquityBatch(TerminalBatch):
    """Product-batched LSM for Bermudan/FlexiCall on Equity underlyings.

    Backward fit and forward valuation both run as ONE lax.scan over the E
    exercise events with all P products in the carry — batched Gram solves
    replace per-product lstsq, and the exercise decision is vectorised over
    [P, N, S].
    """

    def __init__(self, products, ns_idx, time_to_index, regression_function):
        super().__init__(products, ns_idx, time_to_index)
        self.regression_function = regression_function
        self.is_flexi = isinstance(products[0], FlexiCall)
        self.num_states = max(p.get_num_states() for p in products)
        self._coeffs = None  # [E, P, S, deg], set by fit()

    @staticmethod
    def accepts(product) -> bool:
        if isinstance(product, FlexiCall):
            return all(isinstance(o.underlying, Equity) for o in product.underlyings)
        if isinstance(product, BermudanOption):
            und = product.underlying_requests[0].underlying_asset
            return isinstance(und, Equity)
        return False

    @staticmethod
    def group_key(product):
        kind = "flexi" if isinstance(product, FlexiCall) else "bermudan"
        return ("exercise", kind, len(product.product_timeline))

    # -- shared table building ------------------------------------------------

    def _event_tables(self, tables: ObservableTables, ctx: Optional[ExposureContext]):
        """Merged per-product event tables.

        Each product's events = its exercise dates (is_prod) followed, in time
        order with product-first tie-breaking, by every exposure date
        (is_exp).  All products share the uniform event count
        E_tot = E + T_exp; interleavings differ per product, which is fine
        because the scan body is flag-driven.
        """
        prods = self.products
        exposure_times = list(ctx.exposure_timeline) if ctx is not None else []
        strikes_per_prod = [p.scan_event_strikes() for p in prods]
        if self.is_flexi:
            signs = np.array([
                1.0 if p.underlyings[0].option_type == OptionType.CALL else -1.0 for p in prods
            ])
        else:
            signs = np.array([
                1.0 if p.option_type == OptionType.CALL else -1.0 for p in prods
            ])

        e_tot = len(prods[0].product_timeline) + len(exposure_times)
        P = len(prods)
        times_mat = np.zeros((P, e_tot))
        tidx_mat = np.zeros((P, e_tot), dtype=int)
        strike_mat = np.zeros((P, e_tot))
        is_prod = np.zeros((P, e_tot), dtype=bool)
        exp_row_idx = np.zeros((len(exposure_times), P), dtype=int)

        for p_idx, p in enumerate(prods):
            events = [(t, 1, strikes_per_prod[p_idx][i], -1)
                      for i, t in enumerate(p.product_timeline)]
            events += [(t, 0, 0.0, s) for s, t in enumerate(exposure_times)]
            # product events first on date ties (step-then-observe,
            # controller.py:417-447)
            events.sort(key=lambda e: (e[0], -e[1]))
            for row, (t, flag, strike, slot) in enumerate(events):
                times_mat[p_idx, row] = t
                tidx_mat[p_idx, row] = self.time_to_index[t]
                strike_mat[p_idx, row] = strike
                is_prod[p_idx, row] = bool(flag)
                if slot >= 0:
                    exp_row_idx[slot, p_idx] = row

        assets = [p.get_asset_id() for p in prods]
        spots = self._spot_matrix(tables, assets, tidx_mat, times_mat)  # [P, E_tot, N]
        num_flat = self._numeraires(tables, tidx_mat.ravel(), times_mat.ravel())
        numeraires = num_flat.reshape(spots.shape)
        return (
            jnp.swapaxes(spots, 0, 1),        # [E_tot, P, N]
            jnp.swapaxes(numeraires, 0, 1),   # [E_tot, P, N]
            asarray(strike_mat).T,            # [E_tot, P]
            jnp.asarray(is_prod).T,           # [E_tot, P]
            asarray(signs),                   # [P]
            exp_row_idx,                      # [T_exp, P] host ints
        )

    def _basis(self, x):
        # [..., N] -> [..., N, deg]
        degree = self.regression_function.degree
        return jnp.stack([x**k for k in range(degree + 1)], axis=-1)

    def _fit(self, basis, targets, weights=None):
        # basis [P, N, deg], targets [P, N, S] -> coeffs [P, S, deg]
        # Column equilibration (see utils/regression.fit_least_squares).
        # Path-axis reductions via fixed_tree_sum (NOT einsum) keep the
        # coefficients bitwise shard-invariant; the per-degree loop bounds
        # the temp at one [P, N, max(deg, S)] array — the same footprint as
        # the inputs (these fits run on presim paths).
        n = basis.shape[1]
        col_scale = jnp.maximum(
            jnp.sqrt(fixed_tree_sum(basis * basis, axis=1) / n), 1e-30
        )
        basis_s = basis / col_scale[:, None, :]
        basis_w = basis_s if weights is None else basis_s * weights[:, :, None]
        deg = basis.shape[-1]
        gram = jnp.stack([
            fixed_tree_sum(basis_w[:, :, d:d + 1] * basis_s, axis=1)
            for d in range(deg)
        ], axis=1)                                              # [P, deg, deg]
        ridge_rel = 1e-10 if jnp.finfo(gram.dtype).bits >= 64 else 1e-4
        scale = jnp.trace(gram, axis1=1, axis2=2)[:, None, None] / deg
        gram = gram + (ridge_rel * scale + 1e-30) * jnp.eye(deg, dtype=gram.dtype)
        rhs = jnp.stack([
            fixed_tree_sum(basis_w[:, :, d:d + 1] * targets, axis=1)
            for d in range(deg)
        ], axis=1)                                              # [P, deg, S]
        coeffs = jnp.swapaxes(jnp.linalg.solve(gram, rhs), 1, 2)
        return coeffs / col_scale[:, None, :]

    @staticmethod
    def _shift_down(values):
        """values[..., s] -> values[..., max(s-1, 0)] along the state axis."""
        return jnp.concatenate([values[..., :1], values[..., :-1]], axis=-1)

    def _itm_gate_col(self):
        """[P, 1, 1] float mask: 1 where the product uses ITM-gated exercise."""
        flags = np.array([
            getattr(p, "itm_only_regression", False) for p in self.products
        ])
        return asarray(flags)[:, None, None]

    def _hypothetical_step(self, carry, spots_e, num_e, strike_e, signs, coeffs):
        """One backward event on the all-states carry C [P, N, S]."""
        basis = self._basis(spots_e)                             # [P, N, deg]
        grid = jnp.einsum("pnd,psd->pns", basis, coeffs)          # [P, N, S]
        immediate = jnp.maximum(
            signs[:, None] * (spots_e - strike_e[:, None]), 0.0
        )[:, :, None]                                            # [P, N, 1]
        s_positive = (jnp.arange(self.num_states) > 0)[None, None, :]
        if self.is_flexi:
            cont_ex = self._shift_down(grid)
            exercised = (immediate + cont_ex > grid) & s_positive
        else:
            exercised = (immediate > grid) & s_positive
        # ITM-gated products never exercise out of the money (standard LSM)
        exercised = exercised & ((self._itm_gate_col() == 0) | (immediate > 0.0))
        cfs = immediate * exercised.astype(real_dtype()) / num_e[:, :, None]
        tail = jnp.where(exercised, self._shift_down(carry), carry)
        return cfs + tail

    def fit(self, tables: ObservableTables, ctx: Optional[ExposureContext] = None):
        spots, numeraires, strikes, is_prod, signs, _ = self._event_tables(tables, ctx)
        num_paths = tables.num_paths
        P = len(self.products)
        S = self.num_states
        itm_flags = np.array([
            getattr(p, "itm_only_regression", False) for p in self.products
        ])
        use_itm = bool(itm_flags.any())
        itm_col = asarray(itm_flags)[:, None]

        def body(carry, xs):
            spots_e, num_e, strike_e, is_prod_e = xs
            basis = self._basis(spots_e)
            weights = None
            if use_itm:
                itm = (signs[:, None] * (spots_e - strike_e[:, None]) > 0.0).astype(
                    real_dtype()
                )
                active = itm_col * is_prod_e[:, None]
                weights = jnp.where(active > 0, itm, 1.0)
            coeffs = self._fit(basis, num_e[:, :, None] * carry, weights=weights)
            stepped = self._hypothetical_step(carry, spots_e, num_e, strike_e, signs, coeffs)
            carry = jnp.where(is_prod_e[:, None, None], stepped, carry)
            return carry, coeffs

        c0 = jnp.zeros((P, num_paths, S), dtype=real_dtype())
        _, coeffs = jax.lax.scan(
            body, c0, (spots, numeraires, strikes, is_prod), reverse=True
        )
        self._coeffs = coeffs  # [E_tot, P, S, deg]

    def evaluate(self, tables: ObservableTables, ctx: Optional[ExposureContext] = None):
        """Forward sweep: returns (cfs [P, N], exposures [T_exp, P, N] | None)."""
        spots, numeraires, strikes, is_prod, signs, exp_row_idx = self._event_tables(
            tables, ctx
        )
        num_paths = tables.num_paths
        P = len(self.products)
        coeffs = self._coeffs

        init_state = np.array([p.get_initial_state() for p in self.products])
        state0 = jnp.broadcast_to(
            jnp.asarray(init_state)[:, None], (P, num_paths)
        ).astype(int)

        def body(carry, xs):
            state, cfs = carry
            spots_e, num_e, strike_e, is_prod_e, coeffs_e = xs
            basis = self._basis(spots_e)                       # [P, N, deg]
            c_state = jax.vmap(lambda c, s: c[s])(coeffs_e, state)   # [P, N, deg]
            cont_hold = jnp.sum(basis * c_state, axis=-1)
            immediate = jnp.maximum(signs[:, None] * (spots_e - strike_e[:, None]), 0.0)
            if self.is_flexi:
                state_after = jnp.maximum(state - 1, 0)
                c_after = jax.vmap(lambda c, s: c[s])(coeffs_e, state_after)
                cont_ex = jnp.sum(basis * c_after, axis=-1)
                exercised = (immediate + cont_ex > cont_hold) & (state > 0)
            else:
                exercised = (immediate > cont_hold) & (state > 0)
            exercised = exercised & is_prod_e[:, None]
            exercised = exercised & (
                (self._itm_gate_col()[:, :, 0] == 0) | (immediate > 0.0)
            )
            cfs = cfs + immediate * exercised.astype(real_dtype()) / num_e
            state = state - exercised.astype(int)
            # realized-state continuation for exposure rows (re-read after the
            # step: observe-after-advance, controller.py:417-447)
            c_state2 = jax.vmap(lambda c, s: c[s])(coeffs_e, state)
            exposure = jnp.sum(basis * c_state2, axis=-1) / num_e
            return (state, cfs), exposure

        (state, cfs), exposures_all = jax.lax.scan(
            body,
            (state0, jnp.zeros((P, num_paths), dtype=real_dtype())),
            (spots, numeraires, strikes, is_prod, coeffs),
        )
        exposures = None
        if ctx is not None and len(ctx.exposure_timeline):
            # per-product gather of its exposure rows -> [T_exp, P, N]
            exposures = exposures_all[exp_row_idx, np.arange(P)[None, :], :]
        return cfs, exposures

    def cashflows(self, tables: ObservableTables):
        return self.evaluate(tables, None)[0]


class CouponBatch(TerminalBatch):
    """All Bond / InterestRateSwap products in one event-table executor.

    Round-4 verdict #2: coupon products previously went through the
    per-product ``_evaluate_product`` loop, leaving one [T_exp, N] exposure
    stack and one traced subgraph PER PRODUCT (five ~2GB stacks on the 8M
    north-star probe; O(products) host trace on 5k-swap CVA books).  Here
    every coupon collapses into static host event tables:

      * fixed/notional events — (product row, pay date, signed amount) with
        the amount a host constant (bond.py:165-198 semantics, incl. quirk
        Q5's notional factor and the pays_notional terminal flow);
      * float events — (product row, pay date, signed notional*accrual,
        LIBOR request) consuming the same LIBOR_RATE rows the per-product
        path resolves (swap.py:122-140 delegation semantics, sign from
        IRSType).

    Cashflows are one segment-sum over event chunks; the exposure fit
    overrides the base's terminal-maturity mask with a descending-date sweep
    that accumulates STRICTLY-FUTURE cashflows per product (pay > t, exactly
    the backward-induction window of controller._perform_regression_for_
    product), then solves the shared power-sum Gram per asset.
    """

    @staticmethod
    def accepts(product) -> bool:
        return type(product) in (Bond, InterestRateSwap)

    @staticmethod
    def group_key(product):
        return ("coupon",)

    def __init__(self, products, ns_idx, time_to_index):
        super().__init__(products, ns_idx, time_to_index)
        self._build_events()

    def _legs(self, p):
        if isinstance(p, InterestRateSwap):
            fixed_sign = -1.0 if p.irs_type == IRSType.PAYER else 1.0
            return [(p.fixed_leg, fixed_sign), (p.floating_leg, -fixed_sign)]
        return [(p, 1.0)]

    def _build_events(self):
        # Fixed events: (prod_row, pay_time, amount, numeraire_req).
        # Float events: (prod_row, pay_time, coef, libor_req, numeraire_req),
        # cashflow = coef * L(t1, t2) / numeraire.  Request handles are read
        # lazily at evaluation time (assigned by the RequestPlan).
        self._fixed_events = []
        self._float_events = []
        for row, p in enumerate(self.products):
            for leg, sign in self._legs(p):
                asset = leg.get_asset_id()
                prev = leg.startdate
                last = len(leg.payment_dates) - 1
                for idx, date in enumerate(leg.payment_dates):
                    dt = date - prev
                    prev = date
                    nreq = leg.numeraire_requests[idx]
                    if leg.fixed_rate is not None:
                        amount = sign * leg.notional * leg.fixed_rate * dt
                        if leg.pays_notional and idx == last:
                            amount += sign * leg.notional
                        self._fixed_events.append((row, date, amount, nreq))
                    else:
                        lreq = leg.libor_requests[(idx, asset)]
                        coef = sign * leg.notional * dt
                        self._float_events.append(
                            (row, date, coef, lreq, nreq, asset)
                        )
                        if leg.pays_notional and idx == last:
                            self._fixed_events.append(
                                (row, date, sign * leg.notional, nreq)
                            )

    def _event_chunk(self, num_paths: int) -> int:
        itemsize = jnp.dtype(real_dtype()).itemsize
        return max(1, self.CASHFLOW_CHUNK_BYTES // max(1, num_paths * itemsize))

    def _event_rows(self, tables, fixed_evs, float_evs):
        """Pathwise normalized cashflow rows for explicit event lists.

        Returns (prod_rows [E], rows [E, N]) accumulated in event chunks.
        """
        n = tables.num_paths
        chunk = self._event_chunk(n)
        prod_rows = []
        pieces = []
        for lo in range(0, len(fixed_evs), chunk):
            evs = fixed_evs[lo:lo + chunk]
            tidx = np.array([self.time_to_index[e[1]] for e in evs])
            times = np.array([e[1] for e in evs])
            handles = [e[3].handle for e in evs]
            num = tables.request_rows(
                AtomicRequestType.NUMERAIRE, "numeraire", tidx, times,
                np.zeros_like(times), handles,
            )
            amounts = asarray([e[2] for e in evs])
            pieces.append(amounts[:, None] / num)
            prod_rows.extend(e[0] for e in evs)
        by_asset = defaultdict(list)
        for e in float_evs:
            by_asset[e[5]].append(e)
        for a, evs_a in sorted(by_asset.items()):
            for lo in range(0, len(evs_a), chunk):
                evs = evs_a[lo:lo + chunk]
                tidx = np.array([self.time_to_index[e[1]] for e in evs])
                times = np.array([e[1] for e in evs])
                num = tables.request_rows(
                    AtomicRequestType.NUMERAIRE, "numeraire", tidx, times,
                    np.zeros_like(times), [e[4].handle for e in evs],
                )
                t1s = np.array([e[3].time1 for e in evs])
                t2s = np.array([e[3].time2 for e in evs])
                libor = tables.request_rows(
                    AtomicRequestType.LIBOR_RATE, a, tidx, t1s, t2s,
                    [e[3].handle for e in evs],
                )
                coefs = asarray([e[2] for e in evs])
                pieces.append(coefs[:, None] * libor / num)
                prod_rows.extend(e[0] for e in evs)
        if not pieces:
            return np.zeros(0, dtype=int), jnp.zeros((0, n), dtype=real_dtype())
        return np.array(prod_rows), jnp.concatenate(pieces, axis=0)

    def cashflows(self, tables) -> jnp.ndarray:
        """[P, N] total normalized cashflows per product."""
        P = len(self.products)
        prod_rows, rows = self._event_rows(
            tables, self._fixed_events, self._float_events
        )
        return jax.ops.segment_sum(
            rows, jnp.asarray(prod_rows), num_segments=P
        )

    def fit_exposure(self, tables, ctx) -> None:
        """Future-cashflow exposure regression on the internal exposure grid.

        The base class masks by terminal maturity — correct only for
        single-cashflow products.  Coupons need the STRICTLY-FUTURE window
        per date: descending over the exposure grid, events enter the
        running [Pc, N] future-cashflow accumulator at the last grid date
        before their pay date, and each date's RHS is a fixed-tree
        contraction of the weighted basis against the accumulator — the
        same O(T x deg x P x N) as the base einsum, bitwise shard-invariant.
        """
        regfn = ctx.regression_function
        deg = regfn.get_degree()
        assets = self.explanatory_assets()
        P = len(self.products)
        t_grid = np.array(ctx.exposure_timeline)
        T = len(t_grid)
        n = tables.num_paths
        chunk = max(1, self._cashflow_chunk(n))

        by_asset = defaultdict(list)
        for p_idx, a in enumerate(assets):
            by_asset[a].append(p_idx)

        coeffs_all = jnp.zeros((T, P, deg), dtype=real_dtype())
        for a, p_rows in by_asset.items():
            p_rows = np.array(p_rows)
            expl, numeraire = self._exposure_grid_obs(tables, ctx, a)
            gram, col_scale, y = self._exposure_gram(expl, deg)
            local = {int(g): i for i, g in enumerate(p_rows)}
            rhs = jnp.zeros((T, deg, len(p_rows)), dtype=real_dtype())
            for lo in range(0, len(p_rows), chunk):
                rows_c = set(int(g) for g in p_rows[lo:lo + chunk])
                Pc = len(rows_c)
                col0 = lo
                # bucket this chunk's events by the last grid date strictly
                # before their pay date (event lives at all t <= k_e)
                fixed_b = defaultdict(list)
                float_b = defaultdict(list)
                for e in self._fixed_events:
                    if e[0] in rows_c:
                        k_e = int(np.searchsorted(t_grid, e[1], side="left")) - 1
                        if k_e >= 0:
                            fixed_b[k_e].append(e)
                for e in self._float_events:
                    if e[0] in rows_c:
                        k_e = int(np.searchsorted(t_grid, e[1], side="left")) - 1
                        if k_e >= 0:
                            float_b[k_e].append(e)
                cf_future = jnp.zeros((Pc, n), dtype=real_dtype())
                for t in range(T - 1, -1, -1):
                    fe, le = fixed_b.get(t, []), float_b.get(t, [])
                    if fe or le:
                        ev_rows, ev_vals = self._event_rows(tables, fe, le)
                        seg = np.array(
                            [local[int(r)] - col0 for r in ev_rows]
                        )
                        cf_future = cf_future + jax.ops.segment_sum(
                            ev_vals, jnp.asarray(seg), num_segments=Pc
                        )
                    w = numeraire[t]
                    for d in range(deg):
                        if d:
                            w = w * y[t]
                        rhs = rhs.at[t, d, col0:col0 + Pc].set(
                            fixed_tree_sum(w[None, :] * cf_future, axis=1)
                        )
            sol = jnp.linalg.solve(gram, rhs)                  # [T, deg, Pa]
            sol = sol / col_scale[:, :, None]
            coeffs_all = coeffs_all.at[:, p_rows, :].set(jnp.swapaxes(sol, 1, 2))
        self._exp_coeffs = coeffs_all


BATCH_CLASSES = [
    EuropeanEquityBatch,
    BinaryBatch,
    BasketBatch,
    AsianBatch,
    BarrierBatch,
    ExerciseEquityBatch,
    CouponBatch,
]


def plan_batches(products, product_to_ns_idx, time_to_index, regression_function):
    """Partition products into batched groups and per-product leftovers.

    Returns (batches, batched_product_ids).
    """
    groups: Dict[tuple, List[int]] = defaultdict(list)
    group_cls: Dict[tuple, type] = {}
    for idx, product in enumerate(products):
        for cls in BATCH_CLASSES:
            if cls.accepts(product):
                key = (cls.__name__,) + tuple(cls.group_key(product))
                groups[key].append(idx)
                group_cls[key] = cls
                break

    batches = []
    batched_ids = set()
    for key, indices in groups.items():
        cls = group_cls[key]
        prods = [products[i] for i in indices]
        ns_idx = np.array([product_to_ns_idx[i] for i in indices])
        if cls is ExerciseEquityBatch:
            batch = cls(prods, ns_idx, time_to_index, regression_function)
        else:
            batch = cls(prods, ns_idx, time_to_index)
        batches.append(batch)
        batched_ids.update(id(products[i]) for i in indices)
    return batches, batched_ids

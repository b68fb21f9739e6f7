"""Streaming metric pipeline: exposure, netting and metric reductions in-scan.

The round-4 scale analysis (BENCH_NOTES "Forward-only scale") showed the
8M-path north-star exposure book missing a 16GB chip NOT because of the path
state, but because the pipeline materialised every request row ([rows, N] =
10.7GB at 342 rows) and per-product [T_exp, N] exposure stacks.  The
reference has the same shape (engine.py:63 materialises the full state plane;
request_interface.py:122 slices it per request) — its scale ceiling.

This module removes the per-date materialisation entirely: the engine's
``fold`` hook (engine.simulate_paths) consumes each timeline point's request
rows IMMEDIATELY inside the ``lax.scan``:

  * per-product regression exposures (Horner on the presim-fitted continuation
    coefficients) are evaluated against the point's spot/numeraire rows and
    summed into a netted [n_ns, N] row — which lives only for that step;
  * MPoR collateral rows are stashed into a tiny ring buffer (R = max number
    of delayed rows simultaneously in flight, typically 1-2) carried through
    the scan;
  * metric reductions happen per date: EPE/ENE/CE/EEPE fixed-tree means,
    PFE order statistics via in-scan bisection (ops/quantile — count
    reductions only), and the CVA pathwise accumulator
    ``acc += E+(t_k) S(0,t_k)(1 - S(t_k,t_{k+1}))`` fed by the survival rows
    resolved at the same point.

Residents are therefore O(N): the path state, the stash, one [N] CVA
accumulator per CVA metric, and [T_metric, n_ns] scalar tables — nothing of
shape [rows, N] or [T, N].  All reductions ride :func:`fixed_tree_sum`
(pairwise halving) and integer counts, so results are bitwise identical under
any path-axis sharding, matching the engine's determinism contract.

Eligibility (see :func:`metric_stream_ineligibility`): exposure-profile books
(no PV metric) whose products all have single-state regression exposures —
the CVA/EPE/PFE book class the 16M-path north star targets.  Everything else
falls back to the materialising pipeline.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from montecarlo_risk_engine_tpu.config import asarray, real_dtype
from montecarlo_risk_engine_tpu.metrics.metrics import (
    MetricType,
    fixed_tree_sum,
    mc_mean_and_error,
)
from montecarlo_risk_engine_tpu.requests import AtomicRequestType

_STREAM_METRICS = {
    MetricType.CE, MetricType.EPE, MetricType.ENE,
    MetricType.EEPE, MetricType.PFE, MetricType.CVA,
}

# Budget for the [P_chunk, N] temporaries of the in-scan exposure evaluation.
EXPOSURE_CHUNK_BYTES = 256 * 2**20


def metric_stream_ineligibility(controller) -> Optional[str]:
    """None if the book can run the streaming metric pipeline, else a reason.

    Requires: an emission schedule (streaming engine), no fused-kernel path,
    an exposure-only metric set from the supported family, and regression
    exposures (single-state, no early exercise) for every product.
    """
    rm = controller.risk_metrics
    if controller._emission_schedule is None:
        return "streaming engine off (no emission schedule)"
    if controller._pallas_active:
        return "fused kernel path active"
    if not rm.requires_exposure_profiles():
        return "no exposure profiles requested"
    if rm.requires_discounted_cashflows():
        return "PV metric requires pathwise cashflow accumulation"
    unsupported = {m.metric_type for m in rm.metrics} - _STREAM_METRICS
    if unsupported:
        return f"unsupported metric types {sorted(t.name for t in unsupported)}"
    if controller.num_paths_presim <= 0:
        return "regression exposures need presim paths"
    for p in controller.products:
        if len(p.regression_timeline) > 0:
            return f"{type(p).__name__} has early-exercise regression dates"
        if p.get_num_states() != 1:
            return f"{type(p).__name__} carries a non-trivial exercise state"
        if not controller._product_requires_regression(p):
            return f"{type(p).__name__} uses the analytic exposure path"
    buckets, singles, _ = controller._exercise_scan_groups()
    if buckets or singles:
        return "book contains exercise-scan products"
    for batch in controller._batches:
        if not hasattr(batch, "fit_exposure"):
            return f"{type(batch).__name__} has no exposure-fit path"
        if getattr(batch, "use_analytic_exposure", False):
            return f"{type(batch).__name__} uses analytic exposures"
    sched = controller._emission_schedule
    if sched.ambiguous_kinds:
        return "ambiguous request kinds in the emission schedule"
    return None


def _greedy_slots(intervals: List[Tuple[int, int, int]]):
    """Assign ring-buffer slots to [start, end] live intervals (keyed by id).

    Returns (num_slots, {key: slot}).  Greedy interval colouring on the
    internal-exposure-index axis: the number of slots equals the maximum
    number of delayed collateral rows simultaneously in flight.
    """
    slot_of: Dict[int, int] = {}
    free: List[int] = []
    n_slots = 0
    active: List[Tuple[int, int]] = []  # (end, slot)
    for start, end, key in sorted(intervals):
        still_active = []
        for a_end, a_slot in active:
            if a_end < start:
                free.append(a_slot)
            else:
                still_active.append((a_end, a_slot))
        active = still_active
        if free:
            slot = free.pop()
        else:
            slot = n_slots
            n_slots += 1
        slot_of[key] = slot
        active.append((end, slot))
    return n_slots, slot_of


class MetricStreamExecutor:
    """Host-side tables + the traced fold for the streaming metric pipeline.

    Built once per controller (after the request plan and emission schedule
    exist); :meth:`run` is called inside the traced pipeline with the
    presim-fitted exposure coefficients.
    """

    def __init__(self, controller):
        self.c = controller
        sched = controller._emission_schedule
        self.schedule = sched
        self.n_points = len(controller.simulation_timeline)
        self.exposure_timeline = controller.exposure_timeline          # internal
        self.t_exp = len(self.exposure_timeline)
        self.t_m = len(controller.metric_exposure_timeline)
        self.n_ns = len(controller.netting_sets)
        self.num_paths = controller.num_paths_mainsim

        time_to_point = {t: i for i, t in enumerate(controller.simulation_timeline)}

        # point -> internal exposure index
        exp_idx = np.full(self.n_points, -1, dtype=np.int32)
        for j, t in enumerate(self.exposure_timeline):
            exp_idx[time_to_point[t]] = j
        self.exp_idx_tab = exp_idx
        # internal exposure index -> metric date index
        metric_of_exp = np.full(self.t_exp, -1, dtype=np.int32)
        for i, j in enumerate(controller.metric_exposure_indices):
            metric_of_exp[int(j)] = i
        self.metric_of_exp = metric_of_exp

        # -- emission-row series: (group index, per-point k-slot table) -----
        self._group_of: Dict[Tuple[str, AtomicRequestType], int] = {}

        def series(asset_id, kind):
            g_idx = None
            slots = np.full(self.n_points, -1, dtype=np.int32)
            for p in range(self.n_points):
                h = sched.kind_lookup.get((p, asset_id, kind))
                if h is None:
                    continue
                gi, flat = sched.handle_loc[h]
                if g_idx is None:
                    g_idx = gi
                assert gi == g_idx, "series spans multiple emission groups"
                slots[p] = flat - p * sched.groups[gi].K
            if g_idx is None:
                raise KeyError(f"no emission rows for ({asset_id}, {kind})")
            return g_idx, slots

        self.numeraire_series = series("numeraire", AtomicRequestType.NUMERAIRE)

        # -- product tables, ns-sorted for fixed-order netting --------------
        _, _, plain = controller._exercise_scan_groups()
        prods: List = list(plain)
        prod_sources: List[Tuple[str, object]] = [("plain", p) for p in plain]
        ns_of: List[int] = [
            controller.product_to_netting_set_idx[p.product_id] for p in plain
        ]
        asset_of: List[str] = [p.asset_ids[0] for p in plain]
        for batch in controller._batches:
            for col, p in enumerate(batch.products):
                prods.append(p)
                prod_sources.append(("batch", (batch, col)))
                ns_of.append(int(batch.ns_idx[col]))
            asset_of.extend(batch.explanatory_assets())
        self.n_products = len(prods)
        assert self.n_products == len(controller.products)

        perm = np.argsort(np.asarray(ns_of, dtype=np.int64), kind="stable")
        self.perm = perm
        self._prod_sources = [prod_sources[i] for i in perm]
        ns_sorted = np.asarray(ns_of, dtype=np.int64)[perm]
        self.ns_sorted = ns_sorted

        self.assets = sorted({a for a in asset_of})
        self.spot_series = [
            series(a, AtomicRequestType.SPOT) for a in self.assets
        ]
        a_index = {a: i for i, a in enumerate(self.assets)}
        self.asset_idx_sorted = np.asarray(
            [a_index[asset_of[i]] for i in perm], dtype=np.int32
        )

        # product chunks aligned to the byte budget; ns ranges inside each
        # chunk are host-known so netting is a fixed-order accumulation
        itemsize = jnp.dtype(real_dtype()).itemsize
        chunk = max(1, EXPOSURE_CHUNK_BYTES // max(1, self.num_paths * itemsize))
        self.chunks = [
            (lo, min(lo + chunk, self.n_products))
            for lo in range(0, self.n_products, chunk)
        ]

        # -- netting-set statics --------------------------------------------
        self.thresholds = np.asarray(
            [ns.threshold for ns in controller.netting_sets], dtype=np.float64
        )
        self.is_coll = np.asarray(
            [ns.is_collateralized() for ns in controller.netting_sets], dtype=bool
        )

        # -- MPoR collateral stash ------------------------------------------
        delayed = controller.netting_set_delayed_exposure_indices  # [n_ns][T_m]
        sources: Dict[int, int] = {}  # internal exp idx -> last consumer exp idx
        for ns_i in range(self.n_ns):
            for i in range(self.t_m):
                d = int(delayed[ns_i][i])
                if d >= 0:
                    consumer = int(controller.metric_exposure_indices[i])
                    sources[d] = max(sources.get(d, d), consumer)
        self.n_slots, slot_of = _greedy_slots(
            [(d, end, d) for d, end in sources.items()]
        )
        stash_src = np.full(self.t_exp, -1, dtype=np.int32)
        for d, slot in slot_of.items():
            stash_src[d] = slot
        self.stash_src_tab = stash_src
        read_slot = np.full((self.t_m, self.n_ns), -1, dtype=np.int32)
        for ns_i in range(self.n_ns):
            for i in range(self.t_m):
                d = int(delayed[ns_i][i])
                if d >= 0:
                    read_slot[i, ns_i] = slot_of[d]
        self.read_slot_tab = read_slot

        # -- metric bookkeeping ---------------------------------------------
        metrics = controller.risk_metrics.metrics
        self.need_pos = any(
            m.metric_type in {MetricType.CE, MetricType.EPE, MetricType.EEPE}
            for m in metrics
        )
        self.need_neg = any(m.metric_type == MetricType.ENE for m in metrics)
        self.pfe_metrics = []  # (metric, ks sorted, pos map, se_ks, q_index)
        for m in metrics:
            if m.metric_type != MetricType.PFE:
                continue
            import math

            n = self.num_paths
            q_index = int(math.ceil(m.quantile * n)) - 1
            if m.pfe_se == "order-statistic":
                se_ks = m._bracket_indices(n)
            else:
                se_ks = (max(q_index - 1, 0), min(q_index + 1, n - 1))
            ks = sorted({se_ks[0], q_index, se_ks[1]})
            pos = {k: i for i, k in enumerate(ks)}
            self.pfe_metrics.append((m, ks, pos, se_ks, q_index))
        self.cva_metrics = []  # (metric, match mask, surv series, cond series)
        for m in metrics:
            if m.metric_type != MetricType.CVA:
                continue
            match = np.asarray([
                ns.counterparty_id is None or ns.counterparty_id == m.counterparty_id
                for ns in controller.netting_sets
            ])
            surv = series(m.counterparty_id, AtomicRequestType.SURVIVAL_PROBABILITY)
            cond = series(
                m.counterparty_id,
                AtomicRequestType.CONDITIONAL_SURVIVAL_PROBABILITY,
            )
            self.cva_metrics.append((m, match, surv, cond))

    # -- traced pieces ------------------------------------------------------

    def _constrain(self, x):
        sharding = self.c.path_sharding
        if sharding is None:
            return x
        from jax.sharding import NamedSharding, PartitionSpec

        spec = PartitionSpec(*([None] * (x.ndim - 1) + ["paths"]))
        return jax.lax.with_sharding_constraint(
            x, NamedSharding(sharding.mesh, spec)
        )

    def _init_aux(self):
        dtype = real_dtype()
        n = self.num_paths
        aux = {}
        if self.n_slots:
            aux["stash"] = self._constrain(
                jnp.zeros((self.n_slots, self.n_ns, n), dtype=dtype)
            )
        if self.cva_metrics:
            aux["cva"] = self._constrain(
                jnp.zeros((len(self.cva_metrics), self.n_ns, n), dtype=dtype)
            )
        if self.need_pos:
            aux["pos"] = jnp.zeros((self.t_m, self.n_ns, 2), dtype=dtype)
        if self.need_neg:
            aux["neg"] = jnp.zeros((self.t_m, self.n_ns, 2), dtype=dtype)
        for idx, (_, ks, _, _, _) in enumerate(self.pfe_metrics):
            aux[f"pfe{idx}"] = jnp.zeros(
                (self.t_m, self.n_ns, len(ks)), dtype=dtype
            )
        return aux

    def _row(self, ys, series_pair, point_idx):
        g_idx, slots = series_pair
        slot = jnp.clip(jnp.asarray(slots)[point_idx], 0, None)
        return jnp.take(ys[g_idx], slot, axis=0)

    def _apply_threshold(self, rows):
        """Vectorised NettingSet.apply_threshold over [n_ns, N] rows."""
        thr = asarray(self.thresholds)[:, None]
        return jnp.where(
            rows > thr, rows - thr,
            jnp.where(rows < -thr, rows + thr, jnp.zeros_like(rows)),
        )

    def _netted_row(self, ys, point_idx, exp_j, coeffs_all):
        """Netted exposure [n_ns, N] at internal exposure index ``exp_j``.

        Fixed-order (host-unrolled) accumulation over ns-sorted product
        chunks: bitwise shard-invariant, peak temp one [P_chunk, N] block."""
        numeraire = self._row(ys, self.numeraire_series, point_idx)
        spot_rows = jnp.stack(
            [self._row(ys, s, point_idx) for s in self.spot_series]
        )
        per_ns = [None] * self.n_ns
        for lo, hi in self.chunks:
            coeffs_c = jnp.take(coeffs_all[:, lo:hi], exp_j, axis=0)  # [Pc, deg]
            spots_c = spot_rows[self.asset_idx_sorted[lo:hi]]         # [Pc, N]
            deg = coeffs_c.shape[-1]
            cont = jnp.broadcast_to(
                coeffs_c[:, deg - 1:deg], spots_c.shape
            )
            for k in range(deg - 2, -1, -1):
                cont = cont * spots_c + coeffs_c[:, k:k + 1]
            expo = cont / numeraire
            # host-known ns ranges inside the chunk
            seg = self.ns_sorted[lo:hi]
            starts = np.flatnonzero(np.diff(seg, prepend=seg[0] - 1))
            ends = np.append(starts[1:], len(seg))
            for s, e in zip(starts, ends):
                ns_i = int(seg[s])
                part = fixed_tree_sum(expo[int(s):int(e)])
                per_ns[ns_i] = part if per_ns[ns_i] is None else per_ns[ns_i] + part
        zero = jnp.zeros((self.num_paths,), dtype=real_dtype())
        netted = jnp.stack([zero if r is None else r for r in per_ns])
        return self._constrain(netted)

    def _on_metric(self, aux, netted, m_i, ys, point_idx):
        n = self.num_paths
        # unsecured exposure (NettingSet.compute_unsecured_exposure_profiles):
        # collateralised -> raw netted minus thresholded delayed row;
        # uncollateralised -> thresholded netted
        if self.n_slots:
            slots = jnp.take(
                jnp.asarray(self.read_slot_tab), m_i, axis=0
            )                                                   # [n_ns]
            stashed = jnp.take_along_axis(
                aux["stash"], jnp.clip(slots, 0, None)[None, :, None], axis=0
            )[0]
            collat = jnp.where(
                slots[:, None] >= 0, self._apply_threshold(stashed), 0.0
            )
        else:
            collat = 0.0
        is_coll = jnp.asarray(self.is_coll)[:, None]
        unsec = jnp.where(
            is_coll, netted - collat, self._apply_threshold(netted)
        )
        # One canonical unsecured row for every metric consumer (see the
        # identical barrier in controller._evaluate_netting_set).
        unsec = jax.lax.optimization_barrier(unsec)

        def date_stats(rows):
            mean, err = mc_mean_and_error(jnp.swapaxes(rows, 0, 1))
            return jnp.stack([mean, err], axis=-1)              # [n_ns, 2]

        if self.need_pos:
            aux["pos"] = jax.lax.dynamic_update_index_in_dim(
                aux["pos"], date_stats(jnp.maximum(unsec, 0.0)), m_i, axis=0
            )
        if self.need_neg:
            aux["neg"] = jax.lax.dynamic_update_index_in_dim(
                aux["neg"], date_stats(-jnp.maximum(-unsec, 0.0)), m_i, axis=0
            )
        if self.pfe_metrics:
            from montecarlo_risk_engine_tpu.ops.quantile import (
                order_statistics_bisect,
            )

            for idx, (_, ks, _, _, _) in enumerate(self.pfe_metrics):
                stats = order_statistics_bisect(unsec, ks)       # [K, n_ns]
                aux[f"pfe{idx}"] = jax.lax.dynamic_update_index_in_dim(
                    aux[f"pfe{idx}"], stats.T, m_i, axis=0
                )
        for c_idx, (m, match, surv_s, cond_s) in enumerate(self.cva_metrics):
            g_idx, slots = surv_s
            valid = jnp.asarray(slots)[point_idx] >= 0
            surv = self._row(ys, surv_s, point_idx)
            cond = self._row(ys, cond_s, point_idx)
            contrib = jnp.maximum(unsec, 0.0) * (surv * (1.0 - cond))
            mask = valid & jnp.asarray(match)[:, None]
            aux["cva"] = aux["cva"].at[c_idx].add(
                jnp.where(mask, contrib, 0.0)
            )
        return aux

    def fold_update(self, coeffs_all):
        """The per-point consumer closed over the traced coefficients."""

        def update(point_idx, ys, state, aux):
            exp_j = jnp.asarray(self.exp_idx_tab)[point_idx]

            def on_exposure(aux):
                j = jnp.clip(exp_j, 0, None)
                netted = self._netted_row(ys, point_idx, j, coeffs_all)
                if self.n_slots:
                    slot = jnp.asarray(self.stash_src_tab)[j]
                    written = jax.lax.dynamic_update_index_in_dim(
                        aux["stash"], netted, jnp.clip(slot, 0, None), axis=0
                    )
                    aux["stash"] = self._constrain(jnp.where(
                        slot >= 0, written, aux["stash"]
                    ))
                m_i = jnp.asarray(self.metric_of_exp)[j]
                return jax.lax.cond(
                    m_i >= 0,
                    lambda a: self._on_metric(
                        a, netted, jnp.clip(m_i, 0, None), ys, point_idx
                    ),
                    lambda a: a,
                    aux,
                )

            return jax.lax.cond(exp_j >= 0, on_exposure, lambda a: a, aux)

        return update

    # -- assembly -----------------------------------------------------------

    def assemble(self, aux):
        """Nested [ns][metric] -> [(value, err), ...] results from the fold
        accumulators, replicating each metric's exact formulas
        (metrics/metrics.py) and the controller's CVA counterparty gate."""
        c = self.c
        nested = []
        for ns_idx, ns in enumerate(c.netting_sets):
            ns_results = []
            for metric in c.risk_metrics.metrics:
                mt = metric.metric_type
                if mt == MetricType.CE:
                    ns_results.append([
                        (aux["pos"][0, ns_idx, 0], aux["pos"][0, ns_idx, 1])
                    ])
                elif mt == MetricType.EPE:
                    ns_results.append([
                        (aux["pos"][i, ns_idx, 0], aux["pos"][i, ns_idx, 1])
                        for i in range(self.t_m)
                    ])
                elif mt == MetricType.ENE:
                    ns_results.append([
                        (aux["neg"][i, ns_idx, 0], aux["neg"][i, ns_idx, 1])
                        for i in range(self.t_m)
                    ])
                elif mt == MetricType.EEPE:
                    per_date_ee = aux["pos"][:, ns_idx, 0]
                    if getattr(metric, "effective", False):
                        per_date_ee = jax.lax.cummax(per_date_ee)
                    ns_results.append([mc_mean_and_error(per_date_ee)])
                elif mt == MetricType.PFE:
                    p_idx = next(
                        i for i, (m, *_rest) in enumerate(self.pfe_metrics)
                        if m is metric
                    )
                    _, ks, pos, se_ks, q_index = self.pfe_metrics[p_idx]
                    tab = aux[f"pfe{p_idx}"][:, ns_idx]          # [T_m, K]
                    rows = []
                    for i in range(self.t_m):
                        lo = tab[i, pos[se_ks[0]]]
                        val = tab[i, pos[q_index]]
                        hi = tab[i, pos[se_ks[1]]]
                        if metric.pfe_se == "order-statistic":
                            err = (hi - lo) / 2.0
                        else:
                            err = metric._quantile_se(
                                lo, val, hi, self.num_paths, q_index
                            )
                        rows.append((val, err))
                    ns_results.append(rows)
                elif mt == MetricType.CVA:
                    if (
                        ns.counterparty_id is not None
                        and metric.counterparty_id != ns.counterparty_id
                    ):
                        ns_results.append(c._zero_metric_result(metric))
                        continue
                    c_idx = next(
                        i for i, (m, *_rest) in enumerate(self.cva_metrics)
                        if m is metric
                    )
                    pathwise = aux["cva"][c_idx, ns_idx] * (
                        1.0 - metric.recovery_rate
                    )
                    ns_results.append([mc_mean_and_error(pathwise)])
                else:  # pragma: no cover - guarded by eligibility
                    raise AssertionError(f"unsupported metric {mt}")
            nested.append(ns_results)
        return nested

    # -- coefficients -------------------------------------------------------

    def gather_coeffs(self):
        """[T_exp, P, deg] continuation coefficients in ns-sorted product
        order, stitched from the presim fits (plain products'
        ``_exposure_reg_coeffs`` and each batch's ``_exp_coeffs``)."""
        cols = []
        for kind, ref in self._prod_sources:
            if kind == "plain":
                cols.append(self.c._exposure_reg_coeffs[ref.product_id][:, 0, :])
            else:
                batch, col = ref
                cols.append(batch._exp_coeffs[:, col, :])
        return jnp.stack(cols, axis=1)

    # -- entry point --------------------------------------------------------

    def run(self, params):
        from montecarlo_risk_engine_tpu import rng
        from montecarlo_risk_engine_tpu.engine.engine import simulate_paths

        c = self.c
        coeffs_all = self.gather_coeffs()
        aux = simulate_paths(
            c.model, params, c.simulation_scheme, c.simulation_timeline,
            c.num_paths_mainsim, c.num_steps, rng.PHASE_MAINSIM,
            root_seed=c.root_seed, path_sharding=c.path_sharding,
            antithetic=c.antithetic, remat=c.remat_paths,
            sampler=c.sampler, qmc_bridge=c.qmc_bridge,
            emit_schedule=self.schedule, collect_states=False,
            fold=(self._init_aux(), self.fold_update(coeffs_all)),
        )
        return self.assemble(aux)

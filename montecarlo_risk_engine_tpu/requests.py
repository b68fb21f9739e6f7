"""Observable requests: declaration, static deduplication, traced resolution.

Counterpart of the reference's ``src/request_interface/`` package
(request_types.py:10-68, request_interface.py:9-130), with one structural
change for the TPU design: deduplication and handle assignment run entirely at
*setup time* on the host, producing a static "observable schedule".  During
the jit trace, :meth:`RequestPlan.resolve` turns the schedule plus the scanned
path states into a flat list of arrays indexed by handle — handles become
static gather indices inside the compiled program (SURVEY.md §7.1).
"""

from __future__ import annotations

import enum
from collections import defaultdict
from typing import Dict, List, Optional, Sequence, Tuple

import jax.numpy as jnp


class AtomicRequestType(enum.Enum):
    SPOT = 1
    DISCOUNT_FACTOR = 2
    NUMERAIRE = 3
    FORWARD_RATE = 4
    LIBOR_RATE = 5
    SURVIVAL_PROBABILITY = 6
    CONDITIONAL_SURVIVAL_PROBABILITY = 7


class AtomicRequest:
    """A single model observable at a simulation time point.

    Hashable on (type, id, time1, time2) with a mutable integer ``handle``
    assigned during deduplication (reference request_types.py:19-43).
    """

    __slots__ = ("request_type", "id", "time1", "time2", "handle")

    def __init__(
        self,
        request_type: AtomicRequestType,
        time1: Optional[float] = None,
        time2: Optional[float] = None,
        id: Optional[int] = None,
    ):
        self.request_type = request_type
        self.id = id
        self.time1 = None if time1 is None else float(time1)
        self.time2 = None if time2 is None else float(time2)
        self.handle: Optional[int] = None

    def set_handle(self, idx: int) -> None:
        self.handle = idx

    def key(self):
        return (self.request_type, self.id, self.time1, self.time2)

    def __eq__(self, other):
        return isinstance(other, AtomicRequest) and self.key() == other.key()

    def __hash__(self):
        return hash(self.key())

    def __repr__(self):
        return f"AtomicRequest({self.request_type.name}, t1={self.time1}, t2={self.time2})"


class UnderlyingRequest:
    """Composite request wrapping a Product observed at a date
    (reference request_types.py:45-68)."""

    def __init__(self, underlying_asset):
        self.underlying_asset = underlying_asset

    def set_handle(self, idx: int) -> None:
        self.underlying_asset.composite_req_handle = idx

    def get_handle(self) -> int:
        return self.underlying_asset.composite_req_handle

    def get_atomic_requests(self):
        return self.underlying_asset.get_atomic_requests_for_underlying()

    def get_value(self, resolved_atomic_requests):
        return self.underlying_asset.get_value(resolved_atomic_requests)

    def key(self):
        return self.underlying_asset

    def __eq__(self, other):
        return isinstance(other, UnderlyingRequest) and self.key() == other.key()

    def __hash__(self):
        return hash(self.key())



def _underlying_order(req: "UnderlyingRequest"):
    ua = req.underlying_asset
    return (
        type(ua).__name__,
        tuple(getattr(ua, "asset_ids", ()) or ()),
        tuple(float(t) for t in getattr(ua, "modeling_timeline", ()) or ()),
    )


def _req_order(req: "AtomicRequest"):
    """Deterministic sort key for hash-ordered request sets.

    AtomicRequest hashes include strings, so set iteration order follows
    PYTHONHASHSEED — which permutes the traced op order across processes and
    breaks the persistent compilation cache (identical runs produced
    different cache keys; see docs/TUNING.md).
    """
    return (
        req.request_type.value,
        -1.0 if req.time1 is None else float(req.time1),
        -1.0 if req.time2 is None else float(req.time2),
    )

class EmissionGroup:
    """Static per-(asset, kind) emission table for the streaming engine.

    ``K`` is the max number of same-kind requests at any single time point;
    ``t1_tab``/``t2_tab`` are dense [num_points, K] host arrays scanned as
    per-step inputs.  Padding rows repeat the group's first request times
    (benign arguments — their outputs are never gathered).
    """

    __slots__ = ("asset_id", "kind", "K", "t1_tab", "t2_tab")

    def __init__(self, asset_id, kind, K, t1_tab, t2_tab):
        self.asset_id = asset_id
        self.kind = kind
        self.K = K
        self.t1_tab = t1_tab
        self.t2_tab = t2_tab


class EmissionSchedule:
    """Observable schedule for in-scan request resolution (SURVEY.md §5.7).

    The reference materialises every path state and slices per time index
    afterwards (engine.py:63, request_interface.py:122) — its memory
    bottleneck at scale.  Here resolution happens INSIDE the path scan from
    these static tables, so the engine emits only O(request rows × paths)
    instead of O(T × state_dim × paths).
    """

    def __init__(self, groups, handle_loc, kind_lookup, num_points,
                 ambiguous_kinds=frozenset()):
        self.groups: List[EmissionGroup] = groups
        # handle -> (group_idx, flat_row) with flat_row = time_idx * K + k
        self.handle_loc: Dict[int, Tuple[int, int]] = handle_loc
        # (time_idx, asset_id, kind) -> handle (absent when ambiguous)
        self.kind_lookup: Dict[Tuple[int, str, AtomicRequestType], int] = kind_lookup
        # keys dropped from kind_lookup because several requests share the
        # same (time_idx, asset, kind) with different (t1, t2) — consumers
        # raise a diagnosable error instead of a misleading KeyError
        self.ambiguous_kinds = frozenset(ambiguous_kinds)
        self.num_points = num_points

    def num_emitted_rows(self) -> int:
        return sum(self.num_points * g.K for g in self.groups)


class RequestPlan:
    """Collects, deduplicates and indexes all requests; resolves them under jit.

    Mirrors reference RequestInterface (request_interface.py:22-130): requests
    from (a) product underlying/composite requests, (b) product atomic
    requests, (c) controller/metric exposure requests, deduped per
    (time_index, asset_id, request-key) with dense integer handles.
    """

    def __init__(self, model):
        self.model = model
        self.num_atomic_requests = 0
        self.num_composite_requests = 0
        # (time_idx, asset_id) -> set of AtomicRequest
        self.atomic_by_label: Dict[Tuple[int, str], set] = defaultdict(set)
        # time_idx -> set of UnderlyingRequest
        self.composite_by_time: Dict[int, set] = defaultdict(set)

    # -- collection -------------------------------------------------------

    def collect_and_index_requests(
        self,
        products: Sequence,
        simulation_timeline: Sequence[float],
        exposure_requests: Dict[Tuple[float, str], set],
        exposure_timeline: Sequence[float],
    ) -> None:
        time_to_index = {float(t): idx for idx, t in enumerate(simulation_timeline)}
        atomic_handles: Dict[tuple, int] = {}
        composite_handles: Dict[tuple, int] = {}

        def register_atomic(req: AtomicRequest, time_idx: int, asset_id: str) -> None:
            key = (time_idx, asset_id, req)
            if key not in atomic_handles:
                atomic_handles[key] = len(atomic_handles)
            req.set_handle(atomic_handles[key])
            self.atomic_by_label[(time_idx, asset_id)].add(req)

        def register_composite(req: UnderlyingRequest, time_idx: int) -> None:
            key = (time_idx, req)
            if key not in composite_handles:
                composite_handles[key] = len(composite_handles)
            req.set_handle(composite_handles[key])
            self.composite_by_time[time_idx].add(req)

        for prod in products:
            # Composite (underlying) requests and the atomics they imply
            # (reference request_interface.py:41-58).
            for local_t, und_reqs in prod.get_underlying_requests().items():
                time_idx = time_to_index[float(prod.modeling_timeline[local_t])]
                for und_req in sorted(und_reqs, key=_underlying_order):
                    register_composite(und_req, time_idx)
                    for label, reqs in und_req.get_atomic_requests().items():
                        asset_id = label[1]
                        for req in sorted(reqs, key=_req_order):
                            register_atomic(req, time_idx, asset_id)

            # The product's own atomic requests (request_interface.py:61-74).
            for (local_t, asset_id), reqs in prod.get_atomic_requests().items():
                time_idx = time_to_index[float(prod.modeling_timeline[local_t])]
                for req in sorted(reqs, key=_req_order):
                    register_atomic(req, time_idx, asset_id)

        # Controller/metric exposure requests (request_interface.py:77-92).
        # Keys are (time-or-index, asset_id); integer keys index the metric
        # exposure timeline, float keys are absolute times.
        for (t, asset_id), reqs in exposure_requests.items():
            if isinstance(t, int):
                exposure_time = float(exposure_timeline[t])
            else:
                exposure_time = float(t)
            time_idx = time_to_index[exposure_time]
            for req in sorted(reqs, key=_req_order):
                register_atomic(req, time_idx, asset_id)

        self.num_atomic_requests = len(atomic_handles)
        self.num_composite_requests = len(composite_handles)

    # -- streaming emission schedule --------------------------------------

    def build_emission_schedule(self, num_points: int) -> EmissionSchedule:
        """Static per-step resolution tables for the streaming engine."""
        import numpy as np

        groups: Dict[Tuple[str, AtomicRequestType], list] = defaultdict(list)
        for (time_idx, asset_id), reqs in self.atomic_by_label.items():
            for req in sorted(reqs, key=_req_order):
                groups[(asset_id, req.request_type)].append((time_idx, req))

        out_groups: List[EmissionGroup] = []
        handle_loc: Dict[int, Tuple[int, int]] = {}
        kind_lookup: Dict[Tuple[int, str, AtomicRequestType], int] = {}
        ambiguous = set()
        # deterministic group order (PYTHONHASHSEED-independent — see _req_order)
        for (asset_id, kind), rows in sorted(
            groups.items(), key=lambda kv: (kv[0][0] or "", kv[0][1].value)
        ):
            per_time: Dict[int, list] = defaultdict(list)
            for time_idx, req in rows:
                per_time[time_idx].append(req)
            K = max(len(v) for v in per_time.values())
            first = rows[0][1]
            f1 = 0.0 if first.time1 is None else first.time1
            f2 = 0.0 if first.time2 is None else first.time2
            t1_tab = np.full((num_points, K), f1)
            t2_tab = np.full((num_points, K), f2)
            g_idx = len(out_groups)
            for time_idx, reqs_t in per_time.items():
                for k, req in enumerate(reqs_t):
                    t1_tab[time_idx, k] = 0.0 if req.time1 is None else req.time1
                    t2_tab[time_idx, k] = 0.0 if req.time2 is None else req.time2
                    handle_loc[req.handle] = (g_idx, time_idx * K + k)
                    key = (time_idx, asset_id, kind)
                    if key in kind_lookup:
                        ambiguous.add(key)
                    else:
                        kind_lookup[key] = req.handle
            out_groups.append(EmissionGroup(asset_id, kind, K, t1_tab, t2_tab))
        for key in ambiguous:
            kind_lookup.pop(key, None)
        return EmissionSchedule(out_groups, handle_loc, kind_lookup, num_points,
                                ambiguous_kinds=ambiguous)

    def resolve_from_emissions(self, schedule: EmissionSchedule, emissions) -> list:
        """Handle-indexed resolved lists from the engine's streamed emissions.

        ``emissions``: list (one per schedule group) of [T*K, N] (or [T*K])
        arrays as returned by the streaming engine.  Output structure is
        identical to :meth:`resolve_requests`.
        """
        resolved = [None] * self.num_atomic_requests
        for handle, (g_idx, flat_row) in schedule.handle_loc.items():
            resolved[handle] = emissions[g_idx][flat_row]

        resolved_composite = [None] * self.num_composite_requests
        for _, comp_reqs in self.composite_by_time.items():
            for req in sorted(comp_reqs, key=lambda r: r.get_handle()):
                resolved_composite[req.get_handle()] = req.get_value(resolved)

        return [resolved, resolved_composite]

    # -- resolution (traced) ----------------------------------------------

    def resolve_requests(self, params, states) -> list:
        """Resolve every request against scanned path states.

        ``states``: [T, N, state_dim] array of model states at each simulation
        timeline point (the scan's ``ys``).  Returns
        ``[resolved_atomics, resolved_composites]`` — lists indexed by handle,
        each entry an array broadcastable against [N] (state-independent
        observables stay 0-d/1-row to save HBM).

        Resolution is *batched by (asset, kind)*: all SPOT requests on one
        asset across every time index become a single gather + vmapped closed
        form, so the compiled graph is O(request groups), not O(handles) —
        essential for books with thousands of observation dates (SURVEY.md
        §7.1 "observable schedule").
        """
        import numpy as np  # local: host-side index arrays only

        groups: Dict[Tuple[str, AtomicRequestType], list] = defaultdict(list)
        for (time_idx, asset_id), reqs in self.atomic_by_label.items():
            for req in sorted(reqs, key=_req_order):
                groups[(asset_id, req.request_type)].append((time_idx, req))

        resolved = [None] * self.num_atomic_requests
        for (asset_id, kind), rows in groups.items():
            tidx = np.array([r[0] for r in rows])
            t1s = jnp.asarray([0.0 if r[1].time1 is None else r[1].time1 for r in rows])
            t2s = jnp.asarray([0.0 if r[1].time2 is None else r[1].time2 for r in rows])
            from montecarlo_risk_engine_tpu.ops.gather import gather_rows

            states_sel = gather_rows(states, tidx)
            out = self.model.resolve_request_rows(params, kind, asset_id, t1s, t2s, states_sel)
            # Linearize-once jacobian driver (controller._linearized_jacfwd):
            # resolved rows stay live across its tangent map, so the
            # per-pass recompute never re-runs the resolution closed forms.
            from jax.ad_checkpoint import checkpoint_name

            out = checkpoint_name(out, "mcre:rows")
            for i, (_, req) in enumerate(rows):
                resolved[req.handle] = out[i]

        resolved_composite = [None] * self.num_composite_requests
        for _, comp_reqs in self.composite_by_time.items():
            for req in sorted(comp_reqs, key=lambda r: r.get_handle()):
                resolved_composite[req.get_handle()] = req.get_value(resolved)

        return [resolved, resolved_composite]

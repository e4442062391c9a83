"""Trace preprocessing: copy-constraint permutation, interpolation, commitments.

Mirrors reference crates/plonk/src/circuit/trace.rs: build_sigma forms cycles
from copy-constraint classes (sigma[from] = to, cycle direction as in
trace.rs:83-89); public inputs are negated and padded before interpolation
(trace.rs:162-165); q/r/id/sigma polys are committed unless a static circuit
supplies frozen commitments (trace.rs:185-196).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

from .. import acc as acc_mod
from .. import pcdl
from ..curves import Affine, CurveCfg
from ..hostpoly import HostEvals, domain_element
from .circuit import FP, MODS, TRACE_CURVE, SlotId, TraceData
from .constants import Q_POLYS, R_POLYS, S_POLYS, W_POLYS


@dataclass
class PlonkCircuitCommitments:
    qs: list[Affine]
    rs: list[Affine]
    ids: list[Affine]
    sigmas: list[Affine]


@dataclass
class PlonkCircuit:
    rows: int
    public_input_count: int
    omega: int
    Cs: PlonkCircuitCommitments


@dataclass
class PlonkPublicInputs:
    public_inputs: list[int]
    acc_prev: acc_mod.Accumulator


@dataclass
class PlonkWitnessPolys:
    ws: list[list[int]]
    qs: list[list[int]]
    rs: list[list[int]]
    ids: list[list[int]]
    sigmas: list[list[int]]


@dataclass
class PlonkWitness:
    omega: int
    polys: PlonkWitnessPolys
    w_evals: list[HostEvals]
    # optional device-resident Montgomery mirrors of `polys` filled in by
    # Trace.new's batched interpolation: keys in {"ws", "qs", "rs", "ids",
    # "sigmas", "w_evals"} -> (k, n, 16) arrays.  Purely an optimization —
    # the device prover uses them to skip re-uploading identical data.
    dev_polys: Optional[dict] = None


def build_sigma(m: int, eqs: list[list[SlotId]], rows: int):
    """(sigma slot map, id evals x8, sigma evals x8) (trace.rs:65-105)."""
    total = rows * S_POLYS
    sigma = list(range(total))  # sigma[u] = image slot index (as usize)
    for wires in eqs:
        if len(wires) <= 1:
            continue
        for i in range(len(wires)):
            frm = wires[i].to_usize(rows)
            to = wires[(i + 1) % len(wires)]
            sigma[frm] = to.to_usize(rows)

    id_evals = []
    sigma_evals = []
    for col in range(S_POLYS):
        id_vec = [
            SlotId.from_usize(col * rows + r, rows).to_scalar(rows) % m for r in range(rows)
        ]
        sg_vec = [
            SlotId.from_usize(sigma[col * rows + r], rows).to_scalar(rows) % m
            for r in range(rows)
        ]
        id_evals.append(HostEvals.from_vec_and_domain(m, id_vec))
        sigma_evals.append(HostEvals.from_vec_and_domain(m, sg_vec))
    return sigma, id_evals, sigma_evals


# Static-circuit trace cache: for a FROZEN circuit (the IVC path, where the
# same circuit pair is re-proven every step), the copy-constraint sigma map
# and the q/r/id/sigma polynomials depend only on the circuit structure —
# not on the step's witness — so they are computed once per circuit and
# reused.  Keyed by the circuit's (collision-resistant) commitment points.
# Profiled at 2^16 rows: 82 of the 116 per-step interpolations (and the
# build_sigma pass) are eliminated, ~45 s/IVC-step warm.
_STATIC_TRACE_CACHE: dict = {}  # LRU, capped by config.trace_cache_entries


def _trace_cache_put(key, entry) -> None:
    """Insert with LRU eviction: each entry pins large host poly lists plus
    (k, n, 16) device buffers (~hundreds of MB at 2^16 rows), so a
    long-lived process proving many DISTINCT frozen circuits must not grow
    this without bound (advisor r4)."""
    from ..config import get_config

    cap = max(1, get_config().trace_cache_entries)
    _STATIC_TRACE_CACHE.pop(key, None)
    _STATIC_TRACE_CACHE[key] = entry
    while len(_STATIC_TRACE_CACHE) > cap:
        _STATIC_TRACE_CACHE.pop(next(iter(_STATIC_TRACE_CACHE)))


def _trace_cache_get(key):
    entry = _STATIC_TRACE_CACHE.pop(key, None)
    if entry is not None:
        _STATIC_TRACE_CACHE[key] = entry  # LRU touch
    return entry


class LazyHostPolys:
    """List-like view over a (k, n, 16) device Montgomery limb stack that
    converts to host int lists only on first access.

    The device prover consumes the device mirrors directly, so the warm IVC
    step never pays the ~36 MB device->host pull + int re-assembly of the
    16 witness polynomials (profiled 9.6 s/step through the tunnel); the
    host prover (or any host consumer) transparently materializes once."""

    def __init__(self, m: int, dev):
        self._m = m
        self._dev = dev
        self._host: list[list[int]] | None = None

    def _materialize(self) -> list[list[int]]:
        if self._host is None:
            import jax.numpy as jnp
            import numpy as np

            from ..ops import ff

            ctx = ff.ctx_for(self._m)
            host = np.asarray(jnp.asarray(ff.from_mont_jit(ctx, self._dev), jnp.uint16))
            self._host = [ff.array_to_ints(host[i]) for i in range(host.shape[0])]
        return self._host

    def __len__(self) -> int:
        return int(self._dev.shape[0])

    def __getitem__(self, i):
        return self._materialize()[i]

    def __iter__(self):
        return iter(self._materialize())


def _static_key(cfg: CurveCfg, circuit: PlonkCircuit):
    cs = circuit.Cs
    return (cfg.name, circuit.rows,
            tuple(cs.qs), tuple(cs.rs), tuple(cs.ids), tuple(cs.sigmas))


@dataclass
class Trace:
    cfg: CurveCfg
    rows: int
    omega: int
    outputs: list[int]
    sigma: list[int]
    public_inputs: list[int]
    public_inputs_poly: list[int]
    C_qs: list[Affine]
    C_rs: list[Affine]
    C_ids: list[Affine]
    C_sigmas: list[Affine]
    id_polys: list[list[int]]
    q_polys: list[list[int]]
    sigma_polys: list[list[int]]
    w_evals: list[HostEvals]
    w_polys: list[list[int]]
    r_polys: list[list[int]]
    acc_prev: acc_mod.Accumulator
    message_pass_inputs: list[int]
    dev_polys: Optional[dict] = None

    @classmethod
    def new(
        cls,
        cfg: CurveCfg,
        data: TraceData,
        acc_prev: Optional[acc_mod.Accumulator] = None,
        circuit: Optional[PlonkCircuit] = None,
    ) -> "Trace":
        from ..hostpoly import interpolate_evals_batch

        m = cfg.r
        n = data.rows
        d = n - 1
        omega = domain_element(m, n, 1)

        cached = _trace_cache_get(_static_key(cfg, circuit)) if circuit else None
        if cached is not None:
            sigma = cached["sigma"]
            id_polys, sigma_polys = cached["id_polys"], cached["sigma_polys"]
            q_polys, r_polys = cached["q_polys"], cached["r_polys"]
            static_dev = cached["dev"]
        else:
            sigma, id_evals, sigma_evals = build_sigma(m, data.copy_constraints, n)
            r_evals = [HostEvals.from_vec_and_domain(m, col) for col in data.rs]
            q_evals = [HostEvals.from_vec_and_domain(m, col) for col in data.qs]
            n_q, n_r, n_s = len(q_evals), len(r_evals), len(id_evals)
            static_polys, static_dev, _ = interpolate_evals_batch(
                q_evals + r_evals + id_evals + sigma_evals, want_dev=True)
            q_polys = static_polys[:n_q]
            r_polys = static_polys[n_q : n_q + n_r]
            id_polys = static_polys[n_q + n_r : n_q + n_r + n_s]
            sigma_polys = static_polys[n_q + n_r + n_s :]
            if circuit is not None:
                _trace_cache_put(_static_key(cfg, circuit), {
                    "sigma": sigma,
                    "id_polys": id_polys,
                    "sigma_polys": sigma_polys,
                    "q_polys": q_polys,
                    "r_polys": r_polys,
                    "dev": static_dev,
                })

        pi = list(data.public_inputs) + [0] * (n - len(data.public_inputs))
        pi = [(-x) % m for x in pi]
        pi_evals = HostEvals.from_vec_and_domain(m, pi)

        w_evals = [HostEvals.from_vec_and_domain(m, col) for col in data.ws]
        # The witness polys' host ints are only needed by host-tier
        # consumers; interpolate on device WITHOUT the pull and hand out a
        # lazy view (the pi poly is small and always host-needed, so it is
        # interpolated separately with the pull).
        w_host, w_dev, w_raw_dev = interpolate_evals_batch(
            w_evals, want_dev=True, want_host=False)
        pi_host, _, _ = interpolate_evals_batch([pi_evals], want_dev=True)
        pi_poly = pi_host[0]
        # small n falls back to host NTTs, which still fill w_host
        w_polys = LazyHostPolys(m, w_dev) if w_dev is not None else w_host

        dev_polys = None
        if static_dev is not None and w_dev is not None:
            n_q, n_r, n_s = len(q_polys), len(r_polys), len(id_polys)
            dev_polys = {
                "qs": static_dev[:n_q],
                "rs": static_dev[n_q : n_q + n_r],
                "ids": static_dev[n_q + n_r : n_q + n_r + n_s],
                "sigmas": static_dev[n_q + n_r + n_s :],
                "ws": w_dev,
                "w_evals": w_raw_dev,
            }

        if circuit is not None:
            C_qs, C_rs = circuit.Cs.qs, circuit.Cs.rs
            C_ids, C_sigmas = circuit.Cs.ids, circuit.Cs.sigmas
        else:
            C_qs = [pcdl.commit(cfg, p, d) for p in q_polys]
            C_rs = [pcdl.commit(cfg, p, d) for p in r_polys]
            C_ids = [pcdl.commit(cfg, p, d) for p in id_polys]
            C_sigmas = [pcdl.commit(cfg, p, d) for p in sigma_polys]

        if acc_prev is None:
            acc_prev = acc_mod.zero_accumulator(cfg, n, 1)

        return cls(
            cfg=cfg,
            rows=n,
            omega=omega,
            outputs=data.outputs,
            sigma=sigma,
            public_inputs=list(data.public_inputs),
            public_inputs_poly=pi_poly,
            C_qs=C_qs,
            C_rs=C_rs,
            C_ids=C_ids,
            C_sigmas=C_sigmas,
            id_polys=id_polys,
            q_polys=q_polys,
            sigma_polys=sigma_polys,
            w_evals=w_evals,
            w_polys=w_polys,
            r_polys=r_polys,
            acc_prev=acc_prev,
            message_pass_inputs=list(data.message_pass_inputs),
            dev_polys=dev_polys,
        )

    def consume(self):
        Cs = PlonkCircuitCommitments(
            qs=self.C_qs, rs=self.C_rs, ids=self.C_ids, sigmas=self.C_sigmas
        )
        circuit = PlonkCircuit(
            rows=self.rows,
            public_input_count=len(self.public_inputs),
            omega=self.omega,
            Cs=Cs,
        )
        x = PlonkPublicInputs(public_inputs=self.public_inputs, acc_prev=self.acc_prev)
        polys = PlonkWitnessPolys(
            ws=self.w_polys,
            qs=self.q_polys,
            rs=self.r_polys,
            ids=self.id_polys,
            sigmas=self.sigma_polys,
        )
        w = PlonkWitness(omega=self.omega, polys=polys, w_evals=self.w_evals,
                         dev_polys=self.dev_polys)
        return circuit, x, w

    def test_copy_constraints(self) -> None:
        m = self.cfg.r
        for u, img in enumerate(self.sigma):
            a = SlotId.from_usize(u, self.rows)
            b = SlotId.from_usize(img, self.rows)
            from ..hostpoly import poly_eval

            v1 = poly_eval(m, self.w_polys[a.col - 1], pow(self.omega, a.row, m))
            v2 = poly_eval(m, self.w_polys[b.col - 1], pow(self.omega, b.row, m))
            assert v1 == v2, f"copy constraint {a} != {b}"


def trace_pair(builder, accs_prev=None, static_circuits=None):
    """TraceBuilder -> (fp Trace, fq Trace), mirroring trace_builder.rs trace()."""
    fp_data, fq_data = builder.trace()
    fp_acc, fq_acc = accs_prev if accs_prev else (None, None)
    fp_circ, fq_circ = static_circuits if static_circuits else (None, None)
    fp_trace = Trace.new(TRACE_CURVE[0], fp_data, fp_acc, fp_circ)
    fq_trace = Trace.new(TRACE_CURVE[1], fq_data, fq_acc, fq_circ)
    return fp_trace, fq_trace

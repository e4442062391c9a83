"""Device PLONK prover: same 6-round protocol, bulk math on limb arrays.

Produces proofs BIT-IDENTICAL to protocol.naive_prover (both deterministic
in the non-hiding path) — verified by tests/test_device_pipeline.py.  Host
work is reduced to the Poseidon transcript, challenge scalars, and final
integer conversions; everything O(n) runs on device:

  * extended-domain evaluation: batched NTT over the 8n domain
  * constraint algebra: the shared gate_constraints over (8n,16) arrays
  * f'/g' products: 8 factors multiplied pointwise on the 8n domain
  * grand product: work-efficient associative scan over row ratios
  * quotient: vectorized X^n-1 suffix-chunk division
  * commitments + IPA opens: device MSM / device fold loop
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .. import acc as acc_mod
from .. import pcdl
from ..curves import CurveCfg
from ..fields import inv
from ..ops import ff
from ..poseidon.sponge import Protocols, Sponge
from .constants import CONSTRAINT_DEGREE_MULTIPLIER, Q_POLYS, R_POLYS, S_POLYS, T_POLYS, W_POLYS
from .engine import Engine, engine_for
from .protocol import (
    PlonkProof,
    PlonkProofCommitments,
    PlonkProofEvalProofs,
    PlonkProofEvals,
    _scalar_mds,
    gate_constraints,
)
from .trace import PlonkCircuit, PlonkPublicInputs, PlonkWitness


class DevOps:
    """gate_constraints ops-adapter over (..., 16) Montgomery limb arrays."""

    def __init__(self, eng: Engine, shape):
        self.eng = eng
        self.shape = shape

    def add(self, a, b):
        return self.eng.add(a, b)

    def sub(self, a, b):
        return self.eng.sub(a, b)

    def mul(self, a, b):
        return self.eng.mul(a, b)

    def smul(self, a, s: int):
        return self.eng.scale(a, s)

    @property
    def one(self):
        return jnp.broadcast_to(ff.mont_one(self.eng.ctx), (*self.shape, 16))


def naive_prover_device(
    cfg: CurveCfg,
    circuit: PlonkCircuit,
    public_inputs: PlonkPublicInputs,
    witness: PlonkWitness,
    rng=None,
    mesh=None,
) -> PlonkProof:
    from ..utils.timing import RoundTimer

    timer = RoundTimer(f"plonk.prover_device[{cfg.name}, n={circuit.rows}]")
    eng = engine_for(cfg, mesh=mesh)
    m = cfg.r
    n = circuit.rows
    d = n - 1
    big_n = n * CONSTRAINT_DEGREE_MULTIPLIER
    huge_n = 2 * big_n  # 16n, for f_cc2 / quotient
    transcript = Sponge(Protocols.PLONK, cfg)
    mds = _scalar_mds(cfg)
    polys = witness.polys

    # ---- conversions (single batched transfers; Trace.new's batched
    # interpolation may have left device-resident mirrors — reuse them and
    # skip re-uploading ~230 MB of identical limb data per proof) ----
    dp = witness.dev_polys or {}

    def _dev(key, host_cols):
        cached = dp.get(key)
        return cached if cached is not None else eng.to_dev_batch(host_cols)

    qs_dev = _dev("qs", polys.qs)
    ws_dev = _dev("ws", polys.ws)
    rs_dev = _dev("rs", polys.rs)
    ids_dev = _dev("ids", polys.ids)
    sigmas_dev = _dev("sigmas", polys.sigmas)
    w_raw = _dev("w_evals", [e.vec for e in witness.w_evals])  # rotated eval vecs

    # ---- Round 0 ----
    pi_vals = list(public_inputs.public_inputs) + [0] * (n - len(public_inputs.public_inputs))
    pi_vals = [(-x) % m for x in pi_vals]
    pi_raw = jnp.roll(eng.to_dev(pi_vals), 1, axis=0)  # from_vec_and_domain rotation
    pi_poly = eng.intt(pi_raw)

    w_omega_polys = eng.intt(jnp.roll(w_raw[:3], -1, axis=1))  # (3, n, 16)

    q_big = eng.ntt_extended(qs_dev, big_n)
    w_big = eng.ntt_extended(ws_dev, big_n)
    r_big = eng.ntt_extended(rs_dev, big_n)
    nw_big = jnp.roll(w_big[:3], -CONSTRAINT_DEGREE_MULTIPLIER, axis=1)
    pi_big = eng.ntt_extended(pi_poly[None], big_n)[0]

    # ---- Round 1 ----
    C_ws = eng.commit_batch(ws_dev, d)  # 16 MSMs, one batched dispatch
    transcript.absorb_g(C_ws)
    timer.mark("round0+1.extend+commit_ws")

    # ---- Round 3 ----
    beta = transcript.challenge()
    gamma = transcript.challenge()
    beta_dev = eng.to_dev([beta])[0]
    gamma_dev = eng.to_dev([gamma])[0]

    ids_big = eng.ntt_extended(ids_dev, big_n)
    sigmas_big = eng.ntt_extended(sigmas_dev, big_n)

    def prod_factors(perm_big):
        factors = eng.add(eng.add(w_big[:S_POLYS], eng.mul(perm_big, beta_dev)), gamma_dev)
        out = factors[0]
        for i in range(1, S_POLYS):
            out = eng.mul(out, factors[i])
        return out  # (8n, 16) evals of the degree-8(n-1) product

    f_prime_big = prod_factors(ids_big)
    g_prime_big = prod_factors(sigmas_big)
    del ids_big, sigmas_big  # 2 x (8, 8n, 16) — release HBM before round 4
    f_prime_poly = eng.intt(f_prime_big)
    g_prime_poly = eng.intt(g_prime_big)

    # n-domain values = stride-8 subsample of the 8n-domain evals
    stride = CONSTRAINT_DEGREE_MULTIPLIER
    f_prime_n = f_prime_big[::stride]
    g_prime_n = g_prime_big[::stride]
    ratios = eng.mul(f_prime_n, eng.batch_inv(g_prime_n))
    del f_prime_big, g_prime_big
    z_evals = eng.grand_product(ratios)  # natural order, z[i] @ w^i
    z_raw = jnp.roll(z_evals, 1, axis=0)
    z_poly = eng.intt(z_raw)
    z_omega_poly = eng.intt(jnp.roll(z_raw, -1, axis=0))

    C_z = eng.commit(z_poly, d)
    transcript.absorb_g([C_z])
    timer.mark("round3.grand_product")

    # ---- Round 4 ----
    alpha = transcript.challenge()

    o = DevOps(eng, (big_n,))
    f_gc_big = gate_constraints(
        o, list(q_big), list(w_big), list(r_big), list(nw_big), pi_big, mds
    )
    del q_big, w_big, r_big, nw_big, pi_big  # ~1.7 GB of 8n-domain arrays
    f_gc_poly = eng.intt(f_gc_big)  # (8n, 16) coeffs
    del f_gc_big

    l1_raw = jnp.zeros((n, ff.NLIMBS), ff.U32).at[1].set(ff.mont_one(eng.ctx))
    l1_poly = eng.intt(l1_raw)
    one_dev = ff.mont_one(eng.ctx)
    z_minus_one = z_poly.at[0].set(eng.sub(z_poly[0], one_dev))
    two_n = 2 * n
    f_cc1_big = eng.mul(
        eng.ntt_extended(l1_poly[None], two_n)[0], eng.ntt_extended(z_minus_one[None], two_n)[0]
    )
    f_cc1_poly = eng.intt(f_cc1_big)  # (2n, 16)

    z_huge = eng.ntt_extended(z_poly[None], huge_n)[0]
    zw_huge = eng.ntt_extended(z_omega_poly[None], huge_n)[0]
    fp_huge = eng.ntt_extended(f_prime_poly[None], huge_n)[0]
    gp_huge = eng.ntt_extended(g_prime_poly[None], huge_n)[0]
    f_cc2_big = eng.sub(eng.mul(z_huge, fp_huge), eng.mul(zw_huge, gp_huge))
    del z_huge, zw_huge, fp_huge, gp_huge  # 4 x (16n, 16)
    f_cc2_poly = eng.intt(f_cc2_big)  # (16n, 16)
    del f_cc2_big

    def pad_to(x, size):
        return jnp.concatenate([x, jnp.zeros((size - x.shape[0], ff.NLIMBS), ff.U32)])

    alpha2 = alpha * alpha % m
    f_poly = eng.add(
        pad_to(f_gc_poly, huge_n),
        eng.add(
            eng.scale(pad_to(f_cc1_poly, huge_n), alpha),
            eng.scale(f_cc2_poly, alpha2),
        ),
    )
    t_poly = eng.divide_by_vanishing(f_poly, n)  # (15n, 16)
    t_full = pad_to(t_poly, T_POLYS * n)
    ts_dev = t_full.reshape(T_POLYS, n, ff.NLIMBS)
    C_ts = eng.commit_batch(ts_dev, d)  # 16 MSMs, one batched dispatch
    transcript.absorb_g(C_ts)
    timer.mark("round4.quotient")

    # ---- Round 5 ----
    zeta = transcript.challenge()

    def geometric_dev(stack):  # list of (n,16) -> (n,16)
        out = stack[0]
        zpow = zeta
        for p in stack[1:]:
            out = eng.add(out, eng.scale(p, zpow))
            zpow = zpow * zeta % m
        return out

    r_dev = geometric_dev(list(qs_dev) + list(ws_dev) + list(ts_dev) + [z_poly])
    r_omega_dev = geometric_dev(list(ws_dev[0:3]) + [z_poly])

    xi = transcript.challenge()
    acc_prev = public_inputs.acc_prev

    z_r = xi
    z_rw = xi * witness.omega % m
    import jax
    import os

    # tri-state override so the pair-open glue is CPU-testable byte-for-byte
    # against the sequential path (advisor r4): HALO_TPU_FORCE_PAIR_OPEN=1
    # forces the pair branch, =0 forces sequential, unset = size/backend gate
    _force = os.environ.get("HALO_TPU_FORCE_PAIR_OPEN")
    use_pair = (_force == "1" if _force in ("0", "1")
                else jax.default_backend() != "cpu" and n >= pcdl.DEVICE_OPEN_MIN)
    if use_pair:
        # paired device open: both commitments in one batched MSM dispatch,
        # both evals on device, and the two fold loops in lockstep (each
        # round: ONE 4-way MSM dispatch + one host pull, see ops/ipa.py
        # open_pair_without_eval_device).  Bit-identical to the sequential
        # Instance.open calls (exact arithmetic, independent transcripts).
        from ..ops import ipa

        C_pair = eng.commit_batch(jnp.stack([r_dev, r_omega_dev]), d)
        v_r = eng.eval_batch(r_dev[None], z_r)[0]
        v_rw = eng.eval_batch(r_omega_dev[None], z_rw)[0]
        pi_r, pi_rw = ipa.open_pair_without_eval_device(
            cfg, [(r_dev, C_pair[0], z_r, v_r),
                  (r_omega_dev, C_pair[1], z_rw, v_rw)], d)
        q_r = pcdl.Instance(C=C_pair[0], d=d, z=z_r, v=v_r, pi=pi_r)
        q_r_omega = pcdl.Instance(C=C_pair[1], d=d, z=z_rw, v=v_rw, pi=pi_rw)
    else:
        r_ints = eng.to_ints(r_dev)
        r_omega_ints = eng.to_ints(r_omega_dev)
        q_r = pcdl.Instance.open(cfg, r_ints, d, z_r, w=None, rng=rng)
        q_r_omega = pcdl.Instance.open(cfg, r_omega_ints, d, z_rw, w=None, rng=rng)

    acc_next = acc_mod.prover(cfg, [acc_prev.q, q_r, q_r_omega], rng=rng)
    timer.mark("round5.open+accumulate")

    # ---- final evaluations (batched) ----
    all_polys = jnp.concatenate(
        [ws_dev, rs_dev, qs_dev, ts_dev, ids_dev, sigmas_dev, z_poly[None], w_omega_polys]
    )
    evals = eng.eval_batch(all_polys, xi)
    i = 0
    ws_e = evals[i : i + W_POLYS]; i += W_POLYS
    rs_e = evals[i : i + R_POLYS]; i += R_POLYS
    qs_e = evals[i : i + Q_POLYS]; i += Q_POLYS
    ts_e = evals[i : i + T_POLYS]; i += T_POLYS
    ids_e = evals[i : i + S_POLYS]; i += S_POLYS
    sigmas_e = evals[i : i + S_POLYS]; i += S_POLYS
    z_e = evals[i]; i += 1
    w_omegas_e = evals[i : i + 3]
    z_omega_e = eng.eval_batch(z_poly[None], xi * witness.omega % m)[0]

    vs = PlonkProofEvals(
        ws=ws_e,
        rs=rs_e,
        qs=qs_e,
        ts=ts_e,
        ids=ids_e,
        sigmas=sigmas_e,
        z=z_e,
        z_omega=z_omega_e,
        w_omegas=w_omegas_e,
    )
    timer.mark("round5.evals")
    timer.report()
    return PlonkProof(
        vs=vs,
        Cs=PlonkProofCommitments(ws=C_ws, ts=C_ts, z=C_z),
        pis=PlonkProofEvalProofs(r=q_r.pi, r_omega=q_r_omega.pi),
        acc_next=acc_next,
    )

"""Distributed NTT: 4-step decomposition with all_to_all re-sharding.

The TPU-native analogue of sequence parallelism (SURVEY.md §2.6): butterfly
stages run locally until the stride crosses the shard boundary; the shard
exchange is a single all_to_all transpose instead of per-stage exchanges.

4-step NTT for n = n1*n2, input a[k1*n2 + k2] sharded over k1 blocks:
  1. local-ize k1: all_to_all transpose to (k2-major) layout
  2. NTT_{n1} along k1 for each k2  ->  B[j1, k2]
  3. twiddle: C[j1,k2] = B[j1,k2] * w^(j1*k2)
  4. all_to_all back to j1-major layout, NTT_{n2} along k2 with root w^n1
Output element A[j2*n1 + j1] lands at grid position [j1, j2]; a final local
transpose + reshape restores natural order.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec
from jax import shard_map

from ..fields import two_adic_root_of_unity
from ..ops import ff, ntt
from ..ops.ff import NLIMBS, U32, FFCtx


@lru_cache(maxsize=32)
def _twiddle_grid(m: int, log_n1: int, log_n2: int, inverse: bool) -> np.ndarray:
    """w^(j1*k2) Montgomery-form grid, shape (n1, n2, 16)."""
    n1, n2 = 1 << log_n1, 1 << log_n2
    w = two_adic_root_of_unity(m, log_n1 + log_n2)
    if inverse:
        w = pow(w, -1, m)
    rows = []
    for j1 in range(n1):
        wj = pow(w, j1, m)
        cur = 1 << 256
        cur %= m
        row = []
        val = 1
        for k2 in range(n2):
            row.append(val * (1 << 256) % m)
            val = val * wj % m
        rows.extend(row)
    return ff.ints_to_array(rows).reshape(n1, n2, NLIMBS)


_FN_CACHE: dict = {}


def distributed_ntt_fn(ctx: FFCtx, mesh: Mesh, log_n: int, inverse: bool = False,
                       natural_order: bool = True):
    """Jitted distributed NTT over `mesh`; input (n, 16) sharded on axis 0.

    The compiled fn is cached per (field, mesh, size, direction, layout)."""
    key = (ctx, tuple(d.id for d in mesh.devices.flat), log_n, inverse, natural_order)
    if key in _FN_CACHE:
        return _FN_CACHE[key]
    d = mesh.devices.size
    log_d = d.bit_length() - 1
    assert 1 << log_d == d
    n = 1 << log_n
    log_n1 = log_d  # one block-row per device for the cross-shard stage
    log_n2 = log_n - log_n1
    n1, n2 = 1 << log_n1, 1 << log_n2
    tw = _twiddle_grid(ctx.m, log_n1, log_n2, inverse)
    m = ctx.m
    n_inv = ff.int_to_limbs(pow(n, -1, m) * (1 << 256) % m)

    def local(a):  # a: (n/d, 16) = this device's k1 rows flattened (n1/d, n2)
        rows = a.reshape(n1 // d, n2, NLIMBS)
        # step 1: all_to_all transpose so each device holds ALL k1 for its
        # k2 slab: split the k2 axis, concat along k1
        gathered = jax.lax.all_to_all(rows, "data", split_axis=1, concat_axis=0, tiled=True)
        # gathered: (n1, n2/d, L)
        # step 2: NTT over the k1 axis
        col = gathered.swapaxes(0, 1)  # (n2/d, n1, L)
        col = ntt._ntt_impl(ctx, col, log_n1, inverse)
        B = col.swapaxes(0, 1)  # (n1, n2/d, L)
        # step 3: twiddle w^(j1*k2) — slice this device's k2 slab
        idx = jax.lax.axis_index("data")
        tw_local = jax.lax.dynamic_slice_in_dim(
            jnp.asarray(tw, U32), idx * (n2 // d), n2 // d, axis=1
        )
        C = ff.mont_mul(ctx, B, tw_local)
        # step 4: transpose back (j1 sharded, k2 local), NTT over k2.
        # Inverse scaling: the two local inverse transforms contribute
        # 1/n1 * 1/n2 = 1/n, so no extra global scale is needed.
        back = jax.lax.all_to_all(C, "data", split_axis=0, concat_axis=1, tiled=True)
        out = ntt._ntt_impl(ctx, back, log_n2, inverse)  # (n1/d, n2, L)
        if not natural_order:
            return out.reshape(n // d, NLIMBS)
        # re-layout to natural order ON DEVICE: grid position [j1, j2] holds
        # A[j2*n1 + j1]; a natural-order array block-sharded on j gives
        # device i the j2-slab [i*n2/d, (i+1)*n2/d) for ALL j1 — one more
        # all_to_all (split j2, concat j1) + a local transpose.
        slab = jax.lax.all_to_all(out, "data", split_axis=1, concat_axis=0, tiled=True)
        # slab: (n1, n2/d, L); natural local row = j2_local*n1 + j1
        return slab.swapaxes(0, 1).reshape(n // d, NLIMBS)

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(PartitionSpec("data"),),
        out_specs=PartitionSpec("data"),
        check_vma=False,
    )
    _FN_CACHE[key] = jax.jit(fn)
    return _FN_CACHE[key]


def ntt_distributed(ctx: FFCtx, mesh: Mesh, a: jnp.ndarray, inverse: bool = False,
                    natural_order: bool = True) -> jnp.ndarray:
    """Run the distributed NTT; output stays on device, sharded over the mesh.

    With natural_order=True (default) the result rows are in standard NTT
    output order; with False the caller gets the transposed (j1-major) grid
    layout and saves one all_to_all.
    """
    n = a.shape[0]
    log_n = n.bit_length() - 1
    fn = distributed_ntt_fn(ctx, mesh, log_n, inverse, natural_order)
    from .mesh import shard_leading

    return fn(shard_leading(mesh, a))

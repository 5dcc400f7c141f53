"""Distributed POTRS on the block-cyclic layout — the multi-chip full-solve
path (north star: POTRF + POTRS at scale; the reference ships no solve at
all, SURVEY §7 phase 4).

Given the factor L in cyclic-permuted sharded storage (output of
``potrf_block_cyclic``) and a replicated right-hand-side block B (n × nrhs),
solve A·X = B by forward then backward substitution over tile rows:

- the diagonal tile is broadcast with a masked ``psum`` (as in the
  factorization);
- each off-diagonal update ``B_i -= L_ik · Y_k`` is computed by the single
  owner of tile (i, k) and summed into the replicated RHS with one
  ``psum`` over the mesh — O(n · nrhs) per step on ICI, negligible next to
  the factorization.

RHS blocks stay replicated on every device (nrhs ≪ n), which keeps the
substitution recurrence simple and the collective volume tiny.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from dla_tpu.parallel.block_cyclic import BlockCyclicLayout


def _solve_local(lx, b, layout: BlockCyclicLayout):
    nb, p, q, ltr = layout.nb, layout.p, layout.q, layout.ltr
    nt = layout.ntiles
    r = lax.axis_index("r")
    c = lax.axis_index("c")
    zero = jnp.zeros((), b.dtype)
    gtrow = (jnp.arange(ltr * nb) // nb) * p + r  # global tile-row per local row

    def diag_tile(k):
        kr, kc = k % p, k % q
        lik, ljk = k // p, k // q
        d = lx[lik * nb : (lik + 1) * nb, ljk * nb : (ljk + 1) * nb]
        return lax.psum(jnp.where((r == kr) & (c == kc), d, zero), ("r", "c"))

    def col_strip(k):
        """Local rows of tile-column k (meaningful on mesh column k%q)."""
        ljk = k // q
        return lx[:, ljk * nb : (ljk + 1) * nb]

    # ---- forward: L Y = B --------------------------------------------------
    y = b
    for k in range(nt):
        kc = k % q
        lkk = diag_tile(k)
        yk = lax.linalg.triangular_solve(
            lkk, y[k * nb : (k + 1) * nb], left_side=True, lower=True
        )
        y = y.at[k * nb : (k + 1) * nb].set(yk)
        if k == nt - 1:
            break
        # B_i -= L_ik @ Y_k for i > k, each tile owned by (i%p, kc)
        strip = col_strip(k)  # (ltr*nb, nb)
        mine = jnp.where(((gtrow > k) & (c == kc))[:, None], strip, zero)
        delta_local = jnp.matmul(mine, yk, preferred_element_type=y.dtype)
        # scatter local rows back to global positions: local row m is global
        # element row (m//nb*p + r)*nb + m%nb — build via one-hot-free path:
        # accumulate into a zero global buffer with dynamic row blocks.
        gbuf = jnp.zeros_like(y)
        for li in range(ltr):
            gi = li * p + r  # traced global tile row
            gbuf = lax.dynamic_update_slice(
                gbuf,
                delta_local[li * nb : (li + 1) * nb],
                (gi * nb, jnp.zeros_like(gi)),
            )
        # each tile (i, k) has exactly one owner, so the mesh-wide psum adds
        # every contribution exactly once
        y = y - lax.psum(gbuf, ("r", "c"))

    # ---- backward: L^T X = Y ----------------------------------------------
    x = y
    for k in reversed(range(nt)):
        kc = k % q
        lkk = diag_tile(k)
        # X_k := inv(L_kk)^T (Y_k - sum_{i>k} L_ik^T X_i)
        strip = col_strip(k)
        mine = jnp.where(((gtrow > k) & (c == kc))[:, None], strip, zero)
        # gather global x rows for local tile rows: (ltr*nb, nrhs)
        starts = [(li * p + r) * nb for li in range(ltr)]
        xl = jnp.concatenate(
            [
                lax.dynamic_slice(x, (s0, jnp.zeros_like(s0)), (nb, x.shape[1]))
                for s0 in starts
            ],
            axis=0,
        )
        part = jnp.matmul(mine.T, xl, preferred_element_type=x.dtype)
        s = lax.psum(part, ("r", "c"))
        xk = lax.linalg.triangular_solve(
            lkk,
            x[k * nb : (k + 1) * nb] - s,
            left_side=True,
            lower=True,
            transpose_a=True,
        )
        x = x.at[k * nb : (k + 1) * nb].set(xk)
    return x


@functools.partial(jax.jit, static_argnames=("layout", "mesh"))
def potrs_block_cyclic(lx, b, layout: BlockCyclicLayout, mesh: Mesh):
    """Solve A·X = B given the block-cyclic factor ``lx``; ``b`` is a
    replicated (n, nrhs) array. Returns the replicated solution X."""
    f = jax.shard_map(
        functools.partial(_solve_local, layout=layout),
        mesh=mesh,
        in_specs=(layout.spec(), P(None, None)),
        out_specs=P(None, None),
        check_vma=False,
    )
    return f(lx, b)

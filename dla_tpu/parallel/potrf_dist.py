"""Multi-chip block-cyclic right-looking POTRF via shard_map + collectives.

This is the reference's distributed Cholesky DAG (ArmoniK client wave loop,
``client_distrib.cpp:506-565``: POTRF(k,k) → TRSM(i,k) → SYRK/GEMM(i,j,k))
re-expressed the TPU way — and actually *concurrent*, where the reference
serialized every task on ``wait_for_result_availability``
(``client_distrib.cpp:499``). Per panel step k:

1. **diag factor** — the owning device's NB×NB tile is broadcast with a
   masked ``psum`` over both mesh axes (tiny), and every device factors it
   redundantly (cheaper than a second broadcast of the factor).
2. **panel solve (TRSM)** — devices in mesh column (k mod q) solve their
   local rows of tile-column k against L_kk in one batched triangular solve.
3. **panel broadcast** — masked ``psum`` over the 'c' axis hands every
   device the panel rows it owns (the A operand of the trailing GEMM);
   an ``all_gather`` over 'r' assembles the full panel so each device can
   select the transposed rows matching its local tile columns (the B
   operand). These are the ICI collectives that replace the reference's
   gRPC blob fetches (SURVEY §5.8).
4. **trailing update** — one local GEMM ``M[t:, t:] -= A_op @ B_op^T`` per
   device per step, on statically-shrinking windows: after step k, local
   tile rows < ceil((k+1-p+1)/p) are finished for *every* device in the
   column, so the window start is a static Python index (the outer k loop
   is unrolled at trace time) and only a one-tile boundary needs masking.
   Block-cyclic ownership keeps the shrinking trailing matrix balanced —
   the reason PxQ grids exist in the reference's descriptor API.

Numerical contract is identical to the single-chip path: lower triangle
only, validated against the same 1e-10 fp64 gate in tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh

from dla_tpu.parallel.block_cyclic import BlockCyclicLayout


def _acc(dtype):
    return jnp.float32 if dtype in (jnp.bfloat16, jnp.float16) else dtype


def _potrf_local(x, layout: BlockCyclicLayout):
    """The per-device SPMD program (runs under shard_map)."""
    nb, p, q, ltr, ltc = layout.nb, layout.p, layout.q, layout.ltr, layout.ltc
    nt = layout.ntiles
    r = lax.axis_index("r")
    c = lax.axis_index("c")
    dtype = x.dtype
    zero = jnp.zeros((), dtype)

    # global tile-row index of each local element row (traced via r)
    gtrow = (jnp.arange(ltr * nb) // nb) * p + r  # (ltr*nb,)
    gtcol = (jnp.arange(ltc * nb) // nb) * q + c  # (ltc*nb,)

    for k in range(nt):
        kr, kc = k % p, k % q
        lik, ljk = k // p, k // q  # local tile coords on the owner (static)

        # --- 1. broadcast + factor the diagonal tile -----------------------
        dblk = x[lik * nb : (lik + 1) * nb, ljk * nb : (ljk + 1) * nb]
        own_diag = (r == kr) & (c == kc)
        contrib = jnp.where(own_diag, dblk, zero)
        diag = lax.psum(contrib, ("r", "c"))
        lkk = jnp.tril(lax.linalg.cholesky(diag, symmetrize_input=False))

        # --- 2. panel solve on mesh column kc ------------------------------
        col = x[:, ljk * nb : (ljk + 1) * nb]  # (ltr*nb, nb)
        solved = lax.linalg.triangular_solve(
            lkk, col, left_side=False, lower=True, transpose_a=True
        )
        below = (gtrow > k)[:, None]
        in_kc = c == kc
        newcol = jnp.where(below & in_kc, solved, col)
        x = x.at[:, ljk * nb : (ljk + 1) * nb].set(newcol)
        # re-read the block after the column update: on non-owner devices this
        # local position holds a freshly-solved panel tile that must persist
        cur = x[lik * nb : (lik + 1) * nb, ljk * nb : (ljk + 1) * nb]
        x = x.at[lik * nb : (lik + 1) * nb, ljk * nb : (ljk + 1) * nb].set(
            jnp.where(own_diag, lkk, cur)
        )

        if k == nt - 1:
            break

        # --- 3. panel broadcast ---------------------------------------------
        panel_contrib = jnp.where(below & in_kc, newcol, zero)
        # every device in a mesh row gets its own panel rows (A operand)
        panel_rows = lax.psum(panel_contrib, "c")  # (ltr*nb, nb)
        # full panel for the transposed operand selection (B operand)
        panel_full = lax.all_gather(panel_rows, "r")  # (p, ltr*nb, nb)

        # --- 4. trailing update on a statically-shrinking window -----------
        # local tile row li is dead for every device iff li*p + (p-1) <= k,
        # so the first live local tile row is (k+1)//p — a static index.
        li0 = (k + 1) // p
        lj0 = (k + 1) // q
        t_r, t_c = li0 * nb, lj0 * nb
        a_op = jnp.where((gtrow[t_r:] > k)[:, None], panel_rows[t_r:], zero)
        # B operand: panel tile rows matching this device's local tile cols
        j_elem = jnp.arange(t_c, ltc * nb)
        jtile = (j_elem // nb) * q + c  # global tile col (traced)
        sel_r = jtile % p
        sel_m = (jtile // p) * nb + j_elem % nb
        b_op = panel_full[sel_r, sel_m, :]  # ((ltc*nb - t_c), nb)
        b_op = jnp.where((gtcol[t_c:] > k)[:, None], b_op, zero)
        upd = jnp.matmul(a_op, b_op.T, preferred_element_type=_acc(dtype))
        x = x.at[t_r:, t_c:].add(-upd.astype(dtype))

    return x


def _fori_window(sub, layout: BlockCyclicLayout, k0: int, k1: int, li0: int, lj0: int):
    """fori_loop over panel steps k ∈ [k0, k1) operating on the static local
    window starting at local tile (li0, lj0). All in-window indices are
    traced (dynamic slices); per-k masking handles the boundary."""
    nb, p, q = layout.nb, layout.p, layout.q
    r = lax.axis_index("r")
    c = lax.axis_index("c")
    dtype = sub.dtype
    zero = jnp.zeros((), dtype)
    wr, wc = sub.shape  # window dims (static)
    gtrow = ((jnp.arange(wr) // nb) + li0) * p + r
    gtcol = ((jnp.arange(wc) // nb) + lj0) * q + c
    j_elem = jnp.arange(wc)

    def body(k, x):
        kr, kc = k % p, k % q
        lik, ljk = k // p - li0, k // q - lj0  # window-local tile coords
        dblk = lax.dynamic_slice(x, (lik * nb, ljk * nb), (nb, nb))
        own_diag = (r == kr) & (c == kc)
        diag = lax.psum(jnp.where(own_diag, dblk, zero), ("r", "c"))
        lkk = jnp.tril(lax.linalg.cholesky(diag, symmetrize_input=False))

        col = lax.dynamic_slice(x, (jnp.zeros_like(k), ljk * nb), (wr, nb))
        solved = lax.linalg.triangular_solve(
            lkk, col, left_side=False, lower=True, transpose_a=True
        )
        below = (gtrow > k)[:, None]
        in_kc = c == kc
        newcol = jnp.where(below & in_kc, solved, col)
        x = lax.dynamic_update_slice(x, newcol, (jnp.zeros_like(k), ljk * nb))
        cur = lax.dynamic_slice(x, (lik * nb, ljk * nb), (nb, nb))
        x = lax.dynamic_update_slice(
            x, jnp.where(own_diag, lkk, cur), (lik * nb, ljk * nb)
        )

        panel_rows = lax.psum(jnp.where(below & in_kc, newcol, zero), "c")
        panel_full = lax.all_gather(panel_rows, "r")  # (p, wr, nb)
        a_op = jnp.where(below, panel_rows, zero)
        jtile = ((j_elem // nb) + lj0) * q + c
        b_op = panel_full[jtile % p, (jtile // p - li0) * nb + j_elem % nb, :]
        b_op = jnp.where((gtcol > k)[:, None], b_op, zero)
        upd = jnp.matmul(a_op, b_op.T, preferred_element_type=_acc(dtype))
        return x - upd.astype(dtype)

    return lax.fori_loop(k0, k1, body, sub)


def _potrf_local_super(x, layout: BlockCyclicLayout, super_steps: int):
    """Super-stepped fori variant: program size O(nt / super_steps).

    The panel loop runs in segments of ``super_steps`` steps; before each
    segment the dead leading tile rows/cols are cut off with a *static*
    slice (local tile row li is finished for every device once
    li·p + p − 1 < k, so the window start s0//p is a Python index). Within
    a segment, per-k masking covers the ≤super_steps·nb rows of slack —
    the masked-flops overhead of the pure-fori variant shrinks from O(nt)
    steps of full-width updates to O(super_steps) of window width.
    """
    nb, p, q = layout.nb, layout.p, layout.q
    nt = layout.ntiles
    for s0 in range(0, nt, super_steps):
        s1 = min(nt, s0 + super_steps)
        li0, lj0 = s0 // p, s0 // q
        t_r, t_c = li0 * nb, lj0 * nb
        sub = _fori_window(x[t_r:, t_c:], layout, s0, s1, li0, lj0)
        x = x.at[t_r:, t_c:].set(sub)
    return x


@functools.partial(jax.jit, static_argnames=("layout", "mesh", "unroll", "super_steps"))
def _potrf_jit(
    x, layout: BlockCyclicLayout, mesh: Mesh, unroll: bool, super_steps: int
):
    if unroll:
        local = functools.partial(_potrf_local, layout=layout)
    else:
        local = functools.partial(
            _potrf_local_super, layout=layout, super_steps=super_steps
        )
    f = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=layout.spec(),
        out_specs=layout.spec(),
        check_vma=False,
    )
    return f(x)


def potrf_block_cyclic(
    x: jax.Array,
    layout: BlockCyclicLayout,
    mesh: Mesh,
    *,
    unroll: bool | None = None,
    super_steps: int | None = None,
) -> jax.Array:
    """Distributed POTRF of a cyclic-permuted sharded matrix (see
    ``block_cyclic.from_dense``). Returns the factor in the same layout;
    only lower-triangle tiles are meaningful.

    ``unroll=None`` picks the trace-time-unrolled program (true flop count,
    static shrinking windows) for ≤64 tile steps; beyond that, the
    super-stepped ``fori_loop`` program (static window shrink every
    ``super_steps`` panels, default sized so the program stays ≤32
    segments).
    """
    if unroll is None:
        unroll = layout.ntiles <= 64
    if super_steps is None:
        super_steps = max(1, -(-layout.ntiles // 32))
    return _potrf_jit(x, layout, mesh, unroll, super_steps)

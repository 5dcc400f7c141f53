"""2D block-cyclic distribution of a tiled matrix over a device mesh.

The reference plumbs a PxQ block-cyclic process grid through its whole
descriptor API but never exercises it (``v6_test.c:45``, always p=q=1 —
SURVEY §2d). Here it is the first-class multi-chip layout, realized the
JAX way:

Tile (i, j) of the Nb×Nb tile grid is owned by device (i mod p, j mod q) of
a 2D ``Mesh(p, q)``. ``NamedSharding`` can only express *blocked* layouts,
so we store the matrix in a **cyclic-permuted element order**: global tile
row i maps to stored tile row ``(i mod p) * (Nb/p) + i // p`` (same for
columns). Under that permutation the cyclic layout becomes exactly a 2D
blocked sharding ``P('r', 'c')`` of an (N, N) array, and each device's local
shard is a plain ((Nb/p)·NB, (Nb/q)·NB) matrix whose tile (li, lj) is global
tile (li·p + r, lj·q + c). All distributed kernels then operate on ordinary
contiguous slices of the local shard — MXU-friendly, no gather/scatter in
the hot path.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dla_tpu.ops import plgsy_tile


def make_mesh(p: int, q: int, devices=None) -> Mesh:
    """A 2D (p, q) mesh with axes ('r', 'c') — the PxQ process grid."""
    if devices is None:
        devices = jax.devices()
    if len(devices) < p * q:
        raise ValueError(f"need {p * q} devices, have {len(devices)}")
    return Mesh(np.asarray(devices[: p * q]).reshape(p, q), ("r", "c"))


@dataclasses.dataclass(frozen=True)
class BlockCyclicLayout:
    """Static geometry of a block-cyclic distributed N×N matrix."""

    n: int  # global matrix dim
    nb: int  # tile size
    p: int  # mesh rows
    q: int  # mesh cols

    def __post_init__(self):
        if self.n % self.nb:
            raise ValueError(f"n={self.n} must be a multiple of nb={self.nb}")
        if self.ntiles % self.p or self.ntiles % self.q:
            raise ValueError(
                f"tile grid {self.ntiles} must be divisible by mesh "
                f"({self.p}x{self.q}); pad n or choose a different nb"
            )

    @property
    def ntiles(self) -> int:
        return self.n // self.nb

    @property
    def ltr(self) -> int:
        """Local tile rows per device."""
        return self.ntiles // self.p

    @property
    def ltc(self) -> int:
        """Local tile cols per device."""
        return self.ntiles // self.q

    @property
    def local_shape(self) -> tuple[int, int]:
        return (self.ltr * self.nb, self.ltc * self.nb)

    # -- the cyclic→blocked element permutation ------------------------------

    def perm(self, axis_tiles_per_dev: int, procs: int) -> np.ndarray:
        """Element permutation for one axis: perm[stored] = global index."""
        nb = self.nb
        idx = np.arange(self.n)
        tile = idx // nb
        within = idx % nb
        # stored tile order: all tiles owned by proc 0 (in global order),
        # then proc 1, ... ; stored_tile = (tile % procs) * per + tile // procs
        stored_tile = (tile % procs) * axis_tiles_per_dev + tile // procs
        stored = stored_tile * nb + within
        perm = np.empty(self.n, np.int64)
        perm[stored] = idx
        return perm

    @property
    def row_perm(self) -> np.ndarray:
        return self.perm(self.ltr, self.p)

    @property
    def col_perm(self) -> np.ndarray:
        return self.perm(self.ltc, self.q)

    def spec(self) -> P:
        return P("r", "c")

    def sharding(self, mesh: Mesh) -> NamedSharding:
        return NamedSharding(mesh, self.spec())


def from_dense(a, layout: BlockCyclicLayout, mesh: Mesh) -> jax.Array:
    """Dense (n, n) host/global array → cyclic-permuted sharded array."""
    a = np.asarray(a)
    perm_r, perm_c = layout.row_perm, layout.col_perm
    stored = a[np.ix_(perm_r, perm_c)]
    return jax.device_put(stored, layout.sharding(mesh))


def to_dense(x: jax.Array, layout: BlockCyclicLayout) -> np.ndarray:
    """Cyclic-permuted sharded array → dense (n, n) numpy array."""
    stored = np.asarray(jax.device_get(x))
    out = np.empty_like(stored)
    out[np.ix_(layout.row_perm, layout.col_perm)] = stored
    return out


def generate_spd_block_cyclic(
    layout: BlockCyclicLayout,
    mesh: Mesh,
    *,
    seed: int = 51,
    bump: float | None = None,
    dtype=jnp.float32,
) -> jax.Array:
    """Distributed seeded SPD generation: every device materializes only its
    own tiles via the tile-local deterministic generator (plgsy_tile) — the
    TPU-native replacement for the reference client building the full N×N in
    RAM and uploading tile blobs one by one
    (``client_distrib.cpp:402-432``). No host↔device traffic beyond the
    program itself.
    """
    if bump is None:
        bump = float(layout.n)
    nb, ltr, ltc, p, q = layout.nb, layout.ltr, layout.ltc, layout.p, layout.q

    def gen_local(r, c):
        # local shard: tile (li, lj) is global tile (li*p + r, lj*q + c)
        rows = []
        for li in range(ltr):
            cols = []
            for lj in range(ltc):
                i0 = (li * p + r) * nb
                j0 = (lj * q + c) * nb
                cols.append(plgsy_tile(seed, i0, j0, nb, nb, bump=bump, dtype=dtype))
            rows.append(jnp.concatenate(cols, axis=1))
        return jnp.concatenate(rows, axis=0)

    def body():
        r = jax.lax.axis_index("r")
        c = jax.lax.axis_index("c")
        return gen_local(r, c)

    f = jax.jit(
        jax.shard_map(
            body, mesh=mesh, in_specs=(), out_specs=layout.spec(), check_vma=False
        )
    )
    return f()

"""Checkified factorization — functional error surfacing.

The reference worker converts kernel failures (``info != 0`` from dpotrf —
a non-SPD pivot) into error statuses for the control plane to retry
(``worker_distrib.cpp:243-244,558-563``), and instruments every task with
NaN/Inf counters (``:120-148``). Under jit there is no ``info`` return —
a non-SPD input silently yields NaNs — so the equivalent is
``jax.experimental.checkify``: the factorization is wrapped with explicit
positivity/NaN checks that come back as a functional error value the caller
can ``throw()`` or inspect (SURVEY §5.2 "TPU equivalent").
"""

from __future__ import annotations

import jax.numpy as jnp
from jax.experimental import checkify

from dla_tpu.algos.potrf import potrf_blocked


def potrf_checked(a, *, nb: int = 256, **kw):
    """Factor with functional error checking.

    Returns (err, L); call ``err.throw()`` to raise on failure, or
    ``err.get()`` to inspect. Checks: no NaN/Inf in the factor, strictly
    positive pivots — the jit-compatible replacement for LAPACK's ``info``.
    """

    def run(a):
        l = potrf_blocked(a, nb=nb, **kw)
        checkify.check(
            jnp.logical_not(jnp.any(jnp.isnan(l))),
            "POTRF produced NaNs — input not SPD (non-positive pivot)",
        )
        checkify.check(
            jnp.logical_not(jnp.any(jnp.isinf(l))),
            "POTRF produced Infs — input ill-scaled or not SPD",
        )
        checkify.check(
            jnp.all(jnp.diagonal(l) > 0),
            "POTRF: non-positive diagonal in factor — input not SPD",
        )
        return l

    return checkify.checkify(run)(a)

"""Test configuration: run everything on a virtual 8-device CPU mesh with
fp64 enabled, so multi-chip sharding and fp64 numerical gates are testable
without TPU hardware (the driver separately dry-runs the multi-chip path).

Note: this environment's sitecustomize registers an `axon` TPU plugin and
pins ``jax_platforms="axon,cpu"`` (overriding the JAX_PLATFORMS env var), so
we must force CPU via jax.config *after* import — otherwise every test op
round-trips through the TPU tunnel and f64 silently loses precision.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from jax._src import xla_bridge as _xb  # noqa: E402

if _xb.backends_are_initialized():  # pragma: no cover - defensive
    from jax.extend.backend import clear_backends

    clear_backends()

assert jax.default_backend() == "cpu", jax.default_backend()
assert len(jax.devices()) == 8, jax.devices()

"""WindPuller — the LSTM return-forecasting model (↔ ``z/windpuller.py``).

Reference architecture (``z/windpuller.py:65-116``): GaussianNoise →
stacked LSTM → Dense(tanh) multi-output, trained on the profit objective
``risk_estimation = −100 · mean(y_true · y_pred)`` (``:18-23``), with
directional-accuracy (``:26-30``) and Pearson (``:33-42``) metrics. Here it
is a flax module + optax train step, jitted end-to-end (one fused TPU
program per step instead of Keras' op-by-op dispatch).
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax


class WindPullerNet(nn.Module):
    hidden: Sequence[int] = (64, 32)
    outputs: int = 1
    noise_std: float = 0.05
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, *, train: bool):
        # x: (B, T, F)
        if train and self.noise_std > 0:
            rng = self.make_rng("noise")
            x = x + self.noise_std * jax.random.normal(rng, x.shape, x.dtype)
        for i, h in enumerate(self.hidden):
            x = nn.RNN(nn.OptimizedLSTMCell(h), name=f"lstm_{i}")(x)
            if train and self.dropout > 0:
                x = nn.Dropout(self.dropout, deterministic=False)(
                    x, rng=self.make_rng("dropout")
                )
        x = x[:, -1, :]  # last hidden state
        x = nn.Dense(self.outputs)(x)
        return jnp.tanh(x)


def risk_estimation(y_true: jax.Array, y_pred: jax.Array) -> jax.Array:
    """Profit loss: −100 · mean(position · realized return)."""
    return -100.0 * jnp.mean(y_true * y_pred)


def directional_accuracy(y_true, y_pred) -> jax.Array:
    return jnp.mean((jnp.sign(y_true) == jnp.sign(y_pred)).astype(jnp.float32))


def pearson(y_true, y_pred) -> jax.Array:
    yt = y_true - jnp.mean(y_true)
    yp = y_pred - jnp.mean(y_pred)
    denom = jnp.sqrt(jnp.sum(yt**2) * jnp.sum(yp**2)) + 1e-12
    return jnp.sum(yt * yp) / denom


@dataclasses.dataclass
class WindPuller:
    """Train/eval wrapper with the reference's interface shape:
    fit / evaluate / predict / save / load."""

    input_shape: tuple[int, int]  # (T, F)
    outputs: int = 1
    hidden: Sequence[int] = (64, 32)
    lr: float = 1e-3
    noise_std: float = 0.05
    dropout: float = 0.1
    seed: int = 0

    def __post_init__(self):
        self.net = WindPullerNet(
            hidden=tuple(self.hidden),
            outputs=self.outputs,
            noise_std=self.noise_std,
            dropout=self.dropout,
        )
        t, f = self.input_shape
        key = jax.random.PRNGKey(self.seed)
        self.params = self.net.init(
            {"params": key, "noise": key, "dropout": key},
            jnp.zeros((1, t, f), jnp.float32),
            train=False,
        )["params"]
        self.tx = optax.adam(self.lr)
        self.opt_state = self.tx.init(self.params)
        self._step = self._make_step()
        self._fwd = jax.jit(
            lambda p, x: self.net.apply({"params": p}, x, train=False)
        )

    def _make_step(self):
        net, tx = self.net, self.tx

        @jax.jit
        def step(params, opt_state, x, y, rng):
            def loss_fn(p):
                r1, r2 = jax.random.split(rng)
                pred = net.apply(
                    {"params": p}, x, train=True, rngs={"noise": r1, "dropout": r2}
                )
                return risk_estimation(y, pred)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        return step

    def fit(
        self,
        x_train: np.ndarray,
        y_train: np.ndarray,
        *,
        epochs: int = 10,
        batch_size: int = 64,
        validation: tuple[np.ndarray, np.ndarray] | None = None,
        checkpoint_path: str | None = None,
        verbose: bool = True,
    ) -> dict:
        """Minibatch training with checkpoint-on-best-val
        (↔ Keras ModelCheckpoint(save_best_only) — ``z/gossip2.py:109-118``)."""
        from dla_tpu.models.dataset import DataSet

        ds = DataSet(x_train, y_train, seed=self.seed)
        rng = jax.random.PRNGKey(self.seed + 1)
        history = {"loss": [], "val_loss": []}
        best = np.inf
        for epoch in range(epochs):
            losses = []
            for xb, yb in ds.epoch(batch_size):
                rng, sub = jax.random.split(rng)
                self.params, self.opt_state, loss = self._step(
                    self.params, self.opt_state, jnp.asarray(xb), jnp.asarray(yb), sub
                )
                losses.append(float(loss))
            history["loss"].append(float(np.mean(losses)))
            msg = f"epoch {epoch + 1}/{epochs} loss={history['loss'][-1]:.4f}"
            if validation is not None:
                val = self.evaluate(*validation)
                history["val_loss"].append(val["loss"])
                msg += f" val_loss={val['loss']:.4f} val_dacc={val['directional_accuracy']:.3f}"
                if checkpoint_path and val["loss"] < best:
                    best = val["loss"]
                    self.save(checkpoint_path)
                    msg += " *"
            if verbose:
                print(msg, flush=True)
        return history

    def predict(self, x: np.ndarray, batch_size: int = 256) -> np.ndarray:
        outs = []
        for i in range(0, len(x), batch_size):
            outs.append(np.asarray(self._fwd(self.params, jnp.asarray(x[i : i + batch_size]))))
        return np.concatenate(outs, axis=0)

    def evaluate(self, x: np.ndarray, y: np.ndarray) -> dict:
        pred = self.predict(x)
        yj, pj = jnp.asarray(y), jnp.asarray(pred)
        return {
            "loss": float(risk_estimation(yj, pj)),
            "directional_accuracy": float(directional_accuracy(yj, pj)),
            "pearson": float(pearson(yj, pj)),
        }

    # -- persistence (↔ z/windpuller.py:142-157 save/load) -------------------
    #
    # Two formats, chosen by path: ``*.orbax`` → an orbax-checkpoint
    # directory (the TPU-ecosystem-native format: async-capable, sharding-
    # aware, inspectable on disk), anything else → a single pickle file
    # (the reference's Keras ``save_weights`` analogue).

    def _meta(self) -> dict:
        return {
            "input_shape": tuple(self.input_shape),
            "outputs": self.outputs,
            "hidden": tuple(self.hidden),
            "lr": self.lr,
            "noise_std": self.noise_std,
            "dropout": self.dropout,
        }

    @staticmethod
    def _is_orbax(path: str) -> bool:
        return path.rstrip("/").endswith(".orbax")

    def save(self, path: str) -> None:
        flat = jax.tree_util.tree_map(np.asarray, self.params)
        if self._is_orbax(path):
            import json
            import os

            import orbax.checkpoint as ocp

            path = os.path.abspath(path)
            ocp.PyTreeCheckpointer().save(
                os.path.join(path, "params"), flat, force=True
            )
            with open(os.path.join(path, "meta.json"), "w") as f:
                json.dump(self._meta(), f)
            return
        import pickle

        with open(path, "wb") as f:
            pickle.dump({"params": flat, **self._meta()}, f)

    @classmethod
    def load(cls, path: str) -> "WindPuller":
        if cls._is_orbax(path):
            import json
            import os

            import orbax.checkpoint as ocp

            path = os.path.abspath(path)
            with open(os.path.join(path, "meta.json")) as f:
                d = json.load(f)
            params = ocp.PyTreeCheckpointer().restore(os.path.join(path, "params"))
        else:
            import pickle

            with open(path, "rb") as f:
                d = pickle.load(f)
            params = d["params"]
        wp = cls(
            input_shape=tuple(d["input_shape"]),
            outputs=d["outputs"],
            hidden=tuple(d["hidden"]),
            lr=d["lr"],
            noise_std=d["noise_std"],
            dropout=d["dropout"],
        )
        wp.params = jax.tree_util.tree_map(jnp.asarray, params)
        wp.opt_state = wp.tx.init(wp.params)
        return wp

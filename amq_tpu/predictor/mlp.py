"""MLP surrogate (flax/optax), mirroring the reference recipe.

Reference (predictor/mlp.py:9-150): 2 hidden layers of 300 ReLU units, a
0.2 dropout before the linear regressor, full-batch Adam at lr 8e-4 with
cosine annealing over 2000 epochs, SmoothL1 loss, 80/20 train/val split,
best-validation snapshot, Kaiming-uniform init.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn


class _Net(nn.Module):
    n_hidden: int = 300
    n_layers: int = 2
    drop: float = 0.2

    @nn.compact
    def __call__(self, x, train: bool = False):
        init = nn.initializers.variance_scaling(2.0, "fan_in", "uniform")
        x = nn.relu(nn.Dense(self.n_hidden, kernel_init=init)(x))
        for _ in range(self.n_layers):
            x = nn.relu(nn.Dense(self.n_hidden, kernel_init=init)(x))
        x = nn.Dropout(self.drop, deterministic=not train)(x)
        return nn.Dense(1, kernel_init=init)(x)


class MLP:
    name = "mlp"

    def __init__(self, seed: int = 0, epochs: int = 2000, lr: float = 8e-4,
                 trn_split: float = 0.8, n_hidden: int = 300):
        self.seed = seed
        self.epochs = epochs
        self.lr = lr
        self.trn_split = trn_split
        self.net = _Net(n_hidden=n_hidden)
        self.params = None

    def fit(self, train_data: np.ndarray, train_label: np.ndarray) -> None:
        X = jnp.asarray(train_data, jnp.float32)
        y = jnp.asarray(train_label, jnp.float32).reshape(-1, 1)
        n = X.shape[0]
        key = jax.random.PRNGKey(self.seed)
        key, pkey, dkey = jax.random.split(key, 3)
        perm = jax.random.permutation(pkey, n)
        n_trn = int(n * self.trn_split)
        trn_idx, vld_idx = perm[:n_trn], perm[n_trn:]

        params = self.net.init(key, X[:1], train=False)
        sched = optax.cosine_decay_schedule(self.lr, self.epochs)
        tx = optax.adam(sched)
        opt_state = tx.init(params)

        def loss_fn(p, xb, yb, rng, train):
            pred = self.net.apply(p, xb, train=train, rngs={"dropout": rng})
            return jnp.mean(optax.huber_loss(pred, yb, delta=1.0))

        @jax.jit
        def step(p, opt_state, rng):
            rng, drop = jax.random.split(rng)
            g = jax.grad(loss_fn)(p, X[trn_idx], y[trn_idx], drop, True)
            updates, opt_state = tx.update(g, opt_state, p)
            p = optax.apply_updates(p, updates)
            vld = loss_fn(p, X[vld_idx], y[vld_idx], drop, False) \
                if vld_idx.size else jnp.inf
            return p, opt_state, rng, vld

        best_loss, best_params = jnp.inf, params
        rng = dkey
        for _ in range(self.epochs):
            params, opt_state, rng, vld = step(params, opt_state, rng)
            if float(vld) < best_loss:
                best_loss = float(vld)
                best_params = params
        self.params = best_params

    def predict(self, test_data: np.ndarray) -> np.ndarray:
        assert self.params is not None, "call fit first"
        X = jnp.asarray(np.atleast_2d(test_data), jnp.float32)
        out = self.net.apply(self.params, X, train=False)
        return np.asarray(out)

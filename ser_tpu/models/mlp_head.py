"""JAX MLP classifier head with a scikit-learn-compatible API.

TPU-native replacement for the reference's sklearn ``MLPClassifier`` head
(config reference ``ser/_internal/config/schema.py:230-240``; training call
sites e.g. ``fast_training.py``). Exposes ``fit`` / ``predict`` /
``predict_proba`` / ``classes_`` so every inference path that duck-types an
sklearn estimator (including loaded legacy sklearn artifacts) works with
either implementation.

Training semantics mirror sklearn's adam solver: Glorot-uniform init, log-loss
plus ``alpha * 0.5 * ||W||² / batch_size`` L2 per minibatch, ``'auto'`` batch
= min(200, n), minibatch Adam with per-epoch shuffling, and sklearn's exact
``tol``/``n_iter_no_change`` stall accounting. The epoch is one
jitted ``lax.scan`` over fixed-shape minibatches (padded + masked), so the
whole fit runs as a handful of XLA programs regardless of dataset size.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ser_tpu._internal.config.schema import NeuralNetConfig


@dataclass
class JaxMLPClassifier:
    """Multi-layer perceptron classifier on JAX with sklearn-shaped API."""

    hidden_layer_sizes: tuple[int, ...] = (300,)
    alpha: float = 0.01
    batch_size: int | str = 256
    learning_rate_init: float = 1e-3
    epsilon: float = 1e-8
    max_iter: int = 500
    tol: float = 1e-4
    n_iter_no_change: int = 10
    random_state: int = 42

    classes_: np.ndarray | None = field(default=None, repr=False)
    _params: list[tuple[np.ndarray, np.ndarray]] | None = field(default=None, repr=False)
    n_iter_: int = field(default=0, repr=False)
    loss_: float = field(default=float("inf"), repr=False)

    @classmethod
    def from_config(cls, config: NeuralNetConfig) -> "JaxMLPClassifier":
        """Builds a head from the app-level NeuralNetConfig."""
        return cls(
            hidden_layer_sizes=tuple(config.hidden_layer_sizes),
            alpha=config.alpha,
            batch_size=config.batch_size,
            epsilon=config.epsilon,
            max_iter=config.max_iter,
            random_state=config.random_state,
        )

    # ------------------------------------------------------------------ #
    # Training
    # ------------------------------------------------------------------ #

    def fit(self, X: np.ndarray, y: np.ndarray | list) -> "JaxMLPClassifier":
        """Fits the classifier; returns self (sklearn convention)."""
        X = np.asarray(X, dtype=np.float32)
        if X.ndim != 2 or X.shape[0] == 0:
            raise ValueError("X must be a non-empty 2D array.")
        y_arr = np.asarray([str(label) for label in np.asarray(y).ravel()])
        if y_arr.shape[0] != X.shape[0]:
            raise ValueError("X and y must have the same number of samples.")

        self.classes_ = np.array(sorted(set(y_arr.tolist())))
        if len(self.classes_) < 2:
            # sklearn's MLPClassifier raises here too; a one-logit softmax
            # would "train" to a constant-prediction model silently.
            raise ValueError(
                "This solver needs samples of at least 2 classes in the data; "
                f"got {len(self.classes_)}."
            )
        class_index = {label: idx for idx, label in enumerate(self.classes_)}
        y_idx = np.asarray([class_index[label] for label in y_arr], dtype=np.int32)

        n_samples, n_features = X.shape
        n_classes = len(self.classes_)
        layer_dims = [n_features, *self.hidden_layer_sizes, n_classes]

        key = jax.random.PRNGKey(self.random_state)
        params = []
        for fan_in, fan_out in zip(layer_dims[:-1], layer_dims[1:]):
            key, sub = jax.random.split(key)
            bound = float(np.sqrt(6.0 / (fan_in + fan_out)))
            weight = jax.random.uniform(
                sub, (fan_in, fan_out), minval=-bound, maxval=bound, dtype=jnp.float32
            )
            params.append((weight, jnp.zeros((fan_out,), dtype=jnp.float32)))

        batch = min(200, n_samples) if self.batch_size == "auto" else int(self.batch_size)
        batch = max(1, min(batch, n_samples))
        n_batches = -(-n_samples // batch)
        padded = n_batches * batch

        x_dev = jnp.zeros((padded, n_features), dtype=jnp.float32).at[:n_samples].set(X)
        y_dev = jnp.zeros((padded,), dtype=jnp.int32).at[:n_samples].set(y_idx)
        mask_dev = jnp.zeros((padded,), dtype=jnp.float32).at[:n_samples].set(1.0)

        optimizer = optax.adam(self.learning_rate_init, eps=self.epsilon)
        opt_state = optimizer.init(params)

        def loss_fn(p, xb, yb, mb):
            logits = _forward(p, xb)
            log_probs = jax.nn.log_softmax(logits)
            nll = -jnp.take_along_axis(log_probs, yb[:, None], axis=1)[:, 0]
            count = jnp.maximum(jnp.sum(mb), 1.0)
            data_loss = jnp.sum(nll * mb) / count
            l2 = sum(jnp.sum(w * w) for w, _ in p)
            # sklearn divides the L2 term by the PER-BATCH sample count
            # (MLPClassifier._backprop), not the dataset size.
            return data_loss + 0.5 * self.alpha * l2 / count

        @jax.jit
        def train_epoch(p, opt_s, perm):
            xs = x_dev[perm].reshape(n_batches, batch, n_features)
            ys = y_dev[perm].reshape(n_batches, batch)
            ms = mask_dev[perm].reshape(n_batches, batch)

            def step(carry, inputs):
                p, opt_s = carry
                xb, yb, mb = inputs
                loss, grads = jax.value_and_grad(loss_fn)(p, xb, yb, mb)
                updates, opt_s = optimizer.update(grads, opt_s, p)
                p = optax.apply_updates(p, updates)
                return (p, opt_s), loss

            (p, opt_s), losses = jax.lax.scan(step, (p, opt_s), (xs, ys, ms))
            return p, opt_s, jnp.mean(losses)

        best_loss = float("inf")
        stall = 0
        shuffle_key = jax.random.PRNGKey(self.random_state + 1)
        for epoch in range(self.max_iter):
            shuffle_key, sub = jax.random.split(shuffle_key)
            perm = jax.random.permutation(sub, padded)
            params, opt_state, loss = train_epoch(params, opt_state, perm)
            loss_value = float(loss)
            self.n_iter_ = epoch + 1
            self.loss_ = loss_value
            # sklearn stall accounting (_update_no_improvement_count): the
            # counter resets only on a > tol improvement over best_loss, but
            # best_loss tracks ANY improvement, and training stops after
            # STRICTLY more than n_iter_no_change stalled epochs.
            if loss_value > best_loss - self.tol:
                stall += 1
            else:
                stall = 0
            if loss_value < best_loss:
                best_loss = loss_value
            if stall > self.n_iter_no_change:
                break

        self._params = [(np.asarray(w), np.asarray(b)) for w, b in params]
        return self

    # ------------------------------------------------------------------ #
    # Inference
    # ------------------------------------------------------------------ #

    def _require_fitted(self) -> None:
        if self._params is None or self.classes_ is None:
            raise RuntimeError("JaxMLPClassifier is not fitted.")

    def decision_function(self, X: np.ndarray) -> np.ndarray:
        self._require_fitted()
        logits = _jit_forward(
            tuple((jnp.asarray(w), jnp.asarray(b)) for w, b in self._params),
            jnp.asarray(np.asarray(X, dtype=np.float32)),
        )
        return np.asarray(logits)

    def predict_proba(self, X: np.ndarray) -> np.ndarray:
        """Class probabilities, columns ordered like ``classes_``."""
        logits = self.decision_function(X)
        exp = np.exp(logits - logits.max(axis=1, keepdims=True))
        return exp / exp.sum(axis=1, keepdims=True)

    def predict(self, X: np.ndarray) -> np.ndarray:
        """Predicted class labels."""
        self._require_fitted()
        indices = np.argmax(self.decision_function(X), axis=1)
        return self.classes_[indices]

    def score(self, X: np.ndarray, y) -> float:
        y_arr = np.asarray([str(label) for label in np.asarray(y).ravel()])
        return float(np.mean(self.predict(X) == y_arr))

    # ------------------------------------------------------------------ #
    # Serialization (plain numpy state → pickle/NPZ friendly)
    # ------------------------------------------------------------------ #

    def get_state(self) -> dict:
        """Returns a plain-python/numpy state dict for artifact persistence."""
        self._require_fitted()
        return {
            "kind": "ser_tpu_mlp",
            "hidden_layer_sizes": list(self.hidden_layer_sizes),
            "alpha": self.alpha,
            "batch_size": self.batch_size,
            "epsilon": self.epsilon,
            "max_iter": self.max_iter,
            "random_state": self.random_state,
            "classes": self.classes_.tolist(),
            "weights": [w for w, _ in self._params],
            "biases": [b for _, b in self._params],
            "n_iter": self.n_iter_,
            "loss": self.loss_,
        }

    @classmethod
    def from_state(cls, state: dict) -> "JaxMLPClassifier":
        """Rebuilds a fitted classifier from :meth:`get_state` output."""
        if state.get("kind") != "ser_tpu_mlp":
            raise ValueError("Not a ser_tpu_mlp state payload.")
        model = cls(
            hidden_layer_sizes=tuple(state["hidden_layer_sizes"]),
            alpha=state["alpha"],
            batch_size=state["batch_size"],
            epsilon=state["epsilon"],
            max_iter=state["max_iter"],
            random_state=state["random_state"],
        )
        model.classes_ = np.asarray(state["classes"])
        model._params = [
            (np.asarray(w, dtype=np.float32), np.asarray(b, dtype=np.float32))
            for w, b in zip(state["weights"], state["biases"])
        ]
        model.n_iter_ = int(state.get("n_iter", 0))
        model.loss_ = float(state.get("loss", float("inf")))
        return model


def _forward(params, x):
    """ReLU MLP forward; returns logits."""
    for weight, bias in params[:-1]:
        x = jax.nn.relu(x @ weight + bias)
    weight, bias = params[-1]
    return x @ weight + bias


@jax.jit
def _jit_forward(params, x):
    return _forward(list(params), x)


__all__ = ["JaxMLPClassifier"]

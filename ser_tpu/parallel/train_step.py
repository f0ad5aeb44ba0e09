"""Sharded end-to-end training step: encoder + classifier head on a mesh.

The north-star scale-out path (SURVEY §2.10 item 1 → "pmap/pjit data-parallel
feature extraction/training"): one jitted step computes encoder forward →
masked mean/std pool → linear+MLP head → cross-entropy → grads → SGD/Adam
update, with the batch sharded over the ``data`` axis and encoder matmuls
tensor-parallel over ``model``. XLA/GSPMD inserts the psums; nothing here
issues a collective by hand.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import optax

from ser_tpu.models.whisper import WhisperEncoder, log_mel_spectrogram
from ser_tpu.parallel.sharding import batch_sharding, encoder_param_sharding, replicated


def cross_entropy_loss(logits: jax.Array, labels: jax.Array) -> jax.Array:
    log_probs = jax.nn.log_softmax(logits)
    return -jnp.mean(jnp.take_along_axis(log_probs, labels[:, None], axis=1)[:, 0])


def encoder_classifier_loss(
    encoder: WhisperEncoder,
    encoder_params,
    head_params,
    waveform_chunks: jax.Array,
    labels: jax.Array,
) -> jax.Array:
    """Forward + loss: whisper-encoder states → mean/std pool → MLP head."""
    mel = log_mel_spectrogram(waveform_chunks, encoder.config.n_mels)
    states = encoder.apply({"params": encoder_params}, mel)
    pooled = jnp.concatenate([states.mean(axis=1), states.std(axis=1)], axis=-1)
    hidden = jax.nn.relu(pooled @ head_params["w1"] + head_params["b1"])
    logits = hidden @ head_params["w2"] + head_params["b2"]
    return cross_entropy_loss(logits, labels)


def make_sharded_train_step(encoder: WhisperEncoder, mesh, optimizer=None):
    """Builds (init_shardings, step_fn) for the sharded training step."""
    optimizer = optimizer if optimizer is not None else optax.adam(1e-4)

    @partial(jax.jit, static_argnames=())
    def step(encoder_params, head_params, opt_state, waveform, labels):
        def loss_fn(ep, hp):
            return encoder_classifier_loss(encoder, ep, hp, waveform, labels)

        loss, grads = jax.value_and_grad(loss_fn, argnums=(0, 1))(
            encoder_params, head_params
        )
        updates, opt_state = optimizer.update(
            grads, opt_state, (encoder_params, head_params)
        )
        encoder_params, head_params = optax.apply_updates(
            (encoder_params, head_params), updates
        )
        return encoder_params, head_params, opt_state, loss

    def place(encoder_params, head_params, waveform, labels):
        """Applies mesh placements to params and batch."""
        encoder_params = jax.device_put(
            encoder_params, encoder_param_sharding(mesh, encoder_params)
        )
        head_params = jax.device_put(head_params, replicated(mesh))
        waveform = jax.device_put(waveform, batch_sharding(mesh, waveform.ndim))
        labels = jax.device_put(labels, batch_sharding(mesh, 1))
        return encoder_params, head_params, waveform, labels

    return place, step, optimizer


__all__ = ["cross_entropy_loss", "encoder_classifier_loss", "make_sharded_train_step"]

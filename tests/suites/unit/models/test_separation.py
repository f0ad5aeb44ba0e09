"""Demucs-class neural separator: transform exactness, masking, dispatch.

Reference lane: ``use_demucs`` routes audio through neural source separation
before transcription (``stable_whisper.py:272-478``). These tests pin the
TPU-native separator's mechanics — the STFT/iSTFT pair must be exact, the
mask must bound the estimate by the mixture, checkpoints must round-trip with
their architecture config, and the transcription dispatcher must prefer a
staged checkpoint over the REPET-SIM fallback.
"""

from __future__ import annotations

import numpy as np
import pytest

from ser_tpu.models.separation import (
    SeparatorConfig,
    _istft,
    _stft,
    init_separator_params,
    load_separator_params,
    save_separator_params,
    separate_segments,
    separate_vocals_neural,
    separation_loss,
)

CFG = SeparatorConfig.tiny()


@pytest.fixture(scope="module")
def params():
    return init_separator_params(CFG, seed=0)


def test_stft_istft_identity():
    import jax.numpy as jnp

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((3, 4000)), dtype=jnp.float32)
    back = _istft(_stft(x, 256, 64), 256, 64, 4000)
    assert float(jnp.max(jnp.abs(back - x))) < 1e-5


def test_mask_bounds_segment_energy(params):
    import jax.numpy as jnp

    rng = np.random.default_rng(2)
    segments = jnp.asarray(
        rng.standard_normal((2, CFG.segment_samples)), dtype=jnp.float32
    )
    vocal = separate_segments(params, segments, CFG)
    assert vocal.shape == segments.shape
    assert bool(jnp.isfinite(vocal).all())
    # The sigmoid mask is in [0, 1]: per-bin the estimate magnitude can never
    # exceed the mixture, so total spectral energy is bounded too.
    mix_spec = jnp.abs(_stft(segments, CFG.n_fft, CFG.hop))
    out_spec = jnp.abs(_stft(vocal, CFG.n_fft, CFG.hop))
    assert float(jnp.sum(out_spec**2)) <= float(jnp.sum(mix_spec**2)) * 1.05


def test_full_file_overlap_blend(params):
    rng = np.random.default_rng(3)
    # 2.6 s at the tiny config's 1 s segments: forces overlapping windows.
    audio = rng.standard_normal(int(2.6 * CFG.sample_rate)).astype(np.float32)
    out = separate_vocals_neural(audio, CFG.sample_rate, params=params, config=CFG)
    assert out.shape == audio.shape and np.isfinite(out).all()
    with pytest.raises(ValueError, match="Hz"):
        separate_vocals_neural(audio, 8000, params=params, config=CFG)


def test_checkpoint_round_trip_with_config(tmp_path, params):
    import jax

    path = tmp_path / "sep.npz"
    save_separator_params(params, path, config=CFG)
    loaded, config = load_separator_params(path)
    assert config == CFG
    leaves_a = jax.tree_util.tree_leaves(params)
    leaves_b = jax.tree_util.tree_leaves(loaded)
    assert len(leaves_a) == len(leaves_b)
    assert all(np.allclose(a, b) for a, b in zip(leaves_a, leaves_b, strict=True))


def test_loss_is_finite_and_improvable(params):
    import jax.numpy as jnp

    rng = np.random.default_rng(4)
    mixture = jnp.asarray(
        rng.standard_normal((2, CFG.segment_samples)), dtype=jnp.float32
    )
    loss = separation_loss(params, mixture, mixture * 0.5, CFG)
    assert np.isfinite(float(loss))
    # Perfect target == estimate would be the zero of the time term; targets
    # at the mixture give a strictly smaller spectral term than zero targets.
    loss_zero_target = separation_loss(
        params, mixture, jnp.zeros_like(mixture), CFG
    )
    assert float(loss) != float(loss_zero_target)


def test_dispatcher_prefers_staged_checkpoint(tmp_path, params, monkeypatch):
    from ser_tpu._internal.utils import source_separation

    path = tmp_path / "sep.npz"
    save_separator_params(params, path, config=CFG)
    monkeypatch.setenv("SER_SEPARATION_MODEL_PATH", str(path))
    source_separation._NEURAL_PARAM_CACHE.clear()

    rng = np.random.default_rng(5)
    audio = rng.standard_normal(int(1.5 * CFG.sample_rate)).astype(np.float32)
    neural = source_separation.separate_vocals_auto(audio, CFG.sample_rate)
    monkeypatch.delenv("SER_SEPARATION_MODEL_PATH")
    repet = source_separation.separate_vocals_auto(audio, CFG.sample_rate)
    assert neural.shape == repet.shape == audio.shape
    # The two separators are different algorithms: outputs must differ.
    assert not np.allclose(neural, repet)


def test_separator_trains_toward_target(params):
    """Two optimizer steps on a fixed mixture must reduce the loss —
    the model is trainable end to end through the masked STFT path."""
    import jax
    import jax.numpy as jnp
    import optax

    rng = np.random.default_rng(7)
    # Mixture = vocal + structured interference; target = the vocal stem.
    vocal = jnp.asarray(
        rng.standard_normal((2, CFG.segment_samples)) * 0.5, dtype=jnp.float32
    )
    noise = jnp.asarray(
        np.sin(np.linspace(0, 800 * np.pi, CFG.segment_samples))[None, :]
        * np.ones((2, 1)),
        dtype=jnp.float32,
    )
    mixture = vocal + noise

    optimizer = optax.adam(1e-3)
    opt_state = optimizer.init(params)
    loss_grad = jax.jit(
        jax.value_and_grad(lambda p: separation_loss(p, mixture, vocal, CFG))
    )

    losses = []
    state = params
    for _ in range(3):
        loss, grads = loss_grad(state)
        losses.append(float(loss))
        updates, opt_state = optimizer.update(grads, opt_state, state)
        state = optax.apply_updates(state, updates)
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0], f"loss did not decrease: {losses}"


def test_transcriber_demucs_hook_separates_before_decode(
    tmp_path, params, monkeypatch
):
    """`use_demucs` must transform the audio BEFORE it reaches the decoder."""
    import wave

    from ser_tpu._internal.transcript.jax_whisper_backend import JaxWhisperTranscriber
    from ser_tpu._internal.utils import source_separation

    checkpoint = tmp_path / "sep.npz"
    save_separator_params(params, checkpoint, config=CFG)
    monkeypatch.setenv("SER_SEPARATION_MODEL_PATH", str(checkpoint))
    source_separation._NEURAL_PARAM_CACHE.clear()

    rng = np.random.default_rng(6)
    audio = (rng.standard_normal(16000) * 0.2).astype(np.float32)
    wav_path = tmp_path / "clip.wav"
    with wave.open(str(wav_path), "wb") as handle:
        handle.setnchannels(1)
        handle.setsampwidth(2)
        handle.setframerate(16000)
        handle.writeframes((audio * 32767).astype(np.int16).tobytes())

    captured: list[np.ndarray] = []

    class _ModelDouble:
        def transcribe_words(self, received, *, language, use_vad):
            captured.append(np.asarray(received))
            return []

    transcriber = JaxWhisperTranscriber(
        model_name="tiny", cache_root=tmp_path, use_demucs=True, use_vad=False
    )
    transcriber._model = _ModelDouble()
    assert transcriber.transcribe(str(wav_path), language="en") == []
    assert captured and captured[0].shape == audio.shape
    # Separation + spectral gate must have transformed the waveform.
    decoded = np.frombuffer(
        (audio * 32767).astype(np.int16).tobytes(), dtype=np.int16
    ).astype(np.float32) / 32768.0
    assert not np.allclose(captured[0], decoded, atol=1e-4)


def test_dispatcher_rejects_sample_rate_mismatch(tmp_path, params, monkeypatch):
    from ser_tpu._internal.utils import source_separation

    path = tmp_path / "sep8k.npz"
    import dataclasses

    save_separator_params(
        params, path, config=dataclasses.replace(CFG, sample_rate=8000)
    )
    monkeypatch.setenv("SER_SEPARATION_MODEL_PATH", str(path))
    source_separation._NEURAL_PARAM_CACHE.clear()
    audio = np.zeros(16000, dtype=np.float32)
    with pytest.raises(ValueError, match="Hz"):
        source_separation.separate_vocals_auto(audio, 16000)

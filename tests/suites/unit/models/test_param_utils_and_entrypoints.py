"""Per-owner tests for ``models/param_utils.py``, ``repr/encode_util.py``, and
``_internal/models/training_entrypoints.py``.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from ser_tpu._internal.models import training_entrypoints
from ser_tpu._internal.repr.encode_util import encode_clips
from ser_tpu.models.param_utils import cast_params_bf16


def test_cast_params_bf16_casts_float_leaves_only():
    params = {
        "dense": {"kernel": jnp.ones((4, 4), jnp.float32), "bias": jnp.zeros(4)},
        "embed": {"ids": jnp.arange(3, dtype=jnp.int32)},
        "flag": {"mask": jnp.asarray([True, False])},
    }
    cast = cast_params_bf16(params)
    assert cast["dense"]["kernel"].dtype == jnp.bfloat16
    assert cast["dense"]["bias"].dtype == jnp.bfloat16
    assert cast["embed"]["ids"].dtype == jnp.int32
    assert cast["flag"]["mask"].dtype == jnp.bool_
    # Values survive the bf16 rounding for exactly-representable inputs.
    np.testing.assert_array_equal(np.asarray(cast["dense"]["kernel"], np.float32), 1.0)


class _BatchingBackend:
    def __init__(self):
        self.batched_calls = 0

    def encode_sequences(self, clips):
        self.batched_calls += 1
        return [f"batched:{len(audio)}" for audio, _sr in clips]

    def encode_sequence(self, audio, sr):  # pragma: no cover - must not be hit
        raise AssertionError("batched backend must use encode_sequences")


class _ScalarBackend:
    def __init__(self):
        self.calls = []

    def encode_sequence(self, audio, sr):
        self.calls.append((len(audio), sr))
        return f"scalar:{len(audio)}"


def test_encode_clips_prefers_batched_protocol():
    backend = _BatchingBackend()
    clips = [(np.zeros(100), 16000), (np.zeros(200), 16000)]
    assert encode_clips(backend, clips) == ["batched:100", "batched:200"]
    assert backend.batched_calls == 1


def test_encode_clips_falls_back_to_per_clip_encode():
    backend = _ScalarBackend()
    clips = [(np.zeros(100), 16000), (np.zeros(200), 8000)]
    assert encode_clips(backend, clips) == ["scalar:100", "scalar:200"]
    assert backend.calls == [(100, 16000), (200, 8000)]


@pytest.mark.parametrize(
    ("entrypoint", "expected_profile"),
    [
        (training_entrypoints.train_medium_model, "medium"),
        (training_entrypoints.train_accurate_model, "accurate"),
        (training_entrypoints.train_accurate_research_model, "accurate-research"),
    ],
)
def test_encoder_entrypoints_dispatch_their_profile(
    monkeypatch, entrypoint, expected_profile
):
    from ser_tpu._internal.models import encoder_training

    seen = {}

    def fake_train(*, profile, settings):
        seen["profile"] = profile
        seen["settings"] = settings
        return {"ok": True}

    monkeypatch.setattr(encoder_training, "train_encoder_profile_model", fake_train)
    sentinel_settings = object()
    assert entrypoint(settings=sentinel_settings) == {"ok": True}
    assert seen["profile"] == expected_profile
    assert seen["settings"] is sentinel_settings


def test_train_fast_delegates_with_resolved_settings(monkeypatch):
    seen = {}

    def fake_train(*, settings):
        seen["settings"] = settings
        return {"ok": True}

    # training_entrypoints imported the symbol directly; patch its binding.
    monkeypatch.setattr(training_entrypoints, "train_fast_model", fake_train)
    sentinel = object()
    assert training_entrypoints.train_fast(settings=sentinel) == {"ok": True}
    assert seen["settings"] is sentinel

"""Structural contract for the demucs v4 checkpoint converter.

Behavior spec: the reference's ``use_demucs`` lane loads the published
htdemucs checkpoint (reference
``ser/_internal/transcript/backends/stable_whisper.py:272-478``). Our
converter maps that torch layout (``{"klass", "kwargs", "state"}`` wrapper
or raw state dict) into the self-describing in-house ``.npz`` the zero-egress
runtime stages. Numerics vs a torch mirror live in
``tests/suites/integration/models/test_demucs_torch_mirror.py``; this file
pins the checkpoint-file plumbing: .th reading, kwargs→config mapping,
half-precision casting, npz roundtrip, lane routing, and error reporting.
"""

from __future__ import annotations

import numpy as np
import pytest

from ser_tpu.models import demucs_v4 as dm
from ser_tpu.models._demucs_synthetic import synthetic_state_dict

CFG = dm.DemucsV4Config.tiny()


def test_convert_builds_full_tree():
    params = dm.convert_demucs_state_dict(synthetic_state_dict(CFG), CFG)
    assert len(params["encoder"]) == CFG.depth
    assert len(params["tdecoder"]) == CFG.depth
    assert len(params["crosstransformer"]["layers"]) == CFG.t_layers
    # Cross layers (even) carry norm3; self layers (odd) don't.
    assert "norm3" in params["crosstransformer"]["layers"][0]
    assert "norm3" not in params["crosstransformer"]["layers"][1]
    # Published conv layouts preserved verbatim (no transposition on convert).
    assert params["encoder"][0]["conv"]["weight"].shape == (
        CFG.channels,
        2 * CFG.audio_channels,
        CFG.kernel_size,
        1,
    )
    assert params["tdecoder"][CFG.depth - 1]["conv_tr"]["weight"].shape == (
        CFG.channels,
        len(CFG.sources) * CFG.audio_channels,
        CFG.kernel_size,
    )


def test_convert_names_first_missing_weight():
    state = synthetic_state_dict(CFG)
    del state["encoder.0.conv.weight"]
    with pytest.raises(KeyError, match="encoder.0.conv.weight"):
        dm.convert_demucs_state_dict(state, CFG)


def test_npz_roundtrip_preserves_tree_and_config(tmp_path):
    params = dm.convert_demucs_state_dict(synthetic_state_dict(CFG, seed=5), CFG)
    target = tmp_path / "htdemucs.npz"
    dm.save_demucs_npz(params, target, config=CFG)
    assert dm.is_demucs_npz(target)
    loaded, config = dm.load_demucs_npz(target)
    assert config == CFG
    np.testing.assert_array_equal(
        np.asarray(loaded["encoder"][1]["rewrite"]["weight"]),
        np.asarray(params["encoder"][1]["rewrite"]["weight"]),
    )
    np.testing.assert_array_equal(
        np.asarray(loaded["crosstransformer"]["layers_t"][2]["gamma_1"]),
        np.asarray(params["crosstransformer"]["layers_t"][2]["gamma_1"]),
    )


def test_torch_th_package_converts_end_to_end(tmp_path):
    """The released .th shape: torch.save({'klass','kwargs','state'}, half)."""
    torch = pytest.importorskip("torch")
    state = {
        key: torch.from_numpy(value).half()
        for key, value in synthetic_state_dict(CFG, seed=7).items()
    }
    kwargs = {
        "sources": list(CFG.sources),
        "audio_channels": CFG.audio_channels,
        "channels": CFG.channels,
        "depth": CFG.depth,
        "nfft": CFG.nfft,
        "bottom_channels": CFG.bottom_channels,
        "t_layers": CFG.t_layers,
        "t_heads": CFG.t_heads,
        "samplerate": CFG.sample_rate,
        "segment": CFG.segment_seconds,
    }
    source = tmp_path / "955717e8-synthetic.th"
    torch.save({"klass": "HTDemucs", "kwargs": kwargs, "state": state}, source)
    target = tmp_path / "htdemucs.npz"
    config = dm.convert_demucs_checkpoint(source, target)
    assert config == CFG
    params, loaded_config = dm.load_demucs_npz(target)
    assert loaded_config == CFG
    assert params["freq_emb"]["weight"].dtype == np.float32


def test_separate_vocals_demucs_16k_mono_lane():
    """The SER adaptation: 16 kHz mono in → vocals stem, same length/rate."""
    params = dm.init_demucs_params(CFG, seed=1)
    rng = np.random.default_rng(2)
    audio = (0.1 * rng.standard_normal(16000)).astype(np.float32)  # 1 s @ 16 kHz
    vocal = dm.separate_vocals_demucs(audio, 16000, params=params, config=CFG)
    assert vocal.shape == audio.shape
    assert vocal.dtype == np.float32
    assert np.all(np.isfinite(vocal))
    assert float(np.abs(vocal).max()) > 0.0


def test_lane_routes_staged_demucs_npz(tmp_path, monkeypatch):
    """separation lane end-to-end: converted checkpoint staged → demucs path."""
    from ser_tpu._internal.utils import source_separation

    params = dm.convert_demucs_state_dict(synthetic_state_dict(CFG, seed=9), CFG)
    staged = tmp_path / "separation.npz"
    dm.save_demucs_npz(params, staged, config=CFG)
    monkeypatch.setenv("SER_SEPARATION_MODEL_PATH", str(staged))
    rng = np.random.default_rng(3)
    audio = (0.1 * rng.standard_normal(8000)).astype(np.float32)
    out = source_separation.separate_vocals_auto(audio, 16000, settings=None)
    assert out.shape == audio.shape
    assert np.all(np.isfinite(out))


def test_explicit_model_path_routes_demucs(tmp_path, monkeypatch):
    """The transcriber plumbs TranscriptionConfig.separation_model_path as an
    explicit argument (it holds no settings object); that argument must take
    the demucs lane without any env staging."""
    from ser_tpu._internal.utils import source_separation

    params = dm.convert_demucs_state_dict(synthetic_state_dict(CFG, seed=13), CFG)
    staged = tmp_path / "sep.npz"
    dm.save_demucs_npz(params, staged, config=CFG)
    monkeypatch.delenv("SER_SEPARATION_MODEL_PATH", raising=False)
    rng = np.random.default_rng(5)
    audio = (0.1 * rng.standard_normal(4000)).astype(np.float32)
    out = source_separation.separate_vocals_auto(audio, 16000, model_path=staged)
    assert out.shape == audio.shape
    assert str(staged.resolve()) in source_separation._NEURAL_PARAM_CACHE

"""Fast-profile mel/MFCC parity against checked-in golden fixtures.

The fixtures come from an implementation independent of ``ser_tpu/ops``
(``scripts/generate_dsp_fixtures.py``; regenerable with real librosa via
``--use-librosa``), so a convention drift in the production path — mel scale,
windowing, dB reference, DCT norm — fails here instead of silently shifting
fast-profile labels.
"""

from pathlib import Path

import numpy as np
import pytest

from ser_tpu._internal.config.schema import FeatureFlags
from ser_tpu.ops.features import extract_frame_features

FIXTURE = Path(__file__).resolve().parents[3] / "fixtures/dsp/golden_mel_mfcc_v1.npz"
_SIGNALS = ("sine440", "chirp", "noise", "am_tone")
_RATES = (16000, 22050)


def _signal(name: str, sr: int) -> np.ndarray:
    import sys

    scripts = str(Path(__file__).resolve().parents[4] / "scripts")
    if scripts not in sys.path:
        sys.path.insert(0, scripts)
    import generate_dsp_fixtures as gen

    return gen.signals(sr)[name]


@pytest.fixture(scope="module")
def goldens():
    assert FIXTURE.exists(), "run scripts/generate_dsp_fixtures.py"
    with np.load(FIXTURE) as data:
        return {key: data[key] for key in data.files}


@pytest.mark.parametrize("sr", _RATES)
@pytest.mark.parametrize("name", _SIGNALS)
def test_mel_and_mfcc_match_goldens(goldens, name, sr):
    audio = _signal(name, sr)
    flags = FeatureFlags(mfcc=True, chroma=False, mel=True, contrast=False, tonnetz=False)
    features, starts, _ = extract_frame_features(audio, sr, feature_flags=flags)
    # Frame 0 covers the full 3 s signal.
    assert starts[0] == 0.0
    mfcc = features[0, :40].astype(np.float64)
    mel = features[0, 40:168].astype(np.float64)

    golden_mel = goldens[f"{name}_{sr}_mel"]
    golden_mfcc = goldens[f"{name}_{sr}_mfcc"]
    # f32 production path vs f64 golden: tolerances scaled to magnitudes.
    np.testing.assert_allclose(
        mel, golden_mel, rtol=2e-3, atol=2e-4 * max(1.0, np.abs(golden_mel).max())
    )
    np.testing.assert_allclose(
        mfcc, golden_mfcc, rtol=2e-3, atol=2e-3 * max(1.0, np.abs(golden_mfcc).max())
    )


def test_fixture_meta_documents_provenance():
    meta = FIXTURE.with_suffix(".json")
    assert meta.exists()
    import json

    payload = json.loads(meta.read_text())
    assert payload["source"] in ("librosa", "independent-numpy")
    assert payload["n_fft"] == 2048 and payload["hop"] == 512

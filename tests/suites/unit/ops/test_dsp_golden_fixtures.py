"""Fast-profile feature parity against checked-in golden fixtures.

The fixtures come from implementations independent of ``ser_tpu/ops``
(``scripts/generate_dsp_fixtures.py``; mel/mfcc/chroma/contrast regenerable
with real librosa via ``--use-librosa``), so a convention drift in the
production path — mel scale, windowing, dB reference, DCT norm, chroma tuning
estimation, contrast quantile bands, the tonnetz HPSS/pseudo-CQT pipeline —
fails here instead of silently shifting fast-profile labels.

Feature layout (reference concatenation order, ``dsp.py:106-144``):
mfcc[0:40] chroma[40:52] mel[52:180] contrast[180:187] tonnetz[187:193].
"""

from pathlib import Path

import numpy as np
import pytest

from ser_tpu._internal.config.schema import FeatureFlags
from ser_tpu.ops.features import extract_frame_features

FIXTURE = Path(__file__).resolve().parents[3] / "fixtures/dsp/golden_features_v2.npz"
_SIGNALS = ("sine440", "chirp", "noise", "am_tone")
_RATES = (16000, 22050)

_SLICES = {
    "mfcc": slice(0, 40),
    "chroma": slice(40, 52),
    "mel": slice(52, 180),
    "contrast": slice(180, 187),
    "tonnetz": slice(187, 193),
}


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


@pytest.fixture(scope="module")
def features_by_case():
    """One full-flag extraction per (signal, rate), shared across family tests."""
    flags = FeatureFlags(mfcc=True, chroma=True, mel=True, contrast=True, tonnetz=True)
    out = {}
    for sr in _RATES:
        for name in _SIGNALS:
            features, starts, _ = extract_frame_features(_signal(name, sr), sr, feature_flags=flags)
            assert starts[0] == 0.0  # frame 0 covers the full 3 s signal
            out[(name, sr)] = features[0].astype(np.float64)
    return out


@pytest.mark.parametrize("sr", _RATES)
@pytest.mark.parametrize("name", _SIGNALS)
@pytest.mark.parametrize("family", tuple(_SLICES))
def test_feature_family_matches_golden(goldens, features_by_case, name, sr, family):
    got = features_by_case[(name, sr)][_SLICES[family]]
    golden = goldens[f"{name}_{sr}_{family}"]
    assert got.shape == golden.shape
    # f32 production path vs f64 golden: tolerances scaled to magnitudes.
    # chroma/tonnetz are normalized (O(1) values); mel spans ~5 orders.
    atol_scale = {"mfcc": 2e-3, "mel": 2e-4, "chroma": 5e-3, "contrast": 2e-3, "tonnetz": 5e-3}
    np.testing.assert_allclose(
        got,
        golden,
        rtol=2e-3,
        atol=atol_scale[family] * max(1.0, np.abs(golden).max()),
    )


def test_fixture_meta_documents_provenance():
    meta = FIXTURE.with_suffix(".json")
    assert meta.exists()
    import json

    payload = json.loads(meta.read_text())
    assert payload["source"] in ("librosa", "independent-numpy")
    assert payload["n_fft"] == 2048 and payload["hop"] == 512
    assert set(payload["families"]) == set(_SLICES)

"""Drop-in ``ser`` alias package contract."""


def test_ser_package_re_exports_domain():
    import ser

    assert ser.EmotionSegment("happy", 0.0, 1.0).emotion == "happy"
    assert isinstance(ser.__version__, str)


def test_ser_submodule_imports_resolve_to_ser_tpu():
    import ser.api
    import ser.config
    import ser.profiles
    import ser_tpu.api

    assert ser.api is ser_tpu.api
    assert "infer" in ser.api.__all__
    assert ser.profiles.PROFILE_NAMES[0] == "fast"


def test_ser_nested_submodules():
    from ser.runtime.contracts import InferenceRequest
    from ser.runtime.schema import OUTPUT_SCHEMA_VERSION

    assert OUTPUT_SCHEMA_VERSION == "v1"
    assert InferenceRequest("f.wav", "en").include_transcript is True


def test_python_dash_m_ser_runs_cli():
    """`python -m ser` works like the reference's ser/__main__.py (runpy needs
    the alias loader's get_code)."""
    import subprocess
    import sys

    result = subprocess.run(
        [sys.executable, "-m", "ser", "--help"],
        capture_output=True,
        text=True,
        timeout=120,
    )
    assert result.returncode == 0, result.stderr[-400:]
    assert "usage: ser" in result.stdout

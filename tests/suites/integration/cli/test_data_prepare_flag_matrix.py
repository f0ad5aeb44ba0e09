"""CLI flag matrix for `ser data prepare` variants (in-process main())."""

import json
from pathlib import Path

import numpy as np
import pytest

from ser_tpu.__main__ import main
from ser_tpu._internal.utils.audio_io import write_wav


@pytest.fixture
def env(tmp_path, monkeypatch):
    monkeypatch.setenv("SER_TMP_FOLDER", str(tmp_path / "tmp"))
    monkeypatch.setenv("SER_MODELS_FOLDER", str(tmp_path / "models"))
    monkeypatch.setenv("SER_DATASET_FOLDER", str(tmp_path / "unused-ds"))
    return tmp_path


def _wav(path: Path):
    path.parent.mkdir(parents=True, exist_ok=True)
    tone = (0.3 * np.sin(2 * np.pi * 330 * np.arange(8000) / 16000)).astype(np.float32)
    write_wav(path, tone, 16000)


def _manifest_rows(path: str) -> list[dict]:
    return [
        json.loads(line)
        for line in Path(path).read_text(encoding="utf-8").splitlines()
        if line.strip()
    ]


def test_prepare_with_filename_strategy(env, capsys):
    root = env / "cafe"
    _wav(root / "Colère" / "a.wav")
    assert main(["data", "prepare", "cafe", "--root", str(root)]) == 0
    out = capsys.readouterr().out
    assert "Prepared cafe: 1 utterances" in out


def test_prepare_with_explicit_labels_csv(env, capsys):
    root = env / "msp"
    _wav(root / "audio" / "x.wav")
    csv = env / "labels.csv"
    csv.write_text("path,label\naudio/x.wav,happy\n", encoding="utf-8")
    assert main(
        ["data", "prepare", "msp-podcast", "--root", str(root), "--labels-csv", str(csv)]
    ) == 0
    assert "Prepared msp-podcast: 1 utterances" in capsys.readouterr().out


def test_prepare_with_existing_manifest(env, capsys):
    root = env / "ravdess"
    _wav(root / "Actor_01" / "03-01-03-01-01-01-01.wav")
    # First run writes the manifest; second registers it as-is.
    assert main(["data", "prepare", "ravdess", "--root", str(root)]) == 0
    manifest = root / "ravdess.manifest.jsonl"
    assert manifest.exists()
    assert main(
        ["data", "prepare", "ravdess", "--root", str(root), "--manifest", str(manifest)]
    ) == 0
    rows = _manifest_rows(str(manifest))
    assert any(row.get("label") == "happy" for row in rows)


def test_prepare_unknown_dataset_id_is_a_usage_error(env, capsys):
    code = main(["data", "prepare", "not-a-dataset", "--root", str(env)])
    assert code != 0


def test_prepare_empty_tree_errors(env):
    root = env / "mesd"
    root.mkdir()
    code = main(["data", "prepare", "mesd", "--root", str(root)])
    assert code != 0


def test_data_list_and_registry_render(env, capsys):
    assert main(["data", "list"]) == 0
    listed = capsys.readouterr().out
    for dataset_id in ("ravdess", "crema-d", "msp-podcast", "coraa-ser"):
        assert dataset_id in listed
    assert main(["data", "registry"]) == 0


def test_benchmark_subcommand_reports_latency_json(env, monkeypatch, capsys):
    """`ser benchmark <file>` prints the latency report (reference
    benchmarks.py:21-55 surface, now CLI-exposed)."""
    import json as _json

    from ser_tpu._internal.runtime import benchmarks

    def fake_benchmark(file_path, *, runs, settings=None):
        return benchmarks.run_latency_benchmark(lambda: None, runs=runs)

    monkeypatch.setattr(benchmarks, "benchmark_fast_predict", fake_benchmark)
    code = main(["benchmark", "clip.wav", "--runs", "3"])
    assert code == 0
    payload = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert payload["runs"] == 3
    assert set(payload) >= {"mean_seconds", "median_seconds", "p95_seconds"}


def test_download_catalog_uninstall_verbs(tmp_path):
    """Reference data verbs (data/cli.py:160-210): download = acquisition+
    prepare+register; catalog shows installed/available with compliance ids;
    uninstall removes the registry entry (and files unless --keep-files)."""
    import subprocess
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[4] / "scripts"))
    from build_synthetic_ravdess_dataset import build_dataset

    build_dataset(tmp_path / "ravdess", actors=1, repetitions=2, seconds=1.0)
    env = dict(
        __import__("os").environ,
        XDG_DATA_HOME=str(tmp_path / "xdg"),
        SER_DATASET_REGISTRY_ROOT=str(tmp_path / "reg"),
        JAX_PLATFORMS="cpu",
    )

    def run(*argv):
        return subprocess.run(
            [sys.executable, "-m", "ser_tpu", "data", *argv],
            capture_output=True,
            text=True,
            env=env,
            timeout=300,
        )

    result = run(
        "download", "--dataset", "ravdess", "--root", str(tmp_path / "ravdess"),
        "--accept-license", "--skip-download",
    )
    assert result.returncode == 0, result.stderr
    assert "Prepared ravdess" in result.stdout

    result = run("catalog")
    # Reference capability-snapshot text shape (data/cli.py:317-351).
    assert "- ravdess (RAVDESS)" in result.stdout
    assert "installed: yes" in result.stdout
    assert "policy/license: noncommercial / cc-by-nc-sa-4.0" in result.stdout
    assert "label_schema: emotion_8_class" in result.stdout
    assert "audio_files: referenced=" in result.stdout

    result = run("catalog", "--all", "--format", "json")
    import json

    payload = json.loads(result.stdout)
    rows = payload["entries"]
    assert len(rows) == 16
    assert any(r["dataset_id"] == "ravdess" and r["installed"] for r in rows)
    assert all("recommended_uses" in r and "label_schema" in r for r in rows)

    result = run("uninstall", "--dataset", "ravdess", "--keep-files")
    assert result.returncode == 0 and "files kept" in result.stdout
    assert (tmp_path / "ravdess" / "ravdess.manifest.jsonl").exists()

    result = run("uninstall", "--dataset", "ravdess")
    assert result.returncode == 2  # already removed


def test_prepare_canonical_reference_flag_names(env, capsys, monkeypatch):
    """--dataset-root/--manifest-path/--labels-csv-path are the reference's
    canonical acquisition flag names (data/cli.py:208-231)."""
    monkeypatch.setenv("SER_DATASET_REGISTRY_ROOT", str(env / "reg"))
    root = env / "cafe2"
    _wav(root / "Colère" / "a.wav")
    manifest = env / "manifests" / "cafe2.jsonl"
    assert main([
        "data", "prepare", "cafe",
        "--dataset-root", str(root),
        "--manifest-path", str(manifest),
    ]) == 0
    assert manifest.is_file()


def test_registry_show_strict_and_json(env, capsys, monkeypatch):
    """Registry inspection contract (reference data/cli.py:272-303): --show
    prints root/manifest/source-pin, --format json emits entries+issues,
    --strict exits 2 when health issues exist."""
    monkeypatch.setenv("SER_DATASET_REGISTRY_ROOT", str(env / "reg"))
    root = env / "cafe3"
    _wav(root / "Colère" / "a.wav")
    assert main(["data", "prepare", "cafe", "--dataset-root", str(root)]) == 0
    capsys.readouterr()

    assert main(["data", "registry", "--show"]) == 0
    shown = capsys.readouterr().out
    assert "dataset_root:" in shown and "source_pin:" in shown

    assert main(["data", "registry", "--format", "json"]) == 0
    payload = json.loads(capsys.readouterr().out)
    assert payload["entries"][0]["dataset_id"] == "cafe"
    assert "issues" in payload

    # Healthy registry: strict passes.
    assert main(["data", "registry", "--strict"]) == 0
    capsys.readouterr()

    # Break the registry (remove the dataset root) -> strict exits 2.
    import shutil

    shutil.rmtree(root)
    assert main(["data", "registry", "--strict"]) == 2
    out = capsys.readouterr().out
    assert "Registry health issues:" in out

#!/usr/bin/env python
"""Training-lane memory-lever ablation on the real chip.

A/B of the two HBM levers built for the encoder train step (the reference has
no encoder-training counterpart; this is the TPU-native scale-out lane):

  * optimizer: adam (mu+nu trees, ~5 GB f32 at large-v3 dims) vs adafactor
    (factored second moments, no first moment by default);
  * remat policy: 'full' (recompute everything in the bwd pass) vs 'dots'
    (save every nn.Dense output across the remat boundary — skips the matmul
    half of the recompute at ~2 GB bf16 activation cost per batch-4 step).

Each config runs in its OWN subprocess: the TPU runtime does not reliably
reclaim the prior config's ~10 GB of live state within one process (measured:
adafactor-b4 OOMs after an adam-b4 run that fits standalone), so process
isolation is the only honest A/B. A config that OOMs is recorded as
{"oom": true} rather than aborting the sweep. Emits JSON to stdout and
TRAIN_ABLATION_r03.json.

Usage: python scripts/profile_train_ablation.py [--steps 3] [--out path]
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path

import numpy as np


def run_config(optimizer_name: str, remat_policy: str, batch: int, n_steps: int) -> dict:
    import jax
    import jax.numpy as jnp
    import optax

    from ser_tpu._internal.config.schema import MeshConfig
    from ser_tpu.models.whisper import (
        CHUNK_SAMPLES,
        WhisperConfig,
        WhisperEncoder,
        init_whisper_encoder_params,
    )
    from ser_tpu.parallel.mesh import build_mesh
    from ser_tpu.parallel.train_step import (
        make_sharded_train_loop,
        place_optimizer_state,
    )

    on_tpu = any(d.platform != "cpu" for d in jax.devices())
    config = WhisperConfig() if on_tpu else WhisperConfig.tiny()
    chunk = CHUNK_SAMPLES if on_tpu else CHUNK_SAMPLES // 30

    encoder = WhisperEncoder(
        config,
        compute_dtype=jnp.bfloat16 if on_tpu else jnp.float32,
        remat=True,
        remat_policy=remat_policy,
    )
    optimizer = (
        optax.adafactor(1e-4) if optimizer_name == "adafactor" else optax.adam(1e-4)
    )
    encoder_params = init_whisper_encoder_params(config, seed=0)
    rng = np.random.default_rng(0)
    head = {
        "w1": jnp.asarray(
            rng.standard_normal((2 * config.d_model, 300)) * 0.02, jnp.float32
        ),
        "b1": jnp.zeros(300, jnp.float32),
        "w2": jnp.asarray(rng.standard_normal((300, 8)) * 0.02, jnp.float32),
        "b2": jnp.zeros(8, jnp.float32),
    }
    waveforms = jnp.asarray(
        rng.standard_normal((n_steps, batch, chunk)) * 0.1, dtype=jnp.float32
    )
    labels = jnp.asarray(rng.integers(0, 8, size=(n_steps, batch)), dtype=jnp.int32)
    mesh = build_mesh(MeshConfig(model_axis_size=1), devices=jax.devices()[:1])
    place, run_steps, optimizer = make_sharded_train_loop(
        encoder, mesh, optimizer=optimizer
    )
    with mesh:
        encoder_params, head, waveforms, labels = place(
            encoder_params, head, waveforms, labels
        )
        opt_state = place_optimizer_state(mesh, optimizer.init((encoder_params, head)))
        # Two warm dispatches: compile, then absorb the one sharding-induced
        # recompile (see bench.py _bench_train).
        for _ in range(2):
            encoder_params, head, opt_state, losses = run_steps(
                encoder_params, head, opt_state, waveforms, labels
            )
            np.asarray(losses)
        start = time.perf_counter()
        encoder_params, head, opt_state, losses = run_steps(
            encoder_params, head, opt_state, waveforms, labels
        )
        final_loss = float(np.asarray(losses)[-1])
        elapsed = time.perf_counter() - start
    assert np.isfinite(final_loss), f"loss={final_loss}"
    audio_seconds = n_steps * batch * (chunk / 16000.0)
    return {
        "optimizer": optimizer_name,
        "remat_policy": remat_policy,
        "batch": batch,
        "step_ms": round(elapsed / n_steps * 1000.0, 1),
        "audio_s_per_s": round(audio_seconds / elapsed, 1),
        "final_loss": round(final_loss, 4),
        "dims": "production" if on_tpu else "tiny",
    }


def run_single(spec: str, n_steps: int) -> int:
    """Child mode: run ONE config and print its JSON row on the last line."""
    optimizer_name, policy, batch = spec.strip().split(":")
    try:
        row = run_config(optimizer_name, policy, int(batch), n_steps)
    except Exception as err:
        msg = str(err)
        oom = (
            "RESOURCE_EXHAUSTED" in msg
            or "Out of memory" in msg.lower()
            or "oom" in msg.lower()
        )
        row = {
            "optimizer": optimizer_name,
            "remat_policy": policy,
            "batch": int(batch),
            "oom": oom,
            "error": msg.splitlines()[0][:300],
        }
    print(json.dumps(row), flush=True)
    return 0


def main() -> int:
    parser = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    parser.add_argument("--steps", type=int, default=3)
    parser.add_argument(
        "--out", type=Path, default=Path(__file__).resolve().parents[1] / "TRAIN_ABLATION_r03.json"
    )
    parser.add_argument(
        "--configs",
        default="adam:full:4,adam:dots:4,adafactor:full:4,adafactor:dots:4,adafactor:full:8,adafactor:dots:8",
        help="comma list of optimizer:remat_policy:batch",
    )
    parser.add_argument("--single", help="(internal) run one optimizer:policy:batch config")
    parser.add_argument(
        "--timeout", type=int, default=1500, help="per-config subprocess timeout (s)"
    )
    args = parser.parse_args()

    if args.single:
        return run_single(args.single, args.steps)

    import subprocess
    import sys

    results = []
    for spec in args.configs.split(","):
        spec = spec.strip()
        label = spec.replace(":", ":", 1)
        proc = subprocess.run(
            [sys.executable, __file__, "--single", spec, "--steps", str(args.steps)],
            capture_output=True,
            text=True,
            timeout=args.timeout,
        )
        row = None
        for line in reversed(proc.stdout.splitlines()):
            line = line.strip()
            if line.startswith("{"):
                row = json.loads(line)
                break
        if row is None:
            optimizer_name, policy, batch = spec.split(":")
            tail = (proc.stderr or proc.stdout).splitlines()[-1:] or [""]
            row = {
                "optimizer": optimizer_name,
                "remat_policy": policy,
                "batch": int(batch),
                "oom": "RESOURCE_EXHAUSTED" in (proc.stderr or ""),
                "error": f"subprocess exit {proc.returncode}: {tail[0][:200]}",
            }
        print(f"[{spec}] {json.dumps(row)}", flush=True)
        results.append(row)

    payload = {"configs": results, "steps_per_dispatch": args.steps}
    args.out.write_text(json.dumps(payload, indent=2) + "\n")
    print(json.dumps(payload))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

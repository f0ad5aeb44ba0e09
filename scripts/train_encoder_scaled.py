#!/usr/bin/env python
"""Scale-out encoder training driver: RAVDESS WAVs → sharded loop → checkpoints.

The end-to-end workflow the bench train lane measures, as a runnable tool:
discover labeled clips, pack them into (K, B) super-batches, train the full
whisper-encoder classifier with `make_sharded_train_loop` (K optimizer steps
per dispatch) on a dp×tp `jax.sharding.Mesh`, checkpoint the trajectory
every dispatch via `parallel/checkpoint.py`, and resume exactly with
``--resume``. Goes beyond the reference's frozen-encoder training
(classifier over embeddings, `models/training_execution.py:63-185`) — this
trains the encoder itself, the path the reference has no counterpart for.

Examples:
  # Virtual 8-device mesh, tiny dims, synthetic data:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
    python scripts/train_encoder_scaled.py --synthetic --model tiny \
      --steps 4 --batch 8 --steps-per-dispatch 2 --checkpoint /tmp/ck

  # One real chip, production dims (needs remat; batch 4 is the optimum):
  python scripts/train_encoder_scaled.py --dataset ~/ravdess --model large \
    --steps 100 --batch 4 --checkpoint ~/ck --resume
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np


def _discover_clips(dataset: Path, emotions: dict[str, str]) -> list[tuple[Path, str]]:
    from ser_tpu._internal.data.loader import extract_ravdess_emotion_code

    clips = []
    for path in sorted(dataset.rglob("*.wav")):
        code = extract_ravdess_emotion_code(path.name)
        label = emotions.get(code or "")
        if label:
            clips.append((path, label))
    return clips


def _load_batch(clips, labels_index, chunk_samples, rng):
    """Draws one (path, label) sample and returns (waveform, label, valid)."""
    from ser_tpu._internal.utils.audio_io import read_audio_file

    path, label = clips[int(rng.integers(0, len(clips)))]
    audio, sr = read_audio_file(str(path))
    if sr != 16000:
        raise SystemExit(f"{path}: expected 16 kHz WAV, got {sr}")
    valid = min(len(audio), chunk_samples)
    wave = np.zeros(chunk_samples, np.float32)
    wave[:valid] = audio[:chunk_samples]
    return wave, labels_index[label], valid


def main() -> int:
    parser = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    parser.add_argument("--dataset", type=Path, help="RAVDESS-layout folder of WAVs.")
    parser.add_argument("--synthetic", action="store_true", help="Random waveforms.")
    parser.add_argument("--model", choices=("tiny", "large"), default="large")
    parser.add_argument("--steps", type=int, default=12)
    parser.add_argument("--batch", type=int, default=4)
    parser.add_argument("--steps-per-dispatch", type=int, default=3)
    parser.add_argument("--learning-rate", type=float, default=1e-4)
    parser.add_argument(
        "--optimizer",
        choices=("adam", "adafactor"),
        default="adafactor",
        help="adafactor stores factored second moments (no mu/nu trees): "
        "frees ~5 GB of optimizer HBM at large-v3 dims, enabling bigger "
        "batches or a lighter remat policy. Measured single-chip optimum "
        "(TRAIN_ABLATION_r03.json): adafactor+dots 294.9 audio-s/s vs "
        "adam+full 250.6.",
    )
    parser.add_argument(
        "--remat-policy",
        choices=("full", "dots"),
        default="dots",
        help="'dots' saves Dense matmul outputs across the remat boundary "
        "(skips the matmul half of the recompute pass, costs ~2 GB bf16 "
        "activations at batch 4 large-v3). Fits alongside adafactor state; "
        "OOMs next to adam's mu/nu trees.",
    )
    parser.add_argument("--checkpoint", type=Path, help="Trajectory checkpoint dir.")
    parser.add_argument(
        "--checkpoint-every",
        type=int,
        default=1,
        metavar="N",
        help="Save every N dispatches (a large-v3 trajectory is ~10 GB/save).",
    )
    parser.add_argument("--resume", action="store_true")
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()
    if not args.synthetic and not args.dataset:
        parser.error("one of --dataset or --synthetic is required")

    import jax
    import jax.numpy as jnp
    import optax

    from ser_tpu._internal.config.settings_builder import RAVDESS_EMOTIONS
    from ser_tpu.config import reload_settings
    from ser_tpu._internal.utils.jax_runtime import honor_platform_env
    from ser_tpu.models.whisper import (
        CHUNK_SAMPLES,
        WhisperConfig,
        WhisperEncoder,
        init_whisper_encoder_params,
    )
    from ser_tpu.parallel.checkpoint import restore_train_state, save_train_state
    from ser_tpu.parallel.mesh import build_mesh
    from ser_tpu.parallel.train_step import (
        make_sharded_train_loop,
        place_optimizer_state,
    )

    honor_platform_env()
    labels = sorted(set(RAVDESS_EMOTIONS.values()))
    labels_index = {label: i for i, label in enumerate(labels)}
    config = WhisperConfig() if args.model == "large" else WhisperConfig.tiny()
    on_accel = jax.default_backend() not in ("cpu",)
    encoder = WhisperEncoder(
        config,
        compute_dtype=jnp.bfloat16 if on_accel else jnp.float32,
        remat=True,
        remat_policy=args.remat_policy,
    )

    rng = np.random.default_rng(args.seed)
    clips = None
    if args.dataset:
        clips = _discover_clips(args.dataset.expanduser(), dict(RAVDESS_EMOTIONS))
        if not clips:
            raise SystemExit(f"No labeled RAVDESS WAVs under {args.dataset}")
        print(f"{len(clips)} labeled clips, {len(labels)} classes")

    mesh = build_mesh(reload_settings().mesh)  # SER_MESH_* env controls dp×tp
    print(f"mesh: data={mesh.shape['data']} model={mesh.shape['model']}")
    if args.batch % mesh.shape["data"]:
        raise SystemExit(
            f"--batch {args.batch} must be divisible by the mesh data axis "
            f"({mesh.shape['data']}; set SER_MESH_DATA_AXIS_SIZE/"
            f"SER_MESH_MODEL_AXIS_SIZE to reshape)."
        )
    optimizer = (
        optax.adafactor(args.learning_rate)
        if args.optimizer == "adafactor"
        else optax.adam(args.learning_rate)
    )
    place, run_steps, optimizer = make_sharded_train_loop(
        encoder, mesh, optimizer=optimizer
    )

    head_rng = np.random.default_rng(args.seed)
    head = {
        "w1": jnp.asarray(
            head_rng.standard_normal((2 * config.d_model, 300)) * 0.02, jnp.float32
        ),
        "b1": jnp.zeros(300, jnp.float32),
        "w2": jnp.asarray(
            head_rng.standard_normal((300, len(labels))) * 0.02, jnp.float32
        ),
        "b2": jnp.zeros(len(labels), jnp.float32),
    }
    encoder_params = init_whisper_encoder_params(config, seed=args.seed)

    k, batch = args.steps_per_dispatch, args.batch

    def super_batch():
        waves = np.zeros((k, batch, CHUNK_SAMPLES), np.float32)
        labs = np.zeros((k, batch), np.int32)
        valid = np.full((k, batch), CHUNK_SAMPLES, np.int32)
        for i in range(k):
            for j in range(batch):
                if clips is None:
                    waves[i, j] = 0.1 * rng.standard_normal(CHUNK_SAMPLES)
                    labs[i, j] = rng.integers(0, len(labels))
                else:
                    waves[i, j], labs[i, j], valid[i, j] = _load_batch(
                        clips, labels_index, CHUNK_SAMPLES, rng
                    )
        return jnp.asarray(waves), jnp.asarray(labs), jnp.asarray(valid)

    from ser_tpu.parallel.sharding import stacked_batch_sharding

    def place_batch(waves, labs, valid):
        waves = jax.device_put(waves, stacked_batch_sharding(mesh, 3))
        labs = jax.device_put(labs, stacked_batch_sharding(mesh, 2))
        valid = jax.device_put(valid, stacked_batch_sharding(mesh, 2))
        return waves, labs, valid

    with mesh:
        waves, labs, valid = super_batch()
        encoder_params, head, waves, labs = place(encoder_params, head, waves, labs)
        _, _, valid = place_batch(waves, labs, valid)
        opt_state = place_optimizer_state(mesh, optimizer.init((encoder_params, head)))
        step = 0
        ckpt_path = args.checkpoint / "trainstate" if args.checkpoint else None
        if args.resume and ckpt_path and ckpt_path.exists():
            encoder_params, head, opt_state, step = restore_train_state(
                ckpt_path,
                mesh=mesh,
                encoder_params_like=encoder_params,
                head_params_like=head,
                opt_state_like=opt_state,
            )
            print(f"resumed at step {step}")

        dispatch = 0
        while step < args.steps:
            start = time.perf_counter()
            encoder_params, head, opt_state, losses = run_steps(
                encoder_params, head, opt_state, waves, labs, valid
            )
            losses = np.asarray(losses)  # completion barrier (remote-safe)
            elapsed = time.perf_counter() - start
            step += k
            audio_s = k * batch * CHUNK_SAMPLES / 16000.0
            print(
                f"step {step:>5}  loss {losses[-1]:.4f}  "
                f"{audio_s / elapsed:7.1f} audio_s/s  {elapsed / k * 1000:6.0f} ms/step"
            )
            dispatch += 1
            if ckpt_path and (
                dispatch % args.checkpoint_every == 0 or step >= args.steps
            ):
                save_train_state(
                    ckpt_path,
                    encoder_params=encoder_params,
                    head_params=head,
                    opt_state=opt_state,
                    step=step,
                )
            if step < args.steps:
                waves, labs, valid = place_batch(*super_batch())
    print("done")
    return 0


if __name__ == "__main__":
    sys.exit(main())

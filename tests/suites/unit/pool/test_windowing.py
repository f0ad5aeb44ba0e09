

def test_window_starts_bitwise_match_reference_accumulation():
    """The plan's cursors must equal the reference's `cursor += stride`
    float sequence BIT FOR BIT (non-dyadic strides round differently under
    `stride * arange(n)`; serialized timestamps are part of the parity
    contract)."""
    import numpy as np

    from ser_tpu._internal.repr import EncodedSequence

    def reference_loop(clip_start, clip_end, window, stride):
        eff = min(window, clip_end - clip_start)
        eps = 1e-9
        wins, cursor = [], clip_start
        while cursor + eff <= clip_end + eps:
            wins.append((cursor, min(clip_end, cursor + eff)))
            cursor += stride
        if wins and wins[-1][1] < clip_end - eps:
            tail = (max(clip_start, clip_end - eff), clip_end)
            if not (
                np.isclose(wins[-1][0], tail[0]) and np.isclose(wins[-1][1], tail[1])
            ):
                wins.append(tail)
        return wins

    for clip_end, window, stride in [
        (10.0, 1.0, 0.1),
        (3600.0, 1.0, 0.1),
        (61.33, 2.0, 0.3),
    ]:
        n_frames = max(2, int(clip_end / 0.02))
        fs = np.linspace(0.0, clip_end - 0.02, n_frames)
        encoded = EncodedSequence(
            embeddings=np.zeros((n_frames, 4), dtype=np.float32),
            frame_start_seconds=fs,
            frame_end_seconds=np.append(fs[1:], clip_end),
            backend_id="handcrafted",
        )
        from ser_tpu._internal.pool.windowing import temporal_pooling_windows

        ours = [
            (w.start_seconds, w.end_seconds)
            for w in temporal_pooling_windows(
                encoded, window_size_seconds=window, window_stride_seconds=stride
            )
        ]
        ref = reference_loop(float(fs[0]), clip_end, window, stride)
        assert ours == ref  # exact float equality, not approx

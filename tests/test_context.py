import numpy as np

from aniportrait_tpu.pipelines.context import (
    get_context_scheduler,
    ordered_halving,
    uniform_context_windows,
    windows_for_all_steps,
)


def test_ordered_halving_bit_reversal():
    assert ordered_halving(0) == 0.0
    assert ordered_halving(1) == 0.5
    assert ordered_halving(2) == 0.25
    assert ordered_halving(3) == 0.75


def test_short_video_single_window():
    w = uniform_context_windows(0, num_frames=12, context_size=16)
    assert w.shape == (1, 12)
    assert list(w[0]) == list(range(12))


def test_windows_cover_all_frames():
    for step in range(5):
        w = uniform_context_windows(
            step, num_frames=72, context_size=16, context_overlap=4
        )
        assert w.shape[1] == 16
        covered = set(w.flatten().tolist())
        assert covered == set(range(72)), f"step {step} missed frames"
        assert w.min() >= 0 and w.max() < 72


def test_matches_generator():
    sched = get_context_scheduler("uniform")
    for step in (0, 3, 7):
        gen = list(
            sched(
                step=step,
                num_steps=25,
                num_frames=100,
                context_size=16,
                context_stride=3,
                context_overlap=4,
            )
        )
        arr = uniform_context_windows(step, 100, 16, 3, 4)
        assert [list(x) for x in arr] == gen


def test_context_windows_golden():
    """The closed-form scheduler must be bit-identical to the reference
    generator's output (golden tables captured from the verified round-1
    implementation across 120 (frames, step, size, overlap, stride, loop)
    combinations)."""
    import pathlib

    from aniportrait_tpu.pipelines.context import uniform

    d = np.load(pathlib.Path(__file__).parent / "fixtures" / "context_windows_golden.npz")
    for i, (n, step, size, ov, cs, loop) in enumerate(d["cases"]):
        wins = list(
            uniform(
                step=int(step),
                num_frames=int(n),
                context_size=int(size),
                context_stride=int(cs),
                context_overlap=int(ov),
                closed_loop=bool(loop),
            )
        )
        flat = (
            np.concatenate([np.asarray(w, np.int32) for w in wins])
            if wins
            else np.zeros(0, np.int32)
        )
        lens = np.asarray([len(w) for w in wins], np.int32)
        assert np.array_equal(flat, d[f"flat_{i}"]), (i, n, step, size, ov, cs, loop)
        assert np.array_equal(lens, d[f"lens_{i}"])


def test_all_steps_table():
    tab = windows_for_all_steps(num_steps=25, num_frames=48)
    assert len(tab) == 25
    for w in tab:
        assert w.shape[1] == 16

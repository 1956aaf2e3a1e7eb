"""I-DT fixation detection tests (synthetic gaze with known structure)."""

import numpy as np

from gaze_tpu.data.fixation import detect_fixations_idt, fixation_segments
from gaze_tpu.data.synthetic import SyntheticSpec, generate_sequence


class TestIDT:
    def test_hold_then_jump(self):
        gaze = np.concatenate(
            [
                np.full((10, 2), 100.0) + np.random.default_rng(0).normal(0, 1, (10, 2)),
                np.linspace([100, 100], [400, 300], 4),
                np.full((10, 2), 400.0) + np.random.default_rng(1).normal(0, 1, (10, 2)),
            ]
        )
        labels = detect_fixations_idt(gaze, dispersion_px=25.0, min_duration=3)
        assert labels[:9].all() and labels[-9:].all()
        # the saccade frames in the middle must not all be fixation
        assert labels[10:14].sum() < 4

    def test_pure_saccade_never_fixates(self):
        gaze = np.linspace([0, 0], [600, 400], 30)
        labels = detect_fixations_idt(gaze, dispersion_px=10.0, min_duration=3)
        assert labels.sum() == 0

    def test_min_duration(self):
        # 2-frame hold is below min_duration=3 -> no fixation
        gaze = np.array([[0, 0], [300, 0], [300, 1], [600, 0], [900, 0]], float)
        labels = detect_fixations_idt(gaze, dispersion_px=25.0, min_duration=3)
        assert labels.sum() == 0

    def test_recovers_synthetic_fixation_structure(self):
        """Labels inferred from the synthetic generator's gaze track must
        agree with its ground-truth fixsac on most fixation frames."""
        _, gaze, fixsac = generate_sequence(
            SyntheticSpec(num_frames=64, fixation_len=8, saccade_len=3)
        )
        labels = detect_fixations_idt(gaze, dispersion_px=10.0, min_duration=3)
        agreement = (labels == fixsac).mean()
        assert agreement > 0.85, agreement

    def test_segments(self):
        fx = np.array([0, 1, 1, 0, 1, 1, 1], np.float32)
        assert fixation_segments(fx) == [(1, 3), (4, 7)]

"""Pixel-level log-plotter regression against committed golden PNGs
(reference: tests/test_log_plotter.py:12-43 compares its figure set to
tests/test_data/*.png at tol=0 via matplotlib.testing.compare).

The golden set is generated from a deterministic synthetic log with
matplotlib's Agg backend; regenerate with VASP_REGEN_GOLDEN=1 after an
intentional figure change. Comparison uses a small RMS tolerance to absorb
font-rendering differences across matplotlib point releases (the reference
pins its matplotlib version in CI instead)."""
import os
from pathlib import Path

import matplotlib

matplotlib.use("Agg")

from matplotlib.testing.compare import compare_images  # noqa: E402

from vasp_tpu.postprocessing.log_plotter import (  # noqa: E402
    parse_log_file,
    plot_all,
    plot_compare_cycles,
)

GOLDEN_DIR = Path(__file__).parent / "golden_images" / "log_plotter"

# the reference's golden figure set (reference tests/test_data: test_all/,
# test_compare_cycles/) restricted to the deterministic synthetic log below
GOLDEN_FIGS = [
    "flow_rate.png",
    "velocity.png",
    "cfl.png",
    "reynolds_numbers.png",
    "probe_points.png",
    "probe_points_displacement.png",
    "compare_cycles/flow_rate_comparison.png",
    "compare_cycles/probe_points_comparison_0.png",
]


def _synthetic_log(path):
    import numpy as np

    lines = []
    for step in range(1, 17):
        t = step * 0.001
        v = 0.1 * (1 + np.sin(2 * np.pi * t / 0.004))
        lines += [
            f"Probe Point 0: Velocity: ({v:.6f}, 0.0, 0.0) | "
            f"Pressure: {100.0 * v:.6f}",
            f"Probe Point 0: Displacement: ({1e-6 * step}, 0.0, 0.0)",
            "Flow Properties:",
            f"  Flow Rate at Inlet: {1e-6 * v:.8e}",
            f"  Velocity (mean, min, max): {v:.6f}, {0.1 * v:.6f}, "
            f"{2 * v:.6f}",
            "  CFL (mean, min, max): 0.1, 0.01, 0.2",
            f"  Reynolds Numbers (mean, min, max): {100 * v:.4f}, 1.0, "
            f"{200 * v:.4f}",
            f"Solved for timestep {step}, t = {t:.4f} in 1.0 s",
        ]
    path.write_text("\n".join(lines) + "\n")


def _render(out_dir):
    log_file = out_dir / "run.log"
    _synthetic_log(log_file)
    data = parse_log_file(log_file)
    plot_all(data, out_dir, period=0.004)
    plot_compare_cycles(data, out_dir / "compare_cycles", period=0.004)


def test_log_plotter_golden_images(tmp_path):
    regen = os.environ.get("VASP_REGEN_GOLDEN") == "1"
    if regen:
        GOLDEN_DIR.mkdir(parents=True, exist_ok=True)
        (GOLDEN_DIR / "compare_cycles").mkdir(exist_ok=True)
        _render(GOLDEN_DIR)
        return
    assert GOLDEN_DIR.exists(), (
        "golden images missing; run with VASP_REGEN_GOLDEN=1 to create")
    _render(tmp_path)
    failures = []
    for name in GOLDEN_FIGS:
        expected = GOLDEN_DIR / name
        actual = tmp_path / name
        assert expected.exists(), f"golden {name} missing"
        assert actual.exists(), f"figure {name} not produced"
        # rms tolerance 10 (0-255 scale): catches layout/data/scale
        # regressions while absorbing antialiasing/font raster drift
        diff = compare_images(str(expected), str(actual), tol=10)
        if diff is not None:
            failures.append(diff)
    assert not failures, failures

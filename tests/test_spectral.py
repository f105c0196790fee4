"""Spectral stack: PSD/spectrogram vs scipy reference, chroma/SBI sanity,
filters, windowed RMS (reference parity targets in
postprocessing_h5py/spectrograms.py)."""
import numpy as np
import pytest
from scipy.signal import periodogram, spectrogram as scipy_spectrogram

from vasp_tpu.postprocessing.spectral import core as spec


@pytest.fixture(scope="module")
def signals():
    rng = np.random.default_rng(0)
    fs = 1000.0
    t = np.arange(2000) / fs
    base = np.sin(2 * np.pi * 50 * t) + 0.5 * np.sin(2 * np.pi * 120 * t)
    data = base[None, :] + 0.1 * rng.standard_normal((6, len(t)))
    return data, fs, t


def test_psd_matches_scipy(signals):
    data, fs, t = signals
    Pxx, f = spec.get_psd(data, fs, scaling="density")
    ref = np.zeros_like(Pxx)
    for row in data:
        fr, P = periodogram(row, fs=fs, window="blackmanharris",
                            scaling="density")
        ref += P
    ref /= len(data)
    assert np.allclose(f, fr)
    assert np.allclose(Pxx, ref, rtol=1e-8, atol=1e-12)
    # dominant peak at 50 Hz
    assert abs(f[np.argmax(Pxx)] - 50.0) < 2.0


def test_spectrogram_matches_scipy(signals):
    data, fs, t = signals
    n_window = 4
    Pxx, freqs, bins = spec.get_spectrogram(data, fs, n_window,
                                            overlap_frac=0.75,
                                            window="blackmanharris")
    NFFT = spec.shift_bit_length(int(data.shape[1] / n_window))
    ref = None
    for row in data:
        fr, br, P = scipy_spectrogram(
            row, fs=fs, nperseg=NFFT, noverlap=int(0.75 * NFFT),
            nfft=2 * NFFT, window="blackmanharris", scaling="spectrum",
        )
        ref = P if ref is None else ref + P
    ref /= len(data)
    assert Pxx.shape == ref.shape
    assert np.allclose(freqs, fr)
    assert np.allclose(bins, br)
    assert np.allclose(Pxx, ref, rtol=1e-6, atol=1e-12)


def test_highpass_filter(signals):
    data, fs, t = signals
    filtered = spec.filter_time_data(data, fs, lowcut=80.0, order=6,
                                     btype="highpass")
    Pxx, f = spec.get_psd(filtered, fs)
    # 50 Hz killed, 120 Hz survives
    p50 = Pxx[np.argmin(np.abs(f - 50))]
    p120 = Pxx[np.argmin(np.abs(f - 120))]
    assert p120 > 100 * p50


def test_chroma_and_sbi(signals):
    data, fs, t = signals
    Pxx, freqs, bins = spec.get_spectrogram(data, fs, 4)
    n_fft = 2 * spec.shift_bit_length(int(data.shape[1] / 4))
    chroma = spec.chromagram_from_spectrogram(Pxx, fs, n_fft, n_chroma=24,
                                              norm="sum")
    assert chroma.shape[0] == 24
    assert np.allclose(chroma.sum(axis=0), 1.0)
    sbi = spec.calc_chroma_entropy(chroma, 24)
    assert np.all(sbi >= -1e-9) and np.all(sbi <= 1.0 + 1e-9)
    # a pure tone is maximally banded: SBI of a single-sine spectrogram must
    # exceed SBI of white noise
    rng = np.random.default_rng(1)
    noise = rng.standard_normal((6, data.shape[1]))
    Pn, _, _ = spec.get_spectrogram(noise, fs, 4)
    chn = spec.chromagram_from_spectrogram(Pn, fs, n_fft, n_chroma=24,
                                           norm="sum")
    assert sbi.mean() > spec.calc_chroma_entropy(chn, 24).mean()


def test_windowed_rms():
    t = np.linspace(0, 1, 1000)
    sig = np.sin(2 * np.pi * 100 * t)
    rms = spec.calculate_windowed_rms(sig, 100)
    # RMS of a unit sine ~ 1/sqrt(2)
    assert abs(rms[400:600].mean() - 1 / np.sqrt(2)) < 0.02


def test_sonify(tmp_path, signals):
    data, fs, t = signals
    path = spec.sonify(data[0], 44100, tmp_path / "tone.wav")
    assert path.exists()
    from scipy.io import wavfile

    rate, wav = wavfile.read(path)
    assert rate == 44100 and len(wav) == data.shape[1]


def test_spectral_pipeline_on_run(cylinder_run, tmp_path):
    """End-to-end: transformed matrix -> composite figures + spectrum +
    hi-pass viz on a real simulation output."""
    from vasp_tpu.postprocessing.spectral.transform import (
        create_transformed_matrix,
        read_spectrogram_data,
    )
    from vasp_tpu.postprocessing.spectral.figures import (
        create_spectrogram_composite,
        create_spectrum,
    )
    from vasp_tpu.postprocessing.spectral.hi_pass_viz import (
        create_hi_pass_viz,
    )

    ns, log, folder = cylinder_run
    comps, times, out = create_transformed_matrix(folder, "v")
    assert set(comps) == {"x", "y", "z", "mag"}
    assert comps["mag"].shape[1] == 3
    assert (out / "v_mag.npz").exists()

    data, times2, fs = read_spectrogram_data(folder, quantity="v",
                                             n_samples=50)
    assert data.shape[1] == 3 and len(data) > 0

    res = create_spectrogram_composite(
        "cyl", "v", data, times2, times2[0], times2[-1],
        num_windows_per_sec=1, overlap_frac=0.5, window="blackmanharris",
        lowcut=1.0, min_color=-30, max_color=0,
        image_folder=tmp_path / "Spectrograms",
    )
    for fig in res["figures"]:
        assert fig.exists()
    assert (tmp_path / "Spectrograms" / "v_sbi_cyl.csv").exists()

    create_spectrum("cyl", "v", data, times2, times2[0], times2[-1],
                    tmp_path / "Spectrograms", lowcut=0.0)

    out2 = create_hi_pass_viz(folder, quantity="d", lowcut=100.0,
                              highcut=450.0)
    hp = folder / "Visualization_hi_pass"
    assert (hp / "d_100_to_450.xdmf").exists()
    assert (hp / "d_100_to_450_amplitude.h5").exists()
    assert (hp / "d_100_to_450_amplitude_percentiles.csv").exists()
    assert np.all(np.isfinite(out2["filtered"]))

    # chunked == batched, exactly (the streamed paths for runs too big to
    # hold in memory — the hemodynamics chunking pattern ported to the
    # spectral pivot and hi-pass stages, VERDICT r3 #7):
    # (a) the pivot written in 1-timestep chunks
    comps1, times1, out1 = create_transformed_matrix(
        folder, "v", chunk_steps=1, out_folder=tmp_path / "npz_chunk")
    for c in comps:
        assert np.array_equal(np.asarray(comps1[c]), np.asarray(comps[c]))
    # (b) the filter + RMS amplitude computed in 1-row node chunks
    f_batch = np.asarray(out2["filtered"])
    a_batch = np.asarray(out2["amplitude"])
    out3 = create_hi_pass_viz(folder, quantity="d", lowcut=100.0,
                              highcut=450.0, node_chunk=1)
    assert np.array_equal(np.asarray(out3["filtered"]), f_batch)
    assert np.array_equal(np.asarray(out3["amplitude"]), a_batch)
    # the sampled reader materializes only its selected rows (memmap-backed)
    assert (out / "v_mag.npy").exists()

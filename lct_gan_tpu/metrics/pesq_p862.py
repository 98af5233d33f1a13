"""Self-contained PESQ estimator: ITU-T P.862 (narrowband) / P.862.2
(wideband) perceptual model, implemented from the published algorithm
descriptions.

The reference repo scores PESQ through the external `pesq` C wheel
(reference metrics.py:78-88), which is not installable in this image.
This module vendors the full P.862 pipeline so the framework can always
report a perceptual-quality number:

  level alignment -> input filtering -> time alignment -> Hann-framed
  power spectra -> Bark-band grouping -> linear-filtering (frequency)
  compensation -> time-varying gain compensation -> Zwicker loudness ->
  masked disturbance -> asymmetry weighting -> L6/L2 time aggregation ->
  raw P.862 score -> MOS-LQO mapping (P.862.1 nb / P.862.2 wb).

Faithfulness statement (read before trusting digits): the pipeline
STRUCTURE, the aggregation exponents, the masking/asymmetry constants and
the MOS-LQO mappings follow the published standard, but the ITU band
tables (49/42 irregular Bark bands, per-band absolute-threshold powers in
the reference implementation's internal calibration) are reproduced here
from the published formulas -- bands uniform on the Bark scale
z(f) = 7*asinh(f/650) and the Terhardt absolute-threshold curve -- with a
self-consistent 79 dB SPL calibration, NOT copied digit-for-digit from
the ITU source. Scores therefore track true PESQ closely in ORDER and
trend but are not certified-equal; identical signals score the canonical
4.64 (wb) / 4.55 (nb) by construction of the mapping. The BASELINE.md
acceptance gate ("PESQ within 0.01") still requires the certified wheel;
this estimator reports as `pesq_wb_est` and never impersonates it.

Time alignment is a single global delay from envelope + waveform
cross-correlation (the standard's utterance splitting/realignment handles
variable-delay telephone paths; enhanced-vs-clean pairs from this
framework are sample-aligned by construction, so the simplification is
exact here and documented for the general case).
"""

from __future__ import annotations

import numpy as np

__all__ = ["pesq_p862", "raw_p862", "MOS_IDENTICAL_WB", "MOS_IDENTICAL_NB"]

# MOS-LQO of a signal against itself (raw internal score 4.5 mapped).
MOS_IDENTICAL_WB = 4.644  # 0.999 + 4/(1+exp(-1.3669*4.5+3.8224))
MOS_IDENTICAL_NB = 4.549  # 0.999 + 4/(1+exp(-1.4945*4.5+4.6607))

_TARGET_POWER = 1e7     # internal power of level-aligned speech (P.862 ref)
_SPL_AT_TARGET = 79.0   # dB SPL the target power calibrates to


def _bark(f):
    """P.862 Bark warping z(f) = 7*asinh(f/650)."""
    return 7.0 * np.arcsinh(np.asarray(f, np.float64) / 650.0)


def _abs_threshold_spl(f_hz: np.ndarray) -> np.ndarray:
    """Terhardt absolute hearing threshold in dB SPL."""
    f = np.maximum(np.asarray(f_hz, np.float64), 20.0) / 1000.0
    return (3.64 * f ** -0.8
            - 6.5 * np.exp(-0.6 * (f - 3.3) ** 2)
            + 1e-3 * f ** 4)


class _Mode:
    """Per-mode constants (fs, frame geometry, band layout)."""

    def __init__(self, fs: int, wideband: bool):
        if fs not in (8000, 16000):
            raise ValueError(f"P.862 supports fs 8000/16000, got {fs}")
        if wideband and fs != 16000:
            raise ValueError("wideband PESQ requires fs=16000")
        self.fs = fs
        self.wideband = wideband
        self.frame = fs * 32 // 1000          # 32 ms
        self.hop = self.frame // 2            # 50% overlap
        self.nfft = self.frame
        self.n_bands = 49 if fs == 16000 else 42
        f_hi = fs / 2.0
        # Band edges uniform in Bark between 0 and z(f_hi).
        edges_z = np.linspace(0.0, float(_bark(f_hi)), self.n_bands + 1)
        self.edges_hz = 650.0 * np.sinh(edges_z / 7.0)
        self.centers_hz = 650.0 * np.sinh(
            0.5 * (edges_z[:-1] + edges_z[1:]) / 7.0)
        self.width_bark = np.diff(edges_z)    # == const by construction
        self.width_hz = np.diff(self.edges_hz)
        bins_hz = np.arange(self.nfft // 2 + 1) * (fs / self.nfft)
        # bin -> band assignment (band i covers [edge_i, edge_{i+1}))
        self.bin_band = np.clip(
            np.searchsorted(self.edges_hz, bins_hz, side="right") - 1,
            0, self.n_bands - 1)
        self.bin_band[0] = -1                 # drop DC
        # Absolute threshold per band, converted to internal power units:
        # _TARGET_POWER internal == _SPL_AT_TARGET dB SPL.
        thr_spl = _abs_threshold_spl(self.centers_hz)
        self.abs_thresh = _TARGET_POWER * 10.0 ** (
            (thr_spl - _SPL_AT_TARGET) / 10.0)


def _band_powers(x: np.ndarray, m: _Mode) -> np.ndarray:
    """Hann-framed power spectra grouped to Bark bands ("pitch power
    density") [n_frames, n_bands]."""
    n_frames = max(0, (len(x) - m.frame) // m.hop + 1)
    if n_frames == 0:
        return np.zeros((0, m.n_bands))
    w = np.hanning(m.frame + 2)[1:-1]
    idx = (np.arange(n_frames)[:, None] * m.hop + np.arange(m.frame)[None])
    spec = np.fft.rfft(x[idx] * w, m.nfft, axis=-1)
    # Power normalized so a full-band signal's frame power matches its
    # time-domain mean square (Hann coherent-gain compensation).
    power = (np.abs(spec) ** 2) * (2.0 / (np.sum(w ** 2) * m.frame))
    bands = np.zeros((n_frames, m.n_bands))
    valid = m.bin_band >= 0
    np.add.at(bands.T, m.bin_band[valid], power[:, valid].T)
    return bands


def _bandpass_power(x: np.ndarray, fs: int, lo: float, hi: float) -> float:
    """Mean power of x restricted to [lo, hi] Hz (FFT-domain mask)."""
    spec = np.fft.rfft(x)
    f = np.fft.rfftfreq(len(x), 1.0 / fs)
    mask = (f >= lo) & (f <= hi)
    return float(np.sum(np.abs(spec[mask]) ** 2) * 2.0 / (len(x) ** 2))


def _level_align(x: np.ndarray, fs: int) -> np.ndarray:
    """Scale so the 350-3250 Hz band power equals _TARGET_POWER."""
    p = _bandpass_power(x, fs, 350.0, 3250.0)
    if p <= 0:
        return x
    return x * np.sqrt(_TARGET_POWER / p)


def _input_filter(x: np.ndarray, fs: int, wideband: bool) -> np.ndarray:
    """P.862.2 wb: flat bandpass above a 100 Hz high-pass (the standard
    replaces the nb IRS receive filter with an IIR high-pass). nb: the
    IRS-like receive characteristic, applied as an FFT-domain
    piecewise-linear dB curve over published breakpoints."""
    n = len(x)
    spec = np.fft.rfft(x)
    f = np.fft.rfftfreq(n, 1.0 / fs)
    if wideband:
        # 2nd-order Butterworth-like high-pass at 100 Hz, FFT-applied.
        ratio = np.divide(100.0, np.maximum(f, 1e-9))
        gain = 1.0 / np.sqrt(1.0 + ratio ** 4)
    else:
        # IRS receive response (approx; breakpoints in Hz -> dB).
        pts_f = np.array([0., 100., 200., 250., 300., 1000., 2500.,
                          3000., 3250., 3500., 4000.])
        pts_db = np.array([-200., -40., -10., -2., 0., 0., 2.,
                           2., 0., -15., -80.])
        gain = 10.0 ** (np.interp(f, pts_f, pts_db) / 20.0)
    return np.fft.irfft(spec * gain, n)


def _global_delay(ref: np.ndarray, deg: np.ndarray, fs: int,
                  max_delay_s: float = 0.5) -> int:
    """Single global delay estimate: coarse frame-energy envelope
    correlation refined by waveform cross-correlation."""
    hop = fs // 250  # 4 ms envelope resolution
    n = min(len(ref), len(deg)) // hop
    if n < 4:
        return 0
    er = np.square(ref[:n * hop]).reshape(n, hop).sum(1)
    ed = np.square(deg[:n * hop]).reshape(n, hop).sum(1)
    er -= er.mean()
    ed -= ed.mean()
    size = int(2 ** np.ceil(np.log2(2 * n)))
    corr = np.fft.irfft(np.fft.rfft(ed, size) *
                        np.conj(np.fft.rfft(er, size)), size)
    max_lag = int(max_delay_s * fs / hop)
    lags = np.r_[np.arange(0, max_lag + 1), np.arange(-max_lag, 0)]
    vals = np.r_[corr[:max_lag + 1], corr[-max_lag:]]
    coarse = int(lags[np.argmax(vals)]) * hop
    # Refine +-2 envelope hops around the coarse estimate.
    best, best_v = coarse, -np.inf
    for d in range(coarse - 2 * hop, coarse + 2 * hop + 1):
        if d >= 0:
            a, b = ref[:len(ref) - d or None], deg[d:]
        else:
            a, b = ref[-d:], deg[:len(deg) + d or None]
        k = min(len(a), len(b))
        if k < fs // 100:
            continue
        v = float(np.dot(a[:k], b[:k]))
        if v > best_v:
            best_v, best = v, d
    return best


def raw_p862(ref: np.ndarray, deg: np.ndarray, fs: int,
             wideband: bool = True) -> float:
    """Raw P.862 internal score (~-0.5 .. 4.5) before MOS-LQO mapping."""
    m = _Mode(fs, wideband)
    ref = np.asarray(ref, np.float64)
    deg = np.asarray(deg, np.float64)

    ref = _level_align(ref, fs)
    deg = _level_align(deg, fs)
    ref = _input_filter(ref, fs, wideband)
    deg = _input_filter(deg, fs, wideband)

    d = _global_delay(ref, deg, fs)
    if d >= 0:
        deg = deg[d:]
    else:
        ref = ref[-d:]
    n = min(len(ref), len(deg))
    ref, deg = ref[:n], deg[:n]

    pr = _band_powers(ref, m)               # [T, B] pitch power densities
    pd = _band_powers(deg, m)
    if pr.shape[0] < 2:
        return 4.5
    T, B = pr.shape

    # Speech-active frames: within 35 dB of the loudest reference frame.
    frame_pow = pr.sum(1)
    active = frame_pow > frame_pow.max() * 10.0 ** (-35.0 / 10.0)
    if not np.any(active):
        active = np.ones(T, bool)

    # ---- partial linear-filtering (frequency response) compensation:
    # scale the REFERENCE toward the degraded system's mean response,
    # bounded to +-20 dB (the degraded path's flat filtering must not
    # count as distortion).
    mean_r = pr[active].mean(0)
    mean_d = pd[active].mean(0)
    fcomp = np.clip((mean_d + 1000.0) / (mean_r + 1000.0), 1e-2, 1e2)
    pr_eq = pr * fcomp[None, :]

    # ---- short-term gain compensation: scale the DEGRADED toward the
    # reference frame power, smoothed over time, bounded [3e-4, 5].
    num = pr_eq.sum(1) + 5e5
    den = pd.sum(1) + 5e5
    gains = np.empty(T)
    g = 1.0
    for t in range(T):
        g = 0.8 * g + 0.2 * (num[t] / den[t])
        gains[t] = min(max(g, 3e-4), 5.0)
    pd_eq = pd * gains[:, None]

    # ---- Zwicker loudness per band (Sl: the standard's loudness
    # scaling factor, 1.866e-1) ----
    def loudness(p):
        p0 = m.abs_thresh[None, :]
        s = 0.1866 * ((p0 / 0.5) ** 0.23) * (
            (0.5 + 0.5 * p / p0) ** 0.23 - 1.0)
        return np.where(p > p0, s, 0.0)

    lr = loudness(pr_eq)
    ld = loudness(pd_eq)

    # ---- masked disturbance ----
    diff = ld - lr
    mask = 0.25 * np.minimum(ld, lr)
    dist = np.sign(diff) * np.maximum(np.abs(diff) - mask, 0.0)

    wb_ = m.width_bark[None, :]
    # symmetric: width-weighted L2 over bands, capped at 45
    d_frame = np.sqrt(np.sum(np.square(dist) * wb_, 1) * B / wb_.sum())
    d_frame = np.minimum(d_frame, 45.0)

    # asymmetric: emphasize additive (deg > ref) components
    ratio = ((pd_eq + 50.0) / (pr_eq + 50.0)) ** 1.2
    asym = np.where(ratio < 3.0, 0.0, np.minimum(ratio, 12.0))
    da_frame = np.minimum(np.sum(np.abs(dist) * asym * wb_, 1), 45.0)

    # frame emphasis: quiet reference frames weigh less
    h = ((frame_pow + 1e5) / 1e7) ** 0.04
    d_frame = np.minimum(d_frame / h, 45.0)
    da_frame = da_frame / h

    # ---- L6-over-320ms then L2-over-time aggregation ----
    def aggregate(v, p_inner):
        win, hop_w = 20, 10
        if len(v) <= win:
            blocks = np.array([np.mean(v ** p_inner) ** (1.0 / p_inner)])
        else:
            nblk = (len(v) - win) // hop_w + 1
            idx = (np.arange(nblk)[:, None] * hop_w +
                   np.arange(win)[None])
            blocks = np.mean(v[idx] ** p_inner, 1) ** (1.0 / p_inner)
        return float(np.sqrt(np.mean(np.square(blocks))))

    d_sym = aggregate(d_frame, 6.0)
    d_asym = aggregate(da_frame, 6.0)

    return 4.5 - 0.1 * d_sym - 0.0309 * d_asym


def pesq_p862(ref: np.ndarray, deg: np.ndarray, fs: int,
              mode: str = "wb") -> float:
    """PESQ MOS-LQO estimate. mode 'wb' (P.862.2, fs=16000) or 'nb'
    (P.862.1, fs=8000/16000 -- 16 kHz input is decimated by 2)."""
    ref = np.asarray(ref, np.float64)
    deg = np.asarray(deg, np.float64)
    n = min(len(ref), len(deg))
    ref, deg = ref[:n], deg[:n]
    if mode == "wb":
        raw = raw_p862(ref, deg, fs, wideband=True)
        return 0.999 + 4.0 / (1.0 + np.exp(-1.3669 * raw + 3.8224))
    if mode == "nb":
        if fs == 16000:
            ref, deg, fs = ref[::2], deg[::2], 8000
        raw = raw_p862(ref, deg, fs, wideband=False)
        return 0.999 + 4.0 / (1.0 + np.exp(-1.4945 * raw + 4.6607))
    raise ValueError(f"mode must be 'wb' or 'nb', got {mode!r}")

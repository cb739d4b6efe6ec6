"""ssim_255 vs a naive direct-window implementation of Wang et al. 2004
with the skimage-default conventions (7×7 uniform window, sample
covariance, K1=0.01/K2=0.03, data_range=255, border excluded)."""

import numpy as np
import pytest

from irdu_tpu.eval.metrics import ssim_255


def naive_ssim(x, y, win=7):
    x = np.asarray(x, np.float64)
    y = np.asarray(y, np.float64)
    c1, c2 = (0.01 * 255) ** 2, (0.03 * 255) ** 2
    n = win * win
    vals = []
    for c in range(x.shape[-1]):
        xc, yc = x[..., c], y[..., c]
        h, w = xc.shape
        maps = []
        for i in range(h - win + 1):
            for j in range(w - win + 1):
                px = xc[i:i + win, j:j + win].ravel()
                py = yc[i:i + win, j:j + win].ravel()
                ux, uy = px.mean(), py.mean()
                vx = ((px - ux) ** 2).sum() / (n - 1)
                vy = ((py - uy) ** 2).sum() / (n - 1)
                vxy = ((px - ux) * (py - uy)).sum() / (n - 1)
                maps.append(((2 * ux * uy + c1) * (2 * vxy + c2))
                            / ((ux ** 2 + uy ** 2 + c1) * (vx + vy + c2)))
        vals.append(np.mean(maps))
    return float(np.mean(vals))


def test_ssim_matches_naive_window_implementation():
    rs = np.random.RandomState(0)
    clean = rs.rand(24, 20, 3) * 255.0
    noisy = np.clip(clean + rs.normal(0, 12.0, clean.shape), 0, 255)
    got = ssim_255(clean, noisy)
    want = naive_ssim(clean, noisy)
    assert got == pytest.approx(want, abs=1e-9)
    assert 0.0 < got < 1.0


def test_ssim_identity_and_ordering():
    rs = np.random.RandomState(1)
    img = rs.rand(32, 32) * 255.0
    assert ssim_255(img, img) == pytest.approx(1.0)
    a = np.clip(img + rs.normal(0, 5.0, img.shape), 0, 255)
    b = np.clip(img + rs.normal(0, 40.0, img.shape), 0, 255)
    assert ssim_255(img, a) > ssim_255(img, b)

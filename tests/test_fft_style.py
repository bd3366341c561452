"""On-device FFT transforms vs the host numpy reference implementations."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from mrfp_tpu.data import transforms as tr
from mrfp_tpu.perturb.fft_style import apply_freq_transform, hpf, lpf, phot


def _img(seed=0, h=32, w=32):
    return np.random.default_rng(seed).uniform(
        0, 255, (h, w, 3)).astype(np.float32)


def _ref_filter(img: np.ndarray, highpass: bool, r: int = 16) -> np.ndarray:
    """Bit-for-bit transcription of the reference mask semantics
    (dataloaders.py:24-45 HPF zeroes d2 <= r^2, :59-79 LPF zeroes d2 >= r^2 —
    the ring exactly at r^2 is dropped by BOTH filters)."""
    rows, cols = img.shape[:2]
    f = np.fft.fftshift(np.fft.fftn(img))
    x, y = np.ogrid[:rows, :cols]
    d2 = (x - rows // 2) ** 2 + (y - cols // 2) ** 2
    m = np.ones((rows, cols, 3), np.float32)
    m[(d2 <= r * r) if highpass else (d2 >= r * r)] = 0
    out = np.fft.ifftn(np.fft.ifftshift(f * m))
    return np.real(out).astype(np.float32)


def test_hpf_lpf_match_host():
    img = _img()
    host_h = tr.HPF()({"image": img, "label": None})["image"]
    host_l = tr.LPF()({"image": img, "label": None})["image"]
    np.testing.assert_allclose(np.asarray(hpf(jnp.asarray(img))), host_h,
                               atol=1e-2)
    np.testing.assert_allclose(np.asarray(lpf(jnp.asarray(img))), host_l,
                               atol=1e-2)
    # both match the reference masks exactly
    np.testing.assert_allclose(host_h, _ref_filter(img, True), atol=1e-3)
    np.testing.assert_allclose(host_l, _ref_filter(img, False), atol=1e-3)
    # the r^2 ring is dropped by both filters, so HPF + LPF loses exactly
    # the ring energy (it does NOT reconstruct the image; a 32x32 grid has
    # points at distance exactly 16, e.g. (0,+-16))
    ring = img - (host_h + host_l)
    assert np.abs(ring).max() > 1e-3


def test_phot_matches_host():
    img = _img(1)
    host = tr.PHOT()({"image": img, "label": None})["image"]
    np.testing.assert_allclose(np.asarray(phot(jnp.asarray(img))), host,
                               atol=2e-2, rtol=1e-3)


def test_batched_apply():
    batch = np.stack([_img(i) for i in range(3)])
    out = apply_freq_transform(jnp.asarray(batch), "hpf")
    assert out.shape == batch.shape
    for i in range(3):
        np.testing.assert_allclose(
            np.asarray(out[i]), np.asarray(hpf(jnp.asarray(batch[i]))),
            atol=1e-3)


def test_train_step_with_freq_transform():
    from mrfp_tpu.core.config import Config
    from mrfp_tpu.models import MRFP
    from mrfp_tpu.perturb import oc_init
    from mrfp_tpu.train import create_train_state, make_jitted_steps

    cfg = Config()
    cfg = cfg.replace(data=dataclasses.replace(cfg.data, freq_transform="hpf"))
    model = MRFP(trunk="resnet-18", variant="D32")
    state = create_train_state(model, cfg.train, (1, 32, 32, 3),
                               oc_params=oc_init(jax.random.PRNGKey(1)))
    jt, _ = make_jitted_steps(model, cfg, None)
    rng = np.random.default_rng(0)
    im = jnp.asarray(rng.uniform(0, 255, (2, 32, 32, 3)), jnp.float32)
    lb = jnp.asarray(rng.integers(0, 19, (2, 32, 32)), jnp.int32)
    state, m = jt(state, im, lb)
    assert np.isfinite(float(m["loss"]))

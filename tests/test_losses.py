"""Loss parity tests against independently-written torch formulations."""

import numpy as np
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from speech_masters_thesis_tpu.ops.losses import (
    MultiNormReconstructionLoss,
    cross_entropy,
    downsample_mask,
    focal_loss,
    masked_cross_entropy,
    mmi_loss,
)


def test_multinorm_matches_torch_formula():
    rng = np.random.RandomState(0)
    y = rng.uniform(-1, 1, (3, 500)).astype(np.float32)
    yh = rng.uniform(-1, 1, (3, 500)).astype(np.float32)
    mask = np.ones((3, 500), np.float32)
    mask[2, 400:] = 0

    loss = MultiNormReconstructionLoss(l1=0.5, l2=1.0, linf=0.02, linf_topk=100)
    out = float(loss(jnp.asarray(y), jnp.asarray(yh), jnp.asarray(mask)))

    ty = torch.from_numpy(y * mask).reshape(3, -1)
    tyh = torch.from_numpy(yh * mask).reshape(3, -1)
    expected = (0.5 * F.l1_loss(ty, tyh).mean(0).sum()
                + 1.0 * F.mse_loss(ty, tyh).mean(0).sum()
                + 0.02 * torch.topk((ty - tyh) ** 2, 100, dim=-1)[0].mean(0).sum())
    assert out == pytest_approx(float(expected))


def pytest_approx(v, rel=1e-4):
    import pytest
    return pytest.approx(v, rel=rel)


def test_downsample_mask_matches_torch_slicing():
    """Same pad-then-stride construction as reference losses.py:33-37."""
    n_fft, hop = 512, 128
    pad = (n_fft - hop) // 2
    mask = np.ones((2, 4096), np.float32)
    mask[1, 3000:] = 0
    out = np.asarray(downsample_mask(jnp.asarray(mask), n_fft, hop))

    t = torch.from_numpy(mask).unsqueeze(1)  # [B, 1, T] like the reference
    t = F.pad(t, (pad, 0), value=1.0)
    t = F.pad(t, (0, pad), value=0.0)
    ref = t[:, 0, n_fft // 2:-n_fft // 2 + 1:hop].numpy()
    np.testing.assert_array_equal(out, ref)
    assert out.shape[1] == 4096 // hop


def test_cross_entropy_matches_torch():
    rng = np.random.RandomState(1)
    logits = rng.randn(10, 7).astype(np.float32)
    targets = rng.randint(0, 7, 10)
    out = float(cross_entropy(jnp.asarray(logits), jnp.asarray(targets)))
    ref = float(F.cross_entropy(torch.from_numpy(logits), torch.from_numpy(targets)))
    assert out == pytest_approx(ref)


def test_masked_cross_entropy_ignores_masked_rows():
    rng = np.random.RandomState(2)
    logits = rng.randn(6, 5).astype(np.float32)
    targets = rng.randint(0, 5, 6)
    mask = np.array([1, 1, 1, 0, 0, 0], np.float32)
    out = float(masked_cross_entropy(jnp.asarray(logits), jnp.asarray(targets),
                                     jnp.asarray(mask)))
    ref = float(F.cross_entropy(torch.from_numpy(logits[:3]), torch.from_numpy(targets[:3])))
    assert out == pytest_approx(ref)


def test_focal_loss_matches_torch_formula():
    rng = np.random.RandomState(3)
    logits = rng.randn(8, 6).astype(np.float32)
    targets = rng.randint(0, 6, 8)
    gamma = 10.0
    out = float(focal_loss(jnp.asarray(logits), jnp.asarray(targets), gamma=gamma))

    x = torch.from_numpy(logits)
    y = torch.from_numpy(targets)
    log_p = F.log_softmax(x, dim=-1)
    ce = F.nll_loss(log_p, y, reduction="none")
    log_pt = log_p[torch.arange(len(x)), y]
    ref = float((((1 - log_pt.exp()) ** gamma) * ce).mean())
    assert out == pytest_approx(ref)


def test_mmi_loss_matches_reference_formula():
    """Including the reference's log_softmax-of-one-hot quirk (losses.py:19)."""
    rng = np.random.RandomState(4)
    n, c = 12, 5
    logits = rng.randn(n, c).astype(np.float32)
    targets = rng.randint(0, c, n)
    out = float(mmi_loss(jnp.asarray(logits), jnp.asarray(targets), c))

    yh = torch.from_numpy(logits)
    y = torch.from_numpy(targets)
    p_zy = F.softmax(yh, dim=-1)
    p_z = p_zy.mean(0)
    h_z = -1.0 * (p_z * torch.log(p_z)).sum(-1)
    x = p_zy * F.log_softmax(F.one_hot(y, num_classes=c).to(yh.dtype), dim=-1)
    h_z_x_ub = -1 * x.sum(-1).mean(0)
    ref = float(h_z_x_ub - h_z)
    assert out == pytest_approx(ref, rel=1e-3)

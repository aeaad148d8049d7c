"""Loss tests: scalar outputs, exact values, torch numeric parity."""

import numpy as np
import pytest

import jax.numpy as jnp

from abnet3_tpu.loss import (KLLoss, coscos2, cosmargin, weighted_loss_multi,
                             cosine_similarity)

N = 16
D = 10


@pytest.fixture
def batch():
    rng = np.random.RandomState(0)
    x1 = rng.randn(N, D).astype(np.float32)
    x2 = rng.randn(N, D).astype(np.float32)
    y = rng.choice([1, -1], N).astype(np.float32)
    return x1, x2, y


@pytest.mark.parametrize("loss_cls", [coscos2, cosmargin])
def test_loss_scalar(batch, loss_cls):
    x1, x2, y = batch
    loss = loss_cls(avg=True)
    out = loss(jnp.asarray(x1), jnp.asarray(x2), jnp.asarray(y))
    assert out.ndim == 0
    assert np.isfinite(float(out))


def _np_cos(x1, x2, eps=1e-6):
    n1 = np.sqrt((x1 ** 2).sum(1))
    n2 = np.sqrt((x2 ** 2).sum(1))
    return (x1 * x2).sum(1) / (np.maximum(n1, eps) * np.maximum(n2, eps))


def test_coscos2_values(batch):
    x1, x2, y = batch
    c = _np_cos(x1, x2)
    expected = np.where(y > 0, (1 - c) / 2, c ** 2).mean()
    got = float(coscos2(avg=True)(jnp.asarray(x1), jnp.asarray(x2),
                                  jnp.asarray(y)))
    assert got == pytest.approx(expected, rel=1e-5)
    # avg=False sums
    got_sum = float(coscos2(avg=False)(jnp.asarray(x1), jnp.asarray(x2),
                                       jnp.asarray(y)))
    assert got_sum == pytest.approx(expected * N, rel=1e-5)


def test_cosmargin_values(batch):
    x1, x2, y = batch
    c = _np_cos(x1, x2)
    expected = np.where(y > 0, 1 - c, np.clip(c - 0.5, 0, None)).mean()
    got = float(cosmargin(avg=True, margin=0.5)(
        jnp.asarray(x1), jnp.asarray(x2), jnp.asarray(y)))
    assert got == pytest.approx(expected, rel=1e-5)


def test_torch_parity(batch):
    """Cross-check coscos2/cosmargin against a torch implementation of the
    reference formulas (reference loss.py:46-105)."""
    torch = pytest.importorskip("torch")
    x1, x2, y = batch
    t1, t2 = torch.from_numpy(x1), torch.from_numpy(x2)
    ty = torch.from_numpy(y)
    cos = torch.nn.CosineSimilarity(dim=1, eps=1e-6)
    c = cos(t1, t2)
    same = ty == 1
    # coscos2
    vals = torch.where(same, (1 - c) / 2, c ** 2)
    expected = float(vals.sum() / len(vals))
    got = float(coscos2()(jnp.asarray(x1), jnp.asarray(x2), jnp.asarray(y)))
    assert got == pytest.approx(expected, rel=1e-5)
    # cosmargin
    vals = torch.where(same, 1 - c, torch.clamp(c - 0.5, min=0))
    expected = float(vals.sum() / len(vals))
    got = float(cosmargin()(jnp.asarray(x1), jnp.asarray(x2),
                            jnp.asarray(y)))
    assert got == pytest.approx(expected, rel=1e-5)


def test_kl_loss(batch):
    x1, x2, y = batch
    # KL needs positive distributions
    p1 = np.exp(x1) / np.exp(x1).sum(1, keepdims=True)
    p2 = np.exp(x2) / np.exp(x2).sum(1, keepdims=True)
    out = KLLoss(margin=1, avg=True)(jnp.asarray(p1), jnp.asarray(p2),
                                     jnp.asarray(y))
    assert np.isfinite(float(out))
    # same-pair identical distributions -> KL = 0 for those rows
    out_same = KLLoss()(jnp.asarray(p1), jnp.asarray(p1),
                        jnp.ones(N, np.float32))
    assert float(out_same) == pytest.approx(0.0, abs=1e-6)


def test_weights_mask_padding(batch):
    """Padded rows (weight 0) must not change the loss."""
    x1, x2, y = batch
    pad = np.zeros((4, D), np.float32)
    x1p = np.vstack([x1, pad])
    x2p = np.vstack([x2, pad])
    yp = np.concatenate([y, np.ones(4, np.float32)])
    w = np.concatenate([np.ones(N, np.float32), np.zeros(4, np.float32)])
    base = float(coscos2()(jnp.asarray(x1), jnp.asarray(x2), jnp.asarray(y)))
    masked = float(coscos2()(jnp.asarray(x1p), jnp.asarray(x2p),
                             jnp.asarray(yp), weights=jnp.asarray(w)))
    assert masked == pytest.approx(base, rel=1e-6)


def test_weighted_loss_multi(batch):
    x1, x2, y = batch
    loss = weighted_loss_multi(weight=0.3, loss_phn=coscos2(),
                               loss_spk=cosmargin())
    out = loss(jnp.asarray(x1), jnp.asarray(x2), jnp.asarray(x2),
               jnp.asarray(x1), jnp.asarray(y), jnp.asarray(-y))
    spk = cosmargin()(jnp.asarray(x1), jnp.asarray(x2), jnp.asarray(y))
    phn = coscos2()(jnp.asarray(x2), jnp.asarray(x1), jnp.asarray(-y))
    assert float(out) == pytest.approx(0.3 * float(spk) + 0.7 * float(phn),
                                       rel=1e-6)


def test_cosine_similarity_zero_safe():
    z = jnp.zeros((2, 4))
    o = jnp.ones((2, 4))
    c = cosine_similarity(z, o)
    assert np.all(np.isfinite(np.asarray(c)))


def test_from_cos_matches_forward():
    """from_cos on precomputed cosines of normalized rows equals the
    row-pair loss (the matrix-loss contract, parallel/mesh.py)."""
    import jax.numpy as jnp
    from abnet3_tpu.loss import coscos2, cosmargin
    rng = np.random.RandomState(0)
    x1 = jnp.asarray(rng.randn(32, 10).astype(np.float32))
    x2 = jnp.asarray(rng.randn(32, 10).astype(np.float32))
    y = jnp.asarray(rng.choice([1.0, -1.0], 32), jnp.float32)
    w = jnp.asarray(rng.rand(32).astype(np.float32))
    n1 = jnp.maximum(jnp.linalg.norm(x1, axis=1, keepdims=True), 1e-6)
    n2 = jnp.maximum(jnp.linalg.norm(x2, axis=1, keepdims=True), 1e-6)
    c = jnp.sum((x1 / n1) * (x2 / n2), axis=1)
    for loss in (coscos2(), cosmargin(margin=0.4)):
        assert loss.supports_cos
        a = float(loss(x1, x2, y, weights=w))
        b = float(loss.from_cos(c, y, weights=w))
        assert a == pytest.approx(b, abs=1e-6)

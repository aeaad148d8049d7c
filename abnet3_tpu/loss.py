"""Contrastive losses as pure JAX functions + class wrappers.

Same math as the reference (reference loss.py:37-182) expressed with masks
instead of boolean fancy-indexing so everything jits with static shapes, and
extended with an optional per-example ``weights`` vector so padded frames in
ragged on-device batches contribute zero loss (the reference never pads
because it builds batches serially on the host).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

__all__ = [
    "cosine_similarity", "coscos2_fn", "cosmargin_fn", "kl_loss_fn",
    "coscos2_from_cos", "cosmargin_from_cos",
    "LossBuilder", "coscos2", "cosmargin", "KLLoss", "weighted_loss_multi",
]


def cosine_similarity(x1: jnp.ndarray, x2: jnp.ndarray,
                      eps: float = 1e-6) -> jnp.ndarray:
    """Row-wise cosine similarity, torch.nn.CosineSimilarity semantics
    (denominator clamped at eps; reference loss.py:57-59)."""
    n1 = jnp.sqrt(jnp.sum(x1 * x1, axis=1))
    n2 = jnp.sqrt(jnp.sum(x2 * x2, axis=1))
    denom = jnp.maximum(n1, eps) * jnp.maximum(n2, eps)
    return jnp.sum(x1 * x2, axis=1) / denom


def normalize_rows(e: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """Normalize the last axis with the same eps clamp as
    :func:`cosine_similarity`, so dot products of normalized rows equal
    the row-wise cosine."""
    n = jnp.sqrt(jnp.sum(e * e, axis=-1, keepdims=True))
    return e / jnp.maximum(n, eps)


def _pair_cos_matrix(e1: jnp.ndarray, e2: jnp.ndarray) -> jnp.ndarray:
    """(B, T1, E) x (B, T2, E) -> (B, T1, T2) cosine matrix on the MXU."""
    return jnp.einsum("bie,bje->bij", normalize_rows(e1),
                      normalize_rows(e2),
                      preferred_element_type=jnp.float32)


def _reduce(values: jnp.ndarray, weights: Optional[jnp.ndarray],
            avg: bool) -> jnp.ndarray:
    if weights is not None:
        total = jnp.sum(values * weights)
        if avg:
            return total / jnp.maximum(jnp.sum(weights), 1.0)
        return total
    if avg:
        return jnp.mean(values)
    return jnp.sum(values)


def coscos2_fn(input1, input2, y, weights=None, avg=True):
    """same -> (1-cos)/2 ; diff -> cos^2 (reference loss.py:59-67)."""
    c = cosine_similarity(input1, input2)
    vals = jnp.where(y > 0, (1.0 - c) / 2.0, c * c)
    return _reduce(vals, weights, avg)


def cosmargin_fn(input1, input2, y, margin=0.5, weights=None, avg=True):
    """same -> 1-cos ; diff -> max(0, cos - margin)
    (reference loss.py:97-105)."""
    c = cosine_similarity(input1, input2)
    vals = jnp.where(y > 0, 1.0 - c, jnp.maximum(c - margin, 0.0))
    return _reduce(vals, weights, avg)


def coscos2_from_cos(c, y, weights=None, avg=True):
    """coscos2 on precomputed cosine similarities of any shape.

    The matrix-loss train path (parallel/mesh.py) computes the full
    cosine matrix of *unique* frame embeddings on the MXU and weights it
    by the DTW alignment mask instead of gathering frames per path step;
    the loss itself is elementwise in cos, so this is the same math as
    :func:`coscos2_fn` over the gathered pairs."""
    vals = jnp.where(y > 0, (1.0 - c) / 2.0, c * c)
    return _reduce(vals, weights, avg)


def cosmargin_from_cos(c, y, margin=0.5, weights=None, avg=True):
    """cosmargin on precomputed cosine similarities (see
    :func:`coscos2_from_cos`)."""
    vals = jnp.where(y > 0, 1.0 - c, jnp.maximum(c - margin, 0.0))
    return _reduce(vals, weights, avg)


def kl_loss_fn(input1, input2, y, margin=1.0, weights=None, avg=True,
               eps=1e-8):
    """Symmetric contrastive KL with hinge on diff pairs
    (reference loss.py:127-137). Inputs must be positive distributions
    (e.g. softmax outputs).

    ``eps`` keeps log() finite on saturated softmax outputs and on
    all-zero padded rows (0*log(0/0) would poison the weighted sum with
    NaN even at weight 0, since 0*nan = nan)."""
    r = jnp.log((input1 + eps) / (input2 + eps))
    kld1 = jnp.sum(input1 * r, axis=1)
    kld2 = -jnp.sum(input2 * r, axis=1)
    # HingeEmbeddingLoss: x if y==1 else max(0, margin - x)
    h1 = jnp.where(y > 0, kld1, jnp.maximum(margin - kld1, 0.0))
    h2 = jnp.where(y > 0, kld2, jnp.maximum(margin - kld2, 0.0))
    return _reduce(h1, weights, avg) + _reduce(h2, weights, avg)


class LossBuilder:
    """Generic loss wrapper (reference loss.py:15-34)."""

    #: True when the loss is elementwise in the cosine similarity
    #: (coscos2 / cosmargin).
    supports_cos = False

    #: True when the loss decomposes into per-cell statistics computable
    #: for all (i, j) frame pairs at once via batched matmuls, so the
    #: matrix-loss train path can weight them by the DTW alignment mask
    #: (parallel/mesh.py use_matrix_loss). The three hooks below define
    #: the contract.
    supports_cells = False

    def __init__(self, *args, **kwargs):
        pass

    def pair_cells(self, e1, e2):
        """(B, T1, E) x (B, T2, E) -> per-cell statistics shaped
        (*stat, B, T1, T2) (MXU matmuls)."""
        raise NotImplementedError(
            "Loss has no cell decomposition:", self.__class__.__name__)

    def rowwise_cells(self, x1, x2):
        """(N, E) x (N, E) aligned rows -> statistics (*stat, N)."""
        raise NotImplementedError(
            "Loss has no cell decomposition:", self.__class__.__name__)

    def from_cells(self, cells, y, weights=None):
        """Reduce per-cell statistics under labels y and weights (same
        reduction semantics as __call__ on gathered rows)."""
        raise NotImplementedError(
            "Loss has no cell decomposition:", self.__class__.__name__)

    def from_cos(self, c, y, weights=None):
        raise NotImplementedError(
            "Loss is not elementwise in cos:", self.__class__.__name__)

    def masked_same_sum(self, e1, e2, A):
        """sum over (i, j) cells of A[i, j] * value(cell, y=+1) via
        matmuls — the per-cell statistics never materialize (the
        matrix-loss fast path for the DTW-aligned same-word group)."""
        raise NotImplementedError(
            "Loss has no cell decomposition:", self.__class__.__name__)

    def cell_values(self, cells, y):
        """Elementwise loss values (no reduction) from cell
        statistics under labels y."""
        raise NotImplementedError(
            "Loss has no cell decomposition:", self.__class__.__name__)

    def from_parts(self, same_sum, same_wsum, rest_cells, y_rest,
                   w_rest):
        """Final reduction from a pre-summed same-group contribution
        plus elementwise rest terms (diff diagonal, tcl) — same
        semantics as __call__ over the union of all terms."""
        total = same_sum + jnp.sum(self.cell_values(rest_cells, y_rest)
                                   * w_rest)
        if self.avg:
            denom = same_wsum + jnp.sum(w_rest)
            return total / jnp.maximum(denom, 1.0)
        return total

    def __call__(self, *args, **kwargs):
        raise NotImplementedError("Unimplemented __call__ for class:",
                                  self.__class__.__name__)

    # parity alias: reference losses are nn.Modules called via forward
    def forward(self, *args, **kwargs):
        return self(*args, **kwargs)

    def whoami(self):
        return {"params": {k: v for k, v in self.__dict__.items()
                           if not k.startswith("_")},
                "class_name": self.__class__.__name__}


class _CosCellsMixin:
    """Cell hooks shared by the cos-elementwise losses: the per-cell
    statistic is the cosine itself. The same-pair value is AFFINE in
    cos (``_same_affine``), so the whole alignment-masked same-group
    loss folds into matmuls — sum(A * value) =
    alpha * sum(A) + beta * <e1n, A @ e2n> — and the (B, T1, T2)
    cosine matrix never materializes (masked_same_sum; perf-neutral at
    T=96, O(B*T^2) memory saved at larger T)."""

    supports_cos = True
    supports_cells = True

    #: (alpha, beta) with same-pair value = alpha + beta * cos
    _same_affine = (0.0, 0.0)

    def pair_cells(self, e1, e2):
        return _pair_cos_matrix(e1, e2)

    def rowwise_cells(self, x1, x2):
        return cosine_similarity(x1, x2)

    def from_cells(self, cells, y, weights=None):
        return self.from_cos(cells, y, weights=weights)

    def masked_same_sum(self, e1, e2, A):
        """sum over cells of A * value(cos, y=+1) without materializing
        the cosine matrix: one (B,T,T)x(B,T,E) matmul + a dot."""
        alpha, beta = self._same_affine
        e1n, e2n = normalize_rows(e1), normalize_rows(e2)
        masked_dot = jnp.sum(e1n * jnp.einsum(
            "bij,bje->bie", A, e2n, preferred_element_type=jnp.float32))
        return alpha * jnp.sum(A) + beta * masked_dot



class coscos2(_CosCellsMixin, LossBuilder):
    _same_affine = (0.5, -0.5)   # same -> (1 - cos) / 2

    def __init__(self, avg=True, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.avg = avg

    def cell_values(self, cells, y):
        return jnp.where(y > 0, (1.0 - cells) / 2.0, cells * cells)

    def __call__(self, input1, input2, y, weights=None):
        assert input1.shape == input2.shape, "Input not the same size"
        return coscos2_fn(input1, input2, y, weights=weights, avg=self.avg)

    def from_cos(self, c, y, weights=None):
        return coscos2_from_cos(c, y, weights=weights, avg=self.avg)


class cosmargin(_CosCellsMixin, LossBuilder):
    _same_affine = (1.0, -1.0)   # same -> 1 - cos

    def __init__(self, avg=True, margin=0.5, *args, **kwargs):
        super().__init__(*args, **kwargs)
        assert 0 <= margin <= 1
        self.margin = margin
        self.avg = avg

    def cell_values(self, cells, y):
        return jnp.where(y > 0, 1.0 - cells,
                         jnp.maximum(cells - self.margin, 0.0))

    def __call__(self, input1, input2, y, weights=None):
        assert input1.shape == input2.shape, "Input not the same size"
        return cosmargin_fn(input1, input2, y, margin=self.margin,
                            weights=weights, avg=self.avg)

    def from_cos(self, c, y, weights=None):
        return cosmargin_from_cos(c, y, margin=self.margin,
                                  weights=weights, avg=self.avg)


class KLLoss(LossBuilder):
    """Symmetric contrastive KL. Cell decomposition: with distributions
    P (B, T1, E), Q (B, T2, E) and H(p) = sum_d p_d log(p_d + eps),

        kld1[i, j] = H(p_i) - P_i . log(Q_j + eps)   (one matmul)
        kld2[i, j] = H(q_j) - log(P_i + eps) . Q_j   (one matmul)

    so the KL-on-softmax recipe trains matrix-mode like the cosine
    losses — the alignment never materializes as indices."""

    supports_cells = True

    def __init__(self, margin=1, avg=True, eps=1e-8, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.margin = margin
        self.avg = avg
        self.eps = eps

    def __call__(self, input1, input2, y, weights=None):
        return kl_loss_fn(input1, input2, y, margin=self.margin,
                          weights=weights, avg=self.avg, eps=self.eps)

    def pair_cells(self, e1, e2):
        l1 = jnp.log(e1 + self.eps)
        l2 = jnp.log(e2 + self.eps)
        h1 = jnp.sum(e1 * l1, axis=-1)                       # (B, T1)
        h2 = jnp.sum(e2 * l2, axis=-1)                       # (B, T2)
        x12 = jnp.einsum("bie,bje->bij", e1, l2,
                         preferred_element_type=jnp.float32)
        x21 = jnp.einsum("bie,bje->bij", l1, e2,
                         preferred_element_type=jnp.float32)
        return jnp.stack([h1[:, :, None] - x12,
                          h2[:, None, :] - x21])

    def rowwise_cells(self, x1, x2):
        l1 = jnp.log(x1 + self.eps)
        l2 = jnp.log(x2 + self.eps)
        kld1 = jnp.sum(x1 * (l1 - l2), axis=-1)
        kld2 = -jnp.sum(x2 * (l1 - l2), axis=-1)
        return jnp.stack([kld1, kld2])

    def from_cells(self, cells, y, weights=None):
        kld1, kld2 = cells[0], cells[1]
        h1 = jnp.where(y > 0, kld1, jnp.maximum(self.margin - kld1, 0.0))
        h2 = jnp.where(y > 0, kld2, jnp.maximum(self.margin - kld2, 0.0))
        return (_reduce(h1, weights, self.avg)
                + _reduce(h2, weights, self.avg))

    def masked_same_sum(self, e1, e2, A):
        """Same-pair KL is linear in the cell statistics (the hinge
        only applies to diff pairs), so sum(A * (kld1 + kld2)) folds
        into two masked matmuls plus entropy dot products."""
        l1 = jnp.log(e1 + self.eps)
        l2 = jnp.log(e2 + self.eps)
        h1 = jnp.sum(e1 * l1, axis=-1)                    # (B, T1)
        h2 = jnp.sum(e2 * l2, axis=-1)                    # (B, T2)
        row_w = jnp.sum(A, axis=2)                        # (B, T1)
        col_w = jnp.sum(A, axis=1)                        # (B, T2)
        s1 = (jnp.sum(row_w * h1)
              - jnp.sum(e1 * jnp.einsum(
                  "bij,bje->bie", A, l2,
                  preferred_element_type=jnp.float32)))
        s2 = (jnp.sum(col_w * h2)
              - jnp.sum(l1 * jnp.einsum(
                  "bij,bje->bie", A, e2,
                  preferred_element_type=jnp.float32)))
        return s1 + s2

    def cell_values(self, cells, y):
        kld1, kld2 = cells[0], cells[1]
        h1 = jnp.where(y > 0, kld1, jnp.maximum(self.margin - kld1, 0.0))
        h2 = jnp.where(y > 0, kld2, jnp.maximum(self.margin - kld2, 0.0))
        return h1 + h2


class weighted_loss_multi(LossBuilder):
    """weight*loss_spk + (1-weight)*loss_phn for multitask training
    (reference loss.py:140-182)."""

    def __init__(self, avg=True, loss_phn=None, loss_spk=None, weight=0.5,
                 *args, **kwargs):
        super().__init__(*args, **kwargs)
        assert isinstance(weight, float)
        assert 0 <= weight <= 1
        self.weight = weight
        self.avg = avg
        self.loss_phn = loss_phn
        self.loss_spk = loss_spk

    def __call__(self, emb_spk1, emb_phn1, emb_spk2, emb_phn2, y_spk, y_phn,
                 weights=None):
        out_spk = self.loss_spk(emb_spk1, emb_spk2, y_spk, weights=weights)
        out_phn = self.loss_phn(emb_phn1, emb_phn2, y_phn, weights=weights)
        return self.weight * out_spk + (1.0 - self.weight) * out_phn

    @property
    def supports_multi_cells(self):
        """True when both sub-losses have a cell decomposition, so the
        multitask matrix-loss path can reduce per-head cell matrices
        under one alignment mask (parallel/mesh.py)."""
        return (getattr(self.loss_spk, "supports_cells", False)
                and getattr(self.loss_phn, "supports_cells", False))

    def from_cells_multi(self, cells_spk, cells_phn, y_spk, y_phn,
                         weights=None):
        """Multitask loss on precomputed per-head cell statistics (same
        weighting as __call__)."""
        out_spk = self.loss_spk.from_cells(cells_spk, y_spk,
                                           weights=weights)
        out_phn = self.loss_phn.from_cells(cells_phn, y_phn,
                                           weights=weights)
        return self.weight * out_spk + (1.0 - self.weight) * out_phn

    def whoami(self):
        return {"params": {"weight": self.weight, "avg": self.avg,
                           "loss_phn": self.loss_phn.whoami(),
                           "loss_spk": self.loss_spk.whoami()},
                "class_name": self.__class__.__name__}

"""Multimodal integration units (fusion of modality embeddings).

Functional re-design of the reference units (reference integration.py:23-579):
each unit owns static config, exposes ``init_params(rng) -> params`` and a
pure ``apply(params, x_list, ...) -> fused`` so the whole multimodal siamese
forward stays a single jitted computation. The headstart freeze/unfreeze
protocol (reference integration.py:322-329,415-430) is expressed with
``jax.lax.stop_gradient`` + a fixed attention weight instead of mutating
``requires_grad``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from abnet3_tpu.nn import ACTIVATIONS, Tower, TowerSpec
from abnet3_tpu.serialize import load_pytree, save_pytree
from abnet3_tpu.utils import expand_dimension_list

__all__ = [
    "IntegrationUnitBuilder", "ConcatenationIntegration", "SumIntegration",
    "MultitaskIntegration", "BiWeightedFixed", "BiWeightedScalarLearnt",
    "BiWeightedDeepLearnt", "BiWeightedPreTrained",
]


class IntegrationUnitBuilder:
    """Base class (reference integration.py:23-67)."""

    def __init__(self, output_path: str = "", *args, **kwargs):
        self.output_path = output_path
        self._params = {}

    # Units without learnable parameters return empty pytrees.
    def init_params(self, rng):
        return {}

    def apply(self, params, x_list, diff_input=None, rng=None, train=False):
        raise NotImplementedError(
            "Unimplemented apply for class:", self.__class__.__name__)

    def whoami(self):
        return {"params": {k: v for k, v in self.__dict__.items()
                           if not k.startswith("_")},
                "class_name": self.__class__.__name__}

    def save(self, epoch=""):
        save_pytree(self.output_path + str(epoch) + "integration.pth",
                    {"params": self._params},
                    meta={"class_name": self.__class__.__name__})

    def load(self, path):
        tree, _ = load_pytree(path + "integration.pth")
        self._params = jax.tree_util.tree_map(jnp.asarray, tree["params"])

    # headstart protocol default: unsupported (reference raises the same way)
    def set_headstart_weight(self, headstart_weight):
        raise NotImplementedError

    def start_training(self):
        raise NotImplementedError

    def __str__(self):
        return str(self.__class__.__name__)


class ConcatenationIntegration(IntegrationUnitBuilder):
    """Concatenate modality embeddings (reference integration.py:71-92)."""

    def apply(self, params, x_list, diff_input=None, rng=None, train=False):
        return jnp.concatenate(x_list, axis=1)


class SumIntegration(IntegrationUnitBuilder):
    """Pointwise sum of modality embeddings
    (reference integration.py:94-117)."""

    def apply(self, params, x_list, diff_input=None, rng=None, train=False):
        out = x_list[0]
        for x in x_list[1:]:
            out = out + x
        return out


class MultitaskIntegration(IntegrationUnitBuilder):
    """Random modality masking + concatenation
    (reference integration.py:120-250).

    Each training example picks a feed mode (pair of representation modes,
    one per siamese branch); the masked concat zeroes out dropped
    modalities. ``apply_pair`` draws matched masks for both branches from
    one rng, replacing the reference's stateful ``next_mask`` hand-off
    (reference integration.py:231-235).
    """

    def __init__(self, representation_modes, feed_modes, dimensions_list,
                 batch_size=None, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.unexpanded_rep_modes = representation_modes
        self.dimensions_list = dimensions_list
        self.batch_size = batch_size
        rep_rows = []
        for rep_mode in representation_modes:
            expanded = []
            for binary, dimension in zip(rep_mode, dimensions_list):
                expanded += [float(binary)] * dimension
            rep_rows.append(expanded)
        self._rep_modes = jnp.asarray(np.array(rep_rows, dtype=np.float32))

        if feed_modes == "many2many":
            feed = [(i, j) for i in range(len(rep_rows))
                    for j in range(len(rep_rows))]
        elif feed_modes == "one2one":
            feed = [(i, i) for i in range(len(rep_rows))]
        else:
            feed = [tuple(f) for f in feed_modes]
        self.feed_modes = feed
        self._feed = jnp.asarray(np.array(feed, dtype=np.int32))

    def draw_masks(self, rng, n: int):
        """Sample n feed modes -> (mask1, mask2) of shape (n, sum(dims))."""
        idx = jax.random.randint(rng, (n,), 0, len(self.feed_modes))
        modes = self._feed[idx]  # (n, 2)
        return self._rep_modes[modes[:, 0]], self._rep_modes[modes[:, 1]]

    def apply(self, params, x_list, diff_input=None, rng=None, train=False,
              mask=None):
        x_cat = jnp.concatenate(x_list, axis=1)
        if mask is None:
            if rng is None:  # embedding mode: use all modalities
                return x_cat
            mask, _ = self.draw_masks(rng, x_cat.shape[0])
        return mask * x_cat

    def apply_pair(self, params, x_list1, x_list2, rng=None, train=False):
        x1 = jnp.concatenate(x_list1, axis=1)
        x2 = jnp.concatenate(x_list2, axis=1)
        if rng is None:
            return x1, x2
        m1, m2 = self.draw_masks(rng, x1.shape[0])
        return m1 * x1, m2 * x2


class BiWeightedFixed(IntegrationUnitBuilder):
    """alpha*x1 (+|++) (1-alpha)*x2 with a fixed scalar alpha
    (reference integration.py:252-307)."""

    def __init__(self, integration_mode="sum", weight_value=None,
                 *args, **kwargs):
        super().__init__(*args, **kwargs)
        assert integration_mode in ("sum", "concat"), \
            "Only sum and concat supported"
        if weight_value is None:
            weight_value = float(np.random.random())
        assert 0.0 <= weight_value <= 1.0
        self.weight = float(weight_value)
        self.integration_mode = integration_mode

    def _combine(self, a, b):
        if self.integration_mode == "sum":
            return a + b
        return jnp.concatenate([a, b], axis=1)

    def get_weights(self, params=None):
        return self.weight

    def apply(self, params, x_list, diff_input=None, rng=None, train=False):
        assert len(x_list) == 2, "BiWeighted integrators use two modalities"
        i1, i2 = x_list
        return self._combine(i1 * self.weight, i2 * (1.0 - self.weight))


class BiWeightedScalarLearnt(BiWeightedFixed):
    """Learnable scalar alpha (reference integration.py:310-342)."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self._frozen = False

    def init_params(self, rng):
        return {"weight": jnp.asarray([self.weight], jnp.float32)}

    def set_headstart_weight(self, headstart_weight):
        self.weight = float(headstart_weight)
        self._frozen = True

    def start_training(self):
        self._frozen = False

    def get_weights(self, params=None):
        if self._frozen or params is None:
            return self.weight
        return params["weight"]

    def apply(self, params, x_list, diff_input=None, rng=None, train=False):
        assert len(x_list) == 2
        i1, i2 = x_list
        if self._frozen:
            w = self.weight
        else:
            w = params["weight"]
        return self._combine(i1 * w, i2 * (1.0 - w))


class BiWeightedDeepLearnt(BiWeightedFixed):
    """Attention-net alpha: act(lin1(di1) + lin2(di2))
    (reference integration.py:345-475)."""

    def __init__(self, net_params, activation_type="sigmoid",
                 init_type="xavier_uni", *args, **kwargs):
        super().__init__(*args, **kwargs)
        assert activation_type in ("sigmoid", "tanh")
        assert init_type in ("xavier_uni", "xavier_normal", "orthogonal")
        self.net_params = net_params
        self.activation_type = activation_type
        self.init_type = init_type
        self.input_dim1 = expand_dimension_list(net_params[0])[0]
        self.input_dim2 = expand_dimension_list(net_params[1])[0]
        self._frozen = False
        # attention branches: activation after every layer but the last
        # (the final activation is applied after the two-branch sum,
        # reference integration.py:396-404,432-436)
        self._towers = []
        for branch in net_params:
            dims = expand_dimension_list(branch)
            acts = [activation_type] * (len(dims) - 2) + [None]
            self._towers.append(Tower(TowerSpec(
                dims, acts, p_dropout=0.0, batch_norm=False,
                type_init=init_type, gain_activation=activation_type)))
        self._last_weight = None  # observer hook (EmbeddingObserver)

    def init_params(self, rng):
        k1, k2 = jax.random.split(rng)
        p1, _ = self._towers[0].init(k1)
        p2, _ = self._towers[1].init(k2)
        return {"linear1": p1, "linear2": p2}

    def set_headstart_weight(self, headstart_weight):
        self.weight = float(headstart_weight)
        self._frozen = True

    def start_training(self):
        self._frozen = False

    def compute_attention_weight(self, params, di1, di2):
        o1, _ = self._towers[0].apply(params["linear1"], {}, di1)
        o2, _ = self._towers[1].apply(params["linear2"], {}, di2)
        return ACTIVATIONS[self.activation_type](o1 + o2)

    def get_weights(self, params=None):
        """Last computed attention weights (for EmbeddingObserver dumps,
        reference embedder.py:162-166).

        Only meaningful after an EAGER forward (or while frozen to the
        headstart scalar). After a JITTED forward _last_weight holds the
        trace-time tracer — MultimodalEmbedder therefore RETURNS the
        weights from the jitted function instead of reading them back
        here; calling this with a leaked tracer raises a clear error
        rather than jax's UnexpectedTracerError downstream."""
        import jax
        w = self._last_weight
        if isinstance(w, jax.core.Tracer):
            raise RuntimeError(
                "attention weights were last computed inside a jitted "
                "forward; read them from the forward's returned arrays "
                "(MultimodalEmbedder writes attention_weights.features) "
                "instead of get_weights()")
        return w if w is not None else self.weight

    def apply(self, params, x_list, diff_input=None, rng=None, train=False):
        assert len(x_list) == 2
        i1, i2 = x_list
        if diff_input is not None:
            assert len(diff_input) == 2
            di1, di2 = diff_input
        else:
            di1, di2 = i1, i2
        if self._frozen:
            w = self.weight
        else:
            w = self.compute_attention_weight(params, di1, di2)
            self._last_weight = w
        return self._combine(i1 * w, i2 * (1.0 - w))


class BiWeightedPreTrained(BiWeightedDeepLearnt):
    """Attention inputs pass through frozen pre-trained towers first
    (reference integration.py:478-573)."""

    def __init__(self, net_1, net_2, net_path1, net_path2,
                 trim_net1_start=None, trim_net1_end=None,
                 trim_net2_start=None, trim_net2_end=None,
                 *args, **kwargs):
        super().__init__(*args, **kwargs)
        net_1.load_network(net_path1)
        net_2.load_network(net_path2)
        self._pre1 = net_1
        self._pre2 = net_2
        # trim_net* selects a block window of the pre-trained tower
        # (reference integration.py:492-543 unrolls the torch Sequential
        # and keeps child[start:end+1]; the functional analogue slices
        # the TowerSpec + params, Tower.sliced)
        self._trim1 = (trim_net1_start, trim_net1_end)
        self._trim2 = (trim_net2_start, trim_net2_end)

    def _run_pretrained(self, net, x, trim=(None, None)):
        """Run the (frozen) pre-trained tower, optionally trimmed.

        trim indices count *unrolled torch children* exactly like the
        reference (reference integration.py:539-566 flattens the
        Sequential — Linear, Dropout, [BatchNorm1d], activation per
        layer — and keeps child[start:end+1]; falsy start/end mean
        untrimmed on that side). Child offsets map onto the functional
        tower's blocks: an end offset before the block's activation
        strips that activation (Dropout is identity here — the
        pre-trained net always runs at eval); a start inside a block
        (skipping its Linear) has no functional-tower equivalent and
        raises."""
        start, end = trim
        if not start and not end:
            res = net.forward_once(net.params, net.state, x,
                                   train=False)
            if len(res) != 2:
                raise TypeError(
                    "BiWeightedPreTrained needs a single-output "
                    "pre-trained network (SiameseNetwork); got a "
                    f"{type(net).__name__} whose forward_once returns "
                    f"{len(res)} values — multi-head networks have no "
                    "canonical attention input")
            out, _ = res
        else:
            assert hasattr(net, "_tower"), (
                "trim_net* requires a single-tower pre-trained network "
                "(SiameseNetwork)")
            spec = net._tower.spec
            per = 4 if spec.batch_norm else 3  # children per block
            n_children = spec.num_layers * per
            if start:
                assert start > 0  # reference integration.py:544
                assert start % per == 0, (
                    f"trim start {start} cuts inside a block (the "
                    f"block's Linear is child {start - start % per}); "
                    "starting mid-block would apply Dropout/BatchNorm/"
                    "activation without the preceding Linear — use a "
                    f"multiple of {per}")
                b0 = start // per
            else:
                b0 = None
            if end:
                assert end < n_children  # reference integration.py:549
                b1, off = divmod(end, per)
            else:
                b1, off = spec.num_layers - 1, per - 1
            tower, p, st = net._tower.sliced(net.params, net.state,
                                             b0, b1)
            if off < per - 1:
                if spec.batch_norm and off < 2:
                    raise NotImplementedError(
                        f"trim end {end} keeps a block's Linear but "
                        "drops its BatchNorm; per-block batch-norm "
                        "stripping is not representable in the "
                        "functional tower")
                # keep the last block's Linear (+BN) but not its
                # activation, like the reference child slice
                tower.spec.activations[-1] = None
            out, _ = tower.apply(p, st, x, train=False)
        return jax.lax.stop_gradient(out)

    def apply(self, params, x_list, diff_input=None, rng=None, train=False):
        assert len(x_list) == 2
        i1, i2 = x_list
        if diff_input is not None:
            di1, di2 = diff_input
        else:
            di1, di2 = i1, i2
        di1 = self._run_pretrained(self._pre1, di1, self._trim1)
        di2 = self._run_pretrained(self._pre2, di2, self._trim2)
        return super().apply(params, [i1, i2], diff_input=[di1, di2],
                             rng=rng, train=train)

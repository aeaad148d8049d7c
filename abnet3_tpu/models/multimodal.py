"""Multimodal siamese network: per-modality pre-nets + integration + post-net.

Functional rebuild of the reference architecture
(reference model.py:379-621). Each modality runs through its own MLP
pre-net; the integration unit fuses the modality embeddings (optionally
attending over *earlier* pre-net activations via
``asynchronous_integration_index``, reference model.py:550-558); a post-net
maps the fused vector to the output embedding.
"""

from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp

from abnet3_tpu.models.siamese import NetworkBuilder
from abnet3_tpu.nn import Tower, TowerSpec
from abnet3_tpu.serialize import load_pytree, save_pytree
from abnet3_tpu.utils import expand_dimension_list

__all__ = ["MultimodalSiameseNetwork"]


class MultimodalSiameseNetwork(NetworkBuilder):
    def __init__(self, integration_unit=None,
                 pre_integration_net_params=None,
                 post_integration_net_params=None,
                 attention_lr=None,
                 asynchronous_integration_index=None,
                 p_dropout=0.0, batch_norm=False,
                 type_init="xavier_uni", activation_layer=None,
                 output_path=None, *args, **kwargs):
        assert activation_layer in ("relu", "sigmoid", "tanh")
        assert type_init in ("xavier_uni", "xavier_normal", "orthogonal")
        assert integration_unit is not None, \
            "If only using one input, use original SiameseNetwork"

        if asynchronous_integration_index is not None:
            assert asynchronous_integration_index >= 0
            assert pre_integration_net_params, \
                "asynchronous integration needs pre-integration networks"
            assert asynchronous_integration_index < len(
                expand_dimension_list(pre_integration_net_params[0])) - 1

        self.activation_layer = activation_layer
        self.batch_norm = batch_norm
        self.type_init = type_init
        self.p_dropout = p_dropout
        self.output_path = output_path
        self.integration_unit = integration_unit
        self.attention_lr = attention_lr
        self.asynchronous_integration_index = asynchronous_integration_index
        self.pre_integration_net_params = pre_integration_net_params
        self.post_integration_net_params = post_integration_net_params

        common = dict(p_dropout=p_dropout, batch_norm=batch_norm,
                      type_init=type_init, gain_activation=activation_layer)
        self.pre = bool(pre_integration_net_params)
        self.post = bool(post_integration_net_params)
        self._pre_nets: List[Tower] = []
        if self.pre:
            for net_params in pre_integration_net_params:
                dims = expand_dimension_list(net_params)
                acts = [activation_layer] * (len(dims) - 1)
                self._pre_nets.append(Tower(TowerSpec(dims, acts, **common)))
        self._post_net: Optional[Tower] = None
        if self.post:
            dims = expand_dimension_list(post_integration_net_params)
            acts = [activation_layer] * (len(dims) - 1)
            self._post_net = Tower(TowerSpec(dims, acts, **common))
        self._params = None
        self._state = {}

    def init_params(self, rng):
        n_keys = len(self._pre_nets) + 2
        keys = jax.random.split(rng, n_keys)
        params, state = {}, {}
        for i, net in enumerate(self._pre_nets):
            p, s = net.init(keys[i])
            params[f"pre_{i}"] = p
            state[f"pre_{i}"] = s
        params["integration"] = self.integration_unit.init_params(keys[-2])
        if self.post:
            p, s = self._post_net.init(keys[-1])
            params["post"] = p
            state["post"] = s
        return params, state

    def forward_once(self, params, state, x_list, rng=None, train=False,
                     integration_mask=None, weights=None):
        """x_list: one array per modality. Returns (emb, new_state).

        ``weights``: per-row validity weights — padded rows carry 0 so
        they stay out of the batch-norm statistics (same contract as the
        monotask towers; index-gather frame batches pad to static
        shapes)."""
        if not isinstance(x_list, (list, tuple)):
            x_list = [x_list]
        new_state = dict(state)
        n_rngs = len(self._pre_nets) + 2
        rngs = (jax.random.split(rng, n_rngs) if rng is not None
                else [None] * n_rngs)
        partial_results = list(x_list)
        attention_inputs = None
        if self.pre:
            assert len(x_list) == len(self._pre_nets), (
                f"Number of inputs: {len(x_list)} doesn't match number of "
                f"pre_integration nets: {len(self._pre_nets)}")
            partial_results = []
            all_partials = []
            for i, (x, net) in enumerate(zip(x_list, self._pre_nets)):
                out, s, partials = net.apply(
                    params[f"pre_{i}"], state[f"pre_{i}"], x, rng=rngs[i],
                    train=train, weights=weights, save_partials=True)
                new_state[f"pre_{i}"] = s
                partial_results.append(out)
                all_partials.append(partials)
            if self.asynchronous_integration_index is not None:
                idx = self.asynchronous_integration_index
                attention_inputs = [p[idx] for p in all_partials]

        kwargs = {}
        if integration_mask is not None:
            kwargs["mask"] = integration_mask
        out = self.integration_unit.apply(
            params.get("integration", {}), partial_results,
            diff_input=attention_inputs, rng=rngs[-2], train=train, **kwargs)

        if self.post:
            out, s = self._post_net.apply(params["post"], state["post"], out,
                                          rng=rngs[-1], train=train,
                                          weights=weights)
            new_state["post"] = s
        return out, new_state

    def forward(self, params, state, x_list1, x_list2, rng=None, train=False,
                weights=None):
        if rng is not None:
            r1, r2, rm = jax.random.split(rng, 3)
        else:
            r1 = r2 = rm = None
        m1 = m2 = None
        # MultitaskIntegration draws one feed-mode pair per example so the
        # two branches see *paired* masks (replaces the reference's stateful
        # next_mask hand-off, reference integration.py:231-235)
        if hasattr(self.integration_unit, "draw_masks") and rm is not None \
                and train:
            n = (x_list1[0] if isinstance(x_list1, (list, tuple))
                 else x_list1).shape[0]
            m1, m2 = self.integration_unit.draw_masks(rm, n)
        out1, state = self.forward_once(params, state, x_list1, rng=r1,
                                        train=train, integration_mask=m1,
                                        weights=weights)
        out2, state = self.forward_once(params, state, x_list2, rng=r2,
                                        train=train, integration_mask=m2,
                                        weights=weights)
        return out1, out2, state

    def save_network(self, epoch=""):
        """One tree holds everything, including the integration params, at
        ``<output_path><epoch>.pth`` — the same naming contract the
        orchestrator wires for every network (the reference's multimodal
        save/load paths could never round-trip through gridsearch:
        reference model.py:583-592 vs gridsearch.py:201). The integration
        unit additionally saves its legacy standalone file."""
        save_pytree(self.output_path + str(epoch) + ".pth",
                    {"params": self._params, "state": self._state},
                    meta={"class_name": self.__class__.__name__})
        self.integration_unit._params = self._params.get("integration", {})
        self.integration_unit.output_path = self.output_path
        self.integration_unit.save()

    def load_network(self, path=None):
        import os
        if not os.path.exists(path) and os.path.exists(
                str(path) + "network.pth"):  # legacy reference naming
            path = str(path) + "network.pth"
        tree, _ = load_pytree(path)
        self._params = jax.tree_util.tree_map(jnp.asarray, tree["params"])
        self._state = jax.tree_util.tree_map(jnp.asarray,
                                             tree.get("state", {}))

    def whoami(self):
        return {"params": {
            "pre_integration_net_params": self.pre_integration_net_params,
            "post_integration_net_params": self.post_integration_net_params,
            "attention_lr": self.attention_lr,
            "asynchronous_integration_index":
                self.asynchronous_integration_index,
            "p_dropout": self.p_dropout,
            "batch_norm": self.batch_norm,
            "type_init": self.type_init,
            "activation_layer": self.activation_layer,
            "output_path": self.output_path,
        }, "class_name": self.__class__.__name__,
            "architecture": str(self.integration_unit)}

"""Siamese MLP networks as pure-functional JAX models.

API parity with the reference zoo (reference model.py:30-376) with a
TPU-first twist: the two siamese branches share weights, so
``forward(x1, x2)`` concatenates both inputs into a single ``(2N, d)`` batch
and runs **one** matmul pass through the tower — twice the MXU work per
kernel launch and one fused XLA computation instead of two sequential
branch evaluations (reference model.py:188-196 runs the towers serially).

Parameters are nested dicts (jax pytrees); stateful bits (batch-norm running
stats) live in a separate ``state`` pytree. ``save_network``/``load_network``
keep the reference's ``<output_path><epoch>.pth`` naming contract
(reference model.py:204-208) but store a safe npz payload.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from abnet3_tpu.nn import Tower, TowerSpec
from abnet3_tpu.serialize import load_pytree, save_pytree

__all__ = ["NetworkBuilder", "SiameseNetwork", "SiameseMultitaskNetwork"]


class NetworkBuilder:
    """Generic network interface (reference model.py:30-79)."""

    def init_params(self, rng):
        raise NotImplementedError(
            "Unimplemented init_params for class:", self.__class__.__name__)

    def forward_once(self, params, state, x, rng=None, train=False):
        raise NotImplementedError(
            "Unimplemented forward_once for class:", self.__class__.__name__)

    def forward(self, params, state, x1, x2, rng=None, train=False):
        raise NotImplementedError(
            "Unimplemented forward for class:", self.__class__.__name__)

    def whoami(self):
        return {"params": {k: v for k, v in self.__dict__.items()
                           if not k.startswith("_")},
                "class_name": self.__class__.__name__}

    def plot_network(self, *args, **kwargs):
        """Graphviz visualization (unimplemented in the reference too,
        reference model.py:74-79)."""
        raise NotImplementedError(
            "Unimplemented plot_network for class:",
            self.__class__.__name__)

    # -- parameter persistence ------------------------------------------
    def save_network(self, epoch=""):
        assert self.output_path is not None, "output_path not set"
        assert self._params is not None, "network not initialised"
        save_pytree(self.output_path + str(epoch) + ".pth",
                    {"params": self._params, "state": self._state},
                    meta={"class_name": self.__class__.__name__})

    def load_network(self, network_path=None):
        tree, _ = load_pytree(network_path)
        self._params = jax.tree_util.tree_map(jnp.asarray, tree["params"])
        self._state = jax.tree_util.tree_map(jnp.asarray,
                                             tree.get("state", {}))

    # -- convenience state holders --------------------------------------
    @property
    def params(self):
        return self._params

    @params.setter
    def params(self, value):
        self._params = value

    @property
    def state(self):
        return self._state

    @state.setter
    def state(self, value):
        self._state = value

    def ensure_init(self, seed: int = 0):
        if getattr(self, "_params", None) is None:
            self._params, self._state = self.init_params(
                jax.random.PRNGKey(seed))
        return self._params, self._state


class SiameseNetwork(NetworkBuilder):
    """Weight-shared MLP tower pair (reference model.py:82-208).

    Block structure per layer: Linear -> Dropout -> [BatchNorm] -> activation,
    with a configurable last-layer nonlinearity
    ("default" = same as hidden, None = linear output).
    """

    def __init__(self, input_dim=None, num_hidden_layers=None, hidden_dim=None,
                 output_dim=None, p_dropout=0.1, batch_norm=False,
                 type_init="xavier_uni", activation_layer=None,
                 output_path=None, last_non_linearity="default",
                 compute_dtype="float32"):
        # softmax output pairs with KLLoss (distributions over classes),
        # reference model.py:19-23 + loss.py:108-137
        assert activation_layer in ("relu", "sigmoid", "tanh", "softmax")
        assert type_init in ("xavier_uni", "xavier_normal", "orthogonal")
        assert isinstance(input_dim, int), "input dim should be int"
        assert isinstance(hidden_dim, int), "hidden dim should be int"
        assert isinstance(num_hidden_layers, int)
        assert isinstance(output_dim, int), "output dim should be int"

        self.input_dim = input_dim
        self.num_hidden_layers = num_hidden_layers
        self.hidden_dim = hidden_dim
        self.output_dim = output_dim
        self.p_dropout = p_dropout
        self.activation_layer = activation_layer
        self.batch_norm = batch_norm
        self.type_init = type_init
        self.last_non_linearity = last_non_linearity
        self.output_path = output_path
        self.compute_dtype = compute_dtype

        if last_non_linearity == "default":
            last_act: Optional[str] = activation_layer
        else:
            last_act = last_non_linearity  # a name, or None for linear

        dims = ([input_dim, hidden_dim]
                + [hidden_dim] * num_hidden_layers
                + [output_dim])
        acts = [activation_layer] * (1 + num_hidden_layers) + [last_act]
        self._tower = Tower(TowerSpec(
            dims, acts, p_dropout=p_dropout, batch_norm=batch_norm,
            type_init=type_init, gain_activation=activation_layer,
            compute_dtype=compute_dtype))
        self._params = None
        self._state = {}

    def init_params(self, rng):
        return self._tower.init(rng)

    def forward_once(self, params, state, x, rng=None, train=False,
                     weights=None):
        """One branch (used by the embedder). Returns (emb, new_state)."""
        return self._tower.apply(params, state, x, rng=rng, train=train,
                                 weights=weights)

    def forward(self, params, state, x1, x2, rng=None, train=False,
                weights=None):
        """Fused siamese forward: both branches in one MXU pass.

        Note: with batch_norm=True this normalizes over the union of the two
        branches, which is exactly what weight sharing implies for a siamese
        update (the reference computes per-branch batch stats; at eval both
        use running stats, so embeddings agree). ``weights`` marks valid
        rows so padded frames stay out of the batch statistics.
        """
        n = x1.shape[0]
        x = jnp.concatenate([x1, x2], axis=0)
        w = (jnp.concatenate([weights, weights], axis=0)
             if weights is not None else None)
        out, new_state = self._tower.apply(params, state, x, rng=rng,
                                           train=train, weights=w)
        return out[:n], out[n:], new_state

    def whoami(self):
        return {"params": {
            "input_dim": self.input_dim,
            "num_hidden_layers": self.num_hidden_layers,
            "hidden_dim": self.hidden_dim,
            "output_dim": self.output_dim,
            "p_dropout": self.p_dropout,
            "batch_norm": self.batch_norm,
            "type_init": self.type_init,
            "activation_layer": self.activation_layer,
            "last_non_linearity": self.last_non_linearity,
            "output_path": self.output_path,
            "compute_dtype": str(self.compute_dtype),
        }, "class_name": self.__class__.__name__}


class SiameseMultitaskNetwork(NetworkBuilder):
    """Shared trunk + separate speaker/phoneme heads
    (reference model.py:211-376)."""

    def __init__(self, input_dim=None, num_hidden_layers_shared=None,
                 num_hidden_layers_spk=None, num_hidden_layers_phn=None,
                 hidden_dim=None, output_dim=None, p_dropout=0.1,
                 batch_norm=False, type_init="xavier_uni",
                 activation_layer=None, output_path=None):
        assert activation_layer in ("relu", "sigmoid", "tanh", "softmax")
        assert type_init in ("xavier_uni", "xavier_normal", "orthogonal")
        for v in (input_dim, hidden_dim, output_dim, num_hidden_layers_shared,
                  num_hidden_layers_spk, num_hidden_layers_phn):
            assert isinstance(v, int)

        self.input_dim = input_dim
        self.num_hidden_layers_shared = num_hidden_layers_shared
        self.num_hidden_layers_spk = num_hidden_layers_spk
        self.num_hidden_layers_phn = num_hidden_layers_phn
        self.hidden_dim = hidden_dim
        self.output_dim = output_dim
        self.p_dropout = p_dropout
        self.activation_layer = activation_layer
        self.batch_norm = batch_norm
        self.type_init = type_init
        self.output_path = output_path

        common = dict(p_dropout=p_dropout, batch_norm=batch_norm,
                      type_init=type_init, gain_activation=activation_layer)
        act = activation_layer
        # trunk: input layer + shared hiddens (reference model.py:271-291)
        trunk_dims = ([input_dim, hidden_dim]
                      + [hidden_dim] * num_hidden_layers_shared)
        self._trunk = Tower(TowerSpec(
            trunk_dims, [act] * (1 + num_hidden_layers_shared), **common))
        # heads: task hiddens + output layer (reference model.py:293-334)
        spk_dims = [hidden_dim] * (num_hidden_layers_spk + 1) + [output_dim]
        phn_dims = [hidden_dim] * (num_hidden_layers_phn + 1) + [output_dim]
        self._head_spk = Tower(TowerSpec(
            spk_dims, [act] * (num_hidden_layers_spk + 1), **common))
        self._head_phn = Tower(TowerSpec(
            phn_dims, [act] * (num_hidden_layers_phn + 1), **common))
        self._params = None
        self._state = {}

    def init_params(self, rng):
        k1, k2, k3 = jax.random.split(rng, 3)
        trunk_p, trunk_s = self._trunk.init(k1)
        spk_p, spk_s = self._head_spk.init(k2)
        phn_p, phn_s = self._head_phn.init(k3)
        params = {"trunk": trunk_p, "spk": spk_p, "phn": phn_p}
        state = {"trunk": trunk_s, "spk": spk_s, "phn": phn_s}
        return params, state

    def forward_once(self, params, state, x, rng=None, train=False,
                     weights=None):
        """Returns (emb_spk, emb_phn, new_state)."""
        if rng is not None:
            r1, r2, r3 = jax.random.split(rng, 3)
        else:
            r1 = r2 = r3 = None
        h, trunk_s = self._trunk.apply(params["trunk"], state["trunk"], x,
                                       rng=r1, train=train,
                                       weights=weights)
        spk, spk_s = self._head_spk.apply(params["spk"], state["spk"], h,
                                          rng=r2, train=train,
                                          weights=weights)
        phn, phn_s = self._head_phn.apply(params["phn"], state["phn"], h,
                                          rng=r3, train=train,
                                          weights=weights)
        return spk, phn, {"trunk": trunk_s, "spk": spk_s, "phn": phn_s}

    def forward(self, params, state, x1, x2, rng=None, train=False,
                weights=None):
        """Returns (spk1, phn1, spk2, phn2, new_state); fused over branches
        like SiameseNetwork.forward."""
        n = x1.shape[0]
        x = jnp.concatenate([x1, x2], axis=0)
        w = (jnp.concatenate([weights, weights], axis=0)
             if weights is not None else None)
        spk, phn, new_state = self.forward_once(params, state, x, rng=rng,
                                                train=train, weights=w)
        return spk[:n], phn[:n], spk[n:], phn[n:], new_state

    def whoami(self):
        return {"params": {
            "input_dim": self.input_dim,
            "num_hidden_layers_shared": self.num_hidden_layers_shared,
            "num_hidden_layers_spk": self.num_hidden_layers_spk,
            "num_hidden_layers_phn": self.num_hidden_layers_phn,
            "hidden_dim": self.hidden_dim,
            "output_dim": self.output_dim,
            "p_dropout": self.p_dropout,
            "batch_norm": self.batch_norm,
            "type_init": self.type_init,
            "activation_layer": self.activation_layer,
            "output_path": self.output_path,
        }, "class_name": self.__class__.__name__}

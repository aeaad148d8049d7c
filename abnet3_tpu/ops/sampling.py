"""On-device pair sampling: the sampler's distributions live in HBM and
pair generation happens *inside* the jitted training step.

The reference samples pairs once, offline, into text files
(reference sampler.py:690-742); the host then re-reads them every epoch.
Here the same P(type, speaker) distributions (built by
:class:`abnet3_tpu.sampler.SamplerCluster`) are compiled into device
arrays — per-config CDFs, key -> (group1, group2) tables, and a padded
(type, speaker)-group -> token-id table — so a training step can draw a
fresh pair batch with a few `jax.random` ops: combined with the
:class:`~abnet3_tpu.ops.bank.TokenBank`, the entire data pipeline
(sampling -> gather -> DTW alignment -> training) is one XLA computation
with **no per-step host involvement at all**.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["DevicePairSampler", "SamplerView"]

CONFIGS = ("Stype_Sspk", "Stype_Dspk", "Dtype_Sspk", "Dtype_Dspk")


@jax.tree_util.register_pytree_node_class
class SamplerView:
    """Pytree view of a DevicePairSampler: its device tables (group
    table + per-config CDFs and group-pair arrays — the Dtype_Dspk key
    set is O((S*K)^2), easily tens of MB on real cluster inventories)
    cross the jit boundary as ARGUMENTS instead of closures, keeping
    them out of the lowered HLO (same contract as ops.bank.BankView;
    see parallel.mesh._placed_consts). Static per-config metadata
    (name, n, same_type, same_group) rides in the hashable pytree aux."""

    def __init__(self, group_table, group_len, cfg_arrays, cfg_static,
                 batch_size):
        self.group_table = group_table
        self.group_len = group_len
        self.cfg_arrays = tuple(cfg_arrays)    # ((cdf, g1, g2), ...)
        self.cfg_static = tuple(cfg_static)    # ((name, n, st, sg), ...)
        self.batch_size = batch_size

    def tree_flatten(self):
        return ((self.group_table, self.group_len, self.cfg_arrays),
                (self.cfg_static, self.batch_size))

    @classmethod
    def tree_unflatten(cls, aux, children):
        group_table, group_len, cfg_arrays = children
        cfg_static, batch_size = aux
        return cls(group_table, group_len, cfg_arrays, cfg_static,
                   batch_size)

    def sample(self, rng, with_speakers: bool = False):
        """Draw one pair batch on device (see DevicePairSampler.sample:
        same semantics, tables read from the view)."""
        out1, out2, ys, yspk = [], [], [], []
        for (name, n, same_type, same_group), (cdf, g1t, g2t) in zip(
                self.cfg_static, self.cfg_arrays):
            rng, k_key, k_t1, k_t2 = jax.random.split(rng, 4)
            u = jax.random.uniform(k_key, (n,))
            idx = jnp.searchsorted(cdf, u, side="right")
            idx = jnp.clip(idx, 0, cdf.shape[0] - 1)
            g1 = g1t[idx]
            g2 = g2t[idx]
            len1 = self.group_len[g1]
            len2 = self.group_len[g2]
            r1 = jax.random.randint(k_t1, (n,), 0, 1 << 30) % \
                jnp.maximum(len1, 1)
            if same_group:
                # two distinct tokens from one group; clamp keeps even a
                # singleton group inside its own table row instead of
                # reading padded id 0 from position 1
                r2 = jax.random.randint(k_t2, (n,), 0, 1 << 30) % \
                    jnp.maximum(len1 - 1, 1)
                r2 = jnp.minimum(r2 + (r2 >= r1), len1 - 1)
            else:
                r2 = jax.random.randint(k_t2, (n,), 0, 1 << 30) % \
                    jnp.maximum(len2, 1)
            t1 = self.group_table[g1, r1]
            t2 = self.group_table[g2, r2]
            out1.append(t1)
            out2.append(t2)
            ys.append(jnp.full((n,), 1.0 if same_type else -1.0))
            if with_speakers:
                yspk.append(jnp.full((n,),
                                     1.0 if name.endswith("Sspk")
                                     else -1.0))
        out = (jnp.concatenate(out1), jnp.concatenate(out2),
               jnp.concatenate(ys))
        if with_speakers:
            return out + (jnp.concatenate(yspk),)
        return out


class DevicePairSampler:
    """Compile sampler distributions into device tables.

    Parameters
    ----------
    descr : dict
        Cluster statistics from ``SamplerCluster.analyze_clusters``.
    proba : dict
        Per-config key->probability dicts from
        ``SamplerCluster.type_speaker_sampling_p``.
    token_to_bank_id : optional mapping
        token index (into descr['tokens']) -> TokenBank id. Identity when
        the bank was built in descr token order.
    batch_size : int
        Pairs per sampled batch.
    ratio_same_diff_spk / ratio_same_diff_type : float
        Budget split across the four configs
        (reference sampler.py:634-645).
    """

    def __init__(self, descr, proba, batch_size=64,
                 ratio_same_diff_spk=0.5, ratio_same_diff_type=0.5,
                 token_to_bank_id=None):
        self.batch_size = batch_size

        # ---- token groups: (type, speaker) -> token ids ----------------
        groups: Dict = {}
        for tok_id, (k, spk) in enumerate(zip(descr["tokens_type"],
                                              descr["tokens_speaker"])):
            groups.setdefault((int(k), spk), []).append(tok_id)
        group_keys = list(groups.keys())
        gid = {key: i for i, key in enumerate(group_keys)}
        max_g = max(len(v) for v in groups.values())
        table = np.zeros((len(group_keys), max_g), np.int64)
        glen = np.zeros((len(group_keys),), np.int32)
        for i, key in enumerate(group_keys):
            toks = groups[key]
            if token_to_bank_id is not None:
                toks = [token_to_bank_id[t] for t in toks]
            table[i, :len(toks)] = toks
            glen[i] = len(toks)
        self.group_table = jnp.asarray(table.astype(np.int32))
        self.group_len = jnp.asarray(glen)

        # ---- per-config cdf + key->(group1, group2) --------------------
        num_same_spk = int(batch_size * (1 - ratio_same_diff_spk))
        num_diff_spk = batch_size - num_same_spk
        budget = {
            "Stype_Sspk": int(num_same_spk * (1 - ratio_same_diff_type)),
            "Dtype_Sspk": int(num_same_spk * ratio_same_diff_type),
            "Stype_Dspk": int(num_diff_spk * (1 - ratio_same_diff_type)),
            "Dtype_Dspk": int(num_diff_spk * ratio_same_diff_type),
        }
        self.configs = []
        for config in CONFIGS:
            dist = proba.get(config, {})
            keys = list(dist.keys())
            probs = np.asarray([dist[k] for k in keys], np.float64)
            n = budget[config]
            if len(keys) == 0 or probs.sum() <= 0:
                continue
            cdf = np.cumsum(probs)
            cdf /= cdf[-1]
            g1 = np.zeros(len(keys), np.int32)
            g2 = np.zeros(len(keys), np.int32)
            for i, key in enumerate(keys):
                if config == "Stype_Sspk":
                    spk, k = key
                    g1[i] = g2[i] = gid[(int(k), spk)]
                elif config == "Stype_Dspk":
                    spk1, spk2, k = key
                    g1[i] = gid[(int(k), spk1)]
                    g2[i] = gid[(int(k), spk2)]
                elif config == "Dtype_Sspk":
                    spk, ki, kj = key
                    g1[i] = gid[(int(ki), spk)]
                    g2[i] = gid[(int(kj), spk)]
                else:
                    spk1, spk2, ki, kj = key
                    # fall back to the swapped speaker assignment when the
                    # direct one was never observed
                    # (reference sampler.py:681-686)
                    if (int(ki), spk1) in gid and (int(kj), spk2) in gid:
                        g1[i] = gid[(int(ki), spk1)]
                        g2[i] = gid[(int(kj), spk2)]
                    else:
                        g1[i] = gid[(int(ki), spk2)]
                        g2[i] = gid[(int(kj), spk1)]
            self.configs.append(dict(
                name=config, n=n,
                same_type=config.startswith("Stype"),
                same_group=(config == "Stype_Sspk"),
                cdf=jnp.asarray(cdf.astype(np.float32)),
                g1=jnp.asarray(g1), g2=jnp.asarray(g2)))
        assert self.configs, "no sampleable pair configuration"
        # static batch size: int-truncation leftovers and budget lost to
        # unavailable configs top up the first config the user actually
        # REQUESTED pairs of — never a zero-ratio config (review finding:
        # ratio_same_diff_spk=1.0 still put a same-speaker pair in every
        # batch) — falling back to the first viable one only when every
        # requested config is unavailable
        total = sum(c["n"] for c in self.configs)
        missing = batch_size - total
        if missing:
            target = next((c for c in self.configs if c["n"] > 0),
                          self.configs[0])
            target["n"] += missing
        self.configs = [c for c in self.configs if c["n"] > 0]
        assert self.configs, "no sampleable pair configuration"

    def view(self) -> SamplerView:
        """Jit-argument view of the device tables (see SamplerView)."""
        return SamplerView(
            self.group_table, self.group_len,
            tuple((c["cdf"], c["g1"], c["g2"]) for c in self.configs),
            tuple((c["name"], c["n"], c["same_type"], c["same_group"])
                  for c in self.configs),
            self.batch_size)

    def sample(self, rng, with_speakers: bool = False):
        """Draw one pair batch on device.

        Returns (ids1, ids2, y) with static shape (batch_size,):
        TokenBank ids and +1/-1 same/diff-type labels. Jit-friendly.

        with_speakers=True appends the +1/-1 same/diff-SPEAKER labels
        (the multitask stream): they are static per config — Sspk
        configs pair one speaker's groups, Dspk configs two different
        speakers' (the Dtype_Dspk fallback swap keeps them distinct) —
        so no per-token speaker lookup is needed. (Implementation lives
        on SamplerView so the step factories can pass the tables as jit
        arguments; calling this directly inside a jit still works but
        closes over the tables.)"""
        return self.view().sample(rng, with_speakers)

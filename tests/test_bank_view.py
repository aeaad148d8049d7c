"""Jit-argument views of device corpus state (BankView / SamplerView).

Contract (ops/bank.py BankView, parallel/mesh._placed_consts): corpus
tables cross jit boundaries as ARGUMENTS, not closures. A closed-over
device array lowers into the HLO as a dense literal, so the compiled
executable — and, through a remote compile service, every compile
request body — carries the whole corpus (measured HTTP 413 at N=8192
through the axon tunnel). These tests pin (a) result parity between
bank/sampler and their views and (b) the HLO-size contract itself.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from abnet3_tpu.ops.bank import BankView, TokenBank
from abnet3_tpu.ops.sampling import DevicePairSampler
from abnet3_tpu.sampler import SamplerClusterSiamese

from test_sampler import CLASSES, SPKID  # noqa: F401


@pytest.fixture
def bank():
    rng = np.random.RandomState(7)
    feats = {f"t{i}": rng.randn(rng.randint(4, 40), 12).astype(np.float32)
             for i in range(37)}
    return TokenBank(feats)


def test_view_take_matches_bank(bank):
    view = bank.view()
    assert isinstance(view, BankView)
    assert len(view) == len(bank)
    ids = jnp.asarray([0, 3, 36, 3], jnp.int32)
    for cap in (None, 16, 10_000):
        fb, nb = bank.take(ids, cap)
        fv, nv = view.take(ids, cap)
        np.testing.assert_array_equal(np.asarray(fb), np.asarray(fv))
        np.testing.assert_array_equal(np.asarray(nb), np.asarray(nv))


def test_view_is_pytree_with_static_aux(bank):
    view = bank.view()
    leaves, treedef = jax.tree_util.tree_flatten(view)
    assert len(leaves) == 2  # table + lengths; max_len/dim ride in aux
    rebuilt = jax.tree_util.tree_unflatten(treedef, leaves)
    assert rebuilt.max_len == bank.max_len and rebuilt.dim == bank.dim
    # aux must be hashable so jit can key its cache on the treedef
    hash(treedef)

    # jit sees max_len/dim as trace-time Python ints (static slicing)
    @jax.jit
    def f(bv, ids):
        return bv.take(ids, max_frames=min(16, bv.max_len))[0]

    out = f(view, jnp.asarray([1, 2], jnp.int32))
    assert out.shape == (2, min(16, bank.max_len), bank.dim)


def test_view_keeps_corpus_out_of_the_hlo(bank):
    """The whole point: lowering a take through a view ARGUMENT yields
    an HLO independent of corpus size; closing over the table embeds it
    as a literal (what used to ride in every remote compile request)."""
    ids = jnp.asarray([0, 1, 2, 3], jnp.int32)

    arg_text = jax.jit(
        lambda bv, i: bv.take(i)[0]).lower(bank.view(), ids).as_text()
    closure_text = jax.jit(
        lambda i: bank.take(i)[0]).lower(ids).as_text()

    table_bytes = bank.bank.size * 4
    assert len(arg_text) < 20_000
    # the closure HLO carries the dense table (hex-printed, ~2x bytes)
    assert len(closure_text) > table_bytes
    assert len(closure_text) > 10 * len(arg_text)


@pytest.fixture
def sampler(tmp_path):
    p = tmp_path / "test.classes"
    p.write_text(CLASSES)
    s = SamplerClusterSiamese()
    clusters = s.parse_input_file(str(p))
    descr = s.analyze_clusters(clusters, SPKID)
    proba = s.type_speaker_sampling_p(descr, "log", "log")
    return DevicePairSampler(descr, proba, batch_size=128)


def test_sampler_view_matches_sampler(sampler):
    view = sampler.view()
    for seed in (0, 1):
        key = jax.random.PRNGKey(seed)
        a = sampler.sample(key, with_speakers=True)
        b = view.sample(key, with_speakers=True)
        for xa, xb in zip(a, b):
            np.testing.assert_array_equal(np.asarray(xa), np.asarray(xb))


def test_sampler_view_pytree_and_hlo(sampler):
    view = sampler.view()
    leaves, treedef = jax.tree_util.tree_flatten(view)
    hash(treedef)
    rebuilt = jax.tree_util.tree_unflatten(treedef, leaves)
    assert rebuilt.cfg_static == view.cfg_static

    jitted = jax.jit(lambda sv, k: sv.sample(k))
    key = jax.random.PRNGKey(3)
    a = jitted(view, key)
    b = sampler.sample(key)
    for xa, xb in zip(a, b):
        np.testing.assert_array_equal(np.asarray(xa), np.asarray(xb))

    # group/cdf tables stay out of the lowered HLO: inflating the group
    # table 64x barely moves the HLO size (only shape strings change) —
    # a closure would embed the extra ~64x data as a dense literal
    text = jitted.lower(view, key).as_text()
    from abnet3_tpu.ops.sampling import SamplerView
    big = SamplerView(jnp.tile(view.group_table, (1, 64)),
                      view.group_len, view.cfg_arrays, view.cfg_static,
                      view.batch_size)
    big_text = jitted.lower(big, key).as_text()
    extra_bytes = (big.group_table.size - view.group_table.size) * 4
    assert abs(len(big_text) - len(text)) < min(extra_bytes, 5_000)


def test_upload_rows_chunked_equals_single(monkeypatch):
    """Chunked corpus upload (GB-scale h2d goes in <=64 MB row slices)
    assembles exactly the single-transfer array; tiny chunks force the
    multi-part path."""
    import abnet3_tpu.ops.bank as bank_mod
    rng = np.random.RandomState(0)
    arr = rng.randn(37, 5, 3).astype(np.float32)
    single = np.asarray(bank_mod.upload_rows(arr))
    np.testing.assert_array_equal(single, arr)
    monkeypatch.setattr(bank_mod, "_UPLOAD_CHUNK_BYTES", 4 * 5 * 3 * 4)
    out = bank_mod.upload_rows(arr)
    np.testing.assert_array_equal(np.asarray(out), arr)
    # TokenBank rides the same path
    feats = {i: rng.randn(4 + i % 3, 3).astype(np.float32)
             for i in range(9)}
    tb = bank_mod.TokenBank(feats)
    for i in range(9):
        got = np.asarray(tb.bank[i, :len(feats[i])])
        np.testing.assert_array_equal(got, feats[i])

"""Embedder tests: chunk-seam correctness, h5features export, multitask."""

import numpy as np
import pytest

import jax

from abnet3_tpu.embedder import EmbedderSiamese, EmbedderSiameseMultitask
from abnet3_tpu.io import read_h5features, write_h5features
from abnet3_tpu.models import SiameseMultitaskNetwork, SiameseNetwork


@pytest.fixture
def feature_file(tmp_path):
    rng = np.random.RandomState(0)
    path = str(tmp_path / "feats.h5f")
    items = ["a", "b", "c"]
    feats = [rng.randn(n, 6).astype(np.float32) for n in (120, 37, 5)]
    times = [np.arange(len(f)) * 0.01 + 0.0025 for f in feats]
    write_h5features(path, "features", items, times, feats)
    return path, items, feats, times


def test_embedder_siamese(feature_file, tmp_path):
    path, items, feats, times = feature_file
    net = SiameseNetwork(input_dim=6, num_hidden_layers=1, hidden_dim=16,
                         output_dim=7, p_dropout=0.0,
                         activation_layer="sigmoid",
                         output_path=str(tmp_path / "network"))
    net.ensure_init(0)
    net.save_network()
    out = str(tmp_path / "emb.h5f")
    emb = EmbedderSiamese(network=net,
                          network_path=str(tmp_path / "network.pth"),
                          feature_path=path, output_path=out,
                          batch_size=50)  # force chunking on file 'a'
    emb.embed()

    data = read_h5features(out)
    assert data.items() == items
    for e, f, t in zip(data.features(), feats, times):
        assert e.shape == (len(f), 7)
    np.testing.assert_allclose(data.labels()[0], times[0])
    # chunk seams: output equals single-pass forward
    full, _ = net.forward_once(net.params, net.state,
                               jax.numpy.asarray(feats[0]), train=False)
    np.testing.assert_allclose(data.features()[0], np.asarray(full),
                               rtol=2e-5, atol=1e-6)


def test_embedder_overwrites(feature_file, tmp_path):
    path, items, feats, _ = feature_file
    net = SiameseNetwork(input_dim=6, num_hidden_layers=0, hidden_dim=4,
                         output_dim=3, p_dropout=0.0,
                         activation_layer="relu")
    net.ensure_init(0)
    out = str(tmp_path / "emb.h5f")
    emb = EmbedderSiamese(network=net, feature_path=path, output_path=out,
                          batch_size=1000)
    emb.embed()
    emb.embed()  # second run must overwrite, not append
    data = read_h5features(out)
    assert data.items() == items


def test_embedder_multitask(feature_file, tmp_path):
    path, items, feats, _ = feature_file
    net = SiameseMultitaskNetwork(
        input_dim=6, num_hidden_layers_shared=1, num_hidden_layers_spk=0,
        num_hidden_layers_phn=0, hidden_dim=8, output_dim=5, p_dropout=0.0,
        activation_layer="relu", output_path=str(tmp_path / "network"))
    net.ensure_init(0)
    out = str(tmp_path / "emb.h5f")
    emb = EmbedderSiameseMultitask(network=net, feature_path=path,
                                   output_path=out, batch_size=64)
    emb.embed()
    spk = read_h5features(out + ".spk")
    phn = read_h5features(out + ".phn")
    assert spk.items() == items and phn.items() == items
    assert spk.features()[0].shape == (120, 5)
    assert not np.allclose(spk.features()[0], phn.features()[0])


def test_embedder_sharded_mesh(feature_file, tmp_path):
    """Data-parallel embedding over the 8-device virtual mesh matches the
    single-device output."""
    from abnet3_tpu.parallel import make_mesh
    path, items, feats, _ = feature_file
    net = SiameseNetwork(input_dim=6, num_hidden_layers=1, hidden_dim=16,
                         output_dim=7, p_dropout=0.0,
                         activation_layer="sigmoid")
    net.ensure_init(0)
    out1 = str(tmp_path / "emb1.h5f")
    EmbedderSiamese(network=net, feature_path=path, output_path=out1,
                    batch_size=64).embed()
    out2 = str(tmp_path / "emb2.h5f")
    mesh = make_mesh(n_data=8, n_model=1)
    emb = EmbedderSiamese(network=net, feature_path=path, output_path=out2,
                          batch_size=50, mesh=mesh)
    assert emb.batch_size % 8 == 0  # rounded up to the data axis
    emb.embed()
    a = read_h5features(out1)
    b = read_h5features(out2)
    for fa, fb in zip(a.features(), b.features()):
        np.testing.assert_allclose(fa, fb, rtol=1e-5, atol=1e-6)


def test_embedder_bf16_transfer(feature_file, tmp_path):
    """transfer_dtype='bfloat16' halves d2h bytes; output stays float32
    and close to the f32 path."""
    path, items, feats, _ = feature_file
    net = SiameseNetwork(input_dim=6, num_hidden_layers=1, hidden_dim=16,
                         output_dim=7, p_dropout=0.0,
                         activation_layer="sigmoid")
    net.ensure_init(0)
    out32 = str(tmp_path / "e32.h5f")
    EmbedderSiamese(network=net, feature_path=path, output_path=out32,
                    batch_size=64).embed()
    out16 = str(tmp_path / "e16.h5f")
    EmbedderSiamese(network=net, feature_path=path, output_path=out16,
                    batch_size=64, transfer_dtype="bfloat16").embed()
    a = read_h5features(out32)
    b = read_h5features(out16)
    for fa, fb in zip(a.features(), b.features()):
        assert fb.dtype == np.float32
        np.testing.assert_allclose(fa, fb, atol=5e-3)


def test_embedder_requires_network():
    with pytest.raises(ValueError):
        EmbedderSiamese(network=None, feature_path="x", output_path="y")


def test_embedder_mesh_dict(feature_file, tmp_path):
    """YAML-friendly mesh dicts work like Mesh objects (gridsearch)."""
    path, items, feats, _ = feature_file
    net = SiameseNetwork(input_dim=6, num_hidden_layers=0, hidden_dim=4,
                         output_dim=3, p_dropout=0.0,
                         activation_layer="relu")
    net.ensure_init(0)
    out = str(tmp_path / "emb.h5f")
    emb = EmbedderSiamese(network=net, feature_path=path, output_path=out,
                          batch_size=50, mesh={"data": 8})
    assert emb.mesh.shape["data"] == 8
    assert emb.batch_size % 8 == 0
    emb.embed()
    assert read_h5features(out).items() == items


def test_embedder_int8_transfer(feature_file, tmp_path):
    """transfer_dtype='int8' quarters d2h bytes (per-chunk affine
    quantization); output stays float32 with roundtrip error bounded by
    scale/2 = (hi-lo)/510 of each chunk's value range."""
    path, items, feats, _ = feature_file
    net = SiameseNetwork(input_dim=6, num_hidden_layers=1, hidden_dim=16,
                         output_dim=7, p_dropout=0.0,
                         activation_layer="sigmoid",
                         last_non_linearity=None)
    net.ensure_init(0)
    out32 = str(tmp_path / "e32.h5f")
    EmbedderSiamese(network=net, feature_path=path, output_path=out32,
                    batch_size=64).embed()
    out8 = str(tmp_path / "e8.h5f")
    EmbedderSiamese(network=net, feature_path=path, output_path=out8,
                    batch_size=64, transfer_dtype="int8").embed()
    a = read_h5features(out32)
    b = read_h5features(out8)
    # chunks PACK across file boundaries (round-4), so a chunk's
    # quantization min/max — and with it the error bound — spans the
    # corpus range, not any single file's
    corpus = np.vstack(a.features())
    rng_bound = (corpus.max() - corpus.min()) / 510 + 1e-6
    for fa, fb in zip(a.features(), b.features()):
        assert fb.dtype == np.float32
        assert np.max(np.abs(fa - fb)) <= rng_bound


def test_embedder_int8_multitask_and_mesh(feature_file, tmp_path):
    """The int8 codec rides the multitask two-head export and the
    sharded-mesh path (codec scalars replicate, q shards over 'data')."""
    from abnet3_tpu.parallel import make_mesh
    path, items, feats, _ = feature_file
    net = SiameseMultitaskNetwork(
        input_dim=6, num_hidden_layers_shared=1, num_hidden_layers_spk=0,
        num_hidden_layers_phn=0, hidden_dim=8, output_dim=5, p_dropout=0.0,
        activation_layer="sigmoid")
    net.ensure_init(0)
    out = str(tmp_path / "emb.h5f")
    EmbedderSiameseMultitask(network=net, feature_path=path,
                             output_path=out, batch_size=64).embed()
    out8 = str(tmp_path / "emb8.h5f")
    EmbedderSiameseMultitask(network=net, feature_path=path,
                             output_path=out8, batch_size=64,
                             transfer_dtype="int8").embed()
    for suffix in (".spk", ".phn"):
        a = read_h5features(out + suffix)
        b = read_h5features(out8 + suffix)
        for fa, fb in zip(a.features(), b.features()):
            np.testing.assert_allclose(fa, fb, atol=8e-3)

    mesh = make_mesh(n_data=8, n_model=1)
    snet = SiameseNetwork(input_dim=6, num_hidden_layers=1, hidden_dim=16,
                          output_dim=7, p_dropout=0.0,
                          activation_layer="sigmoid")
    snet.ensure_init(0)
    outm = str(tmp_path / "embm.h5f")
    EmbedderSiamese(network=snet, feature_path=path, output_path=outm,
                    batch_size=48, mesh=mesh,
                    transfer_dtype="int8").embed()
    outs = str(tmp_path / "embs.h5f")
    EmbedderSiamese(network=snet, feature_path=path, output_path=outs,
                    batch_size=48).embed()
    a = read_h5features(outs)
    b = read_h5features(outm)
    for fa, fb in zip(a.features(), b.features()):
        np.testing.assert_allclose(fa, fb, atol=8e-3)


def test_embedder_streaming_matches_full_load(feature_file, tmp_path):
    """streaming=True (item-by-item reads, incremental appends) writes a
    file identical to the full-load path — including with chunking
    inside files, int8 codec, and the batched writer flushing."""
    path, items, feats, times = feature_file
    net = SiameseNetwork(input_dim=6, num_hidden_layers=1, hidden_dim=16,
                         output_dim=7, p_dropout=0.0,
                         activation_layer="sigmoid")
    net.ensure_init(0)
    out_full = str(tmp_path / "full.h5f")
    EmbedderSiamese(network=net, feature_path=path, output_path=out_full,
                    batch_size=50).embed()
    out_stream = str(tmp_path / "stream.h5f")
    EmbedderSiamese(network=net, feature_path=path,
                    output_path=out_stream, batch_size=50,
                    streaming=True).embed()
    a = read_h5features(out_full)
    b = read_h5features(out_stream)
    assert a.items() == b.items()
    for fa, fb, ta, tb in zip(a.features(), b.features(),
                              a.labels(), b.labels()):
        np.testing.assert_array_equal(fa, fb)
        np.testing.assert_array_equal(ta, tb)
    # overwrite semantics hold on re-run
    EmbedderSiamese(network=net, feature_path=path,
                    output_path=out_stream, batch_size=50,
                    streaming=True).embed()
    assert read_h5features(out_stream).items() == items

    # int8 codec rides the streaming path too
    out_s8 = str(tmp_path / "s8.h5f")
    EmbedderSiamese(network=net, feature_path=path, output_path=out_s8,
                    batch_size=50, streaming=True,
                    transfer_dtype="int8").embed()
    c = read_h5features(out_s8)
    for fa, fc in zip(a.features(), c.features()):
        np.testing.assert_allclose(fa, fc, atol=8e-3)


def test_embedder_streaming_multitask(feature_file, tmp_path):
    path, items, feats, _ = feature_file
    net = SiameseMultitaskNetwork(
        input_dim=6, num_hidden_layers_shared=1, num_hidden_layers_spk=0,
        num_hidden_layers_phn=0, hidden_dim=8, output_dim=5, p_dropout=0.0,
        activation_layer="relu")
    net.ensure_init(0)
    out = str(tmp_path / "emb.h5f")
    EmbedderSiameseMultitask(network=net, feature_path=path,
                             output_path=out, batch_size=64).embed()
    outs = str(tmp_path / "embs.h5f")
    EmbedderSiameseMultitask(network=net, feature_path=path,
                             output_path=outs, batch_size=64,
                             streaming=True).embed()
    for suffix in (".spk", ".phn"):
        a = read_h5features(out + suffix)
        b = read_h5features(outs + suffix)
        assert a.items() == b.items()
        for fa, fb in zip(a.features(), b.features()):
            np.testing.assert_array_equal(fa, fb)


def test_embedder_int4_transfer(feature_file, tmp_path):
    """transfer_dtype='int4' (opt-in) halves int8's wire bytes via
    per-DIMENSION affine quantization packed two codes per uint8; the
    per-dim ranges bound roundtrip error at (hi_d-lo_d)/30 per dim, and
    the angular-distance shift between embeddings stays well under the
    separations ABX ranking relies on. Output dim 7 exercises the odd-d
    wire pad; the mesh path shards the packed codes over 'data'."""
    from abnet3_tpu.parallel import make_mesh
    path, items, feats, _ = feature_file
    net = SiameseNetwork(input_dim=6, num_hidden_layers=1, hidden_dim=16,
                         output_dim=7, p_dropout=0.0,
                         activation_layer="sigmoid",
                         last_non_linearity=None)
    net.ensure_init(0)
    out32 = str(tmp_path / "e32.h5f")
    EmbedderSiamese(network=net, feature_path=path, output_path=out32,
                    batch_size=64).embed()
    out4 = str(tmp_path / "e4.h5f")
    EmbedderSiamese(network=net, feature_path=path, output_path=out4,
                    batch_size=64, transfer_dtype="int4").embed()
    a = read_h5features(out32)
    b = read_h5features(out4)
    corpus = np.vstack(a.features())
    # chunks pack across files: per-dim min/max span the corpus range
    bound = (corpus.max(axis=0) - corpus.min(axis=0)) / 30 + 1e-6
    shifts = []
    for fa, fb in zip(a.features(), b.features()):
        assert fb.dtype == np.float32
        assert (np.abs(fa - fb) <= bound[None, :]).all()
        # angular-distance perturbation per frame vs the float export
        cos = np.sum(fa * fb, axis=1) / np.maximum(
            np.linalg.norm(fa, axis=1) * np.linalg.norm(fb, axis=1), 1e-9)
        shifts.append(np.arccos(np.clip(cos, -1, 1)) / np.pi)
    assert np.mean(np.concatenate(shifts)) < 2e-2

    # mesh path: packed codes shard over 'data', per-dim lo/scale replicate
    mesh = make_mesh(n_data=8, n_model=1)
    outm = str(tmp_path / "e4m.h5f")
    EmbedderSiamese(network=net, feature_path=path, output_path=outm,
                    batch_size=48, mesh=mesh, transfer_dtype="int4").embed()
    m = read_h5features(outm)
    for fa, fm in zip(a.features(), m.features()):
        # different chunking => different quant ranges; same error class
        assert np.max(np.abs(fa - fm)) <= float(bound.max()) * 2


def test_transfer_codec_unit_properties():
    """encode/decode roundtrip at the function level: identity for
    float32, bf16-rounding for bfloat16, and the (hi-lo)/510 bound +
    exact endpoint recovery for int8."""
    import jax.numpy as jnp
    from abnet3_tpu.embedder import decode_transfer, encode_transfer

    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(64, 9).astype(np.float32) * 5)

    out = decode_transfer(encode_transfer(x, "float32"))
    np.testing.assert_array_equal(out, np.asarray(x))

    out = decode_transfer(encode_transfer(x, "bfloat16"))
    np.testing.assert_allclose(out, np.asarray(x), rtol=1e-2)

    leaves = encode_transfer(x, "int8")
    assert leaves[0].dtype == jnp.uint8
    out = decode_transfer(leaves)
    lo, hi = float(x.min()), float(x.max())
    assert np.max(np.abs(out - np.asarray(x))) <= (hi - lo) / 510 + 1e-6
    # the range endpoints quantize exactly (q=0 and q=255)
    assert out.min() == pytest.approx(lo, abs=1e-5)
    assert out.max() == pytest.approx(hi, abs=(hi - lo) / 500)

    # constant chunk: scale clamps, decode returns the constant
    c = jnp.full((8, 3), 2.5)
    out = decode_transfer(encode_transfer(c, "int8"))
    np.testing.assert_allclose(out, 2.5, atol=1e-5)

    # int4: per-dim bound, odd-d pad column stripped, endpoint recovery
    leaves = encode_transfer(x, "int4")
    assert leaves[0].dtype == jnp.uint8
    assert leaves[0].shape == (64, 5)  # ceil(9/2) packed bytes per row
    assert leaves[1].shape == (9,) and leaves[2].shape == (9,)
    out = decode_transfer(leaves)
    assert out.shape == (64, 9)
    xs = np.asarray(x)
    per_dim = (xs.max(axis=0) - xs.min(axis=0)) / 30 + 1e-6
    assert (np.abs(out - xs) <= per_dim[None, :]).all()
    np.testing.assert_allclose(out.min(axis=0), xs.min(axis=0), atol=1e-5)
    np.testing.assert_allclose(out.max(axis=0), xs.max(axis=0),
                               atol=float(per_dim.max()) * 2)
    out = decode_transfer(encode_transfer(c, "int4"))
    np.testing.assert_allclose(out, 2.5, atol=1e-5)

    # even d: no pad column, exact shape back
    xe = jnp.asarray(rng.randn(16, 4).astype(np.float32))
    out = decode_transfer(encode_transfer(xe, "int4"))
    assert out.shape == (16, 4)


def test_embedder_packs_small_files(tmp_path):
    """Round-4: chunks pack ACROSS file boundaries — a corpus of many
    short files costs ceil(total/batch_size) dispatches (plus a
    ladder-padded tail), not one per file; per-file outputs stay exactly
    the per-file forward's. Empty files come back as (0, d)."""
    rng = np.random.RandomState(0)
    lens = [5, 0, 17, 64, 3, 30, 0, 11]  # 130 frames over 8 files
    feats = [rng.randn(n, 6).astype(np.float32) for n in lens]
    net = SiameseNetwork(input_dim=6, num_hidden_layers=1, hidden_dim=16,
                         output_dim=7, p_dropout=0.0,
                         activation_layer="sigmoid")
    net.ensure_init(0)
    emb = EmbedderSiamese(network=net, feature_path=None,
                          output_path=None, batch_size=64)
    calls = {"n": 0, "rows": []}
    inner = emb._forward_fn()

    def counting_forward(params, state, x):
        calls["n"] += 1
        calls["rows"].append(x.shape[0])
        return inner(params, state, x)

    out = emb._embed_corpus(counting_forward, feats)
    # 130 frames / bs 64 -> chunks of 64, 64, 2(-> ladder-padded tail)
    assert calls["n"] == 3
    assert calls["rows"][:2] == [64, 64]
    assert calls["rows"][2] <= 64  # tail padded to a ladder rung, not bs
    ref_fwd = emb._forward_fn()
    for n, f, e in zip(lens, feats, out):
        assert e.shape == (n, 7)
        if n:
            import jax.numpy as jnp
            from abnet3_tpu.embedder import decode_transfer
            want = decode_transfer(
                ref_fwd(net.params, net.state, jnp.asarray(f))[0])
            np.testing.assert_allclose(e, want, rtol=0, atol=1e-6)


def test_embedder_streaming_packs_and_handles_empties(tmp_path):
    """The streaming path packs across files too, emits empty files as
    (0, d) with the real head dim, and fires on_file_done strictly in
    stream order (h5features appends positionally) — including a
    0-frame FIRST file, whose dims only a later drain can supply."""
    rng = np.random.RandomState(1)
    lens = [0, 5, 0, 17, 40, 3]
    items = [f"f{i}" for i in range(len(lens))]
    feats = [rng.randn(n, 6).astype(np.float32) for n in lens]
    times = [np.arange(n) * 0.01 for n in lens]
    net = SiameseNetwork(input_dim=6, num_hidden_layers=1, hidden_dim=16,
                         output_dim=7, p_dropout=0.0,
                         activation_layer="sigmoid")
    net.ensure_init(0)
    emb = EmbedderSiamese(network=net, feature_path=None,
                          output_path=None, batch_size=32)
    done = {}
    order = []
    emb._embed_streaming(emb._forward_fn(),
                         zip(items, times, feats),
                         lambda item, labels, embs: (
                             done.__setitem__(item, embs[0]),
                             order.append(item)))
    assert order == items  # stream order preserved, empties included
    full = emb._embed_corpus(emb._forward_fn(), feats)
    for item, n, e in zip(items, lens, full):
        assert done[item].shape == (n, 7)
        np.testing.assert_allclose(done[item], e, rtol=0, atol=1e-6)


def test_embedder_all_empty_corpus_keeps_head_dims():
    """All-empty corpora/streams still report the network's output dim
    (a (0, 0) feature set writes a malformed h5features container)."""
    net = SiameseNetwork(input_dim=6, num_hidden_layers=1, hidden_dim=16,
                         output_dim=7, p_dropout=0.0,
                         activation_layer="sigmoid")
    net.ensure_init(0)
    emb = EmbedderSiamese(network=net, feature_path=None,
                          output_path=None, batch_size=32)
    feats = [np.zeros((0, 6), np.float32) for _ in range(3)]
    out = emb._embed_corpus(emb._forward_fn(), feats)
    assert [e.shape for e in out] == [(0, 7)] * 3
    done = {}
    order = []
    emb._embed_streaming(emb._forward_fn(),
                         zip(["a", "b"], [None, None], feats[:2]),
                         lambda item, labels, embs: (
                             done.__setitem__(item, embs[0]),
                             order.append(item)))
    assert order == ["a", "b"]
    assert all(d.shape == (0, 7) for d in done.values())

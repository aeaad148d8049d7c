"""Device ABX scoring (eval/abx_device.py): bit-identical to the host
scorer, straight off the device-resident distance matrix."""

import numpy as np
import pytest

from abnet3_tpu.eval.abx import abx_error, distance_matrix
from abnet3_tpu.eval.abx_device import (DeviceMatrix, abx_error_device,
                                        upload_matrix)
from abnet3_tpu.ops.bank import TokenBank


def _quantized_matrix(rng, n, levels=64):
    """Symmetric distance matrix with REAL TIES (few quantization
    levels) — the 0.5 tie weight must survive the device path."""
    d = rng.randint(0, levels, size=(n, n)).astype(np.float32) / levels
    d = np.triu(d, 1)
    d = d + d.T
    return d


def _inventory(rng, n, n_classes, n_speakers):
    labels = rng.randint(0, n_classes, n)
    speakers = rng.randint(0, n_speakers, n)
    return ([f"c{v:03d}" for v in labels],
            [f"s{v:02d}" for v in speakers])


def _assert_same(host, dev):
    assert dev["n_cells"] == host["n_cells"]
    assert dev["n_triplets"] == host["n_triplets"]
    if np.isnan(host["error"]):
        assert np.isnan(dev["error"])
    else:
        # bit-identical, not approximately equal
        assert dev["error"] == host["error"], (dev, host)


@pytest.mark.parametrize("task", ["across", "within"])
def test_device_matches_host_with_ties(task):
    rng = np.random.RandomState(0)
    D = _quantized_matrix(rng, 60)
    labels, speakers = _inventory(rng, 60, 7, 3)
    host = abx_error(D, labels, speakers, task=task)
    dev = abx_error_device(D, labels, speakers, task=task)
    _assert_same(host, dev)


@pytest.mark.parametrize("task", ["across", "within"])
def test_device_matches_host_sparse_occupancy(task):
    """Singleton classes, single-speaker classes, absent (c, s) combos
    — the empty-cell bookkeeping must agree exactly."""
    rng = np.random.RandomState(1)
    n = 40
    D = _quantized_matrix(rng, n, levels=16)
    # skewed inventory: many classes, few tokens each
    labels, speakers = _inventory(rng, n, 18, 5)
    labels[0] = "c_only"          # singleton class
    labels[1] = labels[2] = "c_one_spk"
    speakers[1] = speakers[2] = "s00"   # class with a single speaker
    host = abx_error(D, labels, speakers, task=task)
    dev = abx_error_device(D, labels, speakers, task=task)
    _assert_same(host, dev)


def test_device_matches_host_float16():
    """float16 host matrices compare as float16 on both paths."""
    rng = np.random.RandomState(2)
    D = _quantized_matrix(rng, 48).astype(np.float16)
    labels, speakers = _inventory(rng, 48, 6, 3)
    host = abx_error(D, labels, speakers, task="across")
    dev = abx_error_device(D, labels, speakers, task="across")
    _assert_same(host, dev)


def test_device_chunk_padding():
    """chunk smaller than any speaker's anchor count exercises the
    padded-anchor masking."""
    rng = np.random.RandomState(3)
    D = _quantized_matrix(rng, 30)
    labels, speakers = _inventory(rng, 30, 5, 2)
    host = abx_error(D, labels, speakers, task="across")
    dev = abx_error_device(D, labels, speakers, task="across", chunk=4)
    _assert_same(host, dev)


def test_device_by_conditioning():
    rng = np.random.RandomState(4)
    n = 36
    D = _quantized_matrix(rng, n)
    labels, speakers = _inventory(rng, n, 4, 3)
    by = [("ctx%d" % (i % 2),) for i in range(n)]
    host = abx_error(D, labels, speakers, task="across", by=by)
    dev = abx_error_device(D, labels, speakers, task="across", by=by)
    _assert_same(host, dev)


def test_device_single_class_nan():
    rng = np.random.RandomState(5)
    D = _quantized_matrix(rng, 10)
    labels = ["same"] * 10
    speakers = [f"s{i % 3}" for i in range(10)]
    host = abx_error(D, labels, speakers, task="across")
    dev = abx_error_device(D, labels, speakers, task="across")
    _assert_same(host, dev)
    assert np.isnan(dev["error"]) and dev["n_cells"] == 0


def test_device_upload_chunked():
    rng = np.random.RandomState(6)
    D = _quantized_matrix(rng, 24)
    labels, speakers = _inventory(rng, 24, 4, 2)
    host = abx_error(D, labels, speakers)
    dm = upload_matrix(D, chunk_rows=7)
    assert isinstance(dm, DeviceMatrix) and len(dm) == 24
    dev = abx_error_device(dm, labels, speakers)
    _assert_same(host, dev)


def test_device_guard_giant_cell():
    """Cells past 2^24 triplets would round in float32 bins — the
    scorer must refuse, not return a rounded score."""
    # 2 classes x 2 speakers, 600 tokens each -> cnt per across cell =
    # sum_s 600*600*600 * 2 >= 2^24 without needing a real matrix
    n = 2400
    labels = np.repeat(["a", "b"], n // 2)
    speakers = np.tile(np.repeat(["s0", "s1"], n // 4), 2)
    D = np.zeros((n, n), np.float32)
    with pytest.raises(ValueError, match="2\\^24"):
        abx_error_device(D, labels, speakers, task="across")


@pytest.mark.parametrize("distance", ["dtw_cos", "mean_cos"])
def test_device_out_matrix_matches_host(distance):
    """distance_matrix(device_out=True): the HBM-assembled wire matrix
    decodes exactly to the host matrix (incl. mirrored diagonal tiles),
    and scoring the handle is bit-identical to scoring the host
    matrix."""
    rng = np.random.RandomState(7)
    n = 40
    feats = {i: rng.randn(rng.randint(6, 20), 12).astype(np.float32)
             for i in range(n)}
    bank = TokenBank(feats)
    D, handle = distance_matrix(bank, distance=distance, batch_size=16,
                                strategy="tiles", device_out=True)
    assert isinstance(handle, DeviceMatrix) and len(handle) == n
    # the device matrix holds u16 wire values; its decode must equal
    # the host matrix bit-for-bit (same mirroring, zero diagonal)
    q = np.asarray(handle.array)[:n, :n]
    dec = (q.astype(np.float32)
           * np.float32(1.0 / 65535.0)).astype(D.dtype)
    np.testing.assert_array_equal(dec, D)
    labels = [f"c{i % 5}" for i in range(n)]
    speakers = [f"s{i % 3}" for i in range(n)]
    host = abx_error(D, labels, speakers)
    dev = abx_error_device(handle, labels, speakers)
    _assert_same(host, dev)


def test_device_out_pairs_strategy():
    """The pairs strategy returns an uploaded host matrix as the
    handle; scoring it matches the host scorer."""
    rng = np.random.RandomState(8)
    n = 16
    feats = {i: rng.randn(rng.randint(5, 12), 8).astype(np.float32)
             for i in range(n)}
    bank = TokenBank(feats)
    D, handle = distance_matrix(bank, batch_size=32, strategy="pairs",
                                device_out=True)
    labels = [f"c{i % 4}" for i in range(n)]
    speakers = [f"s{i % 2}" for i in range(n)]
    _assert_same(abx_error(D, labels, speakers),
                 abx_error_device(handle, labels, speakers))


def test_device_out_resume_uploads_host(tmp_path):
    """A resumed checkpoint run returns a handle built from the host
    matrix (the device buffer never saw the restored tiles)."""
    rng = np.random.RandomState(9)
    n = 32
    feats = {i: rng.randn(10, 8).astype(np.float32) for i in range(n)}
    ck = str(tmp_path / "dm")
    D1 = distance_matrix(TokenBank(feats), batch_size=8,
                         strategy="tiles", checkpoint_path=ck)
    # rerun: all tiles restored from the checkpoint
    D2, handle = distance_matrix(TokenBank(feats), batch_size=8,
                                 strategy="tiles", checkpoint_path=ck,
                                 device_out=True)
    np.testing.assert_array_equal(np.asarray(D1), np.asarray(D2))
    labels = [f"c{i % 4}" for i in range(n)]
    speakers = [f"s{i % 2}" for i in range(n)]
    _assert_same(abx_error(np.asarray(D2), labels, speakers),
                 abx_error_device(handle, labels, speakers))


def test_device_only_no_host_matrix():
    """host_out=False: tiles are never fetched; the device matrix alone
    scores bit-identically to a host-fetched run."""
    rng = np.random.RandomState(12)
    n = 40
    feats = {i: rng.randn(rng.randint(6, 20), 12).astype(np.float32)
             for i in range(n)}
    D = distance_matrix(TokenBank(feats), batch_size=16,
                        strategy="tiles")
    none_D, handle = distance_matrix(TokenBank(feats), batch_size=16,
                                     strategy="tiles", device_out=True,
                                     host_out=False)
    assert none_D is None
    labels = [f"c{i % 5}" for i in range(n)]
    speakers = [f"s{i % 3}" for i in range(n)]
    _assert_same(abx_error(D, labels, speakers),
                 abx_error_device(handle, labels, speakers))


def test_device_only_guards():
    rng = np.random.RandomState(13)
    feats = {i: rng.randn(8, 6).astype(np.float32) for i in range(8)}
    bank = TokenBank(feats)
    with pytest.raises(ValueError, match="device_out"):
        distance_matrix(bank, strategy="tiles", host_out=False)
    with pytest.raises(ValueError, match="checkpoint"):
        distance_matrix(bank, strategy="tiles", device_out=True,
                        host_out=False, checkpoint_path="/tmp/x")


def test_device_scorable():
    from abnet3_tpu.eval.abx_device import device_scorable
    assert device_scorable(["a", "b"] * 10, ["s0", "s1"] * 10)
    n = 2400
    labels = np.repeat(["a", "b"], n // 2)
    speakers = np.tile(np.repeat(["s0", "s1"], n // 4), 2)
    assert not device_scorable(labels, speakers, "across")


def test_evaluate_score_backend_device(tmp_path):
    """evaluate(score_backend='device') end-to-end equals the host
    backend on the same corpus."""
    from abnet3_tpu.eval.abx import evaluate
    from abnet3_tpu.io.h5f import write_h5features

    rng = np.random.RandomState(10)
    items, labs, feats = [], [], []
    classes_lines = []
    tid = 0
    for c in range(4):
        tokens = []
        for s in range(2):
            for k in range(2):
                name = f"f{tid:02d}"
                T = rng.randint(8, 16)
                items.append(name)
                labs.append(np.arange(T, dtype=np.float64) * 0.01 + 0.005)
                feats.append(rng.randn(T, 6).astype(np.float32))
                tokens.append(f"{name} 0.0 {T * 0.01:.3f}")
                tid += 1
        classes_lines.append("Class %d\n%s\n" % (c, "\n".join(tokens)))
    fp = str(tmp_path / "f.h5f")
    write_h5features(fp, "features", items, labs, feats)
    cp = str(tmp_path / "c.classes")
    with open(cp, "w") as f:
        f.write("\n".join(classes_lines))
    spk = str(tmp_path / "spk.txt")
    with open(spk, "w") as f:
        for i in range(tid):
            f.write(f"f{i:02d} spk{i % 2}\n")
    host = evaluate(fp, cp, spkid_file=spk, score_backend="host")
    dev = evaluate(fp, cp, spkid_file=spk, score_backend="device")
    assert dev["error"] == host["error"]
    assert dev["n_cells"] == host["n_cells"]
    assert dev["n_triplets"] == host["n_triplets"]
    # the within task rides the same wiring (auto now picks device for
    # it at tile scale — the compacted fetch made that profitable)
    hw = evaluate(fp, cp, spkid_file=spk, task="within",
                  score_backend="host")
    dw = evaluate(fp, cp, spkid_file=spk, task="within",
                  score_backend="device")
    assert dw["error"] == hw["error"]
    assert dw["n_cells"] == hw["n_cells"]
    assert dw["n_triplets"] == hw["n_triplets"]


@pytest.mark.parametrize("task", ["across", "within"])
def test_device_by_conditioning_device_matrix(task):
    """by-conditioning rides the composite-row kernel straight off a
    DeviceMatrix — no host matrix, bit-identical to the host path."""
    rng = np.random.RandomState(14)
    n = 48
    D = _quantized_matrix(rng, n)
    labels, speakers = _inventory(rng, n, 5, 3)
    by = [("ctx%d" % (i % 3),) for i in range(n)]
    host = abx_error(D, labels, speakers, task=task, by=by)
    dev = abx_error_device(upload_matrix(D), labels, speakers,
                           task=task, by=by)
    _assert_same(host, dev)


def test_device_by_many_small_groups_packs_slots():
    """Dozens of tiny context groups: the slot-packing path (P pools
    per dispatch) must agree bit-for-bit with the host recursion."""
    rng = np.random.RandomState(15)
    n = 120
    D = _quantized_matrix(rng, n, levels=32)
    labels, speakers = _inventory(rng, n, 6, 3)
    by = [("L%d" % (i % 10), "R%d" % (i % 4)) for i in range(n)]
    host = abx_error(D, labels, speakers, task="across", by=by)
    dev = abx_error_device(D, labels, speakers, task="across", by=by)
    _assert_same(host, dev)
    # pool sizes are tiny, so A shrinks below chunk and P packs > 1
    from abnet3_tpu.eval import abx_device as mod
    keys = [k for k in mod._KERNEL_CACHE
            if isinstance(k[0], int) and k[4] > 1]
    assert keys, "expected a packed (P > 1) kernel signature"


def test_device_occupied_row_compaction():
    """Sparse occupancy at high class count: the d2h fetch compacts to
    the occupied anchor rows through the shared rowgather executable
    and stays bit-identical to the host scorer (both tasks)."""
    rng = np.random.RandomState(21)
    n = 80
    D = _quantized_matrix(rng, n, levels=32)
    # 60 singleton classes (never anchors) + 5 multi-speaker classes:
    # occupied rows are a small minority, so pow2_bucket(occ) < Crows
    labels = [f"solo{i:03d}" for i in range(60)] + \
             [f"big{i % 5}" for i in range(20)]
    speakers = [f"s{i % 2}" for i in range(n)]
    from abnet3_tpu.eval import abx_device as mod
    mod._KERNEL_CACHE.clear()
    for task in ("across", "within"):
        host = abx_error(D, labels, speakers, task=task)
        dev = abx_error_device(D, labels, speakers, task=task)
        _assert_same(host, dev)
    assert any(k[0] == "subgather" for k in mod._KERNEL_CACHE), \
        "expected the compacted-fetch gather executable to be used"
    # opt-out knob: dense fetches, same bits
    import os
    os.environ["ABNET3_ABX_COMPACT"] = "0"
    try:
        mod._KERNEL_CACHE.clear()
        for task in ("across", "within"):
            host = abx_error(D, labels, speakers, task=task)
            dev = abx_error_device(D, labels, speakers, task=task)
            _assert_same(host, dev)
        assert not any(k[0] == "subgather" for k in mod._KERNEL_CACHE)
    finally:
        del os.environ["ABNET3_ABX_COMPACT"]


def test_device_by_u16_wire(tmp_path):
    """by-conditioned scoring off the u16 wire matrix handle equals the
    host scorer on the decoded host matrix."""
    rng = np.random.RandomState(16)
    n = 40
    feats = {i: rng.randn(rng.randint(6, 16), 10).astype(np.float32)
             for i in range(n)}
    bank = TokenBank(feats)
    D, handle = distance_matrix(bank, distance="dtw_cos", batch_size=16,
                                strategy="tiles", device_out=True)
    labels = [f"c{i % 5}" for i in range(n)]
    speakers = [f"s{i % 3}" for i in range(n)]
    by = [(f"b{i % 2}",) for i in range(n)]
    host = abx_error(D, labels, speakers, task="across", by=by)
    dev = abx_error_device(handle, labels, speakers, task="across",
                           by=by)
    _assert_same(host, dev)


def test_device_kernel_cache_reuse():
    """Same inventory shapes (raw-vs-trained comparisons) reuse one
    compiled kernel: the module cache must not grow on a repeat call."""
    from abnet3_tpu.eval import abx_device as mod
    rng = np.random.RandomState(17)
    D1 = _quantized_matrix(rng, 30)
    D2 = _quantized_matrix(rng, 30)
    labels, speakers = _inventory(rng, 30, 4, 2)
    abx_error_device(D1, labels, speakers)
    before = len(mod._KERNEL_CACHE)
    abx_error_device(D2, labels, speakers)
    assert len(mod._KERNEL_CACHE) == before


def test_device_scorable_by_param():
    from abnet3_tpu.eval.abx_device import device_scorable
    n = 2400
    labels = np.repeat(["a", "b"], n // 2)
    speakers = np.tile(np.repeat(["s0", "s1"], n // 4), 2)
    assert not device_scorable(labels, speakers, "across")
    # conditioning splits the giant cells below the exactness bound
    by = [f"g{i % 8}" for i in range(n)]
    assert device_scorable(labels, speakers, "across", by=by)


@pytest.mark.parametrize("task", ["across", "within"])
def test_device_cells_match_host(task):
    """return_cells: the per-cell breakdown (keys, scores, counts) is
    bit-identical between the host and device scorers."""
    rng = np.random.RandomState(21)
    D = _quantized_matrix(rng, 50, levels=24)
    labels, speakers = _inventory(rng, 50, 6, 3)
    host = abx_error(D, labels, speakers, task=task, return_cells=True)
    dev = abx_error_device(D, labels, speakers, task=task,
                           return_cells=True)
    _assert_same(host, dev)
    assert len(host["cells"]) == len(dev["cells"]) == host["n_cells"]
    for (hk, hv, hc), (dk, dv, dc) in zip(host["cells"], dev["cells"]):
        assert tuple(hk) == tuple(dk)
        assert hc == dc
        assert hv == dv, (hk, hv, dv)   # bit-identical scores


@pytest.mark.parametrize("task", ["across", "within"])
def test_device_cells_match_host_by(task):
    """Per-cell parity under by-conditioning (group-prefixed keys)."""
    rng = np.random.RandomState(22)
    n = 48
    D = _quantized_matrix(rng, n, levels=16)
    labels, speakers = _inventory(rng, n, 5, 3)
    by = [(f"g{v}",) for v in rng.randint(0, 3, n)]
    host = abx_error(D, labels, speakers, task=task, by=by,
                     return_cells=True)
    dev = abx_error_device(D, labels, speakers, task=task, by=by,
                           return_cells=True)
    _assert_same(host, dev)
    assert len(host["cells"]) == len(dev["cells"]) == host["n_cells"]
    for (hk, hv, hc), (dk, dv, dc) in zip(host["cells"], dev["cells"]):
        assert tuple(hk) == tuple(dk)
        assert hc == dc
        assert hv == dv, (hk, hv, dv)


@pytest.mark.parametrize("task", ["across", "within"])
def test_device_row_blocked_matrix(task):
    """A row-blocked DeviceMatrix (the > one-HBM-buffer layout) scores
    bit-identically: anchor slots partition by owning block and the
    bins thread through every block's chunk sequence."""
    rng = np.random.RandomState(30)
    n = 70
    D = _quantized_matrix(rng, n, levels=32)
    labels, speakers = _inventory(rng, n, 8, 3)
    host = abx_error(D, labels, speakers, task=task, return_cells=True)
    dm = upload_matrix(D, rows_per_block=24)   # 3 blocks, last padded
    assert len(dm.blocks) == 3 and dm.rows_per_block == 24
    assert dm.row_starts == [0, 24, 48]
    dev = abx_error_device(dm, labels, speakers, task=task,
                           return_cells=True)
    _assert_same(host, dev)
    for (hk, hv, hc), (dk, dv, dc) in zip(host["cells"], dev["cells"]):
        assert tuple(hk) == tuple(dk) and hc == dc and hv == dv


def test_device_row_blocked_by_conditioning():
    rng = np.random.RandomState(31)
    n = 60
    D = _quantized_matrix(rng, n, levels=16)
    labels, speakers = _inventory(rng, n, 5, 3)
    by = [("g%d" % (i % 3),) for i in range(n)]
    host = abx_error(D, labels, speakers, task="across", by=by)
    dev = abx_error_device(upload_matrix(D, rows_per_block=16),
                           labels, speakers, task="across", by=by)
    _assert_same(host, dev)


def test_device_row_blocked_equal_heights_one_executable():
    """Equal block heights: one kernel signature serves every block
    (jit shape-specializes per block height — unequal heights would
    each pay a remote compile through the dev tunnel)."""
    dm = upload_matrix(np.zeros((50, 50), np.float32),
                       rows_per_block=16)
    assert [b.shape for b in dm.blocks] == [(16, 50)] * 4


@pytest.mark.parametrize("task", ["across", "within"])
def test_device_mesh_sharded_matrix(task):
    """A mesh-sharded DeviceMatrix (rows over 'data') scores
    bit-identically — GSPMD inserts the cross-device row gathers."""
    from abnet3_tpu.parallel.mesh import make_mesh
    mesh = make_mesh(n_data=4, n_model=1)
    rng = np.random.RandomState(32)
    n = 66                       # not divisible by 4: rows zero-pad
    D = _quantized_matrix(rng, n, levels=32)
    labels, speakers = _inventory(rng, n, 7, 3)
    host = abx_error(D, labels, speakers, task=task)
    dm = upload_matrix(D, mesh=mesh)
    assert dm.mesh is mesh and dm.blocks[0].shape[0] == 68
    dev = abx_error_device(dm, labels, speakers, task=task)
    _assert_same(host, dev)


def test_device_within_one_pass_many_speakers():
    """S=25 speakers: the within task is ONE pass with ONE fetch
    (occupied (speaker, class) bin rows), not a per-speaker loop —
    and still bit-identical to the host scorer."""
    from abnet3_tpu.eval import abx_device as mod
    rng = np.random.RandomState(33)
    n = 150
    D = _quantized_matrix(rng, n, levels=24)
    labels = [f"c{v:02d}" for v in rng.randint(0, 6, n)]
    speakers = [f"s{v:02d}" for v in rng.randint(0, 25, n)]
    host = abx_error(D, labels, speakers, task="within",
                     return_cells=True)
    mod._KERNEL_CACHE.clear()
    dev = abx_error_device(D, labels, speakers, task="within",
                           return_cells=True)
    _assert_same(host, dev)
    for (hk, hv, hc), (dk, dv, dc) in zip(host["cells"], dev["cells"]):
        assert tuple(hk) == tuple(dk) and hc == dc and hv == dv
    # one pass: exactly one chunk-kernel signature and at most one
    # subgather signature were compiled for all 25 speakers
    ckeys = [k for k in mod._KERNEL_CACHE if isinstance(k[0], int)]
    gkeys = [k for k in mod._KERNEL_CACHE if k[0] == "subgather"]
    assert len(ckeys) == 1 and len(gkeys) <= 1


def test_distance_matrix_device_blocked_assembly():
    """device_rows_per_block: tiles assemble into equal-height row
    blocks (transpose mirrors landing in the column-owner block) whose
    concatenation decodes exactly to the host matrix; scoring the
    blocked handle is bit-identical."""
    rng = np.random.RandomState(34)
    n = 40
    feats = {i: rng.randn(rng.randint(6, 20), 12).astype(np.float32)
             for i in range(n)}
    bank = TokenBank(feats)
    D, handle = distance_matrix(bank, batch_size=8, strategy="tiles",
                                device_out=True,
                                device_rows_per_block=16)
    assert len(handle.blocks) > 1
    assert len({b.shape for b in handle.blocks}) == 1
    q = np.concatenate([np.asarray(b) for b in handle.blocks],
                       axis=0)[:n, :n]
    dec = (q.astype(np.float32)
           * np.float32(1.0 / 65535.0)).astype(D.dtype)
    np.testing.assert_array_equal(dec, D)
    labels = [f"c{i % 5}" for i in range(n)]
    speakers = [f"s{i % 3}" for i in range(n)]
    _assert_same(abx_error(D, labels, speakers),
                 abx_error_device(handle, labels, speakers))


def test_distance_matrix_device_blocked_fetch_free():
    """host_out=False + row blocks: fetch-free tiles land only in the
    blocked device matrix; scores match a host-fetched run."""
    rng = np.random.RandomState(35)
    n = 36
    feats = {i: rng.randn(rng.randint(5, 14), 10).astype(np.float32)
             for i in range(n)}
    D = distance_matrix(TokenBank(feats), batch_size=8,
                        strategy="tiles")
    none_D, handle = distance_matrix(TokenBank(feats), batch_size=8,
                                     strategy="tiles", device_out=True,
                                     host_out=False,
                                     device_rows_per_block=16)
    assert none_D is None and len(handle.blocks) > 1
    labels = [f"c{i % 4}" for i in range(n)]
    speakers = [f"s{i % 3}" for i in range(n)]
    _assert_same(abx_error(D, labels, speakers),
                 abx_error_device(handle, labels, speakers))
    _assert_same(abx_error(D, labels, speakers, task="within"),
                 abx_error_device(handle, labels, speakers,
                                  task="within"))


def test_distance_matrix_device_mesh_sharded_assembly():
    """On a multi-device mesh the device matrix assembles ROW-SHARDED
    over 'data' and the scorer is bit-identical to the host path."""
    from abnet3_tpu.parallel.mesh import make_mesh
    mesh = make_mesh(n_data=4, n_model=1)
    rng = np.random.RandomState(36)
    n = 40
    feats = {i: rng.randn(rng.randint(6, 16), 10).astype(np.float32)
             for i in range(n)}
    D = distance_matrix(TokenBank(feats), batch_size=8,
                        strategy="tiles")
    none_D, handle = distance_matrix(TokenBank(feats), batch_size=8,
                                     strategy="tiles", mesh=mesh,
                                     device_out=True, host_out=False)
    assert none_D is None and handle.mesh is mesh
    from jax.sharding import NamedSharding
    sh = handle.array.sharding
    assert isinstance(sh, NamedSharding) and sh.spec[0] == "data"
    labels = [f"c{i % 5}" for i in range(n)]
    speakers = [f"s{i % 3}" for i in range(n)]
    for task in ("across", "within"):
        _assert_same(abx_error(D, labels, speakers, task=task),
                     abx_error_device(handle, labels, speakers,
                                      task=task))


def test_auto_block_fetch_cap_only_when_fetching():
    """host_out=False drops the 2 MB fetch cap (nothing is fetched):
    tile sides are bounded by HBM/batch only."""
    from abnet3_tpu.eval.abx import _auto_block
    # T small enough that the HBM cap exceeds the fetch cap
    capped = _auto_block(20000, 32, 4096, itemsize=2, fetch_capped=True)
    free = _auto_block(20000, 32, 4096, itemsize=2, fetch_capped=False)
    assert capped == 1024 and free == 4096
    # the guards still bound the fetch-free side
    assert _auto_block(20000, 256, 8192, fetch_capped=False) == 1024


def test_device_rows_per_block_policy():
    """Splitting policy: multiples of the tile block, None for a
    fitting single buffer, env-budget auto-split."""
    import os
    from abnet3_tpu.eval.abx import _device_rows_per_block
    # explicit request rounds down to the block grid
    assert _device_rows_per_block(8192, 1024, 2, 3000) == 2048
    assert _device_rows_per_block(8192, 1024, 2, 1000) == 1024
    # request >= Np means one buffer
    assert _device_rows_per_block(4096, 1024, 2, 4096) is None
    # auto: under budget -> single buffer
    assert _device_rows_per_block(4096, 1024, 2, None) is None
    # auto: over a tiny budget -> block-aligned split
    os.environ["ABNET3_ABX_DEVMAT_GB"] = "0.00001"
    try:
        rows = _device_rows_per_block(4096, 1024, 2, None)
        assert rows == 1024  # floor at one tile block
    finally:
        del os.environ["ABNET3_ABX_DEVMAT_GB"]


def test_evaluate_device_rows_per_block(tmp_path):
    """evaluate(device_rows_per_block=...) scores bit-identically to
    the host backend through the full file-based pipeline."""
    from abnet3_tpu.eval.abx import evaluate
    from abnet3_tpu.io.h5f import write_h5features

    rng = np.random.RandomState(40)
    items, labs, feats, lines = [], [], [], []
    tid = 0
    for c in range(5):
        tokens = []
        for k in range(6):
            name = f"f{tid:02d}"
            T = rng.randint(8, 16)
            items.append(name)
            labs.append(np.arange(T, dtype=np.float64) * 0.01 + 0.005)
            feats.append(rng.randn(T, 6).astype(np.float32))
            tokens.append(f"{name} 0.0 {T * 0.01:.3f}")
            tid += 1
        lines.append("Class %d\n%s\n" % (c, "\n".join(tokens)))
    fp = str(tmp_path / "f.h5f")
    write_h5features(fp, "features", items, labs, feats)
    cp = str(tmp_path / "c.classes")
    with open(cp, "w") as f:
        f.write("\n".join(lines))
    spk = str(tmp_path / "spk.txt")
    with open(spk, "w") as f:
        for i in range(tid):
            f.write(f"f{i:02d} spk{i % 3}\n")
    host = evaluate(fp, cp, spkid_file=spk, score_backend="host",
                    batch_size=8)
    dev = evaluate(fp, cp, spkid_file=spk, score_backend="device",
                   batch_size=8, device_rows_per_block=8)
    assert dev["error"] == host["error"]
    assert dev["n_triplets"] == host["n_triplets"]


@pytest.mark.parametrize("task", ["across", "within"])
def test_device_mesh_sharded_by_conditioning(task):
    """by-conditioning (composite bin rows) over a mesh-sharded matrix:
    the GSPMD gathers and the composite/occupied-row machinery compose
    bit-identically."""
    from abnet3_tpu.parallel.mesh import make_mesh
    mesh = make_mesh(n_data=4, n_model=1)
    rng = np.random.RandomState(41)
    n = 72
    D = _quantized_matrix(rng, n, levels=24)
    labels, speakers = _inventory(rng, n, 6, 3)
    by = [("g%d" % (i % 3),) for i in range(n)]
    host = abx_error(D, labels, speakers, task=task, by=by,
                     return_cells=True)
    dev = abx_error_device(upload_matrix(D, mesh=mesh), labels,
                           speakers, task=task, by=by,
                           return_cells=True)
    _assert_same(host, dev)
    for (hk, hv, hc), (dk, dv, dc) in zip(host["cells"], dev["cells"]):
        assert tuple(hk) == tuple(dk) and hc == dc and hv == dv


@pytest.mark.parametrize("task", ["across", "within"])
def test_device_lazy_blocks(task):
    """Lazy host-backed row blocks (the > HBM path): blocks stage one
    at a time during scoring and results stay bit-identical — including
    off an np.memmap (the checkpoint matrix)."""
    rng = np.random.RandomState(42)
    n = 70
    D = _quantized_matrix(rng, n, levels=24)
    labels, speakers = _inventory(rng, n, 8, 3)
    host = abx_error(D, labels, speakers, task=task)
    dm = upload_matrix(D, rows_per_block=32, lazy=True)
    assert dm.lazy and len(dm.blocks) == 3
    assert isinstance(dm.blocks[0], np.ndarray)  # host-resident
    _assert_same(host, abx_error_device(dm, labels, speakers,
                                        task=task))


def test_device_lazy_blocks_memmap(tmp_path):
    """Scoring straight off a checkpoint-style memmap, ragged last
    block padded at stage time."""
    rng = np.random.RandomState(43)
    n = 50
    D = _quantized_matrix(rng, n, levels=16)
    p = str(tmp_path / "dm.npy")
    m = np.lib.format.open_memmap(p, mode="w+", dtype=np.float32,
                                  shape=(n, n))
    m[:] = D
    m.flush()
    mm = np.load(p, mmap_mode="r")
    labels, speakers = _inventory(rng, n, 6, 2)
    host = abx_error(D, labels, speakers)
    dm = upload_matrix(mm, rows_per_block=16, lazy=True)
    assert dm.lazy and len(dm.blocks) == 4  # last block ragged (2 rows)
    _assert_same(host, abx_error_device(dm, labels, speakers))


def test_device_out_resume_blocked_is_lazy(tmp_path):
    """A resumed checkpoint with the blocked layout returns a LAZY
    handle over the memmap (no RAM copy, one block in HBM at a time) —
    bit-identical scoring."""
    rng = np.random.RandomState(44)
    n = 36
    feats = {i: rng.randn(10, 8).astype(np.float32) for i in range(n)}
    ck = str(tmp_path / "dm")
    distance_matrix(TokenBank(feats), batch_size=8, strategy="tiles",
                    checkpoint_path=ck)
    D2, handle = distance_matrix(TokenBank(feats), batch_size=8,
                                 strategy="tiles", checkpoint_path=ck,
                                 device_out=True,
                                 device_rows_per_block=16)
    assert handle.lazy and len(handle.blocks) > 1
    labels = [f"c{i % 4}" for i in range(n)]
    speakers = [f"s{i % 2}" for i in range(n)]
    _assert_same(abx_error(np.asarray(D2), labels, speakers),
                 abx_error_device(handle, labels, speakers))
